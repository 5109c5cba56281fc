"""CLI: 03b — the IRNet pipeline (make_cam -> eval_cam -> cam_to_ir_label
-> train_irn -> make_sem_seg -> eval_sem_seg) + hyperparameter tuning.

Rebuilds 03b_irn/func_sample.py:14-274 (pass dispatch), demo_tune.py:45-95
(grid search over conf_fg_thres then exp_times, picking best val mIoU) and
demo_sem_seg.py (tuned final runs).  Intermediate artifacts keep the
reference's on-disk contract (.npy cam dicts, ir-label PNGs) so runs can
interoperate / resume.
"""
from __future__ import annotations

import argparse
import os
import jax
import jax.numpy as jnp
import numpy as np

from wsss_tpu.cli import common
from wsss_tpu.data import registry
from wsss_tpu.eval import metrics, reports
from wsss_tpu.io import artifacts, checkpoint
from wsss_tpu.methods import irnet
from wsss_tpu.methods.gradcam_cues import _normalizer
from wsss_tpu.models.irn import edge_displacement_inference


def _spec_and_htt(args):
    spec = registry.get(args.dataset)
    htt = args.dataset.split('-')[-1] if args.dataset.startswith('ADP') \
        else None
    return spec, htt


def _native_shape_groups(ds, batchsize):
    """Group native-size single-image batches by exact (H, W) so each
    group runs through ONE jitted MSF program (static shapes; VOC's
    size distribution repeats heavily, so compiles amortize).  Yields
    (names, imgs [B,H,W,3], tags [B,C])."""
    from wsss_tpu.data.pipeline import prefetch
    groups = {}
    for b in prefetch(ds.iter_native()):
        key = b.images.shape[1:3]
        groups.setdefault(key, []).append(b)
        if len(groups[key]) == batchsize:
            batch = groups.pop(key)
            yield ([x.names[0] for x in batch],
                   np.concatenate([x.images for x in batch]),
                   np.concatenate([x.tags for x in batch]))
    for batch in groups.values():
        yield ([x.names[0] for x in batch],
               np.concatenate([x.images for x in batch]),
               np.concatenate([x.tags for x in batch]))


def run_make_cam(args, dirs) -> None:
    spec, htt = _spec_and_htt(args)
    size = common.input_size(args)
    n_out = (51 if args.model == 'X1.7' else
             (31 if htt else spec.n_fg_classes))
    handle = common.load_handle(args, n_out, size)
    scales = tuple(float(s) for s in args.scales.split(','))
    ci = irnet.CAMInference(handle, spec, args.model, scales=scales,
                            adp_htt=htt)
    ds, _ = common.get_batches(args, args.train_split, size)
    mesh = common.get_mesh(args)
    n = 0
    # native-size batched MSF: the reference keeps original geometry per
    # image (make_cam.py:41-42); batching groups identical shapes
    for names, imgs, tags in _native_shape_groups(ds, args.batchsize):
        dicts = ci.make_cam_batch(imgs, tags, mesh=mesh)
        for name, d in zip(names, dicts):
            artifacts.write_cam_npy(
                os.path.join(dirs['cam'], name + '.npy'),
                d['keys'], d['cam'], d.get('high_res'))
            n += 1
    print(f'[make_cam] wrote {n} cam dicts -> {dirs["cam"]}')


def run_eval_cam(args, dirs, split=None) -> float:
    spec, htt = _spec_and_htt(args)
    size = common.input_size(args)
    ds, _ = common.get_batches(args, split or args.train_split,
                               size, htt=htt)
    n_cls = spec.n_seg_classes
    conf = np.zeros((n_cls, n_cls), np.int64)
    from wsss_tpu.data.pipeline import prefetch
    # native-size eval: GT masks keep original geometry (eval_cam.py:75)
    # exact eval_cam.py:48-62 branches: VOC pads a threshold channel and
    # shifts keys by the bg class; ADP argmaxes the raw high_res channels
    # (keys already include the bg classes, make_cam.py:54-61); DeepGlobe
    # argmaxes the STRIDED 'cam' array with raw keys and no padding.
    is_dg = args.dataset.startswith('DeepGlobe')
    for b in prefetch(ds.iter_native(with_gt=True)):
        name = b.names[0]
        path = os.path.join(dirs['cam'], name + '.npy')
        if not os.path.exists(path) or b.gt is None:
            continue
        d = artifacts.read_cam_npy(path)
        pred = irnet.eval_cam_pred(d, args.dataset, args.cam_eval_thres)
        if pred is None:
            continue
        up = np.asarray(jax.image.resize(
            jnp.asarray(pred, jnp.float32)[..., None],
            b.gt.shape[1:] + (1,), 'nearest'))[..., 0].astype(np.int32)
        if getattr(args, 'saveimg', False):
            reports.save_color_and_overlay(
                dirs['eval'], name + '_cam', up, spec.palette_array(),
                b.images[0], r=0.25 if is_dg else 0.75)
        conf = metrics.accumulate_confusion(
            conf, jnp.asarray(up), jnp.asarray(b.gt[0]), n_cls)
    iou, miou = metrics.iou_from_confusion(conf)
    prec, rec = metrics.precision_recall_from_confusion(conf)
    # DeepGlobe drops the trailing class name row (eval_cam.py:106-109)
    names = (spec.seg_class_names[:-1] if is_dg else spec.seg_class_names)
    k = len(names)
    reports.write_iou_csv(os.path.join(dirs['eval'], 'cam_iou.csv'),
                          names, np.asarray(iou)[:k],
                          precision=np.asarray(prec)[:k],
                          recall=np.asarray(rec)[:k])
    print(f'[eval_cam, {split or args.train_split}] miou: '
          f'{float(miou):.5f}')
    return float(miou)


def run_cam_to_ir_label(args, dirs) -> None:
    spec, htt = _spec_and_htt(args)
    size = common.input_size(args)
    ds, _ = common.get_batches(args, args.train_split, size)
    from wsss_tpu.data.pipeline import prefetch
    n = 0
    # native image geometry (cam_to_ir_label.py operates on the original
    # image; the CRF guide image must match the cam's high_res grid)
    for b in prefetch(ds.iter_native()):
        name = b.names[0]
        path = os.path.join(dirs['cam'], name + '.npy')
        if not os.path.exists(path):
            continue
        d = artifacts.read_cam_npy(path)
        conf = irnet.cam_to_ir_label(
            b.images[0], d, args.dataset,
            conf_fg_thres=args.conf_fg_thres,
            conf_bg_thres=args.conf_bg_thres)
        reports.save_png(
            os.path.join(dirs['ir_label'], name + '.png'), conf)
        if getattr(args, 'saveimg', False):
            # colorized (255 -> white) + overlay (cam_to_ir_label.py:79-93)
            reports.save_color_and_overlay(
                dirs['ir_label'] + '_clr', name, conf,
                spec.palette_array(), b.images[0],
                ignore_color=(255, 255, 255))
        n += 1
    print(f'[cam_to_ir_label] wrote {n} label maps -> {dirs["ir_label"]}')


def run_train_irn(args, dirs) -> None:
    spec, htt = _spec_and_htt(args)
    size = common.input_size(args)
    crop = args.irn_crop_size or (size // 16 * 16)
    backbone = 'vgg16' if args.model.startswith('VGG') else 'm7'
    norm = _normalizer(spec.norm_irn)
    ds, _ = common.get_batches(args, args.train_split, crop)
    n_imgs = len(ds)
    max_step = max(1, (n_imgs // args.batchsize) * args.irn_epochs)
    tr = irnet.IRNTrainer(backbone, spec.n_seg_classes, crop,
                          lr=args.irn_lr, max_step=max_step)
    variables, opt_state = tr.init(jax.random.PRNGKey(0))
    if not args.irn_random_trunk:
        # pour the trained classifier into the frozen trunk
        # (net/common_cnn.py:25-42 semantics; see models/transplant.py)
        from wsss_tpu.models.transplant import transplant_classifier_trunk
        n_out = (51 if args.model == 'X1.7' else
                 (31 if htt else spec.n_fg_classes))
        handle = common.load_handle(args, n_out, size)
        variables = transplant_classifier_trunk(handle.variables,
                                                variables, backbone)
    step_fn = tr.jitted_step()
    put_batch, put_state = common.dp_train_putters(args)
    variables, opt_state = put_state(variables), put_state(opt_state)
    from PIL import Image
    from wsss_tpu.data import augment
    from wsss_tpu.data.pipeline import prefetch
    grid = (crop // 4, crop // 4)
    rescale = (tuple(float(v) for v in args.rescale_range.split(','))
               if args.rescale_range else None)
    if rescale and args.crop_method != 'random':
        raise SystemExit('--rescale_range requires --crop_method random '
                         '(the reference only combines them, '
                         'func_sample.py:147-148)')
    rng = np.random.default_rng(11)

    def load_label(name, hw):
        path = os.path.join(dirs['ir_label'], name + '.png')
        if os.path.exists(path):
            lab = np.asarray(Image.open(path)).astype(np.int64)
            return augment.pil_resize(lab, hw, 0)
        return np.full(hw, 255, np.int64)

    def make_pack(img, name):
        """One (img, affinity labels) training example mirroring
        VOC12AffinityDataset (voc12/dataloader.py:255-321): outsize resize
        (img arrives pre-resized), shared-coin hor_flip, optional
        rescale + shared-box random crop (the resnet50 config), then the
        /4 label reduction feeding GetAffinityLabelFromIndices."""
        lab = load_label(name, img.shape[:2])
        if rescale:
            img, lab = augment.random_scale([img, lab], rescale,
                                            (3, 0), rng)
        if not args.irn_no_flip:
            img, lab = augment.random_lr_flip([img, lab], rng)
        if args.crop_method == 'random':
            img, lab = augment.random_crop([img, lab], crop,
                                           (0, 255), rng)
        else:
            img = img[:crop, :crop]
            lab = lab[:crop, :crop]
        lab4 = augment.pil_rescale(lab, 0.25, 0)[:grid[0], :grid[1]]
        return img, irnet.affinity_labels(lab4, tr.path_index,
                                          spec.n_seg_classes)

    from wsss_tpu.utils.timing import profile_trace
    prof = profile_trace(getattr(args, 'profile_dir', None))
    prof.__enter__()
    for epoch in range(args.irn_epochs):
        # shuffle=True per epoch (train_irn.py:81-82 DataLoader contract)
        for b in prefetch(ds.batches(args.batchsize, shuffle=True)):
            if b.images.shape[0] != args.batchsize:
                continue
            pairs = [make_pack(b.images[i], name)
                     for i, name in enumerate(b.names)]
            imgs = put_batch(norm(np.stack([p[0] for p in pairs])))
            bg, fg, ng = (put_batch(np.stack(z))
                          for z in zip(*[p[1] for p in pairs]))
            variables, opt_state, parts = step_fn(
                variables, opt_state, imgs, bg, fg, ng)
            if args.verbose:
                print('  irn loss %.4f' % float(parts['total']))
    # displacement mean calibration over the ENTIRE infer split
    # (train_irn.py:152-165; drop_last=True DataLoader contract).
    # calibrate_disp_mean streams batches, so memory stays O(batch).
    def infer_batches():
        for b in ds.batches(args.batchsize):
            if b.images.shape[0] == args.batchsize:
                yield np.asarray(norm(b.images[:, :crop, :crop]))
    disp_mean = (tr.calibrate_disp_mean(variables, infer_batches())
                 if n_imgs >= args.batchsize else np.zeros(2))
    prof.__exit__(None, None, None)
    checkpoint.save_checkpoint(
        dirs['irn_ckpt'], 0,
        {'variables': variables, 'disp_mean': jnp.asarray(disp_mean)})
    print(f'[train_irn] trained; disp_mean={disp_mean}')
    return tr


def run_make_sem_seg(args, dirs) -> None:
    spec, htt = _spec_and_htt(args)
    size = common.input_size(args)
    crop = args.irn_crop_size or (size // 16 * 16)
    backbone = 'vgg16' if args.model.startswith('VGG') else 'm7'
    tr = irnet.IRNTrainer(backbone, spec.n_seg_classes, crop)
    variables, opt_state = tr.init(jax.random.PRNGKey(0))
    state, _ = checkpoint.restore_checkpoint(
        dirs['irn_ckpt'], {'variables': variables,
                           'disp_mean': jnp.zeros(2)})
    variables = state['variables']
    disp_mean = np.asarray(state['disp_mean'])
    norm = _normalizer(spec.norm_irn)
    ds, _ = common.get_batches(args, args.infer_split, size)
    mesh = common.get_mesh(args)
    from wsss_tpu.data import augment
    from wsss_tpu.data.pipeline import prefetch
    fwd = jax.jit(lambda v, x: tr.net.apply(v, x))
    n = 0
    for b in prefetch(ds.iter_native()):
        name = b.names[0]
        path = os.path.join(dirs['cam'], name + '.npy')
        if not os.path.exists(path):
            continue
        d = artifacts.read_cam_npy(path)
        # top_left crop/pad of the native image to the train crop size
        # (train_irn.py:38 infer_dataset crop_method="top_left")
        img_c = augment.top_left_crop(b.images[0], crop, 0)
        img = jnp.asarray(norm(img_c[None]))
        edge, _ = edge_displacement_inference(fwd, variables, img,
                                              disp_mean)
        pred = irnet.make_sem_seg(
            edge, d, args.dataset, b.images[0].shape[:2],
            beta=args.beta, exp_times=args.exp_times,
            sem_seg_bg_thres=args.sem_seg_bg_thres,
            walk_downsample=args.walk_downsample, mesh=mesh)
        reports.save_png(os.path.join(dirs['sem_seg'], name + '.png'),
                         pred)
        if getattr(args, 'saveimg', False):
            # colorized + overlay (make_sem_seg_labels.py:121-140)
            reports.save_color_and_overlay(
                dirs['sem_seg'] + '_clr', name, pred,
                spec.palette_array(), b.images[0],
                r=0.25 if args.dataset.startswith('DeepGlobe') else 0.75)
        n += 1
    print(f'[make_sem_seg] wrote {n} -> {dirs["sem_seg"]}')


def run_eval_sem_seg(args, dirs) -> float:
    spec, htt = _spec_and_htt(args)
    size = common.input_size(args)
    ds, _ = common.get_batches(args, args.infer_split, size, htt=htt)
    n_cls = spec.n_seg_classes
    conf = np.zeros((n_cls, n_cls), np.int64)
    from PIL import Image
    from wsss_tpu.data.pipeline import prefetch
    for b in prefetch(ds.iter_native(with_gt=True)):
        name = b.names[0]
        path = os.path.join(dirs['sem_seg'], name + '.png')
        if not os.path.exists(path) or b.gt is None:
            continue
        pred = np.asarray(Image.open(path)).astype(np.int32)
        pred[pred == 255] = 0  # eval_sem_seg.py:32
        gt = b.gt[0]
        if pred.shape != gt.shape:
            pred = np.asarray(Image.fromarray(
                pred.astype(np.uint8)).resize(gt.shape[::-1],
                                              Image.NEAREST))
        conf = metrics.accumulate_confusion(
            conf, jnp.asarray(pred.astype(np.int32)), jnp.asarray(gt),
            n_cls)
    iou, miou = metrics.iou_from_confusion(conf)
    reports.write_iou_csv(os.path.join(dirs['eval'], 'sem_seg_iou.csv'),
                          spec.seg_class_names, np.asarray(iou))
    print(f'[eval_sem_seg] miou: {float(miou):.5f}')
    return float(miou)


PASSES = ['make_cam', 'eval_cam', 'cam_to_ir_label', 'train_irn',
          'make_sem_seg', 'eval_sem_seg']


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument('--passes', default='all',
                   help=f'comma list from {PASSES} or "all"')
    p.add_argument('--work_root', default='irn_work')
    p.add_argument('--train_split', default='train')
    p.add_argument('--infer_split', default='val')
    p.add_argument('--scales', default='1.0,0.5,1.5,2.0')
    p.add_argument('--cam_eval_thres', type=float, default=0.15)
    p.add_argument('--conf_fg_thres', type=float, default=None,
                   help='default: the tuned per-dataset value '
                        '(demo_sem_seg.py:8-18)')
    p.add_argument('--conf_bg_thres', type=float, default=0.05)
    p.add_argument('--irn_crop_size', type=int, default=0)
    p.add_argument('--profile_dir', default=None,
                   help='jax.profiler trace output dir (xprof)')
    p.add_argument('--irn_epochs', type=int, default=1)
    p.add_argument('--irn_lr', type=float, default=0.1)
    p.add_argument('--crop_method', default=None,
                   choices=[None, 'random', 'top_left'],
                   help='affinity-crop mode; the vgg16/m7 configs use '
                        'outsize resize (None), resnet50 uses random '
                        '(func_sample.py:131-148)')
    p.add_argument('--rescale_range', default=None,
                   help='e.g. 0.5,1.5 — random_scale range for affinity '
                        'training (resnet50 config, func_sample.py:148)')
    p.add_argument('--irn_no_flip', action='store_true',
                   help='disable the shared hor_flip of image+ir_label '
                        '(reference trains with hor_flip=True, '
                        'train_irn.py:29)')
    p.add_argument('--irn_random_trunk', action='store_true',
                   help='skip loading the trained classifier into the '
                        'frozen trunk (debug only; the reference always '
                        'transplants, net/common_cnn.py:25-42)')
    p.add_argument('--beta', type=float, default=10.0)
    p.add_argument('--exp_times', type=int, default=None,
                   help='default: the tuned per-dataset value')
    p.add_argument('--sem_seg_bg_thres', type=float, default=0.25)
    p.add_argument('--walk_downsample', type=int, default=6,
                   help='DeepGlobe pre-walk downsample (reference /6, '
                        'make_sem_seg_labels.py:101-104); lower it when '
                        'sharding the walk over a mesh')
    p.add_argument('--tune', action='store_true',
                   help='demo_tune.py grid: conf_fg_thres then exp_times')
    p.add_argument('--saveimg', action='store_true',
                   help='write colorized + overlay debug PNGs at each '
                        'pass (eval_cam.py:66-85, cam_to_ir_label.py:'
                        '79-93, make_sem_seg_labels.py:121-140)')
    args = p.parse_args(argv)

    # tuned hyperparameter defaults (demo_sem_seg.py:8-18)
    from wsss_tpu.ops.crf.config import IRN_TUNED
    tuned = IRN_TUNED.get((args.dataset, args.model), (0.5, 8))
    if args.conf_fg_thres is None:
        args.conf_fg_thres = tuned[0]
    if args.exp_times is None:
        args.exp_times = tuned[1]

    run_name = f'IRN_{args.dataset}_{args.model}'
    root = os.path.join(args.work_root, run_name)
    dirs = {k: os.path.join(root, k)
            for k in ('cam', 'ir_label', 'sem_seg', 'irn_ckpt', 'eval')}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    if args.tune:
        # demo_tune.py:45-95: sweep conf_fg_thres at the dataset's initial
        # exp_times (CFG init_exp_times, demo_tune.py:14-23), then sweep
        # exp_times over EXP_RNG EXCLUDING the initial value (quirk kept:
        # demo_tune.py:79 filters it out, so init_exp can't be re-chosen).
        # Every trial is logged as a TSV row (demo_tune.py:50,68,87-88).
        os.makedirs('tuning_logs', exist_ok=True)
        tsv = os.path.join('tuning_logs', run_name + '.tsv')
        with open(tsv, 'a') as f:
            f.write('dataset\tmodel\tconf_fg_thres\texp_times\t'
                    'validation miou\n')

        def log_trial(th, exp, miou):
            with open(tsv, 'a') as f:
                f.write(f'{args.dataset}\t{args.model}\t{th:.1f}\t{exp}\t'
                        f'{miou:f}\n')

        init_exp = args.exp_times
        run_make_cam(args, dirs)
        best_th, best_miou = None, -1.0
        for th in (0.3, 0.5, 0.7):      # THRES_RNG, demo_tune.py:24
            args.conf_fg_thres = th
            run_cam_to_ir_label(args, dirs)
            run_train_irn(args, dirs)
            args.exp_times = init_exp
            run_make_sem_seg(args, dirs)
            miou = run_eval_sem_seg(args, dirs)
            log_trial(th, init_exp, miou)
            if miou > best_miou:
                best_th, best_miou = th, miou
        args.conf_fg_thres = best_th
        run_cam_to_ir_label(args, dirs)
        run_train_irn(args, dirs)
        best_exp, best_exp_miou = init_exp, best_miou
        for exp in [x for x in range(1, 9) if x != init_exp]:  # EXP_RNG
            args.exp_times = exp
            run_make_sem_seg(args, dirs)
            miou = run_eval_sem_seg(args, dirs)
            log_trial(best_th, exp, miou)
            if miou > best_exp_miou:
                best_exp, best_exp_miou = exp, miou
        print(f'[tune] best conf_fg_thres={best_th} '
              f'exp_times={best_exp} miou={best_exp_miou:.5f}')
        return

    passes = PASSES if args.passes == 'all' else args.passes.split(',')
    result = {}
    for ps in passes:
        r = {'make_cam': run_make_cam, 'eval_cam': run_eval_cam,
             'cam_to_ir_label': run_cam_to_ir_label,
             'train_irn': run_train_irn, 'make_sem_seg': run_make_sem_seg,
             'eval_sem_seg': run_eval_sem_seg}[ps](args, dirs)
        if ps == 'eval_cam':
            result['cam_miou'] = r
        elif ps == 'eval_sem_seg':
            result['miou'] = r
    return result


if __name__ == '__main__':
    main()
