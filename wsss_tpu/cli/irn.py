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


def run_make_cam(args, dirs) -> None:
    spec, htt = _spec_and_htt(args)
    size = common.input_size(args)
    n_out = (51 if args.model == 'X1.7' else
             (31 if htt else spec.n_fg_classes))
    handle = common.load_handle(args, n_out, size)
    scales = tuple(float(s) for s in args.scales.split(','))
    ci = irnet.CAMInference(handle, spec, args.model, scales=scales,
                            adp_htt=htt)
    ds, batches = common.get_batches(args, args.train_split, size)
    n = 0
    for b in batches:
        for i, name in enumerate(b.names):
            d = ci.make_cam(b.images[i], b.tags[i]
                            if b.tags is not None else None)
            artifacts.write_cam_npy(
                os.path.join(dirs['cam'], name + '.npy'),
                d['keys'], d['cam'], d.get('high_res'))
            n += 1
    print(f'[make_cam] wrote {n} cam dicts -> {dirs["cam"]}')


def run_eval_cam(args, dirs, split=None) -> float:
    spec, htt = _spec_and_htt(args)
    size = common.input_size(args)
    ds, batches = common.get_batches(args, split or args.train_split,
                                     size, with_gt=True, htt=htt)
    n_cls = spec.n_seg_classes
    conf = np.zeros((n_cls, n_cls), np.int64)
    for b in batches:
        for i, name in enumerate(b.names):
            path = os.path.join(dirs['cam'], name + '.npy')
            if not os.path.exists(path) or b.gt is None:
                continue
            d = artifacts.read_cam_npy(path)
            if d['keys'].size == 0:
                continue
            hr = d.get('high_res', d['cam'])
            pad = np.pad(hr, ((1, 0), (0, 0), (0, 0)),
                         constant_values=args.cam_eval_thres)
            keys = (np.pad(d['keys'] + 1, (1, 0)) if not htt and
                    spec.has_bg_class else
                    np.concatenate([[0], d['keys']]) if htt else
                    np.concatenate([[0], d['keys'] + 0]))
            pred = keys[np.argmax(pad, 0)]
            up = np.asarray(jax.image.resize(
                jnp.asarray(pred, jnp.float32)[..., None],
                b.gt.shape[1:] + (1,), 'nearest'))[..., 0].astype(np.int32)
            conf = metrics.accumulate_confusion(
                conf, jnp.asarray(up), jnp.asarray(b.gt[i]), n_cls)
    iou, miou = metrics.iou_from_confusion(conf)
    reports.write_iou_csv(os.path.join(dirs['eval'], 'cam_iou.csv'),
                          spec.seg_class_names, np.asarray(iou))
    print(f'[eval_cam, {split or args.train_split}] miou: '
          f'{float(miou):.5f}')
    return float(miou)


def run_cam_to_ir_label(args, dirs) -> None:
    spec, htt = _spec_and_htt(args)
    size = common.input_size(args)
    ds, batches = common.get_batches(args, args.train_split, size)
    n = 0
    for b in batches:
        for i, name in enumerate(b.names):
            path = os.path.join(dirs['cam'], name + '.npy')
            if not os.path.exists(path):
                continue
            d = artifacts.read_cam_npy(path)
            conf = irnet.cam_to_ir_label(
                b.images[i], d, args.dataset,
                conf_fg_thres=args.conf_fg_thres,
                conf_bg_thres=args.conf_bg_thres)
            reports.save_png(
                os.path.join(dirs['ir_label'], name + '.png'), conf)
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
    step_fn = tr.jitted_step()
    from PIL import Image
    grid = (crop // 4, crop // 4)
    for epoch in range(args.irn_epochs):
        for b in ds.batches(args.batchsize):
            if b.images.shape[0] != args.batchsize:
                continue
            packs = []
            for i, name in enumerate(b.names):
                path = os.path.join(dirs['ir_label'], name + '.png')
                if os.path.exists(path):
                    lab = np.asarray(Image.open(path).resize(
                        (crop, crop), Image.NEAREST)).astype(np.int64)
                else:
                    lab = np.full((crop, crop), 255, np.int64)
                lab4 = lab[::4, ::4][:grid[0], :grid[1]]
                packs.append(irnet.affinity_labels(
                    lab4, tr.path_index, spec.n_seg_classes))
            bg, fg, ng = (jnp.asarray(np.stack(z)) for z in zip(*packs))
            imgs = jnp.asarray(norm(b.images[:, :crop, :crop]))
            variables, opt_state, parts = step_fn(
                variables, opt_state, imgs, bg, fg, ng)
            if args.verbose:
                print('  irn loss %.4f' % float(parts['total']))
    # displacement mean calibration (train_irn.py:152-165)
    infer_imgs = []
    for b in ds.batches(args.batchsize):
        if b.images.shape[0] == args.batchsize:
            infer_imgs.append(np.asarray(norm(b.images[:, :crop, :crop])))
        if len(infer_imgs) >= 2:
            break
    disp_mean = tr.calibrate_disp_mean(variables, infer_imgs) \
        if infer_imgs else np.zeros(2)
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
    ds, batches = common.get_batches(args, args.infer_split, size)
    fwd = lambda v, x: tr.net.apply(v, x)
    n = 0
    for b in batches:
        for i, name in enumerate(b.names):
            path = os.path.join(dirs['cam'], name + '.npy')
            if not os.path.exists(path):
                continue
            d = artifacts.read_cam_npy(path)
            img = jnp.asarray(norm(b.images[i][None][:, :crop, :crop]))
            edge, _ = edge_displacement_inference(fwd, variables, img,
                                                  disp_mean)
            pred = irnet.make_sem_seg(
                edge, d, args.dataset, b.images[i].shape[:2],
                beta=args.beta, exp_times=args.exp_times,
                sem_seg_bg_thres=args.sem_seg_bg_thres)
            reports.save_png(os.path.join(dirs['sem_seg'], name + '.png'),
                             pred)
            n += 1
    print(f'[make_sem_seg] wrote {n} -> {dirs["sem_seg"]}')


def run_eval_sem_seg(args, dirs) -> float:
    spec, htt = _spec_and_htt(args)
    size = common.input_size(args)
    ds, batches = common.get_batches(args, args.infer_split, size,
                                     with_gt=True, htt=htt)
    n_cls = spec.n_seg_classes
    conf = np.zeros((n_cls, n_cls), np.int64)
    from PIL import Image
    for b in batches:
        for i, name in enumerate(b.names):
            path = os.path.join(dirs['sem_seg'], name + '.png')
            if not os.path.exists(path) or b.gt is None:
                continue
            pred = np.asarray(Image.open(path)).astype(np.int32)
            pred[pred == 255] = 0  # eval_sem_seg.py:32
            gt = b.gt[i]
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
    p.add_argument('--irn_epochs', type=int, default=1)
    p.add_argument('--irn_lr', type=float, default=0.1)
    p.add_argument('--beta', type=float, default=10.0)
    p.add_argument('--exp_times', type=int, default=None,
                   help='default: the tuned per-dataset value')
    p.add_argument('--sem_seg_bg_thres', type=float, default=0.25)
    p.add_argument('--tune', action='store_true',
                   help='demo_tune.py grid: conf_fg_thres then exp_times')
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
        # demo_tune.py:45-95: sweep conf_fg_thres at exp_times=1, then
        # sweep exp_times at the best threshold
        run_make_cam(args, dirs)
        best_th, best_miou = None, -1.0
        for th in (0.3, 0.5, 0.7):
            args.conf_fg_thres = th
            run_cam_to_ir_label(args, dirs)
            run_train_irn(args, dirs)
            args.exp_times = 1
            run_make_sem_seg(args, dirs)
            miou = run_eval_sem_seg(args, dirs)
            if miou > best_miou:
                best_th, best_miou = th, miou
        args.conf_fg_thres = best_th
        run_cam_to_ir_label(args, dirs)
        run_train_irn(args, dirs)
        best_exp = 1
        for exp in range(1, 9):
            args.exp_times = exp
            run_make_sem_seg(args, dirs)
            miou = run_eval_sem_seg(args, dirs)
            if miou > best_miou:
                best_exp, best_miou = exp, miou
        # tuning TSV (demo_tune.py:41-43,50 contract)
        os.makedirs('tuning_logs', exist_ok=True)
        with open(os.path.join('tuning_logs', run_name + '.tsv'), 'a') as f:
            f.write(f'{best_th}\t{best_exp}\t{best_miou:.5f}\n')
        print(f'[tune] best conf_fg_thres={best_th} '
              f'exp_times={best_exp} miou={best_miou:.5f}')
        return

    passes = PASSES if args.passes == 'all' else args.passes.split(',')
    for ps in passes:
        {'make_cam': run_make_cam, 'eval_cam': run_eval_cam,
         'cam_to_ir_label': run_cam_to_ir_label,
         'train_irn': run_train_irn, 'make_sem_seg': run_make_sem_seg,
         'eval_sem_seg': run_eval_sem_seg}[ps](args, dirs)


if __name__ == '__main__':
    main()
