"""CLI: 03a — SEC / DSRG training and prediction.

Rebuilds 03a_sec-dsrg/demo.py:4-84 + model.py train/predict: trains the
DeepLab FCN from the cue pickle with the in-graph CRF layer (+ region
growing for DSRG), periodically evaluates val mIoU, and at predict time
applies the test-time dense CRF and writes IoU csv + colorized outputs.
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
from wsss_tpu.methods.gradcam_cues import _normalizer
from wsss_tpu.ops.crf import config as crf_config
from wsss_tpu.ops.crf.meanfield import mean_field
from wsss_tpu.ops.filters import resize_bilinear
from wsss_tpu.train.sec_dsrg import SECDSRGTrainer

SEED_SIZE = 41  # 03a model.py:35

# Per-dataset defaults from the reference's hardcoded sweep
# (03a_sec-dsrg/demo.py:51-72 via BASELINE.md): (cue threshold, epochs).
SWEEP_DEFAULTS = {
    ('ADP-morph', 'SEC'): (0.9, 8), ('ADP-morph', 'DSRG'): (0.9, 8),
    ('ADP-func', 'SEC'): (0.9, 8), ('ADP-func', 'DSRG'): (0.9, 8),
    ('VOC2012', 'SEC'): (0.2, 16), ('VOC2012', 'DSRG'): (0.2, 6),
    ('DeepGlobe', 'SEC'): (0.3, 100), ('DeepGlobe', 'DSRG'): (0.3, 100),
    ('DeepGlobe_balanced', 'SEC'): (0.4, 100),
    ('DeepGlobe_balanced', 'DSRG'): (0.4, 100),
}


def _load_cues(path, n_imgs, n_cls):
    if path and os.path.exists(path):
        return artifacts.read_cue_pickle(path)
    return None


def _batch_cues(cue_dict, indices, n_cls, grid=SEED_SIZE):
    """Unpack pickle cues (41x41 contract) and nearest-resize to the FCN
    grid when training at a non-reference input size."""
    dense, labels = [], []
    for i in indices:
        cue = (artifacts.unpack_cues(
            cue_dict, int(i), (SEED_SIZE, SEED_SIZE, n_cls))
            if cue_dict else np.zeros((SEED_SIZE, SEED_SIZE, n_cls),
                                      np.float32))
        if grid != SEED_SIZE:
            cue = np.asarray(jax.image.resize(
                jnp.asarray(cue), (grid, grid, n_cls), 'nearest'))
        dense.append(cue)
        lab = np.zeros((n_cls,), np.float32)
        lab[0] = 1.0  # bg always tagged (model.py:244-246 semantics)
        if cue_dict is not None:
            lab[np.asarray(cue_dict.get(f'{int(i)}_labels', []),
                           np.int64)] = 1.0
        labels.append(lab)
    return np.stack(dense), np.stack(labels)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument('--task', default='train',
                   choices=['train', 'predict'])
    p.add_argument('--method', default='SEC', choices=['SEC', 'DSRG'])
    p.add_argument('--epochs', type=int, default=0,
                   help='0 = the reference sweep default for the '
                        'dataset/method (03a demo.py:51-72)')
    p.add_argument('--threshold', type=float, default=None,
                   help='cue threshold recorded in the run id (naming '
                        'parity with 03a; cues are pre-thresholded)')
    p.add_argument('--lr', type=float, default=1e-4)
    p.add_argument('--accum_num', type=int, default=1)
    p.add_argument('--init_npy', default=None,
                   help="reference DeepLab init weights (SEC init.npy / "
                        "DSRG vgg16_deeplab_aspp.npy, 03a model.py:78-81)")
    p.add_argument('--cues_pickle', default=None,
                   help='localization_cues.pickle from 02_cues; synthetic '
                        'cues from tags when absent')
    p.add_argument('--train_split', default='train')
    p.add_argument('--eval_split', default='val')
    p.add_argument('--saveimg', action='store_true')
    p.add_argument('--wsss_model_root', default='models_wsss')
    p.add_argument('--val_every', type=int, default=200,
                   help='steps between val mIoU evals during training '
                        '(03a model.py:505-531; 0 = off)')
    p.add_argument('--profile_dir', default=None,
                   help='jax.profiler trace output dir (xprof)')
    args = p.parse_args(argv)

    spec = registry.get(args.dataset)
    n_cls = spec.n_seg_classes
    size = 321 if not args.img_size else args.img_size  # model.py:34
    norm = _normalizer(spec.norm_sec)
    sweep = SWEEP_DEFAULTS.get((args.dataset, args.method), (0.2, 8))
    if not args.epochs:
        args.epochs = sweep[1]
    if args.threshold is None:
        args.threshold = sweep[0]
    trainer = SECDSRGTrainer(args.method, args.dataset, n_cls,
                             base_lr=args.lr, accum_num=args.accum_num)
    run_id = f'{args.method}_{args.dataset}_{args.model}'
    if args.threshold != sweep[0]:   # 02_cues naming quirk parity
        run_id += f'_{args.threshold}'
    ckpt_root = os.path.join(args.wsss_model_root, run_id)

    params, opt_state = trainer.init(
        jax.random.PRNGKey(0),
        jnp.zeros((args.batchsize, size, size, 3)))
    if args.init_npy:
        from wsss_tpu.io.legacy import load_deeplab_init_npy
        params = load_deeplab_init_npy(args.init_npy, params)
        print(f'initialized trunk+head from {args.init_npy}')
    if checkpoint.latest_step(ckpt_root) is not None:
        state, st = checkpoint.restore_checkpoint(
            ckpt_root, {'params': params, 'opt_state': opt_state})
        params, opt_state = state['params'], state['opt_state']
        print(f'resumed {run_id} from step {st}')

    if args.task == 'train':
        from wsss_tpu.utils.timing import MetricsLogger
        logger = MetricsLogger(os.path.join('log', run_id, 'train.jsonl'))

        def val_miou():
            """Periodic raw-FCN val mIoU (03a model.py:505-531)."""
            vds, _ = common.get_batches(args, args.eval_split, size,
                                        with_gt=True)
            fwd = jax.jit(lambda p, x: trainer.predict_logits(p, x))
            conf = np.zeros((n_cls, n_cls), np.int64)
            for vb in vds.batches(args.batchsize, with_gt=True):
                if vb.gt is None:
                    continue
                logits = fwd(params, jnp.asarray(norm(vb.images)))
                pred = np.asarray(jnp.argmax(resize_bilinear(
                    logits, vb.gt.shape[1:]), -1))
                conf = metrics.accumulate_confusion(
                    conf, jnp.asarray(pred), jnp.asarray(vb.gt), n_cls)
            return float(metrics.iou_from_confusion(conf)[1])

        cue_dict = _load_cues(args.cues_pickle, None, n_cls)
        ds, _ = common.get_batches(args, args.train_split, size)
        step_fn = trainer.jitted_step()
        put_batch, put_state = common.dp_train_putters(args)
        params, opt_state = put_state(params), put_state(opt_state)
        step = 0
        from wsss_tpu.data.pipeline import prefetch
        from wsss_tpu.utils.timing import profile_trace
        prof = profile_trace(args.profile_dir)
        prof.__enter__()
        for epoch in range(args.epochs):
            # per-epoch shuffle (03a model.py:279 tf.data .shuffle) with a
            # prefetch thread overlapping decode with the train step
            for b in prefetch(ds.batches(args.batchsize,
                                         with_gt=cue_dict is None,
                                         shuffle=True)):
                if b.images.shape[0] != args.batchsize:
                    continue
                grid = (size - 1) // 8 + 1  # FCN stride-8 SAME grid
                if cue_dict is not None:
                    cues, labels = _batch_cues(cue_dict, b.indices, n_cls,
                                               grid)
                else:
                    # synthetic fallback: seed cues from downsampled GT
                    gt = jnp.asarray(b.gt)[..., None].astype(jnp.float32)
                    gt_s = np.asarray(jax.image.resize(
                        gt, (gt.shape[0], grid, grid, 1),
                        'nearest'))[..., 0].astype(np.int64)
                    cues = np.eye(n_cls, dtype=np.float32)[
                        np.clip(gt_s, 0, n_cls - 1)]
                    cues *= (np.random.default_rng(step)
                             .random(cues.shape[:3] + (1,)) < 0.1)
                    labels = np.zeros((gt.shape[0], n_cls), np.float32)
                    labels[:, 0] = 1
                    for i in range(gt.shape[0]):
                        labels[i][np.unique(gt_s[i])] = 1
                params, opt_state, parts = step_fn(
                    params, opt_state, put_batch(norm(b.images)),
                    put_batch(b.images), put_batch(cues),
                    put_batch(labels), jax.random.PRNGKey(step))
                step += 1
                logger.log(step, **{k: float(v) for k, v in parts.items()})
                if args.verbose:
                    msg = ' '.join(f'{k}={float(v):.4f}'
                                   for k, v in parts.items())
                    print(f'epoch {epoch} step {step} {msg}')
                if args.val_every and step % args.val_every == 0:
                    miou = val_miou()
                    logger.log(step, val_miou=miou)
                    print(f'step {step} val miou {miou:.5f}')
            checkpoint.save_checkpoint(
                ckpt_root, step, {'params': params,
                                  'opt_state': opt_state})
        prof.__exit__(None, None, None)
        print(f'trained {run_id} for {step} steps')
        return

    # --- predict: FCN forward -> upscale -> test-time CRF -> eval ------
    # Reference semantics (03a model.py:684-696): for non-DeepGlobe the
    # softmax score map AND the ORIGINAL image are first resized to GT
    # resolution and the test CRF runs THERE (ADP: 1088^2, not 321^2);
    # for DeepGlobe the CRF runs at network resolution and only the
    # argmax is resized to GT.  (The reference feeds np.uint8 of the
    # mean-subtracted input to the DeepGlobe CRF — an integer-wraparound
    # quirk; we feed the un-normalized resized image instead.)
    cfg = (crf_config.SEC_TEST.get(args.dataset, crf_config.DSRG_TEST)
           if args.method == 'SEC' else crf_config.DSRG_TEST)
    is_dg = 'DeepGlobe' in args.dataset
    ds, _ = common.get_batches(args, args.eval_split, size, with_gt=True)
    conf = np.zeros((n_cls, n_cls), np.int64)
    fwd = jax.jit(lambda p, x: trainer.predict_logits(p, x))
    out_dir = os.path.join(args.out_root, run_id)
    from wsss_tpu.data.pipeline import prefetch
    for b in prefetch(ds.iter_native(with_gt=True)):
        name = b.names[0]
        native = b.images[0]
        net_in = np.asarray(jax.image.resize(
            jnp.asarray(native), (size, size, 3), 'bilinear'))
        logits = fwd(params, jnp.asarray(norm(net_in[None])))
        probs = jax.nn.softmax(
            resize_bilinear(logits, (size, size)), axis=-1)
        gt = b.gt[0] if b.gt is not None else None
        out_hw = gt.shape if gt is not None else native.shape[:2]
        if not is_dg:
            # score map + image to GT resolution, CRF there
            probs = jnp.clip(resize_bilinear(probs, out_hw), 1e-8, 1.0)
            probs = probs / probs.sum(-1, keepdims=True)
            guide = (native if native.shape[:2] == out_hw else
                     np.asarray(jax.image.resize(
                         jnp.asarray(native), out_hw + (3,), 'bilinear')))
            q = mean_field(probs, jnp.asarray(guide, jnp.float32)[None],
                           cfg)
            pred = np.asarray(jnp.argmax(q, -1))[0]
        else:
            q = mean_field(probs, jnp.asarray(net_in, jnp.float32)[None],
                           cfg)
            pred = np.asarray(jnp.argmax(q, -1))[0]
            if pred.shape != out_hw:
                pred = np.asarray(jax.image.resize(
                    jnp.asarray(pred, jnp.float32)[..., None],
                    out_hw + (1,), 'nearest'))[..., 0].astype(np.int32)
        if gt is not None:
            conf = metrics.accumulate_confusion(
                conf, jnp.asarray(pred), jnp.asarray(gt), n_cls)
        if args.saveimg:
            # colorized pred + overlay on the original (model.py:588-612)
            reports.save_color_and_overlay(
                out_dir, name, pred, spec.palette_array(),
                native, r=0.75)
    iou, miou = metrics.iou_from_confusion(conf)
    path = os.path.join(args.eval_root, run_id,
                        f'{args.eval_split}_iou.csv')
    reports.write_iou_csv(path, spec.seg_class_names, np.asarray(iou))
    reports.confusion_heatmap(
        os.path.join(args.eval_root, run_id, 'confusion.png'),
        np.asarray(conf), spec.seg_class_names)
    print(f'[{args.method}, {args.eval_split}] miou: {float(miou):.5f}')
    return {'miou': float(miou)}


if __name__ == '__main__':
    main()
