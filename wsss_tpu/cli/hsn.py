"""CLI: 03c — HistoSegNet inference + evaluation.

Rebuilds 03c_hsn/demo.py:466-481 (segment / segment_adp): CAM + dense CRF
segmentation over the evaluation split, mIoU + confusion + colorized
overlays.
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from wsss_tpu.cli import common
from wsss_tpu.data import registry
from wsss_tpu.eval import metrics, reports
from wsss_tpu.methods import hsn
from wsss_tpu.ops.crf import config as crf_config


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument('--split', default='val')
    p.add_argument('--set_name', default=None,
                   choices=[None, 'tuning', 'segtest', 'evaluation'])
    p.add_argument('--saveimg', action='store_true')
    p.add_argument('--overlay_r', type=float, default=0.75)
    p.add_argument('--morph_pcc', default=None,
                   help='learned morph CRF config .npy '
                        '(03c_hsn/demo.py:379 morph_optimal_pcc.npy)')
    p.add_argument('--func_pcc', default=None,
                   help='learned func CRF config .npy')
    args = p.parse_args(argv)

    size = common.input_size(args)
    sid = 'HSN_' + common.sess_id(args, args.set_name)
    out_dir = os.path.join(args.out_root, sid)
    mesh = common.get_mesh(args)

    if args.dataset.startswith('ADP'):
        handle = common.load_handle(
            args, 51 if args.model == 'X1.7' else 31, size)
        cfg_m = (crf_config.load_learned_config(args.morph_pcc)
                 if args.morph_pcc else None)
        cfg_f = (crf_config.load_learned_config(args.func_pcc)
                 if args.func_pcc else None)
        seg = hsn.ADPHSNSegmenter(handle, args.model, cfg_morph=cfg_m,
                                  cfg_func=cfg_f)
        split = args.set_name or 'segtest'
        result = {}
        for htt in ('morph', 'func'):
            spec = registry.get(f'ADP-{htt}')
            ds, batches = common.get_batches(args, split, size,
                                             with_gt=True, htt=htt)
            conf = np.zeros((spec.n_seg_classes,) * 2, np.int64)
            from wsss_tpu.parallel.mesh import mesh_batches
            # prefetch-placed batches: upload overlaps the previous
            # batch's segment step (the tf.data prefetch role)
            for b, (ims,), b0 in mesh_batches(mesh, batches,
                                              lambda b: (b.images,)):
                lm, lf = seg.segment_batch(ims, mesh=mesh)
                pred = np.asarray(lm if htt == 'morph' else lf)[:b0]
                if b.gt is not None:
                    import jax
                    up = np.asarray(jax.image.resize(
                        jnp.asarray(pred, jnp.float32)[..., None],
                        (pred.shape[0],) + b.gt.shape[1:] + (1,),
                        'nearest'))[..., 0].astype(np.int32)
                    conf = metrics.accumulate_confusion(
                        conf, jnp.asarray(up), jnp.asarray(b.gt),
                        spec.n_seg_classes)
                if args.saveimg:
                    for i, name in enumerate(b.names):
                        reports.save_png(
                            os.path.join(out_dir, htt, name + '.png'),
                            reports.colorize(pred[i],
                                             spec.palette_array()))
            iou, miou = metrics.iou_from_confusion(conf)
            reports.write_iou_csv(
                os.path.join(args.eval_root, sid, htt, 'hsn_iou.csv'),
                spec.seg_class_names, np.asarray(iou))
            print(f'[hsn, ADP-{htt}] miou: {float(miou):.5f}')
            result[f'miou_{htt}'] = float(miou)
        return result

    spec = registry.get(args.dataset)
    fg = common.load_handle(args, spec.n_fg_classes, size, seed=0)
    bg = None
    if spec.uses_bg_net:
        bg = common.load_handle(args, spec.n_fg_classes, size, seed=1,
                                suffix='bg')
    seg = hsn.HSNSegmenter(spec, fg, bg, model_type=args.model)
    ds, batches = common.get_batches(args, args.split, size, with_gt=True)
    conf = np.zeros((spec.n_seg_classes,) * 2, np.int64)
    from wsss_tpu.parallel.mesh import mesh_batches
    for b, (ims,), b0 in mesh_batches(mesh, batches,
                                      lambda b: (b.images,)):
        pred = np.asarray(seg.segment_batch(ims, mesh=mesh))[:b0]
        if b.gt is not None:
            if pred.shape[1:] != b.gt.shape[1:]:
                # eval at native GT resolution (03c_hsn/demo.py:233-269
                # compares against the full-size masks)
                import jax
                pred = np.asarray(jax.image.resize(
                    jnp.asarray(pred, jnp.float32)[..., None],
                    (pred.shape[0],) + b.gt.shape[1:] + (1,),
                    'nearest'))[..., 0].astype(np.int32)
            conf = metrics.accumulate_confusion(
                conf, jnp.asarray(pred), jnp.asarray(b.gt),
                spec.n_seg_classes)
        if args.saveimg:
            for i, name in enumerate(b.names):
                color = reports.colorize(pred[i], spec.palette_array())
                reports.save_png(os.path.join(out_dir, name + '.png'),
                                 color)
                reports.save_png(
                    os.path.join(out_dir, name + '_overlay.png'),
                    reports.overlay(np.uint8(b.images[i]), color,
                                    args.overlay_r))
    iou, miou = metrics.iou_from_confusion(conf)
    reports.write_iou_csv(
        os.path.join(args.eval_root, sid, 'hsn_iou.csv'),
        spec.seg_class_names, np.asarray(iou))
    print(f'[hsn, {args.dataset}] miou: {float(miou):.5f}')
    return {'miou': float(miou)}


if __name__ == '__main__':
    main()
