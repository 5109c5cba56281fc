"""Secondary throughput benchmarks: one line of JSON per pipeline stage.

Complements bench.py's headline (02_cues+CRF) with the other hot paths:
IRN multi-scale CAM inference, SEC predict + test-time CRF (the sxy=80
grid config), and the random-walk semantic-segmentation propagation.
Run on the real TPU:  python scripts/bench_stages.py

Also writes BENCH_STAGES.json at the repo root ({commit, stages}) so
bench.py can embed the per-stage numbers in its extras without paying
three more remote-compile round trips itself (the axon compile helper's
latency is 2-200 s per program — measured — and the driver runs
bench.py under a timeout); bench.py marks the sidecar stale if HEAD
has moved since.
"""
from __future__ import annotations

import json
import pathlib
import time

import numpy as np

_RESULTS = {}        # name -> images/sec/chip
_EXTRAS = {}         # non-throughput values (own units)
_INCREMENTAL = False  # write the sidecar after every stage (real runs):
                      # the axon tunnel can die mid-suite; keep progress
_ONLY = None          # optional substring filter (--only) for re-runs


def _sync(out):
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(jnp.sum(jnp.asarray(leaves[0]).astype(jnp.float32))))


def bench(name, fn, n_items, iters=5, warmup=1):
    if _ONLY and _ONLY not in name:
        return
    for _ in range(warmup):
        out = fn()
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    _sync(out)
    dt = (time.time() - t0) / iters
    _RESULTS[name] = round(n_items / dt, 2)
    print(json.dumps({'metric': name,
                      'value': round(n_items / dt, 2),
                      'unit': 'images/sec/chip'}), flush=True)
    if _INCREMENTAL:
        _write_sidecar()


def _write_sidecar():
    root = pathlib.Path(__file__).resolve().parent.parent
    from wsss_tpu.utils.repo import git_head
    (root / 'BENCH_STAGES.json').write_text(json.dumps(
        {'commit': git_head(root), 'unit': 'images/sec/chip',
         'stages': _RESULTS, 'extras': _EXTRAS}, indent=1) + '\n')


def main(argv=None):
    import argparse
    import jax
    import jax.numpy as jnp

    from wsss_tpu.data import registry
    from wsss_tpu.methods import gradcam_cues as gc
    from wsss_tpu.methods.irnet import CAMInference
    from wsss_tpu.ops import random_walk
    from wsss_tpu.ops.crf import config as crf_config
    from wsss_tpu.ops.crf.meanfield import mean_field

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--size', type=int, default=321,
                    help='image size (production 321; small values '
                         'smoke-test all code paths on CPU)')
    ap.add_argument('--smoke', action='store_true',
                    help='1-iteration timing + skip the 2448^2 '
                         'DeepGlobe bench (CPU smoke run)')
    ap.add_argument('--only', default=None,
                    help='run only stages whose name contains this '
                         'substring; merges into the existing sidecar')
    a = ap.parse_args(argv)
    smoke_kw = dict(iters=1, warmup=1) if a.smoke else {}
    global _INCREMENTAL, _ONLY
    _ONLY = a.only
    _INCREMENTAL = not a.smoke
    if a.only:   # partial re-run: keep the other stages' numbers
        try:
            root = pathlib.Path(__file__).resolve().parent.parent
            old = json.loads((root / 'BENCH_STAGES.json').read_text())
            _RESULTS.update(old.get('stages', {}))
            _EXTRAS.update(old.get('extras', {}))
        except Exception:
            pass

    spec = registry.get('VOC2012')
    size = a.size
    rng = np.random.default_rng(0)

    # --- IRN make_cam: 4-scale MSF CAM inference, batch of 4 ----------
    handle = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes, size)
    cam = CAMInference(handle, spec, 'VGG16')
    imgs4 = jnp.asarray(rng.uniform(0, 255, (4, size, size, 3))
                        .astype(np.float32))
    bench('irn_make_cam_msf', lambda: cam._msf_batch(imgs4), 4,
          **smoke_kw)

    # --- SEC predict: FCN logits -> upsample -> test-time CRF ---------
    from wsss_tpu.train.sec_dsrg import SECDSRGTrainer
    tr = SECDSRGTrainer('SEC', 'VOC2012', spec.n_seg_classes)
    params = tr.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, size, size, 3)))[0]
    cfg = crf_config.SEC_TEST['VOC2012']
    imgs_raw = jnp.asarray(rng.uniform(0, 255, (4, size, size, 3))
                           .astype(np.float32))
    fwd = jax.jit(lambda p, x: tr.predict_logits(p, x))
    from wsss_tpu.ops.filters import resize_bilinear

    def sec_predict():
        logits = fwd(params, imgs_raw / 255.0)
        probs = jax.nn.softmax(
            resize_bilinear(logits, (size, size)), axis=-1)
        return mean_field(probs, imgs_raw, cfg)
    bench('sec_predict_crf', sec_predict, 4, **smoke_kw)

    # --- IRN random walk: 80^2 grid (321/4), exp_times=8 --------------
    g4 = size // 4
    camk = jnp.asarray(rng.uniform(0, 1, (21, g4, g4)).astype(np.float32))
    edge = jnp.asarray(rng.uniform(0, 1, (g4, g4)).astype(np.float32))
    bench('irn_random_walk', lambda: random_walk.propagate_to_edge(
        camk, edge, beta=10.0, exp_times=8, radius=5), 1,
          **(smoke_kw or {'iters': 10}))

    # --- opt-in bf16 inference (WSSS_TPU_BF16_INFER): throughput and
    # label agreement vs the f32 default on the HSN headline path -----
    try:
        import os
        from wsss_tpu.methods.hsn import HSNSegmenter
        fg32 = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes,
                                           size)
        bg32 = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes,
                                           size, seed=1)
        seg32 = HSNSegmenter(spec, fg32, bg32, model_type='VGG16')
        os.environ['WSSS_TPU_BF16_INFER'] = '1'
        try:
            fgb = gc._ClassifierHandle.random('VGG16',
                                              spec.n_fg_classes, size)
            bgb = gc._ClassifierHandle.random('VGG16',
                                              spec.n_fg_classes, size,
                                              seed=1)
            segb = HSNSegmenter(spec, fgb, bgb, model_type='VGG16')
        finally:
            os.environ.pop('WSSS_TPU_BF16_INFER', None)
        imgs_h = jnp.asarray(rng.uniform(0, 255, (4, size, size, 3))
                             .astype(np.float32))
        bench('hsn_headline_bf16_infer',
              lambda: segb.segment_batch(imgs_h), 4, **smoke_kw)
        lab32 = np.asarray(seg32.segment_batch(imgs_h))
        labb = np.asarray(segb.segment_batch(imgs_h))
        agree = float((lab32 == labb).mean())
        _EXTRAS['hsn_bf16_label_agree_fraction'] = round(agree, 4)
        print(json.dumps({'metric': 'hsn_bf16_label_agree',
                          'value': round(agree, 4), 'unit': 'fraction'}))
    except Exception as e:             # pragma: no cover
        print(json.dumps({'metric': 'hsn_headline_bf16_infer',
                          'error': type(e).__name__}))

    # --- DeepGlobe full-resolution CRF: the reference DOWNSAMPLES
    # DeepGlobe before every refinement (x4 ir-labels, x6 random walk,
    # pydensecrf at ~30 s/img on CPU otherwise); here the 2448^2 dense
    # CRF runs on-device at full resolution ---------------------------
    try:
        if not a.smoke:
            dg_cfg = crf_config.hsn_config('DeepGlobe')
            img_dg = jnp.asarray(rng.uniform(0, 255, (2448, 2448, 3))
                                 .astype(np.float32))
            p_dg = jnp.asarray(rng.dirichlet(np.ones(7), (2448, 2448))
                               .astype(np.float32))
            bench('deepglobe_fullres_crf',
                  lambda: mean_field(p_dg, img_dg, dg_cfg), 1, iters=3)
    except Exception as e:             # pragma: no cover
        print(json.dumps({'metric': 'deepglobe_fullres_crf',
                          'error': type(e).__name__}))

    # --- training steps (reference trains these on GPU at ~1-5 it/s;
    # each bench is fwd+bwd+update at the production shapes) ----------
    try:
        from wsss_tpu.models import build_classifier
        from wsss_tpu.train.classifier import ClassifierTrainer
        clf = build_classifier('VGG16', spec.n_fg_classes)
        ctr = ClassifierTrainer(clf)
        imgs16 = jnp.asarray(rng.uniform(-1, 1, (16, size, size, 3))
                             .astype(np.float32))
        tgt16 = jnp.asarray((rng.uniform(0, 1, (16, spec.n_fg_classes))
                             > 0.8).astype(np.float32))
        cp, cms, cos = ctr.init(jax.random.PRNGKey(0), imgs16)
        cstep = ctr.jitted_step()
        key = jax.random.PRNGKey(1)

        def cls_step():
            return cstep(cp, cms, cos, imgs16, tgt16, key)
        bench('train_classifier_step', cls_step, 16, **smoke_kw)
    except Exception as e:             # pragma: no cover
        print(json.dumps({'metric': 'train_classifier_step',
                          'error': type(e).__name__}))

    try:
        g8 = (size - 1) // 8 + 1     # FCN stride-8 seed grid (41 at 321)
        cues8 = np.zeros((8, g8, g8, spec.n_seg_classes), np.float32)
        cues8[:, :g8 // 4, :g8 // 4, 1] = 1
        cues8[:, g8 // 2:, g8 // 2:, 0] = 1
        lab8 = np.zeros((8, spec.n_seg_classes), np.float32)
        lab8[:, :2] = 1
        imgs_raw8 = jnp.asarray(
            rng.uniform(0, 255, (8, size, size, 3)).astype(np.float32))
        sp, sos = tr.init(jax.random.PRNGKey(0), imgs_raw8 / 255.)
        sstep = tr.jitted_step()

        def sec_step():
            return sstep(sp, sos, imgs_raw8 / 255., imgs_raw8,
                         jnp.asarray(cues8), jnp.asarray(lab8),
                         jax.random.PRNGKey(2))
        bench('train_sec_step', sec_step, 8, **smoke_kw)
    except Exception as e:             # pragma: no cover
        print(json.dumps({'metric': 'train_sec_step',
                          'error': type(e).__name__}))

    try:
        from wsss_tpu.methods import irnet
        itr = irnet.IRNTrainer('vgg16', num_classes=spec.n_seg_classes,
                               crop_size=size, radius=10)
        ivars, ios = itr.init(jax.random.PRNGKey(0))
        lab = rng.integers(0, spec.n_seg_classes,
                           (8, size // 4, size // 4)).astype(np.int64)
        packs = [irnet.affinity_labels(l, itr.path_index,
                                       spec.n_seg_classes) for l in lab]
        bg, fg, ng = (jnp.asarray(np.stack(z)) for z in zip(*packs))
        imgs_n8 = jnp.asarray(rng.normal(0, 1, (8, size, size, 3))
                              .astype(np.float32))
        istep = itr.jitted_step()

        def irn_step():
            return istep(ivars, ios, imgs_n8, bg, fg, ng)
        bench('train_irn_step', irn_step, 8, **smoke_kw)
    except Exception as e:             # pragma: no cover
        print(json.dumps({'metric': 'train_irn_step',
                          'error': type(e).__name__}))

    if not a.smoke:   # smoke numbers must never clobber real ones
        _write_sidecar()


if __name__ == '__main__':
    main()
