"""Experiment: fuse the HSN headline (CAM -> CRF -> argmax) into ONE
device program per batch, vs the current 3-dispatch-per-batch path.

The round-3 dispatch analysis: the v2 CRF device program is ~8 ms while
the per-dispatch host/tunnel gap is ~6 ms, so mean_field chains
chunk-of-2 dispatches.  Fusing the whole batch step removes the host
gaps entirely while keeping the CRF working set at chunk size (the
chunks stay sequential subgraphs inside the program).

Run one variant per invocation (each is a fresh ~170 s remote compile):

    python scripts/exp_fused.py baseline|fused2|fused4|fused2_bf16|fused2_b8
"""
from __future__ import annotations

import sys
import time

import numpy as np


def sync(x):
    import jax.numpy as jnp
    float(np.asarray(jnp.sum(jnp.asarray(x).astype(jnp.float32))))


def timeit(f, iters=4, warmup=1):
    out = None
    for attempt in range(2):
        try:
            for _ in range(warmup):
                out = f()
            break
        except Exception:
            if attempt:
                raise
    sync(out[0] if isinstance(out, list) else out)
    t0 = time.time()
    for _ in range(iters):
        out = f()
    sync(out[0] if isinstance(out, list) else out)
    return (time.time() - t0) / iters


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else 'fused2'
    import os
    if '_bf16' in variant:
        os.environ['WSSS_TPU_BF16_INFER'] = '1'
    # mean-field state dtype: bf16 is the default on the compiled path
    # (meanfield._CRF_STATE_BF16); non-bf16s variants pin f32 explicitly
    # so each variant measures what its name claims (ADVICE r4 #3 — the
    # old script set WSSS_TPU_CRF_STATE_BF16, which nothing reads)
    if 'bf16s' not in variant:
        os.environ['WSSS_TPU_CRF_STATE_F32'] = '1'
    import jax
    import jax.numpy as jnp

    from wsss_tpu.data import registry
    from wsss_tpu.methods import gradcam_cues as gc
    from wsss_tpu.methods.hsn import HSNSegmenter
    from wsss_tpu.ops.crf import meanfield as mf

    spec = registry.get('VOC2012')
    size = 321
    batch = 16 if '_b16' in variant else 8 if '_b8' in variant else 4
    n_batches = 16 // batch

    fg = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes, size)
    bg = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes, size,
                                     seed=1)
    seg = HSNSegmenter(spec, fg, bg, model_type='VGG16')
    cfg = seg._cfg
    iters_crf = cfg.iterations
    if '_it' in variant:                     # e.g. fused2_bf16_it0
        iters_crf = int(variant.rsplit('_it', 1)[1])
    mkw = dict(g_sxy=cfg.g_sxy, g_compat=cfg.g_compat,
               bi_sxy=cfg.bi_sxy, bi_srgb=cfg.bi_srgb,
               bi_compat=cfg.bi_compat, iterations=iters_crf,
               exclude_self=True, interpret=False,
               cell_mult=mf.MXU_CELL_MULT,
               state_bf16=mf._CRF_STATE_BF16, ds_cell=mf.MXU_DS_CELL)

    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(
        rng.uniform(0, 255, (batch, size, size, 3)).astype(np.float32))
            for _ in range(n_batches)]

    if variant == 'baseline':
        def run():
            return [seg.segment_batch(im) for im in imgs]
    elif variant.startswith('camonly'):
        @jax.jit
        def camonly(im):
            probs = seg._probs_fn(im)
            return jnp.argmax(probs, axis=-1).astype(jnp.int32)

        def run():
            return [camonly(im) for im in imgs]
    else:
        chunk = 4 if variant.startswith('fused4') else 2

        @jax.jit
        def fused(im):
            probs = seg._probs_fn(im)
            outs = [mf._mean_field_mxu(probs[s:s + chunk],
                                       im[s:s + chunk], **mkw)
                    for s in range(0, batch, chunk)]
            q = jnp.concatenate(outs, axis=0)
            return jnp.argmax(q, axis=-1).astype(jnp.int32)

        def run():
            return [fused(im) for im in imgs]

    dt = timeit(run)
    ips = 16 / dt
    print(f'{variant}: {ips:.2f} img/s ({1e3 * dt / 16:.2f} ms/img)',
          flush=True)

    if 'bf16s' in variant and '_agree' in variant:
        # label agreement of the bf16-state loop vs the f32-state loop:
        # state_bf16 is a STATIC ARG of _mean_field_mxu since round 5,
        # so the f32 leg genuinely retraces (the old module-global flip
        # reused the cached bf16 jaxpr and compared it to itself)
        lab16 = np.concatenate([np.asarray(r) for r in run()], axis=0)
        mkw32 = dict(mkw, state_bf16=False)

        @jax.jit
        def fused32(im):
            probs = seg._probs_fn(im)
            outs = [mf._mean_field_mxu(probs[s:s + chunk],
                                       im[s:s + chunk], **mkw32)
                    for s in range(0, batch, chunk)]
            q = jnp.concatenate(outs, axis=0)
            return jnp.argmax(q, axis=-1).astype(jnp.int32)

        lab32 = np.concatenate(
            [np.asarray(fused32(im)) for im in imgs], axis=0)
        agree = float((lab16 == lab32).mean())
        print(f'bf16-state label agreement vs f32 state: {agree:.5f}',
              flush=True)


if __name__ == '__main__':
    main()
