"""Round-5 headline experiments on the real chip: full fused HSN step
(CAM -> chunked MXU mean field -> argmax) at the bench config, varying

  * CRF dispatch chunk inside the fused program (1 vs 2),
  * the spatial-downsample cell (MXU_DS_CELL 16 -> 12/10: splat/slice
    MACs scale with the ds pixel count, (cell/sxy)^2 of full res),
  * f32 vs bf16 mean-field state (a VALID A/B now that state_bf16 is a
    static arg of _mean_field_mxu — the round-4 module-global flip
    reused the cached bf16 trace and compared it against itself).

Each variant reports img/s and label agreement vs the baseline variant
on the same inputs.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_r5_variants.py
"""
from __future__ import annotations

import time

import jax

# persistent executable cache: retries after a remote-compile stall skip
# straight past already-compiled programs (no-op if the axon backend
# does not support serialization)
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

import jax.numpy as jnp
import numpy as np

from wsss_tpu.data import registry
from wsss_tpu.methods import gradcam_cues as gc
from wsss_tpu.methods.hsn import HSNSegmenter
from wsss_tpu.ops.crf import meanfield as mf


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32))))


def timeit(f, iters=2, warmup=1):
    out = None
    for attempt in range(2):
        try:
            for _ in range(warmup):
                out = f()
            break
        except Exception:
            if attempt:
                raise
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f()
    sync(out)
    return (time.time() - t0) / iters, out


def main():
    spec = registry.get('VOC2012')
    size, batch, n_batches = 321, 8, 2
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(
        rng.uniform(0, 255, (batch, size, size, 3)).astype(np.float32))
            for _ in range(n_batches)]

    fg = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes, size)
    bg = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes, size,
                                     seed=1)

    base_labels = None
    all_variants = dict([
        ('baseline', {}),
        ('chunk1', {'chunk': 1}),
        # ds cells must be multiples of 8 (Mosaic image-layout tiles)
        ('ds8', {'ds_cell': 8}),
        ('ds8_chunk1', {'ds_cell': 8, 'chunk': 1}),
        ('ds8_chunk4', {'ds_cell': 8, 'chunk': 4}),
        ('f32_state', {'state_bf16': False}),
    ])
    import sys
    names = sys.argv[1:] or list(all_variants)
    # baseline always runs first (agreement denominator)
    if names[0] != 'baseline':
        names = ['baseline'] + [n for n in names if n != 'baseline']
    variants = [(n, all_variants[n]) for n in names]
    orig_chunk, orig_cell, orig_bf16 = (
        mf._mxu_chunk, mf.MXU_DS_CELL, mf._CRF_STATE_BF16)
    for name, opts in variants:
        mf.MXU_DS_CELL = opts.get('ds_cell', orig_cell)
        mf._CRF_STATE_BF16 = opts.get('state_bf16', orig_bf16)
        if 'chunk' in opts:
            mf._mxu_chunk = lambda b, n, c, k=opts['chunk']: k
        else:
            mf._mxu_chunk = orig_chunk
        try:
            seg = HSNSegmenter(spec, fg, bg, model_type='VGG16')
            assert seg._fused is not None, name
            dt, out = timeit(
                lambda: [seg.segment_batch(im) for im in imgs])
            ips = batch * n_batches / dt
            lab = np.concatenate([np.asarray(o) for o in out])
            if base_labels is None:
                base_labels = lab
                agree = 1.0
            else:
                agree = float((lab == base_labels).mean())
            print(f'{name}: {ips:.2f} img/s  agree_vs_base={agree:.4f}',
                  flush=True)
        finally:
            mf._mxu_chunk = orig_chunk
            mf.MXU_DS_CELL = orig_cell
            mf._CRF_STATE_BF16 = orig_bf16


if __name__ == '__main__':
    main()
