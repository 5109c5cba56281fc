"""Per-phase timing of the bilateral-grid CRF on the real TPU.

Measures splat / blur / slice / full-filter / full mean_field at the bench
config (HSN VOC-VGG16: 321^2, sxy=40, srgb=13, C=22, 10 iters) so kernel
work targets the real bottleneck.  axon note: block_until_ready is a no-op
under the tunnel — every timing loop chains device calls and fetches one
scalar at the end.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from wsss_tpu.ops.crf import config as crf_config
from wsss_tpu.ops.crf import meanfield as mf


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    # reduce on-device; fetch 4 bytes (a full-array fetch costs ~73MB/tunnel)
    float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32))))


def main():
    print('devices:', jax.devices())
    H = W = 321
    C = 22
    cfg = crf_config.hsn_config('VOC2012', 'VGG16')
    print('config:', cfg)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, (H, W, C)).astype(np.float32))
    probs = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(H, W, C)).astype(np.float32)), -1)

    grid = mf.BilateralGrid(img, cfg.bi_sxy, cfg.bi_srgb, mode='fast')
    print('grid shape:', grid.gshape, 'nflat:', grid.nflat,
          'grid MB (bf16):', grid.nflat * C * 2 / 1e6)

    # --- phases, each jitted standalone ---
    nearest_idx, idx, wgt = grid.nearest_idx, grid.idx, grid.wgt
    nflat, gshape = grid.nflat, grid.gshape
    blur_ks = grid.blur_ks
    gy, gx, gr, gg, gb = gshape

    @jax.jit
    def splat(vals):
        vals = vals.reshape(-1, C).astype(jnp.bfloat16)
        g = jnp.zeros((nflat, C), jnp.bfloat16)
        return g.at[nearest_idx].add(vals)

    @jax.jit
    def blur(g):
        f = gr * gg * gb * C
        g = g.reshape(gy, gx, f)
        g = mf._sep_conv(g, blur_ks[0], 0)
        g = mf._sep_conv(g, blur_ks[1], 1)
        for k, stride in zip(blur_ks[2:], (gg * gb * C, gb * C, C)):
            g = mf._flat_conv_last(g, k, stride)
        return g.reshape(nflat, C)

    @jax.jit
    def slice_(g):
        out = jnp.zeros((H * W, C), jnp.float32)
        for i in range(idx.shape[0]):
            out = out + wgt[i][:, None] * g[idx[i]].astype(jnp.float32)
        return out

    @jax.jit
    def full_filter(vals):
        return mf.BilateralGrid(img, cfg.bi_sxy, cfg.bi_srgb,
                                mode='fast').filter(vals)

    @jax.jit
    def gauss(vals):
        return mf.gaussian_message(vals, cfg.g_sxy)

    g0 = splat(x)
    gb_ = blur(g0)

    t_splat = timeit(splat, x)
    t_blur = timeit(blur, g0)
    t_slice = timeit(slice_, gb_)
    t_filter = timeit(full_filter, x, iters=10)
    t_gauss = timeit(gauss, x, iters=10)

    print(f'splat      : {t_splat*1e3:8.2f} ms')
    print(f'blur       : {t_blur*1e3:8.2f} ms')
    print(f'slice(4g)  : {t_slice*1e3:8.2f} ms')
    print(f'full filter: {t_filter*1e3:8.2f} ms')
    print(f'gauss msg  : {t_gauss*1e3:8.2f} ms')

    t_mf = timeit(
        lambda: mf.mean_field(probs, img, cfg), iters=5)
    print(f'mean_field ({cfg.iterations} it): {t_mf*1e3:8.2f} ms '
          f'-> {1.0/t_mf:.2f} img/s (CRF only)')


def batched():
    import jax
    import jax.numpy as jnp
    from wsss_tpu.ops.crf import config as crf_config
    from wsss_tpu.ops.crf import meanfield as mf
    H = W = 321
    C = 22
    B = 4
    cfg = crf_config.hsn_config('VOC2012', 'VGG16')
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    probs = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(B, H, W, C)).astype(np.float32)), -1)
    t = timeit(lambda: mf.mean_field(probs, imgs, cfg), iters=5)
    print(f'mean_field B={B} ({cfg.iterations} it): {t*1e3:8.2f} ms '
          f'-> {B/t:.2f} img/s (CRF only)')


if __name__ == '__main__':
    import sys
    if '--batched' in sys.argv:
        batched()
    else:
        main()
