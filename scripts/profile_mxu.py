"""Time the MXU bilateral grid on the real TPU at the bench config and
check fidelity against the existing 'fast' grid path."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from wsss_tpu.ops.crf import meanfield as mf
from wsss_tpu.ops.crf import mxu_grid


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
    float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32))))


def main():
    print('devices:', jax.devices())
    H = W = 321
    C = 22
    B = 4
    sxy, srgb = 40.0, 13.0

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))

    g = mxu_grid.MXUBilateralGrid(imgs, sxy, srgb, C)
    print(f'tiles {g.nty}x{g.ntx}, P={g.p}, gc={g.gc}, M={g.m}, '
          f'hip={g.hip}')

    filt = jax.jit(lambda xx: g.filter(xx))
    # _splat takes the zero-padded IMAGE-layout array [B,Hp,Wp,C] —
    # tiles are fetched per-block inside the kernel (no host _tile).
    splat = jax.jit(lambda xx: g._splat(jnp.pad(
        xx, ((0, 0), (0, g.hp - H), (0, g.wp - W), (0, 0)))))
    part0 = splat(x)
    blur = jax.jit(g._blur)
    grid0 = blur(part0)
    slice_ = jax.jit(g._slice)

    t_splat = timeit(splat, x)
    t_blur = timeit(blur, part0)
    t_slice = timeit(slice_, grid0)
    t_filt = timeit(filt, x, iters=10)
    print(f'B={B} per-filter: splat {t_splat*1e3:7.2f} ms  '
          f'blur {t_blur*1e3:7.2f} ms  slice {t_slice*1e3:7.2f} ms  '
          f'full {t_filt*1e3:7.2f} ms '
          f'({t_filt/B*1e3:.2f} ms/img vs 33.5 ms/img for fast-mode)')

    # fidelity vs the existing fast-mode grid on one image
    fast = mf.BilateralGrid(imgs[0], sxy, srgb, mode='fast')
    out_fast = np.asarray(fast.filter(x[0]))
    out_mxu = np.asarray(filt(x))[0]
    scale = np.abs(out_fast).max()
    diff = np.abs(out_mxu - out_fast) / scale
    print(f'rel diff vs fast-mode grid: mean {diff.mean():.4f} '
          f'max {diff.max():.4f} (expected small but nonzero: splat is '
          f'bilinear here vs nearest there)')


if __name__ == '__main__':
    main()
