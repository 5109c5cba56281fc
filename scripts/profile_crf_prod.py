"""Per-phase CRF timing at the PRODUCTION dispatch config: the exact
geometry mean_field routes to for the HSN/SEC test-time configs
(cell_mult=MXU_CELL_MULT, per-image B=1 chains).

Run on the real TPU:  python scripts/profile_crf_prod.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from wsss_tpu.ops.crf import config as crf_config
from wsss_tpu.ops.crf import meanfield as mf
from wsss_tpu.ops.crf import mxu_grid


def sync(x):
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                             .astype(jnp.float32))))


def timeit(f, *a, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = f(*a)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
    sync(out)
    return (time.time() - t0) / iters


def main():
    print('devices:', jax.devices())
    size, C = 321, 21
    cfg = crf_config.hsn_config('VOC2012', 'VGG16')
    print('cfg:', cfg, 'cell_mult:', mf.MXU_CELL_MULT)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (1, size, size, 3))
                      .astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, (1, size, size, C))
                    .astype(np.float32))

    g = mxu_grid.MXUBilateralGrid(img, cfg.bi_sxy, cfg.bi_srgb, C,
                                  cell_mult=mf.MXU_CELL_MULT)
    print(f'tiles {g.nty}x{g.ntx}, t={g.t}, P={g.p}, gc={g.gc}, '
          f'hip={g.hip}, lb={g.lb}, hich={g.hich}, '
          f'fuse_combine_blur={g.fuse_combine_blur}')

    H = g.hp
    xp = jnp.pad(x, ((0, 0), (0, g.hp - size), (0, g.wp - size), (0, 0)))
    splat = jax.jit(g._splat)
    part = splat(xp)
    blur = jax.jit(g._blur)
    grid0 = blur(part)
    slice_ = jax.jit(g._slice)
    filt = jax.jit(g.filter)

    t_splat = timeit(splat, xp)
    t_blur = timeit(blur, part)
    t_slice = timeit(slice_, grid0)
    t_filt = timeit(filt, x)
    print(f'B=1 splat {t_splat*1e3:6.2f}  blur(+combine) '
          f'{t_blur*1e3:6.2f}  slice {t_slice*1e3:6.2f}  '
          f'full filter {t_filt*1e3:6.2f} ms')

    # full mean field (10 iters) + the gaussian-only piece
    def mfield():
        return mf.mean_field(x[0], img[0], cfg)
    t_mf = timeit(mfield, iters=4)
    print(f'mean_field(10 iters): {t_mf*1e3:7.2f} ms '
          f'({(t_mf - 10*t_filt)*1e3:6.2f} ms not-filter)')

    gs = jax.jit(lambda q: mf._gaussian_filter_raw(
        q, cfg.g_sxy, axes=(1, 2), dtype=jnp.bfloat16))
    t_g = timeit(gs, x)
    print(f'gaussian message filter: {t_g*1e3:6.2f} ms')


if __name__ == '__main__':
    main()
