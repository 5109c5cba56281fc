"""Decompose the fused mean-field per-iteration cost at the bench config
(VOC VGG16: g_sxy=1.5, bi_sxy=40 -> ds to 128^2, srgb=13, C=21, 321^2).

Times 10-iteration loops of each component in isolation inside one jit:
  gaussian  : symmetric-normalized Gaussian message (2 band matmuls)
  resizes   : Q down to 128^2 + message up to 321^2
  gridfilt  : MXU bilateral grid filter at the ds geometry
  softmax   : -U + msg -> softmax state update

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_crf_components.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from wsss_tpu.ops.crf import config as crf_config
from wsss_tpu.ops.crf import meanfield as mf
from wsss_tpu.ops.crf import mxu_grid as mxu
from wsss_tpu.ops.filters import resize_bilinear


def sync(x):
    float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def timeit(f, iters=8, warmup=2):
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
    return (time.time() - t0) / iters


def main():
    size, c, b = 321, 21, 2
    cfg = crf_config.hsn_config('VOC2012', 'VGG16')
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (b, size, size, 3))
                       .astype(np.float32))
    Q = jax.nn.softmax(jnp.asarray(
        rng.normal(0, 1, (b, size, size, c)).astype(np.float32)))
    Qb = Q.astype(jnp.bfloat16)

    f = cfg.bi_sxy / float(mf.MXU_DS_CELL)
    hd = wd = max(int(round(size / f)), 8)
    img_g = resize_bilinear(imgs, (hd, wd))
    print(f'ds geometry: {hd}x{wd}, cell {mf.MXU_DS_CELL}')

    def loop(body):
        @jax.jit
        def run(q):
            return jax.lax.fori_loop(0, 10, lambda _, x: body(x), q)
        return run

    # gaussian message (n_g fixed outside the loop, as in _mean_field_mxu)
    ones = jnp.ones(Q.shape[:3] + (1,), jnp.float32)
    n_g = jax.lax.rsqrt(jnp.maximum(
        mf._gaussian_filter_raw(ones, cfg.g_sxy, axes=(1, 2)), 1e-20)
        ).astype(jnp.bfloat16)
    gauss = loop(lambda q: (n_g * mf._gaussian_filter_raw(
        n_g * q, cfg.g_sxy, axes=(1, 2), dtype=jnp.bfloat16)
        - (n_g * n_g) * q).astype(q.dtype))
    dt = timeit(lambda: gauss(Qb))
    print(f'gaussian x10: {1e3 * dt / b:.3f} ms/img '
          f'({1e2 * dt / b / 10:.1f} us/iter/img... x100)', flush=True)

    # resize down + up
    rs = loop(lambda q: resize_bilinear(
        resize_bilinear(q, (hd, wd)), (size, size)).astype(q.dtype))
    dt = timeit(lambda: rs(Qb))
    print(f'resize down+up x10: {1e3 * dt / b:.3f} ms/img', flush=True)

    # grid filter at ds geometry
    grid = mxu.MXUBilateralGrid(img_g, float(mf.MXU_DS_CELL), cfg.bi_srgb,
                                c, cell_mult=mf.MXU_CELL_MULT)
    qd = resize_bilinear(Qb, (hd, wd)).astype(jnp.bfloat16)
    gf = loop(lambda q: grid.filter(q).astype(q.dtype))
    dt = timeit(lambda: gf(qd))
    print(f'grid filter x10: {1e3 * dt / b:.3f} ms/img', flush=True)

    # softmax update at full res
    U = -jnp.log(jnp.clip(Q, 1e-10, None)).astype(jnp.bfloat16)
    sm = loop(lambda q: jax.nn.softmax(-U + 10.0 * q, axis=-1)
              .astype(q.dtype))
    dt = timeit(lambda: sm(Qb))
    print(f'softmax update x10: {1e3 * dt / b:.3f} ms/img', flush=True)

    # full per-iter body for reference (chunk=2 fused, 10 iters, minus
    # fixed): expect ~7.1 ms/img
    fn = jax.jit(lambda p, i: mf.mean_field_fused(p, i, cfg))
    dt = timeit(lambda: fn(Q, imgs))
    print(f'mean_field_fused chunk-batch x10iter: {1e3 * dt / b:.3f} '
          f'ms/img total', flush=True)


if __name__ == '__main__':
    main()
