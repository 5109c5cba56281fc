"""Profile the FUSED mean-field path (the bench headline's CRF stage) on
the real TPU: fixed (grid build + normalizer) vs per-iteration cost inside
one device program, and a chunk-size sweep.

The round-3 chunk=2 tuning was measured at HOST dispatch where every chunk
paid the ~6 ms tunnel gap; inside the fused program (methods/hsn.py) the
gap is gone, so the optimal chunk may differ (bigger chunks = fewer kernel
launches and shared-normalizer reuse, but a larger HBM working set).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_fused_crf.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from wsss_tpu.ops.crf import config as crf_config
from wsss_tpu.ops.crf import meanfield as mf


def sync(x):
    float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def timeit(f, iters=8, warmup=2):
    out = None
    for attempt in range(2):   # axon compile helper intermittently stalls
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
    size, c, b = 321, 21, 8
    cfg = crf_config.hsn_config('VOC2012', 'VGG16')
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (b, size, size, 3))
                       .astype(np.float32))
    probs = jax.nn.softmax(jnp.asarray(
        rng.normal(0, 1, (b, size, size, c)).astype(np.float32)))

    # ---- fixed vs per-iter INSIDE the fused program (batch = chunk) ----
    for n_it in (1, 4, 10):
        cfg_n = crf_config.CRFConfig(*cfg.astuple()[:5], iterations=n_it)
        fn = jax.jit(lambda p, i, c=cfg_n: mf.mean_field_fused(p, i, c))
        dt = timeit(lambda: fn(probs[:2], imgs[:2]))
        print(f'fused chunk=2 iterations={n_it}: '
              f'{1e3 * dt / 2:.2f} ms/img', flush=True)
        if n_it == 1:
            t1 = dt / 2
        elif n_it == 10:
            t10 = dt / 2
    per_iter = (t10 - t1) / 9
    print(f'fit: fixed {1e3 * (t1 - per_iter):.2f} ms + '
          f'{1e3 * per_iter:.2f} ms/iter', flush=True)

    # ---- chunk sweep at batch 8 (production fused headline shape) ------
    orig = mf._mxu_chunk
    for chunk in (1, 2, 4, 8):
        mf._mxu_chunk = lambda b_, n_, c_, k=chunk: k
        try:
            fn = jax.jit(lambda p, i: mf.mean_field_fused(p, i, cfg))
            dt = timeit(lambda: fn(probs, imgs), iters=4)
            print(f'fused b8 chunk={chunk}: {b / dt:.2f} img/s '
                  f'({1e3 * dt / b:.2f} ms/img)', flush=True)
        finally:
            mf._mxu_chunk = orig


if __name__ == '__main__':
    main()
