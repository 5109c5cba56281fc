"""Split mean_field cost at the bench config: fixed (grid build +
normalizer) vs per-iteration, by timing iterations=N for several N and
fitting a line.  Run on the real TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_crf_split.py

Guides the next CRF optimization decision (PLAN.md roadmap: fused
slice+softmax+splat iteration kernel vs fixed-cost reduction).
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

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
    size, c = 321, 21
    cfg = crf_config.hsn_config('VOC2012', 'VGG16')
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (size, size, 3))
                      .astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, (size, size, c))
                    .astype(np.float32))

    pts = []
    for n in [int(a) for a in sys.argv[1:]] or [1, 4, 10]:
        cfg_n = crf_config.CRFConfig(*cfg.astuple()[:5], iterations=n)
        dt = timeit(lambda: mf.mean_field(x, img, cfg_n))
        pts.append((n, dt))
        print(f'iterations={n}: {1e3 * dt:.2f} ms/img', flush=True)
    if len(pts) >= 2:
        (n0, t0), (n1, t1) = pts[0], pts[-1]
        per_iter = (t1 - t0) / (n1 - n0)
        fixed = t0 - n0 * per_iter
        print(f'fit: fixed {1e3 * fixed:.2f} ms + '
              f'{1e3 * per_iter:.2f} ms/iter')


if __name__ == '__main__':
    main()
