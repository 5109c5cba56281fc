"""Spatially-sharded CRF vs the single-device path on the virtual mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from wsss_tpu.ops.crf.config import CRFConfig
from wsss_tpu.ops.crf.meanfield import (DirectBilateral, gaussian_message,
                                        _mean_field_single)
from wsss_tpu.ops.crf.sharded import mean_field_sharded
from wsss_tpu.parallel.mesh import make_mesh


def _problem(h=128, w=32, c=4, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    img[: h // 2] = (50, 120, 200)
    img[h // 2:] = (200, 120, 50)
    img += rng.normal(0, 7, img.shape).astype(np.float32)
    img = np.clip(img, 0, 255)
    probs = rng.dirichlet(np.ones(c), (h, w)).astype(np.float32)
    return jnp.asarray(probs), jnp.asarray(img)


def test_sharded_matches_single_device():
    cfg = CRFConfig(g_sxy=1.0, g_compat=2, bi_sxy=1.5, bi_srgb=30,
                    bi_compat=4, iterations=3)
    probs, img = _problem()
    mesh = make_mesh(8, ('data',))

    got = np.asarray(mean_field_sharded(probs, img, cfg, mesh))

    # single-device oracle with the same structures (direct window +
    # separable gaussian)
    U = -jnp.log(jnp.clip(probs, 1e-10, None))
    Q = jax.nn.softmax(-U, -1)
    filt = DirectBilateral(img, cfg.bi_sxy, cfg.bi_srgb)
    ones = jnp.ones(probs.shape[:2] + (1,))
    nb = jax.lax.rsqrt(jnp.maximum(filt.filter(ones), 1e-20))
    for _ in range(cfg.iterations):
        mb = nb * filt.filter(nb * Q) - nb * nb * Q
        mg = gaussian_message(Q, cfg.g_sxy)
        Q = jax.nn.softmax(-U + cfg.g_compat * mg + cfg.bi_compat * mb, -1)
    want = np.asarray(Q)

    np.testing.assert_allclose(got, want, atol=2e-4)
    # labels identical
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_sharded_shard_count_guard():
    cfg = CRFConfig(g_sxy=2.0, g_compat=2, bi_sxy=4.0, bi_srgb=30,
                    bi_compat=4, iterations=1)
    probs, img = _problem(h=32)
    mesh = make_mesh(8, ('data',))
    # halo (2*12=24) > shard height (4) must be rejected loudly
    import pytest
    with pytest.raises(AssertionError, match='halo'):
        mean_field_sharded(probs, img, cfg, mesh)
