"""Native C++ permutohedral CRF vs the exact spec and the TPU mean-field.

Three independent implementations of the same algorithm (numpy-exact,
TPU bilateral-grid, C++ permutohedral) must agree on small inputs.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from wsss_tpu.ops.crf import config as crf_config
from wsss_tpu.ops.crf import meanfield, reference

native = pytest.importorskip('wsss_tpu.ops.crf.native')

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native toolchain unavailable')


def _toy(h=12, w=12, c=3, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = (30, 30, 210)
    img[:, w // 2:] = (210, 30, 30)
    img += rng.normal(0, 6, img.shape).astype(np.float32)
    img = np.clip(img, 0, 255)
    probs = rng.dirichlet(np.ones(c), (h, w)).astype(np.float32)
    probs[:, : w // 2, 1] += 0.5
    probs[:, w // 2:, 2] += 0.5
    probs /= probs.sum(-1, keepdims=True)
    return probs, img


def test_permutohedral_filter_vs_dense_kernel():
    rng = np.random.default_rng(1)
    n = 150
    pos = rng.uniform(0, 5, (n, 3)).astype(np.float32)
    vals = rng.random((n, 2)).astype(np.float32)
    got = native.permutohedral_filter(pos, vals)
    K = np.exp(-0.5 * ((pos[:, None] - pos[None]) ** 2).sum(-1))
    want = K @ vals
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.98, corr


def test_native_mean_field_matches_exact():
    cfg = crf_config.CRFConfig(2, 3, 4, 30, 5, iterations=3)
    probs, img = _toy(seed=2)
    want = reference.mean_field_exact(probs, img, cfg)
    got = native.mean_field_native(probs, img, cfg)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.9, agree
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.9, corr


def test_native_matches_tpu_mean_field():
    """CPU permutohedral and TPU grid paths agree on the posterior."""
    cfg = crf_config.CRFConfig(2, 2, 3, 30, 4, iterations=4)
    probs, img = _toy(seed=3)
    cpu = native.mean_field_native(probs, img, cfg)
    tpu = np.asarray(meanfield.mean_field(jnp.asarray(probs),
                                          jnp.asarray(img), cfg))
    agree = (cpu.argmax(-1) == tpu.argmax(-1)).mean()
    assert agree >= 0.9, agree


def test_native_denoises():
    cfg = crf_config.CRFConfig(2, 2, 3, 30, 4, iterations=5)
    probs, img = _toy(seed=4)
    q = native.mean_field_native(probs, img, cfg)
    pred = q.argmax(-1)
    assert (pred[:, :5] == 1).mean() > 0.8
    assert (pred[:, 7:] == 2).mean() > 0.8
