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


def test_grid_fidelity_vs_permutohedral():
    """The default grid mode must match the exact mean field at least as
    well as the permutohedral lattice (= pydensecrf fidelity) at the
    label level — this justifies 'fast' as the inference default."""
    import jax
    from wsss_tpu.ops.crf.meanfield import BilateralGrid, gaussian_message

    def toy(h, w, c, seed):
        rng = np.random.default_rng(seed)
        img = rng.normal(128, 18, (h, w, 3)).astype(np.float32)
        for i in range(0, h, 7):
            img[np.arange(h), (np.arange(h) + i) % w] = (220, 60, 60)
        img = np.clip(img, 0, 255)
        probs = rng.dirichlet(np.ones(c) * 5, (h, w)).astype(np.float32)
        probs[img[..., 0] > 180] += np.eye(c, dtype=np.float32)[1] * 0.12
        probs = probs / probs.sum(-1, keepdims=True)
        return probs, img

    cfg = crf_config.CRFConfig(1.0, 3, 3.0, 20, 10, iterations=10)
    probs, img = toy(36, 36, 5, 0)
    want = reference.mean_field_exact(probs, img, cfg).argmax(-1)
    perm = native.mean_field_native(probs, img, cfg).argmax(-1)
    perm_agree = (perm == want).mean()

    U = -jnp.log(jnp.clip(jnp.asarray(probs), 1e-10, None))
    Q = jax.nn.softmax(-U, -1)
    filt = BilateralGrid(jnp.asarray(img), cfg.bi_sxy, cfg.bi_srgb,
                         mode='fast')
    ones = jnp.ones(probs.shape[:2] + (1,))
    nb = jax.lax.rsqrt(jnp.maximum(filt.filter(ones), 1e-20))
    for _ in range(cfg.iterations):
        mb = nb * filt.filter(nb * Q) - nb * nb * Q
        mg = gaussian_message(Q, cfg.g_sxy)
        Q = jax.nn.softmax(-U + cfg.g_compat * mg + cfg.bi_compat * mb, -1)
    grid_agree = (np.asarray(Q.argmax(-1)) == want).mean()
    assert grid_agree >= perm_agree - 0.02, (grid_agree, perm_agree)
    assert grid_agree > 0.85, grid_agree
