"""Dense-CRF kernels vs the exact O(N^2) numpy spec on tiny inputs
(SURVEY.md §4 test strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wsss_tpu.ops.crf import config as crf_config
from wsss_tpu.ops.crf import meanfield, reference


def _toy_problem(h=10, w=10, c=3, seed=0):
    """A structured two-region image with noisy unaries."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = (40, 40, 200)
    img[:, w // 2:] = (200, 40, 40)
    img += rng.normal(0, 8, img.shape).astype(np.float32)
    img = np.clip(img, 0, 255)
    probs = np.full((h, w, c), 0.1, np.float32)
    probs[:, : w // 2, 1] = 0.6
    probs[:, w // 2:, 2] = 0.6
    # noise that flips some pixels
    flip = rng.random((h, w)) < 0.2
    probs[flip] = rng.dirichlet(np.ones(c), size=flip.sum()).astype(
        np.float32)
    return probs, img


def test_gaussian_message_matches_exact():
    """The separable spatial filter must match the dense kernel matrix."""
    probs, img = _toy_problem(8, 8)
    Q = probs / probs.sum(-1, keepdims=True)
    sxy = 2.0
    kg, _ = reference._kernel_matrices(img, sxy, 1.0, 1.0)
    want = reference._sym_message(kg, Q.reshape(-1, 3), True).reshape(Q.shape)
    got = np.asarray(meanfield.gaussian_message(jnp.asarray(Q), sxy))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_bilateral_message_approximates_exact():
    probs, img = _toy_problem(10, 10)
    Q = probs / probs.sum(-1, keepdims=True)
    sxy, srgb = 3.0, 40.0
    _, kb = reference._kernel_matrices(img, 1.0, sxy, srgb)
    want = reference._sym_message(kb, Q.reshape(-1, 3), True).reshape(Q.shape)
    got = np.asarray(meanfield.bilateral_message(
        jnp.asarray(Q), jnp.asarray(img), sxy, srgb))
    # grid approximation: high correlation + bounded error
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.97, corr
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    assert rel < 0.25, rel


@pytest.mark.parametrize('cfg', [
    crf_config.CRFConfig(2, 3, 4, 30, 5, iterations=3),
    crf_config.SEC_TRAIN_DEFAULT,
])
def test_mean_field_matches_exact_argmax(cfg):
    probs, img = _toy_problem(10, 10, seed=3)
    want = reference.mean_field_exact(probs, img, cfg)
    got = np.asarray(meanfield.mean_field(
        jnp.asarray(probs), jnp.asarray(img), cfg))
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.95, agree
    # posterior correlation
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.95, corr


def test_mean_field_denoises():
    """CRF must clean unary noise inside homogeneous color regions."""
    cfg = crf_config.CRFConfig(2, 2, 3, 30, 4, iterations=5)
    probs, img = _toy_problem(12, 12, seed=4)
    Q = np.asarray(meanfield.mean_field(jnp.asarray(probs),
                                        jnp.asarray(img), cfg))
    pred = Q.argmax(-1)
    # left region -> class 1, right -> class 2 despite 20% flipped unaries
    assert (pred[:, :5] == 1).mean() > 0.9
    assert (pred[:, 7:] == 2).mean() > 0.9


def test_masked_classes_stay_masked():
    """Classes zeroed by the caller (non-passing) must keep ~0 posterior
    (dcrf_process passing-classes-only semantics)."""
    cfg = crf_config.CRFConfig(2, 2, 3, 30, 4, iterations=5)
    probs, img = _toy_problem(10, 10, c=3, seed=5)
    probs[..., 0] = 1e-10  # class 0 does not pass
    Q = np.asarray(meanfield.mean_field(jnp.asarray(probs),
                                        jnp.asarray(img), cfg))
    assert Q[..., 0].max() < 1e-3
    assert not np.any(Q.argmax(-1) == 0)


def test_batched_matches_single():
    cfg = crf_config.CRFConfig(2, 2, 3, 30, 4, iterations=2)
    p1, i1 = _toy_problem(8, 8, seed=6)
    p2, i2 = _toy_problem(8, 8, seed=7)
    batch = np.asarray(meanfield.mean_field(
        jnp.asarray(np.stack([p1, p2])), jnp.asarray(np.stack([i1, i2])),
        cfg))
    single = np.asarray(meanfield.mean_field(jnp.asarray(p2),
                                             jnp.asarray(i2), cfg))
    np.testing.assert_allclose(batch[1], single, atol=1e-5)


def test_crf_label_refine_roundtrip():
    cfg = crf_config.IRN_LABEL
    _, img = _toy_problem(10, 10, seed=8)
    labels = np.zeros((10, 10), np.int32)
    labels[:, 5:] = 1
    out = np.asarray(meanfield.crf_label_refine(
        jnp.asarray(img), jnp.asarray(labels), 2, cfg))
    # clean consistent labels on a matching image survive refinement
    assert (out == labels).mean() > 0.9


def test_direct_bilateral_matches_exact():
    """Small-sxy path (DirectBilateral) must be near-exact vs the dense
    kernel (truncation at 3*sxy is the only approximation)."""
    from wsss_tpu.ops.crf.meanfield import DirectBilateral, DenseBilateral, \
        make_bilateral
    probs, img = _toy_problem(10, 10, seed=9)
    Q = probs / probs.sum(-1, keepdims=True)
    sxy, srgb = 1.7, 13.0
    # small inputs route to the exact dense path by default
    assert isinstance(make_bilateral(jnp.asarray(img), sxy, srgb),
                      DenseBilateral)
    for cls in (DirectBilateral, DenseBilateral):
        filt = cls(jnp.asarray(img), sxy, srgb)
        n = jnp.sqrt(1.0 / jnp.maximum(
            filt.filter(jnp.ones((10, 10, 1))), 1e-20))
        got = n * filt.filter(n * jnp.asarray(Q)) - n * n * jnp.asarray(Q)
        _, kb = reference._kernel_matrices(img, 1.0, sxy, srgb)
        want = reference._sym_message(kb, Q.reshape(-1, 3),
                                      True).reshape(Q.shape)
        corr = np.corrcoef(np.asarray(got).ravel(), want.ravel())[0, 1]
        assert corr > 0.995, (cls.__name__, corr)


def test_strategy_selection():
    """Config-driven structure choice, incl. the ADP srgb=4 case where the
    dense grid would need tens of GB."""
    from wsss_tpu.ops.crf.meanfield import (
        make_bilateral, DenseBilateral, DirectBilateral, BilateralGrid)
    small = jnp.zeros((32, 32, 3))
    big = jnp.zeros((224, 224, 3))
    assert isinstance(make_bilateral(small, 40, 13), DenseBilateral)
    assert isinstance(make_bilateral(big, 40, 13), BilateralGrid)
    assert isinstance(make_bilateral(big, 1.7, 13), DirectBilateral)
    # ADP-func HSN config: bi_sxy=10, bi_srgb=4 -> direct window
    filt = make_bilateral(big, 10, 4)
    assert isinstance(filt, DirectBilateral)
    assert filt.cache is None  # too many offsets to cache weight maps


def test_pallas_color_blur_matches_xla():
    """Experimental Pallas fused color blur == XLA strided convs (interior
    cells; margins may differ — they are never splatted/sliced)."""
    import pytest
    if jax.default_backend() != 'tpu':
        # Pallas TPU kernels need interpret mode off-TPU
        from jax.experimental import pallas as pl  # noqa: F401
    from wsss_tpu.ops.crf import pallas_blur
    from wsss_tpu.ops.crf.meanfield import _blur_kernel1d, _flat_conv_last
    gc, C = 9, 5
    f = gc * gc * gc * C
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.random((4, 4, f)).astype(np.float32))
    k = _blur_kernel1d(0.913, 2)
    strides = (gc * gc * C, gc * C, C)
    try:
        got = pallas_blur.blur_color_axes(grid, (k, k, k), strides,
                                          (4, 4, gc, gc, gc))
    except Exception as e:  # interpreter/backend gaps on CPU CI
        pytest.skip(f'pallas unavailable here: {e}')
    want = grid
    for s_ in strides:
        want = _flat_conv_last(want, jnp.asarray(k), s_)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)
