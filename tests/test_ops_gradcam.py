import jax
import jax.numpy as jnp
import numpy as np

from wsss_tpu.ops import gradcam


def test_weights_linear_head_analytic():
    """For a GAP->Dense head, grad of logit_c wrt feats is W[:,c]/(h*w)
    everywhere; after L2-normalize + spatial mean the weight column is the
    normalized W column (02_cues/utilities.py:60-99 semantics)."""
    rng = np.random.default_rng(0)
    f, c, h, w = 7, 4, 5, 5
    W = rng.normal(size=(f, c)).astype(np.float32)

    def feats_fn(x):  # dummy: tile input channel 0 into F channels
        return jnp.zeros((1, h, w, f))

    def head_fn(feats):
        return jnp.mean(feats, axis=(1, 2)) @ jnp.asarray(W)

    got = np.asarray(gradcam.gradcam_weights(feats_fn, head_fn, (h, w)))
    g = np.broadcast_to(W[None, None], (h, w, f, c)) / 1.0  # grad wrt feats
    # d(mean(feats) @ W)[c] / d feats[h,w,f] = W[f,c]/(h*w)
    g = W / (h * w)
    want = np.zeros_like(W)
    for cc in range(c):
        gc = np.broadcast_to(g[:, cc], (h, w, f)) * 0 + g[:, cc]
        gc = np.broadcast_to(g[:, cc][None, None], (1, h, w, f))
        norm = np.sqrt(np.mean(gc ** 2)) + 1e-5
        want[:, cc] = np.mean(gc / norm, axis=(0, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_weights_match_jacrev_nonlinear():
    """Against jax.jacrev for a nonlinear head."""
    rng = jax.random.PRNGKey(1)
    f, c, h, w = 6, 3, 4, 4
    W1 = jax.random.normal(rng, (f, 8))
    W2 = jax.random.normal(jax.random.PRNGKey(2), (8, c))

    def feats_fn(x):
        # non-trivial function of the dummy zero image
        return jnp.ones((1, h, w, f)) * 0.3

    def head_fn(feats):
        z = jnp.tanh(jnp.max(feats, axis=(1, 2)) @ W1)
        return z @ W2

    got = gradcam.gradcam_weights(feats_fn, head_fn, (h, w))
    feats = feats_fn(None)
    J = jax.jacrev(lambda ft: head_fn(ft)[0])(feats)  # [C,1,h,w,F]
    want = []
    for cc in range(c):
        g = J[cc]
        g = g / (jnp.sqrt(jnp.mean(jnp.square(g))) + 1e-5)
        want.append(jnp.mean(g[0], axis=(0, 1)))
    want = jnp.stack(want, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-6)


def test_grad_cam_einsum_mask():
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    W = rng.normal(size=(5, 3)).astype(np.float32)
    is_pass = np.array([[1, 0, 1], [0, 1, 0]], bool)
    got = np.asarray(gradcam.grad_cam(jnp.asarray(feats), jnp.asarray(W),
                                      jnp.asarray(is_pass)))
    want = np.maximum(np.einsum('bhwf,fc->bhwc', feats, W), 0)
    want = want * is_pass[:, None, None, :]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_grad_cam_confidence_normalization():
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    W = rng.normal(size=(5, 3)).astype(np.float32)
    is_pass = np.ones((2, 3), bool)
    conf = rng.random((2, 3)).astype(np.float32)
    got = np.asarray(gradcam.grad_cam_confidence(
        jnp.asarray(feats), jnp.asarray(W), jnp.asarray(is_pass),
        jnp.asarray(conf), upsample_hw=(8, 8)))
    assert got.shape == (2, 8, 8, 3)
    # per-image max of un-scaled cams is 1 -> scaled max <= max conf
    for i in range(2):
        assert got[i].max() <= conf[i].max() + 1e-5


def test_cs_gradcam_winner_take_all():
    rng = np.random.default_rng(5)
    gc = rng.random((1, 6, 6, 4)).astype(np.float32)
    got = np.asarray(gradcam.cs_gradcam(jnp.asarray(gc)))
    srt = np.sort(gc, axis=-1)
    maxdiff = srt[..., -1] - srt[..., -2]
    maxind = gc.argmax(-1)
    for cc in range(4):
        want = maxdiff * (maxind == cc)
        np.testing.assert_allclose(got[..., cc], want, rtol=1e-6)
    # 'Other' channel passthrough
    got2 = np.asarray(gradcam.cs_gradcam(jnp.asarray(gc), other_ind=1))
    np.testing.assert_allclose(got2[..., 1], gc[..., 1])
