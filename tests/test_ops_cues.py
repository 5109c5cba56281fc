"""Cue assembly + filter ops vs numpy/scipy oracles.

The oracles re-state the reference semantics (02_cues/utilities.py,
adp_cues.py) in plain numpy; they are the spec the jitted ops must match.
"""
import numpy as np
import jax.numpy as jnp
import scipy.ndimage
import scipy.special

from wsss_tpu.ops import cues, filters


# --- numpy oracles -----------------------------------------------------------

def np_resolve_overlap(loc):
    """loc: bool [B,C,H,W] -> one-hot [B,C,H,W] (utilities.py:221-229)."""
    b, c, h, w = loc.shape
    counts = loc.reshape(b, c, -1).sum(-1)
    rank = np.argsort(-counts, axis=1, kind='stable')
    ind = np.zeros((b, h, w), np.int64)
    for i in range(c):
        cur = loc[np.arange(b), rank[:, i]]
        ind *= (cur == 0)
        ind += (rank[:, i] + 1)[:, None, None] * cur
    onehot = np.zeros_like(loc)
    for i in range(c):
        onehot[:, i] = ind == (i + 1)
    return onehot


def test_resolve_overlap_matches_oracle():
    rng = np.random.default_rng(0)
    loc = rng.random((3, 6, 13, 13)) > 0.6
    got = np.asarray(cues.resolve_overlap(
        jnp.asarray(np.moveaxis(loc, 1, -1))))
    want = np_resolve_overlap(loc.astype(np.int64)).astype(bool)
    np.testing.assert_array_equal(np.moveaxis(got, -1, 1), want)


def test_resolve_overlap_disjoint_and_smallest_wins():
    # two overlapping masks: the smaller class must own the overlap
    loc = np.zeros((1, 8, 8, 2), bool)
    loc[0, :6, :6, 0] = True   # large
    loc[0, 2:4, 2:4, 1] = True  # small, inside large
    out = np.asarray(cues.resolve_overlap(jnp.asarray(loc)))
    assert not np.any(out[..., 0] & out[..., 1])
    assert out[0, 3, 3, 1] and not out[0, 3, 3, 0]
    assert out[0, 0, 0, 0]


def test_threshold_semantics():
    rng = np.random.default_rng(1)
    cams = rng.random((4, 5, 5, 3)).astype(np.float32)
    # batch-global max (VOC path, utilities.py:218)
    got = np.asarray(cues.threshold_cams(jnp.asarray(cams), 0.5))
    want = cams > 0.5 * cams.max(axis=(0, 1, 2), keepdims=True)
    np.testing.assert_array_equal(got, want)
    # per-image max (ADP path, adp_cues.py:322-323)
    got = np.asarray(cues.threshold_cams(jnp.asarray(cams), 0.5,
                                         per_image_max=True))
    want = cams > 0.5 * cams.max(axis=(1, 2), keepdims=True)
    np.testing.assert_array_equal(got, want)


def test_bg_cues_lowest_decile():
    rng = np.random.default_rng(2)
    bg = rng.random((2, 21, 21, 4)).astype(np.float32)
    got = np.asarray(cues.bg_cues_lowest_decile(jnp.asarray(bg)))
    for i in range(2):
        g = scipy.ndimage.median_filter(bg[i].sum(-1), 3)
        thr = np.sort(g.ravel())[int(0.1 * 21 * 21)]
        np.testing.assert_array_equal(got[i], g < thr)


def test_gaussian_blur_matches_scipy():
    rng = np.random.default_rng(3)
    x = rng.random((2, 33, 29)).astype(np.float32)
    got = np.asarray(filters.gaussian_blur(jnp.asarray(x), sigma=2.0))
    want = np.stack([scipy.ndimage.gaussian_filter(x[i], 2.0)
                     for i in range(2)])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_median3_matches_scipy():
    rng = np.random.default_rng(4)
    x = rng.random((2, 17, 19)).astype(np.float32)
    got = np.asarray(filters.median3(jnp.asarray(x)))
    want = np.stack([scipy.ndimage.median_filter(x[i], 3)
                     for i in range(2)])
    np.testing.assert_array_equal(got, want)


def test_modify_by_htt_morph():
    """bg channel = 0.75*sigmoid(4*(mean-240)) blurred, minus adipose max
    (02_cues/adp_cues.py:244-302)."""
    rng = np.random.default_rng(5)
    b, h, w, c = 2, 16, 16, 5  # [bg, f1, f2, a1, a2]
    gc = rng.random((b, h, w, c)).astype(np.float32)
    gc[..., 0] = 0
    img = rng.integers(0, 256, (b, 32, 32, 3)).astype(np.float32)
    got = np.asarray(cues.modify_by_htt(
        jnp.asarray(gc), jnp.asarray(img), exception_inds=(3, 4)))
    # oracle
    mean_img = img.mean(-1)
    bg = 0.75 * scipy.special.expit(4 * (mean_img - 240))
    bg = np.stack([scipy.ndimage.gaussian_filter(bg[i], 2) for i in range(b)])
    import jax
    bg = np.array(jax.image.resize(jnp.asarray(bg)[..., None],
                                   (b, h, w, 1), 'bilinear'))[..., 0]
    bg = bg - gc[..., (3, 4)].max(-1)
    np.testing.assert_allclose(got[..., 0], bg, atol=2e-5)
    np.testing.assert_allclose(got[..., 1:], gc[..., 1:], atol=1e-6)


def test_modify_by_htt_func_other_channel():
    rng = np.random.default_rng(6)
    b, h, w, c = 1, 8, 8, 5  # [bg, other, g1, g2, t]
    gc = rng.random((b, h, w, c)).astype(np.float32)
    gc[..., 0] = 0
    gc[..., 1] = 0
    img = np.full((b, 8, 8, 3), 255.0, np.float32)  # white -> strong bg
    adipose = rng.random((b, h, w)).astype(np.float32)
    got = np.asarray(cues.modify_by_htt(
        jnp.asarray(gc), jnp.asarray(img), exception_inds=(2, 3, 4),
        other_ind=1, adipose_cam=jnp.asarray(adipose)))
    # other = max(0.05*(1 - max_c out_after_bg), adipose)
    out_bg = got.copy()
    out_bg[..., 1] = 0
    moh = out_bg.max(-1)
    want_other = np.maximum(0.05 * (1 - moh), adipose)
    np.testing.assert_allclose(got[..., 1], want_other, atol=1e-5)


def test_sparse_roundtrip():
    rng = np.random.default_rng(7)
    loc = rng.random((2, 4, 9, 9)) > 0.8  # [B,C,H,W] candidates
    onehot = np.asarray(cues.resolve_overlap(
        jnp.asarray(np.moveaxis(loc, 1, -1))))
    sparse = cues.cues_to_sparse(onehot)
    assert sparse[0].shape[0] == 3  # (class,row,col) rows
    dense = np.asarray(cues.sparse_to_cues(sparse[0], (4, 9, 9)))
    np.testing.assert_array_equal(dense > 0.5, onehot[0])
