"""DSRG region growing vs a numpy oracle implementing the reference
semantics (DSRG.py:7-62) with scipy connected components."""
import numpy as np
import jax.numpy as jnp
import scipy.ndimage

from wsss_tpu.ops.region_grow import region_grow


def np_region_grow_single(tag, cue, prob, th_f=0.5, th_b=0.7):
    """Oracle for one image. tag: [C]; cue, prob: [H,W,C]."""
    cue = cue.copy().astype(np.float32)
    existing = prob * tag[None, None, :]
    argmax_c = existing.argmax(-1) + 1
    fg_mask = (argmax_c > 1).astype(np.uint8)
    fg_th = (np.sum(existing[..., 1:] > th_f, -1) > 0.5).astype(np.uint8)
    bg_th = (existing[..., 0] > th_b).astype(np.uint8)
    label_map = (fg_th * fg_mask + bg_th * (1 - fg_mask)) * argmax_c
    for c in np.where(tag > 0.5)[0]:
        mat = (label_map == c + 1).astype(int)
        labels, _ = scipy.ndimage.label(mat, structure=np.ones((3, 3)))
        labels = labels.astype(np.int64)
        high = set()
        for (x, y), v in np.ndenumerate(mat):
            if v == 1 and cue[x, y, c] == 1:
                high.add(labels[x, y])
            elif v == 1 and np.sum(cue[x, y, :]) == 1:
                labels[x, y] = -1
        for (x, y), v in np.ndenumerate(labels):
            if v in high and v > 0:
                cue[x, y, c] = 1
    return cue


def _random_case(seed, b=2, h=12, w=12, c=4):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 2, (b, h, w, c)).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    tag = np.zeros((b, c), np.float32)
    tag[:, 0] = 1  # bg always tagged
    for i in range(b):
        tag[i, rng.choice(np.arange(1, c), 2, replace=False)] = 1
    cue = np.zeros((b, h, w, c), np.float32)
    for i in range(b):
        for _ in range(6):
            y, x = rng.integers(0, h), rng.integers(0, w)
            cl = rng.choice(np.where(tag[i] > 0.5)[0])
            if cue[i, y, x].sum() == 0:
                cue[i, y, x, cl] = 1
    return tag, cue, prob


def test_region_grow_matches_oracle():
    for seed in range(4):
        tag, cue, prob = _random_case(seed)
        got = np.asarray(region_grow(jnp.asarray(cue), jnp.asarray(prob),
                                     jnp.asarray(tag)))
        want = np.stack([np_region_grow_single(tag[i], cue[i], prob[i])
                         for i in range(cue.shape[0])])
        np.testing.assert_array_equal(got, want, err_msg=f'seed={seed}')


def test_grow_only_connected():
    """A high-prob region NOT touching any cue must not be grown."""
    h = w = 9
    c = 2
    prob = np.zeros((1, h, w, c), np.float32)
    prob[..., 0] = 0.9
    # two fg blobs, only one contains the cue
    prob[0, 0:3, 0:3, 1] = 0.9
    prob[0, 0:3, 0:3, 0] = 0.1
    prob[0, 6:9, 6:9, 1] = 0.9
    prob[0, 6:9, 6:9, 0] = 0.1
    cue = np.zeros((1, h, w, c), np.float32)
    cue[0, 1, 1, 1] = 1
    tag = np.ones((1, c), np.float32)
    got = np.asarray(region_grow(jnp.asarray(cue), jnp.asarray(prob),
                                 jnp.asarray(tag)))
    assert got[0, 0:3, 0:3, 1].sum() == 9    # connected blob fully grown
    assert got[0, 6:9, 6:9, 1].sum() == 0    # disconnected blob untouched


def test_conflicting_cue_pixels_not_overwritten():
    h = w = 5
    c = 3
    prob = np.zeros((1, h, w, c), np.float32)
    prob[..., 1] = 0.9  # class 1 dominates everywhere
    cue = np.zeros((1, h, w, c), np.float32)
    cue[0, 2, 2, 1] = 1      # seed for class 1
    cue[0, 2, 3, 2] = 1      # pixel already cued to class 2
    tag = np.ones((1, c), np.float32)
    got = np.asarray(region_grow(jnp.asarray(cue), jnp.asarray(prob),
                                 jnp.asarray(tag)))
    assert got[0, 2, 3, 1] == 0      # not stolen by class 1
    assert got[0, 2, 3, 2] == 1      # original cue preserved
    assert got[0, 0, 0, 1] == 1      # rest of the grid grown to class 1
