"""Weak-cue assembly: thresholding, overlap resolution, background synthesis.

Device-resident replacements for the host numpy loops in
02_cues/utilities.py:183-278 and 02_cues/adp_cues.py:244-339.  All ops are
batched [B, H, W, C] channel-last and jit/vmap friendly (static class
counts, fori loops over the class axis).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from wsss_tpu.ops.filters import gaussian_blur, median3, resize_bilinear

Array = jax.Array


@jax.jit
def resolve_overlap(localization: Array) -> Array:
    """Largest-mask-first overlap resolution (02_cues/utilities.py:221-229).

    localization: bool [B,H,W,C] per-class candidate masks.
    Classes are processed from largest to smallest pixel count; each
    class's mask overwrites previously assigned pixels, so the final owner
    of a contested pixel is the *smallest* covering class.  Returns the
    disjoint one-hot bool [B,H,W,C].
    """
    loc = localization.astype(jnp.int32)
    counts = jnp.sum(loc, axis=(1, 2))                  # [B,C]
    order = jnp.argsort(-counts, axis=1, stable=True)   # [B,C] large->small
    b, h, w, c = loc.shape
    ind0 = jnp.zeros((b, h, w), jnp.int32)

    def body(i, ind):
        cls = order[:, i]                               # [B]
        cur = jnp.take_along_axis(
            loc, cls[:, None, None, None], axis=3)[..., 0]  # [B,H,W]
        ind = ind * (cur == 0) + (cls + 1)[:, None, None] * cur
        return ind

    ind = jax.lax.fori_loop(0, c, body, ind0)
    onehot = jax.nn.one_hot(ind - 1, c, dtype=jnp.bool_, axis=-1)
    return onehot & (ind > 0)[..., None]


@functools.partial(jax.jit, static_argnames=('per_image_max',))
def threshold_cams(cams: Array, thresh: float | Array,
                   per_image_max: bool = False) -> Array:
    """Candidate masks: cam > thresh * max(cam).

    per_image_max=False reproduces 02_cues/utilities.py:218,262 where the
    max is taken over the *whole batch* per class (a reference quirk that
    makes cues batch-composition dependent); True reproduces the ADP path
    (adp_cues.py:322-323, per-image per-class max).
    """
    if per_image_max:
        m = jnp.max(cams, axis=(1, 2), keepdims=True)
    else:
        m = jnp.max(cams, axis=(0, 1, 2), keepdims=True)
    return cams > thresh * m


@jax.jit
def bg_cues_lowest_decile(bg_cams: Array) -> Array:
    """VOC background cues (02_cues/utilities.py:211-215).

    bg_cams: [B,H,W,C_bg] activations of the background network.  Sum over
    classes, 3x3 median filter, then mark the lowest decile of values.
    Returns bool [B,H,W].
    """
    g = median3(jnp.sum(bg_cams, axis=-1))              # [B,H,W]
    b, h, w = g.shape
    flat = jnp.sort(g.reshape(b, -1), axis=1)
    thr = flat[:, int(0.1 * h * w)]
    return g < thr[:, None, None]


def fg_cues(cams: Array, thresh: float,
            per_image_max: bool = False) -> Array:
    """get_fg_cues (02_cues/utilities.py:236-278): threshold + overlap.
    cams: [B,H,W,C] thresholded Grad-CAMs. Returns one-hot bool [B,H,W,C].
    """
    return resolve_overlap(threshold_cams(cams, thresh, per_image_max))


def fgbg_cues(fg_cams: Array, bg_cams: Array, thresh: float,
              per_image_max: bool = False) -> Array:
    """get_fgbg_cues (02_cues/utilities.py:183-234): channel 0 = bg from
    the bg net's lowest decile, channels 1.. = fg.  Returns [B,H,W,C+1]."""
    bg = bg_cues_lowest_decile(bg_cams)
    fg = threshold_cams(fg_cams, thresh, per_image_max)
    loc = jnp.concatenate([bg[..., None], fg], axis=-1)
    return resolve_overlap(loc)


# ---------------------------------------------------------------------------
# ADP background / other-tissue synthesis (modify_by_htt)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=('bg_ind', 'other_ind', 'background_max',
                     'other_tissue_mult', 'relu_bg'))
def modify_by_htt(gradcam: Array, images: Array,
                  exception_inds: Sequence[int],
                  bg_ind: int = 0,
                  other_ind: Optional[int] = None,
                  adipose_cam: Optional[Array] = None,
                  background_max: float = 0.75,
                  other_tissue_mult: float = 0.05,
                  relu_bg: bool = False) -> Array:
    """Synthesize Background (and Other) channels for ADP
    (02_cues/adp_cues.py:244-302, 03c_hsn/utilities.py:306-364).

    gradcam: [B,h,w,C] with the bg (/other) channels present but unset.
    images: [B,H,W,3] unnormalized RGB (0..255) at classifier input size.
    exception_inds: channel indices whose activation is subtracted from the
        synthetic background (adipose for morph, G.O/G.N/T for func).
    adipose_cam: [B,h,w] max adipose activation (func only).
    relu_bg: the 03b on-device variant clamps bg at 0 for morph
        (common_cam.py:48) while the 02_cues host variant does not; both
        behaviors are exposed.

    bg = background_max * sigmoid(4*(mean(img) - 240)), Gaussian σ=2,
    resized to the CAM grid, minus the max exception activation.
    other = max(other_tissue_mult*(1 - max_c cam), adipose_cam).
    """
    b, h, w, c = gradcam.shape
    mean_img = jnp.mean(images.astype(jnp.float32), axis=-1)   # [B,H,W]
    bg = background_max * jax.nn.sigmoid(4.0 * (mean_img - 240.0))
    bg = gaussian_blur(bg, sigma=2.0)
    if bg.shape[1:] != (h, w):
        bg = resize_bilinear(bg[..., None], (h, w))[..., 0]
    exc = jnp.max(gradcam[..., jnp.asarray(exception_inds)], axis=-1)
    bg = bg - exc
    if relu_bg:
        bg = jnp.maximum(bg, 0.)
    out = gradcam.at[..., bg_ind].set(bg)
    if other_ind is not None:
        moh = jnp.max(out, axis=-1)                            # [B,h,w]
        other = other_tissue_mult * (1.0 - moh)
        if adipose_cam is not None:
            other = jnp.maximum(other, adipose_cam)
        out = out.at[..., other_ind].set(other)
    return out


def cues_to_sparse(onehot) -> Tuple:
    """Pack a one-hot cue volume into the reference's pickle format:
    '{i}_cues' = np.where(onehot) as a 3xN (class,row,col) array
    (02_cues/utilities.py:231-233).  Host-side (ragged output)."""
    import numpy as np
    oh = np.asarray(onehot)
    out = []
    for i in range(oh.shape[0]):
        # reference layout is [C,H,W]; ours is [H,W,C]
        out.append(np.array(np.where(np.moveaxis(oh[i], -1, 0))))
    return tuple(out)


def sparse_to_cues(sparse, shape_chw) -> 'jnp.ndarray':
    """Inverse of cues_to_sparse for one image -> dense [H,W,C] float."""
    import numpy as np
    c, h, w = shape_chw
    dense = np.zeros((h, w, c), np.float32)
    if sparse.size:
        dense[sparse[1], sparse[2], sparse[0]] = 1.0
    return jnp.asarray(dense)
