"""Grad-CAM engine: fused on-device weight extraction + CAM synthesis.

Reference semantics (replicated exactly — SURVEY.md §7 "hard parts"):

  * The Grad-CAM weights are *input-independent*: computed once on a dummy
    zero image (02_cues/demo.py:117, utilities.py:60-99).  Per class c, the
    gradient of the pre-sigmoid logit y_c w.r.t. the final conv activation
    map is L2-normalized (x / (sqrt(mean(x^2)) + 1e-5)) and then spatially
    averaged into a static F x C weight matrix.
  * CAM for a batch = ReLU(einsum('bhwf,fc->bhwc', feats, W)), masked by the
    classes passing their calibrated thresholds (utilities.py:101-144).
  * The 03c HistoSegNet variant differs: no ReLU before upsampling (ReLU is
    applied after the per-map resize), global max-normalization, and scaling
    by confidence scores (03c_hsn/utilities.py:231-278).

The reference runs one Keras session per class to get the weights
(C sess.run calls) and does the einsum + per-image-per-class cv2.resize on
the host.  Here the whole thing is two jitted calls: one vjp vmapped over
classes for the weights, one fused einsum+mask (+resize) for the CAMs.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from wsss_tpu.ops.filters import resize_bilinear

Array = jax.Array


def gradcam_weights(feats_fn: Callable[[Array], Array],
                    head_fn: Callable[[Array], Array],
                    input_hw: Tuple[int, int],
                    normalize: bool = True) -> Array:
    """Static Grad-CAM weight matrix [F, C] from a dummy zero image.

    feats_fn: image [1,H,W,3] -> final conv activations [1,h,w,F]
    head_fn:  activations [1,h,w,F] -> pre-sigmoid logits [1,C]
    (the reference's y_c = model.layers[-2].output, utilities.py:89)
    """
    x0 = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    feats = feats_fn(x0)
    logits, vjp = jax.vjp(lambda f: head_fn(f)[0], feats)
    num_classes = logits.shape[0]

    def per_class(c):
        ct = jax.nn.one_hot(c, num_classes, dtype=logits.dtype)
        (g,) = vjp(ct)            # [1,h,w,F]
        if normalize:
            g = g / (jnp.sqrt(jnp.mean(jnp.square(g))) + 1e-5)
        return jnp.mean(g[0], axis=(0, 1))  # [F]

    w = jax.vmap(per_class)(jnp.arange(num_classes))  # [C, F]
    return w.T  # [F, C]


@functools.partial(jax.jit, static_argnames=('upsample_hw',))
def grad_cam(feats: Array, weights: Array, is_pass: Array,
             keep_inds: Optional[Array] = None,
             upsample_hw: Optional[Tuple[int, int]] = None) -> Array:
    """02_cues-style CAM: ReLU(feats @ W)[..., keep] * pass-mask.

    feats: [B,h,w,F]; weights: [F,C]; is_pass: bool [B,C'].
    Mirrors 02_cues/utilities.py:128-144 (ReLU before resize).
    Returns [B,H,W,C'] (upsampled if upsample_hw given).
    """
    cams = jnp.maximum(
        jnp.einsum('bhwf,fc->bhwc', feats.astype(jnp.float32), weights), 0.)
    if keep_inds is not None:
        cams = cams[..., keep_inds]
    if upsample_hw is not None:
        cams = resize_bilinear(cams, upsample_hw)
    return cams * is_pass[:, None, None, :].astype(cams.dtype)


@functools.partial(jax.jit, static_argnames=('upsample_hw',))
def grad_cam_confidence(feats: Array, weights: Array, is_pass: Array,
                        conf_scores: Array,
                        upsample_hw: Optional[Tuple[int, int]] = None
                        ) -> Array:
    """03c HistoSegNet CAM variant (03c_hsn/utilities.py:231-278).

    No ReLU before resize; ReLU applied per resized map; global (per-image)
    max-normalize; scale by conf_scores * is_pass.
    """
    cams = jnp.einsum('bhwf,fc->bhwc', feats.astype(jnp.float32), weights)
    if upsample_hw is not None:
        cams = jnp.maximum(resize_bilinear(cams, upsample_hw), 0.)
    cams = cams / jnp.maximum(
        jnp.max(cams, axis=(1, 2, 3), keepdims=True), 1e-7)
    scale = (conf_scores * is_pass.astype(conf_scores.dtype))
    return cams * scale[:, None, None, :]


@functools.partial(jax.jit, static_argnames=('other_ind',))
def cs_gradcam(gradcam: Array, other_ind: int = -1) -> Array:
    """Class-specific Grad-CAM: winner-take-all max-minus-second-max maps
    (03c_hsn/utilities.py:367-397).

    gradcam: [B,H,W,C] (channel-last; the reference is channel-first).
    other_ind: index of the 'Other' channel that passes through unchanged
    (functional types), or -1 for none (morph / VOC / DeepGlobe).
    """
    top2 = jax.lax.top_k(gradcam, 2)[0]
    maxdiff = top2[..., 0] - top2[..., 1]           # [B,H,W]
    maxind = jnp.argmax(gradcam, axis=-1)           # [B,H,W]
    c = gradcam.shape[-1]
    onehot = jax.nn.one_hot(maxind, c, dtype=gradcam.dtype)
    cs = maxdiff[..., None] * onehot
    if other_ind >= 0:
        cs = cs.at[..., other_ind].set(gradcam[..., other_ind])
    return cs
