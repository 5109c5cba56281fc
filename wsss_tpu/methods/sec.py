"""Method: SEC — seed, expand, constrain (the reference's 03a SEC path).

Losses re-derived from 03a_sec-dsrg/SEC.py:363-465:
  * seed: cue-masked cross-entropy, normalized by cue count (SEC.py:382-399)
  * expand: global weighted-rank pooling with decay q_fg=0.996 over
    foreground classes / q_bg=0.999 over background, plus a 1-max(prob)
    suppression term for absent classes (SEC.py:401-446)
  * constrain: KL(CRF(softmax) || softmax) (SEC.py:448-465); the CRF runs
    through tf.py_func in the reference (no gradient), reproduced with
    stop_gradient around the on-device mean-field.

The CRF-as-layer operates on the 41x41 seed grid with the original image
bilinearly resized to the seed size (SEC.py:267-268) — on this grid our
dense-exact CRF path runs fully in-graph on the MXU.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wsss_tpu.models.deeplab import MIN_PROB, sp_softmax
from wsss_tpu.ops.crf.meanfield import mean_field
from wsss_tpu.ops.filters import resize_bilinear

Q_FG = 0.996  # SEC.py:421
Q_BG = 0.999  # SEC.py:428


def crf_layer(probs, imgs_seed, cfg):
    """CRF-as-layer (SEC.py:252-284): mean-field on the seed grid, floor at
    MIN_PROB, renormalize, return log-probs.  Non-differentiable in the
    reference (tf.py_func) -> stop_gradient here."""
    q = mean_field(probs, imgs_seed, cfg)
    q = jnp.clip(q, MIN_PROB, None)
    q = q / jnp.sum(q, axis=-1, keepdims=True)
    return jax.lax.stop_gradient(jnp.log(q))


def seed_loss(softmax, cues):
    """SEC.py:382-399. cues: [B,h,w,C] one-hot."""
    count = jnp.maximum(jnp.sum(cues, axis=(1, 2, 3), keepdims=True), 1e-5)
    per = jnp.sum(cues * jnp.log(softmax), axis=(1, 2, 3), keepdims=True)
    return -jnp.mean(per / count)


def expand_loss(softmax, labels):
    """SEC.py:401-446. labels: [B,C] one-hot image-level tags (channel 0 =
    background; stat = labels[:,1:])."""
    b, h, w, c = softmax.shape
    n = h * w
    stat = (labels[:, 1:] > 0).astype(jnp.float32)
    probs_bg = softmax[..., 0].reshape(b, n)
    probs = softmax[..., 1:].reshape(b, n, c - 1)

    probs_sort = jnp.sort(probs, axis=1)  # ascending
    w_fg = jnp.asarray([Q_FG ** i for i in range(n - 1, -1, -1)],
                       jnp.float32)[None, :, None]
    probs_mean = jnp.sum(probs_sort * w_fg / jnp.sum(w_fg), axis=1)

    probs_bg_sort = jnp.sort(probs_bg, axis=1)
    w_bg = jnp.asarray([Q_BG ** i for i in range(n - 1, -1, -1)],
                       jnp.float32)[None, :]
    probs_bg_mean = jnp.sum(probs_bg_sort * w_bg / jnp.sum(w_bg), axis=1)

    probs_max = jnp.max(probs, axis=1)

    loss_1 = -jnp.mean(jnp.sum(
        stat * jnp.log(probs_mean)
        / jnp.maximum(jnp.sum(stat, 1, keepdims=True), 1e-5), axis=1))
    loss_2 = -jnp.mean(jnp.sum(
        (1 - stat) * jnp.log(jnp.maximum(1 - probs_max, 1e-7))
        / jnp.maximum(jnp.sum(1 - stat, 1, keepdims=True), 1e-5), axis=1))
    loss_3 = -jnp.mean(jnp.log(probs_bg_mean))
    return loss_1 + loss_2 + loss_3


def constrain_loss(softmax, crf_log):
    """SEC.py:448-465: KL(exp(crf_log) || softmax)."""
    p = jnp.exp(crf_log)
    return jnp.mean(jnp.sum(p * (crf_log - jnp.log(softmax)), axis=-1))


def sec_losses(logits, cues, labels, imgs_raw, crf_cfg, img_mean
               ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full SEC objective from FCN logits [B,41,41,C].

    imgs_raw: [B,H,W,3] RGB 0..255 (the reference reconstructs the image
    by adding back the mean before the CRF, SEC.py:267; we carry the raw
    image instead — identical values).
    """
    sm = sp_softmax(logits)
    seed_hw = logits.shape[1:3]
    imgs_seed = resize_bilinear(imgs_raw, seed_hw)
    crf_log = crf_layer(sm, imgs_seed, crf_cfg)
    l_seed = seed_loss(sm, cues)
    l_expand = expand_loss(sm, labels)
    l_constrain = constrain_loss(sm, crf_log)
    total = l_seed + l_expand + l_constrain
    return total, {'seed': l_seed, 'expand': l_expand,
                   'constrain': l_constrain}
