"""Method: DSRG — deep seeded region growing (the reference's 03a DSRG).

Losses from 03a_sec-dsrg/DSRG.py:470-518:
  * balanced seed: cross-entropy vs the *grown* cues, background and
    foreground normalized separately (DSRG.py:479-499)
  * constrain: identical to SEC (DSRG.py:501-518)

The region growing (DSRG.py:7-62,339-372: tf.py_func -> multiprocessing
pool -> python connected components, per image per step) runs here as the
jitted on-device flood fill (wsss_tpu.ops.region_grow) inside the training
step, under stop_gradient like the reference's py_func.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from wsss_tpu.methods.sec import constrain_loss, crf_layer
from wsss_tpu.models.deeplab import sp_softmax
from wsss_tpu.ops.filters import resize_bilinear
from wsss_tpu.ops.region_grow import region_grow


def balanced_seed_loss(softmax, cues):
    """DSRG.py:479-499: bg and fg seed CE normalized separately."""
    count_bg = jnp.sum(cues[..., :1], axis=(1, 2, 3), keepdims=True)
    loss_bg = -jnp.mean(jnp.sum(
        cues[..., :1] * jnp.log(softmax[..., :1]),
        axis=(1, 2, 3), keepdims=True) / (count_bg + 1e-8))
    count_fg = jnp.sum(cues[..., 1:], axis=(1, 2, 3), keepdims=True)
    loss_fg = -jnp.mean(jnp.sum(
        cues[..., 1:] * jnp.log(softmax[..., 1:]),
        axis=(1, 2, 3), keepdims=True) / (count_fg + 1e-8))
    return loss_bg + loss_fg


def dsrg_losses(logits, cues, labels, imgs_raw, crf_cfg,
                th_f: float = 0.5, th_b: float = 0.7
                ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full DSRG objective from FCN logits [B,41,41,C].

    labels: [B,C] image tags incl. background channel (always 1)."""
    sm = sp_softmax(logits)
    new_cues = jax.lax.stop_gradient(
        region_grow(cues, jax.lax.stop_gradient(sm), labels,
                    th_f=th_f, th_b=th_b))
    seed_hw = logits.shape[1:3]
    imgs_seed = resize_bilinear(imgs_raw, seed_hw)
    crf_log = crf_layer(sm, imgs_seed, crf_cfg)
    l_seed = balanced_seed_loss(sm, new_cues)
    l_constrain = constrain_loss(sm, crf_log)
    total = l_seed + l_constrain
    return total, {'seed': l_seed, 'constrain': l_constrain,
                   'grown_px': jnp.sum(new_cues) - jnp.sum(cues)}
