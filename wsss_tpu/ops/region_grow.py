"""DSRG seeded region growing as an on-device flood fill.

Replaces the reference's per-image CPU path — ``multiprocessing.Pool.map``
over ``single_generate_seed_step`` with python connected-component labeling
(03a_sec-dsrg/DSRG.py:7-62,339-372, missing lib/CC_labeling_8) — with a
jitted fixpoint dilation that runs inside the training step.

Semantics (DSRG.py:7-62, preserved exactly):
  1. existing_prob = softmax * image tags; a pixel is a growth candidate
     for class c iff c is the argmax over tagged classes AND its prob
     passes th_f (foreground) / th_b (background).
  2. For each tagged class (ascending order!), every candidate pixel
     8-connected to an existing cue of that class becomes a new cue —
     except pixels already cued to a *different* class.
  3. Classes are grown sequentially: class c's additions are visible to
     class c+1's conflict check (the reference mutates `cue` in its class
     loop).

Connected-component labeling is replaced by seeded flood fill (dilate the
seed set inside the candidate mask until fixpoint): a component "contains a
cue" iff its pixels are reachable from a cue by 8-connected steps inside
the mask — the same set, without labeling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _dilate8(mask: Array) -> Array:
    """8-connected binary dilation of [B,H,W] via 3x3 max pool."""
    return jax.lax.reduce_window(
        mask, False, jax.lax.bitwise_or, (1, 3, 3), (1, 1, 1),
        [(0, 0), (1, 1), (1, 1)])


def _flood_fill(seed: Array, mask: Array) -> Array:
    """Pixels of `mask` reachable from `seed` by 8-connected steps
    ([B,H,W] bool each), via fixpoint dilation under lax.while_loop."""
    seed = seed & mask

    def cond(state):
        grow, prev_n = state
        return jnp.sum(grow) != prev_n

    def body(state):
        grow, _ = state
        n = jnp.sum(grow)
        return (_dilate8(grow) & mask) | grow, n

    grow, _ = jax.lax.while_loop(cond, body, (seed, jnp.int32(-1)))
    return grow


@functools.partial(jax.jit, static_argnames=('th_f', 'th_b'))
def region_grow(cues: Array, probs: Array, tags: Array,
                th_f: float = 0.5, th_b: float = 0.7) -> Array:
    """Grow weak cues by seeded region growing.

    cues:  [B,H,W,C] float/bool one-hot weak cues (channel 0 = background).
    probs: [B,H,W,C] softmax output.
    tags:  [B,C] image-level labels (bg channel set for every image, as in
           the cue pickle's '{i}_labels' with bg prepended).
    Returns the grown cues [B,H,W,C] float32.
    """
    b, h, w, c = cues.shape
    cues_b = cues > 0.5
    existing = probs * tags[:, None, None, :]
    argmax_c = jnp.argmax(existing, axis=-1)                    # [B,H,W]
    is_fg_arg = argmax_c > 0
    fg_pass = jnp.any(existing[..., 1:] > th_f, axis=-1)
    bg_pass = existing[..., 0] > th_b
    passes = jnp.where(is_fg_arg, fg_pass, bg_pass)
    # candidate mask per class: argmax class AND threshold pass
    cand = jax.nn.one_hot(argmax_c, c, dtype=jnp.bool_) & \
        passes[..., None] & (tags[:, None, None, :] > 0.5)

    def grow_class(ci, cur):                                    # cur: bool
        mask = cand[..., ci]
        seed = cur[..., ci]
        reach = _flood_fill(seed, mask)
        cued_elsewhere = (jnp.sum(cur, axis=-1) == 1) & ~seed
        new_c = seed | (reach & ~cued_elsewhere)
        return cur.at[..., ci].set(new_c)

    out = jax.lax.fori_loop(0, c, grow_class, cues_b)
    return out.astype(jnp.float32)
