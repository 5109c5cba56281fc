"""TPU-native dense-CRF mean-field inference.

Replaces the reference's only native algorithmic dependency — pydensecrf's
C++ permutohedral lattice (03c_hsn/utilities.py:399-445, SEC.py:252-284 CRF
layer, DSRG.py:303-337, cam_to_ir_label.py:35) — with a jit-compatible
on-device implementation, so the SEC/DSRG constrain loss stays in-graph and
HistoSegNet post-processing runs batched on the accelerator.

Kernels:
  * spatial Gaussian  exp(-|dp|^2 / 2 sxy^2)  — computed *exactly* by a
    truncated separable convolution (the reference's lattice only
    approximates it).
  * bilateral  exp(-|dp|^2/2 sxy^2 - |dI|^2/2 srgb^2) — approximated by a
    5-D bilateral grid (splat -> separable Gaussian blur -> slice), the
    TPU-friendly equivalent of the permutohedral lattice (SURVEY.md §7
    plan B).  Splat/slice use multilinear weights over the 32 hypercube
    corners, looped so peak memory stays O(N) per corner.

Both kernels use symmetric normalization (pydensecrf default
NORMALIZE_SYMMETRIC): message = n * (K @ (n*Q)), n = 1/sqrt(K @ 1), with
the self term n_i^2 Q_i removed (exclude_self=True, the paper's j != i
sum; set False for the variant that keeps it).

Update (Potts compatibility, label-constant terms dropped):
    Q <- softmax(-U + g_compat * m_g(Q) + bi_compat * m_b(Q)),  U = -log p.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Gaussian blur applied inside the bilateral grid, in grid units.  With
# multilinear splat+slice (each adds ~1/6 variance per axis) this makes the
# effective kernel match exp(-d^2/2 sigma^2); calibrated against the exact
# O(N^2) reference in tests/test_crf.py.
_GRID_BLUR_SIGMA = 0.816
_GRID_BLUR_RADIUS = 2


def _blur_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    return np.exp(-0.5 * (x / sigma) ** 2).astype(np.float32)


def _sep_conv(x: Array, k: Array, axis: int) -> Array:
    """Unnormalized 1-D convolution along `axis`, zero-padded."""
    r = (k.shape[0] - 1) // 2
    moved = jnp.moveaxis(x, axis, -1)
    pad = [(0, 0)] * (moved.ndim - 1) + [(r, r)]
    padded = jnp.pad(moved, pad)
    n = moved.shape[-1]
    out = sum(k[i] * jax.lax.dynamic_slice_in_dim(padded, i, n, -1)
              for i in range(2 * r + 1))
    return jnp.moveaxis(out, -1, axis)


# ---------------------------------------------------------------------------
# Exact spatial Gaussian message
# ---------------------------------------------------------------------------

def _gaussian_filter_raw(x: Array, sxy: float) -> Array:
    """K @ x with K = exp(-|dp|^2/2 sxy^2) (self weight 1), truncated at
    radius ceil(4*sxy). x: [H,W,C]."""
    radius = max(1, int(np.ceil(4.0 * sxy)))
    d = np.arange(-radius, radius + 1, dtype=np.float64)
    k = jnp.asarray(np.exp(-0.5 * (d / sxy) ** 2).astype(np.float32))
    x = _sep_conv(x, k, 0)
    return _sep_conv(x, k, 1)


def gaussian_message(Q: Array, sxy: float,
                     exclude_self: bool = True) -> Array:
    ones = jnp.ones(Q.shape[:2] + (1,), Q.dtype)
    n = jax.lax.rsqrt(jnp.maximum(_gaussian_filter_raw(ones, sxy), 1e-20))
    out = n * _gaussian_filter_raw(n * Q, sxy)
    if exclude_self:
        out = out - (n * n) * Q
    return out


# ---------------------------------------------------------------------------
# Bilateral grid message
# ---------------------------------------------------------------------------

def _grid_shape(hw: Tuple[int, int], sxy: float, srgb: float,
                vrange: float = 255.0) -> Tuple[int, ...]:
    gy = int(np.floor((hw[0] - 1) / sxy)) + 3
    gx = int(np.floor((hw[1] - 1) / sxy)) + 3
    gc = int(np.floor(vrange / srgb)) + 3
    return (gy, gx, gc, gc, gc)


def _bilateral_filter_raw(x: Array, img: Array, sxy: float, srgb: float
                          ) -> Array:
    """Approximate K @ x for the bilateral kernel via a 5-D grid.
    x: [H,W,C]; img: [H,W,3] in 0..255."""
    h, w, c = x.shape
    gshape = _grid_shape((h, w), sxy, srgb)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # +1 offset leaves a one-cell margin for the multilinear upper corner
    coords = [jnp.asarray(yy.ravel()) / sxy + 1.0,
              jnp.asarray(xx.ravel()) / sxy + 1.0,
              img[..., 0].reshape(-1) / srgb + 1.0,
              img[..., 1].reshape(-1) / srgb + 1.0,
              img[..., 2].reshape(-1) / srgb + 1.0]
    lo = [jnp.floor(f).astype(jnp.int32) for f in coords]
    frac = [f - jnp.floor(f) for f in coords]
    strides = np.cumprod((1,) + gshape[:0:-1])[::-1]  # row-major strides
    nflat = int(np.prod(gshape))
    vals = x.reshape(-1, c)

    grid = jnp.zeros((nflat, c), x.dtype)
    for corner in range(32):
        widx = jnp.zeros((h * w,), jnp.int32)
        wgt = jnp.ones((h * w,), x.dtype)
        for d in range(5):
            bit = (corner >> d) & 1
            widx = widx + (lo[d] + bit) * int(strides[d])
            wgt = wgt * (frac[d] if bit else (1.0 - frac[d]))
        grid = grid.at[widx].add(wgt[:, None] * vals)

    g = grid.reshape(gshape + (c,))
    k = jnp.asarray(_blur_kernel1d(_GRID_BLUR_SIGMA, _GRID_BLUR_RADIUS))
    for axis in range(5):
        g = _sep_conv(g, k, axis)
    gflat = g.reshape(nflat, c)

    out = jnp.zeros((h * w, c), x.dtype)
    for corner in range(32):
        widx = jnp.zeros((h * w,), jnp.int32)
        wgt = jnp.ones((h * w,), x.dtype)
        for d in range(5):
            bit = (corner >> d) & 1
            widx = widx + (lo[d] + bit) * int(strides[d])
            wgt = wgt * (frac[d] if bit else (1.0 - frac[d]))
        out = out + wgt[:, None] * gflat[widx]
    return out.reshape(h, w, c)


def bilateral_message(Q: Array, img: Array, sxy: float, srgb: float,
                      exclude_self: bool = True) -> Array:
    ones = jnp.ones(Q.shape[:2] + (1,), Q.dtype)
    norm = _bilateral_filter_raw(ones, img, sxy, srgb)
    n = jax.lax.rsqrt(jnp.maximum(norm, 1e-20))
    out = n * _bilateral_filter_raw(n * Q, img, sxy, srgb)
    if exclude_self:
        # true-kernel self weight is 1 -> subtract n_i^2 Q_i
        out = out - (n * n) * Q
    return out


# ---------------------------------------------------------------------------
# Mean-field loop
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=('g_sxy', 'g_compat', 'bi_sxy', 'bi_srgb', 'bi_compat',
                     'iterations', 'exclude_self'))
def _mean_field_single(probs: Array, img: Array, *, g_sxy, g_compat,
                       bi_sxy, bi_srgb, bi_compat, iterations,
                       exclude_self) -> Array:
    U = -jnp.log(jnp.clip(probs.astype(jnp.float32), 1e-10, None))
    logits0 = -U - jnp.max(-U, axis=-1, keepdims=True)
    Q = jax.nn.softmax(logits0, axis=-1)

    def body(_, Q):
        msg = 0.
        if g_compat:
            msg = msg + g_compat * gaussian_message(Q, g_sxy, exclude_self)
        if bi_compat:
            msg = msg + bi_compat * bilateral_message(
                Q, img, bi_sxy, bi_srgb, exclude_self)
        return jax.nn.softmax(-U + msg, axis=-1)

    return jax.lax.fori_loop(0, iterations, body, Q)


def mean_field(probs: Array, img: Array, config,
               exclude_self: bool = True) -> Array:
    """Dense-CRF mean-field. probs/img: [H,W,C]/[H,W,3] or batched [B,...].

    probs are treated as pydensecrf's unary_from_softmax input
    (U = -log p); classes the caller masked to ~0 probability stay at ~0
    posterior, reproducing dcrf_process's passing-classes-only behavior
    (03c_hsn/utilities.py:425-429) without ragged shapes.
    Returns the posterior Q with the same shape as probs.
    """
    kw = dict(g_sxy=config.g_sxy, g_compat=config.g_compat,
              bi_sxy=config.bi_sxy, bi_srgb=config.bi_srgb,
              bi_compat=config.bi_compat, iterations=config.iterations,
              exclude_self=exclude_self)
    if probs.ndim == 3:
        return _mean_field_single(probs, img, **kw)
    fn = jax.vmap(lambda p, i: _mean_field_single(p, i, **kw))
    return fn(probs, img)


def crf_label_refine(img: Array, labels: Array, n_labels: int, config,
                     gt_prob: float = 0.7,
                     exclude_self: bool = True) -> Array:
    """Hard-label CRF refinement (misc.imutils.crf_inference_label used at
    cam_to_ir_label.py:35-67): unary from a label map with confidence
    gt_prob, mean-field, argmax back to labels.

    img: [H,W,3] 0..255; labels: [H,W] int.  Returns [H,W] int32.
    """
    onehot = jax.nn.one_hot(labels, n_labels, dtype=jnp.float32)
    probs = onehot * gt_prob + (1.0 - onehot) * (1.0 - gt_prob) / max(
        n_labels - 1, 1)
    Q = mean_field(probs, img, config, exclude_self=exclude_self)
    return jnp.argmax(Q, axis=-1).astype(jnp.int32)
