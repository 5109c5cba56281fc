"""Small image filters used by the cue pipeline, as pure jnp ops.

Replaces the host-side scipy/cv2 calls in the reference's per-image loops:
  * scipy.ndimage.gaussian_filter(sigma=2) — bg synthesis
    (02_cues/adp_cues.py:286, 03c_hsn/utilities.py:348)
  * scipy.ndimage.median_filter(size=3) — VOC bg cues
    (02_cues/utilities.py:213)
  * cv2.resize bilinear — everywhere.

All are batched over leading dims and vectorize on the VPU; no per-image
python loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Matches scipy.ndimage's kernel (radius = int(truncate*sigma + 0.5))."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=('sigma', 'truncate'))
def gaussian_blur(img, sigma: float = 2.0, truncate: float = 4.0):
    """Separable Gaussian blur over the last two axes, symmetric-padded (scipy 'reflect')
    (scipy.ndimage.gaussian_filter semantics, mode='symmetric')."""
    k = jnp.asarray(_gaussian_kernel1d(sigma, truncate))
    r = (k.shape[0] - 1) // 2
    lead = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, h, w)).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode='symmetric')

    # rows then cols, via depthwise 1D convs expressed as dot over a window
    def conv1d(a, axis):
        # a: [B, H+2r, W+2r]; convolve along `axis` with k, valid
        moved = jnp.moveaxis(a, axis, -1)
        windows = jnp.stack(
            [moved[..., i:i + moved.shape[-1] - 2 * r]
             for i in range(2 * r + 1)], axis=-1)
        out = jnp.einsum('...wk,k->...w', windows, k)
        return jnp.moveaxis(out, -1, axis)

    x = conv1d(x, 1)
    x = conv1d(x, 2)
    return x.reshape(lead + (h, w))


@jax.jit
def median3(img):
    """3x3 median filter over the last two axes, symmetric-padded (scipy 'reflect')
    (scipy.ndimage.median_filter(size=3) semantics)."""
    lead = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, h, w))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode='symmetric')
    stack = jnp.stack([x[:, dy:dy + h, dx:dx + w]
                       for dy in range(3) for dx in range(3)], axis=-1)
    return jnp.sort(stack, axis=-1)[..., 4].reshape(lead + (h, w))


def resize_bilinear(x, out_hw, channel_axis: int = -1):
    """Bilinear resize of the two spatial axes.

    x: [..., H, W] (channel_axis=None style) or [..., H, W, C] with
    channel_axis=-1.  cv2.resize analog (half-pixel sampling).
    """
    if channel_axis == -1:
        shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    else:
        shape = x.shape[:-2] + (out_hw[0], out_hw[1])
    return jax.image.resize(x, shape, method='bilinear')


def resize_nearest(x, out_hw, channel_axis: int = -1):
    if channel_axis == -1:
        shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    else:
        shape = x.shape[:-2] + (out_hw[0], out_hw[1])
    return jax.image.resize(x, shape, method='nearest')
