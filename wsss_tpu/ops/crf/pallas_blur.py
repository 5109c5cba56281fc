"""Pallas kernel (EXPERIMENTAL): fused color-axis blur of the bilateral
grid.

Keeps a spatial cell's (gr,gg,gb,C) stripe VMEM-resident and applies the
three color-axis convolutions in one pass (3x HBM round trips -> 1x in
principle).

MEASURED RESULT (v5e, see PLAN.md): correct, but 2-3x SLOWER than the
flat-lane XLA strided-conv path in meanfield._flat_conv_last — the
per-cell grid dispatch (1-row blocks, 121..2900 invocations) costs more
than the saved bandwidth, and Mosaic's conv stack keeps ~4 padded stripe
copies live (stripes >96k f32 overflow VMEM).  Kept as a validated
reference kernel + the measurement, NOT wired into the default path; the
promising future variant processes MULTIPLE cells per invocation with
double-buffered DMA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# stripe bytes beyond which the kernel would overflow VMEM: each conv
# stage keeps ~4 padded copies of the stripe live on the Mosaic stack
# (measured: 90k-element stripes compile, 176k overflow the 16MB budget)
VMEM_STRIPE_LIMIT = 384 * 1024


def _conv_flat(x, k, stride):
    """Conv along a cell axis embedded in a flat [1, F] vector via shifted
    static slices of a zero-padded copy (same math as
    meanfield._flat_conv_last, on a VMEM-resident value)."""
    r = (len(k) - 1) // 2
    f = x.shape[-1]
    padded = jnp.pad(x, ((0, 0), (r * stride, r * stride)))
    # static python slices — Pallas TPU does not lower dynamic_slice
    out = k[0] * padded[:, 0:f]
    for j in range(1, 2 * r + 1):
        out = out + k[j] * padded[:, j * stride:j * stride + f]
    return out


def color_blur_fused(grid: jax.Array, ks, strides) -> jax.Array:
    """Apply the gr/gg/gb convolutions fused per spatial cell.

    grid: [gy, gx, F] with F = gr*gg*gb*C; ks: three 1-D kernels;
    strides: element strides of (gr, gg, gb) within F.
    """
    gy, gx, f = grid.shape
    # kernels become static python floats — Pallas kernels cannot capture
    # traced/array constants
    k_r, k_g, k_b = (tuple(float(v) for v in np.asarray(k)) for k in ks)
    s_r, s_g, s_b = (int(s) for s in strides)

    def kernel(in_ref, out_ref):
        x = in_ref[:][0]                     # [1, 1, F] -> [1, F]
        x = _conv_flat(x, k_r, s_r)
        x = _conv_flat(x, k_g, s_g)
        x = _conv_flat(x, k_b, s_b)
        out_ref[:] = x[None]

    # [cells, 1, F] so the block's last two dims equal the array dims
    # (Pallas TPU tiling constraint on trailing dims)
    out = pl.pallas_call(
        kernel,
        grid=(gy * gx,),
        in_specs=[pl.BlockSpec((1, 1, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gy * gx, 1, f), grid.dtype),
    )(grid.reshape(gy * gx, 1, f))
    return out.reshape(gy, gx, f)


def fits_vmem(f_elems: int, dtype_bytes: int = 4) -> bool:
    return f_elems * dtype_bytes <= VMEM_STRIPE_LIMIT


def blur_color_axes(grid: jax.Array, ks, strides,
                    gshape) -> jax.Array:
    """Dispatch: fully-fused Pallas kernel when the per-cell stripe fits
    VMEM; partial (gg,gb) fusion + XLA gr pass otherwise.

    grid: [gy, gx, F]; ks: (k_r, k_g, k_b); strides: element strides of
    (gr, gg, gb); gshape: full 5-D grid shape (for the partial split).
    """
    gy, gx, f = grid.shape
    if fits_vmem(f):
        return color_blur_fused(grid, ks, strides)
    gr = gshape[2]
    stripe = f // gr
    if not fits_vmem(stripe):
        raise ValueError('color stripe too large even per-gr '
                         f'({stripe} elems); use the XLA path')
    k_g, k_b = (tuple(float(v) for v in np.asarray(k)) for k in ks[1:])
    s_g, s_b = int(strides[1]), int(strides[2])

    def kernel(in_ref, out_ref):
        x = in_ref[:][0]
        x = _conv_flat(x, k_g, s_g)
        x = _conv_flat(x, k_b, s_b)
        out_ref[:] = x[None]

    cells = gy * gx * gr
    out = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[pl.BlockSpec((1, 1, stripe), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, stripe), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cells, 1, stripe), grid.dtype),
    )(grid.reshape(cells, 1, stripe)).reshape(gy, gx, f)
    # remaining gr pass via the XLA strided conv
    from wsss_tpu.ops.crf.meanfield import _flat_conv_last
    return _flat_conv_last(out, jnp.asarray(ks[0], jnp.float32),
                           int(strides[0]))
