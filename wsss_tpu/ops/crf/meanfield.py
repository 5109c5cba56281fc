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
  * bilateral  exp(-|dp|^2/2 sxy^2 - |dI|^2/2 srgb^2) — approximated by
    a 5-D bilateral grid, the TPU-friendly equivalent of the
    permutohedral lattice (SURVEY.md §7 plan B).  Production inference
    configs dispatch to the MXU-native Pallas grid (ops/crf/mxu_grid.py,
    one-hot-matmul splat/slice); this module keeps the scatter-based
    structures (dense / direct-window / 32-corner grid) as exact
    references and fallbacks, and routes fine-color grid-intractable
    configs to the native C++ permutohedral.

Both kernels use symmetric normalization (pydensecrf default
NORMALIZE_SYMMETRIC): message = n * (K @ (n*Q)), n = 1/sqrt(K @ 1), with
the self term n_i^2 Q_i removed (exclude_self=True, the paper's j != i
sum; set False for the variant that keeps it).

Update (Potts compatibility, label-constant terms dropped):
    Q <- softmax(-U + g_compat * m_g(Q) + bi_compat * m_b(Q)),  U = -log p.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wsss_tpu.ops.crf import mxu_grid as _mxu

Array = jax.Array

# escape hatches for the MXU grid path: env kill-switch, and a test hook
# that forces it on non-TPU backends (Pallas interpret mode)
_MXU_DISABLED = bool(os.environ.get('WSSS_TPU_NO_MXU'))
# bf16 mean-field state: keeps Q / unaries / normalizers / messages of
# the MXU-path loop in bfloat16 (matmuls still accumulate f32 via
# preferred_element_type), halving the full-resolution HBM traffic of
# the per-iteration elementwise ops (softmax, resizes, self-exclusion).
# Default ON for the compiled TPU path for +4% headline throughput;
# label agreement vs the f32-state loop is re-measured every bench run
# (bench.py extras.crf_state_bf16_label_agree — a valid A/B now that the
# dtype is a STATIC ARG of _mean_field_mxu and participates in the jit
# cache key; the round-4 module-global flip never retraced).
# Interpret mode (CPU parity tests) always runs f32 state.
# WSSS_TPU_CRF_STATE_F32=1 is the kill switch for A/B runs.
_CRF_STATE_BF16 = not bool(os.environ.get('WSSS_TPU_CRF_STATE_F32'))
# Spatial-downsampled bilateral message: when the spatial kernel is wide
# (cells >= MXU_DS_MIN_SXY px) the pairwise message is smooth at the
# pixel scale, so it is computed on a guide image resampled to
# MXU_DS_CELL-px cells (sxy/CELL downsample) and bilinearly upsampled
# back — splat/slice MACs scale with the pixel count ((CELL/sxy)^2 of
# the work); the extra resample variance is << sxy^2.  Unaries, the
# spatial-Gaussian message and the softmax stay at full resolution.
# CELL must be a multiple of 8 (Mosaic image-layout tiles).  8 measured
# round 5: headline 95.7 -> 113.1 img/s vs CELL=16, label agreement
# 0.9999 at the bench config and 0.978 vs 0.975 (BETTER) on the
# adversarial fidelity toy (tests/test_mxu_grid.py::
# test_spatial_downsampled_message_fidelity pins it >= full-res).
MXU_DS_CELL = 8
MXU_DS_MIN_SXY = 24
_MXU_DS_DISABLED = bool(os.environ.get('WSSS_TPU_NO_SPATIAL_DS'))
_MXU_FORCE_INTERPRET = False
# color-cell coarsening for the MXU grid (cell = MXU_CELL_MULT * srgb).
# 1.35 measured 0.923 label agreement with the exact mean field on the
# adversarial fidelity toy vs the permutohedral lattice's 0.882
# (tests/test_mxu_grid.py::test_mxu_fidelity_vs_permutohedral pins it),
# for ~2.3x fewer kernel MACs than exact-srgb sampling.
MXU_CELL_MULT = 1.35

# Gaussian blur applied inside the bilateral grid, in grid units.  The
# splat/slice interpolation adds variance per axis (multilinear ~1/6 per
# side, nearest ~1/12), so the blur sigma per axis is chosen to make the
# effective end-to-end kernel match exp(-d^2/2 sigma^2); calibrated
# against the exact O(N^2) reference in tests/test_crf.py.
#   'multilinear': 32-corner splat + 32-corner slice (var 1/3/axis)
#   'nearest':     nearest splat + 32-corner slice   (var 1/4/axis)
#   'fast':        nearest splat + spatial-bilinear x color-nearest slice
#                  (spatial var 1/4, color var 1/6)
_GRID_BLUR_SIGMA = {
    'multilinear': (0.816,) * 5,
    'nearest': (0.866,) * 5,
    'fast': (0.866, 0.866, 0.913, 0.913, 0.913),
}
_GRID_BLUR_RADIUS = 2


def _blur_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    return np.exp(-0.5 * (x / sigma) ** 2).astype(np.float32)


def _sep_conv(x: Array, k: Array, axis: int) -> Array:
    """Unnormalized 1-D convolution along `axis`, zero-padded.

    Slices along the axis in place (no transposes — XLA would otherwise
    materialize badly-padded transposed copies of the 5-D grid)."""
    r = (k.shape[0] - 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    padded = jnp.pad(x, pad)
    n = x.shape[axis]
    out = k[0] * jax.lax.dynamic_slice_in_dim(padded, 0, n, axis)
    for i in range(1, 2 * r + 1):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(padded, i, n, axis)
    return out


# ---------------------------------------------------------------------------
# Exact spatial Gaussian message
# ---------------------------------------------------------------------------

def _flat_conv_last(x: Array, k: Array, stride: int) -> Array:
    """1-D conv along a *cell* axis embedded in the flattened trailing dim:
    shifts are multiples of `stride` elements.  Zero-padded at the ends;
    intra-dim boundary bleed is absorbed by margin cells (see
    _grid_shape)."""
    r = (k.shape[0] - 1) // 2
    n = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(r * stride, r * stride)]
    padded = jnp.pad(x, pad)
    out = k[0] * jax.lax.dynamic_slice_in_dim(padded, 0, n, -1)
    for j in range(1, 2 * r + 1):
        out = out + k[j] * jax.lax.dynamic_slice_in_dim(
            padded, j * stride, n, -1)
    return out


@functools.lru_cache(maxsize=64)
def _gauss_band(n: int, sxy: float) -> np.ndarray:
    """[n, n] band matrix of the truncated 1-D Gaussian (zero-pad conv
    semantics as a matmul — the separable 13-tap dynamic-slice chain
    costs ~2 ms at 321^2 where the MXU form is bandwidth-bound).
    Returns numpy (never cache jnp values: a first call inside a trace
    would leak the tracer)."""
    radius = max(1, int(np.ceil(4.0 * sxy)))
    k = np.zeros((n, n))
    d = np.exp(-0.5 * (np.arange(-radius, radius + 1) / sxy) ** 2)
    for off in range(-radius, radius + 1):
        if abs(off) < n:
            k += np.diag(np.full(n - abs(off), d[off + radius]), k=off)
    return k.astype(np.float32)


def _gaussian_filter_raw(x: Array, sxy: float,
                         axes: Tuple[int, int] = (0, 1),
                         dtype=None) -> Array:
    """K @ x with K = exp(-|dp|^2/2 sxy^2) (self weight 1), truncated at
    radius ceil(4*sxy). x: [H,W,C] (or batched, with `axes` naming the
    two spatial axes).  Each axis is one band-matrix matmul.

    Layout note (TPU): the naive per-axis einsum leaves the channel
    minor dim (e.g. C=21) on the contraction RHS for the column pass,
    which XLA lowers to H tiny [W,W]x[W,C] dots — each lane-padded to
    128 and dominated by fixed MXU pipeline latency (measured ~2 ms/iter
    at 321^2).  Both passes here contract against the FULL remaining
    array (free size B*W*C) with one final transpose, so each blur is a
    single large [N,N]x[N,B*N*C] dot.  `dtype` optionally casts the
    operands (bf16 on the MXU path — f32 accumulate via
    preferred_element_type)."""
    b0, b1 = (jnp.asarray(_gauss_band(x.shape[ax], float(sxy)))
              for ax in axes)
    if dtype is not None:
        b0, b1 = b0.astype(dtype), b1.astype(dtype)
        xd = x.astype(dtype)
    else:
        xd = x
    if x.ndim == 3 and axes == (0, 1):
        # [H,H] x [H,(W C)] -> [H,W,C]; then [W,W] x_(contract W) -> WHC
        t1 = jax.lax.dot_general(b0, xd, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        t2 = jax.lax.dot_general(b1, t1, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return jnp.transpose(t2, (1, 0, 2)).astype(x.dtype)
    if x.ndim == 4 and axes == (1, 2):
        t1 = jax.lax.dot_general(b0, xd, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # t1: [H, B, W, C]; contract W -> [W, H, B, C]
        t2 = jax.lax.dot_general(b1, t1, (((1,), (2,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return jnp.transpose(t2, (2, 1, 0, 3)).astype(x.dtype)
    for ax, band in zip(axes, (b0, b1)):      # generic fallback
        x = jnp.moveaxis(jnp.tensordot(band, x, axes=(1, ax)), 0, ax)
    return x


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
    """Grid dims: spatial with 1+2 margin cells, color with 2+2 margins.

    The extra color margins let the color-axis blurs run as shifts of ONE
    flattened (gr,gg,gb,C) trailing dim — wide in TPU lanes instead of a
    21-element minor dim — with cross-row bleed landing only in margin
    cells that are never splatted into nor sliced from."""
    gy = int(np.floor((hw[0] - 1) / sxy)) + 3
    gx = int(np.floor((hw[1] - 1) / sxy)) + 3
    gc = int(np.floor(vrange / srgb)) + 5
    return (gy, gx, gc, gc, gc)


class BilateralGrid:
    """Per-image bilateral-grid filter with splat indices/weights computed
    ONCE (they depend only on the guide image) and reused across mean-field
    iterations — the analog of pydensecrf building its permutohedral
    lattice once per image."""

    def __init__(self, img: Array, sxy: float, srgb: float,
                 mode: str = 'fast'):
        """mode='fast': one scatter + 4 gathers per filter (nearest splat,
        spatial-bilinear x color-nearest slice).  'nearest': nearest splat
        + full 32-corner slice.  'multilinear': 32-corner splat + slice,
        highest fidelity."""
        h, w = img.shape[:2]
        self.hw = (h, w)
        self.mode = mode
        self.gshape = _grid_shape((h, w), sxy, srgb)
        self.nflat = int(np.prod(self.gshape))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        # spatial offset +1 (one-cell margin for the upper corner); color
        # offset +2 (two-cell margins both sides — see _grid_shape)
        coords = [jnp.asarray(yy.ravel()) / sxy + 1.0,
                  jnp.asarray(xx.ravel()) / sxy + 1.0,
                  img[..., 0].reshape(-1) / srgb + 2.0,
                  img[..., 1].reshape(-1) / srgb + 2.0,
                  img[..., 2].reshape(-1) / srgb + 2.0]
        lo = [jnp.floor(f).astype(jnp.int32) for f in coords]
        frac = [f - jnp.floor(f) for f in coords]
        strides = np.cumprod((1,) + self.gshape[:0:-1])[::-1]
        if mode == 'fast':
            # slice corners: 4 spatial bilinear x nearest color
            color_near = sum(jnp.round(coords[d]).astype(jnp.int32)
                             * int(strides[d]) for d in range(2, 5))
            idx, wgt = [], []
            for corner in range(4):
                widx = color_near
                wg = jnp.ones((h * w,), jnp.float32)
                for d in range(2):
                    bit = (corner >> d) & 1
                    widx = widx + (lo[d] + bit) * int(strides[d])
                    wg = wg * (frac[d] if bit else (1.0 - frac[d]))
                idx.append(widx)
                wgt.append(wg)
        else:
            idx, wgt = [], []
            for corner in range(32):
                widx = jnp.zeros((h * w,), jnp.int32)
                wg = jnp.ones((h * w,), jnp.float32)
                for d in range(5):
                    bit = (corner >> d) & 1
                    widx = widx + (lo[d] + bit) * int(strides[d])
                    wg = wg * (frac[d] if bit else (1.0 - frac[d]))
                idx.append(widx)
                wgt.append(wg)
        self.idx = jnp.stack(idx)      # [n_corners, N] int32
        self.wgt = jnp.stack(wgt)      # [n_corners, N] f32
        if mode in ('nearest', 'fast'):
            nearest = jnp.zeros((h * w,), jnp.int32)
            for d in range(5):
                nearest = nearest + jnp.round(coords[d]).astype(
                    jnp.int32) * int(strides[d])
            self.nearest_idx = nearest
        sigmas = _GRID_BLUR_SIGMA[mode]
        self.blur_ks = [jnp.asarray(_blur_kernel1d(s, _GRID_BLUR_RADIUS))
                        for s in sigmas]

    def filter(self, x: Array) -> Array:
        """Approximate K @ x. x: [H,W,C].

        Grid compute runs in bfloat16 (halves the bytes of the scatter /
        blur / gather phases — all bandwidth/access bound); accumulation
        back to the caller is float32.  Messages tolerate bf16: they feed
        a softmax through a compat scale, and parity tests hold."""
        in_dtype = x.dtype
        x = x.astype(jnp.bfloat16)
        h, w = self.hw
        c = x.shape[-1]
        gy, gx, gr, gg, gb = self.gshape
        vals = x.reshape(-1, c)
        grid = jnp.zeros((self.nflat, c), x.dtype)
        if self.mode in ('nearest', 'fast'):
            grid = grid.at[self.nearest_idx].add(vals)
        else:
            grid = grid.at[self.idx.reshape(-1)].add(
                (self.wgt[..., None] * vals[None]).reshape(-1, c))
        # Blur with a [gy, gx, gr*gg*gb*C] layout: the color-axis convs
        # are strided shifts of the big trailing dim (full lane width);
        # cross-row bleed lands in the 2-cell color margins (never
        # splatted into / sliced from, so zero-pad semantics hold for all
        # interior cells).
        f = gr * gg * gb * c
        g = grid.reshape(gy, gx, f)
        g = _sep_conv(g, self.blur_ks[0], 0)
        g = _sep_conv(g, self.blur_ks[1], 1)
        for k, stride in zip(self.blur_ks[2:],
                             (gg * gb * c, gb * c, c)):  # gr, gg, gb
            g = _flat_conv_last(g, k, stride)
        gflat = g.reshape(self.nflat, c)
        # corner-loop accumulation keeps peak memory at [N,C] per step
        # (a single [n,N,C] gather would dominate HBM under vmap)
        out = jnp.zeros((h * w, c), jnp.float32)
        for i in range(self.idx.shape[0]):
            out = out + self.wgt[i][:, None] * gflat[
                self.idx[i]].astype(jnp.float32)
        return out.reshape(h, w, c).astype(in_dtype)


class DirectBilateral:
    """Exact truncated windowed bilateral filter for small spatial sigmas.

    When sxy is small (e.g. the HSN VOC-M7 config's sxy=80/48 ≈ 1.7,
    03c_hsn/demo.py:161) the bilateral grid degenerates (spatial grid ≈
    full image x color cube); a direct sliding-window sum over shifted
    arrays is exact, dense, and VPU-friendly.  Truncated at radius
    ceil(3*sxy).  The color weight maps are precomputed once per image.
    """

    _CACHE_BUDGET = 256 * 1024 * 1024  # bytes of precomputed weight maps

    def __init__(self, img: Array, sxy: float, srgb: float):
        self.r = int(np.ceil(3.0 * sxy))
        offs, wspace = [], []
        for dy in range(-self.r, self.r + 1):
            for dx in range(-self.r, self.r + 1):
                d2 = dy * dy + dx * dx
                if d2 > (3.0 * sxy) ** 2:
                    continue
                offs.append((dy, dx))
                wspace.append(float(np.exp(-0.5 * d2 / (sxy * sxy))))
        self.offs = offs
        self.wspace = wspace
        self.img = img.astype(jnp.float32)
        self.srgb = srgb
        h, w = img.shape[:2]
        # precompute the per-offset color weight maps only when they fit;
        # otherwise recompute on the fly inside filter() (large-radius
        # configs like ADP bi_sxy=10 have ~2800 offsets)
        self.cache = None
        if len(offs) * h * w * 4 <= self._CACHE_BUDGET:
            self.cache = [self._wmap(dy, dx, ws)
                          for (dy, dx), ws in zip(offs, wspace)]

    def _wmap(self, dy, dx, ws):
        h, w = self.img.shape[:2]
        shifted = _shift2d(self.img, dy, dx)
        dI2 = jnp.sum((self.img - shifted) ** 2, axis=-1)
        valid = _shift2d(jnp.ones((h, w, 1), jnp.float32), dy, dx)[..., 0]
        return ws * jnp.exp(-0.5 * dI2 / (self.srgb * self.srgb)) * valid

    def filter(self, x: Array) -> Array:
        if self.cache is not None:
            out = jnp.zeros_like(x)
            for i, (dy, dx) in enumerate(self.offs):
                out = out + self.cache[i][..., None] * _shift2d(
                    x, dy, dx)
            return out
        # Large-radius path: scan over offsets (ONE graph copy — the
        # unrolled loop over ~3k offsets takes minutes to compile),
        # recomputing the color weight map per offset.
        h, w = self.img.shape[:2]
        r = self.r
        img_p = jnp.pad(self.img, ((r, r), (r, r), (0, 0)))
        x_p = jnp.pad(x, ((r, r), (r, r), (0, 0)))
        ones_p = jnp.pad(jnp.ones((h, w, 1), jnp.float32),
                         ((r, r), (r, r), (0, 0)))
        offs = jnp.asarray(np.asarray(self.offs, np.int32))
        ws = jnp.asarray(np.asarray(self.wspace, np.float32))
        inv2s2 = 0.5 / (self.srgb * self.srgb)

        def body(acc, inp):
            (dy, dx), w_sp = inp
            sl = lambda a: jax.lax.dynamic_slice(
                a, (r + dy, r + dx, 0), (h, w, a.shape[2]))
            dI2 = jnp.sum((self.img - sl(img_p)) ** 2, axis=-1)
            wm = w_sp * jnp.exp(-dI2 * inv2s2) * sl(ones_p)[..., 0]
            return acc + wm[..., None] * sl(x_p), None

        out, _ = jax.lax.scan(body, jnp.zeros_like(x),
                              ((offs[:, 0], offs[:, 1]), ws))
        return out


def _shift2d(x: Array, dy: int, dx: int) -> Array:
    """Shift [H,W,C] by (dy,dx) with zero fill: out[p] = x[p + (dy,dx)]."""
    h, w = x.shape[:2]
    padded = jnp.pad(x, ((abs(dy), abs(dy)), (abs(dx), abs(dx)), (0, 0)))
    return jax.lax.dynamic_slice(
        padded, (abs(dy) + dy, abs(dx) + dx, 0), x.shape)


class DenseBilateral:
    """Exact bilateral filtering via the materialized [N,N] kernel.

    For small pixel counts (the 41x41 seed-grid CRF inside SEC/DSRG
    training, SEC.py:252-284) the dense kernel is only ~11 MB and one MXU
    matmul per filter — exact and far faster than any approximation."""

    def __init__(self, img: Array, sxy: float, srgb: float):
        h, w = img.shape[:2]
        self.hw = (h, w)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        pos = jnp.asarray(np.stack([yy.ravel(), xx.ravel()], 1))
        rgb = img.reshape(-1, 3).astype(jnp.float32)
        d2 = jnp.sum((pos[:, None] - pos[None]) ** 2, -1)
        c2 = jnp.sum((rgb[:, None] - rgb[None]) ** 2, -1)
        self.K = jnp.exp(-0.5 * d2 / (sxy * sxy)
                         - 0.5 * c2 / (srgb * srgb))

    def filter(self, x: Array) -> Array:
        h, w = self.hw
        out = jnp.matmul(self.K, x.reshape(h * w, -1),
                         preferred_element_type=jnp.float32)
        return out.reshape(h, w, -1)


def make_bilateral(img: Array, sxy: float, srgb: float,
                   grid_mode: str = 'fast'):
    """Pick the right bilateral structure: exact dense kernel for small
    grids, exact direct window for small sxy, 5-D grid otherwise.
    grid_mode: BilateralGrid fidelity/speed tradeoff ('multilinear' |
    'nearest' | 'fast').  'fast' is the default: measured end-to-end
    label agreement with the exact mean field EXCEEDS the permutohedral
    lattice's (pydensecrf's structure) — 0.94 vs 0.88 on adversarial
    weak-unary inputs (tests/test_native_crf.py::
    test_grid_fidelity_vs_permutohedral) — because the spatial Gaussian
    term is computed exactly here."""
    n = img.shape[0] * img.shape[1]
    if n <= 10240:
        return DenseBilateral(img, sxy, srgb)
    r = int(np.ceil(3.0 * sxy))
    n_offsets = np.pi * (3.0 * sxy) ** 2
    grid_cells = int(np.prod(_grid_shape(img.shape[:2], sxy, srgb)))
    # direct window when the offset count is tractable OR the color cube
    # would make the dense grid explode (e.g. ADP bi_srgb=4:
    # 68^3 color cells x spatial — tens of GB)
    if r <= 8 or n_offsets <= 3200 or grid_cells > 80_000_000:
        if n_offsets > 40_000:
            raise ValueError(
                f'bilateral config sxy={sxy} srgb={srgb} on {img.shape} is '
                'intractable for both window and grid structures')
        return DirectBilateral(img, sxy, srgb)
    return BilateralGrid(img, sxy, srgb, mode=grid_mode)


def _bilateral_filter_raw(x: Array, img: Array, sxy: float, srgb: float
                          ) -> Array:
    return make_bilateral(img, sxy, srgb).filter(x)


def bilateral_message(Q: Array, img: Array, sxy: float, srgb: float,
                      exclude_self: bool = True) -> Array:
    filt = make_bilateral(img, sxy, srgb)
    ones = jnp.ones(Q.shape[:2] + (1,), Q.dtype)
    n = jax.lax.rsqrt(jnp.maximum(filt.filter(ones), 1e-20))
    out = n * filt.filter(n * Q)
    if exclude_self:
        # true-kernel self weight is 1 -> subtract n_i^2 Q_i
        out = out - (n * n) * Q
    return out


# ---------------------------------------------------------------------------
# MXU-grid mean field (batched, one jit)
# ---------------------------------------------------------------------------

def _routes_to_grid(hw: Tuple[int, int], sxy: float, srgb: float) -> bool:
    """Mirror of make_bilateral's structure choice: True iff this config
    lands on BilateralGrid (the only structure the MXU grid replaces)."""
    n = hw[0] * hw[1]
    if n <= 10240:
        return False
    r = int(np.ceil(3.0 * sxy))
    n_offsets = np.pi * (3.0 * sxy) ** 2
    grid_cells = int(np.prod(_grid_shape(hw, sxy, srgb)))
    return not (r <= 8 or n_offsets <= 3200 or grid_cells > 80_000_000)


def _fine_color_native_ok(probs, hw: Tuple[int, int], config) -> bool:
    """Fine-color configs (e.g. the IRN ir-label CRF, srgb=5) build
    color cubes that make EVERY on-device grid structure intractable —
    the one-hot matmul costs gc^3*4C MACs per pixel and the scatter grid
    is access-bound over tens of millions of cells (measured 40-70 s/img
    at 300^2).  The reference runs this exact step CPU-side (pydensecrf
    inside DataLoader workers, 03b_irn/voc12/dataloader.py); route it to
    the from-scratch C++ permutohedral (native/) when available
    (measured 3.1 s/img) unless we're inside a trace."""
    if isinstance(probs, jax.core.Tracer):
        return False
    from wsss_tpu.ops.crf import native as _native
    if not _native.available():
        return False
    cells = int(np.prod(_grid_shape(hw, config.bi_sxy, config.bi_srgb)))
    return cells > 5_000_000


def _mxu_ok(hw: Tuple[int, int], n_ch: int, config) -> bool:
    if _MXU_DISABLED or not config.bi_compat:
        return False
    if not _routes_to_grid(hw, config.bi_sxy, config.bi_srgb):
        return False
    # require8 must mirror MXUBilateralGrid's constructor
    # (mxu_grid.py:431: require8=not interpret) or the forced-interpret
    # escape hatch dead-ends for non-8-aligned spatial cells.
    if not _mxu.applicable(config.bi_sxy, config.bi_srgb, n_ch,
                           MXU_CELL_MULT,
                           require8=not _MXU_FORCE_INTERPRET):
        return False
    return _MXU_FORCE_INTERPRET or jax.default_backend() == 'tpu'


@functools.partial(
    jax.jit,
    static_argnames=('g_sxy', 'g_compat', 'bi_sxy', 'bi_srgb', 'bi_compat',
                     'iterations', 'exclude_self', 'interpret',
                     'cell_mult', 'state_bf16', 'ds_cell'))
def _mean_field_mxu(probs: Array, imgs: Array, *, g_sxy, g_compat,
                    bi_sxy, bi_srgb, bi_compat, iterations, exclude_self,
                    interpret=False, cell_mult=1.0, state_bf16=False,
                    ds_cell=MXU_DS_CELL) -> Array:
    """Batched mean field over the MXU bilateral grid: the whole loop —
    Pallas splat/slice included — compiles into ONE program, so callers
    (methods/hsn.py, cli/sec_dsrg.py predict) batch entire splits
    instead of chaining per-image dispatches at host level.

    state_bf16 / ds_cell are STATIC ARGS (not module globals) so A/B
    flips retrace instead of silently reusing the cached program — the
    round-4 bf16 'agreement 1.0' was measured against a stale trace."""
    c = probs.shape[-1]
    h, w = probs.shape[-3:-1]
    imgs = imgs.astype(jnp.float32)    # uint8-transport callers
    U = -jnp.log(jnp.clip(probs.astype(jnp.float32), 1e-10, None))
    logits0 = -U - jnp.max(-U, axis=-1, keepdims=True)
    Q = jax.nn.softmax(logits0, axis=-1)

    from wsss_tpu.ops.filters import resize_bilinear

    # spatially downsampled bilateral message (see MXU_DS_CELL note):
    # the guide image resamples to ds_cell-px cells so splat/slice
    # work scales by (cell/sxy)^2; messages bilinearly upsample back
    use_ds = (not _MXU_DS_DISABLED and bi_sxy >= MXU_DS_MIN_SXY
              and min(h, w) >= 2 * bi_sxy)
    if use_ds:
        f = bi_sxy / float(ds_cell)
        hd, wd = max(int(round(h / f)), 8), max(int(round(w / f)), 8)
        img_g = resize_bilinear(imgs, (hd, wd))
        sxy_g = float(ds_cell)
    else:
        img_g, sxy_g, (hd, wd) = imgs, bi_sxy, (h, w)

    # NOTE: the aligned (nearest, sxy/2-cell) variant does ~4x fewer
    # one-hot matmul MACs but measures SLOWER end-to-end (53.7 vs
    # 42 ms/img at the bench config) — its per-cell independence
    # fragments the work into [256,400]x[400,88] dots whose fixed MXU
    # pipeline cost dominates.  Kept as AlignedBilateralGrid for study;
    # the bilinear sxy-cell grid stays the production path.
    grid = _mxu.MXUBilateralGrid(img_g, sxy_g, bi_srgb, c,
                                 interpret=interpret,
                                 cell_mult=cell_mult)
    # the one-off normalizer filters a single channel: a dedicated C=1
    # grid avoids paying a full C-wide filter pass for it; it SHARES
    # the guide-image geometry (quantization, tiled indices, blur
    # matrices) with the message grid — the duplicate construction
    # measured ~11 ms/img of fixed cost at the production config
    grid1 = _mxu.MXUBilateralGrid(img_g, sxy_g, bi_srgb, 1,
                                  interpret=interpret,
                                  cell_mult=cell_mult,
                                  share_from=grid)
    ones_g = jnp.ones(img_g.shape[:3] + (1,), jnp.float32)
    n_b = jax.lax.rsqrt(jnp.maximum(grid1.filter(ones_g), 1e-20))
    # symmetric normalization (deg^-1/2 K deg^-1/2) makes the message a
    # degree-weighted average, so its magnitude is resolution-invariant;
    # the upsampled normalizer only feeds the self-exclusion term
    n_b_up = resize_bilinear(n_b, (h, w)) if use_ds else n_b
    if g_compat:
        ones = jnp.ones(Q.shape[:3] + (1,), jnp.float32)
        n_g = jax.lax.rsqrt(jnp.maximum(
            _gaussian_filter_raw(ones, g_sxy, axes=(1, 2)), 1e-20))
    if state_bf16 and not interpret:
        # normalizers computed in f32 above (rsqrt of tiny degrees),
        # then the loop state + constants drop to bf16
        sdt = jnp.bfloat16
        U, Q, n_b, n_b_up = (t.astype(sdt) for t in (U, Q, n_b, n_b_up))
        if g_compat:
            n_g = n_g.astype(sdt)

    def body(_, Q):
        msg = 0.
        if g_compat:
            # bf16 operands (f32 accumulate) — the bilateral path already
            # runs Q through bf16 grid kernels, same precision class
            m = n_g * _gaussian_filter_raw(n_g * Q, g_sxy, axes=(1, 2),
                                           dtype=jnp.bfloat16)
            if exclude_self:
                m = m - (n_g * n_g) * Q
            msg = msg + g_compat * m
        # bf16 into the splat: the kernels already compute in bf16
        # internally; feeding bf16 halves the per-tile image-layout
        # fetch + pad traffic of the hot phase
        if use_ds:
            q_d = resize_bilinear(Q, (hd, wd))
            m_d = n_b * grid.filter((n_b * q_d).astype(jnp.bfloat16))
            m = resize_bilinear(m_d, (h, w))
        else:
            m = n_b * grid.filter((n_b * Q).astype(jnp.bfloat16))
        if exclude_self:
            m = m - (n_b_up * n_b_up) * Q
        msg = msg + bi_compat * m
        return jax.nn.softmax(-U + msg, axis=-1).astype(Q.dtype)

    return jax.lax.fori_loop(0, iterations, body, Q).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Mean-field loop
# ---------------------------------------------------------------------------

def mxu_macs_estimate(hw: Tuple[int, int], n_ch: int, config) -> int:
    """Executed MXU MACs for ONE image of the MXU-path mean field —
    mirrors _mean_field_mxu's geometry decisions (spatial downsample,
    color-cell coarsening, shared-geometry C=1 normalizer, Gaussian
    band matmuls).  With a measured time this gives hardware
    utilization for bench reporting; only valid when _mxu_ok holds."""
    h, w = hw
    sxy, srgb = config.bi_sxy, config.bi_srgb
    use_ds = (not _MXU_DS_DISABLED and sxy >= MXU_DS_MIN_SXY
              and min(h, w) >= 2 * sxy)
    if use_ds:
        f = sxy / float(MXU_DS_CELL)
        hd, wd = max(int(round(h / f)), 8), max(int(round(w / f)), 8)
        sxy_g = float(MXU_DS_CELL)
    else:
        hd, wd, sxy_g = h, w, sxy
    zeros = jnp.zeros((1, hd, wd, 3), jnp.float32)
    g = _mxu.MXUBilateralGrid(zeros, sxy_g, srgb, n_ch,
                              cell_mult=MXU_CELL_MULT)
    g1 = _mxu.MXUBilateralGrid(zeros, sxy_g, srgb, 1,
                               cell_mult=MXU_CELL_MULT, share_from=g)
    macs = g1.mxu_macs_per_filter()           # normalizer, once
    per_iter = g.mxu_macs_per_filter()
    if config.g_compat:
        # two band-matrix dots per gaussian message (meanfield
        # gaussian_message: [H,H]@[H,W*C] + [W,W]@[W,H*C])
        per_iter += h * h * w * n_ch + w * w * h * n_ch
    return macs + config.iterations * per_iter


@functools.partial(
    jax.jit,
    static_argnames=('g_sxy', 'g_compat', 'bi_sxy', 'bi_srgb', 'bi_compat',
                     'iterations', 'exclude_self', 'interpret',
                     'cell_mult', 'state_bf16', 'ds_cell'))
def _mean_field_mxu1(probs: Array, img: Array, **kw) -> Array:
    """Single-image MXU mean field: batch-dim expand and squeeze live
    INSIDE the jit.  Dispatching `_mean_field_mxu(probs[None], ...)[0]`
    from the host issues 3 extra device ops per image (broadcast_in_dim,
    dynamic_slice, squeeze), each paying the tunnel round trip — measured
    ~4 ms/call of host-side overhead at the bench config."""
    return _mean_field_mxu(probs[None], img[None], **kw)[0]


@functools.partial(
    jax.jit,
    static_argnames=('g_sxy', 'g_compat', 'bi_sxy', 'bi_srgb', 'bi_compat',
                     'iterations', 'exclude_self', 'interpret',
                     'cell_mult', 'state_bf16', 'ds_cell', 'k'))
def _mean_field_mxu_at(probs: Array, imgs: Array, idx, k=1, **kw) -> Array:
    """A k-image chunk of a batched chain, selected by a TRACED index so
    the whole per-chunk step (slice included) is a single device
    dispatch; idx must be passed as a numpy scalar (a Python int would
    recompile per chunk)."""
    p = jax.lax.dynamic_slice_in_dim(probs, idx, k, 0)
    i = jax.lax.dynamic_slice_in_dim(imgs, idx, k, 0)
    return _mean_field_mxu(p, i, **kw)


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

    # loop-invariant structures: splat geometry + symmetric normalizers
    ones = jnp.ones(Q.shape[:2] + (1,), jnp.float32)
    if bi_compat:
        grid = make_bilateral(img, bi_sxy, bi_srgb)
        n_b = jax.lax.rsqrt(jnp.maximum(grid.filter(ones), 1e-20))
    if g_compat:
        n_g = jax.lax.rsqrt(jnp.maximum(
            _gaussian_filter_raw(ones, g_sxy), 1e-20))

    def body(_, Q):
        msg = 0.
        if g_compat:
            m = n_g * _gaussian_filter_raw(n_g * Q, g_sxy)
            if exclude_self:
                m = m - (n_g * n_g) * Q
            msg = msg + g_compat * m
        if bi_compat:
            m = n_b * grid.filter(n_b * Q)
            if exclude_self:
                m = m - (n_b * n_b) * Q
            msg = msg + bi_compat * m
        return jax.nn.softmax(-U + msg, axis=-1)

    return jax.lax.fori_loop(0, iterations, body, Q)


def _mxu_chunk(b: int, n_ch: int, config) -> int:
    """Batch chunk size for the MXU mean field: 2 when the v2 kernels
    will actually run (their ~8 ms device program amortizes pairing),
    1 for the v1 fallback (B=1 measured best there)."""
    return 2 if (b > 1 and _mxu.v2_active(
        config.bi_srgb, n_ch, MXU_CELL_MULT,
        interpret=_MXU_FORCE_INTERPRET)) else 1


def fused_mxu_ok(hw: Tuple[int, int], n_ch: int, config) -> bool:
    """Whether mean_field_fused(probs, img, config) may be traced into a
    caller's jit for this geometry (the config routes to the MXU grid
    kernels — the only batched path that is jit-composable; the scatter
    and native-permutohedral routes must stay at host level)."""
    return config.bi_compat and _mxu_ok(hw, n_ch, config)


def mean_field_fused(probs: Array, img: Array, config,
                     exclude_self: bool = True) -> Array:
    """In-graph (traceable) batched mean field, for callers that fuse
    the CAM stage, the CRF, and the argmax into ONE device program
    (methods/hsn.py fused path — the bench headline).

    Callers must gate on fused_mxu_ok(...) with the static geometry.
    The batch splits into chunk-of-2 STATIC subgraphs: the chunks stay
    sequential inside the program, so the HBM working set matches the
    tuned host-dispatch chaining, while the per-chunk host/tunnel gap
    (~6 ms measured round 3) disappears entirely.  Measured round 4
    (v5e, VOC 321^2 @ batch 8): 80.5 -> 100.3 img/s headline."""
    kw = dict(g_sxy=config.g_sxy, g_compat=config.g_compat,
              bi_sxy=config.bi_sxy, bi_srgb=config.bi_srgb,
              bi_compat=config.bi_compat, iterations=config.iterations,
              exclude_self=exclude_self,
              interpret=_MXU_FORCE_INTERPRET, cell_mult=MXU_CELL_MULT,
              state_bf16=_CRF_STATE_BF16, ds_cell=MXU_DS_CELL)
    if probs.ndim == 3:
        return _mean_field_mxu(probs[None], img[None], **kw)[0]
    b = probs.shape[0]
    chunk = _mxu_chunk(b, probs.shape[-1], config)
    if b <= chunk:
        return _mean_field_mxu(probs, img, **kw)
    outs = [_mean_field_mxu(probs[s:s + chunk], img[s:s + chunk], **kw)
            for s in range(0, b - b % chunk, chunk)]
    if b % chunk:
        outs.append(_mean_field_mxu(probs[b - b % chunk:],
                                    img[b - b % chunk:], **kw))
    return jnp.concatenate(outs, axis=0)


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
    hw = probs.shape[-3:-1]
    if (config.bi_compat and not _mxu_ok(hw, probs.shape[-1], config)
            and _routes_to_grid(hw, config.bi_sxy, config.bi_srgb)
            and _fine_color_native_ok(probs, hw, config)):
        from wsss_tpu.ops.crf import native as _native
        p_np = np.asarray(probs, np.float32)
        i_np = np.asarray(img, np.float32)
        if p_np.ndim == 3:
            return jnp.asarray(_native.mean_field_native(
                p_np, i_np, config, exclude_self=exclude_self))
        return jnp.stack([
            jnp.asarray(_native.mean_field_native(
                p_np[i], i_np[i], config, exclude_self=exclude_self))
            for i in range(p_np.shape[0])])
    if _mxu_ok(probs.shape[-3:-1], probs.shape[-1], config):
        mkw = dict(kw, interpret=_MXU_FORCE_INTERPRET,
                   cell_mult=MXU_CELL_MULT,
                   state_bf16=_CRF_STATE_BF16, ds_cell=MXU_DS_CELL)
        if probs.ndim == 3:
            return _mean_field_mxu1(probs, img, **mkw)
        # chunk-of-2 dispatch chains: with the v2 corner-tiled kernels
        # the device program is ~8 ms while the per-dispatch host/tunnel
        # gap is ~6 ms, so pairing images amortizes the dispatch
        # (measured 83.4 img/s at B=2 vs 70.7 at B=1 vs 77.6 at B=4 —
        # larger batches re-inflate the HBM working set).  Configs the
        # v2 layout cannot take (wide channels / VMEM bounds / the
        # WSSS_TPU_MXU_V1 kill switch) fall back to the v1 kernels where
        # B=1 measured best.
        b = probs.shape[0]
        chunk = _mxu_chunk(b, probs.shape[-1], config)
        if b <= chunk:
            return _mean_field_mxu(probs, img, **mkw)
        outs = [_mean_field_mxu_at(probs, img, np.int32(s0), k=chunk,
                                   **mkw)
                for s0 in range(0, b - b % chunk, chunk)]
        if b % chunk:
            outs.append(_mean_field_mxu_at(probs, img,
                                           np.int32(b - b % chunk),
                                           k=b % chunk, **mkw))
        return jnp.concatenate(outs, axis=0)
    if probs.ndim == 3:
        return _mean_field_single(probs, img, **kw)
    # Vectorize over batch in chunks sized to keep the bilateral grid's
    # working set within HBM; the dominant live buffers are the 5-D grid
    # ([chunk, nflat, C]) and the pixel buffers ([chunk, H*W, C]).
    b, h, w, c = probs.shape
    n = h * w
    if n <= 10240:                      # dense path: [N,N] kernel
        big = n * n
    elif config.bi_compat and int(np.ceil(3.0 * config.bi_sxy)) > 8:
        big = int(np.prod(_grid_shape((h, w), config.bi_sxy,
                                      config.bi_srgb))) * c
    else:
        big = n * c
    per_img = max(n * c, big) * 4
    budget = 128 * 1024 * 1024  # bytes per live buffer
    chunk = max(1, min(b, budget // max(per_img, 1)))
    fn = jax.vmap(lambda p, i: _mean_field_single(p, i, **kw))
    if chunk >= b:
        return fn(probs, img)
    # Sequential per-image dispatch.  NOTE: measured on v5e, wrapping the
    # scatter-heavy grid filter in lax.map runs ~7x slower than the same
    # graph dispatched per image, so large-image batches loop at the host
    # level (async dispatch chains; each call reuses one compiled graph).
    # Callers must NOT embed large-image batched mean_field inside an
    # outer jit — call it at the host level (methods/hsn.py does).
    if chunk == 1:
        outs = [_mean_field_single(probs[i], img[i], **kw)
                for i in range(b)]
        return jnp.stack(outs, axis=0)
    outs = []
    for s in range(0, b, chunk):
        outs.append(fn(probs[s:s + chunk], img[s:s + chunk]))
    return jnp.concatenate(outs, axis=0)


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
