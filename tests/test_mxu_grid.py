"""Parity tests for the MXU bilateral grid (Pallas one-hot-matmul
splat/slice) against a straight numpy implementation of the identical
math.  Runs in Pallas interpret mode on the CPU test backend; the real
Mosaic lowering is exercised by the TPU bench/fidelity paths."""
import numpy as np
import pytest

import jax.numpy as jnp

from wsss_tpu.ops.crf import mxu_grid


def _ref_filter(img, x, t, srgb):
    """Numpy oracle: bilinear-spatial/nearest-color splat -> radius-2
    separable blur (calibrated sigmas) -> bilinear/nearest slice."""
    h, w, c = x.shape
    nty, ntx = -(-h // t), -(-w // t)
    gy, gx = nty + 1, ntx + 1
    gc = int(round(255.0 / srgb)) + 1
    grid = np.zeros((gy, gx, gc, gc, gc, c), np.float64)
    cell = np.clip(np.round(img / srgb).astype(int), 0, gc - 1)
    for y in range(h):
        for xx in range(w):
            ly, fy = y // t, (y % t) / t
            lx, fx = xx // t, (xx % t) / t
            cr, cg, cb = cell[y, xx]
            for by, wy in ((0, 1 - fy), (1, fy)):
                for bx, wx in ((0, 1 - fx), (1, fx)):
                    grid[ly + by, lx + bx, cr, cg, cb] += (
                        wy * wx * x[y, xx])

    def conv_axis(g, sigma, axis):
        r = mxu_grid._BLUR_RADIUS
        taps = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2)
        out = np.zeros_like(g)
        n = g.shape[axis]
        for i, tap in enumerate(taps):
            off = i - r
            src = [slice(None)] * g.ndim
            dst = [slice(None)] * g.ndim
            src[axis] = slice(max(0, off), min(n, n + off))
            dst[axis] = slice(max(0, -off), min(n, n - off))
            out[tuple(dst)] += tap * g[tuple(src)]
        return out

    for axis, sig in ((0, mxu_grid._SIGMA_SPATIAL),
                      (1, mxu_grid._SIGMA_SPATIAL),
                      (2, mxu_grid._SIGMA_COLOR),
                      (3, mxu_grid._SIGMA_COLOR),
                      (4, mxu_grid._SIGMA_COLOR)):
        grid = conv_axis(grid, sig, axis)

    out = np.zeros_like(x, np.float64)
    for y in range(h):
        for xx in range(w):
            ly, fy = y // t, (y % t) / t
            lx, fx = xx // t, (xx % t) / t
            cr, cg, cb = cell[y, xx]
            for by, wy in ((0, 1 - fy), (1, fy)):
                for bx, wx in ((0, 1 - fx), (1, fx)):
                    out[y, xx] += wy * wx * grid[
                        ly + by, lx + bx, cr, cg, cb]
    return out


@pytest.mark.parametrize('hw,t,srgb,c', [
    ((13, 17), 4, 64.0, 3),   # ragged tiles, padded P (t*t=16)
    ((16, 16), 4, 96.0, 5),   # exact tiles
    ((11, 9), 3, 64.0, 2),    # t*t=9 -> P padded to 16
])
def test_mxu_filter_matches_numpy_oracle(hw, t, srgb, c):
    h, w = hw
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, (2, h, w, 3)).astype(np.float32)
    x = rng.uniform(0, 1, (2, h, w, c)).astype(np.float32)

    g = mxu_grid.MXUBilateralGrid(jnp.asarray(imgs), float(t), srgb, c,
                                  interpret=True)
    got = np.asarray(g.filter(jnp.asarray(x)))

    for b in range(2):
        want = _ref_filter(imgs[b], x[b].astype(np.float64), t, srgb)
        scale = np.abs(want).max() + 1e-6
        # grid compute runs in bf16 — tolerance reflects that
        np.testing.assert_allclose(got[b] / scale, want / scale,
                                   atol=2e-2)


def test_applicable():
    assert mxu_grid.applicable(40.0, 13.0)      # bench config
    assert mxu_grid.applicable(80.0, 13.0)      # SEC/DSRG test config
    assert not mxu_grid.applicable(40.5, 13.0)  # non-integer cell
    assert not mxu_grid.applicable(40.0, 5.0)   # 52^3 color cube > VMEM
    assert not mxu_grid.applicable(2.0, 13.0)   # tiny sxy -> direct path
