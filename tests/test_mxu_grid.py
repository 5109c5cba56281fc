"""Parity tests for the MXU bilateral grid (Pallas one-hot-matmul
splat/slice) against a straight numpy implementation of the identical
math.  Runs in Pallas interpret mode on the CPU test backend; the real
Mosaic lowering is exercised by the TPU bench/fidelity paths."""
import numpy as np
import pytest

import jax.numpy as jnp

from wsss_tpu.ops.crf import mxu_grid


def _ref_filter(img, x, t, srgb, k_sp=1):
    """Numpy oracle: bilinear-spatial/nearest-color splat -> separable
    blur (calibrated sigmas; spatial sigma sqrt(k^2-1/3) cells with
    radius 3*sigma) -> bilinear/nearest slice."""
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

    def conv_axis(g, sigma, radius, axis):
        taps = np.exp(-0.5 * (np.arange(-radius, radius + 1)
                              / sigma) ** 2)
        out = np.zeros_like(g)
        n = g.shape[axis]
        for i, tap in enumerate(taps):
            off = i - radius
            if abs(off) >= n:
                continue
            src = [slice(None)] * g.ndim
            dst = [slice(None)] * g.ndim
            src[axis] = slice(max(0, off), min(n, n + off))
            dst[axis] = slice(max(0, -off), min(n, n - off))
            out[tuple(dst)] += tap * g[tuple(src)]
        return out

    sig_sp = np.sqrt(k_sp ** 2 - 1.0 / 3.0)
    rad_sp = max(2, int(np.ceil(3.0 * sig_sp)))
    for axis, sig, rad in ((0, sig_sp, rad_sp),
                           (1, sig_sp, rad_sp),
                           (2, mxu_grid._SIGMA_COLOR, 2),
                           (3, mxu_grid._SIGMA_COLOR, 2),
                           (4, mxu_grid._SIGMA_COLOR, 2)):
        grid = conv_axis(grid, sig, rad, axis)

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


def test_mxu_filter_subcell_spatial_matches_oracle(monkeypatch):
    """sxy > _MAX_TILE splits the spatial cell (t = sxy/k) with the blur
    sigma rescaled to k cells — parity vs the oracle at k=2."""
    monkeypatch.setattr(mxu_grid, '_MAX_TILE', 3)
    h, w, c, srgb = 13, 11, 3, 64.0
    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    x = rng.uniform(0, 1, (1, h, w, c)).astype(np.float32)
    g = mxu_grid.MXUBilateralGrid(jnp.asarray(imgs), 6.0, srgb, c,
                                  interpret=True)
    assert (g.t, g.k_sp) == (3, 2)
    got = np.asarray(g.filter(jnp.asarray(x)))[0]
    want = _ref_filter(imgs[0], x[0].astype(np.float64), 3, srgb, k_sp=2)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)


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


@pytest.mark.parametrize('srgb', [
    64.0,   # gc=5: lbv not a multiple of 4 -> per-lo splat dots
    36.0,   # gc=8: lbv % 4 == 0 -> quad-stacked splat dots (prod shape)
])
def test_v2_matches_v1_interpret(monkeypatch, srgb):
    """The corner-tiled v2 kernels are a layout variant of the same
    math as v1; interpret mode runs v1 by default (6x faster there), so
    this test forces v2 on a tiny config and pins v2 == v1."""
    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 255, (1, 13, 17, 3)).astype(np.float32)
    x = rng.uniform(0, 1, (1, 13, 17, 3)).astype(np.float32)

    g1 = mxu_grid.MXUBilateralGrid(jnp.asarray(imgs), 4.0, srgb, 3,
                                   interpret=True)
    assert not g1.v2
    want = np.asarray(g1.filter(jnp.asarray(x)))

    monkeypatch.setattr(mxu_grid, 'FORCE_V2_INTERPRET', True)
    g2 = mxu_grid.MXUBilateralGrid(jnp.asarray(imgs), 4.0, srgb, 3,
                                   interpret=True)
    assert g2.v2
    if srgb == 36.0:
        assert g2.lbv % 4 == 0      # must exercise the quad-dot branch
    got = np.asarray(g2.filter(jnp.asarray(x)))

    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-2)

    # the C=1 normalizer shares geometry with the message grid; the
    # sharing pair must agree on the layout (meanfield share_from path)
    gn = mxu_grid.MXUBilateralGrid(jnp.asarray(imgs), 4.0, srgb, 1,
                                   interpret=True, share_from=g2)
    assert gn.v2
    ones = jnp.ones((1, 13, 17, 1), jnp.float32)
    n2 = np.asarray(gn.filter(ones))
    gn1 = mxu_grid.MXUBilateralGrid(jnp.asarray(imgs), 4.0, srgb, 1,
                                    interpret=True, share_from=g1)
    assert not gn1.v2
    n1 = np.asarray(gn1.filter(ones))
    nscale = np.abs(n1).max() + 1e-6
    np.testing.assert_allclose(n2 / nscale, n1 / nscale, atol=2e-2)


def test_deepglobe_class_routing_interpret(monkeypatch):
    """The DeepGlobe HSN config (sxy=40 -> downsampled message, srgb=13
    -> gc=16 cube, C=7, non-square image) must route to the MXU path
    and produce a normalized field — the reduced-scale twin of the
    2448^2 full-res bench (scripts/bench_stages.py)."""
    from wsss_tpu.ops.crf import config as crf_config
    from wsss_tpu.ops.crf import meanfield

    cfg = crf_config.CRFConfig(1.5, 3, 40.0, 13, 10, iterations=1)
    h, w, c = 200, 160, 7
    monkeypatch.setattr(meanfield, '_MXU_FORCE_INTERPRET', True)
    assert meanfield._mxu_ok((h, w), c, cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    p = jnp.asarray(rng.dirichlet(np.ones(c), (h, w)).astype(np.float32))
    q = np.asarray(meanfield.mean_field(p, img, cfg))
    assert np.isfinite(q).all() and q.shape == (h, w, c)
    np.testing.assert_allclose(q.sum(-1), 1.0, atol=1e-3)


def test_v2_eligible_matches_grid_flag(monkeypatch):
    """meanfield's dispatch-chunk choice consults v2_eligible; it must
    agree with the layout the constructor actually picks."""
    monkeypatch.setattr(mxu_grid, 'FORCE_V2_INTERPRET', True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (1, 8, 8, 3))
                       .astype(np.float32))
    for srgb, c in [(64.0, 3), (36.0, 21), (64.0, 33)]:
        g = mxu_grid.MXUBilateralGrid(imgs, 4.0, srgb, c,
                                      interpret=True)
        assert g.v2 == mxu_grid.v2_eligible(srgb, c), (srgb, c)
    assert not mxu_grid.v2_eligible(64.0, 33)      # wide channels


def test_applicable():
    assert mxu_grid.applicable(40.0, 13.0)      # bench config
    assert mxu_grid.applicable(80.0, 13.0)      # SEC/DSRG test config
    assert not mxu_grid.applicable(40.5, 13.0)  # non-integer cell
    assert not mxu_grid.applicable(40.0, 5.0)   # 52^3 color cube > VMEM
    assert not mxu_grid.applicable(2.0, 13.0)   # tiny sxy -> direct path


def test_mxu_fidelity_vs_permutohedral():
    """The MXU grid must match the exact mean field at least as well as
    the permutohedral lattice (= pydensecrf's structure) at the label
    level — same bar the 'fast' scatter grid is held to
    (test_native_crf.py::test_grid_fidelity_vs_permutohedral)."""
    import jax
    from wsss_tpu.ops.crf import config as crf_config
    from wsss_tpu.ops.crf import native, reference
    from wsss_tpu.ops.crf.meanfield import gaussian_message
    if not native.available():
        pytest.skip('native permutohedral oracle not built')

    rng = np.random.default_rng(0)
    h = w = 30                    # interpret-mode cost: keep it small
    img = rng.normal(128, 18, (h, w, 3)).astype(np.float32)
    for i in range(0, h, 7):
        img[np.arange(h), (np.arange(h) + i) % w] = (220, 60, 60)
    img = np.clip(img, 0, 255)
    probs = rng.dirichlet(np.ones(5) * 5, (h, w)).astype(np.float32)
    probs[img[..., 0] > 180] += np.eye(5, dtype=np.float32)[1] * 0.12
    probs = probs / probs.sum(-1, keepdims=True)

    cfg = crf_config.CRFConfig(1.0, 3, 3.0, 20, 10, iterations=6)
    want = reference.mean_field_exact(probs, img, cfg).argmax(-1)
    perm = native.mean_field_native(probs, img, cfg).argmax(-1)
    perm_agree = (perm == want).mean()

    from wsss_tpu.ops.crf import meanfield

    # the COARSE inference default (MXU_CELL_MULT); exact-srgb sampling
    # scores higher still (measured 0.946 vs permutohedral 0.882 on the
    # larger 36^2/10-iter adversarial toy) but is covered by the oracle
    # parity + dispatch tests
    U = -jnp.log(jnp.clip(jnp.asarray(probs), 1e-10, None))
    Q = jax.nn.softmax(-U, -1)[None]
    filt = mxu_grid.MXUBilateralGrid(
        jnp.asarray(img)[None], cfg.bi_sxy, cfg.bi_srgb, 5,
        interpret=True, cell_mult=meanfield.MXU_CELL_MULT)
    ones = jnp.ones((1, h, w, 1))
    nb = jax.lax.rsqrt(jnp.maximum(filt.filter(ones), 1e-20))
    for _ in range(cfg.iterations):
        mb = nb * filt.filter(nb * Q) - nb * nb * Q
        mg = gaussian_message(Q[0], cfg.g_sxy)[None]
        Q = jax.nn.softmax(-U[None] + cfg.g_compat * mg
                           + cfg.bi_compat * mb, -1)
    agree = (np.asarray(Q[0].argmax(-1)) == want).mean()
    # must match the exact mean field at least as well as pydensecrf's
    # own structure (the permutohedral) — justifies the coarse default
    assert agree >= perm_agree, (agree, perm_agree)
    assert agree > 0.97, agree


def test_mean_field_mxu_dispatch_matches_fast_path(monkeypatch):
    """Forcing the MXU path (interpret mode) through the public
    mean_field must agree with the scatter-grid path on a config that
    routes to BilateralGrid."""
    from wsss_tpu.ops.crf import config as crf_config
    from wsss_tpu.ops.crf import meanfield

    h = w = 104                      # >10240 px -> grid routing
    cfg = crf_config.CRFConfig(1.0, 3, 13.0, 24, 10, iterations=2)
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (2, h, w, 3)).astype(np.float32)
    probs = rng.dirichlet(np.ones(4), (2, h, w)).astype(np.float32)

    assert meanfield._routes_to_grid((h, w), cfg.bi_sxy, cfg.bi_srgb)
    want = np.asarray(meanfield.mean_field(
        jnp.asarray(probs), jnp.asarray(img), cfg))     # fast path (CPU)

    monkeypatch.setattr(meanfield, '_MXU_FORCE_INTERPRET', True)
    # exact-srgb sampling isolates the dispatch plumbing; the coarse
    # default's fidelity is pinned separately below
    monkeypatch.setattr(meanfield, 'MXU_CELL_MULT', 1.0)
    # spy: the MXU branch must actually be taken (a dispatch regression
    # would silently compare the scatter path against itself)
    calls = []
    real = meanfield._mean_field_mxu
    monkeypatch.setattr(meanfield, '_mean_field_mxu',
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    got = np.asarray(meanfield.mean_field(
        jnp.asarray(probs), jnp.asarray(img), cfg))     # mxu interpret
    assert calls, 'MXU dispatch branch was not taken'

    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.95, corr
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_chunk_dispatch_matches_per_image(monkeypatch):
    """mean_field's chunk-of-2 dynamic-slice chain (with odd-batch
    remainder) must equal per-image calls on the same inputs.  b=3
    exercises one k=2 chunk plus the k=1 remainder; interpret mode
    (v1 kernels) shares the chunking code with the TPU path."""
    from wsss_tpu.ops.crf import config as crf_config
    from wsss_tpu.ops.crf import meanfield

    h = w = 104                      # >10240 px -> grid routing
    cfg = crf_config.CRFConfig(1.0, 3, 16.0, 24, 10, iterations=1)
    monkeypatch.setattr(meanfield, '_MXU_FORCE_INTERPRET', True)
    assert meanfield._mxu_ok((h, w), 4, cfg)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 255, (3, h, w, 3))
                      .astype(np.float32))
    probs = jnp.asarray(rng.dirichlet(np.ones(4), (3, h, w))
                        .astype(np.float32))
    got = np.asarray(meanfield.mean_field(probs, img, cfg))
    for b in range(3):
        want = np.asarray(meanfield.mean_field(probs[b], img[b], cfg))
        np.testing.assert_allclose(got[b], want, atol=1e-5)


def _ref_filter_aligned(img, x, t, srgb, cell_mult=1.0):
    """Numpy oracle for the aligned grid: nearest splat/slice into the
    containing tile's cell, sigma sqrt(4 - 1/6) spatial cells."""
    h, w, c = x.shape
    nty, ntx = -(-h // t), -(-w // t)
    gc = int(round(255.0 / (srgb * cell_mult))) + 1
    grid = np.zeros((nty, ntx, gc, gc, gc, c), np.float64)
    cell = np.clip(np.round(img / (srgb * cell_mult)).astype(int), 0,
                   gc - 1)
    for y in range(h):
        for xx in range(w):
            cr, cg, cb = cell[y, xx]
            grid[y // t, xx // t, cr, cg, cb] += x[y, xx]

    def conv_axis(g, sigma, radius, axis):
        taps = np.exp(-0.5 * (np.arange(-radius, radius + 1)
                              / sigma) ** 2)
        out = np.zeros_like(g)
        n = g.shape[axis]
        for i, tap in enumerate(taps):
            off = i - radius
            if abs(off) >= n:
                continue
            src = [slice(None)] * g.ndim
            dst = [slice(None)] * g.ndim
            src[axis] = slice(max(0, off), min(n, n + off))
            dst[axis] = slice(max(0, -off), min(n, n - off))
            out[tuple(dst)] += tap * g[tuple(src)]
        return out

    sig_sp = np.sqrt(4.0 - 1.0 / 6.0)
    rad_sp = max(2, int(np.ceil(3.0 * sig_sp)))
    sig_c = np.sqrt(max((1.0 / cell_mult) ** 2 - 1.0 / 6.0, 0.05))
    for axis, sig, rad in ((0, sig_sp, rad_sp), (1, sig_sp, rad_sp),
                           (2, sig_c, 2), (3, sig_c, 2), (4, sig_c, 2)):
        grid = conv_axis(grid, sig, rad, axis)

    out = np.zeros_like(x, np.float64)
    for y in range(h):
        for xx in range(w):
            cr, cg, cb = cell[y, xx]
            out[y, xx] = grid[y // t, xx // t, cr, cg, cb]
    return out


@pytest.mark.parametrize('hw,sxy,srgb,c', [
    ((13, 17), 6.0, 64.0, 3),    # t=3, ragged tiles
    ((16, 16), 8.0, 96.0, 5),    # t=4, exact tiles
])
def test_aligned_filter_matches_numpy_oracle(hw, sxy, srgb, c):
    h, w = hw
    rng = np.random.default_rng(1)
    imgs = rng.uniform(0, 255, (2, h, w, 3)).astype(np.float32)
    x = rng.uniform(0, 1, (2, h, w, c)).astype(np.float32)
    g = mxu_grid.AlignedBilateralGrid(jnp.asarray(imgs), sxy, srgb, c,
                                      interpret=True)
    got = np.asarray(g.filter(jnp.asarray(x)))
    for b in range(2):
        want = _ref_filter_aligned(imgs[b], x[b].astype(np.float64),
                                   int(sxy) // 2, srgb)
        scale = np.abs(want).max() + 1e-6
        np.testing.assert_allclose(got[b] / scale, want / scale,
                                   atol=2e-2)


def test_aligned_applicable():
    assert mxu_grid.aligned_applicable(40.0, 13.0)   # bench config
    assert mxu_grid.aligned_applicable(80.0, 13.0)
    assert not mxu_grid.aligned_applicable(41.0, 13.0)  # odd sxy
    assert not mxu_grid.aligned_applicable(40.5, 13.0)
    assert not mxu_grid.aligned_applicable(4.0, 13.0)   # t=2 < 3


def test_spatial_downsampled_message_fidelity(monkeypatch):
    """The wide-kernel spatial downsample (meanfield.MXU_DS_CELL) must
    track the EXACT mean field at least as well as the full-resolution
    MXU grid — the message is smooth at the sxy scale, so computing it
    on a 16-px-cell guide is regularization, not degradation (measured:
    ds 0.975 vs full-res 0.949 agreement on this adversarial toy)."""
    from wsss_tpu.ops.crf import config as crf_config
    from wsss_tpu.ops.crf import meanfield, reference

    rng = np.random.default_rng(2)
    h = w = 64
    img = rng.normal(128, 18, (h, w, 3)).astype(np.float32)
    img[:, : w // 2] += np.array([60, -40, -40], np.float32)
    img = np.clip(img, 0, 255)
    probs = rng.dirichlet(np.ones(4) * 5, (h, w)).astype(np.float32)
    probs[img[..., 0] > 160] += np.eye(4, dtype=np.float32)[1] * 0.15
    probs = probs / probs.sum(-1, keepdims=True)
    cfg = crf_config.CRFConfig(1.0, 3, 32.0, 24, 10, iterations=3)

    monkeypatch.setattr(meanfield, '_MXU_FORCE_INTERPRET', True)
    assert cfg.bi_sxy >= meanfield.MXU_DS_MIN_SXY
    exact = reference.mean_field_exact(probs, img, cfg).argmax(-1)

    kw = dict(g_sxy=cfg.g_sxy, g_compat=cfg.g_compat,
              bi_sxy=cfg.bi_sxy, bi_srgb=cfg.bi_srgb,
              bi_compat=cfg.bi_compat, iterations=cfg.iterations,
              exclude_self=True, interpret=True,
              cell_mult=meanfield.MXU_CELL_MULT)
    ds = np.asarray(meanfield._mean_field_mxu(
        jnp.asarray(probs)[None], jnp.asarray(img)[None], **kw))[0]

    monkeypatch.setattr(meanfield, '_MXU_DS_DISABLED', True)
    meanfield._mean_field_mxu.clear_cache()
    full = np.asarray(meanfield._mean_field_mxu(
        jnp.asarray(probs)[None], jnp.asarray(img)[None], **kw))[0]
    meanfield._mean_field_mxu.clear_cache()

    ds_agree = (ds.argmax(-1) == exact).mean()
    full_agree = (full.argmax(-1) == exact).mean()
    assert ds_agree >= full_agree - 0.005, (ds_agree, full_agree)
    assert ds_agree > 0.94, ds_agree
