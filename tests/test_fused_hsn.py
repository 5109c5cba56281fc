"""Parity tests for the FUSED CAM->CRF->argmax path — the bench
headline program (methods/hsn.py `_fused_crf_argmax` / `_shard_mapped`,
ops/crf/meanfield.py `mean_field_fused` / `fused_mxu_ok`) — the round-4
symbols that previously appeared in no test.

Everything runs the MXU grid in Pallas interpret mode on the CPU test
backend with f32 mean-field state (bf16 state is a TPU-compiled-path
optimization whose label agreement is A/B'd on hardware every bench run,
bench.py extras.crf_state_bf16_label_agree).  Geometry is the smallest
that still routes to the MXU grid (_routes_to_grid needs > 10240 px) and
exercises the spatially-downsampled message (bi_sxy >= MXU_DS_MIN_SXY).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsss_tpu.data import registry
from wsss_tpu.methods import hsn
from wsss_tpu.methods.gradcam_cues import _ClassifierHandle
from wsss_tpu.ops.crf import meanfield
from wsss_tpu.ops.crf import mxu_grid
from wsss_tpu.ops.crf.config import CRFConfig

SIZE = 112
# grid-routed + ds-message config: bi_sxy=28 >= MXU_DS_MIN_SXY=24 and
# SIZE >= 2*bi_sxy, so the bilateral message computes at ds_cell=8 px
# cells exactly like the production VOC headline (bi_sxy=40 @ 321^2)
CFG = CRFConfig(1.5, 3, 28.0, 40.0, 10.0, iterations=2)


@pytest.fixture
def interpret_mxu(monkeypatch):
    monkeypatch.setattr(meanfield, '_MXU_FORCE_INTERPRET', True)


def test_fused_gate_accepts_headline_class_geometry(interpret_mxu):
    assert meanfield.fused_mxu_ok((SIZE, SIZE), 6, CFG)
    # non-grid-routed config (dense path) must be refused
    small = CRFConfig(1.5, 3, 4.0, 13.0, 10.0, iterations=2)
    assert not meanfield.fused_mxu_ok((48, 48), 6, small)
    # bilateral-free config must be refused (no grid to fuse)
    nobi = CRFConfig(1.5, 3, 28.0, 40.0, 0.0, iterations=2)
    assert not meanfield.fused_mxu_ok((SIZE, SIZE), 6, nobi)


def test_mean_field_fused_matches_mean_field(interpret_mxu):
    """mean_field_fused (static chunk subgraphs inside one trace) ==
    mean_field (host-level chunk dispatch chain) — identical math,
    different program structure."""
    rng = np.random.default_rng(0)
    b, c = 3, 4                       # odd batch: exercises the remainder
    probs = jax.nn.softmax(jnp.asarray(
        rng.normal(0, 2, (b, SIZE, SIZE, c)).astype(np.float32)))
    imgs = jnp.asarray(
        rng.uniform(0, 255, (b, SIZE, SIZE, 3)).astype(np.float32))

    assert meanfield.fused_mxu_ok((SIZE, SIZE), c, CFG)
    got = np.asarray(jax.jit(
        lambda p, i: meanfield.mean_field_fused(p, i, CFG))(probs, imgs))
    want = np.asarray(meanfield.mean_field(probs, imgs, CFG))
    np.testing.assert_allclose(got, want, atol=2e-5)
    # single-image form
    got1 = np.asarray(meanfield.mean_field_fused(probs[0], imgs[0], CFG))
    np.testing.assert_allclose(got1, want[0], atol=2e-5)


def _deepglobe_segmenter():
    # DeepGlobe (no bg net) keeps every pixel's label independent of the
    # rest of the batch — the VOC bg channel takes a batch-global max
    # (03c_hsn/demo.py:142-148) that is shard-local on the mesh path.
    spec = registry.get('DeepGlobe')
    fg = _ClassifierHandle.random('M7', spec.n_fg_classes, SIZE, seed=2)
    return hsn.HSNSegmenter(spec, fg, cfg=CFG, drop_last_class=True)


def test_fused_hsn_segment_matches_staged(interpret_mxu):
    """The one-device-program segment step (_fused_crf_argmax) must label
    like the staged path (separate CAM jit + host-dispatched CRF)."""
    seg = _deepglobe_segmenter()
    assert seg._fused is not None      # the gate built the fused program
    rng = np.random.default_rng(1)
    imgs = rng.uniform(0, 255, (2, SIZE, SIZE, 3)).astype(np.float32)

    fused = np.asarray(seg.segment_batch(imgs))
    seg._fused = None                  # force the staged fallback
    staged = np.asarray(seg.segment_batch(imgs))
    agree = (fused == staged).mean()
    assert agree > 0.995, agree


def test_fused_mesh_matches_single_device(interpret_mxu):
    """_shard_mapped (per-shard fused step over the 'data' axis) must
    label like the single-device fused program.  DeepGlobe: per-image
    math, so shard-local == global (the VOC bg-net batch-max quirk is
    the documented exception, methods/hsn.py:123-128)."""
    from wsss_tpu.parallel.mesh import make_mesh
    seg = _deepglobe_segmenter()
    assert seg._fused is not None
    rng = np.random.default_rng(4)
    imgs = rng.uniform(0, 255, (4, SIZE, SIZE, 3)).astype(np.float32)

    single = np.asarray(seg.segment_batch(imgs))
    mesh = make_mesh(2, axis_names=('data',))
    meshed = np.asarray(seg.segment_batch(imgs, mesh=mesh))
    assert mesh in seg._mesh_fused     # the fused mesh path actually ran
    agree = (meshed == single).mean()
    assert agree > 0.995, agree


def test_mxu_chunk_choice(monkeypatch):
    """CRF dispatch-chunk tuning keys on v2_active (the kernels that
    will ACTUALLY run), not bare v2 eligibility: chunk-of-2 only when
    the v2 corner-tiled kernels take the config."""
    cfg = CRFConfig(1.5, 3, 40.0, 13.0, 10.0, iterations=10)
    # compiled path (interpret False): bench config is v2-eligible
    monkeypatch.setattr(meanfield, '_MXU_FORCE_INTERPRET', False)
    assert mxu_grid.v2_active(cfg.bi_srgb, 21, meanfield.MXU_CELL_MULT)
    assert meanfield._mxu_chunk(8, 21, cfg) == 2
    assert meanfield._mxu_chunk(1, 21, cfg) == 1   # nothing to pair
    # interpret mode falls back to v1 kernels -> B=1 chunking
    monkeypatch.setattr(meanfield, '_MXU_FORCE_INTERPRET', True)
    if not mxu_grid.FORCE_V2_INTERPRET:
        assert meanfield._mxu_chunk(8, 21, cfg) == 1
    # v1 kill switch forces v1 chunking even on the compiled path
    monkeypatch.setattr(meanfield, '_MXU_FORCE_INTERPRET', False)
    monkeypatch.setattr(mxu_grid, '_V2_DISABLED', True)
    assert meanfield._mxu_chunk(8, 21, cfg) == 1


def test_state_bf16_is_a_static_cache_key(interpret_mxu):
    """state_bf16 must participate in the jit cache key — the round-4
    module-global flip reused the cached trace, making its A/B vacuous
    (ADVICE r4 #1).  Two calls differing only in state_bf16 must yield
    two cache entries."""
    rng = np.random.default_rng(7)
    probs = jax.nn.softmax(jnp.asarray(
        rng.normal(0, 2, (1, SIZE, SIZE, 3)).astype(np.float32)))
    imgs = jnp.asarray(
        rng.uniform(0, 255, (1, SIZE, SIZE, 3)).astype(np.float32))
    kw = dict(g_sxy=CFG.g_sxy, g_compat=CFG.g_compat, bi_sxy=CFG.bi_sxy,
              bi_srgb=CFG.bi_srgb, bi_compat=CFG.bi_compat,
              iterations=1, exclude_self=True, interpret=True,
              cell_mult=meanfield.MXU_CELL_MULT)
    meanfield._mean_field_mxu.clear_cache()
    meanfield._mean_field_mxu(probs, imgs, state_bf16=False, **kw)
    n0 = meanfield._mean_field_mxu._cache_size()
    meanfield._mean_field_mxu(probs, imgs, state_bf16=True, **kw)
    assert meanfield._mean_field_mxu._cache_size() == n0 + 1
    meanfield._mean_field_mxu.clear_cache()
