"""Prefetched host->device placement (parallel/mesh.py
prefetch_to_mesh / mesh_batches — the tf.data prefetch role, SURVEY
§2.8) and the uint8 image-transport contract (images may ship as uint8,
4x fewer upload bytes, byte-faithful to the reference's cv2.imread uint8
pipeline; every jitted entry casts to f32 on device)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wsss_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                    mesh_batches, prefetch_to_mesh,
                                    shard_batch)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason='needs the virtual CPU mesh')


class _B:
    def __init__(self, i, n=3):
        rng = np.random.default_rng(i)
        self.images = rng.uniform(0, 255, (n, 8, 8, 3)).astype(np.float32)


def test_prefetch_matches_serial_shard_batch():
    """Order, padding trim and placement must match the serial path."""
    mesh = make_mesh(2, axis_names=('data',))
    batches = [_B(0), _B(1, n=5), _B(2, n=1)]   # 5 and 1 need padding
    got = list(prefetch_to_mesh(mesh, batches,
                                lambda b: (b.images,), depth=2))
    assert [b is g for b, (g, _, _) in zip(batches, got)]
    for b, (orig, (placed,), b0) in zip(batches, got):
        assert orig is b
        assert b0 == b.images.shape[0]
        assert placed.shape[0] % 2 == 0            # padded to shards
        assert placed.sharding.is_equivalent_to(
            batch_sharding(mesh), placed.ndim)
        np.testing.assert_array_equal(np.asarray(placed)[:b0], b.images)


def test_prefetch_surfaces_producer_errors():
    mesh = make_mesh(2, axis_names=('data',))

    def bad():
        yield _B(0)
        raise RuntimeError('loader died')

    it = prefetch_to_mesh(mesh, bad(), lambda b: (b.images,))
    next(it)
    with pytest.raises(RuntimeError, match='loader died'):
        list(it)


def test_mesh_batches_none_passthrough():
    batches = [_B(0), _B(1)]
    got = list(mesh_batches(None, batches, lambda b: (b.images,)))
    for b, (orig, (arr,), b0) in zip(batches, got):
        assert orig is b and arr is b.images and b0 == 3


def test_shard_batch_ships_uint8_unconverted():
    """The transport contract: uint8 (and int/bool) arrays place AS-IS —
    the old unconditional float32 cast silently corrupted them
    (ADVICE r4); only host-side float64 narrows."""
    mesh = make_mesh(2, axis_names=('data',))
    u8 = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    f64 = np.ones((2, 3), np.float64)
    flags = np.array([True, False])
    (a, b, c), b0 = shard_batch(mesh, u8, f64, flags)
    assert a.dtype == jnp.uint8 and b0 == 2
    assert b.dtype == jnp.float32
    assert c.dtype == jnp.bool_
    np.testing.assert_array_equal(np.asarray(a), u8)


def test_fused_hsn_accepts_uint8_transport():
    """Integer-valued images must label identically whether shipped as
    f32 or uint8 (the on-device cast is exact for 0..255 integers)."""
    from wsss_tpu.data import registry
    from wsss_tpu.methods import hsn
    from wsss_tpu.methods.gradcam_cues import _ClassifierHandle
    from wsss_tpu.ops.crf import meanfield
    from wsss_tpu.ops.crf.config import CRFConfig

    size = 112
    cfg = CRFConfig(1.5, 3, 28.0, 40.0, 10.0, iterations=2)
    spec = registry.get('DeepGlobe')
    fg = _ClassifierHandle.random('M7', spec.n_fg_classes, size, seed=2)
    old = meanfield._MXU_FORCE_INTERPRET
    meanfield._MXU_FORCE_INTERPRET = True
    try:
        seg = hsn.HSNSegmenter(spec, fg, cfg=cfg, drop_last_class=True)
        assert seg._fused is not None
        rng = np.random.default_rng(3)
        u8 = rng.integers(0, 256, (2, size, size, 3)).astype(np.uint8)
        mesh = make_mesh(2, axis_names=('data',))
        lab_f32 = np.asarray(seg.segment_batch(u8.astype(np.float32)))
        lab_u8 = np.asarray(seg.segment_batch(u8, mesh=mesh))
        # same input values; mesh vs single-device program structure may
        # reassociate f32 reductions, so compare labels not bits
        assert (lab_u8 == lab_f32).mean() > 0.995
    finally:
        meanfield._MXU_FORCE_INTERPRET = old
