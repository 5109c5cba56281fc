"""HistoSegNet inference end-to-end on synthetic data (small shapes)."""
import numpy as np

from wsss_tpu.data import registry
from wsss_tpu.data.pipeline import SyntheticWSSS
from wsss_tpu.methods import hsn
from wsss_tpu.methods.gradcam_cues import _ClassifierHandle
from wsss_tpu.ops.crf.config import CRFConfig


def _small_cfg():
    return CRFConfig(1.5, 3, 4.0, 13, 10, iterations=2)


def test_hsn_voc_pipeline():
    fg = _ClassifierHandle.random('M7', 20, 48, seed=0)
    bg = _ClassifierHandle.random('M7', 20, 48, seed=1)
    seg = hsn.HSNSegmenter(registry.get('VOC2012'), fg, bg,
                           cfg=_small_cfg())
    ds = SyntheticWSSS('VOC2012', size=48, n_images=2)
    b = next(ds.batches(2))
    labels = np.asarray(seg.segment_batch(b.images))
    assert labels.shape == (2, 48, 48)
    assert labels.min() >= 0 and labels.max() < 21


def test_hsn_deepglobe_drop_last():
    fg = _ClassifierHandle.random('M7', 7, 48, seed=2)  # 6 + unknown
    seg = hsn.HSNSegmenter(registry.get('DeepGlobe'), fg,
                           cfg=_small_cfg(), drop_last_class=True)
    ds = SyntheticWSSS('DeepGlobe', size=48, n_images=2)
    b = next(ds.batches(2))
    labels = np.asarray(seg.segment_batch(b.images))
    assert labels.max() < 6  # last (dropped) class can never win


def test_hsn_adp_pipeline():
    h = _ClassifierHandle.random('X1.7', 51, 48, seed=3)
    seg = hsn.ADPHSNSegmenter(h, 'X1.7', cfg_morph=_small_cfg(),
                              cfg_func=_small_cfg())
    ds = SyntheticWSSS('ADP-morph', size=48, n_images=2)
    b = next(ds.batches(2))
    lab_m, lab_f = seg.segment_batch(b.images)
    assert np.asarray(lab_m).shape == (2, 48, 48)
    assert np.asarray(lab_m).max() < 29
    assert np.asarray(lab_f).max() < 5


def test_segment_batch_mesh_parity():
    """mesh-sharded whole-split segmentation matches the single-device
    path (make_cam.py:120-122 per-GPU split as one program)."""
    import jax
    from jax.sharding import Mesh
    from wsss_tpu.data import registry
    from wsss_tpu.methods import gradcam_cues as gc
    from wsss_tpu.methods.hsn import HSNSegmenter

    spec = registry.get('VOC2012')
    size = 41   # tiny: dense CRF path
    fg = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes, size)
    bg = gc._ClassifierHandle.random('VGG16', spec.n_fg_classes, size,
                                     seed=1)
    seg = HSNSegmenter(spec, fg, bg, model_type='VGG16')
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, (3, size, size, 3)).astype(np.float32)

    want = np.asarray(seg.segment_batch(imgs))
    mesh = Mesh(np.asarray(jax.devices()[:4]), ('data',))
    got = np.asarray(seg.segment_batch(imgs, mesh=mesh))
    assert got.shape == want.shape
    agree = (got == want).mean()
    assert agree > 0.99, agree
