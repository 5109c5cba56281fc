"""End-to-end cue generation (02_cues equivalent) on synthetic data."""
import numpy as np
import pytest

from wsss_tpu.data import registry
from wsss_tpu.data.pipeline import SyntheticWSSS
from wsss_tpu.io import artifacts
from wsss_tpu.methods import gradcam_cues as gc


@pytest.fixture(scope='module')
def voc_gen():
    fg = gc._ClassifierHandle.random('M7', 20, 64, seed=0)
    bg = gc._ClassifierHandle.random('M7', 20, 64, seed=1)
    return gc.VOCDeepGlobeCueGenerator(registry.get('VOC2012'), fg, bg,
                                       thresh=0.2)


def test_voc_pipeline_shapes_and_pickle(voc_gen, tmp_path):
    ds = SyntheticWSSS('VOC2012', size=64, n_images=8)
    cue_dict = voc_gen.run(ds.batches(4))
    # pickle contract: '{i}_labels' / '{i}_cues' 3xN arrays
    assert set(cue_dict) == {f'{i}_labels' for i in range(8)} | \
        {f'{i}_cues' for i in range(8)}
    for i in range(8):
        sp = cue_dict[f'{i}_cues']
        assert sp.shape[0] == 3
        assert sp[0].max(initial=0) < 21
        assert sp[1].max(initial=0) < 41 and sp[2].max(initial=0) < 41
        # labels offset by +1 for bg channel (02_cues/demo.py:205)
        labels = cue_dict[f'{i}_labels']
        assert labels.min(initial=99) >= 1
    # round-trips through the pickle writer
    p = tmp_path / 'cues' / 'localization_cues.pickle'
    artifacts.write_cue_pickle(str(p), cue_dict)
    back = artifacts.read_cue_pickle(str(p))
    np.testing.assert_array_equal(back['3_cues'], cue_dict['3_cues'])


def test_voc_pass_mask_respects_gt_tags(voc_gen):
    ds = SyntheticWSSS('VOC2012', size=64, n_images=4)
    b = next(ds.batches(4))
    _, is_pass = voc_gen.generate_batch(b.images, b.tags)
    is_pass = np.asarray(is_pass)
    # a class not in the image-level tags can never pass
    assert not np.any(is_pass & (b.tags < 0.5))


def test_voc_cues_disjoint_with_bg(voc_gen):
    ds = SyntheticWSSS('VOC2012', size=64, n_images=4)
    b = next(ds.batches(4))
    onehot, _ = voc_gen.generate_batch(b.images, b.tags)
    onehot = np.asarray(onehot)
    assert onehot.shape == (4, 41, 41, 21)
    assert np.all(onehot.sum(-1) <= 1)
    # bg channel populated by the lowest-decile rule
    assert onehot[..., 0].sum() > 0


def test_deepglobe_no_bg():
    fg = gc._ClassifierHandle.random('M7', 6, 64, seed=2)
    g = gc.VOCDeepGlobeCueGenerator(registry.get('DeepGlobe'), fg,
                                    thresh=0.3)
    ds = SyntheticWSSS('DeepGlobe', size=64, n_images=4)
    b = next(ds.batches(4))
    onehot, is_pass = g.generate_batch(b.images, b.tags)
    assert onehot.shape == (4, 41, 41, 6)
    inds = g.class_inds(np.asarray(is_pass))
    for i, p in enumerate(np.asarray(is_pass)):
        np.testing.assert_array_equal(inds[i], np.where(p)[0])  # no offset


def test_adp_pipeline():
    h = gc._ClassifierHandle.random('X1.7', 51, 64, seed=3)
    g = gc.ADPCueGenerator(h, 'X1.7', thresh=0.9)
    ds = SyntheticWSSS('ADP-morph', size=64, n_images=4)
    out_m, out_f = g.run(ds.batches(2))
    assert f'3_cues' in out_m and f'3_cues' in out_f
    for i in range(4):
        assert out_m[f'{i}_cues'].shape[0] == 3
        # morph cues live on 29 channels, func on 5
        assert out_m[f'{i}_cues'][0].max(initial=0) < 29
        assert out_f[f'{i}_cues'][0].max(initial=0) < 5
        # func labels always include 'Other' (=1) (02_cues/demo.py:305)
        assert 1 in out_f[f'{i}_labels']


def test_eval_cues_miou_synthetic(voc_gen):
    ds = SyntheticWSSS('VOC2012', size=64, n_images=8)
    cue_dict = voc_gen.run(ds.batches(4))
    iou, miou = gc.eval_cues_miou(cue_dict, ds.batches(4, with_gt=True), 21)
    assert iou.shape == (21,)
    assert 0.0 <= miou <= 1.0


def test_sharded_cue_generation_matches(voc_gen):
    """Mesh-sharded whole-split cue gen must equal the single-device run
    (replaces the reference's per-GPU process spawn, SURVEY.md §2.8)."""
    from wsss_tpu.parallel.mesh import make_mesh
    ds = SyntheticWSSS('VOC2012', size=64, n_images=6)  # pads 6 -> 8
    single = voc_gen.run(ds.batches(6))
    sharded = voc_gen.run(ds.batches(6), mesh=make_mesh(8, ('data',)))
    assert set(single) == set(sharded)
    for k in single:
        np.testing.assert_array_equal(single[k], sharded[k], err_msg=k)


def test_save_cue_images(voc_gen, tmp_path):
    ds = SyntheticWSSS('VOC2012', size=64, n_images=4)
    cue_dict = voc_gen.run(ds.batches(4))
    n = gc.save_cue_images(cue_dict, ds.batches(4, with_gt=True),
                           np.zeros((21, 3), np.uint8) + 7,
                           str(tmp_path), 21)
    assert n == 4
    import os
    files = os.listdir(tmp_path)
    assert sum(f.endswith('_overlay.png') for f in files) == 4
    assert len(files) == 8
