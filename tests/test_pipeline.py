"""Host data pipeline: devkit loader (fake tree) + synthetic fixtures."""
import csv
import os

import numpy as np
from PIL import Image

from wsss_tpu.data import registry
from wsss_tpu.data.pipeline import DevkitDataset, SyntheticWSSS, \
    open_dataset


def _fake_voc_devkit(root, n=3, size=24):
    base = os.path.join(root, 'VOCdevkit', 'VOC_trainaug_val', 'VOC2012')
    img_dir = os.path.join(base, 'JPEGImages')
    gt_dir = os.path.join(base, 'SegmentationClassAug')
    split_dir = os.path.join(base, 'ImageSets', 'Segmentation')
    for d in (img_dir, gt_dir, split_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    names = [f'2007_{i:06d}' for i in range(n)]
    with open(os.path.join(split_dir, 'val.txt'), 'w') as f:
        f.write('\n'.join(names) + '\n')
    for nm in names:
        img = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, nm + '.jpg'))
        gt = rng.integers(0, 21, (size, size)).astype(np.uint8)
        # palettized like VOC GT
        pim = Image.fromarray(gt, mode='P')
        pal = registry.get('VOC2012').palette_array()
        pim.putpalette(np.concatenate(
            [pal, np.zeros((256 - len(pal), 3), np.uint8)]).tobytes())
        pim.save(os.path.join(gt_dir, nm + '.png'))
    return names


def test_devkit_loader_voc(tmp_path):
    names = _fake_voc_devkit(str(tmp_path))
    spec = registry.get('VOC2012')
    ds = DevkitDataset(spec, str(tmp_path), 'val', size=24)
    assert len(ds) == 3
    batches = list(ds.batches(2, with_gt=True))
    assert batches[0].images.shape == (2, 24, 24, 3)
    assert batches[0].gt is not None
    assert batches[0].gt.shape == (2, 24, 24)
    assert batches[0].gt.max() < 21
    assert batches[0].names == names[:2]


def test_open_dataset_fallback_to_synthetic(tmp_path):
    ds = open_dataset('VOC2012', str(tmp_path), 'val', size=24,
                      synthetic_n=5)
    assert isinstance(ds, SyntheticWSSS)
    ds2 = open_dataset('VOC2012', None, 'val', size=24, synthetic_n=5)
    assert isinstance(ds2, SyntheticWSSS)


def test_open_dataset_prefers_devkit(tmp_path):
    _fake_voc_devkit(str(tmp_path))
    ds = open_dataset('VOC2012', str(tmp_path), 'val', size=24)
    assert isinstance(ds, DevkitDataset)


def test_synthetic_determinism_and_tags():
    a = SyntheticWSSS('VOC2012', size=32, n_images=4, seed=3)
    b = SyntheticWSSS('VOC2012', size=32, n_images=4, seed=3)
    ba = next(a.batches(4))
    bb = next(b.batches(4))
    np.testing.assert_array_equal(ba.images, bb.images)
    # tags reflect GT content exactly
    for i in range(4):
        present = set(np.unique(ba.gt[i])) - {0}
        tagged = set(np.where(ba.tags[i] > 0.5)[0] + 1)
        assert present == tagged


def test_packaged_reference_splits_ship():
    """The reference's evaluation protocol ships as data (03b_irn/
    voc12/*.txt etc.); counts pin the published splits."""
    from wsss_tpu.data.pipeline import packaged_split_path

    def count(ds, split):
        path = packaged_split_path(ds, split)
        assert path is not None, (ds, split)
        with open(path) as f:
            return sum(1 for ln in f if ln.strip())

    assert count('VOC2012', 'val') == 1449
    assert count('VOC2012', 'train_aug') == 10582
    assert count('ADP-morph', 'tuning') == 50
    assert count('ADP-func', 'evaluation') == 50
    assert count('DeepGlobe', 'test') == 200
    assert count('DeepGlobe', 'train75') == 603
    assert count('DeepGlobe_balanced', 'train37.5') == 302
    assert packaged_split_path('VOC2012', 'nope') is None
