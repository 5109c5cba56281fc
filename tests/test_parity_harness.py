"""Turnkey parity harness (cli/parity.py) driven against a REAL devkit
tree on disk — the code path a future accuracy-parity run will take
(VERDICT round-2 item 2: 'needs only a devkit path tomorrow')."""
import os

import numpy as np
import pytest
from PIL import Image

from wsss_tpu.data import registry


def _fake_voc_devkit(root, n=6, size=48):
    base = os.path.join(root, 'VOCdevkit', 'VOC_trainaug_val', 'VOC2012')
    img_dir = os.path.join(base, 'JPEGImages')
    gt_dir = os.path.join(base, 'SegmentationClassAug')
    split_dir = os.path.join(base, 'ImageSets', 'Segmentation')
    for d in (img_dir, gt_dir, split_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    names = [f'2007_{i:06d}' for i in range(n)]
    # train_aug (published train split name) + val
    for split in ('train_aug', 'val'):
        with open(os.path.join(split_dir, split + '.txt'), 'w') as f:
            f.write('\n'.join(names) + '\n')
    pal = registry.get('VOC2012').palette_array()
    for nm in names:
        gt = np.zeros((size, size), np.uint8)
        cls = int(rng.integers(1, 21))
        y, x = rng.integers(4, size - 16, 2)
        gt[y:y + 12, x:x + 12] = cls
        img = pal[gt].astype(np.uint8)  # image colored by class
        Image.fromarray(img).save(os.path.join(img_dir, nm + '.jpg'))
        pim = Image.fromarray(gt, mode='P')
        pim.putpalette(np.concatenate(
            [pal, np.zeros((256 - len(pal), 3), np.uint8)]).tobytes())
        pim.save(os.path.join(gt_dir, nm + '.png'))
    return names


def test_parity_harness_on_devkit(tmp_path, monkeypatch):
    """One command runs classifier -> cues -> HSN on a devkit tree,
    produces the report with published diffs, and exercises the
    devkit loaders (split txt, GT palette decode, tag resolution)."""
    from wsss_tpu.cli import parity
    root = tmp_path / 'data'
    _fake_voc_devkit(str(root))
    monkeypatch.chdir(tmp_path)

    # skip the slow 03a/03b methods: the devkit *path* is what this
    # test pins; every method body is covered by its own tests and the
    # synthetic smoke run of the harness
    with pytest.raises(SystemExit):   # diffs outside budget -> exit 1
        parity.main(['--data_root', str(root), '--datasets', 'VOC2012',
                     '--models', 'vgg16', '--img_size', '32',
                     '--batchsize', '3', '--clf_epochs', '1',
                     '--scales', '1.0',
                     '--skip_methods', 'sec,dsrg,irnet'])
    report = tmp_path / 'eval' / 'parity_report.csv'
    assert report.exists()
    rows = report.read_text().strip().splitlines()
    assert rows[0].startswith('dataset,model,method,split')
    methods = {ln.split(',')[2] for ln in rows[1:]}
    assert {'Grad-CAM', 'HistoSegNet'} <= methods
    # published numbers were diffed (delta column populated)
    assert all(ln.split(',')[6] not in ('', 'None')
               for ln in rows[1:])
