

def test_cls_labels_resolution(tmp_path):
    """txt-only splits resolve tags via the make_cls_labels family:
    cache > VOC XML > GT-mask fallback (ref voc12/make_cls_labels.py)."""
    import numpy as np
    from PIL import Image as PILImage
    from wsss_tpu.data import cls_labels, registry
    from wsss_tpu.data.pipeline import DevkitDataset

    spec = registry.get('VOC2012')
    base = tmp_path / 'VOCdevkit' / 'VOC_trainaug_val' / 'VOC2012'
    (base / 'JPEGImages').mkdir(parents=True)
    (base / 'SegmentationClassAug').mkdir()
    (base / 'ImageSets' / 'Segmentation').mkdir(parents=True)
    (base / 'Annotations').mkdir()
    names = ['2007_000001', '2007_000002']
    rng = np.random.default_rng(0)
    for n in names:
        PILImage.fromarray(rng.integers(0, 255, (24, 24, 3)).astype(
            np.uint8)).save(base / 'JPEGImages' / (n + '.jpg'))
    (base / 'ImageSets' / 'Segmentation' / 'mini.txt').write_text(
        '\n'.join(names) + '\n')
    # XML: image 1 has aeroplane+dog, image 2 has cat
    xml = ('<annotation>{}</annotation>')
    obj = '<object><name>{}</name></object>'
    (base / 'Annotations' / (names[0] + '.xml')).write_text(
        xml.format(obj.format('aeroplane') + obj.format('dog')))
    (base / 'Annotations' / (names[1] + '.xml')).write_text(
        xml.format(obj.format('cat')))

    ds = DevkitDataset(spec, str(tmp_path), 'mini', size=24)
    tags = ds.split_tags()
    fg = list(spec.fg_class_names)
    assert tags[0, fg.index('aeroplane')] == 1
    assert tags[0, fg.index('dog')] == 1
    assert tags[0].sum() == 2
    assert tags[1, fg.index('cat')] == 1

    # cache wins over XML once written
    flipped = 1.0 - tags
    cls_labels.save_cache(str(base / 'ImageSets' / 'Segmentation'),
                          names, flipped)
    ds2 = DevkitDataset(spec, str(tmp_path), 'mini', size=24)
    np.testing.assert_array_equal(ds2.split_tags(), flipped)

    # GT fallback when neither cache nor XML: drop both, add masks
    import os
    os.remove(base / 'ImageSets' / 'Segmentation' / 'cls_labels.npy')
    for n in names:
        os.remove(base / 'Annotations' / (n + '.xml'))
    gt = np.zeros((24, 24), np.uint8)
    gt[:5] = 1 + fg.index('bicycle')   # fg ids follow bg
    PILImage.fromarray(gt).save(
        base / 'SegmentationClassAug' / (names[0] + '.png'))
    PILImage.fromarray(np.zeros((24, 24), np.uint8)).save(
        base / 'SegmentationClassAug' / (names[1] + '.png'))
    ds3 = DevkitDataset(spec, str(tmp_path), 'mini', size=24)
    t3 = ds3.split_tags()
    assert t3[0, fg.index('bicycle')] == 1 and t3[0].sum() == 1
    assert t3[1].sum() == 0
