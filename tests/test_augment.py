"""Augmentation ops vs PIL/scipy oracles + pipeline loop semantics
(shuffle / augment / prefetch / native-size iteration)."""
import numpy as np
import pytest

from wsss_tpu.data import augment
from wsss_tpu.data.pipeline import SyntheticWSSS, prefetch


def _img(h=37, w=29, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 255, (h, w, c)).astype(np.float32)


def test_pil_resize_matches_pil_oracle():
    from PIL import Image
    img = _img(20, 30, 1)
    out = augment.pil_resize(img, (10, 15), 1)
    ref = np.asarray(Image.fromarray(img[..., 0]).resize(
        (15, 10), Image.BILINEAR))
    np.testing.assert_allclose(out[..., 0], ref, rtol=1e-5)


def test_pil_rescale_label_nearest_preserves_values():
    lab = np.zeros((40, 40), np.int32)
    lab[10:30, 5:25] = 7
    lab[0, 0] = 255
    out = augment.pil_rescale(lab, 0.25, 0)
    assert out.shape == (10, 10)
    assert set(np.unique(out)) <= {0, 7, 255}
    assert out.dtype == lab.dtype


def test_random_resize_long():
    rng = np.random.default_rng(0)
    img = _img(100, 50)
    out = augment.random_resize_long(img, 60, 80, rng)
    assert 60 <= out.shape[0] < 80          # h is the long side
    assert abs(out.shape[1] / out.shape[0] - 0.5) < 0.05


def test_random_scale_pair_shared_factor():
    rng = np.random.default_rng(3)
    img = _img(40, 60)
    lab = np.arange(40 * 60, dtype=np.int32).reshape(40, 60) % 5
    img2, lab2 = augment.random_scale([img, lab], (0.5, 1.5), (3, 0), rng)
    assert img2.shape[:2] == lab2.shape[:2]
    assert lab2.dtype == lab.dtype


def test_random_lr_flip_shared_coin():
    img = _img(8, 8)
    lab = np.arange(64, dtype=np.int32).reshape(8, 8)
    flipped = 0
    for seed in range(20):
        rng = np.random.default_rng(seed)
        i2, l2 = augment.random_lr_flip([img, lab], rng)
        if np.array_equal(i2, img[:, ::-1]):
            flipped += 1
            assert np.array_equal(l2, lab[:, ::-1])  # same coin
        else:
            assert np.array_equal(i2, img) and np.array_equal(l2, lab)
    assert 0 < flipped < 20


def test_random_crop_pair_shared_box_and_fills():
    rng = np.random.default_rng(1)
    img = _img(30, 30)
    lab = np.full((30, 30), 3, np.int32)
    i2, l2 = augment.random_crop([img, lab], 48, (0, 255), rng)
    assert i2.shape == (48, 48, 3) and l2.shape == (48, 48)
    # padding areas: image 0, label 255, and they coincide
    pad_i = np.all(i2 == 0, -1)
    pad_l = l2 == 255
    assert np.array_equal(pad_i, pad_l)
    assert pad_l.sum() == 48 * 48 - 30 * 30
    # content survives
    assert (l2 == 3).sum() == 30 * 30


def test_random_crop_downsizes():
    rng = np.random.default_rng(2)
    img = _img(64, 64)
    (out,) = augment.random_crop([img], 32, (0,), rng)
    assert out.shape == (32, 32, 3)
    # the crop is a contiguous window of the source
    found = any(
        np.array_equal(out, img[y:y + 32, x:x + 32])
        for y in range(33) for x in range(33))
    assert found


def test_top_left_crop():
    img = _img(20, 50)
    out = augment.top_left_crop(img, 32, 0)
    assert out.shape == (32, 32, 3)
    np.testing.assert_array_equal(out[:20, :32], img[:, :32])
    assert np.all(out[20:] == 0)


def test_random_affine_identity_when_zero():
    rng = np.random.default_rng(0)
    img = _img(16, 16)
    out = augment.random_affine(img, rng)
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_random_affine_pure_shift_matches_scipy_oracle():
    from scipy import ndimage
    img = _img(32, 32)

    class FixedRng:                      # pin the sampled shift
        def uniform(self, a, b):
            return 0.125                 # 4 px on 32

    # out[o] = in[o + t] (Keras apply_affine_transform convention), i.e.
    # content moves by -t = ndimage.shift(-4, -4)
    out = augment.random_affine(img, FixedRng(), shift_frac=0.2)
    ref = np.stack([ndimage.shift(img[..., c], (-4, -4), order=1,
                                  mode='reflect')
                    for c in range(3)], -1)
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_classifier_augment_policies_run():
    rng = np.random.default_rng(0)
    for name in ('VOC2012', 'ADP-morph', 'DeepGlobe'):
        f = augment.classifier_augment(name)
        img, gt = f(_img(24, 24), None, rng)
        assert img.shape == (24, 24, 3) and gt is None
        img, gt = f(_img(24, 24), np.zeros((24, 24), np.int32), rng)
        assert gt is not None and gt.shape == (24, 24)


# ---------------------------------------------------------------------------
# pipeline loop semantics
# ---------------------------------------------------------------------------

def test_shuffle_changes_order_per_epoch_reproducibly():
    ds = SyntheticWSSS('VOC2012', size=16, n_images=12, seed=5)
    e1 = [b.indices.tolist() for b in ds.batches(4, shuffle=True)]
    e2 = [b.indices.tolist() for b in ds.batches(4, shuffle=True)]
    flat1 = sum(e1, [])
    flat2 = sum(e2, [])
    assert sorted(flat1) == list(range(12)) == sorted(flat2)
    assert flat1 != list(range(12))      # actually shuffled
    assert flat1 != flat2                # fresh permutation per epoch
    ds2 = SyntheticWSSS('VOC2012', size=16, n_images=12, seed=5)
    r1 = [b.indices.tolist() for b in ds2.batches(4, shuffle=True)]
    assert r1 == e1                      # reproducible from seed


def test_batches_augment_applied():
    ds = SyntheticWSSS('VOC2012', size=16, n_images=4, seed=0)
    plain = next(iter(ds.batches(4)))

    def aug(img, gt, rng):
        return img * 0 + 1.0, gt

    aug_b = next(iter(ds.batches(4, augment=aug)))
    assert np.all(aug_b.images == 1.0)
    assert not np.all(plain.images == 1.0)


def test_prefetch_order_and_exception():
    assert list(prefetch(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise ValueError('x')

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_iter_native_nonsquare():
    ds = SyntheticWSSS('VOC2012', size=32, n_images=6, seed=1)
    shapes = set()
    for b in ds.iter_native(with_gt=True):
        assert b.images.shape[0] == 1
        assert b.images.shape[1:3] == b.gt.shape[1:3]
        shapes.add(b.images.shape[1:3])
    assert len(shapes) > 1               # sizes actually vary
