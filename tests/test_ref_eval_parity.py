"""Numpy transcriptions of the reference's eval paths, asserted equal to
the repo implementations on synthetic fixtures (VERDICT round-2 item 1).

Each `_ref_*` helper is a line-for-line transcription of the reference
accumulation semantics (cited per function); the tests pin that the
production code computes the identical numbers.
"""
import dataclasses

import jax
import numpy as np
import pytest

from wsss_tpu.methods import gradcam_cues as gc
from wsss_tpu.methods import irnet


@dataclasses.dataclass
class _B:
    indices: np.ndarray
    gt: np.ndarray


def _pack(dense_hwc):
    """[S,S,C] one-hot -> the 3xN (class,row,col) pickle layout
    (02_cues/demo.py:217-222)."""
    c, r, col = np.where(dense_hwc.transpose(2, 0, 1))
    return np.stack([c, r, col])


def _mk_cue_dict(rng, n_imgs, n_cls, seed=41, overlap=False):
    cue_dict = {}
    denses = []
    for i in range(n_imgs):
        if overlap:
            # independent per-class masks (ADP cues can overlap)
            dense = (rng.random((seed, seed, n_cls)) < 0.08).astype(
                np.float32)
        else:
            lab = rng.integers(-1, n_cls, (seed, seed))
            dense = np.zeros((seed, seed, n_cls), np.float32)
            m = lab >= 0
            dense[np.nonzero(m)[0], np.nonzero(m)[1], lab[m]] = 1.0
        cue_dict[f'{i}_cues'] = _pack(dense)
        cue_dict[f'{i}_labels'] = np.unique(
            np.where(dense.any((0, 1)))[0])
        denses.append(dense)
    return cue_dict, denses


# --------------------------------------------------------------------------
# 02_cues eval transcriptions
# --------------------------------------------------------------------------

def _ref_eval_cues_voc(denses, gts, n_cls):
    """demo.py:424-441: un-cued pixels -> argmax(zeros)=0 (background);
    I/U over all classes on raw GT indices; mean(I/(U+1e-7))."""
    intersects = np.zeros(n_cls)
    unions = np.zeros(n_cls)
    for dense, gt in zip(denses, gts):
        pred_small = np.argmax(dense, axis=-1)
        pred = gc._nearest_resize(pred_small, gt.shape).astype(np.int32)
        for k in range(n_cls):
            intersects[k] += np.sum((gt == k) & (pred == k))
            unions[k] += np.sum((gt == k) | (pred == k))
    iou = intersects / (unions + 1e-7)
    return iou, float(np.mean(iou))


def _ref_eval_cues_dg(denses, gts, n_cls):
    """demo.py:442-463: un-cued -> ignore_ind = n_cls-1 ('unknown',
    dropped from the class list); I/U over the first n_cls-1 classes."""
    n_eval = n_cls - 1
    intersects = np.zeros(n_eval)
    unions = np.zeros(n_eval)
    for dense, gt in zip(denses, gts):
        pred_small = np.argmax(dense, axis=-1)
        pred_small[np.sum(dense, axis=-1) == 0] = n_eval
        pred = gc._nearest_resize(pred_small, gt.shape).astype(np.int32)
        for k in range(n_eval):
            intersects[k] += np.sum((gt == k) & (pred == k))
            unions[k] += np.sum((gt == k) | (pred == k))
    iou = intersects / (unions + 1e-7)
    return iou, float(np.mean(iou))


def _ref_eval_cues_adp(denses, gts, n_cls, size):
    """demo.py:583-625: per-class INDEPENDENT binary channels (no
    argmax), both pred and GT at network `size`; IoU = I/U (no eps)."""
    intersects = np.zeros(n_cls)
    unions = np.zeros(n_cls)
    for dense, gt in zip(denses, gts):
        gt_s = gc._nearest_resize(gt, (size, size)).astype(np.int32)
        for k in range(n_cls):
            pred_mask = gc._nearest_resize(dense[:, :, k],
                                           (size, size)) == 1.0
            gt_mask = gt_s == k
            intersects[k] += np.sum(gt_mask & pred_mask)
            unions[k] += np.sum(gt_mask | pred_mask)
    with np.errstate(divide='ignore', invalid='ignore'):
        iou = intersects / unions
    return iou, float(np.mean(iou))


def test_eval_cues_voc_matches_reference():
    rng = np.random.default_rng(0)
    n_cls, n = 21, 3
    cue_dict, denses = _mk_cue_dict(rng, n, n_cls)
    # GT with 255 border pixels (SegmentationClassAug contract)
    gts = rng.integers(0, n_cls, (n, 63, 63)).astype(np.int32)
    gts[:, :2, :] = 255
    batches = [_B(np.arange(n), gts)]
    iou, miou = gc.eval_cues_miou(cue_dict, batches, n_cls,
                                  dataset='VOC2012')
    ref_iou, ref_miou = _ref_eval_cues_voc(denses, gts, n_cls)
    np.testing.assert_allclose(iou, ref_iou, rtol=1e-12)
    assert miou == pytest.approx(ref_miou, abs=1e-12)


def test_eval_cues_deepglobe_matches_reference():
    rng = np.random.default_rng(1)
    n_cls, n = 7, 3
    cue_dict, denses = _mk_cue_dict(rng, n, n_cls)
    gts = rng.integers(0, n_cls, (n, 50, 50)).astype(np.int32)
    batches = [_B(np.arange(n), gts)]
    iou, miou = gc.eval_cues_miou(cue_dict, batches, n_cls,
                                  dataset='DeepGlobe')
    ref_iou, ref_miou = _ref_eval_cues_dg(denses, gts, n_cls)
    assert iou.shape == (6,)
    np.testing.assert_allclose(iou, ref_iou, rtol=1e-12)
    assert miou == pytest.approx(ref_miou, abs=1e-12)


def test_eval_cues_adp_matches_reference():
    rng = np.random.default_rng(2)
    n_cls, n, size = 5, 3, 48
    cue_dict, denses = _mk_cue_dict(rng, n, n_cls, overlap=True)
    gts = rng.integers(0, n_cls, (n, 96, 96)).astype(np.int32)
    batches = [_B(np.arange(n), gts)]
    iou, miou = gc.eval_cues_miou(cue_dict, batches, n_cls,
                                  dataset='ADP-morph', size=size)
    ref_iou, ref_miou = _ref_eval_cues_adp(denses, gts, n_cls, size)
    np.testing.assert_allclose(iou, ref_iou, rtol=1e-12)
    assert miou == pytest.approx(ref_miou, abs=1e-12)


# --------------------------------------------------------------------------
# 03b eval_cam transcription (eval_cam.py:48-62)
# --------------------------------------------------------------------------

def _mk_cam_dict(rng, keys, h=9, w=9):
    n = len(keys)
    return {'keys': np.asarray(keys, np.int64),
            'cam': rng.random((n, h // 2, w // 2)).astype(np.float32),
            'high_res': rng.random((n, h, w)).astype(np.float32)}


def test_eval_cam_pred_voc_matches_reference():
    rng = np.random.default_rng(3)
    d = _mk_cam_dict(rng, [2, 7])
    thres = 0.45
    # eval_cam.py:49-52 transcription
    cams = np.pad(d['high_res'], ((1, 0), (0, 0), (0, 0)),
                  mode='constant', constant_values=thres)
    keys = np.pad(d['keys'] + 1, (1, 0), mode='constant')
    ref = keys[np.argmax(cams, axis=0)]
    np.testing.assert_array_equal(
        irnet.eval_cam_pred(d, 'VOC2012', thres), ref)


def test_eval_cam_pred_adp_matches_reference():
    rng = np.random.default_rng(4)
    d = _mk_cam_dict(rng, [0, 1, 4, 9])   # keys include bg classes
    # eval_cam.py:53-55: raw keys, high_res, NO padding
    ref = d['keys'][np.argmax(d['high_res'], axis=0)]
    np.testing.assert_array_equal(
        irnet.eval_cam_pred(d, 'ADP-morph', 0.15), ref)


def test_eval_cam_pred_deepglobe_matches_reference():
    rng = np.random.default_rng(5)
    d = _mk_cam_dict(rng, [1, 3])
    # eval_cam.py:56-58: raw keys and the STRIDED 'cam' array
    ref = d['keys'][np.argmax(d['cam'], axis=0)]
    out = irnet.eval_cam_pred(d, 'DeepGlobe', 0.15)
    assert out.shape == d['cam'].shape[1:]
    np.testing.assert_array_equal(out, ref)


def test_eval_cam_pred_empty_non_voc_skips():
    d = {'keys': np.empty(0, np.int64), 'cam': np.empty(0),
         'high_res': np.empty(0)}
    assert irnet.eval_cam_pred(d, 'DeepGlobe', 0.15) is None
    assert irnet.eval_cam_pred(d, 'ADP-func', 0.15) is None


# --------------------------------------------------------------------------
# train_irn displacement-mean calibration (train_irn.py:152-165)
# --------------------------------------------------------------------------

def test_calibrate_disp_mean_matches_bruteforce():
    """Full-split calibration must equal the mean of per-batch channel
    means over ALL batches (train_irn.py:156-164)."""
    tr = irnet.IRNTrainer('m7', num_classes=21, crop_size=32, radius=3,
                          max_step=10)
    variables, _ = tr.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(6)
    batches = [rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
               for _ in range(3)]
    mean = tr.calibrate_disp_mean(variables, iter(batches))
    fwd = jax.jit(lambda v, x: tr.net.apply(v, x))
    per_batch = []
    for imgs in batches:
        _, disp = fwd(variables, imgs)
        per_batch.append(np.asarray(disp).mean(axis=(0, 1, 2)))
    ref = np.mean(np.stack(per_batch), axis=0)
    np.testing.assert_allclose(mean, ref, rtol=1e-6)
