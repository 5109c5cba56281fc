"""On-device evaluation metrics (confusion / IoU / ROC calibration).

TPU-native replacements for the reference's CPU metric paths:
  * chainercv ``calc_semantic_segmentation_confusion``
    (03b_irn/step/eval_cam.py:89, eval_sem_seg.py:43) -> jnp bincount.
  * per-class intersect/union accumulators (03a model.py:698-719,
    02_cues/demo.py:400-460) -> :func:`iou_update`.
  * ROC optimal-threshold calibration at the sensitivity = specificity point
    (01_train/utilities.py:99-114) -> :func:`optimal_thresholds` (vectorized
    over classes, no sklearn in the hot path).
  * batch F1 metric (01_train/utilities.py:69-97) -> :func:`batch_f1`.

All functions are jit-friendly: static shapes, no data-dependent python.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Segmentation confusion / IoU
# ---------------------------------------------------------------------------

def confusion_matrix(pred: Array, gt: Array, num_classes: int,
                     ignore_label: int = 255) -> Array:
    """Confusion matrix [num_classes, num_classes]; rows = gt, cols = pred.

    Pixels whose gt equals ``ignore_label`` (or is >= num_classes) are
    dropped, mirroring chainercv's semantics used at
    03b_irn/step/eval_sem_seg.py:43.

    The per-image counts are int32 (safe: one image has < 2^31 pixels);
    accumulate across a split on the host in int64 — full-res DeepGlobe
    (199 x 2448^2 px) overflows an int32 diagonal.  Use
    :func:`accumulate_confusion` for that.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    gt = gt.reshape(-1).astype(jnp.int32)
    valid = (gt != ignore_label) & (gt >= 0) & (gt < num_classes)
    # Route invalid pixels to an extra trash bin and slice it away.
    flat = jnp.where(valid, gt * num_classes + jnp.clip(pred, 0, num_classes - 1),
                     num_classes * num_classes)
    counts = jnp.bincount(flat, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


def accumulate_confusion(conf_acc: np.ndarray, pred: Array, gt: Array,
                         num_classes: int,
                         ignore_label: int = 255) -> np.ndarray:
    """Add one image's confusion into a host int64 accumulator.

    Splits device bincount (int32, per image) from host accumulation
    (int64, whole split) so billion-pixel evals can't overflow."""
    c = np.asarray(confusion_matrix(pred, gt, num_classes, ignore_label))
    return conf_acc + c.astype(np.int64)


def iou_from_confusion(conf) -> Tuple[np.ndarray, float]:
    """Per-class IoU and mIoU from a confusion matrix (device or host).

    mIoU averages over classes whose union is nonzero (chainercv behavior:
    nan-classes are excluded via nanmean at eval_sem_seg.py:49-55).
    Computed on host in float64 — the matrix is tiny and int64 counts
    exceed float32 precision.
    """
    conf = np.asarray(conf).astype(np.float64)
    inter = np.diag(conf)
    union = conf.sum(0) + conf.sum(1) - inter
    iou = inter / np.maximum(union, 1e-12)
    present = union > 0
    miou = float(np.sum(np.where(present, iou, 0.0))
                 / max(int(np.sum(present)), 1))
    return iou, miou


def precision_recall_from_confusion(conf) -> Tuple[np.ndarray, np.ndarray]:
    """Per-class precision/recall (03b_irn/step/eval_cam.py:96-103)."""
    conf = np.asarray(conf).astype(np.float64)
    inter = np.diag(conf)
    prec = inter / np.maximum(conf.sum(0), 1e-12)
    rec = inter / np.maximum(conf.sum(1), 1e-12)
    return prec, rec


def iou_update(inter: Array, union: Array, pred_onehot: Array,
               gt_onehot: Array) -> Tuple[Array, Array]:
    """Streaming per-class intersect/union accumulation.

    pred_onehot/gt_onehot: bool [..., C]; matches the accumulators at
    02_cues/adp_cues.py:304-339 and 03a model.py:698-719.
    """
    axes = tuple(range(pred_onehot.ndim - 1))
    inter = inter + jnp.sum(pred_onehot & gt_onehot, axis=axes)
    union = union + jnp.sum(pred_onehot | gt_onehot, axis=axes)
    return inter, union


# ---------------------------------------------------------------------------
# Multi-label classification metrics
# ---------------------------------------------------------------------------

def batch_f1(y_true: Array, y_pred: Array, eps: float = 1e-7) -> Array:
    """Batch-wise F1 on rounded predictions (01_train/utilities.py:69-97)."""
    y_pred_r = jnp.round(jnp.clip(y_pred, 0, 1))
    tp = jnp.sum(jnp.round(jnp.clip(y_true * y_pred_r, 0, 1)))
    possible = jnp.sum(jnp.round(jnp.clip(y_true, 0, 1)))
    predicted = jnp.sum(y_pred_r)
    recall = tp / (possible + eps)
    precision = tp / (predicted + eps)
    return 2 * precision * recall / (precision + recall + eps)


@functools.partial(jax.jit, static_argnames=('num_thresholds',))
def _roc_stats(target: Array, scores: Array, num_thresholds: int = 512):
    """TPR/FPR over a fixed grid of thresholds, vectorized over classes.

    target/scores: [N, C].  Returns (tprs, fprs, thresholds) each
    [num_thresholds, C].  Grid-based rather than sklearn's exact ROC: for
    score distributions produced by sigmoid heads the optimal
    sensitivity=specificity crossing matches within grid resolution.
    """
    th = jnp.linspace(0.0, 1.0, num_thresholds)[:, None, None]  # [T,1,1]
    pred = scores[None] >= th                                   # [T,N,C]
    pos = target[None] > 0.5
    tp = jnp.sum(pred & pos, axis=1)
    fp = jnp.sum(pred & ~pos, axis=1)
    npos = jnp.maximum(jnp.sum(pos[0], axis=0), 1)
    nneg = jnp.maximum(jnp.sum(~pos[0], axis=0), 1)
    return tp / npos, fp / nneg, jnp.broadcast_to(th[:, 0, 0, None],
                                                  tp.shape)


def optimal_thresholds(target, scores, num_thresholds: int = 512):
    """Per-class optimal score threshold where sensitivity == specificity.

    Mirrors 01_train/utilities.py:99-114 (argmin |TPR - (1 - FPR)|).
    Returns float array [C].
    """
    target = jnp.asarray(target, dtype=jnp.float32)
    scores = jnp.asarray(scores, dtype=jnp.float32)
    tprs, fprs, ths = _roc_stats(target, scores, num_thresholds)
    idx = jnp.argmin(jnp.abs(tprs - (1.0 - fprs)), axis=0)
    return jnp.take_along_axis(ths, idx[None], axis=0)[0]


def thresholded_metrics(target, scores, thresholds):
    """Per-class TPR/FPR/TNR/FNR/ACC/F1 (01_train/utilities.py:118-143)."""
    target = np.asarray(target)
    pred = np.asarray(scores) >= np.asarray(thresholds)
    cond_p = np.sum(target == 1, 0)
    cond_n = np.sum(target == 0, 0)
    tp = np.sum((target == 1) & pred, 0)
    fp = np.sum((target == 0) & pred, 0)
    tn = np.sum((target == 0) & ~pred, 0)
    fn = np.sum((target == 1) & ~pred, 0)
    with np.errstate(divide='ignore', invalid='ignore'):
        out = dict(
            tpr=tp / cond_p, fpr=fp / cond_n, tnr=tn / cond_n,
            fnr=fn / cond_p,
            acc=np.sum(target == pred, 0) / pred.shape[0],
            f1=(2 * tp) / (2 * tp + fp + fn))
    return out
