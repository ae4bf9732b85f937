"""Metrics.

Two tiers, chosen for TPU efficiency:
- **Device-side** (inside the jitted epoch): batch Dice and classification
  confusion matrices accumulate on-chip — no per-batch host sync (the reference
  pulls ``.item()`` per batch inside the hot loop, ``training_multitask.py:99-113``).
- **Host-side** (test-time, per image, bs=1 semantics): Hausdorff distance and
  the per-image metric dict with the reference's NaN/empty-mask conventions
  (``src/utils/metrics.py:26-74,175-252``).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.distance import directed_hausdorff

Array = jnp.ndarray

HAUSSDORF = "Haussdorf distance"
DICE = "DICE"
SENS = "Sensitivity"
SPEC = "Specificity"
ACC = "Accuracy"
JACC = "Jaccard index"
PREC = "Precision"
METRICS = [HAUSSDORF, DICE, SENS, SPEC, ACC, JACC, PREC]


# ---------------------------------------------------------------------------
# Device-side (jit-able)
# ---------------------------------------------------------------------------


def dice_from_logits_batch(gt: Array, seg_logits: Array) -> Array:
    """Batch-level Dice with the reference's empty-GT convention
    (``metrics.py:255-267``: Dice=1 iff both empty, 0 if GT empty but pred not).

    Thresholds sigmoid(logits) > 0.5. Matches ``dice_score_from_tensor`` which
    the reference computes over the *whole batch*, not per image."""
    seg = jax.nn.sigmoid(seg_logits) > 0.5
    gt_b = gt > 0.5
    tp = jnp.sum(jnp.logical_and(seg, gt_b))
    fp = jnp.sum(jnp.logical_and(seg, ~gt_b))
    fn = jnp.sum(jnp.logical_and(~seg, gt_b))
    dice = 2.0 * tp / jnp.maximum(2.0 * tp + fp + fn, 1e-12)
    gt_empty = jnp.sum(gt_b) == 0
    seg_empty = jnp.sum(seg) == 0
    return jnp.where(gt_empty, jnp.where(seg_empty, 1.0, 0.0), dice)


def confusion_matrix_update(cm: Array, gt_labels: Array, pred_labels: Array,
                            n_classes: int) -> Array:
    """Accumulate an (n,n) confusion matrix on device (rows=GT, cols=pred)."""
    gt_oh = jax.nn.one_hot(gt_labels, n_classes, dtype=cm.dtype)
    pred_oh = jax.nn.one_hot(pred_labels, n_classes, dtype=cm.dtype)
    return cm + gt_oh.T @ pred_oh


def accuracy_from_cm(cm: Array) -> Array:
    return jnp.trace(cm) / jnp.maximum(jnp.sum(cm), 1e-12)


def f1_weighted_from_cm(cm: Array) -> Array:
    """sklearn ``f1_score(average='weighted')`` parity: per-class F1 (0 where
    undefined), weighted by true-class support."""
    tp = jnp.diag(cm)
    support = jnp.sum(cm, axis=1)
    pred_pos = jnp.sum(cm, axis=0)
    denom = support + pred_pos
    f1 = jnp.where(denom > 0, 2.0 * tp / jnp.maximum(denom, 1e-12), 0.0)
    total = jnp.maximum(jnp.sum(support), 1e-12)
    return jnp.sum(f1 * support) / total


def predicted_labels_from_logits(logits: Array, n_classes: int) -> Array:
    """Reference decision rule (``training_multitask.py:34-62``): multiclass →
    argmax(softmax); binary → sigmoid > 0.5."""
    if n_classes > 2:
        return jnp.argmax(logits, axis=-1)
    return (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Host-side (per image, test-time parity)
# ---------------------------------------------------------------------------


def sensitivity(tp: float, fn: float) -> float:
    return np.nan if tp == 0 else tp / (tp + fn)


def specificity(tn: float, fp: float) -> float:
    return tn / (tn + fp)


def precision(tp: float, fp: float) -> float:
    return np.nan if tp == 0 else tp / (tp + fp)


def accuracy(tp: float, tn: float, fp: float, fn: float) -> float:
    return (tp + tn) / (tp + tn + fp + fn)


def f1_score(tp: float, fp: float, fn: float) -> float:
    return (2 * tp) / (2 * tp + fp + fn)


def dice_score(tp: float, fp: float, fn: float, gt: np.ndarray, seg: np.ndarray) -> float:
    if np.sum(gt) == 0:
        return 1.0 if np.sum(seg) == 0 else 0.0
    return 2 * tp / (2 * tp + fp + fn)


def jaccard_index(tp: float, fp: float, fn: float, gt: np.ndarray, seg: np.ndarray) -> float:
    if np.sum(gt) == 0:
        return 1.0 if np.sum(seg) == 0 else 0.0
    return tp / (tp + fp + fn)


def haussdorf_distance(gt: np.ndarray, seg: np.ndarray) -> float:
    """Reference-parity 'Hausdorff' (``metrics.py:238-252``): 0 if both
    empty, NaN if exactly one empty — and, like the reference, the raw 2-D
    masks go straight into ``scipy.directed_hausdorff``, which treats each
    image ROW as one W-dimensional point. That is NOT the geometric Hausdorff
    distance between the mask point sets (a purely horizontal shift barely
    moves it); the quirk is preserved so the per-image CSV column matches the
    reference's reported values. For a geometric distance see the
    Hausdorff-DT loss (``ops/losses.py``), which uses true distance
    transforms."""
    gt2 = np.asarray(gt, dtype=bool)
    seg2 = np.asarray(seg, dtype=bool)
    while gt2.ndim > 2:
        gt2, seg2 = gt2[0], seg2[0]
    if np.sum(gt2) == 0 and np.sum(seg2) == 0:
        return 0.0
    if (np.sum(gt2) == 0) != (np.sum(seg2) == 0):
        return float(np.nan)
    return max(directed_hausdorff(seg2, gt2)[0], directed_hausdorff(gt2, seg2)[0])


def calculate_metrics(ground_truth: np.ndarray, segmentation: np.ndarray,
                      patient: str) -> Dict[str, float]:
    """Per-image binary metric dict (reference ``metrics.py:26-74``)."""
    assert segmentation.shape == ground_truth.shape, \
        "Predicted segmentation and ground truth do not have the same size"
    gt = ground_truth.astype(float)
    seg = segmentation.astype(float)
    tp = float(np.sum(np.logical_and(seg, gt)))
    tn = float(np.sum(np.logical_and(np.logical_not(seg), np.logical_not(gt))))
    fp = float(np.sum(np.logical_and(seg, np.logical_not(gt))))
    fn = float(np.sum(np.logical_and(np.logical_not(seg), gt)))
    return {
        "patient_id": patient,
        HAUSSDORF: haussdorf_distance(gt, seg),
        DICE: dice_score(tp, fp, fn, gt, seg),
        SENS: sensitivity(tp, fn),
        # unguarded like the reference (``metrics.py:70,193``): an all-
        # positive GT (no background pixels — impossible for BUSI masks)
        # raises ZeroDivisionError there too; the multiclass path guards it
        SPEC: specificity(tn, fp),
        ACC: accuracy(tp, tn, fp, fn),
        JACC: jaccard_index(tp, fp, fn, gt, seg),
        PREC: precision(tp, fp),
    }


def calculate_metrics_multiclass_segmentation(ground_truth: np.ndarray,
                                              segmentation: np.ndarray,
                                              patient: str, num_classes: int = 3,
                                              skip_background: bool = True,
                                              averaging: bool = True) -> Dict:
    """Per-region metric loop (reference ``metrics.py:77-129``)."""
    assert segmentation.shape == ground_truth.shape
    start = 1 if skip_background else 0
    out: Dict = {"patient_id": patient}
    for m in METRICS:
        out[m] = []
    for i in range(start, num_classes):
        gt = (ground_truth == i).astype(float)
        seg = (segmentation == i).astype(float)
        tp = float(np.sum(np.logical_and(seg, gt)))
        tn = float(np.sum(np.logical_and(np.logical_not(seg), np.logical_not(gt))))
        fp = float(np.sum(np.logical_and(seg, np.logical_not(gt))))
        fn = float(np.sum(np.logical_and(np.logical_not(seg), gt)))
        out[HAUSSDORF].append(haussdorf_distance(gt, seg))
        out[DICE].append(dice_score(tp, fp, fn, gt, seg))
        out[SENS].append(sensitivity(tp, fn))
        try:
            out[SPEC].append(specificity(tn, fp))
        except ZeroDivisionError:
            out[SPEC].append(0)
        out[ACC].append(accuracy(tp, tn, fp, fn))
        out[JACC].append(jaccard_index(tp, fp, fn, gt, seg))
        out[PREC].append(precision(tp, fp))
    if averaging:
        for k in out:
            if k != "patient_id":
                out[k] = np.nanmean(out[k])
    return out


def binary_classification_metrics(ground_truth, predictions) -> Dict[str, float]:
    """Reference ``metrics.py:387-400``."""
    from sklearn.metrics import confusion_matrix as sk_cm
    # labels pinned: with single-class data sklearn returns a 1x1 matrix and
    # the 4-way unpack crashes (the reference would crash here too,
    # ``metrics.py:391-392``; identical output whenever both classes appear)
    tn, fp, fn, tp = sk_cm(y_true=ground_truth, y_pred=predictions,
                           labels=[0, 1]).ravel()
    return {
        "Precision": precision(tp, fp),
        "Sensitivity": sensitivity(tp, fn),
        "Specificity": specificity(tn, fp),
        "Accuracy": accuracy(tp, tn, fp, fn),
        "F1 score": f1_score(tp, fp, fn),
    }


def multiclass_classification_metrics(ground_truth, predictions,
                                      labels: Optional[List[int]] = None) -> Dict[str, float]:
    """Reference ``metrics.py:407-458``: per-class + macro/micro/weighted
    precision/recall/F1 + accuracy (sklearn, host-side — tiny)."""
    from sklearn.metrics import (accuracy_score, f1_score as sk_f1,
                                 precision_score, recall_score)
    if labels is None:
        labels = [0, 1, 2]
    out: Dict[str, float] = {}
    for name, fn in (("precision", precision_score), ("recall", recall_score),
                     ("f1", sk_f1)):
        per_class = fn(ground_truth, predictions, labels=labels, average=None,
                       zero_division=0)
        for n, value in enumerate(per_class):
            out[f"{name}_class_{n}"] = value
        for avg in ("macro", "micro", "weighted"):
            out[f"{name}_{avg}"] = fn(ground_truth, predictions, labels=labels,
                                      average=avg, zero_division=0)
    out["accuracy"] = accuracy_score(ground_truth, predictions)
    return out
