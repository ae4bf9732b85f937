"""Test-time inference + Prediction Refinement (PR), and artifact savers.

Behaviour parity with ``src/utils/models.py:39-505``:
- binary segmentation inference with optional scipy hole filling (``:84-87``),
- multitask binary / multiclass inference with the PR module (``:273-397``):
  (a) threshold postprocessing zeroing tiny masks (``:322-323``),
  (b) ``overlap_seg_based_on_class``: predicted class==normal ⇒ empty mask
      (``:325-332``),
  (c) ``overlap_class_based_on_seg``: empty predicted mask ⇒ class forced to
      normal (``:367-386``; uses the *raw* final-head mask, pre-(a)/(b)),
- per-image metric CSVs and PNG mask/feature-map artifacts with identical
  file naming.

TPU-first difference: the whole test split runs as **one batched forward**
(bs = |test|, a few hundred 128² images) instead of a bs=1 python loop run
twice (the reference's second classification pass re-runs the model,
``models.py:243,349``); per-image metrics then run on host.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd

from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.ops.image_ops import (
    count_pixels,
    fill_holes as fill_holes_fn,
    postprocess_binary_segmentation,
)
from multi_task_breast_cancer_tpu.ops.metrics import calculate_metrics

SEG_RESULT_COLUMNS = ["patient_id", "Haussdorf distance", "DICE", "Sensitivity",
                      "Specificity", "Accuracy", "Jaccard index", "Precision", "class"]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def save_binary_segmentation(seg: np.ndarray, path: str, value_non_zero: int = 255) -> None:
    """PNG mask artifact (``models.py:508-527``)."""
    import cv2
    seg = np.asarray(seg)
    while seg.ndim > 2:
        seg = seg[..., 0] if seg.shape[-1] in (1,) else seg[0]
    seg = seg.astype(int).copy()
    seg[seg > 0] = value_non_zero
    # uint8: cv2 only writes deeper ints via a warned CV_8U fallback
    cv2.imwrite(path, seg.astype(np.uint8))


def _save_head_maps(heads, final, is_ds: bool, i: int, path: str, label: str,
                    pid: int, *, sigmoid_ds: bool) -> None:
    """Feature-map PNGs for sample ``i``: one per deep-supervision head (or
    one for a headless model). ``sigmoid_ds`` preserves the reference's OWN
    asymmetry: its binary-segmentation path saves ``torch.sigmoid(ds)``
    (``utils/models.py:74``) while its multiclass and both multitask paths
    save raw logits (``utils/models.py:138,219,312``) — not drift here."""
    if is_ds:
        for n, ds_head in enumerate(reversed(heads)):
            save_features_map(
                _sigmoid(ds_head[i]) if sigmoid_ds else ds_head[i],
                f"{path}/features_map/{label}_{pid}_ds_{n}.png")
    else:
        save_features_map(final[i],
                          f"{path}/features_map/{label}_{pid}_seg.png")


def save_features_map(seg: np.ndarray, path: str) -> None:
    """Per-head feature-map PNG (``models.py:555-558``). Deviation (documented):
    maps are scaled to 0-255 so the PNGs are viewable (the reference writes raw
    floats, which clip to black)."""
    import cv2
    seg = np.asarray(seg, dtype=np.float32)
    while seg.ndim > 2:
        seg = seg[..., 0] if seg.shape[-1] in (1,) else seg[0]
    lo, hi = float(seg.min()), float(seg.max())
    scaled = (seg - lo) / max(hi - lo, 1e-12) * 255.0
    cv2.imwrite(path, scaled.astype(np.uint8))


def _forward_seg(engine, state, test_ds: ArrayDataset, pad_to=None):
    """One batched forward; returns (per-head list or single, final logits).

    ``pad_to`` (the driver passes the cross-fold max test size) wrap-pads the
    batch so every fold reuses ONE compiled forward program — without it each
    distinct test-set size costs a fresh XLA compile."""
    out = engine.predict(state, test_ds.images, pad_to=pad_to)
    if engine.cfg.task == "multitask":
        if isinstance(out, tuple) and len(out) == 3:
            # Adityan's (cls, reconstruction, seg) triple: no reference
            # inference path exists for the reconstruction head (the network
            # is absent from the reference factory) — dropped, mirroring
            # Engine._losses.
            cls_out, _, seg_out = out
        else:
            cls_out, seg_out = out
    else:
        cls_out, seg_out = None, out
    return cls_out, seg_out


def _seg_heads_np(seg_out):
    if isinstance(seg_out, (tuple, list)):
        return [np.asarray(h) for h in seg_out]
    return np.asarray(seg_out)


def _cls_logits_np(cls_out) -> np.ndarray:
    """Mean over deep-supervised cls heads (``models.py:327,361``)."""
    if isinstance(cls_out, (tuple, list)):
        return np.mean(np.stack([np.asarray(c) for c in cls_out], 0), 0)
    return np.asarray(cls_out)


def inference_binary_segmentation(engine, state, test_ds: ArrayDataset, path: str,
                                  fill_holes: bool = True,
                                  pad_to=None) -> pd.DataFrame:
    """``models.py:39-100`` equivalent."""
    _, seg_out = _forward_seg(engine, state, test_ds, pad_to)
    heads = _seg_heads_np(seg_out)
    is_ds = isinstance(heads, list)
    final = heads[-1] if is_ds else heads

    rows = []
    for i in range(len(test_ds)):
        pid = int(test_ds.patient_ids[i])
        label = test_ds.class_names[i]
        _save_head_maps(heads, final, is_ds, i, path, label, pid,
                        sigmoid_ds=True)

        seg = (_sigmoid(final[i, :, :, 0]) > 0.5).astype(np.uint8)
        gt = test_ds.masks[i, :, :, 0].astype(np.uint8)
        if fill_holes:
            seg = fill_holes_fn(seg)
        metrics = calculate_metrics(gt, seg, pid)
        metrics["class"] = label
        rows.append(metrics)
        save_binary_segmentation(seg, f"{path}/segs/{label}_{pid}_seg.png")

    results = pd.DataFrame(rows, columns=SEG_RESULT_COLUMNS)
    results.to_csv(f"{path}/results_segmentation.csv", index=False)
    return results


def inference_multitask_binary(engine, state, test_ds: ArrayDataset, path: str,
                               pad_to=None) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """``models.py:186-270`` equivalent (binary classes, no PR)."""
    cls_out, seg_out = _forward_seg(engine, state, test_ds, pad_to)
    heads = _seg_heads_np(seg_out)
    is_ds = isinstance(heads, list)
    final = heads[-1] if is_ds else heads
    logits = _cls_logits_np(cls_out)

    rows = []
    for i in range(len(test_ds)):
        pid = int(test_ds.patient_ids[i])
        label = test_ds.class_names[i]
        _save_head_maps(heads, final, is_ds, i, path, label, pid,
                        sigmoid_ds=False)
        seg = (_sigmoid(final[i, :, :, 0]) > 0.5).astype(np.uint8)
        metrics = calculate_metrics(test_ds.masks[i, :, :, 0].astype(np.uint8), seg, pid)
        metrics["class"] = label
        rows.append(metrics)
        save_binary_segmentation(seg, f"{path}/segs/{label}_{pid}_seg.png")

    results = pd.DataFrame(rows, columns=SEG_RESULT_COLUMNS)
    results.to_csv(f"{path}/results_segmentation.csv", index=False)

    pred_label = (_sigmoid(logits[:, 0]) > 0.5).astype(float)
    metrics_df = pd.DataFrame({
        "patient_id": test_ds.patient_ids,
        "ground_truth": test_ds.labels.astype(float),
        "predicted_label": pred_label,
    })
    metrics_df.to_csv(f"{path}/results_classification.csv", index=False)
    return results, metrics_df


def inference_multitask_multiclass(engine, state, test_ds: ArrayDataset, path: str,
                                   threshold: int = 0,
                                   overlap_seg_based_on_class: bool = False,
                                   overlap_class_based_on_seg: bool = False,
                                   pad_to=None
                                   ) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """``models.py:273-397`` equivalent — the full PR module."""
    cls_out, seg_out = _forward_seg(engine, state, test_ds, pad_to)
    heads = _seg_heads_np(seg_out)
    is_ds = isinstance(heads, list)
    final = heads[-1] if is_ds else heads
    logits = _cls_logits_np(cls_out)
    argmax_class = np.argmax(logits, axis=-1)
    # PR rule (b) argmaxes the FIRST cls head only: the reference reassigns
    # `features_map = features_map[-1]` before the `isinstance(..., list)`
    # check guarding the head-mean, so the mean never happens there
    # (models.py:313,326-330) — while rule-(c)/predicted_label use the
    # head-mean argmax (models.py:361-364).
    first_head = (np.asarray(cls_out[0]) if isinstance(cls_out, (tuple, list))
                  else np.asarray(cls_out))
    rule_b_class = np.argmax(first_head, axis=-1)

    # raw final-head masks (pre-PR) — used by the class-from-seg overlap rule
    raw_masks = (_sigmoid(final[..., 0]) > 0.5).astype(np.uint8)

    rows = []
    for i in range(len(test_ds)):
        pid = int(test_ds.patient_ids[i])
        label = test_ds.class_names[i]
        _save_head_maps(heads, final, is_ds, i, path, label, pid,
                        sigmoid_ds=False)

        seg = raw_masks[i].copy()
        if threshold > 0:
            seg = postprocess_binary_segmentation(seg, threshold)
        if overlap_seg_based_on_class and rule_b_class[i] == 2:
            seg[seg > 0] = 0  # predicted normal ⇒ no tumor (PR rule b)

        metrics = calculate_metrics(test_ds.masks[i, :, :, 0].astype(np.uint8), seg, pid)
        metrics["class"] = label
        rows.append(metrics)
        save_binary_segmentation(seg, f"{path}/segs/{label}_{pid}_seg.png")

    results = pd.DataFrame(rows, columns=SEG_RESULT_COLUMNS)
    results.to_csv(f"{path}/results_segmentation.csv", index=False)

    # classification with PR rule (c): empty raw mask ⇒ class = normal (2)
    pred_labels = []
    for i in range(len(test_ds)):
        tumor_pixels = count_pixels(raw_masks[i]).get(1, 0)
        if overlap_class_based_on_seg and tumor_pixels == 0:
            pred_labels.append(2)
        else:
            pred_labels.append(int(argmax_class[i]))

    metrics_df = pd.DataFrame({
        "patient_id": test_ds.patient_ids,
        "ground_truth": test_ds.labels.astype(int),
        "predicted_label": pred_labels,
    })
    # prob_* columns hold the RAW mean cls outputs, not softmax probabilities
    # (models.py:361-363 appends test_outputs before any normalization)
    metrics_df[["prob_benign", "prob_malignant", "prob_normal"]] = logits
    metrics_df.to_csv(f"{path}/results_classification.csv", index=False)
    return results, metrics_df


def save_multilabel_segmentation(seg: np.ndarray, path: str) -> None:
    """Integer-label PNG (``models.py:530-552``)."""
    import cv2
    seg = np.asarray(seg)
    while seg.ndim > 2:
        seg = seg[..., 0] if seg.shape[-1] == 1 else seg[0]
    cv2.imwrite(path, seg.astype(np.uint8))


def inference_multilabel_segmentation(engine, state, test_ds: ArrayDataset,
                                      path: str, postprocessing: bool = False
                                      ) -> pd.DataFrame:
    """Semantic-segmentation inference (``models.py:103-183``): softmax over
    class channels, argmax labels, per-region metrics, majority-class pixel
    vote for the predicted class, optional majority-relabel postprocessing."""
    from multi_task_breast_cancer_tpu.ops.image_ops import (
        postprocess_semantic_segmentation,
    )
    from multi_task_breast_cancer_tpu.ops.metrics import (
        calculate_metrics_multiclass_segmentation,
    )

    _, seg_out = _forward_seg(engine, state, test_ds)
    heads = _seg_heads_np(seg_out)
    final = heads[-1] if isinstance(heads, list) else heads

    rows = []
    for i in range(len(test_ds)):
        pid = int(test_ds.patient_ids[i])
        label = test_ds.class_names[i]
        # per-pixel argmax labels; the reference softmaxes first
        # (models.py:142) — argmax is invariant under softmax
        pred = np.argmax(final[i], axis=-1)  # (H, W) labels
        gt = np.argmax(test_ds.masks[i], axis=-1)
        pred_pp = postprocess_semantic_segmentation(pred) if postprocessing else pred

        counter = count_pixels(pred)
        benign_pixels, malignant_pixels = counter.get(1, 0), counter.get(2, 0)
        predicted_class = "benign" if benign_pixels >= malignant_pixels else "malignant"

        metrics = calculate_metrics_multiclass_segmentation(gt, pred_pp, pid)
        metrics["class"] = label
        metrics["predicted_class"] = predicted_class
        rows.append(metrics)

        save_multilabel_segmentation(pred, f"{path}/segs/{label}_{pid}_seg.png")
        if postprocessing:
            save_multilabel_segmentation(
                pred_pp, f"{path}/segs/{label}_{pid}_seg_postprocessed.png")

    results = pd.DataFrame(rows)
    mapping_class = {"benign": 0, "malignant": 1}
    results["numerical_class"] = results["class"].map(mapping_class)
    results["numerical_class_predicted"] = results["predicted_class"].map(mapping_class)
    results.to_csv(f"{path}/results.csv", index=False)
    return results


def inference_multiclass_classification(engine, state, test_ds: ArrayDataset,
                                        path: str, pad_to=None) -> pd.DataFrame:
    """``models.py:400-456`` equivalent."""
    logits = _cls_logits_np(engine.predict(state, test_ds.images, pad_to=pad_to))
    metrics = pd.DataFrame({
        "patient_id": test_ds.patient_ids,
        "ground_truth": test_ds.labels.astype(int),
        "predicted_label": np.argmax(logits, axis=-1).astype(int),
    })
    metrics.to_csv(f"{path}/results_classification.csv", index=False)
    return metrics


def inference_binary_classification(engine, state, test_ds: ArrayDataset,
                                    path: str, pad_to=None) -> pd.DataFrame:
    """``models.py:459-505`` equivalent (writes ``results.csv`` like the
    reference — note the different filename vs the multiclass variant)."""
    logits = _cls_logits_np(engine.predict(state, test_ds.images, pad_to=pad_to))
    metrics = pd.DataFrame({
        "patient_id": test_ds.patient_ids,
        "ground_truth": test_ds.labels.astype(float),
        "predicted_label": (_sigmoid(logits[:, 0]) > 0.5).astype(float),
    })
    metrics.to_csv(f"{path}/results.csv", index=False)
    return metrics
