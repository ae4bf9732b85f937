"""Shared inference postprocessing for the offline ``predict`` CLI and the
online server: raw model output pytree → per-image class probabilities,
predicted class (with the pipeline-refinement overlap rule,
``models.py:300-397``) and binary masks."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from multi_task_breast_cancer_tpu.train.inference import (
    _cls_logits_np,
    _sigmoid,
    _softmax,
)

CLASS_NAMES = ["benign", "malignant", "normal"]


@dataclass
class PredictionBatch:
    """Postprocessed outputs for a batch of serving inputs."""

    probs: Optional[np.ndarray]          # (N, n_classes) or (N, 1); None for seg-only
    pred_class: Optional[List[str]]      # None for segmentation task
    masks: Optional[np.ndarray]          # (N, H, W) uint8; None for classification

    def record(self, i: int) -> dict:
        """JSON-ready record for image ``i`` (mask reported as pixel count;
        the callers attach the mask itself in their own format)."""
        rec: dict = {}
        if self.masks is not None:
            rec["tumor_pixels"] = int(self.masks[i].sum())
        if self.probs is not None:
            rec["probs"] = self.probs[i].tolist()
            rec["predicted_class"] = self.pred_class[i]
        return rec


def postprocess(out, task: str, n_classes: int, pr_enabled: bool) -> PredictionBatch:
    """Normalise a model-output pytree into probabilities/classes/masks.

    Mirrors the inference conventions of ``train/inference.py``: the last
    deep-supervision head is the prediction, multitask tuples are
    ``(cls, seg)`` (Adityan's reconstruction middle output is dropped), and
    with ``pr_enabled`` an empty predicted mask overrides the classifier to
    'normal' (the reference's pipeline-refinement rule (a),
    ``models.py:300-345``)."""
    probs = pred_class = masks = None

    if task == "classification":
        logits = _cls_logits_np(out)
        probs = _softmax(logits) if n_classes > 2 else _sigmoid(logits)
    else:
        seg_out = out
        if task == "multitask":
            if isinstance(out, (tuple, list)) and len(out) == 3:
                cls_out, _, seg_out = out
            else:
                cls_out, seg_out = out
            logits = _cls_logits_np(cls_out)
            probs = _softmax(logits) if n_classes > 2 else _sigmoid(logits)
        final = seg_out[-1] if isinstance(seg_out, (tuple, list)) else seg_out
        masks = (_sigmoid(np.asarray(final[..., 0])) > 0.5).astype(np.uint8)

    if probs is not None:
        if n_classes > 2:
            pred_class = [CLASS_NAMES[int(np.argmax(p))] for p in probs]
        else:
            pred_class = ["malignant" if p[0] > 0.5 else "benign" for p in probs]
        if pr_enabled and masks is not None and n_classes > 2:
            pred_class = ["normal" if m.sum() == 0 else c
                          for c, m in zip(pred_class, masks)]

    return PredictionBatch(probs=probs, pred_class=pred_class, masks=masks)
