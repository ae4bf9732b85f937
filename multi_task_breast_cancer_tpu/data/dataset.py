"""In-memory array dataset.

The whole Curated BUSI dataset is ~450 grayscale 128×128 images (<30 MB as
f32), so the TPU-native design loads every fold **once** into host numpy and
then transfers it to HBM as a handful of device arrays — the per-step path
performs zero host↔device traffic (the reference re-reads tensors through a
DataLoader and syncs metrics back every batch).

Semantics parity with ``src/dataset/BUSI_dataset.py``:
- grayscale image load, mask 255→1 (``:50-55``),
- label maps: malignant→1 / benign→0 / normal→2; semantic-segmentation mode
  flips to benign→1 / normal→0 / malignant→2 (``:63-80``),
- channel dim added; optional min-max normalisation (``:102-108``),
- deterministic augment channels stacked onto the image (``:110-139``) —
  computed once here instead of per epoch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from multi_task_breast_cancer_tpu.ops.image_ops import build_augment_channels

LABEL_MAP = {"malignant": 1, "benign": 0, "normal": 2}
LABEL_MAP_SEMANTIC = {"benign": 1, "normal": 0, "malignant": 2}


@dataclasses.dataclass
class ArrayDataset:
    """One split's worth of device-ready arrays + host metadata."""

    images: np.ndarray        # (N, H, W, 1+n_aug) float32, raw 0..255 scale
    masks: np.ndarray         # (N, H, W, 1) float32 {0,1} (or (N,H,W,3) semantic)
    labels: np.ndarray        # (N,) int32
    patient_ids: np.ndarray   # (N,) int64
    class_names: List[str]    # per-sample class strings
    tumor_pixels: np.ndarray  # (N,) int64

    def __len__(self) -> int:
        return int(self.images.shape[0])

    @property
    def n_channels(self) -> int:
        return int(self.images.shape[-1])


def _imread(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path, 0)
    if img is None:
        raise FileNotFoundError(path)
    return img


def build_array_dataset(mapping: pd.DataFrame,
                        augmentations: Optional[Dict[str, bool]] = None,
                        normalization: Optional[str] = None,
                        semantic_segmentation: bool = False) -> ArrayDataset:
    """Eager-load a mapping frame into arrays (NHWC, float32)."""
    augmentations = augmentations or {}
    images, masks, labels, pids, classes, tumor = [], [], [], [], [], []

    label_map = LABEL_MAP_SEMANTIC if semantic_segmentation else LABEL_MAP
    for _, row in mapping.iterrows():
        img_u8 = _imread(row["img_path"])
        cls = row["class"]
        if cls not in label_map:
            raise ValueError(f"Unknown class: {cls}")
        if semantic_segmentation:
            # Class-conditional one-hot (H, W, 3): channel ``label_map[cls]``
            # is the binary tumor mask, channel 0 (normal/background) its
            # complement. This is the encoding the reference's own inference
            # requires — it argmaxes the mask channels (``models.py:145``) —
            # but never constructs: ``BUSI_dataset.py:52`` color-reads the
            # grayscale mask PNG into 3 *identical* 0/255 channels, and its
            # factory never wires ``regions`` from config anyway
            # (``experiment_init.py:288-291``), so the reference's semantic
            # path is unreachable end-to-end. We build the evidently intended
            # target so ``data.semantic_segmentation: true`` actually trains.
            bin_mask = _imread(row["mask_path"]).astype(np.int64)
            bin_mask[bin_mask == 255] = 1
            mask = np.eye(3, dtype=np.float32)[bin_mask * label_map[cls]]
        else:
            mask = _imread(row["mask_path"]).astype(np.float32)
            mask[mask == 255] = 1
            mask = mask[..., None]

        img = img_u8.astype(np.float32)[..., None]
        if normalization is not None:
            # Unreachable through config by design: the reference hard-codes
            # ``normalization=None`` in every ``load_datasets`` branch
            # (``BUSI_dataloader.py:352,366,375``) and loader.py mirrors that.
            # Like the reference (``BUSI_dataset.py:107-108``), scaling applies
            # to the base channel only — augment channels stay 0..255.
            lo, hi = img.min(), img.max()
            img = (img - lo) / max(hi - lo, 1e-12)
        if any(augmentations.values()) and not semantic_segmentation:
            aug = build_augment_channels(img_u8, augmentations)
            img = np.concatenate([img, aug], axis=-1)

        images.append(img)
        masks.append(mask)
        labels.append(label_map[cls])
        pids.append(int(row["id"]))
        classes.append(cls)
        tumor.append(int(row.get("tumor_pixels", 0)))

    return ArrayDataset(
        images=np.stack(images).astype(np.float32),
        masks=np.stack(masks).astype(np.float32),
        labels=np.asarray(labels, np.int32),
        patient_ids=np.asarray(pids, np.int64),
        class_names=classes,
        tumor_pixels=np.asarray(tumor, np.int64),
    )
