"""Synthetic BUSI fixture generator — fake ultrasound-like images + masks laid
out exactly like the real raw/preprocessed BUSI trees, so every pipeline stage
(preprocessing → mapping.csv → splits → training) runs on CPU CI with no data.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import numpy as np
import pandas as pd

CLASSES = ("benign", "malignant", "normal")


def _blob_image(rng: np.random.Generator, size: int, with_tumor: bool,
                bright_tumor: bool = False, learnable_style: bool = False
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Speckle-noise image; optional elliptical 'tumor' + its mask.

    ``learnable_style`` (used by the *learnable* fixtures) makes the set
    provably fittable at CI scale: lower background noise, larger lesions,
    strong lesion/background contrast, and class a pure function of the image
    — dark lesion = benign, bright lesion = malignant (``bright_tumor``),
    none = normal. Default style keeps the original harder statistics."""
    sigma = 25 if learnable_style else 40
    img = (rng.normal(120, sigma, (size, size))).clip(0, 255)
    mask = np.zeros((size, size), np.uint8)
    if with_tumor:
        cy, cx = rng.integers(size // 4, 3 * size // 4, 2)
        lo, hi = (size // 6, size // 3) if learnable_style else (size // 10, size // 4)
        ry, rx = rng.integers(lo, hi, 2)
        yy, xx = np.mgrid[0:size, 0:size]
        ellipse = ((yy - cy) / max(ry, 1)) ** 2 + ((xx - cx) / max(rx, 1)) ** 2 <= 1
        if learnable_style:
            img[ellipse] = 235 + img[ellipse] * 0.05 if bright_tumor \
                else img[ellipse] * 0.12
        elif bright_tumor:
            img[ellipse] = (img[ellipse] * 0.4 + 160).clip(0, 255)
        else:
            img[ellipse] = (img[ellipse] * 0.35)
        mask[ellipse] = 255
    return img.astype(np.uint8), mask


def _wobbly_ellipse(yy: np.ndarray, xx: np.ndarray, cy: int, cx: int,
                    ry: int, rx: int, amplitude: float, k: int,
                    phi0: float) -> np.ndarray:
    """Boolean region of an ellipse whose margin wobbles sinusoidally with
    angle — the boundary formula behind lesion margins (``amplitude``/``k``
    control spiculation)."""
    phi = np.arctan2(yy - cy, xx - cx)
    r_norm = np.sqrt(((yy - cy) / max(ry, 1)) ** 2
                     + ((xx - cx) / max(rx, 1)) ** 2)
    return r_norm <= 1.0 + amplitude * np.sin(k * phi + phi0)


def hard_calibration_fingerprint() -> str:
    """sha1 (12 hex chars) of the hard-fixture generator's source.

    Benchmark artifacts (``ABLATION_*.json``, ``FASTAUG_QUALITY_*.json``)
    record this stamp so a recalibration of the cue constants committed
    WITHOUT regenerating the artifacts is detectable — the ordering tests
    would otherwise keep certifying numbers the current generator no longer
    produces."""
    import hashlib
    import inspect
    src = inspect.getsource(_wobbly_ellipse) + inspect.getsource(_hard_image)
    return hashlib.sha1(src.encode()).hexdigest()[:12]


def _hard_image(rng: np.random.Generator, size: int, cls: str,
                difficulty: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Calibrated-difficulty ultrasound-like image for the table-5 ablation
    benchmark (see ``bench_ablation.py``): speckle + depth attenuation,
    lesion-like DARK DISTRACTORS in every image (so the seg head false-
    positives on 'normal' images exactly like the reference's DSC-normal
    0.000 rows, table 5 via ``README.md:77``), and an ambiguous class cue
    (margin irregularity: benign = smooth wobble, malignant = spiculated)
    with overlapping distributions.

    ``difficulty`` scales contrast/noise: 1.0 targets the reference's MT
    regime (DSC-avg 0.6-0.8, ACC 0.7-0.8)."""
    yy, xx = np.mgrid[0:size, 0:size]
    img = rng.normal(120.0, 12.0 * difficulty, (size, size))
    img -= (yy / size) * rng.uniform(10, 35)          # depth attenuation
    # lesion-like dark distractors (shadowing / cysts), never in the mask
    for _ in range(int(rng.integers(2, 5))):
        cy, cx = rng.integers(0, size, 2)
        ry, rx = rng.integers(size // 16, size // 6, 2)
        d = ((yy - cy) / max(ry, 1)) ** 2 + ((xx - cx) / max(rx, 1)) ** 2 <= 1
        img[d] *= rng.uniform(0.6, 0.85)

    mask = np.zeros((size, size), np.uint8)
    if cls != "normal":
        cy, cx = rng.integers(size // 4, 3 * size // 4, 2)
        ry, rx = rng.integers(size // 10, size // 4, 2)
        # class cues, both probabilistic/overlapping: margin irregularity
        # (spiculation) and posterior acoustic shadowing — the classic
        # malignancy features in breast ultrasound
        if cls == "malignant":
            wobble_a = rng.uniform(0.18, 0.45)
            k = int(rng.integers(5, 10))
            shadowed = rng.random() < 0.70
            interior = rng.uniform(0.48, 0.68)        # hypoechoic interior
        else:
            wobble_a = rng.uniform(0.02, 0.15)
            k = int(rng.integers(3, 6))
            shadowed = rng.random() < 0.12
            interior = rng.uniform(0.56, 0.75)        # overlaps malignant
        phi0 = rng.uniform(0, 2 * np.pi)
        lesion = _wobbly_ellipse(yy, xx, cy, cx, ry, rx, wobble_a, k, phi0)
        img[lesion] *= interior
        if shadowed:
            x0, x1 = max(cx - rx // 2, 0), min(cx + rx // 2 + 1, size)
            img[min(cy + ry, size - 1):, x0:x1] *= rng.uniform(0.6, 0.8)
        mask[lesion] = 255
    # multiplicative speckle
    img *= rng.gamma(8.0 / difficulty, difficulty / 8.0, (size, size))
    return img.clip(0, 255).astype(np.uint8), mask



def _mapping_row(img_path, mask_path, cls: str, i: int, size: int,
                 mask) -> dict:
    """One mapping.csv row with the preprocessing bbox convention
    (max-EXCLUSIVE bounds, zeros for empty masks) — the same stats
    ``native.mask_stats`` / ``data.preprocessing`` produce for real data."""
    ys, xs = np.nonzero(mask)
    return {
        "img_path": str(img_path), "mask_path": str(mask_path),
        "class": cls, "id": i, "dim1": size, "dim2": size,
        "tumor_pixels": int((mask == 255).sum()),
        "y_max": int(ys.max() + 1) if len(ys) else 0,
        "y_min": int(ys.min()) if len(ys) else 0,
        "x_max": int(xs.max() + 1) if len(xs) else 0,
        "x_min": int(xs.min()) if len(xs) else 0,
        "y_size": int(ys.max() + 1 - ys.min()) if len(ys) else 0,
        "x_size": int(xs.max() + 1 - xs.min()) if len(xs) else 0,
    }

def make_hard_busi(root: str | Path, size: int = 128, seed: int = 0,
                   class_counts: Dict[str, int] | None = None,
                   difficulty: float = 1.0) -> Path:
    """Preprocessed-layout tree in the calibrated 'hard' style (ablation
    benchmark). Default counts are the Curated-BUSI class totals the
    reference reports (``README.md:44-47``: 222 benign / 164 malignant /
    64 normal = 450 images)."""
    import cv2
    counts = class_counts or {"benign": 222, "malignant": 164, "normal": 64}
    rng = np.random.default_rng(seed)
    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "masks").mkdir(parents=True, exist_ok=True)
    rows = []
    for cls in CLASSES:
        for i in range(1, counts.get(cls, 0) + 1):
            img, mask = _hard_image(rng, size, cls, difficulty)
            img_path = root / "images" / f"{cls}_id_{i}.png"
            mask_path = root / "masks" / f"{cls}_id_{i}_mask.png"
            cv2.imwrite(str(img_path), img)
            cv2.imwrite(str(mask_path), mask)
            rows.append(_mapping_row(img_path, mask_path, cls, i, size, mask))
    pd.DataFrame(rows).to_csv(root / "mapping.csv", index=False)
    return root


def make_raw_busi(root: str | Path, n_per_class: int = 6, size: int = 64,
                  seed: int = 0) -> Path:
    """Create a raw ``Dataset_BUSI_with_GT``-style tree: per-class folders of
    ``cls (i).png`` + ``cls (i)_mask.png`` (one image per class also gets a
    ``_mask_1.png`` to exercise multi-mask merging)."""
    import cv2
    rng = np.random.default_rng(seed)
    root = Path(root)
    for cls in CLASSES:
        d = root / cls
        d.mkdir(parents=True, exist_ok=True)
        for i in range(1, n_per_class + 1):
            img, mask = _blob_image(rng, size, with_tumor=(cls != "normal"))
            cv2.imwrite(str(d / f"{cls} ({i}).png"), img)
            cv2.imwrite(str(d / f"{cls} ({i})_mask.png"), mask)
            if i == 1 and cls != "normal":
                _, mask2 = _blob_image(rng, size, with_tumor=True)
                cv2.imwrite(str(d / f"{cls} ({i})_mask_1.png"), mask2)
    return root


def make_preprocessed_busi(root: str | Path, n_per_class: int = 8, size: int = 128,
                           seed: int = 0, learnable: bool = False,
                           class_counts: Dict[str, int] | None = None) -> Path:
    """Create a preprocessed tree directly (images/, masks/, mapping.csv) —
    the layout ``config.data.input_img`` points at.

    ``learnable=True`` makes class a deterministic function of the image
    (benign = dark lesion, malignant = bright lesion, normal = none) so
    convergence tests can assert the model actually learns both tasks.

    ``class_counts`` overrides ``n_per_class`` per class — e.g. the real
    Curated-BUSI imbalance is roughly {benign: 437, malignant: 210,
    normal: 133}, which drives the deterministic-oversampling factors."""
    import cv2
    rng = np.random.default_rng(seed)
    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "masks").mkdir(parents=True, exist_ok=True)
    rows = []
    for cls in CLASSES:
        n_cls = (class_counts or {}).get(cls, n_per_class)
        for i in range(1, n_cls + 1):
            img, mask = _blob_image(rng, size, with_tumor=(cls != "normal"),
                                    bright_tumor=(learnable and cls == "malignant"),
                                    learnable_style=learnable)
            img_path = root / "images" / f"{cls}_id_{i}.png"
            mask_path = root / "masks" / f"{cls}_id_{i}_mask.png"
            cv2.imwrite(str(img_path), img)
            cv2.imwrite(str(mask_path), mask)
            rows.append(_mapping_row(img_path, mask_path, cls, i, size, mask))
    pd.DataFrame(rows).to_csv(root / "mapping.csv", index=False)
    return root
