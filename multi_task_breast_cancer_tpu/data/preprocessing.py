"""BUSI raw-dataset preprocessing: walk ``Dataset_BUSI_with_GT``, merge
multi-mask images, resize to 128×128 (nearest), optionally filter to the
curated mapping, and emit ``mapping.csv`` with dims / tumor pixels / bbox.

Behavioural twin of ``src/dataset/Curated_BUSI_preprocessing.py:147-178``
(same folder layout, file naming, and CSV columns), exposed as a function +
CLI instead of module-level constants.

The compute inner loop (nearest resize, saturating mask merge, mask
statistics) runs through the native C++ library (``native/mtbc_native.cpp``
via :mod:`multi_task_breast_cancer_tpu.native`, cv2-parity-tested in
``tests/test_native.py``); cv2 is used only for PNG IO.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from multi_task_breast_cancer_tpu import native

CLASS_NAMES = ["benign", "malignant", "normal"]
RESIZE_DIMENSIONS = (128, 128)


def _imread_gray(path: Path) -> np.ndarray:
    import cv2
    img = cv2.imread(str(path), 0)
    if img is None:
        raise FileNotFoundError(path)
    return img


def _resize_nearest(img: np.ndarray, dims: Tuple[int, int]) -> np.ndarray:
    # dims is (width, height) like cv2.resize's dsize
    return native.nearest_resize(img, dims[1], dims[0])


def size_tumor(seg: np.ndarray) -> Tuple[int, int, int, int, int, int]:
    """Tumor bounding box (ymax, ymin, xmax, xmin, y_size, x_size);
    zeros when empty (``Curated_BUSI_preprocessing.py:45-51``)."""
    s = native.mask_stats(seg)
    return (s["y_max"], s["y_min"], s["x_max"], s["x_min"],
            s["y_size"], s["x_size"])


def _list_class_ids(class_path: Path) -> Tuple[List[str], Dict[str, int]]:
    """All image ids for a class folder plus per-id mask counts.

    BUSI files are named ``benign (7).png`` / ``benign (7)_mask.png`` /
    ``benign (7)_mask_1.png`` …"""
    ids, mask_counts = [], {}
    for f in sorted(class_path.glob("*.png")):
        stem = f.stem
        raw = stem.split(" ")[-1].split("_")[0].replace("(", "").replace(")", "")
        if "mask" in stem:
            mask_counts[raw] = mask_counts.get(raw, 0) + 1
        else:
            ids.append(raw)
    return ids, mask_counts


def preprocess_busi(input_folder: str | Path, output_folder: str | Path,
                    curated_csv: Optional[str | Path] = None,
                    resize: Tuple[int, int] = RESIZE_DIMENSIONS) -> pd.DataFrame:
    """Run the full preprocessing pass; returns (and writes) the mapping frame.

    - merges every ``_mask*.png`` for an id by summation (multi-tumor images),
    - nearest-neighbour resize of image and merged mask,
    - optional curated-id filter from ``mapping_curated_BUSI.csv`` (sep=';'),
    - writes ``{out}/images``, ``{out}/masks`` and ``{out}/mapping.csv``.
    """
    import cv2

    input_path = Path(input_folder)
    output_path = Path(output_folder)
    (output_path / "images").mkdir(parents=True, exist_ok=True)
    (output_path / "masks").mkdir(parents=True, exist_ok=True)

    curated_ids: Dict[str, Optional[set]] = {cls: None for cls in CLASS_NAMES}
    if curated_csv is not None:
        curated = pd.read_csv(curated_csv, sep=";")
        for cls in CLASS_NAMES:
            curated_ids[cls] = set(curated[curated["class"] == cls]["id"].astype(int))

    rows = []
    for cls in CLASS_NAMES:
        class_path = input_path / cls
        if not class_path.exists():
            logging.warning("preprocess: class folder missing: %s", class_path)
            continue
        ids, mask_counts = _list_class_ids(class_path)
        for raw_id in sorted(set(ids), key=int):
            j = int(raw_id)
            if curated_ids[cls] is not None and j not in curated_ids[cls]:
                continue
            img_file = class_path / f"{cls} ({raw_id}).png"
            if not img_file.exists():
                continue
            img = _imread_gray(img_file)
            total_mask = _imread_gray(class_path / f"{cls} ({raw_id})_mask.png")
            for extra in range(1, mask_counts.get(raw_id, 1)):
                total_mask = native.add_saturate(total_mask, _imread_gray(
                    class_path / f"{cls} ({raw_id})_mask_{extra}.png"))

            img_r = _resize_nearest(img, resize)
            mask_r = _resize_nearest(total_mask, resize)

            img_out = output_path / "images" / f"{cls}_id_{raw_id}.png"
            mask_out = output_path / "masks" / f"{cls}_id_{raw_id}_mask.png"
            cv2.imwrite(str(img_out), img_r)
            cv2.imwrite(str(mask_out), mask_r)

            tumor_pixels = int(np.sum(mask_r == 255))
            ymax, ymin, xmax, xmin, ys, xs = size_tumor(mask_r)
            rows.append({
                "img_path": str(img_out), "mask_path": str(mask_out),
                "class": cls, "id": j,
                "dim1": img_r.shape[0], "dim2": img_r.shape[1],
                "tumor_pixels": tumor_pixels,
                "y_max": ymax, "y_min": ymin, "x_max": xmax, "x_min": xmin,
                "y_size": ys, "x_size": xs,
            })

    mapping = pd.DataFrame(rows).sort_values(by=["class", "id"]).reset_index(drop=True)
    mapping.to_csv(output_path / "mapping.csv", index=False)
    logging.info("preprocess: %d images → %s", len(mapping), output_path)
    return mapping


def main() -> None:
    import argparse
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", default="./data/Dataset_BUSI_with_GT")
    parser.add_argument("--output", default="./data/Curated_BUSI_128")
    parser.add_argument("--curated-csv", default=None,
                        help="mapping_curated_BUSI.csv (class;id) to filter with")
    parser.add_argument("--size", type=int, default=128)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    preprocess_busi(args.input, args.output, args.curated_csv,
                    (args.size, args.size))


if __name__ == "__main__":
    main()
