"""Cross-validation splits, case filters, and oversampling.

Host-side pandas/sklearn planning (runs once per fold). sklearn's
``StratifiedKFold`` / ``train_test_split`` are reused deliberately so that fold
*membership* under seed 1993 is bit-identical to the reference
(``src/dataset/BUSI_dataloader.py:79-218``) — reimplementing the splitter would
silently change which patients land in which fold.

The anomalous/incongruent/train-case ID lists are data constants curated by the
reference authors (``BUSI_dataloader.py:247-303``); they are reproduced as data
for capability parity.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
from sklearn.model_selection import StratifiedKFold, train_test_split

ANOMALOUS_CASES: Dict[str, List[int]] = {
    "benign": [435, 433, 42, 131, 437, 269, 333, 399, 403, 406, 85, 164, 61, 94,
               108, 114, 116, 119, 122, 201, 302, 394, 402, 199, 248, 242, 288,
               236, 247, 233, 299, 4, 321, 25, 153],
    "malignant": [145, 51, 77, 78, 93, 94, 52, 106, 107, 18, 116],
    "normal": [34, 1],
}

INCONGRUENT_CASES: Dict[str, List[int]] = {
    "benign": [42, 131, 269, 333, 399, 406, 433, 437, 85, 164, 333],
    "malignant": [51, 52, 77, 78, 93, 94, 145, 51, 52],
    "normal": [1, 34],
}

TRAIN_ONLY_CASES: Dict[str, List[int]] = {
    "benign": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
               21, 25, 30, 33, 35, 37, 38, 44, 50, 51, 52, 58, 60, 62, 64, 65, 81,
               86, 96, 99, 105, 110, 127, 128, 129, 130, 132, 133, 134, 135, 136,
               138, 139, 140, 141, 150, 151, 152, 153, 154, 155, 156, 157, 158,
               163, 177, 197, 199, 200, 201, 202, 203, 204, 205, 206, 207, 208,
               209, 210, 211, 213, 214, 215, 216, 217, 218, 219, 220, 221, 222,
               223, 224, 225, 226, 227, 228, 229, 230, 231, 232, 233, 234, 235,
               236, 237, 238, 239, 240, 241, 242, 244, 245, 246, 247, 248, 249,
               250, 251, 252, 253, 254, 255, 256, 257, 258, 259, 260, 261, 262,
               263, 264, 265, 266, 267, 268, 270, 271, 272, 273, 274, 275, 276,
               277, 278, 279, 280, 281, 282, 284, 285, 287, 288, 289, 290, 291,
               292, 293, 294, 295, 296, 297, 298, 299, 300, 301, 302, 303, 304,
               305, 306, 307, 308, 309, 310, 312, 316, 318, 319, 320, 321, 322,
               323, 324, 325, 326, 327, 328, 329, 330, 331, 332, 395, 396, 400,
               404, 411, 412, 413, 415, 419, 421, 422, 423, 424, 425, 426],
    "malignant": [4, 5, 7, 8, 9, 10, 12, 13, 14, 15, 17, 18, 34, 39, 42, 65, 66,
                  80, 81, 88, 92, 95, 96, 97, 98, 99, 106, 107, 109, 110, 111,
                  112, 114, 116, 118, 119, 123, 128, 129],
    "normal": [5, 13, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33,
               35, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53,
               54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64, 67, 68, 69, 81, 97, 98,
               104, 107, 119, 120, 121, 122, 123, 124, 125, 126, 127, 128, 129,
               130, 131, 132],
}


def filter_anomalous_cases(mapping: pd.DataFrame) -> pd.DataFrame:
    """Drop known outlier cases (``BUSI_dataloader.py:247-259``)."""
    logging.info("Filtering anomalous cases")
    for cls, ids in ANOMALOUS_CASES.items():
        mapping = mapping[~((mapping["class"] == cls) & (mapping["id"].isin(ids)))]
    return mapping


def filter_incongruent_cases(mapping: pd.DataFrame) -> pd.DataFrame:
    """Drop incongruent duplicates (``BUSI_dataloader.py:262-274``)."""
    logging.info("Filtering incongruent cases")
    out = mapping.copy()
    for cls, ids in INCONGRUENT_CASES.items():
        out = out[~((out["class"] == cls) & (out["id"].isin(ids)))]
    return out


def filter_train_cases(mapping: pd.DataFrame) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Split into (splittable, train-only-complement) — the complement holds
    cases with known duplicates, safe only for training
    (``BUSI_dataloader.py:277-303``)."""
    out = mapping.copy()
    for cls, ids in TRAIN_ONLY_CASES.items():
        out = out[~((out["class"] == cls) & (out["id"].isin(ids)))]
    complement = mapping.loc[~mapping.index.isin(out.index)]
    return out, complement


def deterministic_oversampling(mapping_df: pd.DataFrame) -> pd.DataFrame:
    """Per-class replication factor ``round(1/proportion)``; each class appended
    ``factor-1`` extra times — the majority class (factor 1) still gets one
    extra copy through the else-branch, a reference quirk preserved for
    epoch-statistics parity (``BUSI_dataloader.py:320-340``)."""
    proportions = mapping_df["class"].value_counts(normalize=True)
    scaling = {cls: int(round(1.0 / p, 0)) for cls, p in proportions.items()}

    extra = []
    for cls, factor in scaling.items():
        class_df = mapping_df[mapping_df["class"] == cls]
        if factor > 1:
            extra.append(pd.concat([class_df] * (factor - 1)))
        else:
            extra.append(class_df)
    return pd.concat([mapping_df] + extra, ignore_index=True)


def oversampling_busi(mapping_df: pd.DataFrame, seed: int) -> pd.DataFrame:
    """Legacy random oversampling to benign-class size (``BUSI_dataloader.py:306-317``).

    Kept latent-API-only, exactly like the reference (no dispatcher calls it;
    ``deterministic_oversampling`` is the live path). Its quirks are preserved
    verbatim for parity: with ``n_malignant > n_benign`` the negative sample
    size raises, and the malignant branch omits ``replace=True`` (reference
    ``:311``) so a deficit larger than the malignant population also raises.
    """
    n_ben = len(mapping_df[mapping_df["class"] == "benign"])
    if "malignant" in set(mapping_df["class"]):
        n_mal = len(mapping_df[mapping_df["class"] == "malignant"])
        extra = mapping_df[mapping_df["class"] == "malignant"].sample(
            n=n_ben - n_mal, random_state=seed)
        mapping_df = pd.concat([mapping_df, extra])
    if "normal" in set(mapping_df["class"]):
        n_nor = len(mapping_df[mapping_df["class"] == "normal"])
        extra = mapping_df[mapping_df["class"] == "normal"].sample(
            n=n_ben - n_nor, random_state=seed, replace=True)
        mapping_df = pd.concat([mapping_df, extra])
    return mapping_df


def stratified_cv_splits(mapping: pd.DataFrame, seed: int, n_folds: int,
                         train_size: float = 0.8, remove_outliers: bool = False,
                         use_duplicated_to_train: bool = False,
                         oversampling: bool = True, merge_val: bool = False,
                         classes: List[str] | None = None
                         ) -> List[Dict[str, pd.DataFrame]]:
    """Stratified k-fold plan with inner train/val split — the splitting logic
    of ``BUSI_dataloader_CV`` (``:79-150``) and ``_CV_prod`` (``:153-218``,
    ``merge_val=True``). Returns per-fold dicts of mapping frames.

    ``classes`` filtering happens HERE, *after* the incongruent/train-only
    filters, to match the reference order (``BUSI_dataloader.py:95-100``):
    the train-only complement is computed on the full mapping, so with
    ``classes ⊂ {benign,malignant,normal}`` the complement re-adds
    out-of-class rows to every fold's train set — a quirk preserved for
    bit-identical train membership.
    """
    complement = None
    if use_duplicated_to_train:
        mapping = filter_incongruent_cases(mapping)
        mapping, complement = filter_train_cases(mapping)
    if classes is not None:
        mapping = mapping[mapping["class"].isin(classes)]

    folds = []
    kfold = StratifiedKFold(n_splits=n_folds, shuffle=True, random_state=int(seed))
    for n, (train_ix, test_ix) in enumerate(kfold.split(mapping, mapping["class"])):
        train_val, test = mapping.iloc[train_ix], mapping.iloc[test_ix].copy()
        test["fold"] = n
        train, val = train_test_split(train_val, train_size=train_size,
                                      random_state=int(seed), shuffle=True,
                                      stratify=train_val["class"])
        if remove_outliers:
            train = filter_anomalous_cases(train)
            val = filter_anomalous_cases(val)
            test = filter_anomalous_cases(test)
        if use_duplicated_to_train and complement is not None:
            train = pd.concat([train, complement])
        if oversampling:
            train = deterministic_oversampling(train)
        if merge_val:
            train = pd.concat([train, val])
            folds.append({"train": train, "test": test})
        else:
            folds.append({"train": train, "val": val, "test": test})
    return folds


def holdout_split(mapping: pd.DataFrame, seed: int, train_size: float = 0.8,
                  remove_outliers: bool = False, oversampling: bool = True
                  ) -> Dict[str, pd.DataFrame]:
    """80/10/10 stratified holdout (``BUSI_dataloader`` ``:17-76``)."""
    train, rest = train_test_split(mapping, train_size=train_size,
                                   random_state=int(seed), shuffle=True,
                                   stratify=mapping["class"])
    val, test = train_test_split(rest, test_size=0.5, random_state=int(seed),
                                 shuffle=True, stratify=rest["class"])
    if remove_outliers:
        train = filter_anomalous_cases(train)
        val = filter_anomalous_cases(val)
        test = filter_anomalous_cases(test)
    if oversampling:
        malignant = train[train["class"] == "malignant"]
        train = pd.concat([train, malignant])
    return {"train": train, "val": val, "test": test}
