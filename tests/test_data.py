"""Data-layer tests: preprocessing end-to-end on synthetic raw BUSI,
split determinism + oversampling goldens, dataset arrays, jit-able augments."""

import numpy as np
import pandas as pd
import pytest

from multi_task_breast_cancer_tpu.config import DataConfig, TrainingConfig
from multi_task_breast_cancer_tpu.data import synthetic
from multi_task_breast_cancer_tpu.data.dataset import build_array_dataset
from multi_task_breast_cancer_tpu.data.loader import load_datasets
from multi_task_breast_cancer_tpu.data.preprocessing import preprocess_busi
from multi_task_breast_cancer_tpu.data.splits import (
    deterministic_oversampling,
    filter_anomalous_cases,
    stratified_cv_splits,
)


@pytest.fixture(scope="module")
def raw_busi(tmp_path_factory):
    return synthetic.make_raw_busi(tmp_path_factory.mktemp("raw"), n_per_class=4, size=64)


@pytest.fixture(scope="module")
def preprocessed(tmp_path_factory):
    return synthetic.make_preprocessed_busi(tmp_path_factory.mktemp("prep"),
                                            n_per_class=8, size=64)


class TestPreprocessing:
    def test_end_to_end(self, raw_busi, tmp_path):
        out = tmp_path / "out"
        mapping = preprocess_busi(raw_busi, out, resize=(32, 32))
        assert len(mapping) == 12  # 3 classes × 4
        assert (out / "mapping.csv").exists()
        assert set(mapping.columns) >= {"img_path", "mask_path", "class", "id",
                                        "dim1", "dim2", "tumor_pixels",
                                        "y_max", "y_min", "x_max", "x_min"}
        assert (mapping["dim1"] == 32).all()
        # tumor classes have tumor pixels; normal has none
        assert (mapping[mapping["class"] == "normal"]["tumor_pixels"] == 0).all()
        assert (mapping[mapping["class"] == "benign"]["tumor_pixels"] > 0).all()

    def test_curated_filter(self, raw_busi, tmp_path):
        curated = tmp_path / "curated.csv"
        pd.DataFrame({"class": ["benign", "malignant"], "id": [1, 2]}).to_csv(
            curated, sep=";", index=False)
        mapping = preprocess_busi(raw_busi, tmp_path / "out2", curated_csv=curated,
                                  resize=(32, 32))
        assert len(mapping) == 2
        assert set(zip(mapping["class"], mapping["id"])) == {("benign", 1), ("malignant", 2)}


class TestSplits:
    def _mapping(self, n=40):
        rng = np.random.default_rng(0)
        classes = ["benign"] * (n // 2) + ["malignant"] * (n // 4) + ["normal"] * (n // 4)
        return pd.DataFrame({"class": classes, "id": range(n),
                             "img_path": "x", "mask_path": "y"})

    def test_cv_split_deterministic_and_disjoint(self):
        m = self._mapping()
        folds1 = stratified_cv_splits(m, seed=1993, n_folds=4, oversampling=False)
        folds2 = stratified_cv_splits(m, seed=1993, n_folds=4, oversampling=False)
        all_test_ids = []
        for f1, f2 in zip(folds1, folds2):
            assert list(f1["test"]["id"]) == list(f2["test"]["id"])
            assert list(f1["train"]["id"]) == list(f2["train"]["id"])
            assert not set(f1["train"]["id"]) & set(f1["test"]["id"])
            assert not set(f1["val"]["id"]) & set(f1["test"]["id"])
            all_test_ids.extend(f1["test"]["id"])
        # test folds partition the dataset
        assert sorted(all_test_ids) == list(range(len(m)))

    def test_deterministic_oversampling_factors(self):
        """Golden factors for 20/10/10: proportions .5/.25/.25 → factors 2/4/4
        → benign ×2, others ×4 (incl. the majority +1 quirk for factor-1 cases)."""
        m = self._mapping(40)
        over = deterministic_oversampling(m)
        counts = over["class"].value_counts()
        assert counts["benign"] == 40      # 20 + 20·(2-1)
        assert counts["malignant"] == 40   # 10 + 10·(4-1)
        assert counts["normal"] == 40
        # Curated-BUSI-like proportions: 222/164/64 → factors 2/3/7
        m2 = pd.DataFrame({"class": ["benign"] * 222 + ["malignant"] * 164 + ["normal"] * 64})
        over2 = deterministic_oversampling(m2)
        c2 = over2["class"].value_counts()
        assert c2["benign"] == 444 and c2["malignant"] == 492 and c2["normal"] == 448

    def test_majority_class_extra_copy_quirk(self):
        """factor==1 classes still get one extra copy (BUSI_dataloader.py:334-336)."""
        m = pd.DataFrame({"class": ["benign"] * 90 + ["malignant"] * 10})
        over = deterministic_oversampling(m)
        c = over["class"].value_counts()
        assert c["benign"] == 180  # factor round(1/.9)=1 → else-branch appends full copy
        assert c["malignant"] == 100  # factor 10 → 10 + 10·9

    def test_filter_anomalous(self):
        m = pd.DataFrame({"class": ["benign", "benign", "normal"],
                          "id": [435, 7, 34]})
        out = filter_anomalous_cases(m)
        assert list(out["id"]) == [7]

    def test_use_duplicated_filter_order_quirk(self):
        """Golden membership for classes=['benign','malignant'] +
        use_duplicated_to_train=True: the reference computes the train-only
        complement on the FULL mapping before class filtering
        (BUSI_dataloader.py:95-100), so out-of-class (normal) train-only rows
        are re-added to every fold's train set. Verified against an inline
        simulation of the reference order."""
        from multi_task_breast_cancer_tpu.data.splits import (
            INCONGRUENT_CASES,
            TRAIN_ONLY_CASES,
            filter_incongruent_cases,
            filter_train_cases,
        )

        rows = []
        # splittable benign/malignant rows (ids far from any curated list)
        rows += [{"class": "benign", "id": 500 + i} for i in range(16)]
        rows += [{"class": "malignant", "id": 600 + i} for i in range(12)]
        # train-only rows of ALL classes, incl. the excluded 'normal'
        rows += [{"class": "benign", "id": i} for i in TRAIN_ONLY_CASES["benign"][:4]]
        rows += [{"class": "normal", "id": i} for i in TRAIN_ONLY_CASES["normal"][:3]]
        # incongruent rows must vanish entirely
        rows += [{"class": "malignant", "id": INCONGRUENT_CASES["malignant"][0]}]
        m = pd.DataFrame(rows)
        m["img_path"], m["mask_path"] = "x", "y"

        folds = stratified_cv_splits(m, seed=1993, n_folds=2, oversampling=False,
                                     use_duplicated_to_train=True,
                                     classes=["benign", "malignant"])

        # inline reference-order simulation (BUSI_dataloader.py:95-124)
        ref = filter_incongruent_cases(m)
        ref, complement = filter_train_cases(ref)
        ref = ref[ref["class"].isin(["benign", "malignant"])]
        from sklearn.model_selection import StratifiedKFold, train_test_split
        kf = StratifiedKFold(n_splits=2, shuffle=True, random_state=1993)
        for fold, (tr_ix, te_ix) in zip(folds, kf.split(ref, ref["class"])):
            tr_val = ref.iloc[tr_ix]
            tr, _ = train_test_split(tr_val, train_size=0.8, random_state=1993,
                                     shuffle=True, stratify=tr_val["class"])
            expected = pd.concat([tr, complement])
            assert list(fold["train"]["id"]) == list(expected["id"])
            assert list(fold["train"]["class"]) == list(expected["class"])
            # the quirk: excluded-class (normal) rows land in train
            assert (fold["train"]["class"] == "normal").sum() == 3
            # incongruent rows are gone everywhere
            assert INCONGRUENT_CASES["malignant"][0] not in set(
                fold["train"][fold["train"]["class"] == "malignant"]["id"])

    def test_cv_prod_merges_val(self):
        m = self._mapping()
        folds = stratified_cv_splits(m, seed=1993, n_folds=4, oversampling=False,
                                     merge_val=True)
        assert "val" not in folds[0]
        plain = stratified_cv_splits(m, seed=1993, n_folds=4, oversampling=False)
        assert len(folds[0]["train"]) == len(plain[0]["train"]) + len(plain[0]["val"])


class TestArrayDataset:
    def test_build_and_labels(self, preprocessed):
        mapping = pd.read_csv(preprocessed / "mapping.csv")
        ds = build_array_dataset(mapping)
        assert ds.images.shape == (24, 64, 64, 1)
        assert ds.masks.shape == (24, 64, 64, 1)
        assert set(np.unique(ds.masks)) <= {0.0, 1.0}
        # label map: benign→0, malignant→1, normal→2
        for lbl, cls in zip(ds.labels, ds.class_names):
            assert lbl == {"benign": 0, "malignant": 1, "normal": 2}[cls]

    def test_augment_channels_stacked(self, preprocessed):
        mapping = pd.read_csv(preprocessed / "mapping.csv").head(4)
        ds = build_array_dataset(mapping, augmentations={"SOBEL": True,
                                                         "brightness_brighter": True})
        assert ds.images.shape[-1] == 3

    def test_semantic_label_flip(self, preprocessed):
        mapping = pd.read_csv(preprocessed / "mapping.csv")
        ds = build_array_dataset(mapping, semantic_segmentation=True)
        for lbl, cls in zip(ds.labels, ds.class_names):
            assert lbl == {"benign": 1, "normal": 0, "malignant": 2}[cls]
        assert ds.masks.shape[-1] == 3

    def test_semantic_masks_are_class_conditional_one_hot(self, preprocessed):
        """Semantic masks must be the one-hot the inference argmax consumes
        (reference models.py:145), not the reference's degenerate 3-identical
        0/255 color read (BUSI_dataset.py:52)."""
        import cv2
        mapping = pd.read_csv(preprocessed / "mapping.csv")
        ds = build_array_dataset(mapping, semantic_segmentation=True)
        assert set(np.unique(ds.masks)) <= {0.0, 1.0}
        # exactly one channel set per pixel
        np.testing.assert_array_equal(ds.masks.sum(-1), 1.0)
        for i, (lbl, cls) in enumerate(zip(ds.labels, ds.class_names)):
            row = mapping.iloc[i]
            raw = cv2.imread(row["mask_path"], 0)
            binary = (raw > 0).astype(np.float32)
            if cls == "normal":  # label 0: everything background
                np.testing.assert_array_equal(ds.masks[i, ..., 0], 1.0)
            else:
                np.testing.assert_array_equal(ds.masks[i, ..., lbl], binary)
                np.testing.assert_array_equal(ds.masks[i, ..., 0], 1 - binary)
            # argmax recovers the per-pixel class labels
            np.testing.assert_array_equal(
                np.argmax(ds.masks[i], -1), binary * lbl)

    def test_loader_cv_modes(self, preprocessed):
        tc = TrainingConfig(CV=2, seed=1993)
        dc = DataConfig(input_img=str(preprocessed), oversampling=True)
        folds = load_datasets(tc, dc, mode="CV")
        assert len(folds) == 2
        assert folds[0].val is not None
        prod = load_datasets(tc, dc, mode="CV_PROD")
        assert prod[0].val is None
        assert len(prod[0].train) > len(folds[0].train)  # merged val (after oversampling)


class TestAugment:
    def test_flip_and_rotation_preserve_alignment(self):
        import jax
        import jax.numpy as jnp
        from multi_task_breast_cancer_tpu.data.augment import joint_transform_batch

        rng = np.random.default_rng(0)
        imgs = rng.random((4, 32, 32, 2)).astype(np.float32)
        masks = (rng.random((4, 32, 32, 1)) > 0.5).astype(np.float32)
        # make mask == thresholded channel-0 image so alignment is checkable
        imgs[..., 0] = masks[..., 0]
        out_img, out_mask = joint_transform_batch(jnp.asarray(imgs), jnp.asarray(masks),
                                                  jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(out_img[..., 0]),
                                   np.asarray(out_mask[..., 0]), atol=1e-6)

    def test_rotation_identity_at_zero(self):
        import jax.numpy as jnp
        from multi_task_breast_cancer_tpu.data.augment import rotate_nearest

        img = jnp.arange(16.0).reshape(4, 4, 1)
        out = rotate_nearest(img, jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img))

    def test_rotation_90_degrees(self):
        import jax.numpy as jnp
        from multi_task_breast_cancer_tpu.data.augment import rotate_nearest

        img = np.zeros((8, 8, 1), np.float32)
        img[1, 4, 0] = 1.0  # above centre
        out = np.asarray(rotate_nearest(jnp.asarray(img), jnp.asarray(90.0)))
        assert out.sum() == 1.0
        y, x, _ = np.unravel_index(out.argmax(), out.shape)
        # 90° rotation moves the point onto the horizontal axis through centre
        assert y in (3, 4) and x in (1, 2, 6, 7)

    def test_transform_is_deterministic_per_key(self):
        import jax
        import jax.numpy as jnp
        from multi_task_breast_cancer_tpu.data.augment import joint_transform_batch

        imgs = jnp.asarray(np.random.default_rng(1).random((2, 16, 16, 1)), jnp.float32)
        masks = jnp.zeros((2, 16, 16, 1))
        a1, _ = joint_transform_batch(imgs, masks, jax.random.PRNGKey(7))
        a2, _ = joint_transform_batch(imgs, masks, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_make_hard_busi_generator(tmp_path):
    """Calibrated-hard ablation fixture: correct layout/counts, normal images
    have EMPTY masks but non-trivial content (lesion-like distractors darken
    them), tumor masks are non-empty and wobbly, mapping stats consistent."""
    import cv2
    import pandas as pd
    from multi_task_breast_cancer_tpu.data import synthetic

    counts = {"benign": 6, "malignant": 5, "normal": 4}
    root = synthetic.make_hard_busi(tmp_path / "hard", size=64, seed=3,
                                    class_counts=counts)
    m = pd.read_csv(root / "mapping.csv")
    assert m["class"].value_counts().to_dict() == counts

    normal = m[m["class"] == "normal"]
    assert (normal["tumor_pixels"] == 0).all()
    for _, row in normal.iterrows():
        mask = cv2.imread(row["mask_path"], 0)
        assert mask.max() == 0
        img = cv2.imread(row["img_path"], 0).astype(float)
        # distractors must leave structure (not flat noise): sizable spread
        assert img.std() > 15

    tumors = m[m["class"] != "normal"]
    assert (tumors["tumor_pixels"] > 0).all()
    for _, row in tumors.head(3).iterrows():
        mask = cv2.imread(row["mask_path"], 0)
        assert set(np.unique(mask)) <= {0, 255}
        assert (mask == 255).sum() == row["tumor_pixels"]
