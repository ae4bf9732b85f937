"""Metric parity tests: empty-mask conventions (metrics.py:175-252), batch Dice
(dice_score_from_tensor), device confusion-matrix vs sklearn."""

import jax.numpy as jnp
import numpy as np
from sklearn.metrics import accuracy_score, f1_score

from multi_task_breast_cancer_tpu.ops import metrics as M


class TestHostConventions:
    def test_dice_empty_gt_empty_pred(self):
        gt = np.zeros((16, 16))
        m = M.calculate_metrics(gt, np.zeros((16, 16)), "p0")
        assert m[M.DICE] == 1.0
        assert m[M.HAUSSDORF] == 0.0

    def test_dice_empty_gt_nonempty_pred(self):
        gt = np.zeros((16, 16))
        seg = np.zeros((16, 16)); seg[2:4, 2:4] = 1
        m = M.calculate_metrics(gt, seg, "p1")
        assert m[M.DICE] == 0.0
        assert np.isnan(m[M.HAUSSDORF])

    def test_sens_prec_nan_when_no_tp(self):
        gt = np.zeros((16, 16)); gt[0:2, 0:2] = 1
        seg = np.zeros((16, 16)); seg[10:12, 10:12] = 1
        m = M.calculate_metrics(gt, seg, "p2")
        assert np.isnan(m[M.SENS])
        assert np.isnan(m[M.PREC])

    def test_perfect_overlap(self):
        gt = np.zeros((16, 16)); gt[4:8, 4:8] = 1
        m = M.calculate_metrics(gt, gt.copy(), "p3")
        assert m[M.DICE] == 1.0
        assert m[M.JACC] == 1.0
        assert m[M.HAUSSDORF] == 0.0
        assert m[M.SENS] == 1.0


class TestDeviceMetrics:
    def test_batch_dice_matches_numpy(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(4, 16, 16, 1)).astype(np.float32)
        gt = (rng.random((4, 16, 16, 1)) > 0.5).astype(np.float32)
        seg = 1 / (1 + np.exp(-logits)) > 0.5
        tp = np.logical_and(seg, gt).sum()
        fp = np.logical_and(seg, 1 - gt).sum()
        fn = np.logical_and(~seg, gt).sum()
        expected = 2 * tp / (2 * tp + fp + fn)
        got = float(M.dice_from_logits_batch(jnp.asarray(gt), jnp.asarray(logits)))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_batch_dice_empty_conventions(self):
        gt = jnp.zeros((2, 8, 8, 1))
        assert float(M.dice_from_logits_batch(gt, jnp.full((2, 8, 8, 1), -10.0))) == 1.0
        assert float(M.dice_from_logits_batch(gt, jnp.full((2, 8, 8, 1), 10.0))) == 0.0

    def test_confusion_matrix_acc_f1_vs_sklearn(self):
        rng = np.random.default_rng(1)
        gt = rng.integers(0, 3, 100)
        pred = rng.integers(0, 3, 100)
        cm = jnp.zeros((3, 3))
        cm = M.confusion_matrix_update(cm, jnp.asarray(gt), jnp.asarray(pred), 3)
        np.testing.assert_allclose(float(M.accuracy_from_cm(cm)),
                                   accuracy_score(gt, pred), rtol=1e-6)
        np.testing.assert_allclose(
            float(M.f1_weighted_from_cm(cm)),
            f1_score(gt, pred, labels=[0, 1, 2], average="weighted"), rtol=1e-6)

    def test_f1_weighted_handles_missing_class(self):
        gt = np.array([0, 0, 1, 1])
        pred = np.array([0, 0, 1, 1])
        cm = M.confusion_matrix_update(jnp.zeros((3, 3)), jnp.asarray(gt),
                                       jnp.asarray(pred), 3)
        np.testing.assert_allclose(
            float(M.f1_weighted_from_cm(cm)),
            f1_score(gt, pred, labels=[0, 1, 2], average="weighted"), rtol=1e-6)

    def test_predicted_labels(self):
        logits3 = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 0.1]])
        np.testing.assert_array_equal(
            np.asarray(M.predicted_labels_from_logits(logits3, 3)), [1, 0])
        logits_bin = jnp.asarray([[2.0], [-2.0]])
        np.testing.assert_array_equal(
            np.asarray(M.predicted_labels_from_logits(logits_bin, 2)), [1, 0])


class TestClassificationReports:
    def test_binary_metrics(self):
        gt = [0, 0, 1, 1, 1, 0]
        pred = [0, 1, 1, 1, 0, 0]
        m = M.binary_classification_metrics(gt, pred)
        assert abs(m["Accuracy"] - 4 / 6) < 1e-9

    def test_multiclass_metrics_keys(self):
        gt = [0, 1, 2, 0, 1, 2]
        pred = [0, 1, 1, 0, 2, 2]
        m = M.multiclass_classification_metrics(gt, pred)
        for key in ("precision_macro", "recall_weighted", "f1_micro",
                    "f1_class_0", "accuracy"):
            assert key in m


def test_binary_metrics_single_class_no_crash():
    """Single-class data yields a 1x1 confusion matrix without pinned labels;
    the 4-way unpack must still work (labels=[0,1] pinned — the reference
    crashes here, metrics.py:391-392; identical output otherwise)."""
    m = M.binary_classification_metrics([0, 0, 0], [0, 0, 0])
    assert m["Accuracy"] == 1.0
    assert np.isnan(m["Precision"]) or m["Precision"] == 0  # tp=fp=0
