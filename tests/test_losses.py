"""Loss-function parity tests: cross-checked against independent torch
implementations of the published formulas (MONAI DiceLoss semantics from its
documented equation; the custom focal loss formula from criterions.py:14-24),
plus hand-computed golden values and the deep-supervision weighting rules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from multi_task_breast_cancer_tpu.ops import losses as L


def _rand_logits_target(shape, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=shape).astype(np.float32)
    target = (rng.random(shape) > 0.5).astype(np.float32)
    return logits, target


class TestDiceLoss:
    def test_monai_semantics_manual(self):
        """DiceLoss(sigmoid, smooth=1/1, squared_pred) against a direct numpy
        transcription of the MONAI formula."""
        logits, target = _rand_logits_target((2, 8, 8, 1))
        p = 1 / (1 + np.exp(-logits))
        inter = (p * target).sum(axis=(1, 2))
        denom = (p ** 2).sum(axis=(1, 2)) + (target ** 2).sum(axis=(1, 2))
        expected = np.mean(1 - (2 * inter + 1) / (denom + 1))
        got = L.dice_loss(jnp.asarray(logits), jnp.asarray(target))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_perfect_prediction_low_loss(self):
        target = np.zeros((1, 16, 16, 1), np.float32)
        target[0, 4:10, 4:10, 0] = 1
        logits = np.where(target > 0, 20.0, -20.0).astype(np.float32)
        loss = L.dice_loss(jnp.asarray(logits), jnp.asarray(target))
        assert float(loss) < 0.01

    def test_empty_gt_smoothing(self):
        """With smooth_nr=smooth_dr=1, empty GT + empty pred gives ~0 loss."""
        target = np.zeros((1, 8, 8, 1), np.float32)
        logits = np.full((1, 8, 8, 1), -20.0, np.float32)
        loss = L.dice_loss(jnp.asarray(logits), jnp.asarray(target))
        assert float(loss) < 1e-5

    def test_jaccard_reduction_sum(self):
        logits, target = _rand_logits_target((3, 8, 8, 1), seed=1)
        p = 1 / (1 + np.exp(-logits))
        inter = (p * target).sum(axis=(1, 2))
        denom = p.sum(axis=(1, 2)) + target.sum(axis=(1, 2))
        denom = 2 * (denom - inter)
        expected = np.sum(1 - (2 * inter + 1e-5) / (denom + 1e-5))
        got = L.dice_loss(jnp.asarray(logits), jnp.asarray(target), smooth_nr=1e-5,
                          smooth_dr=1e-5, squared_pred=False, jaccard=True,
                          reduction="sum")
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestClassificationLosses:
    def test_bce_matches_torch(self):
        logits, target = _rand_logits_target((8, 1), seed=2)
        expected = F.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(target)).item()
        got = float(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(target)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_ce_prob_targets_matches_torch(self):
        rng = np.random.default_rng(3)
        logits = rng.normal(size=(8, 3)).astype(np.float32)
        labels = rng.integers(0, 3, 8)
        onehot = np.eye(3, dtype=np.float32)[labels]
        expected = F.cross_entropy(torch.tensor(logits), torch.tensor(onehot)).item()
        got = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(onehot)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_focal_matches_reference_formula_torch(self):
        """criterions.py:14-24: ce → pt=exp(-ce) → mean(α(1-pt)^γ ce)."""
        rng = np.random.default_rng(4)
        logits = rng.normal(size=(8, 3)).astype(np.float32)
        labels = rng.integers(0, 3, 8)
        onehot = np.eye(3, dtype=np.float32)[labels]
        ce = F.cross_entropy(torch.tensor(logits), torch.tensor(onehot),
                             reduction="none")
        pt = torch.exp(-ce)
        expected = torch.mean(1.0 * (1 - pt) ** 2 * ce).item()
        got = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(onehot)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_weighted_ce_matches_torch(self):
        rng = np.random.default_rng(5)
        logits = rng.normal(size=(6, 3)).astype(np.float32)
        labels = rng.integers(0, 3, 6)
        onehot = np.eye(3, dtype=np.float32)[labels]
        w = np.array([0.5, 0.3, 0.2], np.float32)
        expected = F.cross_entropy(torch.tensor(logits), torch.tensor(onehot),
                                   weight=torch.tensor(w)).item()
        got = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(onehot),
                                         weight=jnp.asarray(w)))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_inverse_frequency_weights(self):
        w = L.inverse_frequency_weights([64, 222, 164])
        expected = (1 / np.array([64.0, 222.0, 164.0]))
        expected = expected / expected.sum()
        np.testing.assert_allclose(np.asarray(w), expected, rtol=1e-6)


class TestDeepSupervision:
    def test_inverse_weighting_order(self):
        """Finest head (last in tuple) must get weight 1, coarsest 1/n
        (criterions.py:33-41: reversed order, /(j+1))."""
        def criterion(s, g):
            return jnp.mean(s)  # loss == head's constant value

        gt = jnp.zeros((1, 4, 4, 1))
        heads = tuple(jnp.full((1, 4, 4, 1), v) for v in (3.0, 2.0, 1.0))  # coarse→fine
        loss = L.apply_criterion_binary_segmentation(criterion, gt, heads,
                                                     inversely_weighted=True)
        # reversed: (1.0, 2.0, 3.0) / (1, 2, 3) = 1 + 1 + 1
        np.testing.assert_allclose(float(loss), 3.0, rtol=1e-6)

    def test_unweighted_sum(self):
        def criterion(s, g):
            return jnp.mean(s)

        gt = jnp.zeros((1, 4, 4, 1))
        heads = tuple(jnp.full((1, 4, 4, 1), v) for v in (3.0, 2.0, 1.0))
        loss = L.apply_criterion_binary_segmentation(criterion, gt, heads)
        np.testing.assert_allclose(float(loss), 6.0, rtol=1e-6)

    def test_single_head_passthrough(self):
        def criterion(s, g):
            return jnp.mean(s)

        loss = L.apply_criterion_binary_segmentation(
            criterion, jnp.zeros((1, 4, 4, 1)), jnp.full((1, 4, 4, 1), 5.0),
            inversely_weighted=True)
        np.testing.assert_allclose(float(loss), 5.0)

    def test_multitask_returns_pair_and_cls_never_inverse_weighted(self):
        def seg_criterion(s, g):
            return jnp.mean(s)

        def cls_criterion(c, l):
            return jnp.mean(c)

        gt = jnp.zeros((1, 4, 4, 1))
        label = jnp.zeros((1, 3))
        seg_heads = (jnp.full((1, 4, 4, 1), 2.0), jnp.full((1, 4, 4, 1), 1.0))
        cls_heads = (jnp.full((1, 3), 4.0),)
        seg_loss, cls_loss = L.apply_criterion_multitask(
            seg_criterion, gt, seg_heads, cls_criterion, label, cls_heads,
            inversely_weighted=True)
        np.testing.assert_allclose(float(seg_loss), 1.0 + 2.0 / 2)
        np.testing.assert_allclose(float(cls_loss), 4.0)  # no /(n+1) on cls


class TestFactories:
    @pytest.mark.parametrize("name", list(L.SEG_CRITERIA))
    def test_all_seg_criteria_run(self, name):
        logits, target = _rand_logits_target((2, 16, 16, 1), seed=6)
        crit = L.init_criterion_segmentation(name)
        loss = jax.jit(crit)(jnp.asarray(logits), jnp.asarray(target))
        assert np.isfinite(float(loss))

    def test_binary_cls_criterion_is_bce(self):
        crit = L.init_criterion_classification(n_classes=2)
        assert crit is L.bce_with_logits

    def test_nan_guard(self):
        with pytest.raises(FloatingPointError):
            L.check_finite_loss(float("nan"))
        L.check_finite_loss(1.0)


class TestGeneralizedDiceEmptyMask:
    """MONAI inf-weight semantics: infs are zeroed FIRST, then maxed — a
    sample whose every class is empty (a 'normal' BUSI image with an all-zero
    mask) gets weight 0 and a finite ~0 loss, never NaN."""

    def test_all_empty_sample_finite(self):
        import jax.numpy as jnp

        from multi_task_breast_cancer_tpu.ops.losses import generalized_dice_loss
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(3, 8, 8, 1)).astype(np.float32))
        target = (rng.random((3, 8, 8, 1)) > 0.6).astype(np.float32)
        target[1] = 0.0  # one sample entirely tumor-free
        loss = generalized_dice_loss(logits, jnp.asarray(target))
        assert np.isfinite(float(loss)), "empty-mask sample must not NaN"
        # the empty sample contributes ~0 (numer=smooth_nr, denom=smooth_dr)
        per_kept = generalized_dice_loss(
            logits[np.array([0, 2])], jnp.asarray(target[np.array([0, 2])]))
        np.testing.assert_allclose(float(loss), float(per_kept) * 2 / 3,
                                   rtol=1e-4)

    def test_all_empty_batch_finite_and_grad(self):
        import jax
        import jax.numpy as jnp

        from multi_task_breast_cancer_tpu.ops.losses import generalized_dice_loss
        logits = jnp.zeros((2, 8, 8, 1), jnp.float32)
        target = jnp.zeros((2, 8, 8, 1), jnp.float32)
        loss = generalized_dice_loss(logits, target)
        assert np.isfinite(float(loss))
        g = jax.grad(lambda x: generalized_dice_loss(x, target))(logits)
        assert np.isfinite(np.asarray(g)).all()
