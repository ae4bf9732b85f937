"""Fused-dice custom-VJP tests: value and gradient parity vs the autodiff
reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_task_breast_cancer_tpu.ops.fused_loss import fused_dice_criterion, fused_dice_loss
from multi_task_breast_cancer_tpu.ops.losses import dice_loss


def _data(shape=(3, 16, 16, 1), seed=0):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=shape), jnp.float32)
    target = jnp.asarray((rng.random(shape) > 0.5), jnp.float32)
    return logits, target


@pytest.mark.parametrize("squared_pred", [True, False])
def test_value_parity(squared_pred):
    logits, target = _data()
    fused = fused_dice_loss(logits, target, 1.0, 1.0, squared_pred)
    ref = dice_loss(logits, target, smooth_nr=1.0, smooth_dr=1.0,
                    squared_pred=squared_pred)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-6)


@pytest.mark.parametrize("squared_pred", [True, False])
def test_gradient_parity_vs_autodiff(squared_pred):
    logits, target = _data(seed=1)
    g_fused = jax.grad(lambda x: fused_dice_loss(x, target, 1.0, 1.0,
                                                 squared_pred))(logits)
    g_ref = jax.grad(lambda x: dice_loss(x, target, smooth_nr=1.0, smooth_dr=1.0,
                                         squared_pred=squared_pred))(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-5)


def test_gradient_parity_multichannel_smoothing():
    logits, target = _data(shape=(2, 8, 8, 3), seed=2)
    g_fused = jax.grad(lambda x: fused_dice_loss(x, target, 1e-5, 1e-5, True))(logits)
    g_ref = jax.grad(lambda x: dice_loss(x, target, smooth_nr=1e-5, smooth_dr=1e-5,
                                         squared_pred=True))(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-5)


def test_criterion_under_jit_in_multitask_combo():
    """α·dice + (1-α)·focal composite grad matches the unfused composite."""
    from multi_task_breast_cancer_tpu.ops.losses import focal_loss

    logits, target = _data(seed=3)
    cls_logits = jnp.asarray(np.random.default_rng(4).normal(size=(3, 3)), jnp.float32)
    onehot = jnp.eye(3)[jnp.asarray([0, 1, 2])]

    def total_fused(seg, cls):
        return 0.35 * fused_dice_criterion(seg, target) + 0.65 * focal_loss(cls, onehot)

    def total_ref(seg, cls):
        return 0.35 * dice_loss(seg, target) + 0.65 * focal_loss(cls, onehot)

    g1 = jax.jit(jax.grad(total_fused, argnums=(0, 1)))(logits, cls_logits)
    g2 = jax.jit(jax.grad(total_ref, argnums=(0, 1)))(logits, cls_logits)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("squared_pred", [True, False])
def test_target_gradient_parity_vs_autodiff(squared_pred):
    """The custom VJP must return the TRUE target cotangent (not zeros):
    soft/learnable targets (distillation, label smoothing) would otherwise
    train silently wrong."""
    logits, target = _data(seed=3)
    target = target * 0.7 + 0.1  # soft targets — gradient is nonzero
    g_fused = jax.grad(lambda t: fused_dice_loss(logits, t, 1.0, 1.0,
                                                 squared_pred))(target)
    g_ref = jax.grad(lambda t: dice_loss(logits, t, smooth_nr=1.0,
                                         smooth_dr=1.0,
                                         squared_pred=squared_pred))(target)
    assert float(jnp.abs(g_ref).max()) > 0
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-5)
