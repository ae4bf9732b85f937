"""Pallas kernel parity tests (interpret mode on CPU): fused
InstanceNorm+LeakyReLU forward and custom-VJP backward vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.ops.pallas_kernels import (
    instance_norm_leaky_relu,
    instance_norm_leaky_relu_reference,
)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


def test_forward_parity():
    x = _rand((2, 16, 16, 8))
    got = instance_norm_leaky_relu(x, 1e-5, 0.01, True)
    ref = instance_norm_leaky_relu_reference(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_backward_parity():
    x = _rand((2, 8, 8, 4), seed=1)

    def f_pallas(x):
        return jnp.sum(jnp.square(instance_norm_leaky_relu(x, 1e-5, 0.01, True)))

    def f_ref(x):
        return jnp.sum(jnp.square(instance_norm_leaky_relu_reference(x)))

    g_pallas = jax.grad(f_pallas)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_negative_slope_applied():
    x = _rand((1, 8, 8, 2), seed=2)
    y = np.asarray(instance_norm_leaky_relu(x, 1e-5, 0.2, True))
    ref = np.asarray(instance_norm_leaky_relu_reference(x, slope=0.2))
    np.testing.assert_allclose(y, ref, atol=1e-5)
    assert (y < 0).any()  # negative branch exercised


def test_under_jit_and_vmap_composition():
    x = _rand((4, 8, 8, 4), seed=3)

    @jax.jit
    def f(x):
        return instance_norm_leaky_relu(x, 1e-5, 0.01, True)

    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(instance_norm_leaky_relu_reference(x)),
        atol=1e-5)
