"""DeconvHead fusion equivalence: the fused single-deconv head must produce
bit-close outputs AND gradients to the unfused ConvTranspose→conv1x1 pair when
given identical parameters."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multi_task_breast_cancer_tpu.models.blocks import DeconvHead, conv1x1, deconv


class UnfusedHead(nn.Module):
    mid_features: int
    regions: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        x = deconv(self.mid_features, self.kernel, name="up")(x)
        return conv1x1(self.regions, name="head")(x)


def _match_params(fused_params, unfused_params):
    """Copy unfused params into the fused layout."""
    return {
        "deconv_kernel": unfused_params["up"]["kernel"],
        "deconv_bias": unfused_params["up"]["bias"],
        "conv1x1_kernel": unfused_params["head"]["kernel"],
        "conv1x1_bias": unfused_params["head"]["bias"],
    }


def test_forward_equivalence():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    unfused = UnfusedHead(8, 1, 4)
    uv = unfused.init(jax.random.PRNGKey(0), x)
    fused = DeconvHead(8, 1, 4)
    fv = {"params": _match_params(None, uv["params"])}
    y_u = unfused.apply(uv, x)
    y_f = fused.apply(fv, x)
    assert y_f.shape == (2, 64, 64, 1)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u), atol=1e-5)


def test_gradient_equivalence():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    unfused = UnfusedHead(4, 1, 2)
    uv = unfused.init(jax.random.PRNGKey(0), x)
    fused = DeconvHead(4, 1, 2)
    fp = _match_params(None, uv["params"])

    def loss_u(p):
        return jnp.sum(jnp.square(unfused.apply({"params": p}, x)))

    def loss_f(p):
        return jnp.sum(jnp.square(fused.apply({"params": p}, x)))

    gu = jax.grad(loss_u)(uv["params"])
    gf = jax.grad(loss_f)(fp)
    np.testing.assert_allclose(np.asarray(gf["deconv_kernel"]),
                               np.asarray(gu["up"]["kernel"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf["deconv_bias"]),
                               np.asarray(gu["up"]["bias"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf["conv1x1_kernel"]),
                               np.asarray(gu["head"]["kernel"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf["conv1x1_bias"]),
                               np.asarray(gu["head"]["bias"]), atol=1e-4)
