"""Shared building blocks for the model zoo (Flax linen, NHWC).

TPU-first notes:
- All tensors are NHWC (channels-last) so XLA tiles convs onto the MXU without
  layout transposes.
- Instance norm + LeakyReLU after a conv is a pure elementwise+reduction chain
  that XLA fuses into the conv epilogue; an optional Pallas kernel
  (``ops.pallas_kernels.instance_norm_leaky_relu``) fuses the normalize+activate
  pass explicitly when enabled.

Semantics parity (not code translation) with the reference blocks:
- ``ConvInNormLeReLU`` / ``LevelBlock``: reference ``src/models/segmentation/BTS_UNet.py:19-61``
  (conv3x3 bias=False → InstanceNorm(affine=False) → LeakyReLU(0.01)).
- MONAI-equivalent ``TwoConv`` / ``Down`` / ``UpCat`` used by the UNet++ family:
  conv(bias=True) → InstanceNorm(affine=True) → LeakyReLU(0.1), deconv upsample
  (reference ``src/models/multitask/MTUNetPlusPlus.py:20-76`` which builds on
  ``monai.networks.nets.basic_unet``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# He-normal (Kaiming) init, matching the reference's
# ``nn.init.kaiming_normal_(w, nonlinearity='leaky_relu')`` (gain≈sqrt(2), fan_in)
# at e.g. ``src/models/segmentation/BTS_UNet.py:115-121``.
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

Dtype = Any


def conv3x3(features: int, *, stride: int = 1, use_bias: bool = False,
            dilation: int = 1, name: Optional[str] = None,
            dtype: Optional[Dtype] = None) -> nn.Conv:
    """3×3 conv, padding preserves spatial size (reference conv3x3, bias=False)."""
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=((dilation, dilation), (dilation, dilation)),
                   kernel_dilation=(dilation, dilation), use_bias=use_bias,
                   kernel_init=kaiming_normal, name=name, dtype=dtype)


def conv1x1(features: int, *, use_bias: bool = True, name: Optional[str] = None,
            dtype: Optional[Dtype] = None) -> nn.Conv:
    """1×1 conv (reference conv1x1, bias=True, zero-initialised bias)."""
    return nn.Conv(features, (1, 1), use_bias=use_bias,
                   kernel_init=kaiming_normal, name=name, dtype=dtype)


def _deconv_lowering() -> str:
    """How k==stride ConvTranspose lowers: ``xla`` (lax.conv_transpose) or
    ``d2s`` (one matmul + depth-to-space reshape; also ``d2s_up`` /
    ``d2s_heads`` to scope it). Read at trace time. Measured on v5e
    (PARITY.md round-5 changelog): d2s is ~11% SLOWER end-to-end — the
    explicit depth-to-space transpose materializes the full-res tensor that
    conv_transpose writes directly — so ``xla`` stays the default."""
    import os
    return os.environ.get("MTBC_DECONV", "xla")


def d2s_upsample(x: jnp.ndarray, w: jnp.ndarray, k: int) -> jnp.ndarray:
    """k× upsample ``conv_transpose(x, w, strides=k, VALID)`` computed as one
    matmul + depth-to-space.

    For kernel==stride the transposed conv has no tap overlap: each input
    pixel alone produces its k×k output block,
    ``y[n, k·i+a, k·j+b, o] = Σ_c x[n,i,j,c] · w[k-1-a, k-1-b, c, o]``
    (lax.conv_transpose flips spatial taps; verified bit-identical on CPU).
    The matmul form is MXU-native — (B·H·W, C) @ (C, k²·O) — instead of a
    conv over a zero-dilated input, and XLA fuses the depth-to-space
    transpose into the consumer. Same parameters, same function, same
    gradients (autodiff through reverse + dot)."""
    b, h, ww, c = x.shape
    o = w.shape[-1]
    wm = w[::-1, ::-1].transpose(2, 0, 1, 3).reshape(c, k * k * o)
    z = jnp.dot(x.reshape(-1, c), wm).reshape(b, h, ww, k, k, o)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, ww * k, o)


class DeconvD2S(nn.Module):
    """Drop-in ``nn.ConvTranspose(k, strides=k, VALID)`` twin computed via
    :func:`d2s_upsample`. Identical param tree ('kernel' (k,k,I,O) HWIO +
    'bias'), so checkpoints and the torch importer are lowering-agnostic."""

    features: int
    kernel: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, o = self.kernel, self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, x.shape[-1], o))
        b = self.param("bias", nn.initializers.zeros, (o,))
        x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=self.dtype)
        return d2s_upsample(x, w, k) + b


def deconv(features: int, kernel: int, *, name: Optional[str] = None,
           dtype: Optional[Dtype] = None):
    """ConvTranspose with kernel==stride (exact k× upsampling, no overlap).

    ``MTBC_DECONV=d2s`` switches the lowering to matmul+depth-to-space
    (:class:`DeconvD2S`) — same params, same math, different HLO."""
    if _deconv_lowering() in ("d2s", "d2s_up"):
        return DeconvD2S(features, kernel, name=name, dtype=dtype)
    return nn.ConvTranspose(features, (kernel, kernel), strides=(kernel, kernel),
                            padding="VALID", use_bias=True, name=name, dtype=dtype)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return nn.avg_pool(x, (k, k), strides=(k, k))


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) + Flatten: (B,H,W,C) → (B,C)."""
    return jnp.mean(x, axis=(1, 2))


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Deterministic 2× nearest-neighbour upsample (NHWC).

    The reference deliberately uses nearest (not bilinear) for reproducibility
    (``src/models/segmentation/BTS_UNet.py:96-98``); on TPU ``jnp.repeat`` along
    H and W lowers to cheap broadcasts.
    """
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalisation over spatial dims (NHWC).

    ``affine=False``/eps=1e-5 matches ``torch.nn.InstanceNorm2d`` defaults used
    by the custom zoo; ``affine=True`` matches the MONAI instance norm used by
    the UNet++ family. Batch-size independent, hence trivially data-parallel
    (no cross-device statistics).
    """

    affine: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # statistics in f32 even under bf16 mixed precision (variance of
        # bf16 sums loses too many bits over 128² pixels)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y


def _use_pallas_fused_norm() -> bool:
    """Opt-in fused Pallas InstanceNorm+LeakyReLU (MTBC_PALLAS=1, TPU only)."""
    import os
    if os.environ.get("MTBC_PALLAS", "0") != "1":
        return False
    return jax.default_backend() == "tpu"


class ConvInNormLeReLU(nn.Module):
    """conv3x3(bias=False) → InstanceNorm → LeakyReLU(0.01).

    Behavioural twin of the reference's ConvInNormLeReLU stack
    (``src/models/segmentation/BTS_UNet.py:19-39``). With ``MTBC_PALLAS=1`` the
    norm+activation epilogue runs as one fused Pallas VMEM pass
    (``ops.pallas_kernels.instance_norm_leaky_relu``).
    """

    features: int
    negative_slope: float = 0.01

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = conv3x3(self.features, name="conv")(x)
        if _use_pallas_fused_norm():
            from multi_task_breast_cancer_tpu.ops.pallas_kernels import (
                fits_vmem,
                instance_norm_leaky_relu,
            )
            b, h, w, c = x.shape
            # lane-dim padding makes narrow-channel planes VMEM-hungry; the
            # fused kernel only pays off on the deep, wide levels
            if fits_vmem(h * w, c):
                return instance_norm_leaky_relu(x, 1e-5, self.negative_slope)
        x = InstanceNorm(name="norm")(x)
        return nn.leaky_relu(x, self.negative_slope)


class LevelBlock(nn.Module):
    """Two stacked ConvInNormLeReLU blocks (reference LevelBlock)."""

    mid_features: int
    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvInNormLeReLU(self.mid_features, name="block1")(x)
        x = ConvInNormLeReLU(self.out_features, name="block2")(x)
        return x


class DeconvHead(nn.Module):
    """Deep-supervision head ``ConvTranspose(k=s, C→C) → conv1x1(C→R)``
    computed as ONE fused transposed conv.

    Both layers are linear, so their composition is a single deconv with
    kernel ``W_fused[h,w,i,r] = Σ_c Wd[h,w,i,c]·W1[c,r]`` and bias
    ``b_fused = W1ᵀ·bd + b1`` — same parameters, same function, same gradients
    (autodiff flows through the contraction), but the head writes an R-channel
    full-resolution map instead of a C-channel one (~C/R fewer HBM bytes on
    the fattest tensors of the network, forward and backward).

    Replaces the reference's two-module heads (e.g. ``nnUNet.py:107-118``).
    """

    mid_features: int  # C: the deconv's channel count
    regions: int
    kernel: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c, k, r = self.mid_features, self.kernel, self.regions
        wd = self.param("deconv_kernel", nn.initializers.lecun_normal(),
                        (k, k, c, c))
        bd = self.param("deconv_bias", nn.initializers.zeros, (c,))
        w1 = self.param("conv1x1_kernel", kaiming_normal, (1, 1, c, r))
        b1 = self.param("conv1x1_bias", nn.initializers.zeros, (r,))

        w1m = w1[0, 0]  # (c, r)
        fused_w = jnp.einsum("hwic,cr->hwir", wd, w1m)
        fused_b = jnp.einsum("c,cr->r", bd, w1m) + b1
        if _deconv_lowering() in ("d2s", "d2s_heads"):
            return d2s_upsample(x, fused_w.astype(x.dtype), k) \
                + fused_b.astype(x.dtype)
        y = jax.lax.conv_transpose(
            x, fused_w.astype(x.dtype), strides=(k, k), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + fused_b.astype(x.dtype)


class MLPHead(nn.Module):
    """Flatten → Linear(hidden) → ReLU → Linear(n_out) classifier head."""

    hidden: int
    n_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.n_out, name="fc2")(x)


# ---------------------------------------------------------------------------
# MONAI basic_unet-equivalent blocks (UNet++ family)
# ---------------------------------------------------------------------------


class MonaiConv(nn.Module):
    """conv3x3(bias=True) → InstanceNorm(affine=True) → [dropout] → LeakyReLU(0.1).

    Equivalent of one ``monai.networks.blocks.Convolution`` with adn ordering
    "NDA" as configured by the reference UNet++ family
    (``src/models/multitask/MTUNetPlusPlus.py:20-23``).
    """

    features: int
    dropout: float = 0.0
    negative_slope: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), use_bias=True,
                    kernel_init=kaiming_normal, name="conv")(x)
        x = InstanceNorm(affine=True, name="norm")(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.leaky_relu(x, self.negative_slope)


class TwoConv(nn.Module):
    """Two MonaiConv blocks (monai basic_unet TwoConv equivalent)."""

    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        x = MonaiConv(self.features, self.dropout, name="conv_0")(x, deterministic=deterministic)
        x = MonaiConv(self.features, self.dropout, name="conv_1")(x, deterministic=deterministic)
        return x


class Down(nn.Module):
    """MaxPool(2) → TwoConv (monai basic_unet Down equivalent)."""

    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        x = max_pool_2x2(x)
        return TwoConv(self.features, self.dropout, name="convs")(x, deterministic=deterministic)


class UpCat(nn.Module):
    """Deconv 2× upsample → concat skip → TwoConv (monai basic_unet UpCat, deconv mode).

    ``halves=True`` halves the channel count in the deconv (monai default).
    """

    in_features: int
    out_features: int
    halves: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, *,
                 deterministic: bool = True) -> jnp.ndarray:
        up_features = self.in_features // 2 if self.halves else self.in_features
        x = deconv(up_features, 2, name="upsample")(x)
        x = jnp.concatenate([skip, x], axis=-1)
        return TwoConv(self.out_features, self.dropout, name="convs")(x, deterministic=deterministic)
