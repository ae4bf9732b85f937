"""Native equivalents of the MONAI networks the reference factory exposes:
``UNet``, ``AttentionUnet``, ``SegResNet`` (``src/utils/experiment_init.py:53-67``).

These are TPU-first re-implementations of the architecture *families* (layer
topology, norm/act choices), not line-level ports of MONAI.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multi_task_breast_cancer_tpu.models.blocks import (
    InstanceNorm,
    kaiming_normal,
    max_pool_2x2,
    upsample_nearest_2x,
)


class PReLU(nn.Module):
    """Channel-shared PReLU (MONAI/torch default: one learnable slope)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, alpha * x)


class _ConvINPrelu(nn.Module):
    """MONAI ``Convolution`` equivalent: conv → InstanceNorm → PReLU."""

    features: int
    stride: int = 1
    transposed: bool = False
    conv_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.transposed:
            # kernel 3, stride 2, padding 1, output_padding 1 ⇒ exact 2× upsample
            x = nn.ConvTranspose(self.features, (3, 3), strides=(self.stride, self.stride),
                                 padding="SAME", name="conv")(x)
        else:
            x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                        padding="SAME", kernel_init=kaiming_normal, name="conv")(x)
        if self.conv_only:
            return x
        x = InstanceNorm(name="norm")(x)
        return PReLU(name="act")(x)


class UNet(nn.Module):
    """MONAI ``UNet`` equivalent with ``num_res_units=0``: recursive
    encoder/decoder, strided convs down, transposed convs up, cat skips.
    Factory call: channels=(w,2w,4w,8w), strides=(2,2,2)."""

    regions: int = 1
    channels: Sequence[int] = (48, 96, 192, 384)

    name_str: str = "UNet"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        c = tuple(self.channels)

        d1 = _ConvINPrelu(c[0], 2, name="down1")(x)
        d2 = _ConvINPrelu(c[1], 2, name="down2")(d1)
        d3 = _ConvINPrelu(c[2], 2, name="down3")(d2)
        bottom = _ConvINPrelu(c[3], 1, name="bottom")(d3)

        u3 = _ConvINPrelu(c[1], 2, transposed=True, name="up3")(
            jnp.concatenate([d3, bottom], axis=-1))
        u2 = _ConvINPrelu(c[0], 2, transposed=True, name="up2")(
            jnp.concatenate([d2, u3], axis=-1))
        out = _ConvINPrelu(self.regions, 2, transposed=True, conv_only=True, name="up1")(
            jnp.concatenate([d1, u2], axis=-1))
        return out


class _AttnGate(nn.Module):
    """Additive attention gate (Oktay et al.): psi = σ(ψ(ReLU(Wg·g + Wx·x)))."""

    inter: int

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        wg = nn.Conv(self.inter, (1, 1), use_bias=True, name="Wg")(g)
        wx = nn.Conv(self.inter, (1, 1), use_bias=True, name="Wx")(x)
        psi = nn.relu(wg + wx)
        psi = nn.sigmoid(nn.Conv(1, (1, 1), use_bias=True, name="psi")(psi))
        return x * psi


class _ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), use_bias=True,
                        kernel_init=kaiming_normal, name=f"conv{i}")(x)
            x = InstanceNorm(name=f"norm{i}")(x)
            x = nn.relu(x)
        return x


class AttentionUNet(nn.Module):
    """MONAI ``AttentionUnet`` equivalent: U-Net with attention-gated skips.
    Factory call: channels=(w,2w,4w,8w), strides=(2,2,2)."""

    regions: int = 1
    channels: Sequence[int] = (48, 96, 192, 384)

    name_str: str = "Attention U-Net"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        c = tuple(self.channels)

        e1 = _ConvBlock(c[0], name="enc1")(x)
        e2 = _ConvBlock(c[1], name="enc2")(max_pool_2x2(e1))
        e3 = _ConvBlock(c[2], name="enc3")(max_pool_2x2(e2))
        e4 = _ConvBlock(c[3], name="enc4")(max_pool_2x2(e3))

        u3 = nn.ConvTranspose(c[2], (2, 2), strides=(2, 2), name="up3")(e4)
        a3 = _AttnGate(c[2] // 2, name="att3")(u3, e3)
        d3 = _ConvBlock(c[2], name="dec3")(jnp.concatenate([a3, u3], axis=-1))

        u2 = nn.ConvTranspose(c[1], (2, 2), strides=(2, 2), name="up2")(d3)
        a2 = _AttnGate(c[1] // 2, name="att2")(u2, e2)
        d2 = _ConvBlock(c[1], name="dec2")(jnp.concatenate([a2, u2], axis=-1))

        u1 = nn.ConvTranspose(c[0], (2, 2), strides=(2, 2), name="up1")(d2)
        a1 = _AttnGate(max(c[0] // 2, 1), name="att1")(u1, e1)
        d1 = _ConvBlock(c[0], name="dec1")(jnp.concatenate([a1, u1], axis=-1))

        return nn.Conv(self.regions, (1, 1), kernel_init=kaiming_normal,
                       name="final")(d1)


class _GNRelu(nn.Module):
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = min(self.groups, x.shape[-1])
        return nn.relu(nn.GroupNorm(num_groups=g, name="gn")(x))


class _SegResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = _GNRelu(name="pre0")(x)
        y = nn.Conv(self.features, (3, 3), use_bias=True, kernel_init=kaiming_normal,
                    name="conv0")(y)
        y = _GNRelu(name="pre1")(y)
        y = nn.Conv(self.features, (3, 3), use_bias=True, kernel_init=kaiming_normal,
                    name="conv1")(y)
        return x + y


class SegResNet(nn.Module):
    """MONAI ``SegResNet`` equivalent: GroupNorm residual stages (1,2,2,4 blocks),
    strided-conv downsampling, conv1x1 + nearest-upsample decoder."""

    regions: int = 1
    init_filters: int = 8

    name_str: str = "SegResNet"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        f = self.init_filters
        blocks_down = (1, 2, 2, 4)

        x = nn.Conv(f, (3, 3), use_bias=True, kernel_init=kaiming_normal,
                    name="stem")(x)
        skips = []
        for i, n_blocks in enumerate(blocks_down):
            feats = f * 2 ** i
            if i > 0:
                x = nn.Conv(feats, (3, 3), strides=(2, 2), use_bias=True,
                            kernel_init=kaiming_normal, name=f"down{i}")(x)
            for b in range(n_blocks):
                x = _SegResBlock(feats, name=f"stage{i}_block{b}")(x)
            skips.append(x)

        for i in range(len(blocks_down) - 2, -1, -1):
            feats = f * 2 ** i
            x = nn.Conv(feats, (1, 1), use_bias=True, name=f"up_conv{i}")(x)
            x = upsample_nearest_2x(x)
            x = x + skips[i]
            x = _SegResBlock(feats, name=f"up_block{i}")(x)

        x = _GNRelu(name="final_norm")(x)
        return nn.Conv(self.regions, (1, 1), use_bias=True, name="final")(x)
