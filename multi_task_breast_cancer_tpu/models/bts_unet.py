"""BTS U-Net: 4-level U-Net with instance norm + LeakyReLU, dual bottleneck,
nearest upsampling and optional 3-head deep supervision.

Capability twin of the reference ``src/models/segmentation/BTS_UNet.py:64-155``
(architecture re-expressed NHWC/functional; not a code translation).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from multi_task_breast_cancer_tpu.models.blocks import (
    ConvInNormLeReLU,
    DeconvHead,
    LevelBlock,
    conv1x1,
    max_pool_2x2,
    upsample_nearest_2x,
)


class BTSUNet(nn.Module):
    """Input (B,H,W,sequences) → seg logits (B,H,W,regions) or a coarse→fine
    deep-supervision tuple ``(out3, out2, out1)`` all at full resolution."""

    regions: int = 1
    width: int = 24
    deep_supervision: bool = False

    name_str: str = "BTS U-Net"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        w = [self.width * 2 ** i for i in range(4)]

        # Encoder
        e1 = LevelBlock(w[0] // 2, w[0], name="encoder1")(x)
        e2 = LevelBlock(w[1] // 2, w[1], name="encoder2")(max_pool_2x2(e1))
        e3 = LevelBlock(w[2] // 2, w[2], name="encoder3")(max_pool_2x2(e2))
        e4 = LevelBlock(w[3] // 2, w[3], name="encoder4")(max_pool_2x2(e3))

        # Dual bottleneck (no pooling before it: operates at 1/8 resolution)
        bottleneck = LevelBlock(w[3], w[3], name="bottleneck")(e4)
        bottleneck2 = ConvInNormLeReLU(w[2], name="bottleneck2")(
            jnp.concatenate([e4, bottleneck], axis=-1))

        # Decoder with nearest upsampling + skip concats
        d3 = LevelBlock(w[2], w[1], name="decoder3")(
            jnp.concatenate([e3, upsample_nearest_2x(bottleneck2)], axis=-1))
        d2 = LevelBlock(w[1], w[0], name="decoder2")(
            jnp.concatenate([e2, upsample_nearest_2x(d3)], axis=-1))
        d1 = LevelBlock(w[0], w[0] // 2, name="decoder1")(
            jnp.concatenate([e1, upsample_nearest_2x(d2)], axis=-1))

        output1 = conv1x1(self.regions, name="output1")(d1)
        if not self.deep_supervision:
            return output1

        out3 = DeconvHead(w[1], self.regions, 4, name="output3")(d3)
        out2 = DeconvHead(w[0], self.regions, 2, name="output2")(d2)
        return (out3, out2, output1)
