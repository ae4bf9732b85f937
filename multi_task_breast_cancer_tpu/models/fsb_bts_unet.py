"""FSB BTS U-Net: BTS U-Net plus a full-resolution "no-pooling" parallel path
(npl1-4) bridged into decoder1, with 8-head deep supervision.

Capability twin of the reference ``src/models/segmentation/FSB_BTS_UNet.py:70-194``.
"""

from __future__ import annotations

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


class FSBBTSUNet(nn.Module):
    """Deep supervision returns the reference's 8-head order
    ``(out3, out2, npl1, npl2, npl3, npl4, input1, out1)`` (finest head last,
    matching ``FSB_BTS_UNet.py:190``); otherwise a single logits map."""

    regions: int = 1
    width: int = 24
    deep_supervision: bool = False

    name_str: str = "Full-Scale-Bridge BTS U-Net"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        w = [self.width * 2 ** i for i in range(4)]

        # Full-resolution no-pooling path
        npl1 = LevelBlock(w[0], w[0], name="npl1")(x)
        npl2 = LevelBlock(w[1] // 2, w[1], name="npl2")(npl1)
        npl3 = LevelBlock(w[2] // 2, w[2], name="npl3")(npl2)
        npl4 = LevelBlock(w[3] // 2, w[3], name="npl4")(npl3)

        # Encoder
        e1 = LevelBlock(w[0] // 2, w[0], name="encoder1")(x)
        e2 = LevelBlock(w[1] // 2, w[1], name="encoder2")(max_pool_2x2(e1))
        e3 = LevelBlock(w[2] // 2, w[2], name="encoder3")(max_pool_2x2(e2))
        e4 = LevelBlock(w[3] // 2, w[3], name="encoder4")(max_pool_2x2(e3))

        # Dual bottleneck
        bottleneck = LevelBlock(w[3], w[3], name="bottleneck")(e4)
        bottleneck2 = ConvInNormLeReLU(w[2], name="bottleneck2")(
            jnp.concatenate([e4, bottleneck], axis=-1))

        # Decoder; decoder1 additionally receives the full-res bridge npl4
        d3 = LevelBlock(w[2], w[1], name="decoder3")(
            jnp.concatenate([e3, upsample_nearest_2x(bottleneck2)], axis=-1))
        d2 = LevelBlock(w[1], w[0], name="decoder2")(
            jnp.concatenate([e2, upsample_nearest_2x(d3)], axis=-1))
        d1 = LevelBlock(w[0], w[0] // 2, name="decoder1")(
            jnp.concatenate([e1, upsample_nearest_2x(d2), npl4], axis=-1))

        output1 = conv1x1(self.regions, name="output1")(d1)
        if not self.deep_supervision:
            return output1

        input1 = conv1x1(self.regions, name="input1")(e1)
        out_npl1 = conv1x1(self.regions, name="out_npl1")(npl1)
        out_npl2 = conv1x1(self.regions, name="out_npl2")(npl2)
        out_npl3 = conv1x1(self.regions, name="out_npl3")(npl3)
        out_npl4 = conv1x1(self.regions, name="out_npl4")(npl4)
        out3 = DeconvHead(w[1], self.regions, 4, name="output3")(d3)
        out2 = DeconvHead(w[0], self.regions, 2, name="output2")(d2)
        return (out3, out2, out_npl1, out_npl2, out_npl3, out_npl4, input1, output1)
