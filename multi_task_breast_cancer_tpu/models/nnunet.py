"""nnU-Net 2021: 5-level U-Net, widths [32,64,128,256,320], deconv upsampling,
always-on 4-head deep supervision.

Capability twin of the reference ``src/models/segmentation/nnUNet.py:64-168``.
The shared encoder/decoder is factored out (``NNUNetBackbone``) so the
classifier and multitask variants reuse it, replacing the reference's three
copy-pasted model files.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from multi_task_breast_cancer_tpu.models.blocks import (
    DeconvHead,
    LevelBlock,
    conv1x1,
    deconv,
    max_pool_2x2,
)

NNUNET_WIDTHS = (32, 64, 128, 256, 320)


class NNUNetBackbone(nn.Module):
    """Encoder + bottleneck + full decoder. Returns all intermediate tensors
    needed by the seg heads and the multitask classification head.

    ``widths`` defaults to the reference constant; narrow overrides exist for
    CPU-scale learnability tests (the architecture is width-invariant)."""

    widths: Tuple[int, ...] = NNUNET_WIDTHS

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        w = self.widths

        e1 = LevelBlock(w[0], w[0], name="encoder1")(x)
        e2 = LevelBlock(w[1], w[1], name="encoder2")(max_pool_2x2(e1))
        e3 = LevelBlock(w[2], w[2], name="encoder3")(max_pool_2x2(e2))
        e4 = LevelBlock(w[3], w[3], name="encoder4")(max_pool_2x2(e3))
        e5 = LevelBlock(w[4], w[4], name="encoder5")(max_pool_2x2(e4))
        p5 = max_pool_2x2(e5)

        bottleneck = LevelBlock(w[4], w[4], name="bottleneck")(p5)

        up5_layer = deconv(w[4], 2, name="upsample5")
        up5 = up5_layer(bottleneck)
        d5 = LevelBlock(w[3], w[3], name="decoder5")(jnp.concatenate([e5, up5], axis=-1))
        d4 = LevelBlock(w[2], w[2], name="decoder4")(
            jnp.concatenate([e4, deconv(w[3], 2, name="upsample4")(d5)], axis=-1))
        d3 = LevelBlock(w[1], w[1], name="decoder3")(
            jnp.concatenate([e3, deconv(w[2], 2, name="upsample3")(d4)], axis=-1))
        d2 = LevelBlock(w[0], w[0], name="decoder2")(
            jnp.concatenate([e2, deconv(w[1], 2, name="upsample2")(d3)], axis=-1))
        d1 = LevelBlock(w[0], w[0] // 2, name="decoder1")(
            jnp.concatenate([e1, deconv(w[0], 2, name="upsample1")(d2)], axis=-1))

        return {"e5": e5, "bottleneck": bottleneck, "up5": up5,
                "d5": d5, "d4": d4, "d3": d3, "d2": d2, "d1": d1}


class SegHeads(nn.Module):
    """The 4 deep-supervision heads (coarse→fine), each restoring full res."""

    regions: int = 1
    widths: Tuple[int, ...] = NNUNET_WIDTHS

    @nn.compact
    def __call__(self, feats) -> Tuple[jnp.ndarray, ...]:
        w = self.widths
        out4 = DeconvHead(w[2], self.regions, 8, name="output4")(feats["d4"])
        out3 = DeconvHead(w[1], self.regions, 4, name="output3")(feats["d3"])
        out2 = DeconvHead(w[0], self.regions, 2, name="output2")(feats["d2"])
        out1 = conv1x1(self.regions, name="output1")(feats["d1"])
        return (out4, out3, out2, out1)


class NNUNet2021(nn.Module):
    """Segmentation nnU-Net. Always returns the 4-head coarse→fine tuple
    (reference ``nnUNet.py:162-168`` always deep-supervises)."""

    regions: int = 1
    widths: Tuple[int, ...] = NNUNET_WIDTHS

    name_str: str = "nn-UNet2021"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        feats = NNUNetBackbone(self.widths, name="backbone")(x)
        return SegHeads(self.regions, self.widths, name="heads")(feats)
