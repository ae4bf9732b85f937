"""UNet++ family (MONAI basic_unet-equivalent blocks): segmentation
BasicUNetPlusPlus, UNetPlusPlusClassifier, and the flagship multitask
MTUNetPlusPlus with a shared nested encoder.

Capability twins of:
- MONAI ``BasicUnetPlusPlus`` as used by the reference seg factory
  (``src/utils/experiment_init.py:61-63``),
- ``src/models/classification/UnetPlusPlus_Classifier.py:21-154``,
- ``src/models/multitask/MTUNetPlusPlus.py:11-136``.

Reference quirk preserved: the classification head applies the *same*
``process_level_3`` Down block to both ``x_3_0`` and ``x_3_1``
(``MTUNetPlusPlus.py:128``, ``UnetPlusPlus_Classifier.py:147``) — shared weights
on two different tensors.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multi_task_breast_cancer_tpu.models.blocks import (
    Down,
    TwoConv,
    UpCat,
    conv1x1,
    global_avg_pool,
)

# Reference MT/classifier feature widths (MTUNetPlusPlus.py:18) and the MONAI
# defaults used by the plain segmentation factory.
MT_FEATURES = (24, 48, 96, 192, 384, 24)
MONAI_DEFAULT_FEATURES = (32, 32, 64, 128, 256, 32)


class UNetPlusPlusNest(nn.Module):
    """Full nested UNet++ topology; returns every x_i_j needed downstream."""

    features: Sequence[int] = MT_FEATURES
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        fea = tuple(self.features)
        det = deterministic

        x_0_0 = TwoConv(fea[0], self.dropout, name="conv_0_0")(x, deterministic=det)
        x_1_0 = Down(fea[1], self.dropout, name="conv_1_0")(x_0_0, deterministic=det)
        x_0_1 = UpCat(fea[1], fea[0], halves=False, dropout=self.dropout, name="upcat_0_1")(x_1_0, x_0_0, deterministic=det)

        x_2_0 = Down(fea[2], self.dropout, name="conv_2_0")(x_1_0, deterministic=det)
        x_1_1 = UpCat(fea[2], fea[1], dropout=self.dropout, name="upcat_1_1")(x_2_0, x_1_0, deterministic=det)
        x_0_2 = UpCat(fea[1], fea[0], halves=False, dropout=self.dropout, name="upcat_0_2")(
            x_1_1, jnp.concatenate([x_0_0, x_0_1], axis=-1), deterministic=det)

        x_3_0 = Down(fea[3], self.dropout, name="conv_3_0")(x_2_0, deterministic=det)
        x_2_1 = UpCat(fea[3], fea[2], dropout=self.dropout, name="upcat_2_1")(x_3_0, x_2_0, deterministic=det)
        x_1_2 = UpCat(fea[2], fea[1], dropout=self.dropout, name="upcat_1_2")(
            x_2_1, jnp.concatenate([x_1_0, x_1_1], axis=-1), deterministic=det)
        x_0_3 = UpCat(fea[1], fea[0], halves=False, dropout=self.dropout, name="upcat_0_3")(
            x_1_2, jnp.concatenate([x_0_0, x_0_1, x_0_2], axis=-1), deterministic=det)

        x_4_0 = Down(fea[4], self.dropout, name="conv_4_0")(x_3_0, deterministic=det)
        x_3_1 = UpCat(fea[4], fea[3], dropout=self.dropout, name="upcat_3_1")(x_4_0, x_3_0, deterministic=det)
        x_2_2 = UpCat(fea[3], fea[2], dropout=self.dropout, name="upcat_2_2")(
            x_3_1, jnp.concatenate([x_2_0, x_2_1], axis=-1), deterministic=det)
        x_1_3 = UpCat(fea[2], fea[1], dropout=self.dropout, name="upcat_1_3")(
            x_2_2, jnp.concatenate([x_1_0, x_1_1, x_1_2], axis=-1), deterministic=det)
        x_0_4 = UpCat(fea[1], fea[5], halves=False, dropout=self.dropout, name="upcat_0_4")(
            x_1_3, jnp.concatenate([x_0_0, x_0_1, x_0_2, x_0_3], axis=-1), deterministic=det)

        return {"x_0_1": x_0_1, "x_0_2": x_0_2, "x_0_3": x_0_3, "x_0_4": x_0_4,
                "x_3_0": x_3_0, "x_3_1": x_3_1, "x_4_0": x_4_0}


class UNetPlusPlusClsHead(nn.Module):
    """Shared-weight Down over x_3_0 and x_3_1, concat with x_4_0, then
    TwoConv(512) → GAP → MLP(256 → n_out)."""

    features: Sequence[int] = MT_FEATURES
    n_out: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x_3_0, x_4_0, x_3_1, *, deterministic: bool = True) -> jnp.ndarray:
        fea = tuple(self.features)
        process_level_3 = Down(fea[4], self.dropout, name="process_level_3")
        feats = jnp.concatenate(
            [process_level_3(x_3_0, deterministic=deterministic),
             x_4_0,
             process_level_3(x_3_1, deterministic=deterministic)], axis=-1)
        feats = TwoConv(512, self.dropout, name="cls_convs")(feats, deterministic=deterministic)
        feats = global_avg_pool(feats)
        feats = nn.Dense(256, name="fc1")(feats)
        feats = nn.relu(feats)
        return nn.Dense(self.n_out, name="fc2")(feats)


class BasicUNetPlusPlus(nn.Module):
    """Segmentation UNet++; deep supervision → 4-head tuple (finest last)."""

    regions: int = 1
    features: Sequence[int] = MONAI_DEFAULT_FEATURES
    deep_supervision: bool = False
    dropout: float = 0.0

    name_str: str = "UNet++"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        nest = UNetPlusPlusNest(self.features, self.dropout, name="nest")(
            x, deterministic=not train)
        out4 = conv1x1(self.regions, name="final_conv_0_4")(nest["x_0_4"])
        if not self.deep_supervision:
            return out4
        out1 = conv1x1(self.regions, name="final_conv_0_1")(nest["x_0_1"])
        out2 = conv1x1(self.regions, name="final_conv_0_2")(nest["x_0_2"])
        out3 = conv1x1(self.regions, name="final_conv_0_3")(nest["x_0_3"])
        return (out1, out2, out3, out4)


class UNetPlusPlusClassifier(nn.Module):
    """Classification-only UNet++: encoder + upcat_3_1 + cls head."""

    n_classes: int = 3
    features: Sequence[int] = MT_FEATURES
    dropout: float = 0.0

    name_str: str = "UNet++ Classifier"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        fea = tuple(self.features)
        n_out = 1 if self.n_classes == 2 else self.n_classes
        det = not train

        x_0_0 = TwoConv(fea[0], self.dropout, name="conv_0_0")(x, deterministic=det)
        x_1_0 = Down(fea[1], self.dropout, name="conv_1_0")(x_0_0, deterministic=det)
        x_2_0 = Down(fea[2], self.dropout, name="conv_2_0")(x_1_0, deterministic=det)
        x_3_0 = Down(fea[3], self.dropout, name="conv_3_0")(x_2_0, deterministic=det)
        x_4_0 = Down(fea[4], self.dropout, name="conv_4_0")(x_3_0, deterministic=det)
        x_3_1 = UpCat(fea[4], fea[3], dropout=self.dropout, name="upcat_3_1")(x_4_0, x_3_0, deterministic=det)

        return UNetPlusPlusClsHead(fea, n_out, self.dropout, name="cls_head")(
            x_3_0, x_4_0, x_3_1, deterministic=det)


class MTUNetPlusPlus(nn.Module):
    """Multitask UNet++: shared nest; seg heads + classification head.

    Returns ``((cls,), (o01, o02, o03, o04))`` with deep supervision, else
    ``(cls, o04)`` — mirroring ``MTUNetPlusPlus.py:131-136``.
    """

    regions: int = 1
    n_classes: int = 3
    features: Sequence[int] = MT_FEATURES
    deep_supervision: bool = False
    dropout: float = 0.0

    name_str: str = "Multi-task UNet++"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        n_out = 1 if self.n_classes == 2 else self.n_classes
        det = not train
        nest = UNetPlusPlusNest(self.features, self.dropout, name="nest")(
            x, deterministic=det)

        out1 = conv1x1(self.regions, name="final_conv_0_1")(nest["x_0_1"])
        out2 = conv1x1(self.regions, name="final_conv_0_2")(nest["x_0_2"])
        out3 = conv1x1(self.regions, name="final_conv_0_3")(nest["x_0_3"])
        out4 = conv1x1(self.regions, name="final_conv_0_4")(nest["x_0_4"])

        cls = UNetPlusPlusClsHead(self.features, n_out, self.dropout,
                                  name="cls_head")(
            nest["x_3_0"], nest["x_4_0"], nest["x_3_1"], deterministic=det)

        if self.deep_supervision:
            return (cls,), (out1, out2, out3, out4)
        return cls, out4
