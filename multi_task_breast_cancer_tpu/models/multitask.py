"""Multi-task models: shared encoder, segmentation decoder + classification head.

Capability twins of ``src/models/multitask/``:
- MTnnUNet (``MTnnUNet.py:64-183``) — the config-default flagship,
- Multi_BTS_UNet (``Multi_BTS_UNet.py:64-176``),
- Multi_FSB_BTS_UNet (``Multi_FSB_BTS_UNet.py:70-214``),
- Adityan 3-output network (``AdityanNetwork.py:54-140``).
(MTUNetPlusPlus lives in ``unetpp.py``.)

Output convention (kept from the reference so drivers/losses are uniform):
multitask forward returns ``(cls_logits_tuple_or_tensor, seg_heads_tuple_or_tensor)``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from multi_task_breast_cancer_tpu.models.blocks import (
    ConvInNormLeReLU,
    DeconvHead,
    LevelBlock,
    MLPHead,
    avg_pool,
    conv1x1,
    conv3x3,
    deconv,
    max_pool_2x2,
    upsample_nearest_2x,
)
from multi_task_breast_cancer_tpu.models.classifiers import NNUNetClassifierHead
from multi_task_breast_cancer_tpu.models.nnunet import NNUNET_WIDTHS, NNUNetBackbone, SegHeads


class MTnnUNet(nn.Module):
    """nnU-Net backbone + 4 seg heads + classification head over
    cat(proc(e5), upsample5(bottleneck), proc(d5)).

    The classification head reuses the backbone's ``upsample5`` output (shared
    deconv weights with the segmentation path, mirroring ``MTnnUNet.py:174``).
    Returns ``((cls,), (out4, out3, out2, out1))``.
    """

    regions: int = 1
    n_classes: int = 3
    widths: tuple = NNUNET_WIDTHS

    name_str: str = "Multi-task nn-UNet"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        n_out = 1 if self.n_classes == 2 else self.n_classes
        feats = NNUNetBackbone(self.widths, name="backbone")(x)
        seg = SegHeads(self.regions, self.widths, name="heads")(feats)
        cls = NNUNetClassifierHead(n_out, self.widths, name="cls_head")(
            feats["e5"], feats["up5"], feats["d5"])
        return (cls,), seg


class _BTSTrunk(nn.Module):
    """Shared BTS encoder/bottleneck/decoder used by Multi_BTS and Multi_FSB."""

    width: int
    fsb: bool = False  # adds the full-resolution no-pooling bridge

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        w = [self.width * 2 ** i for i in range(4)]

        npl = {}
        if self.fsb:
            npl1 = LevelBlock(w[0], w[0], name="npl1")(x)
            npl2 = LevelBlock(w[1] // 2, w[1], name="npl2")(npl1)
            npl3 = LevelBlock(w[2] // 2, w[2], name="npl3")(npl2)
            npl4 = LevelBlock(w[3] // 2, w[3], name="npl4")(npl3)
            npl = {"npl1": npl1, "npl2": npl2, "npl3": npl3, "npl4": npl4}

        e1 = LevelBlock(w[0] // 2, w[0], name="encoder1")(x)
        e2 = LevelBlock(w[1] // 2, w[1], name="encoder2")(max_pool_2x2(e1))
        e3 = LevelBlock(w[2] // 2, w[2], name="encoder3")(max_pool_2x2(e2))
        e4 = LevelBlock(w[3] // 2, w[3], name="encoder4")(max_pool_2x2(e3))

        bottleneck = LevelBlock(w[3], w[3], name="bottleneck")(e4)
        bottleneck2 = ConvInNormLeReLU(w[2], name="bottleneck2")(
            jnp.concatenate([e4, bottleneck], axis=-1))

        d3 = LevelBlock(w[2], w[1], name="decoder3")(
            jnp.concatenate([e3, upsample_nearest_2x(bottleneck2)], axis=-1))
        d2 = LevelBlock(w[1], w[0], name="decoder2")(
            jnp.concatenate([e2, upsample_nearest_2x(d3)], axis=-1))
        d1_in = [e1, upsample_nearest_2x(d2)]
        if self.fsb:
            d1_in.append(npl["npl4"])
        d1 = LevelBlock(w[0], w[0] // 2, name="decoder1")(
            jnp.concatenate(d1_in, axis=-1))

        return {"e1": e1, "e4": e4, "bottleneck": bottleneck,
                "bottleneck2": bottleneck2, "d3": d3, "d2": d2, "d1": d1, **npl}


class _BTSClsHead(nn.Module):
    """cat(e4, bottleneck, proc(bottleneck2)) → ConvINLReLU → Flatten → MLP.
    Mirrors ``Multi_BTS_UNet.py:103-115,161-164``."""

    width: int
    n_out: int

    @nn.compact
    def __call__(self, e4, bottleneck, bottleneck2) -> jnp.ndarray:
        w3 = self.width * 8
        proc_b2 = ConvInNormLeReLU(w3, name="process_bottleneck2")(bottleneck2)
        feats = jnp.concatenate([e4, bottleneck, proc_b2], axis=-1)
        feats = ConvInNormLeReLU(w3, name="process_features_map")(feats)
        return MLPHead(256, self.n_out, name="classifier")(feats)


class MultiBTSUNet(nn.Module):
    """BTS U-Net + classification head. DS → ``((cls,), (out3, out2, out1))``,
    else ``(cls, out1)``."""

    regions: int = 1
    n_classes: int = 3
    width: int = 24
    deep_supervision: bool = False

    name_str: str = "Multi-task BTS U-Net"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        w = [self.width * 2 ** i for i in range(4)]
        n_out = 1 if self.n_classes == 2 else self.n_classes

        t = _BTSTrunk(self.width, fsb=False, name="trunk")(x)
        cls = _BTSClsHead(self.width, n_out, name="cls_head")(
            t["e4"], t["bottleneck"], t["bottleneck2"])

        output1 = conv1x1(self.regions, name="output1")(t["d1"])
        if not self.deep_supervision:
            return cls, output1
        out3 = DeconvHead(w[1], self.regions, 4, name="output3")(t["d3"])
        out2 = DeconvHead(w[0], self.regions, 2, name="output2")(t["d2"])
        return (cls,), (out3, out2, output1)


class MultiFSBBTSUNet(nn.Module):
    """FSB BTS U-Net + classification head.

    Reference quirks preserved: the final Dense is hard-coded to **1 logit**
    regardless of ``n_classes`` (``Multi_FSB_BTS_UNet.py:152``), and with deep
    supervision the class output is returned bare (not wrapped in a list,
    ``:208``). DS → ``(cls, 8-head tuple)``, else ``(cls, out1)``.
    """

    regions: int = 1
    width: int = 24
    deep_supervision: bool = False

    name_str: str = "Multi-task FSB BTS U-Net"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        w = [self.width * 2 ** i for i in range(4)]

        t = _BTSTrunk(self.width, fsb=True, name="trunk")(x)
        cls = _BTSClsHead(self.width, 1, name="cls_head")(
            t["e4"], t["bottleneck"], t["bottleneck2"])

        output1 = conv1x1(self.regions, name="output1")(t["d1"])
        if not self.deep_supervision:
            return cls, output1
        input1 = conv1x1(self.regions, name="input1")(t["e1"])
        out_npl1 = conv1x1(self.regions, name="out_npl1")(t["npl1"])
        out_npl2 = conv1x1(self.regions, name="out_npl2")(t["npl2"])
        out_npl3 = conv1x1(self.regions, name="out_npl3")(t["npl3"])
        out_npl4 = conv1x1(self.regions, name="out_npl4")(t["npl4"])
        out3 = DeconvHead(w[1], self.regions, 4, name="output3")(t["d3"])
        out2 = DeconvHead(w[0], self.regions, 2, name="output2")(t["d2"])
        return cls, (out3, out2, out_npl1, out_npl2, out_npl3, out_npl4, input1, output1)


class _ConvReLULevel(nn.Module):
    """Two (conv3x3 bias=True → ReLU) blocks — the Adityan network's
    ``LevelBlock`` (``AdityanNetwork.py:19-39``), which unlike the BTS family
    uses NO normalisation, plain ReLU, and biased convs."""

    mid_features: int
    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(conv3x3(self.mid_features, use_bias=True, name="conv1")(x))
        return nn.relu(conv3x3(self.out_features, use_bias=True, name="conv2")(x))


class Adityan(nn.Module):
    """Three-output network (classification, reconstruction, segmentation);
    reference ``AdityanNetwork.py:54-140`` (defined but not wired into the
    reference factory; exposed here for completeness).

    Returns ``(cls_logits, reconstruction, seg_logits)``.
    """

    regions: int = 1
    width: int = 64

    name_str: str = "Adityan network"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        w = [self.width * 2 ** i for i in range(5)]

        e1 = _ConvReLULevel(w[0], w[0], name="encoder1")(x)
        e2 = _ConvReLULevel(w[1], w[1], name="encoder2")(max_pool_2x2(e1))
        e3 = _ConvReLULevel(w[2], w[2], name="encoder3")(max_pool_2x2(e2))
        e4 = _ConvReLULevel(w[3], w[3], name="encoder4")(max_pool_2x2(e3))
        p4 = max_pool_2x2(e4)

        bottleneck = _ConvReLULevel(w[4], w[3], name="bottleneck")(p4)

        d4 = _ConvReLULevel(w[3], w[2], name="decoder4")(
            jnp.concatenate([e4, deconv(w[3], 2, name="upsample4")(bottleneck)], axis=-1))
        d3 = _ConvReLULevel(w[2], w[1], name="decoder3")(
            jnp.concatenate([e3, deconv(w[2], 2, name="upsample3")(d4)], axis=-1))
        d2 = _ConvReLULevel(w[1], w[0], name="decoder2")(
            jnp.concatenate([e2, deconv(w[1], 2, name="upsample2")(d3)], axis=-1))
        d1 = jnp.concatenate([e1, deconv(w[0], 2, name="upsample1")(d2)], axis=-1)

        # segmentation map
        segmap = _ConvReLULevel(w[0], w[0], name="segmap")(d1)
        seg_out = conv1x1(self.regions, name="seg_out")(segmap)

        # reconstruction map
        recmap = _ConvReLULevel(w[0], w[0], name="recmap")(d1)
        rec_out = nn.sigmoid(conv3x3(self.regions, use_bias=True, name="rec_out")(recmap))

        # classification map: 3 pools → ConvReLU(32) → AvgPool(16) → MLP(1000→3)
        cmap = max_pool_2x2(max_pool_2x2(max_pool_2x2(d1)))
        cmap = nn.relu(conv3x3(32, use_bias=True, name="cls_conv")(cmap))
        cmap = avg_pool(cmap, cmap.shape[1])
        cmap = cmap.reshape((cmap.shape[0], -1))
        cmap = nn.relu(nn.Dense(1000, name="cls_fc1")(cmap))
        cls = nn.Dense(3, name="cls_fc2")(cmap)

        return cls, rec_out, seg_out
