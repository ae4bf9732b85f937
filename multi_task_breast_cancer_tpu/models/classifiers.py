"""Classification-only models: BTSUNetClassifier and NNUNetClassifier.
(UNetPlusPlusClassifier lives in ``unetpp.py`` beside its shared blocks.)

Capability twins of ``src/models/classification/BTS_UNET_classifier.py:58-115``
and ``src/models/classification/nnUNet_classifier.py:75-171``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from multi_task_breast_cancer_tpu.models.blocks import (
    ConvInNormLeReLU,
    LevelBlock,
    MLPHead,
    deconv,
    global_avg_pool,
    max_pool_2x2,
)
from multi_task_breast_cancer_tpu.models.nnunet import NNUNET_WIDTHS


class BTSUNetClassifier(nn.Module):
    """BTS encoder (4 pooled levels + level block) → Flatten → MLP head.
    For 128×128 inputs the flatten sees ``width·8 · 8 · 8`` features."""

    n_classes: int = 3
    width: int = 24

    name_str: str = "BTS U-Net Classifier"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        w = [self.width * 2 ** i for i in range(4)]
        n_out = 1 if self.n_classes == 2 else self.n_classes

        x = LevelBlock(w[0] // 2, w[0], name="enc1")(x)
        x = LevelBlock(w[1] // 2, w[1], name="enc2")(max_pool_2x2(x))
        x = LevelBlock(w[2] // 2, w[2], name="enc3")(max_pool_2x2(x))
        x = LevelBlock(w[3] // 2, w[3], name="enc4")(max_pool_2x2(x))
        x = LevelBlock(w[3], w[3], name="enc5")(max_pool_2x2(x))

        return MLPHead(256, n_out, name="classifier")(x)


class NNUNetClassifierHead(nn.Module):
    """cat(proc(e5), up5(bottleneck), proc(d5)) → ConvINLReLU(512) → GAP → MLP.

    Shared by nnUNetClassifier and MTnnUNet (reference duplicates it in
    ``nnUNet_classifier.py:119-130`` and ``MTnnUNet.py:122-132``)."""

    n_out: int = 3
    widths: tuple = NNUNET_WIDTHS

    @nn.compact
    def __call__(self, e5: jnp.ndarray, up5: jnp.ndarray, d5: jnp.ndarray) -> jnp.ndarray:
        w = self.widths
        proc_e5 = ConvInNormLeReLU(w[4], name="process_encoder_5")(e5)
        proc_d5 = ConvInNormLeReLU(w[4], name="process_decoder_5")(d5)
        feats = jnp.concatenate([proc_e5, up5, proc_d5], axis=-1)
        feats = ConvInNormLeReLU(512, name="cls_conv")(feats)
        feats = global_avg_pool(feats)
        feats = nn.Dense(256, name="fc1")(feats)
        feats = nn.relu(feats)
        return nn.Dense(self.n_out, name="fc2")(feats)


class NNUNetClassifier(nn.Module):
    """nnU-Net encoder + bottleneck + decoder5, classification head on top.

    Reference quirk preserved behind ``apply_softmax`` (default True, matching
    ``nnUNet_classifier.py:168-169``): softmax applied inside forward when
    multiclass, so downstream CE receives probabilities, not logits.
    """

    n_classes: int = 3
    apply_softmax: bool = True
    widths: tuple = NNUNET_WIDTHS

    name_str: str = "nn-UNet Classifier"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        w = self.widths
        n_out = 1 if self.n_classes == 2 else self.n_classes

        e1 = LevelBlock(w[0], w[0], name="encoder1")(x)
        e2 = LevelBlock(w[1], w[1], name="encoder2")(max_pool_2x2(e1))
        e3 = LevelBlock(w[2], w[2], name="encoder3")(max_pool_2x2(e2))
        e4 = LevelBlock(w[3], w[3], name="encoder4")(max_pool_2x2(e3))
        e5 = LevelBlock(w[4], w[4], name="encoder5")(max_pool_2x2(e4))
        p5 = max_pool_2x2(e5)

        bottleneck = LevelBlock(w[4], w[4], name="bottleneck")(p5)
        up5 = deconv(w[4], 2, name="upsample5")(bottleneck)
        d5 = LevelBlock(w[3], w[3], name="decoder5")(jnp.concatenate([e5, up5], axis=-1))

        logits = NNUNetClassifierHead(n_out, self.widths, name="cls_head")(e5, up5, d5)
        if self.apply_softmax and self.n_classes > 2:
            logits = nn.softmax(logits, axis=-1)
        return logits
