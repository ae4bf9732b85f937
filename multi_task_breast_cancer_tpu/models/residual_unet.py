"""Residual U-Net: BatchNorm residual blocks with dropout 0.2, strided-conv
downsampling, deconv upsampling — and (reference quirk, preserved) **no skip
connections** in the decoder path actually used at inference.

Capability twin of the reference ``src/models/segmentation/ResidualUNet.py:338-362``
(whose ``forward`` chains in_block → encoder → decoder → out_block without the
skip-concat ``seg_path`` variant defined at ``:296-335``).

Deviation (documented): the reference calls ``F.dropout(p=0.2)`` without a
``training`` flag, so dropout stays active at eval time
(``ResidualUNet.py:61,139,144``). Here dropout is active only when ``train=True``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from multi_task_breast_cancer_tpu.models.blocks import kaiming_normal


def _conv3(features: int, stride: int = 1, name: str | None = None) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(stride, stride), padding=1,
                   use_bias=True, kernel_init=kaiming_normal, name=name)


class _BN(nn.Module):
    """BatchNorm with running stats (torch BatchNorm2d semantics).

    Under jit+NamedSharding data parallelism the batch mean/var reductions are
    global (XLA inserts the cross-chip collective), matching single-device math.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class InBlock(nn.Module):
    features: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        path = _conv3(self.features, name="conv1")(x)
        path = _BN(name="bn1")(path, train=train)
        path = nn.leaky_relu(path, 0.01)
        path = nn.Dropout(self.dropout, deterministic=not train)(path)
        path = _conv3(self.features, name="conv2")(path)

        residual = _conv3(self.features, name="conv3")(x)
        residual = _BN(name="bn3")(residual, train=train)
        return path + residual


class ResBlock(nn.Module):
    features_in: int
    downsample: bool = False
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        features_out = 2 * self.features_in if self.downsample else self.features_in
        stride = 2 if self.downsample else 1

        path = _BN(name="bn1")(x, train=train)
        path = nn.leaky_relu(path, 0.01)
        path = nn.Dropout(self.dropout, deterministic=not train)(path)
        path = _conv3(features_out, stride, name="conv1")(path)
        path = _BN(name="bn2")(path, train=train)
        path = nn.leaky_relu(path, 0.01)
        path = nn.Dropout(self.dropout, deterministic=not train)(path)
        path = _conv3(features_out, name="conv2")(path)

        residual = _conv3(features_out, stride, name="conv3")(x)
        residual = _BN(name="bn3")(residual, train=train)
        return path + residual


class ResidualUNet(nn.Module):
    regions: int = 1
    width: int = 24

    name_str: str = "Residual UNet"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        bf = self.width

        # in_block + encoder (downsampling res blocks)
        x = InBlock(bf, name="in_block")(x, train=train)
        x = ResBlock(bf, downsample=True, name="down_block2")(x, train=train)
        x = ResBlock(bf * 2, downsample=True, name="down_block3")(x, train=train)
        x = ResBlock(bf * 4, downsample=True, name="down_block4")(x, train=train)

        # decoder (no skips — see module docstring)
        x = nn.ConvTranspose(bf * 4, (2, 2), strides=(2, 2), name="upsample3")(x)
        x = ResBlock(bf * 4, name="up_block3")(x, train=train)
        x = nn.ConvTranspose(bf * 2, (2, 2), strides=(2, 2), name="upsample2")(x)
        x = ResBlock(bf * 2, name="up_block2")(x, train=train)
        x = nn.ConvTranspose(bf, (2, 2), strides=(2, 2), name="upsample1")(x)
        x = ResBlock(bf, name="up_block1")(x, train=train)

        return nn.Conv(self.regions, (1, 1), kernel_init=kaiming_normal,
                       name="seg_out")(x)
