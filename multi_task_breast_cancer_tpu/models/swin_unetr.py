"""Swin-UNETR (2-D): shifted-window transformer encoder + UNETR-style residual
conv decoder.

Capability twin of MONAI ``SwinUNETR(img_size=(128,128), in_channels=1,
out_channels=1, spatial_dims=2)`` as exposed by the reference factory
(``src/utils/experiment_init.py:64-65``): patch-embed 2×, four Swin stages with
depths (2,2,2,2) / heads (3,6,12,24), feature size 24, five skip levels into
UnetrBasicBlock/UnetrUpBlock decoders.

TPU-first deviation (documented): window size 8 instead of 7 — it divides every
stage's grid (64→4) exactly, so window partitioning is pure reshapes with no
padding, and the (64, 64) attention matrices tile the MXU cleanly. Shifted
windows keep the standard cyclic-roll + attention-mask scheme.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multi_task_breast_cancer_tpu.models.blocks import InstanceNorm, kaiming_normal


WINDOW = 8


def _window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·nH·nW, win·win, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win * win, c)


def _window_merge(x: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of :func:`_window_partition`."""
    b = x.shape[0] // ((h // win) * (w // win))
    x = x.reshape(b, h // win, w // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


@functools.lru_cache(maxsize=None)
def _relative_position_index(win: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(win), np.arange(win), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (win - 1)
    return (rel[..., 0] * (2 * win - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _shift_attention_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """Standard Swin mask: windows that mix rolled-in regions get -inf between
    cells from different source regions. Returns (nWindows, win², win²)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mask_windows = np.squeeze(
        np.asarray(_window_partition(jnp.asarray(img_mask), win)), -1)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -1e9, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    win: int = WINDOW

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        # x: (nW, L, C) with L = win²
        nw, L, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(nw, L, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("whld,whmd->whlm", q, k,
                          preferred_element_type=jnp.float32) / np.sqrt(head_dim)
        bias_table = self.param(
            "rel_pos_bias", nn.initializers.truncated_normal(0.02),
            ((2 * self.win - 1) ** 2, self.num_heads))
        idx = _relative_position_index(self.win)
        attn = attn + bias_table[idx].transpose(2, 0, 1)[None]
        if mask is not None:
            n_masks = mask.shape[0]
            attn = attn.reshape(-1, n_masks, self.num_heads, L, L)
            attn = attn + mask[None, :, None, :, :]
            attn = attn.reshape(nw, self.num_heads, L, L)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("whlm,whmd->whld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, L, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    shift: int = 0
    mlp_ratio: float = 4.0
    win: int = WINDOW

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attention_mask(h, w, self.win, self.shift))
        else:
            mask = None
        windows = _window_partition(x, self.win)
        windows = WindowAttention(self.dim, self.num_heads, self.win,
                                  name="attn")(windows, mask)
        x = _window_merge(windows, self.win, h, w)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """2× downsample: concat 2×2 neighbourhood (4C) → LayerNorm → Dense(2C)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)


class UnetrBasicBlock(nn.Module):
    """Residual conv block: (conv3x3 + IN + lrelu) ×2 with projected skip."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        skip = x
        y = nn.Conv(self.features, (3, 3), use_bias=False,
                    kernel_init=kaiming_normal, name="conv1")(x)
        y = InstanceNorm(affine=True, name="norm1")(y)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Conv(self.features, (3, 3), use_bias=False,
                    kernel_init=kaiming_normal, name="conv2")(y)
        y = InstanceNorm(affine=True, name="norm2")(y)
        if skip.shape[-1] != self.features:
            skip = nn.Conv(self.features, (1, 1), use_bias=False,
                           name="conv_skip")(skip)
            skip = InstanceNorm(affine=True, name="norm_skip")(skip)
        return nn.leaky_relu(y + skip, 0.01)


class UnetrUpBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                             use_bias=False, name="up")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return UnetrBasicBlock(self.features, name="block")(x)


class SwinUNETR(nn.Module):
    """2-D Swin-UNETR. Input H=W such that every stage grid H/2..H/32 is
    either window-divisible or smaller than the window — any power of two
    ≥ 32 (the reference's 128 ✓) and any multiple of 256 qualify; sizes like
    96/160/192 do NOT (a mid-stage grid of e.g. 12 cannot be partitioned
    into 8-wide windows). Validated with a clear error at trace time."""

    regions: int = 1
    feature_size: int = 24
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)

    name_str: str = "Swin UNETR"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        f = self.feature_size

        hh, ww = x.shape[1], x.shape[2]
        stage_grids = [hh // 2 // 2 ** s for s in range(4)]  # windowed grids
        if (hh != ww or hh % 32
                or any(g >= WINDOW and g % WINDOW for g in stage_grids)
                or any(g % 2 for g in stage_grids)):
            raise ValueError(
                f"SwinUNETR input {hh}x{ww}: every windowed stage grid "
                f"{stage_grids} must be even and window({WINDOW})-divisible "
                f"once >= the window — use a power-of-two size >= 32 or a "
                f"multiple of 256")

        # full-resolution residual encoder on raw input
        enc0 = UnetrBasicBlock(f, name="encoder0")(x)

        # patch embedding (2× patches)
        h = nn.Conv(f, (2, 2), strides=(2, 2), name="patch_embed")(x)
        hidden = [h]  # 64², f
        dims = [f, 2 * f, 4 * f, 8 * f, 16 * f]
        for stage in range(4):
            dim = dims[stage]
            for blk in range(self.depths[stage]):
                shift = 0 if blk % 2 == 0 else WINDOW // 2
                win = WINDOW if h.shape[1] >= WINDOW else h.shape[1]
                h = SwinBlock(dim, self.num_heads[stage],
                              shift=shift if h.shape[1] > win else 0, win=win,
                              name=f"stage{stage}_block{blk}")(h)
            h = PatchMerging(dims[stage + 1], name=f"merge{stage}")(h)
            hidden.append(h)

        enc1 = UnetrBasicBlock(f, name="encoder1")(hidden[0])       # 64²
        enc2 = UnetrBasicBlock(2 * f, name="encoder2")(hidden[1])   # 32²
        enc3 = UnetrBasicBlock(4 * f, name="encoder3")(hidden[2])   # 16²
        dec4 = UnetrBasicBlock(16 * f, name="encoder10")(hidden[4])  # 4²

        d3 = UnetrUpBlock(8 * f, name="decoder5")(dec4, hidden[3])  # 8²
        d2 = UnetrUpBlock(4 * f, name="decoder4")(d3, enc3)         # 16²
        d1 = UnetrUpBlock(2 * f, name="decoder3")(d2, enc2)         # 32²
        d0 = UnetrUpBlock(f, name="decoder2")(d1, enc1)             # 64²
        out = UnetrUpBlock(f, name="decoder1")(d0, enc0)            # 128²

        return nn.Conv(self.regions, (1, 1), name="out")(out)
