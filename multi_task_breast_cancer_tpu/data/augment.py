"""Jit-able joint geometric augmentation (random h/v flips + rotation).

The reference builds a torchvision pipeline per driver
(``training_multitask.py:193-197``: HFlip(p=.5) → VFlip(p=.5) →
RandomRotation(360), nearest interpolation, fill 0) and applies it to the
``cat([mask, image(+augment channels)])`` stack on CPU per sample per epoch
(``BUSI_dataset.py:142-158``).

Here the same joint transform is a pure function of a PRNG key, vmapped over
the batch and fused into the jitted train step — augmentation costs one gather
on-device instead of a Python/CPU pass.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _inverse_rotation_coords(angle_deg: Array, h: int, w: int
                             ) -> Tuple[Array, Array]:
    """Float source coordinates of the inverse rotation about the image
    centre (torchvision convention): out(p) = img(R⁻¹p)."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = angle_deg * (jnp.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    return cos * yy + sin * xx + cy, -sin * yy + cos * xx + cx


def _round_clip_coords(ys: Array, xs: Array, h: int, w: int
                       ) -> Tuple[Array, Array, Array]:
    """Nearest-neighbour rounding + bounds: (y_clipped, x_clipped, valid)."""
    yr = jnp.round(ys).astype(jnp.int32)
    xr = jnp.round(xs).astype(jnp.int32)
    valid = (yr >= 0) & (yr < h) & (xr >= 0) & (xr < w)
    return jnp.clip(yr, 0, h - 1), jnp.clip(xr, 0, w - 1), valid


def rotate_nearest(img: Array, angle_deg: Array) -> Array:
    """Rotate (H, W, C) by ``angle_deg`` about the image centre, nearest
    interpolation, zero fill — torchvision ``rotate`` semantics (its default
    InterpolationMode.NEAREST, expand=False)."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = _inverse_rotation_coords(angle_deg, h, w)
    yc, xc, valid = _round_clip_coords(ys, xs, h, w)
    out = img[yc, xc, :]
    return jnp.where(valid[..., None], out, jnp.zeros_like(out))


def _joint_coords(key: jax.Array, h: int, w: int, *, p_hflip: float,
                  p_vflip: float, max_angle: float, enable_rotation: bool
                  ) -> Tuple[Array, Array]:
    """Inverse-map source coordinates for one sample's joint
    hflip → vflip → rotate pipeline: returns (flat_idx (H·W,), valid (H,W)).

    The three ops compose into ONE inverse affine map:
    out(p) = Flip(img)(R⁻¹p) = img(F(R⁻¹p))."""
    k_h, k_v, k_r = jax.random.split(key, 3)
    flip_h = jax.random.uniform(k_h) < p_hflip
    flip_v = jax.random.uniform(k_v) < p_vflip
    if enable_rotation and max_angle > 0:
        # torchvision RandomRotation(degrees=d) draws U(-d, d) and always rotates
        angle = jax.random.uniform(k_r, minval=-max_angle, maxval=max_angle)
    else:
        angle = jnp.zeros(())

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = _inverse_rotation_coords(angle, h, w)
    # flip about the centre in source space: q' = s·q + (1-s)·(S-1)/2
    sy = jnp.where(flip_v, -1.0, 1.0)
    sx = jnp.where(flip_h, -1.0, 1.0)
    ys = sy * ys + (1.0 - sy) * cy
    xs = sx * xs + (1.0 - sx) * cx
    yc, xc, valid = _round_clip_coords(ys, xs, h, w)
    return (yc * w + xc).reshape(h * w), valid


def joint_transform_single(stack: Array, key: jax.Array, *,
                           p_hflip: float = 0.5, p_vflip: float = 0.5,
                           max_angle: float = 360.0,
                           enable_rotation: bool = True) -> Array:
    """Apply the joint pipeline to one (H, W, C) stack whose channel 0 is the
    mask — geometry stays aligned across mask/image/augment channels.

    One memory pass: a single flat (H·W,) gather over the (H·W, C) view
    (lowers ~15% faster on TPU than 2-D advanced indexing, bit-identical)."""
    h, w, c = stack.shape
    idx, valid = _joint_coords(key, h, w, p_hflip=p_hflip, p_vflip=p_vflip,
                               max_angle=max_angle,
                               enable_rotation=enable_rotation)
    out = jnp.take(stack.reshape(h * w, c), idx, axis=0).reshape(h, w, c)
    return jnp.where(valid[..., None], out, jnp.zeros_like(out))


def joint_transform_stack_batch(stack: Array, keys: jax.Array, *,
                                p_hflip: float = 0.5, p_vflip: float = 0.5,
                                max_angle: float = 360.0,
                                enable_rotation: bool = True) -> Array:
    """Batched joint transform of (B, H, W, C) stacks as ONE global gather.

    Identical output to ``vmap(joint_transform_single)`` but gathers
    ``(B·H·W,)`` indices over the ``(B·H·W, C)`` view in a single take —
    measured ~40% faster than the vmapped per-sample gather on TPU (XLA lowers
    the batched-gather form better than B separate gathers)."""
    b, h, w, c = stack.shape
    idx, valid = jax.vmap(
        lambda k: _joint_coords(k, h, w, p_hflip=p_hflip, p_vflip=p_vflip,
                                max_angle=max_angle,
                                enable_rotation=enable_rotation))(keys)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]
    out = jnp.take(stack.reshape(b * h * w, c), (idx + base).reshape(-1),
                   axis=0).reshape(b, h, w, c)
    return jnp.where(valid[..., None], out, jnp.zeros_like(out))


@functools.partial(jax.jit, static_argnames=("p_hflip", "p_vflip", "max_angle",
                                             "enable_rotation"))
def joint_transform_batch(images: Array, masks: Array, key: jax.Array, *,
                          p_hflip: float = 0.5, p_vflip: float = 0.5,
                          max_angle: float = 360.0,
                          enable_rotation: bool = True) -> Tuple[Array, Array]:
    """Batched joint transform: images (B,H,W,C_img), masks (B,H,W,C_mask).

    Returns transformed (images, masks) with identical per-sample geometry.

    Standalone convenience wrapper (tests / external callers). The training
    engine does NOT call it: the jitted epoch inlines the same
    concat → split-keys → ``joint_transform_stack_batch`` → split sequence
    (``train/loop.py``) so the transform traces into the epoch program —
    keep the packing conventions in sync if either side changes."""
    n_mask = masks.shape[-1]
    stack = jnp.concatenate([masks, images], axis=-1)
    keys = jax.random.split(key, stack.shape[0])
    out = joint_transform_stack_batch(stack, keys, p_hflip=p_hflip,
                                      p_vflip=p_vflip, max_angle=max_angle,
                                      enable_rotation=enable_rotation)
    return out[..., n_mask:], out[..., :n_mask]
