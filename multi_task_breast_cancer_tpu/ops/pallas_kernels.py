"""Pallas TPU kernels for the framework's hot ops.

``instance_norm_leaky_relu``: fused per-(sample, channel) spatial normalisation
+ LeakyReLU with a hand-written backward (custom VJP). This is the epilogue of
every ConvInNormLeReLU block (the reference zoo applies it after every conv,
``src/models/segmentation/BTS_UNet.py:19-39``), executed ~30× per forward pass
of the flagship model. The kernel keeps one (H·W, C) plane resident in VMEM and
performs mean/variance/normalise/activate in a single pass — one HBM read and
one write, versus the norm→activation chains XLA materialises separately when
fusion heuristics fail. The backward recomputes the cheap statistics instead of
saving normalised activations (less HBM traffic, rematerialisation-friendly).

Enabled in model blocks via ``MTBC_PALLAS=1`` (auto-disabled off-TPU; tests
exercise interpret mode on CPU).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is only importable with a TPU-capable jaxlib; guard for safety
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

Array = jnp.ndarray


def _fwd_kernel(x_ref, o_ref, *, eps: float, slope: float):
    # stats + comparison in f32: matches the XLA InstanceNorm's f32-stats
    # numerics under bf16 inputs, and Mosaic rejects bf16 cmpf on this target
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    mean = jnp.mean(x, axis=0, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=0, keepdims=True)
    xhat = centered * jax.lax.rsqrt(var + eps)
    o_ref[0] = jnp.where(xhat >= 0, xhat, slope * xhat).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dx_ref, *, eps: float, slope: float):
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=0, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=0, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = centered * rstd
    # dL/dxhat through LeakyReLU
    dxhat = jnp.where(xhat >= 0, g, slope * g)
    m1 = jnp.mean(dxhat, axis=0, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=0, keepdims=True)
    dx_ref[0] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _padded_block_bytes(hw: int, c: int, itemsize: int = 4) -> int:
    """VMEM footprint of one (1, hw, c) block after TPU tiling: the lane
    (last) dim pads to a multiple of 128, the sublane dim to 8."""
    lanes = -(-c // 128) * 128
    sublanes = -(-hw // 8) * 8
    return sublanes * lanes * itemsize


def fits_vmem(hw: int, c: int, n_buffers: int = 8,
              budget_bytes: int = 8 * 1024 * 1024) -> bool:
    """Whether the fused kernel's working set fits comfortably in VMEM for
    this plane shape. Budget accounts for the backward kernel's 3 operands,
    double buffering, and compiler temporaries (measured: the bwd kernel's
    scoped stack is ~8× one padded block)."""
    return n_buffers * _padded_block_bytes(hw, c) <= budget_bytes


def _block_call(kernel, out_shape, *inputs, interpret: bool):
    b, hw, c = inputs[0].shape
    if _HAS_PLTPU and not interpret:
        spec = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        spec = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0))
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(12 * _padded_block_bytes(hw, c) + 2 * 1024 * 1024))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, inputs[0].dtype),
        grid=(b,),
        in_specs=[spec] * len(inputs),
        out_specs=spec,
        interpret=interpret,
        **kwargs,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def instance_norm_leaky_relu(x: Array, eps: float = 1e-5, slope: float = 0.01,
                             interpret: bool = False) -> Array:
    """Fused InstanceNorm(affine=False) + LeakyReLU over NHWC input."""
    return _inlr_fwd(x, eps, slope, interpret)[0]


def _inlr_fwd(x: Array, eps: float, slope: float, interpret: bool):
    b, h, w, c = x.shape
    x3 = x.reshape(b, h * w, c)
    kernel = functools.partial(_fwd_kernel, eps=eps, slope=slope)
    y = _block_call(kernel, x3.shape, x3, interpret=interpret)
    return y.reshape(b, h, w, c), x3


def _inlr_bwd(eps: float, slope: float, interpret: bool, x3: Array, g: Array):
    b, hw, c = x3.shape
    g3 = g.reshape(b, hw, c)
    kernel = functools.partial(_bwd_kernel, eps=eps, slope=slope)
    dx = _block_call(kernel, x3.shape, x3, g3, interpret=interpret)
    return (dx.reshape(g.shape),)


instance_norm_leaky_relu.defvjp(_inlr_fwd, _inlr_bwd)


def instance_norm_leaky_relu_reference(x: Array, eps: float = 1e-5,
                                       slope: float = 0.01) -> Array:
    """Plain-XLA reference implementation (for parity tests / fallback)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    xhat = (x - mean) * jax.lax.rsqrt(var + eps)
    return jnp.where(xhat >= 0, xhat, slope * xhat)
