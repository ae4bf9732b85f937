"""Opt-in fast augmentation: 3-shear (Paeth) nearest rotation as a Pallas
VMEM kernel (``training.fast_augmentation``).

Motivation (PARITY round-3 changelog): the exact torchvision-parity rotation
is ONE arbitrary per-pixel gather, which neither XLA (latency-bound, ~23% of
the train step) nor Mosaic (``tpu.dynamic_gather`` is a within-vreg shuffle)
can run fast. The classic Paeth decomposition rewrites rotation as THREE
per-row shears — and a per-row shear IS a within-vreg lane gather, which
Mosaic supports. The full hflip→vflip→rotate pipeline canonicalizes into

    G1 → T → G2 → T → G3 → T^(q mod 2)

where each ``G`` is a lane-affine gather ``idx(y,x) = d·x + c + s[y]`` with
zero fill and ``T`` is a (VMEM-cheap) transpose; quadrant rotations and flips
fold into the gather parameters exactly (fuzz-tested bit-exact against the
sequential op list for all 16 dihedral cases).

SEMANTICS DEVIATION (documented as PARITY D13): the flip/angle DRAWS are
bit-identical to the exact path (same key splits), but the rotation
resampling rounds per shear instead of once, so individual pixels near
lesion boundaries can differ by one position (measured mask Dice between the
two resamplings ≥ 0.988, mean 0.993). Training trajectories therefore differ
from the torchvision-parity path — this is why the fast path is opt-in.

Data layout: the fold's (N,H,W,C) [masks|image(+augment channels)] stack is
packed once per fold into (N,P,S,S) int32 *planes* so the kernel's gathers
run on 32-bit lanes (Mosaic requires matching data/index bitwidths):

- bf16 compute packs channel PAIRS per plane ((u16(ch2k)<<16)|u16(ch2k+1),
  odd channel counts zero-padded) — P = ceil(C/2);
- f32 compute bitcasts each channel to its own int32 plane — P = C;
- S is the square canvas: H,W are embedded CENTERED in the smallest
  kernel-compatible square (next multiple of 8 up to one vreg, else next
  multiple of 128 — see ``plan_canvas``). Centered embedding makes flips and
  rotation about the canvas center coincide exactly with the image-center
  semantics of the exact path; margins are zero-filled like torchvision's
  ``fill=0`` and cropped away after the kernel. Odd H/W zero-pad one
  bottom/right row/col first (≤1-px deviation, see ``pack_channels``).

The per-(sample, plane) canvas is DMA'd contiguously into VMEM via
scalar-prefetch block indexing, which also performs the batch row selection;
all planes of one sample share that sample's gather parameters.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu importable only with TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# channel packing (2 × bf16 → int32 lane)
# ---------------------------------------------------------------------------


def pack_bf16x2(stack: Array) -> Array:
    """(..., 2) bf16 → (...) int32: lane = (u16(ch0) << 16) | u16(ch1)."""
    u = jax.lax.bitcast_convert_type(stack.astype(jnp.bfloat16),
                                     jnp.uint16).astype(jnp.uint32)
    return ((u[..., 0] << 16) | u[..., 1]).astype(jnp.int32)


def unpack_bf16x2(packed: Array) -> Array:
    """(...) int32 → (..., 2) bf16."""
    u = packed.astype(jnp.uint32)
    ch0 = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16), jnp.bfloat16)
    ch1 = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    return jnp.stack([ch0, ch1], axis=-1)


# ---------------------------------------------------------------------------
# generalized packing: C channels × f32/bf16 × padded square canvas
# ---------------------------------------------------------------------------


class AugFormat(NamedTuple):
    """Static descriptor of a packed augmentation stack (hashable — safe to
    close over in a jitted function)."""
    n_channels: int    # original channel count C
    n_planes: int      # int32 planes per sample P
    dtype: str         # 'bfloat16' | 'float32'
    height: int        # original H
    width: int         # original W
    canvas: int        # padded square side S


def plan_canvas(h: int, w: int) -> int:
    """Smallest kernel-compatible square canvas that holds an H×W image with
    integral centered margins.

    Kernel-compatible = lane width ≤ one vreg (rounded to the 8-sublane
    granule) or a multiple of 128 (the lane-blocked gather, see
    ``_lane_gather``). H and W must be even so the centered margins are
    integers — ``pack_channels`` pads odd dims up first."""
    m = max(h, w, 8)
    if m <= _LANE:
        return -(-m // 8) * 8
    return -(-m // _LANE) * _LANE


def pack_channels(stack: Array, compute_dtype: str) -> Tuple[Array, AugFormat]:
    """(N,H,W,C) float stack → ((N,P,S,S) int32 planes, AugFormat).

    bf16: channel pairs per int32 lane (odd C zero-padded); f32: one channel
    per plane (bitcast). The image is embedded centered in the S×S canvas
    with zero margins (torchvision ``fill=0`` semantics — zero bits decode to
    0.0 in both dtypes).

    ODD H/W are handled by one bottom/right zero-pad row/column before the
    centered embedding (the centered margins must be integral). Documented
    ≤1-px deviation vs the exact path (the fast path is already not
    bit-exact, PARITY D13): the flip/rotation center sits 0.5 px from the
    odd image's true center, so a flip translates the content by one pixel
    in the odd dimension — JOINTLY for masks and image channels (the whole
    packed stack moves together), so mask/image alignment is never broken.
    Unpacking crops the original H×W back out exactly."""
    n, h, w, c = stack.shape
    ph, pw = h + (h % 2), w + (w % 2)
    if (ph, pw) != (h, w):
        stack = jnp.pad(stack, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
    s = plan_canvas(ph, pw)
    if compute_dtype == "bfloat16":
        x = stack.astype(jnp.bfloat16)
        if c % 2:
            x = jnp.concatenate([x, jnp.zeros_like(x[..., :1])], axis=-1)
        planes = pack_bf16x2(x.reshape(*x.shape[:-1], -1, 2))
    elif compute_dtype == "float32":
        planes = jax.lax.bitcast_convert_type(stack.astype(jnp.float32),
                                              jnp.int32)
    else:
        raise ValueError(f"unsupported compute_dtype {compute_dtype!r}")
    planes = jnp.moveaxis(planes, -1, 1)          # (N,P,PH,PW)
    oy, ox = (s - ph) // 2, (s - pw) // 2
    if s != ph or s != pw:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (oy, s - ph - oy),
                                  (ox, s - pw - ox)))
    fmt = AugFormat(n_channels=c, n_planes=planes.shape[1],
                    dtype=compute_dtype, height=h, width=w, canvas=s)
    return planes, fmt


def unpack_channels(out: Array, fmt: AugFormat) -> Array:
    """(B,P,S,S) int32 kernel output → (B,H,W,C) in the compute dtype
    (centered crop + channel unpacking, inverse of ``pack_channels``)."""
    oy = (fmt.canvas - fmt.height) // 2
    ox = (fmt.canvas - fmt.width) // 2
    out = out[:, :, oy:oy + fmt.height, ox:ox + fmt.width]
    out = jnp.moveaxis(out, 1, -1)                # (B,H,W,P)
    if fmt.dtype == "bfloat16":
        chans = unpack_bf16x2(out).reshape(*out.shape[:-1], 2 * fmt.n_planes)
        return chans[..., :fmt.n_channels]
    return jax.lax.bitcast_convert_type(out, jnp.float32)


# ---------------------------------------------------------------------------
# per-sample pipeline parameters (vectorized over the batch)
# ---------------------------------------------------------------------------


def _fold_pre_L(cond, d, c, s, w):
    return (jnp.where(cond, -d, d), jnp.where(cond, w - 1 - c, c),
            jnp.where(cond[:, None], -s, s))


def _fold_post_L(cond, d, c, s, w):
    return (jnp.where(cond, -d, d), jnp.where(cond, c + d * (w - 1), c), s)


def _relabel_rows(cond, s):
    return jnp.where(cond[:, None], s[:, ::-1], s)


def build_pipeline_params(key: jax.Array, b: int, w: int, *, p_hflip: float,
                          p_vflip: float, max_angle: float
                          ) -> Tuple[Array, Array]:
    """Draw per-sample flips/angles (SAME key-split scheme as the exact path,
    ``data/augment.py::_joint_coords``) and fold them into the fixed-pipeline
    gather parameters.

    Returns (idx_planes (B,3,W,W) int32, t1 (B,) int32)."""
    keys = jax.random.split(key, b)

    def draws(k):
        kh, kv, kr = jax.random.split(k, 3)
        fh = jax.random.uniform(kh) < p_hflip
        fv = jax.random.uniform(kv) < p_vflip
        ang = jax.random.uniform(kr, minval=-max_angle, maxval=max_angle)
        return fh, fv, ang

    fh, fv, angle = jax.vmap(draws)(keys)
    return pipeline_params_from_draws(fh, fv, angle, w)


def pipeline_params_from_draws(fh: Array, fv: Array, angle: Array, w: int
                               ) -> Tuple[Array, Array]:
    c_mid = (w - 1) / 2.0
    ang = jnp.mod(angle + 180.0, 360.0) - 180.0
    qf = jnp.round(ang / 90.0)
    phi = ang - 90.0 * qf
    q = jnp.mod(qf.astype(jnp.int32), 4)
    a = jnp.tan(jnp.deg2rad(phi) / 2.0)
    bsh = -jnp.sin(jnp.deg2rad(phi))

    y = jnp.arange(w, dtype=jnp.float32) - c_mid
    s1 = -jnp.round(a[:, None] * y[None, :]).astype(jnp.int32)   # (B, W)
    s2 = -jnp.round(bsh[:, None] * y[None, :]).astype(jnp.int32)
    s3 = s1
    zeros = jnp.zeros(fh.shape[0], jnp.int32)
    d1 = d2 = d3 = zeros + 1
    c1 = c2 = c3 = zeros

    # flips (applied before the shears)
    d1, c1, s1 = _fold_pre_L(fh, d1, c1, s1, w)
    s1 = _relabel_rows(fv, s1)
    d2, c2, s2 = _fold_pre_L(fv, d2, c2, s2, w)

    # quadrant rotations (applied after the shears), unrolled: the trailing-
    # transpose parity is determined by q, so each step's fold target is static
    step1 = q >= 1
    d3, c3, s3 = _fold_post_L(step1, d3, c3, s3, w)
    step2 = q >= 2
    s3 = _relabel_rows(step2, s3)
    d2, c2, s2 = _fold_post_L(step2, d2, c2, s2, w)
    step3 = q >= 3
    d3, c3, s3 = _fold_post_L(step3, d3, c3, s3, w)
    t1 = jnp.mod(q, 2).astype(jnp.int32)

    iota_x = jnp.arange(w, dtype=jnp.int32)[None, None, :]       # (1,1,W)
    d = jnp.stack([d1, d2, d3], axis=1)[:, :, None, None]        # (B,3,1,1)
    c = jnp.stack([c1, c2, c3], axis=1)[:, :, None, None]
    s = jnp.stack([s1, s2, s3], axis=1)[:, :, :, None]           # (B,3,W,1)
    idx = d * iota_x[:, :, None, :] + c + s                       # (B,3,W,W)
    return idx.astype(jnp.int32), t1


# ---------------------------------------------------------------------------
# executors: reference (pure jnp, any backend) and Pallas kernel (TPU)
# ---------------------------------------------------------------------------


def _gather_stage(x: Array, idx: Array, w: int) -> Array:
    ok = (idx >= 0) & (idx < w)
    out = jnp.take_along_axis(x, jnp.clip(idx, 0, w - 1), axis=-1)
    return jnp.where(ok, out, jnp.zeros_like(out))


def reference_pipeline(planes: Array, idx: Array, t1: Array) -> Array:
    """Pure-jnp executor of the fixed pipeline (batched); used for tests and
    as the non-TPU fallback. planes (B,W,W), idx (B,3,W,W), t1 (B,)."""
    w = planes.shape[-1]
    x = _gather_stage(planes, idx[:, 0], w)
    x = jnp.swapaxes(x, -1, -2)
    x = _gather_stage(x, idx[:, 1], w)
    x = jnp.swapaxes(x, -1, -2)
    x = _gather_stage(x, idx[:, 2], w)
    xT = jnp.swapaxes(x, -1, -2)
    return jnp.where((t1 > 0)[:, None, None], xT, x)


_LANE = 128  # TPU vreg lane width; Mosaic gathers cannot cross it


def _lane_gather(x, idx, w):
    """out[r, c] = x[r, idx[r, c]] with zero fill for out-of-range indices.

    Mosaic lowers ``take_along_axis`` (lane axis) to ``tpu.dynamic_gather``,
    a within-vreg shuffle: the source may not span multiple vregs along the
    gather dimension ("Multiple source vregs along gather dimension" at
    W=256). For W > 128 the lane axis is therefore processed in 128-wide
    tiles: each output tile gathers from EVERY source tile with a
    tile-local clipped index and the contributions are selected by which
    tile the index falls in — nb² single-vreg gathers instead of one
    unsupported wide gather, all still at VMEM speed."""
    ok = (idx >= 0) & (idx < w)
    if w <= _LANE:
        g = jnp.take_along_axis(x, jnp.clip(idx, 0, w - 1), axis=1)
        return jnp.where(ok, g, jnp.zeros_like(g))
    assert w % _LANE == 0, w  # guarded in _execute
    nb = w // _LANE
    parts = []
    for j in range(nb):
        idx_j = idx[:, j * _LANE:(j + 1) * _LANE]
        acc = jnp.zeros_like(idx_j)
        for k in range(nb):
            src = x[:, k * _LANE:(k + 1) * _LANE]
            loc = jnp.clip(idx_j - k * _LANE, 0, _LANE - 1)
            g = jnp.take_along_axis(src, loc, axis=1)
            hit = (idx_j >= k * _LANE) & (idx_j < (k + 1) * _LANE)
            acc = jnp.where(hit, g, acc)
        parts.append(jnp.where(ok[:, j * _LANE:(j + 1) * _LANE], acc,
                               jnp.zeros_like(acc)))
    return jnp.concatenate(parts, axis=1)


def _kernel(bidx_ref, t1_ref, src_ref, idx_ref, out_ref):
    w = src_ref.shape[-1]
    x = src_ref[0, 0]                    # (S, S) int32, one plane of sample i
    for k in range(3):
        x = _lane_gather(x, idx_ref[0, k], w)
        if k < 2:
            x = x.T
    i = pl.program_id(0)
    out_ref[0, 0] = jnp.where(t1_ref[i] > 0, x.T, x)


def pallas_pipeline(packed: Array, batch_idx: Array, idx: Array, t1: Array,
                    *, interpret: bool = False) -> Array:
    """Kernel executor: per (sample, plane) grid step, DMA plane ``p`` of
    sample ``batch_idx[i]`` into VMEM (this is also the batch row selection)
    and run the three lane-gathers + transposes at VMEM speed. All planes of
    a sample reuse that sample's gather parameters.

    ``packed`` is (N,P,S,S); a legacy (N,S,S) single-plane stack is also
    accepted (and returned without the plane axis)."""
    legacy = packed.ndim == 3
    if legacy:
        packed = packed[:, None]
    n, p, h, w = packed.shape
    b = batch_idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, p),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j, bidx, t1: (bidx[i], j, 0, 0)),
            pl.BlockSpec((1, 3, h, w), lambda i, j, bidx, t1: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, j, bidx, t1: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, p, h, w), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(batch_idx.astype(jnp.int32), t1.astype(jnp.int32), packed, idx)
    return out[:, 0] if legacy else out


def _execute(packed: Array, batch_idx: Array, idx: Array, t1: Array, *,
             use_pallas: bool, interpret: bool) -> Array:
    w = packed.shape[-1]
    kernel_ok = w <= _LANE or w % _LANE == 0  # see _lane_gather
    if use_pallas and kernel_ok and _HAS_PLTPU and (
            interpret or jax.default_backend() == "tpu"):
        return pallas_pipeline(packed, batch_idx, idx, t1, interpret=interpret)
    planes = jnp.take(packed, batch_idx, axis=0)
    if planes.ndim == 4:  # (B,P,S,S): run the executor per plane
        return jax.vmap(reference_pipeline, in_axes=(1, None, None),
                        out_axes=1)(planes, idx, t1)
    return reference_pipeline(planes, idx, t1)


def fast_joint_transform(packed: Array, batch_idx: Array, key: jax.Array, *,
                         p_hflip: float = 0.5, p_vflip: float = 0.5,
                         max_angle: float = 360.0,
                         use_pallas: bool = True,
                         interpret: bool = False,
                         mesh=None,
                         fmt: "AugFormat | None" = None) -> Array:
    """Batch selection + joint flips/rotation on the packed fold stack.

    ``fmt=None`` (legacy): ``packed`` is a (N,S,S) ``pack_bf16x2`` stack and
    the result is the (B,S,S,2) bf16 [mask|image] batch. With an
    :class:`AugFormat` from :func:`pack_channels`, ``packed`` is (N,P,S,S)
    and the result is the cropped (B,H,W,C) batch in the compute dtype.

    Data-parallel meshes are supported by ``shard_map``-ing the executor over
    the ``'data'`` axis: the packed fold stack is replicated (matching
    ``Engine.device_data``'s placement), the per-sample gather parameters and
    batch rows shard on the batch axis, and each chip runs the Pallas kernel
    on its own B/n slice — GSPMD never sees the kernel, so no partitioning
    rule is needed. The flip/angle DRAWS happen once, outside the shard_map,
    so the augmented batch is bit-identical to the single-device path.

    2-D ``(data × space)`` meshes COMPOSE (round 5): ``'space'`` is simply
    unmentioned in the shard_map specs, so every space member of a data row
    computes that row's augmentation replicated (whole planes always fit a
    core's VMEM — one 256² int32 plane is 256 KB) and the training step's
    ``P('data','space')`` sharding constraints reshard rows over ``'space'``
    immediately after. The duplicated work along 'space' is the augmentation
    only (~2 ms/256-batch on the fast path) — a deliberate trade against a
    halo-exchanging spatially-sharded gather kernel that Mosaic cannot
    express (PARITY round-3: multi-vreg gather sources are rejected)."""
    import os
    # MTBC_FASTAUG_INTERPRET=1 forces the Pallas kernel in interpret mode —
    # lets CPU runs (tests, the multi-chip dryrun) execute the actual kernel
    # logic instead of the jnp fallback executor. Read at TRACE time: it must
    # be set before the Engine's first epoch traces; toggling it afterwards
    # has no effect on the cached compiled program.
    interpret = interpret or os.environ.get("MTBC_FASTAUG_INTERPRET") == "1"
    b = batch_idx.shape[0]
    w = packed.shape[-1]
    idx, t1 = build_pipeline_params(key, b, w, p_hflip=p_hflip,
                                    p_vflip=p_vflip, max_angle=max_angle)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        n_data = mesh.shape.get("data", 1)
        if b % n_data:
            raise ValueError(
                f"fast_augmentation under a data mesh needs batch_size ({b}) "
                f"divisible by the 'data' axis size ({n_data})")
        # 'space' (if present) is unmentioned ⇒ replicated augmentation per
        # space member; the caller reshards rows right after (see docstring)
        run = jax.shard_map(
            lambda p, bi, ix, t: _execute(p, bi, ix, t, use_pallas=use_pallas,
                                          interpret=interpret),
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P("data"), check_vma=False)
        out = run(packed, batch_idx, idx, t1)
    else:
        out = _execute(packed, batch_idx, idx, t1, use_pallas=use_pallas,
                       interpret=interpret)
    if fmt is None:
        return unpack_bf16x2(out)
    return unpack_channels(out, fmt)
