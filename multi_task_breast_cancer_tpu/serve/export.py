"""Ahead-of-time model export for serving (``jax.export`` / StableHLO).

A serving artifact is a directory:

    manifest.json       task / classes / input geometry / buckets / versions
    weights.npz         flat ``path -> array`` dump of the model variables
    fwd_b{B}.jaxexport  serialized exported forward per batch bucket B

Design points (TPU-first):

- **Fixed batch buckets** instead of dynamic shapes: XLA compiles one
  program per bucket; requests pad to the smallest bucket that fits, so
  serving never retraces or recompiles online.
- **Weights are an argument, not a constant**: the exported functions take
  the variables pytree as input, so ``weights.npz`` can be hot-swapped
  (e.g. a newly fine-tuned checkpoint) without re-exporting, and N buckets
  don't embed N copies of the parameters.
- **Multi-platform lowering** (``platforms=('cpu','tpu')`` by default): one
  artifact serves on a TPU host and on a CPU fallback box alike.
- Loading an artifact needs jax but NOT the model zoo / Flax module code —
  the graph is frozen StableHLO (the torch reference would need the full
  model source + torch to deserialize its ``.tar`` pickles,
  ``training_multitask.py:243-249``).
- **Device-side postprocessing** (``device_postprocess=True``): the exported
  function emits the *serving answer* instead of raw model outputs — class
  probabilities (f32), the thresholded/argmaxed mask as **uint8**, and the
  per-image tumor-pixel / per-label counts the prediction-refinement rule
  needs. The raw export transfers every deep-supervision head in f32
  (~90 KB/img for the flagship); the compact form is ~16 KB/img and the
  host-side sigmoid/argmax/sum passes disappear — on a tunnel-attached TPU
  the transfer, not the compute, dominates serving throughput.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MANIFEST = "manifest.json"
WEIGHTS = "weights.npz"
_SEP = "/"


def _next_pow2(n: int) -> int:
    return 1 << max(0, n - 1).bit_length() if n > 1 else 1


def _flatten_variables(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(variables)
    out = {}
    for path, leaf in flat:
        key = _SEP.join(str(getattr(p, "key", p)) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _unflatten_variables(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def _compact_outputs(out, task: str, n_classes: int,
                     softmax_in_forward: bool) -> Dict[str, jnp.ndarray]:
    """Raw model output pytree → the compact on-device serving answer.

    Branch-for-branch twin of :func:`..serve.post.postprocess` (which decodes
    raw outputs on the host); parity between the two paths is asserted by
    ``tests/test_serving.py``. All branching is on static structure/shapes, so
    this traces into one fused XLA program per bucket.

    Keys: ``probs`` f32 (B, n_classes)|(B, 1); ``mask`` uint8 (B, H, W)
    (binary tumor mask, or per-pixel label map for semantic >1-channel
    heads); ``tumor_pixels`` int32 (B,) for binary masks;
    ``label_counts`` int32 (B, C) per-label pixel counts for semantic maps
    (carries the reference pixel vote, ``models.py:152-158``)."""

    def cls_probs(cls_out):
        if isinstance(cls_out, (tuple, list)):  # mean over DS cls heads
            logits = jnp.mean(jnp.stack(cls_out, 0), 0)
        else:
            logits = cls_out
        if softmax_in_forward:  # forward already normalised (nnUNet quirk)
            return logits
        return (jax.nn.softmax(logits, axis=-1) if n_classes > 2
                else jax.nn.sigmoid(logits))

    compact: Dict[str, jnp.ndarray] = {}
    if task == "classification":
        compact["probs"] = cls_probs(out)
        return compact

    seg_out = out
    if task == "multitask":
        if isinstance(out, (tuple, list)) and len(out) == 3:
            cls_out, _, seg_out = out  # Adityan: (cls, reconstruction, seg)
        else:
            cls_out, seg_out = out
        compact["probs"] = cls_probs(cls_out)
    final = seg_out[-1] if isinstance(seg_out, (tuple, list)) else seg_out
    if final.shape[-1] > 1:  # semantic: per-pixel label map + pixel vote
        labels = jnp.argmax(final, axis=-1).astype(jnp.uint8)
        compact["mask"] = labels
        one_hot = jax.nn.one_hot(labels, final.shape[-1], dtype=jnp.int32)
        compact["label_counts"] = one_hot.sum(axis=(1, 2))
    else:  # binary: sigmoid(x) > 0.5  ⇔  x > 0
        mask = (final[..., 0] > 0).astype(jnp.uint8)
        compact["mask"] = mask
        compact["tumor_pixels"] = mask.astype(jnp.int32).sum(axis=(1, 2))
    return compact


def export_inference(cfg, task: str, checkpoint: str, out_dir: str | Path,
                     buckets: Sequence[int] = (1, 8, 64),
                     size: int = 128,
                     platforms: Sequence[str] = ("cpu", "tpu"),
                     device_postprocess: bool = False) -> Path:
    """Compile a trained checkpoint into a serving artifact directory."""
    from multi_task_breast_cancer_tpu.serve.post import model_applies_softmax
    from multi_task_breast_cancer_tpu.train.driver import build_inference_state

    model, _, state, channels = build_inference_state(cfg, task, size=size,
                                                      checkpoint=checkpoint)

    variables: Dict[str, Any] = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    compute_dtype = cfg.training.compute_dtype
    n_classes = len(cfg.data.classes)
    softmax_in_forward = model_applies_softmax(task, cfg.model.architecture,
                                               n_classes)

    def fwd(variables, images):
        v, x = variables, images
        if compute_dtype == "bfloat16":
            v = dict(v)
            v["params"] = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, v["params"])
            x = x.astype(jnp.bfloat16)
        out = model.apply(v, x, train=False)
        out = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), out)
        if device_postprocess:
            return _compact_outputs(out, task, n_classes, softmax_in_forward)
        return out

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    var_shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
    buckets = sorted(set(int(b) for b in buckets))
    for b in buckets:
        exp = jax.export.export(jax.jit(fwd), platforms=tuple(platforms))(
            var_shapes, jax.ShapeDtypeStruct((b, size, size, channels),
                                             jnp.float32))
        (out_dir / f"fwd_b{b}.jaxexport").write_bytes(exp.serialize())
        logging.info("exported bucket B=%d", b)

    np.savez(out_dir / WEIGHTS, **_flatten_variables(variables))
    manifest = {
        "task": task,
        "architecture": cfg.model.architecture,
        "n_classes": len(cfg.data.classes),
        "classes": list(cfg.data.classes),
        "size": size,
        "channels": channels,
        "buckets": buckets,
        "platforms": list(platforms),
        "compute_dtype": compute_dtype,
        "augmentation": cfg.data.augmentation.as_dict(),
        "pipeline_refinement": bool(cfg.training.overlap_class_based_on_seg),
        "softmax_in_forward": softmax_in_forward,
        "device_postprocess": bool(device_postprocess),
        "semantic_segmentation": bool(cfg.data.semantic_segmentation),
        "jax_version": jax.__version__,
        "checkpoint": str(checkpoint),
    }
    (out_dir / MANIFEST).write_text(json.dumps(manifest, indent=2))
    logging.info("serving artifact written to %s", out_dir)
    return out_dir


@jax.jit
def _pack_mask_bits(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) uint8 {0,1} → (B, H, W//8) uint8, np.unpackbits-compatible
    (big bit order): 8× fewer bytes for the device→host mask fetch."""
    b, h, w = mask.shape
    bits = mask.reshape(b, h, w // 8, 8).astype(jnp.int32)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)


class ExportedModel:
    """A loaded serving artifact: bucketed, padded, chunked batch inference.

    ``predict`` accepts any leading batch size: it pads up to the smallest
    compiled bucket that fits (wrap-padding with the last image so padded
    rows stay in-distribution), or chunks by the largest bucket for
    oversized batches — every device execution reuses a pre-compiled
    program.

    **Transfer minimisation** (the tunnel/PCIe link, not the forward, is
    the artifact path's bottleneck): the padding rows never cross the
    host↔device link. Inputs are host-padded only to the next power of two
    and device-padded the rest of the way to the bucket; outputs are
    device-sliced back to the next power of two before the host fetch.
    Power-of-two snapping bounds the auxiliary pad/slice programs to
    ≤log2(bucket) shapes per bucket while capping the transferred overhead
    at 2× the live rows (vs bucket/n — 8.5× for a 30-image micro-batch in
    a 256 bucket).

    **Data parallelism** (``data_parallel=True``, the default): batches
    larger than the smallest bucket are sharded across ALL local devices —
    each device holds its own committed copy of the weights (materialised
    lazily on first use) and runs the per-shard bucket program; dispatches
    are issued back-to-back (async) and fetched together, so wall-clock is
    one shard, not the sum. The deployable-artifact path thereby scales with
    chips exactly like the live ``CheckpointBackend``.

    **Byte-packing on the wire** (round 5 — the link, not the forward, is
    the measured bound, ``SERVING_r05.json``):

    - uint8 inputs ride the host→device link as-is and cast to f32 ON the
      device (4× fewer upload bytes; the exported program's f32 signature
      is untouched). Raw PNG intensities are exactly representable, so the
      result is bit-identical to sending f32.
    - with ``packed_transfer`` (default on), a device-postprocessed
      artifact's binary tumor mask is bit-packed to 1 bit/px on the device
      (one tiny jitted dot per bucket shape, np.unpackbits bit order) and
      unpacked on the host after the fetch — 8× fewer download bytes for
      the dominant leaf, same ``predict`` output contract to the byte.
      Semantic label maps (multi-valued) and raw-logit artifacts pass
      through unchanged."""

    def __init__(self, path: str | Path, data_parallel: bool = True,
                 packed_transfer: bool = True):
        self.path = Path(path)
        self.manifest = json.loads((self.path / MANIFEST).read_text())
        with np.load(self.path / WEIGHTS) as z:
            self.variables = _unflatten_variables({k: z[k] for k in z.files})
        # local_devices, not devices: on a multi-process run jax.devices()
        # lists the other processes' non-addressable devices, and device_put
        # to one raises
        if data_parallel:
            self._devices = list(jax.local_devices())
        else:
            # honor an active ``jax.default_device`` so one process can pin
            # separate single-device replicas to different chips
            dflt = None
            try:
                from jax._src import config as _jax_config
                dflt = _jax_config.default_device.value
                if isinstance(dflt, str):
                    dflt = jax.local_devices(backend=dflt)[0]
            except Exception:
                dflt = None
            self._devices = [dflt if dflt is not None
                             else jax.local_devices()[0]]
        # Commit the weights to the device ONCE per device used: jax.Arrays
        # are reused across exported calls, numpy leaves would be re-uploaded
        # host→device on every predict (~63 MB/batch for the flagship — on a
        # tunnel TPU that transfer, not the compute, would dominate serving
        # latency). Device 0 is eager; replicas materialise on first use.
        self.variables = jax.device_put(self.variables, self._devices[0])
        self._var_copies: Dict[Any, Any] = {self._devices[0]: self.variables}
        self.buckets = sorted(self.manifest["buckets"])
        self._fns: Dict[int, Any] = {}
        self._packed = bool(packed_transfer
                            and self.manifest.get("device_postprocess", False))

    def _fn(self, bucket: int):
        if bucket not in self._fns:
            data = (self.path / f"fwd_b{bucket}.jaxexport").read_bytes()
            self._fns[bucket] = jax.export.deserialize(data).call
        return self._fns[bucket]

    def _vars_on(self, device):
        if device not in self._var_copies:
            self._var_copies[device] = jax.device_put(self.variables, device)
        return self._var_copies[device]

    def _dispatch(self, images: np.ndarray, bucket: int, device=None):
        """Issue one bucket execution (async); returns (device outputs, n).

        Host-pads only to the next power of two and pads the remaining rows
        on the device (broadcast of the last row) so the host→device upload
        moves O(next_pow2(n)) rows, not the full bucket. uint8 inputs cross
        the link as uint8 and cast to the exported f32 signature on-device."""
        n = images.shape[0]
        device = device or self._devices[0]
        p = min(bucket, _next_pow2(n))
        if n < p:
            pad = np.repeat(images[-1:], p - n, axis=0)
            images = np.concatenate([images, pad], axis=0)
        if images.dtype != np.uint8:
            images = images.astype(np.float32)
        x = jax.device_put(images, device)
        if p < bucket:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (bucket - p,) + x.shape[1:])])
        if x.dtype != jnp.float32:
            x = x.astype(jnp.float32)
        out = self._fn(bucket)(self._vars_on(device), x)
        if self._packed and isinstance(out, dict) and "mask" in out \
                and "tumor_pixels" in out and out["mask"].shape[-1] % 8 == 0:
            out = dict(out)
            out["mask_packed"] = _pack_mask_bits(out.pop("mask"))
        return out, n

    @staticmethod
    def _fetch(dispatched):
        def _leaf(a, m):
            # device-side slice to the next power of two before the host
            # fetch: padded rows beyond it never ride the tunnel/PCIe link
            p = _next_pow2(m)
            if p < a.shape[0]:
                a = a[:p]
            return np.asarray(a)[:m]

        outs = [jax.tree_util.tree_map(lambda a, m=n: _leaf(a, m), out)
                for out, n in dispatched]
        if len(outs) == 1:
            merged = outs[0]
        else:
            merged = jax.tree_util.tree_map(
                lambda *parts: np.concatenate(parts, axis=0), *outs)
        if isinstance(merged, dict) and "mask_packed" in merged:
            merged = dict(merged)
            merged["mask"] = np.unpackbits(merged.pop("mask_packed"), axis=-1)
        return merged

    def _fit_bucket(self, size: int) -> int:
        """Smallest compiled bucket that holds ``size`` images — the single
        source of truth for bucket choice (dispatch AND the cost model)."""
        return next(b for b in self.buckets if b >= size)

    def _plan(self, n: int) -> list:
        """Bucket sizes a serial execution of n images would run (chunks of
        the largest bucket, tail padded into the smallest fitting bucket).
        The sum is the padded per-device work — the dp-engagement cost model."""
        top, plan, i = self.buckets[-1], [], 0
        while i < n:
            take = min(n - i, top)
            plan.append(self._fit_bucket(take))
            i += take
        return plan

    def predict(self, images: np.ndarray):
        n = images.shape[0]
        if n == 0:
            raise ValueError("empty batch: images has 0 rows")
        top = self.buckets[-1]
        ndev = len(self._devices)
        if ndev > 1 and n > self.buckets[0]:
            # engage data parallelism only when it WINS: per-device slices
            # pad up to a compiled bucket, so with a sparse bucket list a
            # small shard can cost as much padded work as the whole serial
            # batch (8 devices each running the full bucket = 8x the FLOPs).
            # Wall-clock model: serial = sum of its bucket plan; dp = the
            # largest single device's plan (devices run concurrently).
            shard = -(-n // ndev)
            if shard > top:  # chunk per device by the largest bucket
                shard = top * (-(-n // (top * ndev)))
            if sum(self._plan(shard)) < sum(self._plan(n)):
                dispatched = []
                for i in range(0, n, shard):
                    sl = images[i:i + shard]
                    chunk_dev = self._devices[(i // shard) % ndev]
                    for j in range(0, sl.shape[0], top):
                        part = sl[j:j + top]
                        dispatched.append(self._dispatch(
                            part, self._fit_bucket(part.shape[0]), chunk_dev))
                return self._fetch(dispatched)
        if n <= top:
            return self._fetch([self._dispatch(images, self._fit_bucket(n))])
        # serial chunking: the tail chunk fits a smaller bucket — keep this
        # consistent with _plan, which models exactly this execution
        return self._fetch([
            self._dispatch(part, self._fit_bucket(part.shape[0]))
            for part in (images[i:i + top] for i in range(0, n, top))])


def load_exported(path: str | Path, data_parallel: bool = True,
                  packed_transfer: bool = True) -> ExportedModel:
    return ExportedModel(path, data_parallel=data_parallel,
                         packed_transfer=packed_transfer)
