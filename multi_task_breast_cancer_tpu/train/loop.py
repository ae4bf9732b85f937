"""The jitted training engine.

TPU-first design (vs the reference's per-batch Python loop with host↔device
syncs every step, ``src/training_multitask.py:74-159``):

- the whole fold lives in HBM; a **full epoch is one jitted ``lax.scan``** over
  batch index slices — zero host transfers inside the epoch;
- augmentation is part of the scanned step (pure function of a per-step key);
- epoch metrics (loss sums, batch Dice, classification confusion matrix)
  accumulate on device and sync to host once per epoch;
- data parallelism: batches get a ``NamedSharding(P('data'))`` constraint so
  XLA shards the step across the mesh and inserts the gradient all-reduce over
  ICI automatically (no hand-written collectives needed at this model scale);
- static shapes: the oversampled index array is padded to ``steps·B`` by
  wrap-around so every scan step sees identical shapes (the reference's final
  partial batch would force a recompile).

Tasks: 'segmentation' | 'classification' | 'multitask', covering the six
reference drivers (CV and CV_PROD modes share these epoch functions).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multi_task_breast_cancer_tpu.data.augment import joint_transform_stack_batch
from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.ops import losses as L
from multi_task_breast_cancer_tpu.ops import metrics as M
from multi_task_breast_cancer_tpu.train.state import TrainState

Array = jnp.ndarray


@dataclasses.dataclass
class EngineConfig:
    task: str                      # 'segmentation' | 'classification' | 'multitask'
    n_classes: int = 3
    batch_size: int = 2
    alpha: float = 0.35            # multitask loss weight: α·seg + (1-α)·cls
    inversely_weighted: bool = True
    seg_criterion: str = "DICE"
    cls_criterion: str = "Focal"
    classes_weighted: Optional[list] = None
    # joint geometric transforms (reference driver pipeline)
    use_transforms: bool = True
    p_hflip: float = 0.5
    p_vflip: float = 0.5
    max_angle: float = 360.0
    compute_dtype: str = "float32"  # 'bfloat16' casts activations for the MXU
    # 3-shear Pallas augmentation (PARITY D13): same flip/angle draws,
    # rotation resampled per shear — measured 8x faster than the exact-parity
    # gather on TPU v5e. Any channel count (augment channels pack pairwise in
    # bf16, one int32 plane each in f32); any dims (non-square embeds
    # centered in a padded square canvas; odd dims zero-pad one row/col with
    # a documented <=1-px deviation, see ops/fast_augment.pack_channels).
    # NOTE: the USER-FACING default (config.TrainingConfig.fast_augmentation,
    # wired through by the driver) is True since round 5 (quality evidence:
    # FASTAUG_QUALITY_r05.json). This engine-level default stays False so
    # direct Engine constructions — the torch-parity trajectory tests, the
    # golden-parity suite — keep torchvision-bit-exact semantics unless they
    # opt in.
    fast_augmentation: bool = False


def make_cls_targets(labels: np.ndarray, n_classes: int,
                     task: str = "classification") -> np.ndarray:
    """Reference target encoding: multiclass → one-hot float (``training_
    multitask.py:83-84``); binary → (B,1) float labels.

    ``task='segmentation'`` skips the label-range guard: seg-only training
    never consumes classification targets (the reference trains e.g.
    ``classes: [benign, normal]`` segmentation fine, label 2 and all), so the
    encoding is produced as inert scan payload without validation."""
    if task != "segmentation" and np.max(labels, initial=0) >= max(n_classes, 2):
        # the fixed reference LABEL_MAP (benign=0, malignant=1, normal=2,
        # BUSI_dataset.py:63-80) is never remapped for filtered class
        # subsets, so e.g. classes=['benign','normal'] feeds label 2 into a
        # binary BCE target and drops those rows from the confusion matrix —
        # fail fast instead of silently mis-training
        raise ValueError(
            f"label values up to {int(np.max(labels))} exceed "
            f"n_classes={n_classes}: the reference label map is fixed "
            "(benign=0, malignant=1, normal=2) and class subsets are not "
            "remapped — a 2-class config must use "
            "classes: [benign, malignant]")
    if n_classes > 2:
        return np.eye(n_classes, dtype=np.float32)[labels]
    return labels.astype(np.float32)[:, None]


def plan_epoch_indices(n: int, batch_size: int, rng: np.random.Generator,
                       pad_to_steps: Optional[int] = None) -> np.ndarray:
    """Shuffled index array padded to steps·B by wrap-around (static shapes).

    ``pad_to_steps`` pads further to a cross-fold maximum so the train scan
    compiles ONCE for all folds despite oversampling changing each fold's
    length — the extra steps are no-ops via the ``step_valid`` mask (see
    :func:`step_valid_mask`); only the natural ``ceil(n/B)`` steps train."""
    perm = rng.permutation(n)
    steps = -(-n // batch_size)
    if pad_to_steps is not None:
        steps = max(steps, pad_to_steps)
    pad = steps * batch_size - n
    if pad:
        reps = -(-pad // n)
        perm = np.concatenate([perm] + [perm] * reps)[:steps * batch_size]
    return perm.astype(np.int32)


def step_valid_mask(n: int, batch_size: int, total_steps: int) -> np.ndarray:
    """1.0 for the real ``ceil(n/B)`` steps, 0.0 for cross-fold padding steps."""
    real = -(-n // batch_size)
    return (np.arange(total_steps) < real).astype(np.float32)


class Engine:
    """Builds and caches the jitted epoch/eval/predict functions for one model
    + task configuration."""

    def __init__(self, model: nn.Module, tx: optax.GradientTransformation,
                 cfg: EngineConfig, mesh: Optional[Mesh] = None):
        self.model = model
        self.tx = tx
        self.cfg = cfg
        self.mesh = mesh
        # fast-augmentation packing descriptor: set by device_data, closed
        # over (statically) by the jitted epoch at first trace
        self._aug_fmt = None
        self._aug_n_mask = 1
        if mesh is not None and cfg.use_transforms and cfg.fast_augmentation:
            # spatial meshes compose: augmentation runs on the DATA axis
            # (whole planes fit any core's VMEM — one 256² int32 plane is
            # 256 KB), replicated along 'space', and the step's sharding
            # constraints reshard rows over 'space' right afterwards
            n_data = mesh.shape.get("data", 1)
            if n_data > 1 and cfg.batch_size % n_data:
                raise ValueError(
                    "fast_augmentation on a data-parallel mesh shard_maps "
                    f"the kernel over 'data'; batch_size ({cfg.batch_size}) "
                    f"must divide evenly over the {n_data} devices")
        if cfg.seg_criterion == "DICE":
            # custom-VJP fused dice: identical values/grads (tests), no
            # spatial tape — only two scalars per plane survive to backward
            from multi_task_breast_cancer_tpu.ops.fused_loss import fused_dice_criterion
            self._seg_crit = fused_dice_criterion
        else:
            self._seg_crit = L.init_criterion_segmentation(cfg.seg_criterion)
        self._cls_crit = L.init_criterion_classification(
            cfg.n_classes, cfg.classes_weighted, cfg.cls_criterion)
        self._train_epoch = jax.jit(self._train_epoch_impl, donate_argnums=(0,))
        self._eval_epoch = jax.jit(self._eval_epoch_impl)
        self._train_eval_epoch = jax.jit(self._train_eval_impl, donate_argnums=(0,))
        self._predict = jax.jit(self._predict_impl)

    # ------------------------------------------------------------------
    # forward + loss
    # ------------------------------------------------------------------

    def _apply(self, params, batch_stats, images, *, train: bool, rng=None):
        x = images
        if x.dtype == jnp.uint8:
            # serving path: uint8 PNG intensities cross the host→device link
            # as 1 byte/px and cast here (exactly representable either way)
            x = x.astype(self._compute_dt)
        if self.cfg.compute_dtype == "bfloat16":
            # true mixed precision: bf16 params + activations on the MXU;
            # master params stay f32 in the optimizer (normalisation layers
            # compute their statistics in f32 internally — see InstanceNorm)
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
            x = x.astype(jnp.bfloat16)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if train:
            out, updates = self.model.apply(variables, x, train=True, rngs=rngs,
                                            mutable=["batch_stats"])
            new_bs = updates.get("batch_stats", batch_stats)
            return out, new_bs
        return self.model.apply(variables, x, train=False), batch_stats

    @staticmethod
    def _as_f32(tree):
        return jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), tree)

    def _losses(self, out, masks, cls_targets) -> Tuple[Array, Dict[str, Array]]:
        cfg = self.cfg
        out = self._as_f32(out)
        if cfg.task == "segmentation":
            seg = out
            loss = L.apply_criterion_binary_segmentation(
                self._seg_crit, masks, seg, cfg.inversely_weighted)
            return loss, {"seg_out": seg}
        if cfg.task == "classification":
            self._check_cls_head(out)
            loss = L.apply_criterion_classification(self._cls_crit, cls_targets, out)
            return loss, {"cls_out": out}
        if isinstance(out, tuple) and len(out) == 3:
            # Adityan's (cls, reconstruction, seg) triple: the reference defines
            # this network but never wires it into any training routine
            # (AdityanNetwork.py is absent from the factory), so no reference
            # loss exists for the reconstruction head — it is excluded here and
            # the seg+cls pair trains with the standard multitask objective.
            cls, _, seg = out
        else:
            cls, seg = out
        self._check_cls_head(cls)
        seg_loss, cls_loss = L.apply_criterion_multitask(
            self._seg_crit, masks, seg, self._cls_crit, cls_targets, cls,
            cfg.inversely_weighted)
        loss = cfg.alpha * seg_loss + (1 - cfg.alpha) * cls_loss
        return loss, {"seg_out": seg, "cls_out": cls, "seg_loss": seg_loss,
                      "cls_loss": cls_loss}

    def _check_cls_head(self, cls_out) -> None:
        """Trace-time shape check: a classification head whose logit count
        disagrees with ``n_classes`` would otherwise train silently wrong
        via broadcasting — e.g. Multi_FSB_BTSUNet hard-codes ONE logit
        (``Multi_FSB_BTS_UNet.py:152``), so with 3 classes
        softmax_cross_entropy of a single logit is identically zero and the
        classifier never trains; Adityan hard-codes THREE. The reference
        crashes inside torch CrossEntropyLoss for these combinations; this
        port fails fast here instead (shapes are static, so the raise
        happens at trace time, never on device)."""
        head = cls_out[0] if isinstance(cls_out, (tuple, list)) else cls_out
        expected = self.cfg.n_classes if self.cfg.n_classes > 2 else 1
        if head.shape[-1] != expected:
            raise ValueError(
                f"classification head emits {head.shape[-1]} logits but "
                f"n_classes={self.cfg.n_classes} needs {expected} (binary "
                "collapses to 1 logit — reference parity). Architectures "
                "with hard-coded heads (Multi_FSB_BTSUNet: 1, Adityan: 3) "
                "only support the matching class count.")

    @staticmethod
    def _final_seg_head(seg_out):
        return seg_out[-1] if isinstance(seg_out, (tuple, list)) else seg_out

    @staticmethod
    def _mean_cls_head(cls_out):
        """Deep-supervised cls lists are averaged for prediction
        (``training_multitask.py:36-37``)."""
        if isinstance(cls_out, (tuple, list)):
            return jnp.mean(jnp.stack(cls_out, axis=0), axis=0)
        return cls_out

    def _step_metrics(self, aux, masks, labels_int, cm) -> Dict[str, Array]:
        cfg = self.cfg
        out: Dict[str, Array] = {}
        if "seg_out" in aux:
            out["dice"] = M.dice_from_logits_batch(masks, self._final_seg_head(aux["seg_out"]))
        if "cls_out" in aux:
            logits = self._mean_cls_head(aux["cls_out"])
            preds = M.predicted_labels_from_logits(logits, cfg.n_classes)
            out["cm"] = M.confusion_matrix_update(cm, labels_int, preds,
                                                  max(cfg.n_classes, 2))
        return out

    # ------------------------------------------------------------------
    # jitted epoch bodies
    # ------------------------------------------------------------------

    def _shard_batch(self, *arrays):
        """Anchor batch shardings for GSPMD propagation.

        1-D ``('data',)`` mesh: every array shards its leading (batch) axis.
        2-D ``('data', 'space')`` mesh (spatial partitioning): image-shaped
        arrays additionally shard their H axis over ``'space'`` — GSPMD keeps
        the conv stack spatially partitioned and inserts the halo exchanges
        itself (proven from the compiled HLO in
        ``tests/test_spatial.py``); per-sample reductions (instance-norm
        stats, dice plane sums, global pooling) become cross-'space'
        all-reduces. Vectors (labels/targets) stay sharded over 'data' only.
        """
        if self.mesh is None:
            return arrays
        spatial = "space" in self.mesh.axis_names
        out = []
        for a in arrays:
            spec = P("data", "space") if (spatial and a.ndim >= 3) else P("data")
            out.append(jax.lax.with_sharding_constraint(
                a, NamedSharding(self.mesh, spec)))
        return tuple(out)

    @property
    def _compute_dt(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    def _to_compute(self, *arrays):
        """Cast HBM-storage dtypes (uint8 for integral image/mask data) to the
        compute dtype right after the per-step gather — the gather then moves
        1 byte/px instead of 2 (bf16) or 4 (f32) of HBM traffic."""
        dt = self._compute_dt
        return tuple(a.astype(dt) if a.dtype != dt else a for a in arrays)

    def _train_epoch_impl(self, state: TrainState, images, masks, cls_targets,
                          labels_int, perm, key, step_valid=None,
                          aug_packed=None):
        cfg = self.cfg
        B = cfg.batch_size
        steps = perm.shape[0] // B
        idx = perm.reshape(steps, B)
        keys = jax.random.split(key, steps)
        n_cm = max(cfg.n_classes, 2)
        if step_valid is None:
            step_valid = jnp.ones((steps,), jnp.float32)

        def body(carry, xs):
            state, sums = carry
            batch_idx, k, valid = xs
            ctgt = jnp.take(cls_targets, batch_idx, axis=0)
            lint = jnp.take(labels_int, batch_idx, axis=0)
            k_aug, k_drop = jax.random.split(k)

            if cfg.use_transforms and aug_packed is not None:
                # opt-in FAST path (PARITY D13): batch selection + flips +
                # 3-shear rotation in one Pallas VMEM kernel on the packed
                # [masks|image channels] int32 planes — same flip/angle draws
                # as the exact path, rotation resampled per shear
                from multi_task_breast_cancer_tpu.ops.fast_augment import (
                    fast_joint_transform)
                stack = fast_joint_transform(
                    aug_packed, batch_idx, k_aug, p_hflip=cfg.p_hflip,
                    p_vflip=cfg.p_vflip, max_angle=cfg.max_angle,
                    mesh=self.mesh, fmt=self._aug_fmt[0])
                nm = self._aug_n_mask
                msks, imgs = stack[..., :nm], stack[..., nm:]
                imgs, msks, ctgt = self._shard_batch(imgs, msks, ctgt)
            else:
                imgs = jnp.take(images, batch_idx, axis=0)
                msks = jnp.take(masks, batch_idx, axis=0)
                # cast BEFORE the augmentation gather: fewer bytes would move
                # if the per-pixel gather ran on uint8, but 8-bit
                # take_along_axis lowers poorly on TPU (measured 20% slower
                # end-to-end) — only the contiguous row gather above benefits
                # from uint8 storage
                imgs, msks = self._to_compute(imgs, msks)
                imgs, msks, ctgt = self._shard_batch(imgs, msks, ctgt)
                if cfg.use_transforms:
                    n_mask = msks.shape[-1]
                    stack = jnp.concatenate([msks, imgs], axis=-1)
                    skeys = jax.random.split(k_aug, stack.shape[0])
                    stack = joint_transform_stack_batch(
                        stack, skeys, p_hflip=cfg.p_hflip, p_vflip=cfg.p_vflip,
                        max_angle=cfg.max_angle)
                    msks, imgs = stack[..., :n_mask], stack[..., n_mask:]

            def loss_fn(params):
                out, new_bs = self._apply(params, state.batch_stats, imgs,
                                          train=True, rng=k_drop)
                loss, aux = self._losses(out, msks, ctgt)
                return loss, (aux, new_bs)

            (loss, (aux, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=new_params, batch_stats=new_bs,
                                   opt_state=new_opt, step=state.step + 1)
            # cross-fold padding steps are no-ops: keep the old state wholesale
            # (a zero-grad Adam step would still decay the moments)
            state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(valid > 0, new, old), new_state, state)

            sm = self._step_metrics(aux, msks, lint, sums["cm"])
            sums = {
                "loss": sums["loss"] + valid * loss,
                "seg_loss": sums["seg_loss"] + valid * aux.get("seg_loss", 0.0),
                "cls_loss": sums["cls_loss"] + valid * aux.get("cls_loss", 0.0),
                "dice": sums["dice"] + valid * sm.get("dice", 0.0),
                "cm": jnp.where(valid > 0, sm.get("cm", sums["cm"]), sums["cm"]),
            }
            return (state, sums), None

        init = {"loss": jnp.zeros(()), "seg_loss": jnp.zeros(()),
                "cls_loss": jnp.zeros(()), "dice": jnp.zeros(()),
                "cm": jnp.zeros((n_cm, n_cm))}
        (state, sums), _ = jax.lax.scan(body, (state, init),
                                        (idx, keys, step_valid))

        n_real = jnp.maximum(jnp.sum(step_valid), 1.0)
        metrics = {
            "loss": sums["loss"] / n_real,
            "seg_loss": sums["seg_loss"] / n_real,
            "cls_loss": sums["cls_loss"] / n_real,
            "dice": sums["dice"] / n_real,
            "acc": M.accuracy_from_cm(sums["cm"]),
            "f1": M.f1_weighted_from_cm(sums["cm"]),
            # flavour used by the classification driver: micro-F1 over a fixed
            # label set equals accuracy; binary F1 takes class 1 as positive
            "f1_micro": M.accuracy_from_cm(sums["cm"]),
            "f1_binary": self._binary_f1(sums["cm"]),
        }
        return state, metrics

    @staticmethod
    def _binary_f1(cm):
        tp = cm[1, 1]
        fp = cm[0, 1]
        fn = cm[1, 0]
        return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-12)

    def _eval_epoch_impl(self, state: TrainState, images, masks, cls_targets,
                         labels_int):
        """Validation pass: the whole split as one batch (val sets are tiny;
        statistically equivalent to the reference's mean-over-batches)."""
        cfg = self.cfg
        n_cm = max(cfg.n_classes, 2)
        images, masks = self._to_compute(images, masks)
        (images, masks, cls_targets) = self._shard_batch(images, masks, cls_targets)
        out, _ = self._apply(state.params, state.batch_stats, images, train=False)
        loss, aux = self._losses(out, masks, cls_targets)
        sm = self._step_metrics(aux, masks, labels_int, jnp.zeros((n_cm, n_cm)))
        has_cm = "cm" in sm
        return {
            "loss": loss,
            "seg_loss": aux.get("seg_loss", jnp.zeros(())),
            "cls_loss": aux.get("cls_loss", jnp.zeros(())),
            "dice": sm.get("dice", jnp.zeros(())),
            "acc": M.accuracy_from_cm(sm["cm"]) if has_cm else jnp.zeros(()),
            "f1": M.f1_weighted_from_cm(sm["cm"]) if has_cm else jnp.zeros(()),
            "f1_micro": M.accuracy_from_cm(sm["cm"]) if has_cm else jnp.zeros(()),
            "f1_binary": self._binary_f1(sm["cm"]) if has_cm else jnp.zeros(()),
        }

    def _train_eval_impl(self, state: TrainState, t_images, t_masks, t_cls, t_lint,
                         perm, key, v_images, v_masks, v_cls, v_lint,
                         step_valid=None, aug_packed=None):
        """Train epoch + validation pass in ONE device program: halves the
        per-epoch dispatch/fetch round-trips (significant on remote-tunnel
        runtimes) and lets XLA overlap the tail of training with eval setup."""
        state, tmetrics = self._train_epoch_impl(
            state, t_images, t_masks, t_cls, t_lint, perm, key, step_valid,
            aug_packed)
        vmetrics = self._eval_epoch_impl(state, v_images, v_masks, v_cls, v_lint)
        return state, tmetrics, vmetrics

    def _predict_impl(self, state: TrainState, images):
        (images,) = self._shard_batch(images)
        out, _ = self._apply(state.params, state.batch_stats, images, train=False)
        out = self._as_f32(out)
        if self.mesh is not None:
            # batch sharded over 'data' for the forward (per-device work is
            # 1/n — multi-chip inference/serving throughput), then outputs
            # gathered replicated: multi-host processes cannot fetch shards
            # they don't own, and host-side postprocessing wants full arrays
            rep = NamedSharding(self.mesh, P())
            out = jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(a, rep), out)
        return out

    # ------------------------------------------------------------------
    # public API (host-side, converts once per epoch)
    # ------------------------------------------------------------------

    @staticmethod
    def _fetch_metrics(metrics: Dict[str, Any]) -> Dict[str, float]:
        """Stack scalar metrics on device and fetch with ONE transfer — on
        remote-tunnel TPU runtimes every separate ``float(x)`` is a full RPC
        round-trip (~180 ms/epoch measured for 6 metrics)."""
        names = sorted(metrics)
        vec = np.asarray(jnp.stack([metrics[k] for k in names]))
        return dict(zip(names, vec.astype(float).tolist()))

    def train_epoch(self, state: TrainState, data: Dict[str, Any], perm: np.ndarray,
                    key: jax.Array, step_valid: Optional[np.ndarray] = None
                    ) -> Tuple[TrainState, Dict[str, float]]:
        sv = None if step_valid is None else jnp.asarray(step_valid)
        self._check_aug_fmt(data)
        state, metrics = self._train_epoch(
            state, data["images"], data["masks"], data["cls_targets"],
            data["labels_int"], jnp.asarray(perm), key, sv,
            data.get("aug_packed"))
        return state, self._fetch_metrics(metrics)

    def _check_aug_fmt(self, data: Dict[str, Any]) -> None:
        """A packed-augmentation batch is only usable on the Engine whose
        ``device_data`` built it (the packing format is closed over at trace
        time) — fail with a clear message instead of a NoneType subscript."""
        if data.get("aug_packed") is not None and self._aug_fmt is None:
            raise ValueError(
                "data contains 'aug_packed' but this Engine has no traced "
                "augmentation format — pass data built by THIS Engine's "
                "device_data (fast_augmentation packing is per-Engine)")

    def eval_epoch(self, state: TrainState, data: Dict[str, Any]) -> Dict[str, float]:
        metrics = self._eval_epoch(state, data["images"], data["masks"],
                                   data["cls_targets"], data["labels_int"])
        return self._fetch_metrics(metrics)

    def train_and_eval_epoch(self, state: TrainState, train_data: Dict[str, Any],
                             val_data: Dict[str, Any], perm: np.ndarray,
                             key: jax.Array,
                             step_valid: Optional[np.ndarray] = None
                             ) -> Tuple[TrainState, Dict[str, float], Dict[str, float]]:
        """One device program + one metric fetch for train epoch + validation."""
        sv = None if step_valid is None else jnp.asarray(step_valid)
        self._check_aug_fmt(train_data)
        state, tm, vm = self._train_eval_epoch(
            state, train_data["images"], train_data["masks"],
            train_data["cls_targets"], train_data["labels_int"],
            jnp.asarray(perm), key,
            val_data["images"], val_data["masks"],
            val_data["cls_targets"], val_data["labels_int"], sv,
            train_data.get("aug_packed"))
        both = {f"t_{k}": v for k, v in tm.items()}
        both.update({f"v_{k}": v for k, v in vm.items()})
        fetched = self._fetch_metrics(both)
        tmf = {k[2:]: v for k, v in fetched.items() if k.startswith("t_")}
        vmf = {k[2:]: v for k, v in fetched.items() if k.startswith("v_")}
        return state, tmf, vmf

    def predict(self, state: TrainState, images, max_batch: int = 1024,
                pad_to: Optional[int] = None) -> Any:
        """Batched inference. Sets ≤ ``max_batch`` run as one forward; larger
        sets run in fixed-size chunks (last chunk wrap-padded so every chunk
        reuses one compiled program) and the outputs are concatenated.

        ``pad_to`` wrap-pads the batch to a cross-fold maximum size and trims
        the outputs back, so per-fold test-set size differences reuse one
        compiled forward program."""
        images = jnp.asarray(images)
        if self.mesh is not None and not isinstance(images.sharding, NamedSharding):
            # host/test images become global replicated arrays so the forward
            # can mix them with the (global) trained state under a mesh —
            # required on multi-host, free on a single host
            from multi_task_breast_cancer_tpu.parallel.mesh import replicate_to_mesh
            images = replicate_to_mesh(self.mesh, images)
        n = images.shape[0]
        if n == 0:
            raise ValueError("predict: empty batch (images has 0 rows)")
        if pad_to is not None and n < pad_to:
            reps = -(-(pad_to - n) // n)
            images = jnp.concatenate([images] + [images] * reps, axis=0)[:pad_to]
            out = self.predict(state, images, max_batch=max_batch)
            return jax.tree_util.tree_map(lambda a: a[:n], out)
        if n <= max_batch:
            return self._predict(state, images)
        steps = -(-n // max_batch)
        pad = steps * max_batch - n
        if pad:
            images = jnp.concatenate([images, images[:pad]], axis=0)
        outs = [self._predict(state, images[i * max_batch:(i + 1) * max_batch])
                for i in range(steps)]
        merged = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        return jax.tree_util.tree_map(lambda a: a[:n], merged)

    @staticmethod
    def _storage_dtype(a: np.ndarray, fallback) -> Any:
        """uint8 when the data is integral in [0,255] (PNG intensities /
        binary masks — the whole real pipeline), else the compute dtype.
        uint8 storage quarters (vs f32) or halves (vs bf16) the bytes the
        per-step gather moves through HBM; the in-step cast back is free
        (fused into the gather's consumer). Values are exactly representable
        either way, so the training trajectory is bit-identical.

        ``MTBC_UINT8_STORAGE=0`` disables (A/B lever: 8-bit gathers can lower
        poorly on some TPU toolchains)."""
        import os
        if os.environ.get("MTBC_UINT8_STORAGE", "1") == "0":
            return fallback
        if (np.issubdtype(a.dtype, np.integer) or np.all(a == np.rint(a))) \
                and a.size and 0 <= a.min() and a.max() <= 255:
            return jnp.uint8
        return fallback

    def device_data(self, ds: ArrayDataset, pad_to: Optional[int] = None,
                    *, for_training: bool = True) -> Dict[str, Any]:
        """Transfer one split to device arrays (once per fold).

        Integral image/mask data (the real pipeline: PNG intensities 0..255,
        binary masks) is stored as uint8 in HBM and cast to the compute dtype
        after the per-step gather — see :meth:`_storage_dtype`.

        ``pad_to`` wrap-pads the sample axis to a cross-fold maximum so every
        fold's arrays share one shape (oversampling varies fold sizes); padded
        rows are never gathered — epoch index plans only reference real rows.

        Under a mesh the fold arrays are placed REPLICATED across all devices
        up front (the compiled epoch's preferred input sharding — verified
        via ``compiled.input_shardings``); left on the default device they
        would be re-broadcast from device 0 on EVERY epoch call on a real
        multi-chip mesh. A ~450-image fold is small; replication is the right
        trade (per-step row gathers then run fully parallel with no
        cross-device traffic)."""
        def _pad(a: np.ndarray) -> np.ndarray:
            n = a.shape[0]
            if pad_to is None or n >= pad_to:
                return a
            if n == 0:
                raise ValueError("device_data: empty dataset cannot be "
                                 f"wrap-padded to {pad_to} rows")
            reps = -(-(pad_to - n) // n)
            return np.concatenate([a] + [a] * reps, axis=0)[:pad_to]

        dt = self._compute_dt
        data = {
            "images": jnp.asarray(_pad(ds.images), self._storage_dtype(ds.images, dt)),
            "masks": jnp.asarray(_pad(ds.masks), self._storage_dtype(ds.masks, dt)),
            "cls_targets": jnp.asarray(
                _pad(make_cls_targets(ds.labels, self.cfg.n_classes,
                                      self.cfg.task))),
            "labels_int": jnp.asarray(_pad(ds.labels)),
        }
        # fast-aug packed planes are only read by the TRAIN epoch — packing
        # val/test splits (for_training=False) would replicate dead int32
        # copies of each split to every device
        if for_training and self.cfg.use_transforms and self.cfg.fast_augmentation:
            from multi_task_breast_cancer_tpu.ops.fast_augment import pack_channels
            # [masks|image(+augment channels)] — any channel count, bf16 or
            # f32 compute, even (possibly non-square) dims; pack_channels
            # embeds centered in a kernel-compatible square canvas and packs
            # channels into int32 planes (pairs for bf16, one each for f32)
            stack = np.concatenate([_pad(ds.masks), _pad(ds.images)], axis=-1)
            planes, fmt = pack_channels(jnp.asarray(stack, np.float32),
                                        self.cfg.compute_dtype)
            # the mask/image split is part of the traced format too: a stack
            # with the same total channel count but a different mask count
            # would silently mis-split inside the cached jitted epoch
            n_mask = ds.masks.shape[-1]
            if self._aug_fmt is not None and \
                    self._aug_fmt != (fmt, n_mask):
                raise ValueError(
                    "this Engine's jitted epoch was traced for augmentation "
                    f"format {self._aug_fmt}; a new Engine is needed for "
                    f"{(fmt, n_mask)}")
            self._aug_fmt = (fmt, n_mask)
            self._aug_n_mask = n_mask
            data["aug_packed"] = planes
        if self.mesh is not None:
            from multi_task_breast_cancer_tpu.parallel.mesh import replicate_to_mesh
            data = replicate_to_mesh(self.mesh, data)
        return data
