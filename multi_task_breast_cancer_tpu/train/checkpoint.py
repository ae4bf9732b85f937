"""Checkpointing: best-val checkpoints of the full train state.

Keeps the reference's checkpoint content contract — a dict of
``epoch / model state / optimizer state / val_loss``
(``training_multitask.py:243-249``) — serialised with flax msgpack. Restore
parity: ``load_pretrained_model`` loads model weights (+ batch stats) only,
like the reference whose optimizer restore is commented out
(``src/utils/models.py:29-31``). ``restore_checkpoint`` additionally restores
optimizer state, epoch and the host-side scheduler/early-stopping counters
(``resume_state``), enabling true mid-training resume (a capability the
reference lacks; the reference stores the literal string ``'scheduler'``
where scheduler state would go, ``training_multitask.py:247``).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple

import jax
from flax import serialization

from multi_task_breast_cancer_tpu.train.state import TrainState

# Flat float dict embedded in every checkpoint: scheduler state machine
# (plateau: lr/best/bad-epochs; cosine: lr/epoch) + driver early-stopping
# counters, plus a ``valid`` marker (0.0 = no resume info present — legacy
# file or save without counters). Fixed keys keep the msgpack template shape
# scheduler-agnostic.
EMPTY_RESUME_STATE: Dict[str, float] = {
    "valid": 0.0, "sched_lr": 0.0, "sched_best": 0.0, "sched_bad": 0.0,
    "sched_epoch": 0.0, "patience": 0.0, "best_val_loss": 0.0,
}


def save_checkpoint(path: str, state: TrainState, epoch: int, val_loss: float,
                    resume_state: Optional[Dict[str, float]] = None) -> None:
    rs = dict(EMPTY_RESUME_STATE)
    if resume_state is not None:
        rs.update(resume_state, valid=1.0)
    payload = {
        "epoch": epoch,
        "model_state_dict": {"params": state.params, "batch_stats": state.batch_stats},
        "optimizer_state_dict": state.opt_state,
        "val_loss": float(val_loss),
        "step": state.step,
        "resume_state": rs,
    }
    # atomic replace: a kill mid-write must never destroy the previous good
    # checkpoint or leave a truncated file (--resume depends on this)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)


def _template(state: TrainState) -> dict:
    return {
        "epoch": 0,
        "model_state_dict": {"params": state.params, "batch_stats": state.batch_stats},
        "optimizer_state_dict": state.opt_state,
        "val_loss": 0.0,
        "step": state.step,
        "resume_state": dict(EMPTY_RESUME_STATE),
    }


def _check_shapes(template: dict, payload: dict) -> None:
    """flax's from_bytes validates the KEY SET but silently restores
    mismatched leaf SHAPES; torch's load_state_dict (the reference restore,
    ``models.py:29-31``) errors on size mismatch — match that contract."""
    t_leaves = jax.tree_util.tree_leaves_with_path(template["model_state_dict"])
    p_leaves = jax.tree_util.tree_leaves(payload["model_state_dict"])
    bad = [(jax.tree_util.keystr(path), getattr(p, "shape", ()), t.shape)
           for (path, t), p in zip(t_leaves, p_leaves)
           if getattr(p, "shape", ()) != t.shape]
    if bad:
        detail = "; ".join(f"{k}: checkpoint {cs} vs model {ms}"
                           for k, cs, ms in bad[:5])
        raise ValueError(
            f"checkpoint does not fit this model: {len(bad)} parameter "
            f"shape mismatch(es) — wrong architecture/width? ({detail})")


def _load(path: str, template: dict) -> dict:
    if not os.path.isfile(path):
        raise ValueError(f"\n\t-> No checkpoint found at '{path}'")
    with open(path, "rb") as f:
        data = f.read()
    try:
        payload = serialization.from_bytes(template, data)
        _check_shapes(template, payload)
        return payload
    except ValueError:
        # flax raises ValueError for ANY missing target key; only fall back
        # when the serialized payload genuinely lacks the resume_state block
        # (a legacy checkpoint written before it existed) — a blanket retry
        # would mask real mismatches (wrong architecture/optimizer) behind a
        # confusing legacy-template error, or worse, silently restart a fold
        # from scratch on an internal resume_state key skew
        raw = serialization.msgpack_restore(data)
        if not (isinstance(raw, dict) and "resume_state" not in raw):
            raise
        legacy = {k: v for k, v in template.items() if k != "resume_state"}
        payload = serialization.from_bytes(legacy, data)
        _check_shapes(legacy, payload)
        payload["resume_state"] = dict(EMPTY_RESUME_STATE)
        return payload


def load_pretrained_model(state: TrainState, ckpt_path: str) -> TrainState:
    """Weights-only restore (reference parity)."""
    payload = _load(ckpt_path, _template(state))
    logging.info("Loaded checkpoint '%s'. Last epoch: %s", ckpt_path, payload["epoch"])
    return state.replace(params=payload["model_state_dict"]["params"],
                         batch_stats=payload["model_state_dict"]["batch_stats"])


def restore_checkpoint(state: TrainState, ckpt_path: str
                       ) -> Tuple[TrainState, int, float, Dict[str, float]]:
    """Full restore (params + optimizer + epoch + host scheduler/counter
    state) for mid-training resume."""
    payload = _load(ckpt_path, _template(state))
    state = state.replace(params=payload["model_state_dict"]["params"],
                          batch_stats=payload["model_state_dict"]["batch_stats"],
                          opt_state=payload["optimizer_state_dict"],
                          step=payload["step"])
    resume = {k: float(v) for k, v in payload["resume_state"].items()}
    return state, int(payload["epoch"]), float(payload["val_loss"]), resume
