"""Checkpointing: best-val checkpoints of the full train state.

Keeps the reference's checkpoint content contract — a dict of
``epoch / model state / optimizer state / val_loss``
(``training_multitask.py:243-249``) — serialised with flax msgpack. Restore
parity: ``load_pretrained_model`` loads model weights (+ batch stats) only,
like the reference whose optimizer restore is commented out
(``src/utils/models.py:29-31``). ``restore_checkpoint`` additionally restores
optimizer state and epoch, enabling true mid-training resume (a capability the
reference lacks).
"""

from __future__ import annotations

import logging
import os
from typing import Tuple

from flax import serialization

from multi_task_breast_cancer_tpu.train.state import TrainState


def save_checkpoint(path: str, state: TrainState, epoch: int, val_loss: float) -> None:
    payload = {
        "epoch": epoch,
        "model_state_dict": {"params": state.params, "batch_stats": state.batch_stats},
        "optimizer_state_dict": state.opt_state,
        "val_loss": float(val_loss),
        "step": state.step,
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def _load(path: str, template: dict) -> dict:
    if not os.path.isfile(path):
        raise ValueError(f"\n\t-> No checkpoint found at '{path}'")
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_pretrained_model(state: TrainState, ckpt_path: str) -> TrainState:
    """Weights-only restore (reference parity)."""
    template = {
        "epoch": 0,
        "model_state_dict": {"params": state.params, "batch_stats": state.batch_stats},
        "optimizer_state_dict": state.opt_state,
        "val_loss": 0.0,
        "step": state.step,
    }
    payload = _load(ckpt_path, template)
    logging.info("Loaded checkpoint '%s'. Last epoch: %s", ckpt_path, payload["epoch"])
    return state.replace(params=payload["model_state_dict"]["params"],
                         batch_stats=payload["model_state_dict"]["batch_stats"])


def restore_checkpoint(state: TrainState, ckpt_path: str) -> Tuple[TrainState, int, float]:
    """Full restore (params + optimizer + epoch) for mid-training resume."""
    template = {
        "epoch": 0,
        "model_state_dict": {"params": state.params, "batch_stats": state.batch_stats},
        "optimizer_state_dict": state.opt_state,
        "val_loss": 0.0,
        "step": state.step,
    }
    payload = _load(ckpt_path, template)
    state = state.replace(params=payload["model_state_dict"]["params"],
                          batch_stats=payload["model_state_dict"]["batch_stats"],
                          opt_state=payload["optimizer_state_dict"],
                          step=payload["step"])
    return state, int(payload["epoch"]), float(payload["val_loss"])
