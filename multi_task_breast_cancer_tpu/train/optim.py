"""Optimizers and LR schedulers.

Optimizers mirror the reference factory (``src/utils/experiment_init.py:177-196``):
Adam(eps=1e-4), SGD(momentum .9, nesterov), AdamW. Learning rate is injected as
mutable optimizer state (``optax.inject_hyperparams``) so host-side schedulers
can set it between epochs without re-jitting.

Schedulers re-implement torch semantics (``experiment_init.py:266-283``):
- ReduceLROnPlateau(mode='min', factor, patience, min_lr, rel threshold 1e-4)
  — optax has no val-loss plateau scheduler, so it's a small host state machine;
- CosineAnnealingLR(T_max, eta_min) stepped per epoch.
"""

from __future__ import annotations

import dataclasses
import logging
import math
from typing import Optional

import optax


def init_optimizer(opt: str, learning_rate: float) -> optax.GradientTransformation:
    if opt == "Adam":
        tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate, eps=1e-4)
    elif opt == "SGD":
        tx = optax.inject_hyperparams(optax.sgd)(
            learning_rate=learning_rate, momentum=0.9, nesterov=True)
    elif opt == "AdamW":
        # torch AdamW defaults (weight_decay=0.01), which the reference uses
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=0.01)
    else:
        logging.info("The optimizer '%s' is not recognized. SGD will be used instead.", opt)
        tx = optax.inject_hyperparams(optax.sgd)(
            learning_rate=0.001, momentum=0.9, nesterov=True)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Write the injected learning rate into an optax state pytree (as a jnp
    scalar so jit sees a stable dtype/shape and never recompiles)."""
    import jax.numpy as jnp
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


@dataclasses.dataclass
class PlateauScheduler:
    """torch ``ReduceLROnPlateau(mode='min')`` twin."""

    base_lr: float
    factor: float = 0.5
    patience: int = 20
    min_lr: float = 1e-6
    threshold: float = 1e-4  # relative improvement threshold (torch default)

    lr: float = dataclasses.field(init=False)
    best: float = dataclasses.field(default=math.inf, init=False)
    num_bad_epochs: int = dataclasses.field(default=0, init=False)

    def __post_init__(self):
        self.lr = self.base_lr

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if new_lr < self.lr:
                logging.info("Plateau scheduler: reducing LR %.2e → %.2e", self.lr, new_lr)
            self.lr = new_lr
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        """Flat float dict for checkpoint embedding (mid-training resume)."""
        return {"sched_lr": float(self.lr), "sched_best": float(self.best),
                "sched_bad": float(self.num_bad_epochs), "sched_epoch": 0.0}

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["sched_lr"])
        self.best = float(d["sched_best"])
        self.num_bad_epochs = int(d["sched_bad"])


@dataclasses.dataclass
class CosineAnnealingScheduler:
    """torch ``CosineAnnealingLR`` twin (per-epoch step)."""

    base_lr: float
    t_max: int = 40
    eta_min: float = 1e-6

    epoch: int = dataclasses.field(default=0, init=False)
    lr: float = dataclasses.field(init=False)

    def __post_init__(self):
        self.lr = self.base_lr

    def step(self, metric: Optional[float] = None) -> float:
        self.epoch += 1
        self.lr = self.eta_min + (self.base_lr - self.eta_min) * \
            (1 + math.cos(math.pi * self.epoch / self.t_max)) / 2
        return self.lr

    def state_dict(self) -> dict:
        """Flat float dict for checkpoint embedding (mid-training resume)."""
        return {"sched_lr": float(self.lr), "sched_best": 0.0,
                "sched_bad": 0.0, "sched_epoch": float(self.epoch)}

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["sched_lr"])
        self.epoch = int(d["sched_epoch"])


def init_lr_scheduler(scheduler: str, base_lr: float, *, t_max: int = 20,
                      factor: float = 0.5, min_lr: float = 1e-6,
                      patience: int = 20):
    """Equivalent of ``experiment_init.py:266-283``."""
    if scheduler == "plateau":
        return PlateauScheduler(base_lr=base_lr, factor=factor,
                                patience=patience, min_lr=min_lr)
    if scheduler == "cosine":
        return CosineAnnealingScheduler(base_lr=base_lr, t_max=t_max,
                                        eta_min=min_lr)
    raise ValueError("Select a scheduler allowed: ['plateau', 'cosine']")
