"""Train state: a single pytree carrying params, batch norm stats and optimizer
state — the functional replacement for the reference's (model, optimizer)
object pair."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model: nn.Module, tx: optax.GradientTransformation,
                       key: jax.Array, sample_input: jnp.ndarray) -> TrainState:
    variables = model.init(key, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
