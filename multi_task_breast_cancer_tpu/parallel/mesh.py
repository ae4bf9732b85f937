"""Device mesh + data-parallel sharding.

The reference is strictly single-device (``src/utils/experiment_init.py:339-347``
picks 'cuda:0' or 'cpu'); data parallelism is a new first-class capability here:

- ``data_mesh()`` builds a 1-D ``jax.sharding.Mesh`` over all visible chips;
- batches carry ``NamedSharding(P('data'))`` so each chip computes its shard's
  forward/backward and XLA inserts the gradient all-reduce (``psum``) over ICI
  automatically during jit partitioning — the standard pjit data-parallel
  recipe, no hand-written collectives required at this model scale;
- parameters/optimizer state are replicated (a ~16M-param CNN makes sharded
  optimizer state pointless; replication keeps every matmul local to the MXU).

On a single host the all-reduce rides ICI; across hosts ('multi-slice') the
same program spans DCN — the mesh abstracts both.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_count() -> int:
    return jax.device_count()


def data_mesh(n_devices: Optional[int] = None) -> Optional[Mesh]:
    """1-D data-parallel mesh over the first ``n_devices`` devices (all by
    default). Returns None when only one device is visible (pure single-chip
    path, avoids needless sharding constraints)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(devs) <= 1:
        return None
    return Mesh(np.array(devs), ("data",))


def shard_batch(mesh: Mesh, *arrays):
    """Place batch arrays with their leading axis sharded over the mesh."""
    spec = NamedSharding(mesh, P("data"))
    out = tuple(jax.device_put(a, spec) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_to_mesh(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    spec = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, spec), tree)
