"""Multi-host (multi-slice / pod) support.

Single-host DP rides ICI; on a pod slice or multi-slice deployment the same
``Mesh(('data',))`` program spans hosts with XLA routing the all-reduce over
DCN between slices. The only extra requirement is runtime initialisation and
host-local batch handling, wrapped here.

Usage (one call at program start, before device queries):

    from multi_task_breast_cancer_tpu.parallel import multihost
    multihost.initialize()          # no-op on single-host
    mesh = data_mesh()              # now spans all processes' devices
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialise the JAX distributed runtime when running multi-process.

    Returns True if distributed mode is active. Safe to call on single host
    (returns False without side effects). Auto-detects TPU pod environments
    (``jax.distributed.initialize`` with no args); explicit args support
    manual GPU/CPU clusters."""
    if coordinator_address is None:
        # auto-detect: a multislice env (MEGASCALE_*) always counts; a
        # single-process TPU_WORKER_HOSTNAMES=localhost is not a real pod
        megascale = "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
        workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if not megascale and workers in ("", "localhost"):
            return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        logging.info("jax.distributed initialised: process %d/%d, %d local / %d "
                     "global devices", jax.process_index(), jax.process_count(),
                     jax.local_device_count(), jax.device_count())
        return True
    except Exception as e:  # pragma: no cover
        logging.warning("jax.distributed.initialize failed (%s); continuing "
                        "single-process", e)
        return False


def coordinator_run_root(run_root: str) -> str:
    """Artifact root for this process.

    Process 0 keeps the user's ``run_root``. Every other process gets a
    scratch dir: non-coordinator processes MUST still execute the whole
    driver (each process has to dispatch every collective program), but
    their host-side artifact writes are redundant copies that would clobber
    process 0's on a shared filesystem."""
    try:
        multi = jax.process_count() > 1 and jax.process_index() != 0
    except Exception:  # pragma: no cover - backend not initialised
        return run_root
    if multi:
        import tempfile
        # NOT inside the guarded block above: if scratch creation fails on a
        # real pod we must fail loudly, not fall back to the shared run_root
        # this function exists to protect
        scratch = tempfile.mkdtemp(
            prefix=f"mtbc_proc{jax.process_index()}_artifacts_")
        logging.info("non-coordinator process %d: artifacts redirected "
                     "to %s", jax.process_index(), scratch)
        return scratch
    return run_root


def process_local_slice(n_global: int) -> slice:
    """The half-open index range of a length-``n_global`` global batch owned by
    this process (equal host-local shards)."""
    count = jax.process_count()
    if n_global % count:
        raise ValueError(
            f"global batch of {n_global} does not shard evenly over "
            f"{count} processes — trailing samples would silently be owned "
            f"by no process; pad or trim the batch to a multiple of {count}")
    per = n_global // count
    start = jax.process_index() * per
    return slice(start, start + per)
