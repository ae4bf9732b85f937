"""Tracing / profiling hooks (a capability the reference lacks — it only logs
wall-clock epoch times, ``training_multitask.py:223,254``).

- ``profile_trace(dir)``: context manager around ``jax.profiler`` traces
  (viewable in TensorBoard / Perfetto).
- ``StepTimer``: lightweight wall-clock aggregator for epoch phases.
- Driver integration: set ``MTBC_PROFILE=/path`` to capture a trace of the
  first two epochs of fold 0.

Runtime support caveat: tunneled/remote TPU backends (e.g. the ``axon``
plugin) do not implement the profiler RPCs — ``profile_trace`` detects this
and degrades to a logged no-op instead of crashing inside
``jax.profiler.start_trace``. Wall-clock ``StepTimer`` always works.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Iterator

# Backends whose runtime does not implement the profiler service. The axon
# TPU tunnel is the known case; MTBC_PROFILE_UNSUPPORTED (comma-separated
# platform names) ADDS to this set — it cannot remove 'axon', so extending
# the list for another backend never re-enables the known-broken one.
_UNSUPPORTED_PLATFORMS = frozenset({"axon"} | {
    p.strip()
    for p in os.environ.get("MTBC_PROFILE_UNSUPPORTED", "").split(",")
    if p.strip()
})


def _profiler_supported() -> bool:
    import jax
    try:
        platform = jax.devices()[0].platform
    except Exception:  # backend init failure — let start_trace surface it
        return True
    return platform not in _UNSUPPORTED_PLATFORMS


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    import jax
    if not _profiler_supported():
        logging.warning(
            "jax.profiler traces are unsupported on this runtime (%s backend); "
            "skipping trace capture — StepTimer wall-clock phases still apply.",
            jax.devices()[0].platform,
        )
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def maybe_profile(epoch: int, fold: int) -> contextlib.AbstractContextManager:
    """Trace epochs 1-2 of fold 0 when MTBC_PROFILE is set."""
    log_dir = os.environ.get("MTBC_PROFILE")
    if log_dir and fold == 0 and epoch in (1, 2):
        return profile_trace(log_dir)
    return contextlib.nullcontext()


class StepTimer:
    """Accumulates wall-clock per phase: ``with timer('train'): ...``."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[phase] += time.perf_counter() - t0
            self.counts[phase] += 1

    def summary(self) -> Dict[str, float]:
        return {phase: self.totals[phase] / max(self.counts[phase], 1)
                for phase in self.totals}
