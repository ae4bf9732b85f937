"""Unit tests for the profiling hooks and visualization helpers."""

import contextlib
import time

import numpy as np

from multi_task_breast_cancer_tpu.utils.profiling import StepTimer, maybe_profile
from multi_task_breast_cancer_tpu.utils.visualization import plot_overlapping


def test_maybe_profile_noop_without_env(monkeypatch):
    monkeypatch.delenv("MTBC_PROFILE", raising=False)
    cm = maybe_profile(epoch=1, fold=0)
    assert isinstance(cm, contextlib.AbstractContextManager)
    with cm:
        pass  # nullcontext


def test_maybe_profile_traces_epoch1_fold0(monkeypatch, tmp_path):
    monkeypatch.setenv("MTBC_PROFILE", str(tmp_path))
    with maybe_profile(epoch=1, fold=0):
        import jax.numpy as jnp
        _ = (jnp.ones(8) * 2).sum()
    # jax.profiler wrote a trace directory
    assert any(tmp_path.rglob("*"))
    # other epochs/folds stay no-ops (no start_trace conflicts)
    with maybe_profile(epoch=5, fold=0):
        pass
    with maybe_profile(epoch=1, fold=1):
        pass


def test_step_timer_accumulates():
    timer = StepTimer()
    for _ in range(3):
        with timer("train"):
            time.sleep(0.01)
    with timer("eval"):
        time.sleep(0.01)
    s = timer.summary()
    assert set(s) == {"train", "eval"}
    assert s["train"] >= 0.01
    assert timer.counts["train"] == 3


def test_plot_overlapping_writes_png(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((32, 32))
    mask = (rng.random((32, 32)) > 0.7).astype(int)
    seg = (rng.random((32, 32)) > 0.7).astype(int)
    out = tmp_path / "overlap.png"
    plot_overlapping(img, mask, seg, str(out))
    assert out.exists() and out.stat().st_size > 0


def test_profile_unsupported_env_is_additive(monkeypatch):
    """MTBC_PROFILE_UNSUPPORTED extends the built-in unsupported set — it can
    never REMOVE 'axon' (the backend the guard exists for), so listing another
    backend does not silently re-enable traces on the known-broken one."""
    import importlib

    from multi_task_breast_cancer_tpu.utils import profiling as P

    monkeypatch.setenv("MTBC_PROFILE_UNSUPPORTED", "someother_backend")
    try:
        reloaded = importlib.reload(P)
        assert "axon" in reloaded._UNSUPPORTED_PLATFORMS
        assert "someother_backend" in reloaded._UNSUPPORTED_PLATFORMS
    finally:
        monkeypatch.delenv("MTBC_PROFILE_UNSUPPORTED")
        importlib.reload(P)
