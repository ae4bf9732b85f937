"""Checkpoint round-trip tests: weights-only restore (reference parity) and
full optimizer-state resume (new capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.models import init_segmentation_model
from multi_task_breast_cancer_tpu.train.checkpoint import (
    load_pretrained_model,
    restore_checkpoint,
    save_checkpoint,
)
from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig, plan_epoch_indices
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state


def _setup():
    rng = np.random.default_rng(0)
    n, H = 8, 32
    ds = ArrayDataset(images=(rng.random((n, H, H, 1)) * 255).astype(np.float32),
                      masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
                      labels=rng.integers(0, 3, n).astype(np.int32),
                      patient_ids=np.arange(n), class_names=["benign"] * n,
                      tumor_pixels=np.zeros(n, np.int64))
    model = init_segmentation_model("BTSUNet", width=4)
    tx = init_optimizer("Adam", 1e-3)
    engine = Engine(model, tx, EngineConfig(task="segmentation", batch_size=4,
                                            use_transforms=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, H, 1)))
    return engine, state, ds


def _tree_equal(a, b):
    return all(bool(jnp.array_equal(x, y)) for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def test_weights_only_restore(tmp_path):
    engine, state, ds = _setup()
    data = engine.device_data(ds)
    perm = plan_epoch_indices(len(ds), 4, np.random.default_rng(1))
    trained, _ = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, trained, epoch=3, val_loss=0.5)

    fresh = create_train_state(engine.model, engine.tx, jax.random.PRNGKey(9),
                               jnp.zeros((1, 32, 32, 1)))
    restored = load_pretrained_model(fresh, path)
    assert _tree_equal(restored.params, trained.params)
    # weights-only: optimizer state untouched (reference parity, models.py:29-31)
    assert _tree_equal(restored.opt_state, fresh.opt_state)


def test_full_resume_continues_identically(tmp_path):
    engine, state, ds = _setup()
    data = engine.device_data(ds)
    rng = np.random.default_rng(1)
    perm1 = plan_epoch_indices(len(ds), 4, rng)
    perm2 = plan_epoch_indices(len(ds), 4, rng)

    s1, _ = engine.train_epoch(state, data, perm1, jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, s1, epoch=0, val_loss=1.0)
    s2, m_direct = engine.train_epoch(s1, data, perm2, jax.random.PRNGKey(2))

    fresh = create_train_state(engine.model, engine.tx, jax.random.PRNGKey(9),
                               jnp.zeros((1, 32, 32, 1)))
    resumed, epoch, val_loss, _ = restore_checkpoint(fresh, path)
    assert epoch == 0 and val_loss == 1.0
    s2b, m_resumed = engine.train_epoch(resumed, data, perm2, jax.random.PRNGKey(2))
    np.testing.assert_allclose(m_direct["loss"], m_resumed["loss"], rtol=1e-6)
    assert _tree_equal(s2.params, s2b.params)


def test_missing_checkpoint_raises(tmp_path):
    engine, state, ds = _setup()
    import pytest
    with pytest.raises(ValueError, match="No checkpoint found"):
        load_pretrained_model(state, str(tmp_path / "nope"))


def test_best_state_snapshot_not_aliased_by_lr_injection():
    """The driver's on-device best-state snapshot (tree_map(jnp.copy, state))
    must not alias the live opt_state: later in-place LR injections
    (set_learning_rate) may not leak into the snapshot that will be written
    at fold end."""
    from multi_task_breast_cancer_tpu.train.optim import (
        get_learning_rate, set_learning_rate)

    engine, state, ds = _setup()
    data = engine.device_data(ds)
    perm = plan_epoch_indices(len(ds), 4, np.random.default_rng(1))
    state, _ = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))

    snap = jax.tree_util.tree_map(jnp.copy, state)
    lr_before = get_learning_rate(snap.opt_state)
    set_learning_rate(state.opt_state, 1e-5)
    assert abs(get_learning_rate(state.opt_state) - 1e-5) < 1e-12
    assert abs(get_learning_rate(snap.opt_state) - lr_before) < 1e-12


def test_deferred_checkpoint_matches_eager_cadence(tmp_path):
    """Driver-level: the once-per-fold deferred checkpoint write (default)
    produces a byte-identical file to the reference's write-per-improvement
    cadence (training.checkpoint_every_epoch=True).

    The cosine scheduler changes the LR (injected into the live opt_state)
    every epoch, so if the deferred on-device best snapshot aliased the live
    state, the end-of-fold write would carry a later LR than the eager
    at-improvement write and the byte comparison would catch it."""
    from multi_task_breast_cancer_tpu.config import Config, DataConfig, \
        ModelConfig, OptimizerConfig, TrainingConfig
    from multi_task_breast_cancer_tpu.data import synthetic
    from multi_task_breast_cancer_tpu.train.driver import run_experiment
    from pathlib import Path

    root = synthetic.make_preprocessed_busi(tmp_path / "busi", n_per_class=8,
                                            size=32)
    ckpts = {}
    for eager in (False, True):
        cfg = Config(
            model=ModelConfig(architecture="BTSUNet", width=4,
                              deep_supervision=False),
            optimizer=OptimizerConfig(opt="Adam", lr=1e-3, scheduler="cosine",
                                      t_max=4),
            training=TrainingConfig(seed=1993, epochs=3, CV=2,
                                    checkpoint_every_epoch=eager,
                                    data_parallel=False),
            data=DataConfig(input_img=str(root), batch_size=4,
                            oversampling=False),
        )
        run = Path(run_experiment(cfg, task="segmentation", mode="CV",
                                  run_root=str(tmp_path / f"runs_{eager}")))
        ckpts[eager] = next((run / "fold_0").glob("model_*.tar")).read_bytes()
    assert ckpts[False] == ckpts[True]


def test_legacy_checkpoint_without_resume_state_loads(tmp_path):
    """Checkpoints written before resume_state existed must still load:
    weights restore works, and the resume info comes back zeroed (the
    driver's --resume then restarts the fold instead of trusting it)."""
    from flax import serialization

    engine, state, ds = _setup()
    legacy_payload = {
        "epoch": 5,
        "model_state_dict": {"params": state.params,
                             "batch_stats": state.batch_stats},
        "optimizer_state_dict": state.opt_state,
        "val_loss": 0.25,
        "step": state.step,
    }
    path = tmp_path / "legacy_ckpt"
    path.write_bytes(serialization.to_bytes(legacy_payload))

    restored = load_pretrained_model(state, str(path))
    assert _tree_equal(restored.params, state.params)
    full, epoch, val_loss, rstate = restore_checkpoint(state, str(path))
    assert epoch == 5 and val_loss == 0.25
    assert rstate["valid"] == 0.0  # marker: no resume info present


def test_resume_state_valid_marker_survives_zero_lr(tmp_path):
    """A checkpoint saved with real counters must stay resumable even when
    the scheduler LR is legitimately 0.0 (cosine with min_lr=0 at t_max):
    the ``valid`` marker, not the LR, distinguishes legacy files."""
    engine, state, ds = _setup()
    path = str(tmp_path / "ckpt")
    rs = {"sched_lr": 0.0, "sched_best": 1.0, "sched_bad": 0.0,
          "sched_epoch": 4.0, "patience": 2.0, "best_val_loss": 0.5}
    save_checkpoint(path, state, epoch=4, val_loss=0.5, resume_state=rs)
    _, _, _, rstate = restore_checkpoint(state, path)
    assert rstate["valid"] == 1.0
    assert rstate["sched_lr"] == 0.0
    assert rstate["patience"] == 2.0


def test_architecture_mismatch_surfaces_real_error(tmp_path):
    """Loading a checkpoint into a DIFFERENT architecture must raise the
    original key-mismatch error — the legacy-checkpoint fallback only fires
    when the payload genuinely lacks ``resume_state`` (regression: a blanket
    retry used to mask arch mismatches behind a legacy-template error)."""
    import pytest

    engine, state, ds = _setup()
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, epoch=0, val_loss=1.0)

    # same tree structure, different widths -> leaf SHAPE mismatch
    other_model = init_segmentation_model("BTSUNet", width=8)
    other = create_train_state(other_model, engine.tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 1)))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pretrained_model(other, path)

    # different architecture -> key-set mismatch: the original flax error
    # must surface, not the legacy-template fallback's
    unet = init_segmentation_model("UNet", width=4)
    other = create_train_state(unet, engine.tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 1)))
    with pytest.raises(ValueError) as exc:
        load_pretrained_model(other, path)
    assert "resume_state" not in str(exc.value)  # real cause, not the fallback
