"""Cross-fold compile-once padding: a train epoch padded to a larger step
count with masked no-op steps must produce EXACTLY the same parameters,
optimizer state, and metrics as the unpadded epoch — padding only changes the
compiled program's shape, never the training trajectory."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.models import init_multitask_model
from multi_task_breast_cancer_tpu.train.loop import (
    Engine,
    EngineConfig,
    plan_epoch_indices,
    step_valid_mask,
)
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state


def _dataset(n, H, rng):
    return ArrayDataset(images=(rng.random((n, H, H, 1)) * 255).astype(np.float32),
                        masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
                        labels=rng.integers(0, 3, n).astype(np.int32),
                        patient_ids=np.arange(n), class_names=["benign"] * n,
                        tumor_pixels=np.zeros(n, np.int64))


def _engine(H):
    model = init_multitask_model("MTnnUNet", n_classes=3, width=4,
                                 deep_supervision=True)
    tx = init_optimizer("Adam", 1e-3)
    engine = Engine(model, tx, EngineConfig(task="multitask", n_classes=3,
                                            batch_size=4, use_transforms=False))
    return model, tx, engine


def test_padded_epoch_identical_to_unpadded():
    rng = np.random.default_rng(0)
    n, H, B = 10, 32, 4  # 3 natural steps (last wrap-padded); pad to 5
    ds = _dataset(n, H, rng)
    model, tx, engine = _engine(H)

    def run(pad):
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, H, H, 1)))
        data = engine.device_data(ds, pad_to=(16 if pad else None))
        perm = plan_epoch_indices(n, B, np.random.default_rng(7),
                                  pad_to_steps=(5 if pad else None))
        sv = step_valid_mask(n, B, 5) if pad else None
        state, tm = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1), sv)
        return state, tm

    s_plain, m_plain = run(pad=False)
    s_pad, m_pad = run(pad=True)

    # identical permutation prefix: same rng seed, same first ceil(n/B)·B entries
    p0 = plan_epoch_indices(n, B, np.random.default_rng(7))
    p1 = plan_epoch_indices(n, B, np.random.default_rng(7), pad_to_steps=5)
    assert len(p1) == 5 * B
    np.testing.assert_array_equal(p0, p1[: len(p0)])

    for k in m_plain:
        np.testing.assert_allclose(m_plain[k], m_pad[k], rtol=1e-6, atol=1e-6,
                                   err_msg=f"metric {k}")
    # fp tolerance only: padded/unpadded are different compiled programs, so
    # XLA may reassociate reductions (ulp-level); the trajectory is the same
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.params),
                    jax.tree_util.tree_leaves(s_pad.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.opt_state),
                    jax.tree_util.tree_leaves(s_pad.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    assert int(s_plain.step) == int(s_pad.step) == 3


def test_predict_pad_to_trims_and_matches():
    rng = np.random.default_rng(1)
    H = 32
    ds = _dataset(6, H, rng)
    model, tx, engine = _engine(H)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, H, 1)))
    cls_a, seg_a = engine.predict(state, ds.images)
    cls_b, seg_b = engine.predict(state, ds.images, pad_to=9)
    for a, b in zip(jax.tree_util.tree_leaves((cls_a, seg_a)),
                    jax.tree_util.tree_leaves((cls_b, seg_b))):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_separate_eval_matches_fused_without_retracing_train():
    """When val sizes differ across folds the driver drops the fused
    train+eval program for separate train/eval calls (driver.py fuse_eval):
    the metrics must match the fused program and the expensive train program
    must compile exactly ONCE across distinct val shapes."""
    rng = np.random.default_rng(3)
    n, H, B = 8, 32, 4
    ds = _dataset(n, H, rng)
    val_a, val_b = _dataset(4, H, rng), _dataset(6, H, rng)
    model, tx, engine = _engine(H)

    def fresh():
        return create_train_state(model, tx, jax.random.PRNGKey(0),
                                  jnp.zeros((1, H, H, 1)))

    data = engine.device_data(ds)
    va, vb = engine.device_data(val_a), engine.device_data(val_b)
    perm = plan_epoch_indices(n, B, np.random.default_rng(5))
    key = jax.random.PRNGKey(2)

    s_fused, tm_f, vm_f = engine.train_and_eval_epoch(fresh(), data, va,
                                                      perm, key)
    s_sep = fresh()
    s_sep, tm_s = engine.train_epoch(s_sep, data, perm, key)
    vm_s = engine.eval_epoch(s_sep, va)

    for k in tm_f:
        np.testing.assert_allclose(tm_f[k], tm_s[k], rtol=1e-5, atol=1e-6,
                                   err_msg=f"train metric {k}")
    for k in vm_f:
        np.testing.assert_allclose(vm_f[k], vm_s[k], rtol=1e-5, atol=1e-6,
                                   err_msg=f"val metric {k}")

    # a second val SIZE through the separate path: only the small eval
    # program re-traces; the train program is reused as-is
    assert engine._train_epoch._cache_size() == 1
    vm_b = engine.eval_epoch(s_sep, vb)
    assert np.isfinite(vm_b["loss"])
    assert engine._train_epoch._cache_size() == 1
    assert engine._eval_epoch._cache_size() == 2


def test_driver_unfuses_eval_when_val_sizes_differ(tmp_path, monkeypatch):
    """End-to-end: a CV run whose folds yield different val sizes must never
    call the fused program (which would recompile the train scan per fold)."""
    from multi_task_breast_cancer_tpu.config import (
        Config, DataConfig, ModelConfig, OptimizerConfig, TrainingConfig)
    from multi_task_breast_cancer_tpu.data import synthetic
    from multi_task_breast_cancer_tpu.train import driver as D
    from multi_task_breast_cancer_tpu.train.loop import Engine

    root = synthetic.make_preprocessed_busi(tmp_path / "busi", n_per_class=8,
                                            size=32)
    # force UNEQUAL val sizes (natural stratified splits on tiny balanced
    # synthetic data tend to produce equal ones): drop one val row in fold 1
    orig_load = D.load_datasets

    def uneven_load(*a, **k):
        folds = orig_load(*a, **k)
        v = folds[1].val
        folds[1].val = type(v)(images=v.images[:-1], masks=v.masks[:-1],
                               labels=v.labels[:-1],
                               patient_ids=v.patient_ids[:-1],
                               class_names=v.class_names[:-1],
                               tumor_pixels=v.tumor_pixels[:-1])
        assert len(folds[0].val) != len(folds[1].val)
        return folds

    monkeypatch.setattr(D, "load_datasets", uneven_load)
    calls = {"fused": 0, "separate_eval": 0}
    orig_fused = Engine.train_and_eval_epoch
    orig_eval = Engine.eval_epoch

    def spy_fused(self, *a, **k):
        calls["fused"] += 1
        return orig_fused(self, *a, **k)

    def spy_eval(self, *a, **k):
        calls["separate_eval"] += 1
        return orig_eval(self, *a, **k)

    monkeypatch.setattr(Engine, "train_and_eval_epoch", spy_fused)
    monkeypatch.setattr(Engine, "eval_epoch", spy_eval)

    cfg = Config(model=ModelConfig(architecture="BTSUNet", width=4,
                                   sequences=1, deep_supervision=False),
                 optimizer=OptimizerConfig(opt="Adam", lr=1e-3),
                 training=TrainingConfig(seed=1993, epochs=1, CV=2),
                 data=DataConfig(input_img=str(root), batch_size=4,
                                 oversampling=False))
    D.run_experiment(cfg, task="segmentation", mode="CV",
                     run_root=str(tmp_path / "runs"))
    assert calls["fused"] == 0
    assert calls["separate_eval"] == 2  # one epoch × two folds
