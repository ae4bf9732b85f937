"""Spatial partitioning (2-D ``data × space`` mesh) on the virtual 8-device
CPU mesh.

The reference is strictly single-device; spatial partitioning is a TPU-native
capability addition: image ROWS shard over the ``'space'`` mesh axis so every
device holds ``1/n_space`` of each activation plane — the standard TPU recipe
for resolutions whose activations exceed one chip's HBM. GSPMD keeps the conv
stack spatially sharded and inserts the halo exchanges itself; these tests
prove (a) the math is unchanged, (b) the compiled program really does
exchange halos and split the work/memory, rather than silently regathering
onto one device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.models import (
    init_multitask_model,
    init_segmentation_model,
)
from multi_task_breast_cancer_tpu.parallel.mesh import data_mesh, data_space_mesh
from multi_task_breast_cancer_tpu.train.loop import (
    Engine,
    EngineConfig,
    plan_epoch_indices,
)
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state


def _dataset(n=8, H=64, seed=0):
    rng = np.random.default_rng(seed)
    return ArrayDataset(
        images=rng.integers(0, 256, (n, H, H, 1)).astype(np.float32),
        masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
        labels=rng.integers(0, 3, n).astype(np.int32),
        patient_ids=np.arange(n),
        class_names=["benign"] * n,
        tumor_pixels=np.zeros(n, np.int64),
    )


def test_space_mesh_construction():
    mesh = data_space_mesh(2)
    assert mesh.axis_names == ("data", "space")
    assert mesh.devices.shape == (4, 2)
    mesh = data_space_mesh(4)
    assert mesh.devices.shape == (2, 4)
    # n_space=1 degrades to the plain data mesh
    mesh = data_space_mesh(1)
    assert mesh.axis_names == ("data",)
    with pytest.raises(ValueError):
        data_space_mesh(3)  # 8 devices not divisible


def test_spatial_training_matches_single_device():
    """One epoch with batches sharded (2 data × 4 space) must reproduce the
    single-device trajectory — same math, just partitioned (cross-shard
    reduction order moves instance-norm/dice sums by float rounding only).
    Transforms stay ON so the augmentation gather path is exercised under the
    spatial constraint too."""
    ds = _dataset()
    results = {}
    for name, mesh in (("single", None), ("spatial", data_space_mesh(4))):
        model = init_multitask_model("Multi_BTSUNet", n_classes=3, width=4)
        tx = init_optimizer("Adam", 1e-3)
        cfg = EngineConfig(task="multitask", n_classes=3, batch_size=4,
                           use_transforms=True, max_angle=180.0)
        engine = Engine(model, tx, cfg, mesh=mesh)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 1)))
        data = engine.device_data(ds)
        perm = plan_epoch_indices(len(ds), 4, np.random.default_rng(42))
        state, m = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))
        ev = engine.eval_epoch(state, data)
        results[name] = (m["loss"], ev["loss"], ev["dice"], ev["acc"])

    np.testing.assert_allclose(results["single"], results["spatial"], rtol=2e-4)


def test_spatial_program_exchanges_halos_and_splits_flops():
    """Prove spatial partitioning from the compiled artifact: the per-device
    program must contain a collective-permute (the conv halo exchange between
    neighbouring row shards — pure data parallelism never needs one) and its
    per-device FLOPs must be well under the unsharded program's."""
    ds = _dataset()
    flops = {}
    for name, mesh in (("single", None), ("spatial", data_space_mesh(4))):
        model = init_segmentation_model("BTSUNet", width=4, deep_supervision=False)
        tx = init_optimizer("Adam", 1e-3)
        engine = Engine(model, tx,
                        EngineConfig(task="segmentation", n_classes=3,
                                     batch_size=8, use_transforms=False),
                        mesh=mesh)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 1)))
        data = engine.device_data(ds)
        perm = plan_epoch_indices(len(ds), 8, np.random.default_rng(42))
        compiled = engine._train_epoch.lower(
            state, data["images"], data["masks"], data["cls_targets"],
            data["labels_int"], jnp.asarray(perm), jax.random.PRNGKey(1)).compile()
        txt = compiled.as_text()
        assert ("collective-permute" in txt) == (mesh is not None), \
            "spatial program must exchange conv halos via collective-permute"
        if mesh is not None:
            assert "all-reduce" in txt  # gradient + cross-shard reductions
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops[name] = float(ca.get("flops", 0.0))

    assert flops["single"] > 0 and flops["spatial"] > 0
    ratio = flops["spatial"] / flops["single"]
    # 8 devices total (2 data × 4 space): per-device FLOPs must drop well
    # below the unsharded program (halo overlap + replicated epilogue keep it
    # above the ideal 1/8)
    assert ratio < 0.35, f"per-device FLOPs ratio {ratio:.3f} — not partitioned"


@pytest.mark.slow
def test_spatial_scales_down_per_device_activation_memory():
    """The point of spatial partitioning: per-device activation (temp) memory
    must scale ~1/n_space so resolutions that blow one chip's HBM fit a mesh.
    Compile-only at 256²; measured here: 36.2 MB → 5.2 MB (0.14×) with
    8-way row sharding."""
    H, B = 256, 2
    rng = np.random.default_rng(0)
    ds = ArrayDataset(
        images=rng.integers(0, 256, (B, H, H, 1)).astype(np.float32),
        masks=(rng.random((B, H, H, 1)) > 0.7).astype(np.float32),
        labels=rng.integers(0, 3, B).astype(np.int32),
        patient_ids=np.arange(B), class_names=["x"] * B,
        tumor_pixels=np.zeros(B, np.int64))
    temp = {}
    for name, mesh in (("single", None), ("spatial", data_space_mesh(8))):
        model = init_segmentation_model("BTSUNet", width=4, deep_supervision=False)
        tx = init_optimizer("Adam", 1e-3)
        engine = Engine(model, tx,
                        EngineConfig(task="segmentation", n_classes=3,
                                     batch_size=B, use_transforms=False),
                        mesh=mesh)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, H, H, 1)))
        data = engine.device_data(ds)
        perm = plan_epoch_indices(B, B, np.random.default_rng(1))
        compiled = engine._train_epoch.lower(
            state, data["images"], data["masks"], data["cls_targets"],
            data["labels_int"], jnp.asarray(perm), jax.random.PRNGKey(1)).compile()
        temp[name] = compiled.memory_analysis().temp_size_in_bytes

    assert temp["single"] > 0
    ratio = temp["spatial"] / temp["single"]
    assert ratio < 0.3, (f"per-device temp memory ratio {ratio:.3f} — "
                         f"activations not spatially split")


def test_config_spatial_partitions_roundtrip(tmp_path):
    from multi_task_breast_cancer_tpu.config import load_config
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("training: {spatial_partitions: 2}\n")
    assert load_config(cfg_file).training.spatial_partitions == 2
    cfg_file.write_text("training: {epochs: 3}\n")
    assert load_config(cfg_file).training.spatial_partitions == 1


@pytest.mark.slow
def test_driver_trains_spatially_partitioned(tmp_path):
    """Full driver run with ``training.spatial_partitions: 2`` (4 data × 2
    space mesh on the virtual 8-device CPU): artifacts and metrics must come
    out exactly as in the pure-DP configuration."""
    from multi_task_breast_cancer_tpu.config import (
        Config, DataConfig, LossConfig, ModelConfig, OptimizerConfig,
        TrainingConfig)
    from multi_task_breast_cancer_tpu.data import synthetic
    from multi_task_breast_cancer_tpu.train.driver import run_experiment
    import pandas as pd
    from pathlib import Path

    root = synthetic.make_preprocessed_busi(tmp_path / "busi",
                                            n_per_class=8, size=64)
    cfg = Config(
        model=ModelConfig(architecture="Multi_BTSUNet", width=4,
                          deep_supervision=False),
        optimizer=OptimizerConfig(opt="Adam", lr=1e-3, scheduler="plateau"),
        loss=LossConfig(function="DICE", inversely_weighted=True,
                        classification_criterion="Focal"),
        training=TrainingConfig(seed=1993, epochs=2, CV=2, max_patience=50,
                                spatial_partitions=2),
        data=DataConfig(input_img=str(root), batch_size=4, oversampling=True),
    )
    run = Path(run_experiment(cfg, task="multitask", mode="CV",
                              run_root=str(tmp_path / "runs")))
    for n in (0, 1):
        m = pd.read_csv(run / f"fold_{n}" / "metrics.csv")
        assert len(m) == 2
        assert m.notna().all().all()


def test_spatial_composes_with_fast_augmentation():
    """The two TPU perf features COMPOSE (round 5; this used to raise):
    fast_augmentation on a (2 data × 4 space) mesh runs the 3-shear kernel on
    the data axis ('space' replicated — whole planes always fit VMEM) and the
    step's sharding constraints reshard rows over 'space' right after. One
    epoch + eval must reproduce the single-device fast-aug trajectory (same
    draws outside the shard_map ⇒ identical augmented batches; cross-shard
    reduction order moves sums by float rounding only), and the compiled
    program must still exchange conv halos."""
    ds = _dataset()
    results = {}
    for name, mesh in (("single", None), ("spatial", data_space_mesh(4))):
        model = init_multitask_model("Multi_BTSUNet", n_classes=3, width=4)
        tx = init_optimizer("Adam", 1e-3)
        cfg = EngineConfig(task="multitask", n_classes=3, batch_size=4,
                           use_transforms=True, max_angle=180.0,
                           fast_augmentation=True)
        engine = Engine(model, tx, cfg, mesh=mesh)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 1)))
        data = engine.device_data(ds)
        assert "aug_packed" in data
        perm = plan_epoch_indices(len(ds), 4, np.random.default_rng(42))
        if mesh is not None:
            compiled = engine._train_epoch.lower(
                state, data["images"], data["masks"], data["cls_targets"],
                data["labels_int"], jnp.asarray(perm), jax.random.PRNGKey(1),
                None, data["aug_packed"]).compile()
            assert "collective-permute" in compiled.as_text(), \
                "fast-aug spatial program must still exchange conv halos"
        state, m = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))
        ev = engine.eval_epoch(state, data)
        results[name] = (m["loss"], ev["loss"], ev["dice"], ev["acc"])

    np.testing.assert_allclose(results["single"], results["spatial"], rtol=2e-4)
