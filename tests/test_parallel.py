"""Data-parallelism tests on the virtual 8-device CPU mesh: mesh construction,
sharded-vs-single-device training equivalence, and the dry-run hook."""

import jax
import jax.numpy as jnp
import numpy as np
from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.models import init_segmentation_model
from multi_task_breast_cancer_tpu.parallel.mesh import data_mesh
from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig, plan_epoch_indices
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state


def _dataset(n=16, H=32, seed=0):
    rng = np.random.default_rng(seed)
    return ArrayDataset(
        images=(rng.random((n, H, H, 1)) * 255).astype(np.float32),
        masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
        labels=rng.integers(0, 3, n).astype(np.int32),
        patient_ids=np.arange(n),
        class_names=["benign"] * n,
        tumor_pixels=np.zeros(n, np.int64),
    )


def test_eight_virtual_devices_present():
    assert jax.device_count() == 8


def test_mesh_construction():
    mesh = data_mesh()
    assert mesh is not None
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == 8


def test_sharded_training_matches_single_device():
    """One epoch with batches sharded over 8 devices must give the same loss
    trajectory as the unsharded run (same math, just partitioned)."""
    ds = _dataset()
    results = {}
    for name, mesh in (("single", None), ("sharded", data_mesh())):
        model = init_segmentation_model("BTSUNet", width=4, deep_supervision=False)
        tx = init_optimizer("Adam", 1e-3)
        cfg = EngineConfig(task="segmentation", n_classes=3, batch_size=8,
                           use_transforms=False)
        engine = Engine(model, tx, cfg, mesh=mesh)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 1)))
        data = engine.device_data(ds)
        perm = plan_epoch_indices(len(ds), 8, np.random.default_rng(42))
        state, m = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))
        ev = engine.eval_epoch(state, data)
        results[name] = (m["loss"], ev["loss"], ev["dice"])

    np.testing.assert_allclose(results["single"], results["sharded"], rtol=2e-4)


def test_dryrun_multichip_hook():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_hook_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    cls, seg = out
    assert cls[0].shape == (2, 3)
    assert len(seg) == 4


def test_dp_batch_smaller_than_mesh():
    """Reference-default batch sizes (2) are smaller than a pod's device
    count; the P('data') constraint must still compile and run (XLA pads the
    uneven shards internally)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
    from multi_task_breast_cancer_tpu.models import init_multitask_model
    from multi_task_breast_cancer_tpu.parallel.mesh import data_mesh
    from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig, \
        plan_epoch_indices
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state

    for B in (2, 6):
        n, H = 12, 32
        rng = np.random.default_rng(0)
        ds = ArrayDataset(
            images=rng.integers(0, 256, (n, H, H, 1)).astype(np.float32),
            masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
            labels=rng.integers(0, 3, n).astype(np.int32),
            patient_ids=np.arange(n), class_names=["x"] * n,
            tumor_pixels=np.zeros(n, np.int64))
        model = init_multitask_model("Multi_BTSUNet", n_classes=3, width=4)
        tx = init_optimizer("Adam", 1e-3)
        engine = Engine(model, tx,
                        EngineConfig(task="multitask", n_classes=3, batch_size=B),
                        mesh=data_mesh())
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, H, H, 1)))
        data = engine.device_data(ds)
        perm = plan_epoch_indices(n, B, np.random.default_rng(1))
        state, m = engine.train_epoch(state, data, perm, jax.random.PRNGKey(2))
        assert np.isfinite(m["loss"])


def test_fold_data_is_replicated_over_the_mesh():
    """Under a mesh, device_data must place fold arrays replicated across all
    devices — the compiled epoch's preferred input sharding (verified via
    input_shardings). Default single-device placement would re-broadcast the
    whole fold from device 0 on every epoch call on a real pod."""
    ds = _dataset()
    model = init_segmentation_model("BTSUNet", width=4, deep_supervision=False)
    tx = init_optimizer("Adam", 1e-3)
    engine = Engine(model, tx,
                    EngineConfig(task="segmentation", n_classes=3,
                                 batch_size=8, use_transforms=False),
                    mesh=data_mesh())
    data = engine.device_data(ds)
    for name in ("images", "masks", "cls_targets", "labels_int"):
        sh = data[name].sharding
        assert sh.is_fully_replicated and len(sh.device_set) == 8, (name, sh)


def test_compiled_program_is_actually_partitioned():
    """A reshard-to-one-device regression would still pass the numeric
    equality tests above — prove partitioning from the compiled artifact:
    (a) the per-device HLO contains the cross-device gradient all-reduce,
    (b) XLA's cost model shows per-device FLOPs ~1/8 of the unsharded
    program (each device computes its batch shard only)."""
    ds = _dataset()
    flops = {}
    for name, mesh in (("single", None), ("sharded", data_mesh())):
        model = init_segmentation_model("BTSUNet", width=4, deep_supervision=False)
        tx = init_optimizer("Adam", 1e-3)
        engine = Engine(model, tx,
                        EngineConfig(task="segmentation", n_classes=3,
                                     batch_size=8, use_transforms=False),
                        mesh=mesh)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 1)))
        data = engine.device_data(ds)
        perm = plan_epoch_indices(len(ds), 8, np.random.default_rng(42))
        compiled = engine._train_epoch.lower(
            state, data["images"], data["masks"], data["cls_targets"],
            data["labels_int"], jnp.asarray(perm), jax.random.PRNGKey(1)).compile()
        txt = compiled.as_text()
        assert ("all-reduce" in txt) == (mesh is not None)
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops[name] = float(ca.get("flops", 0.0))

    assert flops["single"] > 0 and flops["sharded"] > 0
    # per-device FLOPs must scale ~1/8 (allow generous slack for collective
    # and replicated-epilogue overhead; anything >1/2 means no partitioning)
    ratio = flops["sharded"] / flops["single"]
    assert ratio < 0.25, f"per-device FLOPs ratio {ratio:.3f} — not partitioned"


def test_sharded_predict_is_partitioned_and_equal():
    """Inference under a mesh: (a) outputs equal the single-device forward,
    (b) the compiled program's per-device FLOPs are ~1/8 (the batch is
    genuinely sharded — this is the multi-chip serving path), (c) outputs
    come back replicated so any host/process can fetch them."""
    rng = np.random.default_rng(5)
    images = (rng.random((16, 32, 32, 1)) * 255).astype(np.float32)
    outs, flops = {}, {}
    for name, mesh in (("single", None), ("sharded", data_mesh())):
        model = init_segmentation_model("BTSUNet", width=4, deep_supervision=False)
        tx = init_optimizer("Adam", 1e-3)
        engine = Engine(model, tx,
                        EngineConfig(task="segmentation", n_classes=3,
                                     batch_size=8, use_transforms=False),
                        mesh=mesh)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 1)))
        out = engine.predict(state, images)
        outs[name] = np.asarray(out)
        lowered_in = jnp.asarray(images)
        if mesh is not None:
            from multi_task_breast_cancer_tpu.parallel.mesh import replicate_to_mesh
            lowered_in = replicate_to_mesh(mesh, lowered_in)
            from jax.sharding import NamedSharding, PartitionSpec
            compiled = engine._predict.lower(state, lowered_in).compile()
            # every output is replicated (fetchable from any process)
            for s in jax.tree_util.tree_leaves(compiled.output_shardings):
                assert s.is_fully_replicated
        else:
            compiled = engine._predict.lower(state, lowered_in).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops[name] = float(ca.get("flops", 0.0))

    np.testing.assert_allclose(outs["sharded"], outs["single"],
                               rtol=2e-5, atol=2e-5)
    ratio = flops["sharded"] / flops["single"]
    assert ratio < 0.25, f"per-device FLOPs ratio {ratio:.3f} — not partitioned"
