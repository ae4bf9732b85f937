"""ResidualUNet (BatchNorm + dropout) through the jitted epoch engine:
batch_stats must thread through the scan carry and update across steps."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.models import init_segmentation_model
from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig, plan_epoch_indices
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state


def test_residual_unet_batchstats_update_in_engine():
    rng = np.random.default_rng(0)
    n, H = 8, 32
    ds = ArrayDataset(images=(rng.random((n, H, H, 1)) * 255).astype(np.float32),
                      masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
                      labels=rng.integers(0, 3, n).astype(np.int32),
                      patient_ids=np.arange(n), class_names=["benign"] * n,
                      tumor_pixels=np.zeros(n, np.int64))
    model = init_segmentation_model("ResidualUNet", width=4)
    tx = init_optimizer("Adam", 1e-3)
    engine = Engine(model, tx, EngineConfig(task="segmentation", batch_size=4,
                                            use_transforms=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, H, 1)))
    # snapshot to host: the engine donates the input state's buffers
    bs_before = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.batch_stats)]
    assert bs_before, "ResidualUNet must expose batch_stats"

    data = engine.device_data(ds)
    perm = plan_epoch_indices(n, 4, np.random.default_rng(1))
    state2, m = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))
    assert np.isfinite(m["loss"])
    bs_after = jax.tree_util.tree_leaves(state2.batch_stats)
    # running statistics must have moved
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(bs_before, bs_after))
    assert changed, "batch_stats did not update through the scan"

    # eval uses the running stats without mutating them
    ev = engine.eval_epoch(state2, data)
    assert np.isfinite(ev["loss"])
