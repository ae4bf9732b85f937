"""uint8 HBM storage must be a pure layout optimization: integral image/mask
data stored as uint8 (gather moves 1 byte/px) and cast in-step produces the
bit-identical training trajectory of float storage."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.models import init_multitask_model
from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig, plan_epoch_indices
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state


def _make_ds(n=8, size=32):
    rng = np.random.default_rng(0)
    return ArrayDataset(
        images=rng.integers(0, 256, (n, size, size, 1)).astype(np.float32),
        masks=(rng.random((n, size, size, 1)) > 0.7).astype(np.float32),
        labels=rng.integers(0, 3, n).astype(np.int32),
        patient_ids=np.arange(n),
        class_names=["benign"] * n,
        tumor_pixels=np.zeros(n, np.int64),
    )


def test_uint8_storage_identical_trajectory():
    ds = _make_ds()
    model = init_multitask_model("Multi_BTSUNet", n_classes=3, width=4,
                                 deep_supervision=True)
    tx = init_optimizer("Adam", 1e-3)
    cfg = EngineConfig(task="multitask", n_classes=3, batch_size=4)
    engine = Engine(model, tx, cfg)

    data_u8 = engine.device_data(ds)
    assert data_u8["images"].dtype == jnp.uint8
    assert data_u8["masks"].dtype == jnp.uint8
    data_f = dict(data_u8, images=jnp.asarray(ds.images, jnp.float32),
                  masks=jnp.asarray(ds.masks, jnp.float32))

    perm = plan_epoch_indices(len(ds), 4, np.random.default_rng(1))
    states, metrics = [], []
    for data in (data_u8, data_f):
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 1)))
        state, m = engine.train_epoch(state, data, perm, jax.random.PRNGKey(2))
        states.append(state)
        metrics.append(m)

    assert metrics[0] == metrics[1]
    for a, b in zip(jax.tree_util.tree_leaves(states[0].params),
                    jax.tree_util.tree_leaves(states[1].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_non_integral_data_keeps_float_storage():
    ds = _make_ds()
    ds = ArrayDataset(images=ds.images + 0.5, masks=ds.masks,
                      labels=ds.labels, patient_ids=ds.patient_ids,
                      class_names=ds.class_names, tumor_pixels=ds.tumor_pixels)
    model = init_multitask_model("Multi_BTSUNet", n_classes=3, width=4)
    engine = Engine(model, init_optimizer("Adam", 1e-3),
                    EngineConfig(task="multitask", n_classes=3, batch_size=4))
    data = engine.device_data(ds)
    assert data["images"].dtype == jnp.float32
    assert data["masks"].dtype == jnp.uint8
