"""Determinism tests: identical seeds ⇒ identical training trajectories
(the reference devotes a whole subsystem to this — seed_everything +
deterministic kernels, miscellany.py:78-96; JAX gives it by construction,
these tests prove it end-to-end through the engine)."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.models import init_multitask_model
from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig, plan_epoch_indices
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state


def _run(seed_key, n_epochs=2):
    rng = np.random.default_rng(0)
    n, H = 8, 32
    ds = ArrayDataset(images=(rng.random((n, H, H, 1)) * 255).astype(np.float32),
                      masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
                      labels=rng.integers(0, 3, n).astype(np.int32),
                      patient_ids=np.arange(n), class_names=["benign"] * n,
                      tumor_pixels=np.zeros(n, np.int64))
    model = init_multitask_model("MTUNetPlusPlus", n_classes=3, deep_supervision=True)
    tx = init_optimizer("Adam", 1e-3)
    engine = Engine(model, tx, EngineConfig(task="multitask", batch_size=4))
    state = create_train_state(model, tx, jax.random.PRNGKey(seed_key),
                               jnp.zeros((1, H, H, 1)))
    data = engine.device_data(ds)
    host = np.random.default_rng(1993)
    losses = []
    for ep in range(n_epochs):
        perm = plan_epoch_indices(n, 4, host)
        state, m = engine.train_epoch(state, data, perm,
                                      jax.random.fold_in(jax.random.PRNGKey(seed_key), ep))
        losses.append(m["loss"])
    return losses


def test_same_seed_identical_trajectory():
    a = _run(0)
    b = _run(0)
    np.testing.assert_array_equal(a, b)


def test_different_seed_differs():
    a = _run(0, n_epochs=1)
    c = _run(123, n_epochs=1)
    assert a[0] != c[0]
