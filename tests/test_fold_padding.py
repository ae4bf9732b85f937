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
