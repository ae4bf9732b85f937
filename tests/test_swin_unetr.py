"""SwinUNETR-2D tests: shapes, window partition round-trip, shifted-window
mask structure, and train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.models.swin_unetr import (
    SwinUNETR,
    _shift_attention_mask,
    _window_merge,
    _window_partition,
)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 4)), jnp.float32)
    windows = _window_partition(x, 8)
    assert windows.shape == (2 * 4, 64, 4)
    back = _window_merge(windows, 8, 16, 16)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region_attention():
    mask = _shift_attention_mask(16, 16, 8, 4)
    assert mask.shape == (4, 64, 64)
    # the first (unrolled interior) window has no masking; boundary windows do
    assert np.all(mask[0] == 0)
    assert (mask[-1] < 0).any()


def test_forward_shape_and_grad():
    model = SwinUNETR(feature_size=12)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 1)


def test_registry_and_engine_integration():
    from multi_task_breast_cancer_tpu.models import init_segmentation_model
    from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig, plan_epoch_indices
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state
    from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset

    rng = np.random.default_rng(0)
    n, H = 4, 64
    ds = ArrayDataset(images=(rng.random((n, H, H, 1)) * 255).astype(np.float32),
                      masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
                      labels=rng.integers(0, 3, n).astype(np.int32),
                      patient_ids=np.arange(n), class_names=["benign"] * n,
                      tumor_pixels=np.zeros(n, np.int64))
    model = init_segmentation_model("SwinUNETR")
    tx = init_optimizer("AdamW", 1e-4)
    engine = Engine(model, tx, EngineConfig(task="segmentation", batch_size=2,
                                            use_transforms=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, H, 1)))
    data = engine.device_data(ds)
    perm = plan_epoch_indices(n, 2, np.random.default_rng(1))
    state, m = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))
    assert np.isfinite(m["loss"])
