"""Edge cases: chunked inference equivalence, factory error messages, config
robustness against unknown keys."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_task_breast_cancer_tpu.models import (
    init_classification_model,
    init_multitask_model,
    init_segmentation_model,
)


def test_unknown_architectures_raise():
    with pytest.raises(ValueError, match="Unknown segmentation"):
        init_segmentation_model("NopeNet")
    with pytest.raises(ValueError, match="Unknown classification"):
        init_classification_model("NopeNet")
    with pytest.raises(ValueError, match="Unknown multitask"):
        init_multitask_model("NopeNet")


def test_config_ignores_unknown_keys(tmp_path):
    from multi_task_breast_cancer_tpu.config import load_config
    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text("""
model:
  architecture: BTSUNet
  not_a_real_knob: 42
training:
  seed: 7
""")
    cfg = load_config(cfg_file)
    assert cfg.model.architecture == "BTSUNet"
    assert cfg.training.seed == 7


def test_chunked_predict_equals_full():
    from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state

    model = init_segmentation_model("BTSUNet", width=4)
    tx = init_optimizer("Adam", 1e-3)
    eng = Engine(model, tx, EngineConfig(task="segmentation", batch_size=4))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 1)))
    x = np.random.default_rng(0).random((11, 32, 32, 1)).astype(np.float32)
    full = eng.predict(state, x)
    chunked = eng.predict(state, x, max_batch=4)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-6)


def test_plan_epoch_indices_small_dataset():
    from multi_task_breast_cancer_tpu.train.loop import plan_epoch_indices
    rng = np.random.default_rng(0)
    perm = plan_epoch_indices(3, 4, rng)  # n < batch: wrap-pad to one batch
    assert len(perm) == 4
    assert set(perm) == {0, 1, 2}
    perm = plan_epoch_indices(10, 4, rng)  # 3 steps, 2 padded
    assert len(perm) == 12
    assert sorted(set(perm)) == list(range(10))


def test_config_nnunet_widths_roundtrip(tmp_path):
    """The TPU-native nnunet_widths override parses from YAML and reaches the
    model factory; absent key keeps reference parity (None)."""
    from multi_task_breast_cancer_tpu.config import load_config
    from multi_task_breast_cancer_tpu.models import init_multitask_model

    cfg_file = tmp_path / "c.yaml"
    cfg_file.write_text(
        "model: {architecture: MTnnUNet, nnunet_widths: [4, 8, 12, 16, 20]}\n")
    cfg = load_config(cfg_file)
    assert cfg.model.nnunet_widths == [4, 8, 12, 16, 20]
    model = init_multitask_model("MTnnUNet", nnunet_widths=cfg.model.nnunet_widths)
    assert model.widths == (4, 8, 12, 16, 20)

    cfg_file.write_text("model: {architecture: MTnnUNet}\n")
    assert load_config(cfg_file).model.nnunet_widths is None
    assert init_multitask_model("MTnnUNet").widths == (32, 64, 128, 256, 320)


def test_nnunet_widths_wrong_length_fails_fast():
    import pytest
    from multi_task_breast_cancer_tpu.models import init_multitask_model
    with pytest.raises(ValueError, match="5 level widths"):
        init_multitask_model("MTnnUNet", nnunet_widths=[4, 8, 12])
