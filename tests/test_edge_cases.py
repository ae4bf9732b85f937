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


def test_make_cls_targets_rejects_unmapped_labels():
    """The fixed reference label map (benign=0, malignant=1, normal=2) is
    never remapped for class subsets: a 2-class config containing 'normal'
    would feed target 2.0 into binary BCE and silently drop those rows from
    the confusion matrix — fail fast instead."""
    import numpy as np
    import pytest

    from multi_task_breast_cancer_tpu.train.loop import make_cls_targets

    with pytest.raises(ValueError, match="benign, malignant"):
        make_cls_targets(np.array([0, 2, 0]), n_classes=2)
    # the valid binary encoding is unchanged
    t = make_cls_targets(np.array([0, 1, 1]), n_classes=2)
    assert t.shape == (3, 1)
    # a pure-segmentation run never consumes the targets: classes like
    # [benign, normal] (labels 0 and 2) are valid seg configs in the
    # reference and must NOT hard-fail (the guard is task-scoped)
    t = make_cls_targets(np.array([0, 2, 0]), n_classes=2, task="segmentation")
    assert t.shape == (3, 1)


def test_hardcoded_cls_head_mismatch_fails_fast():
    """Multi_FSB_BTSUNet hard-codes ONE cls logit (Multi_FSB_BTS_UNet.py:152):
    with 3 classes, softmax-CE over a single logit is identically zero and
    the classifier would silently never train (the reference crashes inside
    torch F.cross_entropy). The Engine must reject the combination at trace
    time."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
    from multi_task_breast_cancer_tpu.models import init_multitask_model
    from multi_task_breast_cancer_tpu.train.loop import (
        Engine, EngineConfig, plan_epoch_indices)
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    n, H = 4, 32
    ds = ArrayDataset(images=(rng.random((n, H, H, 1)) * 255).astype(np.float32),
                      masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
                      labels=rng.integers(0, 3, n).astype(np.int32),
                      patient_ids=np.arange(n), class_names=["benign"] * n,
                      tumor_pixels=np.zeros(n, np.int64))
    model = init_multitask_model("Multi_FSB_BTSUNet", width=4)
    tx = init_optimizer("Adam", 1e-3)
    engine = Engine(model, tx, EngineConfig(task="multitask", n_classes=3,
                                            batch_size=2, use_transforms=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, H, 1)))
    data = engine.device_data(ds)
    perm = plan_epoch_indices(n, 2, np.random.default_rng(1))
    with pytest.raises(ValueError, match="hard-coded heads"):
        engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))


def test_factory_defaults_no_spurious_warnings(caplog):
    """Direct factory calls with pure defaults must not log 'knob ignored'
    warnings — only an explicit caller-passed value can be 'ignored'."""
    import logging

    from multi_task_breast_cancer_tpu.models import (
        init_multitask_model, init_segmentation_model)

    with caplog.at_level(logging.WARNING):
        init_multitask_model("MTnnUNet")
        init_segmentation_model("nnUNet")
    assert not [r for r in caplog.records if "ignored" in r.message]


def test_device_data_skips_aug_packing_for_eval_splits():
    import jax
    import numpy as np

    from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
    from multi_task_breast_cancer_tpu.models import init_segmentation_model
    from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer

    rng = np.random.default_rng(0)
    n, H = 4, 32
    ds = ArrayDataset(images=(rng.random((n, H, H, 1)) * 255).astype(np.float32),
                      masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
                      labels=rng.integers(0, 3, n).astype(np.int32),
                      patient_ids=np.arange(n), class_names=["benign"] * n,
                      tumor_pixels=np.zeros(n, np.int64))
    engine = Engine(init_segmentation_model("BTSUNet", width=4),
                    init_optimizer("Adam", 1e-3),
                    EngineConfig(task="segmentation", batch_size=2,
                                 fast_augmentation=True))
    assert "aug_packed" in engine.device_data(ds)
    assert "aug_packed" not in engine.device_data(ds, for_training=False)
