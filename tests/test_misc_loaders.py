"""Coverage for the remaining loader variants: holdout 80/10/10 split, UCLM
mode, legacy random oversampling, and Adityan through the multitask engine."""

import numpy as np
import pandas as pd
import pytest

from multi_task_breast_cancer_tpu.config import DataConfig, TrainingConfig
from multi_task_breast_cancer_tpu.data import synthetic
from multi_task_breast_cancer_tpu.data.loader import load_datasets, load_holdout
from multi_task_breast_cancer_tpu.data.splits import oversampling_busi


@pytest.fixture(scope="module")
def busi_root(tmp_path_factory):
    return synthetic.make_preprocessed_busi(tmp_path_factory.mktemp("busi"),
                                            n_per_class=12, size=64)


def test_holdout_loader(busi_root):
    tc = TrainingConfig(seed=1993)
    dc = DataConfig(input_img=str(busi_root), oversampling=True)
    fold = load_holdout(tc, dc)
    assert fold.val is not None
    # 80/10/10 split of 36 → train≈28 (+malignant oversample), val/test small
    assert len(fold.val) + len(fold.test) <= 10
    assert len(fold.train) > 25


def test_uclm_mode(busi_root):
    tc = TrainingConfig(seed=1993)
    dc = DataConfig(input_img="unused", oversampling=False)
    folds = load_datasets(tc, dc, mode="UCLM", uclm_path=str(busi_root))
    assert len(folds) == 1
    assert len(folds[0].test) == 36


def test_legacy_oversampling(busi_root):
    # note: the malignant branch samples WITHOUT replacement
    # (BUSI_dataloader.py:310), so the deficit must not exceed the population —
    # a reference quirk preserved as-is
    m = pd.DataFrame({"class": ["benign"] * 20 + ["malignant"] * 12 + ["normal"] * 4,
                      "id": range(36)})
    over = oversampling_busi(m, seed=1993)
    counts = over["class"].value_counts()
    # balances malignant and normal up to benign's count (BUSI_dataloader.py:306-317)
    assert counts["benign"] == 20
    assert counts["malignant"] == 20
    assert counts["normal"] == 20


def test_adityan_through_engine():
    import jax
    import jax.numpy as jnp
    from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
    from multi_task_breast_cancer_tpu.models import init_multitask_model
    from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig, plan_epoch_indices
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    n, H = 4, 32
    ds = ArrayDataset(images=(rng.random((n, H, H, 1)) * 255).astype(np.float32),
                      masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
                      labels=rng.integers(0, 3, n).astype(np.int32),
                      patient_ids=np.arange(n), class_names=["benign"] * n,
                      tumor_pixels=np.zeros(n, np.int64))
    model = init_multitask_model("Adityan", width=4)
    tx = init_optimizer("Adam", 1e-3)
    engine = Engine(model, tx, EngineConfig(task="multitask", batch_size=2,
                                            use_transforms=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, H, 1)))
    data = engine.device_data(ds)
    perm = plan_epoch_indices(n, 2, np.random.default_rng(1))
    state, m = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))
    assert np.isfinite(m["loss"])
