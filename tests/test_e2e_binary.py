"""End-to-end driver tests for the binary-classes configuration
(classes=[benign, malignant]): BCE-with-logits criterion, binary multitask
inference, binary classification inference (results.csv naming quirk)."""

from pathlib import Path

import pandas as pd
import pytest

from multi_task_breast_cancer_tpu.config import Config, DataConfig, LossConfig, \
    ModelConfig, OptimizerConfig, TrainingConfig
from multi_task_breast_cancer_tpu.data import synthetic
from multi_task_breast_cancer_tpu.train.driver import run_experiment


@pytest.fixture(scope="module")
def busi_root(tmp_path_factory):
    return synthetic.make_preprocessed_busi(tmp_path_factory.mktemp("busi"),
                                            n_per_class=10, size=64)


def _cfg(busi_root, arch, ds=True):
    return Config(
        model=ModelConfig(architecture=arch, width=6, deep_supervision=ds),
        optimizer=OptimizerConfig(opt="Adam", lr=1e-3, scheduler="cosine"),
        loss=LossConfig(function="DICE", inversely_weighted=False),
        training=TrainingConfig(seed=1993, epochs=2, CV=2),
        data=DataConfig(input_img=str(busi_root), batch_size=4,
                        classes=["benign", "malignant"], oversampling=True),
    )


def test_binary_multitask_cv(busi_root, tmp_path):
    cfg = _cfg(busi_root, "Multi_BTSUNet")
    run_path = run_experiment(cfg, task="multitask", mode="CV",
                              run_root=str(tmp_path / "runs"))
    run = Path(run_path)
    for n in (0, 1):
        cls = pd.read_csv(run / f"fold_{n}" / "results_classification.csv")
        # binary multitask: labels are 0/1 floats, no prob columns (ref parity)
        assert set(cls.columns) == {"patient_id", "ground_truth", "predicted_label"}
        assert set(cls["predicted_label"]) <= {0.0, 1.0}
        seg = pd.read_csv(run / f"fold_{n}" / "results_segmentation.csv")
        assert "DICE" in seg.columns


def test_binary_classification_cv(busi_root, tmp_path):
    cfg = _cfg(busi_root, "BTSUNetClassifier", ds=False)
    run_path = run_experiment(cfg, task="classification", mode="CV",
                              run_root=str(tmp_path / "runs"))
    run = Path(run_path)
    for n in (0, 1):
        # reference quirk: binary classification writes results.csv (not
        # results_classification.csv) — models.py:503
        assert (run / f"fold_{n}" / "results.csv").exists()
        res = pd.read_csv(run / f"fold_{n}" / "results.csv")
        assert set(res["predicted_label"]) <= {0.0, 1.0}
