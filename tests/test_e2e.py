"""End-to-end driver tests: tiny synthetic BUSI, 2 folds, 2 epochs, all three
tasks + prod mode. Checks the full artifact contract (metrics.csv schema, run
dir layout, checkpoints, result CSVs/XLSX, PNG masks)."""

import zipfile
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
                                            n_per_class=8, size=64)


def _cfg(busi_root, arch, width=6, ds=True, epochs=2, nnunet_widths=None):
    return Config(
        model=ModelConfig(architecture=arch, width=width, deep_supervision=ds,
                          nnunet_widths=nnunet_widths),
        optimizer=OptimizerConfig(opt="Adam", lr=1e-3, scheduler="plateau"),
        loss=LossConfig(function="DICE", inversely_weighted=True,
                        classification_criterion="Focal"),
        training=TrainingConfig(seed=1993, epochs=epochs, CV=2, max_patience=50),
        data=DataConfig(input_img=str(busi_root), batch_size=4, oversampling=True),
    )


def test_segmentation_cv(busi_root, tmp_path):
    cfg = _cfg(busi_root, "BTSUNet")
    run_path = run_experiment(cfg, task="segmentation", mode="CV",
                              run_root=str(tmp_path / "runs"))
    run = Path(run_path)
    assert (run / "config.yaml").exists()
    assert (run / "model.txt").exists()
    assert (run / "execution.log").exists()
    for n in (0, 1):
        m = pd.read_csv(run / f"fold_{n}" / "metrics.csv")
        assert list(m.columns) == ["epoch", "LR", "Train", "Validation", "Test",
                                   "Train_loss", "Val_loss"]
        assert len(m) == 2
        assert (run / f"fold_{n}" / "results_segmentation.csv").exists()
        assert any((run / f"fold_{n}" / "segs").iterdir())
        assert any((run / f"fold_{n}" / "features_map").iterdir())
        assert (run / f"fold_{n}" / "plots" / "loss_evolution.png").exists()
        # checkpoint with .tar suffix (reference seg quirk)
        assert list((run / f"fold_{n}").glob("model_*_fold_*.tar"))
    # cross-fold sheet is a valid zip (xlsx)
    assert zipfile.is_zipfile(run / "results_segmentation.xlsx")


def test_multitask_cv_with_pr(busi_root, tmp_path):
    # Multi_BTSUNet: cheapest multitask DS compile — the PR/artifact contract
    # under test is arch-independent; the MTUNetPlusPlus variant runs in the
    # slow set (test_multitask_cv_unetpp)
    cfg = _cfg(busi_root, "Multi_BTSUNet", ds=True)
    run_path = run_experiment(cfg, task="multitask", mode="CV",
                              run_root=str(tmp_path / "runs"))
    run = Path(run_path)
    assert "_alpha_0.35_" in run.name
    for n in (0, 1):
        m = pd.read_csv(run / f"fold_{n}" / "metrics.csv")
        assert list(m.columns)[:4] == ["epoch", "LR", "Train_loss", "Validation_loss"]
        cls = pd.read_csv(run / f"fold_{n}" / "results_classification.csv")
        assert {"prob_benign", "prob_malignant", "prob_normal"} <= set(cls.columns)
        assert set(cls["predicted_label"]) <= {0, 1, 2}
    assert zipfile.is_zipfile(run / "results_segmentation.xlsx")
    assert zipfile.is_zipfile(run / "classification_results.xlsx")


def test_classification_cv(busi_root, tmp_path):
    cfg = _cfg(busi_root, "BTSUNetClassifier", ds=False)
    run_path = run_experiment(cfg, task="classification", mode="CV",
                              run_root=str(tmp_path / "runs"))
    run = Path(run_path)
    for n in (0, 1):
        m = pd.read_csv(run / f"fold_{n}" / "metrics.csv")
        assert "Train_acc" in m.columns and "Validation_F1" in m.columns
        assert (run / f"fold_{n}" / "results_classification.csv").exists()


@pytest.mark.slow
def test_multitask_cv_unetpp(busi_root, tmp_path):
    """MTUNetPlusPlus (the heaviest multitask compile) through the full CV
    driver — slow-set twin of test_multitask_cv_with_pr."""
    cfg = _cfg(busi_root, "MTUNetPlusPlus", ds=True)
    run_path = run_experiment(cfg, task="multitask", mode="CV",
                              run_root=str(tmp_path / "runs"))
    run = Path(run_path)
    for n in (0, 1):
        cls = pd.read_csv(run / f"fold_{n}" / "results_classification.csv")
        assert {"prob_benign", "prob_malignant", "prob_normal"} <= set(cls.columns)
    assert zipfile.is_zipfile(run / "results_segmentation.xlsx")


def test_multitask_prod(busi_root, tmp_path):
    cfg = _cfg(busi_root, "MTnnUNet", ds=True, nnunet_widths=[4, 8, 12, 16, 20])
    run_path = run_experiment(cfg, task="multitask", mode="CV_PROD",
                              run_root=str(tmp_path / "runs"))
    run = Path(run_path)
    for n in (0, 1):
        m = pd.read_csv(run / f"fold_{n}" / "metrics.csv")
        assert list(m.columns) == ["epoch", "LR", "Train_loss", "Train_dice",
                                   "Train_acc", "Train_F1"]
        # prod saves a checkpoint every epoch (no .tar for multitask)
        assert list((run / f"fold_{n}").glob("model_*_fold_*"))


def test_semantic_segmentation_cv(busi_root, tmp_path):
    """Config-driven semantic segmentation trains end-to-end: the flag wires
    a 3-channel head (regions=3) and routes the testing phase to the
    multilabel inference. The reference exposes `regions` in its factory but
    never wires it from config (experiment_init.py:288-291), so its semantic
    flag only changes the dataset and torch crashes on the shape mismatch —
    here it is a working path."""
    cfg = _cfg(busi_root, "BTSUNet", ds=False, epochs=1)
    cfg.data.semantic_segmentation = True
    run_path = run_experiment(cfg, task="segmentation", mode="CV",
                              run_root=str(tmp_path / "runs"))
    run = Path(run_path)
    for n in (0, 1):
        m = pd.read_csv(run / f"fold_{n}" / "metrics.csv")
        assert len(m) == 1 and m["Test"].notna().all()
        # multilabel inference writes results.csv (reference models.py:178)
        res = pd.read_csv(run / f"fold_{n}" / "results.csv")
        assert "predicted_class" in res.columns
        assert any((run / f"fold_{n}" / "segs").iterdir())


def test_semantic_segmentation_rejected_for_multitask(busi_root, tmp_path):
    cfg = _cfg(busi_root, "Multi_BTSUNet")
    cfg.data.semantic_segmentation = True
    with pytest.raises(ValueError, match="only supported for the"):
        run_experiment(cfg, task="multitask", mode="CV",
                       run_root=str(tmp_path / "runs"))
