"""CLI entry-point tests: the reference-parity `python -m ...training_*`
modules and the evaluate CLI, run as real subprocesses on tiny synthetic data."""

import subprocess
import sys
from pathlib import Path

import pytest

from multi_task_breast_cancer_tpu.data import synthetic

ENV = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
       "HOME": "/root", "PYTHONPATH": "/root/repo"}


@pytest.fixture(scope="module")
def busi_root(tmp_path_factory):
    return synthetic.make_preprocessed_busi(tmp_path_factory.mktemp("busi"),
                                            n_per_class=12, size=64)


def _config(tmp_path, busi_root, arch="BTSUNet"):
    cfg = tmp_path / "config.yaml"
    cfg.write_text(f"""
model:
  architecture: {arch}
  sequences: 1
  width: 4
  deep_supervision: False
optimizer:
  opt: Adam
  lr: 0.001
  scheduler: plateau
training:
  seed: 1993
  epochs: 1
  CV: 2
data:
  input_img: {busi_root}
  batch_size: 4
  classes: [benign, malignant, normal]
  oversampling: False
""")
    return cfg


def test_training_segmentation_module(tmp_path, busi_root):
    cfg = _config(tmp_path, busi_root)
    proc = subprocess.run(
        [sys.executable, "-m", "multi_task_breast_cancer_tpu.training_segmentation",
         "--config", str(cfg), "--run-root", str(tmp_path / "runs")],
        capture_output=True, text=True, timeout=900, env=ENV, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    runs = list((tmp_path / "runs").iterdir())
    assert len(runs) == 1
    assert (runs[0] / "fold_1" / "results_segmentation.csv").exists()


def test_evaluate_cli(tmp_path, busi_root):
    import jax
    import jax.numpy as jnp
    from multi_task_breast_cancer_tpu.models import init_segmentation_model
    from multi_task_breast_cancer_tpu.train.checkpoint import save_checkpoint
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state

    model = init_segmentation_model("BTSUNet", width=4)
    tx = init_optimizer("Adam", 1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state, epoch=0, val_loss=1.0)

    cfg = _config(tmp_path, busi_root)
    out = tmp_path / "eval_out"
    proc = subprocess.run(
        [sys.executable, "-m", "multi_task_breast_cancer_tpu.evaluate",
         "--config", str(cfg), "--task", "segmentation",
         "--checkpoint", str(ckpt), "--data", str(busi_root),
         "--output", str(out)],
        capture_output=True, text=True, timeout=900, env=ENV, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (out / "results_segmentation.csv").exists()


def test_holdout_check_cli(busi_root):
    """Split-inspection CLI: fold membership + class distributions printed
    for CV and holdout modes."""
    for extra in (["--folds", "2"], ["--mode", "holdout"]):
        out = subprocess.run(
            [sys.executable, "-m", "multi_task_breast_cancer_tpu.data.holdout_check",
             "--mapping", str(busi_root / "mapping.csv"), "--seed", "1993"] + extra,
            env=ENV, capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr
    cv_out = subprocess.run(
        [sys.executable, "-m", "multi_task_breast_cancer_tpu.data.holdout_check",
         "--mapping", str(busi_root / "mapping.csv"), "--folds", "2"],
        env=ENV, capture_output=True, text=True, timeout=300).stdout
    assert "--- fold 0 ---" in cv_out and "--- fold 1 ---" in cv_out
    assert "test ids:" in cv_out


@pytest.mark.slow
def test_evaluate_cli_multitask_pr(tmp_path, busi_root):
    """PR-enabled multitask evaluation on external (UCLM-mode) data through
    the same _fold_inference dispatch as the driver: the per-image CSV must
    carry the raw-logit prob_* columns and respect the class/seg overlap
    rules (every image predicted 'normal' has an empty refined mask —
    reference ``models.py:325-332``)."""
    import pandas as pd

    import jax
    import jax.numpy as jnp
    from multi_task_breast_cancer_tpu.models import init_multitask_model
    from multi_task_breast_cancer_tpu.train.checkpoint import save_checkpoint
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state

    model = init_multitask_model("Multi_BTSUNet", width=4)
    tx = init_optimizer("Adam", 1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state, epoch=0, val_loss=1.0)

    cfg = _config(tmp_path, busi_root, arch="Multi_BTSUNet")
    out = tmp_path / "eval_out"
    proc = subprocess.run(
        [sys.executable, "-m", "multi_task_breast_cancer_tpu.evaluate",
         "--config", str(cfg), "--task", "multitask",
         "--checkpoint", str(ckpt), "--data", str(busi_root),
         "--output", str(out)],
        capture_output=True, text=True, timeout=900, env=ENV, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]

    seg = pd.read_csv(out / "results_segmentation.csv")
    cls = pd.read_csv(out / "results_classification.csv")
    for col in ("prob_benign", "prob_malignant", "prob_normal"):
        assert col in cls.columns
    assert len(seg) == len(cls) > 0
    # overlap_seg_based_on_class: predicted normal => refined mask emptied,
    # so the per-image DICE on an empty-GT image is exactly 1.0 and on a
    # tumor image exactly 0.0
    import numpy as np
    normals = cls[cls.predicted_label == 2]
    if len(normals):
        merged = seg.merge(normals, on="patient_id")
        assert np.all((merged["DICE"] == 1.0) | (merged["DICE"] == 0.0))
