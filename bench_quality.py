"""Long-horizon quality probe: f32 vs bf16 convergence of the flagship
MTnnUNet under the FULL driver (4-fold CV, oversampling, on-device
augmentation, plateau scheduler, early stopping, best-ckpt inference) on a
learnable synthetic BUSI-like set at the real 128×128 size.

Writes ``QUALITY_r03.json``: per-epoch train/val loss+dice+acc curves for
every fold and dtype, final test metrics from the driver's inference phase,
and an f32-vs-bf16 delta summary. This is the committed evidence that (a) the
training dynamics converge over a long horizon and (b) bf16 mixed precision —
the throughput configuration benchmarked in bench.py — matches f32 quality.

The real BUSI dataset is not present in this environment
(``/root/reference/data`` is a stub), so exact parity with the reference's
headline table (``/root/reference/README.md:77``, BASELINE.md) cannot be
measured; this probe is the substitute evidence: same driver, same
hyperparameter shape, learnable data, 50 epochs.

Run on TPU: ``python bench_quality.py`` (~10 min, two full CV experiments).
"""

from __future__ import annotations

import json
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd

from multi_task_breast_cancer_tpu.config import Config, DataConfig, LossConfig, \
    ModelConfig, OptimizerConfig, TrainingConfig
from multi_task_breast_cancer_tpu.data import synthetic
from multi_task_breast_cancer_tpu.train.driver import run_experiment

EPOCHS = 50
CV = 4
# real Curated-BUSI class imbalance (437/210/133) scaled by 1/3 — drives the
# deterministic-oversampling factors (2/4/6) at realistic ratios
CLASS_COUNTS = {"benign": 146, "malignant": 70, "normal": 44}
BATCH = 8


def run_one(root: Path, run_root: Path, dtype: str) -> dict:
    cfg = Config(
        model=ModelConfig(architecture="MTnnUNet"),
        optimizer=OptimizerConfig(opt="Adam", lr=1e-4, scheduler="plateau"),
        loss=LossConfig(function="DICE", inversely_weighted=True,
                        classification_criterion="Focal"),
        training=TrainingConfig(seed=1993, epochs=EPOCHS, CV=CV,
                                max_patience=200, alpha=0.35,
                                compute_dtype=dtype,
                                # pin the exact-parity augmentation: the
                                # committed QUALITY_r0N artifacts were
                                # generated pre-flip; a regeneration must
                                # stay comparable to them
                                fast_augmentation=False),
        data=DataConfig(input_img=str(root), batch_size=BATCH,
                        oversampling=True),
    )
    t0 = time.perf_counter()
    run_path = Path(run_experiment(cfg, task="multitask", mode="CV",
                                   run_root=str(run_root / dtype)))
    wall = time.perf_counter() - t0

    folds = []
    for fold_dir in sorted(run_path.glob("fold_*")):
        m = pd.read_csv(fold_dir / "metrics.csv")
        seg = pd.read_csv(fold_dir / "results_segmentation.csv")
        cls = pd.read_csv(fold_dir / "results_classification.csv")
        folds.append({
            "curves": {
                "train_loss": m["Train_loss"].round(4).tolist(),
                "val_loss": m["Validation_loss"].round(4).tolist(),
                "train_dice": m["Train_dice"].round(4).tolist(),
                "val_dice": m["Validation_dice"].round(4).tolist(),
                "train_acc": m["Train_acc"].round(4).tolist(),
                "val_acc": m["Validation_acc"].round(4).tolist(),
            },
            "test": {
                "dice": round(float(seg["DICE"].mean()), 4),
                "acc": round(float((cls["ground_truth"]
                                    == cls["predicted_label"]).mean()), 4),
            },
        })
    return {"wall_s": round(wall, 1), "folds": folds}


def mean_curve(result: dict, key: str) -> np.ndarray:
    curves = [f["curves"][key] for f in result["folds"]]
    n = min(len(c) for c in curves)
    return np.mean([c[:n] for c in curves], axis=0)


def main() -> None:
    tmp = Path(tempfile.mkdtemp(prefix="mtbc_quality_"))
    root = synthetic.make_preprocessed_busi(tmp / "busi", size=128,
                                            learnable=True,
                                            class_counts=CLASS_COUNTS)
    results = {}
    for dtype in ("float32", "bfloat16"):
        print(f"=== {dtype} ===", flush=True)
        results[dtype] = run_one(root, tmp / "runs", dtype)

    deltas = {}
    for key in ("val_loss", "val_dice", "val_acc"):
        f32, bf16 = mean_curve(results["float32"], key), \
            mean_curve(results["bfloat16"], key)
        n = min(len(f32), len(bf16))
        deltas[f"max_abs_delta_{key}"] = round(float(
            np.max(np.abs(f32[:n] - bf16[:n]))), 4)
        deltas[f"final_delta_{key}"] = round(float(bf16[n - 1] - f32[n - 1]), 4)

    test_summary = {
        dtype: {
            "test_dice_mean": round(float(np.mean(
                [f["test"]["dice"] for f in results[dtype]["folds"]])), 4),
            "test_acc_mean": round(float(np.mean(
                [f["test"]["acc"] for f in results[dtype]["folds"]])), 4),
        } for dtype in results
    }

    out = {
        "config": {"model": "MTnnUNet", "epochs": EPOCHS, "cv": CV,
                   "class_counts": CLASS_COUNTS, "image_size": 128,
                   "batch_size": BATCH, "optimizer": "Adam lr=1e-4",
                   "data": "synthetic learnable BUSI-like (dark/bright/none lesion)"},
        "platform": __import__("jax").devices()[0].platform,
        "summary": {"test": test_summary, "bf16_vs_f32": deltas},
        "runs": results,
    }
    Path("QUALITY_r03.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"summary": out["summary"]}, indent=2))


if __name__ == "__main__":
    main()
