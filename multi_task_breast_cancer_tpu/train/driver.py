"""Generic experiment driver — one parameterised runner replacing the
reference's six copy-pasted training scripts (``src/training_{segmentation,
classification,multitask}[_prod].py``), with identical run-directory layout,
metrics.csv schemas, checkpoint naming, plots, and final inference per task.

Task × mode matrix:
- task: 'segmentation' | 'classification' | 'multitask'
- mode: 'CV' (train/val/test, best-val checkpoint, early stopping)
       | 'CV_PROD' (train=train∪val, no validation, checkpoint every epoch,
         scheduler steps on train loss, early stopping dead — reference quirk
         ``training_multitask_prod.py:213-216`` preserved)
"""

from __future__ import annotations

import dataclasses
import logging
import os
import sys
import time
from datetime import datetime
from pathlib import Path
from pprint import pformat
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from multi_task_breast_cancer_tpu.config import Config, config_to_yaml
from multi_task_breast_cancer_tpu.data.loader import load_datasets
from multi_task_breast_cancer_tpu.models import (
    init_classification_model,
    init_multitask_model,
    init_segmentation_model,
)
from multi_task_breast_cancer_tpu.models.registry import save_model_summary
from multi_task_breast_cancer_tpu.ops.image_ops import fill_holes as fill_holes_fn
from multi_task_breast_cancer_tpu.ops.losses import check_finite_loss
from multi_task_breast_cancer_tpu.ops.metrics import (
    binary_classification_metrics,
    dice_score,
    multiclass_classification_metrics,
)
from multi_task_breast_cancer_tpu.parallel.mesh import (
    data_space_mesh,
    replicate_to_mesh,
)
from multi_task_breast_cancer_tpu.train import inference as I
from multi_task_breast_cancer_tpu.train.checkpoint import (
    load_pretrained_model,
    restore_checkpoint,
    save_checkpoint,
)
from multi_task_breast_cancer_tpu.train.loop import (
    Engine,
    EngineConfig,
    plan_epoch_indices,
    step_valid_mask,
)
from multi_task_breast_cancer_tpu.train.optim import (
    CosineAnnealingScheduler,
    init_lr_scheduler,
    init_optimizer,
    set_learning_rate,
)
from multi_task_breast_cancer_tpu.train.state import create_train_state
from multi_task_breast_cancer_tpu.utils.miscellany import (
    enable_compilation_cache,
    init_log,
    save_classification_results,
    save_segmentation_results,
    seed_everything,
    write_metrics_file,
)
from multi_task_breast_cancer_tpu.utils.profiling import maybe_profile
from multi_task_breast_cancer_tpu.utils.visualization import plot_evolution


def input_channels(cfg: Config) -> int:
    """Model input width: raw sequences + config-enabled augment channels.

    THE one formula — train, serving export, predict, and the torch importer
    all build their input shapes through here (a drifted copy would 'work'
    silently: Flax infers channels from data)."""
    return cfg.model.sequences + cfg.data.augmentation.n_active()


def _build_model(cfg: Config, task: str):
    sequences = input_channels(cfg)
    n_classes = len(cfg.data.classes)
    nw = cfg.model.nnunet_widths
    if task == "segmentation":
        # data.semantic_segmentation loads (H,W,3) one-hot masks, so the
        # head must emit 3 channels. The reference exposes `regions` in its
        # factory but never wires it from config (experiment_init.py:288-291
        # — its semantic flag only changes the dataset, and torch would
        # crash on the shape mismatch); here the flag trains end-to-end.
        regions = 3 if cfg.data.semantic_segmentation else 1
        return init_segmentation_model(cfg.model.architecture, sequences=sequences,
                                       regions=regions,
                                       width=cfg.model.width,
                                       deep_supervision=cfg.model.deep_supervision,
                                       nnunet_widths=nw)
    if task == "classification":
        return init_classification_model(cfg.model.architecture, sequences=sequences,
                                         n_classes=n_classes, width=cfg.model.width,
                                         nnunet_widths=nw)
    return init_multitask_model(cfg.model.architecture, sequences=sequences,
                                n_classes=n_classes, width=cfg.model.width,
                                deep_supervision=cfg.model.deep_supervision,
                                nnunet_widths=nw)


def build_inference_state(cfg: Config, task: str, size: int = 128,
                          checkpoint: Optional[str] = None):
    """Model + fresh TrainState (+ optional checkpoint restore): the one
    shared recipe behind ``predict.py``, the serving backends/export, and the
    torch-checkpoint importer. Returns ``(model, tx, state, channels)``.

    Keeping this in one place means a change to state construction (e.g. a
    new input-channel source) cannot silently diverge between training and
    the deployment paths."""
    channels = input_channels(cfg)
    model = _build_model(cfg, task)
    tx = init_optimizer(cfg.optimizer.opt, cfg.optimizer.lr)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, size, size, channels)))
    if checkpoint is not None:
        state = load_pretrained_model(state, checkpoint)
    return model, tx, state, channels


def quick_test_dice(engine: Engine, state, test_ds, fill_holes: bool = True,
                    pad_to: int | None = None, device_images=None) -> float:
    """Per-image mean test DICE (the number the seg drivers log each epoch,
    ``training_segmentation.py:179-196``) without the reference's per-epoch
    PNG/Hausdorff overhead: one batched forward + host hole-filling.

    ``device_images``: optionally pre-placed device copy of ``test_ds.images``
    — per-epoch callers should place the split once per fold instead of
    re-uploading it every epoch (a host→device transfer per epoch on tunnel
    runtimes)."""
    images = test_ds.images if device_images is None else device_images
    out = engine.predict(state, images, pad_to=pad_to)
    if engine.cfg.task == "multitask":
        out = out[-1]  # (cls, seg) or Adityan's (cls, rec, seg): seg is last
    final = out[-1] if isinstance(out, (tuple, list)) else out
    final = np.asarray(final)
    if final.shape[-1] > 1:
        # semantic head: argmax labels, mean of per-class dices (classes
        # 1..C-1, background skipped — same convention as
        # calculate_metrics_multiclass_segmentation)
        pred = np.argmax(final, axis=-1)
        dices = []
        for i in range(len(test_ds)):
            gt = np.argmax(test_ds.masks[i], axis=-1)
            per_class = []
            for c in range(1, final.shape[-1]):
                g, s = gt == c, pred[i] == c
                tp = float(np.logical_and(s, g).sum())
                fp = float(np.logical_and(s, ~g).sum())
                fn = float(np.logical_and(~s, g).sum())
                per_class.append(dice_score(tp, fp, fn, g, s))
            dices.append(np.nanmean(per_class))
        return float(np.nanmean(dices))
    probs = I._sigmoid(final[..., 0])
    dices = []
    for i in range(len(test_ds)):
        seg = (probs[i] > 0.5).astype(np.uint8)
        if fill_holes:
            seg = fill_holes_fn(seg)
        gt = test_ds.masks[i, :, :, 0]
        tp = float(np.logical_and(seg, gt).sum())
        fp = float(np.logical_and(seg, 1 - gt).sum())
        fn = float(np.logical_and(1 - seg, gt).sum())
        dices.append(dice_score(tp, fp, fn, gt, seg))
    return float(np.mean(dices))


METRIC_HEADERS = {
    ("segmentation", "CV"): "epoch,LR,Train,Validation,Test,Train_loss,Val_loss",
    ("segmentation", "CV_PROD"): "epoch,LR,Train,Test,Train_loss",
    ("classification", "CV"): "epoch,LR,Train_loss,Validation_loss,Train_acc,Train_F1,Validation_acc,Validation_F1",
    ("classification", "CV_PROD"): "epoch,LR,Train_loss,Train_acc,Train_F1",
    ("multitask", "CV"): "epoch,LR,Train_loss,Validation_loss,Train_dice,Validation_dice,Train_acc,Train_F1,Validation_acc,Validation_F1",
    ("multitask", "CV_PROD"): "epoch,LR,Train_loss,Train_dice,Train_acc,Train_F1",
}


def _cls_f1(metrics: dict, task: str, n_classes: int) -> float:
    """Reference F1 flavour: multitask logs weighted F1; the classification
    driver logs micro (multiclass) / binary F1 (``training_classification.py:92``)."""
    if task == "multitask":
        return metrics["f1"]
    return metrics["f1_micro"] if n_classes > 2 else metrics["f1_binary"]


def _log_epoch(task: str, mode: str, n_classes: int, epoch: int,
               current_lr: float, tm: dict, vm: Optional[dict],
               test_dice: Optional[float], patience: int, dt: float,
               best_validation_loss: float) -> str:
    """Emit the reference-format per-epoch log line and return the
    metrics.csv row."""
    if task == "segmentation":
        if mode == "CV":
            logging.info(
                "EPOCH %d --> || Training loss %.4f || Validation loss %.4f "
                "|| Training DICE %.4f || Validation DICE  %.4f || Patience: %d "
                "|| Epoch time: %.4f || LR: %.8f", epoch, tm["loss"], vm["loss"],
                tm["dice"], vm["dice"], patience, dt, current_lr)
            return (f"{epoch},{current_lr:.8f},{tm['dice']:.4f}, {vm['dice']:.4f},"
                    f"{test_dice:.4f},{tm['loss']:.4f},{vm['loss']:.4f}")
        logging.info(
            "EPOCH %d --> || Training loss %.4f || Training DICE %.4f "
            "|| Patience: %d || Epoch time: %.4f || LR: %.8f",
            epoch, tm["loss"], tm["dice"], patience, dt, current_lr)
        return (f"{epoch},{current_lr:.8f},{tm['dice']:.4f},{test_dice:.4f},"
                f"{tm['loss']:.4f}")
    if task == "classification":
        tf1 = _cls_f1(tm, task, n_classes)
        if mode == "CV":
            vf1 = _cls_f1(vm, task, n_classes)
            logging.info(
                "EPOCH %d --> || Training loss %.4f || Validation loss %.4f "
                "|| Training ACC %.4f || Training F1 %.4f || Validation ACC %.4f "
                "|| Validation F1 %.4f || Patience: %d || Epoch time: %.4f",
                epoch, tm["loss"], vm["loss"], tm["acc"], tf1, vm["acc"], vf1,
                patience, dt)
            return (f"{epoch},{current_lr:.8f},{tm['loss']:.4f},{vm['loss']:.4f},"
                    f"{tm['acc']:.4f},{tf1:.4f},{vm['acc']:.4f},{vf1:.4f}")
        logging.info(
            "EPOCH %d --> || Training loss %.4f || Training ACC %.4f "
            "|| Training F1 %.4f || Patience: %d || Epoch time: %.4f",
            epoch, tm["loss"], tm["acc"], tf1, patience, dt)
        return f"{epoch},{current_lr:.8f},{tm['loss']:.4f},{tm['acc']:.4f},{tf1:.4f}"
    # multitask
    if mode == "CV":
        logging.info(
            "EPOCH %d --> || Training loss %.4f || Validation loss %.4f "
            "|| Segmentation val loss %.4f || Classification val loss %.4f "
            "|| Training DICE %.4f || Validation DICE  %.4f || Training ACC %.4f "
            "|| Training F1 %.4f || Validation ACC %.4f || Validation F1 %.4f "
            "|| Patience: %d || Epoch time: %.4f || Best validation performance: %.4f",
            epoch, tm["loss"], vm["loss"], vm["seg_loss"], vm["cls_loss"],
            tm["dice"], vm["dice"], tm["acc"], tm["f1"], vm["acc"], vm["f1"],
            patience, dt, best_validation_loss)
        return (f"{epoch},{current_lr:.8f},{tm['loss']:.4f},{vm['loss']:.4f},"
                f"{tm['dice']:.4f}, {vm['dice']:.4f},{tm['acc']:.4f},"
                f"{tm['f1']:.4f},{vm['acc']:.4f},{vm['f1']:.4f}")
    logging.info(
        "EPOCH %d --> || Training loss %.4f || Training DICE %.4f "
        "|| Training ACC %.4f || Training F1 %.4f || Patience: %d "
        "|| Epoch time: %.4f", epoch, tm["loss"], tm["dice"],
        tm["acc"], tm["f1"], patience, dt)
    return (f"{epoch},{current_lr:.8f},{tm['loss']:.4f},"
            f"{tm['dice']:.4f}, {tm['acc']:.4f},{tm['f1']:.4f}")


def _fold_plots(task: str, mode: str, metrics_path: str, run_path: str,
                n: int) -> None:
    """Evolution plots (CV mode; prod scripts have them commented out)."""
    if mode != "CV":
        return
    metrics_df = pd.read_csv(metrics_path)
    if task == "segmentation":
        plot_evolution(metrics_df, ["Train", "Validation", "Test"],
                       f"{run_path}/fold_{n}/plots/metrics_evolution.png",
                       title="DICE coefficient", ylabel="DICE")
        plot_evolution(metrics_df, ["Train_loss", "Val_loss"],
                       f"{run_path}/fold_{n}/plots/loss_evolution.png",
                       title="DICE loss function", ylabel="Loss DICE")
    elif task == "classification":
        plot_evolution(metrics_df, ["Train_loss", "Validation_loss"],
                       f"{run_path}/fold_{n}/loss_evolution.png")
        plot_evolution(metrics_df, ["Train_acc", "Train_F1", "Validation_acc",
                                    "Validation_F1"],
                       f"{run_path}/fold_{n}/classification_metrics_evolution.png")
    else:
        plot_evolution(metrics_df, ["Train_loss", "Validation_loss"],
                       f"{run_path}/fold_{n}/loss_evolution.png")
        plot_evolution(metrics_df, ["Train_dice", "Validation_dice"],
                       f"{run_path}/fold_{n}/segmentation_metrics_evolution.png")
        plot_evolution(metrics_df, ["Train_acc", "Train_F1", "Validation_acc",
                                    "Validation_F1"],
                       f"{run_path}/fold_{n}/classification_metrics_evolution.png")


def _fold_inference(task: str, n_classes: int, cfg: Config, engine,
                    state, fold, fold_dir: str, ckpt_path: str,
                    pad_to: int | None = None) -> None:
    """Testing phase on the best checkpoint.

    ``pad_to`` (cross-fold max test size) lets every fold's test forward
    reuse ONE compiled program — unequal fold sizes otherwise compile one
    predict program each."""
    logging.info("\n\n ###############  TESTING PHASE  ###############  \n\n")
    if task != "segmentation":
        # The segmentation drivers never reload the best checkpoint — the
        # reload is commented out (training_segmentation.py:218, absent in
        # the prod variant), so their test phase scores LAST-epoch weights.
        # Classification/multitask drivers do reload (training_multitask.py:294).
        state = load_pretrained_model(state, ckpt_path)

    if task == "segmentation":
        if cfg.data.semantic_segmentation:
            test_results = I.inference_multilabel_segmentation(
                engine, state, fold.test, fold_dir)
        else:
            test_results = I.inference_binary_segmentation(
                engine, state, fold.test, fold_dir, pad_to=pad_to)
        logging.info("%s", test_results.mean(numeric_only=True))
    elif task == "classification":
        if n_classes <= 2:
            cls_results = I.inference_binary_classification(
                engine, state, fold.test, fold_dir, pad_to=pad_to)
            logging.info("\nClassification metrics:\n\n%s", pformat(
                binary_classification_metrics(cls_results.ground_truth,
                                              cls_results.predicted_label)))
        else:
            cls_results = I.inference_multiclass_classification(
                engine, state, fold.test, fold_dir, pad_to=pad_to)
            logging.info("\nClassification metrics:\n\n%s", pformat(
                multiclass_classification_metrics(cls_results.ground_truth,
                                                  cls_results.predicted_label)))
    else:
        if n_classes <= 2:
            seg_res, cls_res = I.inference_multitask_binary(
                engine, state, fold.test, fold_dir, pad_to=pad_to)
            logging.info("Segmentation metric:\n\n%s\n", seg_res.mean(numeric_only=True))
            logging.info("\nClassification metrics:\n\n%s", pformat(
                binary_classification_metrics(cls_res.ground_truth,
                                              cls_res.predicted_label)))
        else:
            seg_res, cls_res = I.inference_multitask_multiclass(
                engine, state, fold.test, fold_dir,
                threshold=cfg.training.threshold_postprocessing,
                overlap_seg_based_on_class=cfg.training.overlap_seg_based_on_class,
                overlap_class_based_on_seg=cfg.training.overlap_class_based_on_seg,
                pad_to=pad_to)
            logging.info("Segmentation metric:\n\n%s\n", seg_res.mean(numeric_only=True))
            logging.info("\nClassification metrics:\n\n%s", pformat(
                multiclass_classification_metrics(cls_res.ground_truth,
                                                  cls_res.predicted_label)))


def _metrics_rows(path: str) -> list:
    """Data rows (header excluded) of a fold's metrics.csv; [] if absent."""
    p = Path(path)
    if not p.is_file():
        return []
    lines = [ln for ln in p.read_text().splitlines() if ln.strip()]
    return lines[1:]


def _rewrite_metrics(path: str, header: str, rows: list) -> None:
    """Atomically rewrite a fold's metrics.csv (tmp + os.replace, like
    checkpoint.py): a kill mid-rewrite must not leave a torn file, because
    --resume counts its rows to replay the host RNG — a torn partial row
    would silently shift every later fold's epoch permutations."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_name(p.name + ".tmp")
    tmp.write_text("\n".join([header] + list(rows)) + "\n")
    os.replace(tmp, p)


def _fold_complete(run_path: str, n: int) -> bool:
    """A fold is complete once the driver's end-of-fold marker exists.

    An explicit marker (written AFTER the testing phase) is the only reliable
    signal: the per-image results CSVs are ambiguous — the seg driver rewrites
    them every epoch under ``per_epoch_test_artifacts``, and binary
    classification writes ``results.csv`` (a reference filename quirk)."""
    return (Path(f"{run_path}/fold_{n}") / ".fold_complete").is_file()


def _find_checkpoint(run_path: str, n: int, default: str) -> str:
    """Existing fold checkpoint, robust to a renamed run directory (the
    timestamp embedded in the filename then differs from the dir name)."""
    if Path(default).is_file():
        return default
    found = sorted(p for p in Path(f"{run_path}/fold_{n}").glob("model_*")
                   if p.is_file() and not p.name.endswith(".tmp"))
    return str(found[0]) if found else default


def run_experiment(cfg: Config, task: str, mode: str = "CV",
                   config_src: Optional[str] = None, run_root: str = "runs",
                   # config_src is kept for CLI compatibility; the run dir
                   # stores the RESOLVED config (see below), not a byte-copy
                   uclm_path: Optional[str] = None,
                   resume_dir: Optional[str] = None) -> str:
    """Run the full k-fold experiment; returns the run directory path.

    ``resume_dir`` continues a crashed/killed run in place: completed folds
    are skipped, an interrupted fold restarts from its last written checkpoint
    (``training.checkpoint_every_epoch=True`` gives per-epoch granularity —
    PARITY D9), and the host RNG stream is replayed so the finished run is
    byte-identical to an uninterrupted one (tested)."""
    init_time = time.perf_counter()
    if cfg.data.semantic_segmentation and task != "segmentation":
        raise ValueError(
            "data.semantic_segmentation is only supported for the "
            "segmentation task: the classification/multitask heads have no "
            "semantic-mask objective (the reference has no such path either "
            "— its flag only changes the dataset, BUSI_dataset.py:51)")
    enable_compilation_cache()

    if cfg.training.CV < 2:
        sys.exit("This code is prepared for receiving a CV greater than 1")

    root_key = seed_everything(cfg.training.seed)
    host_rng = np.random.default_rng(cfg.training.seed)

    n_classes = len(cfg.data.classes)
    if resume_dir is not None:
        run_path = str(resume_dir).rstrip("/")
        if not Path(run_path).is_dir():
            sys.exit(f"--resume: run directory '{run_path}' does not exist")
        # the original timestamp names the per-fold checkpoint files
        timestamp = "_".join(Path(run_path).name.split("_")[:2])
    else:
        timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        alpha_part = f"_alpha_{cfg.training.alpha}" if task == "multitask" else ""
        run_path = (f"{run_root}/{timestamp}_{cfg.model.architecture}_{cfg.model.width}"
                    f"{alpha_part}_batch_{cfg.data.batch_size}_{'_'.join(cfg.data.classes)}")
    Path(run_path).mkdir(parents=True, exist_ok=True)
    init_log(log_name=f"{run_path}/execution.log")
    if resume_dir is not None:
        logging.info("Resuming run in place: %s", run_path)
    run_cfg_yaml = Path(run_path) / "config.yaml"
    if resume_dir is not None and run_cfg_yaml.exists():
        # resume semantics (fold membership, RNG replay, shapes) only hold
        # under the original run's critical settings — fail fast on mismatch
        from multi_task_breast_cancer_tpu.config import load_config
        saved = load_config(run_cfg_yaml)
        # Default-drift guard for PRE-round-5 run dirs: their config.yaml is
        # a byte-copy of the user's (possibly sparse) YAML, so an absent
        # fast_augmentation key would now parse as the NEW default (True)
        # even though the run trained the exact path under the old default
        # (False). Re-interpret absence as the value that was in force when
        # such a file could still be written — the mismatch guard below then
        # fails fast (telling the user to set the key explicitly) instead of
        # silently switching augmentation semantics mid-run. New run dirs
        # always store the resolved config, so the key is always present.
        import yaml as _yaml
        _raw = _yaml.safe_load(run_cfg_yaml.read_text()) or {}
        if "fast_augmentation" not in (_raw.get("training") or {}):
            saved.training.fast_augmentation = False
        critical = [
            ("training.seed", cfg.training.seed, saved.training.seed),
            ("training.CV", cfg.training.CV, saved.training.CV),
            ("training.epochs", cfg.training.epochs, saved.training.epochs),
            ("training.max_patience", cfg.training.max_patience,
             saved.training.max_patience),
            ("training.alpha", cfg.training.alpha, saved.training.alpha),
            ("training.compute_dtype", cfg.training.compute_dtype,
             saved.training.compute_dtype),
            ("training.fast_augmentation", cfg.training.fast_augmentation,
             saved.training.fast_augmentation),
            ("model.architecture", cfg.model.architecture, saved.model.architecture),
            ("model.width", cfg.model.width, saved.model.width),
            ("model.sequences", cfg.model.sequences, saved.model.sequences),
            ("model.nnunet_widths", cfg.model.nnunet_widths,
             saved.model.nnunet_widths),
            ("model.deep_supervision", cfg.model.deep_supervision,
             saved.model.deep_supervision),
            ("optimizer", dataclasses.asdict(cfg.optimizer),
             dataclasses.asdict(saved.optimizer)),
            ("loss", dataclasses.asdict(cfg.loss), dataclasses.asdict(saved.loss)),
            ("data.batch_size", cfg.data.batch_size, saved.data.batch_size),
            ("data.input_img", cfg.data.input_img, saved.data.input_img),
            ("data.oversampling", cfg.data.oversampling, saved.data.oversampling),
            ("data.classes", list(cfg.data.classes), list(saved.data.classes)),
            ("data.classes_weighted", cfg.data.classes_weighted,
             saved.data.classes_weighted),
            ("data.train_size", cfg.data.train_size, saved.data.train_size),
            ("data.remove_outliers", cfg.data.remove_outliers,
             saved.data.remove_outliers),
            ("data.use_duplicated_to_train", cfg.data.use_duplicated_to_train,
             saved.data.use_duplicated_to_train),
            ("data.semantic_segmentation", cfg.data.semantic_segmentation,
             saved.data.semantic_segmentation),
            ("data.transforms", dataclasses.asdict(cfg.data.transforms),
             dataclasses.asdict(saved.data.transforms)),
            ("data.augmentation", cfg.data.augmentation.as_dict(),
             saved.data.augmentation.as_dict()),
        ]
        mismatched = [(k, now, was) for k, now, was in critical if now != was]
        if mismatched:
            sys.exit("--resume: config mismatch vs the run's own config.yaml "
                     f"(resume would not reproduce the original trajectory): "
                     f"{mismatched}")
        # task/mode are not part of config.yaml (they are the entry point):
        # the metrics.csv header is a per-(task, mode) contract — a resume
        # through the wrong entry point would stamp the wrong schema onto
        # the existing rows and change fold membership (CV vs CV_PROD)
        m0 = Path(run_path) / "fold_0" / "metrics.csv"
        # a 0-byte metrics.csv (kill between file creation and the header
        # write) carries no schema to check — the fold restarts cleanly
        if m0.is_file() and m0.read_text().strip():
            header = m0.read_text().splitlines()[0].replace(" ", "")
            want = METRIC_HEADERS[(task, mode)].replace(" ", "")
            if header != want:
                sys.exit(f"--resume: fold_0/metrics.csv header {header!r} does "
                         f"not match task={task!r} mode={mode!r} ({want!r}) — "
                         "resuming through a different entry point than the "
                         "original run")
    if not (resume_dir is not None and run_cfg_yaml.exists()):
        # Serialize the RESOLVED config (every key explicit), not a byte-copy
        # of the user's file: a user YAML that omits a key (reference configs
        # omit all TPU additions) would otherwise re-interpret under a later
        # version's defaults — e.g. the round-5 fast_augmentation flip would
        # silently switch a pre-flip run's augmentation on --resume. The
        # resume mismatch guard above relies on this file reflecting the
        # values the run ACTUALLY used (reference contract: the config is
        # preserved in the run dir, ``src/utils/miscellany.py`` copy).
        run_cfg_yaml.write_text(config_to_yaml(cfg))
    logging.info(pformat(dataclasses.asdict(cfg)))

    # reference seg-script quirk (``training_segmentation.py:113-120``): the
    # rotation max-angle is sampled once at startup from U{0..359}
    if task == "segmentation":
        max_angle = float(np.random.choice(range(0, 360)))
    else:
        max_angle = 360.0

    folds = load_datasets(cfg.training, cfg.data, mode=mode, uclm_path=uclm_path)

    # ``model.sequences`` parity (PARITY D12): Flax infers input channels from
    # the data, so a wrong value would silently "work" where the reference's
    # torch conv errors with a channel mismatch — validate it explicitly.
    expected_ch = input_channels(cfg)
    actual_ch = folds[0].train.images.shape[-1]
    if actual_ch != expected_ch:
        raise ValueError(
            f"model.sequences + active augmentation channels = {expected_ch} "
            f"but the dataset provides {actual_ch} input channel(s) "
            f"(the reference's conv would fail with this mismatch)")
    mesh = (data_space_mesh(cfg.training.spatial_partitions)
            if cfg.training.data_parallel else None)
    if mesh is not None:
        logging.info("Parallelism over %d devices (mesh axes %s, shape %s)",
                     mesh.devices.size, mesh.axis_names, mesh.devices.shape)

    # fast_augmentation shard_maps the 3-shear kernel over the 'data' mesh
    # axis, which needs batch_size % n_data == 0. Since the flag defaults to
    # ON (round 5), a small batch on a wide mesh degrades GRACEFULLY here to
    # the exact-parity gather with a warning (reference configs use batch 2;
    # an 8-chip pod would otherwise hard-fail out of the box). Constructing
    # the Engine directly keeps the strict ValueError contract.
    fast_aug = cfg.training.fast_augmentation
    n_data = mesh.shape.get("data", 1) if mesh is not None else 1
    if fast_aug and n_data > 1 and cfg.data.batch_size % n_data:
        logging.warning(
            "fast_augmentation disabled for this run: batch_size (%d) does "
            "not divide the data-mesh axis (%d devices) — falling back to "
            "the exact-parity augmentation. Raise data.batch_size to a "
            "multiple of %d to re-enable the fast path.",
            cfg.data.batch_size, n_data, n_data)
        fast_aug = False

    header = METRIC_HEADERS[(task, mode)]

    # one engine for all folds: identical model/optimizer/loss config, so the
    # jit cache carries compiled epochs across folds whenever shapes coincide
    # (per-fold train sizes differ with oversampling; eval/predict often match)
    model = _build_model(cfg, task)
    tx = init_optimizer(cfg.optimizer.opt, cfg.optimizer.lr)
    ecfg = EngineConfig(
        task=task, n_classes=n_classes, batch_size=cfg.data.batch_size,
        alpha=cfg.training.alpha,
        inversely_weighted=cfg.loss.inversely_weighted,
        seg_criterion=cfg.loss.function,
        cls_criterion=cfg.loss.classification_criterion,
        classes_weighted=cfg.data.classes_weighted,
        max_angle=max_angle,
        p_hflip=cfg.data.transforms.horizontal_flip,
        p_vflip=cfg.data.transforms.vertical_flip,
        compute_dtype=cfg.training.compute_dtype,
        fast_augmentation=fast_aug,
    )
    engine = Engine(model, tx, ecfg, mesh)

    # Cross-fold shape padding: oversampling gives each fold a different train
    # size, which would recompile the (expensive) train scan per fold. Padding
    # every fold's data arrays + index plan to the cross-fold maximum (wrapped
    # rows, padded steps masked out as no-ops) makes the program fold-invariant
    # — folds 1+ reuse fold 0's compilation (logged per fold).
    B = cfg.data.batch_size
    max_train_n = max(len(f.train) for f in folds)
    max_steps = -(-max_train_n // B)
    max_test_n = max(len(f.test) for f in folds)
    # The fused train+eval program takes the val split as an input, so a
    # val-size difference between folds would recompile the ENTIRE program
    # including the expensive train scan. Val rows cannot be wrap-padded
    # exactly (the loss criteria reduce with unweighted batch means), so
    # when sizes differ we run train and eval as SEPARATE programs: the big
    # train program stays fold-invariant (one compile) and only the small
    # eval forward compiles per distinct val size. Costs one extra metric
    # fetch per epoch — ~10-30 ms on the tunnel vs minutes of recompiles.
    fuse_eval = len({len(f.val) for f in folds if f.val is not None}) <= 1

    for n, fold in enumerate(folds):
        logging.info("\n\n *********************  FOLD %d  ********************* \n\n", n)
        fold_time = time.perf_counter()
        metrics_path = f"{run_path}/fold_{n}/metrics.csv"
        ckpt_suffix = ".tar" if task == "segmentation" else ""
        ckpt_path = f"{run_path}/fold_{n}/model_{timestamp}_fold_{n}{ckpt_suffix}"

        if resume_dir is not None:
            ckpt_path = _find_checkpoint(run_path, n, ckpt_path)
        if resume_dir is not None and _fold_complete(run_path, n):
            rows = _metrics_rows(metrics_path)
            logging.info("Fold %d already complete (%d epochs) — skipping", n, len(rows))
            # replay the host RNG stream so later folds draw the same epoch
            # permutations an uninterrupted run would have drawn
            for _ in rows:
                plan_epoch_indices(len(fold.train), B, host_rng,
                                   pad_to_steps=max_steps)
            continue

        for sub in ("segs", "plots", "features_map"):
            Path(f"{run_path}/fold_{n}/{sub}").mkdir(parents=True, exist_ok=True)

        sample = jnp.zeros((1,) + fold.train.images.shape[1:], jnp.float32)
        fold_key = jax.random.fold_in(root_key, n)
        state = create_train_state(model, tx, fold_key, sample)
        if mesh is not None:
            # pre-place the fresh state replicated over the mesh: matches the
            # compiled epoch's input shardings (no first-call reshard) and is
            # REQUIRED under multi-host, where the locally-initialised state
            # must become a global array before entering the global program
            state = replicate_to_mesh(mesh, state)
        save_model_summary(model, state.params, Path(run_path))

        scheduler = init_lr_scheduler(
            cfg.optimizer.scheduler, cfg.optimizer.lr,
            t_max=int(cfg.optimizer.t_max), factor=float(cfg.optimizer.decrease_factor),
            min_lr=float(cfg.optimizer.min_lr), patience=int(cfg.optimizer.patience))

        train_data = engine.device_data(fold.train, pad_to=max_train_n)
        val_data = (engine.device_data(fold.val, for_training=False)
                    if fold.val is not None else None)
        step_valid = step_valid_mask(len(fold.train), B, max_steps)
        test_images_dev = None
        if task == "segmentation" and not cfg.training.per_epoch_test_artifacts:
            # the per-epoch quick-dice forward reuses this single placement
            # instead of re-uploading the test split every epoch
            test_images_dev = (replicate_to_mesh(mesh, fold.test.images)
                               if mesh is not None
                               else jnp.asarray(fold.test.images))

        best_validation_loss = 1_000_000.0
        patience = 0
        # Best-state snapshots stay ON DEVICE (jnp.copy = device-to-device);
        # the checkpoint file is written once per fold. On tunnel runtimes a
        # per-epoch host fetch of the full train state costs ~10s/epoch —
        # two orders of magnitude more than the epoch itself.
        # ``training.checkpoint_every_epoch=True`` restores the reference's
        # write-per-improvement cadence (crash-resumable, see PARITY D9).
        eager_ckpt = cfg.training.checkpoint_every_epoch
        best_state, best_epoch = None, 0
        best_resume_state, resume_state = None, None
        resume_epoch = 0
        restored = None
        if resume_dir is not None and Path(ckpt_path).is_file():
            restored = restore_checkpoint(state, ckpt_path)
            # legacy checkpoints (pre-resume_state) restore with the ``valid``
            # marker zeroed — no host counters to resume from
            if restored[3]["valid"] <= 0:
                logging.info("Fold %d: checkpoint predates resume support — "
                             "restarting fold", n)
                restored = None
        if restored is not None:
            # Interrupted fold: restore the last written checkpoint (CV: best
            # epoch; CV_PROD eager: last epoch), truncate metrics.csv to the
            # checkpointed epoch, and replay the RNG stream to that point.
            # Re-running the remaining epochs reproduces the uninterrupted
            # trajectory exactly (same state + same permutations).
            state, ckpt_epoch, _, rstate = restored
            if mesh is not None:
                # checkpointed arrays load host-side; re-place them as global
                # replicated arrays (required under multi-host, free otherwise)
                state = replicate_to_mesh(mesh, state)
            resume_epoch = ckpt_epoch + 1
            resume_state = rstate
            scheduler.load_state_dict(rstate)
            patience = int(rstate["patience"])
            best_validation_loss = rstate["best_val_loss"]
            best_epoch = ckpt_epoch
            set_learning_rate(state.opt_state, scheduler.lr)
            rows = _metrics_rows(metrics_path)
            _rewrite_metrics(metrics_path, header, rows[:resume_epoch])
            for _ in range(resume_epoch):
                plan_epoch_indices(len(fold.train), B, host_rng,
                                   pad_to_steps=max_steps)
            logging.info("Fold %d: resuming from epoch %d (checkpoint epoch %d)",
                         n, resume_epoch, ckpt_epoch)
        elif resume_dir is not None:
            # no checkpoint to resume from (e.g. deferred cadence): restart
            # the fold from scratch — RNG position at fold start is identical
            _rewrite_metrics(metrics_path, header, [])
            logging.info("Fold %d: no checkpoint found — restarting fold", n)
        else:
            write_metrics_file(metrics_path, header)

        epoch = resume_epoch - 1  # stays resume_epoch-1 when no epochs run
        for epoch in range(resume_epoch, cfg.training.epochs):
            # scheduler.lr mirrors what set_learning_rate last wrote into
            # opt_state (and base_lr before any step) — reading it host-side
            # avoids a per-epoch device fetch (~10-30 ms RPC on the tunnel)
            current_lr = scheduler.lr
            t0 = time.perf_counter()

            perm = plan_epoch_indices(len(fold.train), cfg.data.batch_size,
                                      host_rng, pad_to_steps=max_steps)
            epoch_key = jax.random.fold_in(fold_key, epoch + 1)
            with maybe_profile(epoch, n):
                if val_data is not None and fuse_eval:
                    # fused train+eval: one device program, one metric fetch
                    state, tm, vm = engine.train_and_eval_epoch(
                        state, train_data, val_data, perm, epoch_key, step_valid)
                else:
                    state, tm = engine.train_epoch(state, train_data, perm,
                                                   epoch_key, step_valid)
                    vm = (engine.eval_epoch(state, val_data)
                          if val_data is not None else None)
            check_finite_loss(tm["loss"])
            monitor = vm["loss"] if vm is not None else tm["loss"]
            if vm is not None:
                check_finite_loss(vm["loss"])

            if isinstance(scheduler, CosineAnnealingScheduler):
                scheduler.step()
            else:
                scheduler.step(monitor)
            set_learning_rate(state.opt_state, scheduler.lr)

            improved = False
            if mode == "CV_PROD":
                pass  # no validation; prod early stopping is dead (reference quirk)
            elif vm["loss"] < best_validation_loss:
                patience = 0
                best_validation_loss = vm["loss"]
                best_epoch = epoch
                improved = True
            else:
                patience += 1

            dt = time.perf_counter() - t0
            if task == "segmentation":
                if cfg.training.per_epoch_test_artifacts:
                    # reference cadence (``training_segmentation.py:179-180``):
                    # full test inference each epoch, rewriting the seg/feature
                    # PNGs and per-image CSV; metrics.csv Test column is the
                    # same per-image mean Dice either way (PARITY D10)
                    if cfg.data.semantic_segmentation:
                        test_results = I.inference_multilabel_segmentation(
                            engine, state, fold.test, f"{run_path}/fold_{n}")
                    else:
                        test_results = I.inference_binary_segmentation(
                            engine, state, fold.test, f"{run_path}/fold_{n}",
                            pad_to=max_test_n)
                    test_dice = float(test_results["DICE"].mean())
                else:
                    test_dice = quick_test_dice(engine, state, fold.test,
                                                pad_to=max_test_n,
                                                device_images=test_images_dev)
            else:
                test_dice = None
            line = _log_epoch(task, mode, n_classes, epoch, current_lr, tm, vm,
                              test_dice, patience, dt, best_validation_loss)
            # metrics row is written BEFORE the checkpoint: a kill between the
            # two leaves ckpt_epoch < rows, which --resume handles by
            # truncating to the checkpointed epoch and re-running
            write_metrics_file(metrics_path, line)

            resume_state = dict(scheduler.state_dict(), patience=float(patience),
                                best_val_loss=float(best_validation_loss))
            if mode == "CV_PROD":
                # prod saves every epoch unconditionally (training_*_prod.py);
                # the end-of-fold write below produces the identical final file
                if eager_ckpt:
                    save_checkpoint(ckpt_path, state, epoch, best_validation_loss,
                                    resume_state)
            elif improved:
                if eager_ckpt:
                    save_checkpoint(ckpt_path, state, epoch, best_validation_loss,
                                    resume_state)
                else:
                    best_state = jax.tree_util.tree_map(jnp.copy, state)
                    best_resume_state = resume_state

            if patience > cfg.training.max_patience:
                logging.info("\nValidation loss did not improve over the last %d "
                             "epochs. Stopping training", patience)
                break

        # deferred checkpoint write: one host fetch per fold (see above)
        if not eager_ckpt:
            if mode == "CV_PROD":
                # epochs == 0 ⇒ no file, matching eager cadence
                if epoch >= 0 and resume_state is not None:
                    save_checkpoint(ckpt_path, state, epoch, best_validation_loss,
                                    resume_state)
            elif best_state is not None:
                save_checkpoint(ckpt_path, best_state, best_epoch,
                                best_validation_loss, best_resume_state)
                del best_state

        _fold_plots(task, mode, metrics_path, run_path, n)
        _fold_inference(task, n_classes, cfg, engine, state, fold,
                        f"{run_path}/fold_{n}", ckpt_path, pad_to=max_test_n)
        # end-of-fold marker: --resume skips folds that reached this point
        (Path(f"{run_path}/fold_{n}") / ".fold_complete").touch()

        logging.info("Total time for fold %d: %.2f", n, time.perf_counter() - fold_time)
        del state

    # cross-fold result sheets
    if task in ("segmentation", "multitask"):
        save_segmentation_results(run_path)
    if task in ("classification", "multitask"):
        save_classification_results(run_path, n_classes)

    logging.info("Total time for all of the folds: %.2f", time.perf_counter() - init_time)
    return run_path
