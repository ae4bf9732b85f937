"""External-dataset evaluation entry point (UCLM-style).

The reference exposes a ``UCLM`` loader mode with a hard-coded path
(``src/dataset/BUSI_dataloader.py:221-244,371-377``) but no driver; this makes
external evaluation a first-class command:

    python -m multi_task_breast_cancer_tpu.evaluate \
        --config config.yaml --task multitask \
        --checkpoint runs/.../fold_0/model_..._fold_0 \
        --data ./Datasets/BUS_UCLM_postprocessed_128 --output ./eval_uclm
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path
from pprint import pformat

import jax
import jax.numpy as jnp

from multi_task_breast_cancer_tpu.config import load_config
from multi_task_breast_cancer_tpu.data.loader import load_datasets
from multi_task_breast_cancer_tpu.ops.metrics import (
    binary_classification_metrics,
    multiclass_classification_metrics,
)
from multi_task_breast_cancer_tpu.train import inference as I
from multi_task_breast_cancer_tpu.train.checkpoint import load_pretrained_model
from multi_task_breast_cancer_tpu.train.driver import _build_model
from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./config.yaml")
    parser.add_argument("--task", default="multitask",
                        choices=["segmentation", "classification", "multitask"])
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--data", required=True, help="preprocessed dataset folder")
    parser.add_argument("--output", default="./eval_out")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    cfg = load_config(args.config)
    n_classes = len(cfg.data.classes)

    folds = load_datasets(cfg.training, cfg.data, mode="UCLM", uclm_path=args.data)
    test_ds = folds[0].test

    model = _build_model(cfg, args.task)
    tx = init_optimizer(cfg.optimizer.opt, cfg.optimizer.lr)
    ecfg = EngineConfig(task=args.task, n_classes=n_classes,
                        batch_size=cfg.data.batch_size,
                        alpha=cfg.training.alpha,
                        inversely_weighted=cfg.loss.inversely_weighted,
                        seg_criterion=cfg.loss.function,
                        cls_criterion=cfg.loss.classification_criterion)
    engine = Engine(model, tx, ecfg)
    sample = jnp.zeros((1,) + test_ds.images.shape[1:], jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample)
    state = load_pretrained_model(state, args.checkpoint)

    out = Path(args.output)
    for sub in ("segs", "features_map"):
        (out / sub).mkdir(parents=True, exist_ok=True)

    if args.task == "segmentation":
        res = I.inference_binary_segmentation(engine, state, test_ds, str(out))
        logging.info("Segmentation metrics:\n%s", res.mean(numeric_only=True))
    elif args.task == "classification":
        if n_classes <= 2:
            res = I.inference_binary_classification(engine, state, test_ds, str(out))
            logging.info("%s", pformat(binary_classification_metrics(
                res.ground_truth, res.predicted_label)))
        else:
            res = I.inference_multiclass_classification(engine, state, test_ds, str(out))
            logging.info("%s", pformat(multiclass_classification_metrics(
                res.ground_truth, res.predicted_label)))
    else:
        if n_classes <= 2:
            seg_res, cls_res = I.inference_multitask_binary(engine, state, test_ds, str(out))
        else:
            seg_res, cls_res = I.inference_multitask_multiclass(
                engine, state, test_ds, str(out),
                threshold=cfg.training.threshold_postprocessing,
                overlap_seg_based_on_class=cfg.training.overlap_seg_based_on_class,
                overlap_class_based_on_seg=cfg.training.overlap_class_based_on_seg)
        logging.info("Segmentation metrics:\n%s", seg_res.mean(numeric_only=True))
        logging.info("%s", pformat(multiclass_classification_metrics(
            cls_res.ground_truth, cls_res.predicted_label) if n_classes > 2
            else binary_classification_metrics(cls_res.ground_truth,
                                               cls_res.predicted_label)))


if __name__ == "__main__":
    main()
