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

import jax
import jax.numpy as jnp

from multi_task_breast_cancer_tpu.config import load_config
from multi_task_breast_cancer_tpu.data.loader import load_datasets
from multi_task_breast_cancer_tpu.train.checkpoint import load_pretrained_model
from multi_task_breast_cancer_tpu.train.driver import _build_model, _fold_inference
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

    # Same dispatch as the driver's per-fold testing phase — external
    # evaluation exercises the identical inference code (incl. the multiclass
    # prediction-refinement rules honoured from the config's PR flags).
    _fold_inference(args.task, n_classes, cfg, engine, state, folds[0],
                    str(out), args.checkpoint)


if __name__ == "__main__":
    main()
