"""Serving/prediction entry point: run a trained checkpoint over a folder of
raw ultrasound PNGs (no masks needed) and emit segmentation masks + class
probabilities — the deployment-facing path (the reference only evaluates
against labelled loaders).

    python -m multi_task_breast_cancer_tpu.predict \
        --config config.yaml --task multitask \
        --checkpoint runs/.../fold_0/model_..._fold_0 \
        --images ./incoming_pngs --output ./predictions
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import jax
import numpy as np

from multi_task_breast_cancer_tpu.config import load_config
from multi_task_breast_cancer_tpu.serve.post import model_applies_softmax, postprocess
from multi_task_breast_cancer_tpu.train.driver import build_inference_state
from multi_task_breast_cancer_tpu.train.inference import (
    save_binary_segmentation,
    save_multilabel_segmentation,
)
from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig

def load_images(folder: str | Path, size: int = 128,
                augmentations: dict | None = None) -> tuple[np.ndarray, list]:
    """Load serving inputs with the SAME channel stack as training: grayscale
    channel + any config-enabled augment channels (CLAHE/Sobel/…), so the
    checkpointed model's input width matches (``ops.image_ops``)."""
    import cv2
    from multi_task_breast_cancer_tpu.serve.server import prepare_image

    augmentations = augmentations or {}
    imgs, kept_paths = [], []
    for p in sorted(Path(folder).glob("*.png")):
        img = cv2.imread(str(p), 0)
        if img is None:
            logging.warning("skipping unreadable %s", p)
            continue
        imgs.append(prepare_image(img, size, augmentations))
        kept_paths.append(p)
    if not imgs:
        raise SystemExit(f"no readable PNG images found in {folder}")
    return np.stack(imgs), kept_paths


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./config.yaml")
    parser.add_argument("--task", default="multitask",
                        choices=["segmentation", "classification", "multitask"])
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--images", required=True)
    parser.add_argument("--output", default="./predictions")
    parser.add_argument("--size", type=int, default=128)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    cfg = load_config(args.config)
    n_classes = len(cfg.data.classes)
    images, paths = load_images(args.images, args.size,
                                augmentations=cfg.data.augmentation.as_dict())
    logging.info("loaded %d images (%d channels)", len(images), images.shape[-1])

    model, tx, state, channels = build_inference_state(
        cfg, args.task, size=args.size, checkpoint=args.checkpoint)
    if channels != images.shape[-1]:
        raise SystemExit(f"config expects {channels} input channels, "
                         f"loaded images have {images.shape[-1]}")
    engine = Engine(model, tx, EngineConfig(task=args.task, n_classes=n_classes,
                                            batch_size=cfg.data.batch_size,
                                            compute_dtype=cfg.training.compute_dtype))

    out_dir = Path(args.output)
    (out_dir / "segs").mkdir(parents=True, exist_ok=True)

    t0 = time.perf_counter()
    out = engine.predict(state, images)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = time.perf_counter() - t0
    logging.info("inference: %d imgs in %.3fs (%.1f imgs/s)",
                 len(images), dt, len(images) / dt)

    pred = postprocess(out, args.task, n_classes,
                       cfg.training.overlap_class_based_on_seg,
                       model_applies_softmax(args.task, cfg.model.architecture,
                                             n_classes))
    records = []
    save_mask = (save_binary_segmentation if pred.mask_scale == 255
                 else save_multilabel_segmentation)  # semantic: label PNGs
    for i, p in enumerate(paths):
        if pred.masks is not None:
            save_mask(pred.masks[i], str(out_dir / "segs" / f"{p.stem}_seg.png"))
        records.append({"image": p.name, **pred.record(i)})

    with (out_dir / "predictions.json").open("w") as f:
        json.dump(records, f, indent=2)
    logging.info("wrote %s", out_dir / "predictions.json")


if __name__ == "__main__":
    main()
