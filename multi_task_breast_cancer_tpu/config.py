"""Config system: one YAML file with five sections (model / optimizer / loss /
training / data), validated into dataclasses.

Schema mirrors the reference ``src/config.yaml:1-53`` and its loader
``src/utils/miscellany.py:17-30`` so existing experiment configs port unchanged.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import yaml


@dataclass
class ModelConfig:
    architecture: str = "MTnnUNet"
    sequences: int = 1
    width: int = 24
    deep_supervision: bool = True
    # TPU-native addition: override the nnU-Net family's fixed level widths
    # (reference hard-codes (32,64,128,256,320) and ignores ``width``,
    # ``src/models/segmentation/nnUNet.py:70``). None keeps reference parity;
    # narrow overrides enable CPU-scale learnability tests.
    nnunet_widths: Optional[List[int]] = None


@dataclass
class OptimizerConfig:
    opt: str = "Adam"
    lr: float = 1e-4
    scheduler: str = "plateau"
    patience: int = 20
    min_lr: float = 1e-6
    decrease_factor: float = 0.5
    t_max: int = 40


@dataclass
class LossConfig:
    function: str = "DICE"
    inversely_weighted: bool = True
    classification_criterion: str = "Focal"


@dataclass
class TrainingConfig:
    debug: bool = False
    seed: int = 1993
    epochs: int = 200
    max_patience: int = 50
    CV: int = 4
    cuda_benchmark: bool = False  # accepted for config compatibility; no-op on TPU
    alpha: float = 0.35
    threshold_postprocessing: int = 0
    overlap_seg_based_on_class: bool = True
    overlap_class_based_on_seg: bool = True
    # TPU-native additions (absent keys default so reference configs load as-is)
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    data_parallel: bool = True      # shard batches over all visible devices
    # Spatial partitioning: also shard image ROWS over this many devices
    # (mesh becomes (devices/n) data × n space; GSPMD inserts conv halo
    # exchanges). Lets activations exceed one chip's HBM — raise for
    # full-resolution (≥512²) training. 1 = pure data parallelism.
    spatial_partitions: int = 1
    # False (default): best state is snapshotted on device and the checkpoint
    # file is written once per fold (a per-epoch full-state host fetch costs
    # ~10s on tunnel runtimes). True: reference cadence — write on every
    # improvement (CV) / every epoch (CV_PROD), crash-resumable mid-fold.
    checkpoint_every_epoch: bool = False
    # False (default): the segmentation drivers compute the per-epoch test
    # Dice column only (PARITY D10). True: reference cadence — full test
    # inference every epoch, rewriting seg/feature PNGs + per-image CSV each
    # time (``training_segmentation.py:179-180``).
    per_epoch_test_artifacts: bool = False
    # 3-shear Pallas augmentation (PARITY D13): identical flip/angle draws,
    # rotation resampled per shear instead of in one gather — measured ~8x
    # faster augmentation (~+30% train throughput at 128²) on TPU v5e.
    # DEFAULT ON since round 5: quality-neutral under the reference training
    # protocol itself — every metric of every MT ablation row lands inside
    # the exact-parity arm's own fold spread (FASTAUG_QUALITY_r05.json,
    # epochs 200 / batch 2 / patience 50 / seed 1993). Set false to restore
    # the torchvision-bit-exact single-gather rotation (the escape hatch for
    # bit-level reference reproduction, e.g. the parity test suite).
    # Works with bfloat16 AND float32 compute, any channel count (augment
    # channels pack into int32 planes), any image dims (odd dims pad one
    # row/col: documented ≤1-px deviation), and composes with
    # training.spatial_partitions (augmentation runs on the data axis,
    # rows reshard over 'space' right after).
    fast_augmentation: bool = True


@dataclass
class AugmentationConfig:
    CLAHE: bool = False
    SOBEL: bool = False
    brightness_brighter: bool = False
    brightness_darker: bool = False
    contrast_high: bool = False
    contrast_low: bool = False

    def n_active(self) -> int:
        return sum(int(v) for v in dataclasses.asdict(self).values())

    def as_dict(self) -> Dict[str, bool]:
        return dataclasses.asdict(self)


@dataclass
class TransformsConfig:
    horizontal_flip: float = 0.5
    vertical_flip: float = 0.5
    rotation: float = 0.5


@dataclass
class DataConfig:
    semantic_segmentation: bool = False
    input_img: str = "Datasets/Dataset_BUSI_with_GT_postprocessed_128_uniques"
    batch_size: int = 2
    train_size: float = 0.8
    classes: List[str] = field(default_factory=lambda: ["benign", "malignant", "normal"])
    classes_weighted: Optional[List[float]] = None
    use_duplicated_to_train: bool = False
    remove_outliers: bool = False
    oversampling: bool = True
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    transforms: TransformsConfig = field(default_factory=TransformsConfig)


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    data: DataConfig = field(default_factory=DataConfig)


def _build(dc_type, raw: Optional[Dict[str, Any]]):
    """Build a dataclass from a raw dict, ignoring unknown keys (logged)."""
    raw = dict(raw or {})
    fields = {f.name: f for f in dataclasses.fields(dc_type)}
    kwargs = {}
    for key, value in raw.items():
        if key not in fields:
            logging.warning("config: ignoring unknown key %r for %s", key, dc_type.__name__)
            continue
        f = fields[key]
        if f.type in ("AugmentationConfig",) or f.name == "augmentation":
            value = _build(AugmentationConfig, value)
        elif f.type in ("TransformsConfig",) or f.name == "transforms":
            value = _build(TransformsConfig, value)
        kwargs[key] = value
    return dc_type(**kwargs)


def load_config(path: str | Path) -> Config:
    """Load the five-section YAML config into a validated :class:`Config`."""
    with open(path) as cf:
        raw = yaml.safe_load(cf) or {}
    cfg = Config(
        model=_build(ModelConfig, raw.get("model")),
        optimizer=_build(OptimizerConfig, raw.get("optimizer")),
        loss=_build(LossConfig, raw.get("loss")),
        training=_build(TrainingConfig, raw.get("training")),
        data=_build(DataConfig, raw.get("data")),
    )
    logging.info("Loaded config from %s:\n%s", path, cfg)
    return cfg


def config_to_yaml(cfg: Config) -> str:
    """Serialize a Config back to the five-section YAML (used for run-dir
    provenance when the experiment was launched from a programmatic Config
    rather than a file — the copied config must reflect the ACTUAL run)."""
    return yaml.safe_dump(dataclasses.asdict(cfg), sort_keys=False)


def load_config_file(path: str | Path) -> Tuple[ModelConfig, OptimizerConfig, LossConfig, TrainingConfig, DataConfig]:
    """Reference-parity loader: returns the five sections as separate objects
    (reference ``src/utils/miscellany.py:17-30`` returns five dicts)."""
    cfg = load_config(path)
    return cfg.model, cfg.optimizer, cfg.loss, cfg.training, cfg.data


DEFAULT_CONFIG_YAML = """\
model: # model hyper-parameters
  architecture: MTnnUNet
  sequences: 1
  width: 24
  deep_supervision: True

optimizer:
  opt: Adam
  lr: 0.0001
  scheduler: plateau
  patience: 20
  min_lr: 1e-6
  decrease_factor: 0.5
  t_max: 40

loss:
  function: DICE
  inversely_weighted: True
  classification_criterion: Focal

training:
  debug: False
  seed: 1993
  epochs: 200
  max_patience: 50
  CV: 4
  alpha: 0.35
  threshold_postprocessing: 0
  overlap_seg_based_on_class: True
  overlap_class_based_on_seg: True

data:
  semantic_segmentation: False
  input_img: Datasets/Curated_BUSI_128
  batch_size: 2
  train_size: 0.8
  classes: [benign, malignant, normal]
  classes_weighted: null
  use_duplicated_to_train: False
  remove_outliers: False
  oversampling: True
  augmentation:
    CLAHE: False
    SOBEL: False
    brightness_brighter: False
    brightness_darker: False
    contrast_high: False
    contrast_low: False
  transforms:
    horizontal_flip: 0.5
    vertical_flip: 0.5
    rotation: 0.5
"""
