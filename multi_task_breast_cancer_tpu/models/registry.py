"""Model factories — the equivalent of the reference experiment factory's
``init_segmentation_model`` / ``init_classification_model`` /
``init_multitask_model`` (``src/utils/experiment_init.py:26-174``).

Factories return an un-initialised Flax module; parameter init happens in the
training core with an explicit PRNG key (functional, reproducible).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multi_task_breast_cancer_tpu.models.bts_unet import BTSUNet
from multi_task_breast_cancer_tpu.models.classifiers import BTSUNetClassifier, NNUNetClassifier
from multi_task_breast_cancer_tpu.models.fsb_bts_unet import FSBBTSUNet
from multi_task_breast_cancer_tpu.models.monai_zoo import AttentionUNet, SegResNet, UNet
from multi_task_breast_cancer_tpu.models.multitask import (
    Adityan,
    MTnnUNet,
    MultiBTSUNet,
    MultiFSBBTSUNet,
)
from multi_task_breast_cancer_tpu.models.nnunet import NNUNet2021
from multi_task_breast_cancer_tpu.models.residual_unet import ResidualUNet
from multi_task_breast_cancer_tpu.models.swin_unetr import SwinUNETR
from multi_task_breast_cancer_tpu.models.unetpp import (
    BasicUNetPlusPlus,
    MTUNetPlusPlus,
    UNetPlusPlusClassifier,
)

SEGMENTATION_ARCHS = ("BTSUNet", "nnUNet", "UNet", "AttentionUNet", "ResidualUNet",
                      "UnetPlusPlus", "FSBBTSUNet", "SegResNet", "SwinUNETR")
CLASSIFICATION_ARCHS = ("BTSUNetClassifier", "UNetPlusPlusClassifier", "nnUNetClassifier")
MULTITASK_ARCHS = ("Multi_BTSUNet", "MTUNetPlusPlus", "MTnnUNet", "Multi_FSB_BTSUNet", "Adityan")


def count_parameters(params) -> int:
    """Number of trainable parameters in a pytree (reference
    ``src/utils/models.py:561-569``)."""
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))


def save_model_summary(model: nn.Module, params, save_folder: Optional[Path]) -> None:
    """Dump the module table to ``model.txt`` in the run dir (the reference
    prints the torch module to ``model.txt``, ``experiment_init.py:75-78``)."""
    if save_folder is None:
        return
    save_folder = Path(save_folder)
    save_folder.mkdir(parents=True, exist_ok=True)
    with (save_folder / "model.txt").open("w") as f:
        print(model, file=f)
        print(f"\nTotal number of trainable parameters: {count_parameters(params)}", file=f)


def _nnunet_kw(nnunet_widths) -> dict:
    """nnU-Net family width override (None = reference constant)."""
    if nnunet_widths is None:
        return {}
    widths = tuple(nnunet_widths)
    if len(widths) != 5:
        raise ValueError(
            f"model.nnunet_widths must list the 5 level widths "
            f"(reference default (32, 64, 128, 256, 320)); got {widths!r}")
    return {"widths": widths}


# architectures whose feature sizes are hard-coded (model.width is ignored;
# the nnU-Net family is sized via model.nnunet_widths instead) and whose
# deep-supervision behavior is fixed (always-on 4-head nnU-Nets; single-head
# MONAI nets). The reference factory silently ignores these knobs too —
# warn so a config "change" that cannot take effect is at least visible.
_WIDTH_IGNORED = {"nnUNet", "UnetPlusPlus", "SegResNet", "SwinUNETR",
                  "UNetPlusPlusClassifier", "nnUNetClassifier",
                  "MTUNetPlusPlus", "MTnnUNet"}
_DS_FIXED = {"UNet": False, "AttentionUNet": False, "ResidualUNet": False,
             "SegResNet": False, "SwinUNETR": False,
             "nnUNet": True, "MTnnUNet": True, "Adityan": False}


# values that do NOT indicate a deliberate override: None (factory default,
# caller never passed the knob) and the ModelConfig default 24 (the driver
# always forwards cfg.model.width, so an untouched config arrives as 24)
_DEFAULT_WIDTH = 24


def _warn_ignored_knobs(architecture: str, width=None,
                        deep_supervision=None) -> None:
    if width not in (None, _DEFAULT_WIDTH) and architecture in _WIDTH_IGNORED:
        logging.warning(
            "model.width=%s is ignored by %s (fixed feature sizes%s)",
            width, architecture,
            "; use model.nnunet_widths" if "nnUNet" in architecture else "")
    fixed = _DS_FIXED.get(architecture)
    if deep_supervision is not None and fixed is not None \
            and deep_supervision != fixed:
        logging.warning(
            "model.deep_supervision=%s is ignored by %s (deep supervision "
            "is %s for this architecture)", deep_supervision, architecture,
            "always on" if fixed else "not available")


def _reject_nnunet_widths(architecture: str, nnunet_widths) -> None:
    """``model.nnunet_widths`` only applies to the nnU-Net family; silently
    training a different architecture at default widths would hide a config
    mistake — fail fast instead."""
    if nnunet_widths is not None:
        raise ValueError(
            f"model.nnunet_widths is only valid for the nnU-Net family "
            f"(nnUNet / nnUNetClassifier / MTnnUNet), not {architecture!r}; "
            f"use model.width for this architecture")


def init_segmentation_model(architecture: str, sequences: int = 1, regions: int = 1,
                            width: Optional[int] = None,
                            deep_supervision: Optional[bool] = None,
                            nnunet_widths=None) -> nn.Module:
    logging.info("Creating %s model (fed with %d sequences)", architecture, sequences)
    # None = knob not passed (factory default): never warn for it
    _warn_ignored_knobs(architecture, width, deep_supervision)
    width = 48 if width is None else width
    deep_supervision = False if deep_supervision is None else deep_supervision
    if architecture != "nnUNet":
        _reject_nnunet_widths(architecture, nnunet_widths)
    if architecture == "BTSUNet":
        return BTSUNet(regions=regions, width=width, deep_supervision=deep_supervision)
    if architecture == "nnUNet":
        return NNUNet2021(regions=regions, **_nnunet_kw(nnunet_widths))
    if architecture == "UNet":
        return UNet(regions=regions, channels=(width, 2 * width, 4 * width, 8 * width))
    if architecture == "AttentionUNet":
        return AttentionUNet(regions=regions, channels=(width, 2 * width, 4 * width, 8 * width))
    if architecture == "ResidualUNet":
        return ResidualUNet(regions=regions, width=width)
    if architecture == "UnetPlusPlus":
        return BasicUNetPlusPlus(regions=regions, deep_supervision=deep_supervision)
    if architecture == "FSBBTSUNet":
        return FSBBTSUNet(regions=regions, width=width, deep_supervision=deep_supervision)
    if architecture == "SegResNet":
        return SegResNet(regions=regions)
    if architecture == "SwinUNETR":
        return SwinUNETR(regions=regions)
    raise ValueError(
        f"Unknown segmentation architecture {architecture!r}. "
        f"Available: {SEGMENTATION_ARCHS}")


def init_classification_model(architecture: str, sequences: int = 1, n_classes: int = 3,
                              width: Optional[int] = None,
                              nnunet_widths=None) -> nn.Module:
    logging.info("Creating %s model (fed with %d sequences)", architecture, sequences)
    _warn_ignored_knobs(architecture, width)
    width = 48 if width is None else width
    if architecture != "nnUNetClassifier":
        _reject_nnunet_widths(architecture, nnunet_widths)
    if architecture == "BTSUNetClassifier":
        return BTSUNetClassifier(n_classes=n_classes, width=width)
    if architecture == "UNetPlusPlusClassifier":
        return UNetPlusPlusClassifier(n_classes=n_classes)
    if architecture == "nnUNetClassifier":
        return NNUNetClassifier(n_classes=n_classes, **_nnunet_kw(nnunet_widths))
    raise ValueError(
        f"Unknown classification architecture {architecture!r}. "
        f"Available: {CLASSIFICATION_ARCHS}")


def init_multitask_model(architecture: str, sequences: int = 1, regions: int = 1,
                         n_classes: int = 3, width: Optional[int] = None,
                         deep_supervision: Optional[bool] = None,
                         nnunet_widths=None) -> nn.Module:
    logging.info("Creating %s model (fed with %d sequences)", architecture, sequences)
    _warn_ignored_knobs(architecture, width, deep_supervision)
    width = 48 if width is None else width
    deep_supervision = False if deep_supervision is None else deep_supervision
    if architecture != "MTnnUNet":
        _reject_nnunet_widths(architecture, nnunet_widths)
    if architecture == "Multi_BTSUNet":
        return MultiBTSUNet(regions=regions, n_classes=n_classes, width=width,
                            deep_supervision=deep_supervision)
    if architecture == "MTUNetPlusPlus":
        return MTUNetPlusPlus(regions=regions, n_classes=n_classes,
                              deep_supervision=deep_supervision)
    if architecture == "MTnnUNet":
        return MTnnUNet(regions=regions, n_classes=n_classes,
                        **_nnunet_kw(nnunet_widths))
    if architecture == "Multi_FSB_BTSUNet":
        return MultiFSBBTSUNet(regions=regions, width=width,
                               deep_supervision=deep_supervision)
    if architecture == "Adityan":
        return Adityan(regions=regions, width=width)
    raise ValueError(
        f"Unknown multitask architecture {architecture!r}. "
        f"Available: {MULTITASK_ARCHS}")
