"""Import reference (PyTorch) checkpoints into this framework.

Users migrating from the reference codebase (caumente/multi_task_breast_cancer)
can carry their trained weights over instead of retraining: this module maps a
torch ``state_dict`` into the corresponding Flax parameter pytree, and the CLI
rewrites a reference checkpoint file (the ``torch.save`` dict of
``training_multitask.py:243-249``) as one of this framework's checkpoint files,
loadable by ``predict.py`` / ``evaluate.py`` / ``load_pretrained_model``.

    python -m multi_task_breast_cancer_tpu.models.torch_import \
        --config config.yaml --task multitask \
        --torch-checkpoint ref_runs/.../fold_0/model_..._fold_0 \
        --out converted/model_fold_0

Layout conversions (forward-value parity proven per architecture in
``tests/test_torch_parity.py``):

- ``Conv2d``       (O,I,kh,kw) → HWIO ``(kh,kw,I,O)``
- ``ConvTranspose2d`` (I,O,kh,kw) → HWIO with the spatial taps flipped
  (equivalent for the VALID / stride==kernel deconvs all these models use)
- ``Linear``       (O,I) → Dense ``(I,O)``; a Linear that follows a torch
  ``Flatten`` of a NCHW tensor additionally has its input axis permuted from
  (c,h,w) to the NHWC flatten order (h,w,c)
- ``BatchNorm2d``  weight/bias → ``params`` scale/bias; running mean/var →
  ``batch_stats`` mean/var (ResidualUNet only; the BTS/nnU-Net families use
  parameter-free InstanceNorm)

Supported: every custom reference architecture — BTSUNet, FSBBTSUNet, nnUNet,
ResidualUNet, BTSUNetClassifier, nnUNetClassifier, MTnnUNet, Multi_BTSUNet,
Multi_FSB_BTSUNet, Adityan. The MONAI factory architectures (UNet,
AttentionUNet, UnetPlusPlus, SegResNet, SwinUNETR, MTUNetPlusPlus,
UNetPlusPlusClassifier) have no custom reference source to map from and are
not supported (their reference ``state_dict`` naming is MONAI-version
dependent).

Dead reference parameters are dropped on import, matching the reference's own
``forward``: ResidualUNet's three unused skip-merge convs
(``ResidualUNet.py:217-253``) and nnUNetClassifier's unused decoders 4..1
(``nnUNet_classifier.py:106-109``).
"""

from __future__ import annotations

import argparse
import logging
import math
from typing import Any, Dict, Mapping, Tuple

import jax
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# tensor-layout converters (accept torch tensors or numpy arrays)
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor, without importing torch here
        t = t.detach().cpu().numpy()
    # always copy: `.numpy()` on a CPU tensor ALIASES torch storage, so
    # without this the converted pytree would silently track the live torch
    # model through its in-place optimizer updates
    return np.array(t, dtype=np.float32, copy=True)


def conv_kernel(w) -> np.ndarray:
    """torch Conv2d weight (O,I,kh,kw) → flax kernel (kh,kw,I,O)."""
    return _np(w).transpose(2, 3, 1, 0)


def deconv_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d weight (I,O,kh,kw) → flax HWIO, taps flipped."""
    return np.ascontiguousarray(_np(w).transpose(2, 3, 0, 1)[::-1, ::-1])


def linear_kernel(w) -> np.ndarray:
    """torch Linear weight (O,I) → flax Dense kernel (I,O)."""
    return _np(w).T


def _b(t) -> np.ndarray:
    return _np(t)


# ---------------------------------------------------------------------------
# reference-block mappers (state_dict prefix → flax sub-pytree)
# ---------------------------------------------------------------------------


def _cinl(sd: Mapping, prefix: str) -> Params:
    """ConvInNormLeReLU: one bias-free conv (InstanceNorm has no params)."""
    return {"conv": {"kernel": conv_kernel(sd[f"{prefix}.Conv.weight"])}}


def _levelblock(sd: Mapping, prefix: str) -> Params:
    """Reference LevelBlock (two ConvInNormLeReLU) → {block1, block2}."""
    return {"block1": _cinl(sd, f"{prefix}.ConvInNormLRelu1"),
            "block2": _cinl(sd, f"{prefix}.ConvInNormLRelu2")}


def _conv(sd: Mapping, prefix: str) -> Params:
    return {"kernel": conv_kernel(sd[f"{prefix}.weight"]),
            "bias": _b(sd[f"{prefix}.bias"])}


def _deconv_head(sd: Mapping, prefix: str) -> Params:
    """torch Sequential(ConvTranspose2d, conv1x1) → fused DeconvHead params."""
    return {"deconv_kernel": deconv_kernel(sd[f"{prefix}.0.weight"]),
            "deconv_bias": _b(sd[f"{prefix}.0.bias"]),
            "conv1x1_kernel": conv_kernel(sd[f"{prefix}.1.weight"]),
            "conv1x1_bias": _b(sd[f"{prefix}.1.bias"])}


def _deconv(sd: Mapping, prefix: str) -> Params:
    return {"kernel": deconv_kernel(sd[f"{prefix}.weight"]),
            "bias": _b(sd[f"{prefix}.bias"])}


def _dense(sd: Mapping, prefix: str) -> Params:
    return {"kernel": linear_kernel(sd[f"{prefix}.weight"]),
            "bias": _b(sd[f"{prefix}.bias"])}


def _dense_after_flatten(sd: Mapping, prefix: str, channels: int) -> Params:
    """Linear following a torch ``Flatten`` of a (B,C,H,W) tensor: the Flax
    side flattens (B,H,W,C), so the kernel's input axis is permuted from
    (c,h,w) to (h,w,c) order.  H==W is inferred from the weight shape."""
    wt = _np(sd[f"{prefix}.weight"])  # (out, C*H*W) in (c,h,w) order
    hw = wt.shape[1] // channels
    side = int(math.isqrt(hw))
    if side * side != hw:
        raise ValueError(
            f"cannot infer square feature grid for {prefix!r}: "
            f"in_features={wt.shape[1]}, channels={channels}")
    wt = (wt.reshape(-1, channels, side, side).transpose(0, 2, 3, 1)
            .reshape(wt.shape[0], -1))
    return {"kernel": wt.T, "bias": _b(sd[f"{prefix}.bias"])}


def _bn(sd: Mapping, prefix: str) -> Tuple[Params, Params]:
    """BatchNorm2d → ({scale,bias} params, {mean,var} batch stats)."""
    return ({"scale": _np(sd[f"{prefix}.weight"]), "bias": _b(sd[f"{prefix}.bias"])},
            {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])})


# ---------------------------------------------------------------------------
# architecture mappers (keyed by the registry / config architecture names)
# ---------------------------------------------------------------------------


def _bts_trunk(sd: Mapping, prefix: str = "", *, fsb: bool = False) -> Params:
    p = {name: _levelblock(sd, prefix + name)
         for name in ("encoder1", "encoder2", "encoder3", "encoder4",
                      "bottleneck", "decoder3", "decoder2", "decoder1")}
    p["bottleneck2"] = _cinl(sd, prefix + "bottleneck2")
    if fsb:
        for k in ("npl1", "npl2", "npl3", "npl4"):
            p[k] = _levelblock(sd, prefix + k)
    return p


def _bts_seg_heads(sd: Mapping, deep_supervision: bool) -> Params:
    p = {"output1": _conv(sd, "output1")}
    if deep_supervision:
        p["output3"] = _deconv_head(sd, "output3")
        p["output2"] = _deconv_head(sd, "output2")
    return p


def _map_btsunet(sd, *, deep_supervision=False, **_) -> Tuple[Params, Params]:
    return {**_bts_trunk(sd), **_bts_seg_heads(sd, deep_supervision)}, {}


def _map_fsb(sd, *, deep_supervision=False, **_) -> Tuple[Params, Params]:
    p = {**_bts_trunk(sd, fsb=True), **_bts_seg_heads(sd, deep_supervision)}
    if deep_supervision:
        p["input1"] = _conv(sd, "input1.0")
        for k in ("out_npl1", "out_npl2", "out_npl3", "out_npl4"):
            p[k] = _conv(sd, f"{k}.0")
    return p, {}


def _nnunet_backbone(sd) -> Params:
    p = {"bottleneck": _levelblock(sd, "bottleneck")}
    for i in range(1, 6):
        p[f"encoder{i}"] = _levelblock(sd, f"encoder{i}")
        p[f"decoder{i}"] = _levelblock(sd, f"decoder{i}")
        p[f"upsample{i}"] = _deconv(sd, f"upsample{i}")
    return p


def _nnunet_seg_heads(sd) -> Params:
    return {"output4": _deconv_head(sd, "output4"),
            "output3": _deconv_head(sd, "output3"),
            "output2": _deconv_head(sd, "output2"),
            "output1": _conv(sd, "output1")}


def _nnunet_cls_head(sd) -> Params:
    return {"process_encoder_5": _cinl(sd, "process_encoder_5"),
            "process_decoder_5": _cinl(sd, "process_decoder_5"),
            "cls_conv": _cinl(sd, "classifier.0"),
            "fc1": _dense(sd, "classifier.3"),
            "fc2": _dense(sd, "classifier.5")}


def _map_nnunet(sd, **_) -> Tuple[Params, Params]:
    return {"backbone": _nnunet_backbone(sd), "heads": _nnunet_seg_heads(sd)}, {}


def _map_mtnnunet(sd, **_) -> Tuple[Params, Params]:
    return {"backbone": _nnunet_backbone(sd), "heads": _nnunet_seg_heads(sd),
            "cls_head": _nnunet_cls_head(sd)}, {}


def _map_nnunet_classifier(sd, **_) -> Tuple[Params, Params]:
    p = {f"encoder{i}": _levelblock(sd, f"encoder{i}") for i in range(1, 6)}
    p["bottleneck"] = _levelblock(sd, "bottleneck")
    p["upsample5"] = _deconv(sd, "upsample5")
    p["decoder5"] = _levelblock(sd, "decoder5")
    p["cls_head"] = _nnunet_cls_head(sd)
    return p, {}  # reference decoders 4..1 are dead code — dropped


def _map_bts_classifier(sd, *, width=24, **_) -> Tuple[Params, Params]:
    p = {f"enc{i + 1}": _levelblock(sd, f"encoder.{2 * i}") for i in range(5)}
    p["classifier"] = {
        "fc1": _dense_after_flatten(sd, "classifier.1", channels=width * 8),
        "fc2": _dense(sd, "classifier.3")}
    return p, {}


def _bts_cls_head(sd, width: int) -> Params:
    return {"process_bottleneck2": _cinl(sd, "process_bottleneck2"),
            "process_features_map": _cinl(sd, "process_features_map"),
            "classifier": {
                "fc1": _dense_after_flatten(sd, "classifier.1",
                                            channels=width * 8),
                "fc2": _dense(sd, "classifier.3")}}


def _map_multi_bts(sd, *, deep_supervision=False, width=24, **_) -> Tuple[Params, Params]:
    return {"trunk": _bts_trunk(sd), "cls_head": _bts_cls_head(sd, width),
            **_bts_seg_heads(sd, deep_supervision)}, {}


def _map_multi_fsb(sd, *, deep_supervision=False, width=24, **_) -> Tuple[Params, Params]:
    p = {"trunk": _bts_trunk(sd, fsb=True), "cls_head": _bts_cls_head(sd, width),
         **_bts_seg_heads(sd, deep_supervision)}
    if deep_supervision:
        p["input1"] = _conv(sd, "input1.0")
        for k in ("out_npl1", "out_npl2", "out_npl3", "out_npl4"):
            p[k] = _conv(sd, f"{k}.0")
    return p, {}


def _convrelu_level(sd, prefix: str) -> Params:
    """Adityan LevelBlock: two biased ConvReLU (``AdityanNetwork.py:19-39``)."""
    return {"conv1": _conv(sd, f"{prefix}.ConvRelu1.Conv"),
            "conv2": _conv(sd, f"{prefix}.ConvRelu2.Conv")}


def _map_adityan(sd, **_) -> Tuple[Params, Params]:
    p = {name: _convrelu_level(sd, name)
         for name in ("encoder1", "encoder2", "encoder3", "encoder4",
                      "bottleneck", "decoder4", "decoder3", "decoder2",
                      "segmap", "recmap")}
    for i in range(1, 5):
        p[f"upsample{i}"] = _deconv(sd, f"upsample{i}")
    p["seg_out"] = _conv(sd, "seg_out")
    p["rec_out"] = _conv(sd, "rec_out")
    p["cls_conv"] = _conv(sd, "classmap.3.Conv")
    p["cls_fc1"] = _dense(sd, "classmap.6")
    p["cls_fc2"] = _dense(sd, "classmap.8")
    return p, {}


def _residual_block(sd, prefix: str, *, in_block: bool) -> Tuple[Params, Params]:
    """ResidualUNet in_block / res_block → (params, batch_stats) sub-trees."""
    params: Params = {}
    stats: Params = {}
    bn_names = ("bn1", "bn3") if in_block else ("bn1", "bn2", "bn3")
    for bn in bn_names:
        s, st = _bn(sd, f"{prefix}.{bn}")
        params[bn] = {"bn": s}
        stats[bn] = {"bn": st}
    for conv in ("conv1", "conv2", "conv3"):
        params[conv] = _conv(sd, f"{prefix}.{conv}")
    return params, stats


def _map_residual_unet(sd, **_) -> Tuple[Params, Params]:
    params: Params = {}
    stats: Params = {}
    blocks = [("in_block", "in_block", True),
              ("down_block2", "encoder.down_block2", False),
              ("down_block3", "encoder.down_block3", False),
              ("down_block4", "encoder.down_block4", False),
              ("up_block3", "decoder.up_block3", False),
              ("up_block2", "decoder.up_block2", False),
              ("up_block1", "decoder.up_block1", False)]
    for name, prefix, is_in in blocks:
        params[name], stats[name] = _residual_block(sd, prefix, in_block=is_in)
    for i in (3, 2, 1):
        params[f"upsample{i}"] = _deconv(sd, f"decoder.upsample{i}")
    params["seg_out"] = _conv(sd, "out_block.conv")
    # decoder.conv3/conv2/conv1 are dead reference code (never called by
    # ``ResidualUNet.forward``) — dropped
    return params, stats


_MAPPERS = {
    "BTSUNet": _map_btsunet,
    "FSBBTSUNet": _map_fsb,
    "nnUNet": _map_nnunet,
    "ResidualUNet": _map_residual_unet,
    "BTSUNetClassifier": _map_bts_classifier,
    "nnUNetClassifier": _map_nnunet_classifier,
    "MTnnUNet": _map_mtnnunet,
    "Multi_BTSUNet": _map_multi_bts,
    "Multi_FSB_BTSUNet": _map_multi_fsb,
    "Adityan": _map_adityan,
}


def convert_state_dict(architecture: str, state_dict: Mapping,
                       *, deep_supervision: bool = False,
                       width: int = 24) -> Tuple[Params, Params]:
    """Map a reference torch ``state_dict`` to ``(params, batch_stats)``
    pytrees for the same-named registry architecture.

    ``width`` is only consulted by the Flatten-head architectures
    (BTSUNetClassifier, Multi_BTSUNet, Multi_FSB_BTSUNet) to split the
    flattened Linear input into its (c, h, w) factors; it must match the
    checkpoint's ``model.width``.
    """
    if architecture not in _MAPPERS:
        raise ValueError(
            f"cannot import torch weights for {architecture!r}: supported "
            f"architectures are {sorted(_MAPPERS)} (the MONAI factory models "
            f"have no custom reference source to map from)")
    try:
        return _MAPPERS[architecture](dict(state_dict),
                                      deep_supervision=deep_supervision,
                                      width=width)
    except KeyError as e:
        raise KeyError(
            f"state_dict key {e.args[0]!r} not found while importing "
            f"{architecture!r} (deep_supervision={deep_supervision}) — is the "
            f"checkpoint from the same architecture/configuration?") from e


def _assert_matching_trees(converted: Params, template, what: str) -> None:
    """Fail with the exact mismatching paths, not a cryptic restore error."""
    def paths(tree):
        return {jax.tree_util.keystr(path): tuple(np.shape(leaf))
                for path, leaf in jax.tree_util.tree_leaves_with_path(tree)}

    got, want = paths(converted), paths(template)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    wrong = sorted(k for k in set(got) & set(want) if got[k] != want[k])
    if missing or extra or wrong:
        lines = [f"converted {what} do not match the model built from --config:"]
        lines += [f"  missing: {k} {want[k]}" for k in missing[:8]]
        lines += [f"  unexpected: {k} {got[k]}" for k in extra[:8]]
        lines += [f"  shape mismatch: {k} got {got[k]} want {want[k]}"
                  for k in wrong[:8]]
        raise ValueError("\n".join(lines))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--config", default="./config.yaml",
                        help="this framework's config.yaml describing the model")
    parser.add_argument("--task", default="multitask",
                        choices=["segmentation", "classification", "multitask"])
    parser.add_argument("--torch-checkpoint", required=True,
                        help="reference checkpoint (torch.save dict or raw state_dict)")
    parser.add_argument("--out", required=True,
                        help="output checkpoint path (this framework's format)")
    parser.add_argument("--size", type=int, default=128)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import torch  # required only for reading the torch file

    from multi_task_breast_cancer_tpu.config import load_config
    from multi_task_breast_cancer_tpu.train.checkpoint import save_checkpoint
    from multi_task_breast_cancer_tpu.train.driver import build_inference_state

    # weights_only: the reference checkpoints are plain dicts of tensors +
    # scalars (training_multitask.py:243-249) — never let a tampered pickle
    # execute code at load time
    ckpt = torch.load(args.torch_checkpoint, map_location="cpu",
                      weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    epoch = int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0
    val_loss = float(ckpt.get("val_loss", float("inf"))) \
        if isinstance(ckpt, dict) else float("inf")

    cfg = load_config(args.config)
    params, batch_stats = convert_state_dict(
        cfg.model.architecture, sd,
        deep_supervision=cfg.model.deep_supervision, width=cfg.model.width)

    _, _, state, _ = build_inference_state(cfg, args.task, size=args.size)
    _assert_matching_trees(params, state.params, "params")
    if batch_stats:
        _assert_matching_trees(batch_stats, state.batch_stats, "batch stats")

    state = state.replace(params=params,
                          batch_stats=batch_stats or state.batch_stats)
    save_checkpoint(args.out, state, epoch=epoch, val_loss=val_loss)
    logging.info("wrote %s (epoch %d, val_loss %s) — load with predict.py / "
                 "evaluate.py / load_pretrained_model", args.out, epoch, val_loss)


if __name__ == "__main__":
    main()
