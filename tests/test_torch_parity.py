"""Numerical parity with the reference's ACTUAL torch model code.

The reference tree at /root/reference is importable in place (torch-CPU is in
the image), so instead of validating the Flax zoo only by shape tests + code
reading, these tests prove it two ways:

1. **Param-count sweep** over every custom reference architecture
   (``BTS_UNet.py:64-155``, ``FSB_BTS_UNet.py:70-194``, ``nnUNet.py:64-168``,
   ``ResidualUNet.py:338-362``, ``BTS_UNET_classifier.py:58-115``,
   ``nnUNet_classifier.py:75-171``, ``Multi_BTS_UNet.py:64-176``,
   ``Multi_FSB_BTS_UNet.py:70-214``, ``MTnnUNet.py:64-183``,
   ``AdityanNetwork.py:54-140``): trainable-parameter totals must match the
   torch models exactly.  The two MONAI-dependent archs (MTUNetPlusPlus,
   UNetPlusPlusClassifier) cannot be imported — monai is not installed in this
   image — and are excluded; their Flax twins are validated by shape tests and
   the MONAI-constant unit tests instead.

2. **Weight-transplant forward parity**: map a torch ``state_dict`` into the
   Flax pytree (OIHW→HWIO transposes; transposed convs additionally flip the
   spatial taps; Linear→Dense transposes) and assert forward outputs agree to
   f32 tolerance on a fixed input.  This conclusively validates padding, eps,
   LeakyReLU slope, upsample semantics, concat order, and head wiring that
   shape + learnability tests cannot distinguish.

ResidualUNet quirk handled explicitly: the reference's ``decoder`` owns three
1×1 skip-merge convs (``ResidualUNet.py:217-253``) that its ``forward`` never
calls (skips only exist in the unused ``seg_path`` variant ``:296-335``), so
the torch count includes dead parameters; the sweep asserts equality after
subtracting exactly those.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree not present")

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Reference import + weight-mapping helpers
# ---------------------------------------------------------------------------

_REF_CACHE: dict = {}


def _ref(relpath: str):
    """Import a reference model file in place (read-only, never copied)."""
    if relpath not in _REF_CACHE:
        name = "refmod_" + relpath.replace("/", "_").replace(".py", "")
        spec = importlib.util.spec_from_file_location(name, REF / relpath)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        _REF_CACHE[relpath] = mod
    return _REF_CACHE[relpath]


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy()


def t2f_conv(w) -> jnp.ndarray:
    """torch Conv2d weight (O,I,kh,kw) → flax (kh,kw,I,O)."""
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def t2f_deconv(w) -> jnp.ndarray:
    """torch ConvTranspose2d weight (I,O,kh,kw) → flax/lax HWIO with the
    spatial taps flipped (verified equivalence for VALID/stride=k)."""
    return jnp.asarray(_np(w).transpose(2, 3, 0, 1)[::-1, ::-1])


def t2f_linear(w) -> jnp.ndarray:
    """torch Linear weight (O,I) → flax Dense kernel (I,O)."""
    return jnp.asarray(_np(w).T)


def _b(t) -> jnp.ndarray:
    return jnp.asarray(_np(t))


def _cinl(sd, prefix: str) -> dict:
    """ConvInNormLeReLU: one bias-free conv (InstanceNorm has no params)."""
    return {"conv": {"kernel": t2f_conv(sd[f"{prefix}.Conv.weight"])}}


def _levelblock(sd, prefix: str) -> dict:
    """Reference LevelBlock (two ConvInNormLeReLU) → flax {block1, block2}."""
    return {"block1": _cinl(sd, f"{prefix}.ConvInNormLRelu1"),
            "block2": _cinl(sd, f"{prefix}.ConvInNormLRelu2")}


def _conv1x1(sd, prefix: str) -> dict:
    return {"kernel": t2f_conv(sd[f"{prefix}.weight"]),
            "bias": _b(sd[f"{prefix}.bias"])}


def _deconv_head(sd, prefix: str) -> dict:
    """torch Sequential(ConvTranspose2d, conv1x1) → fused DeconvHead params."""
    return {"deconv_kernel": t2f_deconv(sd[f"{prefix}.0.weight"]),
            "deconv_bias": _b(sd[f"{prefix}.0.bias"]),
            "conv1x1_kernel": t2f_conv(sd[f"{prefix}.1.weight"]),
            "conv1x1_bias": _b(sd[f"{prefix}.1.bias"])}


def _deconv(sd, prefix: str) -> dict:
    """torch ConvTranspose2d module → flax nn.ConvTranspose params."""
    return {"kernel": t2f_deconv(sd[f"{prefix}.weight"]),
            "bias": _b(sd[f"{prefix}.bias"])}


def _dense(sd, prefix: str) -> dict:
    return {"kernel": t2f_linear(sd[f"{prefix}.weight"]),
            "bias": _b(sd[f"{prefix}.bias"])}


def _dense_after_flatten(sd, prefix: str, c: int, h: int, w: int) -> dict:
    """Linear that follows a torch ``Flatten`` of a (B,C,H,W) tensor.  The
    Flax side flattens (B,H,W,C), so the kernel's input axis is permuted from
    (c,h,w) to (h,w,c) order before transposing."""
    wt = _np(sd[f"{prefix}.weight"])  # (out, C*H*W) in (c,h,w) order
    wt = wt.reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(wt.shape[0], -1)
    return {"kernel": jnp.asarray(wt.T), "bias": _b(sd[f"{prefix}.bias"])}


def _nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(x.transpose(0, 3, 1, 2).copy())


def _torch_count(model) -> int:
    return sum(p.numel() for p in model.parameters() if p.requires_grad)


def _flax_count(module, in_shape) -> int:
    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0),
                            jnp.zeros(in_shape, jnp.float32))
    # trainable params only — 'batch_stats' (running mean/var) are torch
    # buffers, excluded from the reference's count_parameters too
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(shapes["params"]))


# ---------------------------------------------------------------------------
# 1. Param-count sweep (every importable custom reference architecture)
# ---------------------------------------------------------------------------

def _sweep_cases():
    from multi_task_breast_cancer_tpu.models.bts_unet import BTSUNet
    from multi_task_breast_cancer_tpu.models.classifiers import (
        BTSUNetClassifier, NNUNetClassifier)
    from multi_task_breast_cancer_tpu.models.fsb_bts_unet import FSBBTSUNet
    from multi_task_breast_cancer_tpu.models.multitask import (
        Adityan, MTnnUNet, MultiBTSUNet, MultiFSBBTSUNet)
    from multi_task_breast_cancer_tpu.models.nnunet import NNUNet2021

    cases = []
    for ds in (False, True):
        cases.append((f"BTSUNet_ds{int(ds)}", "models/segmentation/BTS_UNet.py",
                      "BTSUNet", dict(sequences=1, regions=1, width=24, deep_supervision=ds),
                      BTSUNet(regions=1, width=24, deep_supervision=ds)))
        cases.append((f"FSB_ds{int(ds)}", "models/segmentation/FSB_BTS_UNet.py",
                      "FSB_BTS_UNet", dict(sequences=1, regions=1, width=24, deep_supervision=ds),
                      FSBBTSUNet(regions=1, width=24, deep_supervision=ds)))
        cases.append((f"MultiBTS_ds{int(ds)}", "models/multitask/Multi_BTS_UNet.py",
                      "Multi_BTS_UNet", dict(sequences=1, regions=1, n_classes=3, width=24,
                                             deep_supervision=ds),
                      MultiBTSUNet(regions=1, n_classes=3, width=24, deep_supervision=ds)))
        cases.append((f"MultiFSB_ds{int(ds)}", "models/multitask/Multi_FSB_BTS_UNet.py",
                      "Multi_FSB_BTS_UNet", dict(sequences=1, regions=1, width=24,
                                                 deep_supervision=ds),
                      MultiFSBBTSUNet(regions=1, width=24, deep_supervision=ds)))
    cases += [
        ("nnUNet2021", "models/segmentation/nnUNet.py", "nnUNet2021",
         dict(sequences=1, regions=1), NNUNet2021(regions=1)),
        ("MTnnUNet", "models/multitask/MTnnUNet.py", "MTnnUNet",
         dict(sequences=1, regions=1, n_classes=3), MTnnUNet(regions=1, n_classes=3)),
        ("BTSUNetClassifier", "models/classification/BTS_UNET_classifier.py",
         "BTSUNetClassifier", dict(sequences=1, classes=3, width=24),
         BTSUNetClassifier(n_classes=3, width=24)),
        ("BTSUNetClassifier_binary", "models/classification/BTS_UNET_classifier.py",
         "BTSUNetClassifier", dict(sequences=1, classes=2, width=24),
         BTSUNetClassifier(n_classes=2, width=24)),
        ("Adityan", "models/multitask/AdityanNetwork.py", "Adityan",
         dict(sequences=1, regions=1, width=16), Adityan(regions=1, width=16)),
    ]
    return cases


@pytest.mark.parametrize("case", _sweep_cases(), ids=lambda c: c[0])
def test_param_count_parity(case):
    _, relpath, clsname, kw, flax_model = case
    torch_model = getattr(_ref(relpath), clsname)(**kw)
    assert _flax_count(flax_model, (1, 128, 128, 1)) == _torch_count(torch_model)


def test_param_count_parity_nnunet_classifier():
    """nnUNetClassifier matches after subtracting the reference's dead
    decoders 4..1 (constructed at ``nnUNet_classifier.py:106-109`` but its
    ``forward`` stops at decoder5, ``:159-167``)."""
    from multi_task_breast_cancer_tpu.models.classifiers import NNUNetClassifier
    tm = _ref("models/classification/nnUNet_classifier.py").nnUNetClassifier(
        sequences=1, n_classes=3)
    dead = sum(p.numel() for name in ("decoder4", "decoder3", "decoder2", "decoder1")
               for p in getattr(tm, name).parameters())
    assert dead > 0
    assert _flax_count(NNUNetClassifier(n_classes=3), (1, 128, 128, 1)) \
        == _torch_count(tm) - dead


def test_param_count_parity_residual_unet():
    """ResidualUNet matches after subtracting the reference's dead skip-merge
    convs (constructed at ``ResidualUNet.py:217-253``, never called by
    ``ResidualUNet.forward`` — only by the unused ``seg_path``)."""
    from multi_task_breast_cancer_tpu.models.residual_unet import ResidualUNet
    tm = _ref("models/segmentation/ResidualUNet.py").ResidualUNet(
        sequences=1, regions=1, width=24)
    dead = sum(p.numel() for name in ("conv3", "conv2", "conv1")
               for p in getattr(tm.decoder, name).parameters())
    assert dead > 0
    assert _flax_count(ResidualUNet(regions=1, width=24), (1, 128, 128, 1)) \
        == _torch_count(tm) - dead


# ---------------------------------------------------------------------------
# 2. Weight-transplant forward parity
# ---------------------------------------------------------------------------

def _bts_trunk_params(sd, *, fsb: bool = False) -> dict:
    p = {"encoder1": _levelblock(sd, "encoder1"),
         "encoder2": _levelblock(sd, "encoder2"),
         "encoder3": _levelblock(sd, "encoder3"),
         "encoder4": _levelblock(sd, "encoder4"),
         "bottleneck": _levelblock(sd, "bottleneck"),
         "bottleneck2": _cinl(sd, "bottleneck2"),
         "decoder3": _levelblock(sd, "decoder3"),
         "decoder2": _levelblock(sd, "decoder2"),
         "decoder1": _levelblock(sd, "decoder1")}
    if fsb:
        for k in ("npl1", "npl2", "npl3", "npl4"):
            p[k] = _levelblock(sd, k)
    return p


def test_transplant_btsunet_deep_supervision():
    """BTSUNet(width=8, DS): torch state_dict → Flax pytree, forward values
    must agree (covers conv padding, IN eps, LeakyReLU slope, nearest
    upsample, concat order, and the fused DeconvHead equivalence)."""
    from multi_task_breast_cancer_tpu.models.bts_unet import BTSUNet

    tm = _ref("models/segmentation/BTS_UNet.py").BTSUNet(
        sequences=1, regions=1, width=8, deep_supervision=True)
    tm.eval()
    sd = tm.state_dict()

    params = _bts_trunk_params(sd)
    params["output1"] = _conv1x1(sd, "output1")
    params["output3"] = _deconv_head(sd, "output3")
    params["output2"] = _deconv_head(sd, "output2")

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 64, 64, 1)).astype(np.float32)

    with torch.no_grad():
        t_out = tm(_nchw(x))
    f_out = BTSUNet(regions=1, width=8, deep_supervision=True).apply(
        {"params": params}, jnp.asarray(x))

    assert len(t_out) == len(f_out) == 3
    for t, f in zip(t_out, f_out):
        np.testing.assert_allclose(
            _np(t), np.asarray(f).transpose(0, 3, 1, 2), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_transplant_mtnnunet():
    """MTnnUNet (full reference widths): transplant + forward parity for the
    flagship, covering deconv upsampling, the 4 fused DS heads, the shared
    ``upsample5`` reuse in the cls feature cat (``MTnnUNet.py:174``), and the
    ConvINLReLU→GAP→MLP classification head."""
    from multi_task_breast_cancer_tpu.models.multitask import MTnnUNet

    tm = _ref("models/multitask/MTnnUNet.py").MTnnUNet(
        sequences=1, regions=1, n_classes=3)
    tm.eval()
    sd = tm.state_dict()

    backbone = {}
    for i in range(1, 6):
        backbone[f"encoder{i}"] = _levelblock(sd, f"encoder{i}")
        backbone[f"decoder{i}"] = _levelblock(sd, f"decoder{i}")
        backbone[f"upsample{i}"] = _deconv(sd, f"upsample{i}")
    backbone["bottleneck"] = _levelblock(sd, "bottleneck")

    heads = {"output4": _deconv_head(sd, "output4"),
             "output3": _deconv_head(sd, "output3"),
             "output2": _deconv_head(sd, "output2"),
             "output1": _conv1x1(sd, "output1")}

    cls_head = {"process_encoder_5": _cinl(sd, "process_encoder_5"),
                "process_decoder_5": _cinl(sd, "process_decoder_5"),
                "cls_conv": _cinl(sd, "classifier.0"),
                "fc1": _dense(sd, "classifier.3"),
                "fc2": _dense(sd, "classifier.5")}

    params = {"backbone": backbone, "heads": heads, "cls_head": cls_head}

    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)

    with torch.no_grad():
        t_cls, t_seg = tm(_nchw(x))
    (f_cls,), f_seg = MTnnUNet(regions=1, n_classes=3).apply(
        {"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(_np(t_cls[0]), np.asarray(f_cls),
                               rtol=1e-3, atol=1e-4)
    assert len(t_seg) == len(f_seg) == 4
    for t, f in zip(t_seg, f_seg):
        np.testing.assert_allclose(
            _np(t), np.asarray(f).transpose(0, 3, 1, 2), rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_transplant_multi_bts_unet():
    """Multi_BTS_UNet(width=8, DS) at 128² (the Flatten head hard-codes the
    16×16 bottleneck grid, ``Multi_BTS_UNet.py:110``): transplant + forward
    parity for the cls head over cat(e4, bottleneck, proc(bottleneck2))."""
    from multi_task_breast_cancer_tpu.models.multitask import MultiBTSUNet

    tm = _ref("models/multitask/Multi_BTS_UNet.py").Multi_BTS_UNet(
        sequences=1, regions=1, n_classes=3, width=8, deep_supervision=True)
    tm.eval()
    sd = tm.state_dict()

    params = {
        "trunk": _bts_trunk_params(sd),
        "cls_head": {
            "process_bottleneck2": _cinl(sd, "process_bottleneck2"),
            "process_features_map": _cinl(sd, "process_features_map"),
            "classifier": {"fc1": _dense_after_flatten(sd, "classifier.1", 64, 16, 16),
                           "fc2": _dense(sd, "classifier.3")},
        },
        "output1": _conv1x1(sd, "output1"),
        "output3": _deconv_head(sd, "output3"),
        "output2": _deconv_head(sd, "output2"),
    }

    rng = np.random.default_rng(23)
    x = rng.standard_normal((1, 128, 128, 1)).astype(np.float32)

    with torch.no_grad():
        t_cls, t_seg = tm(_nchw(x))
    (f_cls,), f_seg = MultiBTSUNet(regions=1, n_classes=3, width=8,
                                   deep_supervision=True).apply(
        {"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(_np(t_cls[0]), np.asarray(f_cls),
                               rtol=1e-3, atol=1e-4)
    for t, f in zip(t_seg, f_seg):
        np.testing.assert_allclose(
            _np(t), np.asarray(f).transpose(0, 3, 1, 2), rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_transplant_fsb_bts_unet_deep_supervision():
    """FSB_BTS_UNet(width=8, DS): transplant + forward parity for the
    full-resolution no-pooling bridge (npl1-4 → decoder1 concat) and the
    8-head deep-supervision order (``FSB_BTS_UNet.py:150-190``)."""
    from multi_task_breast_cancer_tpu.models.fsb_bts_unet import FSBBTSUNet

    tm = _ref("models/segmentation/FSB_BTS_UNet.py").FSB_BTS_UNet(
        sequences=1, regions=1, width=8, deep_supervision=True)
    tm.eval()
    sd = tm.state_dict()

    params = _bts_trunk_params(sd, fsb=True)
    params["output1"] = _conv1x1(sd, "output1")
    params["output3"] = _deconv_head(sd, "output3")
    params["output2"] = _deconv_head(sd, "output2")
    params["input1"] = _conv1x1(sd, "input1.0")
    for k in ("out_npl1", "out_npl2", "out_npl3", "out_npl4"):
        params[k] = _conv1x1(sd, f"{k}.0")

    rng = np.random.default_rng(31)
    x = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)

    with torch.no_grad():
        t_out = tm(_nchw(x))
    f_out = FSBBTSUNet(regions=1, width=8, deep_supervision=True).apply(
        {"params": params}, jnp.asarray(x))

    assert len(t_out) == len(f_out) == 8
    for t, f in zip(t_out, f_out):
        np.testing.assert_allclose(
            _np(t), np.asarray(f).transpose(0, 3, 1, 2), rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_transplant_nnunet2021():
    """Segmentation nnU-Net 2021 (full reference widths): transplant +
    forward parity for the 5-level deconv-upsampled decoder and the 4
    always-on DS heads (``nnUNet.py:134-168``)."""
    from multi_task_breast_cancer_tpu.models.nnunet import NNUNet2021

    tm = _ref("models/segmentation/nnUNet.py").nnUNet2021(sequences=1, regions=1)
    tm.eval()
    sd = tm.state_dict()

    backbone = {}
    for i in range(1, 6):
        backbone[f"encoder{i}"] = _levelblock(sd, f"encoder{i}")
        backbone[f"decoder{i}"] = _levelblock(sd, f"decoder{i}")
        backbone[f"upsample{i}"] = _deconv(sd, f"upsample{i}")
    backbone["bottleneck"] = _levelblock(sd, "bottleneck")
    heads = {"output4": _deconv_head(sd, "output4"),
             "output3": _deconv_head(sd, "output3"),
             "output2": _deconv_head(sd, "output2"),
             "output1": _conv1x1(sd, "output1")}

    rng = np.random.default_rng(37)
    x = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(_nchw(x))
    f_out = NNUNet2021(regions=1).apply(
        {"params": {"backbone": backbone, "heads": heads}}, jnp.asarray(x))
    assert len(t_out) == len(f_out) == 4
    for t, f in zip(t_out, f_out):
        np.testing.assert_allclose(
            _np(t), np.asarray(f).transpose(0, 3, 1, 2), rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_transplant_nnunet_classifier_softmax_quirk():
    """nnUNetClassifier: transplant + forward parity THROUGH the
    softmax-in-forward quirk (``nnUNet_classifier.py:168-169``) — outputs are
    probabilities, so agreement also validates the quirk's placement."""
    from multi_task_breast_cancer_tpu.models.classifiers import NNUNetClassifier

    tm = _ref("models/classification/nnUNet_classifier.py").nnUNetClassifier(
        sequences=1, n_classes=3)
    tm.eval()
    sd = tm.state_dict()

    params = {}
    for i in range(1, 6):
        params[f"encoder{i}"] = _levelblock(sd, f"encoder{i}")
    params["bottleneck"] = _levelblock(sd, "bottleneck")
    params["upsample5"] = _deconv(sd, "upsample5")
    params["decoder5"] = _levelblock(sd, "decoder5")
    params["cls_head"] = {"process_encoder_5": _cinl(sd, "process_encoder_5"),
                          "process_decoder_5": _cinl(sd, "process_decoder_5"),
                          "cls_conv": _cinl(sd, "classifier.0"),
                          "fc1": _dense(sd, "classifier.3"),
                          "fc2": _dense(sd, "classifier.5")}

    rng = np.random.default_rng(41)
    x = rng.standard_normal((2, 64, 64, 1)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(_nchw(x))
    f_out = NNUNetClassifier(n_classes=3).apply({"params": params},
                                                jnp.asarray(x))
    probs = np.asarray(f_out)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(_np(t_out), probs, rtol=1e-3, atol=1e-4)
