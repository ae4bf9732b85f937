"""Shape/structure tests for the model zoo — the systematic version of the
reference's per-file ``__main__`` smoke blocks (e.g. ``BTS_UNet.py:158-182``):
build each model on a random (1,128,128,1) input, run forward, check shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_task_breast_cancer_tpu.models import (
    init_classification_model,
    init_multitask_model,
    init_segmentation_model,
)
from multi_task_breast_cancer_tpu.models.registry import count_parameters

IMG = (1, 128, 128, 1)


def _init_and_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=train,
                      rngs={"dropout": jax.random.PRNGKey(1)} if train else None,
                      mutable=["batch_stats"] if "batch_stats" in variables else False)
    if isinstance(out, tuple) and len(out) == 2 and isinstance(out[1], dict) and "batch_stats" in out[1]:
        out = out[0]
    return variables, out


@pytest.mark.parametrize("arch", ["BTSUNet", "UnetPlusPlus", "FSBBTSUNet"])
@pytest.mark.parametrize("deep_supervision", [False, True])
def test_segmentation_ds_archs(arch, deep_supervision):
    model = init_segmentation_model(arch, width=6, deep_supervision=deep_supervision)
    x = jnp.zeros(IMG)
    _, out = _init_and_apply(model, x)
    if deep_supervision:
        assert isinstance(out, tuple)
        expected_heads = {"BTSUNet": 3, "UnetPlusPlus": 4, "FSBBTSUNet": 8}[arch]
        assert len(out) == expected_heads
        for head in out:
            assert head.shape == IMG
    else:
        assert out.shape == IMG


@pytest.mark.parametrize("arch", ["nnUNet", "UNet", "AttentionUNet", "SegResNet"])
def test_segmentation_simple_archs(arch):
    model = init_segmentation_model(arch, width=8)
    x = jnp.zeros(IMG)
    _, out = _init_and_apply(model, x)
    if isinstance(out, tuple):  # nnUNet: always 4 DS heads
        assert len(out) == 4
        for head in out:
            assert head.shape == IMG
    else:
        assert out.shape == IMG


def test_residual_unet_train_and_eval():
    model = init_segmentation_model("ResidualUNet", width=8)
    x = jnp.zeros(IMG)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" in variables
    out, updates = model.apply(variables, x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
    assert out.shape == IMG
    assert "batch_stats" in updates
    out_eval = model.apply(variables, x, train=False)
    assert out_eval.shape == IMG


@pytest.mark.parametrize("arch", ["BTSUNetClassifier", "UNetPlusPlusClassifier", "nnUNetClassifier"])
@pytest.mark.parametrize("n_classes", [2, 3])
def test_classifiers(arch, n_classes):
    model = init_classification_model(arch, n_classes=n_classes, width=6)
    x = jnp.zeros(IMG)
    _, out = _init_and_apply(model, x)
    n_out = 1 if n_classes == 2 else n_classes
    assert out.shape == (1, n_out)


def test_nnunet_classifier_softmax_quirk():
    """Reference applies softmax in forward when multiclass (nnUNet_classifier.py:168-169)."""
    model = init_classification_model("nnUNetClassifier", n_classes=3)
    x = jnp.ones(IMG)
    _, out = _init_and_apply(model, x)
    assert jnp.allclose(jnp.sum(out, axis=-1), 1.0, atol=1e-5)


def test_mtnnunet_outputs():
    model = init_multitask_model("MTnnUNet", n_classes=3)
    x = jnp.zeros(IMG)
    _, (cls, seg) = _init_and_apply(model, x)
    assert isinstance(cls, tuple) and len(cls) == 1
    assert cls[0].shape == (1, 3)
    assert isinstance(seg, tuple) and len(seg) == 4
    for head in seg:
        assert head.shape == IMG
    # exact parameter-count parity with the reference MTnnUNet (widths
    # [32,64,128,256,320], MTnnUNet.py:64-132): hand-computed 15,819,799
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    n = count_parameters(variables["params"])
    assert n == 15_819_799


@pytest.mark.parametrize("deep_supervision", [False, True])
def test_mtunetplusplus_outputs(deep_supervision):
    model = init_multitask_model("MTUNetPlusPlus", n_classes=3,
                                 deep_supervision=deep_supervision)
    x = jnp.zeros(IMG)
    _, out = _init_and_apply(model, x)
    if deep_supervision:
        cls, seg = out
        assert isinstance(cls, tuple) and cls[0].shape == (1, 3)
        assert len(seg) == 4
    else:
        cls, seg = out
        assert cls.shape == (1, 3)
        assert seg.shape == IMG


def test_multi_bts_and_fsb():
    x = jnp.zeros(IMG)
    model = init_multitask_model("Multi_BTSUNet", n_classes=3, width=6,
                                 deep_supervision=True)
    _, (cls, seg) = _init_and_apply(model, x)
    assert cls[0].shape == (1, 3) and len(seg) == 3

    # Multi_FSB quirks: 1 logit hard-coded, bare cls with DS (Multi_FSB_BTS_UNet.py:152,208)
    model = init_multitask_model("Multi_FSB_BTSUNet", width=6, deep_supervision=True)
    _, (cls, seg) = _init_and_apply(model, x)
    assert cls.shape == (1, 1) and len(seg) == 8


def test_adityan_outputs():
    model = init_multitask_model("Adityan", width=8)
    x = jnp.zeros(IMG)
    _, (cls, rec, seg) = _init_and_apply(model, x)
    assert cls.shape == (1, 3)
    assert rec.shape == IMG
    assert seg.shape == IMG
    assert bool(jnp.all((rec >= 0) & (rec <= 1)))  # reconstruction is sigmoid-ed


def test_unetpp_dropout_reaches_decoder_and_cls_head():
    """Regression: dropout used to be threaded only into the UNet++ encoder
    blocks — all 11 UpCat decoder sites and the cls head silently ran at 0.0
    (the reference passes dropout to every UpCat and the classifier convs,
    MTUNetPlusPlus.py:54-90). Source guard + functional check."""
    import inspect
    import re

    import numpy as np

    from multi_task_breast_cancer_tpu.models import unetpp

    src = inspect.getsource(unetpp)
    upcats = re.findall(r"UpCat\([^)]*\)", src, flags=re.S)
    assert upcats and all("dropout=self.dropout" in c for c in upcats), upcats
    heads = [h for h in re.findall(r"UNetPlusPlusClsHead\([^)]*\)", src, re.S)
             if "nn.Module" not in h]  # drop the class declaration itself
    assert heads and all("self.dropout" in h for h in heads), heads

    # functional: with dropout>0 the training-mode forward depends on the
    # dropout rng; with dropout=0 it equals the deterministic forward
    x = jnp.linspace(0, 255, 1 * 32 * 32 * 1).reshape(1, 32, 32, 1)
    model = unetpp.MTUNetPlusPlus(features=(4, 8, 8, 8, 8, 4), dropout=0.5)
    params = model.init(jax.random.PRNGKey(0), x)
    a = model.apply(params, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(params, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a[1]), np.asarray(b[1]))

    zero = unetpp.MTUNetPlusPlus(features=(4, 8, 8, 8, 8, 4), dropout=0.0)
    params0 = zero.init(jax.random.PRNGKey(0), x)
    t = zero.apply(params0, x, train=True,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    e = zero.apply(params0, x, train=False)
    np.testing.assert_array_equal(np.asarray(t[1]), np.asarray(e[1]))


def test_swin_unetr_rejects_unpartitionable_sizes():
    """192² passes the old 'multiple of 32' folklore but stage 3's 12-wide
    grid cannot be split into 8-wide windows — the model must say so clearly
    instead of failing with an opaque reshape error (64² works: grids below
    the window fall back to grid-sized windows)."""
    import pytest

    from multi_task_breast_cancer_tpu.models.swin_unetr import SwinUNETR

    model = SwinUNETR(regions=1, feature_size=6)
    with pytest.raises(ValueError, match="windowed stage grid"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 1)))
    out = model.init_with_output(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 1)))[0]
    assert out.shape == (1, 64, 64, 1)


# ---------------------------------------------------------------------------
# MONAI-zoo param-count table (hand-derived, VERDICT r03 item 9)
# ---------------------------------------------------------------------------
#
# monai is not installed in this image, so the 5 MONAI-equivalent
# architectures (reference factory ``experiment_init.py:53-67``) cannot be
# forward-cross-checked like the 10 custom archs (``test_torch_parity.py``).
# Instead, their parameter totals are derived LAYER BY LAYER below from the
# published architecture definitions and asserted against the live models —
# the same style of proof as MTnnUNet's hand-computed 15,819,799.
#
# Documented deviations from MONAI defaults (TPU-first design choices, each
# changing the count in a stated, checkable way):
# - AttentionUNet: MONAI's ConvBlock/AttentionBlock use BatchNorm (affine,
#   +2C params per norm and running stats as buffers); ours uses the repo's
#   affine-free InstanceNorm (0 params, no mutable state — no cross-device
#   batch statistics under data parallelism). The conv/gate topology and all
#   conv shapes match.
# - SegResNet / UNet: norm parameter conventions follow the published
#   defaults (GroupNorm affine 2C; InstanceNorm affine-free) — no deviation.


def _c(cin, cout, k=3, bias=True):
    """Conv parameter count: k·k·cin·cout (+ cout bias)."""
    return k * k * cin * cout + (cout if bias else 0)


def _n_params(model, shape=(1, 128, 128, 1)):
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               jnp.zeros(shape, jnp.float32))
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(variables["params"]))


def test_param_count_monai_unet_hand_derived():
    """MONAI ``UNet(spatial_dims=2, channels=(w,2w,4w,8w), strides=(2,2,2),
    num_res_units=0)`` at the factory's width 48: each level is ONE
    Convolution (conv3×3 + InstanceNorm(affine-free, 0 params) + PReLU(1
    shared slope)); decoder levels are transposed convs over the
    cat(skip, below) input; the top up-layer is conv_only."""
    from multi_task_breast_cancer_tpu.models.monai_zoo import UNet

    w = 48
    expected = (
        (_c(1, w) + 1)                    # down1  (stride 2) + PReLU
        + (_c(w, 2 * w) + 1)              # down2
        + (_c(2 * w, 4 * w) + 1)          # down3
        + (_c(4 * w, 8 * w) + 1)          # bottom (stride 1)
        + (_c(4 * w + 8 * w, 2 * w) + 1)  # up3: convT(cat(d3, bottom))
        + (_c(2 * w + 2 * w, w) + 1)      # up2
        + _c(w + w, 1)                    # up1: conv_only, no norm/act
    )
    assert expected == 1_453_687
    assert _n_params(UNet(regions=1, channels=(48, 96, 192, 384))) == expected


def test_param_count_monai_attention_unet_hand_derived():
    """MONAI ``AttentionUnet(channels=(w,2w,4w,8w), strides=(2,2,2))`` at
    width 48: 2-conv encoder/decoder blocks, 2×2 transposed-conv upsamples,
    additive attention gates (Wg, Wx 1×1 → inter = C/2; psi 1×1 → 1), final
    1×1. Norms are the repo's affine-free InstanceNorm (see header note)."""
    from multi_task_breast_cancer_tpu.models.monai_zoo import AttentionUNet

    def block(cin, cout):
        return _c(cin, cout) + _c(cout, cout)

    def gate(c, inter):
        return _c(c, inter, k=1) + _c(c, inter, k=1) + _c(inter, 1, k=1)

    def upt(cin, cout):  # 2×2 transposed conv
        return 2 * 2 * cin * cout + cout

    w = 48
    expected = (
        block(1, w) + block(w, 2 * w) + block(2 * w, 4 * w)
        + block(4 * w, 8 * w)                       # encoder
        + upt(8 * w, 4 * w) + gate(4 * w, 2 * w)    # level 3
        + block(8 * w, 4 * w)                       # dec3 over cat(a3, u3)
        + upt(4 * w, 2 * w) + gate(2 * w, w)        # level 2
        + block(4 * w, 2 * w)
        + upt(2 * w, w) + gate(w, w // 2)           # level 1
        + block(2 * w, w)
        + _c(w, 1, k=1)                             # final 1×1
    )
    assert expected == 4_378_732
    assert _n_params(AttentionUNet(regions=1,
                                   channels=(48, 96, 192, 384))) == expected


def test_param_count_monai_segresnet_hand_derived():
    """MONAI ``SegResNet(spatial_dims=2, init_filters=8)``: stem conv, stages
    of (1,2,2,4) pre-activation GroupNorm residual blocks with stride-2
    downsample convs between, decoder = 1×1 conv + nearest-up + add-skip +
    one block per level, final GroupNorm+1×1. GroupNorm affine = 2C."""
    from multi_task_breast_cancer_tpu.models.monai_zoo import SegResNet

    def gn(c):
        return 2 * c

    def resblock(c):
        return gn(c) + _c(c, c) + gn(c) + _c(c, c)

    f, blocks_down = 8, (1, 2, 2, 4)
    expected = _c(1, f)  # stem
    for i, n_blocks in enumerate(blocks_down):
        feats = f * 2 ** i
        if i > 0:
            expected += _c(feats // 2, feats)       # stride-2 downsample
        expected += n_blocks * resblock(feats)
    for i in range(len(blocks_down) - 2, -1, -1):   # decoder levels 2,1,0
        feats = f * 2 ** i
        expected += _c(2 * feats, feats, k=1)       # 1×1 channel halving
        expected += resblock(feats)                 # up_block
    expected += gn(f) + _c(f, 1, k=1)               # final norm + head
    assert expected == 395_985
    assert _n_params(SegResNet(regions=1)) == expected


def test_param_count_monai_family_frozen_totals():
    """Frozen totals for the remaining MONAI-family twins (SwinUNETR's
    attention stack and the UNet++ dense grid are too long to inline as
    formulas; these constants pin the architectures against accidental
    drift — any conv/feature change fails here first)."""
    from multi_task_breast_cancer_tpu.models.swin_unetr import SwinUNETR
    from multi_task_breast_cancer_tpu.models.unetpp import (
        BasicUNetPlusPlus, MTUNetPlusPlus, UNetPlusPlusClassifier)

    variables = SwinUNETR(regions=1).init(jax.random.PRNGKey(0),
                                          jnp.zeros((1, 128, 128, 1)))
    swin = sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(variables["params"]))
    assert swin == 6_311_899
    assert _n_params(BasicUNetPlusPlus(regions=1,
                                       deep_supervision=False)) == 2_410_081
    assert _n_params(BasicUNetPlusPlus(regions=1,
                                       deep_supervision=True)) == 2_410_180
    assert _n_params(MTUNetPlusPlus(regions=1, n_classes=3)) == 14_927_455
    assert _n_params(UNetPlusPlusClassifier(n_classes=3)) == 13_741_131


def test_deconv_d2s_lowering_parity(monkeypatch):
    """MTBC_DECONV=d2s (matmul + depth-to-space, models/blocks.py) is a pure
    lowering switch: identical param tree (same names, shapes, init bits —
    checkpoints and the torch importer are lowering-agnostic) and the same
    function to float ulp. Measured ~11% slower end-to-end on v5e (PARITY.md
    round-5 changelog), so it is a documented escape hatch, never a default."""
    from multi_task_breast_cancer_tpu.models.nnunet import NNUNet2021

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 1),
                    jnp.float32)

    def build(lowering):
        monkeypatch.setenv("MTBC_DECONV", lowering)
        model = NNUNet2021(regions=1, widths=(4, 8, 8, 8, 8))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        return model, params

    _, params_xla = build("xla")
    model_d2s, params_d2s = build("d2s")

    leaves_x = jax.tree_util.tree_leaves(params_xla)
    leaves_d = jax.tree_util.tree_leaves(params_d2s)
    assert jax.tree_util.tree_structure(params_xla) \
        == jax.tree_util.tree_structure(params_d2s)
    assert all(np.array_equal(a, b) for a, b in zip(leaves_x, leaves_d))

    monkeypatch.setenv("MTBC_DECONV", "xla")
    out_xla = NNUNet2021(regions=1, widths=(4, 8, 8, 8, 8)).apply(
        {"params": params_xla}, x)
    monkeypatch.setenv("MTBC_DECONV", "d2s")
    out_d2s = model_d2s.apply({"params": params_xla}, x)
    for a, b in zip(out_xla, out_d2s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
