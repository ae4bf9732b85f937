"""Shape/structure tests for the model zoo — the systematic version of the
reference's per-file ``__main__`` smoke blocks (e.g. ``BTS_UNet.py:158-182``):
build each model on a random (1,128,128,1) input, run forward, check shapes.
"""

import jax
import jax.numpy as jnp
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
