"""Golden parity against the reference's ACTUAL metric/criterion code,
imported in place from /root/reference (read-only, never copied).

The loss/metric suites already cross-check against independently re-stated
torch formulas; these tests remove even that indirection: the reference's own
``utils/metrics.py`` (numpy/scipy/sklearn) and ``utils/criterions.py``
(torch) run side by side with our implementations on identical inputs,
including the NaN / empty-mask edge conventions.
"""

from __future__ import annotations

import importlib.util
import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REF = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree not present")

torch = pytest.importorskip("torch")


def _ref(relpath: str):
    name = "refgold_" + relpath.replace("/", "_").replace(".py", "")
    if name not in sys.modules:
        spec = importlib.util.spec_from_file_location(name, REF / relpath)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules[name]


def _mask_cases():
    """Random + adversarial mask pairs covering every convention branch."""
    rng = np.random.default_rng(1993)
    h = 32
    cases = []
    for p_gt, p_seg in ((0.3, 0.3), (0.05, 0.6), (0.6, 0.05)):
        cases.append(((rng.random((h, h)) < p_gt).astype(np.uint8),
                      (rng.random((h, h)) < p_seg).astype(np.uint8)))
    zero = np.zeros((h, h), np.uint8)
    one = np.ones((h, h), np.uint8)
    blob = zero.copy()
    blob[4:10, 6:14] = 1
    cases += [(zero, zero),   # empty/empty: Dice=1, sens/prec NaN
              (zero, blob),   # empty GT, non-empty pred
              (blob, zero),   # non-empty GT, empty pred
              (blob, blob),   # perfect
              (blob, 1 - blob)]  # disjoint
    return cases, (one, one)


def test_calculate_metrics_matches_reference_exactly():
    """Per-image seg metrics (Hausdorff both-ways max, Dice, sens, spec,
    acc, Jaccard, precision) equal the reference's ``calculate_metrics``
    (``metrics.py:26-74``) value-for-value, NaN conventions included."""
    from multi_task_breast_cancer_tpu.ops.metrics import calculate_metrics
    ref = _ref("utils/metrics.py")

    cases, full_full = _mask_cases()
    for i, (gt, seg) in enumerate(cases):
        ours = calculate_metrics(gt, seg, i)
        theirs = ref.calculate_metrics(gt, seg, i)
        assert set(ours) == set(theirs)
        for key in theirs:
            a, b = ours[key], theirs[key]
            if isinstance(b, float) and math.isnan(b):
                assert isinstance(a, float) and math.isnan(a), (key, i, a, b)
            elif key != "patient_id":
                assert a == pytest.approx(b, rel=1e-9), (key, i, a, b)

    # all-tumor image: specificity divides 0/0 — the reference RAISES here
    # (metrics.py:193) and so do we, the same shared convention
    gt, seg = full_full
    with pytest.raises(ZeroDivisionError):
        ref.calculate_metrics(gt, seg, 99)
    with pytest.raises(ZeroDivisionError):
        calculate_metrics(gt, seg, 99)


def test_tensor_side_metrics_match_reference():
    """``dice_score_from_tensor`` / ``accuracy_from_tensor`` /
    ``f1_score_from_tensor`` (``metrics.py:255-286``) vs our device-side
    equivalents on the same batches."""
    import jax.numpy as jnp
    from multi_task_breast_cancer_tpu.ops import metrics as M
    ref = _ref("utils/metrics.py")

    rng = np.random.default_rng(3)
    gt = (rng.random((4, 16, 16, 1)) > 0.6).astype(np.float32)
    logits = rng.standard_normal((4, 16, 16, 1)).astype(np.float32)
    seg_bin = (1 / (1 + np.exp(-logits)) > 0.5).astype(np.float32)

    theirs = float(ref.dice_score_from_tensor(torch.tensor(gt),
                                              torch.tensor(seg_bin)))
    ours = float(M.dice_from_logits_batch(jnp.asarray(gt), jnp.asarray(logits)))
    assert ours == pytest.approx(theirs, rel=1e-5)

    # accuracy_from_tensor treats labels as booleans (logical_and), which is
    # equality-accuracy only for the binary 0/1 labels the reference feeds it
    y_true = rng.integers(0, 2, 64)
    y_pred = rng.integers(0, 2, 64)
    assert float(ref.accuracy_from_tensor(torch.tensor(y_true), torch.tensor(y_pred))) \
        == pytest.approx(float(np.mean(y_true == y_pred)))
    f1_theirs = float(ref.f1_score_from_tensor(torch.tensor(y_true),
                                               torch.tensor(y_pred)))
    from sklearn.metrics import f1_score as skl_f1
    assert f1_theirs == pytest.approx(float(skl_f1(y_true, y_pred)), rel=1e-9)


def test_focal_loss_matches_reference_module():
    """Our focal criterion vs the reference's ``FocalLoss`` class itself
    (``criterions.py:6-24``), α=1 γ=2, one-hot float targets."""
    import jax.numpy as jnp
    from multi_task_breast_cancer_tpu.ops.losses import init_criterion_classification
    crit_mod = _ref("utils/criterions.py")

    rng = np.random.default_rng(5)
    logits = rng.standard_normal((8, 3)).astype(np.float32)
    onehot = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)]

    theirs = float(crit_mod.FocalLoss(alpha=1.0, gamma=2.0)(
        torch.tensor(logits), torch.tensor(onehot)))
    ours_fn = init_criterion_classification(3, None, "Focal")
    ours = float(ours_fn(jnp.asarray(logits), jnp.asarray(onehot)))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_deep_supervision_weighting_matches_reference():
    """``apply_criterion_binary_segmentation``'s inverse weighting over
    reversed heads (``criterions.py:27-49``) vs ours, using BCE as the shared
    base criterion on both sides."""
    import jax.numpy as jnp
    from multi_task_breast_cancer_tpu.ops import losses as L
    crit_mod = _ref("utils/criterions.py")

    rng = np.random.default_rng(7)
    gt = (rng.random((2, 1, 16, 16)) > 0.6).astype(np.float32)
    heads = [rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
             for _ in range(4)]

    t_crit = torch.nn.BCEWithLogitsLoss()
    theirs = float(crit_mod.apply_criterion_binary_segmentation(
        t_crit, torch.tensor(gt), [torch.tensor(h) for h in heads],
        inversely_weighted=True))

    ours_crit = L.init_criterion_segmentation("BCE")
    gt_j = jnp.asarray(gt.transpose(0, 2, 3, 1))
    heads_j = tuple(jnp.asarray(h.transpose(0, 2, 3, 1)) for h in heads)
    ours = float(L.apply_criterion_binary_segmentation(
        ours_crit, gt_j, heads_j, inversely_weighted=True))
    assert ours == pytest.approx(theirs, rel=1e-5)

    # and the unweighted sum branch
    theirs_u = float(crit_mod.apply_criterion_binary_segmentation(
        t_crit, torch.tensor(gt), [torch.tensor(h) for h in heads],
        inversely_weighted=False))
    ours_u = float(L.apply_criterion_binary_segmentation(
        ours_crit, gt_j, heads_j, inversely_weighted=False))
    assert ours_u == pytest.approx(theirs_u, rel=1e-5)


def _ref_dataloader():
    """Import the reference's ``BUSI_dataloader.py`` in place.

    Its module-level ``from src.dataset.BUSI_dataset import BUSI`` pulls in
    torchvision (absent from this image), so that single import is stubbed;
    the oversampling functions under test never touch it.
    """
    import types
    for pkg in ("src", "src.dataset"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    stub = types.ModuleType("src.dataset.BUSI_dataset")
    stub.BUSI = object
    sys.modules.setdefault("src.dataset.BUSI_dataset", stub)
    return _ref("dataset/BUSI_dataloader.py")


class _P1Series(pd.Series):
    """Series restoring pandas<2 ``value_counts`` naming semantics.

    The reference's ``compute_scaling_factor`` (``BUSI_dataloader.py:321-325``)
    does ``value_counts(normalize=True).reset_index()`` and then reads columns
    ``'index'`` / ``'class'`` — the pandas-1.x layout (result Series keeps the
    ORIGINAL series name, index unnamed). pandas≥2 renamed these to
    ``'class'`` / ``'proportion'``, which is why the reference function cannot
    run unmodified under the image's pandas 3. Restoring only that naming rule
    lets the reference's own code execute verbatim.
    """

    @property
    def _constructor(self):
        return _P1Series

    @property
    def _constructor_expanddim(self):
        return _P1DataFrame

    def value_counts(self, *args, **kwargs):
        out = pd.Series(self).value_counts(*args, **kwargs)
        out = out.rename(self.name)
        out.index.name = None
        return _P1Series(out)


class _P1DataFrame(pd.DataFrame):
    @property
    def _constructor(self):
        return _P1DataFrame

    @property
    def _constructor_sliced(self):
        return _P1Series


def test_deterministic_oversampling_matches_reference_code():
    """Row-for-row parity with the reference's ACTUAL
    ``deterministic_oversampling`` (``BUSI_dataloader.py:319-339``) — not just
    its derived golden factors. Covers the curated-BUSI class counts, a clean
    2/4/4-factor case, and the factor==1 majority-extra-copy quirk branch."""
    from multi_task_breast_cancer_tpu.data.splits import deterministic_oversampling
    ref = _ref_dataloader()

    class_mixes = [
        ["benign"] * 222 + ["malignant"] * 164 + ["normal"] * 64,  # curated BUSI
        ["benign"] * 20 + ["malignant"] * 10 + ["normal"] * 10,    # factors 2/4/4
        ["benign"] * 90 + ["malignant"] * 10,                      # factor-1 quirk
    ]
    for classes in class_mixes:
        m = pd.DataFrame({"class": classes, "id": range(len(classes))})
        theirs = ref.deterministic_oversampling(_P1DataFrame(m.copy()))
        ours = deterministic_oversampling(m.copy())
        # identical rows in identical order (both emit ignore_index frames)
        assert list(ours["class"]) == list(theirs["class"])
        assert list(ours["id"]) == list(theirs["id"])


def test_legacy_oversampling_matches_reference_code():
    """``oversampling_busi`` vs the reference's ``oversampling_BUSI``
    (``BUSI_dataloader.py:305-317``): same pandas ``.sample`` draws at the
    same seed ⇒ identical rows AND identical duplicated index labels."""
    from multi_task_breast_cancer_tpu.data.splits import oversampling_busi
    ref = _ref_dataloader()

    # NB: the malignant top-up samples WITHOUT replacement (both sides), so
    # the mix must satisfy n_ben - n_mal <= n_mal — a shared constraint.
    classes = (["benign"] * 20 + ["malignant"] * 12 + ["normal"] * 7)
    m = pd.DataFrame({"class": classes, "id": range(len(classes))})
    m = m.sample(frac=1.0, random_state=7)  # shuffled input order
    for seed in (1993, 42):
        theirs = ref.oversampling_BUSI(m.copy(), seed)
        ours = oversampling_busi(m.copy(), seed)
        assert list(ours["id"]) == list(theirs["id"])
        assert list(ours.index) == list(theirs.index)



def test_multiclass_seg_metrics_match_reference():
    """Per-region multiclass seg metrics (``metrics.py:77-129``) — same
    region loop, same conventions."""
    from multi_task_breast_cancer_tpu.ops.metrics import (
        calculate_metrics_multiclass_segmentation)
    ref = _ref("utils/metrics.py")

    rng = np.random.default_rng(11)
    gt = rng.integers(0, 3, (32, 32))
    seg = rng.integers(0, 3, (32, 32))
    ours = calculate_metrics_multiclass_segmentation(gt, seg, 0)
    theirs = ref.calculate_metrics_multiclass_segmentation(gt, seg, 0)
    assert set(ours) == set(theirs)
    for key in theirs:
        if key == "patient_id":
            continue
        a, b = np.asarray(ours[key], float), np.asarray(theirs[key], float)
        both_nan = np.isnan(a) & np.isnan(b)
        assert np.all(both_nan | np.isclose(a, b, rtol=1e-9, equal_nan=True)), key
