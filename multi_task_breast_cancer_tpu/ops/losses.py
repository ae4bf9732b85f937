"""Loss functions with exact reference semantics, as pure jnp functions.

Segmentation criteria reproduce the MONAI losses the reference factory builds
(``src/utils/experiment_init.py:199-232``), including smoothing constants,
``squared_pred`` and sigmoid placement — required for loss-curve parity.
Classification criteria reproduce ``src/utils/criterions.py:6-24`` (custom
focal) plus torch BCE/CE. Deep-supervision weighting reproduces
``src/utils/criterions.py:27-97`` (sum over heads, optional inverse weights
``1/(j+1)`` over *reversed* head order, so the finest head always weighs 1).

Layout note: all segmentation tensors are NHWC; spatial+channel reductions are
axes (1, 2) per (batch, channel) pair like MONAI's (B, C, spatial) reduction.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
SegOut = Union[Array, Tuple[Array, ...]]


# ---------------------------------------------------------------------------
# Segmentation losses (MONAI semantics)
# ---------------------------------------------------------------------------


def dice_loss(logits: Array, target: Array, *, sigmoid: bool = True,
              smooth_nr: float = 1.0, smooth_dr: float = 1.0,
              squared_pred: bool = True, jaccard: bool = False,
              reduction: str = "mean") -> Array:
    """MONAI ``DiceLoss(include_background=True, sigmoid, smooth_nr/dr,
    squared_pred)`` equivalent (reference default seg criterion,
    ``experiment_init.py:209-211``). NHWC in, scalar out."""
    p = jax.nn.sigmoid(logits) if sigmoid else logits
    axes = (1, 2)  # spatial; per-(batch, channel) statistics, like MONAI batch=False
    intersection = jnp.sum(p * target, axis=axes)
    if squared_pred:
        ground_o = jnp.sum(jnp.square(target), axis=axes)
        pred_o = jnp.sum(jnp.square(p), axis=axes)
    else:
        ground_o = jnp.sum(target, axis=axes)
        pred_o = jnp.sum(p, axis=axes)
    denominator = ground_o + pred_o
    if jaccard:
        denominator = 2.0 * (denominator - intersection)
    f = 1.0 - (2.0 * intersection + smooth_nr) / (denominator + smooth_dr)
    if reduction == "mean":
        return jnp.mean(f)
    if reduction == "sum":
        return jnp.sum(f)
    return f


def seg_focal_loss(logits: Array, target: Array, *, gamma: float = 2.0,
                   reduction: str = "mean") -> Array:
    """MONAI ``FocalLoss(include_background=True, use_softmax=False)``:
    per-pixel sigmoid focal BCE, numerically stable."""
    # BCE-with-logits: max(x,0) - x*t + log(1+exp(-|x|))
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p = jax.nn.sigmoid(logits)
    pt = jnp.where(target > 0.5, p, 1.0 - p)
    focal = jnp.power(1.0 - pt, gamma) * bce
    if reduction == "mean":
        return jnp.mean(focal)
    return jnp.sum(focal)


def bce_with_logits(logits: Array, target: Array) -> Array:
    """torch ``BCEWithLogitsLoss`` (mean reduction)."""
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(bce)


def generalized_dice_loss(logits: Array, target: Array, *, sigmoid: bool = True,
                          smooth_nr: float = 1e-5, smooth_dr: float = 1e-5) -> Array:
    """MONAI ``GeneralizedDiceLoss(include_background=True, sigmoid=True)``,
    square class weighting."""
    p = jax.nn.sigmoid(logits) if sigmoid else logits
    axes = (1, 2)
    intersection = jnp.sum(p * target, axis=axes)
    ground_o = jnp.sum(target, axis=axes)
    pred_o = jnp.sum(p, axis=axes)
    denominator = ground_o + pred_o
    w = 1.0 / jnp.square(ground_o)
    # MONAI replaces inf weights (empty ground truth) with the per-sample max
    # of the OTHER weights — infs are zeroed FIRST, then maxed, so a sample
    # whose every class is empty gets w=0 (finite 0 loss via the smooths),
    # not NaN. Order matters: taking the max before zeroing yields -inf/NaN
    # for all-empty samples (e.g. 'normal' BUSI images, mask all zero).
    infs = jnp.isinf(w)
    w = jnp.where(infs, 0.0, w)
    max_w = jnp.max(w, axis=-1, keepdims=True)
    w = jnp.where(infs, max_w, w)
    numer = 2.0 * jnp.sum(intersection * w, axis=-1) + smooth_nr
    denom = jnp.sum(denominator * w, axis=-1) + smooth_dr
    return jnp.mean(1.0 - numer / denom)


def dice_ce_loss(logits: Array, target: Array) -> Array:
    """MONAI ``DiceCELoss(include_background=True, sigmoid=True, squared_pred=True)``:
    dice + BCE-with-logits, equal weights."""
    return (dice_loss(logits, target, smooth_nr=1e-5, smooth_dr=1e-5, squared_pred=True)
            + bce_with_logits(logits, target))


def dice_focal_loss(logits: Array, target: Array) -> Array:
    """MONAI ``DiceFocalLoss(include_background=True, sigmoid=True, smooth_dr=1,
    smooth_nr=1, squared_pred=True)``: dice + focal, equal weights."""
    return (dice_loss(logits, target, smooth_nr=1.0, smooth_dr=1.0, squared_pred=True)
            + seg_focal_loss(logits, target))


_EDT_BIG = 1e9  # stand-in for "no zero in sight"; squares stay finite in f32


def _edt_binary(nonzero: Array) -> Array:
    """Exact Euclidean distance transform on device, scipy semantics:
    each nonzero pixel → distance to the nearest zero pixel; zeros → 0.

    Separable two-pass decomposition (Felzenszwalb/Meijster): per-column 1-D
    distance to the nearest zero via two min-plus ``lax.scan`` passes, then the
    exact row pass ``D²(i,j) = min_k g(i,k)² + (j-k)²`` evaluated as a
    ``lax.map`` over output columns so memory stays O(B·H·W) instead of
    O(B·H·W²). NHWC bool in, float32 out; fully jit-able, no host callbacks
    (the axon TPU runtime lacks ``pure_callback``).

    Degenerate all-nonzero input (no zero anywhere) is clamped to the image
    diagonal instead of scipy's boundary-anchored garbage values.
    """
    zero = jnp.logical_not(nonzero)
    zf = jnp.moveaxis(zero, 1, 0)  # (H, B, W, C), scan over rows

    def step(carry, z):
        d = jnp.where(z, 0.0, carry + 1.0)
        return d, d

    init = jnp.full(zf.shape[1:], _EDT_BIG, jnp.float32)
    _, fwd = jax.lax.scan(step, init, zf)
    _, bwd = jax.lax.scan(step, init, zf, reverse=True)
    g2 = jnp.square(jnp.moveaxis(jnp.minimum(fwd, bwd), 0, 1))  # (B,H,W,C)

    w = g2.shape[2]
    k = jnp.arange(w, dtype=jnp.float32)

    def col(j):
        par = jnp.square(k - j.astype(jnp.float32))  # (W,)
        return jnp.min(g2 + par[None, None, :, None], axis=2)  # (B,H,C)

    d2 = jax.lax.map(col, jnp.arange(w))  # (W, B, H, C)
    d2 = jnp.moveaxis(d2, 0, 2)  # (B, H, W, C)
    diag2 = float(g2.shape[1] ** 2 + w ** 2)
    return jnp.sqrt(jnp.minimum(d2, diag2))


def edt_field(mask: Array) -> Array:
    """MONAI ``HausdorffDTLoss.distance_field`` equivalent: ``edt(m) + edt(~m)``
    per (batch, channel), zeroed when the mask is empty (MONAI's ``m.any()``
    guard). Exact on every backend."""
    m = mask > 0.5
    field = _edt_binary(m) + _edt_binary(jnp.logical_not(m))
    nonempty = jnp.any(m, axis=(1, 2), keepdims=True)
    return jnp.where(nonempty, field, 0.0)


def hausdorff_dt_loss(logits: Array, target: Array, *, alpha: float = 2.0) -> Array:
    """MONAI ``HausdorffDTLoss(sigmoid=True)`` equivalent: (p-g)² weighted by
    exact Euclidean distance-transform fields of prediction and target (both
    stop-gradient, matching MONAI which computes the EDT on CPU). The EDT runs
    fully on device (:func:`edt_field`), so TPU loss values match MONAI to fp
    tolerance — no host callback, no Chebyshev approximation."""
    p = jax.nn.sigmoid(logits)
    dt_pred = edt_field(jax.lax.stop_gradient(p))
    dt_target = edt_field(jax.lax.stop_gradient(target))
    dist = jnp.power(dt_pred, alpha) + jnp.power(dt_target, alpha)
    return jnp.mean(jnp.square(p - target) * dist)


# ---------------------------------------------------------------------------
# Classification losses
# ---------------------------------------------------------------------------


def softmax_cross_entropy(logits: Array, target: Array,
                          weight: Optional[Array] = None) -> Array:
    """torch ``cross_entropy`` with probability targets (reduction='none'):
    per-sample ``-sum_c w_c · t_c · log_softmax(x)_c``. (B,C) in, (B,) out."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    if weight is not None:
        logp = logp * weight[None, :]
    return -jnp.sum(target * logp, axis=-1)


def focal_loss(logits: Array, target: Array, *, alpha: float = 1.0,
               gamma: float = 2.0, weight: Optional[Array] = None,
               reduction: str = "mean") -> Array:
    """Reference custom ``FocalLoss`` (``criterions.py:6-24``):
    ce → pt = exp(-ce) → mean(alpha·(1-pt)^gamma·ce)."""
    ce = softmax_cross_entropy(logits, target, weight)
    pt = jnp.exp(-ce)
    fl = alpha * jnp.power(1.0 - pt, gamma) * ce
    if reduction == "mean":
        return jnp.mean(fl)
    if reduction == "sum":
        return jnp.sum(fl)
    return fl


def cross_entropy_loss(logits: Array, target: Array,
                       weight: Optional[Array] = None) -> Array:
    """torch ``CrossEntropyLoss(reduction='mean')`` with prob targets.

    With class weights torch normalises by the summed weights of the targets;
    with probability targets it reduces by plain mean — replicated here."""
    return jnp.mean(softmax_cross_entropy(logits, target, weight))


def inverse_frequency_weights(class_frequencies: Sequence[float]) -> jnp.ndarray:
    """Normalised 1/frequency class weights (``experiment_init.py:243-250``)."""
    w = 1.0 / jnp.asarray(class_frequencies, dtype=jnp.float32)
    return w / jnp.sum(w)


# ---------------------------------------------------------------------------
# Criterion factories (names match the reference config vocabulary)
# ---------------------------------------------------------------------------

SEG_CRITERIA = ("DICE", "Hausdorff", "FocalDICE", "GeneralizedDICE",
                "CrossentropyDICE", "Jaccard", "FocalLoss", "BCE")


def init_criterion_segmentation(loss_function: str = "DICE") -> Callable[[Array, Array], Array]:
    """Equivalent of ``experiment_init.py:199-232``. All criteria apply sigmoid
    internally: models emit raw logits."""
    if loss_function == "DICE":
        return functools.partial(dice_loss, sigmoid=True, smooth_nr=1.0,
                                 smooth_dr=1.0, squared_pred=True)
    if loss_function == "Hausdorff":
        return hausdorff_dt_loss
    if loss_function == "FocalDICE":
        return dice_focal_loss
    if loss_function == "GeneralizedDICE":
        return generalized_dice_loss
    if loss_function == "CrossentropyDICE":
        return dice_ce_loss
    if loss_function == "Jaccard":
        return functools.partial(dice_loss, sigmoid=True, smooth_nr=1e-5,
                                 smooth_dr=1e-5, squared_pred=False,
                                 jaccard=True, reduction="sum")
    if loss_function == "FocalLoss":
        return seg_focal_loss
    if loss_function == "BCE":
        return bce_with_logits
    raise ValueError(f"Select a loss function allowed: {SEG_CRITERIA}")


def init_criterion_classification(n_classes: int = 2,
                                  classes_weighted: Optional[Sequence[float]] = None,
                                  classification_criterion: str = "CE"
                                  ) -> Callable[[Array, Array], Array]:
    """Equivalent of ``experiment_init.py:235-263``: BCE-with-logits for binary;
    focal or CE (optionally inverse-frequency weighted) for multiclass."""
    if n_classes == 2:
        return bce_with_logits
    weight = inverse_frequency_weights(classes_weighted) if classes_weighted else None
    if classification_criterion == "Focal":
        return functools.partial(focal_loss, alpha=1.0, gamma=2.0, weight=weight)
    return functools.partial(cross_entropy_loss, weight=weight)


# ---------------------------------------------------------------------------
# Deep-supervision application (criterions.py equivalents)
# ---------------------------------------------------------------------------


def apply_criterion_binary_segmentation(criterion, ground_truth: Array,
                                        segmentation: SegOut,
                                        inversely_weighted: bool = False) -> Array:
    """``criterions.py:27-49``: deep-supervision heads summed; with inverse
    weighting head j (finest-first) is scaled 1/(j+1)."""
    if isinstance(segmentation, (tuple, list)):
        heads = tuple(reversed(segmentation))  # finest first
        if inversely_weighted:
            return sum(criterion(s, ground_truth) / (j + 1) for j, s in enumerate(heads))
        return sum(criterion(s, ground_truth) for s in heads)
    return criterion(segmentation, ground_truth)


def apply_criterion_classification(criterion, label: Array,
                                   predicted_class: Union[Array, Tuple[Array, ...]]) -> Array:
    """``criterions.py:79-97``: list outputs summed (never inverse-weighted —
    reference quirk at ``:85-89``), else plain criterion."""
    if isinstance(predicted_class, (tuple, list)):
        return sum(criterion(c, label) for c in reversed(predicted_class))
    return criterion(predicted_class, label)


def apply_criterion_multitask(criterion_seg, ground_truth: Array, segmentation: SegOut,
                              criterion_cls, label: Array,
                              predicted_class: Union[Array, Tuple[Array, ...]],
                              inversely_weighted: bool = False) -> Tuple[Array, Array]:
    """``criterions.py:52-76``: returns (seg_loss, cls_loss). Cls-head lists are
    summed without inverse weights even when ``inversely_weighted`` (ref ``:64``)."""
    seg_loss = apply_criterion_binary_segmentation(
        criterion_seg, ground_truth, segmentation, inversely_weighted)
    cls_loss = apply_criterion_classification(criterion_cls, label, predicted_class)
    return seg_loss, cls_loss


def check_finite_loss(loss_value: float) -> None:
    """Host-side NaN guard: the reference hard-exits on NaN loss
    (``criterions.py:45-49``). Call once per epoch on the aggregated loss."""
    if not np.isfinite(loss_value):
        raise FloatingPointError("NaN in model loss!!")
