"""Exact on-device EDT + Hausdorff-DT loss vs scipy/MONAI-formula oracles.

The reference uses MONAI ``HausdorffDTLoss(sigmoid=True)`` when
``loss.function: Hausdorff`` (``src/utils/experiment_init.py:213-214``); MONAI
computes the distance fields with ``scipy.ndimage.distance_transform_edt`` on
host. Our implementation runs the exact separable EDT fully on device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import distance_transform_edt

from multi_task_breast_cancer_tpu.ops.losses import (
    edt_field,
    hausdorff_dt_loss,
    init_criterion_segmentation,
)


def _oracle_field(mask: np.ndarray) -> np.ndarray:
    """MONAI distance_field: edt(m) + edt(~m) per (b, c), zero if m empty."""
    out = np.zeros_like(mask, dtype=np.float32)
    for b in range(mask.shape[0]):
        for c in range(mask.shape[-1]):
            m = mask[b, :, :, c] > 0.5
            if m.any():
                out[b, :, :, c] = distance_transform_edt(m) + distance_transform_edt(~m)
    return out


@pytest.mark.parametrize("shape", [(2, 16, 16, 1), (1, 33, 17, 1), (3, 8, 24, 2)])
def test_edt_field_matches_scipy(shape):
    rng = np.random.default_rng(0)
    mask = (rng.random(shape) > 0.7).astype(np.float32)
    got = np.asarray(jax.jit(edt_field)(jnp.asarray(mask)))
    np.testing.assert_allclose(got, _oracle_field(mask), rtol=1e-5, atol=1e-5)


def test_edt_field_structured_masks():
    """Blobs/strips — the realistic tumor-mask regime."""
    m = np.zeros((2, 32, 32, 1), np.float32)
    yy, xx = np.mgrid[0:32, 0:32]
    m[0, ((yy - 16) ** 2 + (xx - 10) ** 2) <= 36, 0] = 1  # disk
    m[1, 4:9, :, 0] = 1  # horizontal strip
    got = np.asarray(jax.jit(edt_field)(jnp.asarray(m)))
    np.testing.assert_allclose(got, _oracle_field(m), rtol=1e-5, atol=1e-5)


def test_edt_field_empty_mask_is_zero():
    m = np.zeros((1, 16, 16, 1), np.float32)
    got = np.asarray(edt_field(jnp.asarray(m)))
    assert (got == 0).all()


def test_edt_field_single_pixel():
    m = np.zeros((1, 16, 16, 1), np.float32)
    m[0, 5, 11, 0] = 1
    got = np.asarray(edt_field(jnp.asarray(m)))
    np.testing.assert_allclose(got, _oracle_field(m), rtol=1e-5, atol=1e-5)


def test_hausdorff_loss_matches_monai_formula():
    """Full loss vs a numpy re-statement of MONAI HausdorffDTLoss(sigmoid=True,
    alpha=2): mean((p-t)² · (dt_p² + dt_t²)) with scipy EDT fields."""
    rng = np.random.default_rng(7)
    logits = rng.normal(0, 3, (2, 24, 24, 1)).astype(np.float32)
    target = (rng.random((2, 24, 24, 1)) > 0.6).astype(np.float32)

    p = 1.0 / (1.0 + np.exp(-logits))
    dt_p = _oracle_field(p)
    dt_t = _oracle_field(target)
    expected = np.mean((p - target) ** 2 * (dt_p ** 2 + dt_t ** 2))

    got = float(jax.jit(hausdorff_dt_loss)(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_hausdorff_criterion_factory_and_grad():
    crit = init_criterion_segmentation("Hausdorff")
    logits = jnp.asarray(np.random.default_rng(3).normal(0, 1, (2, 16, 16, 1)),
                         jnp.float32)
    target = jnp.zeros((2, 16, 16, 1)).at[:, 4:8, 4:8, :].set(1.0)
    loss, grad = jax.value_and_grad(lambda x: crit(x, target))(logits)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0
