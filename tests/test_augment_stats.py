"""Statistical checks of the augmentation pipeline: flip probabilities ~0.5
and rotation behaviour match the torchvision pipeline the reference builds
(HFlip(p=.5) → VFlip(p=.5) → RandomRotation(360) always rotating)."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.data.augment import joint_transform_single


def _marker_image(h=16, w=16):
    """Asymmetric marker: a single bright pixel off-centre."""
    img = np.zeros((h, w, 1), np.float32)
    img[2, 3, 0] = 1.0
    return jnp.asarray(img)


def test_flip_rates_without_rotation():
    img = np.zeros((8, 8, 1), np.float32)
    img[0, 0, 0] = 1.0  # corner marker
    img = jnp.asarray(img)
    n = 400
    h_flips = v_flips = 0
    for i in range(n):
        out = np.asarray(joint_transform_single(
            img, jax.random.PRNGKey(i), enable_rotation=False))
        y, x, _ = np.unravel_index(out.argmax(), out.shape)
        if x == 7:
            h_flips += 1
        if y == 7:
            v_flips += 1
    assert 0.4 < h_flips / n < 0.6
    assert 0.4 < v_flips / n < 0.6


def test_rotation_always_applied_and_angle_spread():
    """With max_angle=360 the marker should land all around the centre."""
    img = _marker_image()
    positions = set()
    for i in range(60):
        out = np.asarray(joint_transform_single(
            img, jax.random.PRNGKey(1000 + i), p_hflip=0.0, p_vflip=0.0))
        if out.max() > 0:  # marker may rotate out of frame at corners
            positions.add(np.unravel_index(out.argmax(), out.shape)[:2])
    # many distinct landing positions ⇒ angles genuinely spread over the circle
    assert len(positions) > 20


def test_mask_values_stay_binary():
    rng = np.random.default_rng(0)
    stack = jnp.asarray((rng.random((32, 32, 2)) > 0.5).astype(np.float32))
    out = np.asarray(joint_transform_single(stack, jax.random.PRNGKey(3)))
    assert set(np.unique(out)) <= {0.0, 1.0}


def test_batched_transform_matches_vmapped_single():
    """joint_transform_stack_batch (one global gather) must equal
    vmap(joint_transform_single) bit-for-bit."""
    import functools
    from multi_task_breast_cancer_tpu.data.augment import (
        joint_transform_stack_batch,
    )
    rng = np.random.default_rng(5)
    stack = jnp.asarray(rng.random((16, 32, 32, 2)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(9), 16)
    single = jax.vmap(functools.partial(joint_transform_single))(stack, keys)
    batched = joint_transform_stack_batch(stack, keys)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(batched))
