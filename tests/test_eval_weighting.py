"""Quantifies PARITY deviation D2: evaluating the whole validation split as
one batch vs the reference's mean over bs=2 batch losses.

The reference's CV val loader SHUFFLES every epoch
(``BUSI_dataloader.py:147``: ``DataLoader(batch_size, shuffle=True)``), so its
validation loss is itself a random estimator — the value depends on which
samples share a batch with the partial last batch. Exact parity is therefore
impossible in principle; the meaningful claim is that the whole-batch value
sits WITHIN the spread of the reference's own estimator across shuffles.

Measured here on heterogeneous data (including an empty-mask normal-class
sample, the realistic worst case): |whole − E[shuffled bs=2 estimator]| stays
within ~2 standard deviations of the estimator's own shuffle-to-shuffle
noise, for both the dice and the focal classification terms — i.e. the
deviation is smaller than the randomness the reference itself carries between
epochs."""

import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.ops.losses import dice_loss, focal_loss


def _shuffled_bs2_estimates(loss_fn, logits, target, n_shuffles=200, seed=99):
    """Distribution of the reference estimator: shuffle, batch by 2, mean of
    per-batch losses (``training_multitask.py:119-159`` semantics)."""
    rng = np.random.default_rng(seed)
    n = logits.shape[0]
    out = []
    for _ in range(n_shuffles):
        p = rng.permutation(n)
        lo, tg = logits[p], target[p]
        out.append(np.mean([float(loss_fn(lo[i:i + 2], tg[i:i + 2]))
                            for i in range(0, n, 2)]))
    return np.asarray(out)


def test_whole_batch_within_shuffled_bs2_noise_dice():
    rng = np.random.default_rng(0)
    n = 67  # realistic odd val-split size (4-fold CV on 449 images → ~68)
    logits = jnp.asarray(rng.normal(0, 2, (n, 32, 32, 1)), jnp.float32)
    target = np.asarray(rng.random((n, 32, 32, 1)) > 0.7, np.float32)
    target[5] = 0.0  # empty-GT normal-class image: the high-spread case
    target = jnp.asarray(target)

    whole = float(dice_loss(logits, target))
    est = _shuffled_bs2_estimates(dice_loss, np.asarray(logits), np.asarray(target))
    sigma = est.std()
    assert sigma > 0
    assert abs(whole - est.mean()) < 2 * sigma, (whole, est.mean(), sigma)
    assert est.min() - sigma <= whole <= est.max() + sigma


def test_whole_batch_within_shuffled_bs2_noise_focal_cls():
    rng = np.random.default_rng(1)
    n = 17
    logits = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    target = jnp.asarray(np.eye(3, dtype=np.float32)[rng.integers(0, 3, n)])

    whole = float(focal_loss(logits, target))
    est = _shuffled_bs2_estimates(focal_loss, np.asarray(logits), np.asarray(target))
    sigma = est.std()
    assert sigma > 0
    assert abs(whole - est.mean()) < 2 * sigma, (whole, est.mean(), sigma)
