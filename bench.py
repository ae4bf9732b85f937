"""Benchmark: training throughput (imgs/sec/chip) of the flagship multitask
model (MTnnUNet, the reference config default) on Curated-BUSI-shaped data
(128×128 grayscale), including on-device joint augmentation — the full hot
path of ``training_multitask``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes no throughput numbers
(BASELINE.md). ``vs_baseline`` is computed against an assumed A100 PyTorch
baseline of 200 imgs/s — a generous estimate for the reference's actual
training loop (batch size 2, per-batch H2D copies and per-batch ``.item()``
syncs, ``src/training_multitask.py:82,99,107-113``), whose wall-clock is
dominated by those syncs rather than compute.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.models import init_multitask_model
from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig, plan_epoch_indices
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state

ASSUMED_A100_PYTORCH_BASELINE_IMGS_PER_SEC = 200.0


def main() -> None:
    from multi_task_breast_cancer_tpu.utils.miscellany import enable_compilation_cache
    enable_compilation_cache()
    n_devices = jax.device_count()
    batch_per_chip = 256  # measured sweet spot on TPU v5e (1292 imgs/s/chip)
    batch = batch_per_chip * n_devices
    H = 128
    n = max(4 * batch, 1024)

    rng = np.random.default_rng(0)
    ds = ArrayDataset(
        images=(rng.random((n, H, H, 1)) * 255).astype(np.float32),
        masks=(rng.random((n, H, H, 1)) > 0.8).astype(np.float32),
        labels=rng.integers(0, 3, n).astype(np.int32),
        patient_ids=np.arange(n),
        class_names=["benign"] * n,
        tumor_pixels=np.zeros(n, np.int64),
    )

    model = init_multitask_model("MTnnUNet", n_classes=3)
    tx = init_optimizer("Adam", 1e-4)
    from multi_task_breast_cancer_tpu.parallel.mesh import data_mesh
    mesh = data_mesh()
    cfg = EngineConfig(task="multitask", n_classes=3, batch_size=batch,
                      alpha=0.35, inversely_weighted=True,
                      compute_dtype="bfloat16")
    engine = Engine(model, tx, cfg, mesh=mesh)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, H, 1)))
    data = engine.device_data(ds)

    host_rng = np.random.default_rng(1)
    steps_per_epoch = n // batch

    # warmup (compile)
    perm = plan_epoch_indices(n, batch, host_rng)
    state, _ = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))

    # timed epochs: dispatch back-to-back through the jitted epoch fn and
    # fetch metrics once at the end (steady-state throughput; the per-epoch
    # metric fetch is an RPC round-trip on tunnel runtimes)
    n_epochs = 5
    t0 = time.perf_counter()
    metrics = None
    for e in range(n_epochs):
        perm = plan_epoch_indices(n, batch, host_rng)
        state, metrics = engine._train_epoch(
            state, data["images"], data["masks"], data["cls_targets"],
            data["labels_int"], jnp.asarray(perm), jax.random.PRNGKey(2 + e))
    final_loss = float(metrics["loss"])  # forces materialisation of all work
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    total_imgs = n_epochs * steps_per_epoch * batch
    imgs_per_sec = total_imgs / dt
    imgs_per_sec_per_chip = imgs_per_sec / n_devices

    print(json.dumps({
        "metric": "train imgs/sec/chip (MTnnUNet multitask, 128x128, bf16)",
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip
                             / ASSUMED_A100_PYTORCH_BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
