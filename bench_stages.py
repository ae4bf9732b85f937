"""Per-stage attribution of the flagship's no-augmentation ceiling
(VERDICT r04 weak-2: the "memory-bound" claim rested on aggregate evidence —
this harness produces the ms/step-per-stage table).

jax.profiler traces are unavailable on the axon tunnel runtime, so stages
are attributed by TIMING TRUNCATED VARIANTS of the same training step
(B=256, 128², bf16, no augmentation, uint8 HBM storage — the exact ceiling
configuration bench.py measures):

1. ``encoder``      — nnU-Net encoder + bottleneck, MSE probe loss
2. ``backbone``     — + full decoder (NNUNetBackbone), MSE probe loss
3. ``seg``          — + 4 deep-supervision heads + fused-dice DS loss
                      (= NNUNet2021 through the production Engine)
4. ``multitask``    — + classification head + focal + α-mix
                      (= MTnnUNet, the ceiling step itself)
5. ``forward_only`` — MTnnUNet inference forward (fwd : fwd+bwd+opt split)

Consecutive deltas attribute step time to decoder / DS-heads+loss /
cls-head. Resolution scaling (64² vs 128² at equal batch) separates
pixel-proportional (HBM-traffic) cost from fixed cost. One structural
optimization attempt is measured A/B and recorded win-or-lose: padding the
C=1 stem input to 8 zero channels (the TPU conv stem must pad C=1 to a
lane granule anyway; feeding real 8-channel zeros tests whether XLA's
im2col handles it better).

Methodology per CLAUDE.md: every arm re-ramps after its compile (2-epoch
windows until <5% drift — the tunnel chip drops its power state during
compile gaps, measured 3.5x), and every timing fetches a value (float())
to force materialization. Run on TPU: ``python bench_stages.py`` →
``STAGES_r05.json`` (~15 min warm; first run compiles ~6 programs).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.models import init_multitask_model
from multi_task_breast_cancer_tpu.models.blocks import LevelBlock, max_pool_2x2
from multi_task_breast_cancer_tpu.models.nnunet import (
    NNUNET_WIDTHS, NNUNetBackbone, NNUNet2021)
from multi_task_breast_cancer_tpu.train.loop import (
    Engine, EngineConfig, plan_epoch_indices)
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state

H = int(os.environ.get("MTBC_STAGES_SIZE", 128))
B = int(os.environ.get("MTBC_STAGES_BATCH", 256))
N = int(os.environ.get("MTBC_STAGES_N", 1024))
N_EPOCHS = int(os.environ.get("MTBC_STAGES_EPOCHS", 5))


class EncoderOnly(nn.Module):
    """nnU-Net encoder + bottleneck (same blocks/names as NNUNetBackbone)."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        w = NNUNET_WIDTHS
        e = LevelBlock(w[0], w[0], name="encoder1")(x)
        for i in (1, 2, 3, 4):
            e = LevelBlock(w[i], w[i], name=f"encoder{i + 1}")(max_pool_2x2(e))
        return LevelBlock(w[4], w[4], name="bottleneck")(max_pool_2x2(e))


class BackboneOnly(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return NNUNetBackbone(name="backbone")(x)["d1"]


def _dataset(rng, h=H, c=1):
    return ArrayDataset(
        images=rng.integers(0, 256, (N, h, h, c)).astype(np.float32),
        masks=(rng.random((N, h, h, 1)) > 0.8).astype(np.float32),
        labels=rng.integers(0, 3, N).astype(np.int32),
        patient_ids=np.arange(N), class_names=["benign"] * N,
        tumor_pixels=np.zeros(N, np.int64))


def make_probe_epoch(model, h=H, c=1):
    """Scan-epoch for probe models (MSE loss on the truncated output) that
    mirrors the Engine step exactly: uint8 HBM gather → bf16 cast → fwd →
    bwd → Adam(eps=1e-4) update, one jitted lax.scan per epoch."""
    tx = optax.adam(1e-4, eps=1e-4)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, h, h, c), jnp.bfloat16))["params"]
    opt_state = tx.init(params)

    def loss_fn(params, imgs):
        bf = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)
        out = model.apply({"params": bf}, imgs)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    @jax.jit
    def epoch(params, opt_state, images_u8, perm):
        idx = perm.reshape(-1, B)

        def body(carry, bidx):
            params, opt_state, s = carry
            imgs = jnp.take(images_u8, bidx, axis=0).astype(jnp.bfloat16)
            loss, grads = jax.value_and_grad(loss_fn)(params, imgs)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    s + loss), None

        (params, opt_state, s), _ = jax.lax.scan(
            body, (params, opt_state, jnp.zeros(())), idx)
        return params, opt_state, s

    return params, opt_state, epoch


def steady_rate(run_one_epoch, n=N) -> float:
    """Ramp (2-epoch windows until <5% drift) then time N_EPOCHS; one
    materializing fetch per window (bench.py's arm methodology)."""
    prev = 0.0
    for _w in range(15):
        t0 = time.perf_counter()
        v = None
        for _e in range(2):
            v = run_one_epoch()
        _ = float(v)
        rate = 2 * n / (time.perf_counter() - t0)
        if prev and abs(rate - prev) / rate < 0.05:
            break
        prev = rate
    t0 = time.perf_counter()
    for _e in range(N_EPOCHS):
        v = run_one_epoch()
    _ = float(v)
    return N_EPOCHS * n / (time.perf_counter() - t0)


def probe_rate(model, h=H, c=1) -> float:
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (N, h, h, c)), jnp.uint8)
    params, opt_state, epoch = make_probe_epoch(model, h, c)
    box = {"params": params, "opt": opt_state, "e": 0}

    def one():
        perm = jnp.asarray(plan_epoch_indices(N, B, rng))
        box["e"] += 1
        box["params"], box["opt"], s = epoch(box["params"], box["opt"],
                                             images, perm)
        return s

    return steady_rate(one)


def engine_rate(task: str, model, h=H, c=1) -> float:
    rng = np.random.default_rng(0)
    ds = _dataset(np.random.default_rng(1), h, c)
    tx = init_optimizer("Adam", 1e-4)
    engine = Engine(model, tx, EngineConfig(
        task=task, n_classes=3, batch_size=B, alpha=0.35,
        inversely_weighted=True, compute_dtype="bfloat16",
        use_transforms=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, h, h, c)))
    data = engine.device_data(ds)
    box = {"state": state, "e": 0}

    def one():
        perm = plan_epoch_indices(N, B, rng)
        box["e"] += 1
        box["state"], m = engine._train_epoch(
            box["state"], data["images"], data["masks"], data["cls_targets"],
            data["labels_int"], jnp.asarray(perm),
            jax.random.PRNGKey(10 + box["e"]))
        return m["loss"]

    return steady_rate(one)


def forward_rate(model, h=H, c=1) -> float:
    tx = init_optimizer("Adam", 1e-4)
    engine = Engine(model, tx, EngineConfig(
        task="multitask", n_classes=3, batch_size=B,
        compute_dtype="bfloat16", use_transforms=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, h, h, c)))
    x = jnp.asarray(np.random.default_rng(2).integers(0, 256, (B, h, h, c)),
                    jnp.bfloat16)

    def one():
        out = None
        for _ in range(N // B):  # same imgs/epoch as the train arms
            out = engine._predict(state, x)
        return jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32)

    return steady_rate(one)


def main() -> None:
    from multi_task_breast_cancer_tpu.utils.miscellany import enable_compilation_cache
    enable_compilation_cache()

    rates = {}
    t_wall = time.perf_counter()
    # ordered coarse→full so each arm's compile gap is followed by its own ramp
    rates["encoder"] = probe_rate(EncoderOnly())
    print("encoder", round(rates["encoder"], 1), flush=True)
    rates["backbone"] = probe_rate(BackboneOnly())
    print("backbone", round(rates["backbone"], 1), flush=True)
    rates["seg"] = engine_rate("segmentation", NNUNet2021(regions=1))
    print("seg", round(rates["seg"], 1), flush=True)
    mt_model = init_multitask_model("MTnnUNet", n_classes=3)
    rates["multitask"] = engine_rate("multitask", mt_model)
    print("multitask", round(rates["multitask"], 1), flush=True)
    rates["forward_only"] = forward_rate(mt_model)
    print("forward_only", round(rates["forward_only"], 1), flush=True)
    # resolution scaling: pixel-proportional vs fixed cost
    rates["multitask_half_res"] = engine_rate("multitask", mt_model, h=H // 2)
    print("multitask_half_res", round(rates["multitask_half_res"], 1),
          flush=True)
    # ONE structural attempt: stem C=1 → 8 zero channels (params differ in
    # the first conv only; measured win-or-lose, never a default change)
    stem8 = init_multitask_model("MTnnUNet", n_classes=3)
    rates["multitask_stem8"] = engine_rate("multitask", stem8, c=8)
    print("multitask_stem8", round(rates["multitask_stem8"], 1), flush=True)

    ms = {k: round(B / v * 1e3, 3) for k, v in rates.items()}  # ms per B=256 step
    stages = {
        "encoder+bottleneck": ms["encoder"],
        "decoder": round(ms["backbone"] - ms["encoder"], 3),
        "ds_heads+dice_loss": round(ms["seg"] - ms["backbone"], 3),
        "cls_head+focal": round(ms["multitask"] - ms["seg"], 3),
    }
    total = ms["multitask"]
    out = {
        "metric": "per-stage attribution of the no-augmentation ceiling",
        "platform": jax.devices()[0].platform,
        "config": {"size": H, "batch": B, "dtype": "bfloat16",
                   "storage": "uint8", "epochs_timed": N_EPOCHS},
        "imgs_per_sec_per_chip": {k: round(v, 1) for k, v in rates.items()},
        "ms_per_step_B256": ms,
        "stage_ms": stages,
        "stage_fraction_of_full_step": {
            k: round(v / total, 3) for k, v in stages.items()},
        "fwd_fraction_of_full_step": round(
            ms["forward_only"] / total, 3),
        "resolution_scaling_full_over_half": round(
            ms["multitask"] / ms["multitask_half_res"], 2),
        "pixels_ratio_full_over_half": 4.0,
        "stem8_structural_attempt": {
            "ms_per_step": ms["multitask_stem8"],
            "delta_vs_baseline_ms": round(
                ms["multitask_stem8"] - ms["multitask"], 3),
            "note": "C=1 stem padded to 8 zero input channels (first-conv "
                    "params differ; probe only)"},
        "wall_s": round(time.perf_counter() - t_wall, 1),
    }
    Path("STAGES_r05.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
