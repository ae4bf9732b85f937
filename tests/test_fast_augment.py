"""Fast-augmentation (3-shear Pallas) correctness:

1. the fixed-pipeline canonicalization is BIT-EXACT vs the sequential op list
   (hflip → vflip → quadrant + 3-shear) for all 16 dihedral cases × angles;
2. the Pallas kernel (interpret mode) equals the pure-jnp executor;
3. pack/unpack round-trips bf16 exactly;
4. semantics vs the exact torchvision-parity rotation: same flip/angle draws,
   resampling differs only at boundary pixels (mask Dice ≥ 0.97).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_task_breast_cancer_tpu.ops import fast_augment as FA

W = 64
C_MID = (W - 1) / 2.0


# ---- sequential reference (ground-truth semantics of the fast path) --------

def _sx(img, a):
    out = np.zeros_like(img)
    for y in range(img.shape[0]):
        s = int(np.round(a * (y - C_MID)))
        xs = np.arange(img.shape[1]) - s
        ok = (xs >= 0) & (xs < img.shape[1])
        out[y, ok] = img[y, xs[ok]]
    return out


def _sequential(img, fh, fv, angle):
    out = img
    if fh:
        out = img[:, ::-1].copy()
    if fv:
        out = out[::-1, :].copy()
    ang = ((angle + 180.0) % 360.0) - 180.0
    q = int(np.round(ang / 90.0)) % 4
    phi = ang - 90.0 * int(np.round(ang / 90.0))
    a = np.tan(np.deg2rad(phi) / 2.0)
    b = -np.sin(np.deg2rad(phi))
    out = _sx(out, a)
    out = _sx(out.T.copy(), b).T.copy()
    out = _sx(out, a)
    for _ in range(q):
        out = out[:, ::-1].T.copy()  # ccw90 = lane-reverse then transpose
    return out


def test_pipeline_params_bit_exact_vs_sequential():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 1 << 30, (W, W)).astype(np.int32)
    angles = list(rng.uniform(-360, 360, 6)) + [0.0, 90.0, -135.0, 181.0]
    for fh in (False, True):
        for fv in (False, True):
            for ang in angles:
                idx, t1 = FA.pipeline_params_from_draws(
                    jnp.asarray([fh]), jnp.asarray([fv]),
                    jnp.asarray([ang], jnp.float32), W)
                got = np.asarray(FA.reference_pipeline(
                    jnp.asarray(img)[None], idx, t1))[0]
                want = _sequential(img, fh, fv, ang)
                np.testing.assert_array_equal(got, want,
                                              err_msg=f"fh={fh} fv={fv} ang={ang}")


def test_pallas_interpret_matches_reference():
    rng = np.random.default_rng(1)
    n, b = 8, 6
    packed = jnp.asarray(rng.integers(0, 1 << 30, (n, W, W)), jnp.int32)
    batch_idx = jnp.asarray(rng.integers(0, n, b), jnp.int32)
    idx, t1 = FA.build_pipeline_params(jax.random.PRNGKey(3), b, W,
                                       p_hflip=0.5, p_vflip=0.5,
                                       max_angle=360.0)
    ref = FA.reference_pipeline(jnp.take(packed, batch_idx, axis=0), idx, t1)
    pal = FA.pallas_pipeline(packed, batch_idx, idx, t1, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(pal))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(2)
    stack = jnp.asarray(rng.standard_normal((4, W, W, 2)), jnp.bfloat16)
    out = FA.unpack_bf16x2(FA.pack_bf16x2(stack))
    np.testing.assert_array_equal(np.asarray(stack, np.float32),
                                  np.asarray(out, np.float32))


def test_fast_vs_exact_semantics_mask_dice():
    """Same key → same flips/angle draws; the only difference is rotation
    resampling. On an elliptical mask the two must agree to Dice ≥ 0.97."""
    from multi_task_breast_cancer_tpu.data.augment import joint_transform_stack_batch

    yy, xx = np.mgrid[0:W, 0:W]
    mask = ((((yy - 36) / 13.0) ** 2 + ((xx - 24) / 17.0) ** 2) <= 1)
    img = np.where(mask, 60.0, 140.0)
    stack = np.stack([mask.astype(np.float32), img], axis=-1)[None]  # (1,W,W,2)
    stack_b = jnp.asarray(np.repeat(stack, 16, axis=0), jnp.bfloat16)
    packed = FA.pack_bf16x2(stack_b)

    key = jax.random.PRNGKey(11)
    exact = joint_transform_stack_batch(
        stack_b.astype(jnp.float32), jax.random.split(key, 16))
    fast = FA.fast_joint_transform(packed, jnp.arange(16), key,
                                   use_pallas=False)
    em = np.asarray(exact[..., 0] > 0.5)
    fm = np.asarray(fast[..., 0].astype(np.float32) > 0.5)
    for i in range(16):
        inter = np.logical_and(em[i], fm[i]).sum()
        denom = em[i].sum() + fm[i].sum()
        if denom == 0:
            continue  # both rotated fully out of frame
        dice = 2.0 * inter / denom
        assert dice >= 0.97, (i, dice)


def test_fast_flip_rates():
    """Flip draws use the exact path's key-split scheme → rates ~ p."""
    rng = np.random.default_rng(4)
    img = np.zeros((W, W, 2), np.float32)
    img[2, 3, :] = 1.0
    packed = FA.pack_bf16x2(jnp.asarray(img, jnp.bfloat16)[None])
    n, h_flips = 200, 0
    for i in range(n):
        out = FA.fast_joint_transform(
            packed, jnp.zeros(1, jnp.int32), jax.random.PRNGKey(i),
            p_hflip=0.5, p_vflip=0.0, max_angle=0.0, use_pallas=False)
        o = np.asarray(out[0, :, :, 0].astype(np.float32))
        if o.max() > 0 and np.unravel_index(o.argmax(), o.shape)[1] == W - 4:
            h_flips += 1
    assert 0.35 < h_flips / n < 0.65


def test_fast_augmentation_through_driver(tmp_path):
    """training.fast_augmentation runs end-to-end under the full driver (the
    kernel auto-falls back to the jnp executor off-TPU) and produces the
    normal artifact tree."""
    from pathlib import Path
    from multi_task_breast_cancer_tpu.config import (
        Config, DataConfig, ModelConfig, OptimizerConfig, TrainingConfig)
    from multi_task_breast_cancer_tpu.data import synthetic
    from multi_task_breast_cancer_tpu.train.driver import run_experiment

    root = synthetic.make_preprocessed_busi(tmp_path / "busi", n_per_class=8,
                                            size=32)
    cfg = Config(
        model=ModelConfig(architecture="Multi_BTSUNet", width=4,
                          deep_supervision=False),
        optimizer=OptimizerConfig(opt="Adam", lr=1e-3, scheduler="plateau"),
        training=TrainingConfig(seed=1993, epochs=1, CV=2,
                                compute_dtype="bfloat16",
                                fast_augmentation=True, data_parallel=False),
        data=DataConfig(input_img=str(root), batch_size=4, oversampling=False),
    )
    run = Path(run_experiment(cfg, task="multitask", mode="CV",
                              run_root=str(tmp_path / "runs")))
    assert (run / "fold_1" / "results_segmentation.csv").is_file()
    import pandas as pd
    m = pd.read_csv(run / "fold_0" / "metrics.csv")
    assert np.isfinite(m["Train_loss"]).all()


def test_default_on_indivisible_batch_degrades_to_exact(tmp_path, caplog):
    """fast_augmentation defaults ON since round 5 — a batch_size that does
    not divide the data-mesh axis (reference configs use batch 2; the CPU
    test mesh has 8 devices) must degrade gracefully in the DRIVER to the
    exact-parity gather with a warning, not hard-fail out of the box. The
    Engine constructed directly keeps the strict ValueError contract
    (test_fast_augmentation_mesh_batch_divisibility)."""
    import logging
    from pathlib import Path
    from multi_task_breast_cancer_tpu.config import (
        Config, DataConfig, ModelConfig, OptimizerConfig, TrainingConfig)
    from multi_task_breast_cancer_tpu.data import synthetic
    from multi_task_breast_cancer_tpu.train.driver import run_experiment

    root = synthetic.make_preprocessed_busi(tmp_path / "busi", n_per_class=8,
                                            size=32)
    cfg = Config(
        model=ModelConfig(architecture="BTSUNet", width=4,
                          deep_supervision=False),
        optimizer=OptimizerConfig(opt="Adam", lr=1e-3, scheduler="plateau"),
        # defaults: fast_augmentation=True, data_parallel=True (8-dev mesh)
        training=TrainingConfig(seed=1993, epochs=1, CV=2),
        data=DataConfig(input_img=str(root), batch_size=4, oversampling=False),
    )
    assert cfg.training.fast_augmentation  # the round-5 default
    with caplog.at_level(logging.WARNING):
        run = Path(run_experiment(cfg, task="segmentation", mode="CV",
                                  run_root=str(tmp_path / "runs")))
    # the driver logs through init_log's file handler — assert on the run's
    # execution.log (the user-visible record), not handler propagation
    log_text = (run / "execution.log").read_text()
    assert "fast_augmentation disabled" in log_text
    assert (run / "fold_1" / "results_segmentation.csv").is_file()


@pytest.mark.parametrize("w", [64, 128, 256])
def test_kernel_widths_interpret_parity(w):
    """The kernel must handle lane widths past one vreg: W>128 gathers are
    lane-blocked into nb² single-vreg gathers (Mosaic rejects multi-vreg
    gather sources: 'Multiple source vregs along gather dimension' at
    W=256, reproduced on hardware). Blocked ⇒ bit-identical to the plain
    executor; also verified on the real chip at W=256."""
    rng = np.random.default_rng(w)
    stack = jnp.asarray(rng.standard_normal((5, w, w, 2)), jnp.bfloat16)
    packed = FA.pack_bf16x2(stack)
    bidx = jnp.asarray(rng.integers(0, 5, 4), jnp.int32)
    key = jax.random.PRNGKey(3)
    ref = FA.fast_joint_transform(packed, bidx, key, use_pallas=False)
    fast = FA.fast_joint_transform(packed, bidx, key, use_pallas=True,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(fast, np.float32))


def test_non_vreg_multiple_width_falls_back():
    """Widths that are neither ≤128 nor a multiple of 128 can't use the
    lane-blocked kernel; _execute silently uses the (semantics-identical)
    jnp executor instead of failing Mosaic compilation."""
    rng = np.random.default_rng(1)
    w = 160
    stack = jnp.asarray(rng.standard_normal((3, w, w, 2)), jnp.bfloat16)
    packed = FA.pack_bf16x2(stack)
    bidx = jnp.asarray([0, 2], jnp.int32)
    key = jax.random.PRNGKey(5)
    ref = FA.fast_joint_transform(packed, bidx, key, use_pallas=False)
    fast = FA.fast_joint_transform(packed, bidx, key, use_pallas=True,
                                   interpret=True)  # kernel_ok=False → jnp
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(fast, np.float32))


def test_fast_joint_transform_mesh_parity():
    """Data-parallel execution (shard_map over 'data') must be bit-identical
    to the single-device path: the draws happen once outside the shard_map
    and each device augments its own B/n slice of the same parameters."""
    from multi_task_breast_cancer_tpu.parallel.mesh import data_mesh

    rng = np.random.default_rng(7)
    stack = jnp.asarray(rng.standard_normal((10, W, W, 2)), jnp.bfloat16)
    packed = FA.pack_bf16x2(stack)
    bidx = jnp.asarray(rng.integers(0, 10, 16), jnp.int32)
    key = jax.random.PRNGKey(21)
    base = FA.fast_joint_transform(packed, bidx, key, use_pallas=False)
    mesh = data_mesh()
    for use_pallas, interpret in ((False, False), (True, True)):
        sharded = FA.fast_joint_transform(packed, bidx, key, mesh=mesh,
                                          use_pallas=use_pallas,
                                          interpret=interpret)
        np.testing.assert_array_equal(
            np.asarray(base, np.float32), np.asarray(sharded, np.float32),
            err_msg=f"use_pallas={use_pallas}")


def test_fast_augmentation_sharded_training_matches_single_device():
    """Engine-level: one fast-augmentation epoch with batches sharded over the
    8-device mesh matches the single-device trajectory (the augmented batch is
    bit-identical; only f32 reduction order may differ)."""
    from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
    from multi_task_breast_cancer_tpu.models import init_segmentation_model
    from multi_task_breast_cancer_tpu.parallel.mesh import data_mesh
    from multi_task_breast_cancer_tpu.train.loop import (
        Engine, EngineConfig, plan_epoch_indices)
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state

    rng = np.random.default_rng(3)
    n, H = 16, 32
    ds = ArrayDataset(
        images=rng.integers(0, 256, (n, H, H, 1)).astype(np.float32),
        masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
        labels=rng.integers(0, 3, n).astype(np.int32),
        patient_ids=np.arange(n), class_names=["benign"] * n,
        tumor_pixels=np.zeros(n, np.int64))
    results = {}
    for name, mesh in (("single", None), ("sharded", data_mesh())):
        model = init_segmentation_model("BTSUNet", width=4,
                                        deep_supervision=False)
        tx = init_optimizer("Adam", 1e-3)
        engine = Engine(model, tx,
                        EngineConfig(task="segmentation", n_classes=3,
                                     batch_size=8, compute_dtype="bfloat16",
                                     fast_augmentation=True),
                        mesh=mesh)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, H, H, 1)))
        data = engine.device_data(ds)
        assert "aug_packed" in data
        perm = plan_epoch_indices(n, 8, np.random.default_rng(42))
        state, m = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))
        ev = engine.eval_epoch(state, data)
        results[name] = (m["loss"], ev["loss"], ev["dice"])
    np.testing.assert_allclose(results["single"], results["sharded"],
                               rtol=2e-3)


def test_fast_augmentation_mesh_batch_divisibility():
    """batch_size must divide the 'data' axis (shard_map needs even shards) —
    rejected with a clear message at Engine construction."""
    from multi_task_breast_cancer_tpu.models import init_segmentation_model
    from multi_task_breast_cancer_tpu.parallel.mesh import data_mesh
    from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer

    model = init_segmentation_model("BTSUNet", width=4, deep_supervision=False)
    with pytest.raises(ValueError, match="divide evenly"):
        Engine(model, init_optimizer("Adam", 1e-3),
               EngineConfig(task="segmentation", batch_size=2,
                            compute_dtype="bfloat16", fast_augmentation=True),
               mesh=data_mesh())


# ---------------------------------------------------------------------------
# generalized packing: C channels × f32/bf16 × padded (possibly non-square)
# canvas (round-4 lifting of the bf16/1+1-channel/square restrictions)
# ---------------------------------------------------------------------------


def test_plan_canvas():
    assert FA.plan_canvas(64, 64) == 64
    assert FA.plan_canvas(64, 96) == 96
    assert FA.plan_canvas(100, 60) == 104   # next multiple of 8
    assert FA.plan_canvas(128, 128) == 128
    assert FA.plan_canvas(192, 192) == 256  # >1 vreg → next multiple of 128
    assert FA.plan_canvas(256, 130) == 256
    assert FA.plan_canvas(2, 2) == 8


@pytest.mark.parametrize("dtype,c", [("bfloat16", 2), ("bfloat16", 7),
                                     ("float32", 1), ("float32", 3)])
def test_pack_channels_identity_roundtrip(dtype, c):
    """pack → identity transform (p=0, angle=0) → unpack returns the input
    exactly, for pair-packed bf16 (odd C zero-padded) and per-plane f32."""
    rng = np.random.default_rng(c)
    stack = jnp.asarray(rng.standard_normal((3, 64, 96, c)), jnp.float32)
    if dtype == "bfloat16":
        stack = stack.astype(jnp.bfloat16).astype(jnp.float32)
    planes, fmt = FA.pack_channels(stack, dtype)
    assert planes.shape == (3, -(-c // 2) if dtype == "bfloat16" else c,
                            96, 96)
    out = FA.fast_joint_transform(planes, jnp.arange(3), jax.random.PRNGKey(0),
                                  p_hflip=0.0, p_vflip=0.0, max_angle=0.0,
                                  use_pallas=False, fmt=fmt)
    assert out.shape == (3, 64, 96, c)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(stack, np.float32))


def test_pack_channels_matches_legacy_two_channel():
    """For the original case (square, 2 bf16 channels, canvas == W) the
    generalized path must be BIT-identical to the legacy pack_bf16x2 path —
    same planes, same kernel, same result."""
    rng = np.random.default_rng(9)
    stack = jnp.asarray(rng.standard_normal((5, W, W, 2)), jnp.bfloat16)
    legacy = FA.pack_bf16x2(stack)
    planes, fmt = FA.pack_channels(stack.astype(jnp.float32), "bfloat16")
    np.testing.assert_array_equal(np.asarray(planes[:, 0]), np.asarray(legacy))
    bidx = jnp.asarray([4, 0, 2], jnp.int32)
    key = jax.random.PRNGKey(17)
    old = FA.fast_joint_transform(legacy, bidx, key, use_pallas=False)
    new = FA.fast_joint_transform(planes, bidx, key, use_pallas=False, fmt=fmt)
    np.testing.assert_array_equal(np.asarray(old, np.float32),
                                  np.asarray(new, np.float32))


@pytest.mark.parametrize("dtype,c,hw", [("float32", 2, (64, 64)),
                                        ("bfloat16", 5, (64, 96)),
                                        ("float32", 3, (32, 64)),
                                        ("bfloat16", 2, (192, 192))])
def test_multiplane_kernel_interpret_parity(dtype, c, hw):
    """The (sample, plane) grid kernel equals the pure-jnp executor for f32
    planes, odd channel counts, non-square centered canvases and the 192²→256
    lane-blocked case."""
    h, w = hw
    rng = np.random.default_rng(h + c)
    stack = jnp.asarray(rng.standard_normal((4, h, w, c)), jnp.float32)
    planes, fmt = FA.pack_channels(stack, dtype)
    bidx = jnp.asarray(rng.integers(0, 4, 3), jnp.int32)
    key = jax.random.PRNGKey(2)
    ref = FA.fast_joint_transform(planes, bidx, key, use_pallas=False, fmt=fmt)
    pal = FA.fast_joint_transform(planes, bidx, key, use_pallas=True,
                                  interpret=True, fmt=fmt)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(pal, np.float32))


def test_nonsquare_semantics_vs_exact_path():
    """Non-square (64×96) rotation on the padded canvas: centered embedding
    makes the canvas center coincide with the image center, so the fast path
    must agree with the exact torchvision-parity path (same draws) to mask
    Dice ≥ 0.97 — same bound as the square case."""
    from multi_task_breast_cancer_tpu.data.augment import joint_transform_stack_batch

    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((((yy - 36) / 11.0) ** 2 + ((xx - 40) / 19.0) ** 2) <= 1)
    img = np.where(mask, 60.0, 140.0)
    stack = np.stack([mask.astype(np.float32), img], axis=-1)[None]
    stack_b = jnp.asarray(np.repeat(stack, 16, axis=0), jnp.float32)
    planes, fmt = FA.pack_channels(stack_b, "float32")

    key = jax.random.PRNGKey(13)
    exact = joint_transform_stack_batch(stack_b, jax.random.split(key, 16))
    fast = FA.fast_joint_transform(planes, jnp.arange(16), key,
                                   use_pallas=False, fmt=fmt)
    em = np.asarray(exact[..., 0] > 0.5)
    fm = np.asarray(fast[..., 0].astype(np.float32) > 0.5)
    for i in range(16):
        inter = np.logical_and(em[i], fm[i]).sum()
        denom = em[i].sum() + fm[i].sum()
        if denom == 0:
            continue
        dice = 2.0 * inter / denom
        assert dice >= 0.97, (i, dice)


@pytest.mark.parametrize("dtype,hw", [("bfloat16", (65, 64)),
                                      ("float32", (31, 33))])
def test_pack_channels_odd_dims_identity_roundtrip(dtype, hw):
    """Odd H/W: one bottom/right zero-pad row/col before the centered
    embedding; identity transform unpacks the ORIGINAL odd-dim stack
    exactly (round-5 addition — this used to raise)."""
    h, w = hw
    rng = np.random.default_rng(h)
    stack = jnp.asarray(rng.standard_normal((3, h, w, 2)), jnp.float32)
    if dtype == "bfloat16":
        stack = stack.astype(jnp.bfloat16).astype(jnp.float32)
    planes, fmt = FA.pack_channels(stack, dtype)
    assert fmt.height == h and fmt.width == w
    assert planes.shape[-1] == FA.plan_canvas(h + h % 2, w + w % 2)
    out = FA.fast_joint_transform(planes, jnp.arange(3), jax.random.PRNGKey(0),
                                  p_hflip=0.0, p_vflip=0.0, max_angle=0.0,
                                  use_pallas=False, fmt=fmt)
    assert out.shape == (3, h, w, 2)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(stack, np.float32))


def test_odd_dims_semantics_vs_exact_path():
    """Odd-dim (63×65) full pipeline vs the exact torchvision-parity path
    (same draws): the ≤1-px center offset / flip translation keeps mask Dice
    ≥ 0.90 per sample (a coherent 1-px shift of a small lesion costs
    ≈ perimeter/(2·area) of dice — here ~0.92 worst case) and ≥ 0.92 mean,
    and the mask/image pair stays jointly aligned (the deviation is a
    coherent shift, never a mask-vs-image misregistration)."""
    from multi_task_breast_cancer_tpu.data.augment import joint_transform_stack_batch

    h, w = 63, 65
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((((yy - 33) / 10.0) ** 2 + ((xx - 29) / 14.0) ** 2) <= 1)
    img = np.where(mask, 60.0, 140.0)
    stack = np.stack([mask.astype(np.float32), img], axis=-1)[None]
    stack_b = jnp.asarray(np.repeat(stack, 16, axis=0), jnp.float32)
    planes, fmt = FA.pack_channels(stack_b, "float32")

    key = jax.random.PRNGKey(29)
    exact = joint_transform_stack_batch(stack_b, jax.random.split(key, 16))
    fast = FA.fast_joint_transform(planes, jnp.arange(16), key,
                                   use_pallas=False, fmt=fmt)
    em = np.asarray(exact[..., 0] > 0.5)
    fm = np.asarray(fast[..., 0].astype(np.float32) > 0.5)
    fimg = np.asarray(fast[..., 1].astype(np.float32))
    dices = []
    for i in range(16):
        inter = np.logical_and(em[i], fm[i]).sum()
        denom = em[i].sum() + fm[i].sum()
        if denom:
            dice = 2.0 * inter / denom
            dices.append(dice)
            assert dice >= 0.90, (i, dice)
        # joint alignment: fast mask pixels are exactly the fast image's
        # lesion-intensity pixels (both channels moved together)
        np.testing.assert_array_equal(fm[i], fimg[i] == 60.0)
    assert np.mean(dices) >= 0.92, np.mean(dices)


def test_fast_augmentation_f32_and_augment_channels_engine():
    """Engine-level: fast_augmentation now runs with f32 compute AND augment
    channels (multi-channel images) — one epoch trains with finite metrics
    and the augmented splits match the packed channel layout."""
    from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
    from multi_task_breast_cancer_tpu.models import init_segmentation_model
    from multi_task_breast_cancer_tpu.train.loop import (
        Engine, EngineConfig, plan_epoch_indices)
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state

    rng = np.random.default_rng(5)
    n, H, C = 8, 32, 3  # image + 2 augment channels
    ds = ArrayDataset(
        images=rng.integers(0, 256, (n, H, H, C)).astype(np.float32),
        masks=(rng.random((n, H, H, 1)) > 0.7).astype(np.float32),
        labels=rng.integers(0, 3, n).astype(np.int32),
        patient_ids=np.arange(n), class_names=["benign"] * n,
        tumor_pixels=np.zeros(n, np.int64))
    model = init_segmentation_model("BTSUNet", width=4, sequences=C,
                                    deep_supervision=False)
    tx = init_optimizer("Adam", 1e-3)
    engine = Engine(model, tx, EngineConfig(task="segmentation", batch_size=4,
                                            fast_augmentation=True,
                                            compute_dtype="float32"))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, H, C)))
    data = engine.device_data(ds)
    assert data["aug_packed"].shape == (n, 4, H, H)  # 1 mask + 3 img planes
    perm = plan_epoch_indices(n, 4, np.random.default_rng(0))
    state, m = engine.train_epoch(state, data, perm, jax.random.PRNGKey(1))
    assert np.isfinite(m["loss"])


def test_device_data_rejects_changed_mask_split():
    """Same TOTAL channel count but a different mask/image split must be
    rejected: the jitted epoch closes over the split statically, so reusing
    the cached program would silently feed mask channels as image channels."""
    from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
    from multi_task_breast_cancer_tpu.models import init_segmentation_model
    from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer

    rng = np.random.default_rng(6)
    n, H = 4, 32

    def _ds(n_mask, n_img):
        return ArrayDataset(
            images=rng.integers(0, 256, (n, H, H, n_img)).astype(np.float32),
            masks=(rng.random((n, H, H, n_mask)) > 0.7).astype(np.float32),
            labels=rng.integers(0, 3, n).astype(np.int32),
            patient_ids=np.arange(n), class_names=["benign"] * n,
            tumor_pixels=np.zeros(n, np.int64))

    model = init_segmentation_model("BTSUNet", width=4, sequences=3,
                                    deep_supervision=False)
    engine = Engine(model, init_optimizer("Adam", 1e-3),
                    EngineConfig(task="segmentation", batch_size=4,
                                 fast_augmentation=True,
                                 compute_dtype="float32"))
    engine.device_data(_ds(1, 3))  # traces format: 1 mask + 3 image channels
    with pytest.raises(ValueError, match="new Engine is needed"):
        engine.device_data(_ds(2, 2))  # same 4 total channels, wrong split
