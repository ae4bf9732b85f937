"""Serving-path benchmark: AOT artifact throughput + online HTTP serving.

Measures, on the flagship MTnnUNet at 128² (untrained weights — serving cost
is weight-value-independent):

1. **offline**: ExportedModel batched inference imgs/s at the largest bucket
   (includes output host-transfer — the real serving cost, unlike the pure
   device-side number in ``bench.py``).
2. **online single-stream**: HTTP request→response latency percentiles for a
   lone client (PNG in, JSON out; one ``batch_wait_ms`` of queueing included).
3. **online concurrent**: sustained imgs/s with many parallel HTTP clients —
   demonstrates the micro-batcher coalescing requests into device batches.

Writes ``SERVING_r{NN}.json``-style output to stdout as ONE json line; run
``python bench_serving.py`` on the TPU host (also runs on CPU for smoke).

Env overrides: MTBC_SERVE_SIZE (img size), MTBC_SERVE_BUCKET (max bucket),
MTBC_SERVE_ARCH, MTBC_SERVE_CLIENTS, MTBC_SERVE_REQS.
"""

from __future__ import annotations

import base64
import json
import os
import statistics
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

SIZE = int(os.environ.get("MTBC_SERVE_SIZE", 128))
BUCKET = int(os.environ.get("MTBC_SERVE_BUCKET", 256))
ARCH = os.environ.get("MTBC_SERVE_ARCH", "MTnnUNet")
CLIENTS = int(os.environ.get("MTBC_SERVE_CLIENTS", 32))
REQS = int(os.environ.get("MTBC_SERVE_REQS", 8))  # per client


def _build_artifact(tmp: Path) -> Path:
    import jax
    import jax.numpy as jnp

    from multi_task_breast_cancer_tpu.config import (
        Config, DataConfig, ModelConfig, TrainingConfig)
    from multi_task_breast_cancer_tpu.serve.export import export_inference
    from multi_task_breast_cancer_tpu.train.checkpoint import save_checkpoint
    from multi_task_breast_cancer_tpu.train.driver import _build_model
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state

    cfg = Config(model=ModelConfig(architecture=ARCH),
                 training=TrainingConfig(compute_dtype="bfloat16"),
                 data=DataConfig(input_img="unused",
                                 classes=["benign", "malignant", "normal"]))
    model = _build_model(cfg, "multitask")
    tx = init_optimizer("Adam", 1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, SIZE, SIZE, 1)))
    ckpt = tmp / "ckpt"
    save_checkpoint(str(ckpt), state, epoch=0, val_loss=1.0)
    platform = jax.devices()[0].platform
    platforms = ("cpu",) if platform == "cpu" else ("cpu", platform)
    # the BUCKET//ndev bucket lets data-parallel dispatch win its cost model
    # (per-device shards pad into it instead of the full BUCKET program)
    buckets = (1, max(1, BUCKET // max(jax.device_count(), 1)), BUCKET)
    art = export_inference(cfg, "multitask", str(ckpt), tmp / "artifact",
                           buckets=buckets, size=SIZE,
                           platforms=platforms)
    art_dev = export_inference(cfg, "multitask", str(ckpt), tmp / "artifact_dev",
                               buckets=buckets, size=SIZE,
                               platforms=platforms, device_postprocess=True)
    return art, art_dev, cfg


def _offline_throughput(exported, images: np.ndarray) -> float:
    """Ramped steady-state batched imgs/s (power-state ramp: repeat until
    <5% drift between consecutive windows, like bench.py)."""
    prev, rate = None, 0.0
    for _ in range(12):
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            out = exported.predict(images)
        # outputs are np arrays already (predict converts) — materialized
        dt = time.perf_counter() - t0
        rate = reps * images.shape[0] / dt
        if prev is not None and abs(rate - prev) / prev < 0.05:
            break
        prev = rate
    return rate


def main() -> None:
    import cv2
    import jax

    from multi_task_breast_cancer_tpu.serve.export import load_exported
    from multi_task_breast_cancer_tpu.serve.server import (
        ArtifactBackend, InferenceServer)

    tmp = Path(tempfile.mkdtemp(prefix="mtbc_serving_bench_"))
    art, art_dev, cfg = _build_artifact(tmp)
    exported = load_exported(art)
    exported_dev = load_exported(art_dev)

    rng = np.random.default_rng(0)
    # uint8 on the host→device link (round 5): prepare_image ships the raw
    # plane and every backend casts on-device — 1 byte/px up instead of 4
    images = (rng.random((BUCKET, SIZE, SIZE, 1)) * 255).astype(np.uint8)
    offline = _offline_throughput(exported, images)
    # artifact-path data parallelism (round 4): batches shard across every
    # local device with per-device weight copies; compare against the
    # single-device path on a multi-device run (8-virtual-device CPU mesh in
    # CI; =1 on a single TPU chip)
    n_devices = jax.device_count()
    dp_block = {"devices": n_devices}
    if n_devices > 1:
        single = load_exported(art, data_parallel=False)
        dp_block["offline_imgs_s_single_device"] = round(
            _offline_throughput(single, images), 1)
        dp_block["offline_imgs_s_all_devices"] = round(offline, 1)
        dp_block["scaling"] = round(
            offline / max(dp_block["offline_imgs_s_single_device"], 1e-9), 2)
        if jax.devices()[0].platform == "cpu":
            dp_block["note"] = (
                "virtual CPU devices share this host's physical cores — "
                "scaling here verifies dispatch correctness/structure, not "
                "hardware speedup; on real chips the per-device programs "
                "run concurrently")
    # device-postprocessed artifact: uint8 mask + probs + counts come back
    # instead of every f32 deep-supervision head — same warmed device.
    # Since round 5 the binary mask additionally rides the device→host link
    # bit-PACKED (1 bit/px, unpacked on the host; load_exported default);
    # the r04/early-r05 configuration (f32 upload + unpacked mask) is kept
    # as a same-chip comparison arm.
    offline_dev = _offline_throughput(exported_dev, images)
    unpacked = load_exported(art_dev, packed_transfer=False)
    offline_dev_unpacked = _offline_throughput(
        unpacked, images.astype(np.float32))
    bytes_raw = sum(a.nbytes for a in
                    jax.tree_util.tree_leaves(exported.predict(images)))
    bytes_dev = sum(a.nbytes for a in
                    jax.tree_util.tree_leaves(exported_dev.predict(images)))
    # fetched bytes with packing: the (B,H,W) uint8 mask leaf crosses as
    # (B,H,W//8); probs/counts are unchanged
    bytes_dev_packed = bytes_dev - BUCKET * SIZE * SIZE * 7 // 8

    raw = (rng.random((SIZE, SIZE)) * 255).astype(np.uint8)
    ok, png = cv2.imencode(".png", raw)
    assert ok
    png_bytes = png.tobytes()

    # Online arms serve the device-postprocessed artifact — the deployable
    # configuration: the compact outputs (uint8 mask + probs + counts) are
    # ~16x smaller on the device->host link than the raw f32 DS heads, and
    # on a tunnel-attached TPU that transfer dominates online latency.
    backend = ArtifactBackend(str(art_dev))
    with InferenceServer(backend, max_batch=BUCKET, batch_wait_ms=3.0) as srv:
        base = f"http://127.0.0.1:{srv.port}"

        def one_request(timeout=300.0) -> float:
            t0 = time.perf_counter()
            req = urllib.request.Request(
                base + "/predict", data=png_bytes,
                headers={"Content-Type": "image/png"}, method="POST")
            urllib.request.urlopen(req, timeout=timeout).read()
            return (time.perf_counter() - t0) * 1e3

        # warm both buckets + the device
        for _ in range(5):
            one_request()

        lat = sorted(one_request() for _ in range(40))
        p50 = statistics.median(lat)
        p95 = lat[int(0.95 * len(lat))]

        # concurrent sustained load
        lats, errs = [], []

        def client():
            try:
                for _ in range(REQS):
                    lats.append(one_request())
            except Exception as e:  # noqa: BLE001
                errs.append(repr(e))

        threads = [threading.Thread(target=client) for _ in range(CLIENTS)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        assert not errs, errs[:3]
        concurrent_rate = CLIENTS * REQS / wall
        stats = dict(srv.batcher.stats)

        # batch endpoint (round 4): BUCKET images in ONE request — offline
        # clients get device-batch efficiency without N HTTP round-trips
        b64 = base64.b64encode(png_bytes).decode()
        payload = json.dumps({"images_b64": [b64] * BUCKET}).encode()

        def batch_request() -> float:
            t0 = time.perf_counter()
            req = urllib.request.Request(
                base + "/predict_batch", data=payload,
                headers={"Content-Type": "application/json"}, method="POST")
            resp = json.loads(urllib.request.urlopen(req, timeout=600).read())
            assert resp["count"] == BUCKET
            return time.perf_counter() - t0

        batch_request()  # warm
        batch_rate = BUCKET * 3 / sum(batch_request() for _ in range(3))

        # raw octet-stream arms (round 5): clients POST uint8 planes, so the
        # host's single core never runs cv2.imdecode/base64 — the measured
        # dominant cost of the PNG arms above
        raw_body = raw.tobytes()

        def one_raw_request(timeout=300.0) -> float:
            t0 = time.perf_counter()
            req = urllib.request.Request(
                base + "/predict", data=raw_body,
                headers={"Content-Type": "application/octet-stream"},
                method="POST")
            urllib.request.urlopen(req, timeout=timeout).read()
            return (time.perf_counter() - t0) * 1e3

        for _ in range(5):
            one_raw_request()
        raw_lat = sorted(one_raw_request() for _ in range(40))
        raw_lats, raw_errs = [], []

        def raw_client():
            try:
                for _ in range(REQS):
                    raw_lats.append(one_raw_request())
            except Exception as e:  # noqa: BLE001
                raw_errs.append(repr(e))

        threads = [threading.Thread(target=raw_client) for _ in range(CLIENTS)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        raw_wall = time.perf_counter() - t0
        assert not raw_errs, raw_errs[:3]
        raw_concurrent_rate = CLIENTS * REQS / raw_wall

        batch_raw_payload = np.repeat(raw[None], BUCKET, axis=0).tobytes()

        def batch_raw_request() -> float:
            t0 = time.perf_counter()
            req = urllib.request.Request(
                base + "/predict_batch", data=batch_raw_payload,
                headers={"Content-Type": "application/octet-stream",
                         "X-Image-Count": str(BUCKET)},
                method="POST")
            resp = json.loads(urllib.request.urlopen(req, timeout=600).read())
            assert resp["count"] == BUCKET
            return time.perf_counter() - t0

        batch_raw_request()  # warm
        batch_raw_rate = BUCKET * 3 / sum(batch_raw_request()
                                          for _ in range(3))

    print(json.dumps({
        "metric": "serving",
        "platform": jax.devices()[0].platform,
        "arch": ARCH, "size": SIZE, "bucket": BUCKET,
        "offline_imgs_s": round(offline, 1),
        "offline_device_postprocess_imgs_s": round(offline_dev, 1),
        "offline_device_postprocess_unpacked_f32in_imgs_s": round(
            offline_dev_unpacked, 1),
        "upload_bytes_per_img": SIZE * SIZE,
        "transfer_bytes_per_img_raw": bytes_raw // BUCKET,
        "transfer_bytes_per_img_device_postprocess": bytes_dev_packed // BUCKET,
        "transfer_bytes_per_img_device_postprocess_unpacked": bytes_dev // BUCKET,
        "online_artifact": "device_postprocess",
        "online_p50_ms": round(p50, 2),
        "online_p95_ms": round(p95, 2),
        "concurrent_clients": CLIENTS,
        "concurrent_imgs_s": round(concurrent_rate, 1),
        "concurrent_mean_latency_ms": round(float(np.mean(lats)), 2),
        "predict_batch_imgs_s": round(batch_rate, 1),
        "raw_online_p50_ms": round(statistics.median(raw_lat), 2),
        "raw_online_p95_ms": round(raw_lat[int(0.95 * len(raw_lat))], 2),
        "raw_concurrent_imgs_s": round(raw_concurrent_rate, 1),
        "raw_concurrent_mean_latency_ms": round(float(np.mean(raw_lats)), 2),
        "raw_predict_batch_imgs_s": round(batch_raw_rate, 1),
        "data_parallel": dp_block,
        "batcher": stats,
    }))


if __name__ == "__main__":
    main()
