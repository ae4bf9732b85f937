"""Serving subsystem: AOT export round-trip parity, bucket padding/chunking,
the micro-batching HTTP server, and the serve CLI.

The reference has no deployment path (its scripts stop at offline
evaluation); these tests cover the TPU-native serving story —
``jax.export`` artifacts that run without model code, and an online server
that coalesces concurrent requests into single device batches."""

from __future__ import annotations

import base64
import json
import subprocess
import sys
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_task_breast_cancer_tpu.config import Config, DataConfig, ModelConfig
from multi_task_breast_cancer_tpu.serve.export import export_inference, load_exported
from multi_task_breast_cancer_tpu.serve.post import postprocess
from multi_task_breast_cancer_tpu.serve.server import (
    ArtifactBackend,
    CheckpointBackend,
    InferenceServer,
    prepare_image,
)
from multi_task_breast_cancer_tpu.train.checkpoint import save_checkpoint
from multi_task_breast_cancer_tpu.train.driver import _build_model
from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state

SIZE = 32


def _cfg(task_arch: str = "Multi_BTSUNet") -> Config:
    return Config(model=ModelConfig(architecture=task_arch, sequences=1, width=4,
                                    deep_supervision=False),
                  data=DataConfig(input_img="unused", batch_size=2,
                                  classes=["benign", "malignant", "normal"]))


def _checkpoint(cfg: Config, task: str, tmp_path, seed: int = 0) -> str:
    model = _build_model(cfg, task)
    tx = init_optimizer(cfg.optimizer.opt, cfg.optimizer.lr)
    state = create_train_state(model, tx, jax.random.PRNGKey(seed),
                               jnp.zeros((1, SIZE, SIZE, 1)))
    path = tmp_path / f"ckpt_{task}"
    save_checkpoint(str(path), state, epoch=0, val_loss=1.0)
    return str(path), model, tx, state


@pytest.fixture(scope="module")
def mt_artifact(tmp_path_factory):
    """Multitask checkpoint + exported artifact shared across tests."""
    tmp_path = tmp_path_factory.mktemp("serve")
    cfg = _cfg()
    ckpt, model, tx, state = _checkpoint(cfg, "multitask", tmp_path)
    art = export_inference(cfg, "multitask", ckpt, tmp_path / "artifact",
                           buckets=(1, 4), size=SIZE, platforms=("cpu",))
    return cfg, ckpt, art, model, tx, state


def test_export_round_trip_matches_live_model(mt_artifact):
    """Deserialized StableHLO forward == live Engine.predict at f32 tol."""
    cfg, ckpt, art, model, tx, state = mt_artifact
    exported = load_exported(art)

    rng = np.random.default_rng(0)
    images = (rng.random((4, SIZE, SIZE, 1)) * 255).astype(np.float32)

    engine = Engine(model, tx, EngineConfig(task="multitask", n_classes=3))
    live = engine.predict(state, images)
    aot = exported.predict(images)

    live_leaves = jax.tree_util.tree_leaves(live)
    aot_leaves = jax.tree_util.tree_leaves(aot)
    assert len(live_leaves) == len(aot_leaves)
    for a, b in zip(live_leaves, aot_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_export_bucket_padding_and_chunking(mt_artifact):
    """n=3 pads into the B=4 bucket; n=9 chunks by the largest bucket —
    outputs must equal the per-image single-bucket results either way."""
    _, _, art, *_ = mt_artifact
    exported = load_exported(art)
    rng = np.random.default_rng(1)
    images = (rng.random((9, SIZE, SIZE, 1)) * 255).astype(np.float32)

    singles = [exported.predict(images[i:i + 1]) for i in range(9)]
    ref = jax.tree_util.tree_map(lambda *p: np.concatenate(p, 0), *singles)

    for n in (3, 9):
        out = jax.tree_util.tree_map(lambda a: a[:n],
                                     exported.predict(images[:n]))
        got = jax.tree_util.tree_leaves(out)
        want = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a: a[:n], ref))
        for a, b in zip(got, want):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
        leading = {a.shape[0] for a in got}
        assert leading == {n}


def test_http_server_end_to_end(mt_artifact, tmp_path):
    """Concurrent POSTs through the artifact backend: responses carry probs +
    predicted_class + tumor_pixels (+ optional mask), the batcher coalesces
    at least one multi-request batch, and /healthz + /stats respond."""
    import cv2

    _, _, art, *_ = mt_artifact
    backend = ArtifactBackend(str(art))
    rng = np.random.default_rng(2)
    raw = (rng.random((SIZE, SIZE)) * 255).astype(np.uint8)
    ok, png = cv2.imencode(".png", raw)
    assert ok
    png_bytes = png.tobytes()

    with InferenceServer(backend, max_batch=4, batch_wait_ms=200) as srv:
        base = f"http://127.0.0.1:{srv.port}"

        health = json.loads(urllib.request.urlopen(base + "/healthz").read())
        assert health["status"] == "ok"
        assert health["model"]["task"] == "multitask"

        results, errors = [], []

        def post(body, headers, path="/predict"):
            req = urllib.request.Request(base + path, data=body,
                                         headers=headers, method="POST")
            try:
                results.append(json.loads(urllib.request.urlopen(req).read()))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=post, args=(
            png_bytes, {"Content-Type": "image/png"},
            "/predict?mask=1" if i == 0 else "/predict")) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert len(results) == 4
        for rec in results:
            assert set(rec) >= {"probs", "predicted_class", "tumor_pixels"}
            assert rec["predicted_class"] in ("benign", "malignant", "normal")
        # identical input ⇒ identical predictions across the batch
        assert len({json.dumps(r["probs"]) for r in results}) == 1
        with_mask = [r for r in results if "mask_b64" in r]
        assert len(with_mask) == 1
        mask_png = base64.b64decode(with_mask[0]["mask_b64"])
        decoded = cv2.imdecode(np.frombuffer(mask_png, np.uint8), 0)
        assert decoded.shape == (SIZE, SIZE)

        # JSON body path
        post(json.dumps({"image_b64": base64.b64encode(png_bytes).decode()})
             .encode(), {"Content-Type": "application/json"})
        assert not errors and len(results) == 5
        # a lone request runs in the B=1 bucket — numerically equal to the
        # coalesced B=4 batch result, not bit-equal (different XLA program)
        np.testing.assert_allclose(results[-1]["probs"], results[0]["probs"],
                                   rtol=1e-5, atol=1e-6)

        stats = json.loads(urllib.request.urlopen(base + "/stats").read())
        assert stats["requests"] == 5
        assert stats["max_batch_seen"] >= 2  # coalescing actually happened

        # malformed body → 400, server stays alive
        req = urllib.request.Request(base + "/predict", data=b"not a png",
                                     headers={"Content-Type": "image/png"},
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
        assert json.loads(urllib.request.urlopen(base + "/healthz").read())[
            "status"] == "ok"


def test_http_raw_octet_stream_paths(mt_artifact):
    """``application/octet-stream`` ingestion (npy / raw uint8 planes) must
    return byte-for-byte the PNG path's predictions while never touching
    cv2/base64 — the decode-free lane for throughput clients — and reject
    malformed raw payloads with 400s that keep the server alive."""
    import io

    import cv2

    _, _, art, *_ = mt_artifact
    backend = ArtifactBackend(str(art))
    rng = np.random.default_rng(5)
    raw = (rng.random((3, SIZE, SIZE)) * 255).astype(np.uint8)
    ok, png = cv2.imencode(".png", raw[0])
    assert ok

    def npy_bytes(a):
        buf = io.BytesIO()
        np.save(buf, a)
        return buf.getvalue()

    with InferenceServer(backend, max_batch=4, batch_wait_ms=1.0) as srv:
        base = f"http://127.0.0.1:{srv.port}"

        def post(path, body, ctype, expect_error=None, count=None):
            headers = {"Content-Type": ctype}
            if count is not None:
                headers["X-Image-Count"] = str(count)
            req = urllib.request.Request(base + path, data=body,
                                         headers=headers, method="POST")
            if expect_error is None:
                return json.loads(urllib.request.urlopen(req).read())
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req)
            assert exc.value.code == expect_error

        want = post("/predict", png.tobytes(), "image/png")
        got_npy = post("/predict", npy_bytes(raw[0]), "application/octet-stream")
        got_raw = post("/predict", raw[0].tobytes(), "application/octet-stream")
        for got in (got_npy, got_raw):
            assert got["probs"] == want["probs"]
            assert got["predicted_class"] == want["predicted_class"]

        # batch forms: npy (N, H, W) is self-describing; N bare raw size²
        # planes must assert their count via X-Image-Count (byte length
        # alone cannot tell N planes from one wrong-resolution image)
        b64 = [base64.b64encode(cv2.imencode(".png", g)[1].tobytes()).decode()
               for g in raw]
        want_b = post("/predict_batch",
                      json.dumps({"images_b64": b64}).encode(),
                      "application/json")
        for body, n in ((npy_bytes(raw), None), (raw.tobytes(), 3)):
            got_b = post("/predict_batch", body, "application/octet-stream",
                         count=n)
            assert got_b["count"] == 3
            for g, w in zip(got_b["predictions"], want_b["predictions"]):
                assert g["probs"] == w["probs"]

        # malformed raw payloads → 400, server stays alive
        post("/predict", raw.tobytes(), "application/octet-stream",
             count=3, expect_error=400)  # 3 planes to single-image endpoint
        post("/predict", raw[0].tobytes()[:-7], "application/octet-stream",
             expect_error=400)  # not a whole number of planes
        post("/predict_batch", npy_bytes(raw.astype(np.float32)),
             "application/octet-stream", expect_error=400)  # wrong dtype
        # shapeless multi-plane bodies: a wrong-resolution image must never
        # be silently strip-split into N "valid" planes
        big = (rng.random((2 * SIZE, 2 * SIZE)) * 255).astype(np.uint8)
        post("/predict", big.tobytes(), "application/octet-stream",
             expect_error=400)  # one 2size² image = 4 planes, no count header
        post("/predict_batch", raw.tobytes(), "application/octet-stream",
             expect_error=400)  # 3 bare planes, count not asserted
        post("/predict_batch", raw.tobytes(), "application/octet-stream",
             count=4, expect_error=400)  # count contradicts the byte length
        post("/predict_batch", npy_bytes(raw), "application/octet-stream",
             count=7, expect_error=400)  # count contradicts the npy shape
        post("/predict_batch", raw.tobytes(), "application/octet-stream",
             count="many", expect_error=400)  # unparseable count
        assert json.loads(urllib.request.urlopen(base + "/healthz").read())[
            "status"] == "ok"


def test_checkpoint_backend_matches_artifact_backend(mt_artifact):
    """Live-jit backend and AOT artifact backend agree on the same inputs."""
    cfg, ckpt, art, *_ = mt_artifact
    live = CheckpointBackend(cfg, "multitask", ckpt, size=SIZE, max_batch=4)
    aot = ArtifactBackend(str(art))
    rng = np.random.default_rng(3)
    images = (rng.random((3, SIZE, SIZE, 1)) * 255).astype(np.float32)
    a = postprocess(live.predict(images), "multitask", 3, True)
    b = postprocess(aot.predict(images), "multitask", 3, True)
    np.testing.assert_allclose(a.probs, b.probs, rtol=1e-5, atol=1e-5)
    assert a.pred_class == b.pred_class
    np.testing.assert_array_equal(a.masks, b.masks)


def test_prepare_image_matches_training_stack():
    """Serving-side channel prep == the dataset's channel conventions
    (resize + augment channels), so a checkpoint sees the same input space."""
    rng = np.random.default_rng(4)
    raw = (rng.random((50, 40)) * 255).astype(np.uint8)
    out = prepare_image(raw, SIZE, {})
    # no augment channels → the plane stays uint8 (1 byte/px on the
    # host→device link; backends cast on-device, bit-identical to f32)
    assert out.shape == (SIZE, SIZE, 1) and out.dtype == np.uint8
    out2 = prepare_image(raw, SIZE, {"SOBEL": True})
    assert out2.shape == (SIZE, SIZE, 2) and out2.dtype == np.float32
    np.testing.assert_array_equal(out2[..., 0], out[..., 0])


@pytest.mark.slow
def test_serve_cli_export_and_run(tmp_path):
    """CLI round trip: export subcommand writes an artifact, run subcommand
    serves it, a real HTTP request answers."""
    import cv2

    config = tmp_path / "config.yaml"
    config.write_text("""
model:
  architecture: Multi_BTSUNet
  sequences: 1
  width: 4
  deep_supervision: False
data:
  batch_size: 2
  classes: [benign, malignant, normal]
""")
    cfg = _cfg()
    ckpt, *_ = _checkpoint(cfg, "multitask", tmp_path)
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root", "PYTHONPATH": "/root/repo"}

    art = tmp_path / "artifact"
    proc = subprocess.run(
        [sys.executable, "-m", "multi_task_breast_cancer_tpu.serve", "export",
         "--config", str(config), "--task", "multitask",
         "--checkpoint", ckpt, "--output", str(art),
         "--buckets", "1,2", "--size", str(SIZE), "--platforms", "cpu"],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (art / "manifest.json").exists() and (art / "weights.npz").exists()

    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = subprocess.Popen(
        [sys.executable, "-m", "multi_task_breast_cancer_tpu.serve", "run",
         "--artifact", str(art), "--host", "127.0.0.1", "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = 120
        import time
        for _ in range(deadline * 10):
            try:
                urllib.request.urlopen(base + "/healthz", timeout=1)
                break
            except Exception:
                if server.poll() is not None:
                    raise AssertionError(server.stderr.read().decode()[-2000:])
                time.sleep(0.1)
        raw = (np.random.default_rng(5).random((SIZE, SIZE)) * 255).astype(np.uint8)
        ok, png = cv2.imencode(".png", raw)
        req = urllib.request.Request(base + "/predict", data=png.tobytes(),
                                     headers={"Content-Type": "image/png"},
                                     method="POST")
        rec = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert set(rec) >= {"probs", "predicted_class", "tumor_pixels"}
    finally:
        server.terminate()
        server.wait(timeout=30)


def test_nnunet_classifier_probs_not_double_softmaxed(tmp_path):
    """nnUNetClassifier applies softmax INSIDE forward for multiclass
    (reference quirk, ``nnUNet_classifier.py:168-169``); serving postprocess
    must pass those probabilities through unchanged — re-softmaxing flattens
    a confident [0.998, .001, .001] into ≈[0.50, 0.25, 0.25]."""
    cfg = _cfg("nnUNetClassifier")
    ckpt, *_ = _checkpoint(cfg, "classification", tmp_path)
    backend = CheckpointBackend(cfg, "classification", ckpt, size=SIZE,
                                max_batch=2, data_parallel=False)
    assert backend.info["softmax_in_forward"] is True
    rng = np.random.default_rng(7)
    images = (rng.random((2, SIZE, SIZE, 1)) * 255).astype(np.float32)
    out = np.asarray(backend.predict(images))
    pred = postprocess(out, "classification", 3, False,
                       backend.info["softmax_in_forward"])
    np.testing.assert_allclose(pred.probs, out[:2], rtol=1e-6)
    np.testing.assert_allclose(pred.probs.sum(-1), 1.0, rtol=1e-5)


def test_export_manifest_records_softmax_in_forward(tmp_path):
    """The artifact manifest must carry the forward-normalization convention
    so ArtifactBackend postprocesses pre-softmaxed outputs correctly."""
    cfg = _cfg("nnUNetClassifier")
    ckpt, *_ = _checkpoint(cfg, "classification", tmp_path)
    art = export_inference(cfg, "classification", ckpt, tmp_path / "art",
                           buckets=(2,), size=SIZE, platforms=("cpu",))
    backend = ArtifactBackend(str(art))
    assert backend.info["softmax_in_forward"] is True
    # multitask heads emit raw logits — flag must stay False there
    assert json.loads((art / "manifest.json").read_text())[
        "softmax_in_forward"] is True


def test_postprocess_semantic_masks_and_pixel_vote():
    """>1-channel seg heads (semantic segmentation, ``models.py:140-162``)
    decode as softmax-argmax label maps with the reference's pixel vote —
    NOT as sigmoid(channel 0) binary masks."""
    rng = np.random.default_rng(8)
    final = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    pred = postprocess(final, "segmentation", 3, False)
    expect = np.argmax(final, -1)
    np.testing.assert_array_equal(pred.masks, expect)
    assert pred.mask_scale == 127
    for i in range(4):
        b, m = (expect[i] == 1).sum(), (expect[i] == 2).sum()
        assert pred.pred_class[i] == ("benign" if b >= m else "malignant")
        assert pred.record(i)["tumor_pixels"] == int((expect[i] != 0).sum())
    # single-channel head keeps the binary convention
    pred_b = postprocess(final[..., :1], "segmentation", 3, False)
    assert pred_b.mask_scale == 255 and pred_b.pred_class is None
    np.testing.assert_array_equal(
        pred_b.masks, (1 / (1 + np.exp(-final[..., 0])) > 0.5))


def test_exported_model_empty_batch_and_device_weights(mt_artifact):
    """predict() rejects an empty batch with a clear error (not a cryptic
    aval mismatch), and the loaded weights are device-committed jax.Arrays
    (numpy leaves would re-upload the full weight set every batch)."""
    _, _, art, *_ = mt_artifact
    exported = load_exported(art)
    with pytest.raises(ValueError, match="empty batch"):
        exported.predict(np.zeros((0, SIZE, SIZE, 1), np.float32))
    assert all(isinstance(leaf, jax.Array)
               for leaf in jax.tree_util.tree_leaves(exported.variables))


class _FailingBackend:
    """Stub backend whose inference always raises (infra fault)."""

    info = {"task": "classification", "architecture": "stub", "n_classes": 3,
            "classes": ["benign", "malignant", "normal"], "size": SIZE,
            "channels": 1, "buckets": [2], "augmentation": {},
            "pipeline_refinement": False, "softmax_in_forward": False,
            "backend": "stub"}

    def predict(self, images):
        raise RuntimeError("chip on fire")


def test_http_error_codes_backend_5xx_oversized_413():
    """Backend/infra faults must surface as 5xx (retryable, alarms fire) and
    oversized bodies as 413 — not blanket 400 client errors."""
    import cv2
    import http.client

    rng = np.random.default_rng(9)
    ok, png = cv2.imencode(".png", (rng.random((SIZE, SIZE)) * 255)
                           .astype(np.uint8))
    assert ok
    with InferenceServer(_FailingBackend(), max_batch=2,
                         batch_wait_ms=1) as srv:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/predict", data=png.tobytes(),
            headers={"Content-Type": "image/png"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 500  # valid request, failing backend

        # oversized Content-Length is rejected BEFORE the body is read
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Type", "image/png")
        conn.putheader("Content-Length", str(64 << 20))
        conn.endheaders()
        conn.send(b"x")
        assert conn.getresponse().status == 413
        conn.close()


def test_device_postprocess_artifact_matches_raw(mt_artifact, tmp_path):
    """``--device-postprocess`` artifacts must serve EXACTLY what the raw
    artifact + host postprocessing serves: the sigmoid/argmax/pixel-count
    passes moved onto the device (uint8 mask + probs + counts, ~6x fewer
    host-transfer bytes) are a pure refactor of the answer, not a new one."""
    from multi_task_breast_cancer_tpu.serve.post import postprocess_compact

    cfg, ckpt, art_raw, *_ = mt_artifact
    art_dev = export_inference(cfg, "multitask", ckpt, tmp_path / "art_dev",
                               buckets=(1, 4), size=SIZE, platforms=("cpu",),
                               device_postprocess=True)
    assert json.loads((art_dev / "manifest.json").read_text())[
        "device_postprocess"] is True

    raw_b = ArtifactBackend(str(art_raw))
    dev_b = ArtifactBackend(str(art_dev))
    rng = np.random.default_rng(10)
    # n=3 pads into the B=4 bucket; n=9 chunks by the largest bucket — the
    # compact dict outputs must survive both ExportedModel paths
    for n in (3, 9):
        images = (rng.random((n, SIZE, SIZE, 1)) * 255).astype(np.float32)
        want = raw_b.postprocess(raw_b.predict(images))
        out = dev_b.predict(images)
        assert set(out) == {"probs", "mask", "tumor_pixels"}
        assert out["mask"].dtype == np.uint8
        got = dev_b.postprocess(out)
        np.testing.assert_allclose(got.probs, want.probs, rtol=1e-5, atol=1e-6)
        assert got.pred_class == want.pred_class
        np.testing.assert_array_equal(got.masks, want.masks)
        assert [got.record(i)["tumor_pixels"] for i in range(n)] == \
               [want.record(i)["tumor_pixels"] for i in range(n)]

    # device-side bytes: compact output ≤ mask + probs + counts, vs the raw
    # path shipping the f32 head(s) — ~3.95x here (one seg head, no deep
    # supervision); the DS flagship ships 4 heads, so the gap is far larger
    images = (rng.random((4, SIZE, SIZE, 1)) * 255).astype(np.float32)
    raw_bytes = sum(np.asarray(a).nbytes for a in
                    jax.tree_util.tree_leaves(raw_b.predict(images)))
    dev_bytes = sum(np.asarray(a).nbytes for a in
                    jax.tree_util.tree_leaves(dev_b.predict(images)))
    assert dev_bytes * 3 < raw_bytes

    # end-to-end through the HTTP server: identical response record
    import cv2
    raw_img = (rng.random((SIZE, SIZE)) * 255).astype(np.uint8)
    ok, png = cv2.imencode(".png", raw_img)
    assert ok
    recs = {}
    for name, backend in (("raw", raw_b), ("dev", dev_b)):
        with InferenceServer(backend, max_batch=4, batch_wait_ms=1) as srv:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/predict?mask=1",
                data=png.tobytes(), headers={"Content-Type": "image/png"},
                method="POST")
            rec = json.loads(urllib.request.urlopen(req).read())
            rec.pop("latency_ms")
            recs[name] = rec
    # probs to f32 tolerance (two different XLA programs), rest exact
    np.testing.assert_allclose(recs["raw"].pop("probs"),
                               recs["dev"].pop("probs"), rtol=1e-5, atol=1e-6)
    assert recs["raw"] == recs["dev"]

    # postprocess_compact also accepts the dict with numpy leaves directly
    out = dev_b.predict(images)
    pb = postprocess_compact(out, "multitask", 3, True)
    assert pb.masks.shape == (4, SIZE, SIZE)


def test_packed_transfer_and_uint8_input_bit_identical(mt_artifact, tmp_path):
    """The round-5 wire packing is invisible to callers: 1-bit/px mask
    transfer (``packed_transfer``, default on) and uint8 inputs (cast on
    device) both return byte-identical outputs to the unpacked f32 paths —
    only the host↔device link traffic changes (export.py:_pack_mask_bits,
    _dispatch)."""
    cfg, ckpt, _, model, tx, state = mt_artifact
    art_dev = export_inference(cfg, "multitask", ckpt, tmp_path / "dev_pk",
                               buckets=(1, 4), size=SIZE, platforms=("cpu",),
                               device_postprocess=True)
    packed = load_exported(art_dev)                         # default: packed
    plain = load_exported(art_dev, packed_transfer=False)
    assert packed._packed and not plain._packed

    rng = np.random.default_rng(11)
    u8 = (rng.random((5, SIZE, SIZE, 1)) * 255).astype(np.uint8)
    f32 = u8.astype(np.float32)

    ref = plain.predict(f32)
    assert set(ref) == {"probs", "mask", "tumor_pixels"}
    for got in (packed.predict(f32), packed.predict(u8), plain.predict(u8)):
        assert set(got) == set(ref)
        for k in ref:
            np.testing.assert_array_equal(got[k], ref[k])

    # live Engine path accepts uint8 identically (serving CheckpointBackend)
    engine = Engine(model, tx, EngineConfig(task="multitask", n_classes=3))
    live_f32 = engine.predict(state, f32)
    live_u8 = engine.predict(state, u8)
    for a, b in zip(jax.tree_util.tree_leaves(live_f32),
                    jax.tree_util.tree_leaves(live_u8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_postprocess_classification_softmax_quirk(tmp_path):
    """Compact classification artifacts respect the nnUNetClassifier
    softmax-in-forward quirk: probs pass through un-renormalised."""
    cfg = _cfg("nnUNetClassifier")
    ckpt, *_ = _checkpoint(cfg, "classification", tmp_path)
    art_raw = export_inference(cfg, "classification", ckpt, tmp_path / "raw",
                               buckets=(2,), size=SIZE, platforms=("cpu",))
    art_dev = export_inference(cfg, "classification", ckpt, tmp_path / "dev",
                               buckets=(2,), size=SIZE, platforms=("cpu",),
                               device_postprocess=True)
    rng = np.random.default_rng(11)
    images = (rng.random((2, SIZE, SIZE, 1)) * 255).astype(np.float32)
    raw_b, dev_b = ArtifactBackend(str(art_raw)), ArtifactBackend(str(art_dev))
    want = raw_b.postprocess(raw_b.predict(images))
    out = dev_b.predict(images)
    assert set(out) == {"probs"}  # no mask for pure classification
    got = dev_b.postprocess(out)
    np.testing.assert_allclose(got.probs, want.probs, rtol=1e-6)
    np.testing.assert_allclose(got.probs.sum(-1), 1.0, rtol=1e-5)
    assert got.pred_class == want.pred_class and got.masks is None


def test_compact_outputs_branch_parity_with_host_postprocess():
    """`_compact_outputs` (the device-side program) and `postprocess` (the
    host decoder of raw outputs) are branch-for-branch twins — checked on
    synthetic outputs for the branches no exportable config reaches:
    semantic (>1-channel) heads incl. the pixel vote, the empty-mask PR
    override, and binary (n_classes==2) sigmoid probabilities."""
    from multi_task_breast_cancer_tpu.serve.export import _compact_outputs
    from multi_task_breast_cancer_tpu.serve.post import postprocess_compact

    rng = np.random.default_rng(12)

    # semantic segmentation head: label map + pixel vote, incl. an
    # all-background image (argmax==0 everywhere)
    final = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    final[0, :, :, 0] = 50.0
    compact = jax.jit(lambda o: _compact_outputs(o, "segmentation", 3, False))(
        jnp.asarray(final))
    want = postprocess(final, "segmentation", 3, False)
    got = postprocess_compact(
        jax.tree_util.tree_map(np.asarray, compact), "segmentation", 3, False)
    np.testing.assert_array_equal(got.masks, want.masks)
    assert got.mask_scale == want.mask_scale == 127
    assert got.pred_class == want.pred_class

    # multitask with an EMPTY predicted mask: PR must force 'normal' on both
    cls_logits = rng.normal(size=(3, 3)).astype(np.float32)
    cls_logits[:, 2] -= 100.0  # argmax never 'normal' without PR
    seg = np.full((3, 8, 8, 1), -5.0, np.float32)  # sigmoid < 0.5 everywhere
    out = (cls_logits, [seg])
    compact = jax.jit(lambda o: _compact_outputs(o, "multitask", 3, False))(
        jax.tree_util.tree_map(jnp.asarray, out))
    np.testing.assert_array_equal(np.asarray(compact["tumor_pixels"]), 0)
    want = postprocess(out, "multitask", 3, True)
    got = postprocess_compact(
        jax.tree_util.tree_map(np.asarray, compact), "multitask", 3, True)
    assert got.pred_class == want.pred_class == ["normal"] * 3
    # atol: the -100 column softmaxes to a denormal; XLA flushes it to zero
    np.testing.assert_allclose(got.probs, want.probs, rtol=1e-6, atol=1e-30)

    # binary (n_classes==2): sigmoid probs, malignant/benign threshold
    out2 = (rng.normal(size=(4, 1)).astype(np.float32),
            rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
    compact = jax.jit(lambda o: _compact_outputs(o, "multitask", 2, False))(
        jax.tree_util.tree_map(jnp.asarray, out2))
    want = postprocess(out2, "multitask", 2, False)
    got = postprocess_compact(
        jax.tree_util.tree_map(np.asarray, compact), "multitask", 2, False)
    np.testing.assert_allclose(got.probs, want.probs, rtol=1e-6)
    assert got.pred_class == want.pred_class
    np.testing.assert_array_equal(got.masks, want.masks)


def test_checkpoint_backend_data_parallel_matches_single(mt_artifact):
    """Multi-chip serving: the live backend under the 8-device mesh (weights
    replicated, batch sharded, outputs gathered) must agree with the
    single-device backend on the same inputs."""
    cfg, ckpt, *_ = mt_artifact
    dp = CheckpointBackend(cfg, "multitask", ckpt, size=SIZE, max_batch=8,
                           data_parallel=True)
    single = CheckpointBackend(cfg, "multitask", ckpt, size=SIZE, max_batch=8,
                               data_parallel=False)
    assert dp._engine.mesh is not None and dp._engine.mesh.devices.size == 8
    rng = np.random.default_rng(6)
    images = (rng.random((5, SIZE, SIZE, 1)) * 255).astype(np.float32)
    a = postprocess(dp.predict(images), "multitask", 3, True)
    b = postprocess(single.predict(images), "multitask", 3, True)
    np.testing.assert_allclose(a.probs, b.probs, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(a.masks, b.masks)


def test_exported_model_data_parallel_matches_single_device(mt_artifact):
    """Round-4 (VERDICT #6a): the artifact backend shards large batches
    across all local devices (per-device weight copies, async dispatch) —
    results must equal the single-device path exactly, for every branch
    (pad-into-bucket, shard-per-device, chunk-by-largest-bucket)."""
    _, _, art, *_ = mt_artifact
    single = load_exported(art, data_parallel=False)
    multi = load_exported(art, data_parallel=True)
    assert len(multi._devices) == jax.device_count() >= 2
    rng = np.random.default_rng(11)
    for n in (1, 3, 8, 9, 37):
        images = (rng.random((n, SIZE, SIZE, 1)) * 255).astype(np.float32)
        a = jax.tree_util.tree_leaves(single.predict(images))
        b = jax.tree_util.tree_leaves(multi.predict(images))
        assert len(a) == len(b)
        for x, y in zip(a, b):
            assert x.shape == y.shape, (n, x.shape, y.shape)
            np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-5,
                                       err_msg=f"n={n}")


def test_predict_batch_endpoint(mt_artifact):
    """Round-4 (VERDICT #6b): POST /predict_batch takes a JSON list of
    base64 PNGs and returns per-image predictions in order, equal to the
    single-image endpoint's answers."""
    import urllib.error
    import cv2

    _, _, art, *_ = mt_artifact
    backend = ArtifactBackend(str(art))
    rng = np.random.default_rng(13)
    grays = [(rng.random((SIZE, SIZE)) * 255).astype(np.uint8)
             for _ in range(3)]
    pngs = [cv2.imencode(".png", g)[1].tobytes() for g in grays]

    with InferenceServer(backend, max_batch=8, batch_wait_ms=2.0) as srv:
        base = f"http://127.0.0.1:{srv.port}"

        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            return json.loads(urllib.request.urlopen(req).read())

        singles = [post("/predict", {"image_b64":
                                     base64.b64encode(p).decode()})
                   for p in pngs]
        batch = post("/predict_batch?mask=1", {
            "images_b64": [base64.b64encode(p).decode() for p in pngs]})
        assert batch["count"] == 3
        assert len(batch["predictions"]) == 3
        for got, want in zip(batch["predictions"], singles):
            np.testing.assert_allclose(got["probs"], want["probs"],
                                       rtol=1e-5, atol=1e-6)
            assert got["predicted_class"] == want["predicted_class"]
            assert "mask_b64" in got  # ?mask=1 applies per image

        # malformed batch bodies → 400
        for bad in ({}, {"images_b64": []}, {"images_b64": "zzz"}):
            req = urllib.request.Request(
                base + "/predict_batch", data=json.dumps(bad).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req)
            assert exc.value.code == 400


def test_data_parallel_cost_model_skips_losing_shards(mt_artifact, monkeypatch):
    """Data-parallel dispatch must engage only when it reduces padded work:
    with a sparse bucket list, a small per-device shard pads up to a full
    bucket, so 8 devices would each run the whole serial batch's FLOPs.
    The engagement rule compares bucket plans (serve/export.py ``_plan``)."""
    _, _, art, *_ = mt_artifact
    model = load_exported(art, data_parallel=True)
    assert len(model._devices) >= 2

    # _plan arithmetic: buckets (1, 4) — 9 imgs = [4, 4, 1], 3 = [4], 4 = [4]
    assert list(model.buckets) == [1, 4]
    assert model._plan(9) == [4, 4, 1]
    assert model._plan(3) == [4]
    assert model._plan(1) == [1]

    used_devices = []
    orig = model._dispatch

    def spy(images, bucket, device=None):
        used_devices.append(device if device is not None
                            else model._devices[0])
        return orig(images, bucket, device)

    monkeypatch.setattr(model, "_dispatch", spy)

    # n=3 on buckets (1,4): shard=1 per device costs plan(1)=[1] < plan(3)=[4]
    # only when bucket 1 exists — here it does, so dp engages and wins.
    rng = np.random.default_rng(5)
    model.predict((rng.random((3, SIZE, SIZE, 1)) * 255).astype(np.float32))
    assert len(set(used_devices)) > 1

    # Losing case: pretend the bucket list is sparse (only the top bucket).
    # n=4: the per-device shard pads to the full bucket, so plan(shard)=[4]
    # is not < plan(4)=[4] — dp would multiply total work by ndev for zero
    # wall-clock gain; the cost model must refuse and run serially.
    model.buckets = [4]
    assert model._plan(2) == [4] and model._plan(4) == [4]
    used_devices.clear()
    model.predict((rng.random((4, SIZE, SIZE, 1)) * 255).astype(np.float32))
    assert len(set(used_devices)) == 1

    # Still-sparse but genuinely winning case: n=6 = serial [4,4] while the
    # biggest per-device shard is one [4] — half the wall-clock, dp engages.
    used_devices.clear()
    model.predict((rng.random((6, SIZE, SIZE, 1)) * 255).astype(np.float32))
    assert len(set(used_devices)) > 1


def test_checkpoint_backend_oversized_batch_chunks(mt_artifact):
    """A flattened batch larger than the compiled shape (one oversized
    /predict_batch request) must run in fixed pad_to-sized chunks — same
    answers as per-image calls, no per-size recompilation path."""
    cfg, ckpt, *_ = mt_artifact
    live = CheckpointBackend(cfg, "multitask", ckpt, size=SIZE, max_batch=4)
    rng = np.random.default_rng(7)
    images = (rng.random((11, SIZE, SIZE, 1)) * 255).astype(np.float32)
    big = jax.tree_util.tree_leaves(live.predict(images))
    for i in range(11):
        one = jax.tree_util.tree_leaves(live.predict(images[i:i + 1]))
        for x, y in zip(big, one):
            np.testing.assert_allclose(x[i:i + 1], y[:1], rtol=1e-4,
                                       atol=1e-4, err_msg=f"i={i}")


def test_microbatcher_bounds_flattened_batch():
    """Coalescing never pushes the flattened device batch past max_batch:
    an over-budget request is carried to the NEXT device batch, and a single
    request larger than max_batch runs alone (backends chunk internally)."""
    import multi_task_breast_cancer_tpu.serve.server as S

    seen = []

    class StubBackend:
        info = {"task": "classification", "n_classes": 3,
                "pipeline_refinement": False, "softmax_in_forward": False}

        def predict(self, images):
            seen.append(images.shape[0])
            return {"logits": np.zeros((images.shape[0], 3), np.float32)}

        def postprocess(self, out):
            class _P:
                masks = None
                mask_scale = 1

                def record(self, i):
                    return {"i": int(i)}
            return _P()

    b = S.MicroBatcher(StubBackend(), max_batch=4, batch_wait_ms=40.0)
    try:
        img = np.zeros((1, SIZE, SIZE, 1), np.float32)
        results = []
        threads = [threading.Thread(
            target=lambda k: results.append(len(b.submit_many(
                np.repeat(img, k, axis=0)))), args=(k,))
            for k in (3, 3, 3)]  # 9 images, bound 4 → no batch may mix 3+3
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert sorted(results) == [3, 3, 3]
        assert all(n <= 4 for n in seen), seen
        # oversized single request: runs alone, chunked by the backend
        out = b.submit_many(np.repeat(img, 7, axis=0))
        assert len(out) == 7
        assert seen[-1] == 7  # one backend call; CheckpointBackend chunks
    finally:
        b.close()


def test_serial_tail_uses_fitting_bucket(mt_artifact, monkeypatch):
    """The serial chunked path (dp off) must pad the tail chunk into the
    smallest fitting bucket, exactly as the _plan cost model describes —
    not the full top bucket."""
    _, _, art, *_ = mt_artifact
    model = load_exported(art, data_parallel=False)
    assert list(model.buckets) == [1, 4]

    used_buckets = []
    orig = model._dispatch

    def spy(images, bucket, device=None):
        used_buckets.append(bucket)
        return orig(images, bucket, device)

    monkeypatch.setattr(model, "_dispatch", spy)
    rng = np.random.default_rng(11)
    out = model.predict((rng.random((5, SIZE, SIZE, 1)) * 255)
                        .astype(np.float32))
    assert used_buckets == [4, 1] == model._plan(5)
    assert all(x.shape[0] == 5 for x in jax.tree_util.tree_leaves(out))


def test_single_device_honors_default_device(mt_artifact):
    """data_parallel=False must respect an active jax.default_device so one
    process can pin separate single-device replicas to different chips."""
    _, _, art, *_ = mt_artifact
    devs = jax.local_devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 devices")
    with jax.default_device(devs[1]):
        model = load_exported(art, data_parallel=False)
    assert model._devices == [devs[1]]
    rng = np.random.default_rng(12)
    out = model.predict((rng.random((2, SIZE, SIZE, 1)) * 255)
                        .astype(np.float32))
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(out))


def test_microbatcher_sheds_abandoned_requests_and_survives():
    """A request abandoned by its submitter (client timeout) must be SHED —
    counted in stats and skipped — and the batcher thread must SURVIVE to
    serve later requests. Regression: ``shed_requests`` was missing from the
    stats initializer, so the first shed raised KeyError outside _loop's
    try/except and permanently killed the batcher daemon (every subsequent
    request then hung out its full submit timeout)."""
    import time

    import multi_task_breast_cancer_tpu.serve.server as S

    release = threading.Event()

    class StubBackend:
        info = {"task": "classification", "n_classes": 3,
                "pipeline_refinement": False, "softmax_in_forward": False}
        calls = 0

        def predict(self, images):
            StubBackend.calls += 1
            if StubBackend.calls == 1:
                release.wait(10)  # hold the batcher inside the device call
            return {"logits": np.zeros((images.shape[0], 3), np.float32)}

        def postprocess(self, out):
            class _P:
                masks = None
                mask_scale = 1

                def record(self, i):
                    return {"i": int(i)}
            return _P()

    b = S.MicroBatcher(StubBackend(), max_batch=4, batch_wait_ms=1.0)
    try:
        img = np.zeros((1, SIZE, SIZE, 1), np.float32)
        t_a = threading.Thread(target=lambda: b.submit_many(img.copy()))
        t_a.start()                    # A occupies the batcher in predict()
        time.sleep(0.3)
        with pytest.raises(TimeoutError):
            b.submit_many(img.copy(), timeout_s=0.2)  # B abandons while queued
        release.set()
        t_a.join(timeout=10)
        # FIFO: by the time C answers, the shed B has been collected
        out = b.submit_many(img.copy(), timeout_s=10)
        assert len(out) == 1
        assert b.stats["shed_requests"] == 1
        assert b._thread.is_alive()
    finally:
        release.set()
        b.close()


def test_microbatcher_close_fails_pending_requests():
    """close() must fail queued/carried requests immediately instead of
    leaving their clients to wait out the full submit timeout."""
    import multi_task_breast_cancer_tpu.serve.server as S

    class StubBackend:
        info = {"task": "classification", "n_classes": 3,
                "pipeline_refinement": False, "softmax_in_forward": False}

        def predict(self, images):
            return {"logits": np.zeros((images.shape[0], 3), np.float32)}

    b = S.MicroBatcher(StubBackend(), max_batch=4, batch_wait_ms=1.0)
    # stop the loop first so the pending work below is deterministic
    b._stop.set()
    b._thread.join(timeout=5)
    img = np.zeros((1, SIZE, SIZE, 1), np.float32)
    queued, carried = S._Pending(images=img), S._Pending(images=img)
    b._queue.put(queued)
    b._carry = carried
    b.close()
    for p in (queued, carried):
        assert p.event.is_set()
        assert p.error == "server shutting down"
    with pytest.raises(RuntimeError, match="shutting down"):
        raise RuntimeError(queued.error)


def test_compact_semantic_two_channel_vote_no_crash():
    """A 2-channel semantic head has no 'malignant' count — the compact vote
    must degrade exactly like the raw path's (m == 2).sum() == 0 (benign),
    not IndexError past the counts array."""
    from multi_task_breast_cancer_tpu.serve.export import _compact_outputs
    from multi_task_breast_cancer_tpu.serve.post import postprocess_compact

    rng = np.random.default_rng(21)
    final = rng.normal(size=(3, 8, 8, 2)).astype(np.float32)
    compact = jax.jit(lambda o: _compact_outputs(o, "segmentation", 3, False))(
        jnp.asarray(final))
    want = postprocess(final, "segmentation", 3, False)
    got = postprocess_compact(
        jax.tree_util.tree_map(np.asarray, compact), "segmentation", 3, False)
    np.testing.assert_array_equal(got.masks, want.masks)
    assert got.pred_class == want.pred_class
    assert got.mask_scale == want.mask_scale == 255


def test_semantic_model_export_round_trip(tmp_path):
    """Config-driven semantic segmentation (regions=3 head) exports and
    serves: the artifact's decoded label masks and pixel-vote classes match
    the live model's postprocess."""
    from multi_task_breast_cancer_tpu.config import DataConfig
    cfg = _cfg("BTSUNet")
    cfg.data = DataConfig(input_img="unused", batch_size=2,
                          classes=["benign", "malignant", "normal"],
                          semantic_segmentation=True)
    ckpt, model, tx, state = _checkpoint(cfg, "segmentation", tmp_path)
    art = export_inference(cfg, "segmentation", ckpt, tmp_path / "sem_art",
                           buckets=(1, 4), size=SIZE, platforms=("cpu",))
    m = load_exported(art, data_parallel=False)
    rng = np.random.default_rng(3)
    images = (rng.random((3, SIZE, SIZE, 1)) * 255).astype(np.float32)
    out = m.predict(images)
    final = out[-1] if isinstance(out, (tuple, list)) else out
    assert np.asarray(final).shape[-1] == 3  # 3-channel semantic head

    pb = postprocess(np.asarray(final), "segmentation", 3, False)
    assert pb.masks.shape == (3, SIZE, SIZE)
    assert set(np.unique(pb.masks)) <= {0, 1, 2}
    assert all(c in ("benign", "malignant") for c in pb.pred_class)
