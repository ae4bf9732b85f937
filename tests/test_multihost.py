"""Multi-host support: a REAL 2-process jax.distributed run on CPU.

Spawns two subprocesses that initialise through
``parallel.multihost.initialize`` (explicit coordinator — the same path a
manual cluster uses), build the global data mesh, shard a batch with
``process_local_slice`` + ``make_array_from_process_local_data``, and run a
jitted gradient step whose all-reduce crosses processes (Gloo on CPU; the
identical program rides ICI/DCN on TPU pods). The reference has no
distributed capability at all — this is a new-framework feature, tested for
correctness against the analytic result.
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

from multi_task_breast_cancer_tpu.parallel import multihost
from multi_task_breast_cancer_tpu.parallel.mesh import data_mesh

active = multihost.initialize(coordinator_address=f"localhost:{port}",
                              num_processes=2, process_id=proc_id)
assert active, "distributed init did not activate"
assert jax.process_count() == 2
assert jax.device_count() == 4  # 2 hosts x 2 virtual cpu devices

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = data_mesh()
assert mesh is not None and mesh.devices.size == 4

# global batch of 8 rows; each process owns its half via process_local_slice
n_global = 8
sl = multihost.process_local_slice(n_global)
assert sl == slice(4 * proc_id, 4 * proc_id + 4)
x_global = np.arange(n_global, dtype=np.float32).reshape(n_global, 1)
spec = NamedSharding(mesh, P("data"))
x = jax.make_array_from_process_local_data(spec, x_global[sl], (n_global, 1))

w = jnp.ones((1,), jnp.float32)

def loss_fn(w, x):
    return jnp.mean(jnp.square(x[:, 0] * w[0]))

g = jax.jit(jax.grad(loss_fn), out_shardings=NamedSharding(mesh, P()))(w, x)
# d/dw mean((x*w)^2) at w=1 -> 2*mean(x^2) = 2*140/8 = 35
expected = 2.0 * float(np.mean(x_global ** 2))
got = float(jax.device_get(g)[0])
assert abs(got - expected) < 1e-5, (got, expected)
print(f"OK proc={proc_id} grad={got}", flush=True)

# ---- phase 2: spatial partitioning ACROSS processes ----------------------
# (1 data x 4 space) mesh: the 'space' axis spans both hosts, so the conv
# halo exchange between row shards 1|2 must cross the process boundary
# (Gloo here; DCN on a real multi-host pod).
from multi_task_breast_cancer_tpu.parallel.mesh import data_space_mesh
import jax.lax as lax

smesh = data_space_mesh(4)
assert smesh.devices.shape == (1, 4)
B, H, W = 1, 16, 8
rng = np.random.default_rng(0)
img = rng.standard_normal((B, H, W, 1)).astype(np.float32)
k = rng.standard_normal((3, 3, 1, 1)).astype(np.float32)
sspec = NamedSharding(smesh, P(None, "space"))
xs = jax.make_array_from_process_local_data(
    sspec, img[:, proc_id * 8:proc_id * 8 + 8], (B, H, W, 1))

def conv_sharded(x):
    y = lax.conv_general_dilated(x, jnp.asarray(k), (1, 1), "SAME",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.lax.with_sharding_constraint(y, sspec)

f = jax.jit(conv_sharded, out_shardings=NamedSharding(smesh, P()))
txt = f.lower(xs).compile().as_text()
assert "collective-permute" in txt, "no cross-shard conv halo exchange"
y = np.asarray(jax.device_get(f(xs)))[0, :, :, 0]

# expected: 3x3 SAME correlation computed with plain numpy
pad = np.pad(img[0, :, :, 0], 1)
exp = sum(k[di, dj, 0, 0] * pad[di:di + H, dj:dj + W]
          for di in range(3) for dj in range(3))
assert np.allclose(y, exp, atol=1e-5), np.abs(y - exp).max()
print(f"OK-SPATIAL proc={proc_id} halo-exchange-across-hosts", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_training_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
           "PYTHONPATH": str(Path(__file__).resolve().parent.parent)}
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"OK proc={i}" in out
        assert f"OK-SPATIAL proc={i}" in out


@pytest.mark.slow
def test_two_process_full_driver_run(tmp_path):
    """The COMPLETE training CLI under a real 2-process ``jax.distributed``
    run (4 global CPU devices): both processes execute the whole driver
    (every collective program must be dispatched by every process); only
    process 0 writes the user-visible run dir — the other is redirected to
    scratch (``multihost.coordinator_run_root``). Asserts the standard
    artifact contract comes out of process 0 exactly once."""
    import pandas as pd

    from multi_task_breast_cancer_tpu.data import synthetic

    root = synthetic.make_preprocessed_busi(tmp_path / "busi",
                                            n_per_class=8, size=32)
    cfg = tmp_path / "config.yaml"
    cfg.write_text(f"""
model:
  architecture: Multi_BTSUNet
  sequences: 1
  width: 4
  deep_supervision: False
optimizer:
  opt: Adam
  lr: 0.001
  scheduler: plateau
training:
  seed: 1993
  epochs: 1
  CV: 2
data:
  input_img: {root}
  batch_size: 4
  classes: [benign, malignant, normal]
  oversampling: False
""")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    run_root = tmp_path / "runs"
    env = {"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
           "PYTHONPATH": str(Path(__file__).resolve().parent.parent),
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    procs = [subprocess.Popen(
        [sys.executable, "-m", "multi_task_breast_cancer_tpu.training_multitask",
         "--config", str(cfg), "--run-root", str(run_root),
         "--coordinator", f"localhost:{port}",
         "--num-processes", "2", "--process-id", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert "Total time for all of the folds" in out

    # exactly ONE user-visible run dir, with the full artifact contract
    run_dirs = [d for d in run_root.iterdir() if d.is_dir()]
    assert len(run_dirs) == 1, run_dirs
    run = run_dirs[0]
    for n in (0, 1):
        m = pd.read_csv(run / f"fold_{n}" / "metrics.csv")
        assert len(m) == 1
        assert m.notna().all().all()
        assert (run / f"fold_{n}" / "results_segmentation.csv").exists()
        assert (run / f"fold_{n}" / "results_classification.csv").exists()

    # --resume under 2 processes: non-coordinator resumes from a private
    # scratch COPY (a resumed run writes into its run dir — without the copy
    # it would clobber process 0's on a shared filesystem). Resuming the
    # completed run skips all folds and regenerates end-of-run artifacts.
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port2 = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, "-m", "multi_task_breast_cancer_tpu.training_multitask",
         "--resume", str(run), "--run-root", str(run_root),
         "--coordinator", f"localhost:{port2}",
         "--num-processes", "2", "--process-id", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume proc {i} failed:\n{out[-4000:]}"
    assert len([d for d in run_root.iterdir() if d.is_dir()]) == 1
    assert (run / "results_segmentation.xlsx").exists()


def test_initialize_noop_on_single_host(monkeypatch):
    """No coordinator + no pod env ⇒ returns False with zero side effects."""
    from multi_task_breast_cancer_tpu.parallel import multihost
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert multihost.initialize() is False
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert multihost.initialize() is False


def test_initialize_attempts_in_megascale_only_env(monkeypatch):
    """A multislice env sets MEGASCALE_COORDINATOR_ADDRESS but not
    necessarily TPU_WORKER_HOSTNAMES — auto-detect must still attempt
    jax.distributed.initialize (regression: the localhost guard used to
    veto it, leaving each process with only its local devices)."""
    import jax

    from multi_task_breast_cancer_tpu.parallel import multihost
    monkeypatch.setenv("MEGASCALE_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    assert multihost.initialize() is True
    assert calls == [{"coordinator_address": None, "num_processes": None,
                      "process_id": None}]


def test_process_local_slice_rejects_uneven_batch(monkeypatch):
    """A global batch that does not shard evenly over the processes must
    fail loudly — a floor-divided slice would leave the trailing samples
    owned by no process (silently never trained on)."""
    import jax

    from multi_task_breast_cancer_tpu.parallel import multihost
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    assert multihost.process_local_slice(8) == slice(6, 8)
    with pytest.raises(ValueError, match="does not shard evenly"):
        multihost.process_local_slice(10)
