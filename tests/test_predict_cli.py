"""Serving CLI smoke test: checkpoint → predict over a folder of raw PNGs."""

import json
import subprocess
import sys
import jax
import jax.numpy as jnp
import numpy as np


def test_predict_cli(tmp_path):
    import cv2

    # tiny config
    config = tmp_path / "config.yaml"
    config.write_text("""
model:
  architecture: BTSUNet
  sequences: 1
  width: 4
  deep_supervision: False
training:
  seed: 1
data:
  batch_size: 2
  classes: [benign, malignant, normal]
""")

    # save an untrained checkpoint
    from multi_task_breast_cancer_tpu.models import init_segmentation_model
    from multi_task_breast_cancer_tpu.train.checkpoint import save_checkpoint
    from multi_task_breast_cancer_tpu.train.optim import init_optimizer
    from multi_task_breast_cancer_tpu.train.state import create_train_state

    model = init_segmentation_model("BTSUNet", width=4)
    tx = init_optimizer("Adam", 1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), state, epoch=0, val_loss=1.0)

    # raw input images
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"case_{i}.png"),
                    (rng.random((80, 70)) * 255).astype(np.uint8))

    out_dir = tmp_path / "pred"
    proc = subprocess.run(
        [sys.executable, "-m", "multi_task_breast_cancer_tpu.predict",
         "--config", str(config), "--task", "segmentation",
         "--checkpoint", str(ckpt), "--images", str(img_dir),
         "--output", str(out_dir), "--size", "64"],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root", "PYTHONPATH": "/root/repo"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    records = json.loads((out_dir / "predictions.json").read_text())
    assert len(records) == 3
    assert all("tumor_pixels" in r for r in records)
    assert len(list((out_dir / "segs").glob("*_seg.png"))) == 3
