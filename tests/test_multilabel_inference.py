"""Semantic (multilabel) segmentation inference path — capability twin of
``src/utils/models.py:103-183`` (a library utility the reference drivers never
wire, like Adityan; exposed + tested here)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multi_task_breast_cancer_tpu.data.dataset import ArrayDataset
from multi_task_breast_cancer_tpu.models import init_segmentation_model
from multi_task_breast_cancer_tpu.train.inference import inference_multilabel_segmentation
from multi_task_breast_cancer_tpu.train.loop import Engine, EngineConfig
from multi_task_breast_cancer_tpu.train.optim import init_optimizer
from multi_task_breast_cancer_tpu.train.state import create_train_state


def test_multilabel_inference_artifacts(tmp_path):
    n, H, R = 6, 32, 3
    rng = np.random.default_rng(0)
    # one-hot semantic masks: channel argmax in {0: background, 1: benign, 2: malignant}
    labels_px = rng.integers(0, R, (n, H, H))
    masks = np.eye(R, dtype=np.float32)[labels_px]
    ds = ArrayDataset(
        images=rng.integers(0, 256, (n, H, H, 1)).astype(np.float32),
        masks=masks,
        labels=rng.integers(0, 2, n).astype(np.int32),
        patient_ids=np.arange(n),
        class_names=["benign", "malignant"] * (n // 2),
        tumor_pixels=np.zeros(n, np.int64),
    )
    model = init_segmentation_model("BTSUNet", regions=R, width=4)
    tx = init_optimizer("Adam", 1e-3)
    engine = Engine(model, tx, EngineConfig(task="segmentation", batch_size=n,
                                            use_transforms=False))
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, H, H, 1)))
    (tmp_path / "segs").mkdir()
    res = inference_multilabel_segmentation(engine, state, ds, str(tmp_path),
                                            postprocessing=True)
    assert len(res) == n
    assert {"class", "predicted_class", "numerical_class",
            "numerical_class_predicted"} <= set(res.columns)
    assert (tmp_path / "results.csv").exists()
    # per-image seg PNGs, raw + postprocessed
    assert len(list((tmp_path / "segs").glob("*_seg.png"))) == n
    assert len(list((tmp_path / "segs").glob("*_seg_postprocessed.png"))) == n
