"""multi_task_breast_cancer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
multi-task breast-cancer ultrasound segmentation + classification.

Re-designed from scratch with the capabilities of the reference research codebase
``caumente/multi_task_breast_cancer`` (CMPB 2024): curated-BUSI data pipeline,
U-Net model zoo (BTS U-Net, FSB BTS U-Net, nnU-Net 2021, Residual U-Net, UNet++),
classification heads, shared-encoder multi-task models, MONAI-semantics losses,
prediction refinement, k-fold CV drivers, and reporting — all built TPU-first:

- NHWC layouts, static shapes, whole epochs under one jitted ``lax.scan``;
- data parallelism over a ``jax.sharding.Mesh`` with XLA collectives over ICI;
- Pallas kernels for the fused hot ops (instance-norm + LeakyReLU, fused losses);
- functional training core (init_fn / step_fn / eval_fn over pytrees).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (keeps `import multi_task_breast_cancer_tpu` light)."""
    if name == "load_config":
        from multi_task_breast_cancer_tpu.config import load_config
        return load_config
    if name == "run_experiment":
        from multi_task_breast_cancer_tpu.train.driver import run_experiment
        return run_experiment
    if name in ("init_segmentation_model", "init_classification_model",
                "init_multitask_model"):
        from multi_task_breast_cancer_tpu.models import registry
        return getattr(registry, name)
    if name == "Engine":
        from multi_task_breast_cancer_tpu.train.loop import Engine
        return Engine
    if name == "EngineConfig":
        from multi_task_breast_cancer_tpu.train.loop import EngineConfig
        return EngineConfig
    raise AttributeError(name)
