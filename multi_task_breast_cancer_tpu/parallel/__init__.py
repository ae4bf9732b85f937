"""Parallelism: device mesh construction and data-parallel sharding helpers."""

from multi_task_breast_cancer_tpu.parallel.mesh import (  # noqa: F401
    data_mesh,
    data_space_mesh,
    device_count,
    replicate_to_mesh,
)
