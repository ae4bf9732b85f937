"""Entry point: single-task segmentation, k-fold CV.

Usage (reference-parity): ``python -m multi_task_breast_cancer_tpu.training_segmentation
[--config path/to/config.yaml]`` — equivalent of ``python -m src.training_segmentation``.
"""

from multi_task_breast_cancer_tpu._entry import run_entry


def main() -> None:
    run_entry(task="segmentation", mode="CV")


if __name__ == "__main__":
    main()
