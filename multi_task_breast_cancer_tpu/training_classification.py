"""Entry point: single-task classification, k-fold CV
(equivalent of ``python -m src.training_classification``)."""

from multi_task_breast_cancer_tpu._entry import run_entry


def main() -> None:
    run_entry(task="classification", mode="CV")


if __name__ == "__main__":
    main()
