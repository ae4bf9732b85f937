"""Entry point: classification, production mode
(equivalent of ``python -m src.training_classification_prod``)."""

from multi_task_breast_cancer_tpu._entry import run_entry


def main() -> None:
    run_entry(task="classification", mode="CV_PROD")


if __name__ == "__main__":
    main()
