"""Shared CLI glue for the six training entry points."""

from __future__ import annotations

import argparse
from pathlib import Path

from multi_task_breast_cancer_tpu.config import DEFAULT_CONFIG_YAML, load_config
from multi_task_breast_cancer_tpu.train.driver import run_experiment

DEFAULT_CONFIG_PATHS = ("./config.yaml", "./src/config.yaml")


def run_entry(task: str, mode: str) -> str:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None,
                        help="YAML config (defaults to ./config.yaml or ./src/config.yaml)")
    parser.add_argument("--run-root", default="runs")
    args = parser.parse_args()

    config_path = args.config
    if config_path is None:
        for cand in DEFAULT_CONFIG_PATHS:
            if Path(cand).exists():
                config_path = cand
                break
    if config_path is None:
        config_path = "./config.yaml"
        Path(config_path).write_text(DEFAULT_CONFIG_YAML)

    cfg = load_config(config_path)
    return run_experiment(cfg, task=task, mode=mode, config_src=config_path,
                          run_root=args.run_root)
