"""Shared CLI glue for the six training entry points."""

from __future__ import annotations

import argparse
from pathlib import Path

from multi_task_breast_cancer_tpu.config import DEFAULT_CONFIG_YAML, load_config
from multi_task_breast_cancer_tpu.parallel import multihost
from multi_task_breast_cancer_tpu.train.driver import run_experiment

DEFAULT_CONFIG_PATHS = ("./config.yaml", "./src/config.yaml")


def run_entry(task: str, mode: str) -> str:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None,
                        help="YAML config (defaults to ./config.yaml or ./src/config.yaml)")
    parser.add_argument("--run-root", default="runs")
    parser.add_argument("--coordinator", default=None,
                        help="host:port of the jax.distributed coordinator "
                             "(multi-host runs; also auto-detected on TPU pods)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--resume", default=None, metavar="RUN_DIR",
                        help="continue a killed/crashed run in place: completed "
                             "folds are skipped and an interrupted fold restarts "
                             "from its last checkpoint (per-epoch granularity "
                             "with training.checkpoint_every_epoch=True); "
                             "defaults to the run dir's own config.yaml")
    args = parser.parse_args()

    # Multi-host runtime init must happen before any device query. No-op on
    # single host; on pods/explicit clusters the mesh then spans all processes.
    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)

    config_path = args.config
    if config_path is None and args.resume is not None:
        cand = Path(args.resume) / "config.yaml"
        if cand.exists():
            config_path = str(cand)
    if config_path is None:
        for cand in DEFAULT_CONFIG_PATHS:
            if Path(cand).exists():
                config_path = cand
                break
    if config_path is None:
        config_path = "./config.yaml"
        Path(config_path).write_text(DEFAULT_CONFIG_YAML)

    cfg = load_config(config_path)
    # Non-coordinator processes of a multi-host run write their (redundant)
    # host-side artifacts to scratch; process 0 owns the real run dir.
    run_root = multihost.coordinator_run_root(args.run_root)
    resume = args.resume
    if resume is not None and run_root != args.run_root:
        # resumed runs write INTO the resume dir — give non-coordinator
        # processes a private copy so they replay the identical state without
        # clobbering process 0's (shared-filesystem) run dir
        import shutil
        dst = str(Path(run_root) / Path(resume.rstrip("/")).name)
        shutil.copytree(resume, dst)
        resume = dst
    return run_experiment(cfg, task=task, mode=mode, config_src=config_path,
                          run_root=run_root, resume_dir=resume)
