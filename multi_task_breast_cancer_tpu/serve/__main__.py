"""Serving CLI.

    # compile a checkpoint into a deployable artifact (cpu+tpu)
    python -m multi_task_breast_cancer_tpu.serve export \
        --config config.yaml --task multitask \
        --checkpoint runs/.../model_..._fold_0 --output ./artifact \
        --buckets 1,8,64

    # run the online server from the artifact (no model code needed)
    python -m multi_task_breast_cancer_tpu.serve run --artifact ./artifact \
        --port 8000 --max-batch 64 --batch-wait-ms 5

    # or serve a checkpoint directly (live jit)
    python -m multi_task_breast_cancer_tpu.serve run \
        --config config.yaml --task multitask --checkpoint runs/.../model_...
"""

from __future__ import annotations

import argparse
import logging


def main() -> None:
    parser = argparse.ArgumentParser(prog="multi_task_breast_cancer_tpu.serve")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_exp = sub.add_parser("export", help="AOT-compile a checkpoint to a serving artifact")
    p_exp.add_argument("--config", default="./config.yaml")
    p_exp.add_argument("--task", default="multitask",
                       choices=["segmentation", "classification", "multitask"])
    p_exp.add_argument("--checkpoint", required=True)
    p_exp.add_argument("--output", required=True)
    p_exp.add_argument("--buckets", default="1,8,64",
                       help="comma-separated batch sizes to compile")
    p_exp.add_argument("--size", type=int, default=128)
    p_exp.add_argument("--platforms", default="cpu,tpu")
    p_exp.add_argument("--device-postprocess", action="store_true",
                       help="lower postprocessing (sigmoid/argmax/pixel "
                            "counts) into the artifact: it then emits uint8 "
                            "masks + probabilities (~6x fewer host-transfer "
                            "bytes than raw deep-supervision heads)")

    p_run = sub.add_parser("run", help="start the online inference server")
    p_run.add_argument("--artifact", help="exported artifact directory")
    p_run.add_argument("--config", default="./config.yaml")
    p_run.add_argument("--task", default="multitask",
                       choices=["segmentation", "classification", "multitask"])
    p_run.add_argument("--checkpoint")
    p_run.add_argument("--size", type=int, default=128)
    p_run.add_argument("--host", default="0.0.0.0")
    p_run.add_argument("--port", type=int, default=8000)
    p_run.add_argument("--max-batch", type=int, default=64)
    p_run.add_argument("--batch-wait-ms", type=float, default=5.0)

    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    if args.cmd == "export":
        from multi_task_breast_cancer_tpu.config import load_config
        from multi_task_breast_cancer_tpu.serve.export import export_inference
        cfg = load_config(args.config)
        export_inference(cfg, args.task, args.checkpoint, args.output,
                         buckets=[int(b) for b in args.buckets.split(",")],
                         size=args.size,
                         platforms=tuple(args.platforms.split(",")),
                         device_postprocess=args.device_postprocess)
        return

    from multi_task_breast_cancer_tpu.serve.server import (
        ArtifactBackend, CheckpointBackend, InferenceServer)
    if args.artifact:
        backend = ArtifactBackend(args.artifact)
    else:
        if not args.checkpoint:
            raise SystemExit("run: provide --artifact or --checkpoint")
        from multi_task_breast_cancer_tpu.config import load_config
        cfg = load_config(args.config)
        backend = CheckpointBackend(cfg, args.task, args.checkpoint,
                                    size=args.size, max_batch=args.max_batch)
    InferenceServer(backend, host=args.host, port=args.port,
                    max_batch=args.max_batch,
                    batch_wait_ms=args.batch_wait_ms).serve_forever()


if __name__ == "__main__":
    main()
