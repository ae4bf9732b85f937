"""fast_augmentation quality-neutrality benchmark (PARITY D13's open question).

Re-trains the ablation's MT and MT+DO rows (same data/seed/protocol as
``bench_ablation.py``) with ``training.fast_augmentation: true`` — the
opt-in 3-shear Pallas rotation that changes nearest-rounding semantics —
and compares every summary metric against the exact-parity arm recorded in
the matching ablation artifact. Quality-neutral = each |delta| within the
exact-parity arm's own fold spread (2σ, floor 0.02), and the PR-rescue
structure reproduces.

Protocols (same switch as bench_ablation):
- default (harness: epochs 80, batch 8): baseline ``ABLATION_r03.json``,
  writes ``FASTAUG_QUALITY_r03.json``;
- ``MTBC_ABLATION_PROTOCOL=reference`` (the reference's own regime,
  ``config.yaml:24-36``: epochs 200, batch 2, patience 50): baseline
  ``ABLATION_r05.json``, writes ``FASTAUG_QUALITY_r05.json`` — the
  decision-grade evidence for flipping the fast path to default.

Run on TPU (~12 min harness / ~50 min reference; the Pallas kernel path
requires a TPU — this harness has no CPU mode).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from pathlib import Path

import bench_ablation as BA

BASELINE_PATH = ("ABLATION_r05.json" if BA.PROTOCOL == "reference"
                 else "ABLATION_r03.json")
OUT_PATH = ("FASTAUG_QUALITY_r05.json" if BA.PROTOCOL == "reference"
            else "FASTAUG_QUALITY_r03.json")


def main() -> None:
    from multi_task_breast_cancer_tpu.data import synthetic

    baseline = json.loads(Path(BASELINE_PATH).read_text())
    fp = synthetic.hard_calibration_fingerprint()
    base_fp = baseline["config"].get("generator_fingerprint")
    if base_fp is not None and base_fp != fp:
        raise SystemExit(
            f"generator calibration drift: {BASELINE_PATH} was produced "
            f"with fingerprint {base_fp}, current generator is {fp} — the "
            f"within-fold-spread comparison would confound data "
            f"recalibration with augmentation semantics; regenerate the "
            f"baseline (bench_ablation.py) first")
    # crash resilience (same scheme as bench_ablation): MTBC_FASTAUG_TMP pins
    # the workdir so a killed run resumes via the driver's crash-resume, and
    # each finished variant checkpoints the artifact-so-far to <out>.partial.
    tmp_pin = os.environ.get("MTBC_FASTAUG_TMP")
    tmp = Path(tmp_pin) if tmp_pin else Path(tempfile.mkdtemp(
        prefix="mtbc_fastaug_"))
    root = synthetic.make_hard_busi(tmp / "busi", size=128, seed=7,
                                    difficulty=BA.DIFFICULTY)

    results, walls = {}, {}
    for oversampling, do_tag in ((False, ""), (True, "+DO")):
        cfg = BA._config(root, oversampling)
        cfg.training.fast_augmentation = True
        t0 = time.perf_counter()
        run_path = BA._run_or_resume(cfg, "multitask",
                                     tmp / f"runs_fa{int(oversampling)}")
        walls[f"train_mt{do_tag or '_base'}"] = round(time.perf_counter() - t0, 1)
        # This artifact is the EVIDENCE behind the fast-aug default — it is
        # vacuous if the fast path never ran. The driver degrades to the
        # exact gather when batch_size doesn't divide the data-mesh axis
        # (e.g. batch 2 on a v5e-8), logging a warning; fail loudly instead
        # of measuring exact-vs-exact and reporting "neutral".
        log_text = (Path(run_path) / "execution.log").read_text()
        if "fast_augmentation disabled" in log_text:
            raise RuntimeError(
                "the driver degraded fast_augmentation to the exact path "
                f"(batch {BA.BATCH} does not divide the data-mesh axis) — "
                "this run would compare exact-vs-exact; re-run on a single "
                "chip (the protocol batch is fixed at 2) or disable "
                "data_parallel for the quality run")
        for use_pr, pr_tag in ((False, ""), (True, "+PR")):
            name = "MT" + pr_tag + do_tag
            rows = BA._posthoc_inference(
                cfg, run_path, use_pr,
                tmp / f"inf_{int(oversampling)}_{int(use_pr)}")
            summary = BA._summarize(rows)
            base = baseline["variants"][name]["summary"]
            deltas, ok = {}, {}
            for metric, s in summary.items():
                if metric not in base:  # harness gained a metric after the
                    continue            # baseline artifact was generated
                d = s["mean"] - base[metric]["mean"]
                tol = max(2.0 * base[metric]["std"], 0.02)
                deltas[metric] = round(d, 4)
                ok[metric] = bool(abs(d) <= tol)
            results[name] = {"summary": summary, "delta_vs_exact": deltas,
                             "within_fold_spread": ok}
            print(name, json.dumps(summary), "deltas:", json.dumps(deltas),
                  flush=True)
        Path(OUT_PATH + ".partial").write_text(
            json.dumps(_artifact(results, walls, fp), indent=1) + "\n")

    Path(OUT_PATH).write_text(
        json.dumps(_artifact(results, walls, fp), indent=1) + "\n")
    Path(OUT_PATH + ".partial").unlink(missing_ok=True)
    print(json.dumps({"neutral": _artifact(results, walls, fp)["neutral"]}))


def _artifact(results: dict, walls: dict, fp: str) -> dict:
    return {
        "protocol": f"{BASELINE_PATH} MT rows re-trained with "
                    "training.fast_augmentation=true (same data/seed/epochs/"
                    f"batch; regime: {BA.PROTOCOL}, epochs {BA.EPOCHS}, "
                    f"batch {BA.BATCH}, patience 50; "
                    "harness: bench_fastaug_quality.py)",
        "platform": __import__("jax").devices()[0].platform,
        "generator_fingerprint": fp,
        "wall_s": walls,
        "neutral": bool(all(all(v["within_fold_spread"].values())
                            for v in results.values())),
        "results": results,
    }


if __name__ == "__main__":
    main()
