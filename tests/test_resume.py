"""CLI-level crash/resume: killing a run mid-fold and resuming with
``--resume`` must converge to artifacts byte-identical to an uninterrupted
run (PARITY D9's crash-recovery story).

The crash is injected deterministically by making the driver's checkpoint
write raise after N successful writes — i.e. the process dies in the window
between the metrics.csv row and the checkpoint write, the worst-ordered crash
point, which ``--resume`` handles by truncating metrics.csv back to the last
checkpointed epoch and re-running (same restored state + replayed host-RNG
stream ⇒ identical trajectory).
"""

from __future__ import annotations

from pathlib import Path

import pytest

from multi_task_breast_cancer_tpu.config import (
    Config, DataConfig, ModelConfig, OptimizerConfig, TrainingConfig)
from multi_task_breast_cancer_tpu.data import synthetic
from multi_task_breast_cancer_tpu.train import driver as driver_mod
from multi_task_breast_cancer_tpu.train.driver import run_experiment


def _config(root, task):
    return Config(
        model=ModelConfig(architecture="Multi_BTSUNet" if task == "multitask"
                          else "BTSUNet", width=4, deep_supervision=False),
        optimizer=OptimizerConfig(opt="Adam", lr=1e-3, scheduler="cosine", t_max=4),
        # per_epoch_test_artifacts guards a past bug: the per-epoch rewrite of
        # results_segmentation.csv must NOT make --resume treat an interrupted
        # fold as complete (completion is signalled by the .fold_complete
        # marker, not by result-file existence)
        training=TrainingConfig(seed=1993, epochs=3, CV=2,
                                checkpoint_every_epoch=True, data_parallel=False,
                                per_epoch_test_artifacts=(task == "segmentation")),
        data=DataConfig(input_img=str(root), batch_size=4, oversampling=False),
    )


def _artifact_bytes(run: Path) -> dict:
    out = {}
    for f in sorted(run.rglob("*")):
        if f.is_file() and (f.name.startswith("model_2") or f.suffix == ".csv"):
            # checkpoint payloads + all CSVs; filenames carry the run
            # timestamp, so key by fold-relative name with the ts stripped
            rel = str(f.relative_to(run))
            for tok in f.name.split("_"):
                if len(tok) == 8 and tok.isdigit():
                    rel = rel.replace(f.name, "CKPT" + f.suffix)
                    break
            out[rel] = f.read_bytes()
    return out


@pytest.mark.slow
@pytest.mark.parametrize("task,mode,crash_at", [
    # CV_PROD saves every epoch (6 calls total) — crash mid-fold-0
    ("multitask", "CV_PROD", 3),
    # CV saves on val improvement only; epoch 0 of each fold always improves
    # (best starts at 1e6), so the 2nd call is guaranteed to happen
    ("segmentation", "CV", 2),
])
def test_kill_and_resume_byte_identical(tmp_path, task, mode, crash_at, monkeypatch):
    root = synthetic.make_preprocessed_busi(tmp_path / "busi", n_per_class=8,
                                            size=32)

    # Run A: uninterrupted.
    run_a = Path(run_experiment(_config(root, task), task=task, mode=mode,
                                run_root=str(tmp_path / "a")))

    # Run B: crash before the crash_at-th checkpoint write, then resume.
    real_save = driver_mod.save_checkpoint
    calls = {"n": 0}

    def crashing_save(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == crash_at:
            raise RuntimeError("simulated kill between metrics row and ckpt")
        return real_save(*args, **kwargs)

    monkeypatch.setattr(driver_mod, "save_checkpoint", crashing_save)
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_experiment(_config(root, task), task=task, mode=mode,
                       run_root=str(tmp_path / "b"))
    monkeypatch.setattr(driver_mod, "save_checkpoint", real_save)

    run_b = next((tmp_path / "b").iterdir())
    resumed = Path(run_experiment(_config(root, task), task=task, mode=mode,
                                  resume_dir=str(run_b)))
    assert resumed == run_b

    a, b = _artifact_bytes(run_a), _artifact_bytes(run_b)
    assert set(a) == set(b)
    for rel in a:
        assert a[rel] == b[rel], f"artifact differs after resume: {rel}"


@pytest.mark.slow
def test_resume_renamed_run_dir_finds_checkpoints(tmp_path, monkeypatch):
    """--resume on a RENAMED run directory must still find the fold
    checkpoints (their filenames embed the original timestamp, no longer
    derivable from the directory name) and resume rather than restart."""
    root = synthetic.make_preprocessed_busi(tmp_path / "busi", n_per_class=8,
                                            size=32)
    real_save = driver_mod.save_checkpoint
    calls = {"n": 0}

    def crashing_save(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated kill")
        return real_save(*args, **kwargs)

    monkeypatch.setattr(driver_mod, "save_checkpoint", crashing_save)
    with pytest.raises(RuntimeError):
        run_experiment(_config(root, "multitask"), task="multitask",
                       mode="CV_PROD", run_root=str(tmp_path / "b"))
    monkeypatch.setattr(driver_mod, "save_checkpoint", real_save)

    orig = next((tmp_path / "b").iterdir())
    renamed = tmp_path / "b" / "exp_renamed"
    orig.rename(renamed)

    run_experiment(_config(root, "multitask"), task="multitask",
                   mode="CV_PROD", resume_dir=str(renamed))
    log = (renamed / "execution.log").read_text()
    assert "Fold 0: resuming from epoch" in log
    assert (renamed / "fold_1" / "results_classification.csv").is_file()
    assert (renamed / "fold_1" / ".fold_complete").is_file()


def test_resume_rejects_mismatched_config(tmp_path):
    """Resuming with different critical settings (seed here) would silently
    break fold membership / RNG replay — the driver must fail fast."""
    from multi_task_breast_cancer_tpu.config import DEFAULT_CONFIG_YAML

    run_dir = tmp_path / "20260101_000000_BTSUNet_4_batch_4_x"
    run_dir.mkdir()
    (run_dir / "config.yaml").write_text(DEFAULT_CONFIG_YAML)

    root = synthetic.make_preprocessed_busi(tmp_path / "busi", n_per_class=4,
                                            size=32)
    cfg = _config(root, "segmentation")
    assert cfg.training.seed == 1993  # default yaml also uses 1993…
    cfg.training.seed = 7  # …so force a mismatch
    with pytest.raises(SystemExit, match="config mismatch"):
        run_experiment(cfg, task="segmentation", mode="CV",
                       resume_dir=str(run_dir))


def test_resume_rejects_changed_optimizer_and_wrong_mode(tmp_path):
    """The guard must also cover trajectory-critical settings beyond the
    original short list (optimizer/loss/alpha/...), and a resume through a
    different entry point (CV vs CV_PROD) must be caught via the metrics.csv
    header contract."""
    from multi_task_breast_cancer_tpu.config import DEFAULT_CONFIG_YAML

    run_dir = tmp_path / "20260101_000000_BTSUNet_4_batch_4_x"
    (run_dir / "fold_0").mkdir(parents=True)
    (run_dir / "config.yaml").write_text(DEFAULT_CONFIG_YAML)

    root = synthetic.make_preprocessed_busi(tmp_path / "busi", n_per_class=4,
                                            size=32)
    cfg = _config(root, "segmentation")
    cfg.optimizer.lr = 0.5  # changed LR ⇒ different trajectory from resume on
    with pytest.raises(SystemExit, match="config mismatch"):
        run_experiment(cfg, task="segmentation", mode="CV",
                       resume_dir=str(run_dir))

    # wrong entry point: CV metrics header, resumed as CV_PROD
    cfg = _config(root, "segmentation")
    from multi_task_breast_cancer_tpu.config import config_to_yaml
    (run_dir / "config.yaml").write_text(config_to_yaml(cfg))
    from multi_task_breast_cancer_tpu.train.driver import METRIC_HEADERS
    (run_dir / "fold_0" / "metrics.csv").write_text(
        METRIC_HEADERS[("segmentation", "CV")] + "\n")
    with pytest.raises(SystemExit, match="entry point"):
        run_experiment(cfg, task="segmentation", mode="CV_PROD",
                       resume_dir=str(run_dir))


def test_resume_pre_round5_yaml_missing_fastaug_key(tmp_path):
    """Run dirs written before round 5 byte-copied the user's (possibly
    sparse) YAML, so ``training.fast_augmentation`` may be absent. The run
    trained under the OLD default (exact path, False); under the NEW default
    (True) a naive re-parse would read absence as True, the mismatch guard
    would compare True==True, and the remaining folds would silently train
    with different augmentation rounding. The driver must re-interpret
    absence as False — failing fast under the new default, and matching an
    explicit ``fast_augmentation: false`` resume config."""
    import yaml

    from multi_task_breast_cancer_tpu.config import config_to_yaml

    root = synthetic.make_preprocessed_busi(tmp_path / "busi", n_per_class=4,
                                            size=32)
    cfg = _config(root, "segmentation")
    doc = yaml.safe_load(config_to_yaml(cfg))
    del doc["training"]["fast_augmentation"]  # pre-round-5 sparse file
    run_dir = tmp_path / "20260101_000000_BTSUNet_4_batch_4_x"
    run_dir.mkdir()
    (run_dir / "config.yaml").write_text(yaml.safe_dump(doc))

    cfg.training.fast_augmentation = True  # the round-5 default
    with pytest.raises(SystemExit, match="fast_augmentation"):
        run_experiment(cfg, task="segmentation", mode="CV",
                       resume_dir=str(run_dir))

    # absence == False: with the old value pinned, the augmentation check
    # passes — prove it by tripping a DIFFERENT critical key (seed) and
    # asserting fast_augmentation is no longer among the mismatches
    cfg.training.fast_augmentation = False
    cfg.training.seed = 7
    with pytest.raises(SystemExit, match="seed") as exc:
        run_experiment(cfg, task="segmentation", mode="CV",
                       resume_dir=str(run_dir))
    assert "fast_augmentation" not in str(exc.value)
