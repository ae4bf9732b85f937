"""Measured baseline: the REFERENCE's own training loop, run in place.

Loads the reference's actual ``MTnnUNet`` torch model and criterion code from
``/root/reference`` (read-only, imported — not copied) and drives it with the
reference's training-step structure: batch size 2 (``src/config.yaml`` data
default), per-batch one-hot encode + H2D copies + ``.item()`` syncs, Adam
eps=1e-4 (``src/utils/experiment_init.py:187``), deep-supervised inversely
weighted multitask loss (``src/utils/criterions.py:52-77``), per-batch dice
and classification metric processing (``src/training_multitask.py:74-113``).

monai is not installed in this image, so the DICE criterion is re-stated
inline with the exact constants the reference passes
(``experiment_init.py:209-213``: include_background, sigmoid, smooth_dr=1,
smooth_nr=1) — cost-identical for throughput purposes.

Runs on CPU (no CUDA here; the reference's published runs used a GPU — see
BASELINE.md). The result anchors ``bench.py``'s ``vs_measured_torch_cpu``
field; run once and commit ``BASELINE_TORCH.json``.
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time
from pathlib import Path

import numpy as np
import torch

REF = Path("/root/reference/src")


def _load_module(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class MonaiStyleDiceLoss(torch.nn.Module):
    """DiceLoss(include_background=True, sigmoid=True, smooth_dr=1, smooth_nr=1)
    as configured by the reference (``experiment_init.py:209-213``)."""

    def forward(self, logits: torch.Tensor, target: torch.Tensor) -> torch.Tensor:
        probs = torch.sigmoid(logits)
        dims = tuple(range(2, logits.ndim))
        inter = torch.sum(probs * target, dim=dims)
        denom = torch.sum(probs, dim=dims) + torch.sum(target, dim=dims)
        return torch.mean(1.0 - (2.0 * inter + 1.0) / (denom + 1.0))


def main() -> None:
    torch.manual_seed(0)
    mt = _load_module("ref_mtnnunet", REF / "models/multitask/MTnnUNet.py")
    crit = _load_module("ref_criterions", REF / "utils/criterions.py")

    model = mt.MTnnUNet(sequences=1, regions=1, n_classes=3)
    n_params = sum(p.numel() for p in model.parameters() if p.requires_grad)
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-4, eps=1e-4)
    seg_criterion = MonaiStyleDiceLoss()
    cls_criterion = crit.FocalLoss(alpha=1.0, gamma=2.0)

    B, H = 2, 128
    n = 64
    rng = np.random.default_rng(0)
    images = torch.from_numpy(rng.random((n, 1, H, H), dtype=np.float32) * 255)
    masks = torch.from_numpy((rng.random((n, 1, H, H)) > 0.8).astype(np.float32))
    labels = torch.from_numpy(rng.integers(0, 3, n).astype(np.int64))
    dev = torch.device("cpu")

    def run_epoch() -> float:
        total = 0.0
        for k in range(n // B):
            sl = slice(k * B, (k + 1) * B)
            inputs = images[sl].to(dev)
            mk = masks[sl].to(dev)
            label = torch.nn.functional.one_hot(
                labels[sl].flatten(), num_classes=3).to(torch.float)
            optimizer.zero_grad(set_to_none=True)
            logits, outputs = model(inputs)
            seg_loss, cls_loss = \
                crit.apply_criterion_multitask_segmentation_classification(
                    seg_criterion, mk, outputs, cls_criterion, label, logits,
                    inversely_weighted=True)
            total_loss = 0.35 * seg_loss + (1 - 0.35) * cls_loss
            total += total_loss.item()  # the reference's per-batch sync
            total_loss.backward()
            optimizer.step()
            # per-batch metric processing (training_multitask.py:107-113)
            with torch.no_grad():
                seg = torch.sigmoid(outputs[-1]) > 0.5
                _ = (2 * (seg * mk).sum() / (seg.sum() + mk.sum() + 1e-9)).item()
                pred = torch.softmax(torch.mean(torch.stack(logits), dim=0), dim=1)
                _ = pred.argmax(dim=1).tolist()
        return total

    run_epoch()  # warmup (allocator, thread pools)
    t0 = time.perf_counter()
    epochs = 2
    for _ in range(epochs):
        run_epoch()
    dt = time.perf_counter() - t0
    imgs_per_sec = epochs * (n // B) * B / dt

    result = {
        "torch_cpu_imgs_per_sec": round(imgs_per_sec, 2),
        "model": "reference MTnnUNet (imported from /root/reference)",
        "n_params": n_params,
        "batch_size": B,
        "image_size": H,
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "host_cpus": __import__("os").cpu_count(),
        "note": "reference training-step structure incl. per-batch .item() "
                "syncs; GPU unavailable in this environment — see BASELINE.md "
                "for the assumed A100 anchor used by bench.py's vs_baseline",
    }
    Path("BASELINE_TORCH.json").write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
