"""SSIM duplicate recognition — the curation step that built Curated BUSI.

The reference repo only *describes* this step (README.md:29-37: 330 duplicated
BUSI images found via SSIM — 5 quadruplets, 22 triplets, 122 duplets) and ships
its output (``data/mapping_curated_BUSI.csv``); no code exists. This module
implements it from that spec, TPU-first:

- classic Wang et al. SSIM with an 11×11 Gaussian window (σ=1.5, L=255);
- **batched pairwise evaluation**: per-image windowed statistics (μ, μ²-E[x²])
  are computed once for all N images with depthwise convs; per-pair terms (the
  cross-correlation E[xy]) are evaluated for pair *chunks* under vmap+jit so
  the O(N²/2) within-class pair sweep runs as large fused conv batches on the
  MXU/VPU instead of a host double loop;
- union-find clustering of pairs above threshold → duplet/triplet/…-groups;
- a curation tool that keeps one representative per group and writes a
  ``class;id`` CSV like ``mapping_curated_BUSI.csv``.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_WIN = 11
_SIGMA = 1.5
_L = 255.0
_C1 = (0.01 * _L) ** 2
_C2 = (0.03 * _L) ** 2


def _gaussian_kernel(win: int = _WIN, sigma: float = _SIGMA) -> np.ndarray:
    half = (win - 1) / 2.0
    coords = np.arange(win) - half
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2(x: Array, kernel: Array) -> Array:
    """'Valid' windowed filtering of (B, H, W) with a (k, k) kernel."""
    x = x[:, None, :, :]  # NCHW, C=1
    k = kernel[None, None, :, :]
    out = jax.lax.conv_general_dilated(x, k, window_strides=(1, 1), padding="VALID")
    return out[:, 0, :, :]


@functools.partial(jax.jit, static_argnames=())
def _image_stats(images: Array, kernel: Array) -> Tuple[Array, Array]:
    """Per-image windowed mean and variance term: μ, E[x²]−μ² (B, H', W')."""
    mu = _filter2(images, kernel)
    ex2 = _filter2(images * images, kernel)
    return mu, ex2 - mu * mu


@jax.jit
def _pair_ssim(img_a: Array, img_b: Array, mu_a: Array, mu_b: Array,
               var_a: Array, var_b: Array, kernel: Array) -> Array:
    """Mean SSIM for aligned pair batches (P, H, W) → (P,)."""
    exy = _filter2(img_a * img_b, kernel)
    cov = exy - mu_a * mu_b
    num = (2 * mu_a * mu_b + _C1) * (2 * cov + _C2)
    den = (mu_a ** 2 + mu_b ** 2 + _C1) * (var_a + var_b + _C2)
    return jnp.mean(num / den, axis=(1, 2))


def ssim_pairwise(images: np.ndarray, pairs: np.ndarray,
                  chunk: int = 512) -> np.ndarray:
    """Mean SSIM for every (i, j) row of ``pairs`` over (N, H, W) float images
    in [0, 255]. Windowed per-image stats are computed once; only the cross
    term runs per pair."""
    kernel = jnp.asarray(_gaussian_kernel())
    imgs = jnp.asarray(images, jnp.float32)
    mu, var = _image_stats(imgs, kernel)

    out = np.empty(len(pairs), np.float32)
    n_pad = (-len(pairs)) % chunk
    padded = np.concatenate([pairs, pairs[:1].repeat(n_pad, 0)]) if n_pad else pairs
    for start in range(0, len(padded), chunk):
        block = padded[start:start + chunk]
        ia, ib = block[:, 0], block[:, 1]
        vals = _pair_ssim(imgs[ia], imgs[ib], mu[ia], mu[ib],
                          var[ia], var[ib], kernel)
        end = min(start + chunk, len(pairs))
        out[start:end] = np.asarray(vals)[: end - start]
    return out


def ssim(img_a: np.ndarray, img_b: np.ndarray) -> float:
    """Single-pair convenience wrapper."""
    images = np.stack([img_a, img_b]).astype(np.float32)
    return float(ssim_pairwise(images, np.array([[0, 1]]))[0])


class _UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, a: int) -> int:
        while self.parent[a] != a:
            self.parent[a] = self.parent[self.parent[a]]
            a = self.parent[a]
        return a

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


@dataclasses.dataclass
class DuplicateReport:
    groups: List[List[int]]          # index groups of size ≥ 2
    ssim_matrix_pairs: np.ndarray    # (n_pairs, 3): i, j, ssim

    @property
    def n_duplicated_images(self) -> int:
        return sum(len(g) for g in self.groups)

    def group_size_histogram(self) -> Dict[int, int]:
        hist: Dict[int, int] = {}
        for g in self.groups:
            hist[len(g)] = hist.get(len(g), 0) + 1
        return hist


def find_duplicates(images: np.ndarray, threshold: float = 0.9,
                    chunk: int = 512) -> DuplicateReport:
    """All-pairs SSIM over (N, H, W) images; pairs ≥ threshold are clustered
    with union-find into duplicate groups (duplets/triplets/quadruplets…)."""
    n = images.shape[0]
    ii, jj = np.triu_indices(n, k=1)
    pairs = np.stack([ii, jj], axis=1)
    vals = ssim_pairwise(images, pairs, chunk=chunk)

    uf = _UnionFind(n)
    for (i, j), v in zip(pairs, vals):
        if v >= threshold:
            uf.union(int(i), int(j))
    clusters: Dict[int, List[int]] = {}
    for i in range(n):
        clusters.setdefault(uf.find(i), []).append(i)
    groups = sorted((g for g in clusters.values() if len(g) > 1),
                    key=lambda g: (-len(g), g[0]))
    trip = np.concatenate([pairs, vals[:, None]], axis=1)
    return DuplicateReport(groups=groups, ssim_matrix_pairs=trip)


def curate_dataset(class_images: Dict[str, Tuple[np.ndarray, Sequence[int]]],
                   threshold: float = 0.9,
                   output_csv: str | Path | None = None):
    """Per-class duplicate sweep keeping one representative (lowest id) per
    group; returns (curated DataFrame 'class;id', report per class). This is
    the tool that regenerates a ``mapping_curated_BUSI.csv``-style file from a
    raw BUSI tree (README.md:40-47)."""
    import pandas as pd

    rows = []
    reports = {}
    for cls, (imgs, ids) in class_images.items():
        ids = list(ids)
        report = find_duplicates(imgs, threshold=threshold)
        reports[cls] = report
        drop = set()
        for g in report.groups:
            keep = min(g, key=lambda ix: ids[ix])
            drop.update(ix for ix in g if ix != keep)
        for ix, id_ in enumerate(ids):
            if ix not in drop:
                rows.append({"class": cls, "id": id_})
        logging.info("ssim-curate[%s]: %d images, %d duplicate groups %s, kept %d",
                     cls, len(ids), len(report.groups),
                     report.group_size_histogram(), len(ids) - len(drop))
    df = pd.DataFrame(rows)
    if output_csv is not None:
        df.to_csv(output_csv, sep=";", index=False)
    return df, reports


def main() -> None:  # pragma: no cover
    """CLI: sweep a raw BUSI tree and write the curated-id CSV."""
    import argparse
    import cv2
    import pandas as pd  # noqa: F401

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", default="./data/Dataset_BUSI_with_GT")
    parser.add_argument("--output", default="./data/mapping_curated_generated.csv")
    parser.add_argument("--threshold", type=float, default=0.9)
    parser.add_argument("--size", type=int, default=128)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    class_images = {}
    for cls in ("benign", "malignant", "normal"):
        folder = Path(args.input) / cls
        imgs, ids = [], []
        for f in sorted(folder.glob("*.png")):
            if "mask" in f.stem:
                continue
            raw = f.stem.split(" ")[-1].replace("(", "").replace(")", "")
            img = cv2.imread(str(f), 0)
            imgs.append(cv2.resize(img, (args.size, args.size),
                                   interpolation=cv2.INTER_NEAREST))
            ids.append(int(raw))
        if imgs:
            class_images[cls] = (np.stack(imgs).astype(np.float32), ids)
    curate_dataset(class_images, threshold=args.threshold, output_csv=args.output)


if __name__ == "__main__":  # pragma: no cover
    main()
