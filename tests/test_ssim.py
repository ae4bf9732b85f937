"""SSIM duplicate-recognition tests: value parity vs an independent numpy SSIM,
self-similarity, duplicate clustering into duplets/triplets, curation output."""

import numpy as np
import pytest

from multi_task_breast_cancer_tpu.data import ssim as S


def _numpy_ssim(a, b, win=11, sigma=1.5, L=255.0):
    """Independent reference implementation (scipy gaussian filtering)."""
    from scipy.ndimage import convolve
    half = (win - 1) / 2.0
    coords = np.arange(win) - half
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    k = np.outer(g, g)

    def filt(x):
        out = convolve(x.astype(np.float64), k, mode="constant")
        # crop to 'valid' region
        m = win // 2
        return out[m:-m, m:-m]

    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a ** 2
    var_b = filt(b * b) - mu_b ** 2
    cov = filt(a * b) - mu_a * mu_b
    C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    num = (2 * mu_a * mu_b + C1) * (2 * cov + C2)
    den = (mu_a ** 2 + mu_b ** 2 + C1) * (var_a + var_b + C2)
    return float(np.mean(num / den))


def test_identical_images_ssim_one():
    rng = np.random.default_rng(0)
    img = (rng.random((64, 64)) * 255).astype(np.float32)
    assert S.ssim(img, img) == pytest.approx(1.0, abs=1e-4)


def test_matches_independent_numpy_impl():
    rng = np.random.default_rng(1)
    a = (rng.random((64, 64)) * 255).astype(np.float32)
    b = np.clip(a + rng.normal(0, 20, a.shape), 0, 255).astype(np.float32)
    ours = S.ssim(a, b)
    ref = _numpy_ssim(a, b)
    assert ours == pytest.approx(ref, abs=1e-3)


def test_noise_pair_low_ssim():
    rng = np.random.default_rng(2)
    a = (rng.random((64, 64)) * 255).astype(np.float32)
    b = (rng.random((64, 64)) * 255).astype(np.float32)
    assert S.ssim(a, b) < 0.2


def test_find_duplicates_clusters():
    rng = np.random.default_rng(3)
    base1 = (rng.random((32, 32)) * 255).astype(np.float32)
    base2 = (rng.random((32, 32)) * 255).astype(np.float32)
    unique = (rng.random((32, 32)) * 255).astype(np.float32)
    # duplet of base1, triplet of base2 (tiny noise), one unique
    images = np.stack([
        base1, base1 + rng.normal(0, 1, base1.shape),
        base2, base2 + rng.normal(0, 1, base2.shape), base2.copy(),
        unique,
    ]).astype(np.float32)
    report = S.find_duplicates(images, threshold=0.9)
    assert report.group_size_histogram() == {2: 1, 3: 1}
    assert report.n_duplicated_images == 5


def test_curate_keeps_one_per_group(tmp_path):
    rng = np.random.default_rng(4)
    base = (rng.random((32, 32)) * 255).astype(np.float32)
    other = (rng.random((32, 32)) * 255).astype(np.float32)
    imgs = np.stack([base, base.copy(), other]).astype(np.float32)
    df, reports = S.curate_dataset(
        {"benign": (imgs, [7, 3, 9])}, threshold=0.9,
        output_csv=tmp_path / "curated.csv")
    # group {7,3} keeps lowest id 3; plus unique 9
    assert sorted(df["id"]) == [3, 9]
    text = (tmp_path / "curated.csv").read_text()
    assert text.splitlines()[0] == "class;id"
