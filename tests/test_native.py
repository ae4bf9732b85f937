"""Native C++ data-path library tests: builds via make, checks cv2-parity of
the resize and the numpy-parity of every op (fallback path covered too)."""

import numpy as np
import pytest
from multi_task_breast_cancer_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "g++ build of mtbc_native failed"


def test_resize_matches_cv2():
    import cv2
    rng = np.random.default_rng(0)
    img = (rng.random((97, 123)) * 255).astype(np.uint8)
    ours = native.nearest_resize(img, 128, 128)
    ref = cv2.resize(img, (128, 128), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, ref)


def test_resize_batch():
    rng = np.random.default_rng(1)
    imgs = (rng.random((5, 64, 48)) * 255).astype(np.uint8)
    out = native.nearest_resize_batch(imgs, 32, 32)
    assert out.shape == (5, 32, 32)
    np.testing.assert_array_equal(out[2], native.nearest_resize(imgs[2], 32, 32))


def test_add_saturate():
    a = np.array([250, 100, 0], np.uint8)
    b = np.array([10, 100, 5], np.uint8)
    np.testing.assert_array_equal(native.add_saturate(a, b), [255, 200, 5])


def test_binarize():
    m = np.array([0, 127, 128, 255], np.uint8)
    np.testing.assert_array_equal(native.binarize(m, 128), [0, 0, 1, 1])


def test_mask_stats():
    mask = np.zeros((10, 12), np.uint8)
    mask[2:5, 3:7] = 1
    s = native.mask_stats(mask)
    assert s == {"tumor_pixels": 12, "y_max": 5, "y_min": 2, "x_max": 7,
                 "x_min": 3, "y_size": 3, "x_size": 4}
    assert native.mask_stats(np.zeros((4, 4), np.uint8))["tumor_pixels"] == 0


def test_u8_to_f32():
    src = np.array([[0, 128], [255, 64]], np.uint8)
    np.testing.assert_allclose(native.u8_to_f32(src), src.astype(np.float32))
    norm = native.u8_to_f32(src, normalize=True)
    assert norm.min() == 0.0 and norm.max() == 1.0


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_fallback_bit_identical_to_native():
    """The pure-numpy fallbacks must be BIT-identical to the C kernels —
    otherwise preprocessed/served images would depend on whether g++ was
    present on the host (the resize index formula and the normalize
    reciprocal-multiply both round differently if written naively)."""
    rng = np.random.default_rng(0)

    def force_fallback(fn, *args, **kw):
        lib = native._lib
        native._lib = None
        orig_load = native._load
        native._load = lambda: None
        try:
            return fn(*args, **kw)
        finally:
            native._lib = lib
            native._load = orig_load

    # resize: every awkward non-power-of-2 pair that distinguishes
    # (y*sh)/dh from y*(sh/dh) rounding
    for sh, dh in [(2, 98), (3, 7), (97, 13), (128, 100), (5, 200),
                   (211, 64), (64, 211)]:
        src = rng.integers(0, 256, (sh, max(sh, 2)), dtype=np.uint8)
        a = native.nearest_resize(src, dh, dh)
        b = force_fallback(native.nearest_resize, src, dh, dh)
        np.testing.assert_array_equal(a, b, err_msg=f"resize {sh}->{dh}")

    # u8->f32 normalize: reciprocal-multiply rounding
    for lo, hi in [(0, 255), (3, 200), (17, 18), (100, 101), (5, 5)]:
        src = rng.integers(lo, hi + 1, (64, 64), dtype=np.uint8)
        src.flat[0], src.flat[1] = lo, hi  # pin the range
        a = native.u8_to_f32(src, normalize=True)
        b = force_fallback(native.u8_to_f32, src, normalize=True)
        np.testing.assert_array_equal(a, b, err_msg=f"normalize {lo}-{hi}")
