"""Host-side image ops — capability twins of ``src/utils/images.py`` and the
augment-channel construction in ``src/dataset/BUSI_dataset.py:110-139``."""

import numpy as np
import pytest

from multi_task_breast_cancer_tpu.ops import image_ops as io


def test_count_pixels():
    seg = np.array([[0, 1, 1], [2, 2, 2], [0, 0, 0]])
    assert io.count_pixels(seg) == {0: 4, 1: 2, 2: 3}


def test_min_max_scaler():
    x = np.array([10.0, 20.0, 30.0])
    np.testing.assert_allclose(np.asarray(io.min_max_scaler(x)), [0, 0.5, 1])
    # constant image stays finite
    assert np.isfinite(np.asarray(io.min_max_scaler(np.full(4, 7.0)))).all()


def test_postprocess_binary_threshold():
    seg = np.zeros((8, 8), int)
    seg[:2, :2] = 1  # 4 tumor pixels
    assert io.postprocess_binary_segmentation(seg, threshold=4).sum() == 0
    assert io.postprocess_binary_segmentation(seg, threshold=3).sum() == 4


def test_postprocess_semantic_majority_relabel():
    seg = np.array([[1, 1, 2], [0, 0, 0]])
    out = io.postprocess_semantic_segmentation(seg)
    assert set(np.unique(out)) == {0, 1}  # benign majority wins
    seg2 = np.array([[1, 2, 2], [0, 0, 0]])
    assert set(np.unique(io.postprocess_semantic_segmentation(seg2))) == {0, 2}


def test_fill_holes():
    mask = np.zeros((7, 7), int)
    mask[1:6, 1:6] = 1
    mask[3, 3] = 0  # enclosed hole
    filled = io.fill_holes(mask)
    assert filled[3, 3] == 1
    assert filled.sum() == 25


def test_augment_channels_order_and_values():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    flags = {name: True for name in io.AUGMENT_CHANNEL_FNS}
    chans = io.build_augment_channels(img, flags)
    assert chans.shape == (16, 16, 6)
    # reference stacking order (BUSI_dataset.py:110-139)
    np.testing.assert_array_equal(chans[..., 0], io.clahe(img))
    np.testing.assert_array_equal(chans[..., 1], io.sobel_magnitude(img))
    np.testing.assert_array_equal(chans[..., 2], io.brightness_brighter(img))
    np.testing.assert_array_equal(chans[..., 3], io.brightness_darker(img))
    np.testing.assert_array_equal(chans[..., 4], io.contrast_low(img))
    np.testing.assert_array_equal(chans[..., 5], io.contrast_high(img))
    # none active → zero-width channel stack
    assert io.build_augment_channels(img, {}).shape == (16, 16, 0)


def test_brightness_contrast_cv2_semantics():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    delta = np.full_like(img, 80)
    np.testing.assert_array_equal(io.brightness_brighter(img), cv2.add(img, delta))
    np.testing.assert_array_equal(io.brightness_darker(img), cv2.subtract(img, delta))
