"""Data-semantics parity tests (SURVEY.md section 7: "metric parity dies on
data drift, not model drift" — each rule here names its reference line).

Covers: torchvision-exact ColorJitter (ref dataset.py:113-120,455-459),
target-mask erosion (dataset.py:470-475), and the test-split view-pair
tables (dataset.py:406-420).
"""

import numpy as np
import pytest

from vanerf_tpu.data.jitter import (apply_jitter, color_jitter_ref,
                                    jitter_params, BRIGHTNESS, CONTRAST,
                                    SATURATION, HUE)
from vanerf_tpu.data.interhand import erode_target_mask


def rand_img(rs, h=24, w=24):
    return rs.randint(0, 256, (h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# ColorJitter
# ---------------------------------------------------------------------------

def test_jitter_params_draw_order_and_ranges():
    """get_params: randperm(4) then one uniform per factor, fixed draw
    order brightness/contrast/saturation/hue (torchvision ColorJitter)."""
    fn_idx, b, c, s, h = jitter_params(1234)
    assert sorted(fn_idx) == [0, 1, 2, 3]
    assert BRIGHTNESS[0] <= b <= BRIGHTNESS[1]
    assert CONTRAST[0] <= c <= CONTRAST[1]
    assert SATURATION[0] <= s <= SATURATION[1]
    assert HUE[0] <= h <= HUE[1]
    # deterministic per seed
    assert jitter_params(1234) == (fn_idx, b, c, s, h)
    # the op ORDER is randomized across seeds (ref relies on torch RNG;
    # the round-1 numpy approximation applied a fixed order)
    orders = {tuple(jitter_params(i)[0]) for i in range(40)}
    assert len(orders) > 5


def test_jitter_shared_seed_across_views():
    """torch.manual_seed(prob) before every view's jitter makes all views
    share one transform (ref dataset.py:374,455-459)."""
    rs = np.random.RandomState(0)
    img1, img2 = rand_img(rs), rand_img(rs)
    a1, a2 = color_jitter_ref(img1, 777), color_jitter_ref(img2, 777)
    np.testing.assert_array_equal(a1, color_jitter_ref(img1, 777))
    # different seeds give different transforms
    assert not np.array_equal(a1, color_jitter_ref(img1, 778))
    # same params applied to both views
    fn_idx, b, c, s, h = jitter_params(777)
    np.testing.assert_array_equal(a2, apply_jitter(img2, fn_idx, b, c, s, h))


def test_jitter_brightness_matches_blend_formula():
    """PIL ImageEnhance.Brightness = blend(black, img, factor)."""
    rs = np.random.RandomState(1)
    img = rand_img(rs)
    for b in (0.2, 0.7, 1.0, 1.8):
        out = apply_jitter(img, [0], b, 1, 1, 0)
        expect = np.clip(np.round(img.astype(np.float64) * b), 0, 255)
        assert np.abs(out.astype(np.int32) - expect).max() <= 1
    # identity factor is exact
    np.testing.assert_array_equal(apply_jitter(img, [0], 1.0, 1, 1, 0), img)


def test_jitter_contrast_matches_blend_formula():
    """PIL ImageEnhance.Contrast blends with the rounded mean of the
    L-converted image (ITU-R 601-2)."""
    rs = np.random.RandomState(2)
    img = rand_img(rs)
    ii = img.astype(np.int64)
    lum = (ii[..., 0] * 299 + ii[..., 1] * 587 + ii[..., 2] * 114) / 1000
    mean = int(np.mean(lum.astype(np.uint8)) + 0.5)
    for c in (0.3, 1.5):
        out = apply_jitter(img, [1], 1, c, 1, 0)
        expect = np.clip(np.round(mean + (img.astype(np.float64) - mean) * c),
                         0, 255)
        assert np.abs(out.astype(np.int32) - expect).max() <= 1


def test_jitter_saturation_matches_blend_formula():
    """PIL ImageEnhance.Color blends with the grayscale image."""
    rs = np.random.RandomState(3)
    img = rand_img(rs)
    ii = img.astype(np.int64)
    lum = np.round(
        (ii[..., 0] * 299 + ii[..., 1] * 587 + ii[..., 2] * 114) / 1000)
    for s in (0.2, 1.9):
        out = apply_jitter(img, [2], 1, 1, s, 0)
        expect = np.clip(
            np.round(lum[..., None] + (img.astype(np.float64)
                                       - lum[..., None]) * s), 0, 255)
        assert np.abs(out.astype(np.int32) - expect).max() <= 1
    # zero-saturation collapses to (near-)grayscale
    g = apply_jitter(img, [2], 1, 1, 0.0, 0)
    assert np.abs(g.max(-1).astype(int) - g.min(-1).astype(int)).max() <= 1


def test_jitter_hue_wraps_uint8():
    """Hue shift is a wrapping uint8 HSV-channel add (torchvision
    functional_pil.adjust_hue); factor 0 is identity."""
    # factor 0 still runs the (lossy, uint8-quantized) HSV roundtrip in
    # torchvision; fully-saturated colors roundtrip exactly
    red = np.zeros((4, 4, 3), np.uint8)
    red[..., 0] = 200
    np.testing.assert_array_equal(apply_jitter(red, [3], 1, 1, 1, 0.0), red)
    # pure red rotated by half the hue circle lands in the cyan range
    out = apply_jitter(red, [3], 1, 1, 1, 0.5)
    assert out[..., 0].max() < 100 and out[..., 1].min() > 100
    # negative factors wrap (uint8 modular add)
    out_neg = apply_jitter(red, [3], 1, 1, 1, -0.5)
    assert not np.array_equal(out_neg, red)


def test_jitter_op_order_matters():
    """Different fn_idx orders produce different images — the round-1
    fixed-order approximation could not reproduce this."""
    rs = np.random.RandomState(5)
    img = rand_img(rs)
    a = apply_jitter(img, [0, 1, 2, 3], 1.8, 0.5, 1.7, 0.2)
    b = apply_jitter(img, [3, 2, 1, 0], 1.8, 0.5, 1.7, 0.2)
    assert not np.array_equal(a, b)


# ---------------------------------------------------------------------------
# mask erosion (ref dataset.py:470-475)
# ---------------------------------------------------------------------------

def test_erode_target_mask_thresholds():
    img = np.zeros((2, 3, 3), np.float32)
    img[..., 1] = [[0.02, 0.05, 0.2], [0.0, 0.09, 0.11]]
    mask = np.ones((2, 3), np.uint8)
    # jitter flag on -> threshold 0.03
    i1, m1 = erode_target_mask(img, mask, True)
    np.testing.assert_array_equal(m1, [[0, 1, 1], [0, 1, 1]])
    # jitter flag off -> threshold 0.1
    i2, m2 = erode_target_mask(img, mask, False)
    np.testing.assert_array_equal(m2, [[0, 0, 1], [0, 0, 1]])
    # eroded pixels are zeroed in the image, inputs not mutated
    assert (i2[m2 == 0] == 0).all()
    assert mask.all() and img[..., 1].max() > 0


# ---------------------------------------------------------------------------
# test-split view-pair tables (ref dataset.py:406-420)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("capture_id,big,expected", [
    (0, False, {"0": [37, 44], "1": [8, 16], "2": [23, 25],
                "3": [41, 43], "4": [55, 56]}),
    (2, False, {"0": [0, 3], "1": [1, 2], "2": [4, 5],
                "3": [8, 9], "4": [16, 17]}),
    (1, True, {"0": [0, 1], "1": [1, 2], "2": [2, 3],
               "3": [5, 6], "4": [11, 12]}),
    (7, True, {"0": [0, 3], "1": [0, 4], "2": [0, 6],
               "3": [4, 8], "4": [0, 13]}),
    # capture "10" contains the digit '0' -> the 01 table, exactly like
    # the reference's substring test (dataset.py:414)
    (10, False, {"0": [37, 44], "1": [8, 16], "2": [23, 25],
                 "3": [41, 43], "4": [55, 56]}),
])
def test_view_pair_tables(capture_id, big, expected):
    import random
    from vanerf_tpu.data.interhand import InterHandDataset

    ds = InterHandDataset.__new__(InterHandDataset)
    ds.mode = "test"
    ds.big_view_variation = big
    ds.num_input_view = 1
    all_views = [(f"cam{i}", i) for i in range(60)]
    for index_res, pair in expected.items():
        views = ds.select_views(all_views, capture_id, int(index_res),
                                random.Random(0))
        # views[0] is the target, views[1:] the sources (dataset.py:419-420)
        assert views == [all_views[i] for i in pair]


def test_train_view_selection_disjoint():
    import random
    from vanerf_tpu.data.interhand import InterHandDataset

    ds = InterHandDataset.__new__(InterHandDataset)
    ds.mode = "train"
    ds.big_view_variation = False
    ds.num_input_view = 2
    all_views = [(f"cam{i}", i) for i in range(8)]
    views = ds.select_views(all_views, 0, 0, random.Random(3))
    assert len(views) == 3                      # target + 2 sources
    assert views[0] not in views[1:]            # disjoint (dataset.py:397-402)
    assert len(set(views)) == 3
