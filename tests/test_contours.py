"""Marching-squares contour extraction tests (skimage replacement)."""

import numpy as np

from ddti_tpu.eval.contours import find_contours


def test_single_square_one_closed_contour():
    m = np.zeros((10, 10))
    m[3:7, 3:7] = 1.0
    cs = find_contours(m, 0.5)
    assert len(cs) == 1
    c = cs[0]
    # closed loop
    assert np.allclose(c[0], c[-1])
    # all vertices at the 0.5 crossing: every vertex has one fractional
    # half-integer coordinate on a cell edge between 0 and 1
    vals = []
    for r, col in c:
        assert 2.0 <= r <= 7.0 and 2.0 <= col <= 7.0


def test_two_blobs_two_contours():
    m = np.zeros((12, 24))
    m[2:5, 2:6] = 1.0
    m[7:10, 14:20] = 1.0
    cs = find_contours(m, 0.5)
    assert len(cs) == 2


def test_empty_and_full():
    assert find_contours(np.zeros((8, 8)), 0.5) == []
    assert find_contours(np.ones((8, 8)), 0.5) == []


def test_interpolation_position():
    # a vertical edge between columns of 0 and 1: crossing at x = 0.5 exactly
    m = np.zeros((4, 4))
    m[:, 2:] = 1.0
    cs = find_contours(m, 0.5)
    assert len(cs) == 1
    cols = cs[0][:, 1]
    np.testing.assert_allclose(cols, 1.5)


def test_contour_level_float_field():
    yy, xx = np.mgrid[0:32, 0:32]
    field = np.hypot(yy - 16, xx - 16)
    cs = find_contours(field, 8.0)
    assert len(cs) == 1
    c = cs[0]
    radii = np.hypot(c[:, 0] - 16, c[:, 1] - 16)
    np.testing.assert_allclose(radii, 8.0, atol=0.15)


def test_soft_mask_values():
    m = np.zeros((8, 8))
    m[2:6, 2:6] = 0.6  # soft foreground above the 0.5 level
    cs = find_contours(m, 0.5)
    assert len(cs) == 1
