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
    # every vertex sits at the 0.5 level crossing of a binary mask: one
    # coordinate is a half-integer (the interpolated midpoint of a cell
    # edge), the other an integer — wrong sub-cell interpolation would
    # still land inside the bounding box, so bounds alone prove nothing
    for r, col in c:
        assert 2.0 <= r <= 7.0 and 2.0 <= col <= 7.0
        fr, fc = r % 1.0, col % 1.0
        assert sorted((fr, fc)) == [0.0, 0.5], (r, col)


def test_two_blobs_two_contours():
    m = np.zeros((12, 24))
    m[2:5, 2:6] = 1.0
    m[7:10, 14:20] = 1.0
    cs = find_contours(m, 0.5)
    assert len(cs) == 2


def test_saddle_cells_keep_diagonal_blobs_separate():
    """Two diagonally-touching foreground pixels create saddle cells
    (cases 5 and 10); skimage's default resolves the center as BELOW the
    level, so the blobs must come out as two separate closed contours
    (regression: the saddles used to pair the low corners and merged
    them into one)."""
    for (r0, c0), (r1, c1) in ((((1, 1)), (2, 2)),   # main diag: case 10
                               (((1, 2)), (2, 1))):  # anti diag: case 5
        m = np.zeros((5, 5))
        m[r0, c0] = 1.0
        m[r1, c1] = 1.0
        cs = find_contours(m, 0.5)
        assert len(cs) == 2, f"diagonal pixels {(r0, c0)},{(r1, c1)} merged"
        for c in cs:
            assert np.allclose(c[0], c[-1])  # each closed


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


def test_boundary_grids_any_per_fig(tmp_path):
    """The subplot grid is derived from per_fig (was hardcoded 5x4:
    per_fig > 20 used to IndexError at the end of a full test pass)."""
    from ddti_tpu.eval.visualize import save_boundary_grids
    rng = np.random.default_rng(0)
    imgs = rng.random((25, 16, 16)).astype(np.float32)
    masks = (rng.random((25, 16, 16)) > 0.7).astype(np.float32)
    for per_fig, n_files in ((24, 2), (6, 5)):
        out = tmp_path / f"pf{per_fig}"
        out.mkdir()
        paths = save_boundary_grids(imgs, masks, masks, str(out),
                                    per_fig=per_fig)
        assert len(paths) == n_files
        assert all(p.endswith(".png") for p in paths)


def test_soft_mask_values():
    m = np.zeros((8, 8))
    m[2:6, 2:6] = 0.6  # soft foreground above the 0.5 level
    cs = find_contours(m, 0.5)
    assert len(cs) == 1
