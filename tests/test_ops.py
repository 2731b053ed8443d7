"""Resampling/CLAHE kernel parity vs the host libraries the reference
delegates to (PIL rotate, cv2 remap/GaussianBlur/CLAHE)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddti_tpu.ops.clahe import clahe_u8
from ddti_tpu.ops.resample import (
    gaussian_blur_17,
    remap,
    resize_bilinear_hw,
    rotate,
)

cv2 = pytest.importorskip("cv2")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def img_u8():
    return np.random.default_rng(3).integers(0, 256, (64, 80), np.uint8)


@pytest.mark.parametrize("angle", [17.3, -118.0, 90.0, 179.9, -45.5])
def test_rotate_matches_pil_nearest(img_u8, angle):
    ref = np.array(Image.fromarray(img_u8).rotate(angle))
    ours = np.asarray(rotate(jnp.asarray(img_u8, jnp.float32),
                             jnp.float32(angle)))
    # nearest-neighbor ties at cell boundaries may flip a handful of pixels
    assert (np.abs(ours - ref) > 0).mean() < 0.002


def test_remap_linear_matches_cv2(img_u8):
    h, w = img_u8.shape
    rng = np.random.default_rng(4)
    dx = rng.normal(0, 5, (h, w)).astype(np.float32)
    dy = rng.normal(0, 5, (h, w)).astype(np.float32)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    mx = (x + dx).astype(np.float32)
    my = (y + dy).astype(np.float32)
    src = img_u8.astype(np.float32)
    ref = cv2.remap(src, mx, my, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REFLECT)
    ours = np.asarray(remap(jnp.asarray(src), jnp.asarray(my),
                            jnp.asarray(mx)))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_remap_linear_extreme_displacements_match_cv2(img_u8):
    """Stress the pair-gather boundary logic: displacements large enough to
    reflect several times, hit both fold points (where the two bilinear
    taps collapse onto one column) and the negative side (where reflection
    REVERSES tap order in memory)."""
    h, w = img_u8.shape
    rng = np.random.default_rng(11)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    # uniform over [-2.5*w, 2.5*w): multiple reflection periods, plus exact
    # integer and half-integer coordinates to sit on fold points
    mx = rng.uniform(-2.5 * w, 2.5 * w, (h, w)).astype(np.float32)
    my = rng.uniform(-2.5 * h, 2.5 * h, (h, w)).astype(np.float32)
    mx[::7] = np.round(mx[::7])
    my[:, ::5] = np.round(my[:, ::5]) - 0.5
    src = img_u8.astype(np.float32)
    ref = cv2.remap(src, mx, my, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REFLECT)
    ours = np.asarray(remap(jnp.asarray(src), jnp.asarray(my),
                            jnp.asarray(mx)))
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_remap_pair_matches_separate_remaps(img_u8):
    """The fused one-gather image+mask remap equals the two standalone
    remaps exactly, including extreme multi-period reflections."""
    from ddti_tpu.ops.resample import remap_pair

    h, w = img_u8.shape
    rng = np.random.default_rng(13)
    mask = (rng.random((h, w)) > 0.5).astype(np.float32)
    src = img_u8.astype(np.float32)
    for scale in (5.0, 2.5 * max(h, w)):
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        mx = (x + rng.uniform(-scale, scale, (h, w))).astype(np.float32)
        my = (y + rng.uniform(-scale, scale, (h, w))).astype(np.float32)
        want_i = remap(jnp.asarray(src), jnp.asarray(my), jnp.asarray(mx))
        want_m = remap(jnp.asarray(mask), jnp.asarray(my), jnp.asarray(mx),
                       method="nearest")
        got_i, got_m = remap_pair(jnp.asarray(src), jnp.asarray(mask),
                                  jnp.asarray(my), jnp.asarray(mx))
        np.testing.assert_array_equal(np.asarray(got_i),
                                      np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(got_m),
                                      np.asarray(want_m))


def test_remap_nearest_matches_cv2(img_u8):
    h, w = img_u8.shape
    rng = np.random.default_rng(5)
    mx = (np.tile(np.arange(w), (h, 1))
          + rng.normal(0, 4, (h, w))).astype(np.float32)
    my = (np.tile(np.arange(h)[:, None], (1, w))
          + rng.normal(0, 4, (h, w))).astype(np.float32)
    ref = cv2.remap(img_u8, mx, my, cv2.INTER_NEAREST,
                    borderMode=cv2.BORDER_REFLECT)
    ours = np.asarray(remap(jnp.asarray(img_u8, jnp.float32),
                            jnp.asarray(my), jnp.asarray(mx),
                            method="nearest"))
    assert (np.abs(ours - ref) > 0).mean() < 0.002  # rounding ties only


@pytest.mark.parametrize("sigma", [6.0, 8.5, 10.0])
def test_gaussian_blur_matches_cv2(sigma):
    f = np.random.default_rng(6).random((48, 64)).astype(np.float32)
    ref = cv2.GaussianBlur(f, (17, 17), sigma)
    ours = np.asarray(gaussian_blur_17(jnp.asarray(f), jnp.float32(sigma)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("shape,grid,clip", [
    ((128, 128), (4, 4), 2.0), ((64, 128), (2, 4), 2.0),
    ((256, 256), (4, 4), 2.0),
    # small tiles + large residuals once hid half-pixel-interp and
    # residual-redistribution divergences inside +-1 rounding
    ((64, 64), (8, 8), 2.0), ((64, 64), (8, 8), 40.0),
    ((128, 128), (4, 4), 4.0),
    # ODD tile sides (25x25, 15x21): the half-tile-padded sweep is only
    # valid for even tiles, so these exercise the tap-gather fallback;
    # 1/odd blend weights are not dyadic, so f32 blending can land one
    # gray level off cv2's fixed-point arithmetic at rounding ties
    ((100, 100), (4, 4), 2.0), ((45, 63), (3, 3), 2.0),
])
def test_clahe_matches_cv2_exactly(shape, grid, clip):
    img = np.random.default_rng(7).integers(0, 256, shape, np.uint8)
    ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=grid[::-1]).apply(img)
    ours = np.asarray(clahe_u8(jnp.asarray(img), clip, grid))
    th, tw = shape[0] // grid[0], shape[1] // grid[1]
    tol = 0 if th % 2 == 0 and tw % 2 == 0 else 1
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= tol


def test_resize_bilinear_identity():
    f = np.random.default_rng(8).random((16, 16)).astype(np.float32)
    out = np.asarray(resize_bilinear_hw(jnp.asarray(f), 16, 16))
    np.testing.assert_allclose(out, f, atol=1e-6)


def test_resize_matches_torch_interpolate():
    torch = pytest.importorskip("torch")
    f = np.random.default_rng(9).random((1, 24, 24)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.tensor(f)[None], size=(37, 41), mode="bilinear",
        align_corners=False)[0, 0].numpy()
    ours = np.asarray(resize_bilinear_hw(jnp.asarray(f[0]), 37, 41))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fused_flip_rotate_equals_sequential(img_u8):
    from ddti_tpu.ops.resample import fused_flip_rotate, rotate

    img = jnp.asarray(img_u8, jnp.float32)
    mask = (img > 128).astype(jnp.float32)
    for fh, fv, ang in [(True, False, 33.0), (False, True, -71.5),
                        (True, True, 0.0), (False, False, 145.2)]:
        # sequential: flip(s) then PIL-convention nearest rotation
        si, sm = img, mask
        if fh:
            si, sm = si[:, ::-1], sm[:, ::-1]
        if fv:
            si, sm = si[::-1, :], sm[::-1, :]
        si = rotate(si, jnp.float32(ang))
        sm = rotate(sm, jnp.float32(ang))
        fi, fm = fused_flip_rotate(img, mask, jnp.bool_(fh), jnp.bool_(fv),
                                   jnp.float32(ang))
        np.testing.assert_allclose(np.asarray(fi), np.asarray(si), atol=1e-5)
        np.testing.assert_allclose(np.asarray(fm), np.asarray(sm), atol=1e-5)


def test_xplane_parser_roundtrip(tmp_path):
    """core.xplane decodes a jax.profiler capture (CPU plane here; TPU
    planes share the schema) without the TF/TensorBoard stack."""
    import jax

    from ddti_tpu.core.xplane import find_xplane, parse_xspace

    logdir = str(tmp_path / "tr")
    jax.profiler.start_trace(logdir)
    x = jax.jit(lambda a: a * 2 + 1)(jax.numpy.ones((256, 256)))
    float(x[0, 0])
    jax.profiler.stop_trace()
    path = find_xplane(logdir)
    assert path is not None
    planes = parse_xspace(path)
    assert planes, "no planes decoded"
    names = [p["name"] for p in planes]
    assert any("CPU" in n or "TPU" in n for n in names), names
    # at least one plane carries named events
    assert any(p["event_names"] and any(e for _, e in p["lines"])
               for p in planes)
