"""Batched 2D resampling primitives for the on-device augmentation pipeline.

All functions are jittable, vmap-friendly, static-shaped and operate on
float32 (H, W) or (N, H, W) arrays. They implement the exact sampling
conventions of the host libraries the reference delegates to:

- ``rotate``: PIL ``Image.rotate(angle)`` semantics (counter-clockwise,
  rotation about the image center (w/2, h/2), output pixel centers at
  (x+0.5, y+0.5), nearest = floor of the source coordinate, fill 0) — the
  path torchvision's ``TF.rotate`` takes for PIL inputs
  (/root/reference/utils/transforms.py:132-141).
- ``remap``: cv2.remap semantics (absolute source coordinates per output
  pixel, bilinear or nearest, BORDER_REFLECT edge-inclusive reflection) used
  by ElasticDeform (/root/reference/utils/transforms.py:39-40).
- ``gaussian_blur_17``: cv2.GaussianBlur(ksize=17, sigmaX=s) — separable,
  BORDER_REFLECT_101 ('mirror') padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray):
    """img[(yi, xi)] with integer index arrays, coordinates pre-clipped."""
    return img[yi, xi]


def _reflect_index(i: jnp.ndarray, n: int) -> jnp.ndarray:
    """Edge-inclusive reflection (cv2 BORDER_REFLECT / scipy 'reflect'):
    ... 2 1 0 | 0 1 2 ... n-1 | n-1 n-2 ...  Period is 2n."""
    if n == 1:
        return jnp.zeros_like(i)
    period = 2 * n
    j = jnp.mod(i, period)
    j = jnp.where(j < 0, j + period, j)
    return jnp.where(j >= n, period - 1 - j, j)


def rotate(img: jnp.ndarray, angle_deg: jnp.ndarray, *,
           method: str = "nearest") -> jnp.ndarray:
    """Rotate one (H, W) image counter-clockwise by ``angle_deg`` (traced
    scalar), PIL conventions, zero fill outside."""
    h, w = img.shape
    theta = -angle_deg * (jnp.pi / 180.0)  # PIL builds the inverse map
    c, s = jnp.cos(theta), jnp.sin(theta)
    cx, cy = w / 2.0, h / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    xs = c * (xx - cx) + s * (yy - cy) + cx
    ys = -s * (xx - cx) + c * (yy - cy) + cy
    if method == "nearest":
        xi = jnp.floor(xs).astype(jnp.int32)
        yi = jnp.floor(ys).astype(jnp.int32)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        out = _gather_2d(img, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1))
        return jnp.where(valid, out, 0.0)
    # bilinear with pixel-center convention and zero fill
    xs = xs - 0.5
    ys = ys - 0.5
    return _bilinear_constant(img, ys, xs)


def _bilinear_constant(img, ys, xs):
    h, w = img.shape
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    fx = xs - x0
    fy = ys - y0

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = _gather_2d(img, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1))
        return jnp.where(valid, v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def remap(img: jnp.ndarray, map_y: jnp.ndarray, map_x: jnp.ndarray, *,
          method: str = "linear") -> jnp.ndarray:
    """cv2.remap: out[y, x] = img[map_y[y, x], map_x[y, x]] with
    BORDER_REFLECT and bilinear ('linear') or nearest sampling."""
    h, w = img.shape
    if method == "nearest":
        # cv2 nearest rounds half away from zero; coordinates here are >= -h
        xi = _reflect_index(jnp.floor(map_x + 0.5).astype(jnp.int32), w)
        yi = _reflect_index(jnp.floor(map_y + 0.5).astype(jnp.int32), h)
        return _gather_2d(img, yi, xi)
    x0 = jnp.floor(map_x).astype(jnp.int32)
    y0 = jnp.floor(map_y).astype(jnp.int32)
    fx = (map_x - x0).astype(img.dtype)
    fy = (map_y - y0).astype(img.dtype)

    def tap(yi, xi):
        return _gather_2d(img, _reflect_index(yi, h), _reflect_index(xi, w))

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def gaussian_kernel_17(sigma: jnp.ndarray) -> jnp.ndarray:
    """Normalized 17-tap Gaussian (traced sigma), cv2.getGaussianKernel
    formula for ksize 17."""
    i = jnp.arange(17, dtype=jnp.float32) - 8.0
    k = jnp.exp(-(i * i) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def gaussian_blur_17(img: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Separable 17x17 Gaussian blur of one (H, W) image with mirror
    (BORDER_REFLECT_101) padding, matching cv2.GaussianBlur defaults."""
    k = gaussian_kernel_17(sigma)
    pad = 8
    # rows
    x = jnp.pad(img, ((0, 0), (pad, pad)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, :, :, None], k[None, :, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    # cols
    x = jnp.pad(x, ((pad, pad), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, :, :, None], k[:, None, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    return x


def fused_flip_rotate(img: jnp.ndarray, mask: jnp.ndarray,
                      flip_h: jnp.ndarray, flip_v: jnp.ndarray,
                      angle_deg: jnp.ndarray) -> tuple:
    """Flip(s) + rotation composed into ONE nearest-neighbor warp with a
    single shared gather for image and mask.

    Exactly equivalent to applying hflip/vflip (conditionally) followed by
    PIL-convention nearest rotation: flips are coordinate mirrors and the
    composed map F(R(p)) is evaluated once. angle 0 with flips off is an
    exact identity (floor(j + 0.5) == j). One gather instead of two rotates
    + four flip selects — the augmentation hot path on TPU.
    """
    h, w = img.shape
    theta = -angle_deg * (jnp.pi / 180.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    cx, cy = w / 2.0, h / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    xs = c * (xx - cx) + s * (yy - cy) + cx
    ys = -s * (xx - cx) + c * (yy - cy) + cy
    # conditional mirrors (the flip happened BEFORE the rotation in the
    # sequential chain, so mirror the *source* coordinate)
    xs = jnp.where(flip_h, w - xs, xs)
    ys = jnp.where(flip_v, h - ys, ys)
    xi = jnp.floor(xs).astype(jnp.int32)
    yi = jnp.floor(ys).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    # FLAT single-axis gather with a (2,)-slice per index: one i32 index
    # vector (instead of (y, x) index pairs, whose [N,2] tensor XLA lays
    # out pathologically) and each index fetches both planes. Measured
    # 92 -> 77.5 ms per 128x256^2 batch on v5e (benchmarks/warp_ab.py);
    # XLA's per-element gather floor dominates either way — see
    # benchmarks/PERF_NOTES.md for the full lowering study.
    lin = (yc * w + xc).reshape(-1)
    pair = jnp.stack([img.reshape(-1), mask.reshape(-1)])
    out = jnp.take(pair, lin, axis=1, mode="clip").reshape(2, h, w)
    out = jnp.where(valid[None], out, 0.0)
    return out[0], out[1]


def resize_bilinear_hw(img: jnp.ndarray, h: int, w: int, *,
                       antialias: bool = True) -> jnp.ndarray:
    """Bilinear resize of (..., H, W) to (..., h, w), half-pixel centers.

    ``antialias=True`` (default) widens the triangle filter by the
    downscale ratio — the PIL ``Image.BILINEAR`` convention the reference's
    eval/train resize inherits by operating on PIL images
    (/root/reference/utils/transforms.py:143-150). Verified within 1 gray
    level of PIL on 512->256 and 512->200 downscales
    (tests/test_augment_parity.py::test_device_downscale_matches_pil).
    ``antialias=False`` is plain source-point sampling — exact torch
    ``F.interpolate(align_corners=False)`` semantics. The two conventions
    are identical on upscale (the filter is never widened there).
    """
    out_shape = img.shape[:-2] + (h, w)
    return jax.image.resize(img, out_shape, method="linear",
                            antialias=antialias)
