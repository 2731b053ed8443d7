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
    BORDER_REFLECT and bilinear ('linear') or nearest sampling.

    Gather formulation (exact, measured on v5e at 128x256^2 per plane):
    a FLAT i32 index costs ~77 ms/8.4M indices vs ~117 ms for the (y, x)
    index-pair 2D form (XLA lays the [N,2] index tensor out
    pathologically — same finding as the warp, benchmarks/PERF_NOTES.md),
    and the two bilinear taps of one row are fetched by ONE index as a
    (2,)-slice from a stacked [flat[:-1], flat[1:]] pair array (the
    fused_flip_rotate trick), so bilinear needs 2 gathers instead of 4.
    Reflection can locally reverse tap order (negative coordinates) or
    collapse both taps onto one column (fold points), so each tap is
    selected from the fetched pair by comparing its reflected index with
    the pair base; a one-column/row edge pad keeps base+1 in bounds."""
    h, w = img.shape
    if method == "nearest":
        # cv2 nearest rounds half away from zero; coordinates here are >= -h
        xi = _reflect_index(jnp.floor(map_x + 0.5).astype(jnp.int32), w)
        yi = _reflect_index(jnp.floor(map_y + 0.5).astype(jnp.int32), h)
        return jnp.take(img.reshape(-1), yi * w + xi, mode="clip")
    x0 = jnp.floor(map_x).astype(jnp.int32)
    y0 = jnp.floor(map_y).astype(jnp.int32)
    fx = (map_x - x0).astype(img.dtype)
    fy = (map_y - y0).astype(img.dtype)

    rx0 = _reflect_index(x0, w)
    rx1 = _reflect_index(x0 + 1, w)
    ry0 = _reflect_index(y0, h)
    ry1 = _reflect_index(y0 + 1, h)
    bx = jnp.minimum(rx0, rx1)
    flat = jnp.pad(img, ((0, 1), (0, 1)), mode="edge").reshape(-1)
    pair = jnp.stack([flat[:-1], flat[1:]])     # (2, (h+1)*(w+1)-1)
    top = jnp.take(pair, ry0 * (w + 1) + bx, axis=1, mode="clip")
    bot = jnp.take(pair, ry1 * (w + 1) + bx, axis=1, mode="clip")
    v00 = jnp.where(rx0 == bx, top[0], top[1])
    v01 = jnp.where(rx1 == bx, top[0], top[1])
    v10 = jnp.where(rx0 == bx, bot[0], bot[1])
    v11 = jnp.where(rx1 == bx, bot[0], bot[1])
    t = v00 * (1 - fx) + v01 * fx
    b = v10 * (1 - fx) + v11 * fx
    return t * (1 - fy) + b * fy


def remap_pair(img: jnp.ndarray, mask: jnp.ndarray, map_y: jnp.ndarray,
               map_x: jnp.ndarray) -> tuple:
    """cv2.remap of a paired (image bilinear, mask nearest) through ONE
    gather — the elastic-deform hot path.

    All five samples live in the same reflected 2x2 cell: the bilinear
    taps are (ry0|ry1, rx0|rx1) and the mask's nearest index
    floor(map+0.5) is always one of the same corners. So stack the four
    corner-shifted flattenings of BOTH planes (8 rows) and fetch one
    (8,)-slice per output pixel at the cell base, then select each tap by
    comparing its reflected index with the base (reflection can reverse
    or collapse the pair, exactly as in ``remap``). One 8.4M-index gather
    instead of three (2 pair + 1 nearest) — gather cost on TPU is
    per-index, not per-byte (benchmarks/PERF_NOTES.md)."""
    h, w = img.shape
    x0 = jnp.floor(map_x).astype(jnp.int32)
    y0 = jnp.floor(map_y).astype(jnp.int32)
    fx = (map_x - x0).astype(img.dtype)
    fy = (map_y - y0).astype(img.dtype)
    rx0 = _reflect_index(x0, w)
    rx1 = _reflect_index(x0 + 1, w)
    ry0 = _reflect_index(y0, h)
    ry1 = _reflect_index(y0 + 1, h)
    bx = jnp.minimum(rx0, rx1)
    by = jnp.minimum(ry0, ry1)
    rmx = _reflect_index(jnp.floor(map_x + 0.5).astype(jnp.int32), w)
    rmy = _reflect_index(jnp.floor(map_y + 0.5).astype(jnp.int32), h)
    w1 = w + 1
    fi = jnp.pad(img, ((0, 1), (0, 1)), mode="edge").reshape(-1)
    fm = jnp.pad(mask, ((0, 1), (0, 1)), mode="edge").reshape(-1)
    n = fi.shape[0] - w1 - 1
    oct_ = jnp.stack([fi[:n], fi[1:n + 1], fi[w1:n + w1], fi[w1 + 1:],
                      fm[:n], fm[1:n + 1], fm[w1:n + w1], fm[w1 + 1:]])
    g = jnp.take(oct_, (by * w1 + bx).reshape(-1), axis=1,
                 mode="clip").reshape(8, h, w)

    def cell(top, left, base):
        return jnp.where(top, jnp.where(left, g[base], g[base + 1]),
                         jnp.where(left, g[base + 2], g[base + 3]))

    v00 = cell(ry0 == by, rx0 == bx, 0)
    v01 = cell(ry0 == by, rx1 == bx, 0)
    v10 = cell(ry1 == by, rx0 == bx, 0)
    v11 = cell(ry1 == by, rx1 == bx, 0)
    t = v00 * (1 - fx) + v01 * fx
    b = v10 * (1 - fx) + v11 * fx
    out_img = t * (1 - fy) + b * fy
    out_mask = cell(rmy == by, rmx == bx, 4)
    return out_img, out_mask


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


def _barrel_roll_x(t: jnp.ndarray, s: jnp.ndarray, w: int) -> jnp.ndarray:
    """out[..., y, x] = t[..., y, x + s[y]] with zero fill outside [0, w).

    Per-row constant shifts need NO gather: a circular shift by r is eight
    (= log2 w) conditional static rolls selected on the bits of r, and
    rolls/selects are pure data-movement the VPU streams at HBM bandwidth
    (~0.3 ms/level at 128x2x256x256 vs the 8-cycle/index gather floor —
    benchmarks/barrel_probe.py). Valid because s is constant along the roll
    axis (the select bit never moves with the data)."""
    r = jnp.mod(-s, w)
    for k in range(max(1, (w - 1).bit_length())):
        bit = ((r >> k) & 1).astype(bool)[..., :, None]
        t = jnp.where(bit, jnp.roll(t, 1 << k, axis=-1), t)
    xx = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    valid = (xx + s[..., :, None] >= 0) & (xx + s[..., :, None] < w)
    return jnp.where(valid, t, 0.0)


def _barrel_roll_y(t: jnp.ndarray, s: jnp.ndarray, h: int) -> jnp.ndarray:
    """out[..., y, x] = t[..., y + s[x], x] with zero fill (per-column
    shifts, rolls along the sublane axis)."""
    r = jnp.mod(-s, h)
    for k in range(max(1, (h - 1).bit_length())):
        bit = ((r >> k) & 1).astype(bool)[..., None, :]
        t = jnp.where(bit, jnp.roll(t, 1 << k, axis=-2), t)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    valid = (yy + s[..., None, :] >= 0) & (yy + s[..., None, :] < h)
    return jnp.where(valid, t, 0.0)


def paeth_flip_rotate(img: jnp.ndarray, mask: jnp.ndarray,
                      flip_h: jnp.ndarray, flip_v: jnp.ndarray,
                      angle_deg: jnp.ndarray) -> tuple:
    """Flip(s) + rotation as a Paeth three-shear warp — NO gather.

    Same chain semantics as ``fused_flip_rotate`` (conditional h/v flip,
    then PIL-convention counter-clockwise nearest rotation about the
    center, zero fill) but the rotation is decomposed into an exact
    90-degree pre-rotation (transpose + reverses, selected on
    k = round(angle/90)) and a residual |r| <= 45-degree rotation as three
    integer shears, shear_x(tan r/2) . shear_y(-sin r) . shear_x(tan r/2)
    [Paeth 1986]. Each shear shifts whole rows (or columns) by a constant,
    which a barrel shifter does in log2(n) conditional static rolls —
    pure data movement instead of XLA's per-element warp gather
    (75 -> ~8 ms per 128x256^2 batch, benchmarks/barrel_probe.py).

    The composite is EXACT for angle 0 (any flips) and for multiples of
    90 degrees; at other angles the per-pass nearest rounding picks a
    source pixel that differs from the direct PIL map on a small fraction
    of pixels near rounding boundaries (~2-4% measured; each off by one
    source pixel). Unlike direct nearest rotation the shear composite is
    a per-row/column rigid motion, so it never drops or doubles pixels
    inside the valid region. Default since round 5 (``--aug_exact_warp``
    restores the bit-parity PIL map; QUIRKS.md #23 records the 3-seed
    IoU-equivalence study); per-image geometry is preserved (contrast
    ``shared_geometry``, which changes the stochastic process).
    Requires a square image; callers fall back to ``fused_flip_rotate``
    otherwise. Replaces /root/reference/utils/transforms.py:114-141.
    """
    h, w = img.shape
    if h != w:
        raise ValueError("paeth_flip_rotate requires square images")
    t = jnp.stack([img, mask])  # (2, H, W): one shift plan, both planes
    # flips happen BEFORE the rotation in the sequential chain
    t = jnp.where(flip_h, t[..., :, ::-1], t)
    t = jnp.where(flip_v, t[..., ::-1, :], t)
    # inverse-map rotation angle (PIL builds the inverse map; see rotate())
    theta = -angle_deg * (jnp.pi / 180.0)
    k = jnp.round(theta / (jnp.pi / 2)).astype(jnp.int32)
    resid = theta - k.astype(jnp.float32) * (jnp.pi / 2)
    k4 = jnp.mod(k, 4)
    # exact 90k pre-rotation: one transpose, reverses for the rest. The
    # variants match the floor() identities of the exact nearest map
    # (rotate() above) at 90/180/270 bit-for-bit.
    tt = jnp.swapaxes(t, -1, -2)
    r1 = tt[..., :, ::-1]        # 90:  out[y,x] = in[h-1-x, y]
    r2 = t[..., ::-1, ::-1]      # 180: out[y,x] = in[h-1-y, w-1-x]
    r3 = tt[..., ::-1, :]        # 270: out[y,x] = in[x, w-1-y]
    t = jnp.where(k4 == 1, r1,
                  jnp.where(k4 == 2, r2, jnp.where(k4 == 3, r3, t)))
    # residual rotation = shear_x . shear_y . shear_x, nearest = integer
    # per-row/column shifts under the +0.5 pixel-center convention
    tx = jnp.tan(resid / 2.0)
    ty = -jnp.sin(resid)
    centered = jnp.arange(h, dtype=jnp.float32) + 0.5 - (h / 2.0)
    s_x = jnp.floor(tx * centered + 0.5).astype(jnp.int32)
    s_y = jnp.floor(ty * centered + 0.5).astype(jnp.int32)
    t = _barrel_roll_x(t, s_x, w)
    t = _barrel_roll_y(t, s_y, h)
    t = _barrel_roll_x(t, s_x, w)
    return t[0], t[1]


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
