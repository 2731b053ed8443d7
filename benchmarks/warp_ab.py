#!/usr/bin/env python3
"""A/B alternative lowerings of the fused flip+rotate warp on the real TPU.

The round-2 per-op profile showed the warp's gather-index fusion alone costs
~88 ms/step at bs128/256^2 (aug total 92 ms). Candidates:
  v0: current — stack image+mask, one 2D gather pair[:, yc, xc]
  v1: flat linear index, jnp.take along axis 1 inside the vmap
  v2: batched take_along_axis outside the vmap (single (N, 2, HW) gather)
  v3: v2 on uint8 inputs (quarter the gathered bytes; warp is a pure
      permutation so nearest-neighbor parity is exact)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _coords(img_shape, flip_h, flip_v, angle_deg):
    h, w = img_shape
    theta = -angle_deg * (jnp.pi / 180.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    cx, cy = w / 2.0, h / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    xs = c * (xx - cx) + s * (yy - cy) + cx
    ys = -s * (xx - cx) + c * (yy - cy) + cy
    xs = jnp.where(flip_h, w - xs, xs)
    ys = jnp.where(flip_v, h - ys, ys)
    xi = jnp.floor(xs).astype(jnp.int32)
    yi = jnp.floor(ys).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    return yc, xc, valid


def warp_v0(img, mask, fh, fv, ang):
    h, w = img.shape
    yc, xc, valid = _coords((h, w), fh, fv, ang)
    pair = jnp.stack([img, mask])
    out = pair[:, yc, xc]
    out = jnp.where(valid[None], out, 0.0)
    return out[0], out[1]


def warp_v1(img, mask, fh, fv, ang):
    h, w = img.shape
    yc, xc, valid = _coords((h, w), fh, fv, ang)
    lin = (yc * w + xc).reshape(-1)
    pair = jnp.stack([img.reshape(-1), mask.reshape(-1)])
    out = jnp.take(pair, lin, axis=1).reshape(2, h, w)
    out = jnp.where(valid[None], out, 0.0)
    return out[0], out[1]


def batched_warp_v2(images, masks, fh, fv, ang, dtype=None):
    """(N,H,W) all at once: one take_along_axis on (N*2, HW)."""
    n, h, w = images.shape
    yc, xc, valid = jax.vmap(
        lambda f1, f2, a: _coords((h, w), f1, f2, a))(fh, fv, ang)
    lin = (yc * w + xc).reshape(n, 1, h * w)
    pair = jnp.stack([images, masks], axis=1).reshape(n, 2, h * w)
    out = jnp.take_along_axis(pair, jnp.broadcast_to(lin, (n, 2, h * w)),
                              axis=2).reshape(n, 2, h, w)
    out = jnp.where(valid[:, None], out, 0 if dtype else 0.0)
    return out[:, 0], out[:, 1]


def _time(fn, sync, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    n, size = 128, 256
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (n, size, size), jnp.float32)
    masks = (jax.random.uniform(jax.random.fold_in(key, 1),
                                (n, size, size)) > 0.7).astype(jnp.float32)
    img_u8 = (images * 255).astype(jnp.uint8)
    mask_u8 = (masks * 255).astype(jnp.uint8)
    fh = jnp.zeros((n,), bool).at[::2].set(True)
    fv = jnp.zeros((n,), bool).at[::3].set(True)
    ang = jnp.linspace(-170, 170, n)

    v0 = jax.jit(jax.vmap(warp_v0))
    v1 = jax.jit(jax.vmap(warp_v1))
    v2 = jax.jit(batched_warp_v2)
    v3 = jax.jit(lambda i, m, a, b, c: batched_warp_v2(i, m, a, b, c,
                                                       dtype="u8"))

    # correctness first (vs v0)
    r0 = v0(images, masks, fh, fv, ang)
    for name, fn, args in (("v1", v1, (images, masks, fh, fv, ang)),
                           ("v2", v2, (images, masks, fh, fv, ang))):
        r = fn(*args)
        for a, b in zip(r, r0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        print(f"{name} matches v0")
    r3 = v3(img_u8, mask_u8, fh, fv, ang)
    np.testing.assert_allclose(np.asarray(r3[0], np.float32) / 255.0,
                               np.asarray(r0[0]), atol=1 / 255 + 1e-6)
    print("v3 (uint8) matches v0 within quantization")

    for name, fn, args in (
            ("v0 f32 2d-gather ", v0, (images, masks, fh, fv, ang)),
            ("v1 f32 flat-take ", v1, (images, masks, fh, fv, ang)),
            ("v2 f32 batched   ", v2, (images, masks, fh, fv, ang)),
            ("v3 u8  batched   ", v3, (img_u8, mask_u8, fh, fv, ang))):
        ms = _time(lambda: fn(*args), lambda o: float(
            o[0][0, 0, 0].astype(jnp.float32)))
        print(f"{name}: {ms:7.2f} ms / batch128")


if __name__ == "__main__":
    main()
