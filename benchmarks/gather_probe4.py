#!/usr/bin/env python3
"""Patch-gather warp probe: K consecutive output pixels share ONE gather
index fetching a (K, K) source patch (exact — neighboring nearest-neighbor
source coords move by at most 1 per step), followed by a binary-select tree
on the patch. Cuts the per-index gather cost K-fold."""

import time

import jax
import jax.numpy as jnp
import numpy as np

H = W = 256
N = 128


def timeit(fn, *args, steps=10):
    def sync(o):
        leaf = jax.tree.leaves(o)[0]
        float(leaf.reshape(-1)[0].astype(jnp.float32))
    for _ in range(2):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps * 1e3


def coords(th):
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    ys = (-np.sin(th) * (xx - W / 2) + np.cos(th) * (yy - H / 2) + H / 2)
    xs = (np.cos(th) * (xx - W / 2) + np.sin(th) * (yy - H / 2) + W / 2)
    yi = np.floor(ys).astype(np.int32)
    xi = np.floor(xs).astype(np.int32)
    valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    return (np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1), valid)


def patch_warp_one(img, yi, xi, valid, k: int):
    """img (H, W); yi/xi/valid (H, W) exact per-pixel nearest coords."""
    g = W // k
    yig = yi.reshape(H, g, k)
    xig = xi.reshape(H, g, k)
    ay = jnp.clip(jnp.min(yig, axis=2), 0, H - k)       # (H, g)
    ax = jnp.clip(jnp.min(xig, axis=2), 0, W - k)
    starts = jnp.stack([ay, ax], axis=-1).reshape(-1, 2)  # (H*g, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patches = jax.lax.gather(
        img, starts, dn, slice_sizes=(k, k),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )                                                    # (H*g, k, k)
    patches = patches.reshape(H, g, k * k)
    dy = yig - ay[:, :, None]                            # (H, g, k) in [0,k)
    dx = xig - ax[:, :, None]
    pidx = dy * k + dx                                   # (H, g, k) in [0,k^2)
    # binary select tree over the k*k patch axis
    vals = jnp.moveaxis(patches, 2, 0)                   # (k*k, H, g)
    idx = pidx.transpose(2, 0, 1)                        # (k, H, g)
    n = k * k
    level = vals[None].repeat(1, 0)[0]                   # (k*k, H, g)
    # expand: for each of k outputs select vals[pidx]
    sel = jnp.broadcast_to(level[:, None], (n, k, H, g))
    bits = int(np.log2(n))
    cur = sel
    for b in range(bits - 1, -1, -1):
        half = cur.shape[0] // 2
        take_hi = ((idx >> b) & 1).astype(bool)          # (k, H, g)
        cur = jnp.where(take_hi[None], cur[half:], cur[:half])
    out = cur[0]                                         # (k, H, g)
    out = out.transpose(1, 2, 0).reshape(H, W)
    return jnp.where(valid, out, 0.0)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (N, H, W), jnp.float32)
    ths = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
    yis, xis, vs = zip(*[coords(t) for t in ths])
    yi = jnp.asarray(np.stack(yis))
    xi = jnp.asarray(np.stack(xis))
    valid = jnp.asarray(np.stack(vs))
    want = np.where(np.stack(vs),
                    np.take_along_axis(
                        np.asarray(src).reshape(N, -1),
                        (np.stack(yis) * W + np.stack(xis)).reshape(N, -1),
                        axis=1).reshape(N, H, W), 0.0)

    for k in (2, 4, 8):
        f = jax.jit(jax.vmap(lambda im, a, b, v: patch_warp_one(
            im, a, b, v, k)))
        try:
            out = f(src, yi, xi, valid)
            ok = np.allclose(np.asarray(out), want)
            ms = timeit(f, src, yi, xi, valid)
            print(f"patch k={k}: match={ok} {ms:.2f} ms", flush=True)
        except Exception as e:
            print(f"patch k={k}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
