#!/usr/bin/env python3
"""Probe which gather formulations Mosaic (Pallas TPU) accepts and how fast
they run, for the augmentation warp (8.4M gathered elements per batch)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = 256
N = 128


def timeit(fn, *args, steps=10):
    for _ in range(2):
        out = fn(*args)
    float(out.reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(out.reshape(-1)[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / steps * 1e3


def probe(name, build):
    try:
        fn, args, check = build()
        out = fn(*args)
        ok = check(np.asarray(out))
        ms = timeit(fn, *args)
        print(f"{name}: OK match={ok} {ms:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (N, H, W), jnp.float32)
    # a rotation-like index field (same for all images for the probe)
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    th = 0.3
    ys = (-np.sin(th) * (xx - W / 2) + np.cos(th) * (yy - H / 2) + H / 2)
    xs = (np.cos(th) * (xx - W / 2) + np.sin(th) * (yy - H / 2) + W / 2)
    yi = np.clip(np.floor(ys).astype(np.int32), 0, H - 1)
    xi = np.clip(np.floor(xs).astype(np.int32), 0, W - 1)
    lin = jnp.asarray(yi * W + xi)  # (H, W) i32
    yi = jnp.asarray(yi)
    xi = jnp.asarray(xi)
    want = np.asarray(src)[:, np.asarray(yi), np.asarray(xi)]

    # A: flat take inside pallas kernel
    def build_a():
        def kern(src_ref, idx_ref, out_ref):
            flat = src_ref[0].reshape(-1)
            out_ref[0] = jnp.take(flat, idx_ref[:].reshape(-1),
                                  axis=0).reshape(H, W)

        f = jax.jit(lambda s, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, H, W), s.dtype),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, H, W), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, W), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(s, i))
        return f, (src, lin), lambda o: np.allclose(o, want)

    # B: take_along_axis axis=0 (sublane gather) inside pallas
    def build_b():
        def kern(src_ref, yi_ref, out_ref):
            out_ref[0] = jnp.take_along_axis(src_ref[0], yi_ref[:], axis=0)

        f = jax.jit(lambda s, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, H, W), s.dtype),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, H, W), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, W), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(s, i))
        want_b = np.take_along_axis(np.asarray(src), np.asarray(yi)[None]
                                    .repeat(N, 0), axis=1)
        return f, (src, yi), lambda o: np.allclose(o, want_b)

    # C: take_along_axis axis=1 (lane gather) inside pallas
    def build_c():
        def kern(src_ref, xi_ref, out_ref):
            out_ref[0] = jnp.take_along_axis(src_ref[0], xi_ref[:], axis=1)

        f = jax.jit(lambda s, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, H, W), s.dtype),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, H, W), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, W), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(s, i))
        want_c = np.take_along_axis(np.asarray(src), np.asarray(xi)[None]
                                    .repeat(N, 0), axis=2)
        return f, (src, xi), lambda o: np.allclose(o, want_c)

    # D: XLA flat take per-image (the current best non-pallas variant)
    def build_d():
        def f(s, i):
            return jax.vmap(lambda im: jnp.take(im.reshape(-1),
                                                i.reshape(-1)).reshape(H, W)
                            )(s)

        return jax.jit(f), (src, lin), lambda o: np.allclose(o, want)

    probe("A pallas flat take   ", build_a)
    probe("B pallas taa axis0   ", build_b)
    probe("C pallas taa axis1   ", build_c)
    probe("D xla flat take      ", build_d)


if __name__ == "__main__":
    main()
