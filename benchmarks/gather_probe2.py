#!/usr/bin/env python3
"""Second round of warp-gather probes on the TPU."""

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
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (N, H, W), jnp.float32)
    rng = np.random.default_rng(0)
    ths = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    yis, xis = [], []
    for th in ths:
        ys = (-np.sin(th) * (xx - W / 2) + np.cos(th) * (yy - H / 2) + H / 2)
        xs = (np.cos(th) * (xx - W / 2) + np.sin(th) * (yy - H / 2) + W / 2)
        yis.append(np.clip(np.floor(ys), 0, H - 1).astype(np.int32))
        xis.append(np.clip(np.floor(xs), 0, W - 1).astype(np.int32))
    yi = np.stack(yis)
    xi = np.stack(xis)
    lin = jnp.asarray(yi * W + xi)                       # (N, H, W)
    want = np.take_along_axis(np.asarray(src).reshape(N, -1),
                              np.asarray(lin).reshape(N, -1),
                              axis=1).reshape(N, H, W)

    # E: XLA per-image flat take, indices as input
    def build_e():
        f = jax.jit(lambda s, i: jax.vmap(
            lambda im, ix: jnp.take(im.reshape(-1),
                                    ix.reshape(-1)).reshape(H, W))(s, i))
        return f, (src, lin), lambda o: np.allclose(o, want)

    # E2: same but mode clip + 2D batched take_along_axis
    def build_e2():
        def f(s, i):
            return jnp.take_along_axis(
                s.reshape(N, -1), i.reshape(N, -1), axis=1,
                mode="promise_in_bounds").reshape(N, H, W)
        return jax.jit(f), (src, lin), lambda o: np.allclose(o, want)

    # B2: pallas take_along_axis axis=0, promise_in_bounds, per-image grid
    def build_b2():
        yi0 = jnp.asarray(yi[0])

        def kern(src_ref, yi_ref, out_ref):
            out_ref[0] = jnp.take_along_axis(src_ref[0], yi_ref[:], axis=0,
                                             mode="promise_in_bounds")

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
        want_b = np.take_along_axis(np.asarray(src),
                                    np.asarray(yi[0])[None].repeat(N, 0),
                                    axis=1)
        return f, (src, yi0), lambda o: np.allclose(o, want_b)

    # F: pallas dynamic_gather, batch-in-lanes: operand (HW, N) u16-packed?
    # first test range: gather across 2048 sublanes within one block
    def build_f():
        hw_t = 2048  # sublane range of the gather
        s2 = jax.random.uniform(key, (hw_t, N), jnp.float32)
        idx = jnp.asarray(
            rng.integers(0, hw_t, (hw_t, N)).astype(np.int32))

        def kern(src_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0,
                                             mode="promise_in_bounds")

        f = jax.jit(lambda s, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((hw_t, N), s.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, i))
        want_f = np.take_along_axis(np.asarray(s2), np.asarray(idx), axis=0)
        return f, (s2, idx), lambda o: np.allclose(o, want_f)

    # G: XLA take_along_axis along axis 0 on (HW, N) — batch-in-lanes,
    # whole-warp as ONE gather op outside pallas
    def build_g():
        s2 = jnp.asarray(np.asarray(src).reshape(N, -1).T.copy())  # (HW, N)
        idx = jnp.asarray(np.asarray(lin).reshape(N, -1).T.copy())

        def f(s, i):
            return jnp.take_along_axis(s, i, axis=0,
                                       mode="promise_in_bounds")

        want_g = want.reshape(N, -1).T
        return jax.jit(f), (s2, idx), lambda o: np.allclose(o, want_g)

    probe("E  xla take idx-input      ", build_e)
    probe("E2 xla taa batched         ", build_e2)
    probe("B2 pallas taa ax0 promise  ", build_b2)
    probe("F  pallas dyn_gather lanes ", build_f)
    probe("G  xla taa (HW,N) lanes    ", build_g)


if __name__ == "__main__":
    main()
