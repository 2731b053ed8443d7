"""Probe: is a hand-rolled polynomial exp2 faster than the builtin on the
TPU VPU inside a Pallas kernel?

The flash-attention kernels are transcendental-bound (~1G exp2/step at
S=4096 dominates the 6.19 ms forward, PERF_NOTES). If Mosaic lowers
jnp.exp2 to a slow multi-pass sequence, a degree-4 polynomial on the
fraction plus an exponent-bits ldexp could beat it; if Mosaic already
expands exp2 into a comparable polynomial, this probe shows parity and
the idea dies here.

Kernel: y = exp2(x) over a (8M,) f32 array, 512x65536, blocked (512, 512).
Variants: builtin exp2 / poly4 exp2 / poly5 exp2 / copy (memory floor).

Run: benchmarks/run_in_repo.sh benchmarks/exp2_probe.py
"""

import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ROWS, COLS = 512, 16384
BR, BC = 256, 1024
STEPS = 30


def _poly_exp2(x, order: int):
    """exp2(x) = 2^i * 2^f with i = round(x), f in [-0.5, 0.5]; 2^f by a
    minimax-ish polynomial (Taylor in ln2 works at these orders); 2^i via
    exponent-bit construction (i + 127) << 23 bitcast to f32."""
    i = jnp.round(x)
    f = x - i
    ln2 = np.float32(np.log(2.0))
    # Horner over Taylor coefficients of 2^f = e^(f ln2)
    coeffs = [np.float32(ln2 ** k / math.factorial(k))
              for k in range(order, 0, -1)]
    p = jnp.full_like(f, np.float32(0.0))
    for c in coeffs:
        p = (p + c) * f
    p = p + np.float32(1.0)
    # 2^i: clamp to the finite exponent range, build the float bitwise
    ii = jnp.clip(i, -126.0, 127.0).astype(jnp.int32)
    two_i = jax.lax.bitcast_convert_type((ii + 127) << 23, jnp.float32)
    return p * two_i


def make_kernel(mode: str):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        if mode == "builtin":
            o_ref[...] = jnp.exp2(x)
        elif mode == "copy":
            o_ref[...] = x
        else:
            o_ref[...] = _poly_exp2(x, int(mode[4:]))

    return pl.pallas_call(
        kernel,
        grid=(ROWS // BR, COLS // BC),
        in_specs=[pl.BlockSpec((BR, BC), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((BR, BC), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )


def main():
    x = jax.random.uniform(jax.random.PRNGKey(0), (ROWS, COLS),
                           jnp.float32, -20.0, 3.0)
    ref = np.exp2(np.asarray(x, np.float64))
    for mode in ("copy", "builtin", "poly4", "poly5", "poly6"):
        fn = jax.jit(make_kernel(mode))
        y = fn(x)
        y.block_until_ready()
        float(jnp.sum(y))
        t0 = time.perf_counter()
        for _ in range(STEPS):
            y = fn(x)
        float(jnp.sum(y))
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        if mode == "copy":
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(y, np.float64) - ref)
                               / np.maximum(ref, 1e-30)))
        print(f"{mode:8s}: {dt:7.3f} ms   max rel err {err:.3e}")


if __name__ == "__main__":
    main()
