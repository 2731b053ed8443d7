#!/usr/bin/env python3
"""Is the C_in=1 stem conv a bottleneck? (VERDICT r1 'unexamined' item.)

Times the stem conv 3x3 C_in->64 forward and its wgrad at the flagship
shape (bs128, 256x256, bf16) for C_in = 1 vs 8 (lane-padded). If the
C_in=1 timings sit at the HBM write bound (~1.3 ms for the 1 GB bf16
output), channel padding can't win anything and the item is closed.
"""

import sys
import time

import jax
import jax.numpy as jnp

N, S, CO = 128, 256, 64


def timeit(fn, *args, steps=20):
    o = fn(*args)
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), o)
    t0 = time.perf_counter()
    for _ in range(steps):
        o = fn(*args)
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), o)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ci = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    x = jnp.ones((N, S, S, ci), jnp.bfloat16)
    w = jnp.ones((3, 3, ci, CO), jnp.bfloat16)

    @jax.jit
    def fwd(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    @jax.jit
    def wgrad(x, w):
        _, vjp = jax.vjp(lambda w: fwd(x, w), w)
        return vjp(jnp.ones((N, S, S, CO), jnp.bfloat16))[0]

    f = timeit(fwd, x, w)
    g = timeit(wgrad, x, w)
    out_gb = N * S * S * CO * 2 / 1e9
    print(f"C_in={ci}: fwd {f:.2f} ms  wgrad {g:.2f} ms  "
          f"(output {out_gb:.2f} GB -> HBM write bound "
          f"~{out_gb / 0.819:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
