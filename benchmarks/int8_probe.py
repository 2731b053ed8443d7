"""Probe: do int8 convolutions hit the v5e int8 MXU path (394 TOPS)?

Compares bf16 vs int8 conv_general_dilated at the flagship ResUNet's
heavy decoder/encoder shapes, inside one jitted program per dtype
(CLAUDE.md: never measure bare per-op dispatches). Also probes an
int8 matmul as the clean upper-bound signal.

Run: benchmarks/run_in_repo.sh benchmarks/int8_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REPS = 8


def timeit(fn, *args):
    # fn must return a SCALAR (device->host fetch of big arrays through the
    # tunnel costs seconds and swamps the measurement)
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / 3


def conv_chain(x, ks):
    # REPS back-to-back convs (same shape) so the program is compute-dominated
    acc = x
    for k in ks:
        y = lax.conv_general_dilated(
            acc, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32 if k.dtype == jnp.int8 else jnp.float32,
        )
        # renormalize back to input dtype so the chain doesn't overflow
        if k.dtype == jnp.int8:
            acc = (y >> 7).astype(jnp.int8)
        else:
            acc = (y * 0.01).astype(x.dtype)
    return jnp.float32(acc.astype(jnp.float32).mean())


def probe_conv(B, H, W, C, CO, dtype):
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(key, (B, H, W, C), -100, 100, jnp.int8)
        ks = [jax.random.randint(jax.random.PRNGKey(i), (3, 3, C, CO), -100, 100, jnp.int8)
              for i in range(REPS)]
        # all convs C->CO won't chain if C != CO; use C==CO shapes only
    else:
        x = jax.random.normal(key, (B, H, W, C), dtype)
        ks = [jax.random.normal(jax.random.PRNGKey(i), (3, 3, C, CO), dtype)
              for i in range(REPS)]
    f = jax.jit(conv_chain)
    dt = timeit(f, x, ks)
    flops = 2 * B * H * W * 9 * C * CO * REPS
    tflops = flops / dt / 1e12
    print(f"conv {dtype.__name__:8s} B{B} {H}x{W} C{C}->{CO}: "
          f"{dt*1e3:8.2f} ms  {tflops:7.1f} T(FL)OPS")
    return dt


def matmul_chain(x, ws):
    acc = x
    for w in ws:
        y = jnp.dot(acc, w, preferred_element_type=jnp.int32
                    if w.dtype == jnp.int8 else None)
        if w.dtype == jnp.int8:
            acc = (y >> 7).astype(jnp.int8)
        else:
            acc = y * jnp.asarray(0.01, y.dtype)
    return jnp.float32(acc.astype(jnp.float32).mean())


def probe_matmul(n, dtype):
    if dtype == jnp.int8:
        x = jax.random.randint(jax.random.PRNGKey(0), (n, n), -100, 100, jnp.int8)
        ws = [jax.random.randint(jax.random.PRNGKey(i), (n, n), -100, 100, jnp.int8)
              for i in range(REPS)]
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (n, n), dtype)
        ws = [jax.random.normal(jax.random.PRNGKey(i), (n, n), dtype)
              for i in range(REPS)]
    f = jax.jit(matmul_chain)
    dt = timeit(f, x, ws)
    tflops = 2 * n**3 * REPS / dt / 1e12
    print(f"matmul {dtype.__name__:8s} {n}^3: {dt*1e3:8.2f} ms  {tflops:7.1f} T(FL)OPS")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe_matmul(8192, jnp.bfloat16)
    probe_matmul(8192, jnp.int8)
    # representative ResUNet mid/deep levels (C==CO so chains compose)
    for (B, H, W, C) in [(128, 64, 64, 128), (128, 32, 32, 256), (128, 16, 16, 512)]:
        probe_conv(B, H, W, C, C, jnp.bfloat16)
        probe_conv(B, H, W, C, C, jnp.int8)
