#!/usr/bin/env python3
"""Pallas conv3x3(+bias+ReLU) probe at one ResUNet level shape.

Formulation: grid (N, H/HT); the padded image block (1, H+2, W+2, C) lives
in VMEM (re-fetched once per image, constant across the row-strip axis);
each program computes an (HT, W, CO) output strip as 9 tap matmuls
(HT*W, C) @ (C, CO) accumulated in f32, bias+ReLU applied on the way out —
one HBM write per output element and zero intermediate materialization.

Usage: pallas_conv_probe.py [spatial] [channels] [HT]
Correctness: run with JAX_PLATFORMS=cpu -> interpret mode vs lax.conv.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:
    pltpu = None


def _kernel(x_ref, w_ref, b_ref, o_ref, *, ht: int, w: int, co: int):
    j = pl.program_id(1)
    acc = jnp.zeros((ht * w, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, pl.ds(j * ht + dy, ht), pl.ds(dx, w), :]
            xs = xs.reshape(ht * w, -1)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dy * 3 + dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    o_ref[0] = acc.reshape(ht, w, co).astype(o_ref.dtype)


def conv3x3_relu_pallas(x, wk, b, ht: int = 8, interpret: bool = False):
    """x (N,H,W,C) bf16, wk (3,3,C,CO), b (CO,) -> relu(conv(x)+b)."""
    n, h, w, c = x.shape
    co = wk.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wr = wk.reshape(9, c, co)
    br = b.reshape(1, co)
    spec_kw = {} if interpret else dict(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, ht=ht, w=w, co=co),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        grid=(n, h // ht),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, c), lambda i, j: (i, 0, 0, 0),
                         **spec_kw),
            pl.BlockSpec((9, c, co), lambda i, j: (0, 0, 0), **spec_kw),
            pl.BlockSpec((1, co), lambda i, j: (0, 0), **spec_kw),
        ],
        out_specs=pl.BlockSpec((1, ht, w, co),
                               lambda i, j: (i, j, 0, 0), **spec_kw),
        interpret=interpret,
    )(xp, wr, br)


def conv3x3_relu_xla(x, wk, b):
    y = jax.lax.conv_general_dilated(
        x, wk.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(y + b.astype(jnp.float32), 0.0).astype(x.dtype)


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    ht = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n = 128
    interpret = jax.default_backend() == "cpu"
    if interpret:
        n, s = 2, 16
        ht = min(ht, 8)
    key = jax.random.PRNGKey(0)
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n, s, s, c), jnp.bfloat16)
    wk = jax.random.normal(kw, (3, 3, c, c), jnp.float32) * 0.05
    b = jax.random.normal(kb, (c,), jnp.float32)

    f_pl = jax.jit(lambda x: conv3x3_relu_pallas(
        x, wk.astype(jnp.bfloat16), b, ht=ht, interpret=interpret))
    f_xla = jax.jit(lambda x: conv3x3_relu_xla(x, wk, b))

    got = f_pl(x)
    want = f_xla(x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f"max |pallas - xla| = {err:.4f}", flush=True)
    if interpret:
        assert err < 0.25, "interpret-mode mismatch"
        print("interpret OK")
        return

    for f, name in ((f_pl, "pallas"), (f_xla, "xla   ")):
        o = f(x)
        float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(10):
            o = f(x)
        float(jnp.sum(o.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / 10 * 1e3
        flop = n * s * s * c * c * 9 * 2
        print(f"{name}: {ms:6.2f} ms  MFU {flop / 394e12 / ms * 1e5:4.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
