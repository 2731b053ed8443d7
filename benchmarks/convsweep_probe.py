#!/usr/bin/env python3
"""Bare lax.conv efficiency sweep over the ResUNet level shapes (bs128,
bf16, NHWC). Prints measured ms vs MXU-peak ms to locate how much of the
serve/train conv time is XLA conv inefficiency vs trace-fusion overcount."""

import time

import jax
import jax.numpy as jnp

N = 128
SHAPES = [  # (spatial, cin, cout)
    (256, 64, 64),
    (128, 128, 128),
    (64, 256, 256),
    (32, 512, 512),
    (16, 1024, 1024),
    (8, 2048, 2048),
]
# v5e bf16 peak is ~197 TFLOP/s (394 is the int8 rate). An 8192^3 bf16
# matmul measures 151.9 TFLOP/s on this chip. NOTE: bare convs here run
# ~2x slower than the same shapes inside a jitted model graph (layout
# assignment) — use trace_serve.py/trace_step.py for in-context numbers.
PEAK_TFLOPS = 197.0


def main():
    for s, ci, co in SHAPES:
        x = jnp.ones((N, s, s, ci), jnp.bfloat16)
        w = jnp.ones((3, 3, ci, co), jnp.bfloat16)

        @jax.jit
        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        o = conv(x, w)
        float(jnp.sum(o.astype(jnp.float32)))
        t0 = time.perf_counter()
        steps = 10
        for _ in range(steps):
            o = conv(x, w)
        float(jnp.sum(o.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / steps * 1e3
        flop = N * s * s * co * ci * 9 * 2
        ideal = flop / (PEAK_TFLOPS * 1e12) * 1e3
        hbm = (N * s * s * (ci + co) * 2) / 819e9 * 1e3
        print(f"{s:4d}^2 c{ci:4d}->{co:4d}: {ms:6.2f} ms  "
              f"(MXU ideal {ideal:5.2f}, HBM {hbm:5.2f}, "
              f"MFU {ideal / ms * 100:4.1f}%)", flush=True)
        del x, w, o


if __name__ == "__main__":
    main()
