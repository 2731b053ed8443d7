#!/usr/bin/env python3
"""Real-TPU validation of the Pallas flash-attention kernels (fwd + bwd).

Compares outputs and grads vs the naive XLA formulation at TransUNet
bottleneck shapes (S=4096 tokens, the depth-3/512^2 config the kernel
exists for) and times both. Run via benchmarks/run_in_repo.sh.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ddti_tpu.ops.attention import attention_reference, flash_attention

B, H, S, D = 1, 8, 4096, 32


def main():
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
               for kk in jax.random.split(key, 3))

    # --- forward correctness ---
    o_fl = jax.jit(flash_attention)(q, k, v)
    o_rf = jax.jit(attention_reference)(q, k, v)
    err = float(jnp.max(jnp.abs(o_fl.astype(jnp.float32)
                                - o_rf.astype(jnp.float32))))
    print(f"fwd max err: {err:.5f}")
    assert err < 2e-2, err

    # --- backward correctness ---
    def loss_fl(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    def loss_rf(q, k, v):
        return jnp.sum(attention_reference(q, k, v).astype(jnp.float32) ** 2)

    g_fl = jax.jit(jax.grad(loss_fl, argnums=(0, 1, 2)))(q, k, v)
    g_rf = jax.jit(jax.grad(loss_rf, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", g_fl, g_rf):
        rel = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) or 1.0
        print(f"d{name} max abs err: {rel:.4f} (max |g|={scale:.1f}, "
              f"rel {rel / scale:.5f})")
        assert rel / scale < 3e-2, (name, rel, scale)

    # --- timing ---
    gf = jax.jit(jax.grad(loss_fl, argnums=(0, 1, 2)))
    gr = jax.jit(jax.grad(loss_rf, argnums=(0, 1, 2)))
    for name, fn in (("flash", gf), ("naive", gr)):
        for _ in range(3):
            out = fn(q, k, v)
        float(out[0][0, 0, 0, 0].astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(q, k, v)
        float(out[0][0, 0, 0, 0].astype(jnp.float32))
        print(f"{name} fwd+bwd: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms")

    # --- compiled memory: flash backward must not allocate (S,S) temps ---
    ma = gf.lower(q, k, v).compile().memory_analysis()
    mb = gr.lower(q, k, v).compile().memory_analysis()
    if ma is not None:
        print(f"flash temp bytes: {ma.temp_size_in_bytes / 1e6:.1f} MB; "
              f"naive temp bytes: {mb.temp_size_in_bytes / 1e6:.1f} MB")
    print("OK")


if __name__ == "__main__":
    main()
