"""A/B on hardware: head-packed vs unpacked flash kernels vs naive XLA.

Shape: the TransUNet depth-3 @ 512x512 bottleneck — 4096 tokens, 8 heads
of dim 32 (embed 256). Packed kernels put G=4 heads per 128-lane group.

Run: PYTHONUNBUFFERED=1 benchmarks/run_in_repo.sh benchmarks/flash_packed_ab.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ddti_tpu.ops.attention import (
    _flash_backward,
    _flash_forward,
    _flash_forward_packed,
    _packing,
    attention_reference,
    flash_attention,
)

B, H, S, D = 8, 8, 4096, 32


def timeit(f, *args, n=10):
    o = f(*args)
    float(jax.tree.leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    float(jax.tree.leaves(o)[0].ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
               for kk in jax.random.split(key, 3))
    print(f"shape B{B} H{H} S{S} D{D}  packing G={_packing(q)}")

    # numerics vs naive (forward)
    o_pack = flash_attention(q, k, v)
    o_ref = attention_reference(q, k, v)
    err = float(jnp.max(jnp.abs(o_pack.astype(jnp.float32)
                                - o_ref.astype(jnp.float32))))
    print(f"fwd packed-vs-naive max err: {err:.3e}")

    # gradient numerics
    def loss(fn):
        return lambda *t: jnp.sum(jnp.sin(fn(*t).astype(jnp.float32)))

    g_fl = jax.jit(jax.grad(loss(flash_attention), (0, 1, 2)))(q, k, v)
    g_rf = jax.jit(jax.grad(loss(attention_reference), (0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", g_fl, g_rf):
        e = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        s = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
        print(f"d{name} max err {e:.3e} (scale {s:.2f})")

    # timing: forward (block-size sweep for the packed kernel)
    for bq, bk in ((256, 256), (512, 512), (512, 1024), (1024, 512)):
        f = jax.jit(lambda q, k, v, bq=bq, bk=bk: _flash_forward_packed(
            q, k, v, bq, bk, 4)[0].astype(jnp.float32).sum())
        print(f"fwd packed  bq{bq:4d} bk{bk:4d}: {timeit(f, q, k, v):7.2f} ms")
    fwd_unpk = jax.jit(lambda q, k, v: _flash_forward(
        q, k, v, 256, 256)[0].astype(jnp.float32).sum())
    fwd_naiv = jax.jit(lambda q, k, v: attention_reference(
        q, k, v).astype(jnp.float32).sum())
    print(f"fwd unpacked(256) {timeit(fwd_unpk, q, k, v):7.2f} ms"
          f"  naive {timeit(fwd_naiv, q, k, v):7.2f} ms")

    # timing: forward+backward through the custom vjp (packed dispatch)
    gr_pack = jax.jit(jax.grad(loss(flash_attention), (0, 1, 2)))
    gr_naiv = jax.jit(jax.grad(loss(attention_reference), (0, 1, 2)))
    print(f"fwd+bwd packed {timeit(gr_pack, q, k, v):7.2f} ms"
          f"  naive {timeit(gr_naiv, q, k, v):7.2f} ms")

    # backward block sweep (packed kernels, direct)
    from ddti_tpu.ops.attention import _flash_backward_packed

    o, lse = jax.jit(lambda q, k, v: _flash_forward_packed(
        q, k, v, 512, 1024, 4))(q, k, v)
    g = jnp.cos(o.astype(jnp.float32)).astype(o.dtype)
    for bq, bk in ((256, 256), (512, 256), (256, 512), (512, 512)):
        f = jax.jit(lambda q, k, v, o, lse, g, bq=bq, bk=bk: [
            t.astype(jnp.float32).sum()
            for t in _flash_backward_packed(q, k, v, o, lse, g, bq, bk,
                                            4)][0])
        print(f"bwd packed  bq{bq:4d} bk{bk:4d}: "
              f"{timeit(f, q, k, v, o, lse, g):7.2f} ms")


if __name__ == "__main__":
    main()
