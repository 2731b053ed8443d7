"""A/B on hardware: builtin jnp.exp2 vs the polynomial exp2
(ops/attention._exp2_poly) inside the REAL flash kernels.

The kernels are transcendental-bound at S=4096 (PERF_NOTES): ~1G exp2 per
forward dominates the 6.19 ms. If Mosaic's exp2 lowering is slower than a
degree-6 Horner + exponent-bit ldexp, the poly wins; measured inside the
production kernels, one variant per subprocess (fresh device heap, fresh
trace of the module flag).

Run: benchmarks/run_in_repo.sh benchmarks/flash_poly_ab.py
"""

import os
import subprocess
import sys
import time

B, H, S, D = 8, 8, 4096, 32


def measure():
    import jax
    import jax.numpy as jnp

    from ddti_tpu.ops import attention as A

    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
               for kk in jax.random.split(key, 3))

    def timeit(f, *args, n=20):
        o = f(*args)
        float(jax.tree.leaves(o)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*args)
        float(jax.tree.leaves(o)[0].ravel()[0])
        return (time.perf_counter() - t0) / n * 1e3

    fwd = jax.jit(A.flash_attention)
    t_fwd = timeit(fwd, q, k, v)

    def loss(*t):
        return jnp.sum(jnp.sin(A.flash_attention(*t).astype(jnp.float32)))

    grad = jax.jit(jax.grad(loss, (0, 1, 2)))
    t_bwd = timeit(grad, q, k, v)

    # numerics vs naive reference (always builtin-exp XLA path)
    o = fwd(q, k, v)
    o_ref = A.attention_reference(q, k, v)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                - o_ref.astype(jnp.float32))))
    print(f"RESULT poly={A.USE_POLY_EXP2} fwd_ms={t_fwd:.3f} "
          f"fwdbwd_ms={t_bwd:.3f} fwd_err={err:.3e}")


def main():
    if "--child" in sys.argv:
        measure()
        return
    for poly in ("0", "1"):
        env = dict(os.environ)
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        env["DDTI_POLY_EXP2"] = poly
        out = subprocess.run(
            [sys.executable, __file__, "--child"], capture_output=True,
            text=True, cwd="/root/repo", env=env)
        if out.returncode != 0:
            print(f"poly={poly} FAILED:\n{out.stderr[-2000:]}")
            continue
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[len("RESULT "):])


if __name__ == "__main__":
    main()
