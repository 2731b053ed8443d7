"""A/B on hardware: skipping the online-softmax rescale when the running
max is unchanged (the last open flash idea in PERF_NOTES / ROADMAP 3b).

After the first few K/V blocks the running max m rarely grows, so
alpha = exp2(m_prev - m_new) == 1 and the `l*alpha` / `acc*alpha`
rescales are identity work. This probe predicates the whole rescale on a
block-level scalar `any_row_grew = m_cur > m_prev` via lax.cond inside
the fori_loop body (Mosaic lowers it to a real branch). Both variants
share the probe's own kernel body so the A/B isolates the branch; the
baseline column is also compared against the production
`flash_attention` number.

Result (v5e, 2026-08-17, B8 H8 S4096 D32 bf16, bq=bk=256): NEGATIVE —
see PERF_NOTES.md. The rescale is (BQ,1)+(BQ,D) VPU work, a few percent
of the body, and the per-iteration branch + scalar reduce costs as much
as it saves.

Run: benchmarks/run_in_repo.sh benchmarks/flash_mskip_ab.py
"""

import functools
import sys
import time

B, H, S, D = 8, 8, 4096, 32
BQ = BK = 256


def build(skip_rescale: bool, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from ddti_tpu.ops import attention as A

    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k, sm_scale):
        q = q_ref[0]
        bq, d = q.shape
        num_k = k_ref.shape[1] // block_k

        def body(i, carry):
            m_prev, l_prev, acc = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), :]
            v = v_ref[0, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (sm_scale * A.LOG2E)
            m_cur = jnp.max(s, axis=1, keepdims=True)

            def rescale(_):
                m_new = jnp.maximum(m_prev, m_cur)
                p = A._exp2(s - m_new)
                alpha = A._exp2(m_prev - m_new)
                l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
                a = acc * alpha + jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return m_new, l_new, a

            if not skip_rescale:
                return rescale(None)

            def stale(_):  # every row's max unchanged: alpha == 1 exactly
                p = A._exp2(s - m_prev)
                l_new = l_prev + jnp.sum(p, axis=1, keepdims=True)
                a = acc + jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return m_prev, l_new, a

            grew = jnp.any(m_cur > m_prev)
            return jax.lax.cond(grew, rescale, stale, None)

        m0 = jnp.full((bq, 1), A.NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc0 = jnp.zeros((bq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
        o_ref[0] = (acc / l).astype(o_ref.dtype)
        lse_ref[0] = m + jnp.log2(l)

    def fwd(q, k, v):
        b, h, s, d = q.shape
        bh = b * h
        qf, kf, vf = (t.reshape(bh, s, d) for t in (q, k, v))
        kern = functools.partial(kernel, block_k=BK,
                                 sm_scale=1.0 / (d ** 0.5))
        spec_kw, extra = A._spec_kw(interpret)
        o, _lse = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((bh, s, d), q.dtype),
                       jax.ShapeDtypeStruct((bh, s, 1), jnp.float32)),
            grid=(bh, s // BQ),
            in_specs=[
                pl.BlockSpec((1, BQ, d), lambda i, j: (i, j, 0), **spec_kw),
                pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), **spec_kw),
                pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), **spec_kw),
            ],
            out_specs=(
                pl.BlockSpec((1, BQ, d), lambda i, j: (i, j, 0), **spec_kw),
                pl.BlockSpec((1, BQ, 1), lambda i, j: (i, j, 0), **spec_kw),
            ),
            **extra,
        )(qf, kf, vf)
        return o.reshape(b, h, s, d)

    return jax.jit(fwd)


def main():
    import jax
    import jax.numpy as jnp

    from ddti_tpu.ops import attention as A

    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
               for kk in jax.random.split(key, 3))

    def timeit(f, n=20):
        o = f(q, k, v)
        float(jax.tree.leaves(o)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(q, k, v)
        float(jax.tree.leaves(o)[0].ravel()[0])
        return (time.perf_counter() - t0) / n * 1e3

    ref = A.attention_reference(q, k, v).astype(jnp.float32)
    for name, f in (("baseline", build(False)),
                    ("m-skip", build(True))):
        t = timeit(f)
        err = float(jnp.max(jnp.abs(f(q, k, v).astype(jnp.float32) - ref)))
        print(f"{name:9s} fwd {t:6.3f} ms   max|err| {err:.3e}")


if __name__ == "__main__":
    sys.exit(main())
