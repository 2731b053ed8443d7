"""Attention kernels for the TransUNet bottleneck.

``attention_reference``: plain XLA attention (two MXU matmuls + fused
softmax). Right choice for short sequences (the default TransUNet depth-5
bottleneck is 256 tokens).

``flash_attention``: Pallas TPU flash kernel — tiled online-softmax
attention that never materializes the (S, S) score matrix. Worthwhile for
the shallow-depth / high-res configs (depth 3 at 512x512 -> 4096 tokens,
where naive scores are 16M elements per head per image). Forward is the
Pallas kernel; backward recomputes attention blockwise via XLA (activation
memory stays O(S * D), compute 2x — the standard flash tradeoff without a
hand-written backward kernel).

Layout: q, k, v are (B, H, S, D) with D the head dim. S must be a multiple
of the block size (the caller pads; TransUNet token counts are powers of
two). The kernel accumulates in f32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

NEG_INF = -1e30


def attention_reference(q, k, v):
    """softmax(q k^T / sqrt(d)) v with f32 accumulation."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.asarray(d, jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale):
    """One (BLOCK_Q, D) query tile against all K/V tiles, online softmax."""
    q = q_ref[0].astype(jnp.float32) * sm_scale        # (BQ, D)
    bq = q.shape[0]
    d = q.shape[1]
    s_total = k_ref.shape[1]
    num_k = s_total // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_cur = jnp.max(s, axis=1, keepdims=True)       # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                          # (BQ, BK)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, block_q: int, block_k: int,
                   interpret: bool = False):
    b, h, s, d = q.shape
    sm_scale = 1.0 / (d ** 0.5)
    bh = b * h
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)
    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               sm_scale=sm_scale)
    if interpret:
        spec_kw = {}
        extra = dict(interpret=True)
    else:
        spec_kw = dict(memory_space=pltpu.VMEM)
        extra = {}
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=(bh, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), **spec_kw),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), **spec_kw),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), **spec_kw),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               **spec_kw),
        **extra,
    )(qf, kf, vf)
    return out.reshape(b, h, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, block_q: int = 256, block_k: int = 256):
    """Flash attention; falls back to XLA off-TPU or on odd shapes."""
    s, d = q.shape[-2], q.shape[-1]
    if (pltpu is None or jax.default_backend() in ("cpu", "gpu")
            or s % block_q or s % block_k or d % 8):
        return attention_reference(q, k, v)
    return _flash_forward(q, k, v, block_q, block_k)


def _fwd(q, k, v, block_q, block_k):
    return flash_attention(q, k, v, block_q, block_k), (q, k, v)


def _bwd(block_q, block_k, res, g):
    # Blockwise recompute backward via XLA (memory O(S*D + BQ*S)).
    q, k, v = res

    def naive(q_, k_, v_):
        return attention_reference(q_, k_, v_)

    _, vjp = jax.vjp(naive, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
