"""Attention kernels for the TransUNet bottleneck.

``attention_reference``: plain XLA attention (two MXU matmuls + fused
softmax). Right choice for short sequences (the default TransUNet depth-5
bottleneck is 256 tokens).

``flash_attention``: Pallas TPU flash kernels — tiled online-softmax
attention that never materializes the (S, S) score matrix, in EITHER
direction. Forward is the classic single-pass online-softmax kernel and
additionally writes the per-row logsumexp; backward is two Pallas kernels
(dk/dv over key tiles, dq over query tiles) that recompute the probability
tiles blockwise from (q, k, lse) — FlashAttention-2 style. Activation
memory is O(S*D) and per-kernel working set O(BQ*BK); compute is ~2x the
forward (the standard flash recompute tradeoff). Worthwhile for the
shallow-depth / high-res configs (depth 3 at 512x512 -> 4096 tokens, where
naive scores are 16M elements per head per image, forward AND backward).

Layout: q, k, v are (B, H, S, D) with D the head dim. S must be a multiple
of the block sizes (the caller pads; TransUNet token counts are powers of
two). The logsumexp residual is stored (B*H, S, 1) so every kernel touches
it as a (rows, 1) column tile — no sublane<->lane relayouts anywhere, and
the trailing block dimension equals the array's (a Mosaic block-shape
requirement). All accumulation is f32 regardless of input dtype.

Replaces the capability of /root/reference/models/mod.py:297-320 (torch
nn.TransformerEncoderLayer self-attention) for long sequences.
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


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
                sm_scale):
    """One (BLOCK_Q, D) query tile against all K/V tiles, online softmax.
    Also writes the (BLOCK_Q, 1) logsumexp column for the backward pass."""
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
    m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)                         # (BQ, 1) column


def _flash_forward(q, k, v, block_q: int, block_k: int,
                   interpret: bool = False):
    """Returns (o of q.shape, lse of (B*H, S, 1) f32)."""
    b, h, s, d = q.shape
    sm_scale = 1.0 / (d ** 0.5)
    bh = b * h
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)
    kernel = functools.partial(_fwd_kernel, block_k=block_k,
                               sm_scale=sm_scale)
    spec_kw, extra = _spec_kw(interpret)
    o, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((bh, s, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, s, 1), jnp.float32)),
        grid=(bh, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), **spec_kw),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), **spec_kw),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), **spec_kw),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), **spec_kw),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), **spec_kw),
        ),
        **extra,
    )(qf, kf, vf)
    return o.reshape(b, h, s, d), lse


# ---------------------------------------------------------------------------
# backward (FlashAttention-2 style blockwise recompute)
# ---------------------------------------------------------------------------


def _dkdv_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref,
                 dk_ref, dv_ref, *, block_q: int, sm_scale):
    """One (BLOCK_K, D) key/value tile; loops over all query tiles."""
    k = k_ref[0].astype(jnp.float32)                   # (BK, D)
    v = v_ref[0].astype(jnp.float32)
    bk, d = k.shape
    s_total = q_ref.shape[1]
    num_q = s_total // block_q

    def body(i, carry):
        dk, dv = carry
        sl = pl.ds(i * block_q, block_q)
        q = q_ref[0, sl, :].astype(jnp.float32) * sm_scale   # (BQ, D)
        do = do_ref[0, sl, :].astype(jnp.float32)
        o = o_ref[0, sl, :].astype(jnp.float32)
        lse = lse_ref[0, sl, :]                               # (BQ, 1)
        delta = jnp.sum(do * o, axis=1, keepdims=True)        # (BQ, 1)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)                                  # (BQ, BK)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                                 # (BQ, BK)
        # dK = dS^T (sm_scale * Q) — q is already scaled above
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _dq_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, dq_ref,
               *, block_k: int, sm_scale):
    """One (BLOCK_Q, D) query tile; loops over all key/value tiles."""
    q = q_ref[0].astype(jnp.float32) * sm_scale        # (BQ, D)
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                   # (BQ, 1)
    delta = jnp.sum(do * o, axis=1, keepdims=True)     # (BQ, 1)
    bq, d = q.shape
    s_total = k_ref.shape[1]
    num_k = s_total // block_k

    def body(i, dq):
        sl = pl.ds(i * block_k, block_k)
        k = k_ref[0, sl, :].astype(jnp.float32)        # (BK, D)
        v = v_ref[0, sl, :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)                           # (BQ, BK)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_k, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)


def _flash_backward(q, k, v, o, lse, g, block_q: int, block_k: int,
                    interpret: bool = False):
    b, h, s, d = q.shape
    sm_scale = 1.0 / (d ** 0.5)
    bh = b * h
    qf, kf, vf, of, gf = (t.reshape(bh, s, d) for t in (q, k, v, o, g))
    spec_kw, extra = _spec_kw(interpret)

    full = pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), **spec_kw)
    lse_full = pl.BlockSpec((1, s, 1), lambda i, j: (i, 0, 0), **spec_kw)

    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel, block_q=block_q, sm_scale=sm_scale),
        out_shape=(jax.ShapeDtypeStruct((bh, s, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, s, d), v.dtype)),
        grid=(bh, s // block_k),
        in_specs=[
            full, full, full, lse_full,
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), **spec_kw),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), **spec_kw),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), **spec_kw),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0), **spec_kw),
        ),
        **extra,
    )(qf, gf, of, lse, kf, vf)

    qtile = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), **spec_kw)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_k=block_k, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=(bh, s // block_q),
        in_specs=[
            qtile, qtile, qtile,
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0), **spec_kw),
            full, full,
        ],
        out_specs=qtile,
        **extra,
    )(qf, gf, of, lse, kf, vf)

    rs = lambda t: t.reshape(b, h, s, d)
    return rs(dq), rs(dk), rs(dv)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _spec_kw(interpret: bool):
    if interpret:
        return {}, dict(interpret=True)
    return dict(memory_space=pltpu.VMEM), {}


def _fallback(q, block_q: int, block_k: int, interpret: bool) -> bool:
    s, d = q.shape[-2], q.shape[-1]
    bad_shape = bool(s % block_q or s % block_k or d % 8)
    if interpret:
        return bad_shape
    return (pltpu is None or jax.default_backend() in ("cpu", "gpu")
            or bad_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, block_q: int = 256, block_k: int = 256,
                    interpret: bool = False):
    """Flash attention; falls back to XLA off-TPU or on odd shapes.
    ``interpret=True`` forces the Pallas kernels in interpreter mode (CPU
    testing)."""
    if _fallback(q, block_q, block_k, interpret):
        return attention_reference(q, k, v)
    return _flash_forward(q, k, v, block_q, block_k, interpret)[0]


def _vjp_fwd(q, k, v, block_q, block_k, interpret):
    if _fallback(q, block_q, block_k, interpret):
        return attention_reference(q, k, v), (q, k, v, None, None)
    o, lse = _flash_forward(q, k, v, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _vjp_bwd(block_q, block_k, interpret, res, g):
    q, k, v, o, lse = res
    if o is None:  # fallback path: differentiate the naive formulation
        _, vjp = jax.vjp(attention_reference, q, k, v)
        return vjp(g)
    return _flash_backward(q, k, v, o, lse, g, block_q, block_k, interpret)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
