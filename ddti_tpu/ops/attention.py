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

Heads narrower than the 128-lane vreg (TransUNet: D=32) dispatch to the
head-PACKED kernel variants, which put G = 128/D heads per lane group and
run every matmul at full 128-lane contraction via in-VMEM block-diagonal
K/V tiles — ~4x MXU utilization over the one-head-at-a-time layout. See
the packed-kernel section below.

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
# exp(x) = exp2(x * LOG2E): folding log2(e) into the softmax scale turns
# every per-score transcendental into the VPU's native exp2 — these kernels
# are exp-bound (PERF_NOTES), so the multiply matters. The lse residual is
# stored base-2; it is internal to the fwd/bwd kernel pair.
LOG2E = 1.4426950408889634

# Swap the builtin exp2 for the polynomial below inside every kernel
# (benchmarks/flash_poly_ab.py measures the trade on hardware; env
# override so the A/B can flip it per subprocess).
import os as _os

USE_POLY_EXP2 = _os.environ.get("DDTI_POLY_EXP2", "0") == "1"


def _exp2_poly(x):
    """exp2 via exponent-bit construction + degree-6 Taylor on the
    fraction: 2^x = 2^round(x) * 2^f, f in [-0.5, 0.5]; 2^round(x) is
    built bitwise ((i+127)<<23 bitcast to f32), 2^f = e^(f ln2) by Horner.
    Max rel err 2.4e-7 (exp2_probe.py) — below bf16 resolution. Inputs
    here are <= 0 (scores minus running max); the clamp maps the -1e30
    sentinel to 2^-126, which every use multiplies into a zero or
    dominated accumulator."""
    i = jnp.round(x)
    f = x - i
    ln2 = 0.6931471805599453
    p = f * jnp.float32(ln2 ** 6 / 720.0)
    for c in (ln2 ** 5 / 120.0, ln2 ** 4 / 24.0, ln2 ** 3 / 6.0,
              ln2 ** 2 / 2.0, ln2):
        p = (p + jnp.float32(c)) * f
    p = p + jnp.float32(1.0)
    ii = jnp.clip(i, -126.0, 127.0).astype(jnp.int32)
    two_i = jax.lax.bitcast_convert_type((ii + 127) << 23, jnp.float32)
    return p * two_i


def _exp2(x):
    return _exp2_poly(x) if USE_POLY_EXP2 else jnp.exp2(x)


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
    Also writes the (BLOCK_Q, 1) logsumexp column for the backward pass.

    Matmul operands stay in the INPUT dtype (bf16 in, f32 accumulate — the
    MXU's native mode, 2x its f32-passthrough rate); the probability tile
    is cast back to the input dtype for the PV matmul, as every production
    flash kernel does. Softmax statistics are f32 throughout."""
    q = q_ref[0]                                       # (BQ, D) input dtype
    bq = q.shape[0]
    d = q.shape[1]
    s_total = k_ref.shape[1]
    num_k = s_total // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (sm_scale * LOG2E)                      # base-2 domain
        m_cur = jnp.max(s, axis=1, keepdims=True)       # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = _exp2(s - m_new)                         # (BQ, BK) f32
        alpha = _exp2(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log2(l)                        # (BQ, 1), base-2


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
    """One (BLOCK_K, D) key/value tile; loops over all query tiles.
    Matmul operands stay in the input dtype (native-bf16 MXU mode);
    probability/ds tiles are cast back for their matmuls."""
    k = k_ref[0]                                       # (BK, D) input dtype
    v = v_ref[0]
    bk, d = k.shape
    s_total = q_ref.shape[1]
    num_q = s_total // block_q

    def body(i, carry):
        dk, dv = carry
        sl = pl.ds(i * block_q, block_q)
        q = q_ref[0, sl, :]                            # (BQ, D)
        do = do_ref[0, sl, :]
        o = o_ref[0, sl, :]
        lse = lse_ref[0, sl, :]                        # (BQ, 1)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=1, keepdims=True)         # (BQ, 1)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = _exp2(s * (sm_scale * LOG2E) - lse)     # (BQ, BK) f32
        pc = p.astype(do.dtype)
        dv = dv + jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                          # (BQ, BK) f32
        # dK = sm_scale * dS^T Q — the scale is applied once at the end
        dk = dk + jax.lax.dot_general(ds.astype(q.dtype), q,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _dq_kernel(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, dq_ref,
               *, block_k: int, sm_scale):
    """One (BLOCK_Q, D) query tile; loops over all key/value tiles.
    Matmul operands stay in the input dtype (native-bf16 MXU mode)."""
    q = q_ref[0]                                       # (BQ, D) input dtype
    do = do_ref[0]
    o = o_ref[0]
    lse = lse_ref[0]                                   # (BQ, 1)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=1, keepdims=True)             # (BQ, 1)
    bq, d = q.shape
    s_total = k_ref.shape[1]
    num_k = s_total // block_k

    def body(i, dq):
        sl = pl.ds(i * block_k, block_k)
        k = k_ref[0, sl, :]                            # (BK, D)
        v = v_ref[0, sl, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = _exp2(s * (sm_scale * LOG2E) - lse)     # (BQ, BK) f32
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(k.dtype)
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
# head-packed kernels (head_dim < 128)
#
# TransUNet's heads are 32-wide (embed 256 / 8 heads), so the unpacked
# kernels' matmuls contract only 32 of the MXU's 128 lanes (~25%
# utilization). The packed variants lay G = 128 // D heads side by side on
# the lane axis — q/k/v become (B*H/G, S, G*D) — and rebuild per-tile
# block-diagonal K/V matrices in VMEM:
#
#   K_bd[(g, j), c] = k_g[j, c - g*D] if c in head g's lane band else 0
#
# so ONE full-contraction MXU matmul computes all G heads' scores
# (q_pack @ K_bd^T -> (BQ, G*BK), head g's block in its own column group;
# the zero bands kill every cross-head term), and likewise p @ V_bd for
# the output, ds @ K_bd for dq, and band-extracted (G*BK, G*D) products
# for dk/dv. All reshapes stay 2D with lane-aligned slices/concats (no
# rank-3 relayouts — a Mosaic constraint), and per-head softmax statistics
# live in (BQ, G) columns. ~4x attention matmul utilization at D=32.
# ---------------------------------------------------------------------------


def _band(col, g, d):
    return (col >= g * d) & (col < (g + 1) * d)


def _stack_bd(t, G, d):
    """(BK, G*D) tile -> (G*BK, G*D) block matrix: row block g keeps only
    head g's lane band. Serves as K_bd/V_bd (see module comment)."""
    col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    return jnp.concatenate(
        [jnp.where(_band(col, g, d), t, 0.0) for g in range(G)], axis=0)


def _per_head_cols(x, G, bk, fn):
    """Apply ``fn`` to each (BQ, BK) head column group of x (BQ, G*BK);
    returns the (BQ, G) concat of the per-group results."""
    outs = [fn(jax.lax.slice_in_dim(x, g * bk, (g + 1) * bk, axis=1))
            for g in range(G)]
    return jnp.concatenate(outs, axis=1)


def _widen(stat, G, d):
    """(BQ, G) per-head column stats -> (BQ, G*D) lane-aligned broadcast."""
    cols = [jnp.broadcast_to(jax.lax.slice_in_dim(stat, g, g + 1, axis=1),
                             (stat.shape[0], d)) for g in range(G)]
    return jnp.concatenate(cols, axis=1)


def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
                       sm_scale, G: int):
    q = q_ref[0]                                       # (BQ, G*D) in dtype
    bq, gd = q.shape
    d = gd // G
    s_total = k_ref.shape[1]
    num_k = s_total // block_k

    def body(j, carry):
        m_prev, l_prev, acc = carry                    # (BQ,G),(BQ,G),(BQ,GD)
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        k_bd = _stack_bd(k, G, d)                      # (G*BK, G*D)
        v_bd = _stack_bd(v, G, d)
        s = jax.lax.dot_general(q, k_bd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (sm_scale * LOG2E)                     # base-2 domain
        m_cur = _per_head_cols(s, G, block_k,
                               lambda t: jnp.max(t, axis=1, keepdims=True))
        m_new = jnp.maximum(m_prev, m_cur)             # (BQ, G)
        p = _exp2(s - _widen(m_new, G, block_k))    # (BQ, G*BK) f32
        alpha = _exp2(m_prev - m_new)
        l_new = l_prev * alpha + _per_head_cols(
            p, G, block_k, lambda t: jnp.sum(t, axis=1, keepdims=True))
        pv = jax.lax.dot_general(p.astype(v.dtype), v_bd,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc * _widen(alpha, G, d) + pv
        return m_new, l_new, acc

    m0 = jnp.full((bq, G), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, G), jnp.float32)
    acc0 = jnp.zeros((bq, gd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / _widen(l, G, gd // G)).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log2(l)                       # (BQ, G), base-2


def _per_head_bands(a, b, G, d):
    """Per-head delta: sum over head g's lane band of a*b -> (BQ, G)."""
    prod = a * b
    outs = [jnp.sum(jax.lax.slice_in_dim(prod, g * d, (g + 1) * d, axis=1),
                    axis=1, keepdims=True) for g in range(G)]
    return jnp.concatenate(outs, axis=1)


def _extract_bands(r, G, block_k, d):
    """(G*BK, G*D) band-structured product -> (BK, G*D): row block g
    contributes only head g's lane band (dk/dv extraction)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (block_k, G * d), 1)
    out = jnp.zeros((block_k, G * d), jnp.float32)
    for g in range(G):
        rows = jax.lax.slice_in_dim(r, g * block_k, (g + 1) * block_k,
                                    axis=0)
        out = out + jnp.where(_band(col, g, d), rows, 0.0)
    return out


def _dkdv_kernel_packed(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref,
                        dk_ref, dv_ref, *, block_q: int, sm_scale, G: int):
    k = k_ref[0]                                       # (BK, G*D) in dtype
    v = v_ref[0]
    bk, gd = k.shape
    d = gd // G
    k_bd = _stack_bd(k, G, d)
    v_bd = _stack_bd(v, G, d)
    s_total = q_ref.shape[1]
    num_q = s_total // block_q

    def body(i, carry):
        dk, dv = carry                                 # (BK, GD) each
        sl = pl.ds(i * block_q, block_q)
        q = q_ref[0, sl, :]
        do = do_ref[0, sl, :]
        o = o_ref[0, sl, :]
        lse = lse_ref[0, sl, :]                        # (BQ, G)
        delta = _per_head_bands(do.astype(jnp.float32),
                                o.astype(jnp.float32), G, d)  # (BQ, G)
        s = jax.lax.dot_general(q, k_bd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = _exp2(s * (sm_scale * LOG2E)
                     - _widen(lse, G, bk))             # (BQ, G*BK) f32
        dp = jax.lax.dot_general(do, v_bd, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - _widen(delta, G, bk))
        # (G*BK, G*D) band products; only head-diagonal bands are real
        dv_r = jax.lax.dot_general(p.astype(do.dtype), do,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dk_r = jax.lax.dot_general(ds.astype(q.dtype), q,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dv = dv + _extract_bands(dv_r, G, bk, d)
        dk = dk + _extract_bands(dk_r, G, bk, d)
        return dk, dv

    dk0 = jnp.zeros((bk, gd), jnp.float32)
    dv0 = jnp.zeros((bk, gd), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _dq_kernel_packed(q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, dq_ref,
                      *, block_k: int, sm_scale, G: int):
    q = q_ref[0]                                       # (BQ, G*D) in dtype
    do = do_ref[0]
    o = o_ref[0]
    lse = lse_ref[0]                                   # (BQ, G)
    bq, gd = q.shape
    d = gd // G
    delta = _per_head_bands(do.astype(jnp.float32), o.astype(jnp.float32),
                            G, d)
    s_total = k_ref.shape[1]
    num_k = s_total // block_k

    def body(j, dq):
        sl = pl.ds(j * block_k, block_k)
        k = k_ref[0, sl, :]
        v = v_ref[0, sl, :]
        k_bd = _stack_bd(k, G, d)
        v_bd = _stack_bd(v, G, d)
        s = jax.lax.dot_general(q, k_bd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = _exp2(s * (sm_scale * LOG2E) - _widen(lse, G, block_k))
        dp = jax.lax.dot_general(do, v_bd, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - _widen(delta, G, block_k))).astype(k.dtype)
        return dq + jax.lax.dot_general(ds, k_bd, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_k, body, jnp.zeros((bq, gd), jnp.float32))
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)


def _pack_heads(t, G: int):
    """(B, H, S, D) -> (B*H/G, S, G*D): G heads side by side on lanes."""
    b, h, s, d = t.shape
    t = t.reshape(b, h // G, G, s, d).transpose(0, 1, 3, 2, 4)
    return t.reshape(b * (h // G), s, G * d)


def _unpack_heads(t, b: int, h: int, G: int):
    """Inverse of _pack_heads."""
    bh, s, gd = t.shape
    d = gd // G
    t = t.reshape(b, h // G, s, G, d).transpose(0, 1, 3, 2, 4)
    return t.reshape(b, h, s, d)


def _auto_blocks(s: int, block_q, block_k, dtype, *,
                 max_bq: int = 512, max_bk: int = 1024) -> tuple[int, int]:
    """Resolve ``None`` (= auto) block sizes; explicit integers are
    honored verbatim. Auto picks larger tiles when S allows — fewer
    serial fori iterations per program: measured on v5e at S=4096/D=32
    bf16, fwd 10.85 -> 6.57 ms going (256,256) -> (512,1024)
    (PERF_NOTES). f32 inputs keep 256s — the same tiles exceed the 16 MB
    scoped-VMEM limit (19.27M measured at (512,1024)). ``max_bq``/
    ``max_bk`` cap the AUTO choices only (explicit blocks still pass
    through); the backward call site pins both caps to 256 — its larger
    tiles compile standalone but blow scoped VMEM inside the full train
    graph (see _vjp_bwd)."""
    small = jnp.dtype(dtype).itemsize < 4
    if block_q is None:
        block_q = 512 if (small and max_bq >= 512 and s % 512 == 0) else 256
    if block_k is None:
        block_k = 256
        if small:
            for cand in (1024, 512):
                if cand <= max_bk and s % cand == 0:
                    block_k = cand
                    break
    return block_q, block_k


def _packing(q) -> int:
    """Heads per lane group: pack while a head fits more than once in the
    128-lane tile and the head count divides evenly."""
    d, h = q.shape[-1], q.shape[1]
    if d >= 128 or 128 % d:
        return 1
    G = 128 // d
    while G > 1 and h % G:
        G //= 2
    return G


def _flash_forward_packed(q, k, v, block_q: int, block_k: int, G: int,
                          interpret: bool = False):
    """Returns (o of q.shape, lse of (B*H/G, S, G) f32)."""
    b, h, s, d = q.shape
    sm_scale = 1.0 / (d ** 0.5)
    gd = G * d
    qf, kf, vf = (_pack_heads(t, G) for t in (q, k, v))
    bh = qf.shape[0]
    kernel = functools.partial(_fwd_kernel_packed, block_k=block_k,
                               sm_scale=sm_scale, G=G)
    spec_kw, extra = _spec_kw(interpret)
    o, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((bh, s, gd), q.dtype),
                   jax.ShapeDtypeStruct((bh, s, G), jnp.float32)),
        grid=(bh, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, gd), lambda i, j: (i, j, 0), **spec_kw),
            pl.BlockSpec((1, s, gd), lambda i, j: (i, 0, 0), **spec_kw),
            pl.BlockSpec((1, s, gd), lambda i, j: (i, 0, 0), **spec_kw),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, gd), lambda i, j: (i, j, 0), **spec_kw),
            pl.BlockSpec((1, block_q, G), lambda i, j: (i, j, 0), **spec_kw),
        ),
        **extra,
    )(qf, kf, vf)
    return _unpack_heads(o, b, h, G), lse


def _flash_backward_packed(q, k, v, o, lse, g, block_q: int, block_k: int,
                           G: int, interpret: bool = False):
    b, h, s, d = q.shape
    sm_scale = 1.0 / (d ** 0.5)
    gd = G * d
    qf, kf, vf, of, gf = (_pack_heads(t, G) for t in (q, k, v, o, g))
    bh = qf.shape[0]
    spec_kw, extra = _spec_kw(interpret)

    full = pl.BlockSpec((1, s, gd), lambda i, j: (i, 0, 0), **spec_kw)
    lse_full = pl.BlockSpec((1, s, G), lambda i, j: (i, 0, 0), **spec_kw)

    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel_packed, block_q=block_q,
                          sm_scale=sm_scale, G=G),
        out_shape=(jax.ShapeDtypeStruct((bh, s, gd), k.dtype),
                   jax.ShapeDtypeStruct((bh, s, gd), v.dtype)),
        grid=(bh, s // block_k),
        in_specs=[
            full, full, full, lse_full,
            pl.BlockSpec((1, block_k, gd), lambda i, j: (i, j, 0), **spec_kw),
            pl.BlockSpec((1, block_k, gd), lambda i, j: (i, j, 0), **spec_kw),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, gd), lambda i, j: (i, j, 0), **spec_kw),
            pl.BlockSpec((1, block_k, gd), lambda i, j: (i, j, 0), **spec_kw),
        ),
        **extra,
    )(qf, gf, of, lse, kf, vf)

    qtile = pl.BlockSpec((1, block_q, gd), lambda i, j: (i, j, 0), **spec_kw)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel_packed, block_k=block_k,
                          sm_scale=sm_scale, G=G),
        out_shape=jax.ShapeDtypeStruct((bh, s, gd), q.dtype),
        grid=(bh, s // block_q),
        in_specs=[
            qtile, qtile, qtile,
            pl.BlockSpec((1, block_q, G), lambda i, j: (i, j, 0), **spec_kw),
            full, full,
        ],
        out_specs=qtile,
        **extra,
    )(qf, gf, of, lse, kf, vf)

    unpack = lambda t: _unpack_heads(t, b, h, G)
    return unpack(dq), unpack(dk), unpack(dv)


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
def flash_attention(q, k, v, block_q: int | None = None,
                    block_k: int | None = None, interpret: bool = False):
    """Flash attention; falls back to XLA off-TPU or on odd shapes.
    Heads narrower than the 128-lane tile are packed G = 128/D per lane
    group (see the head-packed kernel section). ``block_q``/``block_k``
    default to None = auto-selected per dtype/S (_auto_blocks); explicit
    integers are honored verbatim. ``interpret=True`` forces the Pallas
    kernels in interpreter mode (CPU testing)."""
    fbq, fbk = _auto_blocks(q.shape[-2], block_q, block_k, q.dtype)
    if _fallback(q, fbq, fbk, interpret):
        return attention_reference(q, k, v)
    G = _packing(q)
    if G > 1:
        return _flash_forward_packed(q, k, v, fbq, fbk, G, interpret)[0]
    return _flash_forward(q, k, v, fbq, fbk, interpret)[0]


def _vjp_fwd(q, k, v, block_q, block_k, interpret):
    fbq, fbk = _auto_blocks(q.shape[-2], block_q, block_k, q.dtype)
    if _fallback(q, fbq, fbk, interpret):
        return attention_reference(q, k, v), (q, k, v, None, None)
    G = _packing(q)
    if G > 1:
        o, lse = _flash_forward_packed(q, k, v, fbq, fbk, G, interpret)
    else:
        o, lse = _flash_forward(q, k, v, fbq, fbk, interpret)
    return o, (q, k, v, o, lse)


def _vjp_bwd(block_q, block_k, interpret, res, g):
    q, k, v, o, lse = res
    if o is None:  # fallback path: differentiate the naive formulation
        _, vjp = jax.vjp(attention_reference, q, k, v)
        return vjp(g)
    G = _packing(q)
    # backward auto blocks stay at (256, 256): the kernels hold 3+
    # (BQ, G*BK) f32 temps per tile, and the larger tiles — though they
    # compile standalone (sweep: (512,512) 7.08 ms vs (256,256) 7.63) —
    # exceed the 16 MB scoped-VMEM limit INSIDE the full train graph
    # (22.2M at (512,512), 16.47M at (256,512); the in-graph layout adds
    # operand copies the standalone kernel doesn't have). Explicit caller
    # blocks are honored for standalone use.
    bbq, bbk = _auto_blocks(q.shape[-2], block_q, block_k, q.dtype,
                            max_bq=256, max_bk=256)
    if G > 1:
        return _flash_backward_packed(q, k, v, o, lse, g, bbq, bbk,
                                      G, interpret)
    return _flash_backward(q, k, v, o, lse, g, bbq, bbk, interpret)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
