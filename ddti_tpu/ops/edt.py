"""On-device exact Euclidean distance transform (EDT) for binary masks.

The reference's BoundaryLoss (/root/reference/models/loss.py:48-66) ships every
target mask to the host and runs ``scipy.ndimage.distance_transform_edt`` per
sample — a device->host sync inside the training step. Here the EDT runs
entirely on device and is differentiable-free (distances of a binary mask),
jit/vmap/pjit-compatible.

Semantics match ``scipy.ndimage.distance_transform_edt(x)``: for each nonzero
pixel of ``x``, the Euclidean distance to the nearest zero pixel. (BoundaryLoss
calls it on ``1 - gt``, i.e. distance to the nearest foreground pixel.) If the
mask has no zero pixel anywhere, scipy returns sqrt(H^2+W^2)-ish garbage; we
return the capped value ``INF_DIST`` = H+W, which exceeds any true distance.

Algorithm (exact, separable — Felzenszwalb-Huttenlocher semantics):
 1. Column pass: per column, the 1D distance to the nearest zero. Computed
    with two log-depth ``associative_scan`` cummax passes over pixel indices
    (TPU-friendly: no sequential 512-step scan).
 2. Row pass: D(i,j)^2 = min_k [ g(i,k)^2 + (j-k)^2 ]. A "min-plus" matrix
    product between the squared column distances and the squared index
    distance matrix. On TPU this runs as a Pallas kernel blocked over
    (row-tile, output-column-tile, k-tile) entirely in VMEM; elsewhere it
    falls back to a lax.map-blocked jnp reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # Pallas TPU backend (unavailable when running pure-CPU tests)
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _column_pass(zero_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-column distance (in pixels) to the nearest zero pixel.

    zero_mask: (H, W) bool, True where the input is zero (distance 0).
    Returns float32 (H, W); INF-capped where a column has no zero.
    """
    h, w = zero_mask.shape
    inf = jnp.float32(h + w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    neg = jnp.int32(-(h + w))
    # Index of the nearest zero at-or-above: running max of (row if zero).
    above = jax.lax.associative_scan(
        jnp.maximum, jnp.where(zero_mask, rows, neg), axis=0)
    d_above = jnp.where(above >= 0, rows - above, jnp.int32(h + w))
    # Nearest zero at-or-below: same trick on negated indices, reversed scan.
    below = jax.lax.associative_scan(
        jnp.maximum, jnp.where(zero_mask, -rows, neg), axis=0, reverse=True)
    d_below = jnp.where(below > neg, (-below) - rows, jnp.int32(h + w))
    return jnp.minimum(jnp.minimum(d_above, d_below), h + w).astype(jnp.float32)


def _minplus_reference(g2: jnp.ndarray, block: int = 32) -> jnp.ndarray:
    """Row pass without Pallas: D2[i, j] = min_k (g2[i, k] + (j - k)^2).

    Blocked over rows with lax.map to bound the (block, W, W) intermediate.
    """
    h, w = g2.shape
    k_idx = jnp.arange(w, dtype=jnp.float32)
    d2 = (k_idx[:, None] - k_idx[None, :]) ** 2  # (j, k)

    def row_block(gb):  # (block, W)
        # (block, 1, k) + (j, k) -> min over k -> (block, j)
        return jnp.min(gb[:, None, :] + d2[None, :, :], axis=-1)

    pad = (-h) % block
    gp = jnp.pad(g2, ((0, pad), (0, 0)))
    blocks = gp.reshape(-1, block, w)
    out = jax.lax.map(row_block, blocks).reshape(-1, w)
    return out[:h]


def _minplus_kernel(g2_ref, d2_ref, out_ref):
    """Pallas TPU kernel: one (ROW_TILE, COL_TILE) output tile.

    g2_ref:  (ROW_TILE, W)        squared column distances for these rows
    d2_ref:  (W, COL_TILE)        (k - j)^2 table slice for these columns
    out_ref: (ROW_TILE, COL_TILE) min-plus result
    """
    w = g2_ref.shape[1]
    k_tile = 128
    acc0 = jnp.full(out_ref.shape, jnp.float32(2 ** 30))

    def body(kc, acc):
        g = g2_ref[:, pl.ds(kc * k_tile, k_tile)]        # (R, Kt)
        d = d2_ref[pl.ds(kc * k_tile, k_tile), :]        # (Kt, C)
        # (R, Kt, 1) + (1, Kt, C) -> min over Kt (VPU reduction)
        cand = jnp.min(g[:, :, None] + d[None, :, :], axis=1)
        return jnp.minimum(acc, cand)

    out_ref[:] = jax.lax.fori_loop(0, w // k_tile, body, acc0)


def _minplus_pallas(g2: jnp.ndarray, row_tile: int = 8,
                    col_tile: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """Pallas-tiled min-plus row pass. Requires W % 128 == 0.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU test
    coverage of the exact kernel code)."""
    h, w = g2.shape
    pad_r = (-h) % row_tile
    gp = jnp.pad(g2, ((0, pad_r), (0, 0)))
    hp = h + pad_r
    j_idx = jnp.arange(w, dtype=jnp.float32)
    d2 = (j_idx[:, None] - j_idx[None, :]) ** 2  # (k, j)

    kwargs = {}
    if not interpret:
        kwargs = dict(
            in_specs=[
                pl.BlockSpec((row_tile, w), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, col_tile), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((row_tile, col_tile),
                                   lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        )
    else:
        kwargs = dict(
            in_specs=[
                pl.BlockSpec((row_tile, w), lambda i, j: (i, 0)),
                pl.BlockSpec((w, col_tile), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((row_tile, col_tile),
                                   lambda i, j: (i, j)),
            interpret=True,
        )
    out = pl.pallas_call(
        _minplus_kernel,
        out_shape=jax.ShapeDtypeStruct((hp, w), jnp.float32),
        grid=(hp // row_tile, w // col_tile),
        **kwargs,
    )(gp, d2)
    return out[:h]


def _use_pallas() -> bool:
    if pltpu is None:
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def distance_transform_edt(x: jnp.ndarray,
                           use_pallas: bool | None = None) -> jnp.ndarray:
    """Exact 2D EDT of a single (H, W) array (nonzero -> distance to nearest
    zero), float32. jit/vmap-compatible; batch via ``edt_batch``."""
    if use_pallas is None:
        use_pallas = _use_pallas()
    zero_mask = (x == 0)
    g = _column_pass(zero_mask)
    g2 = g * g
    w = x.shape[-1]
    if use_pallas and w % 128 == 0:
        d2 = _minplus_pallas(g2)
    else:
        d2 = _minplus_reference(g2)
    inf2 = jnp.float32((x.shape[0] + x.shape[1]) ** 2)
    return jnp.sqrt(jnp.minimum(d2, inf2))


def edt_batch(masks: jnp.ndarray) -> jnp.ndarray:
    """EDT over a batch: (N, H, W) or (N, H, W, 1) -> same-shaped float32."""
    squeeze = masks.ndim == 4
    m = masks[..., 0] if squeeze else masks
    out = jax.vmap(lambda a: distance_transform_edt(a))(m)
    return out[..., None] if squeeze else out
