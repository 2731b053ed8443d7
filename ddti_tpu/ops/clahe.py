"""On-device CLAHE (contrast-limited adaptive histogram equalization).

Replicates cv2.createCLAHE(clipLimit, tileGridSize).apply on uint8 images —
the augmentation the reference runs through OpenCV on the host
(/root/reference/utils/transforms.py:73-81) — as a single fused XLA program:

 1. per-tile 256-bin histograms (vectorized bincount via one-hot reduce);
 2. cv2's integer clip-and-redistribute (even share + residual stepping);
 3. LUT = round(cdf * 255 / tileArea) per tile;
 4. bilinear blend of the 4 surrounding tile LUTs per pixel (tile centers,
    clamped at the borders) — cv2's interpolation body.

Requires H, W divisible by the tile grid (DDTI path: 512x512 with a 4x4
grid -> 128x128 tiles; cv2 would reflect-pad otherwise, which we do on the
host side if ever needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid"))
def clahe_u8(img_u8: jnp.ndarray, clip_limit: float = 2.0,
             grid: tuple[int, int] = (4, 4)) -> jnp.ndarray:
    """CLAHE of one (H, W) uint8 image. Returns uint8."""
    h, w = img_u8.shape
    gy, gx = grid
    th, tw = h // gy, w // gx
    assert th * gy == h and tw * gx == w, "image must tile evenly"
    tile_area = th * tw
    n_tiles = gy * gx
    hist_size = 256

    # cv2: clipLimit_int = max(int(clipLimit * tileArea / histSize), 1)
    limit = max(int(clip_limit * tile_area / hist_size), 1)

    # --- per-tile histograms ------------------------------------------------
    tiles = img_u8.reshape(gy, th, gx, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(n_tiles, tile_area).astype(jnp.int32)
    one_hot = jax.nn.one_hot(tiles, hist_size, dtype=jnp.int32)
    hists = one_hot.sum(axis=1)  # (n_tiles, 256)

    # --- clip & redistribute (cv2 integer semantics) ------------------------
    excess = jnp.sum(jnp.maximum(hists - limit, 0), axis=1, keepdims=True)
    clipped = jnp.minimum(hists, limit)
    batch = excess // hist_size
    residual = excess - batch * hist_size  # (n_tiles, 1)
    clipped = clipped + batch
    # cv2: step = max(histSize // residual, 1);
    #      for (i = 0; i < histSize && residual > 0; i += step, residual--)
    #          hist[i]++
    # i.e. bump bins 0, step, 2*step, ... but only the first `residual`
    # of them (when step underfills, e.g. residual > 128 -> step 1, the
    # walk stops at bin `residual`, not at 255)
    step = jnp.maximum(hist_size // jnp.maximum(residual, 1), 1)
    idx = jnp.arange(hist_size)[None, :]
    bump = (idx % step == 0) & (idx // step < residual)
    clipped = clipped + bump.astype(jnp.int32)

    # --- LUTs ---------------------------------------------------------------
    cdf = jnp.cumsum(clipped, axis=1).astype(jnp.float32)
    scale = jnp.float32((hist_size - 1)) / jnp.float32(tile_area)
    luts = jnp.clip(jnp.round(cdf * scale), 0, 255)  # (n_tiles, 256) f32

    # --- bilinear interpolation between tile LUTs ---------------------------
    # cv2's CLAHE_Interpolation_Body: txf = x * inv_tw - 0.5 (corner
    # coordinates, no half-pixel shift — verified bit-exact vs cv2), taps
    # clamped to the border tiles.
    #
    # Sweep formulation — NO per-pixel gather. The naive form
    # luts[ty, tx, v] is four 8.4M-index value-gathers per 128x256^2 batch
    # (~484 ms on v5e, the whole CLAHE cost — benchmarks/PERF_NOTES.md).
    # Instead: the four neighbor-tile LUT planes are position-only, so they
    # expand to full resolution by repeat+slice (pure data movement, border
    # clamp = one edge-pad row/col), and the value lookup becomes a scan
    # over intensity chunks accumulating 1[img == v] * blended_lut_v —
    # compare+FMA streams on the VPU. Identical arithmetic to the tap
    # formulation: every pixel matches exactly one intensity term, and the
    # blend weights are the same f32 products in either association.
    # Work on a half-tile-padded grid (Y = y + th/2): there the neighbor
    # planes are clean block broadcasts — plane0[Y] = lp[Y//th],
    # plane1[Y] = lp[Y//th + 1] with lp edge-padded, and the fractional
    # weight is simply frac(Y/th) — so the whole per-chunk field expansion
    # is broadcast+reshape+FMA that XLA fuses into the select-sum (the
    # offset-slice formulation materialized 50 MB repeats per chunk).
    # The padded border pixels compute garbage and are sliced away at the
    # end (1.56x pixels at a 4x4 grid on 256^2 — still gather-free).
    # The half-tile shift is integral only for EVEN tile sides; odd tiles
    # take the direct tap-gather formulation below (correct at any size,
    # just gather-bound — fine off the hot path).
    luts = luts.reshape(gy, gx, hist_size)
    if th % 2 or tw % 2:
        yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        tyf = yy / th - 0.5
        txf = xx / tw - 0.5
        ty0 = jnp.floor(tyf)
        tx0 = jnp.floor(txf)
        fy = tyf - ty0
        fx = txf - tx0
        y0 = jnp.clip(ty0, 0, gy - 1).astype(jnp.int32)
        y1 = jnp.clip(ty0 + 1, 0, gy - 1).astype(jnp.int32)
        x0 = jnp.clip(tx0, 0, gx - 1).astype(jnp.int32)
        x1 = jnp.clip(tx0 + 1, 0, gx - 1).astype(jnp.int32)
        v = img_u8.astype(jnp.int32)

        def lut_at(ty, tx):
            return luts[ty, tx, v]

        top = lut_at(y0, x0) * (1 - fx) + lut_at(y0, x1) * fx
        bot = lut_at(y1, x0) * (1 - fx) + lut_at(y1, x1) * fx
        out = top * (1 - fy) + bot * fy
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    lp = jnp.concatenate([luts[:1], luts, luts[-1:]], axis=0)
    lp = jnp.concatenate([lp[:, :1], lp, lp[:, -1:]], axis=1)
    hp, wp = h + th, w + tw
    fy = ((jnp.arange(hp, dtype=jnp.float32) % th) / th)[:, None, None]
    fx = ((jnp.arange(wp, dtype=jnp.float32) % tw) / tw)[None, :, None]
    v_pad = jnp.pad(img_u8, ((th // 2, th // 2), (tw // 2, tw // 2))
                    ).astype(jnp.int32)

    chunk = 16
    n_chunks = hist_size // chunk
    lp_chunks = jnp.moveaxis(
        lp.reshape(gy + 2, gx + 2, n_chunks, chunk), 2, 0)

    def expand(t):  # (gy+1, gx+1, chunk) tile grid -> (hp, wp, chunk)
        t = jnp.broadcast_to(t[:, None, :, None, :],
                             (gy + 1, th, gx + 1, tw, chunk))
        return t.reshape((gy + 1) * th, (gx + 1) * tw, chunk)[:hp, :wp]

    def body(acc, args):
        lpc, v0 = args
        a00 = expand(lpc[:-1, :-1])
        a01 = expand(lpc[:-1, 1:])
        a10 = expand(lpc[1:, :-1])
        a11 = expand(lpc[1:, 1:])
        lut_field = ((1 - fy) * ((1 - fx) * a00 + fx * a01)
                     + fy * ((1 - fx) * a10 + fx * a11))
        sel = v_pad[..., None] == (v0 + jnp.arange(chunk))
        return acc + jnp.sum(jnp.where(sel, lut_field, 0.0), -1), None

    out, _ = jax.lax.scan(
        body, jnp.zeros((hp, wp), jnp.float32),
        (lp_chunks, jnp.arange(n_chunks, dtype=jnp.int32) * chunk))
    out = out[th // 2: th // 2 + h, tw // 2: tw // 2 + w]
    # cv2 uses fixed-point weights and saturate_cast; round-to-nearest here.
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def clahe_float(img: jnp.ndarray, clip_limit: float = 2.0,
                grid: tuple[int, int] = (4, 4)) -> jnp.ndarray:
    """CLAHE of a float [0,1] image via the uint8 path (the reference always
    applies CLAHE to uint8 data)."""
    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.uint8)
    return clahe_u8(u8, clip_limit, grid).astype(jnp.float32) / 255.0
