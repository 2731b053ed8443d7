"""Probe: can a barrel shifter (static jnp.roll + per-row/col select, 24
levels) beat the per-element warp gather floor?

The fused flip+rotate warp costs 77.5 ms per 128x256^2 batch — pinned at
XLA's ~8 cycle/index gather floor (benchmarks/PERF_NOTES.md). A Paeth
three-shear rotation needs only per-ROW (resp. per-column) constant shifts,
and a shift by s in [0, 256) is expressible as 8 conditional static rolls
(select on bit k of s) — pure data-movement + select, no gather at all.
This probe times a structurally-faithful 24-level barrel skeleton (3 shear
passes x 8 bits, plus 3 zero-fill mask applications) against the current
gather warp. If a level runs at HBM bandwidth the whole warp should land
at ~3-6 ms.

Run: benchmarks/run_in_repo.sh benchmarks/barrel_probe.py
"""
import time

import jax
import jax.numpy as jnp

from ddti_tpu.ops.resample import fused_flip_rotate, paeth_flip_rotate

B, H, W = 128, 256, 256


def sync(x):
    return float(jnp.sum(x[0]) + jnp.sum(x[1]))


key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (B, H, W), jnp.float32)
msk = (jax.random.uniform(jax.random.fold_in(key, 1), (B, H, W)) > .5
       ).astype(jnp.float32)
ang = jax.random.uniform(jax.random.fold_in(key, 2), (B,),
                         minval=-180., maxval=180.)
fh = jnp.zeros((B,), bool)
fv = jnp.zeros((B,), bool)
# shift planes for the skeleton (values irrelevant to cost; uniform [0,256))
s1 = jax.random.randint(jax.random.fold_in(key, 3), (B, H), 0, 256)
s2 = jax.random.randint(jax.random.fold_in(key, 4), (B, W), 0, 256)
s3 = jax.random.randint(jax.random.fold_in(key, 5), (B, H), 0, 256)


@jax.jit
def warp_gather(img, msk, fh, fv, ang):
    return jax.vmap(fused_flip_rotate)(img, msk, fh, fv, ang)


def _xpass(t, s):
    # s: (B, H) int32 shift per row, roll along lanes (W)
    for k in range(8):
        bit = ((s >> k) & 1).astype(bool)[:, None, :, None]
        t = jnp.where(bit, jnp.roll(t, 1 << k, axis=-1), t)
    return t


def _ypass(t, s):
    # s: (B, W) int32 shift per column, roll along sublanes (H)
    for k in range(8):
        bit = ((s >> k) & 1).astype(bool)[:, None, None, :]
        t = jnp.where(bit, jnp.roll(t, 1 << k, axis=-2), t)
    return t


def _barrel(img, msk, s1, s2, s3, dtype):
    t = jnp.stack([img, msk], 1).astype(dtype)  # (B, 2, H, W)
    t = _xpass(t, s1)
    t = t * (s1 < 200).astype(dtype)[:, None, :, None]   # zero-fill mask 1
    t = _ypass(t, s2)
    t = t * (s2 < 200).astype(dtype)[:, None, None, :]   # zero-fill mask 2
    t = _xpass(t, s3)
    t = t * (s3 < 200).astype(dtype)[:, None, :, None]   # zero-fill mask 3
    return t[:, 0].astype(jnp.float32), t[:, 1].astype(jnp.float32)


@jax.jit
def warp_barrel_f32(img, msk, s1, s2, s3):
    return _barrel(img, msk, s1, s2, s3, jnp.float32)


@jax.jit
def warp_barrel_bf16(img, msk, s1, s2, s3):
    return _barrel(img, msk, s1, s2, s3, jnp.bfloat16)


def bench(name, fn, *args, iters=20):
    sync(fn(*args))  # compile + warmup
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:24s} {dt:8.2f} ms")
    return dt


@jax.jit
def warp_paeth(img, msk, fh, fv, ang):
    return jax.vmap(paeth_flip_rotate)(img, msk, fh, fv, ang)


if __name__ == "__main__":
    print(f"batch {B} x {H}x{W}, image+mask planes")
    bench("gather warp (current)", warp_gather, img, msk, fh, fv, ang)
    bench("barrel 24-level f32", warp_barrel_f32, img, msk, s1, s2, s3)
    bench("barrel 24-level bf16", warp_barrel_bf16, img, msk, s1, s2, s3)
    bench("paeth warp (shipped)", warp_paeth, img, msk, fh, fv, ang)
