#!/usr/bin/env python3
"""Bound the BatchNorm-statistics share of the flagship train step (r5,
VERDICT item 4: the ~120 ms of non-conv, non-warp step time was attributed
to "BN stat reductions / backward elementwise" without a closing bound).

Variants (run each in its OWN process: a second large program in-process
is distorted by heap fragmentation — CLAUDE.md):

  base         the production step (fast-variance BN), the 297 img/s program
  frozen       BatchNorm uses running averages even in train mode: no stat
               reductions, no d(var)/d(mean) backward chain, affine folds
               into the conv epilogue. Everything else (augmentation, convs,
               losses, AdamW) is identical -> (base - frozen) is an UPPER
               bound on what ANY BN-stats optimization could recover.
  rowsub2/4    batch statistics computed over every 2nd/4th row of each
               conv output (rows are HBM-contiguous, so the stats pass
               reads 1/2 / 1/4 of the bytes). Normalization/backward still
               touch the full tensor. A numerics-changing candidate: only
               worth a quality study if the measured win is real.
  reduce_floor the raw cost of one fused (sum, sum_sq) channel-reduction
               over each BN-input tensor shape of the flagship at bs128 —
               the analytic HBM floor of the stats passes alone.

Usage: python benchmarks/bn_share_probe.py <variant> [--steps N]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _patch_bn(mode: str, stride: int = 1):
    """Replace blocks.batch_norm with a probe variant. Trace-time patch —
    call before building the model/step."""
    from flax import linen as nn

    from ddti_tpu.models import blocks

    if mode == "frozen":
        def batch_norm(*, train, dtype=jnp.float32, name=None,
                       momentum=blocks.BN_MOMENTUM, epsilon=blocks.BN_EPS):
            return nn.BatchNorm(use_running_average=True, momentum=momentum,
                                epsilon=epsilon, dtype=dtype, name=name)
        blocks.batch_norm = batch_norm
        return

    class RowSubBN(nn.Module):
        """flax-compatible BN whose train-mode statistics are computed on a
        row-subsampled view (full tensor still normalized)."""
        use_running_average: bool
        momentum: float
        epsilon: float
        dtype: object
        row_stride: int

        @nn.compact
        def __call__(self, x):
            feat = x.shape[-1]
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros(feat, jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones(feat, jnp.float32))
            scale = self.param("scale", nn.initializers.ones, (feat,),
                               jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (feat,),
                              jnp.float32)
            if self.use_running_average:
                mean, var = ra_mean.value, ra_var.value
            else:
                xs = x[:, ::self.row_stride] if self.row_stride > 1 else x
                xf = xs.astype(jnp.float32)
                mean = jnp.mean(xf, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) \
                    - jnp.square(mean)  # fast (one-pass) variance
                if not self.is_initializing():
                    m = self.momentum
                    ra_mean.value = m * ra_mean.value + (1 - m) * mean
                    ra_var.value = m * ra_var.value + (1 - m) * var
            y = (x - mean.astype(x.dtype)) * (
                jax.lax.rsqrt(var + self.epsilon).astype(x.dtype)
                * scale.astype(x.dtype)) + bias.astype(x.dtype)
            return y

    def batch_norm(*, train, dtype=jnp.float32, name=None,
                   momentum=blocks.BN_MOMENTUM, epsilon=blocks.BN_EPS):
        return RowSubBN(use_running_average=not train, momentum=momentum,
                        epsilon=epsilon, dtype=dtype, name=name,
                        row_stride=stride)

    blocks.batch_norm = batch_norm


def run_step(name, steps=12, batch=128, size=256):
    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.models import ResUNet
    from ddti_tpu.train import create_train_state, make_train_step
    from ddti_tpu.train.engine import aug_config_from

    cfg = Config(batch_size=batch, image_size=size, store_size=size,
                 lr=1e-5, model_type="ResUNet", use_mixup=False,
                 compute_unused_losses=False)
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, size, size, 1), cfg.lr,
                               steps_per_epoch=100)
    im, ma = generate_ddti_like(batch, (size, size), 0)
    im, ma = jnp.asarray(im), jnp.asarray(ma)
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        state, m = step(state, im, ma, key)
    float(m.loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, im, ma, key)
    float(m.loss)
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name}: {ms:.1f} ms/step -> {batch / ms * 1e3:.1f} img/s",
          flush=True)


def reduce_floor(batch=128, size=256, bf=64, depth=5, reps=30):
    """Raw fused (sum, sum_sq) channel reductions over every BN-input
    tensor of the flagship forward at bs128/256^2."""
    shapes = []
    h, c = size, bf
    for i in range(depth):
        c = bf * 2 ** i
        shapes += [(batch, h, h, c)] * 2  # two convs per encoder block
        shapes += [(batch, h, h, c)]      # 1x1 skip path has no BN; the
        # third entry stands for the decoder block at the same level (its
        # first conv input is wider but output is c): two convs as well
        h //= 2
    shapes += [(batch, h, h, bf * 2 ** depth)] * 2  # bottleneck

    def stats(x):
        xf = x.astype(jnp.float32)
        return jnp.mean(xf, axis=(0, 1, 2)), \
            jnp.mean(jnp.square(xf), axis=(0, 1, 2))

    total = 0.0
    bytes_total = 0
    for shp in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), shp, jnp.bfloat16)
        f = jax.jit(stats)
        m, v = f(x)
        float(m[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            m, v = f(x)
        float(m[0]); float(v[0])
        dt = (time.perf_counter() - t0) / reps
        total += dt
        nbytes = 2
        for d in shp:
            nbytes *= d
        bytes_total += nbytes
        print(f"  {str(shp):24s} {dt * 1e3:6.2f} ms  "
              f"({nbytes / dt / 1e9:.0f} GB/s)", flush=True)
        x.delete()
    print(f"reduce_floor: {total * 1e3:.1f} ms over {len(shapes)} tensors "
          f"({bytes_total / 2**30:.2f} GiB read at "
          f"{bytes_total / total / 1e9:.0f} GB/s avg)", flush=True)


def main():
    from ddti_tpu.core.compcache import enable_compilation_cache

    enable_compilation_cache("auto")
    which = sys.argv[1] if len(sys.argv) > 1 else "base"
    if which == "base":
        run_step("base (fast-var BN)  ")
    elif which == "frozen":
        _patch_bn("frozen")
        run_step("frozen-stats BN     ")
    elif which in ("rowsub2", "rowsub4"):
        _patch_bn("rowsub", stride=int(which[-1]))
        run_step(f"rowsub{which[-1]} stats      ")
    elif which == "reduce_floor":
        reduce_floor()
    else:
        raise SystemExit(f"unknown variant {which}")


if __name__ == "__main__":
    main()
