"""Shared building blocks for the UNet-family zoo.

TPU-first conventions used throughout the zoo:

- **NHWC layout** (TPU-preferred; XLA tiles the channel axis onto the 128-lane
  vector registers and the MXU without transposes).
- **bf16-friendly**: modules take a ``dtype`` for compute; parameters and
  BatchNorm statistics stay float32 (``param_dtype``).
- Static Python control flow only — the depth-parametric encoder/decoder loops
  unroll at trace time, so everything under ``jit`` is a single static graph.

Behavioral parity targets (capability, not code) in the reference:
  /root/reference/models/mod.py:43-51   (Conv-BN-ReLU double block)
  /root/reference/models/mod.py:71-84   (ResidualBlock)
  /root/reference/models/mod.py:136-150 (ASPP)
  /root/reference/models/mod.py:211-234 (AttentionGate)
  /root/reference/models/mod.py:297-320 (TransEncoder)
Parameter shapes/counts match the torch reference exactly (see
tests/test_models.py golden counts).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (new = 0.9*old + 0.1*batch).
# Flax momentum is the retention factor of the old stats, hence 0.9.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

# BatchNorm variance algorithm (QUIRKS #24). flax's default one-pass
# E[x^2]-E[x]^2 ("fast variance") suffers f32 cancellation on conv
# activations: train-mode GRADIENTS diverge from torch (two-pass
# E[(x-mu)^2]) by up to ~1e-2 normwise per parameter even though forward
# losses agree to 1e-5 — the error enters through the d(var) chain of the
# BN input-gradient. Two-pass matches torch down to torch's own f32
# conditioning (~2e-3, the same profile as torch f32-vs-f64) but costs
# 4.8% train throughput on the flagship (258.5 -> 246.0 img/s, one extra
# reduction pass per BN; /tmp A/B r3). Production default stays fast;
# set_bn_fast_variance(False) (--bn_exact_variance) selects torch
# numerics. Trace-time setting: flip it BEFORE jit/apply.
_BN_FAST_VARIANCE = [True]


def set_bn_fast_variance(fast: bool) -> None:
    """Select the process-wide BatchNorm variance algorithm (see above).
    Takes effect at trace time — call before building/jitting steps."""
    _BN_FAST_VARIANCE[0] = bool(fast)


def bn_fast_variance() -> bool:
    return _BN_FAST_VARIANCE[0]


def batch_norm(*, train: bool, dtype=jnp.float32, name: str | None = None,
               momentum: float = BN_MOMENTUM, epsilon: float = BN_EPS):
    """The zoo's BatchNorm: torch defaults + the process-wide variance
    algorithm selection."""
    return nn.BatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=epsilon, dtype=dtype, name=name,
                        use_fast_variance=_BN_FAST_VARIANCE[0])


class ConvBNAct(nn.Module):
    """3x3 Conv (no bias) -> BatchNorm -> activation, twice.

    The canonical encoder/decoder block of the zoo. ``act`` selects ReLU or a
    learnable PReLU (VNet2D uses PReLU with torch's 0.25 init).
    """

    features: int
    act: str = "relu"  # "relu" | "prelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # ``train`` is positional-friendly so nn.remat can mark it static
        for i in range(2):
            x = nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False,
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            x = batch_norm(train=train, dtype=self.dtype, name=f"bn{i + 1}",
            )(x)
            if self.act == "prelu":
                # torch nn.PReLU(): one shared learnable slope, init 0.25.
                x = nn.PReLU(negative_slope_init=0.25, name=f"prelu{i + 1}")(x)
            else:
                x = nn.relu(x)
        return x


class ResidualBlock(nn.Module):
    """(Conv-BN-ReLU-Conv-BN) + 1x1-conv shortcut, ReLU after the add."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # ``train`` is positional-friendly so nn.remat can mark it static
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = batch_norm(train=train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = batch_norm(train=train, dtype=self.dtype, name="bn2")(y)
        s = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="skip")(x)
        return nn.relu(y + s)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling bottleneck.

    Four parallel dilated 3x3 convs (rates 1/6/12/18 by default) concatenated
    and projected by a 1x1 Conv-BN-ReLU.
    """

    features: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        branches = [
            nn.Conv(self.features, (3, 3), padding=d, kernel_dilation=(d, d),
                    use_bias=False, dtype=self.dtype, name=f"branch{i}")(x)
            for i, d in enumerate(self.dilations)
        ]
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        y = batch_norm(train=train, dtype=self.dtype, name="project_bn")(y)
        return nn.relu(y)


class AttentionGate(nn.Module):
    """Additive attention gate on a skip connection.

    psi = sigmoid(BN(Conv1x1(relu(W_g . g + W_x . x)))); returns x * psi.
    """

    inter_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g, x, *, train: bool):
        g1 = nn.Conv(self.inter_features, (1, 1), use_bias=True,
                     dtype=self.dtype, name="w_g")(g)
        g1 = batch_norm(train=train, dtype=self.dtype, name="w_g_bn")(g1)
        x1 = nn.Conv(self.inter_features, (1, 1), use_bias=True,
                     dtype=self.dtype, name="w_x")(x)
        x1 = batch_norm(train=train, dtype=self.dtype, name="w_x_bn")(x1)
        psi = nn.relu(g1 + x1)
        psi = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                      name="psi")(psi)
        psi = batch_norm(train=train, dtype=self.dtype, name="psi_bn")(psi)
        return x * jax.nn.sigmoid(psi)


def max_pool_2x2(x):
    """2x2 stride-2 max pool, NHWC. Maps to an XLA reduce-window."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class UpConv2x(nn.Module):
    """2x2 stride-2 transposed conv implemented as a 1x1 matmul to 4*C
    channels + depth-to-space.

    For k == s == 2 the taps don't overlap, so the transposed conv is
    exactly ``out[n, 2i+dy, 2j+dx, o] = sum_ci x[n,i,j,ci] * K'[dy,dx,ci,o]``
    with K' the spatially flipped kernel — i.e. one MXU matmul plus a
    reshape. Measured ~25-35% faster than XLA's conv_transpose lowering at
    decoder shapes on v5e. Parameter names/shapes are identical to flax
    nn.ConvTranspose ("kernel" (2,2,in,out), "bias" (out,)), so checkpoints
    and torch .pth interop are unaffected; numerics match exactly
    (tests/test_models.py::test_upconv_matches_conv_transpose).
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, cin = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, cin, self.features), jnp.float32)
        k = kernel[::-1, ::-1].astype(self.dtype)  # gradient orientation
        xd = x.astype(self.dtype)
        y = jax.lax.dot_general(
            xd.reshape(-1, cin),
            k.transpose(2, 0, 1, 3).reshape(cin, 4 * self.features),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(self.dtype)
        y = y.reshape(n, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w,
                                                  self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def up_conv(features: int, *, use_bias: bool = True, dtype=jnp.float32,
            name: str | None = None, fast: bool = False):
    """2x2 stride-2 transposed conv (exact equivalent of torch
    ConvTranspose2d(k=2, s=2): non-overlapping taps, so flax's fractionally-
    strided formulation is identical). ``fast=True`` selects the UpConv2x
    matmul+depth-to-space lowering (bit-compatible params; faster at
    isolated decoder shapes but whole-graph effect is layout-dependent —
    A/B on your hardware before enabling)."""
    if fast:
        return UpConv2x(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.ConvTranspose(features, (2, 2), strides=(2, 2),
                            padding="VALID", use_bias=use_bias, dtype=dtype,
                            name=name)


def resize_bilinear(x, h: int, w: int):
    """Bilinear spatial resize on NHWC, align_corners=False semantics
    (jax.image 'linear' matches torch interpolate align_corners=False)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, h, w, c), method="linear")


def match_spatial(x, skip):
    """Shape-fix: bilinearly resize ``x`` to ``skip``'s spatial dims if they
    differ (mirrors the F.interpolate guard in every reference decoder)."""
    if x.shape[1:3] != skip.shape[1:3]:
        x = resize_bilinear(x, skip.shape[1], skip.shape[2])
    return x


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer with torch-compatible parameter
    shapes: packed qkv projection, ReLU feed-forward of width 4*embed_dim.

    x = LN1(x + Drop(SelfAttn(x))); x = LN2(x + Drop(FF(x)))

    ``attend_batch_axis`` reproduces a reference quirk: the torch reference
    feeds (B, S, E) into nn.TransformerEncoderLayer with the default
    batch_first=False (/root/reference/models/mod.py:308-319), so torch
    treats the BATCH axis as the sequence — "attention" mixes the same token
    position across batch images, not across spatial positions. Default here
    is the intended spatial attention; flip the flag for bit parity.
    """

    embed_dim: int
    num_heads: int
    mlp_ratio: int = 4
    dropout: float = 0.1
    attend_batch_axis: bool = False
    # None = auto: use the Pallas flash kernels (fwd + dq/dk/dv bwd) once
    # the sequence is long enough that the (S, S) score matrix dominates
    # memory; short sequences are faster as two plain MXU matmuls.
    use_flash_attention: bool | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.attend_batch_axis:
            x = x.transpose(1, 0, 2)  # attend over the original batch axis
        b, s, e = x.shape
        h = self.num_heads
        hd = e // h
        # Packed qkv like torch MHA's in_proj (3E x E weight + 3E bias).
        qkv = nn.Dense(3 * e, use_bias=True, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        use_flash = self.use_flash_attention
        if use_flash is None:
            # Auto-enable only when it cannot change training semantics:
            # the flash kernels skip attention-probability dropout (torch
            # MHA drops the softmax weights too, mod.py:309 semantics), so
            # a *training* step with dropout>0 must stay on the exact
            # parity path even at long S (e.g. TransUNet depth-3 at 512^2,
            # S=4096). Eval/serving — dropout off — still picks flash.
            # An explicit use_flash_attention=True flag always wins.
            use_flash = (s >= 1024 and s % 256 == 0 and hd % 8 == 0
                         and (not train or self.dropout == 0.0))
        if use_flash:
            # Pallas tiled online-softmax kernel: O(S*D) memory — use for
            # long bottleneck sequences (shallow depth at high res).
            # NOTE: the flash kernels do NOT drop attention probabilities
            # (torch MHA's dropout=p on the softmax weights); out_proj/FF
            # dropout still applies. The auto path never takes flash when
            # it would drop that regularizer (gated on train/dropout above).
            from ddti_tpu.ops.attention import flash_attention
            y = flash_attention(q, k, v).astype(x.dtype)
        else:
            # Short sequences: two MXU matmuls + fused softmax is optimal.
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                              preferred_element_type=jnp.float32)
            attn = attn / jnp.sqrt(jnp.asarray(hd, attn.dtype))
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            # torch nn.TransformerEncoderLayer passes its dropout rate into
            # MultiheadAttention: the PROBABILITIES are dropped too
            # (mod.py:309 semantics), not just the projected output
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            y = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.transpose(0, 2, 1, 3).reshape(b, s, e)
        y = nn.Dense(e, use_bias=True, dtype=self.dtype, name="out_proj")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x + y)

        y = nn.Dense(self.mlp_ratio * e, use_bias=True, dtype=self.dtype,
                     name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(e, use_bias=True, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x + y)
        if self.attend_batch_axis:
            out = out.transpose(1, 0, 2)
        return out


# NOTE: the squeeze-and-excitation gates live with their models —
# models/legacy.py and models/mores.py each define the conv-based SEBlock
# matching the torch parameter shapes (1x1 conv kernels, not Dense); a
# Dense-based variant here would silently break .pth interop.
