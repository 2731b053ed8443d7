"""Faithful port of the reference's legacy ``features=[...]`` zoo
(/root/reference/models/mores.py) — the older architectures that differ
structurally from the active parametric zoo in models/mod.py:

- ``MoresUNet``       (mores.py:5-73): fixed 64..1024 channels, conv blocks
  with Conv(bias)->ReLU->BN ordering, decoder = conv_block THEN transposed
  conv, ``cat([x, skip])`` concat order, final = conv_block + 1x1.
- ``MoresVNet2D``     (mores.py:75-135): strided 2x2 conv downsampling that
  KEEPS channels (the channel jump happens in the next block), PReLU blocks,
  ``cat([x, skip])`` decoder concat (mores.py:131 — opposite of mod.py).
- ``MoresAttentionUNet`` (mores.py:162-223): gate F_int = f//2 (mod.py uses
  the skip width), ``cat([skip, x])``.
- ``MoresResUNet``    (mores.py:244-276): residual blocks like mod.py but
  biased transposed convs and ``cat([skip, x])``.
- ``MoresASPPUNet``   (mores.py:299-351).
- ``MoresTransUNet``  (mores.py:353-428): see class docstring — the torch
  forward is BROKEN (channel mismatch); parameters are ported exactly and
  the forward carries a documented repair (QUIRKS #18).
- ``MoresImprovedVNet`` (mores.py:435-585): triple-branch encoder with SE
  blocks implemented as 1x1 convs (reduction 4), dropout-regularized conv
  blocks — distinct from the vnet.py triple-branch model ported in
  models/legacy.py.

All ports are NHWC flax with float32 params; param counts are asserted
against the torch classes in tests/test_mores.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    ASPP,
    AttentionGate,
    ConvBNAct,
    ResidualBlock,
    batch_norm,
    TransformerEncoderLayer,
    max_pool_2x2,
)


class _ConvReluBN2(nn.Module):
    """mores UNet conv_block: (Conv3x3 bias -> ReLU -> BN) x2
    (mores.py:33-43). Note ReLU BEFORE BatchNorm."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.relu(x)
            x = batch_norm(train=train, dtype=self.dtype, name=f"bn{i + 1}")(x)
        return x


def _upconv(features, *, use_bias=True, dtype=jnp.float32, name=None):
    return nn.ConvTranspose(features, (2, 2), strides=(2, 2),
                            padding="VALID", use_bias=use_bias, dtype=dtype,
                            name=name)


class MoresUNet(nn.Module):
    """mores.py:5-73 — fixed-channel UNet, decoder conv-then-upsample."""

    in_channels: int = 1
    out_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        enc1 = _ConvReluBN2(64, dtype=dt, name="encoder1")(x, train)
        enc2 = _ConvReluBN2(128, dtype=dt, name="encoder2")(
            max_pool_2x2(enc1), train)
        enc3 = _ConvReluBN2(256, dtype=dt, name="encoder3")(
            max_pool_2x2(enc2), train)
        enc4 = _ConvReluBN2(512, dtype=dt, name="encoder4")(
            max_pool_2x2(enc3), train)

        # middle: pool -> conv_block(512, 1024) -> upconv(1024 -> 512)
        m = _ConvReluBN2(1024, dtype=dt, name="middle_block")(
            max_pool_2x2(enc4), train)
        dec4 = _upconv(512, dtype=dt, name="middle_up")(m)

        def up_block(y, skip, mid, out, name):
            y = jnp.concatenate([y, skip], axis=-1)  # cat([x, skip])
            y = _ConvReluBN2(mid, dtype=dt, name=f"{name}_block")(y, train)
            return _upconv(out, dtype=dt, name=f"{name}_up")(y)

        dec3 = up_block(dec4, enc4, 512, 256, "decoder3")
        dec2 = up_block(dec3, enc3, 256, 128, "decoder2")
        dec1 = up_block(dec2, enc2, 128, 64, "decoder1")
        y = jnp.concatenate([dec1, enc1], axis=-1)
        y = _ConvReluBN2(64, dtype=dt, name="final_block")(y, train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=dt,
                       name="final_conv")(y)


class MoresVNet2D(nn.Module):
    """mores.py:75-135 — channel-keeping strided-conv downsampling, PReLU
    blocks, cat([x, skip]) decoder order (the :131 quirk)."""

    in_channels: int = 1
    out_channels: int = 1
    features: Sequence[int] = (16, 32, 64, 128, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        skips = []
        for i, f in enumerate(self.features):
            x = ConvBNAct(f, act="prelu", dtype=dt, name=f"enc{i}")(x, train)
            skips.append(x)
            x = nn.Conv(f, (2, 2), strides=(2, 2), use_bias=False, dtype=dt,
                        name=f"down{i}")(x)
        x = ConvBNAct(self.features[-1] * 2, act="prelu", dtype=dt,
                      name="bottleneck")(x, train)
        for i, (f, skip) in enumerate(zip(reversed(self.features),
                                          reversed(skips))):
            x = _upconv(f, use_bias=False, dtype=dt, name=f"up{i}")(x)
            x = jnp.concatenate([x, skip], axis=-1)      # mores.py:131
            x = ConvBNAct(f, act="prelu", dtype=dt, name=f"dec{i}")(x, train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=dt,
                       name="final_conv")(x)


class _PoolEncDecUNet(nn.Module):
    """Shared skeleton of the mores Attention/ASPP/Res UNets: double-conv or
    residual encoders with max-pool, f*2 bottleneck, biased upconvs,
    cat([skip, x]) decode."""

    in_channels: int = 1
    out_channels: int = 1
    features: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

    def enc_block(self, f, name):
        return ConvBNAct(f, dtype=self.dtype, name=name)

    def bottleneck_block(self):
        return ConvBNAct(self.features[-1] * 2, dtype=self.dtype,
                         name="bottleneck")

    def gate(self, i, f):
        return None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        skips = []
        for i, f in enumerate(self.features):
            x = self.enc_block(f, f"enc{i}")(x, train=train)
            skips.append(x)
            x = max_pool_2x2(x)
        x = self.bottleneck_block()(x, train=train)
        for i, (f, skip) in enumerate(zip(reversed(self.features),
                                          reversed(skips))):
            x = _upconv(f, dtype=self.dtype, name=f"up{i}")(x)
            g = self.gate(i, f)
            if g is not None:
                skip = g(g=x, x=skip, train=train)
            x = jnp.concatenate([skip, x], axis=-1)
            x = self.enc_block(f, f"dec{i}")(x, train=train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True,
                       dtype=self.dtype, name="final_conv")(x)


class MoresAttentionUNet(_PoolEncDecUNet):
    """mores.py:162-223 — attention gates with F_int = f // 2."""

    def gate(self, i, f):
        return AttentionGate(max(f // 2, 1), dtype=self.dtype,
                             name=f"att{i}")


class MoresResUNet(_PoolEncDecUNet):
    """mores.py:244-276."""

    def enc_block(self, f, name):
        return ResidualBlock(f, dtype=self.dtype, name=name)

    def bottleneck_block(self):
        return ResidualBlock(self.features[-1] * 2, dtype=self.dtype,
                             name="bottleneck")


class MoresASPPUNet(_PoolEncDecUNet):
    """mores.py:299-351."""

    def bottleneck_block(self):
        return ASPP(self.features[-1] * 2, dtype=self.dtype,
                    name="bottleneck")


class MoresTransUNet(nn.Module):
    """mores.py:353-428 — CNN encoder + batch-axis transformer bottleneck.

    QUIRKS #18: the torch forward is BROKEN as checked in — after
    ``trans_proj`` the tensor has features[-1] channels but the first
    decoder stage declares ``ConvTranspose2d(features[-1]*2, ...)``, so
    ``forward`` raises a channel-mismatch error (only ``test.py`` ever
    instantiates it, for parameter counting). This port keeps every
    parameter shape identical and repairs the forward by concatenating the
    transformer output with its own input (the pooled deepest feature map),
    which is the natural 1024-channel interpretation.
    """

    in_channels: int = 1
    out_channels: int = 1
    features: Sequence[int] = (64, 128, 256, 512)
    trans_dim: int = 256
    num_heads: int = 8
    num_layers: int = 4
    image_size: int = 512
    batch_axis_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        skips = []
        for i, f in enumerate(self.features):
            x = ConvBNAct(f, dtype=dt, name=f"enc{i}")(x, train)
            skips.append(x)
            x = max_pool_2x2(x)
        trans_in = x
        n, h, w, _ = x.shape
        x = nn.Conv(self.trans_dim, (1, 1), use_bias=False, dtype=dt,
                    name="patchify")(x)
        x = x.reshape(n, h * w, self.trans_dim)
        pos = self.param("pos_emb", nn.initializers.normal(1.0),
                         (1, (self.image_size // 2 ** len(self.features)) ** 2,
                          self.trans_dim), jnp.float32)
        x = x + pos[:, :h * w].astype(x.dtype)
        x = nn.Dropout(0.1)(x, deterministic=not train)
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.trans_dim, self.num_heads,
                attend_batch_axis=self.batch_axis_attention, dtype=dt,
                name=f"trans{i}")(x, train=train)
        x = nn.Dense(self.features[-1], use_bias=True, dtype=dt,
                     name="trans_proj")(x)
        x = x.reshape(n, h, w, self.features[-1])
        # repair: the declared f*2-input upconv needs 1024 channels
        x = jnp.concatenate([x, trans_in], axis=-1)
        for i, (f, skip) in enumerate(zip(reversed(self.features),
                                          reversed(skips))):
            x = _upconv(f, dtype=dt, name=f"up{i}")(x)
            x = jnp.concatenate([skip, x], axis=-1)
            x = ConvBNAct(f, dtype=dt, name=f"dec{i}")(x, train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=dt,
                       name="final_conv")(x)


class _SEConv(nn.Module):
    """mores SEBlock (mores.py:435-456): squeeze + two 1x1 convs
    (reduction 4 by default), biased."""

    features: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)      # (N,1,1,C)
        s = nn.Conv(self.features // self.reduction, (1, 1), use_bias=True,
                    dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype,
                    name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class _DropConvBlock(nn.Module):
    """mores ConvBlock (mores.py:458-490): n x (Conv3x3 bias -> BN -> ReLU
    -> Dropout) + residual (1x1 biased projection when widths differ)."""

    features: int
    num_convs: int
    dropout_rate: float = 0.05
    project: bool = True  # in_channels != out_channels in the reference
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        for i in range(self.num_convs):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = batch_norm(train=train, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        if self.project:
            res = nn.Conv(self.features, (1, 1), use_bias=True,
                          dtype=self.dtype, name="res_proj")(res)
        return x + res


class MoresImprovedVNet(nn.Module):
    """mores.py:492-585 — triple-branch encoder fusion with conv-SE blocks.

    Distinct from the vnet.py triple-branch model (models/legacy.py):
    SE excitation uses 1x1 convs with reduction 4, encoder blocks carry
    dropout, downsampling is a biased 3x3 stride-2 conv, and only blocks
    whose in/out widths differ get a residual projection.
    """

    in_channels: int = 1
    out_channels: int = 1          # torch name: num_classes
    base_filters: int = 64         # torch name: base_num_filters
    dropout_rate: float = 0.05
    se_reduction: int = 4
    num_branches: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        filters = [self.base_filters * 2 ** i for i in range(5)]
        counts = [2, 2, 3, 3, 3]
        feats = []
        for b in range(self.num_branches):
            e = x
            branch = []
            for i in range(5):
                e = _DropConvBlock(
                    filters[i], counts[i],
                    self.dropout_rate, project=(i == 0), dtype=dt,
                    name=f"enc_b{b}_l{i}")(e, train)
                e = _SEConv(filters[i], self.se_reduction, dtype=dt,
                            name=f"se_b{b}_l{i}")(e)
                branch.append(e)
                if i < 4:
                    e = nn.Conv(filters[i + 1], (3, 3), strides=(2, 2),
                                padding=1, use_bias=True, dtype=dt,
                                name=f"down_b{b}_l{i}")(e)
            feats.append(branch)

        d = jnp.concatenate([feats[b][4] for b in range(self.num_branches)],
                            axis=-1)
        dec_counts = [3, 3, 2, 2]
        for j, lvl in enumerate(range(3, -1, -1)):
            d = _upconv(filters[lvl], dtype=dt, name=f"up{6 + j}")(d)
            skip = jnp.concatenate(
                [feats[b][lvl] for b in range(self.num_branches)], axis=-1)
            d = jnp.concatenate([d, skip], axis=-1)
            d = _DropConvBlock(filters[lvl], dec_counts[j],
                               self.dropout_rate, project=True, dtype=dt,
                               name=f"dec{6 + j}")(d, train)
        d = _SEConv(filters[0], self.se_reduction, dtype=dt,
                    name="dec_se_final")(d)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=dt,
                       name="final_conv")(d)


MORES_REGISTRY = {
    "MoresUNet": MoresUNet,
    "MoresVNet2D": MoresVNet2D,
    "MoresAttentionUNet": MoresAttentionUNet,
    "MoresResUNet": MoresResUNet,
    "MoresASPPUNet": MoresASPPUNet,
    "MoresTransUNet": MoresTransUNet,
    "MoresImprovedVNet": MoresImprovedVNet,
}
