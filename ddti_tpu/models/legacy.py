"""Legacy model variants — capability mirrors of the reference's older
model files, kept because the reference's smoke tooling (test.py) and
history exercise them:

- ``LegacyUNet``: the fixed-depth-4 UNet of /root/reference/models/model.py
  :5-79. Quirks preserved: Conv->ReLU->BN block order (BN after activation,
  unlike the active zoo's Conv->BN->ReLU), convs WITH bias, a "middle"
  stage of pool->block->transposed-conv, decoder = conv_block THEN upconv,
  and concat order [x, skip].
- ``TripleBranchImprovedVNet``: /root/reference/models/vnet.py:62-155 —
  three independent 5-level encoder branches (ConvBlock with 2/2/3/3/3
  convs + dropout + residual projection, SE recalibration per level,
  strided 3x3 downsampling), branch features concatenated at every skip
  level and at the bottom, one shared decoder (up6..up9) with a final SE
  and 1x1 head.

Parameter counts match the torch originals exactly (tests/test_models.py):
LegacyUNet 31,042,369; TripleBranchImprovedVNet(base=64) 160,435,681.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import batch_norm, max_pool_2x2, up_conv


class _ConvReluBN(nn.Module):
    """Conv(bias)->ReLU->BN twice — the legacy block order."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.relu(x)
            x = batch_norm(train=train, dtype=self.dtype, name=f"bn{i + 1}")(x)
        return x


class LegacyUNet(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        enc1 = _ConvReluBN(64, self.dtype, name="encoder1")(x, train=train)
        enc2 = _ConvReluBN(128, self.dtype, name="encoder2")(
            max_pool_2x2(enc1), train=train)
        enc3 = _ConvReluBN(256, self.dtype, name="encoder3")(
            max_pool_2x2(enc2), train=train)
        enc4 = _ConvReluBN(512, self.dtype, name="encoder4")(
            max_pool_2x2(enc3), train=train)

        # middle: pool -> block -> upconv
        mid = max_pool_2x2(enc4)
        mid = _ConvReluBN(1024, self.dtype, name="middle_block")(
            mid, train=train)
        mid = up_conv(512, dtype=self.dtype, name="middle_up")(mid)

        # decoder: concat [x, skip] -> conv_block(in, in//2) -> upconv(out)
        d = jnp.concatenate([mid, enc4], axis=-1)
        d = _ConvReluBN(512, self.dtype, name="decoder3_block")(d, train=train)
        d = up_conv(256, dtype=self.dtype, name="decoder3_up")(d)
        d = jnp.concatenate([d, enc3], axis=-1)
        d = _ConvReluBN(256, self.dtype, name="decoder2_block")(d, train=train)
        d = up_conv(128, dtype=self.dtype, name="decoder2_up")(d)
        d = jnp.concatenate([d, enc2], axis=-1)
        d = _ConvReluBN(128, self.dtype, name="decoder1_block")(d, train=train)
        d = up_conv(64, dtype=self.dtype, name="decoder1_up")(d)
        d = jnp.concatenate([d, enc1], axis=-1)
        d = _ConvReluBN(64, self.dtype, name="final_block")(d, train=train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True,
                       dtype=self.dtype, name="final_conv")(d)


class _LegacySE(nn.Module):
    """SE gate with 1x1-conv excitation layers (vnet.py:5-26)."""

    features: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        z = jnp.mean(x, axis=(1, 2), keepdims=True)
        z = nn.Conv(self.features // self.reduction, (1, 1), use_bias=True,
                    dtype=self.dtype, name="fc1")(z)
        z = nn.relu(z)
        z = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype,
                    name="fc2")(z)
        return x * jax.nn.sigmoid(z)


class _ConvBlock(nn.Module):
    """n x (Conv(bias)->BN->ReLU->Dropout) + residual 1x1 projection."""

    features: int
    num_convs: int
    dropout_rate: float = 0.05
    project_residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        residual = x
        for i in range(self.num_convs):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = batch_norm(train=train, dtype=self.dtype, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.project_residual:
            residual = nn.Conv(self.features, (1, 1), use_bias=True,
                               dtype=self.dtype, name="res_proj")(residual)
        return x + residual


class TripleBranchImprovedVNet(nn.Module):
    in_channels: int = 1
    num_classes: int = 1
    base_num_filters: int = 64
    dropout_rate: float = 0.05
    se_reduction: int = 4
    num_branches: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        f = [self.base_num_filters * (2 ** i) for i in range(5)]
        conv_counts = [2, 2, 3, 3, 3]

        # three independent encoder branches
        feats = []  # feats[b][i]
        for b in range(self.num_branches):
            e = x
            branch_feats = []
            for i in range(5):
                # levels >0 keep channel count (downsample conv did the
                # widening), so residual projection only when i == 0
                e = _ConvBlock(f[i] if i else f[0], conv_counts[i],
                               self.dropout_rate,
                               project_residual=(i == 0),
                               dtype=self.dtype,
                               name=f"enc_b{b}_l{i}")(e, train=train)
                e = _LegacySE(f[i], self.se_reduction, self.dtype,
                              name=f"se_b{b}_l{i}")(e)
                branch_feats.append(e)
                if i < 4:
                    e = nn.Conv(f[i + 1], (3, 3), strides=(2, 2), padding=1,
                                use_bias=True, dtype=self.dtype,
                                name=f"down_b{b}_l{i}")(e)
            feats.append(branch_feats)

        d = jnp.concatenate([feats[b][4] for b in range(self.num_branches)],
                            axis=-1)
        ups = [("up6", f[3], 3), ("up7", f[2], 3), ("up8", f[1], 2),
               ("up9", f[0], 2)]
        for level, (name, ch, ncv) in enumerate(ups):
            d = up_conv(ch, dtype=self.dtype, name=name)(d)
            skip = jnp.concatenate(
                [feats[b][3 - level] for b in range(self.num_branches)],
                axis=-1)
            d = jnp.concatenate([d, skip], axis=-1)
            d = _ConvBlock(ch, ncv, self.dropout_rate,
                           project_residual=True, dtype=self.dtype,
                           name=f"dec_block{6 + level}")(d, train=train)
        d = _LegacySE(f[0], self.se_reduction, self.dtype,
                      name="dec_se_final")(d)
        return nn.Conv(self.num_classes, (1, 1), use_bias=True,
                       dtype=self.dtype, name="final_conv")(d)
