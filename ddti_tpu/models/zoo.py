"""The seven-architecture UNet-family model zoo (flax.linen, NHWC).

Every model has the uniform constructor
``(in_channels, out_channels, base_filters, depth, **kwargs)`` and maps
``(N, H, W, in_channels) -> (N, H, W, out_channels)`` logits, matching the
capability surface of /root/reference/models/mod.py (UNet :9-66, ResUNet
:86-131, ASPPUNet :152-206, AttentionUNet :236-292, TransUNet :322-403,
VNet2D :408-463, ImprovedVNet :468-541). Parameter counts match the torch
reference exactly (tests/test_models.py).

TPU notes:
- channel schedule ``base_filters * 2**i`` keeps convs MXU-shaped;
- the depth loop unrolls at trace time (static shapes, no dynamic control
  flow under jit);
- pass ``dtype=jnp.bfloat16`` for bf16 activations/compute with f32 params.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    ASPP,
    AttentionGate,
    ConvBNAct,
    ResidualBlock,
    TransformerEncoderLayer,
    match_spatial,
    max_pool_2x2,
    up_conv,
)


class _EncoderDecoderBase(nn.Module):
    """Shared scaffold config for the pool-based UNet variants."""

    in_channels: int = 1
    out_channels: int = 1
    base_filters: int = 64
    depth: int = 5
    # jax.checkpoint the conv blocks: recompute activations in the backward
    # pass instead of keeping them in HBM (useful at 512x512 / big batches).
    # True = every block; a tuple of LEVEL indices (0 = the highest-
    # resolution level, whose activations dominate HBM) remats only the
    # encoder+decoder blocks at those levels — selective remat buys most
    # of the memory back at a fraction of the recompute (pick the set with
    # train/autobatch.py's compile-time peak predictor; CLI: --remat for
    # all levels, --remat 0,1 for a subset).
    remat: Any = False
    dtype: Any = jnp.float32

    @property
    def channels(self):
        return [self.base_filters * (2 ** i) for i in range(self.depth)]

    def _remat_on(self, level) -> bool:
        # bool/int (incl. YAML `remat: 1`) keep the historical semantics:
        # any truthy scalar = remat every block. Only a tuple/list selects
        # levels.
        if isinstance(self.remat, (bool, int)):
            return bool(self.remat)
        if not self.remat:
            return False
        levels = tuple(int(v) for v in self.remat)
        bad = [v for v in levels if not 0 <= v < self.depth]
        if bad:
            raise ValueError(
                f"remat level(s) {bad} out of range for depth {self.depth} "
                f"(valid: 0..{self.depth - 1}); an out-of-range level would "
                f"silently rematerialize nothing")
        if level is None:  # level-agnostic call sites follow the bool only
            return False
        return int(level) in levels

    def _maybe_remat(self, cls, level=None):
        # static_argnums=(2,): the ``train`` flag (0 is self, 1 is x)
        return (nn.remat(cls, static_argnums=(2,))
                if self._remat_on(level) else cls)


class UNet(_EncoderDecoderBase):
    """Plain parametric UNet: double-conv blocks, maxpool down, transposed-
    conv up, [skip, x] concat, 1x1 head."""

    def setup(self):
        ch = self.channels
        self.encoders = [self._maybe_remat(ConvBNAct, i)(c, dtype=self.dtype)
                         for i, c in enumerate(ch)]
        self.bottleneck = ConvBNAct(ch[-1] * 2, dtype=self.dtype)
        self.upconvs = [up_conv(c, dtype=self.dtype) for c in reversed(ch)]
        self.decoders = [
            self._maybe_remat(ConvBNAct, self.depth - 1 - i)(c,
                                                             dtype=self.dtype)
            for i, c in enumerate(reversed(ch))]
        self.final_conv = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                                  dtype=self.dtype, name="final_conv")

    def __call__(self, x, *, train: bool = False):
        skips = []
        for enc in self.encoders:
            x = enc(x, train)
            skips.append(x)
            x = max_pool_2x2(x)
        x = self.bottleneck(x, train=train)
        for up, dec, skip in zip(self.upconvs, self.decoders, reversed(skips)):
            x = up(x)
            x = match_spatial(x, skip)
            x = jnp.concatenate([skip, x], axis=-1)
            x = dec(x, train)
        return self.final_conv(x)


class ResUNet(_EncoderDecoderBase):
    """UNet topology with residual blocks everywhere."""

    def setup(self):
        ch = self.channels
        self.encoders = [self._maybe_remat(ResidualBlock, i)(c, dtype=self.dtype)
                         for i, c in enumerate(ch)]
        self.bottleneck = ResidualBlock(ch[-1] * 2, dtype=self.dtype)
        self.upconvs = [up_conv(c, dtype=self.dtype) for c in reversed(ch)]
        self.decoders = [
            self._maybe_remat(ResidualBlock, self.depth - 1 - i)(
                c, dtype=self.dtype)
            for i, c in enumerate(reversed(ch))]
        self.final_conv = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                                  dtype=self.dtype, name="final_conv")

    def __call__(self, x, *, train: bool = False):
        skips = []
        for enc in self.encoders:
            x = enc(x, train)
            skips.append(x)
            x = max_pool_2x2(x)
        x = self.bottleneck(x, train=train)
        for up, dec, skip in zip(self.upconvs, self.decoders, reversed(skips)):
            x = up(x)
            x = match_spatial(x, skip)
            x = jnp.concatenate([skip, x], axis=-1)
            x = dec(x, train)
        return self.final_conv(x)


class ASPPUNet(_EncoderDecoderBase):
    """UNet with an atrous-spatial-pyramid-pooling bottleneck."""

    aspp_dilations: Sequence[int] = (1, 6, 12, 18)

    def setup(self):
        ch = self.channels
        self.encoders = [self._maybe_remat(ConvBNAct, i)(c, dtype=self.dtype)
                         for i, c in enumerate(ch)]
        self.aspp = ASPP(ch[-1] * 2, dilations=tuple(self.aspp_dilations),
                         dtype=self.dtype)
        self.upconvs = [up_conv(c, dtype=self.dtype) for c in reversed(ch)]
        self.decoders = [
            self._maybe_remat(ConvBNAct, self.depth - 1 - i)(c,
                                                             dtype=self.dtype)
            for i, c in enumerate(reversed(ch))]
        self.final_conv = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                                  dtype=self.dtype, name="final_conv")

    def __call__(self, x, *, train: bool = False):
        skips = []
        for enc in self.encoders:
            x = enc(x, train)
            skips.append(x)
            x = max_pool_2x2(x)
        x = self.aspp(x, train=train)
        for up, dec, skip in zip(self.upconvs, self.decoders, reversed(skips)):
            x = up(x)
            x = match_spatial(x, skip)
            x = jnp.concatenate([skip, x], axis=-1)
            x = dec(x, train)
        return self.final_conv(x)


class AttentionUNet(_EncoderDecoderBase):
    """UNet with additive attention gates on the skip connections."""

    def setup(self):
        ch = self.channels
        self.encoders = [self._maybe_remat(ConvBNAct, i)(c, dtype=self.dtype)
                         for i, c in enumerate(ch)]
        self.bottleneck = ConvBNAct(ch[-1] * 2, dtype=self.dtype)
        self.upconvs = [up_conv(c, dtype=self.dtype) for c in reversed(ch)]
        self.attn_gates = [AttentionGate(c // 2, dtype=self.dtype)
                           for c in reversed(ch)]
        self.decoders = [
            self._maybe_remat(ConvBNAct, self.depth - 1 - i)(c,
                                                             dtype=self.dtype)
            for i, c in enumerate(reversed(ch))]
        self.final_conv = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                                  dtype=self.dtype, name="final_conv")

    def __call__(self, x, *, train: bool = False):
        skips = []
        for enc in self.encoders:
            x = enc(x, train)
            skips.append(x)
            x = max_pool_2x2(x)
        x = self.bottleneck(x, train=train)
        for up, gate, dec, skip in zip(self.upconvs, self.attn_gates,
                                       self.decoders, reversed(skips)):
            x = up(x)
            x = match_spatial(x, skip)
            skip_att = gate(g=x, x=skip, train=train)
            x = jnp.concatenate([skip_att, x], axis=-1)
            x = dec(x, train)
        return self.final_conv(x)


class TransUNet(_EncoderDecoderBase):
    """CNN encoder + transformer bottleneck + UNet decoder.

    The bottleneck patchifies with a 1x1 conv to ``embed_dim``, adds a learned
    positional embedding over (image_size / 2**depth)^2 tokens, runs
    ``num_transformer_layers`` post-LN encoder layers, projects back to the
    encoder width and reshapes to the spatial map.
    """

    num_transformer_layers: int = 4
    num_heads: int = 8
    embed_dim: int = 256
    image_size: int = 512
    # The reference hardcodes 0.1 into its TransEncoder (mod.py:307-309);
    # configurable here so deterministic parity/serving runs can zero it.
    dropout_rate: float = 0.1
    # Reference-parity quirk: torch feeds (B, S, E) into seq-first layers so
    # "attention" runs across the batch axis (mod.py:308-319). False = the
    # intended spatial attention (default); True = bit parity with torch.
    batch_axis_attention: bool = False
    # Pallas flash attention for long bottleneck sequences (depth 3 at
    # 512x512 -> 4096 tokens); short sequences are faster with plain XLA.
    # None = auto: flash (forward AND Pallas backward) when S >= 1024.
    use_flash_attention: bool | None = None

    def setup(self):
        ch = self.channels
        self.encoders = [self._maybe_remat(ConvBNAct, i)(c, dtype=self.dtype)
                         for i, c in enumerate(ch)]
        s = self.image_size // (2 ** self.depth)
        self.patchify = nn.Conv(self.embed_dim, (1, 1), use_bias=False,
                                dtype=self.dtype, name="patchify")
        self.pos_emb = self.param(
            "pos_emb", nn.initializers.normal(1.0),
            (1, s * s, self.embed_dim), jnp.float32)
        self.trans_layers = [
            TransformerEncoderLayer(
                self.embed_dim, self.num_heads,
                dropout=self.dropout_rate,
                attend_batch_axis=self.batch_axis_attention,
                use_flash_attention=self.use_flash_attention,
                dtype=self.dtype)
            for _ in range(self.num_transformer_layers)
        ]
        self.trans_proj = nn.Dense(ch[-1], use_bias=True, dtype=self.dtype,
                                   name="trans_proj")
        self.in_dropout = nn.Dropout(self.dropout_rate)
        self.upconvs = [up_conv(c, dtype=self.dtype) for c in reversed(ch)]
        self.decoders = [
            self._maybe_remat(ConvBNAct, self.depth - 1 - i)(c,
                                                             dtype=self.dtype)
            for i, c in enumerate(reversed(ch))]
        self.final_conv = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                                  dtype=self.dtype, name="final_conv")

    def __call__(self, x, *, train: bool = False):
        skips = []
        for enc in self.encoders:
            x = enc(x, train)
            skips.append(x)
            x = max_pool_2x2(x)
        n, h, w, _ = x.shape
        x = self.patchify(x)
        x = x.reshape(n, h * w, self.embed_dim)
        x = x + self.pos_emb.astype(x.dtype)
        x = self.in_dropout(x, deterministic=not train)
        for layer in self.trans_layers:
            x = layer(x, train=train)
        x = self.trans_proj(x)
        x = x.reshape(n, h, w, -1)
        for up, dec, skip in zip(self.upconvs, self.decoders, reversed(skips)):
            x = up(x)
            x = match_spatial(x, skip)
            x = jnp.concatenate([skip, x], axis=-1)
            x = dec(x, train)
        return self.final_conv(x)


class VNet2D(_EncoderDecoderBase):
    """UNet topology with strided-conv downsampling and PReLU activations."""

    base_filters: int = 16

    def setup(self):
        ch = self.channels
        self.enc_blocks = [
            self._maybe_remat(ConvBNAct, i)(c, act="prelu", dtype=self.dtype)
            for i, c in enumerate(ch)]
        self.down_convs = [
            nn.Conv(c, (2, 2), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name=f"down_convs_{i}")
            for i, c in enumerate(ch)
        ]
        self.bottleneck = ConvBNAct(ch[-1] * 2, act="prelu", dtype=self.dtype)
        self.up_convs = [up_conv(c, use_bias=False, dtype=self.dtype)
                         for c in reversed(ch)]
        self.dec_blocks = [
            self._maybe_remat(ConvBNAct, self.depth - 1 - i)(
                c, act="prelu", dtype=self.dtype)
            for i, c in enumerate(reversed(ch))]
        self.final_conv = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                                  dtype=self.dtype, name="final_conv")

    def __call__(self, x, *, train: bool = False):
        skips = []
        for enc, down in zip(self.enc_blocks, self.down_convs):
            x = enc(x, train)
            skips.append(x)
            x = down(x)
        x = self.bottleneck(x, train=train)
        for up, dec, skip in zip(self.up_convs, self.dec_blocks,
                                 reversed(skips)):
            x = up(x)
            x = match_spatial(x, skip)
            x = jnp.concatenate([skip, x], axis=-1)
            x = dec(x, train)
        return self.final_conv(x)


class ImprovedVNet(_EncoderDecoderBase):
    """VNet2D topology (strided-conv down) with ReLU blocks, optional
    per-skip attention gates and optional deep-supervision heads.

    With ``deep_supervision=True`` returns ``(logits, [ds_logits...])``.
    """

    base_filters: int = 16
    use_attention: bool = True
    deep_supervision: bool = False

    def setup(self):
        ch = self.channels
        self.enc_blocks = [self._maybe_remat(ConvBNAct, i)(c, dtype=self.dtype)
                           for i, c in enumerate(ch)]
        self.down_convs = [
            nn.Conv(c, (2, 2), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name=f"down_convs_{i}")
            for i, c in enumerate(ch)
        ]
        self.bottleneck = ConvBNAct(ch[-1] * 2, dtype=self.dtype)
        self.up_convs = [up_conv(c, use_bias=False, dtype=self.dtype)
                         for c in reversed(ch)]
        if self.use_attention:
            self.attn_gates = [AttentionGate(c // 2, dtype=self.dtype)
                               for c in reversed(ch)]
        self.dec_blocks = [
            self._maybe_remat(ConvBNAct, self.depth - 1 - i)(c,
                                                             dtype=self.dtype)
            for i, c in enumerate(reversed(ch))]
        if self.deep_supervision:
            # One 1x1 head per decoder level, indexed by the encoder channel
            # schedule (matches the reference's per-``features`` heads).
            self.ds_heads = [
                nn.Conv(self.out_channels, (1, 1), use_bias=True,
                        dtype=self.dtype, name=f"ds_heads_{i}")
                for i, _ in enumerate(ch)
            ]
        self.final_conv = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                                  dtype=self.dtype, name="final_conv")

    def __call__(self, x, *, train: bool = False):
        skips = []
        for enc, down in zip(self.enc_blocks, self.down_convs):
            x = enc(x, train)
            skips.append(x)
            x = down(x)
        x = self.bottleneck(x, train=train)
        ds_outs = []
        for i, (up, dec) in enumerate(zip(self.up_convs, self.dec_blocks)):
            x = up(x)
            skip = skips[-1 - i]
            if self.use_attention:
                skip = self.attn_gates[i](g=x, x=skip, train=train)
            x = match_spatial(x, skip)
            x = jnp.concatenate([skip, x], axis=-1)
            x = dec(x, train)
            if self.deep_supervision:
                ds_outs.append(self.ds_heads[i](x))
        out = self.final_conv(x)
        if self.deep_supervision:
            return out, ds_outs
        return out


def _legacy_registry():
    from .legacy import LegacyUNet, TripleBranchImprovedVNet
    return {"LegacyUNet": LegacyUNet,
            "TripleBranchImprovedVNet": TripleBranchImprovedVNet}


MODEL_REGISTRY = {
    "UNet": UNet,
    "ResUNet": ResUNet,
    "ASPPUNet": ASPPUNet,
    "AttentionUNet": AttentionUNet,
    "TransUNet": TransUNet,
    "VNet2D": VNet2D,
    "ImprovedVNet": ImprovedVNet,
}


def create_model(model_type: str, **kwargs):
    """Instantiate a zoo model by name (the live YAML-dispatch path that the
    reference left dead at /root/reference/main.py:124-140). Legacy variants
    (LegacyUNet, TripleBranchImprovedVNet) resolve too.

    The mores.py legacy zoo is ported faithfully under ``Mores*`` names
    (MoresUNet, MoresVNet2D, MoresResUNet, MoresASPPUNet,
    MoresAttentionUNet, MoresTransUNet, MoresImprovedVNet) — those keep
    their own architectural details (decoder concat order, channel-keeping
    downsampling, conv-SE blocks; see models/mores.py). For the ACTIVE
    names, a ``features=[...]`` kwarg is additionally accepted as an
    adapter onto the parametric zoo: a geometric list like [64, 128, 256,
    512] maps onto (base_filters=64, depth=4) — an approximation of the
    legacy call convention, NOT a port of the legacy architectures
    (QUIRKS #18).
    """
    registry = dict(MODEL_REGISTRY)
    registry.update(_legacy_registry())
    from .mores import MORES_REGISTRY
    registry.update(MORES_REGISTRY)
    features = kwargs.pop("features", None)
    if model_type in MORES_REGISTRY and features is not None:
        kwargs["features"] = tuple(features)
        features = None
    if features is not None:
        feats = list(features)
        if any(feats[i + 1] != feats[i] * 2 for i in range(len(feats) - 1)):
            raise ValueError(
                f"features list {feats} is not a doubling schedule; the "
                f"parametric zoo expects base_filters * 2**i channels")
        kwargs.setdefault("base_filters", feats[0])
        kwargs.setdefault("depth", len(feats))
    try:
        cls = registry[model_type]
    except KeyError:
        raise NotImplementedError(
            f"Unknown model_type {model_type!r}; "
            f"choose from {sorted(registry)}") from None
    import dataclasses
    valid = {f.name for f in dataclasses.fields(cls)}
    # torch ctor aliases used by the legacy models — applied only when the
    # target class itself uses the canonical name (TripleBranchImprovedVNet's
    # OWN fields are num_classes/base_num_filters: renaming those away
    # would silently build it with defaults)
    for alias, canon in (("num_classes", "out_channels"),
                         ("base_num_filters", "base_filters")):
        if alias in kwargs and alias not in valid and canon in valid:
            kwargs.setdefault(canon, kwargs.pop(alias))
    # Tolerate unknown kwargs like the reference ctors' **kwargs — but say
    # so: fixed-architecture models (Mores*/Legacy*) ignore the parametric
    # flags (base_filters/depth/remat), and silence here once cost a user
    # the architecture they asked for.
    dropped = sorted(k for k in kwargs if k not in valid)
    if dropped:
        import warnings
        warnings.warn(f"{model_type} ignores kwargs {dropped} "
                      f"(fixed architecture)", stacklevel=2)
    kwargs = {k: v for k, v in kwargs.items() if k in valid}
    return cls(**kwargs)
