"""Flash-attention kernel tests (CPU fallback path + numerics; the Pallas
path itself runs on TPU and is exercised by bench/TPU runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.models import create_model
from ddti_tpu.ops.attention import attention_reference, flash_attention


@pytest.fixture(scope="module")
def qkv():
    key = jax.random.PRNGKey(0)
    return tuple(jax.random.normal(k, (2, 4, 64, 16), jnp.float32)
                 for k in jax.random.split(key, 3))


def test_reference_matches_manual_softmax(qkv):
    q, k, v = qkv
    d = q.shape[-1]
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(d)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))
    got = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flash_cpu_fallback_contract(qkv):
    """On non-TPU backends flash_attention must dispatch to the XLA naive
    path (forward AND backward) without error. NOTE: this is a smoke test
    of the fallback CONTRACT only — both sides of the comparison run the
    same attention_reference code on CPU, so it carries no evidence about
    the Pallas kernel numerics (those are the *_interpret tests below,
    which force the real kernel code through the Pallas interpreter)."""
    q, k, v = qkv
    a = np.asarray(flash_attention(q, k, v))
    b = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(a, b, atol=1e-6)
    g = jax.grad(lambda *t: jnp.sum(flash_attention(*t) ** 2),
                 argnums=(0, 1, 2))(q, k, v)
    assert all(np.isfinite(np.asarray(t)).all() for t in g)


def test_flash_pallas_forward_interpret(qkv):
    # force the actual Pallas kernel (interpreter mode) on CPU
    q, k, v = qkv
    a = np.asarray(flash_attention(q, k, v, 16, 16, True))
    b = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_flash_pallas_backward_interpret(qkv):
    # Pallas dq/dk/dv kernels (blockwise recompute) vs XLA autodiff of the
    # naive formulation, at 1e-5
    q, k, v = qkv

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    g_ref = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss(lambda *a: flash_attention(*a, 16, 16, True)),
                    argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_flash_backward_no_quadratic_buffer():
    # The whole point of the flash backward: no (S, S) score buffer may
    # appear anywhere in the grad jaxpr (S=1024 here; naive scores would be
    # a 2*4*1024*1024 intermediate).
    b, h, s, d = 2, 4, 1024, 16
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32)
               for kk in jax.random.split(key, 3))

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 256, 256, True))

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    quad = s * s
    import numpy as _np

    def walk(jp):
        for eqn in jp.eqns:
            for var in eqn.outvars:
                aval = getattr(var, "aval", None)
                if aval is not None and hasattr(aval, "shape"):
                    assert int(_np.prod(aval.shape or (1,))) < quad, (
                        f"quadratic buffer {aval.shape} in {eqn.primitive}")
            for v_ in eqn.params.values():
                if hasattr(v_, "jaxpr"):
                    walk(v_.jaxpr)

    walk(jaxpr.jaxpr)


def test_flash_pallas_bf16_interpret(qkv):
    q, k, v = (t.astype(jnp.bfloat16) for t in qkv)
    a = np.asarray(flash_attention(q, k, v, 16, 16, True), np.float32)
    b = np.asarray(attention_reference(q, k, v), np.float32)
    np.testing.assert_allclose(a, b, atol=2e-2)


@pytest.mark.parametrize("h,d,G", [
    (8, 32, 4),   # TransUNet default: embed 256 / 8 heads
    (4, 64, 2),
    (6, 32, 2),   # head count trims the packing to a divisor
    (3, 32, 1),   # odd head count -> unpacked kernels
    (2, 128, 1),  # full-width heads -> unpacked kernels
])
def test_flash_head_packing_interpret(h, d, G):
    """Head-packed Pallas kernels (G = heads per 128-lane group): forward
    and all three gradients match the naive reference; dispatch picks the
    expected packing."""
    from ddti_tpu.ops.attention import _packing

    key = jax.random.PRNGKey(2)
    q, k, v = (jax.random.normal(kk, (2, h, 256, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    assert _packing(q) == G

    a = np.asarray(flash_attention(q, k, v, 64, 64, True))
    b = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(a, b, atol=2e-5)

    def loss(fn):
        return lambda *t: jnp.sum(jnp.sin(fn(*t)))

    g_ref = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss(lambda *t: flash_attention(*t, 64, 64, True)),
                    argnums=(0, 1, 2))(q, k, v)
    for ga, gb in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=2e-5)


def test_transunet_flash_flag_forward():
    kw = dict(base_filters=8, depth=3, num_transformer_layers=1,
              num_heads=4, embed_dim=32, image_size=32)
    m1 = create_model("TransUNet", use_flash_attention=False, **kw)
    m2 = create_model("TransUNet", use_flash_attention=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    v = m1.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    o1 = m1.apply(v, x, train=False)
    o2 = m2.apply(v, x, train=False)  # same params, same math
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)


def test_auto_flash_gated_off_training_dropout(monkeypatch):
    """QUIRKS #21: the flash kernels skip attention-prob dropout, so auto
    flash must never fire on a *training* step with dropout>0 (e.g. the
    reference's TransUNet depth-3 at 512^2, S=4096) while eval — and a
    dropout=0 train step — still picks flash at long S."""
    import ddti_tpu.ops.attention as attn_mod
    from ddti_tpu.models.blocks import TransformerEncoderLayer

    calls = []
    real = attn_mod.flash_attention

    def spy(q, k, v, *a, **kw):
        calls.append(q.shape)
        return real(q, k, v, *a, **kw)

    monkeypatch.setattr(attn_mod, "flash_attention", spy)

    s, e = 1024, 32  # smallest auto-flash-eligible S; hd = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (1, s, e))

    def run(dropout, train):
        layer = TransformerEncoderLayer(embed_dim=e, num_heads=4,
                                        dropout=dropout)
        v = layer.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        calls.clear()  # init ran with train=False (flash) — not under test
        layer.apply(v, x, train=train,
                    rngs={"dropout": jax.random.PRNGKey(2)} if train else {})
        return bool(calls)

    assert not run(dropout=0.1, train=True)   # parity path: prob dropout
    assert run(dropout=0.1, train=False)      # eval: flash
    assert run(dropout=0.0, train=True)       # no regularizer at stake
