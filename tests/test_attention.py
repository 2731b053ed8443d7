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


def test_flash_falls_back_and_matches(qkv):
    # on CPU flash_attention dispatches to the XLA path — same numerics
    q, k, v = qkv
    a = np.asarray(flash_attention(q, k, v))
    b = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_flash_gradients(qkv):
    q, k, v = qkv

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) ** 2)

    g1 = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(lambda *a: flash_attention(*a)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


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
