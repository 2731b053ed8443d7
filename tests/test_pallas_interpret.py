"""Pallas-kernel correctness in interpreter mode — exercises the EXACT
kernel code (grid/BlockSpec/fori loops) on CPU without TPU hardware."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.ops.attention import _flash_forward, attention_reference
from ddti_tpu.ops.edt import _minplus_pallas, _minplus_reference


def test_minplus_kernel_interpret_matches_reference():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 30, (20, 128)).astype(np.float32)
    g2 = jnp.asarray(g * g)
    want = np.asarray(_minplus_reference(g2))
    got = np.asarray(_minplus_pallas(g2, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_minplus_kernel_interpret_wide():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 50, (9, 256)).astype(np.float32)  # odd H, W=2*128
    g2 = jnp.asarray(g * g)
    want = np.asarray(_minplus_reference(g2))
    got = np.asarray(_minplus_pallas(g2, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("s,d,blocks", [(128, 16, (64, 64)),
                                        (256, 32, (128, 64))])
def test_flash_kernel_interpret_matches_reference(s, d, blocks):
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (1, 2, s, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    want = np.asarray(attention_reference(q, k, v))
    o, lse = _flash_forward(q, k, v, *blocks, interpret=True)
    np.testing.assert_allclose(np.asarray(o), want, atol=2e-5)
    # the (B*H, S, 1) logsumexp residual is stored BASE-2 (the kernels
    # compute softmax via exp2 with log2e folded into the scale):
    # lse2 = log2(sum exp(s)) = logsumexp(s) * log2(e)
    scores = np.einsum("bhqd,bhkd->bhqk", np.asarray(q),
                       np.asarray(k)) / np.sqrt(d)
    want_lse = (np.log(np.exp(scores).sum(-1))
                * np.log2(np.e)).reshape(2, s, 1)
    np.testing.assert_allclose(np.asarray(lse), want_lse, atol=1e-4)


def test_flash_kernel_interpret_bf16():
    key = jax.random.PRNGKey(2)
    q, k, v = (jax.random.normal(kk, (1, 1, 128, 16), jnp.bfloat16)
               for kk in jax.random.split(key, 3))
    want = np.asarray(attention_reference(q, k, v)).astype(np.float32)
    got = np.asarray(_flash_forward(q, k, v, 64, 64,
                                    interpret=True)[0]).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2)
