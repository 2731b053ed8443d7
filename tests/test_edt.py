"""Exact-EDT tests against scipy.ndimage.distance_transform_edt."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddti_tpu.ops.edt import distance_transform_edt, edt_batch

nd = pytest.importorskip("scipy.ndimage")


@pytest.mark.parametrize("shape,density", [
    ((32, 32), 0.9), ((47, 61), 0.95), ((64, 128), 0.99), ((16, 16), 0.5),
])
def test_edt_matches_scipy(shape, density):
    rng = np.random.default_rng(hash(shape) % 2**31)
    fg = (rng.random(shape) > density).astype(np.uint8)
    ours = np.asarray(distance_transform_edt(jnp.asarray(1 - fg)))
    ref = nd.distance_transform_edt(1 - fg)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_edt_all_zero_input():
    x = np.zeros((8, 8), np.uint8)
    out = np.asarray(distance_transform_edt(jnp.asarray(x)))
    assert np.all(out == 0)


def test_edt_no_zero_anywhere_capped():
    x = np.ones((8, 8), np.uint8)
    out = np.asarray(distance_transform_edt(jnp.asarray(x)))
    assert np.all(out == 16.0)  # capped at H + W


def test_edt_single_seed():
    x = np.ones((9, 9), np.uint8)
    x[4, 4] = 0
    ours = np.asarray(distance_transform_edt(jnp.asarray(x)))
    ref = nd.distance_transform_edt(x)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_edt_batch_shapes():
    rng = np.random.default_rng(3)
    m = (rng.random((4, 24, 24, 1)) > 0.8).astype(np.uint8)
    out = np.asarray(edt_batch(jnp.asarray(1 - m)))
    assert out.shape == (4, 24, 24, 1)
    for i in range(4):
        ref = nd.distance_transform_edt(1 - m[i, :, :, 0])
        np.testing.assert_allclose(out[i, :, :, 0], ref, atol=1e-4)
