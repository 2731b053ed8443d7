"""Sliding-window full-resolution inference tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.eval import sliding_window_logits, sliding_window_predict
from ddti_tpu.models import create_model


@pytest.fixture(scope="module")
def model_and_vars():
    m = create_model("UNet", base_filters=8, depth=3)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((1, 32, 32, 1)), train=False)
    return m, v


def _apply(m):
    return lambda vv, x: m.apply(vv, x, train=False)


def test_output_shape_odd_frame(model_and_vars):
    m, v = model_and_vars
    frame = jnp.asarray(np.random.default_rng(0).random((75, 90, 1)),
                        jnp.float32)
    out = sliding_window_logits(_apply(m), v, frame, window=32, stride=16,
                                tile_batch=4)
    assert out.shape == (75, 90, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_frame_smaller_than_window(model_and_vars):
    m, v = model_and_vars
    frame = jnp.zeros((20, 24, 1), jnp.float32)
    out = sliding_window_logits(_apply(m), v, frame, window=32, stride=16,
                                tile_batch=2)
    assert out.shape == (20, 24, 1)


def test_frame_much_smaller_than_window(model_and_vars):
    """Pad > dim-1 (frame < ~half the window) used to crash np.pad
    reflect; the iterated reflect pad must handle any frame size."""
    m, v = model_and_vars
    frame = jnp.asarray(np.random.default_rng(3).random((12, 9, 1)),
                        jnp.float32)
    out = sliding_window_logits(_apply(m), v, frame, window=32, stride=16,
                                tile_batch=2)
    assert out.shape == (12, 9, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_matches_direct_forward_when_single_tile(model_and_vars):
    """A frame exactly one window big must equal a direct forward pass."""
    m, v = model_and_vars
    frame = jnp.asarray(np.random.default_rng(1).random((32, 32, 1)),
                        jnp.float32)
    tiled = sliding_window_logits(_apply(m), v, frame, window=32, stride=32,
                                  tile_batch=1)
    direct = m.apply(v, frame[None], train=False)[0]
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(direct),
                               atol=1e-5)


def test_predict_binary(model_and_vars):
    m, v = model_and_vars
    frame = jnp.asarray(np.random.default_rng(2).random((48, 64, 1)),
                        jnp.float32)
    pred = sliding_window_predict(_apply(m), v, frame, window=32, stride=16,
                                  tile_batch=4)
    assert pred.dtype == jnp.uint8
    assert set(np.unique(np.asarray(pred))).issubset({0, 1})


def test_overlap_blending_smooth(model_and_vars):
    """Logits on a constant frame must be (nearly) constant — no seams."""
    m, v = model_and_vars
    frame = jnp.full((64, 64, 1), 0.5, jnp.float32)
    out = np.asarray(sliding_window_logits(_apply(m), v, frame, window=32,
                                           stride=16, tile_batch=4))
    interior = out[8:-8, 8:-8, 0]
    assert interior.std() < 0.1 * (abs(interior.mean()) + 1e-3) + 0.05
