"""Flip test-time augmentation (eval/tta.py).

Beyond-reference capability (the reference predicts each test image once,
/root/reference/utils/trainer.py:214-221). Verified: the ensemble math
against a manual numpy flip loop, the dihedral equivariance invariant,
the jitted infer step, and the serving-export plumbing.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ddti_tpu.core import Config  # noqa: E402
from ddti_tpu.eval.tta import tta_logits, tta_probs  # noqa: E402
from ddti_tpu.models import ResUNet  # noqa: E402
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"


@pytest.fixture(scope="module")
def small_model():
    model = ResUNet(in_channels=1, out_channels=1, base_filters=4, depth=2)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False)
    rng = np.random.default_rng(7)
    images = rng.random((3, 32, 32, 1), np.float32)

    def fwd(im):
        return model.apply(variables, im, train=False)

    return model, variables, fwd, jnp.asarray(images)


def _manual_tta_probs(fwd, images):
    """Independent numpy oracle: flip, forward, sigmoid, unflip, average."""
    total = 0.0
    for axes in ((), (2,), (1,), (1, 2)):
        x = np.flip(np.asarray(images), axes) if axes else np.asarray(images)
        logits = np.asarray(fwd(jnp.asarray(x.copy())), np.float32)
        p = 1.0 / (1.0 + np.exp(-logits))
        total = total + (np.flip(p, axes) if axes else p)
    return total / 4.0


def test_tta_probs_matches_manual_flip_loop(small_model):
    _, _, fwd, images = small_model
    got = np.asarray(jax.jit(lambda x: tta_probs(fwd, x))(images))
    want = _manual_tta_probs(fwd, images)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # the ensemble actually differs from a single forward (random init
    # logits are not flip-equivariant)
    single = 1.0 / (1.0 + np.exp(-np.asarray(fwd(images), np.float32)))
    assert np.abs(got - single).max() > 1e-4


def test_tta_logits_is_exact_logit_of_mean_prob(small_model):
    _, _, fwd, images = small_model
    lg = tta_logits(fwd, images)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(lg)),
                               np.asarray(tta_probs(fwd, images)),
                               atol=1e-6)


def test_tta_ensemble_is_flip_equivariant(small_model):
    """Flipping the input flips the ensembled output exactly — the defining
    property of averaging over the flip group."""
    _, _, fwd, images = small_model
    p = np.asarray(tta_probs(fwd, images))
    p_flipped_in = np.asarray(tta_probs(fwd, jnp.flip(images, (1, 2))))
    np.testing.assert_allclose(p_flipped_in, np.flip(p, (1, 2)), atol=1e-6)


def test_infer_step_tta(small_model):
    from ddti_tpu.train import create_train_state, make_infer_step

    model, variables, fwd, images = small_model
    cfg = Config(batch_size=3, image_size=32, store_size=32, tta=True)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, 32, 32, 1), 1e-3, steps_per_epoch=2)
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    masks = (np.random.default_rng(3).random((3, 32, 32, 1)) > 0.5
             ).astype(np.uint8) * 255
    imgs_u8 = (np.asarray(images) * 255).astype(np.uint8)

    step = make_infer_step(cfg)
    _, _, preds, counts, _ = step(state, jnp.asarray(imgs_u8),
                                  jnp.asarray(masks))
    want = (_manual_tta_probs(fwd, imgs_u8.astype(np.float32) / 255.0)
            > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(preds), want)
    # counts reflect the ensembled prediction
    assert float(counts.tp + counts.fp) == float(want.sum())

    # and differ from the non-TTA step on this random-init model
    plain = make_infer_step(Config(batch_size=3, image_size=32,
                                   store_size=32))
    _, _, preds0, _, _ = plain(state, jnp.asarray(imgs_u8),
                               jnp.asarray(masks))
    assert np.any(np.asarray(preds0) != np.asarray(preds))


def test_serving_export_tta(small_model):
    """A TTA serving program reproduces the live ensemble bit-for-bit."""
    from ddti_tpu.train.export import export_serving_program, load_serving

    model, variables, fwd, images = small_model
    blob, svars = export_serving_program(
        model, variables["params"], variables["batch_stats"],
        batch=3, size=32, tta=True)
    serve = load_serving(blob)
    got = np.asarray(serve(svars, images))
    want = (_manual_tta_probs(fwd, images) > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_quantized_export_accepts_tta(small_model):
    """Int8 exporter plumbs tta through; the program runs and emits the
    quantized ensemble."""
    from ddti_tpu.train.export import load_serving
    from ddti_tpu.train.quantize import export_serving_int8

    model, variables, fwd, images = small_model
    blob, svars = export_serving_int8(
        model, variables["params"], variables["batch_stats"], batch=3,
        size=32, calib_images=images, input_dtype=jnp.float32, tta=True)
    serve = load_serving(blob)
    out = np.asarray(serve(svars, images))
    assert out.shape == (3, 32, 32, 1) and out.dtype == np.uint8
