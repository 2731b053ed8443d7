"""High-level library API (ddti_tpu/api.py): fit / predict / evaluate /
save / load / export_serving on arrays — the programmatic surface the
reference's CLI-only design lacks."""

import os

import numpy as np
import pytest

import ddti_tpu.api as api
from ddti_tpu.data import generate_ddti_like
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"


@pytest.fixture(scope="module")
def data():
    im, ma = generate_ddti_like(24, (32, 32), 0)
    return np.asarray(im)[..., 0], np.asarray(ma)[..., 0]  # (N,H,W)


@pytest.fixture(scope="module")
def fitted(data, tmp_path_factory):
    im, ma = data
    run = str(tmp_path_factory.mktemp("fitrun"))
    return api.fit(im, ma, model_type="UNet", base_filters=8, depth=3,
                   epochs=3, batch_size=4, lr=3e-3, run_dir=run,
                   verbose=False, use_mixup=False)


def test_fit_returns_trained_model(fitted, data):
    im, ma = data
    m = fitted.evaluate(im, ma, batch_size=8)
    assert set(m) == {"iou", "f1", "precision", "recall", "acc"}
    assert 0.0 <= m["iou"] <= 1.0 and m["acc"] > 0.5


def test_predict_shapes_and_dtypes(fitted, data):
    im, _ = data
    masks = fitted.predict(im[:5], batch_size=4)
    assert masks.shape == (5, 32, 32) and masks.dtype == np.uint8
    assert set(np.unique(masks)) <= {0, 1}
    probs = fitted.predict(im[:3], batch_size=4, prob=True)
    assert probs.shape == (3, 32, 32) and probs.dtype == np.float32
    assert float(probs.min()) >= 0.0 and float(probs.max()) <= 1.0
    # float [0,1] input is accepted too and agrees with uint8 input
    p2 = fitted.predict(im[:3].astype(np.float32) / 255.0, batch_size=4,
                        prob=True)
    np.testing.assert_allclose(p2, probs, atol=1e-2)


def test_predict_tta_runs(fitted, data):
    im, _ = data
    masks = fitted.predict(im[:2], batch_size=2, tta=True)
    assert masks.shape == (2, 32, 32)


def test_save_load_roundtrip(fitted, data, tmp_path):
    im, _ = data
    p = fitted.save(str(tmp_path / "m"))
    assert p.endswith(".npz") and os.path.exists(p)
    loaded = api.load(p, model_type="UNet", base_filters=8, depth=3,
                      image_size=32)
    a = fitted.predict(im[:4], batch_size=4, prob=True)
    b = loaded.predict(im[:4], batch_size=4, prob=True)
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_export_serving_bundle(fitted, data, tmp_path):
    im, ma = data
    prog = fitted.export_serving(str(tmp_path / "dep"), batch=4,
                                 dtype="bf16")
    assert os.path.exists(prog)
    from ddti_tpu.train.export import load_serving_bundle
    serve, batch_n, size, in_dtype = load_serving_bundle(prog)
    assert (batch_n, size) == (4, 32)
    out = np.asarray(serve(np.asarray(im[:4])[..., None]))
    want = fitted.predict(im[:4], batch_size=4)
    # fold_bn + bf16 weights shift threshold-boundary pixels only
    assert np.mean(out[..., 0] != want) < 0.02


def test_fit_rejects_unknown_kwargs(data):
    im, ma = data
    with pytest.raises(TypeError, match="unknown fit"):
        api.fit(im, ma, epochs=1, not_a_flag=True)


def test_fit_explicit_val_split(data, tmp_path):
    im, ma = data
    model = api.fit(im[:16], ma[:16], val_images=im[16:], val_masks=ma[16:],
                    model_type="UNet", base_filters=4, depth=2, epochs=1,
                    batch_size=4, run_dir=str(tmp_path), verbose=False)
    assert model.predict(im[:2], batch_size=2).shape == (2, 32, 32)


def test_fit_with_qat_carries_ranges(data, tmp_path):
    im, ma = data
    model = api.fit(im, ma, model_type="UNet", base_filters=4, depth=2,
                    epochs=1, batch_size=4, run_dir=str(tmp_path),
                    verbose=False, qat=True)
    assert model.qstats and all(v > 0 for v in
                                np.asarray(list(model.qstats.values())))
    p = model.save(str(tmp_path / "q"))
    from ddti_tpu.train.checkpoint import load_qstats
    assert load_qstats(p)


def test_fit_on_mesh(data, tmp_path):
    """fit(mesh='data=2'): data-parallel training over the virtual CPU
    mesh — the library route to the CLI's --mesh."""
    im, ma = data
    model = api.fit(im[:16], ma[:16], model_type="UNet", base_filters=4,
                    depth=2, epochs=1, batch_size=4,
                    run_dir=str(tmp_path), verbose=False, mesh="data=2")
    assert model.predict(im[:2], batch_size=2).shape == (2, 32, 32)


def test_fit_freeze_and_distill_compose(data, tmp_path):
    """fit(freeze=..., distill_checkpoint=...): transfer learning under a
    teacher through the library API."""
    im, ma = data
    teacher = api.fit(im, ma, model_type="UNet", base_filters=8, depth=3,
                      epochs=1, batch_size=4,
                      run_dir=str(tmp_path / "t"), verbose=False)
    ck = teacher.save(str(tmp_path / "teacher"))
    student = api.fit(im, ma, model_type="UNet", base_filters=8, depth=3,
                      epochs=1, batch_size=4,
                      run_dir=str(tmp_path / "s"), verbose=False,
                      freeze="encoders",
                      distill_checkpoint=ck, distill_base_filters=8,
                      distill_depth=3)
    assert student.predict(im[:2], batch_size=2).shape == (2, 32, 32)
