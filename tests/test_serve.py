"""HTTP serving daemon (cli/serve.py): bundle + live-checkpoint predictors,
micro-batching coalescing, overlay responses, error paths. The online
serving layer has no reference analogue (inference there is
Trainer.test over a directory, /root/reference/utils/trainer.py:206-299).
Runs on the CPU backend (conftest)."""

import http.client
import io
import json
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from ddti_tpu.cli.serve import Batcher, create_server, get_parser
from ddti_tpu.models import create_model
from ddti_tpu.train.checkpoint import save_params_npz
from ddti_tpu.train.export import export_serving


def _jpeg_bytes(shape=(40, 56), seed=0) -> bytes:
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, shape, dtype=np.uint8),
                    "L").save(buf, "JPEG")
    return buf.getvalue()


def _make_bundle(tmp_path, batch=2, size=32) -> str:
    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, size, size, 1)), train=False)
    path = str(tmp_path / "m.stablehlo")
    with open(path, "wb") as f:
        f.write(export_serving(model, v["params"], v["batch_stats"],
                               batch=batch, size=size,
                               input_dtype=jnp.uint8))
    return path


@pytest.fixture()
def bundle_server(tmp_path):
    args = get_parser().parse_args(
        ["--checkpoint", _make_bundle(tmp_path), "--port", "0",
         "--compilation_cache", "off"])
    server = create_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server
    server.shutdown()
    server.close()
    t.join(timeout=10)


def _request(server, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1",
                                      server.server_address[1], timeout=60)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp, data


def test_serve_healthz_and_predict(bundle_server):
    resp, data = _request(bundle_server, "GET", "/healthz")
    assert resp.status == 200
    health = json.loads(data)
    assert health["status"] == "ok"
    assert health["batch"] == 2 and health["size"] == 32
    assert health["artifact"] == "m.stablehlo"

    # predict returns a PNG mask at the ORIGINAL (non-square) resolution
    resp, data = _request(bundle_server, "POST", "/predict", _jpeg_bytes())
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "image/png"
    mask = np.asarray(Image.open(io.BytesIO(data)))
    assert mask.shape == (40, 56)
    assert set(np.unique(mask)) <= {0, 255}

    # overlay variant: RGB, same size, red-only contour pixels
    resp, data = _request(bundle_server, "POST", "/predict?overlay=1",
                          _jpeg_bytes())
    assert resp.status == 200
    ov = np.asarray(Image.open(io.BytesIO(data)))
    assert ov.shape == (40, 56, 3)
    colored = ov[:, :, 0] != ov[:, :, 1]
    assert np.all(ov[colored, 0] == 255) and np.all(ov[colored, 1] == 0)

    # ?format=raw: identical mask as raw uint8 bytes, no PNG encode
    resp, raw = _request(bundle_server, "POST", "/predict?format=raw",
                         _jpeg_bytes())
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "application/octet-stream"
    w, h, c = (int(resp.getheader(k)) for k in ("X-Width", "X-Height",
                                                "X-Channels"))
    assert (h, w, c) == (40, 56, 1) and len(raw) == h * w
    np.testing.assert_array_equal(
        np.frombuffer(raw, np.uint8).reshape(h, w), mask)

    resp, data = _request(bundle_server, "GET", "/stats")
    stats = json.loads(data)
    assert stats["requests"] == 3 and stats["images"] == 3
    assert stats["errors"] == 0
    assert stats["mean_latency_ms"] > 0
    assert 0 < stats["latency_p50_ms"] <= stats["latency_p99_ms"]


def test_serve_error_paths(bundle_server):
    resp, data = _request(bundle_server, "POST", "/predict",
                          b"not an image")
    assert resp.status == 400
    assert "could not decode" in json.loads(data)["error"]
    resp, _ = _request(bundle_server, "GET", "/nope")
    assert resp.status == 404
    resp, _ = _request(bundle_server, "POST", "/nope", b"")
    assert resp.status == 404
    _, data = _request(bundle_server, "GET", "/stats")
    assert json.loads(data)["errors"] == 1


def test_serve_concurrent_coalescing(bundle_server):
    """8 concurrent requests through a batch-2 program: every request is
    answered correctly and the batcher runs fewer device programs than
    images (micro-batching actually coalesces)."""
    results = [None] * 8

    def hit(i):
        resp, data = _request(bundle_server, "POST", "/predict",
                              _jpeg_bytes(seed=i))
        results[i] = (resp.status, data)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for status, data in results:
        assert status == 200
        assert np.asarray(Image.open(io.BytesIO(data))).shape == (40, 56)
    _, data = _request(bundle_server, "GET", "/stats")
    stats = json.loads(data)
    assert stats["images"] == 8
    assert stats["batches"] < 8  # at least one coalesced batch
    assert stats["mean_batch_fill"] > 1.0


def test_serve_live_checkpoint(tmp_path):
    """Non-bundle path: --checkpoint <.npz> builds the live model exactly
    like cli/infer.py and serves through jit(make_serve_fn)."""
    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    ck = str(tmp_path / "w.npz")
    save_params_npz(ck, v["params"], v["batch_stats"])
    args = get_parser().parse_args(
        ["--checkpoint", ck, "--model_type", "UNet", "--base_filters", "8",
         "--depth", "3", "--image_size", "32", "--batch_size", "2",
         "--threshold", "0.999", "--port", "0",
         "--compilation_cache", "off"])
    server = create_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        resp, data = _request(server, "GET", "/healthz")
        assert json.loads(data)["model"] == "UNet"
        resp, data = _request(server, "POST", "/predict", _jpeg_bytes())
        assert resp.status == 200
        mask = np.asarray(Image.open(io.BytesIO(data)))
        assert mask.shape == (40, 56)
        # --threshold reached the live predictor: at 0.999 a random-init
        # model (probs ~0.5) predicts no foreground at all
        assert mask.max() == 0
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


def test_batcher_direct():
    """Batcher semantics without HTTP: identity predictor, padded tails,
    error propagation, clean close."""
    calls = []

    def predict(x):
        calls.append(x.shape)
        return x

    b = Batcher(predict, batch_n=4, max_wait_ms=1.0)
    a = np.full((8, 8, 1), 7, np.uint8)
    out = b.submit(a)
    assert np.array_equal(out, a)
    assert calls == [(4, 8, 8, 1)]  # padded to the compiled batch

    def boom(x):
        raise RuntimeError("device on fire")

    b2 = Batcher(boom, batch_n=2, max_wait_ms=1.0)
    with pytest.raises(RuntimeError, match="device on fire"):
        b2.submit(a)
    b.close()
    b2.close()
    assert not b._thread.is_alive() and not b2._thread.is_alive()


def test_multi_bundle_program_selection(tmp_path):
    """Comma-separated .stablehlo bundles: each micro-batch runs through
    the smallest compiled shape that fits, and /stats reports the
    per-program batch counts."""
    p_small = str(tmp_path / "small.stablehlo")
    os.rename(_make_bundle(tmp_path, batch=2, size=32), p_small)
    p_big = str(tmp_path / "big.stablehlo")
    os.rename(_make_bundle(tmp_path, batch=6, size=32), p_big)
    args = get_parser().parse_args(
        ["--checkpoint", f"{p_small},{p_big}", "--port", "0",
         "--compilation_cache", "off"])
    server = create_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        resp, data = _request(server, "GET", "/healthz")
        health = json.loads(data)
        assert health["batch"] == 6
        assert health["program_batches"] == [2, 6]

        # one lone request -> the batch-2 program
        resp, _ = _request(server, "POST", "/predict", _jpeg_bytes())
        assert resp.status == 200
        resp, data = _request(server, "GET", "/stats")
        stats = json.loads(data)
        assert stats["batches_by_program"] == {"2": 1, "6": 0}

        # five concurrent requests -> they coalesce; every flush fits some
        # program and all clients get masks
        results = []

        def go():
            r, d = _request(server, "POST", "/predict", _jpeg_bytes())
            results.append(r.status)

        threads = [threading.Thread(target=go) for _ in range(5)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        assert results == [200] * 5
        resp, data = _request(server, "GET", "/stats")
        stats = json.loads(data)
        assert stats["images"] == 6
        assert sum(stats["batches_by_program"].values())             == stats["batches"]
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


def test_batcher_small_program_routing():
    """Batcher picks the smallest program whose batch fits the flush."""
    calls = []

    def rec(n):
        def predict(x):
            calls.append((n, x.shape[0]))
            return x
        return predict

    b = Batcher(rec(8), batch_n=8, max_wait_ms=1.0,
                small_programs=[(1, rec(1)), (4, rec(4))])
    a = np.full((8, 8, 1), 7, np.uint8)
    out = b.submit(a)
    np.testing.assert_array_equal(out, a)
    assert calls == [(1, 1)]
    # three concurrent -> coalesced flushes; every flush runs a declared
    # program and pads its input to exactly that program's shape
    calls.clear()
    done = []
    threads = [threading.Thread(target=lambda: done.append(b.submit(a)),
                                daemon=True) for _ in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=30)
    assert not any(th.is_alive() for th in threads)
    assert len(done) == 3          # every submit got its mask back
    assert 1 <= len(calls) <= 3    # coalescing may merge them
    for prog, padded in calls:
        assert prog in (1, 4, 8)
        assert padded == prog      # input padded to the program shape
    b.close()


def test_batcher_backpressure():
    """max_queue bounds the pending queue: submits beyond it raise
    QueueFull (the HTTP layer maps this to 503 + Retry-After) and are
    counted in n_rejected; the queue drains and accepts again."""
    import time

    from ddti_tpu.cli.serve import QueueFull

    release = threading.Event()
    started = threading.Event()

    def slow_predict(x):
        started.set()
        release.wait(timeout=30)
        return x

    b = Batcher(slow_predict, batch_n=1, max_wait_ms=0.0, max_queue=2)
    a = np.full((8, 8, 1), 3, np.uint8)
    threads = [threading.Thread(target=lambda: b.submit(a), daemon=True)
               for _ in range(3)]
    # deterministic fill: let the worker DEQUEUE frame 1 first (otherwise
    # frame 3 could race the dequeue and get rejected itself), then queue
    # exactly two more
    threads[0].start()
    assert started.wait(timeout=10)
    for t in threads[1:]:
        t.start()
    deadline = time.time() + 10
    while b._q.qsize() < 2 and time.time() < deadline:
        time.sleep(0.01)
    assert b._q.qsize() == 2
    with pytest.raises(QueueFull):
        b.submit(a)
    assert b.n_rejected == 1

    release.set()  # drain
    for t in threads:
        t.join(timeout=10)
    out = b.submit(a)  # accepted again after drain
    assert np.array_equal(out, a)
    assert b.n_rejected == 1
    b.close()


def test_reload_hot_swaps_checkpoint(tmp_path):
    """POST /reload swaps to a new artifact without restart: predictions
    switch to the new weights, /healthz reflects the new artifact, and a
    size-mismatched artifact is rejected with 409."""
    import os as _os

    p1 = str(tmp_path / "v1.stablehlo")
    _os.rename(_make_bundle(tmp_path, batch=2, size=32), p1)
    args = get_parser().parse_args(
        ["--checkpoint", p1, "--port", "0", "--compilation_cache", "off"])
    server = create_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        resp, m1 = _request(server, "POST", "/predict?format=raw",
                            _jpeg_bytes())
        assert resp.status == 200

        # a second bundle with DIFFERENT weights (seed via differently
        # initialized model): build manually
        import jax
        import jax.numpy as jnp
        from ddti_tpu.models import create_model
        from ddti_tpu.train.export import export_serving
        model = create_model("UNet", base_filters=8, depth=3)
        v = model.init({"params": jax.random.PRNGKey(123)},
                       jnp.zeros((1, 32, 32, 1)), train=False)
        p2 = str(tmp_path / "v2.stablehlo")
        with open(p2, "wb") as f:
            f.write(export_serving(model, v["params"], v["batch_stats"],
                                   batch=2, size=32,
                                   input_dtype=jnp.uint8))
        resp, data = _request(server, "POST", "/reload",
                              json.dumps({"checkpoint": p2}).encode())
        assert resp.status == 200, data
        out = json.loads(data)
        assert out["status"] == "reloaded"
        assert out["artifact"] == "v2.stablehlo"

        resp, data = _request(server, "GET", "/healthz")
        assert json.loads(data)["artifact"] == "v2.stablehlo"
        resp, data = _request(server, "GET", "/stats")
        assert json.loads(data)["reloads"] == 1

        # the daemon still predicts (new weights may give a different mask)
        resp, m2 = _request(server, "POST", "/predict?format=raw",
                            _jpeg_bytes())
        assert resp.status == 200 and len(m2) == len(m1)

        # size change rejected
        p3 = str(tmp_path / "v3.stablehlo")
        with open(p3, "wb") as f:
            f.write(export_serving(model, v["params"], v["batch_stats"],
                                   batch=2, size=16,
                                   input_dtype=jnp.uint8))
        resp, data = _request(server, "POST", "/reload",
                              json.dumps({"checkpoint": p3}).encode())
        assert resp.status == 409

        # malformed body rejected
        resp, data = _request(server, "POST", "/reload", b"[1,2]")
        assert resp.status == 400
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


def test_metrics_prometheus_format(bundle_server):
    resp, _ = _request(bundle_server, "POST", "/predict", _jpeg_bytes())
    assert resp.status == 200
    resp, data = _request(bundle_server, "GET", "/metrics")
    assert resp.status == 200
    assert resp.getheader("Content-Type").startswith("text/plain")
    text = data.decode()
    metrics = {}
    for line in text.splitlines():
        if line and not line.startswith("#"):
            k, v = line.rsplit(" ", 1)
            metrics[k] = float(v)
    assert metrics["ddti_requests_total"] >= 1
    assert metrics["ddti_images_total"] >= 1
    assert metrics["ddti_request_errors_total"] == 0
    assert metrics['ddti_program_batches_total{batch="2"}'] >= 1
    assert metrics["ddti_request_latency_seconds_sum"] > 0
    # every series is typed
    for line in text.splitlines():
        if line.startswith("ddti_"):
            name = line.split("{")[0].split(" ")[0]
            assert f"# TYPE {name}" in text


def test_reload_under_concurrent_traffic(tmp_path):
    """Requests racing a /reload all succeed: in-flight flushes keep the
    program references they selected while the swap happens."""
    import os as _os

    p1 = str(tmp_path / "a.stablehlo")
    _os.rename(_make_bundle(tmp_path, batch=2, size=32), p1)
    p2 = str(tmp_path / "b.stablehlo")
    _os.rename(_make_bundle(tmp_path, batch=4, size=32), p2)
    args = get_parser().parse_args(
        ["--checkpoint", p1, "--port", "0", "--compilation_cache", "off"])
    server = create_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    statuses = []
    lock = threading.Lock()

    def client(n):
        for _ in range(n):
            r, _ = _request(server, "POST", "/predict", _jpeg_bytes())
            with lock:
                statuses.append(r.status)

    try:
        threads = [threading.Thread(target=client, args=(4,), daemon=True)
                   for _ in range(3)]
        for th in threads:
            th.start()
        r, d = _request(server, "POST", "/reload",
                        json.dumps({"checkpoint": p2}).encode())
        assert r.status == 200, d
        for th in threads:
            th.join(timeout=60)
        assert not any(th.is_alive() for th in threads)
        assert statuses == [200] * 12
        resp, data = _request(server, "GET", "/healthz")
        health = json.loads(data)
        assert health["artifact"] == "b.stablehlo"
        assert health["batch"] == 4
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


def test_watch_auto_reloads_on_mtime_change(tmp_path):
    """--watch N polls the artifact mtime and hot-reloads when training
    overwrites it."""
    import os as _os
    import time as _time

    path = str(tmp_path / "live.stablehlo")
    _os.rename(_make_bundle(tmp_path, batch=2, size=32), path)
    args = get_parser().parse_args(
        ["--checkpoint", path, "--port", "0", "--watch", "0.2",
         "--compilation_cache", "off"])
    server = create_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # overwrite with a batch-4 bundle of the same size
        tmp2 = _make_bundle(tmp_path, batch=4, size=32)
        _os.replace(tmp2, path)
        _os.utime(path, None)
        deadline = _time.time() + 30
        while server.n_reloads == 0 and _time.time() < deadline:
            _time.sleep(0.1)
        assert server.n_reloads >= 1
        resp, data = _request(server, "GET", "/healthz")
        assert json.loads(data)["batch"] == 4
        resp, _ = _request(server, "POST", "/predict", _jpeg_bytes())
        assert resp.status == 200
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


def test_serve_ensemble_bundle(tmp_path):
    """A ddti-export ensemble artifact (weights-as-arguments, K-member
    vote baked in) serves through the daemon like any other bundle."""
    from ddti_tpu.train.checkpoint import save_variables_npz
    from ddti_tpu.train.export import export_serving_ensemble

    model = create_model("UNet", base_filters=8, depth=3)
    members = []
    for seed in (0, 1):
        v = model.init({"params": jax.random.PRNGKey(seed)},
                       jnp.zeros((1, 32, 32, 1)), train=False)
        members.append((v["params"], v["batch_stats"]))
    blob, svars = export_serving_ensemble(model, members, batch=2, size=32,
                                          input_dtype=jnp.uint8)
    prog = str(tmp_path / "ens_serving_program.stablehlo")
    with open(prog, "wb") as f:
        f.write(blob)
    save_variables_npz(str(tmp_path / "ens_serving_program.npz"), svars)

    args = get_parser().parse_args(["--checkpoint", prog, "--port", "0",
                                    "--compilation_cache", "off"])
    server = create_server(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        resp, data = _request(server, "GET", "/healthz")
        assert json.loads(data)["batch"] == 2
        resp, data = _request(server, "POST", "/predict", _jpeg_bytes())
        assert resp.status == 200
        Image.open(io.BytesIO(data)).verify()  # a valid PNG mask
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)


def test_batcher_survives_flush_errors_and_program_shrink(tmp_path):
    """The worker thread must never die: an oversized item group (program
    set shrank mid-collect) splits instead of raising StopIteration, and
    an arbitrary _flush crash surfaces to the waiter while the thread
    keeps serving."""
    from ddti_tpu.cli.serve import Batcher

    calls = []

    def predict(x):
        calls.append(x.shape[0])
        return np.zeros_like(x)

    b = Batcher(predict, batch_n=2, max_wait_ms=1.0)
    # oversized group: 5 items through a max-batch-2 program set
    items = []
    for _ in range(5):
        ev = threading.Event()
        slot = {}
        items.append((np.zeros((8, 8, 1), np.uint8), ev, slot))
    b._flush(items)
    assert all(ev.is_set() for _, ev, _ in items)
    assert all("mask" in slot for _, _, slot in items)
    assert calls == [2, 2, 2]  # 2+2+1(padded)

    # a crash inside _flush must not kill the worker
    orig = b._flush
    b._flush = lambda items: (_ for _ in ()).throw(RuntimeError("boom"))
    with pytest.raises(RuntimeError, match="boom"):
        b.submit(np.zeros((8, 8, 1), np.uint8))
    b._flush = orig
    assert b._thread.is_alive()
    out = b.submit(np.zeros((8, 8, 1), np.uint8))
    assert out.shape == (8, 8, 1)
    b.close()


def test_watcher_follows_reloaded_path(tmp_path):
    """--watch must track the path installed by POST /reload, not the
    startup list."""
    import os as _os
    import time as _time

    p_a = str(tmp_path / "a.stablehlo")
    os.rename(_make_bundle(tmp_path, batch=2, size=32), p_a)
    args = get_parser().parse_args(
        ["--checkpoint", p_a, "--port", "0",
         "--compilation_cache", "off"])
    server = create_server(args)
    server.start_watcher(0.2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        p_b = str(tmp_path / "b.stablehlo")
        os.rename(_make_bundle(tmp_path, batch=4, size=32), p_b)
        resp, _ = _request(server, "POST", "/reload",
                           json.dumps({"checkpoint": p_b}).encode())
        assert resp.status == 200
        n0 = server.n_reloads
        # touching the OLD path must not trigger; touching B must
        _time.sleep(0.5)
        _os.utime(p_b, None)
        deadline = _time.time() + 30
        while server.n_reloads == n0 and _time.time() < deadline:
            _time.sleep(0.1)
        assert server.n_reloads > n0
        resp, data = _request(server, "GET", "/healthz")
        assert json.loads(data)["batch"] == 4
    finally:
        server.shutdown()
        server.close()
        t.join(timeout=10)
