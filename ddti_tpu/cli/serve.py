"""Online HTTP model server — the production serving daemon.

The reference has no online-serving story: inference means rebuilding the
torch model inside ``Trainer.test`` over a static directory
(/root/reference/utils/trainer.py:206-299). This daemon serves nodule-mask
predictions over HTTP from either an AOT ``.stablehlo`` serving bundle
(no model code runs at all) or a live checkpoint, with transparent
micro-batching: concurrent requests coalesce into the compiled
``(batch, size, size, 1)`` program shape — padded when sparse — so
sustained throughput approaches the offline bench number while
single-request latency stays bounded by ``--max_wait_ms``.

Endpoints:
  GET  /healthz   liveness + artifact/model info (JSON)
  GET  /stats     request/image/batch counters, throughput, latency (JSON)
  GET  /metrics   the same counters in Prometheus exposition format
  POST /reload    hot-swap the serving programs from the same (updated)
                  or a new ``{"checkpoint": path}`` — the train->serve
                  loop without a restart (same image size only)
  POST /predict   body = raw image bytes (JPEG/PNG/BMP, any size; JPEG
                  decodes via the native libjpeg C path, rest via PIL);
                  response = PNG mask at the ORIGINAL resolution.
                  ``?overlay=1`` returns the red-contour overlay instead.
                  ``?format=raw`` returns raw uint8 bytes (X-Width /
                  X-Height / X-Channels headers) — skips the PNG encoder,
                  the dominant per-request host cost on codec-bound boxes.

Usage:
  python -m ddti_tpu.cli.serve --checkpoint model.stablehlo --port 8080
  python -m ddti_tpu.cli.serve --checkpoint <orbax|.npz|.pth> \
      --model_type ResUNet --base_filters 64 --depth 5 --image_size 256
"""

from __future__ import annotations

import argparse
import collections
import io
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class QueueFull(Exception):
    """Raised by ``Batcher.submit`` when the pending queue is at
    ``max_queue`` — the HTTP layer maps it to 503 + Retry-After."""


class Batcher:
    """Micro-batching executor: requests enqueue single frames; a worker
    thread coalesces up to ``batch_n`` of them (waiting at most
    ``max_wait_ms`` after the first arrival), zero-pads the tail, and runs
    one fixed-shape device program for the whole group. This is the online
    analogue of the offline padded-tail batching in cli/infer.py.

    ``max_queue`` bounds the pending-frame queue (backpressure): beyond it
    ``submit`` raises :class:`QueueFull` instead of letting latency — and
    one blocked handler thread per request — grow without bound."""

    def __init__(self, predict, batch_n: int, max_wait_ms: float = 5.0,
                 max_queue: int | None = None, small_programs=None):
        self.batch_n = int(batch_n)
        # programs ascending by batch: sparse micro-batches run through the
        # smallest compiled shape that fits (latency), full ones through
        # the main program (throughput) — multi-bundle serving
        self.programs = sorted(
            [(int(bn), fn) for bn, fn in (small_programs or [])
             if int(bn) < self.batch_n]) + [(self.batch_n, predict)]
        self.max_wait = max_wait_ms / 1000.0
        self.max_queue = int(max_queue) if max_queue else 8 * self.batch_n
        self._q: queue.Queue = queue.Queue()
        self._stop = False
        self.lock = threading.Lock()
        self.n_batches = 0
        self.n_images = 0
        self.n_rejected = 0
        self.batches_by_program = {bn: 0 for bn, _ in self.programs}
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="ddti-batcher")
        self._thread.start()

    def submit(self, arr):
        """``arr``: (size, size, 1) uint8 frame. Blocks until its mask is
        computed; returns the (size, size, 1) uint8 {0,1} mask. Raises
        :class:`QueueFull` when ``max_queue`` frames are already waiting."""
        if self._q.qsize() >= self.max_queue:
            with self.lock:
                self.n_rejected += 1
            raise QueueFull(
                f"{self._q.qsize()} frames pending (max_queue="
                f"{self.max_queue})")
        ev = threading.Event()
        slot: dict = {}
        self._q.put((arr, ev, slot))
        ev.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["mask"]

    def swap_programs(self, predict, batch_n: int,
                      small_programs=None) -> None:
        """Atomically replace the serving programs (hot reload). A flush
        already in flight keeps the (bn, fn) references it selected; new
        flushes see the new set."""
        programs = sorted(
            [(int(bn), fn) for bn, fn in (small_programs or [])
             if int(bn) < int(batch_n)]) + [(int(batch_n), predict)]
        with self.lock:
            self.batch_n = int(batch_n)
            self.programs = programs
            for bn, _ in programs:
                self.batches_by_program.setdefault(bn, 0)

    def close(self):
        self._stop = True
        self._q.put(None)
        self._thread.join(timeout=10)

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                if self._stop:
                    return
                continue
            items = [item]
            deadline = time.perf_counter() + self.max_wait
            while len(items) < self.batch_n:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    if self._stop:
                        break
                    continue
                items.append(nxt)
            try:
                self._flush(items)
            except BaseException as e:  # the worker must NEVER die —
                # every submit() waits on an Event with no timeout, so an
                # escaped exception here would hang all clients forever
                err = (e if isinstance(e, Exception)
                       else RuntimeError(repr(e)))
                for _, ev, slot in items:
                    if not ev.is_set():
                        slot["error"] = err
                        ev.set()
            if self._stop and self._q.empty():
                return

    def _flush(self, items):
        import numpy as np

        with self.lock:  # snapshot: a concurrent reload may swap the set
            programs = list(self.programs)
        largest = programs[-1][0]
        if len(items) > largest:
            # the program set shrank mid-collect (hot reload to smaller
            # batches): split instead of crashing the worker
            for i in range(0, len(items), largest):
                self._flush(items[i:i + largest])
            return
        x = np.stack([a for a, _, _ in items])
        bn, predict = next(p for p in programs if p[0] >= len(items))
        if len(items) < bn:
            pad = np.zeros((bn - len(items),) + x.shape[1:], x.dtype)
            x = np.concatenate([x, pad])
        try:
            masks = np.asarray(predict(x))[:len(items)]
        except Exception as e:  # surface device errors to every waiter
            for _, ev, slot in items:
                slot["error"] = e
                ev.set()
            return
        with self.lock:
            self.n_batches += 1
            self.n_images += len(items)
            self.batches_by_program[bn] += 1
        for m, (_, ev, slot) in zip(masks, items):
            slot["mask"] = m
            ev.set()


def load_predictor(args):
    """Resolve ``--checkpoint`` into fixed-shape predictors.

    Returns ``(predict, batch_n, size, info, small)`` where ``predict``
    maps a uint8 ``(batch_n, size, size, 1)`` array to uint8 {0,1} masks
    of the same shape and ``small`` is an ascending list of
    ``(smaller_batch, predict)`` companion programs (empty unless several
    bundles were given). ``.stablehlo`` paths load AOT bundles
    (train/export.py) — a COMMA-SEPARATED list serves each micro-batch
    through the smallest compiled shape that fits (export the same model
    at e.g. batch 1/8/32; weights ride each bundle's sibling ``.npz``).
    Anything else builds the live model exactly like cli/infer.py."""
    import numpy as np

    paths = args.checkpoint.split(",")
    if all(p.endswith(".stablehlo") for p in paths):
        from ddti_tpu.train.export import load_serving_bundle

        if len(paths) > 1 and args.weights:
            raise ValueError(
                "--weights applies to a single bundle; with a bundle LIST "
                "each program loads its sibling .npz")
        loaded = []
        shared = None  # one HBM copy of the weights across the set
        for p in paths:
            fn, batch_n, size, in_dtype = load_serving_bundle(
                p, args.weights if len(paths) == 1 else None,
                shared_variables=shared)
            shared = getattr(fn, "variables", None) or shared
            if np.dtype(in_dtype) != np.uint8:
                def fn(x, _fn=fn, _dt=in_dtype):
                    return _fn(x.astype(_dt) / np.asarray(255, _dt))
            loaded.append((batch_n, fn, size, in_dtype))
        loaded.sort(key=lambda t: t[0])
        sizes = {t[2] for t in loaded}
        if len(sizes) != 1:
            raise ValueError(f"bundle image sizes differ: {sorted(sizes)}")
        batches = [t[0] for t in loaded]
        if len(set(batches)) != len(batches):
            raise ValueError(f"duplicate bundle batch sizes: {batches}")
        batch_n, predict, size, in_dtype = loaded[-1]
        info = {"artifact": ",".join(os.path.basename(p) for p in paths),
                "input_dtype": str(np.dtype(loaded[-1][3])),
                "program_batches": batches}
        return predict, batch_n, size, info, [
            (bn, fn) for bn, fn, _, _ in loaded[:-1]]

    import jax
    import jax.numpy as jnp

    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import load_checkpoint_into
    from ddti_tpu.train.export import make_serve_fn

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    kwargs = dict(in_channels=1, out_channels=1,
                  base_filters=args.base_filters, depth=args.depth,
                  dtype=dtype)
    if args.model_type == "TransUNet":
        kwargs["image_size"] = args.image_size
    model = create_model(args.model_type, **kwargs)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, args.image_size, args.image_size, 1)), train=False)
    params, stats = load_checkpoint_into(
        args.checkpoint, args.model_type, variables["params"],
        variables.get("batch_stats", {}))
    if args.fold_bn:
        from ddti_tpu.train.fold_bn import fold_batchnorm

        params, stats = fold_batchnorm(model, params, stats)
    serve = jax.jit(make_serve_fn(model, params, stats,
                                  threshold=args.threshold,
                                  tta=args.tta))

    def predict(x):
        return np.asarray(serve(jnp.asarray(x)))

    info = {"model": args.model_type, "base_filters": args.base_filters,
            "depth": args.depth}
    return predict, args.batch_size, args.image_size, info, []


def _quantiles(latencies) -> list:
    """(50, p50), (90, p90), (99, p99) over the recent-latency ring
    (empty list when no requests yet)."""
    if not latencies:
        return []
    s = sorted(latencies)
    return [(q, s[min(len(s) - 1, int(len(s) * q / 100))])
            for q in (50, 90, 99)]


def _overlay_png(orig_gray, mask_2d):
    """Red predicted contours (eval/contours.py marching squares) drawn on
    the original grayscale frame — the online twin of infer --overlay."""
    import numpy as np

    from ddti_tpu.eval.contours import find_contours

    rgb = np.repeat(np.asarray(orig_gray)[..., None], 3, axis=-1).copy()
    for c in find_contours((np.asarray(mask_2d) > 0).astype(np.float32),
                           0.5):
        rr = np.clip(np.round(c[:, 0]).astype(int), 0, rgb.shape[0] - 1)
        cc = np.clip(np.round(c[:, 1]).astype(int), 0, rgb.shape[1] - 1)
        rgb[rr, cc] = (255, 0, 0)
    return rgb


class _Handler(BaseHTTPRequestHandler):
    server_version = "ddti-tpu-serve/1.0"
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *a):  # route access logs through our logger
        if self.server.verbose:  # type: ignore[attr-defined]
            sys.stderr.write("%s - %s\n" % (self.address_string(),
                                            fmt % a))

    def _json(self, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        srv = self.server
        path = urlparse(self.path).path
        if path == "/healthz":
            self._json(200, {"status": "ok", "batch": srv.batcher.batch_n,
                             "size": srv.size, **srv.info})
        elif path == "/stats":
            with srv.stats_lock, srv.batcher.lock:
                n = srv.n_requests
                up = time.perf_counter() - srv.t_start
                self._json(200, {
                    "requests": n,
                    "errors": srv.n_errors,
                    "images": srv.batcher.n_images,
                    "batches": srv.batcher.n_batches,
                    "mean_batch_fill": round(
                        srv.batcher.n_images
                        / max(srv.batcher.n_batches, 1), 3),
                    "uptime_s": round(up, 3),
                    "images_per_sec": round(
                        srv.batcher.n_images / max(up, 1e-9), 3),
                    "mean_latency_ms": round(
                        1e3 * srv.total_latency / max(n, 1), 3),
                    **{f"latency_p{q}_ms": round(1e3 * v, 3)
                       for q, v in _quantiles(srv.recent_latency)},
                    "rejected": srv.batcher.n_rejected,
                    "queue_depth": srv.batcher._q.qsize(),
                    "batches_by_program": {
                        str(k): v for k, v in
                        srv.batcher.batches_by_program.items()},
                    "reloads": srv.n_reloads,
                })
        elif path == "/metrics":
            self._metrics()
        else:
            self._json(404, {"error": f"unknown path {path}"})

    def _metrics(self):
        """GET /metrics: the /stats counters in Prometheus exposition
        format, scrapeable by any standard monitoring stack."""
        srv = self.server
        with srv.stats_lock, srv.batcher.lock:
            up = time.perf_counter() - srv.t_start
            n = srv.n_requests
            lines = [
                "# TYPE ddti_requests_total counter",
                f"ddti_requests_total {n}",
                "# TYPE ddti_request_errors_total counter",
                f"ddti_request_errors_total {srv.n_errors}",
                "# TYPE ddti_images_total counter",
                f"ddti_images_total {srv.batcher.n_images}",
                "# TYPE ddti_batches_total counter",
                f"ddti_batches_total {srv.batcher.n_batches}",
                "# TYPE ddti_rejected_total counter",
                f"ddti_rejected_total {srv.batcher.n_rejected}",
                "# TYPE ddti_reloads_total counter",
                f"ddti_reloads_total {srv.n_reloads}",
                "# TYPE ddti_queue_depth gauge",
                f"ddti_queue_depth {srv.batcher._q.qsize()}",
                "# TYPE ddti_uptime_seconds gauge",
                f"ddti_uptime_seconds {up:.3f}",
                "# TYPE ddti_request_latency_seconds_sum counter",
                f"ddti_request_latency_seconds_sum "
                f"{srv.total_latency:.6f}",
                "# TYPE ddti_request_latency_seconds_count counter",
                f"ddti_request_latency_seconds_count {n}",
                "# TYPE ddti_request_latency_seconds gauge",
                *(f'ddti_request_latency_seconds{{quantile="0.{q}"}} '
                  f"{v:.6f}"
                  for q, v in _quantiles(srv.recent_latency)),
                "# TYPE ddti_program_batches_total counter",
            ]
            for bn, count in sorted(
                    srv.batcher.batches_by_program.items()):
                lines.append(
                    f'ddti_program_batches_total{{batch="{bn}"}} {count}')
        body = ("\n".join(lines) + "\n").encode()
        self.send_response(200)
        self.send_header("Content-Type",
                         "text/plain; version=0.0.4; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _reload(self):
        """POST /reload [{"checkpoint": path}]: load a (possibly new)
        artifact, warm it, and atomically swap the batcher's programs —
        the train->serve loop without a daemon restart. The serving image
        size is fixed for the daemon's lifetime (queued frames are already
        resized), so a size change is rejected with 409."""
        srv = self.server
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length) if length else b""
            req = json.loads(body) if body else {}
            if not isinstance(req, dict):
                raise ValueError("body must be a JSON object")
        except Exception as e:
            self._json(400, {"error": f"bad reload request: {e}"})
            return
        try:
            batch_n, info = srv.reload(req.get("checkpoint"))
        except _SizeMismatch as e:
            self._json(409, {"error": str(e)})
            return
        except Exception as e:
            self._json(500, {"error": f"reload failed: {e}"})
            return
        self._json(200, {"status": "reloaded",
                         "checkpoint": srv.args.checkpoint,
                         "batch": batch_n, **info})

    def do_POST(self):
        import numpy as np
        from PIL import Image

        srv = self.server
        parsed = urlparse(self.path)
        if parsed.path == "/reload":
            self._reload()
            return
        if parsed.path != "/predict":
            self._json(404, {"error": f"unknown path {parsed.path}"})
            return
        t0 = time.perf_counter()
        query = parse_qs(parsed.query)
        want_overlay = query.get("overlay", ["0"])[0] not in ("0", "",
                                                              "false")
        try:
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            arr = orig_size = img = None
            # overlay responses draw on the ORIGINAL-resolution frame,
            # which only the PIL path retains
            if srv.native_decode and not want_overlay \
                    and data[:2] == b"\xff\xd8":
                # native libjpeg decode+resize (one C call) — skips PIL on
                # the per-request hot path; decoded pixels are identical
                # (both ride libjpeg), resize differs by <=1 gray level
                # (float vs PIL fixed-point accumulation)
                from ddti_tpu.runtime.native import decode_jpeg_bytes
                try:
                    arr, orig_size = decode_jpeg_bytes(data, srv.size,
                                                       srv.size)
                except ValueError:
                    pass  # fall through to PIL for odd JPEGs
            if arr is None:
                img = Image.open(io.BytesIO(data)).convert("L")
                orig_size = img.size
                arr = np.asarray(
                    img.resize((srv.size, srv.size), Image.BILINEAR),
                    np.uint8)[..., None]
        except Exception as e:
            with srv.stats_lock:
                srv.n_errors += 1
            self._json(400, {"error": f"could not decode image: {e}"})
            return
        try:
            mask = srv.batcher.submit(arr)
        except QueueFull as e:
            self.send_response(503)
            body = json.dumps({"error": f"overloaded: {e}"}).encode()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Retry-After", "1")
            self.end_headers()
            self.wfile.write(body)
            return
        except Exception as e:
            with srv.stats_lock:
                srv.n_errors += 1
            self._json(500, {"error": f"prediction failed: {e}"})
            return
        m = Image.fromarray((mask[..., 0] * 255).astype(np.uint8))
        m = m.resize(orig_size, Image.NEAREST)
        if want_overlay:
            out_img = Image.fromarray(_overlay_png(img, np.asarray(m)))
        else:
            out_img = m
        if query.get("format", ["png"])[0] == "raw":
            # raw row-major uint8 bytes (mask: 0/255 single-plane; overlay:
            # interleaved RGB) — skips the PNG encoder, the dominant
            # per-request host cost on codec-bound boxes (PERF_NOTES.md);
            # dimensions ride response headers
            arr = np.asarray(out_img)
            body = arr.tobytes()
            ctype = "application/octet-stream"
            dims = {"X-Width": str(arr.shape[1]),
                    "X-Height": str(arr.shape[0]),
                    "X-Channels": str(1 if arr.ndim == 2
                                      else arr.shape[2])}
        else:
            buf = io.BytesIO()
            out_img.save(buf, "PNG")
            body = buf.getvalue()
            ctype = "image/png"
            dims = {}
        with srv.stats_lock:
            srv.n_requests += 1
            dt = time.perf_counter() - t0
            srv.total_latency += dt
            srv.recent_latency.append(dt)
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in dims.items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)


class _SizeMismatch(ValueError):
    """Reload target compiled for a different image size (HTTP 409)."""


class PredictionServer(ThreadingHTTPServer):
    """ThreadingHTTPServer + the model batcher and serving counters."""

    daemon_threads = True

    def __init__(self, addr, batcher: Batcher, size: int, info: dict,
                 verbose: bool = False, args=None):
        self.batcher = batcher
        self.size = size
        self.info = info
        self.verbose = verbose
        self.args = args  # retained for POST /reload
        self.reload_lock = threading.Lock()
        self.n_reloads = 0
        try:  # native libjpeg request decode; PIL fallback when unbuilt
            from ddti_tpu.runtime.native import native_available
            self.native_decode = native_available()
        except Exception:
            self.native_decode = False
        self.stats_lock = threading.Lock()
        self.n_requests = 0
        self.n_errors = 0
        self.total_latency = 0.0
        # ring of the last 1024 request latencies for quantiles
        self.recent_latency = collections.deque(maxlen=1024)
        self.t_start = time.perf_counter()
        super().__init__(addr, _Handler)

    def reload(self, checkpoint: str | None = None) -> tuple:
        """Load ``checkpoint`` (default: the current path, re-read from
        disk), warm it, and atomically swap the batcher's programs.
        Returns (batch_n, info). Serialized by ``reload_lock``."""
        import copy

        import numpy as np

        new_args = copy.copy(self.args)
        new_args.checkpoint = checkpoint or self.args.checkpoint
        with self.reload_lock:  # one reload (compile) at a time
            predict, batch_n, size, info, small = load_predictor(new_args)
            if size != self.size:
                raise _SizeMismatch(
                    f"artifact image size {size} != serving size "
                    f"{self.size}; restart the daemon to change sizes")
            if not new_args.no_warmup:
                predict(np.zeros((batch_n, size, size, 1), np.uint8))
                for bn, fn in small:
                    fn(np.zeros((bn, size, size, 1), np.uint8))
            self.batcher.swap_programs(predict, batch_n, small)
            self.args = new_args
            self.info = info
            with self.stats_lock:
                self.n_reloads += 1
        return batch_n, info

    def start_watcher(self, interval_s: float) -> None:
        """--watch: poll the checkpoint file mtimes and hot-reload when
        training overwrites them (the automatic train->serve loop). The
        watched paths are re-read from ``self.args.checkpoint`` every
        tick, so a ``POST /reload`` onto a NEW path moves the watch with
        it, and a checkpoint that didn't exist at startup is picked up
        (and reloaded) when training first writes it."""
        state = {p: os.path.getmtime(p)
                 for p in self.args.checkpoint.split(",")
                 if os.path.exists(p)}

        def _poll():
            while not self._watch_stop.wait(interval_s):
                try:
                    current = {p: os.path.getmtime(p)
                               for p in self.args.checkpoint.split(",")
                               if os.path.exists(p)}
                except OSError:
                    continue  # mid-write; retry next tick
                changed = [p for p, m in current.items()
                           if state.get(p) != m]
                if not changed:
                    continue
                try:
                    self.reload()
                    state.clear()
                    state.update(current)
                    sys.stderr.write(
                        f"watch: reloaded after {changed} changed\n")
                except Exception as e:  # keep serving the old programs
                    sys.stderr.write(f"watch: reload failed: {e}\n")

        self._watch_stop = threading.Event()
        self._watch_thread = threading.Thread(target=_poll, daemon=True,
                                              name="ddti-watch")
        self._watch_thread.start()

    def close(self):
        if getattr(self, "_watch_thread", None) is not None:
            self._watch_stop.set()
            self._watch_thread.join(timeout=5)
        self.batcher.close()
        self.server_close()


def create_server(args) -> PredictionServer:
    """Load the predictor, warm it up (one padded batch through the device
    program so the first request doesn't pay the compile), and bind the
    HTTP server. ``--port 0`` binds an ephemeral port
    (``server.server_address[1]`` reveals it) — used by the tests."""
    import numpy as np

    predict, batch_n, size, info, small = load_predictor(args)
    if not args.no_warmup:
        predict(np.zeros((batch_n, size, size, 1), np.uint8))
        for bn, fn in small:
            fn(np.zeros((bn, size, size, 1), np.uint8))
    batcher = Batcher(predict, batch_n, max_wait_ms=args.max_wait_ms,
                      max_queue=args.max_queue, small_programs=small)
    server = PredictionServer((args.host, args.port), batcher, size, info,
                              verbose=args.verbose, args=args)
    if getattr(args, "watch", 0):
        server.start_watcher(float(args.watch))
    return server


def get_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="HTTP nodule-segmentation server")
    ap.add_argument("--checkpoint", required=True,
                    help=".stablehlo serving bundle, Orbax dir, .npz, or "
                         "reference-format .pth. A comma-separated list of "
                         ".stablehlo bundles (same model exported at "
                         "different batch sizes) serves each micro-batch "
                         "through the smallest program that fits")
    ap.add_argument("--watch", type=float, default=0,
                    help="poll the checkpoint file(s) every N seconds and "
                         "hot-reload when they change (0 = off)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max_wait_ms", type=float, default=5.0,
                    help="micro-batching window: how long to hold a "
                         "request open for batch-mates before running a "
                         "padded batch")
    ap.add_argument("--model_type", default="ResUNet")
    ap.add_argument("--base_filters", type=int, default=64)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=16,
                    help="compiled batch shape (live-checkpoint path; "
                         "bundles carry their own)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="binarization threshold for live checkpoints "
                         "(e.g. the --tune_threshold operating point); "
                         ".stablehlo bundles bake theirs at export")
    ap.add_argument("--tta", action="store_true",
                    help="4-way flip TTA for live checkpoints (for "
                         ".stablehlo bundles, bake it at export time)")
    ap.add_argument("--fold_bn", action="store_true")
    ap.add_argument("--weights", default=None,
                    help=".npz weight bundle for weights-as-arguments "
                         ".stablehlo programs")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--compilation_cache", default="auto",
                    help="persistent XLA compile cache dir; 'off' disables")
    ap.add_argument("--max_queue", type=int, default=0,
                    help="backpressure bound on pending frames (0 = "
                         "8x batch); beyond it /predict returns 503 + "
                         "Retry-After instead of queueing unboundedly")
    ap.add_argument("--no_warmup", action="store_true")
    ap.add_argument("--verbose", action="store_true",
                    help="per-request access log")
    return ap


def main(argv=None) -> int:
    args = get_parser().parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ddti_tpu.core import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache)

    server = create_server(args)
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(batch={server.batcher.batch_n} size={server.size} "
          f"{server.info})", flush=True)

    import signal

    def _term(signum, frame):  # SIGTERM (k8s/systemd stop) drains too
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down")
    finally:
        server.close()  # batcher drains pending frames before exiting
    return 0


if __name__ == "__main__":
    sys.exit(main())
