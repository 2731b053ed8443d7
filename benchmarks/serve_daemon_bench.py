"""Measure the online HTTP daemon (cli/serve.py) on real hardware:
single-request latency and concurrent-client throughput through the full
stack (HTTP parse -> PIL decode/resize -> micro-batcher -> AOT device
program -> PNG encode), flagship ResUNet bundle at 256².

Run:  benchmarks/run_in_repo.sh benchmarks/serve_daemon_bench.py
      [--batch 32] [--clients 8] [--n 200] [--dtype int8|bf16]

Context: this container has ONE CPU core, so the host-side codec work
(JPEG decode + PNG encode per request) and the device program contend for
the same core's dispatch time — the daemon's ceiling here is host-bound,
not device-bound (the device path is the same artifact bench.py measures
at ~1480 img/s offline for int8 bs128).
"""
import argparse
import http.client
import io
import json
import statistics
import threading
import time

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=32)
ap.add_argument("--size", type=int, default=256)
ap.add_argument("--clients", type=int, default=8)
ap.add_argument("--n", type=int, default=200, help="total requests")
ap.add_argument("--dtype", default="int8", choices=["int8", "bf16"])
ap.add_argument("--max_wait_ms", type=float, default=5.0)
ap.add_argument("--format", default="png", choices=["png", "raw"],
                help="response encoding: PNG (default) or raw uint8 bytes"
                     " (?format=raw — skips the host PNG encoder)")
ap.add_argument("--small", type=int, default=0,
                help="also export a batch-N companion bundle and serve "
                     "--checkpoint small,big (multi-program latency path)")
ap.add_argument("--reuse", action="store_true",
                help="reuse /tmp/daemon_bench_<dtype>.{stablehlo,npz} "
                     "from a previous run instead of re-exporting")
args = ap.parse_args()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ddti_tpu.cli.serve import create_server, get_parser  # noqa: E402
from ddti_tpu.data import generate_ddti_like  # noqa: E402
from ddti_tpu.models import ResUNet  # noqa: E402
from ddti_tpu.train.checkpoint import save_variables_npz  # noqa: E402

import os  # noqa: E402

prog = f"/tmp/daemon_bench_{args.dtype}.stablehlo"
_model_state = {}


def _export_bundle(path: str, batch: int) -> None:
    """Export one bundle at ``batch`` to ``path`` (+ sibling .npz),
    initializing the model/calibration lazily ONCE (so any mix of reused
    and fresh bundles works)."""
    if not _model_state:
        m = ResUNet(in_channels=1, out_channels=1, base_filters=64,
                    depth=5, dtype=jnp.bfloat16)
        _model_state["model"] = m
        _model_state["v"] = m.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, args.size, args.size, 1)), train=False)
        _model_state["calib"], _ = generate_ddti_like(
            8, (args.size, args.size), 0)
    model, v = _model_state["model"], _model_state["v"]
    t0 = time.time()
    if args.dtype == "int8":
        from ddti_tpu.train.quantize import export_serving_int8
        blob, variables = export_serving_int8(
            model, v["params"], v["batch_stats"], batch=batch,
            size=args.size,
            calib_images=jnp.asarray(_model_state["calib"],
                                     jnp.float32) / 255.0,
            input_dtype=jnp.uint8)
    else:
        from ddti_tpu.train.export import export_serving_program
        blob, variables = export_serving_program(
            model, v["params"], v["batch_stats"], batch=batch,
            size=args.size, fold_bn=True, input_dtype=jnp.uint8)
    with open(path, "wb") as f:
        f.write(blob)
    save_variables_npz(path.replace(".stablehlo", ".npz"), variables)
    print(f"exported {args.dtype} bundle batch={batch} "
          f"in {time.time() - t0:.1f}s")


def _have(path: str) -> bool:
    return (os.path.exists(path)
            and os.path.exists(path.replace(".stablehlo", ".npz")))


if args.reuse and _have(prog):
    print(f"reusing exported bundle {prog}")
else:
    _export_bundle(prog, args.batch)

checkpoint = prog
if args.small:
    small_prog = prog.replace(".stablehlo", f"_b{args.small}.stablehlo")
    if args.reuse and _have(small_prog):
        print(f"reusing companion bundle {small_prog}")
    else:
        _export_bundle(small_prog, args.small)
    checkpoint = f"{small_prog},{prog}"

srv_args = get_parser().parse_args(
    ["--checkpoint", checkpoint, "--port", "0",
     "--max_wait_ms", str(args.max_wait_ms)])
from ddti_tpu.core import enable_compilation_cache  # noqa: E402

enable_compilation_cache("auto")
t0 = time.time()
server = create_server(srv_args)
print(f"server up (incl. AOT compile + warmup) in {time.time() - t0:.1f}s")
threading.Thread(target=server.serve_forever, daemon=True).start()
port = server.server_address[1]

# one request payload, reused (DDTI-like frame, realistic JPEG size)
from PIL import Image  # noqa: E402

frame, _ = generate_ddti_like(1, (390, 470), 1)  # native-ish DDTI dims
buf = io.BytesIO()
Image.fromarray(frame[0, ..., 0].astype(np.uint8), "L").save(buf, "JPEG")
payload = buf.getvalue()
print(f"payload {len(payload)} bytes ({frame.shape[1]}x{frame.shape[2]})")


PATH = "/predict" + ("?format=raw" if args.format == "raw" else "")


def one_request():
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    t = time.perf_counter()
    conn.request("POST", PATH, body=payload)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    assert resp.status == 200, data[:200]
    return time.perf_counter() - t


# ---- single-client latency
lat = [one_request() for _ in range(30)]
lat_ms = sorted(x * 1e3 for x in lat[5:])
print(f"single-client latency p50 {statistics.median(lat_ms):.1f} ms  "
      f"p90 {lat_ms[int(0.9 * len(lat_ms))]:.1f} ms")

# ---- concurrent throughput
per_client = args.n // args.clients
errs = []


def client(i):
    try:
        for _ in range(per_client):
            one_request()
    except Exception as e:
        errs.append(e)


threads = [threading.Thread(target=client, args=(i,))
           for i in range(args.clients)]
t0 = time.perf_counter()
for t in threads:
    t.start()
for t in threads:
    t.join()
dt = time.perf_counter() - t0
assert not errs, errs[:3]
total = per_client * args.clients

conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
conn.request("GET", "/stats")
stats = json.loads(conn.getresponse().read())
conn.close()
print(f"{args.clients} clients: {total} reqs in {dt:.1f}s = "
      f"{total / dt:.1f} img/s  mean_batch_fill {stats['mean_batch_fill']}"
      f"  server mean latency {stats['mean_latency_ms']:.1f} ms")
server.shutdown()
server.close()
