"""Serving cold-start A/B: daemon boot time with a cold vs warm persistent
compilation cache (VERDICT r2 #8).

Exports the flagship serving bundle once, then boots `cli/serve` twice
against a FRESH cache dir (cold) and again with the populated dir (warm),
timing launch -> first /healthz 200. Prints one line per boot.

Run on hardware: `sh benchmarks/run_in_repo.sh benchmarks/serve_coldstart.py`
"""

import http.client
import os
import signal
import subprocess
import sys
import tempfile
import time

PORT = 18931


def export_bundle(tmp: str) -> tuple[str, str]:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.models import ResUNet
    from ddti_tpu.train.export import export_serving_program
    from ddti_tpu.train.state import create_train_state

    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, 256, 256, 1), 1e-4, steps_per_epoch=10)
    blob, variables = export_serving_program(
        model, state.params, state.batch_stats, batch=128, size=256)
    prog = os.path.join(tmp, "resunet_serving_program.stablehlo")
    with open(prog, "wb") as f:
        f.write(blob)
    from ddti_tpu.train.checkpoint import save_variables_npz

    wpath = os.path.splitext(prog)[0] + ".npz"
    save_variables_npz(wpath, variables)
    return prog, wpath


def boot_once(prog: str, wpath: str, cache_dir: str, label: str) -> float:
    env = dict(os.environ)
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-m", "ddti_tpu.cli.serve",
         "--checkpoint", prog,
         "--port", str(PORT), "--compilation_cache", cache_dir],
        cwd="/root/repo", env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.perf_counter() + 600
        while time.perf_counter() < deadline:
            try:
                conn = http.client.HTTPConnection("127.0.0.1", PORT,
                                                  timeout=5)
                conn.request("GET", "/healthz")
                if conn.getresponse().status == 200:
                    dt = time.perf_counter() - t0
                    print(f"{label}: {dt:.1f} s to first healthy",
                          flush=True)
                    return dt
            except OSError:
                rc = proc.poll()
                if rc is not None:  # daemon died at startup: fail fast
                    raise RuntimeError(f"{label}: serve exited rc={rc} "
                                       "before first healthy")
                time.sleep(0.5)
        raise TimeoutError(label)
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="serve_cold_")
    cache = os.path.join(tmp, "compcache")
    os.makedirs(cache, exist_ok=True)
    t0 = time.perf_counter()
    prog, wpath = export_bundle(tmp)
    print(f"export: {time.perf_counter() - t0:.1f} s", flush=True)
    cold = boot_once(prog, wpath, cache, "cold boot (empty cache)")
    time.sleep(2)
    warm = boot_once(prog, wpath, cache, "warm boot (populated cache)")
    print(f"speedup: {cold / warm:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
