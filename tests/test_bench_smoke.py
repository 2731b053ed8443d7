"""End-to-end smoke test of the driver bench artifact (bench.py).

bench.py is the ONE artifact the round driver runs on real hardware; a
plumbing regression there (leg ordering, subprocess arg passing, JSON
schema) would silently cost a round's perf evidence. This exercises the
whole pipeline — headline train/infer, both 512-leg subprocesses, the
int8 + bf16 serving exports, and the variant subprocesses — on the CPU
backend at toy shapes via the bench's own ``--cpu`` smoke mode, and
checks the incremental last-line-wins JSON contract.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_cpu_smoke(tmp_path):
    env = {
        **os.environ,
        # generous deadline: a loaded 1-core CI box compiles slowly, and a
        # budget-skip would hide a plumbing bug this test exists to catch
        "DDTI_BENCH_DEADLINE": "1200",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    }
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu",
         "--batch", "4", "--size", "32", "--size512", "64", "--steps", "2",
         "--base_filters", "8", "--depth", "3",
         "--compilation_cache", str(tmp_path / "xla_cache")],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout, r.stderr)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    # incremental emit: one valid JSON object per landed metric
    assert len(lines) >= 5, r.stdout
    for ln in lines:
        json.loads(ln)
    out = json.loads(lines[-1])  # driver contract: last line wins
    assert out["metric"] == "resunet256_train_images_per_sec_per_chip"
    assert out["value"] > 0
    assert out["backend"] == "cpu"
    assert out["backend_init_s"] >= 0
    for key in ("infer_images_per_sec_per_chip",
                "train512_images_per_sec", "infer512_images_per_sec",
                "serve_int8_images_per_sec_per_chip",
                "serve_images_per_sec_per_chip",
                "train_fast_warp_images_per_sec",
                "train_shared_geometry_images_per_sec",
                "train512_ga2_images_per_sec",
                "train_step_ms"):
        assert key in out, (key, r.stdout, r.stderr)
        assert out[key] > 0, (key, out[key])
    # rounds to 0.0 at toy CPU shapes; just require presence + sane range
    assert 0 <= out["train_mfu_est"] <= 1
