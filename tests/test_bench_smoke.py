"""End-to-end smoke test of the driver bench artifact (bench.py).

bench.py is the ONE artifact the round driver runs on real hardware; a
plumbing regression there (leg ordering, subprocess arg passing, JSON
schema) would silently cost a round's perf evidence. This exercises the
whole pipeline — headline train/infer, the int8 + bf16 serving exports,
both 512-leg subprocesses, and the variant subprocesses — on the CPU
backend at toy shapes via the bench's own ``--cpu`` smoke mode, and
checks the incremental last-line-wins JSON contract.

The second test simulates the round-4 failure mode (a degraded tunnel
burning the budget on the early legs): with almost no budget left after
the infer leg, the cheap in-process serving legs must STILL land in the
final JSON line, and every subprocess leg must skip cleanly — the r5
leg order exists precisely so degradation costs the 512/variant legs,
never the serving numbers.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench_cache(tmp_path_factory):
    # one persistent-compile-cache dir for both runs: they share every toy
    # program, so the simulation run compiles (almost) nothing
    return str(tmp_path_factory.mktemp("xla_cache"))


def _run_bench(bench_cache, extra_env=None):
    env = {
        **os.environ,
        # generous deadline: a loaded 1-core CI box compiles slowly, and a
        # budget-skip would hide a plumbing bug this test exists to catch
        "DDTI_BENCH_DEADLINE": "1200",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        **(extra_env or {}),
    }
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu",
         "--batch", "4", "--size", "32", "--size512", "64", "--steps", "2",
         "--base_filters", "8", "--depth", "3",
         "--compilation_cache", bench_cache],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)


def _json_lines(r):
    assert r.returncode == 0, (r.stdout, r.stderr)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    for ln in lines:
        json.loads(ln)
    return lines


@pytest.mark.slow
def test_bench_cpu_smoke(bench_cache):
    r = _run_bench(bench_cache)
    lines = _json_lines(r)
    # incremental emit: one valid JSON object per landed metric
    assert len(lines) >= 5, r.stdout
    out = json.loads(lines[-1])  # driver contract: last line wins
    assert out["metric"] == "resunet256_train_images_per_sec_per_chip"
    assert out["value"] > 0
    assert out["backend"] == "cpu"
    assert out["backend_init_s"] >= 0
    assert out["startup_s"] >= 0
    # the round-5 headline measures the default (fast-warp) train program
    assert out["train_aug_warp"] == "fast_warp"
    for key in ("infer_images_per_sec_per_chip",
                "serve_int8_images_per_sec_per_chip",
                "serve_images_per_sec_per_chip",
                "train512_images_per_sec", "infer512_images_per_sec",
                "train_exact_warp_images_per_sec",
                "train_shared_geometry_images_per_sec",
                "train512_ga2_images_per_sec",
                "train_step_ms"):
        assert key in out, (key, r.stdout, r.stderr)
        assert out[key] > 0, (key, out[key])
    # measurement-condition keys (ADVICE r4: a config change must be
    # visible to whoever compares rounds)
    assert out["infer512_batch"] == 16  # size512=64 < 256 in smoke mode
    # rounds to 0.0 at toy CPU shapes; just require presence + sane range
    assert 0 <= out["train_mfu_est"] <= 1


@pytest.mark.slow
def test_bench_degraded_budget_keeps_serving(bench_cache):
    """Simulated degraded tunnel: 70 s of budget left after the infer leg.
    Serving (in-process, cheap) must still land; every subprocess leg must
    skip (below min_budget even with the last leg's zero reserve); exit
    code stays 0."""
    r = _run_bench(bench_cache,
                   extra_env={"DDTI_BENCH_SIM_REMAINING_S": "70"})
    lines = _json_lines(r)
    out = json.loads(lines[-1])
    # the high-value legs all landed
    assert out["value"] > 0
    assert out["infer_images_per_sec_per_chip"] > 0
    assert out["serve_int8_images_per_sec_per_chip"] > 0, r.stderr
    assert out["serve_images_per_sec_per_chip"] > 0, r.stderr
    # every subprocess leg skipped cleanly (budget - reserve < min_budget)
    for key in ("train512_images_per_sec", "infer512_images_per_sec",
                "train_exact_warp_images_per_sec",
                "train_shared_geometry_images_per_sec",
                "train512_ga2_images_per_sec"):
        assert key not in out, (key, out)
    assert "reserved for later legs" in r.stderr, r.stderr
