"""Graceful preemption: SIGTERM/SIGINT during Trainer.train() checkpoints
and stops cleanly (engine._on_preempt_signal). TPU spot/preemptible
capacity delivers SIGTERM; the reference dies mid-epoch with only stale
saves (/root/reference/utils/trainer.py:174-204 has no signal handling).
"""

import os
import signal
import threading

import pytest

from ddti_tpu.core import Config, create_logger
from ddti_tpu.data import DeviceDataSource, generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train import Trainer


def _trainer(tmp_path, epochs=5, **kw):
    cfg = Config(epochs=epochs, batch_size=8, image_size=32, store_size=32,
                 lr=1e-4, model_type="UNet", base_dir=str(tmp_path), **kw)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "log.log"))
    srcs = tuple(DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
                 for n, s in ((16, 0), (8, 1), (8, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    return Trainer(cfg, srcs, logger, model)


def test_sigterm_during_validate_checkpoints_and_stops(tmp_path):
    tr = _trainer(tmp_path, epochs=5)
    calls = []
    real_validate = tr.validate

    def validate_and_preempt(epoch):
        calls.append(epoch)
        out = real_validate(epoch)
        os.kill(os.getpid(), signal.SIGTERM)  # handled by train()'s handler
        return out

    tr.validate = validate_and_preempt
    before_term = signal.getsignal(signal.SIGTERM)
    before_int = signal.getsignal(signal.SIGINT)
    tr.train()
    assert tr.preempted
    assert calls == [0]  # stopped after the first epoch, 4 budgeted remain
    # full-state last checkpoint exists and is resumable
    last = os.path.join(tr.config.model_dir, "UNet_last")
    assert os.path.isdir(last)
    assert os.path.exists(last + ".npz")
    # original handlers restored on exit
    assert signal.getsignal(signal.SIGTERM) is before_term
    assert signal.getsignal(signal.SIGINT) is before_int


def test_preempted_mid_epoch_stops_step_loop(tmp_path):
    """The per-step check: a flag raised during the epoch ends the step
    loop and train() stops before the next validate."""
    tr = _trainer(tmp_path, epochs=5)
    tr._preempted = True  # as if the handler fired just before epoch 0
    validated = []
    tr.validate = lambda e: validated.append(e) or (0.0, 0.0)
    tr.train()
    assert validated == []  # stopped at the epoch boundary, no validate
    assert int(tr.state.step) <= tr.steps_per_epoch  # at most one epoch ran
    assert os.path.isdir(os.path.join(tr.config.model_dir, "UNet_last"))


def test_second_signal_aborts():
    """First signal arms graceful shutdown; a second aborts immediately."""
    import types

    class L:
        def warning(self, *a, **k):
            pass

    self = types.SimpleNamespace(_preempted=False, logger=L())
    from ddti_tpu.train.engine import Trainer as T
    T._on_preempt_signal(self, signal.SIGTERM, None)
    assert self._preempted
    with pytest.raises(KeyboardInterrupt):
        T._on_preempt_signal(self, signal.SIGTERM, None)


def test_train_in_worker_thread_skips_handlers(tmp_path):
    """signal.signal is illegal off the main thread; train() must fall
    back to no handlers and still run (e.g. Trainer inside a server)."""
    tr = _trainer(tmp_path, epochs=1)
    err = []

    def run():
        try:
            tr.train()
        except Exception as e:  # pragma: no cover
            err.append(e)

    t = threading.Thread(target=run)
    t.start()
    t.join(timeout=300)
    assert not t.is_alive() and not err
    assert not tr.preempted
    assert os.path.isdir(os.path.join(tr.config.model_dir, "UNet_last"))


@pytest.mark.slow
def test_cli_sigterm_exit75_and_resume(tmp_path):
    """End-to-end: SIGTERM a real training CLI process -> exit code 75 +
    resumable checkpoint; a --resume run completes the epoch budget."""
    import re
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = str(tmp_path / "exp")
    args = [sys.executable, "main.py", "--cpu", "--synthetic",
            "--model_type", "UNet", "--base_filters", "8", "--depth", "3",
            "--image_size", "32", "--store_size", "32", "--batch_size", "4",
            "--epochs", "200", "--mode", "both", "--base_dir", base,
            "--log_every", "1"]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    p = subprocess.Popen(args, cwd=repo, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    # wait for training to actually be under way, then preempt
    t0 = time.time()
    seen = []
    for line in p.stdout:
        seen.append(line)
        if "Validate Epoch: 2" in line or time.time() - t0 > 240:
            break
    p.send_signal(signal.SIGTERM)
    out = p.communicate(timeout=240)[0]
    full = "".join(seen) + out
    assert p.returncode == 75, full[-3000:]
    assert "preempted" in full and "test phase skipped" in full.lower()
    run_dir = next(d for d in os.listdir(base) if d.startswith("UNet"))
    last = os.path.join(base, run_dir, "models", "UNet_last")
    assert os.path.isdir(last)

    # resume completes the (reduced) budget and runs the test phase
    args2 = [a for a in args]
    args2[args2.index("--epochs") + 1] = "3"
    args2 += ["--resume", "--checkpoint_path", last]
    r = subprocess.run(args2, cwd=repo, env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True, timeout=480)
    assert r.returncode == 0, r.stdout[-3000:]
    assert re.search(r"Test Metrics", r.stdout)


# ---------------------------------------------------------------------------
# sweep-runner preemption recovery (cli/sweep.py DDTI_RESUME_HINT contract)
# ---------------------------------------------------------------------------

_FAKE_JOB = """
import json, os, sys
# first run: "get preempted" — write the resume hint and exit 75.
# resumed run (has --resume): verify the flags and exit 0.
if "--resume" in sys.argv:
    i = sys.argv.index("--checkpoint_path")
    assert sys.argv[i + 1] == "CKPT", sys.argv
    sys.exit(0)
with open(os.environ["DDTI_RESUME_HINT"], "w") as f:
    json.dump({"checkpoint_path": "CKPT", "epochs": 7}, f)
sys.exit(75)
"""


@pytest.mark.slow  # subprocess e2e; the fast tier keeps the hint-less
# exit-75 case, and the full tier has the real-CLI resume e2e
def test_sweep_resumes_preempted_job(tmp_path):
    import sys
    from ddti_tpu.cli.sweep import run_jobs

    job = tmp_path / "job.py"
    job.write_text(_FAKE_JOB)
    codes = run_jobs([[sys.executable, str(job)],
                      [sys.executable, "-c", "pass"]],
                     max_jobs=2, min_gap=0)
    assert codes == [0, 0]  # preempted job resumed to success


def test_sweep_preempt_without_hint_counts_as_failure(tmp_path):
    """Exit 75 from a job that never wrote its hint (not our CLI / save
    failed) must NOT be resumed — it falls through to plain retries."""
    import sys
    from ddti_tpu.cli.sweep import run_jobs

    codes = run_jobs([[sys.executable, "-c", "import sys; sys.exit(75)"]],
                     max_jobs=1, min_gap=0)
    assert codes == [75]


@pytest.mark.slow  # subprocess e2e (several interpreter relaunches)
def test_sweep_repeated_preemption_caps(tmp_path):
    """A job preempted on every launch stops after max_resumes relaunches."""
    import sys
    from ddti_tpu.cli.sweep import run_jobs

    counter = tmp_path / "count"
    job = tmp_path / "job.py"
    job.write_text(
        "import json, os, sys\n"
        f"c = int(open({str(counter)!r}).read()) if "
        f"os.path.exists({str(counter)!r}) else 0\n"
        f"open({str(counter)!r}, 'w').write(str(c + 1))\n"
        "with open(os.environ['DDTI_RESUME_HINT'], 'w') as f:\n"
        "    json.dump({'checkpoint_path': 'CKPT'}, f)\n"
        "sys.exit(75)\n")
    codes = run_jobs([[sys.executable, str(job)]], max_jobs=1, min_gap=0,
                     max_resumes=2)
    assert codes == [75]
    assert int(counter.read_text()) == 3  # 1 launch + 2 resumes


@pytest.mark.slow  # full Trainer run with the export tail (~6 s)
def test_preempted_run_skips_serving_export(tmp_path):
    """--export_serving must not run inside the preemption grace window
    (its 30-60 s remote compiles would race the scheduler's SIGKILL and
    keep the CLI from reaching its exit-75/resume-hint path); the resumed
    job exports on its completion."""
    tr = _trainer(tmp_path, epochs=2, export_serving=True)
    tr._preempted = True
    tr.train()
    assert tr.preempted
    assert os.path.isdir(os.path.join(tr.config.model_dir, "UNet_last"))
    assert not any(f.endswith(".stablehlo")
                   for f in os.listdir(tr.config.model_dir))
    # a normal completion with the same config still exports
    tr2 = _trainer(tmp_path / "normal", epochs=1, export_serving=True)
    tr2.train()
    assert any(f.endswith(".stablehlo")
               for f in os.listdir(tr2.config.model_dir))


@pytest.mark.slow  # subprocess e2e (several interpreter relaunches)
def test_sweep_retry_pass_resumes_instead_of_scratch(tmp_path):
    """A job still preempted after max_resumes is retried WITH resume
    flags by the retries pass — never relaunched from scratch (which
    would discard checkpoint progress)."""
    import sys
    from ddti_tpu.cli.sweep import run_jobs

    counter = tmp_path / "count"
    scratch = tmp_path / "scratch"
    job = tmp_path / "job.py"
    job.write_text(
        "import json, os, sys\n"
        f"c = int(open({str(counter)!r}).read()) if "
        f"os.path.exists({str(counter)!r}) else 0\n"
        f"open({str(counter)!r}, 'w').write(str(c + 1))\n"
        "if '--resume' not in sys.argv:\n"
        f"    open({str(scratch)!r}, 'a').write('x')\n"
        "if c + 1 >= 3:\n"
        "    sys.exit(0)\n"
        "with open(os.environ['DDTI_RESUME_HINT'], 'w') as f:\n"
        "    json.dump({'checkpoint_path': 'CKPT'}, f)\n"
        "sys.exit(75)\n")
    codes = run_jobs([[sys.executable, str(job)]], max_jobs=1, min_gap=0,
                     max_resumes=1, retries=1)
    assert codes == [0]
    assert int(counter.read_text()) == 3  # launch + resume + retry-resume
    assert scratch.read_text() == "x"  # only the first launch was scratch


def test_preempt_under_fused_epoch_stops_at_epoch_boundary(tmp_path):
    """--fused_epoch has no step loop; the flag is honored between the
    scanned epoch programs."""
    tr = _trainer(tmp_path, epochs=5, fused_epoch=True)
    assert tr.scan_epoch is not None  # the fused path is actually active
    tr._preempted = True
    validated = []
    tr.validate = lambda e: validated.append(e) or (0.0, 0.0)
    tr.train()
    assert validated == []
    assert int(tr.state.step) == tr.steps_per_epoch  # exactly one epoch
    assert os.path.isdir(os.path.join(tr.config.model_dir, "UNet_last"))
