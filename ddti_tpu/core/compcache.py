"""Persistent XLA compilation cache for the CLI entry points.

TPU compiles through the remote-compile tunnel cost 30-60 s per program
(a full train step, eval step, and serving export each compile their
own); the reference's torch eager mode has no such cold start, so repeat
CLI invocations here would otherwise pay it every time. JAX's persistent
compilation cache keys serialized executables by (HLO, compile options,
platform) on local disk — measured on this backend (two identical
processes, benchmarks/cache_probe.py): model.init 119.5 s -> 20.7 s,
train-shape forward compile 8.9 s -> 2.9 s on the warm run.

Off by default inside library code (tests set their own cache); the CLIs
enable it before first device use via ``enable_compilation_cache``.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "ddti_tpu",
                           "xla_cache")
# Skip caching trivial sub-second programs (eager dispatch helpers): they
# churn thousands of tiny files for no cold-start benefit.
MIN_COMPILE_SECS = 0.5


def enable_compilation_cache(spec: str = "auto") -> str | None:
    """Point JAX's persistent compilation cache at a local directory.

    ``spec``: "auto" = ``$DDTI_COMPILATION_CACHE`` or ``~/.cache/ddti_tpu/
    xla_cache``; "off" (or "") disables; anything else is used as the
    directory verbatim. Returns the directory in effect, or None when
    disabled. Must run before the first compilation to affect it (earlier
    programs simply miss the cache; nothing breaks).
    """
    if spec in ("off", "", None):
        return None
    if spec == "auto":
        spec = os.environ.get("DDTI_COMPILATION_CACHE", DEFAULT_DIR)
        if spec in ("off", ""):
            return None
    import jax

    os.makedirs(spec, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", spec)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      MIN_COMPILE_SECS)
    return spec
