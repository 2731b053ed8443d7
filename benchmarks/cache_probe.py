"""Probe: does the JAX persistent compilation cache work through the
axon remote-compile tunnel? Run twice; on a hit the second process's
compile() time collapses.

  benchmarks/run_in_repo.sh benchmarks/cache_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ddti_cache_probe")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# a real model step so compile time is well above tunnel noise
from ddti_tpu.models import create_model  # noqa: E402

model = create_model("ResUNet", base_filters=32, depth=4)
x = jnp.ones((8, 256, 256, 1), jnp.float32)
rng = jax.random.PRNGKey(0)
t0 = time.time()
v = model.init(rng, x, train=False)
t1 = time.time()


def fwd(params, xx):
    return model.apply(params, xx, train=False)


t2 = time.time()
c = jax.jit(fwd).lower(v, x).compile()
t3 = time.time()
s = float(jnp.sum(c(v, x)))
t4 = time.time()
print(f"init {t1 - t0:.2f}s  compile {t3 - t2:.2f}s  run {t4 - t3:.2f}s "
      f"(sum={s:.3g}) backend={jax.default_backend()}")
sys.exit(0)
