"""Seeding. JAX randomness is explicit-key (no global device RNG to seed);
``set_seed`` seeds the host-side numpy/python generators used for shuffling
and returns the root jax.random key for everything stochastic on device —
the functional replacement for the reference's set_seed
(/root/reference/utils/utils.py:47-51)."""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)
