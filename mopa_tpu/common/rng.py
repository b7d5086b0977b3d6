"""Seeding utilities.

The reference seeds python/numpy/torch RNGs (``mopa/common/utils/torch_util.py:6-28``).
The TPU rebuild is JAX-first: host-side augmentation uses a per-process numpy
``Generator`` tree; device-side randomness uses ``jax.random`` keys threaded
through the train step.
"""

import random

import numpy as np
import jax


def set_random_seed(seed):
    """Seed the host RNGs. -1 means time-seeded (reference base.py:130-133)."""
    if seed is None or seed < 0:
        return
    random.seed(seed)
    np.random.seed(seed)


def make_key(seed):
    """Root JAX PRNG key for a run."""
    return jax.random.PRNGKey(int(seed) & 0x7FFFFFFF)


def worker_rng(seed, worker_id):
    """Per-worker numpy Generator (replaces reference worker_init_fn)."""
    return np.random.default_rng(np.random.SeedSequence([int(seed) & 0x7FFFFFFF, worker_id]))
