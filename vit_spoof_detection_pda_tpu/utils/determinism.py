"""Determinism + numerical-debug controls (SURVEY.md §5).

The reference sets ``cudnn.deterministic=True`` AND ``cudnn.benchmark=True``
simultaneously (train_advanced.py:512-513 — the benchmark autotuner wins
the nondeterminism back).  JAX programs are pure, so determinism here
means: one seeded PRNG key threaded everywhere (no host-time dependence),
seeded NumPy for host-side shuffles, and optional strict XLA determinism.
"""

from __future__ import annotations

import contextlib
import logging
import os
import random

import numpy as np

log = logging.getLogger(__name__)


def seed_everything(seed: int):
    """Seed host RNGs and return the root JAX PRNG key.

    Replaces the reference's torch/np/cudnn seeding block
    (train_advanced.py:507-513).
    """
    import jax

    random.seed(seed)
    np.random.seed(seed)
    # NOTE: only affects CHILD processes — CPython reads PYTHONHASHSEED
    # at interpreter startup, so the current process's str/set hash
    # order is already fixed.  Nothing in this framework's compute path
    # depends on hash order; exported so spawned workers inherit it.
    os.environ.setdefault("PYTHONHASHSEED", str(seed))
    return jax.random.PRNGKey(seed)


def enable_debug_nans(enabled: bool = True):
    """Raise on the first NaN produced by any jitted computation
    (jax_debug_nans) — the numerical-sanitizer story for this framework."""
    import jax

    jax.config.update("jax_debug_nans", enabled)


@contextlib.contextmanager
def strict_determinism():
    """Context: bit-deterministic XLA reductions (may cost performance).

    On TPU, XLA is deterministic by default for a fixed program + input
    layout; this additionally pins the dot/conv precision so recompiles
    across precision hints can't change results.
    """
    import jax

    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        yield
    finally:
        jax.config.update("jax_default_matmul_precision", prev)
