"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so mesh/DP/pjit paths are
exercised without TPU hardware (the standard JAX substitute — SURVEY.md §4).

Note: this environment registers an `axon` TPU PJRT plugin from
sitecustomize before pytest starts, so env vars alone are not enough —
`jax.config.update('jax_platforms', ...)` must run before the first
device query.  This conftest runs at collection time, ahead of any test
importing jax-dependent modules.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# a set axon relay var makes CPU-only jax hang at first dispatch
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE
