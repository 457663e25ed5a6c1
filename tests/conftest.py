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

# Persistent XLA compile cache: repeat suite runs skip recompilation
# (measured 81.8 -> 40.7 s on test_attention.py; golden-parity files
# bit-identical warm).  The cache key covers HLO + compile options +
# jaxlib version, so code changes re-key automatically.  The XLA:CPU
# AOT loader logs a benign feature-STRING mismatch on every load
# (pseudo-features like +prefer-no-scatter never appear in host
# detection; execution host == compile host here) — silence the C++
# ERROR spam unless the user asked for verbosity.  Opt out with
# PAD_TEST_COMPILE_CACHE=0.
_CACHE = os.environ.get("PAD_TEST_COMPILE_CACHE", "1") != "0"
if _CACHE:
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
if _CACHE:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".cache", "jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE


# ---------------------------------------------------------------------------
# "core" tier: a <5-minute pre-commit slice on this 1-core host
# (`pytest -m core`) — at least one oracle/contract test per component;
# the full suite stays the round gate.  File -> None (every non-slow
# test) or a tuple of name substrings selecting the core subset.
# ---------------------------------------------------------------------------

CORE_TIER = {
    # config / data / metrics / losses oracles
    "test_config.py": None,
    "test_data.py": None,
    "test_shards.py": ("content_parity", "pipeline_contract"),
    "test_metrics_parity.py": None,
    "test_metrics_device.py": ("matches", "optimal_threshold", "eer"),
    "test_losses.py": None,
    # augmentation + warp kernels
    "test_augment.py": None,
    "test_warp_pallas.py": None,
    # models + weight interop
    "test_models.py": ("matches", "registry_builds", "roundtrip"),
    # training engine (incl. pool mode) + reference-executed parity
    "test_train.py": None,
    "test_pool.py": ("equivalence", "contract"),
    "test_reference_train_exec.py": ("focal", "threshold_sweep",
                                     "early_stopping"),
    "test_reference_simple_exec.py": ("split_parity",),
    "test_reference_harness_exec.py": ("golden_vectors",),
    # eval + analysis golden replays
    "test_eval.py": ("alignment", "golden_replay", "artifacts"),
    "test_analysis.py": ("golden",),
    "test_fastserve_metric_bound.py": None,
    # training kernels (fused block fwd/bwd + LN-tail Pallas pass)
    "test_fasttrain.py": ("grads_match", "ln_residual"),
    # serving kernels + daemon + parallelism
    "test_attention.py": ("matches_dense",),
    "test_fastserve.py": ("matches_module", "routing"),
    "test_lowlat.py": ("matches_serving_forward_f32",),
    "test_parallel.py": ("train_step_matches_single",),
    "test_serve.py": ("score_matches", "plan_minimizes"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        sel = CORE_TIER.get(item.fspath.basename, False)
        if sel is False or "slow" in item.keywords:
            continue
        if sel is None or any(pat in item.name for pat in sel):
            item.add_marker(pytest.mark.core)
