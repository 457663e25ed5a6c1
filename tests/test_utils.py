"""Aux subsystems: determinism controls, profiling hooks, telemetry."""

import json

import numpy as np

import jax
import jax.numpy as jnp


def test_seed_everything_reproducible():
    from vit_spoof_detection_pda_tpu.utils.determinism import seed_everything
    k1 = seed_everything(7)
    a = np.random.random(4)
    k2 = seed_everything(7)
    b = np.random.random(4)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_debug_nans_catches():
    from vit_spoof_detection_pda_tpu.utils.determinism import (
        enable_debug_nans)
    enable_debug_nans(True)
    try:
        import pytest
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    finally:
        enable_debug_nans(False)


def test_strict_determinism_context():
    from vit_spoof_detection_pda_tpu.utils.determinism import (
        strict_determinism)
    with strict_determinism():
        out = jnp.dot(jnp.ones((4, 4)), jnp.ones((4, 4)))
    assert float(out[0, 0]) == 4.0


def test_profile_trace_noop_and_real(tmp_path):
    from vit_spoof_detection_pda_tpu.utils.profiling import (
        StepTimer, annotate, profile_trace)
    with profile_trace(None):
        pass
    with profile_trace(str(tmp_path / "trace")):
        with annotate("step"):
            jnp.ones(8).sum().block_until_ready()
    assert any((tmp_path / "trace").rglob("*"))

    t = StepTimer(window=3)
    assert t.tick() is None
    for _ in range(4):
        rate = t.tick()
    assert rate and rate > 0


def test_metric_logger_jsonl(tmp_path):
    from vit_spoof_detection_pda_tpu.utils.telemetry import MetricLogger
    path = tmp_path / "m.jsonl"
    logger = MetricLogger(jsonl_path=str(path), echo=False)
    logger.log({"train/loss": jnp.asarray(1.5), "val/f1": 0.7}, step=3)
    logger.close()
    rec = json.loads(path.read_text().strip())
    assert rec["train/loss"] == 1.5
    assert rec["step"] == 3
