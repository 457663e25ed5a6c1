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


def test_pinned_save_survives_best_k_retention(tmp_path):
    """pin=True exempts a checkpoint from best-by-metric GC: with
    max_to_keep best checkpoints all tied on the metric, an unpinned
    tie can lose the retention race, but a pinned save must always
    survive (the preemption-checkpoint contract, train/trainer.py)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                                   make_optimizer)
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    class T(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            return nn.Dense(2)(jnp.mean(x, axis=(1, 2)))

    state = create_train_state(T(), make_optimizer(1e-3),
                               jax.random.PRNGKey(0),
                               input_shape=(1, 8, 8, 3))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=3)
    for s in (10, 20, 30, 40):              # 4 tied bests, keep 3
        mgr.save(s, state, metrics={"val_f1": 1.0}, force=True)
    mgr.save(45, state, metrics={"val_f1": 1.0, "preempted": True},
             force=True, pin=True)
    mgr.wait_until_finished()
    kept = mgr._mgr.all_steps()
    assert 45 in kept, kept                  # pinned survives GC
    assert mgr.latest_step() == 45
    # the pinned checkpoint still restores with its metrics record
    restored = mgr.restore(state, step=45)
    assert int(restored.step) == int(state.step)
    _vars, _step, metrics = __import__(
        "vit_spoof_detection_pda_tpu.utils.checkpoint",
        fromlist=["load_checkpoint_bundle"]).load_checkpoint_bundle(
        str(tmp_path / "ckpt"), step=45)
    assert metrics.get("preempted") is True
    mgr.close()


def test_restore_diagnoses_pipeline_layout_mismatch(tmp_path):
    """A checkpoint saved in the plain block{i} layout restored into a
    PACKED pipeline template (or vice versa) must fail with the layout
    diagnosis, not an opaque orbax missing-key error
    (utils/checkpoint.py::CheckpointManager.restore)."""
    import jax
    import pytest

    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.parallel.pipeline import (
        pack_pipeline_params)
    from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                                   make_optimizer)
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    module = ViTAntiSpoof(patch_size=8, embed_dim=32, depth=2,
                          num_heads=2, hidden=16)
    state = create_train_state(module, make_optimizer(1e-3),
                               jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    packed = state.replace(params=pack_pipeline_params(
        {"params": state.params}, module.depth)["params"])

    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, state, force=True)
    with pytest.raises(ValueError, match="plain module parameter layout"):
        mgr.restore(packed, step=1)
    # same-layout restore still works
    r = mgr.restore(state, step=1)
    assert int(r.step) == int(state.step)
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / "ck2"))
    mgr2.save(1, packed, force=True)
    with pytest.raises(ValueError, match="packed pipeline parameter "):
        mgr2.restore(state, step=1)
    mgr2.close()


def test_device_memory_probe_graceful():
    """device_memory_gb returns a float (backends with memory_stats) or
    None — never raises — and latches unavailable backends so the log
    path costs nothing afterwards (the trainer emits
    train/device_mem_gb conditionally; reference gpu_mem postfix,
    train_advanced.py:348-352)."""
    from vit_spoof_detection_pda_tpu.utils import profiling

    first = profiling.device_memory_gb()
    assert first is None or (isinstance(first, float) and first >= 0.0)
    second = profiling.device_memory_gb()
    if first is None:
        assert profiling._MEM_UNAVAILABLE and second is None
    else:
        assert isinstance(second, float)


def test_cli_logging_survives_absl_root_handler():
    """Importing jax pulls in absl, whose root handler (WARNING) makes a
    plain basicConfig a silent no-op — every CLI INFO line (epoch
    summaries, resume position) vanished.  setup_logging(force=True)
    must win even with the absl handler pre-installed.  Runs in a
    subprocess: force=True rebinding the root handler to a pytest
    capture buffer would poison later tests."""
    import subprocess
    import sys

    code = (
        "import logging, absl.logging as al;"
        "logging.root.addHandler(al.get_absl_handler());"
        "from vit_spoof_detection_pda_tpu.cli.common import setup_logging;"
        "setup_logging();"
        "logging.getLogger('pad.smoke').info('INFO-MARKER-42')"
    )
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "INFO-MARKER-42" in out.stderr + out.stdout
