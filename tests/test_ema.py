"""Polyak/EMA shadow weights (train/state.py::ema_of_params): transform
math vs a hand-rolled recursion, MultiSteps composition, Trainer
integration (validation on the shadow), checkpoint retrieval, and the
export CLI flag."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.train.state import (create_train_state,
                                                     ema_of_params,
                                                     find_ema_params,
                                                     make_optimizer)


def test_ema_transform_matches_hand_recursion():
    decay = 0.9
    tx = optax.chain(optax.sgd(0.1), ema_of_params(decay))
    params = {"w": jnp.asarray([1.0, -2.0])}
    state = tx.init(params)
    want_ema = np.asarray(params["w"])
    for step in range(5):
        grads = {"w": jnp.asarray([0.5, float(step)])}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        want_ema = decay * want_ema + (1 - decay) * np.asarray(params["w"])
    got = find_ema_params(state)
    np.testing.assert_allclose(np.asarray(got["w"]), want_ema, rtol=1e-6)

    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        ema_of_params(1.0)


def test_ema_inside_multisteps_ticks_per_effective_step():
    """With accumulation, the EMA must update once per EFFECTIVE step."""
    decay = 0.5
    tx = make_optimizer(0.1, max_grad_norm=None,
                        gradient_accumulation_steps=2, ema_decay=decay)
    params = {"w": jnp.asarray([1.0])}
    state = tx.init(params)
    ema0 = np.asarray(find_ema_params(state)["w"])

    grads = {"w": jnp.asarray([1.0])}
    updates, state = tx.update(grads, state, params)   # micro-step 1
    np.testing.assert_array_equal(
        np.asarray(find_ema_params(state)["w"]), ema0)  # unchanged
    params1 = optax.apply_updates(params, updates)
    _, state = tx.update(grads, state, params1)        # effective step
    ema1 = np.asarray(find_ema_params(state)["w"])
    assert not np.array_equal(ema1, ema0)


def test_find_ema_absent_returns_none():
    tx = make_optimizer(0.1)
    state = tx.init({"w": jnp.zeros(2)})
    assert find_ema_params(state) is None


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(2)(x)


def _batches(images, labels, bs=16):
    def train_batches(epoch):
        for i in range(0, len(images) - bs + 1, bs):
            yield {"image": images[i:i + bs], "label": labels[i:i + bs]}
    return train_batches


def test_trainer_ema_checkpoint_and_export(tmp_path):
    """Trainer with optim.ema_decay: the checkpoint carries the shadow,
    load_checkpoint_bundle(ema=True) returns it (distinct from the raw
    iterate, matching a hand EMA over the saved trajectory is overkill —
    we assert shadow != raw and shadow == find_ema_params of the live
    state), export --ema writes it."""
    from vit_spoof_detection_pda_tpu.train.trainer import Trainer
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager, load_checkpoint_bundle)

    rng = np.random.default_rng(0)
    images = rng.random((64, 16, 16, 3)).astype(np.float32)
    labels = (images.mean((1, 2, 3)) > 0.5).astype(np.int32)

    cfg = Config().with_overrides({
        "optim.num_epochs": 2,
        "optim.learning_rate": 5e-2,
        "optim.ema_decay": 0.9,
        "data.img_size": 16,
        "telemetry.jsonl_path": str(tmp_path / "m.jsonl"),
    })
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, _Tiny(),
                      train_batches=_batches(images, labels),
                      val_batches=lambda: iter(_batches(
                          images, labels)(0)),
                      steps_per_epoch=4, checkpoints=mgr)
    trainer.fit()
    live_ema = find_ema_params(trainer.state.opt_state)
    assert live_ema is not None
    # best-F1 saves may predate the final state: pin the final state at
    # an explicit step so the live-vs-restored comparison is exact
    assert mgr.save(999, trainer.state, metrics={})
    mgr.close()

    d = str(tmp_path / "ckpt")
    raw, step, _ = load_checkpoint_bundle(d, step=999)
    shadow, _, _ = load_checkpoint_bundle(d, step=999, ema=True)
    kernel_raw = np.asarray(raw["params"]["Dense_0"]["kernel"])
    kernel_ema = np.asarray(shadow["params"]["Dense_0"]["kernel"])
    assert not np.array_equal(kernel_raw, kernel_ema)
    np.testing.assert_allclose(
        kernel_ema, np.asarray(live_ema["Dense_0"]["kernel"]), rtol=1e-6)

    # a non-EMA checkpoint refuses ema=True with the documented error
    tx = make_optimizer(1e-2)
    plain = create_train_state(_Tiny(), tx, jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    mgr2 = CheckpointManager(str(tmp_path / "plain"))
    assert mgr2.save(1, plain, metrics={})
    mgr2.close()
    with pytest.raises(ValueError, match="no EMA state"):
        load_checkpoint_bundle(str(tmp_path / "plain"), ema=True)


def test_export_serving_deploys_ema_weights(tmp_path, caplog):
    """export-serving --ema freezes the shadow (scores differ from the
    raw-iterate artifact and match an artifact built from the ema
    bundle); --threshold optimal without --ema on an EMA-trained
    checkpoint warns about the weights/operating-point mismatch."""
    import logging

    import jax
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.cli.export_serving import main
    from vit_spoof_detection_pda_tpu.models.artifact import (
        load_serving_artifact)
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.train.trainer import Trainer
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    rng = np.random.default_rng(2)
    images = rng.random((32, 32, 32, 3)).astype(np.float32)
    labels = (images.mean((1, 2, 3)) > 0.5).astype(np.int32)

    cfg = Config().with_overrides({
        "optim.num_epochs": 1, "optim.learning_rate": 3e-3,
        "optim.ema_decay": 0.7,
        "data.img_size": 32,
        "model.fused_train_forward": False,
        "telemetry.jsonl_path": str(tmp_path / "m.jsonl"),
    })
    module = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=1,
                          num_heads=2, hidden=16)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, module,
                      train_batches=_batches(images, labels, bs=8),
                      val_batches=lambda: iter(_batches(
                          images, labels, bs=8)(0)),
                      steps_per_epoch=4, checkpoints=mgr)
    trainer.fit()
    mgr.close()

    geom = ["--set", "data.img_size=32", "--set", "model.embed_dim=64",
            "--set", "model.depth=1", "--set", "model.num_heads=2",
            "--set", "model.head_hidden=16"]
    main([str(tmp_path / "ckpt"), str(tmp_path / "raw_art"),
          "--batch-size", "4", *geom])
    with caplog.at_level(logging.WARNING):
        main([str(tmp_path / "ckpt"), str(tmp_path / "ema_art"),
              "--batch-size", "4", "--ema", "--threshold", "optimal",
              *geom])
    art_raw = load_serving_artifact(tmp_path / "raw_art")
    art_ema = load_serving_artifact(tmp_path / "ema_art")
    assert 0.3 <= art_ema.threshold <= 0.7

    batch = jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3),
                                     dtype=np.uint8))
    p_raw = np.asarray(art_raw(batch)["prob1"])
    p_ema = np.asarray(art_ema(batch)["prob1"])
    assert not np.allclose(p_raw, p_ema)           # different weights

    # and the mismatch warning fires when optimal is deployed WITHOUT
    # the weights it was validated on
    with caplog.at_level(logging.WARNING):
        caplog.clear()
        main([str(tmp_path / "ckpt"), str(tmp_path / "warn_art"),
              "--batch-size", "4", "--threshold", "optimal", *geom])
    assert any("EMA shadow" in r.message for r in caplog.records)


def test_validate_uses_ema_weights(tmp_path):
    """validate() scores with the shadow when EMA is on: zero out the
    RAW params — metrics must not change (shadow still the trained one);
    a non-EMA trainer collapses to the degenerate 0.5-score output."""
    from vit_spoof_detection_pda_tpu.train.trainer import Trainer

    rng = np.random.default_rng(1)
    images = rng.random((64, 16, 16, 3)).astype(np.float32)
    labels = (images.mean((1, 2, 3)) > 0.5).astype(np.int32)

    cfg = Config().with_overrides({
        "optim.num_epochs": 1,
        "optim.learning_rate": 5e-2,
        "optim.ema_decay": 0.5,
        "data.img_size": 16,
        "telemetry.jsonl_path": str(tmp_path / "m.jsonl"),
    })
    trainer = Trainer(cfg, _Tiny(),
                      train_batches=_batches(images, labels),
                      val_batches=lambda: iter(_batches(
                          images, labels)(0)),
                      steps_per_epoch=4)
    trainer.train_epoch(0)
    before = trainer.validate()
    zeroed = jax.tree.map(jnp.zeros_like, trainer.state.params)
    trainer.state = trainer.state.replace(params=zeroed)
    after = trainer.validate()
    assert after["auc"] == pytest.approx(before["auc"])
    assert after["loss"] == pytest.approx(before["loss"], rel=1e-5)


def test_variables_from_orbax_ema(tmp_path):
    """The eval surfaces' orbax loader hands back the shadow with
    ema=True (and the raw iterate without), so test/evaluate-all --ema
    score the weights that would deploy."""
    from vit_spoof_detection_pda_tpu.models.registry import (
        variables_from_orbax)
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    tx = make_optimizer(5e-2, ema_decay=0.9)
    state = create_train_state(_Tiny(), tx, jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    batch = {"image": jnp.ones((4, 16, 16, 3), jnp.float32),
             "label": jnp.array([0, 1, 0, 1], jnp.int32)}
    from vit_spoof_detection_pda_tpu.ops import losses
    from vit_spoof_detection_pda_tpu.train.step import make_train_step
    step_fn = make_train_step(losses.make_loss_fn("ce"),
                              has_batch_stats=False)
    for _ in range(3):
        state, _ = step_fn(state, batch)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    assert mgr.save(3, state, metrics={})
    mgr.close()

    module = _Tiny()
    raw, step = variables_from_orbax(module, str(tmp_path / "ck"),
                                     img_size=16)
    shadow, _ = variables_from_orbax(module, str(tmp_path / "ck"),
                                     ema=True, img_size=16)
    assert step == 3
    k_raw = np.asarray(jax.tree.leaves(raw["params"])[0])
    k_ema = np.asarray(jax.tree.leaves(shadow["params"])[0])
    assert not np.array_equal(k_raw, k_ema)
    live = find_ema_params(state.opt_state)
    np.testing.assert_allclose(
        k_ema, np.asarray(jax.tree.leaves(live)[0]), rtol=1e-6)
