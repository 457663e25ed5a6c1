"""Training engine: schedule parity, compiled steps over an 8-device mesh,
checkpoint/resume, early stopping, end-to-end Trainer on synthetic data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.parallel import make_mesh, shard_batch
from vit_spoof_detection_pda_tpu.train import (
    EarlyStopping, Trainer, create_train_state, make_eval_step,
    make_lr_schedule, make_optimizer, make_train_step)


class TinyNet(nn.Module):
    """Small conv+dense classifier for fast train tests."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Dense(2)(x)


def _synthetic(n=256, size=16, seed=0):
    """Linearly separable images: class decided by mean brightness."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    base = rng.random((n, size, size, 3)).astype(np.float32)
    images = base + labels[:, None, None, None] * 0.8
    return images, labels.astype(np.int32)


def test_schedule_matches_torch_cosine():
    torch = pytest.importorskip("torch")
    base_lr, total, warmup = 3e-4, 100, 10
    sched = make_lr_schedule(base_lr, total, warmup, min_lr=1e-6)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=total - warmup, eta_min=1e-6)
    for step in range(total):
        want = tsched.get_last_lr()[0]
        got = float(sched(step))
        assert got == pytest.approx(want, rel=1e-5), step
        opt.step()
        tsched.step()


def test_true_warmup_ramp():
    sched = make_lr_schedule(1e-3, 100, 10, min_lr=0.0, true_warmup=True)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(5e-4)
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)


def test_train_step_learns_on_mesh():
    mesh = make_mesh()   # 8 virtual CPU devices on the data axis
    assert mesh.devices.size == 8
    module = TinyNet()
    tx = make_optimizer(1e-2, weight_decay=0.0)
    state = create_train_state(module, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    step_fn = make_train_step(
        losses.make_loss_fn("focal"), mesh=mesh)

    images, labels = _synthetic(256)
    first = last = None
    for i in range(30):
        batch = shard_batch({"image": images, "label": labels}, mesh)
        state, metrics = step_fn(state, batch)
        if i == 0:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < first * 0.5, (first, last)
    assert int(state.step) == 30


def test_eval_step_scores():
    mesh = make_mesh()
    module = TinyNet()
    tx = make_optimizer(1e-2)
    state = create_train_state(module, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    eval_fn = make_eval_step(module.apply, mesh=mesh)
    images, _ = _synthetic(64)
    out = eval_fn(state.params, None, jnp.asarray(images))
    assert out["score"].shape == (64,)
    s = np.asarray(out["score"])
    assert np.all((s >= 0) & (s <= 1))


def test_checkpoint_roundtrip(tmp_path):
    from vit_spoof_detection_pda_tpu.utils.checkpoint import CheckpointManager
    module = TinyNet()
    tx = make_optimizer(1e-2)
    state = create_train_state(module, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    step_fn = make_train_step(losses.make_loss_fn("ce"), donate=False)
    images, labels = _synthetic(64)
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}
    for _ in range(3):
        state, _ = step_fn(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), best_metric="val_f1")
    assert mgr.save(int(state.step), state,
                    metrics={"val_f1": 0.9}, config={"a": 1})

    fresh = create_train_state(module, tx, jax.random.PRNGKey(1),
                               input_shape=(1, 16, 16, 3))
    restored = mgr.restore(fresh)
    assert int(restored.step) == 3
    jax.tree.map(np.testing.assert_array_equal, restored.params, state.params)
    jax.tree.map(np.testing.assert_array_equal,
                 restored.opt_state, state.opt_state)
    assert mgr.restore_metrics()["val_f1"] == 0.9

    # resumed training continues deterministically vs uninterrupted run
    s_cont, _ = step_fn(state, batch)
    s_rest, _ = step_fn(restored, batch)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        s_cont.params, s_rest.params)
    mgr.close()


def test_early_stopping():
    es = EarlyStopping(patience=2, min_delta=0.01, mode="max")
    assert not es.update(0.5)
    assert not es.update(0.6)       # improvement
    assert not es.update(0.605)     # < min_delta, counter 1
    assert es.update(0.60)          # counter 2 -> stop
    assert es.should_stop


def test_trainer_end_to_end(tmp_path):
    images, labels = _synthetic(256, seed=1)
    val_images, val_labels = _synthetic(128, seed=2)
    bs = 32

    def train_batches(epoch):
        rng = np.random.default_rng(epoch)
        idx = rng.permutation(len(images))
        for i in range(0, len(images) - bs + 1, bs):
            j = idx[i:i + bs]
            yield {"image": images[j], "label": labels[j]}

    def val_batches():
        for i in range(0, len(val_images), bs):
            yield {"image": val_images[i:i + bs],
                   "label": val_labels[i:i + bs]}

    cfg = Config().with_overrides({
        "optim.num_epochs": 3,
        "optim.learning_rate": 1e-2,
        "data.img_size": 16,
        "telemetry.log_interval": 100,
        "telemetry.jsonl_path": str(tmp_path / "metrics.jsonl"),
    })
    from vit_spoof_detection_pda_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, TinyNet(),
                      train_batches=train_batches, val_batches=val_batches,
                      steps_per_epoch=len(images) // bs,
                      checkpoints=mgr)
    best = trainer.fit()
    assert best["val_f1"] > 0.8, best
    assert mgr.latest_step() is not None
    # metric stream written
    assert (tmp_path / "metrics.jsonl").read_text().count("\n") >= 3
    mgr.close()

    # the checkpoint carries the validated operating point (consumed by
    # export-serving/serve --threshold optimal)
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        load_checkpoint_bundle)
    _vars, _step, metrics = load_checkpoint_bundle(str(tmp_path / "ckpt"))
    t = cfg.threshold
    assert t.t_min <= metrics["optimal_threshold"] <= t.t_max
    assert 0.0 <= metrics["optimal_f1"] <= 1.0
    assert 0.0 <= metrics["auc"] <= 1.0


def test_sweep_driver_runs():
    from vit_spoof_detection_pda_tpu.train.sweep import run_sweep

    calls = []

    def fake_train(cfg):
        calls.append(cfg)
        # score peaks at lr ~2e-4
        import math
        return {"optimal_f1": 1.0 - abs(
            math.log10(cfg.optim.learning_rate / 2e-4))}

    results = run_sweep(Config(), fake_train, count=6, seed=0)
    assert len(results) == 6
    assert results[0].metric == max(r.metric for r in results)
    # exploit phase samples near the best explore result
    assert 5e-5 <= results[0].overrides["optim.learning_rate"] <= 5e-4


def test_validate_emits_reference_wandb_key_set(tmp_path):
    """validate() must produce the reference's FULL per-phase W&B block
    (train_advanced.py:411-427), the complete optimal-threshold block
    (:449-462), and stream the threshold_sweep/* series (:267-275)."""
    import json

    images, labels = _synthetic(64, seed=3)

    def val_batches():
        for i in range(0, 64, 32):
            yield {"image": images[i:i + 32], "label": labels[i:i + 32]}

    cfg = Config().with_overrides({
        "data.img_size": 16,
        "telemetry.jsonl_path": str(tmp_path / "m.jsonl"),
    })
    trainer = Trainer(cfg, TinyNet(),
                      train_batches=lambda e: iter(()),
                      val_batches=val_batches, steps_per_epoch=1)
    out = trainer.validate(epoch=0)

    base_block = {  # wandb.log block, train_advanced.py:411-427
        "loss", "accuracy", "precision", "recall", "f1", "auc",
        "specificity", "npv", "tp", "tn", "fp", "fn", "far", "frr",
        "epoch"}
    optimal_block = {  # train_advanced.py:449-462
        "optimal_threshold", "optimal_accuracy", "optimal_precision",
        "optimal_recall", "optimal_f1", "optimal_specificity",
        "optimal_far", "optimal_frr", "optimal_tp", "optimal_tn",
        "optimal_fp", "optimal_fn"}
    assert set(out) == base_block | optimal_block, (
        sorted(base_block | optimal_block - set(out)))
    assert all(np.isfinite(v) for v in out.values())

    # threshold sweep streamed with the reference's key names (:269-275)
    sweep_keys = {"threshold_sweep/threshold", "threshold_sweep/accuracy",
                  "threshold_sweep/precision", "threshold_sweep/recall",
                  "threshold_sweep/f1"}
    rows = [json.loads(l) for l in
            (tmp_path / "m.jsonl").read_text().splitlines()]
    sweep_rows = [r for r in rows if sweep_keys <= set(r)]
    assert len(sweep_rows) == cfg.threshold.steps


def test_bayes_sweep_beats_random_on_smooth_objective():
    """The GP-EI searcher must find a better optimum than pure random
    sampling with the same budget on a smooth objective (the reference's
    wandb sweep is method: bayes, train_advanced.py:699)."""
    from vit_spoof_detection_pda_tpu.train.sweep import run_sweep

    def objective(cfg):
        # peak at lr=2e-4, wd=0.03; categorical bonus for focal
        lr = math.log(cfg.optim.learning_rate / 2e-4)
        wd = math.log(cfg.optim.weight_decay / 0.03)
        bonus = 0.1 if cfg.loss.loss_type == "focal" else 0.0
        return {"optimal_f1": float(-(lr ** 2) - (wd ** 2) + bonus)}

    import math
    base = Config()
    bayes = run_sweep(base, objective, count=16, seed=7, method="bayes",
                      n_init=4)
    rand = run_sweep(base, objective, count=16, seed=7,
                     method="random_exploit", explore_fraction=1.0)
    assert bayes[0].metric >= rand[0].metric
    assert len(bayes) == 16
    assert bayes == sorted(bayes, key=lambda r: r.metric, reverse=True)


def test_sweep_encoding_handles_categoricals():
    from vit_spoof_detection_pda_tpu.train.sweep import (DEFAULT_SPACE,
                                                         _encode)
    o = {"optim.learning_rate": 1e-4, "data.batch_size": 128,
         "optim.weight_decay": 0.05, "model.dropout": 0.1,
         "loss.loss_type": "weighted_ce", "loss.focal_alpha": 0.25,
         "loss.focal_gamma": 2.0}
    x = _encode(DEFAULT_SPACE, o)
    # 5 scalar dims + one-hot(2) for loss_type
    assert x.shape == (8,)
    assert set(x[np.isin(x, [0.0, 1.0])]) <= {0.0, 1.0}
    assert np.all((x >= 0) & (x <= 1))


def test_trainer_unknown_group_tag_raises(tmp_path):
    """A batch tagged with a group absent from batch_prep must fail
    loudly, not silently train through another group's augmentation."""
    images, labels = _synthetic(64, seed=4)
    cfg = Config().with_overrides({
        "data.img_size": 16, "optim.num_epochs": 1,
        "telemetry.jsonl_path": str(tmp_path / "m.jsonl"),
    })

    def train_batches(epoch):
        yield {"image": images[:32], "label": labels[:32],
               "group": "mystery"}

    trainer = Trainer(cfg, TinyNet(), train_batches=train_batches,
                      val_batches=lambda: iter(()), steps_per_epoch=1,
                      batch_prep={"orig": None})
    with pytest.raises(KeyError, match="mystery"):
        trainer.train_epoch(0)


def test_checkpoint_overwrite_and_non_monotonic_saves(tmp_path):
    """A fresh run into a used save_dir must neither crash on an
    existing step nor be silently skipped by orbax's monotonic-step
    policy (with a delete first, a skipped save would be data LOSS)."""
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager, load_checkpoint_bundle)
    module = TinyNet()
    tx = make_optimizer(1e-2)
    old = create_train_state(module, tx, jax.random.PRNGKey(0),
                             input_shape=(1, 16, 16, 3))
    d = str(tmp_path / "ckpt")
    mgr = CheckpointManager(d)
    assert mgr.save(5, old, metrics={"val_f1": 0.1, "epoch": 0})
    assert mgr.save(9, old, metrics={"val_f1": 0.2, "epoch": 1})
    mgr.close()

    # "fresh run" into the same dir: lower step, both the existing-step
    # and the between-steps case must actually WRITE
    new = create_train_state(module, tx, jax.random.PRNGKey(7),
                             input_shape=(1, 16, 16, 3))
    mgr2 = CheckpointManager(d)
    assert mgr2.save(5, new, metrics={"val_f1": 0.9, "epoch": 0})
    assert mgr2.save(7, new, metrics={"val_f1": 0.8, "epoch": 1})
    mgr2.close()

    variables, step, metrics = load_checkpoint_bundle(d, step=5)
    assert metrics["val_f1"] == 0.9 and step == 5
    jax.tree.map(np.testing.assert_array_equal, variables["params"],
                 new.params)
    _, step7, m7 = load_checkpoint_bundle(d, step=7)
    assert step7 == 7 and m7["val_f1"] == 0.8


def test_checkpoint_stale_purge_vs_branch_resume(tmp_path):
    """A save below EVERY existing step (unambiguous fresh run) purges
    the previous run's later checkpoints so latest-step loads can't
    serve stale weights; a save merely below the latest (branch resume
    from an earlier/best step) keeps them (ADVICE r2 + review
    finding)."""
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager, load_checkpoint_bundle)
    module = TinyNet()
    tx = make_optimizer(1e-2)
    s = create_train_state(module, tx, jax.random.PRNGKey(0),
                           input_shape=(1, 16, 16, 3))

    # branch resume: steps {5, 9} exist, new save at 7 -> 9 survives
    d1 = str(tmp_path / "branch")
    mgr = CheckpointManager(d1)
    mgr.save(5, s, metrics={"val_f1": 0.5})
    mgr.save(9, s, metrics={"val_f1": 0.9})
    mgr.save(7, s, metrics={"val_f1": 0.7})
    assert sorted(mgr._mgr.all_steps()) == [5, 7, 9]   # 9 survives
    mgr.close()

    # fresh run: steps {5, 9} exist, new run saves at 2 -> both purged
    d2 = str(tmp_path / "fresh")
    mgr = CheckpointManager(d2)
    mgr.save(5, s, metrics={"val_f1": 0.5})
    mgr.save(9, s, metrics={"val_f1": 0.9})
    mgr.close()
    fresh = create_train_state(module, tx, jax.random.PRNGKey(3),
                               input_shape=(1, 16, 16, 3))
    mgr2 = CheckpointManager(d2)
    mgr2.save(2, fresh, metrics={"val_f1": 0.2})
    assert mgr2._mgr.all_steps() == [2]
    mgr2.close()
    variables, step, metrics = load_checkpoint_bundle(d2)
    assert step == 2 and metrics["val_f1"] == 0.2
    jax.tree.map(np.testing.assert_array_equal, variables["params"],
                 fresh.params)


def test_checkpoint_async_save_roundtrip(tmp_path):
    """async_save=True must not change on-disk semantics: saves return
    immediately, training continues on mutated state, and every read
    path (latest/best/restore/metrics) drains the pending write first."""
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager, load_checkpoint_bundle)

    module = TinyNet()
    tx = make_optimizer(1e-2)
    state = create_train_state(module, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    step_fn = make_train_step(losses.make_loss_fn("ce"), donate=False)
    images, labels = _synthetic(64)
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}
    state, _ = step_fn(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    assert mgr.save(int(state.step), state, metrics={"val_f1": 0.5})
    saved_params = jax.tree.map(np.asarray, state.params)
    # keep training while the write is (possibly) still in flight
    for _ in range(4):
        state, _ = step_fn(state, batch)
    assert mgr.save(int(state.step), state, metrics={"val_f1": 0.7})

    assert mgr.latest_step() == 5          # drains the pending write
    assert mgr.best_step() == 5
    fresh = create_train_state(module, tx, jax.random.PRNGKey(1),
                               input_shape=(1, 16, 16, 3))
    restored = mgr.restore(fresh, step=1)
    # the step-1 checkpoint must hold the state AT save time, not the
    # mutated tree the loop kept training on
    jax.tree.map(np.testing.assert_array_equal,
                 restored.params, saved_params)
    assert mgr.restore_metrics(5)["val_f1"] == 0.7
    mgr.close()

    variables, step, metrics = load_checkpoint_bundle(str(tmp_path / "ckpt"))
    assert step == 5 and metrics["val_f1"] == 0.7


def test_checkpoint_async_overwrite_drains_pending(tmp_path):
    """The fresh-run/overwrite path deletes existing steps — with a
    pending async write it must drain first instead of racing it."""
    from vit_spoof_detection_pda_tpu.utils.checkpoint import CheckpointManager

    module = TinyNet()
    tx = make_optimizer(1e-2)
    state = create_train_state(module, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    assert mgr.save(3, state, metrics={"val_f1": 0.3})
    # immediate same-step overwrite while the first write may be in flight
    assert mgr.save(3, state, metrics={"val_f1": 0.4})
    assert mgr.restore_metrics(3)["val_f1"] == 0.4
    mgr.close()


def test_lr_horizon_counts_updates_not_microsteps(tmp_path):
    """optax.MultiSteps advances the inner adamw schedule once per
    ACCUMULATED update — the cosine horizon must be sized in updates or
    it never completes (review finding: accum=4 left the run at
    ~cos(pi/4) of base lr)."""
    cfg = Config().with_overrides({
        "optim.num_epochs": 2,
        "optim.warmup_epochs": 0,   # t_max = total - warmup (ref quirk)
        "optim.gradient_accumulation_steps": 4,
        "optim.min_lr": 1e-6,
        "data.img_size": 16,
    })
    trainer = Trainer(cfg, TinyNet(),
                      train_batches=lambda e: iter(()),
                      val_batches=lambda: iter(()),
                      steps_per_epoch=8)
    assert trainer._accum == 4
    # horizon = 8 * 2 / 4 = 4 updates; the reference-style cosine hits
    # min_lr exactly at the horizon
    assert float(trainer.lr_schedule(4)) == pytest.approx(1e-6)
    assert float(trainer.lr_schedule(2)) == pytest.approx(
        1e-6 + (cfg.optim.learning_rate - 1e-6) / 2)


def test_sweep_missing_metric_raises():
    """A misnamed sweep metric must fail loudly, not silently rank N
    full training runs at -inf."""
    from vit_spoof_detection_pda_tpu.train.sweep import run_sweep

    with pytest.raises(KeyError, match="optimal_f1"):
        run_sweep(Config(), lambda cfg: {"val_f1": 0.5}, count=2, seed=0)


def test_wandb_space_derived_from_default():
    """The wandb sweep searches exactly DEFAULT_SPACE (module docstring
    promise) — derived, not restated."""
    from vit_spoof_detection_pda_tpu.train.sweep import (
        DEFAULT_SPACE, _wandb_parameters)

    params = _wandb_parameters(DEFAULT_SPACE)
    assert set(params) == {p.split(".")[-1] for p in DEFAULT_SPACE}
    assert params["learning_rate"] == {
        "distribution": "log_uniform_values", "min": 5e-5, "max": 5e-4}
    assert params["batch_size"] == {"values": [96, 128, 160]}


def test_preemption_checkpoints_and_exits(tmp_path):
    """request_preemption() (the SIGTERM handler's body) makes fit()
    checkpoint at the next safe point and return early with the
    preempted flag; the checkpoint restores into a fresh trainer."""
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    images, labels = _synthetic(128, seed=5)
    bs = 32

    def train_batches(epoch):
        for i in range(0, len(images), bs):
            yield {"image": images[i:i + bs], "label": labels[i:i + bs]}

    def val_batches():
        yield {"image": images[:bs], "label": labels[:bs]}

    cfg = Config().with_overrides({
        "optim.num_epochs": 50,          # would run long uninterrupted
        "data.img_size": 16,
        "telemetry.log_interval": 100,
    })

    class PreemptingLogger:
        """Fires the preemption request from inside the run — the
        deterministic stand-in for SIGTERM arriving mid-training."""

        def __init__(self, trainer_ref):
            self.trainer_ref = trainer_ref

        def log(self, record, step=None):
            if "val/f1" in record or any(k.startswith("val/")
                                         for k in record):
                self.trainer_ref[0].request_preemption()

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    ref = []
    trainer = Trainer(cfg, TinyNet(),
                      train_batches=train_batches,
                      val_batches=val_batches,
                      steps_per_epoch=len(images) // bs,
                      checkpoints=mgr,
                      logger=PreemptingLogger(ref))
    ref.append(trainer)
    best = trainer.fit()
    assert best.get("preempted") is True
    assert best["epoch"] <= 1               # stopped almost immediately
    step = mgr.latest_step()
    assert step is not None and step >= 1
    # the preemption checkpoint restores into a fresh trainer
    trainer2 = Trainer(cfg, TinyNet(),
                       train_batches=train_batches,
                       val_batches=val_batches,
                       steps_per_epoch=len(images) // bs)
    restored = mgr.restore(trainer2.state)
    assert int(restored.step) == step
    mgr.close()


def test_preemption_signal_handler_installed_and_restored(tmp_path):
    """fit() swaps in a SIGTERM handler only for its own duration and
    only when a checkpoint manager is configured."""
    import signal as _signal

    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    images, labels = _synthetic(32, seed=6)

    def train_batches(epoch):
        yield {"image": images, "label": labels}

    def val_batches():
        yield {"image": images, "label": labels}

    cfg = Config().with_overrides({
        "optim.num_epochs": 1,
        "data.img_size": 16,
        "telemetry.log_interval": 100,
    })
    seen = {}

    class SpyLogger:
        def log(self, record, step=None):
            # observe the handler DURING fit
            seen.setdefault("handler",
                            _signal.getsignal(_signal.SIGTERM))

    before = _signal.getsignal(_signal.SIGTERM)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, TinyNet(),
                      train_batches=train_batches,
                      val_batches=val_batches,
                      steps_per_epoch=1, checkpoints=mgr,
                      logger=SpyLogger())
    trainer.fit()
    mgr.close()
    assert _signal.getsignal(_signal.SIGTERM) == before   # restored
    assert seen["handler"] != before                      # was swapped
    # the installed handler routes to request_preemption
    seen["handler"](None, None)
    assert trainer._preempt.is_set()


def test_preemption_flag_clears_between_fits(tmp_path):
    """A stale preemption request (cancelled eviction) must not make the
    next fit() exit at batch 0 untrained — fit clears the flag at
    entry."""
    images, labels = _synthetic(64, seed=7)

    def train_batches(epoch):
        yield {"image": images[:32], "label": labels[:32]}

    def val_batches():
        yield {"image": images[32:], "label": labels[32:]}

    cfg = Config().with_overrides({
        "optim.num_epochs": 1,
        "data.img_size": 16,
        "telemetry.log_interval": 100,
    })
    trainer = Trainer(cfg, TinyNet(),
                      train_batches=train_batches,
                      val_batches=val_batches, steps_per_epoch=1)
    trainer.request_preemption()          # stale flag from a false alarm
    best = trainer.fit()
    assert "preempted" not in best        # trained normally
    assert int(trainer.state.step) == 1
