"""Config -> parallelism wiring.

``ShardingConfig`` must actually drive the Trainer: mesh construction
(``parallel.mesh_from_config``), the TP/FSDP parameter layouts, and the
SP mesh — all reachable from a plain ``Config`` with no library-level
mesh plumbing by the caller (the reference is single-device,
train_advanced.py:85; the mesh is this framework's new capability,
SURVEY.md §2.7).
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.parallel import mesh_from_config
from vit_spoof_detection_pda_tpu.train import Trainer


def _tiny_vit():
    return ViTAntiSpoof(patch_size=8, embed_dim=64, depth=2, num_heads=2,
                        hidden=32)


def _synthetic(n=64, size=16, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    images = (rng.random((n, size, size, 3)).astype(np.float32)
              + labels[:, None, None, None] * 0.8)
    return images, labels.astype(np.int32)


def _sharding(overrides):
    return Config().with_overrides(
        {f"sharding.{k}": v for k, v in overrides.items()}).sharding


def test_mesh_from_config_shapes():
    m = mesh_from_config(_sharding({}))
    assert m.devices.shape == (8, 1)
    assert m.axis_names == ("data", "model")

    m = mesh_from_config(_sharding({"model_parallel": 2}))
    assert m.devices.shape == (4, 2)

    m = mesh_from_config(_sharding({"data_parallel": 2,
                                    "model_parallel": 4}))
    assert m.devices.shape == (2, 4)

    m = mesh_from_config(_sharding({"seq_parallel": 4}))
    assert m.axis_names == ("data", "seq")
    assert m.devices.shape == (2, 4)

    m = mesh_from_config(_sharding({"pipeline_parallel": 2}))
    assert m.axis_names == ("data", "pipe")
    assert m.devices.shape == (4, 2)

    m = mesh_from_config(_sharding({"pipeline_parallel": 2,
                                    "model_parallel": 2}))
    assert m.axis_names == ("data", "pipe", "model")
    assert m.devices.shape == (2, 2, 2)


def test_mesh_from_config_rejects_bad_layouts():
    with pytest.raises(ValueError, match="mutually exclusive"):
        mesh_from_config(_sharding({"model_parallel": 2,
                                    "seq_parallel": 2}))
    with pytest.raises(ValueError):
        mesh_from_config(_sharding({"data_parallel": 3,
                                    "model_parallel": 2}))
    with pytest.raises(ValueError):
        mesh_from_config(_sharding({"seq_parallel": 3}))
    # fsdp composes with pure DP only — silently dropping it would fake
    # its optimizer-memory saving
    with pytest.raises(ValueError, match="fsdp"):
        mesh_from_config(_sharding({"model_parallel": 2, "fsdp": True}))
    with pytest.raises(ValueError, match="fsdp"):
        mesh_from_config(_sharding({"seq_parallel": 2, "fsdp": True}))
    with pytest.raises(ValueError, match="exclusive"):
        mesh_from_config(_sharding({"seq_parallel": 2,
                                    "pipeline_parallel": 2}))
    with pytest.raises(ValueError, match="fsdp"):
        mesh_from_config(_sharding({"pipeline_parallel": 2, "fsdp": True}))


def test_trainer_rejects_fsdp_on_explicit_tp_mesh():
    from vit_spoof_detection_pda_tpu.parallel import make_mesh

    cfg = Config().with_overrides({"data.img_size": 16,
                                   "sharding.fsdp": True})
    with pytest.raises(ValueError, match="fsdp"):
        Trainer(cfg, _tiny_vit(),
                train_batches=lambda e: iter(()),
                val_batches=lambda: iter(()),
                steps_per_epoch=1, mesh=make_mesh(data=4, model=2))


def _fit_with(sharding_overrides, tmp_path, seed=0):
    images, labels = _synthetic(64, seed=seed)
    bs = 32

    def train_batches(epoch):
        for i in range(0, len(images), bs):
            yield {"image": images[i:i + bs], "label": labels[i:i + bs]}

    def val_batches():
        yield {"image": images[:bs], "label": labels[:bs]}

    cfg = Config().with_overrides({
        "optim.num_epochs": 2,
        "optim.learning_rate": 1e-2,
        "data.img_size": 16,
        "telemetry.log_interval": 100,
        **{f"sharding.{k}": v for k, v in sharding_overrides.items()},
    })
    trainer = Trainer(cfg, _tiny_vit(),
                      train_batches=train_batches, val_batches=val_batches,
                      steps_per_epoch=len(images) // bs)
    best = trainer.fit()
    return trainer, best


def test_trainer_builds_tp_mesh_and_layout_from_config(tmp_path):
    trainer, best = _fit_with({"model_parallel": 2}, tmp_path)
    assert trainer.mesh.devices.shape == (4, 2)
    qkv = trainer.state.params["vit"]["block0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")
    # the Adam moments inherit the layout (tx.init ran on the laid-out tree)
    mus = [x for x in jax.tree.leaves(trainer.state.opt_state)
           if hasattr(x, "sharding") and x.shape == qkv.shape]
    assert mus and all(m.sharding.spec == P(None, "model") for m in mus)
    assert np.isfinite(best["val_f1"])


def test_trainer_builds_fsdp_layout_from_config(tmp_path):
    trainer, best = _fit_with({"fsdp": True, "fsdp_min_size": 1024},
                              tmp_path)
    assert trainer.mesh.devices.shape == (8, 1)
    fc1 = trainer.state.params["vit"]["block0"]["mlp"]["fc1"]["kernel"]
    assert not fc1.sharding.is_fully_replicated
    assert np.isfinite(best["val_f1"])


def test_trainer_builds_sp_mesh_from_config(tmp_path):
    trainer, best = _fit_with({"seq_parallel": 2}, tmp_path)
    assert trainer.mesh.axis_names == ("data", "seq")
    assert trainer.mesh.devices.shape == (4, 2)
    assert np.isfinite(best["val_f1"])


def test_trainer_builds_pp_mesh_from_config(tmp_path):
    """pipeline_parallel=2 from the config tree alone: the Trainer
    builds the (data, pipe) mesh, lays the params out in the PACKED
    pipeline layout (blocks stacked, layer dim sharded over pipe — so
    each stage owns 1/pipe of the encoder and its Adam moments), and
    the train forward routes through the GPipe schedule."""
    trainer, best = _fit_with({"pipeline_parallel": 2}, tmp_path)
    assert trainer.mesh.axis_names == ("data", "pipe")
    assert trainer.mesh.devices.shape == (4, 2)
    assert trainer.state.apply_fn is not trainer.module.apply
    vit = trainer.state.params["vit"]
    assert "blocks" in vit and "block0" not in vit
    qkv = vit["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P("pipe")
    # the Adam moments are born in the packed pipe-sharded layout
    mus = [x for x in jax.tree.leaves(trainer.state.opt_state)
           if hasattr(x, "sharding") and x.shape == qkv.shape]
    assert mus and all(m.sharding.spec == P("pipe") for m in mus)
    assert np.isfinite(best["val_f1"])


def test_trainer_builds_tp_pp_mesh_from_config(tmp_path):
    """pipeline_parallel + model_parallel: the 3-axis DPxTPxPP mesh with
    Megatron TP inside each pipeline stage — the packed blocks shard
    layer-dim over pipe AND trailing dims over model."""
    trainer, best = _fit_with({"pipeline_parallel": 2,
                               "model_parallel": 2}, tmp_path)
    assert trainer.mesh.axis_names == ("data", "pipe", "model")
    assert trainer.mesh.devices.shape == (2, 2, 2)
    qkv = trainer.state.params["vit"]["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P("pipe", None, "model")
    assert np.isfinite(best["val_f1"])


def test_pp_trained_params_unpack_to_module_layout(tmp_path):
    """A PP-trained state exports through unpack_pipeline_params: the
    plain module forward on the unpacked tree matches the trainer's own
    eval step (export / torch-interop path for pipeline checkpoints)."""
    from vit_spoof_detection_pda_tpu.parallel import unpack_pipeline_params

    trainer, _ = _fit_with({"pipeline_parallel": 2}, tmp_path)
    images, _ = _synthetic(8)
    plain = unpack_pipeline_params({"params": trainer.state.params})
    assert "block0" in plain["params"]["vit"]
    logits = trainer.module.apply(plain, images)
    out = trainer.eval_step(trainer.state.params, None, images)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(out["logits"]), atol=1e-5)

    # the checkpoint read-for-inference path unpacks too: a PP
    # checkpoint is consumable by the eval/export CLIs unchanged
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager, load_params_from_dir)
    ckpts = CheckpointManager(str(tmp_path / "pp_ckpt"))
    ckpts.save(1, trainer.state, force=True)
    ckpts.close()
    variables, _step = load_params_from_dir(str(tmp_path / "pp_ckpt"))
    assert "block0" in variables["params"]["vit"]
    logits2 = trainer.module.apply(variables, images)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits),
                               atol=1e-6)


def test_pp_checkpoint_resume_roundtrip(tmp_path):
    """Full-state resume under PP: the packed checkpoint restores into a
    fresh PP trainer's packed template (params AND Adam moments, driver
    resume pattern train/driver.py:221-237) and training continues."""
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    images, labels = _synthetic(64)
    bs = 32

    def train_batches(epoch):
        for i in range(0, len(images), bs):
            yield {"image": images[i:i + bs], "label": labels[i:i + bs]}

    def val_batches():
        yield {"image": images[:bs], "label": labels[:bs]}

    cfg = Config().with_overrides({
        "optim.num_epochs": 2, "data.img_size": 16,
        "sharding.pipeline_parallel": 2,
        "checkpoint.save_dir": str(tmp_path / "ck"),
    })

    def make_trainer():
        return Trainer(cfg, _tiny_vit(), train_batches=train_batches,
                       val_batches=val_batches,
                       steps_per_epoch=len(images) // bs)

    t1 = make_trainer()
    t1.fit()
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(int(t1.state.step), t1.state, force=True)

    t2 = make_trainer()
    t2.state = mgr.restore(t2.state)
    mgr.close()
    assert int(t2.state.step) == int(t1.state.step)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), t1.state.params, t2.state.params)
    best = t2.fit(start_epoch=1)          # continues the horizon
    assert np.isfinite(best["val_f1"])


def test_pp_composes_with_fused_batch_prep(tmp_path):
    """On-device augmentation fused into the compiled step (batch_prep,
    the online-training mechanism) composes with the PP schedule."""
    calls = {"n": 0}

    def prep(rng, imgs):
        calls["n"] += 1          # trace-time marker
        noise = 0.01 * jax.random.normal(rng, imgs.shape, imgs.dtype)
        return imgs + noise

    images, labels = _synthetic(64)
    bs = 32
    cfg = Config().with_overrides({
        "optim.num_epochs": 1, "data.img_size": 16,
        "sharding.pipeline_parallel": 2,
    })
    trainer = Trainer(
        cfg, _tiny_vit(),
        train_batches=lambda e: iter(
            {"image": images[i:i + bs], "label": labels[i:i + bs]}
            for i in range(0, len(images), bs)),
        val_batches=lambda: iter(
            [{"image": images[:bs], "label": labels[:bs]}]),
        steps_per_epoch=len(images) // bs,
        batch_prep=prep)
    best = trainer.fit()
    assert calls["n"] >= 1
    assert np.isfinite(best["val_f1"])


def test_trainer_pp_rejects_non_vit(tmp_path):
    from vit_spoof_detection_pda_tpu.models.resnet import ResNet50

    cfg = Config().with_overrides({"data.img_size": 16,
                                   "sharding.pipeline_parallel": 2})
    with pytest.raises(ValueError, match="pipeline_parallel"):
        Trainer(cfg, ResNet50(num_classes=2),
                train_batches=lambda e: iter(()),
                val_batches=lambda: iter(()),
                steps_per_epoch=1)


@pytest.mark.slow
def test_layouts_agree_on_first_val_metrics(tmp_path):
    """The same config trained under DP / TP / FSDP / PP layouts must
    land in the same place (layout is an execution detail, not a model
    change)."""
    results = {}
    for name, ov in [("dp", {}), ("tp", {"model_parallel": 2}),
                     ("fsdp", {"fsdp": True, "fsdp_min_size": 1024}),
                     ("pp", {"pipeline_parallel": 2}),
                     ("tp_pp", {"pipeline_parallel": 2,
                                "model_parallel": 2})]:
        _, best = _fit_with(ov, tmp_path, seed=1)
        results[name] = best["val_f1"]
    base = results["dp"]
    for name, v in results.items():
        assert v == pytest.approx(base, abs=0.05), results
