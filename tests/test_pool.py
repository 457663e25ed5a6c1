"""HBM-resident pool training mode (train/pool.py).

The pool removes the per-step host->device image upload: originals are
staged once, batches are [B] int32 index vectors, and the compiled
train step gathers + augments + trains in one program.  Tests pin:
expansion parity with the online mode, the batches contract
(determinism / skip-resume / wrap-pad), train-step gather equivalence
(single device and replicated-pool DP mesh), and the config-driven
driver path end-to-end.
"""

import numpy as np
import pytest

from util_synthetic import make_subject_tree


def _pool(n=24, size=16, seed=3):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)
    labels = (np.arange(n) % 2).astype(np.int32)   # 1 = live
    return images, labels


def test_expand_indices_matches_online_expand_records():
    from vit_spoof_detection_pda_tpu.data.manifest import Record
    from vit_spoof_detection_pda_tpu.train.online import expand_records
    from vit_spoof_detection_pda_tpu.train.pool import expand_indices

    labels = [1, 0, 1, 1, 0]
    records = [Record(path=f"img{i}.png", label=l)
               for i, l in enumerate(labels)]
    by_rec = expand_records(records, live_mult=3, spoof_mult=2)
    by_idx = expand_indices(labels, live_mult=3, spoof_mult=2)
    for g in by_rec:
        want = [r.path for r in by_rec[g]]
        got = [f"img{i}.png" for i in by_idx[g]]
        assert got == want, g


def test_pool_batches_contract():
    from vit_spoof_detection_pda_tpu.train.pool import DevicePoolData

    images, labels = _pool()
    data = DevicePoolData(images, labels, live_mult=2, spoof_mult=1,
                          batch_size=4, seed=7)
    batches = list(data.batches(0))
    assert len(batches) == data.steps_per_epoch
    for b in batches:
        assert b["index"].shape == (4,)
        assert b["image"] is data.pool                # the pool itself
        assert b["image"].shape[0] == images.shape[0]
        np.testing.assert_array_equal(b["label"], labels[b["index"]])
        assert b["group"] in ("orig", "heavy", "medium", "light")
    # the orig group covers every pool index exactly once per epoch
    # (up to drop_last truncation)
    orig_idx = np.concatenate([b["index"] for b in batches
                               if b["group"] == "orig"])
    assert len(set(orig_idx.tolist())) == len(orig_idx)

    # deterministic per epoch; different across epochs
    again = list(data.batches(0))
    assert [b["group"] for b in again] == [b["group"] for b in batches]
    for a, b in zip(again, batches):
        np.testing.assert_array_equal(a["index"], b["index"])
    e1 = list(data.batches(1))
    assert any(not np.array_equal(a["index"], b["index"])
               for a, b in zip(e1, batches))

    # skip-resume yields exactly the suffix
    tail = list(data.batches(0, skip=3))
    assert len(tail) == len(batches) - 3
    for a, b in zip(tail, batches[3:]):
        assert a["group"] == b["group"]
        np.testing.assert_array_equal(a["index"], b["index"])


def test_pool_wrap_pads_small_groups():
    from vit_spoof_detection_pda_tpu.train.pool import DevicePoolData

    images, labels = _pool(n=2)
    # every group has 2 members < batch_size 4: all wrap-padded to one
    # full batch instead of silently dropped by drop_last
    data = DevicePoolData(images, labels, live_mult=1, spoof_mult=1,
                          batch_size=4, seed=0)
    batches = list(data.batches(0))
    groups = [b["group"] for b in batches]
    # orig + exactly one copy tier (severity_for_copy of the single
    # copy), both wrap-padded to a full batch
    assert "orig" in groups and len(set(groups)) == 2
    for b in batches:
        assert b["index"].shape == (4,)
        assert set(b["index"].tolist()) <= {0, 1}


def test_pool_packed_staging_contract():
    """Divisible rows stage lane-packed [N, row//128, 128]; batches
    carry the packed pool; non-divisible rows stay NHWC (exp_r24c:
    packed gathers cost +0.7 ms/step vs +21/+73 on the NHWC layout)."""
    import numpy as np

    from vit_spoof_detection_pda_tpu.train.pool import DevicePoolData

    images, labels = _pool(n=10, size=16)        # row 16*16*3=768 = 6*128
    data = DevicePoolData(images, labels, live_mult=1, spoof_mult=1,
                          batch_size=4, seed=0)
    assert data.packed and data.row_shape == (16, 16, 3)
    assert data.pool.shape == (10, 6, 128)
    b = next(data.batches(0))
    assert b["image"] is data.pool
    # packed rows re-expand to the exact source images
    got = np.asarray(b["image"])[b["index"]].reshape(
        (-1,) + data.row_shape)
    np.testing.assert_array_equal(got, images[b["index"]])

    # 11*11*3 = 363 not divisible by 128 -> NHWC staging
    rng = np.random.default_rng(0)
    odd = rng.integers(0, 256, (6, 11, 11, 3), dtype=np.uint8)
    data2 = DevicePoolData(odd, labels[:6], live_mult=1, spoof_mult=1,
                           batch_size=2, seed=0)
    assert not data2.packed
    assert data2.pool.shape == (6, 11, 11, 3)


def test_pool_packed_staging_device_array_mesh_replicated():
    """An already-staged jax.Array input under a mesh must come out
    packed AND replicated (the packed branch once skipped the
    NamedSharding the device_put path applied)."""
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.parallel.mesh import make_mesh
    from vit_spoof_detection_pda_tpu.train.pool import DevicePoolData

    images, labels = _pool(n=8, size=16)
    mesh = make_mesh()
    data = DevicePoolData(jnp.asarray(images), labels, live_mult=1,
                          spoof_mult=1, batch_size=4, seed=0, mesh=mesh)
    assert data.packed
    assert data.pool.sharding.is_fully_replicated
    got = np.asarray(data.pool).reshape((8,) + data.row_shape)
    np.testing.assert_array_equal(got, images)


def test_pool_gather_kernel_equivalence():
    """ops.gather_pallas.pool_gather == jnp.take (interpret mode).

    The TPU train step routes pool gathers through this kernel (XLA's
    row-gather measured ~21 ms/batch at ViT pool shapes, exp_r24b);
    covers lane-divisible rows at several batch/group splits, the
    non-divisible fallback, and a non-u8 dtype.
    """
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.ops.gather_pallas import pool_gather

    rng = np.random.default_rng(0)
    pool = rng.integers(0, 256, (37, 8, 16, 3), dtype=np.uint8)  # row=384
    for b in (8, 12, 5, 1):
        idx = rng.integers(0, 37, b).astype(np.int32)
        out = pool_gather(jnp.asarray(pool), jnp.asarray(idx),
                          interpret=True)
        np.testing.assert_array_equal(np.asarray(out), pool[idx])
    # row % 128 != 0 -> jnp.take fallback
    pool2 = rng.integers(0, 256, (10, 5, 7), dtype=np.uint8)
    idx = np.asarray([9, 0, 3], np.int32)
    np.testing.assert_array_equal(
        np.asarray(pool_gather(jnp.asarray(pool2), jnp.asarray(idx))),
        pool2[idx])
    # non-u8 rows ride the same kernel
    pool3 = rng.normal(0, 1, (11, 2, 128)).astype(np.float32)
    idx = np.asarray([10, 4], np.int32)
    out = pool_gather(jnp.asarray(pool3), jnp.asarray(idx),
                      interpret=True)
    np.testing.assert_array_equal(np.asarray(out), pool3[idx])


def test_train_step_pool_gather_equivalence():
    """step(pool, index) == step(pool[index]) — same loss, same params."""
    import jax
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.ops import losses
    from vit_spoof_detection_pda_tpu.train.state import (
        create_train_state, make_optimizer)
    from vit_spoof_detection_pda_tpu.train.step import make_train_step

    images, labels = _pool(n=20, size=32)
    module = ViTAntiSpoof(patch_size=16, embed_dim=32, depth=1,
                          num_heads=2, hidden=8, dropout=0.0)
    tx = make_optimizer(1e-3)
    rng = jax.random.PRNGKey(0)

    def prep(key, u8):
        return u8.astype(jnp.float32) / 255.0

    step = make_train_step(losses.make_loss_fn("ce"), donate=False,
                           batch_prep=prep)
    idx = np.asarray([3, 1, 4, 1, 5, 9, 2, 6], np.int32)

    s0 = create_train_state(module, tx, rng,
                            input_shape=(1, 32, 32, 3))
    s_pool, m_pool = step(s0, {"image": jnp.asarray(images),
                               "index": jnp.asarray(idx),
                               "label": jnp.asarray(labels[idx])})

    s0b = create_train_state(module, tx, rng,
                             input_shape=(1, 32, 32, 3))
    s_plain, m_plain = step(s0b, {"image": jnp.asarray(images[idx]),
                                  "label": jnp.asarray(labels[idx])})
    np.testing.assert_allclose(float(m_pool["loss"]),
                               float(m_plain["loss"]), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_pool.params)[0],
            jax.tree_util.tree_flatten_with_path(s_plain.params)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


def test_train_step_pool_mesh_replicated():
    """DP mesh: replicated pool + sharded index batch — loss equals the
    single-device run on the same rows."""
    import jax
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.ops import losses
    from vit_spoof_detection_pda_tpu.parallel.mesh import make_mesh
    from vit_spoof_detection_pda_tpu.train.pool import DevicePoolData
    from vit_spoof_detection_pda_tpu.train.state import (
        create_train_state, make_optimizer)
    from vit_spoof_detection_pda_tpu.train.step import make_train_step

    images, labels = _pool(n=20, size=32)
    module = ViTAntiSpoof(patch_size=16, embed_dim=32, depth=1,
                          num_heads=2, hidden=8, dropout=0.0)
    tx = make_optimizer(1e-3)
    rng = jax.random.PRNGKey(0)
    idx = np.asarray([3, 1, 4, 1, 5, 9, 2, 6], np.int32)

    mesh = make_mesh()
    data = DevicePoolData(images, labels, batch_size=8, mesh=mesh)
    assert data.packed        # 32*32*3 = 3072 divides 128
    # driver contract: packed pools unpack to NHWC inside batch_prep
    unpack = lambda key, x: x.reshape((x.shape[0],) + data.row_shape)
    step_m = make_train_step(losses.make_loss_fn("ce"), donate=False,
                             mesh=mesh, batch_prep=unpack)
    s0 = create_train_state(module, tx, rng, input_shape=(1, 32, 32, 3))
    _, mm = step_m(s0, {"image": data.pool, "index": idx,
                        "label": labels[idx]})

    step_1 = make_train_step(losses.make_loss_fn("ce"), donate=False)
    s0b = create_train_state(module, tx, rng, input_shape=(1, 32, 32, 3))
    _, m1 = step_1(s0b, {"image": jnp.asarray(images[idx]).astype(
        jnp.float32), "label": jnp.asarray(labels[idx])})
    # mesh path feeds the u8 pool; single path feeds f32 rows — the
    # model casts internally, so compare losses loosely
    _, m1u8 = step_1(create_train_state(module, tx, rng,
                                        input_shape=(1, 32, 32, 3)),
                     {"image": jnp.asarray(images[idx]),
                      "label": jnp.asarray(labels[idx])})
    np.testing.assert_allclose(float(mm["loss"]), float(m1u8["loss"]),
                               rtol=1e-5)


@pytest.mark.slow
def test_pool_training_with_config_sharding(tmp_path):
    """device_pool + config-driven FSDP: train_from_config must stage
    the pool replicated over the SAME mesh the Trainer compiles on
    (staging meshless while the Trainer builds a config mesh would
    leave the pool committed to one device) and apply the FSDP layout."""
    import jax

    from vit_spoof_detection_pda_tpu.config import Config
    from vit_spoof_detection_pda_tpu.train.driver import train_from_config

    make_subject_tree(tmp_path / "raw", subjects=2, per_class=4, size=32)
    cfg = Config().with_overrides({
        "augment.online": True,
        "augment.device_pool": True,
        "augment.input_dir": str(tmp_path / "raw"),
        "augment.live_augmentations": 2,
        "augment.spoof_augmentations": 1,
        "data.batch_size": 8,
        "data.eval_batch_size": 8,
        "data.img_size": 32,
        "data.num_workers": 2,
        "model.embed_dim": 64, "model.depth": 1, "model.num_heads": 2,
        "model.head_hidden": 16, "model.patch_size": 16,
        "optim.num_epochs": 1,
        "sharding.fsdp": True, "sharding.fsdp_min_size": 1024,
        "checkpoint.save_dir": str(tmp_path / "ckpt"),
        "telemetry.log_interval": 100,
    })
    best, trainer = train_from_config(cfg)
    assert trainer.mesh.devices.size == len(jax.devices())
    fc1 = trainer.state.params["vit"]["block0"]["mlp"]["fc1"]["kernel"]
    assert not fc1.sharding.is_fully_replicated      # FSDP layout engaged
    assert np.isfinite(best["val_f1"])
    assert int(trainer.state.step) > 0


@pytest.mark.slow
def test_pool_training_end_to_end(tmp_path):
    """Config-driven device-pool run: augment.online + device_pool."""
    from vit_spoof_detection_pda_tpu.config import Config
    from vit_spoof_detection_pda_tpu.train.driver import train_from_config

    make_subject_tree(tmp_path / "raw", subjects=2, per_class=4, size=32)
    cfg = Config().with_overrides({
        "augment.online": True,
        "augment.device_pool": True,
        "augment.input_dir": str(tmp_path / "raw"),
        "augment.live_augmentations": 2,
        "augment.spoof_augmentations": 1,
        "data.batch_size": 8,
        "data.eval_batch_size": 8,
        "data.img_size": 32,
        "data.num_workers": 2,
        "model.embed_dim": 64, "model.depth": 1, "model.num_heads": 2,
        "model.head_hidden": 16, "model.patch_size": 16,
        "optim.num_epochs": 1,
        "checkpoint.save_dir": str(tmp_path / "ckpt"),
        "telemetry.log_interval": 100,
    })
    best, trainer = train_from_config(cfg)
    assert np.isfinite(best["val_f1"])
    assert int(trainer.state.step) > 0
