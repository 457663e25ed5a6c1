"""Pre-decoded shard store (data/shards.py): content parity with the
decode pipeline, shuffle semantics, idempotent builds, driver wiring."""

import json

import numpy as np

from vit_spoof_detection_pda_tpu.data import (DataPipeline, ShardStore,
                                              scan_augmented)
from vit_spoof_detection_pda_tpu.data.loader import decode_image

from util_synthetic import make_flat_tree


def _records(tmp_path, n=10):
    make_flat_tree(tmp_path / "store", per_class=n // 2, size=48)
    return scan_augmented(str(tmp_path / "store"))


def test_build_and_content_parity(tmp_path):
    records = _records(tmp_path)
    store = ShardStore.build(records, str(tmp_path / "shards"),
                             img_size=32, resize="exact", shard_size=4)
    assert len(store) == len(records)
    # gather returns exactly what decode_image produces, in order
    for i in (0, 3, len(records) - 1):
        want = decode_image(records[i].path, 32, "exact")
        np.testing.assert_array_equal(store.gather(np.asarray([i]))[0],
                                      want)
    np.testing.assert_array_equal(
        store.labels, [r.label for r in records])


def test_batches_match_pipeline_contract(tmp_path):
    records = _records(tmp_path)
    store = ShardStore.build(records, str(tmp_path / "shards"),
                             img_size=32, resize="exact", shard_size=4)
    pipe = DataPipeline(records, batch_size=4, img_size=32,
                        resize="exact", shuffle=True, drop_last=True,
                        seed=7)
    got = list(store.batches(4, epoch=2, shuffle=True, seed=7,
                             drop_last=True))
    want = list(pipe.batches(epoch=2))
    assert len(got) == len(want) == store.steps_per_epoch(4)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["index"], w["index"])
        np.testing.assert_array_equal(g["label"], w["label"])
        np.testing.assert_array_equal(g["image"], w["image"])


def test_build_is_idempotent_and_detects_staleness(tmp_path):
    records = _records(tmp_path)
    d = str(tmp_path / "shards")
    ShardStore.build(records, d, img_size=32, resize="exact",
                     shard_size=4)
    before = json.load(open(tmp_path / "shards" / "shards.json"))
    # unchanged inputs: reused, not rebuilt
    s2 = ShardStore.build(records, d, img_size=32, resize="exact",
                          shard_size=4)
    after = json.load(open(tmp_path / "shards" / "shards.json"))
    assert before == after and len(s2) == len(records)
    # different size: rebuilt
    s3 = ShardStore.build(records, d, img_size=24, resize="exact",
                          shard_size=4)
    assert s3.img_size == 24
    assert s3.gather(np.asarray([0]))[0].shape == (24, 24, 3)


def test_driver_trains_from_shard_cache(tmp_path):
    """train_from_config with data.shard_cache set: builds the store and
    completes a tiny run (CPU, 8-dev mesh)."""
    from vit_spoof_detection_pda_tpu.config import Config
    from vit_spoof_detection_pda_tpu.train.driver import train_from_config

    make_flat_tree(tmp_path / "store", per_class=8, size=48)
    cfg = Config().with_overrides({
        "data.data_root": str(tmp_path / "store"),
        "data.shard_cache": str(tmp_path / "cache"),
        "data.batch_size": 8, "data.eval_batch_size": 8,
        "data.img_size": 32, "data.num_workers": 2,
        "train_aug.resize_to": 40, "train_aug.crop_size": 32,
        "model.embed_dim": 64, "model.depth": 1, "model.num_heads": 2,
        "model.head_hidden": 16, "model.patch_size": 16,
        "optim.num_epochs": 1, "threshold.optimize": False,
        "telemetry.jsonl_path": None,
        "checkpoint.save_dir": str(tmp_path / "ck")})
    best, _ = train_from_config(cfg, max_steps_per_epoch=2)
    assert np.isfinite(best["val_f1"])
    assert (tmp_path / "cache" / "shards.json").exists()


def test_build_lock_stale_steal(tmp_path):
    """A leftover lock (crashed builder) older than build_timeout is
    stolen instead of blocking forever."""
    import os

    records = _records(tmp_path)
    d = tmp_path / "shards"
    d.mkdir()
    lock = d / ".building.lock"
    lock.write_text("12345")
    os.utime(lock, (0, 0))                        # ancient mtime
    store = ShardStore.build(records, str(d), img_size=32,
                             resize="exact", build_timeout=1.0)
    assert len(store) == len(records)
    assert not lock.exists()


def test_build_lock_adopts_concurrent_build(tmp_path):
    """While another process holds the lock, build() waits and adopts
    the finished store when the fingerprints match — never a second
    writer over live memmaps."""
    import threading
    import time

    records = _records(tmp_path)
    d = tmp_path / "shards"
    first = ShardStore.build(records, str(d), img_size=32, resize="exact")
    assert len(first) == len(records)
    lock = d / ".building.lock"
    lock.write_text("99999")                      # fresh foreign lock

    def release():
        time.sleep(0.6)
        lock.unlink()

    t = threading.Thread(target=release)
    t.start()
    store = ShardStore.build(records, str(d), img_size=32,
                             resize="exact", build_timeout=30.0)
    t.join()
    assert len(store) == len(records)


def test_build_lock_foreign_store_raises(tmp_path):
    """Two writers with DIFFERENT record lists on one directory is a
    configuration error — loud, not alternating clobbering rebuilds."""
    import threading
    import time

    import pytest

    records = _records(tmp_path)
    d = tmp_path / "shards"
    ShardStore.build(records, str(d), img_size=32, resize="exact")
    lock = d / ".building.lock"
    lock.write_text("99999")

    def release():
        time.sleep(0.6)
        lock.unlink()

    t = threading.Thread(target=release)
    t.start()
    with pytest.raises(RuntimeError, match="DIFFERENT record list"):
        ShardStore.build(records[:4], str(d), img_size=32,
                         resize="exact", build_timeout=30.0)
    t.join()


def test_crashed_builder_recovery(tmp_path):
    """A waiter that sees the lock vanish with NO valid manifest (the
    holder crashed mid-build) must build the store itself — not abort
    with a record-list-mismatch diagnosis."""
    from vit_spoof_detection_pda_tpu.data.shards import ShardStore

    records = _records(tmp_path)
    d = tmp_path / "cache"
    d.mkdir()
    # simulate the crash remains: a half-built store with no manifest
    (d / "images-00000.npy").write_bytes(b"garbage")
    store = ShardStore.build(records, str(d), img_size=16,
                             resize="exact", shard_size=8, num_workers=2)
    assert len(store) == len(records)


def test_manifest_drops_paths(tmp_path):
    """The manifest carries no redundant per-record path list (the
    fingerprint digest covers paths; the list was multi-MB at scale)."""
    from vit_spoof_detection_pda_tpu.data.shards import ShardStore

    records = _records(tmp_path)
    d = tmp_path / "cache"
    ShardStore.build(records, str(d), img_size=16, resize="exact",
                     shard_size=8, num_workers=2)
    import json as _json
    meta = _json.loads((d / "shards.json").read_text())
    assert "paths" not in meta          # dropped from the manifest
