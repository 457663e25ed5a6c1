"""Data layer: scanners, split parity with the reference's sklearn call,
decode pipeline with corrupt-file fallback, prefetch, conventions."""

import numpy as np
import pytest

from vit_spoof_detection_pda_tpu.data import (
    DataPipeline, Record, decode_image, harness_labels, harness_scores,
    load_manifest, save_manifest, scan_augmented, scan_raw, scan_test,
    stratified_split, to_canonical)
from vit_spoof_detection_pda_tpu.data.manifest import class_counts

from util_synthetic import make_flat_tree, make_subject_tree


def test_scan_raw_subject_tree(tmp_path):
    make_subject_tree(tmp_path, subjects=2, per_class=3)
    recs = scan_raw(str(tmp_path))
    assert len(recs) == 12
    live = [r for r in recs if r.label == 1]
    assert len(live) == 6
    assert all(r.subject is not None for r in recs)
    assert all("live" in r.path for r in live)


def test_scan_augmented_flat(tmp_path):
    make_flat_tree(tmp_path, per_class=4)
    recs = scan_augmented(str(tmp_path))
    assert len(recs) == 8
    assert class_counts(recs) == (4, 4)


def test_scan_test_detects_layout(tmp_path):
    make_flat_tree(tmp_path / "flat", per_class=2)
    make_subject_tree(tmp_path / "tree", subjects=1, per_class=2)
    assert len(scan_test(str(tmp_path / "flat"))) == 4
    assert len(scan_test(str(tmp_path / "tree"))) == 4


def test_split_matches_sklearn_exactly():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.model_selection import train_test_split
    recs = [Record(path=f"p{i}", label=i % 3 != 0) for i in range(100)]
    labels = [r.label for r in recs]
    train, val = stratified_split(recs, 0.85, seed=42)
    w_train, w_val = train_test_split(
        recs, train_size=0.85, stratify=labels, random_state=42)
    assert [r.path for r in train] == [r.path for r in w_train]
    assert [r.path for r in val] == [r.path for r in w_val]


def test_manifest_roundtrip(tmp_path):
    recs = [Record(path="a.png", label=1, subject="s1", name="a.png"),
            Record(path="b.png", label=0)]
    save_manifest(recs, str(tmp_path / "m.jsonl"))
    assert load_manifest(str(tmp_path / "m.jsonl")) == recs


def test_decode_exact_and_shorter(tmp_path):
    make_subject_tree(tmp_path, subjects=1, per_class=1, size=48)
    path = str(next(tmp_path.rglob("*.png")))
    assert decode_image(path, 32, "exact").shape == (32, 32, 3)
    assert decode_image(path, 32, "shorter").shape == (32, 32, 3)


def test_decode_corrupt_black_fallback(tmp_path, caplog):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"this is not a png")
    out = decode_image(str(bad), 16)
    assert out.shape == (16, 16, 3)
    assert (out == 0).all()


def test_pipeline_batches_and_shuffle(tmp_path):
    make_flat_tree(tmp_path, per_class=8, size=16)
    recs = scan_augmented(str(tmp_path))
    pipe = DataPipeline(recs, batch_size=4, img_size=16, shuffle=True,
                        drop_last=True, num_workers=2)
    assert pipe.steps_per_epoch == 4
    batches = list(pipe.batches(epoch=0))
    assert len(batches) == 4
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    assert batches[0]["image"].dtype == np.uint8
    # epochs shuffle differently but deterministically
    o0 = np.concatenate([b["index"] for b in pipe.batches(0)])
    o0b = np.concatenate([b["index"] for b in pipe.batches(0)])
    o1 = np.concatenate([b["index"] for b in pipe.batches(1)])
    np.testing.assert_array_equal(o0, o0b)
    assert not np.array_equal(o0, o1)
    # all records covered exactly once
    assert sorted(o0.tolist()) == list(range(16))


def test_pipeline_corrupt_file_does_not_crash(tmp_path):
    make_flat_tree(tmp_path, per_class=2, size=16)
    (tmp_path / "live" / "broken.jpg").write_bytes(b"junk")
    recs = scan_augmented(str(tmp_path))
    pipe = DataPipeline(recs, batch_size=5, img_size=16, num_workers=2)
    [b] = list(pipe.batches())
    assert b["image"].shape[0] == 5


def test_prefetch_to_device(tmp_path):
    from vit_spoof_detection_pda_tpu.data.loader import prefetch_to_device
    make_flat_tree(tmp_path, per_class=4, size=16)
    recs = scan_augmented(str(tmp_path))
    pipe = DataPipeline(recs, batch_size=4, img_size=16, num_workers=2)
    out = list(prefetch_to_device(pipe.batches()))
    assert len(out) == 2
    import jax
    assert isinstance(out[0]["image"], jax.Array)


def test_conventions():
    assert to_canonical("live") == 1
    assert to_canonical("spoof") == 0
    np.testing.assert_array_equal(harness_labels([1, 0, 1]), [0, 1, 0])
    np.testing.assert_allclose(harness_scores([0.9, 0.2]), [0.1, 0.8])


def test_pipeline_producer_failure_surfaces(tmp_path, monkeypatch):
    """An exception escaping the producer thread must raise in the
    consumer, not hang q.get() forever (review finding: the sentinel
    was not in a finally)."""
    import vit_spoof_detection_pda_tpu.data.loader as loader_mod

    make_flat_tree(tmp_path, per_class=2, size=16)
    recs = scan_augmented(str(tmp_path))

    def boom(path, size, resize="exact"):
        raise MemoryError("synthetic decode failure")

    monkeypatch.setattr(loader_mod, "decode_image", boom)
    pipe = DataPipeline(recs, batch_size=2, img_size=16, num_workers=2)
    import pytest
    with pytest.raises(RuntimeError, match="producer failed"):
        list(pipe.batches())


def test_pipeline_early_exit_no_stuck_producer(tmp_path):
    """Breaking out of an epoch with prefetch_depth=1 must not wedge
    the producer in a blocking put (thread + batch leak)."""
    import threading

    make_flat_tree(tmp_path, per_class=8, size=16)
    recs = scan_augmented(str(tmp_path))
    pipe = DataPipeline(recs, batch_size=2, img_size=16, num_workers=2,
                        prefetch_depth=1)
    before = threading.active_count()
    for _ in range(3):
        gen = pipe.batches()
        next(gen)
        gen.close()                      # early teardown mid-epoch
    # producers exited (no accumulating daemon threads)
    assert threading.active_count() <= before + 1


def test_shard_for_host_equal_shares(monkeypatch):
    """Hosts must see IDENTICAL record counts (a 1-record skew can
    desync per-host steps_per_epoch and deadlock collectives)."""
    import jax

    from vit_spoof_detection_pda_tpu.data.loader import shard_for_host
    from vit_spoof_detection_pda_tpu.data.manifest import Record

    recs = [Record(path=f"p{i}", label=i % 2) for i in range(999)]
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    shares = []
    for idx in range(2):
        monkeypatch.setattr(jax, "process_index", lambda i=idx: i)
        shares.append(shard_for_host(recs))
    assert len(shares[0]) == len(shares[1]) == 499
    # disjoint coverage
    assert not ({r.path for r in shares[0]} & {r.path for r in shares[1]})


def test_to_canonical_strict_and_case_insensitive():
    from vit_spoof_detection_pda_tpu.data.conventions import to_canonical

    assert to_canonical("Live") == 1 and to_canonical("SPOOF") == 0
    with pytest.raises(ValueError, match="unknown class"):
        to_canonical("real")
