"""Exact mid-epoch resume: data sources reposition by batch (skip=),
and a preempted-then-resumed run reproduces the uninterrupted run's
final state bit-for-bit.

The reference has no resume at all (its load_checkpoint reads only
model_state_dict, test.py:167-188); epoch-granular resume shipped in
round 9.  This layer makes preemption recovery EXACT: no batch is
trained twice and the schedule horizon is preserved, because per-epoch
shuffle orders are seeded (data/loader.py::epoch_order) so a skipped
prefix is precisely the set of already-trained batches.
"""

import numpy as np
import pytest

from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.data.loader import DataPipeline
from vit_spoof_detection_pda_tpu.train import Trainer

from test_train import TinyNet, _synthetic
from util_synthetic import make_flat_tree


def _records(root):
    from vit_spoof_detection_pda_tpu.data.manifest import scan_augmented
    return scan_augmented(str(root))


def _collect(it):
    return list(it)


def _batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert set(x) == set(y)
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])


# ---------------------------------------------------------------- data


def test_pipeline_skip_matches_suffix(tmp_path):
    recs = _records(make_flat_tree(tmp_path, per_class=9, size=20))
    pipe = DataPipeline(recs, batch_size=4, img_size=20, resize="exact",
                        num_workers=2, shuffle=True, drop_last=True,
                        seed=7)
    full = _collect(pipe.batches(epoch=3))
    for skip in (0, 1, 2, len(full), len(full) + 5):
        part = _collect(pipe.batches(epoch=3, skip=skip))
        _batches_equal(part, full[skip:])
    with pytest.raises(ValueError):
        next(pipe.batches(epoch=0, skip=-1))


def test_shard_store_skip_matches_suffix(tmp_path):
    from vit_spoof_detection_pda_tpu.data.shards import ShardStore

    recs = _records(make_flat_tree(tmp_path / "imgs", per_class=9,
                                   size=20))
    store = ShardStore.build(recs, str(tmp_path / "cache"), img_size=20,
                             resize="exact", num_workers=2)
    kw = dict(epoch=2, shuffle=True, seed=5, drop_last=True)
    full = _collect(store.batches(4, **kw))
    for skip in (1, 3, len(full)):
        part = _collect(store.batches(4, skip=skip, **kw))
        _batches_equal(part, full[skip:])


def test_online_skip_matches_suffix(tmp_path):
    from vit_spoof_detection_pda_tpu.train.online import (
        OnlineAugmentedData)

    recs = _records(make_flat_tree(tmp_path, per_class=12, size=20))
    data = OnlineAugmentedData(recs, live_mult=2, spoof_mult=1,
                               batch_size=4, img_size=20, num_workers=2,
                               seed=3)
    full = _collect(data.batches(epoch=1))
    assert len(full) == data.steps_per_epoch
    for skip in (1, 4, len(full)):
        part = _collect(data.batches(epoch=1, skip=skip))
        assert [g for g, _ in part] == [g for g, _ in full[skip:]]
        _batches_equal([b for _, b in part], [b for _, b in full[skip:]])


# ------------------------------------------------------------- trainer


def _make_batches(images, labels, bs, preempt=None):
    """Seeded per-epoch order with skip support; optionally fires
    request_preemption() when about to yield batch ``preempt[1]`` of
    epoch ``preempt[0]`` (the deterministic stand-in for SIGTERM —
    train_epoch checks the flag after fetching, BEFORE training it)."""

    def train_batches(epoch, skip=0):
        rng = np.random.default_rng(epoch)
        idx = rng.permutation(len(images))
        for bi, i in enumerate(range(0, len(images) - bs + 1, bs)):
            if bi < skip:
                continue
            if preempt is not None and (epoch, bi) == preempt[0]:
                preempt[1][0].request_preemption()
            j = idx[i:i + bs]
            yield {"image": images[j], "label": labels[j]}

    return train_batches


def test_midepoch_resume_is_bit_exact(tmp_path):
    """Preempt at epoch 1 / batch 2, checkpoint, resume at exactly that
    position: the final params match an uninterrupted run bit-for-bit
    (dropout rng folds from state.step, shuffles are seeded)."""
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    images, labels = _synthetic(160, seed=9)
    bs = 32
    spe = len(images) // bs          # 5 batches/epoch
    cfg = Config().with_overrides({
        "optim.num_epochs": 3,
        "data.img_size": 16,
        "telemetry.log_interval": 100,
    })

    def val_batches():
        yield {"image": images[:bs], "label": labels[:bs]}

    # --- oracle: uninterrupted 3-epoch run
    t_full = Trainer(cfg, TinyNet(),
                     train_batches=_make_batches(images, labels, bs),
                     val_batches=val_batches, steps_per_epoch=spe)
    t_full.fit()

    # --- run A: preempted at (epoch 1, batch 2) -> checkpoint
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    ref = [None]
    t_a = Trainer(cfg, TinyNet(),
                  train_batches=_make_batches(images, labels, bs,
                                              preempt=((1, 2), ref)),
                  val_batches=val_batches, steps_per_epoch=spe,
                  checkpoints=mgr)
    ref[0] = t_a
    best = t_a.fit()
    assert best.get("preempted") is True
    step = mgr.latest_step()
    assert step == spe + 2           # epoch 0 complete + 2 batches

    # --- run B: restore + exact mid-epoch resume (driver arithmetic)
    t_b = Trainer(cfg, TinyNet(),
                  train_batches=_make_batches(images, labels, bs),
                  val_batches=val_batches, steps_per_epoch=spe)
    t_b.state = mgr.restore(t_b.state)
    start_epoch, start_batch = step // spe, step % spe
    assert (start_epoch, start_batch) == (1, 2)
    t_b.fit(start_epoch=start_epoch, start_batch=start_batch)
    mgr.close()

    import jax
    for (path, x), y in zip(
            jax.tree_util.tree_leaves_with_path(t_full.state.params),
            jax.tree.leaves(t_b.state.params)):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y),
            err_msg=jax.tree_util.keystr(path))
    assert int(t_b.state.step) == int(t_full.state.step)


def test_trainer_skip_fallback_discards_host_side(tmp_path):
    """A train_batches without skip= support still resumes correctly —
    the Trainer discards the prefix itself."""
    images, labels = _synthetic(96, seed=4)
    bs = 32
    spe = len(images) // bs
    cfg = Config().with_overrides({
        "optim.num_epochs": 1,
        "data.img_size": 16,
        "telemetry.log_interval": 100,
    })
    seen = []

    def train_batches(epoch):                 # no skip kwarg
        for i in range(0, len(images) - bs + 1, bs):
            seen.append(i // bs)
            yield {"image": images[i:i + bs], "label": labels[i:i + bs]}

    def val_batches():
        yield {"image": images[:bs], "label": labels[:bs]}

    t = Trainer(cfg, TinyNet(), train_batches=train_batches,
                val_batches=val_batches, steps_per_epoch=spe)
    t.fit(start_epoch=0, start_batch=2)
    # all batches were PULLED (host-side discard), but only one trained
    assert seen == [0, 1, 2]
    assert int(t.state.step) == 1
