"""HBM-resident training pool: stage the original images on device ONCE,
feed the epoch as index streams.

The reference's 115k-image epoch re-reads ~17 GB of JPEGs from disk
every epoch (train_advanced.py:550-563 DataLoader over the materialized
store).  The online mode (train/online.py) already removes the disk, but
still uploads every uint8 batch host->device — ~19 MB/step, which on a
relayed/tunneled TPU (or any host with thin PCIe/DCN) makes the feed,
not the step, the epoch's critical path.

This module removes the per-step transfer entirely: the UNIQUE original
images (~27k images ≈ 4 GB uint8 at 224² for the reference's dataset —
the 115,125-image epoch is live×9/spoof×3 differential fan-out of that
pool, augment_data.py:27-47) are placed in HBM once; each step ships
only a [B] int32 index vector and gathers + augments + trains in ONE
compiled program.  The differential fan-out becomes index replication:
epoch order/severity assignment are identical to OnlineAugmentedData
(same expand semantics, same seeded per-epoch shuffles), so the
optimizer sees the same stream the online mode would feed.

Multi-chip: the pool is REPLICATED over the mesh (it must fit per-chip
HBM alongside model+optimizer state); the index/label streams shard
over the data axis, so each device gathers its batch shard locally —
GSPMD inserts no collectives for a replicated-operand gather.
"""

from __future__ import annotations

import logging
from typing import Iterator, Optional, Sequence

import numpy as np

from ..augment.policy import severity_for_copy
from ..data.loader import epoch_limit, epoch_order
from .online import GROUPS

log = logging.getLogger(__name__)


def expand_indices(labels: Sequence[int], live_mult: int,
                   spoof_mult: int) -> dict:
    """{group: int32 pool-index array} with the differential fan-out
    applied — the index-space mirror of online.expand_records (canonical
    labels: 1 = live)."""
    groups = {g: [] for g in GROUPS}
    for i, lbl in enumerate(labels):
        groups["orig"].append(i)
        n = live_mult if lbl == 1 else spoof_mult
        for c in range(n):
            groups[severity_for_copy(c, n)].append(i)
    return {g: np.asarray(ix, np.int32) for g, ix in groups.items()}


class DevicePoolData:
    """Epoch iterator over severity-homogeneous index batches into a
    device-resident image pool.

    ``images`` is the unique-original pool, uint8 [N, S, S, 3] (numpy or
    an already-staged jax.Array); ``labels`` its canonical labels
    (1 = live).  Batches carry the POOL as their ``image`` (a no-op
    device reference after the first step) plus ``index``/``label``
    vectors; ``make_train_step`` gathers on device.  When the row size
    divides 128 the staged pool is PACKED to [N, row//128, 128]
    (``self.packed``; lane-aligned gathers — exp_r24c) and gathered
    rows must be reshaped back to ``row_shape`` before augmentation
    (the train driver wraps ``batch_prep`` accordingly).
    """

    def __init__(self, images, labels, *, live_mult: int = 8,
                 spoof_mult: int = 2, batch_size: int = 128,
                 seed: int = 42, mesh=None):
        import jax

        labels = np.asarray(labels, np.int32)
        if len(labels) != len(images):
            raise ValueError(
                f"labels ({len(labels)}) / images ({len(images)}) "
                "length mismatch")
        self.labels = labels
        self.batch_size = batch_size
        self.seed = seed
        self.group_indices = {
            g: ix for g, ix in expand_indices(
                labels, live_mult, spoof_mult).items() if len(ix)}
        for g, ix in self.group_indices.items():
            if len(ix) < batch_size:
                # same wrap-pad contract as OnlineAugmentedData: a tier
                # smaller than one batch must not be silently dropped
                log.warning(
                    "pool group %r has %d records < batch_size %d — "
                    "wrap-padding to one full batch", g, len(ix),
                    batch_size)
                self.group_indices[g] = ix[
                    np.arange(batch_size) % len(ix)]

        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            sharding = NamedSharding(mesh, PartitionSpec())

        # Stage the pool PACKED [N, row//128, 128] when the row divides
        # the 128-lane width.  TPU tiles the two trailing dims:
        # gathering from the NHWC layout costs +21 ms/step (XLA take)
        # to +73 ms/step (in-step reshape relayouts all 4.1 GB) at the
        # reference scale, while the packed pool gathers at +0.7 ms
        # (exp_r24c).  Two staging constraints, both measured:
        # host-staging the packed shape is a pathological relay path
        # (545 s vs 19 s for NHWC), and holding NHWC + packed pools
        # simultaneously on device OOMs next to the training state —
        # so NHWC CHUNKS upload on the fast path and scatter into the
        # packed pool in place (donated dynamic_update_slice).
        # Consumers reshape gathered rows back to ``row_shape`` (the
        # train driver wraps batch_prep).
        self.row_shape = tuple(images.shape[1:])
        row = int(np.prod(self.row_shape))
        self.packed = row % 128 == 0
        n = images.shape[0]

        def _put(x):
            return (jax.device_put(x, sharding) if sharding is not None
                    else jax.device_put(x))

        if self.packed:
            import jax.numpy as jnp
            from jax import lax
            sub = row // 128

            if isinstance(images, np.ndarray):
                upd = jax.jit(
                    lambda p, c, i: lax.dynamic_update_slice(
                        p, c.reshape((c.shape[0], sub, 128)), (i, 0, 0)),
                    donate_argnums=(0,))
                # destination created ON DEVICE (a host zeros pool would
                # spike ~4 GB host RAM and upload zero bytes through
                # the relay; every row is overwritten by the chunks)
                dtype = jnp.dtype(images.dtype)
                pool = jax.jit(
                    lambda: jnp.zeros((n, sub, 128), dtype),
                    **({"out_shardings": sharding}
                       if sharding is not None else {}))()
                chunk = max(1, min(n, (256 * 2**20) // max(1, row)))
                for i in range(0, n, chunk):
                    pool = upd(pool, _put(images[i:i + chunk]),
                               jnp.int32(i))
            else:
                # already on device: one reshape (transient 2x pool),
                # replicated over the mesh like the device_put path
                pool = jax.jit(
                    lambda p: jnp.reshape(p, (n, sub, 128)),
                    **({"out_shardings": sharding}
                       if sharding is not None else {}))(images)
            pool.block_until_ready()
            self.pool = pool
        else:
            self.pool = _put(images)
        gb = self.pool.size / 2**30
        log.info("device pool staged: %d images, %.2f GB uint8%s",
                 len(labels), gb,
                 " (packed [N,%d,128])" % (row // 128)
                 if self.packed else "")

    def wrap_prep(self, prep):
        """Adapt a ``batch_prep(key, images_nhwc)`` to the staged
        layout: packed pools deliver gathered rows as [B, row//128, 128]
        and must reshape back to ``row_shape`` before the chain (a
        [B]-sized view — unlike relayouting the whole pool in-step,
        exp_r24c).  The single owner of the unpack contract; NHWC pools
        return ``prep`` unchanged."""
        if not self.packed:
            return prep
        shape = self.row_shape

        def unpacked(key, x):
            return prep(key, x.reshape((x.shape[0],) + shape))

        return unpacked

    @property
    def steps_per_epoch(self) -> int:
        return sum(len(ix) // self.batch_size
                   for ix in self.group_indices.values())

    def batches(self, epoch: int, *, skip: int = 0) -> Iterator[dict]:
        """Seeded interleave of per-group index batches (the
        OnlineAugmentedData.batches contract: per-epoch group order and
        per-group permutations are independently seeded; ``skip`` drops
        the first ``skip`` interleaved batches for mid-epoch resume)."""
        if skip < 0:
            raise ValueError(f"skip must be >= 0, got {skip}")
        B = self.batch_size
        order = []
        for j, (g, ix) in enumerate(self.group_indices.items()):
            order.extend([g] * (len(ix) // B))
        np.random.default_rng(self.seed + 977 * epoch).shuffle(order)

        cursors = {}
        perms = {}
        for j, (g, ix) in enumerate(self.group_indices.items()):
            perm = epoch_order(len(ix), epoch, self.seed + 131071 * (j + 1),
                               shuffle=True)
            limit = epoch_limit(len(perm), B, drop_last=True)
            perms[g] = ix[perm[:limit]]
            cursors[g] = 0
        for g in order[:skip]:
            cursors[g] += B
        for g in order[skip:]:
            i = cursors[g]
            cursors[g] = i + B
            idx = perms[g][i:i + B]
            yield {"image": self.pool, "index": idx,
                   "label": self.labels[idx], "group": g}
