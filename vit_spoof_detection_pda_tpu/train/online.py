"""Online differential augmentation feeding training directly.

The offline pipeline materializes ~118k JPEGs and re-decodes them every
epoch (reference augment_data.py -> train_advanced.py).  Online mode
skips the disk entirely: the raw manifest is EXPANDED record-wise —
each live record appears 1 + live_mult times, each spoof 1 + spoof_mult
times, every copy tagged with its severity tier (the same first-third
heavy / middle medium / rest light schedule, augment_data.py:188-194) —
and augmentation happens on device en route to the train step.

Batches are grouped BY severity tier so every batch runs exactly one
compiled chain with static shapes (a per-sample severity switch would
execute all tiers for all samples under vmap); the group batch streams
interleave in a seeded random order each epoch, so the optimizer sees a
shuffled mix.  Fresh TIER parameters are drawn every epoch (the
reference freezes each copy's tier warp at materialization), and the
driver appends the per-epoch train-time ops to every severity chain —
matching the reference, where store copies are re-randomized each
epoch by get_transforms (train_advanced.py:166-177).  Remaining
deviation: the Resize(256)->RandomCrop(224) position jitter is absent
online (inputs decode at img_size); see train/driver.py.
"""

from __future__ import annotations

import logging
from typing import Iterator, List, Sequence

import numpy as np

from ..augment.policy import severity_for_copy
from ..data.loader import DataPipeline
from ..data.manifest import Record

log = logging.getLogger(__name__)

GROUPS = ("orig", "heavy", "medium", "light")


def expand_records(records: Sequence[Record], live_mult: int,
                   spoof_mult: int) -> dict:
    """{group: [Record, ...]} with the differential fan-out applied."""
    groups = {g: [] for g in GROUPS}
    for r in records:
        groups["orig"].append(r)
        n = live_mult if r.label == 1 else spoof_mult
        for i in range(n):
            groups[severity_for_copy(i, n)].append(r)
    return groups


class OnlineAugmentedData:
    """Epoch iterator over severity-homogeneous augmented batches."""

    def __init__(self, records: Sequence[Record], *, live_mult: int = 8,
                 spoof_mult: int = 2, batch_size: int = 128,
                 img_size: int = 224, num_workers: int = 8,
                 prefetch_depth: int = 4, seed: int = 42):
        self.groups = expand_records(records, live_mult, spoof_mult)
        self.seed = seed
        active = {g: rs for g, rs in self.groups.items() if rs}
        # the decode budget is PER RUN, not per pipe: four concurrent
        # group pipes each spinning the full num_workers threads (and
        # prefetch queues) would 4x the configured host load
        per_workers = max(1, num_workers // max(len(active), 1))
        per_prefetch = max(1, prefetch_depth // max(len(active), 1))
        self.pipes = {}
        for j, (g, rs) in enumerate(active.items()):
            if len(rs) < batch_size:
                # a tier smaller than one batch would be SILENTLY
                # dropped by drop_last (steps_per_epoch == 0) — wrap-pad
                # it to one full batch instead (duplicates within the
                # batch; the engine's online_batches pads the same way)
                log.warning(
                    "online group %r has %d records < batch_size %d — "
                    "wrap-padding to one full batch", g, len(rs),
                    batch_size)
                rs = [rs[i % len(rs)] for i in range(batch_size)]
            # 131071 * j: additive seeds collide across (group, epoch)
            # pairs (seed+j+e == seed+j'+e' whenever j+e == j'+e'),
            # correlating permutations that must be independent
            self.pipes[g] = DataPipeline(
                rs, batch_size=batch_size, img_size=img_size,
                resize="exact", num_workers=per_workers,
                prefetch_depth=per_prefetch, shuffle=True,
                drop_last=True, seed=seed + 131071 * (j + 1))

    @property
    def steps_per_epoch(self) -> int:
        return sum(p.steps_per_epoch for p in self.pipes.values())

    def batches(self, epoch: int, *, skip: int = 0) -> Iterator[tuple]:
        """Yield (group, {"image": u8, "label": i32}) in a seeded
        interleaved order.

        ``skip`` drops the first ``skip`` interleaved batches (mid-epoch
        resume): the group sequence is seeded per epoch, so the skipped
        prefix splits into exact per-group batch counts that each pipe
        skips pre-decode."""
        if skip < 0:
            raise ValueError(f"skip must be >= 0, got {skip}")
        order: List[str] = []
        for g, p in self.pipes.items():
            order.extend([g] * p.steps_per_epoch)
        np.random.default_rng(self.seed + 977 * epoch).shuffle(order)
        skip = min(skip, len(order))
        consumed = {g: order[:skip].count(g) for g in self.pipes}
        iters = {g: p.batches(epoch, skip=consumed[g])
                 for g, p in self.pipes.items()}
        for g in order[skip:]:
            try:
                yield g, next(iters[g])
            except StopIteration:  # pragma: no cover - drop_last guards
                continue
