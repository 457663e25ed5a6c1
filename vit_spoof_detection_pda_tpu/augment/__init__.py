"""Differential augmentation engine (reference L1, augment_data.py).

`policy.py`   — severity-tier op chains (heavy/medium/light), severity
                scheduler, differential live/spoof multiplier plan.
`engine.py`   — batched on-device augmentation: one compiled program per
                (batch, severity); offline materializer (JPEG shards) and
                online mode feeding training directly.
"""

from .policy import (
    heavy_chain, light_chain, medium_chain, severity_for_copy,
    differential_plan, make_batch_augmenter, train_time_chain,
)
from .engine import AugmentEngine  # noqa: F401

__all__ = [
    "heavy_chain", "medium_chain", "light_chain", "severity_for_copy",
    "differential_plan", "make_batch_augmenter", "train_time_chain",
    "AugmentEngine",
]
