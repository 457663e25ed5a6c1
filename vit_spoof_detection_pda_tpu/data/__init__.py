"""Data layer (reference L0).

`manifest.py` — dataset scanners (raw subject tree, augmented flat store,
                test tree with subject ids), stratified split, manifest
                persistence.
`loader.py`   — host decode + prefetch pipeline feeding device arrays;
                black-image fallback on corrupt files; per-host sharding
                for multi-host DP.
`conventions.py` — the label-convention adapter (canonical 1=live vs the
                harness's 0=live/1=spoof; SURVEY.md §0 "label-convention
                trap").
`shards.py`   — pre-decoded uint8 shard store (decode once, feed epochs
                from memmaps; SURVEY.md §2.1 "ArrayRecord-style shards").
"""

from .conventions import (CANONICAL_LIVE, harness_labels, harness_scores,
                          to_canonical)
from .loader import DataPipeline, decode_image
from .manifest import (Record, scan_augmented, scan_raw, scan_test,
                       stratified_split, load_manifest, save_manifest)
from .shards import ShardStore

__all__ = [
    "Record", "scan_raw", "scan_augmented", "scan_test", "stratified_split",
    "load_manifest", "save_manifest", "DataPipeline", "decode_image",
    "ShardStore",
    "CANONICAL_LIVE", "harness_labels", "harness_scores", "to_canonical",
]
