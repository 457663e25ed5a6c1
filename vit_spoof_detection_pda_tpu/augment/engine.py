"""On-device differential augmentation engine.

The reference pipeline (augment_data.py:182-262) round-trips EVERY
augmented image through host CPU one at a time: Kornia batch op, then a
Python loop of per-image D2H copy -> CPU denormalize -> PIL JPEG encode
(augment_data.py:201-207) — the serialization bottleneck SURVEY.md §3.3
identifies.  Here the whole copy fan-out for a batch stays on device
(augment -> clamp -> uint8) and only finished uint8 batches cross to the
host, where a thread pool JPEG-encodes while the device works on the next
batch.  Online mode skips disk entirely and feeds training directly —
the HBM-saturation path (BASELINE.md north star).
"""

from __future__ import annotations

import concurrent.futures as futures
import logging
from pathlib import Path
from typing import Iterable, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import image as I
from .policy import CHAINS, make_batch_augmenter, severity_for_copy

log = logging.getLogger(__name__)


class AugmentEngine:
    """Compiled severity-tier augmenters + differential fan-out."""

    def __init__(self, live_augmentations: int = 8,
                 spoof_augmentations: int = 2, img_size: int = 224,
                 seed: int = 0):
        self.multipliers = {"live": live_augmentations,
                            "spoof": spoof_augmentations}
        self.img_size = img_size
        self.key = jax.random.PRNGKey(seed)
        self._augmenters = {lvl: make_batch_augmenter(lvl)
                            for lvl in CHAINS}
        self._counter = 0

    def _next_key(self):
        self._counter += 1
        return jax.random.fold_in(self.key, self._counter)

    # ------------------------------------------------------------------

    def augment_copies(self, batch01: jnp.ndarray, class_name: str
                       ) -> Iterator[Tuple[int, str, jnp.ndarray]]:
        """Yield (copy_index, severity, augmented [B,H,W,C] in [0,1]) for
        the class's multiplier (live x8 / spoof x2)."""
        if batch01.shape[1:3] != (self.img_size, self.img_size):
            raise ValueError(
                f"batch is {batch01.shape[1]}x{batch01.shape[2]} but the "
                f"engine was built for img_size={self.img_size} — the "
                "store's size contract would silently drift")
        n = self.multipliers[class_name]
        for aug_idx in range(n):
            level = severity_for_copy(aug_idx, n)
            out = self._augmenters[level](self._next_key(), batch01)
            yield aug_idx, level, out

    # ------------------------------------------------------------------

    def materialize(self, batches: Iterable[Tuple[list, np.ndarray]],
                    output_dir: str, class_name: str, *,
                    quality: int = 95, copy_originals: bool = True,
                    encode_workers: int = 8) -> int:
        """Offline mode: write `{stem}_aug{i}.jpg` (+ `{stem}_orig.jpg`)
        into `output_dir/class_name/` (the reference's on-disk contract,
        augment_data.py:201-204, 264-282).

        `batches`: iterator of (paths, uint8 [B,S,S,3]) from the data
        layer.  JPEG encoding overlaps device compute via a thread pool.

        Output names key on the path STEM (the reference's contract,
        augment_data.py:201-204) — duplicate stems across nested input
        dirs would overwrite each other, so collisions are detected and
        logged loudly (the reference silently loses those images).
        """
        out_dir = Path(output_dir) / class_name
        out_dir.mkdir(parents=True, exist_ok=True)
        saved = 0
        seen_stems: dict = {}
        # bounded pending-encode window: with no backpressure a fast
        # device outruns the encode threads and the job queue grows
        # toward the whole multi-GB output in host RAM (the reference
        # bounds this with max_queue_size, augment_data.py config)
        max_pending = max(encode_workers * 64, 256)
        with futures.ThreadPoolExecutor(encode_workers) as pool:
            jobs: list = []

            def drain(limit):
                nonlocal saved
                while len(jobs) > limit:
                    saved += jobs.pop(0).result()

            for paths, u8 in batches:
                for p in paths:
                    stem = Path(p).stem
                    prev = seen_stems.setdefault(stem, p)
                    if prev != p:
                        log.error(
                            "stem collision: %s and %s both write %s_*.jpg"
                            " — the later encode overwrites the earlier"
                            " (rename inputs or flatten the tree)",
                            prev, p, stem)
                batch01 = I.to_float(jnp.asarray(u8))
                if copy_originals:
                    # NATIVE-resolution originals, re-encoded from the
                    # source file like the reference (augment_data.py:
                    # 264-282) — the pipeline batch is already resized
                    # to img_size and would silently downscale them.
                    # Unreadable/virtual paths fall back to the batch
                    # array (still a valid _orig, just at img_size).
                    for p, arr in zip(paths, np.asarray(u8)):
                        jobs.append(pool.submit(
                            _reencode_original, Path(p), arr,
                            out_dir / f"{Path(p).stem}_orig.jpg", quality))
                for aug_idx, _lvl, aug in self.augment_copies(
                        batch01, class_name):
                    aug_u8 = np.asarray(I.to_uint8(aug))
                    for p, arr in zip(paths, aug_u8):
                        jobs.append(pool.submit(
                            _write_jpeg, arr,
                            out_dir / f"{Path(p).stem}_aug{aug_idx}.jpg",
                            quality))
                drain(max_pending)
            drain(0)
        log.info("materialized %d images into %s", saved, out_dir)
        return saved

    # ------------------------------------------------------------------

    def online_batches(self, batches: Iterable[Tuple[np.ndarray, np.ndarray]],
                       class_of_label, *, include_original: bool = True
                       ) -> Iterator[Tuple[jnp.ndarray, np.ndarray]]:
        """Online mode: for each (uint8 batch, labels) yield the original
        plus every augmented copy, all in [0,1] on device — feeding
        training without touching disk.

        `class_of_label(label) -> "live"|"spoof"` maps the label
        convention (canonical 1=live) onto multipliers.
        """
        for u8, labels in batches:
            batch01 = I.to_float(jnp.asarray(u8))
            if include_original:
                yield batch01, labels
            # group by class for the differential multiplier
            labels = np.asarray(labels)
            b_full = batch01.shape[0]
            for cls in ("live", "spoof"):
                idx = np.where(np.asarray(
                    [class_of_label(int(l)) == cls for l in labels]))[0]
                n = len(idx)
                if n == 0:
                    continue
                # pad the sub-batch to the FULL batch size by wrapping
                # indices: the augmenters are jitted, and a data-
                # dependent leading dim would recompile (~40s-8min on
                # the tunneled TPU) for nearly every live/spoof mix
                padded = batch01[np.resize(idx, b_full)]
                for _idx, _lvl, aug in self.augment_copies(padded, cls):
                    yield aug[:n], labels[idx]


def _reencode_original(src: Path, fallback_u8: np.ndarray, path: Path,
                       quality: int) -> int:
    """Native-resolution `_orig.jpg` (reference copy_original_images,
    augment_data.py:264-282: full-size PIL re-encode at q95); falls back
    to the pipeline's already-resized array for virtual/unreadable
    sources."""
    try:
        from PIL import Image
        arr = np.asarray(Image.open(src).convert("RGB"), np.uint8)
    except Exception:                           # noqa: BLE001
        log.debug("original %s unreadable — encoding the resized "
                  "pipeline copy", src)
        arr = fallback_u8
    return _write_jpeg(arr, path, quality)


def _write_jpeg(arr_u8: np.ndarray, path: Path, quality: int) -> int:
    try:
        from ..data.native import native_encode_jpeg
        data = native_encode_jpeg(arr_u8, quality)
        if data is not None:        # GIL-released libjpeg compress
            path.write_bytes(data)
            return 1
        from PIL import Image
        Image.fromarray(arr_u8).save(path, quality=quality)
        return 1
    except Exception as e:                      # noqa: BLE001
        log.error("error saving %s: %s", path, e)
        return 0


def print_statistics(input_dir: str, output_dir: str):
    """Before/after class counts, ratios, output size (reference
    print_statistics, augment_data.py:285-311)."""
    stats = {}
    for root, name in ((input_dir, "input"), (output_dir, "output")):
        rootp = Path(root)
        counts = {}
        total_bytes = 0
        for cls in ("live", "spoof"):
            n = 0
            # both extensions at any depth (nested session dirs count)
            for pattern in (f"**/{cls}/*.png", f"**/{cls}/*.jpg",
                            f"**/{cls}/*.jpeg"):
                for f in rootp.glob(pattern):
                    n += 1
                    total_bytes += f.stat().st_size
            counts[cls] = n
        # the reference prints "1:{spoof/live} (spoof:live)"
        # (augment_data.py:293) — key named for what it holds
        ratio = counts["spoof"] / counts["live"] if counts["live"] else 0.0
        stats[name] = {**counts, "ratio_spoof_to_live": ratio,
                       "gb": total_bytes / 1024 ** 3}
        log.info("%s: live=%d spoof=%d ratio=1:%.2f (spoof:live) "
                 "size=%.2fGB", name, counts["live"], counts["spoof"],
                 ratio, stats[name]["gb"])
    return stats
