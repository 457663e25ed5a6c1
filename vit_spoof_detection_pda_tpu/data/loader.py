"""Host decode + prefetch pipeline.

The reference feeds its GPU from 28 forked DataLoader workers doing PIL
decode + full CPU transform chains (train_advanced.py:554-573).  Here the
host does the MINIMUM — JPEG/PNG decode and a fixed-size resize — and
everything else (augmentation, normalization) runs on device.  A thread
pool decodes ahead of the device through a bounded queue, and batches can
be double-buffered onto the device (`prefetch_to_device`).

Behavior parity: corrupt files fall back to a black image with a logged
warning instead of crashing the epoch (reference train_advanced.py:131-134,
test.py:145-149).

Multi-host DP: `shard_for_host` slices the record list by
``jax.process_index()`` so each host decodes only its share.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Iterator, List, Sequence

import numpy as np

from .manifest import Record

log = logging.getLogger(__name__)


def decode_image(path: str, size: int, resize: str = "exact") -> np.ndarray:
    """Decode to uint8 RGB and resize; always returns (size, size, 3).

    resize="exact": (size, size) — the eval transform's Resize((S,S))
    (test.py:158).  resize="shorter": shorter side -> size keeping
    aspect (the train transform's Resize(256) before RandomCrop,
    train_advanced.py:167), then center-crop the LONGER side to size —
    an intentional deviation: torch crops at batch time, but the device
    pipeline needs static shapes, so the crop-to-square happens here and
    the on-device RandomCrop(224) crops within the 256x256 result.

    Black-image fallback on any decode failure.

    Fast path: the native C++ decoder (data/native) — libjpeg DCT-domain
    prescale + fused bilinear resize, GIL released for the whole call.
    PIL handles whatever the native path declines.
    """
    try:
        from .native import native_decode
        out = native_decode(path, size, resize)
        if out is not None:
            return out
    except Exception as e:                       # noqa: BLE001
        # the fallback contract covers the NATIVE path too (e.g. a
        # cached _decoder.so whose source was removed raises from the
        # rebuild check) — PIL gets its turn, then black-frame
        log.warning("native decode raised for %s (%s) — PIL fallback",
                    path, e)

    from PIL import Image
    try:
        with Image.open(path) as im:
            return _pil_to_sized_rgb(im, size, resize)
    except Exception as e:                       # noqa: BLE001
        log.warning("decode failed for %s (%s) — black fallback", path, e)
        return np.zeros((size, size, 3), np.uint8)


def _pil_to_sized_rgb(im, size: int, resize: str) -> np.ndarray:
    """RGB-convert + resize an open PIL image to (size, size, 3) uint8
    with the same geometry as the native decoder (decode_image docstring
    for the resize semantics)."""
    from PIL import Image

    im = im.convert("RGB")
    if resize == "exact":
        im = im.resize((size, size), Image.BILINEAR)
    else:
        w, h = im.size
        # half-away-from-zero like the native path's lround
        # (decoder.cpp) — Python round() is banker's rounding
        # and disagrees on exact .5 scales (e.g. 65*32/64),
        # which would give the two decoders different grids
        if w <= h:
            nw, nh = size, max(1, int(h * size / w + 0.5))
        else:
            nw, nh = max(1, int(w * size / h + 0.5)), size
        im = im.resize((nw, nh), Image.BILINEAR)
        left = (nw - size) // 2
        top = (nh - size) // 2
        im = im.crop((left, top, left + size, top + size))
    return np.asarray(im, dtype=np.uint8)


def decode_image_bytes(data: bytes, size: int,
                       resize: str = "exact") -> np.ndarray:
    """Decode in-memory image bytes to (size, size, 3) uint8 RGB.

    The serving-daemon flavor of :func:`decode_image`: same geometry,
    but RAISES ``ValueError`` on undecodable input instead of the
    dataset pipeline's black-image fallback — a scoring service must
    reject a corrupt upload, not silently score a black frame."""
    import io

    from PIL import Image
    try:
        with Image.open(io.BytesIO(data)) as im:
            return _pil_to_sized_rgb(im, size, resize)
    except Exception as e:                       # noqa: BLE001
        raise ValueError(f"undecodable image bytes ({e})") from e


def shard_for_host(records: Sequence[Record]) -> List[Record]:
    """Slice the dataset for this host in a multi-host run.

    Every host gets EXACTLY ``n // process_count`` records (the tail
    remainder, < process_count records, is dropped): a 1-record skew
    would make per-host steps_per_epoch differ whenever the sizes
    straddle a batch boundary, and the host with one extra step would
    hang in its gradient all-reduce while the others have moved on."""
    import jax
    n_proc = jax.process_count()
    if n_proc == 1:
        return list(records)
    idx = jax.process_index()
    per = len(records) // n_proc
    if per == 0 and records:
        # every host would get [] and die later inside sklearn's
        # splitter with an unrelated-looking error
        raise ValueError(
            f"dataset of {len(records)} records is smaller than the "
            f"{n_proc}-process host count — nothing to shard")
    return list(records)[idx::n_proc][:per]


def epoch_order(n: int, epoch: int, seed: int,
                shuffle: bool) -> np.ndarray:
    """The seeded per-epoch sample order — ONE definition shared by the
    threaded pipeline and the shard store (data/shards.py), so their
    documented shuffle parity is structural, not coincidental."""
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(idx)
    return idx


def epoch_limit(n: int, batch_size: int, drop_last: bool) -> int:
    """Number of samples an epoch serves under the drop_last policy."""
    return (n // batch_size) * batch_size if drop_last else n


def steps_for(n: int, batch_size: int, drop_last: bool) -> int:
    return (epoch_limit(n, batch_size, drop_last)
            + batch_size - 1) // batch_size


class DataPipeline:
    """Threaded decode pipeline yielding uint8 batches.

    One epoch = one call to `batches()`.  Shuffling is seeded per epoch
    (deterministic and resumable).  `drop_last` mirrors the reference's
    train loader (train_advanced.py:561).
    """

    def __init__(self, records: Sequence[Record], *, batch_size: int,
                 img_size: int = 224, resize: str = "exact",
                 num_workers: int = 8, prefetch_depth: int = 4,
                 shuffle: bool = False, drop_last: bool = False,
                 seed: int = 42):
        self.records = list(records)
        self.batch_size = batch_size
        self.img_size = img_size
        self.resize = resize
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = prefetch_depth
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed

    @property
    def steps_per_epoch(self) -> int:
        return steps_for(len(self.records), self.batch_size,
                         self.drop_last)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        return epoch_order(len(self.records), epoch, self.seed,
                           self.shuffle)

    def batches(self, epoch: int = 0, *, skip: int = 0) -> Iterator[dict]:
        """Yield {"image": uint8 [B,S,S,3], "label": int32 [B],
        "index": int64 [B]} with background decoding.

        ``skip`` drops the first ``skip`` batches of the epoch BEFORE
        decode (mid-epoch resume: the per-epoch order is seeded, so the
        remaining batches are exactly the ones an uninterrupted epoch
        would have served after that point)."""
        if skip < 0:
            raise ValueError(f"skip must be >= 0, got {skip}")
        order = self._epoch_order(epoch)
        limit = epoch_limit(len(order), self.batch_size, self.drop_last)
        starts = list(range(0, limit, self.batch_size))[skip:]
        if not starts:
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        stop = threading.Event()
        err: list = []

        def _put(item) -> bool:
            """Bounded put that gives up when the consumer is gone —
            a plain q.put would wedge the producer forever on a full
            queue after an aborted epoch (thread + batch leak)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            import concurrent.futures as futures
            try:
                with futures.ThreadPoolExecutor(self.num_workers) as pool:
                    for s in starts:
                        if stop.is_set():
                            break
                        idxs = order[s:s + self.batch_size]
                        imgs = list(pool.map(
                            lambda i: decode_image(
                                self.records[i].path, self.img_size,
                                self.resize),
                            idxs))
                        labels = np.asarray(
                            [self.records[i].label for i in idxs], np.int32)
                        if not _put({"image": np.stack(imgs),
                                     "label": labels,
                                     "index": idxs.astype(np.int64)}):
                            break
            except BaseException as e:          # surfaced in the consumer
                err.append(e)
            finally:
                # the sentinel MUST land even if the body raised —
                # otherwise the consumer blocks forever on q.get()
                _put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if err:
                        raise RuntimeError(
                            "decode producer failed") from err[0]
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)


def prefetch_to_device(iterator, *, device_put_fn=None, depth: int = 2):
    """Keep `depth` batches in flight on the device (double buffering) —
    the TPU replacement for pin_memory + non_blocking H2D copies
    (train_advanced.py:323-324)."""
    import collections

    import jax

    put = device_put_fn or jax.device_put
    buf = collections.deque()
    for item in iterator:
        buf.append(put(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
