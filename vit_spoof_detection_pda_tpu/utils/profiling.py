"""Profiling / tracing hooks (SURVEY.md §5: the reference has only tqdm
postfixes; here: jax.profiler TensorBoard traces + named annotations +
a lightweight step timer feeding the metric stream)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

log = logging.getLogger(__name__)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf.

    No-op when log_dir is falsy, so callers can pass
    ``config.telemetry.profile_dir`` straight through.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    log.info("profiler trace started -> %s", log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named region that shows up on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


_MEM_UNAVAILABLE = False


def device_memory_gb(device=None) -> Optional[float]:
    """Current device HBM in use, in GB — the TPU equivalent of the
    reference's per-step ``gpu_mem`` tqdm postfix
    (train_advanced.py:348-352, ``torch.cuda.memory_allocated()``).

    Returns None (and stops trying) where the backend exposes no
    ``memory_stats`` (CPU; some relay transports) — callers can emit the
    key conditionally.  The stats call is host-local on real TPUs but
    may round-trip on relayed backends, so call it at log cadence, not
    per step.
    """
    global _MEM_UNAVAILABLE
    if _MEM_UNAVAILABLE:
        return None
    import jax

    try:
        dev = device or jax.local_devices()[0]
        stats = dev.memory_stats()
        if not stats or "bytes_in_use" not in stats:
            raise AttributeError("no bytes_in_use")
        return float(stats["bytes_in_use"]) / 1e9
    except (AttributeError, KeyError, NotImplementedError, TypeError):
        # genuine capability gap: the backend will never expose the
        # stats — stop asking
        _MEM_UNAVAILABLE = True
        log.debug("device memory stats unavailable on this backend")
        return None
    except Exception as e:  # noqa: BLE001 - transient (relay hiccup etc.)
        # do NOT latch: a single timeout at one log boundary must not
        # disable HBM telemetry for the rest of a long-running job
        log.debug("device memory stats probe failed transiently: %s", e)
        return None


class StepTimer:
    """Rolling step timer: feeds steps/sec into the metric stream without
    device syncs (wall-clock between host-side step submissions)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        if self._times:
            return len(self._times) / sum(self._times)
        return None
