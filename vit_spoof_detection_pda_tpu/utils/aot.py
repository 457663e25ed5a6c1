"""AOT executable cache: compile once, reload in seconds.

On this platform compilation goes through a remote compiler costing
minutes per full-model program, and the axon PJRT plugin bypasses jax's
persistent HLO-keyed compilation cache — so `bench.py`/serving paid a
3-8 minute cold start EVERY process (round-1 weak #6).  jax's
``serialize_executable`` round-trips the compiled PJRT executable
through bytes (verified working on the axon backend, experiments/
exp_r2_int8_probe.py), which lets us cache at the executable level
ourselves.

Usage::

    infer = cached_compile(fn, (params, batch), key="vit_b16_infer")
    out = infer(params, batch)

The cache key mixes the caller's name with a hash of the LOWERED
PROGRAM (so code changes can never reuse a stale executable) and the
jax version / backend / device kind; an incompatible entry deserializes
unsuccessfully and falls back to a fresh compile transparently.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle

import jax

log = logging.getLogger(__name__)

# per-user cache location: a predictable world-writable /tmp path would
# let another local user plant a malicious pickle under a guessable name
DEFAULT_CACHE_DIR = os.environ.get(
    "PAD_AOT_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                  "pad_aot"))


def _signature(lowered) -> str:
    """Cache key from the LOWERED PROGRAM plus the compile environment.

    Hashing the StableHLO text means any code change (model edit, kernel
    change, different constants) produces a new entry — a key built only
    from arg shapes would silently reuse a stale executable after a code
    change and benchmark the wrong program."""
    dev = jax.devices()[0]
    h = hashlib.sha256()
    h.update(lowered.as_text().encode())
    h.update("|".join([jax.__version__, jax.default_backend(),
                       getattr(dev, "device_kind", "?"),
                       str(jax.device_count())]).encode())
    return h.hexdigest()[:16]


class _Resilient:
    """Cached executable with a sticky recompile fallback."""

    def __init__(self, exe, lowered):
        self._exe = exe
        self._lowered = lowered
        self._compiled = None

    def __call__(self, *args):
        if self._exe is not None:
            try:
                return self._exe(*args)
            except TypeError:
                # caller-side argument mismatch (wrong shape/dtype/tree):
                # a fresh compile would raise the SAME error after paying
                # the minutes-long remote compile — surface it directly
                raise
            except Exception as e:                 # noqa: BLE001
                log.warning("cached executable failed at call time (%s) — "
                            "recompiling", e)
                self._exe = None
        if self._compiled is None:
            self._compiled = self._lowered.compile()
        return self._compiled(*args)


def cached_compile(fn, example_args: tuple, *, key: str,
                   cache_dir: str = None, static_argnums=()):
    """AOT-compile ``fn`` for ``example_args`` with an on-disk executable
    cache.  Falls back to a plain compile on any cache failure.

    The result is callable with the same arg structure MINUS any
    ``static_argnums`` positions: jax AOT executables bind static args
    at lowering time and reject them at call time (``compiled(x)``, not
    ``compiled(x, 5)``)."""
    from jax.experimental import serialize_executable as se

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError as e:
        # read-only HOME / bad PAD_AOT_CACHE: compile uncached, as the
        # cache-failure contract promises, instead of aborting
        log.warning("AOT cache dir %s unusable (%s) — compiling uncached",
                    cache_dir, e)
        return jax.jit(fn, static_argnums=static_argnums).lower(
            *example_args).compile()

    # Always TRACE (cheap, local) — tracing runs dispatch-time logic such
    # as ops.attention's pallas_calls accounting, which callers assert on;
    # only the expensive backend compile is skipped on a cache hit.  The
    # lowered program is also the cache key.
    lowered = jax.jit(fn, static_argnums=static_argnums).lower(
        *example_args)
    path = os.path.join(cache_dir, f"{key}-{_signature(lowered)}.jaxexec")

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            exe = se.deserialize_and_load(payload, in_tree, out_tree)
            log.info("AOT cache hit: %s", path)
            # call-time failures (e.g. the multi-device CPU backend
            # rejects single-device AOT binaries) fall back to a fresh
            # compile transparently
            return _Resilient(exe, lowered)
        except Exception as e:                     # noqa: BLE001
            log.warning("AOT cache entry %s unusable (%s) — recompiling",
                        path, e)

    compiled = lowered.compile()
    try:
        blob = pickle.dumps(se.serialize(compiled))
        # unique tmp per process: two concurrent writers sharing one
        # "<path>.tmp" can interleave and PUBLISH a corrupt entry
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        log.info("AOT cache write: %s (%.1f MB)", path, len(blob) / 1e6)
    except Exception as e:                         # noqa: BLE001
        log.warning("AOT cache write failed (%s) — continuing uncached", e)
    return compiled
