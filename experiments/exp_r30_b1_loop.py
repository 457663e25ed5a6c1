"""Dispatch-independent B=1 device latency (closes VERDICT r4 weak #2).

Rounds 25 and 28 could not re-certify the 0.265-0.30 ms B=1 band
because the current relay instance enqueues only ~1.4-1.5k execs/s —
per-execution timing measures tunnel dispatch, not the chip.  This
protocol removes dispatch from the measurement entirely: N iterations
of the full lowlat forward run INSIDE one compiled program
(lax.fori_loop), so one dispatch covers N device executions and
(t(K2) - t(K1)) / ((K2 - K1) * N) is pure device time + O(loop
overhead).

Loop-invariant hoisting is defeated by a data dependence XLA cannot
prove away: each iteration adds `(score > 2)` (always 0, but
data-dependent) to the image, so the body cannot be CSE'd/hoisted —
every iteration executes the whole kernel on bit-identical pixels.

Flavors: enc-only (the shipped B=1 default) and fold-ends, matching
the round-12 protocol rows (BENCH_NOTES).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python experiments/exp_r30_b1_loop.py
"""

import time
import sys

for p in ("/root/repo", "/root/.axon_site"):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.models.fastserve import (  # noqa: E402
    prepare_lowlat, serving_forward_lowlat)
from vit_spoof_detection_pda_tpu.models.vit import (  # noqa: E402
    ViTAntiSpoof, fold_normalization)

N = 100          # kernel executions per compiled program


def build(fold_ends: bool):
    module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.float32))
    folded = fold_normalization(variables)
    prepared = prepare_lowlat(folded["params"], depth=12,
                              fold_ends=fold_ends)
    flavor = "fold-ends" if "aux" in prepared else "enc-only"

    @jax.jit
    def loop(prepared, img):
        def body(i, carry):
            acc, im = carry
            s = serving_forward_lowlat(prepared, im)
            bump = (s[0] > 2.0).astype(jnp.uint8)   # always 0; not provable
            return acc + s[0], im + bump
        acc, _ = jax.lax.fori_loop(0, N, body,
                                   (jnp.float32(0.0), img))
        return acc
    return flavor, prepared, loop


def measure(loop, prepared, img, k1=3, k2=9):
    """Relay-differenced (exp_r25 protocol): window A = k1 programs,
    window B = k2 programs, each ended by one scalar fetch; the fetch
    and enqueue constants cancel in (B - A)/(k2 - k1)."""
    acc = loop(prepared, img)            # compile + warm
    float(acc)
    t0 = time.perf_counter()
    for _ in range(k1):
        acc = loop(prepared, img)
    float(acc)
    t1 = time.perf_counter()
    for _ in range(k2):
        acc = loop(prepared, img)
    float(acc)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / ((k2 - k1) * N)


def main():
    img = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (1, 224, 224, 3), dtype=np.uint8))
    for fold_ends in (False, True):
        flavor, prepared, loop = build(fold_ends)
        # relay-differenced: (t(k1+k2) - t(k1)) / (k2 - k1) programs,
        # each N executions
        reps = []
        for rep in range(3):
            ms = measure(loop, prepared, img) * 1e3
            reps.append(ms)
            print(f"{flavor} rep{rep}: {ms:.3f} ms/exec "
                  f"({1000 / ms:.0f} img/s)", flush=True)
        med = sorted(reps)[1]
        print(f"[{flavor}] median {med:.3f} ms/exec device-side "
              f"(N={N} in-program iterations, dispatch excluded); "
              f"vs ref 5.43 ms = {5.43 / med:.1f}x", flush=True)


if __name__ == "__main__":
    main()
