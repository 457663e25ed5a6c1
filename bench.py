"""Headline benchmark: ViT-B/16 anti-spoofing inference throughput on one
chip, compiled steady state with on-device preprocessing.

Baseline: the reference's single-image latency benchmark measured 184.16
FPS for the fine-tuned ViT on an RTX A4500 including CPU preprocessing
(reference results/inference_time_benchmark.json, README.md:187;
additional_analysis.py:184-315).  The BASELINE.md north star is >10x that
(>1841 img/s/chip).

Protocol here: batch-128 uint8 input -> on-device normalize -> bf16
ViT-B/16 + head -> softmax scores, median over timed iterations after
warmup.  Prints ONE JSON line.
"""

import json
import time

import numpy as np

BASELINE_FPS = 184.16
BATCH = 128
WARMUP = 3
ITERS = 20


def _wait_for_backend(max_wait_s=600, probe_timeout=150, interval=60):
    """The tunneled TPU relay can flap (down for hours on 2026-08-17/18);
    a downed relay HANGS the first device query rather than erroring, so
    an unguarded run would stall the driver forever.  Probe the backend
    in a subprocess with a timeout and retry briefly; give up with a
    clear error instead of hanging."""
    import os
    import subprocess
    import sys

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.default_backend() == 'tpu'"],
                timeout=probe_timeout, env=dict(os.environ),
                capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            raise SystemExit(
                f"bench.py: TPU backend unreachable after {attempt} "
                f"probes over {max_wait_s:.0f}s (relay down?)")
        print(f"bench.py: TPU backend not up (attempt {attempt}); "
              "retrying...", file=sys.stderr)
        time.sleep(interval)


def main():
    _wait_for_backend()
    import jax

    # persistent compilation cache: the remote TPU compiler costs
    # minutes per full-model compile; cache across runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.models.vit import (
        ViTAntiSpoof, fold_normalization)

    # Serving configuration: bf16 policy, tanh GELU (within one bf16 ulp
    # of the erf default at activation magnitudes; saves ~12 ms/batch of
    # VPU transcendentals) and ImageNet normalization folded into the
    # patch-embed GEMM so the model consumes raw uint8 with no separate
    # normalize pass.
    from vit_spoof_detection_pda_tpu.utils.aot import cached_compile

    module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
    # init through the AOT executable cache too: on this relay the init
    # program alone costs ~70 s of remote compile (8 s on a cache hit)
    init = cached_compile(
        module.init,
        (jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)),
        key="bench_vit_b16_init")
    variables = init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 224, 224, 3), jnp.float32))
    variables = fold_normalization(variables)

    def infer_fn(params, batch_u8):
        # pure-functional serving forward: whole pre-LN attention
        # sub-layers run as single Pallas programs with VMEM-resident
        # weights (models/fastserve.py; parity-tested vs module.apply)
        from vit_spoof_detection_pda_tpu.models.fastserve import (
            serving_forward)
        return serving_forward(params, batch_u8)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 256, (BATCH, 224, 224, 3),
                                     dtype=np.uint8))
    params = variables["params"]

    # AOT executable cache: the remote compiler costs minutes per
    # full-model program.  The cache removes what is client-removable
    # (init 70 -> 8 s; compile -> deserialize); the relay still performs
    # a ~95 s server-side link at the FIRST execution of any full-model
    # executable per process, cached or not (measured both ways,
    # BENCH_NOTES.md round 2) — that floor is the platform's, not ours.
    infer = cached_compile(infer_fn, (params, batch),
                           key="bench_vit_b16_infer")

    # block_until_ready is unreliable on the experimental axon platform —
    # force a host fetch to bound each measurement.
    for _ in range(WARMUP):
        np.asarray(infer(params, batch))

    from vit_spoof_detection_pda_tpu.ops import attention as _att
    assert _att._context["pallas_calls"] > 0, (
        "benchmark silently fell back to dense attention — the headline "
        "number would not measure the Pallas path")

    # Relay-correct timing (BENCH_NOTES.md caveats): enqueue N
    # executions and fetch one scalar to bound the measurement, then
    # DIFFERENCE two run lengths so the ~37 ms relay round-trip of the
    # bounding fetch cancels instead of smearing ~2 ms into every
    # iteration: per-exec = (t(N2) - t(N1)) / (N2 - N1).
    def run(n):
        t0 = time.perf_counter()
        outs = [infer(params, batch) for _ in range(n)]
        np.asarray(outs[-1])
        return time.perf_counter() - t0

    times = []
    for _ in range(3):
        t1, t2 = run(ITERS), run(3 * ITERS)
        times.append((t2 - t1) / (2 * ITERS))

    med = float(np.median(times))
    fps = BATCH / med
    print(json.dumps({
        "metric": "vit_b16_infer_img_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
