"""Inference latency / throughput benchmarks.

Two protocols:

1. `benchmark_single_image` — the reference's protocol
   (additional_analysis.py:184-315): N images, one at a time, wall-clock
   per image, batch size 1; stats -> ``inference_time_benchmark.json``
   + ``inference_time_comparison.csv`` (same keys/columns).  The
   reference decodes OUTSIDE its timer (Image.open before start_time,
   :264-266) and times transform + H2D + forward; here decode+resize
   are fused in one host call, so both sit outside the timer and the
   timed region is H2D + on-device normalize + forward (documented
   deviation: the reference's ~0.5 ms host resize/ToTensor is replaced
   by the on-device normalize, which IS timed).
2. `benchmark_throughput` — compiled steady-state batched inference with
   on-device preprocessing (the ">10x 184 FPS" north star, BASELINE.md).

On the experimental axon TPU platform, completion is bounded with a host
fetch (block_until_ready can return early there).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from ..data.loader import decode_image
from ..data.manifest import Record
from ..eval.runner import make_infer_fn

log = logging.getLogger(__name__)


def _stats_ms(times_s) -> dict:
    t = np.asarray(times_s) * 1000.0
    return {
        "mean_time_ms": float(np.mean(t)),
        "std_time_ms": float(np.std(t)),
        "min_time_ms": float(np.min(t)),
        "max_time_ms": float(np.max(t)),
        "median_time_ms": float(np.median(t)),
        "fps": float(1000.0 / np.mean(t)),
        "total_samples": len(t),
    }


def benchmark_single_image(module, variables, records: Sequence[Record], *,
                           n_images: int = 100, img_size: int = 224
                           ) -> dict:
    """Per-image wall-clock incl. preprocessing, bs=1 (reference
    protocol: 50 live + 50 spoof, additional_analysis.py:259-277)."""
    import jax.numpy as jnp

    live = [r for r in records if r.label == 1][: n_images // 2]
    spoof = [r for r in records if r.label == 0][: n_images // 2]
    sample = live + spoof
    infer = make_infer_fn(module)

    # compile once outside the timed region (the reference's first-call
    # CUDA warmup is likewise excluded by its warm cache); fetch a LEAF,
    # not the dict — np.asarray(dict) builds a 0-d object array without
    # awaiting the device, leaking the warmup into the first sample
    warm = decode_image(sample[0].path, img_size)
    np.asarray(infer(variables, jnp.asarray(warm[None]))["prob1"])

    times = []
    for r in sample:
        u8 = decode_image(r.path, img_size)  # outside the timer, like
        t0 = time.perf_counter()             # the reference's Image.open
        out = infer(variables, jnp.asarray(u8[None]))
        np.asarray(out["prob1"])          # bound by host fetch
        times.append(time.perf_counter() - t0)
    return _stats_ms(times)


def benchmark_throughput(module, variables, *, batch_size: int = 128,
                         img_size: int = 224, iters: int = 20,
                         fastserve: bool = False) -> dict:
    """Compiled steady-state img/s with on-device preprocessing.

    ``fastserve=True`` times the bf16 serving fast path instead
    (models/fastserve.py: folded normalization + fused attention-block
    Pallas kernels + tanh GELU — the bench.py configuration); only valid
    for the flagship ViT layout."""
    import jax
    import jax.numpy as jnp

    if fastserve:
        # the eval runner owns fastserve dispatch (module-type check,
        # geometry kwargs, linear-head routing, non-TPU fail-fast) —
        # a local re-implementation hardcoded B/16 defaults and crashed
        # on ViTLinearHead / non-default geometry
        from ..eval.runner import make_fastserve_infer
        infer, variables = make_fastserve_infer(module, variables)
    else:
        infer = make_infer_fn(module)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(
        0, 256, (batch_size, img_size, img_size, 3), dtype=np.uint8))
    np.asarray(infer(variables, batch)["prob1"])     # warmup/compile

    t0 = time.perf_counter()
    outs = [infer(variables, batch) for _ in range(iters)]
    np.asarray(outs[-1]["prob1"])
    dt = (time.perf_counter() - t0) / iters
    out = {
        "batch_size": batch_size,
        "ms_per_batch": dt * 1000.0,
        "images_per_second": batch_size / dt,
    }
    fl = vit_flops_per_image(module, img_size)
    if fl is not None:
        out["achieved_tflops"] = float(
            f"{fl * out['images_per_second'] / 1e12:.3g}")
    return out


def vit_flops_per_image(module, img_size: int) -> Optional[float]:
    """Analytic FORWARD FLOPs/image for the ViT family (multiply-adds
    count 2): patch-embed GEMM + per-layer QKV / QK^T / AV / proj / MLP
    GEMMs + head (LN/softmax/GELU vector FLOPs are <1% and omitted —
    the standard transformer-FLOPs convention).  ViT-B/16 @ 224 ->
    ~35.2 GFLOP (= the published 17.6 GMACs x 2).  Returns None for non-ViT modules; used for the
    ``achieved_tflops`` observability fields in the benchmark outputs
    (the MFU numbers BENCH_NOTES.md quotes by hand: peak bf16 on a v5e
    chip is 197 TFLOP/s)."""
    p = getattr(module, "patch_size", None)
    d = getattr(module, "embed_dim", None)
    depth = getattr(module, "depth", None)
    if not (p and d and depth):
        return None
    t = (img_size // p) ** 2 + 1
    mlp = int(d * getattr(module, "mlp_ratio", 4.0))
    per_layer = (2 * t * d * 3 * d        # fused QKV
                 + 2 * t * t * d          # Q K^T
                 + 2 * t * t * d          # A V
                 + 2 * t * d * d          # proj
                 + 2 * t * d * mlp * 2)   # fc1 + fc2
    embed = 2 * (t - 1) * (p * p * 3) * d
    hidden = getattr(module, "hidden", 0)
    ncls = getattr(module, "num_classes", 2)
    head = 2 * d * hidden + 2 * hidden * ncls if hidden else 2 * d * ncls
    return float(embed + depth * per_layer + head)


def benchmark_train_step(module=None, *, batch_size: int = 128,
                         img_size: int = 224, iters: int = 10,
                         loss_type: str = "focal", gelu: str = "erf",
                         fused: Optional[bool] = None) -> dict:
    """Steady-state compiled TRAIN-step throughput: forward + backward +
    clip + AdamW + metrics as one program (train/step.py) on synthetic
    normalized batches — the trainer's hot loop (reference
    train_advanced.py:315-365), productized from the exp_r*_step
    measurement scripts (BENCH_NOTES rounds 2-6: 123.1 ms erf /
    112.7 ms tanh at B=128 on v5e).

    ``fused`` forces the fused-block Pallas training forward
    (models/fasttrain.py) on or off; default auto (on where available —
    single TPU chip).  ``gelu="tanh"`` selects the fast serving-parity
    profile like ``model.gelu`` in training configs.
    """
    import jax
    import jax.numpy as jnp

    from ..models.vit import ViTAntiSpoof
    from ..ops import losses
    from ..train.state import create_train_state, make_optimizer
    from ..train.step import make_train_step

    if module is None:
        module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu=gelu)
    state = create_train_state(module, make_optimizer(3e-4),
                               jax.random.PRNGKey(0),
                               input_shape=(1, img_size, img_size, 3))
    if fused is None:
        from ..models.fasttrain import fast_apply_available
        fused = fast_apply_available(module)
    if fused:
        from ..models.fasttrain import make_apply
        state = state.replace(apply_fn=make_apply(module))
    step = make_train_step(losses.make_loss_fn(loss_type),
                           has_batch_stats=state.batch_stats is not None)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal(
            (batch_size, img_size, img_size, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, batch_size,
                                          dtype=np.int64).astype(np.int32)),
    }
    state, metrics = step(state, batch)          # compile + warmup
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    float(metrics["loss"])                       # one scalar sync bound
    dt = (time.perf_counter() - t0) / iters
    out = {
        "batch_size": batch_size,
        "fused_forward": bool(fused),
        "gelu": gelu,
        "ms_per_step": dt * 1000.0,
        "images_per_second": batch_size / dt,
    }
    fl = vit_flops_per_image(module, img_size)
    if fl is not None:
        # fwd + bwd ~ 3x fwd GEMM FLOPs (the standard training-FLOPs
        # convention: dL/dx and dL/dW each re-run every GEMM)
        out["achieved_tflops"] = float(
            f"{3 * fl * out['images_per_second'] / 1e12:.3g}")
    from ..utils.profiling import device_memory_gb
    mem = device_memory_gb()
    if mem is not None:
        out["device_mem_gb"] = round(mem, 3)
    return out


def benchmark_device_latency(infer, variables, *, batch_size: int = 1,
                             img_size: int = 224, n1: int = 200,
                             repeats: int = 3,
                             loop_iters: int = 0) -> dict:
    """Steady-state per-execution device latency at a given batch size.

    The reference's 5.43 ms / 184 FPS headline (additional_analysis.py:
    184-315, results/inference_time_benchmark.json) is a bs=1 wall-clock
    protocol.  On this platform wall-clock includes the axon relay's
    ~37 ms round trip, which measures the tunnel, not the model — so the
    per-image number uses the relay-correct differenced protocol
    (BENCH_NOTES.md): enqueue N then 3N executions, bound each with one
    scalar fetch, per-exec = (t(3N)-t(N))/(2N).  On a directly-attached
    TPU the same protocol is simply a steady-state measurement.

    ``loop_iters > 0`` switches to the DISPATCH-FREE protocol
    (BENCH_NOTES round 28 / exp_r30): that many executions run inside
    one compiled ``lax.fori_loop`` program (loop-invariant hoisting
    defeated by a data-dependent no-op image perturbation), so one
    dispatch covers ``loop_iters`` device executions — sub-ms kernels
    stay measurable even when the relay can only sustain ~1.5k
    dispatches/s.  Use when per-exec times approach the host's dispatch
    floor.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(
        0, 256, (batch_size, img_size, img_size, 3), dtype=np.uint8))

    if loop_iters:
        @jax.jit
        def looped(variables, img):
            def body(i, carry):
                acc, im = carry
                p = infer(variables, im)["prob1"]
                s = p.reshape(-1)[0].astype(jnp.float32)
                bump = (s > 2.0).astype(img.dtype)   # always 0; the
                # data dependence stops XLA hoisting the invariant body
                return acc + s, im + bump
            acc, _ = jax.lax.fori_loop(
                0, loop_iters, body, (jnp.float32(0.0), img))
            return acc

        float(looped(variables, batch))          # compile + warm

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                acc = looped(variables, batch)
            float(acc)
            return time.perf_counter() - t0

        k1 = max(1, n1 // loop_iters) or 1
        times = []
        for _ in range(repeats):
            t1, t2 = run(k1), run(3 * k1)
            times.append((t2 - t1) / (2 * k1 * loop_iters))
        ms = float(np.median(times)) * 1000.0
        return {"batch_size": batch_size, "ms_per_exec": ms,
                "ms_per_image": ms / batch_size,
                "images_per_second": 1000.0 * batch_size / ms,
                "loop_iters": loop_iters, "dispatch_free": True}

    out = infer(variables, batch)
    np.asarray(out["prob1"])                     # compile + warm

    def run(n):
        t0 = time.perf_counter()
        outs = [infer(variables, batch) for _ in range(n)]
        np.asarray(outs[-1]["prob1"])
        return time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t1, t2 = run(n1), run(3 * n1)
        times.append((t2 - t1) / (2 * n1))
    ms = float(np.median(times)) * 1000.0
    return {"batch_size": batch_size, "ms_per_exec": ms,
            "ms_per_image": ms / batch_size,
            "images_per_second": 1000.0 * batch_size / ms}


def benchmark_models(model_builders: Dict[str, callable],
                     records: Sequence[Record], *, output_dir: str,
                     n_images: int = 100, batch_size: int = 128,
                     img_size: int = 224,
                     include_throughput: bool = True) -> dict:
    """Run both protocols over a dict {name: () -> (module, variables)};
    writes the reference-format artifacts.

    ``inference_time_benchmark.json`` keeps EXACTLY the reference's
    seven stat keys per model (additional_analysis.py:279-300); the
    batched-throughput extension goes to its own
    ``throughput_benchmark.json``."""
    import pandas as pd

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    results = {}
    throughput = {}
    for name, build in model_builders.items():
        try:
            module, variables = build()
            r = benchmark_single_image(module, variables, records,
                                       n_images=n_images,
                                       img_size=img_size)
            if include_throughput:
                throughput[name] = benchmark_throughput(
                    module, variables, batch_size=batch_size,
                    img_size=img_size)
            results[name] = r
            log.info("%s: %.2f ms/img (%.1f FPS)%s", name,
                     r["mean_time_ms"], r["fps"],
                     f", batched {throughput[name]['images_per_second']:.0f}"
                     f" img/s" if include_throughput else "")
        except Exception as e:                       # noqa: BLE001
            log.exception("latency benchmark failed for %s: %s", name, e)

    with open(out / "inference_time_benchmark.json", "w") as f:
        json.dump(results, f, indent=2)
    if throughput:
        with open(out / "throughput_benchmark.json", "w") as f:
            json.dump(throughput, f, indent=2)
    pd.DataFrame([
        {"model": n, "mean_ms": r["mean_time_ms"], "fps": r["fps"],
         "std_ms": r["std_time_ms"]}
        for n, r in sorted(results.items(),
                           key=lambda kv: kv[1]["mean_time_ms"])
    ]).to_csv(out / "inference_time_comparison.csv", index=False)
    return results
