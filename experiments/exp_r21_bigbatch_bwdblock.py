"""Round-21 probes: (a) fastserve at B=256/512 — the old-kernel B=256
rejection (BENCH_NOTES round 1: 2573 img/s at the 256-row kernel)
predates the 8-sublane 200-row tiles, so the headline batch shape is
re-checked once with the shipped kernels; (b) attention backward
block_b sweep — the forward swept 1/2/4 (1.57/1.42/1.64 ms, round 2)
but the backward kernel (16.6 ms/step at 34 TF/s, round-20 XProf) has a
different MXU/VPU balance and its block_b was never swept
independently.

Relay rules per BENCH_NOTES: differenced N vs 3N timing, interleaved
repeats (A B A B), scalar-bounded fetches.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r21_bigbatch_bwdblock.py
"""

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.analysis.latency import (
        benchmark_device_latency)
    from vit_spoof_detection_pda_tpu.models.fastserve import serving_forward
    from vit_spoof_detection_pda_tpu.models.vit import (
        ViTAntiSpoof, fold_normalization)
    from vit_spoof_detection_pda_tpu.ops import attention as att
    from vit_spoof_detection_pda_tpu.utils.aot import cached_compile

    module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
    init = cached_compile(
        module.init,
        (jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)),
        key="bench_vit_b16_init")
    variables = init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 224, 224, 3), jnp.float32))
    folded = fold_normalization(variables)

    @jax.jit
    def fast(v, batch_u8):
        return {"prob1": serving_forward(v["params"], batch_u8)}

    rng = np.random.default_rng(0)
    for bs in (128, 256, 512):
        u8 = jnp.asarray(
            rng.integers(0, 256, (bs, 224, 224, 3), dtype=np.uint8))
        t0 = time.time()
        np.asarray(fast(folded, u8)["prob1"])
        print(f"warm fastserve b{bs}: {time.time()-t0:.1f}s", flush=True)

    results = {}
    for rep in (1, 2):
        for bs in (128, 256, 512):
            r = benchmark_device_latency(fast, folded, batch_size=bs,
                                         n1=40 if bs >= 256 else 80)
            key = f"fastserve_b{bs}_rep{rep}"
            results[key] = round(r["ms_per_image"], 4)
            print(key, json.dumps(r), flush=True)

    # ---- (b) backward block_b sweep, isolated fused attention fwd+bwd
    B, T, H, D = 128, 197, 12, 768
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * D)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)

    orig = att._block_b_for
    step_fns = {}
    try:
        for bb in (2, 4, 8):
            att._block_b_for = lambda b, _bb=bb: _bb

            @jax.jit
            def bwd_only(qkv_in, g_in, _bb=bb):
                return att._backward_qkv(qkv_in, g_in, H)

            t0 = time.time()
            np.asarray(jnp.sum(bwd_only(qkv, g)[:, :1, :1]))
            print(f"warm bwd block_b={bb}: {time.time()-t0:.1f}s",
                  flush=True)
            step_fns[bb] = bwd_only
    finally:
        att._block_b_for = orig

    def timed(fn, n):
        t0 = time.perf_counter()
        outs = [fn(qkv, g) for _ in range(n)]
        np.asarray(outs[-1][0, 0, 0])
        return time.perf_counter() - t0

    for rep in (1, 2, 3):
        for bb, fn in step_fns.items():
            t1, t2 = timed(fn, 30), timed(fn, 90)
            ms = (t2 - t1) / 60 * 1000
            results[f"bwd12x_blockb{bb}_rep{rep}"] = round(ms * 12, 3)
            print(f"bwd block_b={bb} rep{rep}: {ms:.3f} ms/call "
                  f"({ms*12:.2f} ms/12-layer)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
