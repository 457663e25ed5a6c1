"""Round-22 probe: attention-backward dots in the input dtype.

The round-20 XProf anatomy pinned the Pallas attention-block backward
at 16.6 ms/step running 34 TF/s — and the kernel's four big dots
(dv, dw, dq, dk) all ran f32 x f32, which Mosaic lowers to multi-pass
MXU sequences.  The kernel now runs every dot in the INPUT dtype with
f32 accumulation (bf16 on the training path), mirroring the forward's
w.astype(v.dtype) rule.  This measures:

  (a) the isolated 12-layer backward at the shipped block_b — directly
      comparable to exp_r21's old-kernel sweep numbers;
  (b) the full train step (erf + tanh, interleaved reps) vs the
      123.1 / 112.7 ms baselines.

Relay rules per BENCH_NOTES: differenced N vs 3N timing, interleaved
repeats, scalar-bounded fetches.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r22_bwd_dtype.py
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
        benchmark_train_step)
    from vit_spoof_detection_pda_tpu.ops import attention as att

    results = {}
    rng = np.random.default_rng(0)

    # ---- (a) isolated backward, exp_r21 protocol (block_b shipped = 2)
    B, T, H, D = 128, 197, 12, 768
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * D)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)

    @jax.jit
    def bwd_only(qkv_in, g_in):
        return att._backward_qkv(qkv_in, g_in, H)

    t0 = time.time()
    np.asarray(jnp.sum(bwd_only(qkv, g)[:, :1, :1]))
    print(f"warm bwd (input-dtype dots): {time.time()-t0:.1f}s", flush=True)

    def timed(fn, n):
        t0 = time.perf_counter()
        outs = [fn(qkv, g) for _ in range(n)]
        np.asarray(outs[-1][0, 0, 0])
        return time.perf_counter() - t0

    for rep in (1, 2, 3):
        t1, t2 = timed(bwd_only, 30), timed(bwd_only, 90)
        ms = (t2 - t1) / 60 * 1000
        results[f"bwd12x_inputdtype_rep{rep}"] = round(ms * 12, 3)
        print(f"bwd input-dtype rep{rep}: {ms:.3f} ms/call "
              f"({ms*12:.2f} ms/12-layer)", flush=True)

    # ---- (b) full train step, interleaved erf/tanh
    for rep in (1, 2):
        for gelu in ("erf", "tanh"):
            r = benchmark_train_step(gelu=gelu, iters=20)
            key = f"train_step_{gelu}_rep{rep}"
            results[key] = round(r["ms_per_step"], 2)
            print(key, json.dumps(r), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
