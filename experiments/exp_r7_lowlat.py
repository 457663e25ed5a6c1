"""Hardware probe: single-kernel whole-encoder serving (ops/lowlat.py).

Measures the B=1/4/8 device latency of serving_forward_lowlat vs the
round-7 fastserve numbers (B=1: 1.098 ms), and checks score parity vs
the per-layer path on the chip.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r7_lowlat.py
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
    from vit_spoof_detection_pda_tpu.models.fastserve import (
        prepare_lowlat, serving_forward, serving_forward_lowlat)
    from vit_spoof_detection_pda_tpu.models.vit import (
        ViTAntiSpoof, fold_normalization)
    from vit_spoof_detection_pda_tpu.utils.aot import cached_compile

    module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
    init = cached_compile(
        module.init,
        (jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)),
        key="bench_vit_b16_init")
    variables = init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 224, 224, 3), jnp.float32))
    folded = fold_normalization(variables)
    prepared = prepare_lowlat(folded["params"])

    @jax.jit
    def lowlat(prep, batch_u8):
        return {"prob1": serving_forward_lowlat(prep, batch_u8)}

    @jax.jit
    def fast(v, batch_u8):
        return {"prob1": serving_forward(v["params"], batch_u8)}

    # parity on the chip first (compiles lowlat at B=4)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (4, 224, 224, 3), dtype=np.uint8))
    t0 = time.time()
    a = np.asarray(lowlat(prepared, u8)["prob1"], np.float32)
    print(f"lowlat compile+first-exec: {time.time()-t0:.1f}s", flush=True)
    b = np.asarray(fast(folded, u8)["prob1"], np.float32)
    print("parity max|diff|:", float(np.max(np.abs(a - b))),
          "scores:", a.tolist(), flush=True)
    assert np.max(np.abs(a - b)) < 0.02

    results = {}
    for bs, n1 in [(1, 400), (4, 200), (8, 200)]:
        r = benchmark_device_latency(lowlat, prepared, batch_size=bs, n1=n1)
        results[f"lowlat_b{bs}"] = r
        print(f"lowlat_b{bs}", json.dumps(r), flush=True)

    print(json.dumps({
        "fastserve_b1_ms": 1.098,
        "lowlat_b1_ms": round(results["lowlat_b1"]["ms_per_image"], 3),
        "speedup_vs_fastserve": round(
            1.098 / results["lowlat_b1"]["ms_per_image"], 2),
        "speedup_vs_ref_5.43ms": round(
            5.43 / results["lowlat_b1"]["ms_per_image"], 2),
    }))


if __name__ == "__main__":
    main()
