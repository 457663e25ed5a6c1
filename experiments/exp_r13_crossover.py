"""Round-13: pin the batch-grid(chunk2) -> fastserve router crossover.

exp_r12_smallb settled B=2/4 (batch-grid chunk2 wins: 0.23-0.25 ms/img
vs 0.28 per-item / 0.30-0.33 fastserve) and round-7 measured fastserve
at B=8 (0.263) and B=128 (0.216).  Unknown: where fastserve's
amortization crosses below batch-grid chunk2's flat ~0.25 ms/img.
This probe runs both contenders at B=8/16/32, plus fastserve at B=64,
interleaved repeats (A B A B) per the BENCH_NOTES round-5 relay rules.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r13_crossover.py
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
        prepare_lowlat, serving_forward, serving_forward_lowlat_batch)
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
    prepared = prepare_lowlat(folded["params"], batch_grid=True,
                              per_item=False)

    @jax.jit
    def batchgrid(prep, batch_u8):
        return {"prob1": serving_forward_lowlat_batch(prep, batch_u8)}

    @jax.jit
    def fast(v, batch_u8):
        return {"prob1": serving_forward(v["params"], batch_u8)}

    grid = [("batchgrid", batchgrid, prepared, (8, 16, 32)),
            ("fastserve", fast, folded, (8, 16, 32, 64))]

    rng = np.random.default_rng(0)
    for name, fn, arg, sizes in grid:
        for bs in sizes:
            u8 = jnp.asarray(
                rng.integers(0, 256, (bs, 224, 224, 3), dtype=np.uint8))
            t0 = time.time()
            np.asarray(fn(arg, u8)["prob1"])
            print(f"warm {name} b{bs}: {time.time()-t0:.1f}s", flush=True)

    results = {}
    for rep in (1, 2):
        for name, fn, arg, sizes in grid:
            for bs in sizes:
                r = benchmark_device_latency(fn, arg, batch_size=bs,
                                             n1=100)
                key = f"{name}_b{bs}_rep{rep}"
                results[key] = round(r["ms_per_image"], 4)
                print(key, json.dumps(r), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
