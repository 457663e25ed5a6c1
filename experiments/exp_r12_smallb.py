"""Round-12: settle the small-batch serving regime map (the
make_serving_fn router) with position-controlled repeats.

exp_r9_lowlat_batchgrid measured batch-grid LOSING at B=4/8/16
(~0.50 ms/img vs per-item lowlat's 0.275) but WINNING at B=2
(0.233 ms/img) — a surprising kink.  Missing from the map entirely:
fastserve at B=2/4 (round 7 only measured B=1/8).  This probe runs
every contender at B=2 and B=4 twice each, interleaved (A B C A B C),
so same-session position drift (BENCH_NOTES round-5 relay rules) shows
up as disagreement between the repeats rather than silently biasing
one contender.

Contenders per batch size: batch_grid, per-item lowlat, fastserve.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r12_smallb.py
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
        prepare_lowlat, serving_forward, serving_forward_lowlat,
        serving_forward_lowlat_batch)
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
    prepared = prepare_lowlat(folded["params"], batch_grid=True)

    @jax.jit
    def batchgrid(prep, batch_u8):
        return {"prob1": serving_forward_lowlat_batch(prep, batch_u8)}

    @jax.jit
    def batchgrid_c2(prep, batch_u8):
        return {"prob1": serving_forward_lowlat_batch(prep, batch_u8,
                                                      chunk_size=2)}

    @jax.jit
    def peritem(prep, batch_u8):
        return {"prob1": serving_forward_lowlat(prep, batch_u8)}

    @jax.jit
    def fast(v, batch_u8):
        return {"prob1": serving_forward(v["params"], batch_u8)}

    contenders = [
        ("batchgrid", batchgrid, prepared),
        ("batchgrid_c2", batchgrid_c2, prepared),
        ("peritem", peritem, prepared),
        ("fastserve", fast, folded),
    ]

    # compile everything up front so no contender pays first-program tax
    rng = np.random.default_rng(0)
    for bs in (2, 4):
        u8 = jnp.asarray(
            rng.integers(0, 256, (bs, 224, 224, 3), dtype=np.uint8))
        for name, fn, arg in contenders:
            t0 = time.time()
            np.asarray(fn(arg, u8)["prob1"])
            print(f"warm {name} b{bs}: {time.time()-t0:.1f}s", flush=True)

    results = {}
    for bs in (2, 4):
        for rep in (1, 2):
            for name, fn, arg in contenders:
                r = benchmark_device_latency(fn, arg, batch_size=bs, n1=200)
                key = f"{name}_b{bs}_rep{rep}"
                results[key] = round(r["ms_per_image"], 4)
                print(key, json.dumps(r), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
