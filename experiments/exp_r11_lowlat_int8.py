"""Hardware probe: weight-only int8 encoder stream for the B=1
single-kernel latency mode (ops/lowlat.py pack_encoder_weights
weight_dtype=int8).

Hypothesis: at B=1 the lowlat kernel sits on the HBM weight-stream
floor (~162 MB bf16/image, BENCH_NOTES round 7; measured 0.377 ms vs
the ~0.2 ms stream time) — int8 halves the stream while the per-column
dequant runs on VMEM-resident blocks.  Expected ~0.25-0.30 ms/img if
the hypothesis holds; the B=128 int8 rejection (rounds 1-2) was the
compute-bound regime and does not transfer.

Measures B=1 and B=4 device latency for bf16 vs int8 packs (position
controlled: bf16 first and last to bracket relay drift) + on-chip score
parity vs the bf16 kernel.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r11_lowlat_int8.py
"""

import json
import time

import numpy as np


def _lat(fn, batch, n1=200):
    np.asarray(fn(batch))[:1]
    outs = []
    for n in (n1, 3 * n1):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(batch)
        np.asarray(out)[:1]
        outs.append(time.perf_counter() - t0)
    return (outs[1] - outs[0]) / (2 * n1)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.models.fastserve import (
        prepare_lowlat, serving_forward_lowlat)
    from vit_spoof_detection_pda_tpu.models.vit import (ViTAntiSpoof,
                                                        fold_normalization)
    from vit_spoof_detection_pda_tpu.utils.aot import cached_compile

    assert jax.default_backend() == "tpu", jax.default_backend()
    module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
    init = cached_compile(
        module.init,
        (jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)),
        key="bench_vit_b16_init")
    variables = init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 224, 224, 3), jnp.float32))
    folded = fold_normalization(variables)["params"]

    packs = {
        "bf16": prepare_lowlat(folded),
        "int8": prepare_lowlat(folded, int8_weights=True),
    }
    fns = {k: jax.jit(lambda p, b, _k=k: serving_forward_lowlat(
        p, b)).lower(packs[k], jax.ShapeDtypeStruct(
            (1, 224, 224, 3), jnp.uint8)).compile()
        for k in packs}

    rng = np.random.default_rng(0)
    b1 = jnp.asarray(rng.integers(0, 256, (1, 224, 224, 3),
                                  dtype=np.uint8))
    s_bf = np.asarray(fns["bf16"](packs["bf16"], b1))
    s_i8 = np.asarray(fns["int8"](packs["int8"], b1))
    print(json.dumps({"score_bf16": float(s_bf[0]),
                      "score_int8": float(s_i8[0]),
                      "abs_diff": float(np.abs(s_bf - s_i8).max())}))

    order = ["bf16", "int8", "bf16"]            # position-controlled
    results = {}
    for k in order:
        ms = _lat(lambda b, _k=k: fns[_k](packs[_k], b), b1) * 1e3
        results.setdefault(k, []).append(round(ms, 4))
        print(json.dumps({"config": k, "B": 1, "ms_per_img": round(ms, 4)}))
    print(json.dumps({"summary_B1": results}))

    # B=4: per-item grid still streams weights per image — same ratio
    b4 = jnp.asarray(rng.integers(0, 256, (4, 224, 224, 3),
                                  dtype=np.uint8))
    fns4 = {k: jax.jit(lambda p, b, _k=k: serving_forward_lowlat(
        p, b)).lower(packs[k], jax.ShapeDtypeStruct(
            (4, 224, 224, 3), jnp.uint8)).compile() for k in packs}
    for k in ("bf16", "int8"):
        ms = _lat(lambda b, _k=k: fns4[_k](packs[_k], b), b4, n1=100) * 1e3
        print(json.dumps({"config": k, "B": 4,
                          "ms_per_img": round(ms / 4, 4)}))


if __name__ == "__main__":
    main()
