"""Hardware probe: fold-ends single-kernel image->logits serving
(ops/lowlat.py fold_ends mode) vs the round-7 encoder-only lowlat path.

The encoder-only kernel left B=1 at 0.377 ms with the patch-embed,
pad, final-LN and head as ~4 separate XLA programs around it; folding
them in as two extra grid phases should claw back most of the
program-launch overhead.  Measures B=1/4/8 device latency of both
flavors and checks score parity on the chip.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r8_lowlat_e2e.py
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
    prep_fold = prepare_lowlat(folded["params"])
    assert "aux" in prep_fold, "fold-ends packs missing for ViT-B/16"
    prep_enc = prepare_lowlat(folded["params"], fold_ends=False)

    @jax.jit
    def lowlat(prep, batch_u8):
        return {"prob1": serving_forward_lowlat(prep, batch_u8)}

    @jax.jit
    def fast(v, batch_u8):
        return {"prob1": serving_forward(v["params"], batch_u8)}

    # parity on the chip first (compiles fold-ends at B=4)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (4, 224, 224, 3), dtype=np.uint8))
    t0 = time.time()
    a = np.asarray(lowlat(prep_fold, u8)["prob1"], np.float32)
    print(f"fold-ends compile+first-exec: {time.time()-t0:.1f}s", flush=True)
    b = np.asarray(fast(folded, u8)["prob1"], np.float32)
    c = np.asarray(lowlat(prep_enc, u8)["prob1"], np.float32)
    print("parity fold vs fastserve max|diff|:",
          float(np.max(np.abs(a - b))),
          "| fold vs encoder-only:", float(np.max(np.abs(a - c))),
          "scores:", a.tolist(), flush=True)
    assert np.max(np.abs(a - b)) < 0.02

    # relay timing drifts downward over a session (BENCH_NOTES round 5
    # rules) — interleave the A/B at B=1 and compare adjacent pairs,
    # dropping the first (warm-up) pair
    b1 = {"enc": [], "fold": []}
    for rep in range(4):
        for tag, prep in [("enc", prep_enc), ("fold", prep_fold)]:
            r = benchmark_device_latency(lowlat, prep, batch_size=1,
                                         n1=400)
            b1[tag].append(r["ms_per_image"])
            print(f"{tag}_b1[{rep}]", json.dumps(r), flush=True)

    results = {}
    for bs, n1 in [(4, 200), (8, 200)]:
        r = benchmark_device_latency(lowlat, prep_fold, batch_size=bs,
                                     n1=n1)
        results[f"fold_b{bs}"] = r
        print(f"fold_b{bs}", json.dumps(r), flush=True)

    enc_ms = min(b1["enc"][1:])
    fold_ms = min(b1["fold"][1:])
    print(json.dumps({
        "enc_only_b1_ms": round(enc_ms, 3),
        "fold_ends_b1_ms": round(fold_ms, 3),
        "b1_series": {k: [round(v, 3) for v in vs]
                      for k, vs in b1.items()},
        "speedup_vs_enc": round(enc_ms / fold_ms, 2),
        "speedup_vs_ref_5.43ms": round(5.43 / fold_ms, 2),
    }))


if __name__ == "__main__":
    main()
