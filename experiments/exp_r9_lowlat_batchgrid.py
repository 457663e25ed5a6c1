"""Hardware probe: batch-grid lowlat serving (ops/lowlat.py
encoder_forward_lowlat_batchgrid) vs the per-item lowlat grid and the
per-layer fastserve path in the B=2..16 regime.

Round-7 measured the per-item lowlat kernel at B=4/8 costing the same
per-image as fastserve (~0.27 ms) because the (B, depth*3) grid streams
every weight superblock once per IMAGE (B x 162 MB of HBM weight
traffic).  The batch-grid flavor walks phases only and keeps <=4
residual streams resident in VMEM, so weights stream once per 4-image
chunk — the hypothesis is a ~2-3x win at B=2..8 and a crossover to
fastserve somewhere above B~16.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r9_lowlat_batchgrid.py
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
    def peritem(prep, batch_u8):
        return {"prob1": serving_forward_lowlat(prep, batch_u8)}

    @jax.jit
    def fast(v, batch_u8):
        return {"prob1": serving_forward(v["params"], batch_u8)}

    # parity on the chip first (compiles batch-grid at B=4)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (4, 224, 224, 3), dtype=np.uint8))
    t0 = time.time()
    a = np.asarray(batchgrid(prepared, u8)["prob1"], np.float32)
    print(f"batch-grid compile+first-exec: {time.time()-t0:.1f}s",
          flush=True)
    b = np.asarray(fast(folded, u8)["prob1"], np.float32)
    print("parity max|diff| vs fastserve:", float(np.max(np.abs(a - b))),
          "scores:", a.tolist(), flush=True)
    assert np.max(np.abs(a - b)) < 0.02

    results = {}
    for bs, n1 in [(2, 200), (4, 200), (8, 100), (16, 100)]:
        r = benchmark_device_latency(batchgrid, prepared, batch_size=bs,
                                     n1=n1)
        results[f"batchgrid_b{bs}"] = r
        print(f"batchgrid_b{bs}", json.dumps(r), flush=True)
    # same-session per-item lowlat points for a position-controlled compare
    for bs, n1 in [(4, 200), (8, 100)]:
        r = benchmark_device_latency(peritem, prepared, batch_size=bs,
                                     n1=n1)
        results[f"peritem_b{bs}"] = r
        print(f"peritem_b{bs}", json.dumps(r), flush=True)

    print(json.dumps({
        "batchgrid_b4_ms_img": round(
            results["batchgrid_b4"]["ms_per_image"], 3),
        "peritem_b4_ms_img": round(
            results["peritem_b4"]["ms_per_image"], 3),
        "batchgrid_b8_ms_img": round(
            results["batchgrid_b8"]["ms_per_image"], 3),
        "peritem_b8_ms_img": round(
            results["peritem_b8"]["ms_per_image"], 3),
    }))


if __name__ == "__main__":
    main()
