"""Hardware probe: B=1 device latency for EVERY registry architecture,
completing the reference's per-model inference benchmark table
(results/inference_time_benchmark.json: Custom ViT 5.43 ms / Base ViT
4.86 ms / ResNet50 4.96 ms on an RTX A4500, additional_analysis.py's
bs=1 protocol).

Prior rounds measured only the flagship Custom-ViT paths (module /
fastserve / lowlat); this adds the Base-ViT linear head and ResNet50 on
the same relay-differenced device protocol so every reference row has a
TPU number.  All models run the eval `make_infer_fn` program (fused
uint8 normalize -> module -> softmax), f32 parity dtype — the apples-
to-apples equivalent of the reference's per-model torch forwards.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r8_model_latency.py
"""

import json
import time

import numpy as np

REF_MS = {"Custom_ViT_FineTuned": 5.43, "Base_ViT_Pretrained": 4.86,
          "ResNet50_Pretrained": 4.96}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.analysis.latency import (
        benchmark_device_latency)
    from vit_spoof_detection_pda_tpu.eval.runner import make_infer_fn
    from vit_spoof_detection_pda_tpu.models.registry import build_model

    out = {}
    for name in REF_MS:
        t0 = time.time()
        module, variables = build_model(name)
        infer = jax.jit(make_infer_fn(module))
        # two interleaved repeats per model guard against relay drift
        # (BENCH_NOTES round-5 rules: first program +9 ms, 2x outliers)
        runs = [benchmark_device_latency(
            lambda v, b: infer(v, b), variables, batch_size=1, n1=300)
            for _ in range(3)]
        ms = min(r["ms_per_image"] for r in runs[1:])
        out[name] = {
            "ms_per_image": round(ms, 3),
            "fps": round(1000.0 / ms, 1),
            "ref_ms": REF_MS[name],
            "speedup_vs_ref": round(REF_MS[name] / ms, 2),
            "series": [round(r["ms_per_image"], 3) for r in runs],
            "build_plus_compile_s": round(time.time() - t0, 1),
        }
        print(name, json.dumps(out[name]), flush=True)

    # the Base-ViT ablation also rides the fused trunk now
    # (serving_forward_linear) — quote its fastserve B=1 point too
    from vit_spoof_detection_pda_tpu.models.fastserve import (
        serving_forward_linear)
    from vit_spoof_detection_pda_tpu.models.vit import fold_normalization

    module, variables = build_model("Base_ViT_Pretrained")
    folded = fold_normalization(variables)

    @jax.jit
    def fast_linear(p, batch_u8):
        return {"prob1": serving_forward_linear(p, batch_u8)[:, 1]}

    runs = [benchmark_device_latency(fast_linear, folded["params"],
                                     batch_size=1, n1=300)
            for _ in range(3)]
    ms = min(r["ms_per_image"] for r in runs[1:])
    out["Base_ViT_Pretrained_fastserve"] = {
        "ms_per_image": round(ms, 3), "fps": round(1000.0 / ms, 1),
        "ref_ms": REF_MS["Base_ViT_Pretrained"],
        "speedup_vs_ref": round(REF_MS["Base_ViT_Pretrained"] / ms, 2),
        "series": [round(r["ms_per_image"], 3) for r in runs],
    }
    print("Base_ViT_Pretrained_fastserve",
          json.dumps(out["Base_ViT_Pretrained_fastserve"]), flush=True)

    # ... and its single-kernel latency mode (encoder-only lowlat)
    from vit_spoof_detection_pda_tpu.models.fastserve import (
        prepare_lowlat, serving_forward_lowlat_linear)

    prep = prepare_lowlat(folded["params"])

    @jax.jit
    def lowlat_linear(p, batch_u8):
        return {"prob1": serving_forward_lowlat_linear(p, batch_u8)[:, 1]}

    runs = [benchmark_device_latency(lowlat_linear, prep, batch_size=1,
                                     n1=300) for _ in range(3)]
    ms = min(r["ms_per_image"] for r in runs[1:])
    out["Base_ViT_Pretrained_lowlat"] = {
        "ms_per_image": round(ms, 3), "fps": round(1000.0 / ms, 1),
        "ref_ms": REF_MS["Base_ViT_Pretrained"],
        "speedup_vs_ref": round(REF_MS["Base_ViT_Pretrained"] / ms, 2),
        "series": [round(r["ms_per_image"], 3) for r in runs],
    }
    print("Base_ViT_Pretrained_lowlat",
          json.dumps(out["Base_ViT_Pretrained_lowlat"]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
