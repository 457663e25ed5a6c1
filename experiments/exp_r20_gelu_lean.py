"""A/B the lean-residual GELU VJP (fasttrain.gelu_lean) in the full
production train step.

Round-19's XProf trace showed jax.nn.gelu's autodiff saving THREE
bf16[128,197,3072] tensors per layer in the fc1 forward fusion
(444 MB/layer written, HBM-bound at 40% roofline efficiency,
1.52 ms x 12 = 18.3 ms/step).  gelu_lean saves only the pre-activation
and recomputes the gate in the backward.  Protocol: the productized
benchmark_train_step (relay-differenced internally), arms interleaved
lean/plain x 3 (BENCH_NOTES round-5 relay rules: never compare a
session's first measurement; same-session interleaved repeats only).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python experiments/exp_r20_gelu_lean.py [tanh]
"""

import sys

for p in ("/root/repo", "/root/.axon_site"):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax


def run_arm(lean: bool, gelu: str) -> float:
    from vit_spoof_detection_pda_tpu.analysis.latency import (
        benchmark_train_step)
    from vit_spoof_detection_pda_tpu.models import fasttrain

    orig = fasttrain.gelu_lean
    if not lean:
        fasttrain.gelu_lean = (
            lambda x, approximate=False: jax.nn.gelu(
                x, approximate=approximate))
    try:
        out = benchmark_train_step(gelu=gelu, iters=18)
    finally:
        fasttrain.gelu_lean = orig
    return out["ms_per_step"]


def main():
    gelu = sys.argv[1] if len(sys.argv) > 1 else "erf"
    rows = []
    # position 0 discarded per the relay first-program rule
    warm = run_arm(True, gelu)
    print(f"warmup (discarded): {warm:.1f} ms", flush=True)
    for rep in range(3):
        a = run_arm(True, gelu)
        b = run_arm(False, gelu)
        rows.append((a, b))
        print(f"rep{rep}: lean={a:.1f}  plain={b:.1f}", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    a, b = med([r[0] for r in rows]), med([r[1] for r in rows])
    print(f"[{gelu}] median lean={a:.1f} ms  plain={b:.1f} ms  "
          f"delta={b - a:+.1f} ms ({100 * (b - a) / b:+.1f}%)")


if __name__ == "__main__":
    main()
