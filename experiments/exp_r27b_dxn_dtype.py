"""Follow-up to exp_r27: dxn (the LN-tail kernel's largest operand) in
the compute dtype vs f32, on the winning "full" configuration
(LN_BWD_PALLAS + stored-hidden MLP VJP).  The input-dtype rule the
attention backward ships (BENCH_NOTES round 22) applied to the LN
cotangent: halves the [B,T,D] buffer between the dxn GEMM and the LN
Pallas pass on the bf16 path.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python experiments/exp_r27b_dxn_dtype.py
"""

import sys

for p in ("/root/repo", "/root/.axon_site"):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def run_arm(compact: bool) -> float:
    from vit_spoof_detection_pda_tpu.analysis.latency import (
        benchmark_train_step)
    from vit_spoof_detection_pda_tpu.models import fasttrain as FT

    orig = (FT.LN_BWD_PALLAS, FT.MLP_DEFAULT, FT.DXN_COMPACT)
    FT.LN_BWD_PALLAS, FT.MLP_DEFAULT = True, "hidden"
    FT.DXN_COMPACT = compact
    try:
        out = benchmark_train_step(gelu="erf", iters=18)
    finally:
        FT.LN_BWD_PALLAS, FT.MLP_DEFAULT, FT.DXN_COMPACT = orig
    return out["ms_per_step"]


def main():
    warm = run_arm(True)
    print(f"warmup (discarded): {warm:.1f} ms", flush=True)
    rows = {True: [], False: []}
    for rep in range(3):
        for compact in (True, False):
            ms = run_arm(compact)
            rows[compact].append(ms)
            print(f"rep{rep} compact={compact}: {ms:.1f} ms", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    a, b = med(rows[True]), med(rows[False])
    print(f"[erf/full] compact(bf16 dxn)={a:.1f} ms  f32 dxn={b:.1f} ms  "
          f"delta={b - a:+.1f} ms")


if __name__ == "__main__":
    main()
