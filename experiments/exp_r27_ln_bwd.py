"""A/B the fused Pallas LN/residual BACKWARD (VERDICT r4 item 1) on the
full train step.

Round-20's XProf table pinned ~18 ms/step of f32 LN/residual backward
elementwise+reduce chains sitting on the serial dx critical path (24 LN
sites).  ops/ln_bwd.py folds each site's tail into ONE Pallas pass;
models/fasttrain.py stores inv from the forward kernel and (arm
"full") routes the MLP through the stored-hidden custom VJP so its LN
tail uses the kernel too.

Arms (each builds a FRESH step -> fresh trace, per the BWD_PHASED
trace-time caveat):
  base  LN_BWD_PALLAS=False, MLP autodiff  (shipped behavior + stored
        inv instead of the var recompute)
  attn  LN_BWD_PALLAS=True,  MLP autodiff  (kernel on the 12 attn sites)
  full  LN_BWD_PALLAS=True,  MLP "hidden"  (kernel on all 24 sites)

Target: <= 115 ms erf from the 123-126 band, else a measured rejection.
Protocol: benchmark_train_step (relay-differenced internally),
interleaved x3, first measurement discarded (BENCH_NOTES relay rules).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python experiments/exp_r27_ln_bwd.py [tanh]
"""

import sys

for p in ("/root/repo", "/root/.axon_site"):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def run_arm(arm: str, gelu: str) -> float:
    from vit_spoof_detection_pda_tpu.analysis.latency import (
        benchmark_train_step)
    from vit_spoof_detection_pda_tpu.models import fasttrain as FT

    orig = (FT.LN_BWD_PALLAS, FT.MLP_DEFAULT)
    FT.LN_BWD_PALLAS = arm in ("attn", "full")
    FT.MLP_DEFAULT = "hidden" if arm == "full" else "autodiff"
    try:
        out = benchmark_train_step(gelu=gelu, iters=18)
    finally:
        FT.LN_BWD_PALLAS, FT.MLP_DEFAULT = orig
    return out["ms_per_step"]


def main():
    gelu = sys.argv[1] if len(sys.argv) > 1 else "erf"
    arms = ["base", "attn", "full"]
    warm = run_arm("base", gelu)
    print(f"warmup (discarded): {warm:.1f} ms", flush=True)
    rows = {a: [] for a in arms}
    for rep in range(3):
        for a in arms:
            ms = run_arm(a, gelu)
            rows[a].append(ms)
            print(f"rep{rep} {a}: {ms:.1f} ms", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    base = med(rows["base"])
    for a in arms:
        m = med(rows[a])
        print(f"[{gelu}] {a}: median {m:.1f} ms  "
              f"delta vs base {base - m:+.1f} ms "
              f"({100 * (base - m) / base:+.1f}%)")


if __name__ == "__main__":
    main()
