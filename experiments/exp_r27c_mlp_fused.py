"""Follow-up to exp_r27/r27b: the fully-fused Pallas MLP training
forward (mlp_block_train_p — LN2+fc1+GELU+fc2+residual as one program,
VMEM-resident weights, only the h residual written) vs the shipped
stored-hidden mode.  The last round-20 forward sink: the unfused fc1
fusion ran at 40% roofline efficiency writing three [B,T,4D] tensors.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python experiments/exp_r27c_mlp_fused.py [tanh]
"""

import sys

for p in ("/root/repo", "/root/.axon_site"):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def run_arm(mode: str, gelu: str) -> float:
    from vit_spoof_detection_pda_tpu.analysis.latency import (
        benchmark_train_step)
    from vit_spoof_detection_pda_tpu.models import fasttrain as FT

    orig = FT.MLP_DEFAULT
    FT.MLP_DEFAULT = mode
    try:
        out = benchmark_train_step(gelu=gelu, iters=18)
    finally:
        FT.MLP_DEFAULT = orig
    return out["ms_per_step"]


def main():
    gelu = sys.argv[1] if len(sys.argv) > 1 else "erf"
    warm = run_arm("fused", gelu)       # also proves the kernel compiles
    print(f"warmup fused (discarded): {warm:.1f} ms", flush=True)
    rows = {"hidden": [], "fused": []}
    for rep in range(3):
        for mode in ("hidden", "fused"):
            ms = run_arm(mode, gelu)
            rows[mode].append(ms)
            print(f"rep{rep} {mode}: {ms:.1f} ms", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    a, b = med(rows["fused"]), med(rows["hidden"])
    print(f"[{gelu}] fused={a:.1f} ms  hidden(shipped)={b:.1f} ms  "
          f"delta={b - a:+.1f} ms")


if __name__ == "__main__":
    main()
