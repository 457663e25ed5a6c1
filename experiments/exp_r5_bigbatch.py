"""Round-5: train-step throughput above the reference's B=128 (a
scalability capability the reference never exercises — its torch loop
is pinned at batch_size=128, train_advanced.py:315).  Larger per-chip
batches amortize fixed per-step work and lengthen GEMM M-dims; the
question is whether HBM holds and whether img/s actually improves.
xhat_mlp (the memory-lean fused MLP VJP, BENCH_NOTES round 4) is the
fallback when the autodiff path OOMs.

Each (B, xhat) combo runs in its OWN subprocess so one config's
allocations (state/batch/executables) cannot inflate the next one's
peak HBM — an OOM verdict then belongs to the config, not the loop.
A discarded warm-up config absorbs the relay's first-program overhead
(BENCH_NOTES round 5)."""

import os
import subprocess
import sys
import time


def run_one(B: int, xhat: bool) -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from vit_spoof_detection_pda_tpu.models.fasttrain import make_apply
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.ops import losses
    from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                                   make_optimizer,
                                                   make_train_step)

    loss_fn = losses.make_loss_fn("focal")
    rng = np.random.default_rng(0)
    try:
        batch = {"image": jnp.asarray(rng.standard_normal(
            (B, 224, 224, 3)).astype(np.float32)),
            "label": jnp.asarray(np.arange(B) % 2, jnp.int32)}
        module = ViTAntiSpoof(dtype=jnp.bfloat16)
        state = create_train_state(module, make_optimizer(1e-4),
                                   jax.random.PRNGKey(0),
                                   input_shape=(1, 224, 224, 3))
        state = state.replace(apply_fn=make_apply(module, xhat_mlp=xhat))
        step = make_train_step(loss_fn, donate=False)

        s, m = step(state, batch)
        float(m["loss"])

        def run(n):
            st, mm = state, None
            t0 = time.perf_counter()
            for _ in range(n):
                st, mm = step(st, batch)
            float(mm["loss"])
            return time.perf_counter() - t0

        run(2)
        t1, t2 = run(6), run(18)
        ms = (t2 - t1) / 12 * 1000
        print(f"B={B:4d} xhat_mlp={int(xhat)}: {ms:7.1f} ms "
              f"({B / ms * 1000:5.0f} img/s)", flush=True)
    except Exception as e:  # noqa: BLE001 — OOM is a result here
        print(f"B={B:4d} xhat_mlp={int(xhat)}: FAILED "
              f"({type(e).__name__}: {str(e)[:140]})", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 3:
        run_one(int(sys.argv[1]), bool(int(sys.argv[2])))
        sys.exit(0)
    configs = [(128, 0), (128, 0), (128, 1), (256, 0), (256, 1),
               (512, 0), (512, 1)]   # first 128/0 is the warm-up
    for i, (B, xh) in enumerate(configs):
        tag = " (warm-up, discard)" if i == 0 else ""
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(B), str(xh)],
                capture_output=True, text=True, timeout=1200)
        except subprocess.TimeoutExpired:
            print(f"B={B:4d} xhat_mlp={xh}: FAILED (timeout 1200s)",
                  flush=True)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("B="):
                print(line + tag, flush=True)
        if r.returncode:
            print(f"B={B} xhat={xh}: subprocess rc={r.returncode} "
                  f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ''}",
                  flush=True)
