"""Round-6: large EFFECTIVE batches via gradient accumulation vs the
big-batch paths (exp_r5_bigbatch.py found: B=256 autodiff OOMs on the
16 GB v5e; B=256 xhat_mlp runs at ~927 img/s — below B=128 autodiff's
1040).  The question: does optax.MultiSteps at 4x128 sustain the B=128
step time, making accumulation the recommended route to effective
B=512 (reference quirk context: train_advanced.py:315 is pinned at
bs=128 with no accumulation at all)?

Protocol: fused-step differenced timing (BENCH_NOTES rules), one
warm-up config to absorb the relay's first-program overhead."""

import os
import subprocess
import sys
import time


def run_one(B: int, accum: int) -> None:
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
    batch = {"image": jnp.asarray(rng.standard_normal(
        (B, 224, 224, 3)).astype(np.float32)),
        "label": jnp.asarray(np.arange(B) % 2, jnp.int32)}
    module = ViTAntiSpoof(dtype=jnp.bfloat16)
    state = create_train_state(
        module, make_optimizer(1e-4, gradient_accumulation_steps=accum),
        jax.random.PRNGKey(0), input_shape=(1, 224, 224, 3))
    state = state.replace(apply_fn=make_apply(module))
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
    print(f"B={B:4d} accum={accum}: {ms:7.1f} ms/micro-step "
          f"({B / ms * 1000:5.0f} img/s, effective batch {B * accum})",
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 3:
        run_one(int(sys.argv[1]), int(sys.argv[2]))
        sys.exit(0)
    configs = [(128, 1), (128, 1), (128, 4)]   # first is the warm-up
    for i, (B, acc) in enumerate(configs):
        tag = " (warm-up, discard)" if i == 0 else ""
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(B), str(acc)],
                capture_output=True, text=True, timeout=1200)
        except subprocess.TimeoutExpired:
            print(f"B={B:4d} accum={acc}: FAILED (timeout 1200s)",
                  flush=True)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("B="):
                print(line + tag, flush=True)
        if r.returncode:
            print(f"B={B} accum={acc}: subprocess rc={r.returncode} "
                  f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ''}",
                  flush=True)
