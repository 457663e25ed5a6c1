"""A/B the phase-split attention backward (VERDICT r3 item 4) on the
full train step: BWD_PHASED dissolves each head's serial
logits->softmax->dv/dw->dl->dq/dk chain into per-type dot phases over a
VMEM weights scratch (ops/attention.py::_attn_qkv_bwd_kernel_phased).

Target: train step <= 118 ms erf (from the 123-126 band), i.e. the
round-20 XProf table's 16.6 ms / 34 TF/s bwd-kernel sink giving back a
meaningful slice.  Protocol: relay-differenced, full-step interleaved
A/B (the only trustworthy comparison on this relay — BENCH_NOTES
measurement rules)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import attention as ATT
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)

B = 128
module = ViTAntiSpoof(dtype=jnp.bfloat16)          # erf parity default
loss_fn = losses.make_loss_fn("focal")
rng = np.random.default_rng(0)
batch = {"image": jnp.asarray(rng.normal(0, 1, (B, 224, 224, 3)),
                              jnp.float32),
         "label": jnp.asarray(np.arange(B) % 2, jnp.int32)}


def build(phased):
    ATT.BWD_PHASED = phased
    step = make_train_step(loss_fn, donate=False)

    def run(state, n):
        st = state
        for _ in range(n):
            st, m = step(st, batch)
        return float(m["loss"])

    return step, run


def measure(run, state, n1=8, n2=24):
    run(state, 2)
    t0 = time.perf_counter(); run(state, n1); t1 = time.perf_counter()
    run(state, n2); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


state = create_train_state(module, make_optimizer(3e-4),
                           jax.random.PRNGKey(0),
                           input_shape=(1, 224, 224, 3))

step_a, run_a = build(False)
la = run_a(state, 1)
step_b, run_b = build(True)
lb = run_b(state, 1)
print(f"loss parity: base {la:.6f} phased {lb:.6f} "
      f"diff {abs(la-lb):.2e}", flush=True)

for rnd in range(3):
    ta = measure(run_a, state)
    tb = measure(run_b, state)
    print(f"round {rnd}: baseline {ta*1e3:.1f} ms ({B/ta:.0f} img/s) | "
          f"phased {tb*1e3:.1f} ms ({B/tb:.0f} img/s) | "
          f"delta {(ta-tb)*1e3:+.1f} ms", flush=True)
ATT.BWD_PHASED = False
