"""Diagnose the pool-mode epoch's 166.9 ms/step average vs the 138.5 ms
step-bound severity mix (exp_r24): isolate (a) the on-device pool
gather (XLA take vs the Pallas scalar-prefetch kernel), (b) per-group
rates pool-fed vs direct-batch, (c) the 4-group alternation pattern.

v2: states are THREADED through every timed call (the steps donate
their input state; reusing a donated buffer is a TPU InvalidArgument).

ARCHIVED RESULT — the "pool-fed" rows measured the pallas gather on
the NHWC pool (+72 ms: the in-step reshape relayouted the whole pool),
which train/step.py no longer does: 4D pools now always jnp.take and
only lane-packed pools take the kernel.  Re-running measures the take
path; the original table lives in BENCH_NOTES round 24.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.augment.policy import CHAINS
from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.ops.gather_pallas import pool_gather
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)
from vit_spoof_detection_pda_tpu.train.driver import (_train_chain,
                                                      make_prep_fn)

B = 128
N_POOL = 27203
cfg = Config()
rng = np.random.default_rng(0)
pool = jnp.asarray(rng.integers(0, 256, (N_POOL, 224, 224, 3),
                                dtype=np.uint8))
pool.block_until_ready()
labels = jnp.asarray((np.arange(B) % 2).astype(np.int32))
idx_np = rng.integers(0, N_POOL, B).astype(np.int32)
gi = jnp.asarray(idx_np)
direct = jnp.take(pool, gi, axis=0)
direct.block_until_ready()

module = ViTAntiSpoof(dtype=jnp.bfloat16)
state = create_train_state(module, make_optimizer(3e-4),
                           jax.random.PRNGKey(0),
                           input_shape=(1, 224, 224, 3))
loss_fn = losses.make_loss_fn("focal")
orig_chain = _train_chain(cfg, crop=False)
chains = {"orig": orig_chain}
for g in ("heavy", "medium", "light"):
    chains[g] = CHAINS[g]() + orig_chain
steps = {g: make_train_step(loss_fn, batch_prep=make_prep_fn(cfg, c))
         for g, c in chains.items()}


def timed_steps(make_batch, group, n1=8, n2=24):
    """Thread the global state; relay-differenced per-step time."""
    global state
    s_fn = steps[group]

    def run(n):
        global state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = s_fn(state, make_batch())
        float(m["loss"])
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


# (a) gather cost: XLA take vs pallas scalar-prefetch kernel
def time_fn(fn, *args, n1=10, n2=30):
    o = fn(*args); o.block_until_ready()
    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        o.block_until_ready()
        return time.perf_counter() - t0
    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


t_take = time_fn(jax.jit(lambda p, i: jnp.take(p, i, axis=0)), pool, gi)
t_pal = time_fn(jax.jit(lambda p, i: pool_gather(p, i)), pool, gi)
print(f"gather B={B}: jnp.take {t_take*1e3:.2f} ms | "
      f"pallas {t_pal*1e3:.3f} ms", flush=True)

# (b) per-group: pool-fed (with the pallas gather now in the step) vs
# direct-batch
for g in ("orig", "heavy"):
    t_pool = timed_steps(lambda: {"image": pool, "index": gi,
                                  "label": labels}, g)
    t_dir = timed_steps(lambda: {"image": direct, "label": labels}, g)
    print(f"{g}: pool-fed {t_pool*1e3:.1f} ms | direct {t_dir*1e3:.1f} "
          f"ms | gather tax {(t_pool-t_dir)*1e3:+.1f} ms", flush=True)

# (c) 4-group alternation, pool-fed, with per-step index upload (the
# epoch's exact host pattern)
order = ["orig", "heavy", "medium", "light"]


def run_alt(n):
    global state
    t0 = time.perf_counter()
    for k in range(n):
        for g in order:
            ib = jnp.asarray(idx_np)          # fresh upload per step
            lb = jnp.asarray(labels)
            state, m = steps[g](state, {"image": pool, "index": ib,
                                        "label": lb})
    float(m["loss"])
    return time.perf_counter() - t0


run_alt(2)
t1, t2 = run_alt(4), run_alt(12)
per_step = (t2 - t1) / (12 - 4) / 4
print(f"4-group alternation, pool-fed+upload: {per_step*1e3:.1f} ms/step "
      f"({B/per_step:.0f} img/s)", flush=True)
