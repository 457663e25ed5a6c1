"""Chase the last ~7 ms/step of pool-mode epoch overhead (exp_r24 v3:
876 vs 924 img/s step-bound): the driver uploads [B] int32 index +
label vectors synchronously every step.  A/B on hardware:

  a. per-step host upload (the current driver pattern)
  b. per-epoch staging: ONE [S,B] device array per stream, steps feed
     device-side row slices (enqueued async, no host->device sync)

Same packed pool, same 4-group alternation, same compiled steps (the
batch avals are identical, so both arms share executables).
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
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)
from vit_spoof_detection_pda_tpu.train.driver import (_train_chain,
                                                      make_prep_fn)
from vit_spoof_detection_pda_tpu.train.pool import DevicePoolData

B = 128
N_POOL = 27203
cfg = Config()
rng = np.random.default_rng(0)
pool_host = rng.integers(0, 256, (N_POOL, 224, 224, 3), dtype=np.uint8)
labels_host = (np.arange(N_POOL) % 2).astype(np.int32)
data = DevicePoolData(pool_host, labels_host, live_mult=8, spoof_mult=2,
                      batch_size=B, seed=42)
assert data.packed
del pool_host

module = ViTAntiSpoof(dtype=jnp.bfloat16)
state = create_train_state(module, make_optimizer(3e-4),
                           jax.random.PRNGKey(0),
                           input_shape=(1, 224, 224, 3))
loss_fn = losses.make_loss_fn("focal")
orig_chain = _train_chain(cfg, crop=False)
chains = {"orig": orig_chain}
for g in ("heavy", "medium", "light"):
    chains[g] = CHAINS[g]() + orig_chain


steps = {g: make_train_step(
            loss_fn, batch_prep=data.wrap_prep(make_prep_fn(cfg, c)))
         for g, c in chains.items()}

order = ["orig", "heavy", "medium", "light"]
idx_np = {g: rng.integers(0, N_POOL, (64, B)).astype(np.int32)
          for g in order}
lbl_np = {g: labels_host[idx_np[g]] for g in order}


def run_upload(n):
    """arm a: fresh host->device upload per step (driver today)."""
    global state
    t0 = time.perf_counter()
    for k in range(n):
        for g in order:
            ib = jnp.asarray(idx_np[g][k % 64])
            lb = jnp.asarray(lbl_np[g][k % 64])
            state, m = steps[g](state, {"image": data.pool, "index": ib,
                                        "label": lb})
    float(m["loss"])
    return time.perf_counter() - t0


idx_dev = {g: jnp.asarray(v) for g, v in idx_np.items()}
lbl_dev = {g: jnp.asarray(v) for g, v in lbl_np.items()}
for v in list(idx_dev.values()) + list(lbl_dev.values()):
    v.block_until_ready()


def run_staged(n):
    """arm b: device-side row slices of per-epoch staged streams."""
    global state
    t0 = time.perf_counter()
    for k in range(n):
        for g in order:
            j = k % 64
            state, m = steps[g](state, {"image": data.pool,
                                        "index": idx_dev[g][j],
                                        "label": lbl_dev[g][j]})
    float(m["loss"])
    return time.perf_counter() - t0


def measure(run, n1=4, n2=12):
    run(2)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1) / len(order)


for rnd in range(3):
    ta = measure(run_upload)
    tb = measure(run_staged)
    print(f"round {rnd}: per-step upload {ta*1e3:.1f} ms/step "
          f"({B/ta:.0f} img/s) | staged slices {tb*1e3:.1f} ms/step "
          f"({B/tb:.0f} img/s) | delta {(ta-tb)*1e3:+.1f} ms",
          flush=True)
