"""Clock the 115k-image training epoch FOR REAL (VERDICT r3 weak #1:
the "epoch ≈ 2 min" claim was extrapolated from ms/step).

Reference scale (README.md:92-94, augment_data.py:27-47): the 115,125-
image augmented epoch is the live×9/spoof×3 differential fan-out of
~27.2k originals at the 1:3.87 live:spoof imbalance —
L=5,586 live + S=21,617 spoof → 9L+3S = 115,125.

Two modes, both measured end-to-end wall-clock on hardware:

1. DEVICE-POOL mode (train/pool.py — the TPU-native design): stage the
   27.2k-original uint8 pool (4.10 GB) in HBM once, then run the full
   899-step epoch with per-severity fused aug+train steps; the host
   ships 512 B of indices per step.  Staging cost is reported
   separately (one-time, amortized over all epochs).
2. HOST-FED row (the offline-store path): measured u8 batch upload
   bandwidth through this relay + a few fed steps — quantifies the
   environment tax that motivates mode 1 on tunneled/thin-PCIe hosts.

Epoch-1 numbers include the 4 per-group compiles; epoch 2 is the
sustained rate to compare against the step-bound 924-928 img/s mix.
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
L_LIVE, S_SPOOF = 5586, 21617      # 9L + 3S = 115,125
cfg = Config()

# --- synthesize the original pool (host RAM: 4.10 GB uint8) -------------
t0 = time.perf_counter()
n = L_LIVE + S_SPOOF
pool_host = np.empty((n, 224, 224, 3), np.uint8)
rng = np.random.default_rng(0)
chunk = 2048
for i in range(0, n, chunk):
    m = min(chunk, n - i)
    pool_host[i:i + m] = rng.integers(0, 256, (m, 224, 224, 3),
                                      dtype=np.uint8)
labels = np.concatenate([np.ones(L_LIVE, np.int32),
                         np.zeros(S_SPOOF, np.int32)])
print(f"pool synthesized: {n} images {pool_host.nbytes/2**30:.2f} GB "
      f"({time.perf_counter()-t0:.1f} s)", flush=True)

# --- stage to HBM (one-time upload through the relay) -------------------
t0 = time.perf_counter()
data = DevicePoolData(pool_host, labels, live_mult=8, spoof_mult=2,
                      batch_size=B, seed=42)
data.pool.block_until_ready()
t_stage = time.perf_counter() - t0
print(f"HBM staging: {t_stage:.1f} s "
      f"({pool_host.nbytes/2**20/t_stage:.0f} MB/s)", flush=True)
print(f"steps_per_epoch = {data.steps_per_epoch} "
      f"(epoch images = {data.steps_per_epoch*B})", flush=True)

# --- per-group fused aug+train steps (the driver's exact composition) ---
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


def run_epoch(state, epoch):
    t0 = time.perf_counter()
    pending = None
    marks = []
    for i, b in enumerate(data.batches(epoch)):
        st = steps[b["group"]](state, {
            "image": data.pool,
            "index": jnp.asarray(b["index"]),
            "label": jnp.asarray(b["label"])})
        state, pending = st
        if (i + 1) % 100 == 0:
            marks.append(time.perf_counter() - t0)
    loss = float(pending["loss"])
    wall = time.perf_counter() - t0
    n_steps = i + 1
    # NOTE: the 100-step marks are ENQUEUE times (no device sync) —
    # they measure Python dispatch rate only, never quote them as
    # throughput.  The honest number is the wall clock, whose final
    # scalar fetch drains the device queue.
    del marks
    print(f"epoch {epoch}: {n_steps} steps, wall {wall:.1f} s, "
          f"{n_steps*B/wall:.0f} img/s end-to-end, "
          f"final loss {loss:.4f}", flush=True)
    return state


state = run_epoch(state, 0)     # includes 4 compiles
state = run_epoch(state, 1)     # warm: the sustained number

# --- host-fed comparison row (offline-store feed tax) -------------------
up = jnp.asarray(pool_host[:B])        # warm the transfer path
up.block_until_ready()
t0 = time.perf_counter()
reps = 5
for _ in range(reps):
    up = jnp.asarray(pool_host[:B])
    up.block_until_ready()
t_up = (time.perf_counter() - t0) / reps
mb = pool_host[:B].nbytes / 2**20
print(f"host->device u8 batch upload: {t_up*1e3:.0f} ms for {mb:.1f} MB "
      f"({mb/t_up:.0f} MB/s) -> feed-bound ceiling "
      f"{B/t_up:.0f} img/s", flush=True)

st2 = create_train_state(module, make_optimizer(3e-4),
                         jax.random.PRNGKey(1),
                         input_shape=(1, 224, 224, 3))
fed = steps["orig"]
lbl = labels[:B]
_ = fed(st2, {"image": up, "label": jnp.asarray(lbl)})
st2, m = _
float(m["loss"])
t0 = time.perf_counter()
for k in range(10):
    img = jnp.asarray(pool_host[k*B:(k+1)*B])
    st2, m = fed(st2, {"image": img, "label": jnp.asarray(lbl)})
float(m["loss"])
t_fed = (time.perf_counter() - t0) / 10
print(f"host-fed step (upload+step, serial): {t_fed*1e3:.0f} ms "
      f"= {B/t_fed:.0f} img/s", flush=True)
