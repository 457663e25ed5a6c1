"""Pool-gather layout A/B (follow-up to exp_r24b's +72 ms pallas tax).

Hypothesis: the +72 ms is NOT the gather — it is the
``pool.reshape(n, 224, 224, 3 -> n, 1176, 128)`` INSIDE the jitted
step forcing a full 4.1 GB physical relayout of the pool every step
(TPU arrays tile the last two dims; the 4D u8 layout and the packed 3D
layout differ).  If the pool is staged PRE-PACKED as [N, row//128, 128]
once, the in-step reshape is a no-op and only the gathered B rows
(18.8 MB) relayout back to NHWC after the gather.

Arms (full train step, orig chain, relay-differenced):
  a. direct batch               (no gather — step-bound floor)
  b. pool4d + jnp.take          (the exp_r24 epoch configuration)
  c. pool4d + pallas            (exp_r24b: +72 ms, the relayout tax)
  d. pool3d + pallas + reshape  (the proposed fix)
  e. pool3d + jnp.take + reshape (is XLA's take also layout-bound?)

ARCHIVED RESULT — arms b/c are no longer reproducible as written:
after this experiment, train/step.py gained a guard that routes 4D
NHWC pools to jnp.take unconditionally (pool_gather only engages on
lane-packed [N, sub, 128] pools), so GP.DISABLE no longer
distinguishes b from c.  The measured table lives in BENCH_NOTES
round 24 (a 133.8 / b 155.2 / c 206.9 / d 134.5 / e 134.8 ms).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import gather_pallas as GP
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)
from vit_spoof_detection_pda_tpu.train.driver import (_train_chain,
                                                      make_prep_fn)

B = 128
N_POOL = 27203
H = W = 224
ROW = H * W * 3                      # 150528 = 1176 * 128
cfg = Config()
rng = np.random.default_rng(0)

pool_host = rng.integers(0, 256, (N_POOL, H, W, 3), dtype=np.uint8)
pool4d = jnp.asarray(pool_host)
pool4d.block_until_ready()

labels = jnp.asarray((np.arange(B) % 2).astype(np.int32))
idx_np = rng.integers(0, N_POOL, B).astype(np.int32)
gi = jnp.asarray(idx_np)
direct = jnp.take(pool4d, gi, axis=0)
direct.block_until_ready()

module = ViTAntiSpoof(dtype=jnp.bfloat16)
state = create_train_state(module, make_optimizer(3e-4),
                           jax.random.PRNGKey(0),
                           input_shape=(1, H, W, 3))
loss_fn = losses.make_loss_fn("focal")
prep = make_prep_fn(cfg, _train_chain(cfg, crop=False))
prep3d = lambda key, x: prep(key, x.reshape(x.shape[0], H, W, 3))

def timed(step, make_batch, n1=8, n2=24):
    global state
    def run(n):
        global state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, make_batch())
        float(m["loss"])
        return time.perf_counter() - t0
    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


# each arm gets a FRESH jitted step: DISABLE is read at trace time and
# the batch avals repeat across arms, so a shared step would silently
# reuse the first arm's traced gather.
arms = []
GP.DISABLE = False
arms.append(("a. direct", timed(
    make_train_step(loss_fn, batch_prep=prep),
    lambda: {"image": direct, "label": labels})))
GP.DISABLE = True
arms.append(("b. pool4d+take", timed(
    make_train_step(loss_fn, batch_prep=prep),
    lambda: {"image": pool4d, "index": gi, "label": labels})))
GP.DISABLE = False
arms.append(("c. pool4d+pallas", timed(
    make_train_step(loss_fn, batch_prep=prep),
    lambda: {"image": pool4d, "index": gi, "label": labels})))

# 2 pools + training state exceed the 16 GB HBM: free the NHWC pool
# and stage the packed layout from host before arms d/e.
del pool4d, direct
t0 = time.perf_counter()
pool3d = jnp.asarray(pool_host.reshape(N_POOL, ROW // 128, 128))
pool3d.block_until_ready()
print(f"packed staging from host: {time.perf_counter()-t0:.1f} s",
      flush=True)

arms.append(("d. pool3d+pallas", timed(
    make_train_step(loss_fn, batch_prep=prep3d),
    lambda: {"image": pool3d, "index": gi, "label": labels})))
GP.DISABLE = True
arms.append(("e. pool3d+take", timed(
    make_train_step(loss_fn, batch_prep=prep3d),
    lambda: {"image": pool3d, "index": gi, "label": labels})))
GP.DISABLE = False

base = arms[0][1]
for name, t in arms:
    print(f"{name:18s} {t*1e3:7.1f} ms/step  ({B/t:6.0f} img/s)  "
          f"tax {(t-base)*1e3:+6.1f} ms", flush=True)
