"""TRUE mixed online-training rate: time the fused aug+train step for
EVERY severity group (orig / heavy / medium / light) and weight by the
differential plan's batch mix (live x8+orig, spoof x2+orig over the
1:3.87 CelebA-Spoof ratio) — the per-group numbers reported so far are
the orig-chain configuration only."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.augment.policy import CHAINS, train_time_chain
from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)
from vit_spoof_detection_pda_tpu.train.driver import make_prep_fn

B = 128
cfg = Config()
module = ViTAntiSpoof(dtype=jnp.bfloat16)
state = create_train_state(module, make_optimizer(1e-4),
                           jax.random.PRNGKey(0),
                           input_shape=(1, 224, 224, 3))
loss_fn = losses.make_loss_fn("focal")
rng = np.random.default_rng(0)
lbl = jnp.asarray(np.arange(B) % 2, jnp.int32)
b256 = {"image": jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3),
                                          dtype=np.uint8)), "label": lbl}
b224 = {"image": jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3),
                                          dtype=np.uint8)), "label": lbl}

# EXACTLY the driver's online composition (train/driver.py::
# _make_online_data): originals get the train-time chain sans crop
# (inputs decode at img_size), severity copies get their tier chain
# PLUS the same train-time ops (reference re-randomizes store copies
# every epoch).  NOTE: the round-4/6 tables measured tier-only chains
# and a 256->224 crop orig — numbers shift accordingly.
from vit_spoof_detection_pda_tpu.train.driver import _train_chain

orig_chain = _train_chain(cfg, crop=False)
chains = {"orig": orig_chain, "orig_store256": train_time_chain()}
for g in ("heavy", "medium", "light"):
    chains[g] = CHAINS[g]() + orig_chain


def timed(step, batch, n1=6, n2=18):
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
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


times = {}
for g, chain in chains.items():
    step = make_train_step(loss_fn, batch_prep=make_prep_fn(cfg, chain),
                           donate=False)
    # online batches all arrive at img_size; only the offline-store
    # comparison row decodes at 256 for the RandomCrop jitter
    batch = b256 if g == "orig_store256" else b224
    t = timed(step, batch)
    times[g] = t
    print(f"[{g}] fused aug+train step: {t*1e3:6.1f} ms "
          f"({B/t:5.0f} img/s)", flush=True)

# default differential plan over the 1:3.87 live:spoof raw ratio:
# live -> 1 orig + 8 copies, spoof -> 1 orig + 2 copies; tier of each
# copy comes from the ACTUAL policy (live x8 -> 2 heavy/3 medium/3
# light, spoof x2 -> 0 heavy/1 medium/1 light — NOT equal thirds;
# augment/policy.py::severity_for_copy)
from vit_spoof_detection_pda_tpu.augment.policy import severity_for_copy

live, spoof = 1.0, 3.87
counts = {"orig": live + spoof, "heavy": 0.0, "medium": 0.0,
          "light": 0.0}
for i in range(8):
    counts[severity_for_copy(i, 8)] += live
for i in range(2):
    counts[severity_for_copy(i, 2)] += spoof
total = sum(counts.values())
w = {g: c / total for g, c in counts.items()}
mix_t = sum(w[g] * times[g] for g in w)
print(f"weighted mix ({', '.join(f'{g}={w[g]:.2f}' for g in w)}): "
      f"{mix_t*1e3:6.1f} ms -> {B/mix_t:5.0f} img/s", flush=True)
