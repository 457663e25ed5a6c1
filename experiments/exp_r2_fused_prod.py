"""Measure the PRODUCTION fused online step (make_train_step batch_prep
+ bf16 aug default) — the shipped form of exp_r2_online2's winner."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.augment.policy import train_time_chain
from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)
from vit_spoof_detection_pda_tpu.train.driver import make_prep_fn

B = 128
cfg = Config()
prep = make_prep_fn(cfg, train_time_chain())
module = ViTAntiSpoof(dtype=jnp.bfloat16)
tx = make_optimizer(1e-4)
state = create_train_state(module, tx, jax.random.PRNGKey(0),
                           input_shape=(1, 224, 224, 3))
step = make_train_step(losses.make_loss_fn("focal"), batch_prep=prep,
                       donate=False)
rng = np.random.default_rng(0)
batch = {"image": jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3),
                                           dtype=np.uint8)),
         "label": jnp.asarray(np.arange(B) % 2, jnp.int32)}
s, m = step(state, batch)
np.asarray(m["loss"])

def run(n):
    t0 = time.perf_counter()
    st, mm = state, None
    for _ in range(n):
        st, mm = step(st, batch)
    np.asarray(mm["loss"])
    return time.perf_counter() - t0

run(2)
t1, t2 = run(4), run(12)
tt = (t2 - t1) / 8
print(f"fused prod online step: {tt*1e3:.1f} ms  {B/tt:.0f} img/s")
