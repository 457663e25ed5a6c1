"""Round-16: train-step cost of the Polyak/EMA shadow (optim.ema_decay).

The EMA transform adds one read-modify-write over the full param tree
per effective step (~0.7 GB of f32 traffic at ViT-B/16: read shadow +
read params + write shadow); at ~800 GB/s HBM that bounds the cost at
~1 ms IF it doesn't overlap.  Measure the fused-forward production
step (B=128, erf + tanh) with ema_decay None vs 0.999.
"""

import time

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

B = 128
rng = np.random.default_rng(0)
batch = {"image": jnp.asarray(rng.standard_normal(
    (B, 224, 224, 3)).astype(np.float32)),
    "label": jnp.asarray(np.arange(B) % 2, jnp.int32)}
loss_fn = losses.make_loss_fn("focal")


def step_timed(step, state, n1=6, n2=18):
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
    return (t2 - t1) / (n2 - n1) * 1000


for gelu in ("erf", "tanh"):
    for ema in (None, 0.999):
        module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu=gelu)
        state = create_train_state(module,
                                   make_optimizer(1e-4, ema_decay=ema),
                                   jax.random.PRNGKey(0),
                                   input_shape=(1, 224, 224, 3))
        state = state.replace(apply_fn=make_apply(module))
        step = make_train_step(loss_fn, donate=False)
        ms = step_timed(step, state)
        print(f"train step [{gelu}/ema={ema}]: {ms:.1f} ms "
              f"({B / ms * 1000:.0f} img/s)", flush=True)
