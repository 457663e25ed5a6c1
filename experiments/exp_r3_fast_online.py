"""Online fused train step (aug batch_prep inside the compiled step)
with the fasttrain forward, plus the tanh step — the production modes
after fused_train_forward became default-on."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.augment.policy import train_time_chain
from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.models import fasttrain as FT
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)
from vit_spoof_detection_pda_tpu.train.driver import make_prep_fn

B = 128
rng = np.random.default_rng(0)
loss_fn = losses.make_loss_fn("focal")


def timed(step, state, batch, n1=10, n2=30):
    s, m = step(state, batch)
    float(m["loss"])

    def run(n):
        st, mm = state, None
        t0 = time.perf_counter()
        for _ in range(n):
            st, mm = step(st, batch)
        float(mm["loss"])
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


# tanh step, plain f32 input
module_t = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
state = create_train_state(module_t, make_optimizer(1e-4),
                           jax.random.PRNGKey(0),
                           input_shape=(1, 224, 224, 3))
state = state.replace(apply_fn=FT.make_apply(module_t))
batch = {"image": jnp.asarray(rng.standard_normal((B, 224, 224, 3)),
                              jnp.float32),
         "label": jnp.asarray(np.arange(B) % 2, jnp.int32)}
step = make_train_step(loss_fn, donate=False)
t = timed(step, state, batch)
print(f"[tanh] fasttrain step: {t*1e3:6.1f} ms ({B/t:5.0f} img/s)",
      flush=True)

# online production step: uint8 256^2 -> fused aug chain -> erf model
cfg = Config()
prep = make_prep_fn(cfg, train_time_chain())
module = ViTAntiSpoof(dtype=jnp.bfloat16)
state2 = create_train_state(module, make_optimizer(1e-4),
                            jax.random.PRNGKey(0),
                            input_shape=(1, 224, 224, 3))
state2 = state2.replace(apply_fn=FT.make_apply(module))
batch2 = {"image": jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3),
                                            dtype=np.uint8)),
          "label": jnp.asarray(np.arange(B) % 2, jnp.int32)}
step2 = make_train_step(loss_fn, batch_prep=prep, donate=False)
t2 = timed(step2, state2, batch2)
print(f"[erf online+aug] fasttrain step: {t2*1e3:6.1f} ms "
      f"({B/t2:5.0f} img/s)", flush=True)
