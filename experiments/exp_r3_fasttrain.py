"""Train step with the fused-block training forward (models/fasttrain)
vs the module path, B=128 erf + tanh."""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.models import fasttrain as FT
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)

B = 128
rng = np.random.default_rng(0)
batch = {"image": jnp.asarray(
    rng.standard_normal((B, 224, 224, 3)), jnp.float32),
    "label": jnp.asarray(np.arange(B) % 2, jnp.int32)}


def timed_step(step, state, n1=10, n2=30):
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


def timed_fwd(f, *args, n1=10, n2=30):
    float(f(*args))

    def run(n):
        o = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*args)
        float(o)
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


for gelu in os.environ.get("EXP_GELU", "erf,tanh").split(","):
    module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu=gelu)
    tx = make_optimizer(1e-4)
    state = create_train_state(module, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 224, 224, 3))
    loss_fn = losses.make_loss_fn("focal")
    fast_apply = FT.make_apply(module)

    if "fwd" in os.environ.get("EXP_PARTS", "fwd,step"):
        fwd_mod = jax.jit(lambda p, im: jnp.sum(
            module.apply({"params": p}, im).astype(jnp.float32)))
        t = timed_fwd(fwd_mod, state.params, batch["image"])
        print(f"[{gelu}] module fwd:     {t*1e3:6.1f} ms", flush=True)
        fwd_fast = jax.jit(lambda p, im: jnp.sum(
            fast_apply({"params": p}, im).astype(jnp.float32)))
        t = timed_fwd(fwd_fast, state.params, batch["image"])
        print(f"[{gelu}] fast fwd:       {t*1e3:6.1f} ms", flush=True)

    if "step" in os.environ.get("EXP_PARTS", "fwd,step"):
        step = make_train_step(loss_fn, donate=False)
        t_mod = timed_step(step, state)
        print(f"[{gelu}] module step:    {t_mod*1e3:6.1f} ms "
              f"({B/t_mod:5.0f} img/s)", flush=True)

        fast_state = state.replace(apply_fn=fast_apply)
        t_fast = timed_step(step, fast_state)
        print(f"[{gelu}] fasttrain step: {t_fast*1e3:6.1f} ms "
              f"({B/t_fast:5.0f} img/s)", flush=True)

        _, m1 = step(state, batch)
        _, m2 = step(fast_state, batch)
        print(f"[{gelu}] loss module={float(m1['loss']):.6f} "
              f"fast={float(m2['loss']):.6f}", flush=True)
