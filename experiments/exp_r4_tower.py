"""Round-4: gather-free warp tower vs the packed-gather sampler.

Times the composed heavy/medium warps both ways, the full tier chains,
and the FUSED aug+train steps per severity group with the
severity-weighted epoch mix (protocol of exp_r3_online_mixed.py; round-3
baseline: heavy 274.7 / medium 279.5 / orig 154.6 ms, mix 617 img/s)."""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.augment.policy import CHAINS, train_time_chain
from vit_spoof_detection_pda_tpu.ops import augment as A
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)
from vit_spoof_detection_pda_tpu.train.driver import make_prep_fn
from vit_spoof_detection_pda_tpu.config import Config

B = 128
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.random((B, 224, 224, 3), np.float32), jnp.bfloat16)
key = jax.random.PRNGKey(0)
keys = jax.random.split(key, B)


def timed(fn, *args, n1=10, n2=30):
    np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]

    def run(n):
        o = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1) * 1000


def report(name, ms):
    print(f"{name:44s} {ms:8.2f} ms/batch  ({B / ms * 1000:6.0f} img/s)",
          flush=True)


# --- composed warp, both samplers ----------------------------------------
HEAVY = dict(hflip_p=0.5, rotation=(20.0, 0.7), perspective=(0.2, 0.4),
             elastic=(1.0, 32.0, 63, 0.3))
MEDIUM = dict(hflip_p=0.5, rotation=(15.0, 0.6), perspective=(0.15, 0.3))
for name, kw in (("heavy", HEAVY), ("medium", MEDIUM)):
    for sampler in ("tower", "gather"):
        f = jax.jit(jax.vmap(lambda k, im, kw=kw, s=sampler:
                             A.composed_geometric(k, im, sampler=s, **kw)))
        report(f"{name} composed warp [{sampler}]", timed(f, keys, imgs))

# --- full chains ----------------------------------------------------------
for tier in ("heavy", "medium", "light"):
    chain = CHAINS[tier]()
    f = jax.jit(lambda k, b, ch=chain: A.apply_chain(k, b, ch))
    report(f"{tier} full chain", timed(f, key, imgs))

# --- fused aug+train steps per severity group -----------------------------
cfg = Config()
module = ViTAntiSpoof(dtype=jnp.bfloat16)
state = create_train_state(module, make_optimizer(1e-4),
                           jax.random.PRNGKey(0),
                           input_shape=(1, 224, 224, 3))
loss_fn = losses.make_loss_fn("focal")
lbl = jnp.asarray(np.arange(B) % 2, jnp.int32)
b256 = {"image": jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3),
                                          dtype=np.uint8)), "label": lbl}
b224 = {"image": jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3),
                                          dtype=np.uint8)), "label": lbl}

chains = {"orig": train_time_chain()}
for g in ("heavy", "medium", "light"):
    chains[g] = CHAINS[g]()


def step_timed(step, batch, n1=6, n2=18):
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


times = {}
for g, chain in chains.items():
    prep = make_prep_fn(cfg, chain)
    step = make_train_step(loss_fn, batch_prep=prep, donate=False)
    batch = b256 if g == "orig" else b224
    times[g] = step_timed(step, batch)
    print(f"fused aug+train [{g}]: {times[g]:.1f} ms "
          f"({B / times[g] * 1000:.0f} img/s)", flush=True)

# severity-weighted epoch mix (same weights as exp_r3_online_mixed:
# derived from severity_for_copy over the 1:3.87 ratio)
wmix = {"orig": 0.2428, "heavy": 0.0971, "medium": 0.3301,
        "light": 0.3301}
mix_ms = sum(times[g] * w for g, w in wmix.items())
print(f"severity-weighted mix: {mix_ms:.1f} ms -> "
      f"{B / mix_ms * 1000:.0f} img/s", flush=True)
