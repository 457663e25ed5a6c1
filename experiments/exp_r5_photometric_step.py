"""Round-5: photometric op costs measured with the ONLY protocol that
reproduced on this relay (BENCH_NOTES round 4 caveat): the full fused
aug+train step (>=130 ms programs, n=18 differenced).  exp_r4_photometric
could not resolve the standalone op timings.

Variants bound each heavy-tier photometric op by deletion, and race the
banded-matmul blur (ops/augment.py::_separable_blur2d_mm — per-sample 1D
kernel folded into a dense [224,224] operator, batched MXU matmuls)
against the shipped vmapped grouped conv."""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import augment as A
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
batch = {"image": jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3),
                                           dtype=np.uint8)),
         "label": jnp.asarray(np.arange(B) % 2, jnp.int32)}


def geo_heavy(k, im):
    return A.composed_geometric(k, im, hflip_p=0.5, rotation=(20.0, 0.7),
                                perspective=(0.2, 0.4),
                                elastic=(1.0, 32.0, 63, 0.3))


def geo_medium(k, im):
    return A.composed_geometric(k, im, hflip_p=0.5, rotation=(15.0, 0.6),
                                perspective=(0.15, 0.3))


def jit_heavy(k, im):
    return A.color_jitter(k, im, 0.4, 0.4, 0.4, 0.2, p=0.8, order="fixed")


OPS = {
    "heavy": {
        "geo": geo_heavy,
        "jitter": jit_heavy,
        "blur": lambda k, im: A.gaussian_blur(k, im, 5, (0.1, 2.0), p=0.5),
        "blur_mm": lambda k, im: A.gaussian_blur(k, im, 5, (0.1, 2.0),
                                                 p=0.5, method="matmul"),
        "noise": lambda k, im: A.gaussian_noise(k, im, std=0.05, p=0.3),
        "sharp": lambda k, im: A.random_sharpness(k, im, 2.0, p=0.3),
    },
    "medium": {
        "geo": geo_medium,
        "jitter": lambda k, im: A.color_jitter(k, im, 0.3, 0.3, 0.3, 0.1,
                                               p=0.7, order="fixed"),
        "blur": lambda k, im: A.gaussian_blur(k, im, 3, (0.1, 1.5), p=0.4),
        "blur_mm": lambda k, im: A.gaussian_blur(k, im, 3, (0.1, 1.5),
                                                 p=0.4, method="matmul"),
        "noise": lambda k, im: A.gaussian_noise(k, im, std=0.03, p=0.2),
    },
}

VARIANTS = {
    "heavy": [
        # the session's FIRST timed program carries ~9 ms/step of relay
        # overhead (measured via reversed-order rerun, BENCH_NOTES round
        # 5) — burn it on a discarded warm-up so the comparisons below
        # are position-controlled
        ("warmup (discard)", ["geo", "jitter", "blur", "noise", "sharp"]),
        ("shipped", ["geo", "jitter", "blur", "noise", "sharp"]),
        ("blur->matmul", ["geo", "jitter", "blur_mm", "noise", "sharp"]),
        ("no blur", ["geo", "jitter", "noise", "sharp"]),
        ("no noise", ["geo", "jitter", "blur", "sharp"]),
        ("no jitter", ["geo", "blur", "noise", "sharp"]),
        ("no sharp", ["geo", "jitter", "blur", "noise"]),
    ],
    "medium": [
        ("shipped", ["geo", "jitter", "blur", "noise"]),
        ("blur->matmul", ["geo", "jitter", "blur_mm", "noise"]),
    ],
}


def timed(step, n1=6, n2=18):
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


for tier, variants in VARIANTS.items():
    base = None
    for name, opnames in variants:
        chain = [OPS[tier][o] for o in opnames]
        step = make_train_step(loss_fn, batch_prep=make_prep_fn(cfg, chain),
                               donate=False)
        ms = timed(step)
        if name.startswith("warmup"):
            print(f"[{tier:6s}] {name:17s} {ms:6.1f} ms (discarded)",
                  flush=True)
            continue
        delta = "" if base is None else f"  (vs shipped {ms - base:+5.1f})"
        if base is None:
            base = ms
        print(f"[{tier:6s}] {name:17s} {ms:6.1f} ms "
              f"({B / ms * 1000:4.0f} img/s){delta}", flush=True)
