"""Round-2: augmentation chains + online end-to-end after the shear-roll
warp and fixed-order jitter.

Measures (B=128):
  train_chain   crop 256->224 + flip/rot shear + random-order jitter + erase
  train_fixedj  same with order="fixed" jitter (sensitivity)
  tiers         heavy / medium / light differential chains
  online e2e    normalize + train step fed by the train chain, sequenced
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.augment.policy import (
    make_batch_augmenter, train_time_chain)
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import image as I
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)

B = 128


def timed(fn, *args, n1=10, n2=30):
    o = fn(*args)
    np.asarray(jax.tree.leaves(o)[0].ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0].ravel()[0])
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32)
    imgs = jnp.asarray(rng.random((B, 224, 224, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)

    aug_train = make_batch_augmenter(train_time_chain())
    t = timed(aug_train, key, big)
    print(f"train_chain: {t*1e3:.1f} ms  {B/t:.0f} img/s", flush=True)
    t_chain = t

    from vit_spoof_detection_pda_tpu.ops import augment as A
    fixedj = train_time_chain()
    fixedj[2] = lambda k, im: A.color_jitter(k, im, 0.2, 0.2, 0.2, 0.1,
                                             p=1.0, order="fixed")
    aug_fixed = make_batch_augmenter(fixedj)
    t = timed(aug_fixed, key, big)
    print(f"train_fixedj: {t*1e3:.1f} ms  {B/t:.0f} img/s", flush=True)

    for tier in ("heavy", "medium", "light"):
        aug = make_batch_augmenter(tier)
        t = timed(aug, key, imgs)
        print(f"tier {tier}: {t*1e3:.1f} ms  {B/t:.0f} img/s", flush=True)

    # online end-to-end: chain -> normalize -> train step, sequenced on
    # one chip (the VERDICT task-2 number)
    module = ViTAntiSpoof(dtype=jnp.bfloat16)
    tx = make_optimizer(1e-4)
    state = create_train_state(module, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 224, 224, 3))
    step = make_train_step(losses.make_loss_fn("focal"), donate=False)
    labels = jnp.asarray(np.arange(B) % 2, jnp.int32)

    @jax.jit
    def prep(k, x):
        out = aug_train._fun(k, x) if hasattr(aug_train, "_fun") else None
        return out

    normalize = jax.jit(lambda x: I.normalize(x))

    def one_online_step(state, k, raw):
        x = aug_train(k, raw)
        x = normalize(x)
        s2, m = step(state, {"image": x, "label": labels})
        return s2, m

    s, m = one_online_step(state, key, big)
    np.asarray(m["loss"])

    def run(n):
        t0 = time.perf_counter()
        st = state
        mm = None
        for i in range(n):
            st, mm = one_online_step(st, jax.random.fold_in(key, i), big)
        np.asarray(mm["loss"])
        return time.perf_counter() - t0

    run(2)
    t1, t2 = run(4), run(12)
    tt = (t2 - t1) / 8
    print(f"online e2e: {tt*1e3:.1f} ms  {B/tt:.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
