"""Round-2: close the last ~5 ms to the >=800 img/s online target.

Variants (B=128, raw uint8 256^2 in, as production):
  sep_f32    aug+normalize program (f32) THEN train step   (prod today)
  sep_bf16   aug chain computed in bf16 (halved VPU/HBM traffic)
  fused_f32  ONE program: aug+normalize+train step
  fused_bf16 ONE program, bf16 chain
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.augment.policy import train_time_chain
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import augment as A
from vit_spoof_detection_pda_tpu.ops import image as I
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)

B = 128


def main():
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))
    labels = jnp.asarray(np.arange(B) % 2, jnp.int32)
    chain = train_time_chain()

    module = ViTAntiSpoof(dtype=jnp.bfloat16)
    tx = make_optimizer(1e-4)
    loss_fn = losses.make_loss_fn("focal")

    def fresh_state(seed=0):
        return create_train_state(module, tx, jax.random.PRNGKey(seed),
                                  input_shape=(1, 224, 224, 3))

    def aug_norm(key, u8, dtype):
        x = I.to_float(u8).astype(dtype)
        x = A.apply_chain(key, x, chain)
        return I.normalize(x.astype(jnp.float32))

    step = make_train_step(loss_fn, donate=False)

    def measure(one_step, tag):
        st = fresh_state()
        st, m = one_step(st, 0)
        np.asarray(m["loss"])

        def run(n):
            t0 = time.perf_counter()
            s, mm = st, None
            for i in range(n):
                s, mm = one_step(s, i)
            np.asarray(mm["loss"])
            return time.perf_counter() - t0

        run(2)
        t1, t2 = run(4), run(12)
        tt = (t2 - t1) / 8
        print(f"{tag}: {tt*1e3:.1f} ms  {B/tt:.0f} img/s", flush=True)

    key = jax.random.PRNGKey(0)

    for dtype, tag in ((jnp.float32, "sep_f32"), (jnp.bfloat16, "sep_bf16")):
        prep = jax.jit(lambda k, u8, d=dtype: aug_norm(k, u8, d))

        def one(st, i, prep=prep):
            img = prep(jax.random.fold_in(key, i), raw)
            return step(st, {"image": img, "label": labels})

        measure(one, tag)

    for dtype, tag in ((jnp.float32, "fused_f32"),
                       (jnp.bfloat16, "fused_bf16")):
        def fused(st, batch, d=dtype):
            k = jax.random.fold_in(st.rng, st.step + 104729)
            img = aug_norm(k, batch["image"], d)
            return step.__wrapped__(st, {"image": img,
                                         "label": batch["label"]}) \
                if hasattr(step, "__wrapped__") else None

        # build the fused step directly (cannot reuse the jitted `step`)
        def make_fused(d):
            def fstep(st, batch):
                k = jax.random.fold_in(st.rng, st.step + 104729)
                img = aug_norm(k, batch["image"], d)
                images, lbl = img, batch["label"]
                rng2 = jax.random.fold_in(st.rng, st.step)

                def loss_of(params):
                    logits = st.apply_fn({"params": params}, images,
                                         train=True,
                                         rngs={"dropout": rng2})
                    return loss_fn(logits, lbl), logits

                (lv, logits), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(st.params)
                new_state = st.apply_gradients(grads)
                return new_state, {"loss": lv}
            return jax.jit(fstep, donate_argnums=())

        fstep = make_fused(dtype)

        def one(st, i, fstep=fstep):
            return fstep(st, {"image": raw, "label": labels})

        measure(one, tag)


if __name__ == "__main__":
    main()
