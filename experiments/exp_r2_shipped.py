"""Round-2: measure the shipped paths after the fold + block_b=2 levers.

1. headline infer (bench.py protocol, folded normalization)
2. train step (Pallas fwd+bwd with block_b=2)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from vit_spoof_detection_pda_tpu.models.vit import (ViTAntiSpoof,
                                                    fold_normalization)
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                               make_optimizer,
                                               make_train_step)

B = 128


def timed(fn, *args, n1=10, n2=30, donate_state=None):
    np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    module = ViTAntiSpoof(dtype=jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.float32))
    folded = fold_normalization(variables)
    rng = np.random.default_rng(0)
    batch_u8 = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3),
                                        dtype=np.uint8))

    @jax.jit
    def infer(params, u8):
        logits = module.apply({"params": params}, u8).astype(jnp.float32)
        return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])[0]

    t = timed(infer, folded["params"], batch_u8)
    print(f"infer folded+b2: {t*1e3:.2f} ms  {B/t:.0f} img/s", flush=True)

    # train step
    tx = make_optimizer(1e-4)
    state = create_train_state(module, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 224, 224, 3))
    step = make_train_step(losses.make_loss_fn("focal"), donate=False)
    imgs = jnp.asarray(rng.standard_normal((B, 224, 224, 3)),
                       jnp.float32)
    labels = jnp.asarray(np.arange(B) % 2, jnp.int32)
    batch = {"image": imgs, "label": labels}

    def step1(s, b):
        s2, m = step(s, b)
        return m["loss"]

    np.asarray(step1(state, batch))

    def run(n):
        t0 = time.perf_counter()
        s, m = state, None
        for _ in range(n):
            s, m = step(s, batch)
        np.asarray(m["loss"])
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(5), run(15)
    tt = (t2 - t1) / 10
    print(f"train step: {tt*1e3:.2f} ms  {B/tt:.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
