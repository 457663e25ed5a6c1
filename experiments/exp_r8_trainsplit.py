"""Round-8: decompose the 123 ms B=128 train step (erf, fasttrain
default) into forward / backward / optimizer+overheads, on hardware.

Serving runs the same forward at ~27.6 ms/batch (roofline: ~16 ms MLP +
~11 ms attention, BENCH_NOTES round 3), so fwd+bwd at serving
efficiency would be ~83 ms; the shipped step measures 123.  This probe
locates the missing ~40 ms before any further kernel work: if it sits
in the backward GEMMs it is the known small-dot structural cost (head
dim 64 halves MXU N-utilization on the einsum backwards); if in the
optimizer/metrics/donation tail it may be fusable.

Variants (one process, position-controlled per BENCH_NOTES round-5
relay rules; full step timed FIRST and LAST to bracket drift):

  full  = fwd + bwd + clip + AdamW + metrics  (shipped make_train_step)
  grads = fwd + bwd only (value_and_grad, grad-norm scalar forces grads)
  fwd   = loss value only
  opt   = clip + AdamW on constant grads (donate-free apply_gradients)

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r8_trainsplit.py
"""

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from vit_spoof_detection_pda_tpu.models.fasttrain import make_apply
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.ops import losses
    from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                                   make_optimizer,
                                                   make_train_step)
    from vit_spoof_detection_pda_tpu.train.step import _global_norm_f32

    B = 128
    loss_fn = losses.make_loss_fn("focal")
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.standard_normal(
        (B, 224, 224, 3)).astype(np.float32)),
        "label": jnp.asarray(np.arange(B) % 2, jnp.int32)}
    module = ViTAntiSpoof(dtype=jnp.bfloat16)
    state = create_train_state(
        module, make_optimizer(1e-4), jax.random.PRNGKey(0),
        input_shape=(1, 224, 224, 3))
    state = state.replace(apply_fn=make_apply(module))

    full_step = make_train_step(loss_fn, donate=False)

    def loss_of(params, images, labels, rng_):
        logits = state.apply_fn({"params": params}, images, train=True,
                                rngs={"dropout": rng_})
        return loss_fn(logits, labels)

    @jax.jit
    def grads_step(params, batch):
        key = jax.random.PRNGKey(1)
        loss, grads = jax.value_and_grad(loss_of)(
            params, batch["image"], batch["label"], key)
        return loss, _global_norm_f32(grads)

    @jax.jit
    def fwd_step(params, batch):
        return loss_of(params, batch["image"], batch["label"],
                       jax.random.PRNGKey(1))

    ones_grads = jax.tree.map(jnp.ones_like, state.params)

    # Donate the incoming state and thread it through a cell: the timed
    # block enqueues n2 executions ahead, and without donation each one
    # allocates a fresh ~1 GB TrainState output (OOM on the first queue
    # run, 2026-08-19).  The threaded chain keeps exactly one state live.
    @partial(jax.jit, donate_argnums=0)
    def opt_step(st, grads):
        new = st.apply_gradients(grads)
        return new, jnp.sum(new.params["head"]["fc2"]["bias"])

    opt_cell = [jax.tree.map(jnp.copy, state)]

    def opt_fn():
        new, sc = opt_step(opt_cell[0], ones_grads)
        opt_cell[0] = new
        return sc

    def timed(tag, fn, fetch, n1=6, n2=18):
        """Relay-differenced steady state: (t(n1+n2) - t(n1)) / n2."""
        outs = [fn() for _ in range(n1)]        # warm this executable
        fetch(outs[-1])
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n1)]
        fetch(outs[-1])
        t1 = time.perf_counter()
        outs = [fn() for _ in range(n2)]
        fetch(outs[-1])
        t2 = time.perf_counter()
        ms = (t2 - t1) / n2 * 1000
        print(f"{tag:6s} {ms:7.2f} ms/step (short-block "
              f"{(t1 - t0) / n1 * 1000:.2f})", flush=True)
        return ms

    # compile everything first (order-independent), then time
    s, m = full_step(state, batch)
    float(m["loss"])
    float(grads_step(state.params, batch)[0])
    float(fwd_step(state.params, batch))
    float(opt_fn())

    r = {}
    r["full_a"] = timed("full", lambda: full_step(state, batch)[1],
                        lambda o: float(o["loss"]))
    r["grads"] = timed("grads", lambda: grads_step(state.params, batch),
                       lambda o: float(o[0]))
    r["fwd"] = timed("fwd", lambda: fwd_step(state.params, batch),
                     lambda o: float(o))
    r["opt"] = timed("opt", opt_fn, lambda o: float(o))
    r["full_b"] = timed("full", lambda: full_step(state, batch)[1],
                        lambda o: float(o["loss"]))

    full = min(r["full_a"], r["full_b"])
    print({
        "full_ms": round(full, 1),
        "fwd_ms": round(r["fwd"], 1),
        "bwd_ms": round(r["grads"] - r["fwd"], 1),
        "opt_ms": round(r["opt"], 1),
        "residual_ms": round(full - r["grads"] - r["opt"], 1),
        "drift_full": [round(r["full_a"], 1), round(r["full_b"], 1)],
    }, flush=True)


if __name__ == "__main__":
    main()
