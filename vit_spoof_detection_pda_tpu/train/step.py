"""pjit-compiled train / eval steps.

The reference's hot loop (train_advanced.py:315-365: H2D copy, autocast
forward, scaled backward, unscale-clip-step-update, meter `.item()` syncs
every batch) collapses here into ONE compiled XLA program per step:
forward+backward+clip+AdamW+metrics, with the batch sharded over the
``data`` mesh axis and the gradient all-reduce inserted by GSPMD.  No
loss scaling is needed — bf16 on TPU keeps fp32 range (the AMP GradScaler
machinery has no TPU equivalent by design).

Metrics come back as a tiny dict of scalars fetched asynchronously; no
per-batch host sync.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..parallel.mesh import batch_spec


def make_train_step(loss_fn: Callable, *, has_batch_stats: bool = False,
                    mesh: Optional[Mesh] = None, donate: bool = True,
                    batch_prep: Optional[Callable] = None):
    """Build the compiled train step.

    loss_fn(logits, labels) -> scalar.  The model is called through
    ``state.apply_fn`` with dropout rng threaded per-step (fold_in on the
    step counter keeps the key stream deterministic and resumable).

    ``batch_prep(rng, images) -> images`` runs INSIDE the compiled step
    (on-device augmentation + normalization fused with forward/backward:
    one program per step instead of two, no f32 image round-trip through
    HBM between them — the final ~10 img/s of the online-training
    target, BENCH_NOTES.md round 2).  Its rng is decorrelated from the
    dropout stream but equally deterministic/resumable.

    Pool mode (train/pool.py): a batch may carry ``index`` [B] int32, in
    which case ``image`` is the HBM-resident pool [N, S, S, 3] and the
    batch's rows are gathered ON DEVICE before batch_prep — the host
    ships ~512 bytes/step instead of ~19 MB.  Under a mesh the pool is
    replicated and index/label shard over ``data``, so the gather is
    local to each device (no collectives).
    """

    def step(state, batch):
        images, labels = batch["image"], batch["label"]
        if "index" in batch:
            packed = images.ndim == 3 and images.shape[-1] == 128
            one_device = mesh is None or mesh.size == 1
            if packed and one_device and jax.default_backend() == "tpu":
                # Lane-packed pool (train/pool.py stages [N,row//128,128]):
                # the Pallas scalar-prefetch gather reads rows at HBM
                # rate (+0.7 ms/step vs +21 XLA take on the NHWC pool,
                # exp_r24c).  Unpacked pools keep jnp.take — routing
                # them through the kernel forces a whole-pool relayout
                # every step (+73 ms, exp_r24b).  Multi-device meshes
                # keep jnp.take too (GSPMD cannot partition pallas_call;
                # the pool is replicated there, so the gather is local
                # and pays ~+1 ms on the packed layout) — a 1-device
                # mesh (the Trainer always builds one) has nothing to
                # partition and takes the kernel.
                from ..ops.gather_pallas import pool_gather
                images = pool_gather(images, batch["index"])
            else:
                images = jnp.take(images, batch["index"], axis=0)
        rng = jax.random.fold_in(state.rng, state.step)
        if batch_prep is not None:
            images = batch_prep(jax.random.fold_in(rng, 104729), images)

        def loss_of(params):
            variables = {"params": params}
            kwargs = {"train": True, "rngs": {"dropout": rng}}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                out, mut = state.apply_fn(
                    variables, images, mutable=["batch_stats"], **kwargs)
                logits = out
                new_stats = mut["batch_stats"]
            else:
                logits = state.apply_fn(variables, images, **kwargs)
                new_stats = None
            loss = loss_fn(logits, labels)
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        if has_batch_stats:
            new_state = new_state.replace(batch_stats=new_stats)
        preds = jnp.argmax(logits, axis=-1)
        metrics = {
            "loss": loss,
            "accuracy": jnp.mean((preds == labels).astype(jnp.float32)),
            "grad_norm": _global_norm_f32(grads),
        }
        return new_state, metrics

    if mesh is not None:
        def _in_shardings(batch):
            # the pool batch replicates its image operand; everything
            # else (and the plain-batch image) shards over ``data``
            pool = "index" in batch
            spec = {
                k: PartitionSpec() if (k == "image" and pool)
                else batch_spec() for k in batch}
            return (None, jax.tree.map(
                lambda s: NamedSharding(mesh, s), spec))

        # in_shardings must be static: build one jit per batch LAYOUT —
        # keyed on the sorted key set, not just the presence of "index",
        # so a batch with extra/missing keys gets its own jit instead of
        # a pytree-structure error inside a cached one
        jits = {}

        def dispatch(state, batch):
            key = tuple(sorted(batch))
            if key not in jits:
                jits[key] = jax.jit(
                    step, in_shardings=_in_shardings(batch),
                    donate_argnums=(0,) if donate else ())
            return jits[key](state, batch)

        return dispatch
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _global_norm_f32(tree):
    """Like optax.global_norm but with the squares ACCUMULATED in f32 —
    an intentional deviation for mixed-precision grad leaves (the
    optax_-style name previously implied this was the stock helper)."""
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def make_eval_step(apply_fn: Callable, *, has_batch_stats: bool = False,
                   positive_index: int = 1, mesh: Optional[Mesh] = None):
    """Compiled eval step: logits -> (pred, P(positive)).

    ``positive_index`` selects which softmax column is the score —
    column 1 is P(live) in the train/test stack (reference test.py:217)
    and P(spoof) in the harness convention (evaluate_all_models.py:145);
    both are "column 1 of softmax", the label convention adapter lives in
    the data layer.
    """

    def step(params, batch_stats, images):
        variables = {"params": params}
        if has_batch_stats and batch_stats is not None:
            variables["batch_stats"] = batch_stats
        logits = apply_fn(variables, images)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        return {"pred": preds, "score": probs[:, positive_index],
                "logits": logits}

    if mesh is not None:
        return jax.jit(step, in_shardings=(
            None, None, NamedSharding(mesh, batch_spec())))
    return jax.jit(step)
