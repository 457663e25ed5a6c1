"""Train state + optimizer construction.

One pytree carries everything the reference persisted across its epoch
loop — params, optimizer state, step, PRNG key, and (for ResNet-style
models) batch statistics — so checkpoints capture the FULL resumable
state, fixing the reference's resume gap (its loader restores only
``model_state_dict``; test.py:167-188, SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    batch_stats: Any = None
    apply_fn: Any = struct.field(pytree_node=False, default=None)
    tx: Any = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


class EmaState(NamedTuple):
    """State of :func:`ema_of_params` — a shadow copy of the params.

    The field name is deliberately collision-proof: a template-free
    orbax restore turns this NamedTuple into ``{"polyak_shadow": ...}``
    and utils/checkpoint.py::_find_ema_subtree locates it by that
    single-key signature — a generic name like ``ema`` would collide
    with adamw's params-shaped ``mu``/``nu`` whenever a model's root
    module happens to carry the same name."""

    polyak_shadow: Any


def ema_of_params(decay: float) -> optax.GradientTransformation:
    """Track an exponential moving average of the POST-update params.

    Production-serving weights: EMA of the trajectory generalizes
    better than the last iterate (Polyak averaging; standard in vision
    training, absent from the reference).  Lives INSIDE the optimizer
    chain so it checkpoints/restores/shards with the rest of the
    optimizer state for free — chained after adamw, the incoming
    ``updates`` are the final deltas, so ``params + updates`` is the
    new iterate being averaged.  Retrieval: :func:`find_ema_params`.
    """
    if not 0.0 < decay < 1.0:
        raise ValueError(f"ema decay must be in (0, 1), got {decay}")

    def init_fn(params):
        # a REAL copy: jnp.asarray would alias the live param buffers
        # and the donated train step would then donate each twice
        return EmaState(polyak_shadow=jax.tree.map(jnp.copy, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ema_of_params needs params in update()")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                           state.polyak_shadow, new_params)
        return updates, EmaState(polyak_shadow=ema)

    return optax.GradientTransformation(init_fn, update_fn)


def find_ema_params(opt_state) -> Optional[Any]:
    """Locate the EMA shadow params inside a (possibly MultiSteps- or
    tuple-nested) optimizer state; None when EMA is not enabled."""
    if isinstance(opt_state, EmaState):
        return opt_state.polyak_shadow
    if isinstance(opt_state, optax.MultiStepsState):
        return find_ema_params(opt_state.inner_opt_state)
    if isinstance(opt_state, (tuple, list)):
        for sub in opt_state:
            found = find_ema_params(sub)
            if found is not None:
                return found
    return None


def make_optimizer(learning_rate, *, weight_decay: float = 0.05,
                   beta1: float = 0.9, beta2: float = 0.999,
                   max_grad_norm: Optional[float] = 1.0,
                   gradient_accumulation_steps: int = 1,
                   ema_decay: Optional[float] = None):
    """AdamW chain: global-norm clip -> adamw[ -> params-EMA][ -> MultiSteps].

    Mirrors the reference's clip_grad_norm(1.0) + AdamW(3e-4, wd=0.05,
    betas 0.9/0.999) + gradient_accumulation_steps
    (train_advanced.py:332-339, 592-597).  ``ema_decay`` adds the
    Polyak shadow params (inside MultiSteps, so the EMA ticks once per
    EFFECTIVE optimizer step, not per micro-batch).
    """
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(learning_rate, b1=beta1, b2=beta2,
                             weight_decay=weight_decay))
    if ema_decay is not None:
        chain.append(ema_of_params(ema_decay))
    tx = optax.chain(*chain)
    if gradient_accumulation_steps > 1:
        # documented deviation: MultiSteps applies the MEAN of the
        # accumulated micro-gradients; the reference sums them (its
        # loss is never divided by the accumulation count,
        # train_advanced.py:326-339), i.e. an accum-times-larger
        # gradient whenever the 1.0 clip is inactive.  Mean keeps the
        # effective LR independent of the accumulation count — the
        # standard semantics large-batch recipes assume.
        tx = optax.MultiSteps(tx, gradient_accumulation_steps)
    return tx


def create_train_state(module, tx, rng, input_shape=(1, 224, 224, 3),
                       variables=None, param_layout=None):
    """Initialize (or adopt converted) variables into a TrainState.

    ``param_layout(params) -> params`` applies a device layout (TP/FSDP
    sharding) BEFORE ``tx.init`` so the optimizer moments are created
    directly in that layout — initializing them replicated first and
    re-initializing after would transiently hold a second full set of
    Adam moments (~0.7 GB for ViT-B/16) on the default device."""
    init_rng, state_rng = jax.random.split(rng)
    if variables is None:
        variables = module.init(init_rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    if param_layout is not None:
        params = param_layout(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_rng,
        batch_stats=variables.get("batch_stats"),
        apply_fn=module.apply,
        tx=tx,
    )
