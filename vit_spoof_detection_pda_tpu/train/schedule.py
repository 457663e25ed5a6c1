"""LR schedules.

The reference computes ``warmup_steps`` but never applies a warmup ramp:
CosineAnnealingLR simply runs with ``T_max = total - warmup`` starting at
full LR (train_advanced.py:599-607).  ``true_warmup=False`` reproduces
that exactly, including torch's cosine continuing past T_max — the
reference steps its scheduler once per ACCUMULATED update
(train_advanced.py:332-339), so over ``total/accum`` updates against a
``T_max`` sized in micro-steps the cosine under-advances; this port
instead sizes the horizon in updates (trainer.py divides by accum — a
documented deviation that completes the cosine).  ``true_warmup=True``
gives a real linear ramp followed by cosine decay.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_lr_schedule(base_lr: float, total_steps: int, warmup_steps: int = 0,
                     min_lr: float = 1e-6, true_warmup: bool = False):
    """Returns an optax-compatible schedule fn: step -> lr."""
    if true_warmup and warmup_steps > 0:
        decay_steps = max(total_steps - warmup_steps, 1)

        def sched(step):
            step = jnp.asarray(step, jnp.float32)
            warm = base_lr * step / warmup_steps
            t = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
            cos = min_lr + (base_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * t))
            return jnp.where(step < warmup_steps, warm, cos)

        return sched

    # Reference behavior: cosine over (total - warmup) steps from step 0,
    # full LR immediately; torch's formula is periodic so steps past T_max
    # curve back up — faithfully reproduced.
    t_max = max(total_steps - warmup_steps, 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        return min_lr + (base_lr - min_lr) * 0.5 * (
            1 + jnp.cos(jnp.pi * step / t_max))

    return sched
