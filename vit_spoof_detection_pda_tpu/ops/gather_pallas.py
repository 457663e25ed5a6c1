"""Pallas row-gather for the HBM-resident training pool.

XLA's TPU lowering of ``jnp.take(pool, idx, axis=0)`` costs +21 ms per
step for 128 rows of a 27k x 147 KB uint8 NHWC pool (full-step A/B,
exp_r24c) — which would eat most of the benefit of pool-mode training
(train/pool.py).  This kernel does what the hardware wants: the index
vector rides SCALAR PREFETCH, each grid program's input blocks are
selected by ``idx`` through the BlockSpec index_map, and Mosaic
double-buffers the row DMAs against the copies.  ``group`` rows per
program amortize the ~15 µs program overhead.

The pool MUST arrive lane-packed [N, row//128, 128] (train/pool.py
stages it that way): the internal reshape is then a no-op and the
gather measures +0.7 ms on the full step.  Feeding the NHWC pool
directly makes the in-step reshape physically relayout the whole pool
every step (+73 ms measured — exp_r24b/c; TPU tiles the two trailing
dims).  Rows that don't divide by 128 fall back to ``jnp.take``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# A/B escape hatch: route pool_gather back to jnp.take (exp_r24c).
DISABLE = False


def _kernel(idx_ref, *refs, group: int):
    out_ref = refs[-1]
    for j in range(group):
        out_ref[j] = refs[j][0]


def pool_gather(pool, idx, *, group: int = 8, interpret: bool = False):
    """uint8/any [N, ...] pool, int32 [B] indices -> [B, ...] rows.

    Semantically ``jnp.take(pool, idx, axis=0)`` (in-range indices);
    pass the pool pre-packed [N, row//128, 128] — see module docstring
    for the measured layout story (exp_r24b/c).
    """
    n = pool.shape[0]
    row_shape = pool.shape[1:]
    row = 1
    for s in row_shape:
        row *= s
    b = idx.shape[0]
    if DISABLE or row % 128 != 0:
        return jnp.take(pool, idx, axis=0)
    g = group
    while b % g != 0:           # pad-free grouping: largest divisor <= group
        g -= 1
    sub = row // 128
    pool2 = pool.reshape(n, sub, 128)
    idx = idx.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((1, sub, 128),
                         functools.partial(
                             lambda i, idx_ref, j: (idx_ref[i * g + j],
                                                    0, 0), j=j))
            for j in range(g)
        ],
        out_specs=pl.BlockSpec((g, sub, 128), lambda i, idx_ref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, group=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, sub, 128), pool.dtype),
        interpret=interpret,
    )(idx, *([pool2] * g))
    return out.reshape((b,) + row_shape)
