"""Fused LayerNorm + residual BACKWARD as one Pallas pass.

Every transformer sub-layer in the flagship ViT is ``x + f(LN(x))``; its
backward tail is the f32 chain

    dxh = dxn * scale
    dx  = g + inv * (dxh - mean(dxh) - xh * mean(dxh * xh))
    dscale = sum(dxn * xh);  dbias = sum(dxn)

which XLA emits as several elementwise+reduce passes over [B, T, D] f32
tensors — the round-20 XProf trace attributed ~18 ms/step to these
chains across the 24 LN sites (BENCH_NOTES.md round 20; they sit on the
serial dx critical path of the backward, between the dxn GEMM of layer
i and the backward of layer i-1).  This kernel does the whole tail in
ONE read of each operand: per grid step it loads (xh, inv, dxn, g),
writes dx, and accumulates the parameter grads across the sequential
TPU grid into two [1, D] outputs.

``inv`` (the per-row rsqrt(var + eps)) is stored by the forward —
the fused attention-block kernel emits it for free
(models/fasttrain.py) and the MLP forward computes it anyway — so no
statistics are recomputed here.

Padding contract: callers may pass row-padded operands (fasttrain keeps
residuals at the 8-sublane granularity).  Pad rows carry dxn = 0 and
g = 0, so every term below is exactly zero there — dx pad rows come out
zero and the [1, D] sums see no spurious contribution; no masking is
needed.

Reference behavior: this is the VJP of torch.nn.LayerNorm inside the
pre-LN blocks of ``ViTFaceAntiSpoofing`` (reference vit_model.py via
timm) — numerics identical to XLA autodiff of the same f32 math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_res_bwd_kernel(xh_ref, inv_ref, dxn_ref, g_ref, lns_ref,
                       dx_ref, dlns_ref, dlnb_ref, *, block_b: int):
    lns = lns_ref[0].astype(jnp.float32)                     # [D]
    acc_s = acc_b = None
    for bi in range(block_b):
        dxn = dxn_ref[bi].astype(jnp.float32)                # [Tq, D]
        xh = xh_ref[bi].astype(jnp.float32)
        inv = inv_ref[bi].astype(jnp.float32)                # [Tq, 1]
        g = g_ref[bi].astype(jnp.float32)
        dxh = dxn * lns
        m1 = jnp.mean(dxh, axis=-1, keepdims=True)
        m2 = jnp.mean(dxh * xh, axis=-1, keepdims=True)
        dx_ref[bi] = (g + inv * (dxh - m1 - xh * m2)).astype(dx_ref.dtype)
        s = jnp.sum(dxn * xh, axis=0, keepdims=True)         # [1, D]
        t = jnp.sum(dxn, axis=0, keepdims=True)
        acc_s = s if acc_s is None else acc_s + s
        acc_b = t if acc_b is None else acc_b + t

    # parameter grads reduce over the whole batch: the TPU grid is
    # sequential, so the constant-index output block is revisited and
    # accumulated in place (canonical Pallas-TPU reduction pattern)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dlns_ref[...] = acc_s
        dlnb_ref[...] = acc_b

    @pl.when(pl.program_id(0) != 0)
    def _accumulate():
        dlns_ref[...] += acc_s
        dlnb_ref[...] += acc_b


def _block_b(b: int, tq: int, d: int, itemsizes) -> int:
    """Largest block_b whose double-buffered operand set fits scoped
    VMEM.  At the bf16 production shapes ([*, 200, 768], compact dxn)
    bb=4 is ~11 MB; with ALL-f32 operands the same bb measured 18.75M >
    the 16M cap on hardware (Mosaic stack OOM), so the choice must
    follow the dtypes, not a constant."""
    per_sample = tq * d * sum(itemsizes) + tq * 128 * 4   # + lane-padded inv
    budget = 14 * 2**20                                   # margin under 16M
    for cand in (8, 4, 2):
        if b % cand == 0 and 2 * cand * per_sample <= budget:
            return cand
    return 1


def ln_residual_bwd(xh, inv, dxn, g, lns, *, interpret: bool = False):
    """dx, dscale, dbias for ``y = x + f(LN(x))`` given the cotangents.

    xh   [B, Tq, D] stored normalized input (any float dtype)
    inv  [B, Tq, 1] f32 rsqrt(var + eps) per row
    dxn  [B, Tq, D] cotangent w.r.t. the LN affine output (f32 from the
         preceding GEMM)
    g    [B, Tq, D] cotangent w.r.t. y (flows through the residual)
    lns  [D] LN scale

    Returns dx [B, Tq, D] in ``g.dtype``'s family (the caller's compute
    dtype via xh.dtype), dscale [D] f32, dbias [D] f32.
    """
    b, tq, d = xh.shape
    bb = _block_b(b, tq, d, (xh.dtype.itemsize, dxn.dtype.itemsize,
                             g.dtype.itemsize, xh.dtype.itemsize))
    row = lns.reshape(1, -1)
    blk = lambda w: pl.BlockSpec((bb, tq, w), lambda i: (i, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    dx, dlns, dlnb = pl.pallas_call(
        functools.partial(_ln_res_bwd_kernel, block_b=bb),
        grid=(b // bb,),
        in_specs=[blk(d), blk(1), blk(d), blk(d),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(blk(d),
                   pl.BlockSpec((1, d), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, d), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, tq, d), xh.dtype),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * tq * d,
            bytes_accessed=(3 * xh.dtype.itemsize + 4 + xh.dtype.itemsize)
            * b * tq * d,
            transcendentals=0),
        interpret=interpret,
    )(xh, inv, dxn, g, row)
    return dx, dlns[0], dlnb[0]


def ln_residual_bwd_reference(xh, inv, dxn, g, lns):
    """Pure-XLA oracle of the same math (tests)."""
    dxn = dxn.astype(jnp.float32)
    xh32 = xh.astype(jnp.float32)
    lns32 = lns.astype(jnp.float32)
    dxh = dxn * lns32
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xh32, axis=-1, keepdims=True)
    dx = (g.astype(jnp.float32)
          + inv.astype(jnp.float32) * (dxh - m1 - xh32 * m2)).astype(xh.dtype)
    dlns = jnp.sum((dxn * xh32).reshape(-1, xh.shape[-1]), axis=0)
    dlnb = jnp.sum(dxn.reshape(-1, xh.shape[-1]), axis=0)
    return dx, dlns, dlnb
