"""Fused-block TRAINING forward for the flagship ViT.

The serving path (models/fastserve.py) runs each pre-LN attention
sub-layer as one Pallas program; training couldn't use it because the
kernel had no VJP.  This module closes that gap with a custom-VJP
attention block whose forward is the same fused kernel EXTENDED to also
emit the ``qkv`` projection and the attention output — exactly the
residuals the XLA autodiff path would have stored anyway — so the
backward needs **no recomputation**:

  forward:  one Pallas program per layer
            (LN1 + QKV GEMM + attention + proj + residual,
             weights VMEM-resident; extra outputs qkv, attn_out)
  backward: plain XLA GEMMs for the weight/LN grads plus the existing
            Pallas attention backward (ops.attention._backward_qkv) —
            byte-for-byte the same backward work as the module path.

The functional forward (:func:`train_forward`) mirrors
``ViTAntiSpoof.__call__`` over the same param tree (models/vit.py), with
head dropout driven by an explicit rng.  :func:`make_apply` wraps it in
a ``module.apply``-compatible callable so ``TrainState.apply_fn`` /
``make_train_step`` need no changes.

Measured verdict (v5e, B=128, erf, BENCH_NOTES.md round 3): the fused
forward saves ~6 ms (44.1 vs 50.1 ms) and, with the residuals padded
only to the 8-sublane granularity (197->200 instead of the kernel's
256-lane compute tile), the backward keeps it: **124.5 vs 130.3
ms/step (+4.6%)**.  With 256-padded residuals the backward's +30%
zero-row weight-grad GEMMs returned the entire win (129.4 ms) — the
row padding of the residual tensors, not the backward math, was the
whole game.  Default ON (`model.fused_train_forward`).

Round-26 backward wave (BENCH_NOTES.md round 26, exp_r27/r27b): the
f32 LN/residual backward chains now run as ONE Pallas pass per site
(ops/ln_bwd.py; the forward kernel emits inv for free), the MLP default
moved to the stored-hidden custom VJP so its LN tail uses the kernel
too, and dxn is emitted in the compute dtype (the attention-backward
input-dtype rule).  Full-step interleaved A/B: **125.6 -> 120.0
ms/step erf (+4.5%)** — the remaining round-20 LN attribution was
overlapped behind MXU work, re-confirming that per-op roofline tables
do not compose into program time.

Dispatch: the fused path engages on a single-device TPU backend or
under ``ops.attention.attention_sharding(interpret=True)`` (CPU tests);
anywhere else ``make_apply`` returns ``module.apply`` unchanged, so
multi-device meshes keep the shard_map dispatch inside the module.

Gradient parity vs ``module.apply`` is pinned by
tests/test_fasttrain.py (exact-ish at f32, bf16-tolerance under the
serving policy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.attention import _backward_qkv, _block_b_for, _round_up


# --------------------------------------------------------------------------
# Fused attention block with residual outputs (training forward kernel)
# --------------------------------------------------------------------------


def _attn_block_train_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                             wproj_ref, bproj_ref, o_ref, qkv_ref,
                             attn_ref, xh_ref, inv_ref, *, scale: float,
                             valid_len: int, num_heads: int,
                             head_dim: int, block_b: int, eps: float,
                             out_rows: int):
    """Serving attention-block kernel (ops/attention.py
    ``_attn_block_kernel``) with four extra outputs: the [Tp, 3D] QKV
    projection, the [Tp, D] pre-proj attention output, the LN
    pre-affine normalization xhat, and the per-row rsqrt(var+eps) — the
    autodiff residuals.  Emitting them costs the HBM writes the unfused
    path's op outputs cost anyway, so the fusion win is kept; they stay
    PADDED so the backward never re-pads."""
    tp = x_ref.shape[1]
    d = num_heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < valid_len
    for bi in range(block_b):
        x = x_ref[bi].astype(jnp.float32)                    # [Tp, D]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)                       # [Tp, 1]
        inv_ref[bi] = inv[:out_rows]
        xh = (x - mu) * inv
        xh_ref[bi] = xh[:out_rows].astype(xh_ref.dtype)
        xn = (xh * lns_ref[0].astype(jnp.float32)
              + lnb_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
        qkv = jax.lax.dot_general(
            xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
        qkv_ref[bi] = qkv[:out_rows]
        heads_out = []
        for h in range(num_heads):
            q = qkv[:, h * head_dim:(h + 1) * head_dim]
            k = qkv[:, d + h * head_dim:d + (h + 1) * head_dim]
            v = qkv[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(mask, logits, -1e30)
            w = jax.nn.softmax(logits, axis=-1)
            heads_out.append(jnp.dot(w.astype(v.dtype), v,
                                     preferred_element_type=jnp.float32))
        attn_out = jnp.concatenate(heads_out, axis=1).astype(x_ref.dtype)
        attn_ref[bi] = attn_out[:out_rows]
        proj = jax.lax.dot_general(
            attn_out[:out_rows], wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[bi] = (x[:out_rows] + proj
                     + bproj_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _attn_block_fwd_pallas(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                           num_heads: int, eps: float, interpret: bool):
    b, t, d = x.shape
    head_dim = d // num_heads
    # everything — compute tile AND residual outputs — runs at the
    # 8-sublane granularity (197 -> 200, not a 128-lane round to 256):
    # [200, 200] attention beats [256, 256] by ~22% FLOPs/VPU work and
    # the backward's weight-grad GEMMs see no zero-row padding (the
    # 256-row variants measured 129.4-138.6 vs 124.5 ms/step,
    # BENCH_NOTES.md round 3).  Pad rows carry deterministic finite
    # values (LN of a zero row), and the backward zero-pads g, so they
    # contribute nothing.
    tp = _round_up(t, 8)
    to = tp
    scale = float(head_dim) ** -0.5
    block_b = _block_b_for(b)
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    row = lambda a: jnp.asarray(a).reshape(1, -1)            # noqa: E731
    const = lambda i: (0, 0)                                 # noqa: E731
    kernel = functools.partial(
        _attn_block_train_kernel, scale=scale, valid_len=t,
        num_heads=num_heads, head_dim=head_dim, block_b=block_b, eps=eps,
        out_rows=to)
    blk = lambda r, w: pl.BlockSpec((block_b, r, w), lambda i: (i, 0, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    o, qkv, attn, xh, inv = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[
            blk(tp, d),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(blk(to, d), blk(to, 3 * d), blk(to, d), blk(to, d),
                   blk(to, 1)),
        out_shape=(jax.ShapeDtypeStruct((b, to, d), x.dtype),
                   jax.ShapeDtypeStruct((b, to, 3 * d), x.dtype),
                   jax.ShapeDtypeStruct((b, to, d), x.dtype),
                   jax.ShapeDtypeStruct((b, to, d), x.dtype),
                   jax.ShapeDtypeStruct((b, to, 1), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tp * d * 4 * d
            + 4 * b * num_heads * tp * tp * head_dim,
            bytes_accessed=9 * b * to * d * x.dtype.itemsize,
            transcendentals=b * num_heads * tp * tp),
        interpret=interpret,
    )(xp, row(lns), row(lnb), wqkv, row(bqkv), wproj, row(bproj))
    return o[:, :t], qkv, attn, xh, inv


def _ln_forward(x, scale, bias, eps):
    """f32 LayerNorm (normalized + affine) — _ln_xhat's affine output;
    backward-pass statistics are recomputed where needed (_abt_bwd)."""
    return _ln_xhat(x, scale, bias, eps)[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def attn_block_train(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                     num_heads: int, eps: float, interpret: bool):
    """x + proj(attention(LN1(x) @ Wqkv + b)) with fused Pallas forward
    and recompute-free backward.  Weight args are the COMPUTE dtype
    (cast outside); LN params stay f32."""
    # non-differentiated calls (e.g. a plain forward through the
    # make_apply wrapper) take the SERVING kernel: identical math, one
    # output — the residual-emitting kernel writes ~2.4x the useful
    # bytes (qkv/attn/xhat) that XLA cannot DCE out of an opaque
    # pallas_call.  The residuals are produced only in _abt_fwd, where
    # the backward actually consumes them.
    from ..ops.attention import fused_attention_block
    return fused_attention_block(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                                 num_heads, eps=eps, interpret=interpret)


# Fold the LN/residual backward tail into ONE Pallas pass
# (ops/ln_bwd.py) instead of XLA's elementwise+reduce chains.  Module
# flag read at TRACE time (same caveat as ops.attention.BWD_PHASED):
# set before the first step compiles; A/B across fresh jit scopes.
LN_BWD_PALLAS = True

# Emit the dxn cotangent (the LN kernel's largest operand) in the
# COMPUTE dtype instead of f32 — the input-dtype rule the attention
# backward already ships (BENCH_NOTES round 22); halves the [B,T,D]
# write+read between the dxn GEMM and the LN tail on the bf16 path.
# Trace-time flag (A/B in exp_r27b).
DXN_COMPACT = True


def _abt_fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, num_heads, eps,
             interpret):
    o, qkv, attn, xh, inv = _attn_block_fwd_pallas(
        x, lns, lnb, wqkv, bqkv, wproj, bproj, num_heads, eps, interpret)
    return o, (x, qkv, attn, xh, inv, lns, lnb, wqkv, wproj)


def _abt_bwd(num_heads, eps, interpret, res, g):
    """Recompute-free backward over the kernel's PADDED residuals.

    Zero-padded cotangent rows stay zero through every product below
    (the Pallas attention backward gives dqkv = 0 on zero-g rows), so
    all padded-operand GEMMs contribute nothing spurious; only dxn/xh
    are sliced back for the row-local LayerNorm backward."""
    x, qkv, attn, xh, inv, lns, lnb, wqkv, wproj = res
    b, t, d = x.shape
    tp = qkv.shape[1]
    g32 = g.astype(jnp.float32)
    g_p = jnp.pad(g, ((0, 0), (0, tp - t), (0, 0)))
    # weight-grad dots run over the PADDED row space: pad rows are zero
    # on the cotangent side, so they add nothing — and +30% zero-row GEMM
    # FLOPs measured FASTER than slicing first (slices materialize;
    # 129.4 vs 132.2 ms/step, BENCH_NOTES.md round 3)

    # proj GEMM grads (same dots XLA's autodiff would emit)
    dbproj = jnp.sum(g32, axis=(0, 1))
    dwproj = jax.lax.dot_general(
        attn.reshape(-1, d), g_p.reshape(-1, d), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wproj.dtype)
    dattn = jax.lax.dot_general(
        g_p, wproj, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)

    # attention core: existing Pallas VMEM backward (recomputes softmax
    # from qkv in-kernel; ops/attention.py::_attn_qkv_bwd_kernel),
    # operating on the already-padded residuals
    dqkv = _backward_qkv(qkv, dattn, num_heads, interpret=interpret,
                         valid_len=t)                        # padded

    # QKV GEMM grads; xn rebuilt elementwise from the stored xhat
    xh32_p = xh.astype(jnp.float32)
    xn = (xh32_p * lns.astype(jnp.float32)
          + lnb.astype(jnp.float32)).astype(x.dtype)
    dq2 = dqkv.reshape(-1, 3 * d)
    dwqkv = jax.lax.dot_general(
        xn.reshape(-1, d), dq2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(wqkv.dtype)
    dbqkv = jnp.sum(dq2.astype(jnp.float32), axis=0)
    dxn = jax.lax.dot_general(
        dqkv, wqkv, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [B,Tp,D] f32
    if DXN_COMPACT and LN_BWD_PALLAS:
        dxn = dxn.astype(x.dtype)    # GEMM epilogue cast; bf16 buffer

    # LayerNorm backward (row-local): one fused Pallas pass over the
    # PADDED residuals (pad rows have dxn = g = 0, so they contribute
    # exactly zero — ops/ln_bwd.py padding contract), replacing XLA's
    # ~1.5 ms/layer f32 elementwise+reduce chains on the serial dx
    # critical path (BENCH_NOTES round 20)
    if LN_BWD_PALLAS:
        from ..ops.ln_bwd import ln_residual_bwd
        dx_p, dlns, dlnb = ln_residual_bwd(xh, inv, dxn, g_p, lns,
                                           interpret=interpret)
        dx = dx_p[:, :t]
    else:
        dxn = dxn[:, :t]
        xh32 = xh32_p[:, :t]
        dlns = jnp.sum((dxn * xh32).reshape(-1, d), axis=0)
        dlnb = jnp.sum(dxn.reshape(-1, d), axis=0)
        dxh = dxn * lns.astype(jnp.float32)
        inv_t = inv[:, :t]
        dx_ln = inv_t * (
            dxh - jnp.mean(dxh, axis=-1, keepdims=True)
            - xh32 * jnp.mean(dxh * xh32, axis=-1, keepdims=True))
        dx = (g32 + dx_ln).astype(x.dtype)
    return (dx, dlns.astype(lns.dtype), dlnb.astype(lnb.dtype), dwqkv,
            dbqkv.astype(jnp.float32), dwproj, dbproj.astype(jnp.float32))


attn_block_train.defvjp(_abt_fwd, _abt_bwd)


# --------------------------------------------------------------------------
# MLP sub-layer with store-only-xhat VJP (recompute-hidden backward)
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def mlp_block_train(x, lns, lnb, w1, b1, w2, b2, approx: bool,
                    eps: float):
    """x + fc2(gelu(fc1(LN2(x)))) saving only (x, xhat) for the
    backward, which recomputes the [rows, 3072] hidden with ONE extra
    roofline GEMM instead of reading a ~150 MB/layer residual back from
    HBM.

    MEASURED REJECTION as the default (VERDICT r2 item 4, v5e B=128):
    on an ISOLATED 12-layer MLP chain it wins (fwd+bwd 85.2 -> 74.4 ms,
    exp_r4_mlpvjp.py), but inside the full fasttrain model the hidden
    residual's traffic is overlapped with the attention-block work and
    the recompute GEMM is pure loss: full step 123.1 -> 138.6 ms erf /
    112.7 -> 116.9 tanh (150.9 erf with an f32 gelu recompute — the
    recompute must stay in the compute dtype).  Ships OPT-IN
    (``train_forward(xhat_mlp=True)``) for memory-bound regimes: it
    drops ~150 MB/layer of stored residuals, the difference between
    fitting a batch and not at larger B/T.  Gradient parity vs autodiff
    is f32-ulp under SGD (tests/test_fasttrain.py)."""
    xh, yn = _ln_xhat(x, lns, lnb, eps)
    h = (jnp.dot(yn.astype(x.dtype), w1,
                 preferred_element_type=jnp.float32) + b1).astype(x.dtype)
    a = jax.nn.gelu(h, approximate=approx)
    out = jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2
    return (x.astype(jnp.float32) + out).astype(x.dtype)


def _ln_xhat(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    xh = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return xh, xh * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _mbt_fwd(x, lns, lnb, w1, b1, w2, b2, approx, eps):
    xh, yn = _ln_xhat(x, lns, lnb, eps)
    h = (jnp.dot(yn.astype(x.dtype), w1,
                 preferred_element_type=jnp.float32) + b1).astype(x.dtype)
    a = jax.nn.gelu(h, approximate=approx)
    out = jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2
    y = (x.astype(jnp.float32) + out).astype(x.dtype)
    return y, (x, xh.astype(x.dtype), lns, lnb, w1, b1, w2)


def _mbt_bwd(approx, eps, res, g):
    x, xh, lns, lnb, w1, b1, w2 = res
    b, t, d = x.shape
    hid = w1.shape[1]
    g32 = g.astype(jnp.float32)
    xh32 = xh.astype(jnp.float32)
    xn = (xh32 * lns.astype(jnp.float32)
          + lnb.astype(jnp.float32)).astype(x.dtype)
    # the traded GEMM: rebuild the hidden pre-activation in the COMPUTE
    # dtype (matching the forward), then gelu + derivative via a local
    # vjp (exact for both the erf and tanh modes, no hand-written
    # derivative).  An f32 recompute variant measured ~10 ms/step
    # slower at erf — the [rows,3072] transcendental recompute must not
    # run wider than the forward's.
    h = (jnp.dot(xn, w1, preferred_element_type=jnp.float32)
         + b1).astype(x.dtype)
    a, gelu_vjp = jax.vjp(
        lambda hh: jax.nn.gelu(hh, approximate=approx), h)
    da = jnp.dot(g.astype(x.dtype), w2.T,
                 preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(
        a.reshape(-1, hid), g.astype(x.dtype).reshape(-1, d),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w2.dtype)
    db2 = jnp.sum(g32, axis=(0, 1))
    dh = gelu_vjp(da.astype(x.dtype))[0]
    dw1 = jax.lax.dot_general(
        xn.reshape(-1, d), dh.reshape(-1, hid), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=(0, 1))
    dxn = jnp.dot(dh, w1.T, preferred_element_type=jnp.float32)
    dlns = jnp.sum(dxn * xh32, axis=(0, 1)).astype(lns.dtype)
    dlnb = jnp.sum(dxn, axis=(0, 1)).astype(lnb.dtype)
    dxh = dxn * lns.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    var = jnp.var(x32, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    dx_ln = inv * (dxh - jnp.mean(dxh, axis=-1, keepdims=True)
                   - xh32 * jnp.mean(dxh * xh32, axis=-1, keepdims=True))
    dx = (g32 + dx_ln).astype(x.dtype)
    return (dx, dlns, dlnb, dw1, db1.astype(jnp.float32), dw2,
            db2.astype(jnp.float32))


mlp_block_train.defvjp(_mbt_fwd, _mbt_bwd)


# --------------------------------------------------------------------------
# MLP sub-layer with stored-hidden VJP (autodiff residuals, fused LN tail)
# --------------------------------------------------------------------------


def _ln_xhat_inv(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xh = (x32 - mu) * inv
    return xh, xh * scale.astype(jnp.float32) + bias.astype(jnp.float32), inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def mlp_block_train_h(x, lns, lnb, w1, b1, w2, b2, approx: bool,
                      eps: float, interpret: bool):
    """x + fc2(gelu(fc1(LN2(x)))) with the AUTODIFF residual strategy
    (store the pre-activation hidden ``h``; recompute the GELU gate
    elementwise like ops/gelu.py::gelu_lean — no GEMM recompute, the
    measured rejection of :func:`mlp_block_train` as default) but with
    the LN/residual backward tail folded into the ops/ln_bwd.py Pallas
    pass instead of XLA's f32 elementwise+reduce chains.  Stores
    (xh, inv, h) — strictly less than autodiff's residual set (no
    gelu-output tensor, no f32 xhat).

    Gradient parity vs the autodiff path is pinned by
    tests/test_fasttrain.py (same f32 math, reduction order differs at
    tolerance level)."""
    _, yn, _ = _ln_xhat_inv(x, lns, lnb, eps)
    h = (jnp.dot(yn.astype(x.dtype), w1,
                 preferred_element_type=jnp.float32) + b1).astype(x.dtype)
    a = jax.nn.gelu(h, approximate=approx)
    out = jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2
    return (x.astype(jnp.float32) + out).astype(x.dtype)


def _mbh_fwd(x, lns, lnb, w1, b1, w2, b2, approx, eps, interpret):
    xh, yn, inv = _ln_xhat_inv(x, lns, lnb, eps)
    h = (jnp.dot(yn.astype(x.dtype), w1,
                 preferred_element_type=jnp.float32) + b1).astype(x.dtype)
    a = jax.nn.gelu(h, approximate=approx)
    out = jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2
    y = (x.astype(jnp.float32) + out).astype(x.dtype)
    return y, (xh.astype(x.dtype), inv, h, lns, lnb, w1, w2)


def _mbh_bwd(approx, eps, interpret, res, g):
    xh, inv, h, lns, lnb, w1, w2 = res
    d, hid = w1.shape
    cdt = h.dtype
    g32 = g.astype(jnp.float32)
    gc = g.astype(cdt)
    # gate recompute: elementwise, fuses into the cotangent chain (the
    # gelu_lean strategy; exact same formula as the forward)
    a, gelu_vjp = jax.vjp(
        lambda hh: jax.nn.gelu(hh, approximate=approx), h)
    da = jnp.dot(gc, w2.T, preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(
        a.reshape(-1, hid), gc.reshape(-1, d), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w2.dtype)
    db2 = jnp.sum(g32, axis=(0, 1))
    dh = gelu_vjp(da.astype(cdt))[0]
    xn = (xh.astype(jnp.float32) * lns.astype(jnp.float32)
          + lnb.astype(jnp.float32)).astype(cdt)
    dw1 = jax.lax.dot_general(
        xn.reshape(-1, d), dh.reshape(-1, hid), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=(0, 1))
    dxn = jnp.dot(dh, w1.T, preferred_element_type=jnp.float32)
    if DXN_COMPACT:
        dxn = dxn.astype(cdt)        # GEMM epilogue cast; bf16 buffer
    from ..ops.ln_bwd import ln_residual_bwd
    dx, dlns, dlnb = ln_residual_bwd(xh, inv, dxn, g, lns,
                                     interpret=interpret)
    return (dx, dlns.astype(lns.dtype), dlnb.astype(lnb.dtype), dw1,
            db1.astype(jnp.float32), dw2, db2.astype(jnp.float32))


mlp_block_train_h.defvjp(_mbh_fwd, _mbh_bwd)


# --------------------------------------------------------------------------
# MLP sub-layer with FUSED Pallas forward (training variant of the
# serving ops/attention.py::_mlp_block_kernel) + stored-hidden VJP
# --------------------------------------------------------------------------


def _erf_approx_f32(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |error| <= 1.5e-7 —
    Mosaic has no erf/erfc primitive (only erf_inv), so the exact-GELU
    kernel emulates it; 1.5e-7 relative is ~4 decades below the bf16
    resolution of the stored activations, so the forward activation and
    the backward's XLA exact-erfc gate recompute agree to rounding
    noise."""
    p = 0.3275911
    a1, a2 = 0.254829592, -0.284496736
    a3, a4, a5 = 1.421413741, -1.453152027, 1.061405429
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
               * jnp.exp(-ax * ax))
    return jnp.where(x >= 0, y, -y)


def _gelu_kernel(hc, approx: bool, out_dtype):
    """GELU inside a Mosaic kernel: tanh flavor lowers natively; the
    erf flavor goes through :func:`_erf_approx_f32`."""
    if approx:
        return jax.nn.gelu(hc, approximate=True)
    x32 = hc.astype(jnp.float32)
    return (0.5 * x32 * (1.0 + _erf_approx_f32(
        x32 * 0.7071067811865476))).astype(out_dtype)


def _mlp_block_train_p_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                              w2_ref, b2_ref, o_ref, xh_ref, inv_ref,
                              h_ref, *, eps: float, n_chunks: int,
                              approx: bool):
    """Serving MLP-block kernel extended for TRAINING: erf/tanh GELU and
    three residual outputs (xhat, inv, the bf16 pre-activation hidden —
    exactly the stored-hidden VJP's residual set).  The hidden is cast
    to the compute dtype BEFORE the gelu so the stored value, the
    forward activation, and the backward's gate recompute all see the
    identical rounded tensor (the :func:`mlp_block_train_h` numerics).
    The [M, 4D] activation still never round-trips to HBM between fc1
    and fc2; only the single h residual (which autodiff stores anyway)
    is written."""
    hidden = w1_ref.shape[1]
    chunk = hidden // n_chunks
    x = x_ref[...].astype(jnp.float32)                        # [M, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    inv_ref[...] = inv
    xh = (x - mu) * inv
    xh_ref[...] = xh.astype(xh_ref.dtype)
    xn = (xh * lns_ref[0].astype(jnp.float32)
          + lnb_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    acc = x + b2_ref[0].astype(jnp.float32)
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        hc = (jax.lax.dot_general(
            xn, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b1_ref[0, sl].astype(jnp.float32)).astype(x_ref.dtype)
        h_ref[:, sl] = hc
        a = _gelu_kernel(hc, approx, x_ref.dtype)
        acc = acc + jax.lax.dot_general(
            a, w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _mlp_fwd_pallas(x, lns, lnb, w1, b1, w2, b2, approx: bool,
                    eps: float, interpret: bool, m_tile: int = 128,
                    n_chunks: int = 2):
    """Flat [B*T, D] row tiling like the serving kernel; m_tile=128
    divides B*197 exactly at the production batch shapes, so the
    returned FLAT residuals carry no pad rows there (general shapes
    zero-pad; pad rows are handled by the backward's padding contract).
    Returns (y [B,T,D], xh [rp,D], inv [rp,1], h [rp,hidden])."""
    b, t, d = x.shape
    hidden = w1.shape[1]
    rows = b * t
    rp = (rows + m_tile - 1) // m_tile * m_tile
    xf = x.reshape(rows, d)
    if rp != rows:
        xf = jnp.pad(xf, ((0, rp - rows), (0, 0)))
    row = lambda a: jnp.asarray(a).reshape(1, -1)            # noqa: E731
    const = lambda i: (0, 0)                                 # noqa: E731
    kernel = functools.partial(_mlp_block_train_p_kernel, eps=eps,
                               n_chunks=n_chunks, approx=approx)
    blk = lambda w: pl.BlockSpec((m_tile, w), lambda i: (i, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    y, xh, inv, h = pl.pallas_call(
        kernel,
        grid=(rp // m_tile,),
        in_specs=[
            blk(d),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(blk(d), blk(d), blk(1), blk(hidden)),
        out_shape=(jax.ShapeDtypeStruct((rp, d), x.dtype),
                   jax.ShapeDtypeStruct((rp, d), x.dtype),
                   jax.ShapeDtypeStruct((rp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rp, hidden), x.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=4 * rp * d * hidden,
            bytes_accessed=(3 * rp * d + rp * hidden) * x.dtype.itemsize,
            transcendentals=rp * hidden),
        interpret=interpret,
    )(xf, row(lns), row(lnb), w1, row(b1), w2, row(b2))
    return y[:rows].reshape(b, t, d), xh, inv, h


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def mlp_block_train_p(x, lns, lnb, w1, b1, w2, b2, approx: bool,
                      eps: float, interpret: bool):
    """x + fc2(gelu(fc1(LN2(x)))) with the WHOLE forward as one Pallas
    program (VMEM-resident weights, hidden chunked through VMEM) and
    the stored-hidden backward of :func:`mlp_block_train_h`.

    MEASURED REJECTION as the default (exp_r27c, v5e B=128 erf): full
    step 134.3 vs the hidden mode's 120.4 ms — the round-20 "fc1
    fusion writes three [B,T,4D] residuals at 40% roofline" attribution
    was OVERLAPPED work (the round-20/26 lesson again); fusing the
    forward serializes the h residual write against the GEMMs inside
    the kernel and pays 197 small-tile programs + the in-kernel erf
    emulation.  Ships opt-in (``mlp_mode="fused"``) as the measured
    probe; the hidden mode stores the identical residual set, so this
    path has no memory niche either."""
    y, _, _, _ = _mlp_fwd_pallas(x, lns, lnb, w1, b1, w2, b2, approx,
                                 eps, interpret)
    return y


def _mbp_fwd(x, lns, lnb, w1, b1, w2, b2, approx, eps, interpret):
    y, xh, inv, h = _mlp_fwd_pallas(x, lns, lnb, w1, b1, w2, b2, approx,
                                    eps, interpret)
    return y, (xh, inv, h, lns, lnb, w1, w2, x.shape)


def _mbp_bwd(approx, eps, interpret, res, g):
    """Stored-hidden backward over the kernel's FLAT residuals.  At the
    production shapes the flat row count equals B*T (no pad), so the
    tensors reshape back to [B, T, D] views for the LN Pallas pass; on
    padded shapes the flat [nb, 128, D] view is used instead (pad rows
    carry dxn = g = 0 -> they contribute nothing, ops/ln_bwd.py
    contract)."""
    xh, inv, h, lns, lnb, w1, w2, xshape = res
    b, t, d = xshape
    rows, rp = b * t, h.shape[0]
    hid = w1.shape[1]
    cdt = h.dtype
    gf = g.reshape(rows, d)
    if rp != rows:
        gf = jnp.pad(gf, ((0, rp - rows), (0, 0)))
    gc = gf.astype(cdt)
    db2 = jnp.sum(gf.astype(jnp.float32), axis=0)
    a, gelu_vjp = jax.vjp(
        lambda hh: jax.nn.gelu(hh, approximate=approx), h)
    da = jnp.dot(gc, w2.T, preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(
        a, gc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w2.dtype)
    dh = gelu_vjp(da.astype(cdt))[0]
    xn = (xh.astype(jnp.float32) * lns.astype(jnp.float32)
          + lnb.astype(jnp.float32)).astype(cdt)
    dw1 = jax.lax.dot_general(
        xn, dh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=0)
    dxn = jnp.dot(dh, w1.T, preferred_element_type=jnp.float32)
    if DXN_COMPACT:
        dxn = dxn.astype(cdt)
    from ..ops.ln_bwd import ln_residual_bwd
    if rp == rows:
        view = lambda a_: a_.reshape(b, t, -1)               # noqa: E731
    else:
        view = lambda a_: a_.reshape(rp // 128, 128, -1)     # noqa: E731
    dxv, dlns, dlnb = ln_residual_bwd(view(xh), view(inv), view(dxn),
                                      view(gf), lns, interpret=interpret)
    dx = dxv.reshape(rp, d)[:rows].reshape(b, t, d)
    return (dx, dlns.astype(lns.dtype), dlnb.astype(lnb.dtype), dw1,
            db1.astype(jnp.float32), dw2, db2.astype(jnp.float32))


mlp_block_train_p.defvjp(_mbp_fwd, _mbp_bwd)


# --------------------------------------------------------------------------
# Functional ViTAntiSpoof forward over the module's param tree
# --------------------------------------------------------------------------


from ..ops.gelu import gelu_lean  # noqa: E402 - re-export (tests, callers)


def _xla_attn_block(x, lns, lnb, wqkv, bqkv, wproj, bproj, num_heads,
                    eps):
    """XLA fallback with identical math (autodiff handles the VJP)."""
    from ..ops.attention import fused_attention_qkv
    xn = _ln_forward(x, lns, lnb, eps)
    xn = xn.astype(x.dtype)
    qkv = (jax.lax.dot_general(
        xn, wqkv, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)).astype(x.dtype)
    from ..ops.attention import _context, _qkv_dense_reference
    if _context["interpret"] or jax.default_backend() == "tpu":
        attn = fused_attention_qkv(qkv, num_heads, _context["interpret"])
    else:
        attn = _qkv_dense_reference(qkv, num_heads)
    proj = (jax.lax.dot_general(
        attn, wproj, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bproj.astype(jnp.float32))
    return (x.astype(jnp.float32) + proj).astype(x.dtype)


def _dropout(rng, x, rate, train):
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# default MLP VJP strategy when ``xhat_mlp`` is not requested:
#   "hidden"   stored-hidden custom VJP + Pallas LN tail (ln_bwd.py) —
#              measured default: 120.0 ms/step erf vs autodiff's 125.6
#              with the attn-side kernel + compact dxn (exp_r27/r27b)
#   "autodiff" plain XLA autodiff with gelu_lean (rounds 3-20 shipped)
# Module flag read at trace time (BWD_PHASED caveat applies).
MLP_DEFAULT = "hidden"


def train_forward(params, batch, *, rng=None, train: bool = False,
                  num_heads: int = 12, patch_size: int = 16,
                  depth: int = 12, norm_eps: float = 1e-6,
                  dtype=jnp.bfloat16, gelu: str = "erf",
                  dropout: float = 0.1, use_pallas_block: bool = True,
                  xhat_mlp: bool = False, mlp_mode: str | None = None,
                  interpret: bool = False):
    """ViTAntiSpoof forward as a pure function -> f32 logits [B, 2].

    Same math as ``ViTAntiSpoof.__call__`` (models/vit.py) over the same
    param tree; attention sub-layers run through
    :func:`attn_block_train`.  Differentiable end-to-end.

    ``mlp_mode`` picks the MLP VJP: "hidden" (stored-hidden custom VJP
    with the fused Pallas LN tail), "autodiff" (plain XLA), "xhat"
    (memory-lean recompute VJP).  Default: "xhat" when ``xhat_mlp`` else
    :data:`MLP_DEFAULT`.  The "hidden" mode needs the Pallas path
    (TPU or interpret), so it falls back to autodiff when
    ``use_pallas_block`` is off.
    """
    from .fastserve import embed_patches
    vit = params["vit"]
    x = embed_patches(vit, batch, dtype=dtype, patch_size=patch_size)

    if mlp_mode is None:
        mlp_mode = "xhat" if xhat_mlp else MLP_DEFAULT
    if mlp_mode not in ("autodiff", "xhat", "hidden", "fused"):
        # fail loudly: an unknown mode would otherwise silently train
        # through the autodiff branch
        raise ValueError(f"unknown mlp_mode {mlp_mode!r} (expected "
                         "autodiff | xhat | hidden | fused)")
    if mlp_mode in ("hidden", "fused") and not use_pallas_block:
        mlp_mode = "autodiff"
    approx = gelu == "tanh"
    for i in range(depth):
        blk = vit[f"block{i}"]
        args = (blk["norm1"]["scale"], blk["norm1"]["bias"],
                blk["attn"]["qkv"]["kernel"].astype(dtype),
                blk["attn"]["qkv"]["bias"],
                blk["attn"]["proj"]["kernel"].astype(dtype),
                blk["attn"]["proj"]["bias"])
        if use_pallas_block:
            x = attn_block_train(x, *args, num_heads, norm_eps, interpret)
        else:
            x = _xla_attn_block(x, *args, num_heads, norm_eps)
        mlp = blk["mlp"]
        if mlp_mode == "xhat":
            x = mlp_block_train(
                x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                mlp["fc1"]["kernel"].astype(dtype), mlp["fc1"]["bias"],
                mlp["fc2"]["kernel"].astype(dtype), mlp["fc2"]["bias"],
                approx, norm_eps)
        elif mlp_mode == "hidden":
            x = mlp_block_train_h(
                x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                mlp["fc1"]["kernel"].astype(dtype), mlp["fc1"]["bias"],
                mlp["fc2"]["kernel"].astype(dtype), mlp["fc2"]["bias"],
                approx, norm_eps, interpret)
        elif mlp_mode == "fused":
            x = mlp_block_train_p(
                x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                mlp["fc1"]["kernel"].astype(dtype), mlp["fc1"]["bias"],
                mlp["fc2"]["kernel"].astype(dtype), mlp["fc2"]["bias"],
                approx, norm_eps, interpret)
        else:
            yn = _ln_forward(x, blk["norm2"]["scale"],
                             blk["norm2"]["bias"], norm_eps)
            yn = yn.astype(dtype)
            hdn = (jnp.dot(yn, mlp["fc1"]["kernel"].astype(dtype),
                           preferred_element_type=jnp.float32)
                   + mlp["fc1"]["bias"].astype(jnp.float32)).astype(dtype)
            hdn = gelu_lean(hdn, approx)
            out = (jnp.dot(hdn, mlp["fc2"]["kernel"].astype(dtype),
                           preferred_element_type=jnp.float32)
                   + mlp["fc2"]["bias"].astype(jnp.float32))
            x = (x.astype(jnp.float32) + out).astype(dtype)

    feats = _ln_forward(x, vit["norm"]["scale"], vit["norm"]["bias"],
                        norm_eps)
    feats = feats[:, 0]                                      # CLS, f32

    head = params["head"]
    if train and rng is None and dropout > 0.0:
        # the module path fails loudly here too (flax: "Need PRNG for
        # dropout") — silently training with dropout off must not happen
        raise ValueError(
            "train=True with dropout>0 requires a dropout rng "
            "(pass rngs={'dropout': key} through apply)")
    if train and rng is not None:
        rng1, rng2 = jax.random.split(rng)
    else:
        rng1 = rng2 = None
    f = _ln_forward(feats, head["norm"]["scale"],
                    head["norm"]["bias"], 1e-5)
    f = _dropout(rng1, f.astype(dtype), dropout, train and rng is not None)
    f = (jnp.dot(f, head["fc1"]["kernel"].astype(dtype),
                 preferred_element_type=jnp.float32)
         + head["fc1"]["bias"].astype(jnp.float32))
    f = jax.nn.gelu(f, approximate=False)                    # head keeps erf
    f = _dropout(rng2, f.astype(dtype), dropout, train and rng is not None)
    logits = (jnp.dot(f, head["fc2"]["kernel"].astype(jnp.float32),
                      preferred_element_type=jnp.float32)
              + head["fc2"]["bias"])
    return logits


def fast_apply_available(module, mesh=None) -> bool:
    """Fused-block training applies to a single-device TPU (or interpret
    tests); multi-device meshes keep the module path (its attention
    dispatch shard_maps the Pallas kernel; GSPMD can't split a
    pallas_call)."""
    from .vit import ViTAntiSpoof
    from ..ops.attention import _context
    if not isinstance(module, ViTAntiSpoof):
        return False
    if module.dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if mesh is not None and mesh.devices.size > 1:
        return False
    if _context["interpret"]:
        return True
    return (jax.default_backend() == "tpu"
            and jax.device_count() == 1)


def make_apply(module, *, xhat_mlp: bool = False,
               mlp_mode: str | None = None):
    """``module.apply``-compatible wrapper over :func:`train_forward`
    for a ``ViTAntiSpoof`` instance (drop-in for TrainState.apply_fn).
    ``xhat_mlp=True`` opts into the memory-lean MLP VJP (see
    :func:`mlp_block_train` — slower on v5e, smaller residual
    footprint); ``mlp_mode`` overrides the VJP strategy explicitly
    (see :func:`train_forward`)."""
    from ..ops.attention import _context

    def apply_fn(variables, batch, *, train: bool = False, rngs=None,
                 mutable=None):
        assert mutable is None or mutable == [], (
            "fast apply has no mutable collections")
        rng = (rngs or {}).get("dropout")
        out = train_forward(
            variables["params"], batch, rng=rng, train=train,
            num_heads=module.num_heads, patch_size=module.patch_size,
            depth=module.depth, norm_eps=module.norm_eps,
            dtype=module.dtype, gelu=module.gelu,
            dropout=module.dropout, xhat_mlp=xhat_mlp,
            mlp_mode=mlp_mode, interpret=_context["interpret"])
        _context["pallas_calls"] += 1
        return out

    return apply_fn
