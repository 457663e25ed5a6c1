"""Pallas fused attention for the ViT.

The dense einsum attention materializes the [B, H, T, T] logit tensor in
HBM (for ViT-B at batch 128 that is ~238 MB of fp32 written and re-read
around the softmax) — pure HBM-bandwidth waste at T=197.  This kernel
keeps the whole  QK^T -> mask -> softmax -> @V  row block in VMEM: one
grid step per (batch*head), everything fused, nothing but Q/K/V/O
touching HBM.

T=197 pads only to the 8-sublane granularity (200; a 128-lane round to
256 costs ~22% extra attention FLOPs/VPU work for nothing — measured,
BENCH_NOTES.md round 3) and the [200, 200] fp32 logits fit VMEM
trivially, so no online-softmax streaming is needed — this IS the
flash-attention memory win without its bookkeeping; the kernel is
written blockwise over (batch, head) so longer sequences would extend
it with a KV loop (SURVEY.md §2.7: blockwise by design, no ring/CP
machinery).

Training: a custom VJP recomputes the dense backward in XLA (same
residual memory as the einsum path the reference effectively uses;
forward-pass HBM traffic is where the win is at this scale).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _check_head_geometry(width: int, num_heads: int, *, fused: int = 1):
    """Validate a (possibly fused) stream width against the head count.

    The kernels write per-head output slices; an indivisible geometry
    would leave the tail columns of the output block UNWRITTEN
    (uninitialized VMEM — nondeterministic garbage, no error), so fail
    loudly here instead.  Returns the embed dim."""
    if width % fused:
        raise ValueError(
            f"fused stream width {width} is not divisible by {fused}")
    d = width // fused
    if d % num_heads:
        raise ValueError(
            f"embed dim {d} is not divisible by num_heads={num_heads} — "
            "per-head kernel slices would leave output columns "
            "unwritten")
    return d


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 valid_len: int, num_heads: int):
    """One grid step per batch item, static loop over heads: a small grid
    (per-program launch overhead dominates this tiny-T workload) while the
    grid-level pipeline overlaps each item's DMA with the previous item's
    compute.  Measured on v5e vs alternatives: 1 slice/program (grid
    B*H) and a fori_loop over slices were both slower; full unrolling of
    larger blocks blew up compile time."""
    tp = q_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < valid_len
    for h in range(num_heads):
        q = q_ref[0, h]                           # [Tp, D]
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [Tp, Tp]
        logits = jnp.where(mask, logits, -1e30)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.dot(weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[0, h] = out.astype(o_ref.dtype)


def _forward(q, k, v, *, interpret: bool = False):
    """q, k, v: [B, T, H, D] -> [B, T, H, D]."""
    b, t, h, d = q.shape
    tp = _round_up(t, 8)
    scale = float(d) ** -0.5

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))               # [B, H, T, D]
        return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))

    qf, kf, vf = prep(q), prep(k), prep(v)
    kernel = functools.partial(_attn_kernel, scale=scale, valid_len=t,
                               num_heads=h)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, tp, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, h, tp, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tp * tp * d,
            bytes_accessed=4 * b * h * tp * d * q.dtype.itemsize,
            transcendentals=b * h * tp * tp),
        interpret=interpret,
    )(qf, kf, vf)
    out = out[:, :, :t, :]
    return jnp.transpose(out, (0, 2, 1, 3))


# --------------------------------------------------------------------------
# Zero-transpose variant: consumes the fused QKV projection directly
# --------------------------------------------------------------------------


def _attn_qkv_kernel(qkv_ref, o_ref, *, scale: float, valid_len: int,
                     num_heads: int, head_dim: int, block_b: int):
    """Input block [block_b, Tp, 3D] straight from the QKV matmul; head
    slices are taken INSIDE VMEM (static column slices), so the wrapper
    does no transposes at all — the [B,H,T,D] relayouts of the generic
    path cost ~1 ms/layer of pure HBM traffic at ViT-B scale.  Output
    lands in [block_b, Tp, D], exactly the layout the proj matmul wants.

    block_b batch items per grid program amortize per-program launch
    overhead; measured on v5e at B=128: block_b 1 -> 1.57 ms, 2 -> 1.42
    ms, 4 -> 1.64 ms per layer, so 2 ships (BENCH_NOTES.md round 2)."""
    tp = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < valid_len
    d = num_heads * head_dim
    for bi in range(block_b):
        for h in range(num_heads):
            q = qkv_ref[bi, :, h * head_dim:(h + 1) * head_dim]
            k = qkv_ref[bi, :, d + h * head_dim:d + (h + 1) * head_dim]
            v = qkv_ref[bi, :,
                        2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(mask, logits, -1e30)
            weights = jax.nn.softmax(logits, axis=-1)
            out = jnp.dot(weights.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            o_ref[bi, :, h * head_dim:(h + 1) * head_dim] = (
                out.astype(o_ref.dtype))


def _block_b_for(b: int) -> int:
    return 2 if b % 2 == 0 else 1


def _forward_qkv(qkv, num_heads: int, *, interpret: bool = False):
    """qkv: [B, T, 3D] fused projection -> attention output [B, T, D]."""
    b, t, d3 = qkv.shape
    d = _check_head_geometry(d3, num_heads, fused=3)
    head_dim = d // num_heads
    tp = _round_up(t, 8)
    scale = float(head_dim) ** -0.5
    block_b = _block_b_for(b)
    qkv = jnp.pad(qkv, ((0, 0), (0, tp - t), (0, 0)))
    kernel = functools.partial(_attn_qkv_kernel, scale=scale, valid_len=t,
                               num_heads=num_heads, head_dim=head_dim,
                               block_b=block_b)
    out = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[pl.BlockSpec((block_b, tp, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_b, tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * tp * tp * head_dim,
            bytes_accessed=4 * b * tp * d * qkv.dtype.itemsize,
            transcendentals=b * num_heads * tp * tp),
        interpret=interpret,
    )(qkv)
    return out[:, :t, :]


def _qkv_dense_reference(qkv, num_heads: int):
    b, t, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    parts = qkv.reshape(b, t, 3, num_heads, dh)
    out = _dense_reference(parts[:, :, 0], parts[:, :, 1], parts[:, :, 2])
    return out.reshape(b, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention_qkv(qkv, num_heads: int, interpret: bool = False):
    """Zero-transpose fused attention on the [B, T, 3D] QKV projection."""
    return _forward_qkv(qkv, num_heads, interpret=interpret)


def _attn_qkv_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, scale: float,
                         valid_len: int, num_heads: int, head_dim: int,
                         block_b: int):
    """Backward in VMEM: recompute weights per head, then
    dv = w^T g, dw = g v^T, dl = w*(dw - rowsum(dw*w)), dq = dl k * s,
    dk = dl^T q * s.  Padded-query rows carry zero cotangent (g is
    zero-padded) so they contribute nothing; masked key columns have
    w == 0 hence dl == 0 — no extra masking needed beyond the forward's.

    Every dot runs in the INPUT dtype with f32 accumulation, mirroring
    the forward (which rounds w to v.dtype before w @ v), so the bf16
    training path backpropagates through the forward's ACTUAL rounded
    weights; f32 inputs (the parity tests' oracle dtype) keep exact f32
    dots.  Measured SPEED-NEUTRAL on the full train step (124.0 ms erf
    vs the 123.1-125.9 baseline band, exp_r22) — the kernel's 34 TF/s
    is small-dot structure (head_dim 64 = half-lane operands), not
    f32-multi-pass MXU cost, so the dtype rule ships for numerics
    consistency, not speed (BENCH_NOTES round 22).
    """
    tp = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < valid_len
    d = num_heads * head_dim
    cdt = qkv_ref.dtype
    for bi in range(block_b):
        for h in range(num_heads):
            sl_q = slice(h * head_dim, (h + 1) * head_dim)
            sl_k = slice(d + h * head_dim, d + (h + 1) * head_dim)
            sl_v = slice(2 * d + h * head_dim, 2 * d + (h + 1) * head_dim)
            q = qkv_ref[bi, :, sl_q]
            k = qkv_ref[bi, :, sl_k]
            v = qkv_ref[bi, :, sl_v]
            g = g_ref[bi, :, sl_q].astype(cdt)

            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(mask, logits, -1e30)
            w = jax.nn.softmax(logits, axis=-1)              # [Tp, Tp] f32
            wc = w.astype(cdt)

            dv = jax.lax.dot_general(                        # w^T @ g
                wc, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw = jax.lax.dot_general(                        # g @ v^T
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
            dlc = dl.astype(cdt)
            dq = jnp.dot(dlc, k,
                         preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(                        # dl^T @ q
                dlc, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

            dqkv_ref[bi, :, sl_q] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[bi, :, sl_k] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[bi, :, sl_v] = dv.astype(dqkv_ref.dtype)


def _attn_qkv_bwd_kernel_phased(qkv_ref, g_ref, dqkv_ref, w_ref, *,
                                scale: float, valid_len: int,
                                num_heads: int, head_dim: int,
                                block_b: int):
    """Phase-split variant of :func:`_attn_qkv_bwd_kernel` (VERDICT r3
    item 4 probe): the baseline interleaves each head's full serial
    chain (logits -> softmax -> dv/dw -> dl -> dq/dk), so the MXU waits
    on the VPU (softmax, dl elementwise) 24 times per program.  Here
    every (batch, head) pair's softmax weights are materialized into a
    VMEM scratch first (phase A), then all 24 independent dots of each
    TYPE issue back-to-back (phases B-D), giving Mosaic same-shape MXU
    work to pipeline and batching the VPU passes; the scratch slot is
    reused in place for dl after w's last read.  Extra VMEM:
    block_b*H*[Tp,Tp] f32 = 3.84 MB at ViT-B shapes (block_b=2).
    Numerics identical to the baseline (same dots, same dtypes, same
    order of operations per element)."""
    tp = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < valid_len
    d = num_heads * head_dim
    cdt = qkv_ref.dtype

    def sl(h, part):
        return slice(part * d + h * head_dim,
                     part * d + (h + 1) * head_dim)

    # A: all softmax weights into scratch
    for bi in range(block_b):
        for h in range(num_heads):
            q = qkv_ref[bi, :, sl(h, 0)]
            k = qkv_ref[bi, :, sl(h, 1)]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(mask, logits, -1e30)
            w_ref[bi * num_heads + h] = jax.nn.softmax(logits, axis=-1)

    # B: all dv = w^T g dots
    for bi in range(block_b):
        for h in range(num_heads):
            wc = w_ref[bi * num_heads + h].astype(cdt)
            g = g_ref[bi, :, sl(h, 0)].astype(cdt)
            dv = jax.lax.dot_general(
                wc, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_ref[bi, :, sl(h, 2)] = dv.astype(dqkv_ref.dtype)

    # C: all dw = g v^T dots + softmax-VJP elementwise; dl overwrites
    # the w slot (w's last read is here)
    for bi in range(block_b):
        for h in range(num_heads):
            g = g_ref[bi, :, sl(h, 0)].astype(cdt)
            v = qkv_ref[bi, :, sl(h, 2)]
            dw = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            w = w_ref[bi * num_heads + h]
            w_ref[bi * num_heads + h] = w * (
                dw - jnp.sum(dw * w, axis=-1, keepdims=True))

    # D: all dq = dl k, dk = dl^T q dots
    for bi in range(block_b):
        for h in range(num_heads):
            dlc = w_ref[bi * num_heads + h].astype(cdt)
            q = qkv_ref[bi, :, sl(h, 0)]
            k = qkv_ref[bi, :, sl(h, 1)]
            dq = jnp.dot(dlc, k,
                         preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                dlc, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dqkv_ref[bi, :, sl(h, 0)] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[bi, :, sl(h, 1)] = dk.astype(dqkv_ref.dtype)


# probe switch for the phased backward (exp_r25): module-level so the
# experiment can A/B without threading a flag through the custom VJP.
# CAVEAT: read at TRACE time — set it BEFORE the first step compiles in
# the process; flipping it afterwards keeps serving the previously
# traced kernel out of the jit cache (same for gather_pallas.DISABLE),
# so a mid-process toggle measures the wrong variant.  Experiments must
# A/B across fresh jit scopes (new step fns), as exp_r25 does.
BWD_PHASED = False


def _backward_qkv(qkv, g, num_heads: int, *, interpret: bool = False,
                  valid_len: int | None = None):
    """dqkv for the fused attention.  ``valid_len`` marks ``qkv``/``g``
    as ALREADY padded to a tile multiple with ``valid_len`` real tokens
    (the fasttrain forward kernel emits padded qkv, so the pad copy here
    would be pure waste); the returned dqkv is then padded to match."""
    b, t, d3 = qkv.shape
    d = _check_head_geometry(d3, num_heads, fused=3)
    head_dim = d // num_heads
    prepadded = valid_len is not None
    if prepadded:
        tp, t = t, valid_len
        qkv_p, g_p = qkv, g
    else:
        tp = _round_up(t, 8)
        qkv_p = jnp.pad(qkv, ((0, 0), (0, tp - t), (0, 0)))
        g_p = jnp.pad(g, ((0, 0), (0, tp - t), (0, 0)))
    scale = float(head_dim) ** -0.5
    block_b = _block_b_for(b)
    if BWD_PHASED:
        kernel = functools.partial(
            _attn_qkv_bwd_kernel_phased, scale=scale, valid_len=t,
            num_heads=num_heads, head_dim=head_dim, block_b=block_b)
        scratch = [pltpu.VMEM((block_b * num_heads, tp, tp),
                              jnp.float32)]
    else:
        kernel = functools.partial(
            _attn_qkv_bwd_kernel, scale=scale, valid_len=t,
            num_heads=num_heads, head_dim=head_dim, block_b=block_b)
        scratch = []
    out = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[pl.BlockSpec((block_b, tp, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_b, tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_b, tp, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d3), qkv.dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=12 * b * num_heads * tp * tp * head_dim,
            bytes_accessed=8 * b * tp * d * qkv.dtype.itemsize,
            transcendentals=b * num_heads * tp * tp),
        interpret=interpret,
    )(qkv_p, g_p)
    return out if prepadded else out[:, :t, :]


def _qkv_fwd(qkv, num_heads, interpret):
    return _forward_qkv(qkv, num_heads, interpret=interpret), (qkv,)


def _qkv_bwd(num_heads, interpret, res, g):
    (qkv,) = res
    return (_backward_qkv(qkv, g, num_heads, interpret=interpret),)


fused_attention_qkv.defvjp(_qkv_fwd, _qkv_bwd)


# --------------------------------------------------------------------------
# Whole-attention-block kernel (serving): LN1 + QKV GEMM + attention +
# proj + residual in ONE program, weights VMEM-resident
# --------------------------------------------------------------------------


def _attn_block_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                       wproj_ref, bproj_ref, o_ref, *, scale: float,
                       valid_len: int, num_heads: int, head_dim: int,
                       block_b: int, eps: float):
    """o = x + proj(attention(LN(x) @ Wqkv + bqkv)) for a [block_b, Tp, D]
    residual-stream block.

    Fusing the whole pre-LN attention sub-layer keeps the [Tp, 3D] QKV
    activations and the attention output entirely in VMEM — per ViT-B
    layer that deletes ~250 MB of HBM traffic (write+read of qkv at
    B=128) plus the standalone LN pass.  Weights ride constant-index
    BlockSpecs, so the pipeline fetches them once, not per program.
    Serving-only: no VJP (training uses the fused_attention_qkv pair)."""
    tp = x_ref.shape[1]
    d = num_heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < valid_len
    for bi in range(block_b):
        x = x_ref[bi].astype(jnp.float32)                    # [Tp, D]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + eps)
        xn = (xn * lns_ref[0].astype(jnp.float32)
              + lnb_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
        qkv = jax.lax.dot_general(
            xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
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
        # static concat (Mosaic has no dynamic_update_slice lowering)
        attn_out = jnp.concatenate(heads_out, axis=1)
        proj = jax.lax.dot_general(
            attn_out.astype(x_ref.dtype), wproj_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[bi] = (x + proj + bproj_ref[0].astype(jnp.float32)
                     ).astype(o_ref.dtype)


def fused_attention_block_padded(xp, ln_scale, ln_bias, w_qkv, b_qkv,
                                 w_proj, b_proj, num_heads: int, *,
                                 valid_len: int, eps: float = 1e-6,
                                 interpret: bool = False):
    """Padded-stream form: xp [B, Tp, D] with ``valid_len`` real tokens
    (Tp any 8-sublane multiple) -> [B, Tp, D].

    The compute tile follows the STREAM's padding, not a 128-lane round:
    197 tokens run as [200, 200] attention instead of [256, 256] — 22%
    fewer attention FLOPs/VPU ops — and callers chain layers without
    per-layer pad/slice copies (27.7 vs 32.4 ms/batch serving,
    BENCH_NOTES.md round 3).  Pad rows compute garbage-free finite
    values (key/value columns are masked at ``valid_len``); slice them
    off after the last layer."""
    b, tp, d = xp.shape
    head_dim = d // num_heads
    scale = float(head_dim) ** -0.5
    block_b = _block_b_for(b)
    row = lambda a: jnp.asarray(a).reshape(1, -1)            # noqa: E731
    kernel = functools.partial(
        _attn_block_kernel, scale=scale, valid_len=valid_len,
        num_heads=num_heads, head_dim=head_dim, block_b=block_b, eps=eps)
    const = lambda i: (0, 0)                                 # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, tp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tp * d * (3 * d + d)
            + 4 * b * num_heads * tp * tp * head_dim,
            bytes_accessed=2 * b * tp * d * xp.dtype.itemsize,
            transcendentals=b * num_heads * tp * tp),
        interpret=interpret,
    )(xp, row(ln_scale), row(ln_bias), w_qkv, row(b_qkv), w_proj,
      row(b_proj))


def fused_attention_block(x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj,
                          b_proj, num_heads: int, *, eps: float = 1e-6,
                          interpret: bool = False):
    """x: [B, T, D] residual stream -> x + proj(attn(LN(x))) (serving).

    Convenience form of :func:`fused_attention_block_padded` (pads to
    the 8-sublane granularity, slices back)."""
    b, t, d = x.shape
    tp = _round_up(t, 8)
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    out = fused_attention_block_padded(
        xp, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, num_heads,
        valid_len=t, eps=eps, interpret=interpret)
    return out[:, :t, :]


# --------------------------------------------------------------------------
# Whole-MLP-block kernel (serving): LN2 + fc1 + GELU + fc2 + residual
# --------------------------------------------------------------------------


def _mlp_block_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref, *, eps: float, n_chunks: int):
    """o = x + fc2(gelu_tanh(fc1(LN(x)))) for one FLAT [M, D] row tile.

    The [M, hidden] activation never reaches HBM (at ViT-B/B=128 the
    fc1->fc2 round-trip is ~300 MB/layer).  The hidden dim is processed
    in ``n_chunks`` column-chunks of fc1 (row-chunks of fc2) so VMEM
    holds the resident weights (9.4 MB) plus only a chunk of activations.

    LayerNorm is row-local, so the MLP half-layer has no reason to
    respect batch-item boundaries: tiling the FLATTENED [B*T, D] row
    space instead of per-item [Tp, D] blocks avoids the 197->256
    sequence padding (+30% wasted GEMM rows) and cuts the grid from B
    programs to ~B*T/m_tile (exp_r2_mlp_flat.py: 1.30 vs the per-item
    kernel's ~2 ms/layer and XLA's 1.36).  Zero pad rows are harmless:
    LN of a zero row is finite (rsqrt(eps)) and the result is sliced off.
    Serving-only; tanh GELU (the serving numerics)."""
    hidden = w1_ref.shape[1]
    chunk = hidden // n_chunks
    x = x_ref[...].astype(jnp.float32)                        # [M, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * lns_ref[0].astype(jnp.float32)
          + lnb_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    acc = x + b2_ref[0].astype(jnp.float32)
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        h = jax.lax.dot_general(
            xn, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h + b1_ref[0, sl].astype(jnp.float32),
                        approximate=True).astype(x_ref.dtype)
        acc = acc + jax.lax.dot_general(
            h, w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def fused_mlp_block(x, ln_scale, ln_bias, w_fc1, b_fc1, w_fc2, b_fc2, *,
                    eps: float = 1e-6, n_chunks: int = 2,
                    m_tile: int = 256, interpret: bool = False):
    """x: [B, T, D] residual stream -> x + MLP(LN(x)) (serving)."""
    b, t, d = x.shape
    rows = b * t
    rp = (rows + m_tile - 1) // m_tile * m_tile
    xf = jnp.pad(x.reshape(rows, d), ((0, rp - rows), (0, 0)))
    row = lambda a: jnp.asarray(a).reshape(1, -1)            # noqa: E731
    const = lambda i: (0, 0)                                 # noqa: E731
    hidden = w_fc1.shape[1]
    if hidden % n_chunks:
        # the chunk loop covers n_chunks * (hidden // n_chunks) columns;
        # a remainder would be silently DROPPED from every output row
        raise ValueError(f"n_chunks={n_chunks} does not divide the MLP "
                         f"hidden dim {hidden}")
    kernel = functools.partial(_mlp_block_kernel, eps=eps,
                               n_chunks=n_chunks)
    out = pl.pallas_call(
        kernel,
        grid=(rp // m_tile,),
        in_specs=[
            pl.BlockSpec((m_tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rp * d * hidden,
            bytes_accessed=2 * rp * d * x.dtype.itemsize,
            transcendentals=rp * hidden),
        interpret=interpret,
    )(xf, row(ln_scale), row(ln_bias), w_fc1, row(b_fc1), w_fc2,
      row(b_fc2))
    return out[:rows].reshape(b, t, d)


# --------------------------------------------------------------------------
# Dispatch: how models pick an attention implementation
# --------------------------------------------------------------------------

_context = {"mesh": None, "interpret": False, "pallas_calls": 0,
            "manual": False}


@contextlib.contextmanager
def manual_attention(interpret=None):
    """Dispatch for code already INSIDE a shard_map region.

    A nested `jax.shard_map` cannot open against a different mesh, so a
    caller that applies model blocks within its own shard_map (the PP
    schedule, parallel/pipeline.py) enters this context while tracing:
    `dispatch_attention_qkv` then uses the per-device Pallas kernel
    directly on TPU (or in interpret mode) and the dense einsum
    elsewhere — never a nested shard_map, regardless of any outer
    `attention_sharding` mesh."""
    prev = dict(_context)
    _context["manual"] = True
    if interpret is not None:
        _context["interpret"] = interpret
    try:
        yield
    finally:
        _context.update(manual=prev["manual"], interpret=prev["interpret"])


@contextlib.contextmanager
def attention_sharding(mesh=None, interpret: bool = False):
    """Context enabling the Pallas kernel under a multi-device mesh.

    GSPMD cannot partition a pallas_call, so under pjit with >1 device
    the kernel must be wrapped in `jax.shard_map` over the data axis —
    which needs the mesh object.  The Trainer enters this context around
    training so model code (which has no mesh handle) can dispatch
    correctly at trace time.  `interpret=True` lets CPU tests exercise
    the sharded kernel path.
    """
    prev = dict(_context)
    _context.update(mesh=mesh, interpret=interpret)
    try:
        yield
    finally:
        _context.update(mesh=prev["mesh"], interpret=prev["interpret"])


def dispatch_attention_qkv(qkv, num_heads: int, dense_fallback):
    """Pick the best attention path for the fused [B, T, 3D] projection:

    0. `manual_attention` context (caller already inside a shard_map,
       e.g. the PP schedule) -> per-device Pallas kernel; if the region
       left a ``model`` mesh axis in AUTO mode (DPxTPxPP), heads shard
       over it with a NESTED shard_map (`_tp_head_sharded_nested`),
    1. multi-device mesh in context: seq axis sharded -> sequence-
       parallel CP kernel; model axis sharded -> head-sharded kernel;
       otherwise shard_map around the Pallas kernel over the data axis,
    2. single-device TPU (or interpret context) -> plain Pallas kernel,
    3. otherwise -> `dense_fallback(qkv)`.
    """
    mesh = _context["mesh"]
    interpret = _context["interpret"]
    on_tpu = jax.default_backend() == "tpu"

    if not isinstance(qkv.shape[0], int):
        # symbolic batch dim (jax.export shape polymorphism — the
        # module-mode serving artifact): pallas_call grids/cost
        # estimates need concrete shapes, and module mode is documented
        # as the portable no-Pallas parity path (docs/DEPLOYMENT.md) —
        # on every backend, not just CPU hosts
        return dense_fallback(qkv)

    if _context["manual"]:
        # already inside a shard_map region (manual_attention).  If the
        # surrounding region left a ``model`` mesh axis in AUTO (GSPMD)
        # mode — the DPxTPxPP pipeline, parallel/pipeline.py — heads
        # shard over it with a nested shard_map (nesting over an auto
        # axis is allowed); otherwise the kernel runs per-device as-is.
        n_model = _auto_model_axis_size()
        if n_model > 1:
            if (on_tpu or interpret) and num_heads % n_model == 0:
                return _tp_head_sharded_nested(qkv, num_heads, n_model,
                                               interpret)
            return dense_fallback(qkv)   # GSPMD partitions the einsum
        if on_tpu or interpret:
            _context["pallas_calls"] += 1
            return fused_attention_qkv(qkv, num_heads, interpret)
        return dense_fallback(qkv)

    if mesh is not None and (on_tpu or interpret):
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        n_seq = axis_sizes.get(SEQ_AXIS, 1)
        if n_seq != 1:
            return _sp_sharded(qkv, num_heads, mesh, n_seq, interpret)
        n_model = axis_sizes.get(MODEL_AXIS, 1)
        if n_model != 1:
            if num_heads % n_model:
                return dense_fallback(qkv)   # heads don't split: dense
            return _tp_head_sharded(qkv, num_heads, mesh, n_model,
                                    interpret)
        _context["pallas_calls"] += 1
        from jax.sharding import PartitionSpec as P
        f = jax.shard_map(
            lambda x: fused_attention_qkv(x, num_heads, interpret),
            mesh=mesh, in_specs=P(DATA_AXIS, None, None),
            out_specs=P(DATA_AXIS, None, None), check_vma=False)
        return f(qkv)

    if interpret or (on_tpu and jax.device_count() == 1):
        _context["pallas_calls"] += 1
        return fused_attention_qkv(qkv, num_heads, interpret)
    return dense_fallback(qkv)


def _auto_model_axis_size() -> int:
    """Size of the ``model`` mesh axis if the CURRENT trace context is a
    partially-manual shard_map that left it in AUTO (GSPMD) mode — the
    DPxTPxPP pipeline's body — else 1."""
    from ..parallel.mesh import MODEL_AXIS

    am = jax.sharding.get_abstract_mesh()
    if am is None or MODEL_AXIS not in am.axis_names:
        return 1
    # no getattr default: if a jax upgrade renames auto_axes this must
    # fail HERE, not silently report 1 and leave the model axis in AUTO
    # mode where GSPMD cannot partition the pallas_call
    if MODEL_AXIS not in am.auto_axes:
        return 1
    return dict(zip(am.axis_names, am.axis_sizes))[MODEL_AXIS]


def _head_major_relayout(qkv, num_heads: int):
    """Relabel the fused [B, T, 3D] = [q | k | v] stream head-major:
    [B, T, H, 3*dh], head h owning its contiguous [q_h | k_h | v_h]
    block — the ONE layout both TP attention paths shard over the model
    axis (keep this the single definition; the fused-stream order is
    layout-critical).  Returns (head_major, dh)."""
    b, t, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    hm = qkv.reshape(b, t, 3, num_heads, dh).transpose(0, 1, 3, 2, 4)
    return hm.reshape(b, t, num_heads, 3 * dh), dh


def _local_heads_attention(x, h_loc: int, dh: int, interpret: bool):
    """Inverse of :func:`_head_major_relayout` on a local head shard:
    rebuild the fused [b, T, 3*h_loc*dh] layout and run the unchanged
    Pallas kernel on the local heads."""
    bl, t = x.shape[0], x.shape[1]
    fused = x.reshape(bl, t, h_loc, 3, dh).transpose(0, 1, 3, 2, 4)
    fused = fused.reshape(bl, t, 3 * h_loc * dh)
    return fused_attention_qkv(fused, h_loc, interpret)


def _tp_head_sharded_nested(qkv, num_heads: int, n_model: int,
                            interpret: bool):
    """:func:`_tp_head_sharded` for a partially-manual region: the caller
    is already inside a shard_map whose ``data``/``pipe`` axes are manual
    while ``model`` stays auto (parallel/pipeline.py DPxTPxPP).  The
    nested shard_map manualizes ONLY the model axis (inherited from the
    context mesh), so each device runs the unchanged Pallas kernel on
    its local heads of its local microbatch."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import MODEL_AXIS

    h_loc = num_heads // n_model
    _context["pallas_calls"] += 1
    hm, dh = _head_major_relayout(qkv, num_heads)

    f = jax.shard_map(
        lambda x: _local_heads_attention(x, h_loc, dh, interpret),
        in_specs=P(None, None, MODEL_AXIS, None),
        out_specs=P(None, None, MODEL_AXIS),
        axis_names=frozenset({MODEL_AXIS}), check_vma=False)
    return f(hm)


def _tp_head_sharded(qkv, num_heads: int, mesh, n_model: int,
                     interpret: bool):
    """Pallas attention under tensor parallelism: shard HEADS over the
    model axis (VERDICT r2 item 3; SURVEY §2.7 TP row).

    The fused [B, T, 3D] stream concatenates [q | k | v], so a model-axis
    shard of its last dim cuts across q/k/v and no PartitionSpec can hand
    each device complete heads — the reason earlier rounds dropped to the
    dense einsum under TP.  Fix: relabel the stream head-major
    ([B, T, H, 3*dh], head h owning its contiguous [q_h | k_h | v_h]
    block), shard dim 2 over the model axis (GSPMD inserts the
    ICI shuffle from the GEMM's contiguous-column sharding — ~1/3 of the
    activation moves), and rebuild the local fused layout inside
    shard_map so each device runs the unchanged Pallas kernel on its
    H/n_model heads.  Head-major output concatenates back to exactly the
    [B, T, D] column order the proj matmul expects, whose Megatron
    row-sharding boundary is head-aligned already (parallel/mesh.py
    _TP_RULES).  Differentiable: the kernel's custom VJP runs per-shard.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    h_loc = num_heads // n_model
    _context["pallas_calls"] += 1
    hm, dh = _head_major_relayout(qkv, num_heads)

    f = jax.shard_map(
        lambda x: _local_heads_attention(x, h_loc, dh, interpret),
        mesh=mesh,
        in_specs=P(DATA_AXIS, None, MODEL_AXIS, None),
        out_specs=P(DATA_AXIS, None, MODEL_AXIS), check_vma=False)
    return f(hm)


# --------------------------------------------------------------------------
# Sequence parallelism (context parallelism): rectangular kernel for a
# local query block attending to the full (all-gathered) key/value set
# --------------------------------------------------------------------------


def _attn_cp_kernel(q_ref, kv_ref, o_ref, *, scale: float, valid_len: int,
                    num_heads: int, head_dim: int, block_b: int):
    """Local Q rows [block_b, Tq, D] x full KV [block_b, Tk, 2D] -> O.

    The sequence-parallel shape: each device owns a contiguous block of
    query tokens and the complete gathered key/value set, so the logits
    tile is rectangular [Tq, Tk].  Head slices are static columns of the
    packed layouts (q head-interleaved; kv = [k | v] concatenated), same
    as :func:`_attn_qkv_kernel`."""
    tq, tk = q_ref.shape[1], kv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    mask = col < valid_len
    d = num_heads * head_dim
    for bi in range(block_b):
        for h in range(num_heads):
            q = q_ref[bi, :, h * head_dim:(h + 1) * head_dim]
            k = kv_ref[bi, :, h * head_dim:(h + 1) * head_dim]
            v = kv_ref[bi, :, d + h * head_dim:d + (h + 1) * head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # [Tq, Tk]
            logits = jnp.where(mask, logits, -1e30)
            weights = jax.nn.softmax(logits, axis=-1)
            out = jnp.dot(weights.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            o_ref[bi, :, h * head_dim:(h + 1) * head_dim] = (
                out.astype(o_ref.dtype))


def _attn_cp_bwd_kernel(q_ref, kv_ref, g_ref, dq_ref, dkv_ref, *,
                        scale: float, valid_len: int, num_heads: int,
                        head_dim: int, block_b: int):
    """Rectangular backward: per head recompute w [Tq, Tk], then
    dv = w^T g, dw = g v^T, dl = w*(dw - rowsum(dw*w)), dq = dl k * s,
    dk = dl^T q * s.  Padded query rows carry zero cotangent; masked key
    columns have w == 0 hence dl == 0 (the square-kernel argument,
    :func:`_attn_qkv_bwd_kernel`, carries over unchanged — as does its
    input-dtype dot rule: bf16 streams keep the MXU's native rate)."""
    tq, tk = q_ref.shape[1], kv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    mask = col < valid_len
    d = num_heads * head_dim
    cdt = q_ref.dtype
    for bi in range(block_b):
        for h in range(num_heads):
            sl_h = slice(h * head_dim, (h + 1) * head_dim)
            sl_v = slice(d + h * head_dim, d + (h + 1) * head_dim)
            q = q_ref[bi, :, sl_h]
            k = kv_ref[bi, :, sl_h]
            v = kv_ref[bi, :, sl_v]
            g = g_ref[bi, :, sl_h].astype(cdt)

            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(mask, logits, -1e30)
            w = jax.nn.softmax(logits, axis=-1)               # [Tq, Tk]
            wc = w.astype(cdt)

            dv = jax.lax.dot_general(                          # w^T @ g
                wc, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw = jax.lax.dot_general(                          # g @ v^T
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
            dlc = dl.astype(cdt)
            dq = jnp.dot(dlc, k,
                         preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(                          # dl^T @ q
                dlc, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

            dq_ref[bi, :, sl_h] = dq.astype(dq_ref.dtype)
            dkv_ref[bi, :, sl_h] = dk.astype(dkv_ref.dtype)
            dkv_ref[bi, :, sl_v] = dv.astype(dkv_ref.dtype)


def _cp_pad(x, rows):
    t = x.shape[1]
    return x if t == rows else jnp.pad(x, ((0, 0), (0, rows - t), (0, 0)))


def _forward_cp(q, kv, num_heads: int, valid_len: int, interpret: bool):
    """q: [B, Tq, D] local queries, kv: [B, Tk, 2D] full [k | v] set ->
    [B, Tq, D] attention output (valid_len real key tokens)."""
    b, tq, d = q.shape
    tk = kv.shape[1]
    _check_head_geometry(d, num_heads)
    head_dim = d // num_heads
    tqp, tkp = _round_up(tq, 8), _round_up(tk, 8)
    qp, kvp = _cp_pad(q, tqp), _cp_pad(kv, tkp)
    block_b = _block_b_for(b)
    kernel = functools.partial(
        _attn_cp_kernel, scale=float(head_dim) ** -0.5, valid_len=valid_len,
        num_heads=num_heads, head_dim=head_dim, block_b=block_b)
    out = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[pl.BlockSpec((block_b, tqp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_b, tkp, 2 * d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_b, tqp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tqp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * tqp * tkp * head_dim,
            bytes_accessed=(b * (2 * tqp + 2 * tkp) * d * q.dtype.itemsize),
            transcendentals=b * num_heads * tqp * tkp),
        interpret=interpret,
    )(qp, kvp)
    return out[:, :tq, :]


def _backward_cp(q, kv, g, num_heads: int, valid_len: int, interpret: bool):
    b, tq, d = q.shape
    tk = kv.shape[1]
    head_dim = d // num_heads
    tqp, tkp = _round_up(tq, 8), _round_up(tk, 8)
    qp, kvp, gp = _cp_pad(q, tqp), _cp_pad(kv, tkp), _cp_pad(g, tqp)
    block_b = _block_b_for(b)
    kernel = functools.partial(
        _attn_cp_bwd_kernel, scale=float(head_dim) ** -0.5,
        valid_len=valid_len, num_heads=num_heads, head_dim=head_dim,
        block_b=block_b)
    dq, dkv = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[pl.BlockSpec((block_b, tqp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_b, tkp, 2 * d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_b, tqp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((block_b, tqp, d), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block_b, tkp, 2 * d), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, tqp, d), q.dtype),
                   jax.ShapeDtypeStruct((b, tkp, 2 * d), kv.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=12 * b * num_heads * tqp * tkp * head_dim,
            bytes_accessed=(b * (4 * tqp + 4 * tkp) * d * q.dtype.itemsize),
            transcendentals=b * num_heads * tqp * tkp),
        interpret=interpret,
    )(qp, kvp, gp)
    return dq[:, :tq, :], dkv[:, :tk, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_attention_qkv_cp(q, kv, num_heads: int, valid_len: int,
                           interpret: bool = False):
    """Rectangular fused attention for sequence parallelism: local query
    block vs the full gathered key/value set."""
    return _forward_cp(q, kv, num_heads, valid_len, interpret)


def _cp_fwd(q, kv, num_heads, valid_len, interpret):
    return _forward_cp(q, kv, num_heads, valid_len, interpret), (q, kv)


def _cp_bwd(num_heads, valid_len, interpret, res, g):
    q, kv = res
    return _backward_cp(q, kv, g, num_heads, valid_len, interpret)


fused_attention_qkv_cp.defvjp(_cp_fwd, _cp_bwd)


def _cp_dense_reference(q, kv, num_heads: int, valid_len: int):
    """Dense rectangular attention (test oracle for the CP kernel)."""
    b, tq, d = q.shape
    tk = kv.shape[1]
    dh = d // num_heads
    qh = q.reshape(b, tq, num_heads, dh)
    kh = kv[..., :d].reshape(b, tk, num_heads, dh)
    vh = kv[..., d:].reshape(b, tk, num_heads, dh)
    scale = jnp.asarray(dh, jnp.float32) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.arange(tk) < valid_len
    logits = jnp.where(mask[None, None, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
    return out.reshape(b, tq, d)


def _sp_sharded(qkv, num_heads: int, mesh, n_seq: int, interpret: bool):
    """Pallas attention under sequence parallelism (SURVEY §2.7 SP row —
    provided as mesh capability beyond the reference, like PP).

    The all-gather-KV flavor of context parallelism, sized for this
    workload: tokens shard over the ``seq`` mesh axis, so LayerNorm, the
    QKV/proj GEMMs, and the MLP are token-local (zero communication);
    attention all-gathers only K and V (2/3 of the fused stream) along
    the sequence ring and runs the rectangular CP kernel on the local
    query block.  At T=197 a ring-attention schedule would trade one
    all-gather for n_seq ppermute hops of the same total bytes — no win
    at this scale (the kernel's own docstring: blockwise by design).
    Differentiable: the gathered-KV cotangent reduce-scatters back
    through the all_gather transpose; the CP kernel has a custom VJP.

    The token dim pads to an (8 * n_seq) multiple so every local block
    keeps the 8-sublane compute tile (197 -> 208 at n_seq=2, 224 at 4,
    256 at 8); padded key columns are masked at ``valid_len``, padded
    query rows are sliced off after the shard_map."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, SEQ_AXIS

    b, t, d3 = qkv.shape
    d = d3 // 3
    tp = _round_up(t, 8 * n_seq)
    _context["pallas_calls"] += 1

    def local(x):                                  # [b_l, t_l, 3D]
        q = x[..., :d]
        kv_full = jax.lax.all_gather(x[..., d:], SEQ_AXIS, axis=1,
                                     tiled=True)   # [b_l, tp, 2D]
        return fused_attention_qkv_cp(q, kv_full, num_heads, t, interpret)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(DATA_AXIS, SEQ_AXIS, None),
        out_specs=P(DATA_AXIS, SEQ_AXIS, None), check_vma=False)
    return f(_cp_pad(qkv, tp))[:, :t, :]


def _dense_reference(q, k, v):
    """Dense einsum attention (the non-Pallas path and VJP recompute)."""
    d = q.shape[-1]
    scale = jnp.asarray(d, jnp.float32) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, interpret: bool = False):
    """Pallas fused attention with dense-recompute backward."""
    return _forward(q, k, v, interpret=interpret)


def _fwd(q, k, v, interpret):
    return _forward(q, k, v, interpret=interpret), (q, k, v)


def _bwd(interpret, res, g):
    q, k, v = res
    d = q.shape[-1]
    scale = jnp.asarray(d, jnp.float32) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1)                   # [B,H,Tq,Tk] f32
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", w, g32)
    dw = jnp.einsum("bqhd,bkhd->bhqk", g32, v32)
    dlogits = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", dlogits, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", dlogits, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_fwd, _bwd)
