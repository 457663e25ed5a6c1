"""Attention backward kernel: f32 dots vs bf16-input dots.

The shipped _attn_qkv_bwd_kernel upcasts w/g/v/q/k to f32 for the five
backward dots — but the v5e MXU runs f32 matmuls at ~1/4 its bf16 rate.
Variant: keep the softmax + dl elementwise math in f32, feed every dot
bf16 inputs (f32 accumulation via preferred_element_type).  Measures
time and gradient error vs the dense f32 reference.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.ops.attention import (
    _backward_qkv, _qkv_dense_reference, _round_up, _block_b_for)

B, T, H, DH = 128, 197, 12, 64
D = H * DH


def _bwd_kernel_bf16(qkv_ref, g_ref, dqkv_ref, *, scale, valid_len,
                     num_heads, head_dim, block_b):
    tp = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < valid_len
    d = num_heads * head_dim
    for bi in range(block_b):
        for h in range(num_heads):
            sl_q = slice(h * head_dim, (h + 1) * head_dim)
            sl_k = slice(d + h * head_dim, d + (h + 1) * head_dim)
            sl_v = slice(2 * d + h * head_dim, 2 * d + (h + 1) * head_dim)
            q = qkv_ref[bi, :, sl_q]
            k = qkv_ref[bi, :, sl_k]
            v = qkv_ref[bi, :, sl_v]
            g = g_ref[bi, :, sl_q]                       # bf16

            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(mask, logits, -1e30)
            w = jax.nn.softmax(logits, axis=-1)          # f32
            wb = w.astype(q.dtype)                       # bf16 for dots

            dv = jax.lax.dot_general(
                wb, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
            dlb = dl.astype(q.dtype)
            dq = jnp.dot(dlb, k, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                dlb, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

            dqkv_ref[bi, :, sl_q] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[bi, :, sl_k] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[bi, :, sl_v] = dv.astype(dqkv_ref.dtype)


def backward_bf16(qkv, g, num_heads):
    b, t, d3 = qkv.shape
    d = d3 // 3
    head_dim = d // num_heads
    tp = _round_up(t, 128)
    scale = float(head_dim) ** -0.5
    block_b = _block_b_for(b)
    qkv_p = jnp.pad(qkv, ((0, 0), (0, tp - t), (0, 0)))
    g_p = jnp.pad(g, ((0, 0), (0, tp - t), (0, 0)))
    kernel = functools.partial(_bwd_kernel_bf16, scale=scale, valid_len=t,
                               num_heads=num_heads, head_dim=head_dim,
                               block_b=block_b)
    return pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[pl.BlockSpec((block_b, tp, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_b, tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_b, tp, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d3), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * num_heads * tp * tp * head_dim,
            bytes_accessed=8 * b * tp * d * qkv.dtype.itemsize,
            transcendentals=b * num_heads * tp * tp),
    )(qkv_p, g_p)[:, :t, :]


rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.standard_normal((B, T, 3 * D)) * 0.3, jnp.bfloat16)
g = jnp.asarray(rng.standard_normal((B, T, D)) * 0.3, jnp.bfloat16)

ship = jax.jit(lambda a, b: _backward_qkv(a, b, H).astype(
    jnp.float32).sum())
new = jax.jit(lambda a, b: backward_bf16(a, b, H).astype(jnp.float32).sum())

# accuracy vs dense f32 grads
dense = jax.jit(jax.grad(
    lambda a: (_qkv_dense_reference(a.astype(jnp.float32), H)
               * g.astype(jnp.float32)).sum()))
want = np.asarray(dense(qkv), np.float32)
got_ship = np.asarray(jax.jit(lambda a, b: _backward_qkv(a, b, H))(qkv, g),
                      np.float32)
got_new = np.asarray(jax.jit(lambda a, b: backward_bf16(a, b, H))(qkv, g),
                     np.float32)
sc = np.abs(want).max()
print(f"grad maxerr/scale: shipped={np.abs(got_ship-want).max()/sc:.2e} "
      f"bf16-dots={np.abs(got_new-want).max()/sc:.2e}", flush=True)


def timed(f, n1=20, n2=60):
    float(f(qkv, g))
    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(qkv, g)
        float(o)
        return time.perf_counter() - t0
    run(5)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


print(f"shipped f32-dot bwd: {timed(ship)*1e3:6.2f} ms", flush=True)
print(f"bf16-dot bwd:        {timed(new)*1e3:6.2f} ms", flush=True)
