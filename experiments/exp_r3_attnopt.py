"""Attention-block kernel VPU-diet probes (round 3).

The fused attention block runs ~1.42 ms/layer = ~102 TFLOP/s vs the
MLP's 175 — part structural (64-deep head dots), part VPU softmax chain:
per layer the [Tp,Tp] mask-select, max, sub, exp, div and cast are each
a ~100M-element pass.  Variants:

  A. shipped fused_attention_block (baseline)
  B. additive mask bias (one [1,Tp] row add replaces iota+compare+select)
     + scale folded into q ([Tp,64] mul replaces [Tp,Tp] mul)
     + late division (divide the [Tp,64] head output, not the [Tp,Tp]
       weight matrix)
  C. B + max-free softmax (skip the row max: exact same math in exact
     arithmetic; f32 exp is safe for |logits| < ~85)
  D. full-layer fusion: attention block + MLP block in ONE program
     (weights 14.2 MB resident — expected VMEM-tight; measures whether
     the inter-kernel x round-trip (~0.3 ms/layer) is recoverable)
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.ops.attention import (  # noqa: E402
    fused_attention_block, fused_mlp_block)

B, T, D, H, HID = 128, 197, 768, 12, 3072
DH = D // H
EPS = 1e-6


def _round_up(x, m):
    return (x + m - 1) // m * m


def _attn_block_kernel_opt(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                           wproj_ref, bproj_ref, o_ref, *, scale,
                           valid_len, num_heads, head_dim, block_b, eps,
                           use_max):
    tp = x_ref.shape[1]
    d = num_heads * head_dim
    colv = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    bias = jnp.where(colv < valid_len, 0.0, -1e30)          # [1, Tp] f32
    for bi in range(block_b):
        x = x_ref[bi].astype(jnp.float32)
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
            q = (q.astype(jnp.float32) * scale).astype(q.dtype)
            k = qkv[:, d + h * head_dim:d + (h + 1) * head_dim]
            v = qkv[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) + bias
            if use_max:
                logits = logits - jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits)
            s = jnp.sum(e, axis=-1, keepdims=True)          # [Tp, 1]
            num = jnp.dot(e.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            heads_out.append(num / s)
        attn_out = jnp.concatenate(heads_out, axis=1)
        proj = jax.lax.dot_general(
            attn_out.astype(x_ref.dtype), wproj_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[bi] = (x + proj + bproj_ref[0].astype(jnp.float32)
                     ).astype(o_ref.dtype)


def attn_block_opt(x, lns, lnb, wqkv, bqkv, wproj, bproj, *, use_max,
                   block_b=2):
    b, t, d = x.shape
    tp = _round_up(t, 128)
    scale = float(DH) ** -0.5
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    row = lambda a: jnp.asarray(a).reshape(1, -1)   # noqa: E731
    const = lambda i: (0, 0)                        # noqa: E731
    kernel = functools.partial(
        _attn_block_kernel_opt, scale=scale, valid_len=t, num_heads=H,
        head_dim=DH, block_b=block_b, eps=EPS, use_max=use_max)
    out = pl.pallas_call(
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
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tp * d * 4 * d + 4 * b * H * tp * tp * DH,
            bytes_accessed=2 * b * tp * d * x.dtype.itemsize,
            transcendentals=b * H * tp * tp),
    )(xp, row(lns), row(lnb), wqkv, row(bqkv), wproj, row(bproj))
    return out[:, :t, :]


def _layer_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                  wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                  b1_ref, w2_ref, b2_ref, o_ref, *, scale, valid_len,
                  num_heads, head_dim, block_b, eps, n_chunks):
    tp = x_ref.shape[1]
    d = num_heads * head_dim
    colv = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    bias = jnp.where(colv < valid_len, 0.0, -1e30)
    hidden = w1_ref.shape[1]
    chunk = hidden // n_chunks
    for bi in range(block_b):
        x = x_ref[bi].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + eps)
        xn = (xn * ln1s_ref[0].astype(jnp.float32)
              + ln1b_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
        qkv = jax.lax.dot_general(
            xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
        heads_out = []
        for h in range(num_heads):
            q = qkv[:, h * head_dim:(h + 1) * head_dim]
            q = (q.astype(jnp.float32) * scale).astype(q.dtype)
            k = qkv[:, d + h * head_dim:d + (h + 1) * head_dim]
            v = qkv[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) + bias
            logits = logits - jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits)
            s = jnp.sum(e, axis=-1, keepdims=True)
            num = jnp.dot(e.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            heads_out.append(num / s)
        attn_out = jnp.concatenate(heads_out, axis=1)
        proj = jax.lax.dot_general(
            attn_out.astype(x_ref.dtype), wproj_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = x + proj + bproj_ref[0].astype(jnp.float32)      # [Tp, D] f32
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + eps)
        yn = (yn * ln2s_ref[0].astype(jnp.float32)
              + ln2b_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
        acc = y + b2_ref[0].astype(jnp.float32)
        for c in range(n_chunks):
            sl = slice(c * chunk, (c + 1) * chunk)
            hh = jax.lax.dot_general(
                yn, w1_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            hh = jax.nn.gelu(hh + b1_ref[0, sl].astype(jnp.float32),
                             approximate=True).astype(x_ref.dtype)
            acc = acc + jax.lax.dot_general(
                hh, w2_ref[sl, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[bi] = acc.astype(o_ref.dtype)


def layer_fused(x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, ln2s, ln2b,
                w1, b1, w2, b2, *, block_b=1, n_chunks=4):
    b, t, d = x.shape
    tp = _round_up(t, 128)
    scale = float(DH) ** -0.5
    xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    row = lambda a: jnp.asarray(a).reshape(1, -1)   # noqa: E731
    const = lambda i: (0, 0)                        # noqa: E731
    hidden = w1.shape[1]
    kernel = functools.partial(
        _layer_kernel, scale=scale, valid_len=t, num_heads=H, head_dim=DH,
        block_b=block_b, eps=EPS, n_chunks=n_chunks)
    out = pl.pallas_call(
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
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, tp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tp * d * 4 * d + 4 * b * H * tp * tp * DH
            + 4 * b * tp * d * hidden,
            bytes_accessed=2 * b * tp * d * x.dtype.itemsize,
            transcendentals=b * H * tp * tp + b * tp * hidden),
    )(xp, row(ln1s), row(ln1b), wqkv, row(bqkv), wproj, row(bproj),
      row(ln2s), row(ln2b), w1, row(b1), w2, row(b2))
    return out[:, :t, :]


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, dt)
    ln1s = jnp.asarray(rng.standard_normal(D) * 0.1 + 1, jnp.float32)
    ln1b = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, dt)
    bqkv = jnp.asarray(rng.standard_normal(3 * D) * 0.02, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((D, D)) * 0.02, dt)
    bproj = jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32)
    ln2s = jnp.asarray(rng.standard_normal(D) * 0.1 + 1, jnp.float32)
    ln2b = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, HID)) * 0.02, dt)
    b1 = jnp.asarray(rng.standard_normal(HID) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((HID, D)) * 0.02, dt)
    b2 = jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32)
    attn_args = (ln1s, ln1b, wqkv, bqkv, wproj, bproj)
    mlp_args = (ln2s, ln2b, w1, b1, w2, b2)

    def attn_loop(fn):
        @jax.jit
        def f(x):
            for _ in range(12):
                x = fn(x, *attn_args)
            return x.astype(jnp.float32).sum()
        return f

    @jax.jit
    def full_shipped(x):
        for _ in range(12):
            x = fused_attention_block(x, *attn_args, H, eps=EPS)
            x = fused_mlp_block(x, *mlp_args, eps=EPS)
        return x.astype(jnp.float32).sum()

    def full_opt(use_max):
        @jax.jit
        def f(x):
            for _ in range(12):
                x = attn_block_opt(x, *attn_args, use_max=use_max)
                x = fused_mlp_block(x, *mlp_args, eps=EPS)
            return x.astype(jnp.float32).sum()
        return f

    def full_layerfused(block_b, n_chunks):
        @jax.jit
        def f(x):
            for _ in range(12):
                x = layer_fused(x, *attn_args, *mlp_args,
                                block_b=block_b, n_chunks=n_chunks)
            return x.astype(jnp.float32).sum()
        return f

    variants = {
        "A attn shipped (attn-only chain)": attn_loop(
            lambda x, *a: fused_attention_block(x, *a, H, eps=EPS)),
        "B attn opt w/max (attn-only)": attn_loop(
            functools.partial(attn_block_opt, use_max=True)),
        "C attn opt no-max (attn-only)": attn_loop(
            functools.partial(attn_block_opt, use_max=False)),
        "S full layer shipped (attn+mlp)": full_shipped,
        "O full layer opt-attn w/max": full_opt(True),
        "P full layer opt-attn no-max": full_opt(False),
        "D1 layer-fused bb=1 ch=4": full_layerfused(1, 4),
        "D2 layer-fused bb=2 ch=4": full_layerfused(2, 4),
    }
    import os
    sel = os.environ.get("EXP_VARIANTS")
    if sel:
        keys = sel.split(",")
        variants = {k: v for k, v in variants.items()
                    if any(k.startswith(p) for p in keys)}
        assert "A" in sel, "variant A is the parity reference"

    ref = float(variants["A attn shipped (attn-only chain)"](x))
    ref_full = None

    def timed(f, n1=20, n2=60):
        float(f(x))
        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                o = f(x)
            float(o)
            return time.perf_counter() - t0
        run(5)
        t1, t2 = run(n1), run(n2)
        return (t2 - t1) / (n2 - n1)

    for name, f in variants.items():
        try:
            v = float(f(x))
            base = ref_full if name[0] in "SOPD" and ref_full else ref
            if name.startswith("S"):
                ref_full = v
                base = v
            err = abs(v - base) / (abs(base) + 1e-9)
            t = timed(f)
            print(f"{name}: {t*1e3:7.2f} ms/12-layers "
                  f"({t*1e3/12:5.2f} ms/layer)  sum-relerr={err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
