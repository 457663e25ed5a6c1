"""Flat M-tiled fused MLP block: LN2+fc1+gelu+fc2+residual over the
FLATTENED [B*T, D] row space instead of per-batch-item [Tp, D] blocks.

Why the round-2 fused_mlp_block lost (36.2 vs 33.3 ms full path):
  - it padded T 197->256 inside each block: +30% MLP GEMM FLOPs;
  - grid=(B,)=128 programs at ~15us launch overhead;
LayerNorm is row-local, so the MLP half-layer has no reason to respect
batch-item boundaries at all.  Tiling the flat row space pads 25216 ->
25600 rows (+1.5%) and cuts the grid to 50 programs.

Variants measured here (12-layer sequential loop, B=128 residual stream):
  A. XLA MLP (shipped fastserve path)
  B. XLA MLP with bf16 dot output (no f32 epilogue)
  C. flat Pallas, M=512, hidden chunk 768
  D. flat Pallas, M=256, hidden chunk 1536
  E. flat Pallas, M=512, chunk 1536
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

B, T, D, HID = 128, 197, 768, 3072
EPS = 1e-6


def _flat_mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                     b2_ref, o_ref, *, eps: float, n_chunks: int):
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


def flat_mlp_block(x, lns, lnb, w1, b1, w2, b2, *, m_tile: int,
                   n_chunks: int, eps: float = EPS):
    b, t, d = x.shape
    rows = b * t
    rp = (rows + m_tile - 1) // m_tile * m_tile
    xf = jnp.pad(x.reshape(rows, d), ((0, rp - rows), (0, 0)))
    row = lambda a: jnp.asarray(a).reshape(1, -1)   # noqa: E731
    const = lambda i: (0, 0)                        # noqa: E731
    hidden = w1.shape[1]
    kernel = functools.partial(_flat_mlp_kernel, eps=eps, n_chunks=n_chunks)
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
    )(xf, row(lns), row(lnb), w1, row(b1), w2, row(b2))
    return out[:rows].reshape(b, t, d)


def xla_mlp(x, lns, lnb, w1, b1, w2, b2, *, bf16_out: bool):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + EPS)
    xn = (xn * lns.astype(jnp.float32)
          + lnb.astype(jnp.float32)).astype(x.dtype)
    if bf16_out:
        h = jnp.dot(xn, w1) + b1.astype(x.dtype)
        h = jax.nn.gelu(h, approximate=True)
        out = jnp.dot(h, w2) + b2.astype(x.dtype)
        return x + out
    h = (jnp.dot(xn, w1, preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32)).astype(x.dtype)
    h = jax.nn.gelu(h, approximate=True)
    out = (jnp.dot(h, w2, preferred_element_type=jnp.float32)
           + b2.astype(jnp.float32)).astype(x.dtype)
    return x + out


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.5, dt)
    lns = jnp.asarray(rng.standard_normal(D) * 0.1 + 1, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, HID)) * 0.02, dt)
    b1 = jnp.asarray(rng.standard_normal(HID) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((HID, D)) * 0.02, dt)
    b2 = jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32)
    args = (lns, lnb, w1, b1, w2, b2)

    def loop(fn):
        @jax.jit
        def f(x):
            for _ in range(12):
                x = fn(x, *args)
            return x.astype(jnp.float32).sum()   # scalar fetch: the relay
        return f                                  # streams bulk at ~15 MB/s

    variants = {
        "A xla f32-epilogue (shipped)": loop(
            functools.partial(xla_mlp, bf16_out=False)),
        "B xla bf16 dots": loop(functools.partial(xla_mlp, bf16_out=True)),
        "C flat M=512 chunk=768": loop(
            functools.partial(flat_mlp_block, m_tile=512, n_chunks=4)),
        "D flat M=256 chunk=1536": loop(
            functools.partial(flat_mlp_block, m_tile=256, n_chunks=2)),
        "E flat M=512 chunk=1536": loop(
            functools.partial(flat_mlp_block, m_tile=512, n_chunks=2)),
    }

    ref = float(variants["A xla f32-epilogue (shipped)"](x))

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
            err = abs(float(f(x)) - ref) / (abs(ref) + 1e-9)
            t = timed(f)
            print(f"{name}: {t*1e3:7.2f} ms/12-layers  "
                  f"({t*1e3/12:5.2f} ms/layer)  sum-relerr={err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
