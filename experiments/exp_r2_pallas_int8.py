"""Can Mosaic lower an int8 MXU dot inside a Pallas kernel, and does a
fused dynamic-quant int8 matmul beat the plain bf16 dot at the ViT MLP
shape?  (VERDICT task 6: fuse quantization into a Pallas kernel or
demote int8.)

Kernel: per (M-tile, N-tile) program, quantize the x tile per-row in
VMEM (dynamic absmax -> int8), int8 dot -> i32, dequant in the f32
epilogue.  No quantize/dequant pass ever touches HBM.
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

M, K, N = 128 * 197, 768, 3072
TM, TN = 512, 1024


def timed(fn, *args, n1=30, n2=120):
    o = fn(*args)
    np.asarray(o.ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(o.ravel()[0])
        return time.perf_counter() - t0

    run(5)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def _kernel(x_ref, w_ref, ws_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)                     # [TM, K]
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)    # [TM, 1]
    scale = jnp.maximum(absmax, 1e-6) / 127.0
    xq = jnp.round(x / scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [TM, TN]
    o_ref[...] = (acc.astype(jnp.float32) * scale *
                  ws_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@jax.jit
def int8_mm(x, w_q, w_scale):
    mp = (M + TM - 1) // TM * TM
    xp = jnp.pad(x, ((0, mp - M), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=(mp // TM, N // TN),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, N), jnp.bfloat16),
    )(xp, w_q, w_scale)
    return out[:M]


@jax.jit
def bf16_mm(x, w):
    return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = rng.standard_normal((K, N)).astype(np.float32)
    w_scale = (np.abs(w).max(axis=0, keepdims=True) / 127.0)  # [1, N]
    w_q = jnp.asarray(np.round(w / w_scale), jnp.int8)
    w_scale = jnp.asarray(w_scale, jnp.float32)
    w16 = jnp.asarray(w, jnp.bfloat16)

    flops = 2 * M * K * N
    try:
        got = np.asarray(int8_mm(x, w_q, w_scale), np.float32)
        want = np.asarray(x, np.float32) @ w
        rel = np.abs(got - want).max() / np.abs(want).max()
        print(f"int8 pallas correct, max rel err {rel:.4f}", flush=True)
        t = timed(int8_mm, x, w_q, w_scale)
        print(f"int8 pallas fusedq: {t*1e3:.3f} ms  "
              f"{flops/t/1e12:.1f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"int8 pallas: FAILED {type(e).__name__}: {e}", flush=True)

    t = timed(bf16_mm, x, w16)
    print(f"bf16 xla dot:       {t*1e3:.3f} ms  "
          f"{flops/t/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
