"""Attention kernel: pad T=197 to 208 (13x16) instead of 256 — 23% less
kernel DMA if Mosaic accepts the narrower tile."""
import functools, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
B, T, H, DH = 128, 197, 12, 64
D = H * DH


def timed(fn, *args, n1=20, n2=60):
    o = fn(*args); np.asarray(o.ravel()[0])
    def run(n):
        t0 = time.perf_counter()
        for _ in range(n): o = fn(*args)
        np.asarray(o.ravel()[0]); return time.perf_counter() - t0
    run(5)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def kernel(qkv_ref, o_ref, *, scale, valid, heads, hd, bb):
    tp = qkv_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < valid
    d = heads * hd
    for bi in range(bb):
        for h in range(heads):
            q = qkv_ref[bi, :, h*hd:(h+1)*hd]
            k = qkv_ref[bi, :, d+h*hd:d+(h+1)*hd]
            v = qkv_ref[bi, :, 2*d+h*hd:2*d+(h+1)*hd]
            lg = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            lg = jnp.where(mask, lg, -1e30)
            w = jax.nn.softmax(lg, axis=-1)
            o_ref[bi, :, h*hd:(h+1)*hd] = jnp.dot(
                w.astype(v.dtype), v,
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def make(tp, bb):
    @jax.jit
    def run(x):
        xp = jnp.pad(x, ((0, 0), (0, tp - T), (0, 0)))
        out = pl.pallas_call(
            functools.partial(kernel, scale=DH**-0.5, valid=T, heads=H,
                              hd=DH, bb=bb),
            grid=(B // bb,),
            in_specs=[pl.BlockSpec((bb, tp, 3*D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bb, tp, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, tp, D), x.dtype),
        )(xp)
        return out[:, :T, :]
    return run


x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, 3*D)),
                jnp.bfloat16)
ref = None
for tp in (256, 208):
    for bb in (2,):
        try:
            f = make(tp, bb)
            out = np.asarray(f(x), np.float32)
            if ref is None:
                ref = out
            else:
                err = np.abs(out - ref).max()
                print(f"tp={tp} max diff vs 256: {err:.2e}", flush=True)
            t = timed(f, x)
            print(f"tp={tp} bb={bb}: {t*1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"tp={tp} bb={bb}: FAILED {type(e).__name__}: {e}",
                  flush=True)
