"""Round-2 perf experiment 1: where do the 51.1 ms/batch go, and do the
two known levers pay?

Variants timed on the real TPU (B=128, ViT-B/16 bf16):
  full        shipped infer path (normalize_u8_fused -> model -> score)
  fold        ImageNet normalization folded into the patch-embed GEMM
              weights; model consumes raw uint8 (no normalize pass)
  noattn      attention replaced by identity (isolates GEMM+LN cost)
  attn1       one zero-transpose Pallas attention call (per-layer cost)
  attn1_b2/b4 same kernel with 2/4 batch items per grid program

Timing: enqueue N executions, fetch a scalar from the last; per-exec =
(t(30) - t(10)) / 20 (relay RTT cancels; BENCH_NOTES.md protocol).
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import attention as att
from vit_spoof_detection_pda_tpu.ops import image as I

B = 128


def timed(fn, *args, n1=10, n2=30):
    np.asarray(fn(*args))          # compile + warm
    np.asarray(fn(*args))

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(o)
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    module = ViTAntiSpoof(dtype=jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.float32))
    params = variables["params"]
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3),
                                     dtype=np.uint8))
    results = {}

    @jax.jit
    def infer_full(p, u8):
        x = I.normalize_u8_fused(u8)
        logits = module.apply({"params": p}, x).astype(jnp.float32)
        return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])[0]

    results["full"] = timed(infer_full, params, batch)
    print("full:", results["full"] * 1e3, "ms", flush=True)
    assert att._context["pallas_calls"] > 0, "pallas path not taken"

    # ---- fold normalization into the patch-embed GEMM -------------------
    def fold_params(p):
        mean = np.asarray(I.IMAGENET_MEAN, np.float32)
        std = np.asarray(I.IMAGENET_STD, np.float32)
        k = np.asarray(p["vit"]["patch_embed"]["kernel"])  # [p*p*c, D]
        b = np.asarray(p["vit"]["patch_embed"]["bias"])
        ppc = k.shape[0]
        scale = np.tile(1.0 / (255.0 * std), ppc // 3)       # c fastest
        shift = np.tile(mean / std, ppc // 3)
        k2 = k * scale[:, None]
        b2 = b - shift @ k
        out = jax.tree.map(lambda x: x, p)  # shallow-ish copy
        out["vit"] = dict(out["vit"])
        out["vit"]["patch_embed"] = {"kernel": jnp.asarray(k2),
                                     "bias": jnp.asarray(b2)}
        return out

    folded = fold_params(params)

    @jax.jit
    def infer_fold(p, u8):
        logits = module.apply({"params": p}, u8).astype(jnp.float32)
        return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])[0]

    # numeric check vs full path
    a = np.asarray(jax.jit(lambda p, u8: module.apply(
        {"params": p}, I.normalize_u8_fused(u8)))(params, batch[:8]))
    c = np.asarray(jax.jit(lambda p, u8: module.apply(
        {"params": p}, u8))(folded, batch[:8]))
    err = np.abs(a - c).max()
    print("fold max logit err:", err, flush=True)
    results["fold_err"] = float(err)
    results["fold"] = timed(infer_fold, folded, batch)
    print("fold:", results["fold"] * 1e3, "ms", flush=True)

    # ---- attention removed ----------------------------------------------
    orig_dispatch = att.dispatch_attention_qkv
    att.dispatch_attention_qkv = (
        lambda qkv, h, dense: qkv[..., :qkv.shape[-1] // 3])

    @jax.jit
    def infer_noattn(p, u8):
        x = I.normalize_u8_fused(u8)
        logits = module.apply({"params": p}, x).astype(jnp.float32)
        return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])[0]

    results["noattn"] = timed(infer_noattn, params, batch)
    att.dispatch_attention_qkv = orig_dispatch
    print("noattn:", results["noattn"] * 1e3, "ms", flush=True)

    # ---- standalone attention kernel, block_b variants -------------------
    qkv = jnp.asarray(rng.standard_normal((B, 197, 2304)), jnp.bfloat16)

    def make_blocked(block_b):
        def kernel(qkv_ref, o_ref, *, scale, valid_len, num_heads,
                   head_dim):
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
                    w = jax.nn.softmax(logits, axis=-1)
                    out = jnp.dot(w.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32)
                    o_ref[bi, :, h * head_dim:(h + 1) * head_dim] = (
                        out.astype(o_ref.dtype))

        @jax.jit
        def run(x):
            b, t, d3 = x.shape
            d = d3 // 3
            h = 12
            hd = d // h
            tp = 256
            xp = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
            out = pl.pallas_call(
                functools.partial(kernel, scale=hd ** -0.5, valid_len=t,
                                  num_heads=h, head_dim=hd),
                grid=(b // block_b,),
                in_specs=[pl.BlockSpec((block_b, tp, d3),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((block_b, tp, d),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
            )(xp)
            return out[0, 0, 0]

        return run

    for bb in (1, 2, 4):
        try:
            results[f"attn1_b{bb}"] = timed(make_blocked(bb), qkv)
            print(f"attn1_b{bb}:", results[f"attn1_b{bb}"] * 1e3, "ms",
                  flush=True)
        except Exception as e:  # Mosaic may reject a layout
            results[f"attn1_b{bb}"] = None
            print(f"attn1_b{bb}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    print(json.dumps({k: (v if isinstance(v, (int, float, type(None)))
                          else float(v)) for k, v in results.items()}))


if __name__ == "__main__":
    main()
