"""Serving with a 200-row inter-layer stream: pad 197->200 ONCE at the
stem, run the attention-block kernel on [200] blocks (cols masked at
197), flat-MLP over b*200 rows (exactly the current 25600-row padding),
slice once at the end.  vs shipped: saves the per-layer 197->256 pad +
256->197 slice copies of the residual stream (~0.8 ms/batch est)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.models.fastserve import (embed_patches,
                                                          serving_forward)
from vit_spoof_detection_pda_tpu.models.vit import (ViTAntiSpoof,
                                                    fold_normalization)
from vit_spoof_detection_pda_tpu.ops.attention import (_block_b_for,
                                                       fused_mlp_block)

B, T, D, H = 128, 197, 768, 12
DH = D // H
EPS = 1e-6
TO = 200


def _attn_block_kernel200(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                          wproj_ref, bproj_ref, o_ref, *, scale,
                          valid_len, num_heads, head_dim, block_b, eps):
    tp = x_ref.shape[1]                                      # 200
    d = num_heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < valid_len
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
        heads = []
        for h in range(num_heads):
            q = qkv[:, h * head_dim:(h + 1) * head_dim]
            k = qkv[:, d + h * head_dim:d + (h + 1) * head_dim]
            v = qkv[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(mask, logits, -1e30)
            w = jax.nn.softmax(logits, axis=-1)
            heads.append(jnp.dot(w.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32))
        attn = jnp.concatenate(heads, axis=1)
        proj = jax.lax.dot_general(
            attn.astype(x_ref.dtype), wproj_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[bi] = (x + proj + bproj_ref[0].astype(jnp.float32)
                     ).astype(o_ref.dtype)


def attn_block200(x, lns, lnb, wqkv, bqkv, wproj, bproj):
    b, to, d = x.shape
    scale = float(DH) ** -0.5
    block_b = _block_b_for(b)
    row = lambda a: jnp.asarray(a).reshape(1, -1)   # noqa: E731
    const = lambda i: (0, 0)                        # noqa: E731
    kernel = functools.partial(
        _attn_block_kernel200, scale=scale, valid_len=T, num_heads=H,
        head_dim=DH, block_b=block_b, eps=EPS)
    return pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, to, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, to, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, to, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * to * d * 4 * d + 4 * b * H * to * to * DH,
            bytes_accessed=2 * b * to * d * x.dtype.itemsize,
            transcendentals=b * H * to * to),
    )(x, row(lns), row(lnb), wqkv, row(bqkv), wproj, row(bproj))


def serving200(params, batch, dtype=jnp.bfloat16):
    vit = params["vit"]
    x = embed_patches(vit, batch, dtype=dtype, patch_size=16)
    x = jnp.pad(x, ((0, 0), (0, TO - T), (0, 0)))
    for i in range(12):
        blk = vit[f"block{i}"]
        x = attn_block200(
            x, blk["norm1"]["scale"], blk["norm1"]["bias"],
            blk["attn"]["qkv"]["kernel"].astype(dtype),
            blk["attn"]["qkv"]["bias"],
            blk["attn"]["proj"]["kernel"].astype(dtype),
            blk["attn"]["proj"]["bias"])
        mlp = blk["mlp"]
        x = fused_mlp_block(
            x, blk["norm2"]["scale"], blk["norm2"]["bias"],
            mlp["fc1"]["kernel"].astype(dtype), mlp["fc1"]["bias"],
            mlp["fc2"]["kernel"].astype(dtype), mlp["fc2"]["bias"],
            eps=EPS)
    x32 = x[:, :T].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + EPS)
    feats = (xn * vit["norm"]["scale"].astype(jnp.float32)
             + vit["norm"]["bias"].astype(jnp.float32))[:, 0]
    head = params["head"]
    mu = jnp.mean(feats, axis=-1, keepdims=True)
    var = jnp.mean((feats - mu) ** 2, axis=-1, keepdims=True)
    f = ((feats - mu) * jax.lax.rsqrt(var + 1e-5)
         * head["norm"]["scale"].astype(jnp.float32)
         + head["norm"]["bias"].astype(jnp.float32))
    f = jnp.dot(f, head["fc1"]["kernel"].astype(dtype),
                preferred_element_type=jnp.float32) + head["fc1"]["bias"]
    f = jax.nn.gelu(f, approximate=False)
    logits = (jnp.dot(f.astype(dtype), head["fc2"]["kernel"].astype(dtype),
                      preferred_element_type=jnp.float32)
              + head["fc2"]["bias"])
    return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])


def main():
    module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.float32))
    params = fold_normalization(variables)["params"]
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3),
                                     dtype=np.uint8))

    ship = jax.jit(serving_forward)
    new = jax.jit(serving200)
    a = np.asarray(ship(params, batch), np.float32)
    b_ = np.asarray(new(params, batch), np.float32)
    print(f"score max-abs-diff vs shipped: {np.abs(a - b_).max():.4f}",
          flush=True)

    def timed(f):
        float(f(params, batch)[0])

        def run(n):
            o = None
            t0 = time.perf_counter()
            for _ in range(n):
                o = f(params, batch)
            float(o[0])
            return time.perf_counter() - t0

        run(4)
        t1, t2 = run(10), run(30)
        return (t2 - t1) / 20

    for name, f in (("shipped", ship), ("200-row stream", new)):
        t = timed(f)
        print(f"{name}: {t*1e3:6.1f} ms/batch  {B/t:6.0f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
