"""Round-6: Mosaic-lowering + numerics check for the rectangular CP
attention kernel (ops/attention.py::fused_attention_qkv_cp) on the real
chip.  The SP shard_map path is CPU-mesh-validated (1 chip here), but
the kernel itself has two features no shipped kernel used before — a
rectangular [Tq, Tk] logits tile and a MULTI-OUTPUT backward
pallas_call — so prove they lower and match the dense oracle on TPU at
the shapes SP would produce (ViT-B head geometry, n_seq=2: local
Tq=104 of Tk=208, valid 197)."""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.ops.attention import (  # noqa: E402
    _cp_dense_reference, fused_attention_qkv_cp)

H, DH = 12, 64
D = H * DH
rng = np.random.default_rng(0)

for b, tq, tk, valid in [(8, 104, 208, 197), (128, 104, 208, 197),
                         (8, 56, 224, 197)]:
    q = jnp.asarray(rng.standard_normal((b, tq, D)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((b, tk, 2 * D)), jnp.bfloat16)

    got = np.asarray(jax.jit(
        lambda q, kv: fused_attention_qkv_cp(q, kv, H, valid, False)
    )(q, kv), np.float32)
    want = np.asarray(jax.jit(
        lambda q, kv: _cp_dense_reference(q, kv, H, valid)
    )(q, kv), np.float32)
    fwd_err = np.abs(got - want).max()

    def loss_f(q, kv):
        return jnp.sum(fused_attention_qkv_cp(q, kv, H, valid, False)
                       .astype(jnp.float32) ** 2)

    def loss_d(q, kv):
        return jnp.sum(_cp_dense_reference(q, kv, H, valid)
                       .astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1)))(q, kv)
    gd = jax.jit(jax.grad(loss_d, argnums=(0, 1)))(q, kv)
    bwd_err = max(
        np.abs(np.asarray(a, np.float32) - np.asarray(b_, np.float32)).max()
        / max(np.abs(np.asarray(b_, np.float32)).max(), 1e-6)
        for a, b_ in zip(gf, gd))
    print(f"b={b:3d} tq={tq} tk={tk}: fwd max|err|={fwd_err:.3e} "
          f"bwd max rel err={bwd_err:.3e}", flush=True)
