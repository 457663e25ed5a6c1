"""Round-2 probes:

1. raw int8 vs bf16 GEMM throughput at the ViT MLP shapes — decides
   whether fused int8 quantization can beat the bf16 serving path
   (VERDICT task 6: make int8 pay or demote it)
2. headline shapes at B=256 with the block_b kernel
3. jax.experimental.serialize_executable round-trip on the axon backend
   (VERDICT task 7: kill the 3-8 min cold start)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

M, K, N = 128 * 197, 768, 3072


def timed(fn, *args, n1=10, n2=30):
    np.asarray(fn(*args)).ravel()[:1]

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(o).ravel()[:1]
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)

    x16 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)

    @jax.jit
    def mm16(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)[0, 0]

    @jax.jit
    def mm8(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)[0, 0]

    @jax.jit
    def mm8_fusedquant(a16, b8):
        # dynamic per-tensor activation quant fused in-graph
        s = jnp.max(jnp.abs(a16)).astype(jnp.float32) / 127.0
        a8 = jnp.clip(jnp.round(a16.astype(jnp.float32) / s),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(a8, b8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y[0, 0].astype(jnp.float32) * s)

    flops = 2 * M * K * N
    for name, fn, args in [("bf16", mm16, (x16, w16)),
                           ("int8", mm8, (x8, w8)),
                           ("int8+dynq", mm8_fusedquant, (x16, w8))]:
        try:
            t = timed(fn, *args)
            print(f"{name}: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # ---- B=256 headline with the shipped kernel --------------------------
    from vit_spoof_detection_pda_tpu.models.vit import (ViTAntiSpoof,
                                                        fold_normalization)
    module = ViTAntiSpoof(dtype=jnp.bfloat16)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.float32))
    folded = fold_normalization(variables)

    @jax.jit
    def infer(params, u8):
        logits = module.apply({"params": params}, u8).astype(jnp.float32)
        return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])[0]

    for B in (256,):
        u8 = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3),
                                      dtype=np.uint8))
        t = timed(infer, folded["params"], u8)
        print(f"infer B={B}: {t*1e3:.2f} ms  {B/t:.0f} img/s", flush=True)

    # ---- executable serialization round-trip ------------------------------
    try:
        from jax.experimental import serialize_executable as se
        lowered = jax.jit(lambda a, b: a @ b).lower(x16, w16)
        compiled = lowered.compile()
        t0 = time.perf_counter()
        payload, in_tree, out_tree = se.serialize(compiled)
        print(f"serialize ok: {len(payload)/1e6:.1f} MB "
              f"in {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        reloaded = se.deserialize_and_load(payload, in_tree, out_tree)
        print(f"deserialize ok in {time.perf_counter()-t0:.1f}s", flush=True)
        out = np.asarray(reloaded(x16, w16)).ravel()[0]
        print("reloaded exec runs:", out, flush=True)
    except Exception as e:
        print(f"serialize_executable: FAILED {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
