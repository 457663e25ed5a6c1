"""int8 vs bf16 GEMM at ViT shapes — fixed: return FULL outputs so XLA
cannot DCE the matmul (v1 fetched out[0,0] computed inside jit)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

M, K, N = 128 * 197, 768, 3072


def timed(fn, *args, n1=10, n2=30):
    o = fn(*args)
    np.asarray(jax.tree.leaves(o)[0].ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0].ravel()[0])
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
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def mm16_out16(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    @jax.jit
    def mm8(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    @jax.jit
    def mm8_dynq(a16, b8):
        s = jnp.max(jnp.abs(a16)).astype(jnp.float32) / 127.0
        a8 = jnp.clip(jnp.round(a16.astype(jnp.float32) / s),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(a8, b8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * s).astype(jnp.bfloat16)

    flops = 2 * M * K * N
    for name, fn, args in [("bf16->f32", mm16, (x16, w16)),
                           ("bf16->bf16", mm16_out16, (x16, w16)),
                           ("int8->i32", mm8, (x8, w8)),
                           ("int8 dynq bf16 in/out", mm8_dynq, (x16, w8))]:
        try:
            t = timed(fn, *args)
            print(f"{name}: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
