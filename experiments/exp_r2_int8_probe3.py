"""Higher-iteration rerun for the sub-ms GEMM variants."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
M, K, N = 128 * 197, 768, 3072


def timed(fn, *args, n1=50, n2=250):
    o = fn(*args); np.asarray(o.ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(o.ravel()[0])
        return time.perf_counter() - t0

    run(10)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


rng = np.random.default_rng(0)
x16 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
w16 = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)

mm16b = jax.jit(lambda a, b: jax.lax.dot_general(
    a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16))
mm8 = jax.jit(lambda a, b: jax.lax.dot_general(
    a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
flops = 2 * M * K * N
for name, fn, args in [("bf16->bf16", mm16b, (x16, w16)),
                       ("int8->i32", mm8, (x8, w8))]:
    t = timed(fn, *args)
    print(f"{name}: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TFLOP/s", flush=True)
