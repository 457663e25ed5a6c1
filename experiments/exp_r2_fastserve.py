"""Measure the fused attention-block serving path vs the module path."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.models.fastserve import serving_forward
from vit_spoof_detection_pda_tpu.models.vit import (ViTAntiSpoof,
                                                    fold_normalization)

B = 128
module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
variables = module.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))
folded = fold_normalization(variables)
rng = np.random.default_rng(0)
batch = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8))

@jax.jit
def mod_infer(p, u8):
    logits = module.apply({"params": p}, u8).astype(jnp.float32)
    return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])

@jax.jit
def fast_infer(p, u8):
    return serving_forward(p, u8)

a = np.asarray(mod_infer(folded["params"], batch))
b = np.asarray(fast_infer(folded["params"], batch))
print("score max diff vs module:", np.abs(a - b).max(), flush=True)

def timed(fn, *args, n1=10, n2=30):
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

t = timed(mod_infer, folded["params"], batch)
print(f"module path: {t*1e3:.2f} ms  {B/t:.0f} img/s", flush=True)
t = timed(fast_infer, folded["params"], batch)
print(f"fastserve:   {t*1e3:.2f} ms  {B/t:.0f} img/s", flush=True)

# --- fuse_mlp variant (flat M-tiled MLP kernel) ---
@jax.jit
def fast_infer_mlp(p, u8):
    return serving_forward(p, u8, fuse_mlp=True)

c = np.asarray(fast_infer_mlp(folded["params"], batch))
print("fuse_mlp score max diff vs module:", np.abs(a - c).max(), flush=True)
t = timed(fast_infer_mlp, folded["params"], batch)
print(f"fastserve fuse_mlp=True (flat): {t*1e3:.2f} ms  {B/t:.0f} img/s",
      flush=True)
