"""Where do the non-attention 33.6 ms go?  Suspect: exact (erf) GELU on
[128,197,3072] x12 layers.  Time the model with erf vs tanh GELU and an
elementwise erf microbench."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.models import vit as V

B = 128


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


# elementwise erf vs tanh on the MLP activation shape
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (B, 197, 3072)), jnp.bfloat16)
for name, f in [("gelu_erf", lambda a: nn.gelu(a, approximate=False)),
                ("gelu_tanh", lambda a: nn.gelu(a, approximate=True)),
                ("relu", jax.nn.relu)]:
    t = timed(jax.jit(f), x)
    print(f"{name} one [128,197,3072] bf16 pass: {t*1e3:.3f} ms", flush=True)

# whole model erf vs tanh
rng = np.random.default_rng(0)
batch = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3), dtype=np.uint8))

import vit_spoof_detection_pda_tpu.models.vit as mv

orig_gelu = nn.gelu
module = mv.ViTAntiSpoof(dtype=jnp.bfloat16)
variables = module.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))
folded = mv.fold_normalization(variables)

@jax.jit
def infer(p, u8):
    logits = module.apply({"params": p}, u8).astype(jnp.float32)
    return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])[0]

t = timed(infer, folded["params"], batch)
print(f"model erf GELU: {t*1e3:.2f} ms  {B/t:.0f} img/s", flush=True)

# monkeypatch to tanh GELU and re-trace
import flax.linen as fl
fl.gelu2 = fl.gelu
def tanh_gelu(a, approximate=False):
    return orig_gelu(a, approximate=True)
mv.nn.gelu = tanh_gelu

@jax.jit
def infer2(p, u8):
    logits = module.apply({"params": p}, u8).astype(jnp.float32)
    return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])[0]

t = timed(infer2, folded["params"], batch)
print(f"model tanh GELU: {t*1e3:.2f} ms  {B/t:.0f} img/s", flush=True)
mv.nn.gelu = orig_gelu
