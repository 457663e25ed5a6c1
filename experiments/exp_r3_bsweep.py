"""Serving batch-size sweep on the CURRENT fastserve path (the round-1
B-sweep predates the fused attention-block + flat-MLP kernels)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.models.fastserve import serving_forward
from vit_spoof_detection_pda_tpu.models.vit import (ViTAntiSpoof,
                                                    fold_normalization)

module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
variables = module.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))
params = fold_normalization(variables)["params"]
rng = np.random.default_rng(0)

infer = jax.jit(serving_forward)

for B in (128, 192, 256):
    batch = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3),
                                     dtype=np.uint8))
    float(infer(params, batch)[0])

    def run(n):
        o = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = infer(params, batch)
        float(o[0])
        return time.perf_counter() - t0

    run(4)
    t1, t2 = run(10), run(30)
    t = (t2 - t1) / 20
    print(f"B={B}: {t*1e3:6.1f} ms/batch  {B/t:6.0f} img/s", flush=True)
