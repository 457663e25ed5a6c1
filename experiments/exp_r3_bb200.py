"""block_b re-probe at the 200-row tile (block_b=4 lost at 256 rows —
VMEM pressure shrank ~22%, retry 2 vs 4)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.models.fastserve import serving_forward
from vit_spoof_detection_pda_tpu.models.vit import (ViTAntiSpoof,
                                                    fold_normalization)
from vit_spoof_detection_pda_tpu.ops import attention as att

module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
variables = module.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))
params = fold_normalization(variables)["params"]
rng = np.random.default_rng(0)
batch = jnp.asarray(rng.integers(0, 256, (128, 224, 224, 3),
                                 dtype=np.uint8))


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


ref = None
for bb in (2, 4, 8):
    att._block_b_for_orig = att._block_b_for
    att._block_b_for = lambda b, _bb=bb: _bb if b % _bb == 0 else 1
    try:
        f = jax.jit(serving_forward)
        out = np.asarray(f(params, batch), np.float32)
        if ref is None:
            ref = out
        t = timed(f)
        print(f"block_b={bb}: {t*1e3:6.1f} ms  {128/t:6.0f} img/s  "
              f"maxdiff={np.abs(out-ref).max():.5f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"block_b={bb}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
    finally:
        att._block_b_for = att._block_b_for_orig
