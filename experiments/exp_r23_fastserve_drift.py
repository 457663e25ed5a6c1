"""Measure the --fastserve eval score drift vs the f32 parity path at
FULL ViT-B/16 shape on hardware (VERDICT r3 weak #4: the fastserve
metric-level tolerance needs a measured score-drift bound).

Protocol: same uint8 images through
  (a) the eval default: preprocess (u8 -> normalized f32) + f32 module
      apply, erf GELU -> softmax col 1  (eval/runner.py run_inference)
  (b) the --fastserve path: make_fastserve_infer (bf16 fused kernels,
      tanh GELU, folded normalization, raw u8 in)
and report |a - b| statistics over 512 images x 4 weight draws.

Random-init weights put every score near the sigmoid's max-slope point
(~0.5), which maximizes d(score)/d(logit) = p(1-p) <= 1/4 — so the
drift measured here UPPER-bounds the drift on trained, saturated
score distributions for the same logit-level error.
"""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.eval.runner import make_fastserve_infer
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops.image import preprocess_eval

B, N_BATCHES, SEEDS = 128, 4, 4

module_f32 = ViTAntiSpoof(dtype=jnp.float32, gelu="erf")


@jax.jit
def parity_infer(params, u8):
    x = preprocess_eval(u8)
    logits = module_f32.apply({"params": params}, x).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)[:, 1]


all_drift = []
for seed in range(SEEDS):
    variables = module_f32.init(jax.random.PRNGKey(seed),
                                jnp.zeros((1, 224, 224, 3), jnp.float32))
    fast_infer, folded = make_fastserve_infer(module_f32, variables)
    rng = np.random.default_rng(100 + seed)
    drifts = []
    scores_a = []
    for b in range(N_BATCHES):
        u8 = jnp.asarray(rng.integers(0, 256, (B, 224, 224, 3),
                                      dtype=np.uint8))
        a = np.asarray(parity_infer(variables["params"], u8),
                       np.float64)
        f = np.asarray(fast_infer(folded, u8)["prob1"], np.float64)
        drifts.append(np.abs(a - f))
        scores_a.append(a)
    d = np.concatenate(drifts)
    s = np.concatenate(scores_a)
    all_drift.append(d)
    print(f"seed {seed}: score mean {s.mean():.4f} std {s.std():.4f} | "
          f"drift max {d.max():.3e} p99 {np.percentile(d, 99):.3e} "
          f"mean {d.mean():.3e}", flush=True)

d = np.concatenate(all_drift)
print(f"TOTAL n={len(d)}: max {d.max():.3e} "
      f"p99.9 {np.percentile(d, 99.9):.3e} "
      f"p99 {np.percentile(d, 99):.3e} mean {d.mean():.3e}", flush=True)
