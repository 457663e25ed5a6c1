"""Hardware check: the portable serving artifact (models/artifact.py)
executes on the TPU and reproduces the live fastserve path.

Exports the production-shape ViT-B/16 fastserve program (B=128) to an
artifact directory, reloads it cold (deserialize -> call, no module),
and asserts score parity vs the live make_serving_fn path on the same
uint8 batch; then times both with the relay-differenced protocol to
confirm the exported program carries no overhead.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r10_artifact.py
"""

import json
import tempfile
import time

import numpy as np


def _timed(fn, batch, n=8):
    """Relay-differenced per-exec seconds: (t(3n)-t(n))/(2n) with a
    scalar-bounded fetch (BENCH_NOTES measurement caveats)."""
    for _ in range(2):
        np.asarray(fn(batch)["prob1"])[:1]          # warm + link
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(batch)
    np.asarray(out["prob1"])[:1]
    t1 = time.perf_counter()
    for _ in range(3 * n):
        out = fn(batch)
    np.asarray(out["prob1"])[:1]
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * n)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.models.artifact import (
        load_serving_artifact, save_serving_artifact)
    from vit_spoof_detection_pda_tpu.models.fastserve import make_serving_fn
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.utils.aot import cached_compile

    assert jax.default_backend() == "tpu", jax.default_backend()
    B = 128
    module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
    init = cached_compile(
        module.init,
        (jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)),
        key="bench_vit_b16_init")
    variables = init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 224, 224, 3), jnp.float32))
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (B, 224, 224, 3), dtype=np.uint8))

    live = make_serving_fn(module, variables, batch_size=B,
                           mode="fastserve")
    live_scores = np.asarray(live(batch))

    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        save_serving_artifact(d, module, variables, mode="fastserve",
                              batch_size=B)
        t_export = time.time() - t0
        art = load_serving_artifact(d)
        got = np.asarray(art(batch)["prob1"])
        err = float(np.abs(got - live_scores).max())
        print(json.dumps({"export_s": round(t_export, 1),
                          "max_abs_score_diff": err}))
        assert err <= 1e-6, err

        ms_live = _timed(lambda b: {"prob1": live(b)}, batch) * 1e3
        ms_art = _timed(art, batch) * 1e3
        print(json.dumps({
            "live_ms_per_batch": round(ms_live, 2),
            "artifact_ms_per_batch": round(ms_art, 2),
            "img_s_artifact": round(B / ms_art * 1e3, 1)}))


if __name__ == "__main__":
    main()
