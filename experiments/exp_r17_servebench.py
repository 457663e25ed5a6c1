"""Round-17: validate the productized serve-bench tool on hardware —
the loadgen must reproduce the exp_r15 e2e numbers (relay environment:
~125 img/s concurrent raw, ~290 img/s batch blocks).

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r17_servebench.py
"""

import json
import tempfile
import threading
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.models import artifact as A
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.serve import make_server, run_load
from vit_spoof_detection_pda_tpu.utils.aot import cached_compile

module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
init = cached_compile(
    module.init,
    (jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)),
    key="bench_vit_b16_init")
variables = init(jax.random.PRNGKey(0),
                 jnp.zeros((1, 224, 224, 3), jnp.float32))

d = tempfile.mkdtemp(prefix="pad_serve_r17_")
for name, mode, bs in (("grid16", "batch_grid", 16),
                       ("fast128", "fastserve", 128)):
    t0 = time.time()
    A.save_serving_artifact(f"{d}/{name}", module, variables,
                            mode=mode, batch_size=bs)
    print(f"export {name}: {time.time()-t0:.1f}s", flush=True)

srv = make_server([f"{d}/grid16", f"{d}/fast128"], port=0,
                  max_wait_ms=3.0)
port = srv.server_address[1]
srv.batcher.warmup()
threading.Thread(target=srv.serve_forever, daemon=True).start()
url = f"http://127.0.0.1:{port}"
print(f"serving on {url}", flush=True)

out = run_load(url, mode="raw", clients=32, requests=512, warmup=64)
print("A_raw: " + json.dumps(out), flush=True)
out = run_load(url, batch=128, clients=4, requests=12, warmup=4)
print("B_batch128: " + json.dumps(out), flush=True)
srv.shutdown_clean()
