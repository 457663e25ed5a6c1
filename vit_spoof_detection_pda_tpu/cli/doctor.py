"""`doctor` command: environment self-check for the framework.

The reference assumes a working CUDA box and fails deep inside torch
when it isn't (USAGE.md "edit the file to configure"); on TPU the
failure modes are subtler — wrong PJRT backend selected, Pallas/Mosaic
unavailable, the native codec unbuilt, a cold or unwritable compile
cache.  ``doctor`` probes each layer bottom-up and reports ok / warn /
fail with the remedy, so a deployment can be validated before any
training or serving job is launched.

Exit code 0 when nothing fails (warnings allowed), 1 otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

OK, WARN, FAIL = "ok", "warn", "fail"


def _check(name):
    def deco(fn):
        fn._check_name = name
        return fn
    return deco


@_check("versions")
def check_versions():
    import flax
    import jax
    import jaxlib
    import numpy
    import optax
    import orbax.checkpoint as ocp

    return OK, {
        "python": sys.version.split()[0],
        "jax": jax.__version__, "jaxlib": jaxlib.__version__,
        "flax": flax.__version__, "optax": optax.__version__,
        "orbax": ocp.__version__, "numpy": numpy.__version__,
    }


@_check("backend")
def check_backend():
    import jax

    backend = jax.default_backend()
    devices = jax.devices()
    detail = {
        "backend": backend,
        "devices": [str(d) for d in devices],
        "process_count": jax.process_count(),
    }
    if backend == "tpu":
        return OK, detail
    detail["note"] = (
        "non-TPU backend: training/eval run, but the fused Pallas "
        "serving paths (fastserve/lowlat/batch_grid) require TPU")
    return WARN, detail


@_check("device_exec")
def check_device_exec():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    out = jax.jit(lambda a, b: (a @ b).sum())(
        jnp.ones((128, 128), jnp.bfloat16),
        jnp.ones((128, 128), jnp.bfloat16))
    val = float(out)
    dt = time.perf_counter() - t0
    if val != 128.0 ** 3:
        return FAIL, {"error": f"wrong result {val}"}
    return OK, {"compile_plus_exec_s": round(dt, 2)}


@_check("device_memory")
def check_device_memory():
    from ..utils.profiling import device_memory_gb

    mem = device_memory_gb()
    if mem is None:
        return WARN, {"note": "backend exposes no memory_stats — "
                              "train/device_mem_gb telemetry disabled"}
    return OK, {"bytes_in_use_gb": round(mem, 3)}


@_check("mesh")
def check_mesh():
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    from ..parallel.mesh import make_mesh

    n = len(jax.devices())
    mesh = make_mesh()
    x = np.arange(n * 8, dtype=np.float32).reshape(n, 8)
    sharded = jax.device_put(
        x, NamedSharding(mesh, PartitionSpec("data", None)))
    total = float(jax.jit(lambda v: v.sum())(sharded))
    if total != float(x.sum()):
        return FAIL, {"error": "sharded reduction mismatch"}
    return OK, {"devices": n, "mesh": dict(zip(mesh.axis_names,
                                               mesh.devices.shape))}


@_check("pallas")
def check_pallas():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    interpret = jax.default_backend() != "tpu"

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret)(x)
    if float(out.sum()) != 2.0 * x.size:
        return FAIL, {"error": "pallas kernel wrong result"}
    if interpret:
        return WARN, {"note": "non-TPU backend: kernel ran in interpret "
                              "mode only (Mosaic lowering unverified)"}
    return OK, {"mosaic_lowering": True}


@_check("native_codec")
def check_native_codec():
    import tempfile

    import numpy as np
    from PIL import Image

    from ..data import native

    lib = native.get_lib()
    if lib is None:
        return WARN, {"note": "C++ codec unavailable (PIL fallback "
                              "active); check g++/libjpeg-dev — "
                              "data/native builds on first use"}
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    with tempfile.NamedTemporaryFile(suffix=".png") as f:
        Image.fromarray(img).save(f, format="PNG")
        f.flush()
        arr = native.native_decode(f.name, 32, resize="exact")
    if arr is None or arr.shape != (32, 32, 3):
        return FAIL, {"error": "native decode returned wrong shape"}
    if not np.array_equal(arr, img):
        return FAIL, {"error": "native PNG decode not bit-exact vs source"}
    return OK, {"png_roundtrip": "bit-exact"}


@_check("compile_cache")
def check_compile_cache():
    import os

    from ..utils import aot

    d = aot.DEFAULT_CACHE_DIR
    try:
        os.makedirs(d, exist_ok=True)
        probe = os.path.join(d, ".doctor_probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
    except OSError as e:
        return WARN, {"note": f"AOT cache dir not writable ({e}); "
                              "cold starts will recompile"}
    entries = [f for f in os.listdir(d) if not f.startswith(".")]
    return OK, {"dir": d, "entries": len(entries)}


@_check("config_presets")
def check_config_presets():
    from ..config import PRESETS, Config

    built = {}
    for name in PRESETS:
        cfg = Config.preset(name)
        built[name] = cfg.model.name
    return OK, {"presets": built}


CHECKS = [check_versions, check_backend, check_device_exec,
          check_device_memory, check_mesh, check_pallas,
          check_native_codec, check_compile_cache, check_config_presets]


def run_doctor(names=None) -> list:
    if names:
        known = {fn._check_name for fn in CHECKS}
        unknown = sorted(set(names) - known)
        if unknown:
            # a typo must not filter every check out and report "ok"
            raise ValueError(
                f"unknown check name(s) {unknown}; known: {sorted(known)}")
    results = []
    for fn in CHECKS:
        name = fn._check_name
        if names and name not in names:
            continue
        try:
            status, detail = fn()
        except Exception as e:  # noqa: BLE001 - each probe must not kill the rest
            status, detail = FAIL, {"error": f"{type(e).__name__}: {e}"}
        results.append({"check": name, "status": status, **detail})
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Validate the environment end to end (backend, "
                    "kernels, codec, cache, config)")
    parser.add_argument("--json", action="store_true",
                        help="one JSON object per check")
    parser.add_argument("--only", nargs="*", default=None,
                        help="subset of checks to run")
    args = parser.parse_args(argv)

    try:
        results = run_doctor(args.only)
    except ValueError as e:
        parser.error(str(e))
    worst = OK
    for r in results:
        if args.json:
            print(json.dumps(r))
        else:
            head = {"ok": "  ok ", "warn": " WARN", "fail": " FAIL"}[
                r["status"]]
            detail = {k: v for k, v in r.items()
                      if k not in ("check", "status")}
            print(f"[{head}] {r['check']}: {detail}")
        if r["status"] == FAIL or (r["status"] == WARN and worst == OK):
            worst = r["status"]
    if not args.json:
        print(f"doctor: {worst}" + (
            "" if worst == OK else " (see above)"))
    if any(r["status"] == FAIL for r in results):
        sys.exit(1)
    return results


if __name__ == "__main__":
    main()
