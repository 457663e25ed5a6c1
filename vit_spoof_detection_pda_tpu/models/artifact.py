"""Portable serving artifacts: freeze a serving program to disk and run
it anywhere JAX runs — without this package, the Flax module tree, or
any retracing.

The reference's deployment story is "ship the ``.pth`` and re-run the
PyTorch scripts" (test.py:167-188 ``load_checkpoint`` +
``test_model``); its HF-hub distribution ships weights only
(evaluate_all_models.py:282-304), so every consumer must reconstruct
the exact preprocessing + model code.  The TPU-native equivalent
serializes the COMPILED CONTRACT instead: one StableHLO program
(``jax.export``) that maps raw ``uint8 [B,224,224,3]`` images to
``{"prob1": P(live), "pred"}`` — normalization folded in, score
convention pinned (1 = live, `data/conventions.py`) — plus the weight
tree and a JSON descriptor.  Loading is ``deserialize -> call``; no
model class, no transform recipe, no convention guesswork.

Artifact directory layout (versioned, see ``meta.json``):

- ``serving.stablehlo`` — ``jax.export`` serialization of
  ``fn(weights, batch_u8)``.  Weights stay call-time ARGUMENTS (not
  baked constants) so the same program serves fine-tuned variants and
  the artifact stays small (~KBs + the weight file).
- ``weights.npz`` — flattened leaves as raw little-endian bytes
  (uint8), sidestepping numpy's lossy ``V2`` handling of bfloat16;
  dtype/shape/tree structure recorded in the descriptor.
- ``meta.json`` — format version, serving mode, platforms, input spec,
  geometry, score convention, jax version.

Modes mirror the measured serving regimes (models/fastserve.py):

- ``"module"`` — the f32-parity eval program (eval/runner.py
  ``make_infer_fn`` body).  Exports MULTI-PLATFORM (cpu+tpu) and
  supports a SYMBOLIC batch dimension: one artifact serves any B.
- ``"fastserve"`` / ``"lowlat"`` / ``"batch_grid"`` — the fused Pallas
  kernel paths (throughput / B=1 latency / B=2-16).  TPU-only, fixed
  batch (Mosaic needs static shapes); the Mosaic kernels ride inside
  the StableHLO as custom calls, and cross-lowering works from a CPU
  host — artifacts for the TPU fleet can be built anywhere.
"""

from __future__ import annotations

import io
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT_VERSION = 1
_EXPORTED_FILE = "serving.stablehlo"
_WEIGHTS_FILE = "weights.npz"
_META_FILE = "meta.json"

_PALLAS_MODES = ("fastserve", "lowlat", "batch_grid")


# ---------------------------------------------------------------------------
# pytree <-> flat-bytes codec (dict/list/tuple trees of arrays)

def _tree_spec(tree, leaves_out, path=""):
    """JSON-able structure descriptor; appends (key, leaf) to leaves_out."""
    if isinstance(tree, dict):
        return {"kind": "dict",
                "items": {k: _tree_spec(tree[k], leaves_out,
                                        f"{path}/{k}" if path else str(k))
                          for k in sorted(tree)}}
    if isinstance(tree, (list, tuple)):
        return {"kind": "list" if isinstance(tree, list) else "tuple",
                "items": [_tree_spec(v, leaves_out, f"{path}/{i}")
                          for i, v in enumerate(tree)]}
    arr = np.asarray(jax.device_get(tree))
    key = f"leaf_{len(leaves_out):05d}"
    leaves_out.append((key, arr))
    return {"kind": "leaf", "key": key, "path": path,
            "dtype": arr.dtype.name, "shape": list(arr.shape)}


def _tree_unspec(spec, leaves):
    if spec["kind"] == "dict":
        return {k: _tree_unspec(v, leaves)
                for k, v in spec["items"].items()}
    if spec["kind"] in ("list", "tuple"):
        seq = [_tree_unspec(v, leaves) for v in spec["items"]]
        return seq if spec["kind"] == "list" else tuple(seq)
    raw = leaves[spec["key"]]
    dtype = np.dtype(jnp.bfloat16) if spec["dtype"] == "bfloat16" \
        else np.dtype(spec["dtype"])
    return np.frombuffer(raw.tobytes(), dtype=dtype).reshape(spec["shape"])


def _save_weights(path: Path, tree):
    leaves: list = []
    spec = _tree_spec(tree, leaves)
    buf = io.BytesIO()
    # raw bytes as uint8 entries: np.savez would silently store bf16 as
    # opaque void ("V2") and np.load hands back unusable arrays
    np.savez(buf, **{k: np.frombuffer(
        np.ascontiguousarray(a).tobytes(), dtype=np.uint8)
        for k, a in leaves})
    path.write_bytes(buf.getvalue())
    return spec


def _load_weights(path: Path, spec):
    with np.load(io.BytesIO(path.read_bytes())) as z:
        leaves = {k: z[k] for k in z.files}
    return _tree_unspec(spec, leaves)


# ---------------------------------------------------------------------------
# export

def temper_probs(p, temperature):
    """``sigmoid(logit(p) / T)`` in f32 — the deploy-side half of
    analysis/calibration.py's temperature scaling (fit T on validation
    scores there, bake it into the frozen program here).  Monotone:
    rankings, AUC, and EER are invariant; only probability VALUES move,
    so a threshold applies on the calibrated scale.

    The clip is 1e-7 (vs the f64 fit path's 1e-12) BY NECESSITY: this
    runs in the frozen program's f32, where ``1 - 1e-12`` rounds to
    exactly 1.0 and ``log1p(-p)`` would hit -inf — 1e-7 is the tightest
    clip f32 can express on the upper side.  Saturated scores therefore
    calibrate slightly differently than the f64 host path; everything
    in (1e-7, 1-1e-7) agrees."""
    eps = jnp.float32(1e-7)
    p = jnp.clip(p.astype(jnp.float32), eps, 1.0 - eps)
    z = (jnp.log(p) - jnp.log1p(-p)) / jnp.float32(temperature)
    return jax.nn.sigmoid(z)


def _score_infer_fn(raw_fn, threshold: float = 0.5, temperature=None,
                    **kwargs):
    def infer(weights, batch_u8):
        out = raw_fn(weights, batch_u8, **kwargs)
        score = (out if out.ndim == 1 else out[:, 1]).astype(jnp.float32)
        if temperature is not None:
            score = temper_probs(score, temperature)
        return {"prob1": score,
                "pred": (score > threshold).astype(jnp.int32)}
    return infer


def export_serving(module, variables, *, mode: str = "module",
                   batch_size=None, img_size: int = 224,
                   input_dtype=jnp.float32, platforms=None, mesh=None,
                   int8_weights: bool = False, threshold: float = 0.5,
                   temperature=None):
    """Build (exported, weights, meta) for a serving program.

    ``batch_size=None`` exports a symbolic batch dimension (one program,
    any B) — available only in ``mode="module"`` (the Pallas kernels
    need static shapes).  ``input_dtype`` is the module-path compute
    dtype (f32 = eval parity; the Pallas modes are bf16 by design).

    ``mesh``: export the FLEET flavor — the data-parallel sharded eval
    program (batch over the ``data`` axis, weights replicated; GSPMD
    collectives baked into the StableHLO).  Module mode only; the
    artifact then requires a matching-size device context at load
    (jax.export records the device assignment).

    ``int8_weights`` (``mode="lowlat"`` only): freeze the weight-only
    int8 encoder stream — the artifact's weight file halves and the
    frozen program carries the quantized numerics (opt-in; see
    ``fastserve.serving_program``).

    ``threshold``: the OPERATING POINT baked into ``pred`` — P(live) >
    threshold.  The reference's workflow centers on threshold
    optimization (train_advanced.py:449-462 optimal-F1 sweep,
    test.py:254-257 EER threshold) but its deployment ships weights
    only, losing the operating point; here the deployed program carries
    it (recorded in the descriptor).  Default 0.5 matches the
    reference's ``predicted_label_0.5`` artifact column.

    ``temperature``: optional probability calibration baked into
    ``prob1`` — ``sigmoid(logit(p) / T)`` with T fitted on validation
    scores (analysis/calibration.py::fit_temperature).  Monotone, so
    discrimination metrics are untouched; ``threshold`` then applies on
    the calibrated scale.
    """
    from .vit import ViTAntiSpoof

    threshold = float(threshold)
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if temperature is not None:
        temperature = float(temperature)
        if temperature <= 0.0:
            raise ValueError(f"temperature must be > 0, got {temperature}")

    geom = {}
    if isinstance(module, ViTAntiSpoof):
        geom = dict(num_heads=module.num_heads, depth=module.depth,
                    patch_size=module.patch_size, norm_eps=module.norm_eps)

    if mesh is not None:
        if mode != "module":
            raise ValueError(
                "mesh export is module-mode only (the Pallas regimes "
                "shard via shard_map at trace time — use the live "
                "serving_forward_sharded path on the fleet)")
        if batch_size is None:
            raise ValueError("mesh export needs a concrete batch_size "
                             "(divisible by the data axis)")
        from ..parallel.mesh import DATA_AXIS
        ndata = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
            DATA_AXIS, 1)
        if int(batch_size) % ndata:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"the {ndata}-way data axis")

    if mode == "module":
        if int8_weights:
            raise ValueError("int8_weights packs the lowlat encoder "
                             "stream; mode='module' exports the plain "
                             "eval program (pass mode='lowlat')")
        # the EXACT eval program (eval/runner.py) — reusing it keeps the
        # frozen-artifact contract from drifting off the live eval path
        from ..eval.runner import make_infer_fn
        # threshold rides INSIDE make_infer_fn's program so the mesh
        # in_shardings (fleet exports) survive non-default values
        infer = make_infer_fn(module, input_dtype=input_dtype, mesh=mesh,
                              threshold=threshold, temperature=temperature)
        weights = variables
        if platforms is None:
            platforms = ("cpu", "tpu")
    elif mode in _PALLAS_MODES:
        if batch_size is None:
            raise ValueError(
                f"mode={mode!r} compiles static Mosaic kernels; pass a "
                "concrete batch_size (symbolic batch needs mode='module')")
        if platforms is None:
            platforms = ("tpu",)
        elif tuple(platforms) != ("tpu",):
            raise ValueError(f"mode={mode!r} runs TPU Mosaic kernels; "
                             f"platforms must be ('tpu',), got {platforms}")
        # the EXACT live regime construction (weights layout + raw fn)
        from .fastserve import serving_program
        weights, raw, kw = serving_program(module, variables, mode=mode,
                                           int8_weights=int8_weights)
        infer = jax.jit(_score_infer_fn(raw, threshold=threshold,
                                        temperature=temperature, **kw))
    else:
        raise ValueError(f"unknown serving mode {mode!r}")

    if batch_size is None:
        b = jax.export.symbolic_shape("b")[0]
    else:
        b = int(batch_size)
    batch_spec = jax.ShapeDtypeStruct((b, img_size, img_size, 3),
                                      jnp.uint8)
    weight_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        weights)
    exported = jax.export.export(infer, platforms=list(platforms))(
        weight_specs, batch_spec)

    meta = {
        "format_version": ARTIFACT_VERSION,
        "mode": mode,
        "platforms": list(platforms),
        "batch_size": None if batch_size is None else int(batch_size),
        "img_size": int(img_size),
        "input": {"dtype": "uint8",
                  "layout": "[B, H, W, 3] RGB, raw 0-255 (normalization "
                            "is inside the program)"},
        "output": {"prob1": "P(live); 1 = live (data/conventions.py)",
                   "pred": f"1 = live at P(live) > {threshold}"},
        "threshold": threshold,
        "temperature": temperature,
        "compute_dtype": ("bfloat16" if mode in _PALLAS_MODES
                          else np.dtype(input_dtype).name),
        "int8_weights": bool(int8_weights),
        "model": type(module).__name__,
        "geometry": geom,
        "jax_version": jax.__version__,
    }
    if mesh is not None:
        meta["mesh"] = {"axis_names": list(mesh.axis_names),
                        "shape": [int(s) for s in mesh.devices.shape]}
    return exported, weights, meta


def save_serving_artifact(out_dir, module, variables, **kwargs):
    """Export + write the 3-file artifact directory.  Returns meta."""
    import hashlib

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    exported, weights, meta = export_serving(module, variables, **kwargs)
    prog = exported.serialize()
    (out / _EXPORTED_FILE).write_bytes(prog)
    meta["weights_spec"] = _save_weights(out / _WEIGHTS_FILE, weights)
    # integrity: a truncated rsync/scp of the ~170 MB weight file would
    # otherwise surface as garbage scores, not an error (hash the bytes
    # in hand / one read — not a second pass over what was just written)
    meta["checksums"] = {
        _EXPORTED_FILE: hashlib.sha256(prog).hexdigest(),
        _WEIGHTS_FILE: hashlib.sha256(
            (out / _WEIGHTS_FILE).read_bytes()).hexdigest()}
    (out / _META_FILE).write_text(json.dumps(meta, indent=1))
    return meta


class ServingArtifact:
    """A loaded artifact: ``artifact(batch_u8) -> {"prob1", "pred"}``.

    ``meta`` carries the descriptor; ``exported`` the jax.export object
    (for shape/platform introspection); ``weights`` the restored tree,
    device-put ONCE here — jit does not cache transfers of numpy
    arguments, so leaving them on host would re-upload the full weight
    tree every call.
    """

    def __init__(self, exported, weights, meta, mesh=None):
        self.exported, self.meta = exported, meta
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import batch_spec
            rep = NamedSharding(mesh, P())
            self._batch_sharding = NamedSharding(mesh, batch_spec())
            self.weights = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), rep), weights)
        else:
            self._batch_sharding = None
            self.weights = jax.tree.map(jnp.asarray, weights)
        self._call = jax.jit(exported.call)

    def __call__(self, batch_u8):
        if self._batch_sharding is not None:
            batch_u8 = jax.device_put(batch_u8, self._batch_sharding)
        return self._call(self.weights, batch_u8)

    @property
    def threshold(self) -> float:
        """The operating point baked into the program's ``pred``
        (pre-threshold artifacts carried the implicit 0.5)."""
        return float(self.meta.get("threshold", 0.5))

    @property
    def temperature(self):
        """The calibration temperature baked into ``prob1``, or None
        when the program ships raw model probabilities."""
        t = self.meta.get("temperature")
        return None if t is None else float(t)


def load_serving_artifact(path, mesh=None) -> ServingArtifact:
    """Load an artifact directory.  Fleet artifacts (meta carries
    ``mesh``) need a device mesh of the exported size: pass one, or one
    is built over all local devices when the count matches."""
    import hashlib

    p = Path(path)
    meta = json.loads((p / _META_FILE).read_text())
    ver = meta.get("format_version")
    if ver != ARTIFACT_VERSION:
        raise ValueError(f"artifact format {ver} != supported "
                         f"{ARTIFACT_VERSION} ({p})")
    # one read per file: the same bytes are hashed AND deserialized
    # (~170 MB of weights — a second pass is real IO on a cold cache)
    blobs = {f: (p / f).read_bytes()
             for f in (_EXPORTED_FILE, _WEIGHTS_FILE)}
    for f, want in meta.get("checksums", {}).items():
        if hashlib.sha256(blobs[f]).hexdigest() != want:
            raise ValueError(
                f"artifact file {f} is corrupt (sha256 mismatch — "
                "truncated copy?)")
    exported = jax.export.deserialize(blobs[_EXPORTED_FILE])
    with np.load(io.BytesIO(blobs[_WEIGHTS_FILE])) as z:
        leaves = {k: z[k] for k in z.files}
    weights = _tree_unspec(meta["weights_spec"], leaves)
    if meta.get("mesh"):
        want = int(np.prod(meta["mesh"]["shape"]))
        if mesh is None:
            if jax.device_count() != want:
                raise ValueError(
                    f"fleet artifact was exported for {want} devices; "
                    f"{jax.device_count()} visible — pass a matching "
                    "mesh or run in a matching device context")
            from ..parallel.mesh import make_mesh
            mesh = make_mesh(data=want, model=1)
        elif mesh.devices.size != want:
            raise ValueError(f"fleet artifact needs {want} devices; the "
                             f"given mesh has {mesh.devices.size}")
    elif mesh is not None:
        raise ValueError("this artifact was exported single-device; "
                         "re-export with export_serving(mesh=...) for "
                         "fleet serving")
    return ServingArtifact(exported, weights, meta, mesh=mesh)


def score_records(artifact: ServingArtifact, records, *,
                  batch_size: int = 64, num_workers: int = 8):
    """Score a list of ``data.manifest.Record`` through a loaded
    artifact: threaded host decode (black-image fallback preserved),
    tail padding to ONE compiled shape, one-batch-behind fetch — the
    run_inference loop (eval/runner.py) with the frozen program in
    place of a live module.  Returns {"prob1", "pred"} aligned with
    ``records``.  A fixed-batch artifact pins ``batch_size`` itself."""
    from ..data.loader import DataPipeline

    if artifact.meta.get("batch_size") is not None:
        batch_size = int(artifact.meta["batch_size"])
    img_size = int(artifact.meta.get("img_size", 224))
    pipe = DataPipeline(records, batch_size=batch_size,
                        img_size=img_size, resize="exact",
                        num_workers=num_workers, shuffle=False,
                        drop_last=False)
    n = len(records)
    prob1 = np.zeros(n, np.float32)
    pred = np.zeros(n, np.int32)

    def collect(pending):
        out, idx, b = pending
        prob1[idx] = np.asarray(out["prob1"])[:b]
        pred[idx] = np.asarray(out["pred"])[:b]

    pending = None
    for batch in pipe.batches():
        imgs, idx = batch["image"], batch["index"]
        b = imgs.shape[0]
        if b < batch_size:
            pad = np.zeros((batch_size - b,) + imgs.shape[1:], imgs.dtype)
            imgs = np.concatenate([imgs, pad])
        out = artifact(jnp.asarray(imgs))
        if pending is not None:
            collect(pending)
        pending = (out, idx, b)
    if pending is not None:
        collect(pending)
    return {"prob1": prob1, "pred": pred}
