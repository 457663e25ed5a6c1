"""Batched compiled inference over a dataset.

Replaces the reference inference loops (test.py:191-220,
evaluate_all_models.py:132-149): host threads decode, the device runs ONE
jitted program per batch (normalize -> model -> softmax), and only the
final score vector is fetched.  The tail batch is padded to the fixed
batch size so a single compilation serves the whole pass (no dynamic
shapes).
"""

from __future__ import annotations

import contextlib
import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import DataPipeline
from ..data.manifest import Record
from ..ops import image as I

log = logging.getLogger(__name__)


def make_infer_fn(module, *, normalize: bool = True,
                  input_dtype=jnp.float32, mesh=None,
                  threshold: float = 0.5, temperature=None):
    """One fused program: image batch -> ImageNet-normalize -> model ->
    softmax scores.

    uint8 batches take the single-pass fused normalize; float batches
    (already in [0,1]) take the classic to_float+normalize path — same
    numbers either way in `input_dtype` (f32 default keeps eval scores
    bit-comparable with the torch-parity validation; pass bf16 only for
    throughput-oriented serving, see bench.py).

    ``threshold``: the ``pred`` operating point, P(live) > threshold.
    The 0.5 default is the argmax rule bit-for-bit (argmax ties at
    P=0.5 resolve to class 0 in both forms); non-default values bake a
    validated operating point into the SAME jitted program — the mesh
    in_shardings ride along, so fleet artifact exports keep their
    sharded calling convention regardless of threshold.

    ``temperature``: optional calibration — prob1 becomes
    ``sigmoid((l1 - l0) / T)`` (exactly temperature-scaled softmax for
    the binary head); threshold/pred apply on the calibrated scale."""
    if temperature is not None and float(temperature) <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")

    def infer(variables, batch):
        if normalize:
            if batch.dtype == jnp.uint8:
                x = I.normalize_u8_fused(batch, dtype=input_dtype)
            else:
                x = I.normalize(I.to_float(batch)).astype(input_dtype)
        else:
            x = I.to_float(batch)
        logits = module.apply(variables, x)
        if temperature is not None:
            margin = (logits[:, 1] - logits[:, 0]).astype(jnp.float32)
            prob1 = jax.nn.sigmoid(margin / jnp.float32(temperature))
        else:
            prob1 = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1)[:, 1]
        if threshold == 0.5 and temperature is None:
            # the reference's exact rule (test.py:213 argmax on logits)
            # — a softmax rounding an l1>l0 pair to exactly 0.5 would
            # flip a prob-cut pred, so the default stays argmax
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            pred = (prob1 > threshold).astype(jnp.int32)
        return {"prob1": prob1, "pred": pred}

    if mesh is not None:
        from jax.sharding import NamedSharding
        from ..parallel.mesh import batch_spec
        return jax.jit(infer, in_shardings=(
            None, NamedSharding(mesh, batch_spec())))
    return jax.jit(infer)


def make_fastserve_infer(module, variables, *, mesh=None,
                         interpret: bool = False):
    """Throughput eval: the bench.py serving path (models/fastserve.py —
    whole pre-LN sub-layers as single Pallas programs, bf16, tanh GELU,
    normalization folded into the patch-embed GEMM, raw uint8 input).

    Returns (jitted infer(batch_u8) -> {prob1, pred}, folded_params).
    Scores are P(live) = softmax column 1 (sigmoid(l1-l0) for the
    anti-spoof head), identical to the module path's convention;
    numerics are the SERVING policy — opt-in for that reason.

    Measured drift vs the f32 eval default (exp_r23_fastserve_drift,
    TPU v5e, full ViT-B/16, 2,048 images x 4 weight draws at the
    sigmoid max-slope point): max |Δscore| 1.15e-2, p99 8.5e-3, mean
    2.6e-3 — i.e. |Δlogit| <= 4.6e-2, so per-score drift scales as
    p(1-p) and is ~1e-3 at saturated scores.  Metric level
    (tests/test_fastserve_metric_bound.py): separated (production)
    score distributions keep every 4-decimal published digit of
    AUC/EER/threshold tables even under adversarial drift; borderline
    near-random-score models can move at the 1e-3..1e-2 level, which is
    why the f32 path stays the default for publishing numbers.
    ViTAntiSpoof and ViTLinearHead (the Base-ViT ablation) ride the
    same fused trunk; ResNet stays on the module path."""
    from ..models.fastserve import (serving_forward,
                                    serving_forward_linear,
                                    serving_forward_sharded)
    from ..models.vit import (ViTAntiSpoof, ViTLinearHead,
                              fold_normalization)
    if isinstance(module, ViTAntiSpoof):
        fn = serving_forward
        kwargs = dict(num_heads=module.num_heads,
                      patch_size=module.patch_size, depth=module.depth,
                      norm_eps=module.norm_eps)
    elif isinstance(module, ViTLinearHead):
        fn = serving_forward_linear
        kwargs = {}                      # ViT-B/16 defaults, HF eps
    else:
        raise TypeError("fastserve eval supports ViTAntiSpoof and "
                        f"ViTLinearHead; got {type(module).__name__}")
    if not interpret and jax.default_backend() != "tpu":
        raise RuntimeError(
            "fastserve eval runs Pallas TPU kernels; on the "
            f"'{jax.default_backend()}' backend use the standard path "
            "(fastserve=False) or pass interpret=True (tests)")
    params = fold_normalization(variables)["params"]
    kwargs.update(dtype=jnp.bfloat16, interpret=interpret)

    def infer(params, batch):
        if mesh is not None and mesh.devices.size > 1:
            out = serving_forward_sharded(params, batch, mesh, fn=fn,
                                          **kwargs)
        else:
            out = fn(params, batch, **kwargs)
        score = (out if out.ndim == 1 else out[:, 1]).astype(jnp.float32)
        return {"prob1": score, "pred": (score > 0.5).astype(jnp.int32)}

    return jax.jit(infer), params


def run_inference(module, variables, records: Sequence[Record], *,
                  batch_size: int = 128, img_size: int = 224,
                  num_workers: int = 8, normalize: bool = True,
                  mesh=None, interpret: bool = False,
                  fastserve: bool = False):
    """Returns dict of per-image arrays aligned with `records`:
    labels (canonical 1=live), prob1 (= softmax column 1), pred.

    ``fastserve=True`` scores through the bench.py serving path
    (ViTAntiSpoof / ViTLinearHead; bf16 fused-kernel numerics — ~1e-2 score drift
    vs the f32 default, so it is opt-in throughput mode).

    Multi-device: pass a (data,) mesh — or, on a multi-chip TPU backend,
    one is built automatically over all devices — and batches shard over
    the data axis with the Pallas attention kernel dispatched through
    ``attention_sharding`` (GSPMD cannot partition a pallas_call, so the
    sharded path must be requested at trace time; without this, eval on a
    mesh would silently fall back to dense attention).  ``interpret=True``
    exercises the same path on CPU meshes in tests.
    """
    if mesh is None and jax.default_backend() == "tpu" \
            and jax.device_count() > 1:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(data=jax.device_count(), model=1)
        log.info("eval: auto data-parallel mesh over %d devices",
                 jax.device_count())
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS
        n_data = dict(zip(mesh.axis_names,
                          mesh.devices.shape)).get(DATA_AXIS, 1)
        if batch_size % n_data:
            raise ValueError(
                f"batch_size {batch_size} not divisible by the "
                f"{n_data}-way data axis of the eval mesh")

    pipe = DataPipeline(records, batch_size=batch_size, img_size=img_size,
                        resize="exact", num_workers=num_workers,
                        shuffle=False, drop_last=False)
    if fastserve:
        if not normalize:
            # fold_normalization unconditionally bakes /255 + ImageNet
            # normalization into the weights — honoring normalize=False
            # is impossible on this path and silently wrong scores are
            # worse than an error
            raise ValueError("fastserve always folds normalization into "
                             "the weights; normalize=False is only "
                             "supported on the standard path")
        infer, variables = make_fastserve_infer(
            module, variables, mesh=mesh, interpret=interpret)
    else:
        infer = make_infer_fn(module, normalize=normalize, mesh=mesh)

    n = len(records)
    prob1 = np.zeros(n, np.float32)
    pred = np.zeros(n, np.int32)
    labels = np.asarray([r.label for r in records], np.int32)

    from ..ops.attention import attention_sharding
    # enter the context for interpret=True even WITHOUT a mesh: a CPU
    # test that requests the Pallas-interpret path would otherwise
    # silently run the dense fallback (green tests, zero kernel
    # coverage)
    ctx = (attention_sharding(mesh=mesh, interpret=interpret)
           if (mesh is not None or interpret)
           else contextlib.nullcontext())

    def collect(pending):
        out, idx, b = pending
        prob1[idx] = np.asarray(out["prob1"])[:b]
        pred[idx] = np.asarray(out["pred"])[:b]

    pending = None
    with ctx:
        for batch in pipe.batches():
            imgs = batch["image"]
            idx = batch["index"]
            b = imgs.shape[0]
            if b < batch_size:   # pad tail to the compiled shape
                padp = np.zeros((batch_size - b,) + imgs.shape[1:],
                                imgs.dtype)
                imgs = np.concatenate([imgs, padp])
            out = infer(variables, jnp.asarray(imgs))
            # fetch the PREVIOUS batch's results: the device queue keeps
            # a batch in flight while the host decodes/uploads the next
            # (the reference syncs every batch, test.py:205-218)
            if pending is not None:
                collect(pending)
            pending = (out, idx, b)
        if pending is not None:
            collect(pending)

    return {"labels": labels, "prob1": prob1, "pred": pred}
