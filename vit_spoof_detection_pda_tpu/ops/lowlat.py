"""Whole-encoder single-kernel serving for latency-critical (small-B)
inference.

Why: at B=1 the fastserve path (models/fastserve.py) costs 1.098 ms/img
on the v5e, but its roofline is the ~162 MB weight stream (~0.2 ms at
HBM rate) — the gap is ~24 per-layer kernel launches (~15 us each) plus
weight fetches that do not overlap compute across program boundaries
(BENCH_NOTES.md round 7).  Here the ENTIRE 12-layer encoder runs as ONE
``pallas_call``: the grid walks ``(batch, depth * 3)`` phases
(attention block / fc1+GELU / fc2+residual), the residual stream lives
in the output's VMEM block across grid steps, and Mosaic double-buffers
the per-phase weight superblock — the next phase's weights stream from
HBM while the current phase computes, so small-batch latency approaches
the weight-stream floor.

Memory layout that makes it possible (VMEM is 16 MB; the naive
whole-layer block of 14.2 MB cannot double-buffer):

- every phase's weights pack into a UNIFORM ``[D, 4D]`` bf16 superblock
  (4.5 MB at ViT-B, 9 MB double-buffered):
    phase 0: ``[:, :3D]`` = W_qkv, ``[:, 3D:]`` = W_proj (3D+D = 4D);
    phase 1: fc1 ``[D, 4D]`` exactly (mlp_ratio 4);
    phase 2: fc2 ``[4D, D]`` packed as 4 row-chunks side by side
      (``packed[:, cD:(c+1)D] = fc2[cD:(c+1)D, :]``) so the fc2 matmul
      is 4 ACCUMULATING normal dots — no transposed contraction, which
      Mosaic does not lower for this shape.
- LN scales/biases ride a small ``[4, 4D]`` f32 block per phase.
- the ``[Tp, 4D]`` hidden activation persists in VMEM scratch between
  phases 1 and 2 and never reaches HBM.

Numerics are the serving profile (bf16 GEMMs, f32 LN/softmax/epilogues,
tanh GELU) — same ops as fastserve; only the fc2 accumulation order
differs (4 chunks vs 2), so scores match within bf16 tolerance
(tests/test_lowlat.py).

This is a LATENCY mode: each batch item re-streams all weights, so
throughput saturates around B<=8 — batch serving stays on
models/fastserve.py (4,636 img/s at B=128).  Serving-only: no VJP.

Reference counterpart: the bs=1 wall-clock protocol behind the
published 184.16 FPS headline (additional_analysis.py:184-315).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_sublayer(x32, w_blk, s_blk, *, num_heads: int, valid_len: int,
                   eps: float, out_dtype):
    """One pre-LN attention sub-layer on a [Tp, D] f32 residual: LN1 ->
    fused QKV GEMM -> per-head masked softmax attention -> proj ->
    residual add.  Value-level (no refs), shared by the per-item and
    batch-grid encoder kernels so the two latency paths cannot drift
    numerically.  ``w_blk``: [D, 4D] phase-0 superblock (W_qkv | W_proj);
    ``s_blk``: [4, 4D] (ln scale / ln bias / qkv bias / proj bias)."""
    tp, d = x32.shape
    head_dim = d // num_heads
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + eps)
          * s_blk[0, :d] + s_blk[1, :d]).astype(out_dtype)
    qkv = jax.lax.dot_general(
        xn, w_blk[:, :3 * d], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + s_blk[2, :3 * d]).astype(out_dtype)
    scale = float(head_dim) ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = col < valid_len
    heads = []
    for h in range(num_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, d + h * head_dim:d + (h + 1) * head_dim]
        v = qkv[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mask, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        heads.append(jnp.dot(w.astype(v.dtype), v,
                             preferred_element_type=jnp.float32))
    attn_out = jnp.concatenate(heads, axis=1)
    proj = jax.lax.dot_general(
        attn_out.astype(out_dtype), w_blk[:, 3 * d:4 * d],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return (x32 + proj + s_blk[3, :d]).astype(out_dtype)


def _encoder_kernel(x_ref, w_ref, s_ref, *refs, depth: int,
                    num_heads: int, valid_len: int, eps: float,
                    fold_ends: bool = False, head_eps: float = 1e-5,
                    head_hidden: int = 0):
    """One grid step = one phase of one layer for one batch item.

    o_ref (block-constant per item) IS the residual stream: initialized
    from x_ref at the item's first step, read+written by every phase,
    flushed to HBM when the item finishes.  h_ref (VMEM scratch) carries
    the hidden activation from phase 1 to phase 2.

    With ``fold_ends`` the grid grows by two steps: step 0 runs the
    patch-embed GEMM (x_ref holds raw patch vectors, aux_ref the
    pos-embed/cls/bias fold) and the last step runs final-LN + the
    anti-spoof head, writing both logits into l_ref — the whole
    image->logits forward is ONE Pallas program.  ``head_hidden`` is the
    head fc1 width (512 for the reference ViTFaceAntiSpoofing,
    train_advanced.py:193-200).  Both end phases read one small
    VMEM-RESIDENT weight block we_ref ``[D, D+head_hidden]`` (embed W in
    cols ``:D``, head fc1 in ``D:``) + its s block se_ref, both with
    constant index maps so they are fetched ONCE per kernel — the
    encoder superblock stream stays untouched (its index map clips to
    the adjacent layer on the end steps, costing zero extra traffic)."""
    if fold_ends:
        we_ref, se_ref, aux_ref, o_ref, l_ref, h_ref = refs
    else:
        (o_ref, h_ref), we_ref, se_ref, aux_ref, l_ref = \
            refs, None, None, None, None
    tp, d = o_ref.shape[1], o_ref.shape[2]
    head_dim = d // num_heads
    hidden = h_ref.shape[1]
    i = pl.program_id(1)
    phase = jax.lax.rem(i - 1, 3) if fold_ends else jax.lax.rem(i, 3)
    if fold_ends:
        phase = jnp.where(i == 0, 3, phase)
        phase = jnp.where(i == 3 * depth + 1, 4, phase)

    if fold_ends:
        hh = head_hidden

        @pl.when(phase == 3)
        def _embed():
            # x_ref rows: 0 = zeros (CLS slot), 1..N = patch vectors,
            # N+1.. = zero padding; aux = pos_embed + embed bias folded
            # (row 0 = cls_token + pos0, pad rows 0).
            y = jax.lax.dot_general(
                x_ref[0], we_ref[0, :, :d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0] = (y + aux_ref[0]).astype(o_ref.dtype)

        @pl.when(phase == 4)
        def _head():
            cls = o_ref[0, :1, :].astype(jnp.float32)       # [1, D]
            mu = jnp.mean(cls)
            var = jnp.mean((cls - mu) ** 2)
            xn = (cls - mu) * jax.lax.rsqrt(var + eps)
            f = xn * se_ref[0, 0, :d] + se_ref[0, 1, :d]    # vit.norm
            # fastserve rounds the backbone features through the serving
            # dtype before the head LN (_cls_head_scores) — mirror it.
            f = f.astype(o_ref.dtype).astype(jnp.float32)
            mu2 = jnp.mean(f)
            var2 = jnp.mean((f - mu2) ** 2)
            fn = (f - mu2) * jax.lax.rsqrt(var2 + head_eps)
            f = fn * se_ref[0, 0, d:2 * d] + se_ref[0, 1, d:2 * d]
            # fc1 mirrors _cls_head_scores: f32 activations x upcast
            # weights (jnp.dot promotes the bf16 kernel to f32 there)
            h1 = jax.lax.dot_general(
                f, we_ref[0, :, d:d + hh].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h1 = h1 + se_ref[0, 2, :hh]
            # head keeps erf GELU (models/vit.py) — but Mosaic has no
            # erf/erfc lowering, so evaluate erf by Abramowitz-Stegun
            # 7.1.26 (max |err| 1.5e-7, far below the bf16 rounding the
            # result immediately passes through)
            z = h1 * jnp.float32(0.7071067811865476)
            az = jnp.abs(z)
            t = 1.0 / (1.0 + 0.3275911 * az)
            poly = t * (0.254829592 + t * (-0.284496736 + t * (
                1.421413741 + t * (-1.453152027 + t * 1.061405429))))
            erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
            h1 = 0.5 * h1 * (1.0 + erf)
            h1 = h1.astype(o_ref.dtype).astype(jnp.float32)
            l0 = jnp.sum(h1 * se_ref[0, 0, 2 * d:2 * d + hh]) \
                + se_ref[0, 3, 0]
            l1 = jnp.sum(h1 * se_ref[0, 1, 2 * d:2 * d + hh]) \
                + se_ref[0, 3, 1]
            row = jax.lax.broadcasted_iota(jnp.int32, l_ref.shape[1:], 0)
            col = jax.lax.broadcasted_iota(jnp.int32, l_ref.shape[1:], 1)
            l_ref[0] = jnp.where((row == 0) & (col == 0), l0,
                                 jnp.where((row == 0) & (col == 1), l1,
                                           0.0))
    else:
        @pl.when(i == 0)
        def _init():
            o_ref[...] = x_ref[...]

    def _ln(x32, srow):
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        return (xn * s_ref[0, srow, :d] + s_ref[0, srow + 1, :d])

    def _wblk():
        # int8 weight-only stream (pack_encoder_weights weight_dtype):
        # dequantize the superblock in VMEM with its per-column scales
        # (S row 4) — the HBM stream stays int8, the dots stay bf16.
        # The cast goes straight int8 -> compute dtype (exact: |q| <=
        # 127 is representable in bf16) and the scale multiply runs in
        # the compute dtype too: a [D, 4D] f32 intermediate would add
        # ~9.4 MB of VMEM at ViT-B on top of the double-buffered stream
        # and blow the 16 MB budget.  The ~0.4% bf16 scale rounding is
        # far below the int8 quantization noise it multiplies.
        if w_ref.dtype == jnp.int8:
            return (w_ref[0].astype(o_ref.dtype)
                    * s_ref[0, 4, :][None, :].astype(o_ref.dtype))
        return w_ref[0]

    @pl.when(phase == 0)
    def _attn():
        o_ref[0] = _attn_sublayer(
            o_ref[0].astype(jnp.float32), _wblk(), s_ref[0],
            num_heads=num_heads, valid_len=valid_len, eps=eps,
            out_dtype=o_ref.dtype)

    @pl.when(phase == 1)
    def _fc1():
        x = o_ref[0].astype(jnp.float32)
        xn = _ln(x, 0).astype(o_ref.dtype)
        h = jax.lax.dot_general(
            xn, _wblk(), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h + s_ref[0, 2, :], approximate=True)
        h_ref[...] = h.astype(h_ref.dtype)

    @pl.when(phase == 2)
    def _fc2():
        w = _wblk()
        acc = o_ref[0].astype(jnp.float32) + s_ref[0, 0, :d]
        for c in range(hidden // d):
            acc = acc + jax.lax.dot_general(
                h_ref[:, c * d:(c + 1) * d], w[:, c * d:(c + 1) * d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(o_ref.dtype)


def _encoder_batchgrid_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                              num_heads: int, valid_len: int, eps: float,
                              batch: int):
    """Batch-grid flavor: the grid walks PHASES ONLY (3 per layer) and
    every item computes inside one grid step, so each weight superblock
    streams from HBM once per BATCH instead of once per item — the
    B=2..8 latency regime's win (per-item streaming costs B x 162 MB).

    VMEM discipline: all B residual streams live in the output block
    ([B, Tp, D], constant index map — never flushed mid-kernel); the
    MLP is split into two HALF-HIDDEN phases (fc1/fc2 column- and
    row-chunk halves in one [D, 4D] superblock each:
    :func:`pack_encoder_weights_batchgrid`) so no [Tp, 4D] hidden ever
    persists across grid steps — only a [B, Tp, D] f32 partial-sum
    scratch (acc_ref) carries phase A's fc2 half into phase B, and the
    LN2 activations are recomputed there (VPU-cheap).  At ViT-B/16,
    B=4: 9 MB double-buffered weights + 1.2 o + 1.2 x + 2.4 acc
    ~= 14 MB < 16 MB VMEM; the serving wrapper chunks larger batches.
    """
    d = o_ref.shape[2]
    i = pl.program_id(0)
    phase = jax.lax.rem(i, 3)

    @pl.when(i == 0)
    def _init():
        o_ref[...] = x_ref[...]

    def _ln(x32):
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        return xn * s_ref[0, 0, :d] + s_ref[0, 1, :d]

    def _half_mlp(xn):
        """gelu(xn @ fc1half) @ fc2half — both halves of the step's
        superblock; returns the f32 [Tp, D] partial MLP output."""
        h = jax.lax.dot_general(
            xn.astype(o_ref.dtype), w_ref[0, :, :2 * d],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h + s_ref[0, 2, :2 * d], approximate=True)
        h = h.astype(o_ref.dtype)
        out = jax.lax.dot_general(
            h[:, :d], w_ref[0, :, 2 * d:3 * d],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return out + jax.lax.dot_general(
            h[:, d:], w_ref[0, :, 3 * d:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(phase == 0)
    def _attn():
        for bi in range(batch):
            o_ref[bi] = _attn_sublayer(
                o_ref[bi].astype(jnp.float32), w_ref[0], s_ref[0],
                num_heads=num_heads, valid_len=valid_len, eps=eps,
                out_dtype=o_ref.dtype)

    @pl.when(phase == 1)
    def _mlp_a():
        for bi in range(batch):
            xn = _ln(o_ref[bi].astype(jnp.float32))
            acc_ref[bi] = _half_mlp(xn).astype(acc_ref.dtype)

    @pl.when(phase == 2)
    def _mlp_b():
        for bi in range(batch):
            x = o_ref[bi].astype(jnp.float32)
            out = acc_ref[bi].astype(jnp.float32) + _half_mlp(_ln(x))
            o_ref[bi] = (x + out + s_ref[0, 3, :d]).astype(o_ref.dtype)


def pack_encoder_weights_batchgrid(vit_params, *, depth: int = 12,
                                   dtype=jnp.bfloat16):
    """Superblock packing for the batch-grid kernel: same
    ``(W [depth*3, D, 4D], S [depth*3, 4, 4D])`` shapes as
    :func:`pack_encoder_weights`, but the two MLP steps each carry HALF
    the layer's MLP — ``[fc1[:, half] | fc2[half rows as 2 D-chunks]]``
    — so the hidden activation never crosses a grid step.

    Step layout (h = hidden = 4D, halves a/b = columns ``:2D`` /
    ``2D:`` of fc1 and rows ``:2D`` / ``2D:`` of fc2):

    - 3l   (attn):  as :func:`pack_encoder_weights` phase 0
    - 3l+1 (mlp a): W = [fc1a | fc2[0:D,:] | fc2[D:2D,:]],
      S = [ln2 scale, ln2 bias, fc1 bias[:2D], 0]
    - 3l+2 (mlp b): W = [fc1b | fc2[2D:3D,:] | fc2[3D:,:]],
      S = [ln2 scale, ln2 bias, fc1 bias[2D:], fc2 bias]
    """
    d, hidden = _pack_geom(vit_params)
    ws, ss = [], []
    f32 = jnp.float32
    for i in range(depth):
        blk = vit_params[f"block{i}"]
        w0, s0 = _pack_attn_step(blk, d, hidden, dtype)
        ws.append(w0)
        ss.append(s0)
        fc1 = blk["mlp"]["fc1"]["kernel"].astype(dtype)
        fc1_b = blk["mlp"]["fc1"]["bias"].astype(f32)
        fc2 = blk["mlp"]["fc2"]["kernel"].astype(dtype)
        for half in range(2):
            lo = half * 2 * d
            ws.append(jnp.concatenate(
                [fc1[:, lo:lo + 2 * d],
                 fc2[lo:lo + d, :], fc2[lo + d:lo + 2 * d, :]], axis=1))
            sh = jnp.zeros((4, hidden), f32)
            sh = sh.at[0, :d].set(blk["norm2"]["scale"].astype(f32))
            sh = sh.at[1, :d].set(blk["norm2"]["bias"].astype(f32))
            sh = sh.at[2, :2 * d].set(fc1_b[lo:lo + 2 * d])
            if half:
                sh = sh.at[3, :d].set(blk["mlp"]["fc2"]["bias"].astype(f32))
            ss.append(sh)
    return jnp.stack(ws), jnp.stack(ss)


def encoder_forward_lowlat_batchgrid(xp, w_packed, s_packed, *,
                                     num_heads: int, valid_len: int,
                                     eps: float = 1e-6,
                                     interpret: bool = False):
    """[B, Tp, D] embedded stream -> encoder output, one pallas_call
    whose grid is (depth*3,) phases: every weight superblock streams
    once per BATCH (vs once per item in
    :func:`encoder_forward_lowlat`).  B <= 4 per call (VMEM budget —
    see the kernel docstring); the serving wrapper chunks bigger
    batches."""
    b, tp, d = xp.shape
    if b > 4:
        raise ValueError(f"batch-grid kernel holds <= 4 residual "
                         f"streams in VMEM (got {b}); chunk the batch")
    if w_packed.dtype == jnp.int8 or s_packed.shape[1] != 4:
        # fail actionably instead of a deep Mosaic dtype error: the
        # batch-grid kernel has no dequant path (weights already stream
        # once per chunk, so int8 targets the per-item regime only)
        raise ValueError(
            "batch-grid packs must be full-precision (got "
            f"{w_packed.dtype} / {s_packed.shape[1]} S rows) — int8 "
            "weight streaming is the per-item lowlat flavor "
            "(prepare_lowlat(int8_weights=True))")
    nsteps, _, hidden = w_packed.shape
    kernel = functools.partial(_encoder_batchgrid_kernel,
                               num_heads=num_heads, valid_len=valid_len,
                               eps=eps, batch=b)
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((b, tp, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tp, d), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), xp.dtype),
        scratch_shapes=[pltpu.VMEM((b, tp, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            # per layer per item: qkv (3D) + proj (D) + the two MLP
            # halves (2*hidden = 8D) GEMM columns — same accounting as
            # the per-item kernel — plus the [Tp, Tp] attention dots
            flops=2 * b * (nsteps // 3) * tp * d * (3 * d + d + 8 * d)
            + 4 * b * (nsteps // 3) * num_heads * tp * tp
            * (d // num_heads),
            bytes_accessed=nsteps * d * hidden * w_packed.dtype.itemsize,
            transcendentals=b * (nsteps // 3)
            * (num_heads * tp * tp + tp * hidden)),
        interpret=interpret,
    )(xp, w_packed, s_packed)


def _pack_geom(vit_params):
    """(d, hidden) of the encoder, validating the uniform-superblock
    invariant every lowlat pack relies on (3D+D == hidden)."""
    blk0 = vit_params["block0"]
    d = blk0["attn"]["qkv"]["kernel"].shape[0]
    hidden = blk0["mlp"]["fc1"]["kernel"].shape[1]
    if hidden != 4 * d:
        raise ValueError(
            f"lowlat packing needs mlp hidden == 4*embed ({hidden} != "
            f"4*{d}) — the uniform superblock relies on 3D+D == hidden")
    return d, hidden


def _pack_attn_step(blk, d, hidden, dtype):
    """Phase-0 superblock ``[wqkv | wproj]`` + its s block — identical
    in the per-item and batch-grid layouts (only the MLP steps differ)."""
    f32 = jnp.float32
    w = jnp.concatenate(
        [blk["attn"]["qkv"]["kernel"].astype(dtype),
         blk["attn"]["proj"]["kernel"].astype(dtype)], axis=1)
    s0 = jnp.zeros((4, hidden), f32)
    s0 = s0.at[0, :d].set(blk["norm1"]["scale"].astype(f32))
    s0 = s0.at[1, :d].set(blk["norm1"]["bias"].astype(f32))
    s0 = s0.at[2, :3 * d].set(blk["attn"]["qkv"]["bias"].astype(f32))
    s0 = s0.at[3, :d].set(blk["attn"]["proj"]["bias"].astype(f32))
    return w, s0


def pack_encoder_weights(vit_params, *, depth: int = 12,
                         dtype=jnp.bfloat16, weight_dtype=None):
    """Pack the per-layer encoder weights into the kernel's stacked
    superblocks: ``(W [depth*3, D, 4D] dtype, S [depth*3, 4, 4D] f32)``.

    Do this ONCE outside the serving jit (it is pure layout work); the
    packed arrays replace the per-layer tree for
    :func:`encoder_forward_lowlat`.

    ``weight_dtype=jnp.int8`` emits the weight-only-quantized stream for
    the B=1 latency regime: each superblock column (an output channel /
    fc2 (chunk, output) pair) gets an f32 scale ``max|w|/127`` stored as
    S row 4 (``S [depth*3, 5, 4D]``), and the kernel dequantizes the
    block in VMEM right before its dots.  Hardware verdict (BENCH_NOTES
    round 12, exp_r11): the B=1 weight-stream-floor hypothesis was
    REJECTED — int8 measures 0.467 ms/img vs 0.348-0.424 bf16 (the
    in-VMEM dequant pass costs more than the halved stream saves;
    Mosaic already overlaps the bf16 stream), and only edges bf16 at
    B=4 (0.254 vs 0.277).  Stays opt-in for memory-constrained
    deployments (score drift ~9e-4); bf16 is the latency default, like
    the earlier-rejected B=128 compute-bound int8 path (rounds 1-2)."""
    d, hidden = _pack_geom(vit_params)
    ws, ss = [], []
    f32 = jnp.float32
    for i in range(depth):
        blk = vit_params[f"block{i}"]
        w0, s0 = _pack_attn_step(blk, d, hidden, dtype)
        ws.append(w0)
        ss.append(s0)
        # phase 1: fc1
        ws.append(blk["mlp"]["fc1"]["kernel"].astype(dtype))
        s1 = jnp.zeros((4, hidden), f32)
        s1 = s1.at[0, :d].set(blk["norm2"]["scale"].astype(f32))
        s1 = s1.at[1, :d].set(blk["norm2"]["bias"].astype(f32))
        s1 = s1.at[2, :].set(blk["mlp"]["fc1"]["bias"].astype(f32))
        ss.append(s1)
        # phase 2: fc2 row-chunks packed side by side
        fc2 = blk["mlp"]["fc2"]["kernel"].astype(dtype)
        ws.append(jnp.concatenate(
            [fc2[c * d:(c + 1) * d, :] for c in range(hidden // d)],
            axis=1))
        s2 = jnp.zeros((4, hidden), f32)
        s2 = s2.at[0, :d].set(blk["mlp"]["fc2"]["bias"].astype(f32))
        ss.append(s2)
    W, S = jnp.stack(ws), jnp.stack(ss)
    if weight_dtype is None:
        return W, S
    if weight_dtype != jnp.int8:
        raise ValueError(f"weight_dtype must be int8 or None, got "
                         f"{weight_dtype}")
    Wf = W.astype(f32)
    scale = jnp.maximum(jnp.max(jnp.abs(Wf), axis=1),
                        jnp.float32(1e-12)) / 127.0    # [steps, 4D]
    q = jnp.clip(jnp.round(Wf / scale[:, None, :]), -127, 127
                 ).astype(jnp.int8)
    return q, jnp.concatenate([S, scale[:, None, :]], axis=1)


def pack_end_weights(params, *, dtype=jnp.bfloat16):
    """Pack the patch-embed stem + anti-spoof head into one small
    VMEM-resident weight block (+ s block + aux rows) for the fold-ends
    image->logits kernel.  Unlike the per-phase encoder superblocks
    (streamed once per image), these ride constant index maps and are
    fetched ONCE per kernel invocation.

    Layout (consumed by ``_encoder_kernel``'s phase-3/4 branches):

    - ``w_end[:, :D]``       = patch-embed kernel (needs patch_dim == D,
      true for ViT-B/16 where 16*16*3 == 768)
    - ``w_end[:, D:]``       = head fc1 kernel  (Hh = head hidden, 512)
    - ``s_end[0/1, :D]``     = vit.norm scale/bias
    - ``s_end[0/1, D:2D]``   = head.norm scale/bias
    - ``s_end[2, :Hh]``      = head fc1 bias
    - ``s_end[0/1, 2D:2D+Hh]`` = head fc2 columns 0/1
    - ``s_end[3, 0/1]``      = head fc2 bias 0/1
    - ``aux``: [Tp, D] f32 = pos_embed + embed bias (row 0 =
      cls_token + pos0; padding rows zero) — added to the embed GEMM
      output whose row 0 input is zeros.

    Returns ``(w_end [1,D,D+Hh] dtype, s_end [1,4,4D] f32,
    aux [1,Tp,D] f32)``.

    Raises ValueError when the model shapes cannot ride the layout
    (patch_dim != D, or 2D + Hh > 4D); callers fall back to the
    encoder-only kernel + XLA ends.
    """
    if "head" not in params:
        raise ValueError("fold-ends needs the anti-spoof head "
                         "(linear-head trees use the encoder-only kernel)")
    vit, head = params["vit"], params["head"]
    pe_k = vit["patch_embed"]["kernel"]
    patch_dim, d = pe_k.shape
    hidden = vit["block0"]["mlp"]["fc1"]["kernel"].shape[1]
    fc1_k = head["fc1"]["kernel"]
    hh = fc1_k.shape[1]
    fc2_k = head["fc2"]["kernel"]
    if patch_dim != d:
        raise ValueError(
            f"fold-ends needs patch_dim == embed_dim ({patch_dim} != {d})"
            " — the embed GEMM must share the head's resident block")
    if 2 * d + hh > hidden:
        raise ValueError(
            f"fold-ends needs 2*D + head_hidden <= 4*D "
            f"({2 * d} + {hh} > {hidden})")
    if fc2_k.shape[1] != 2:
        raise ValueError("fold-ends supports the 2-logit anti-spoof head")
    f32 = jnp.float32
    w_end = jnp.concatenate(
        [pe_k.astype(dtype), fc1_k.astype(dtype)], axis=1)
    s_end = jnp.zeros((4, hidden), f32)
    s_end = s_end.at[0, :d].set(vit["norm"]["scale"].astype(f32))
    s_end = s_end.at[1, :d].set(vit["norm"]["bias"].astype(f32))
    s_end = s_end.at[0, d:2 * d].set(head["norm"]["scale"].astype(f32))
    s_end = s_end.at[1, d:2 * d].set(head["norm"]["bias"].astype(f32))
    s_end = s_end.at[2, :hh].set(head["fc1"]["bias"].astype(f32))
    # fc2 weights round through the serving dtype first, mirroring
    # _cls_head_scores' kernel.astype(dtype) before its f32-accum dot
    s_end = s_end.at[0, 2 * d:2 * d + hh].set(
        fc2_k[:, 0].astype(dtype).astype(f32))
    s_end = s_end.at[1, 2 * d:2 * d + hh].set(
        fc2_k[:, 1].astype(dtype).astype(f32))
    s_end = s_end.at[3, :2].set(head["fc2"]["bias"].astype(f32))

    pos = vit["pos_embed"].astype(f32).reshape(-1, d)     # [T, D]
    t = pos.shape[0]
    tp = -(-t // 8) * 8
    aux = jnp.zeros((tp, d), f32)
    aux = aux.at[1:t].set(pos[1:] + vit["patch_embed"]["bias"].astype(f32))
    aux = aux.at[0].set(pos[0] + vit["cls_token"].astype(f32).reshape(d))
    return w_end[None], s_end[None], aux[None]


def forward_lowlat_e2e(xp, w_packed, s_packed, w_end, s_end, aux, *,
                       num_heads: int, eps: float = 1e-6,
                       head_eps: float = 1e-5, valid_len: int,
                       interpret: bool = False):
    """Patch rows [B, Tp, D] (row 0 zeros = CLS slot, tail rows zero
    padding) -> anti-spoof logits [B, 2]: patch-embed + all layers +
    final-LN + head as ONE pallas_call (grid = (B, depth*3 + 2)).

    ``w_packed``/``s_packed``: encoder packs
    (:func:`pack_encoder_weights`); ``w_end``/``s_end``/``aux``: the
    stem+head block (:func:`pack_end_weights`), VMEM-resident via
    constant index maps.  The encoder stream's index map CLIPS on the
    two end steps (step 0 prefetches layer 0's superblock, the head step
    re-addresses the last layer's) so folding the ends adds zero weight
    re-streaming."""
    b, tp, d = xp.shape
    nsteps, _, hidden = w_packed.shape   # encoder phase count (3*depth)
    depth = nsteps // 3
    hh = w_end.shape[2] - d
    kernel = functools.partial(_encoder_kernel, depth=depth,
                               num_heads=num_heads, valid_len=valid_len,
                               eps=eps, fold_ends=True, head_eps=head_eps,
                               head_hidden=hh)

    def _widx(bi, i):
        return (jnp.clip(i - 1, 0, nsteps - 1), 0, 0)

    _, logits = pl.pallas_call(
        kernel,
        grid=(b, nsteps + 2),
        in_specs=[
            pl.BlockSpec((1, tp, d), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, hidden), _widx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_packed.shape[1], hidden), _widx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d + hh), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, hidden), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, d), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tp, d), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, tp, d), xp.dtype),
                   jax.ShapeDtypeStruct((b, 8, 128), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tp, hidden), xp.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * depth * tp * d * (3 * d + d + 2 * hidden)
            + 4 * b * depth * num_heads * tp * tp * (d // num_heads)
            + 2 * b * tp * d * d,
            bytes_accessed=b * nsteps * d * hidden
            * w_packed.dtype.itemsize,
            transcendentals=b * depth * (num_heads * tp * tp + tp * hidden)),
        interpret=interpret,
    )(xp, w_packed, s_packed, w_end, s_end, aux)
    return logits[:, 0, :2]


def encoder_forward_lowlat(xp, w_packed, s_packed, *, num_heads: int,
                           valid_len: int, eps: float = 1e-6,
                           interpret: bool = False):
    """Padded residual stream [B, Tp, D] -> [B, Tp, D] through the whole
    packed encoder in ONE pallas_call (grid = (B, depth*3))."""
    b, tp, d = xp.shape
    steps, _, hidden = w_packed.shape
    depth = steps // 3
    kernel = functools.partial(_encoder_kernel, depth=depth,
                               num_heads=num_heads, valid_len=valid_len,
                               eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(b, steps),
        in_specs=[
            pl.BlockSpec((1, tp, d), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, hidden), lambda bi, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_packed.shape[1], hidden),
                         lambda bi, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, d), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), xp.dtype),
        scratch_shapes=[pltpu.VMEM((tp, hidden), xp.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * depth * tp * d * (3 * d + d + 2 * hidden)
            + 4 * b * depth * num_heads * tp * tp * (d // num_heads),
            bytes_accessed=b * steps * d * hidden * w_packed.dtype.itemsize,
            transcendentals=b * depth * (num_heads * tp * tp + tp * hidden)),
        interpret=interpret,
    )(xp, w_packed, s_packed)
