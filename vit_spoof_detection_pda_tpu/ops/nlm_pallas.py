"""Pallas fast-NLM denoise kernel.

The XLA formulation (ops/nlm.py) unrolls (2r+1)^2 offsets, each streaming
several full-image intermediates through HBM.  This kernel keeps the
image, its padded copy, and the accumulators resident in VMEM across the
whole offset sweep: grid = (batch, offsets), outputs accumulate across
the offset grid dimension, HBM sees one read of the input and one write
of the result per image.

TPU lowering constraints shaped the design (each alternative was tried
and failed to compile via Mosaic):

- pixel-granularity dynamic slices (`pl.ds`) and `pltpu.roll` with
  traced shifts don't lower on the tiled (sublane/lane) dims, and
  image-sized fori_loop carries made Mosaic materialize every
  iteration (134 MB VMEM OOM) — so the offset loop is a GRID dim and
  every shift is a ONE-HOT MATMUL (built from broadcasted_iota
  comparisons against the traced offset, contracted on the MXU);
- `cumsum` doesn't lower — the patch box filter is two banded matmuls
  whose band matrices carry edge-clamp multiplicities.

Layout is NCHW inside the kernel (W on lanes, H on sublanes); the
wrapper transposes from/to NHWC.  Shift matmuls run at MXU bf16-ish
precision (~3e-3 relative) — invisible after the uint8 quantization this
preprocessing feeds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_matrix(n: int, radius: int):
    """[n, n] matrix B with B[i, j] = multiplicity of source j in the
    edge-clamped window [i-r, i+r] — B @ x is the 1D box SUM with the
    XLA implementation's edge-padding semantics."""
    idx = jnp.arange(n)
    b = ((idx[None, :] >= idx[:, None] - radius) &
         (idx[None, :] <= idx[:, None] + radius)).astype(jnp.float32)
    under = jnp.maximum(radius - idx, 0).astype(jnp.float32)
    over = jnp.maximum(idx + radius - (n - 1), 0).astype(jnp.float32)
    b = b.at[:, 0].add(under)
    b = b.at[:, n - 1].add(over)
    return b


def _nlm_kernel(img_ref, pad_ref, by_ref, bx_ref, acc_ref, wsum_ref, *,
                hh: int, ww: int, cc: int, search_radius: int,
                inv_h2: float, two_sigma2: float, patch_norm: float):
    j = pl.program_id(1)
    r = search_radius
    hp, wp = hh + 2 * r, ww + 2 * r
    dy = j // (2 * r + 1)
    dx = j % (2 * r + 1)

    # one-hot shift matrices from the traced offset (VPU compares)
    row = jax.lax.broadcasted_iota(jnp.int32, (hh, hp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hh, hp), 1)
    sy = (col == row + dy).astype(jnp.float32)           # [H, Hp]
    row2 = jax.lax.broadcasted_iota(jnp.int32, (ww, wp), 0)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (ww, wp), 1)
    sx = (col2 == row2 + dx).astype(jnp.float32)         # [W, Wp]

    diff2 = jnp.zeros((hh, ww), jnp.float32)
    shifted = []
    for c in range(cc):
        t = jnp.dot(sy, pad_ref[0, c], preferred_element_type=jnp.float32)
        s = jax.lax.dot_general(t, sx, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        shifted.append(s)
        diff2 = diff2 + (img_ref[0, c] - s) ** 2

    # patch box sum as banded matmuls: By @ diff2 @ Bx^T
    d2 = jnp.dot(by_ref[:], diff2, preferred_element_type=jnp.float32)
    d2 = jax.lax.dot_general(d2, bx_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    w = jnp.exp(-jnp.maximum(d2 * patch_norm - two_sigma2, 0.0) * inv_h2)

    @pl.when(j == 0)
    def _():
        for c in range(cc):
            acc_ref[0, c] = w * shifted[c]
        wsum_ref[0] = w

    @pl.when(j != 0)
    def _():
        for c in range(cc):
            acc_ref[0, c] = acc_ref[0, c] + w * shifted[c]
        wsum_ref[0] = wsum_ref[0] + w


def nlm_denoise_pallas(img, *, h: float = 0.1, sigma: float = 0.04,
                       search_radius: int = 5, patch_radius: int = 1,
                       interpret: bool = False):
    """NHWC or HWC float [0,1] -> denoised; same weighting as ops/nlm.py
    (edge-clamped neighbors)."""
    single = img.ndim == 3
    if single:
        img = img[None]
    b, hh, ww, cc = img.shape
    r = search_radius
    x = jnp.transpose(img.astype(jnp.float32), (0, 3, 1, 2))  # NCHW
    padded = jnp.pad(x, ((0, 0), (0, 0), (r, r), (r, r)), mode="edge")
    patch_n = (2 * patch_radius + 1) ** 2
    by = _band_matrix(hh, patch_radius)
    bx = _band_matrix(ww, patch_radius)
    kernel = functools.partial(
        _nlm_kernel, hh=hh, ww=ww, cc=cc, search_radius=r,
        inv_h2=1.0 / (h * h), two_sigma2=2.0 * sigma * sigma,
        patch_norm=1.0 / (patch_n * cc))
    n_off = (2 * r + 1) ** 2
    acc, wsum = pl.pallas_call(
        kernel,
        grid=(b, n_off),
        in_specs=[
            pl.BlockSpec((1, cc, hh, ww), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc, hh + 2 * r, ww + 2 * r),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hh, hh), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ww, ww), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cc, hh, ww), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hh, ww), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, cc, hh, ww), jnp.float32),
            jax.ShapeDtypeStruct((b, hh, ww), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_off * b * cc * hh * ww * (hh + ww) * 2,
            bytes_accessed=2 * b * hh * ww * cc * 4,
            transcendentals=n_off * b * hh * ww),
        interpret=interpret,
    )(x, padded, by, bx)
    out = acc / jnp.maximum(wsum[:, None], 1e-12)
    out = jnp.transpose(out, (0, 2, 3, 1)).astype(img.dtype)
    return out[0] if single else out
