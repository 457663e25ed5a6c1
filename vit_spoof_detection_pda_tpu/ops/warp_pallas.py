"""Pallas scanline resample for the warp tower.

The gather-free tower (ops/warp.py, ops/augment.py::composed_geometric)
runs each pass as a bounded family of masked static rolls.  In XLA every
roll term re-streams the image from HBM (~0.5-0.7 ms/term at
128x224x224x3), so a 68-term pass costs ~47 ms; this kernel keeps the
row tile VMEM-resident and runs the same accumulation as pure vector
ops: **3.34 ms for the same pass — 14x** (exp_r4_rolltower.py, v5e).
Output matched the XLA tower bit-for-bit on the measured batches, but
that is empirical, not guaranteed: the tent weight ``max(0, 1-|f-k|)``
for the upper tap can round one f32 ulp differently than the XLA
form's exact ``f - floor(f)`` when ``|f| < 0.5`` (Sterbenz fails), so
equality tests pin ~1e-6, not 0.

Constraints discovered probing Mosaic (exp_r4_rolltower*.py):
- lane rotate is 32-bit only ("Rotate with non-32-bit data" on bf16),
  so blocks compute in f32; bf16 I/O measured SLOWER (61 ms) than f32
  I/O (3.3) — the per-term upcast dominates;
- `pltpu.roll` with a traced shift does not lower (fori_loop variant
  fails), so the k-loop is a static Python unroll;
- whole-image blocks blow the VMEM scoped-allocation limit (20.7 MB >
  16 MB: Mosaic gives each unrolled roll a stack slot) — 16-row tiles
  keep the stack at ~2.9 MB;
- SUBLANE-dim rotates are 10x slower than lane rotates and returned
  wrong values at image scale, so vertical passes transpose to
  horizontal form instead (XLA transpose ~0.5 ms/batch round trip).

Weight formulation: the 2-tap lerp masks collapse to the tent function
``max(0, 1 - |shift - k|)`` — exactly `_resample_rows_field`'s
``(i0==k)(1-frac) + (i0==k-1)frac`` over the covered window.
Out-of-frame pixels are marked in the shift field with a sentinel far
outside the window, so no tent fires and the output zero-fills with no
in-kernel validity logic.

Augmentation runs outside the gradient path, so the kernel carries no
VJP; the XLA roll implementation remains the CPU/reference path and the
interpret-mode equality test pins the two together.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rows_for(h: int) -> int:
    """Row-tile size.  Callers pad h to a multiple of 16 first — a
    whole-image tile would blow the 16 MB VMEM scoped-allocation limit
    (one stack slot per unrolled roll term; see module docstring)."""
    assert h % 16 == 0, h
    return 16


def _pass_kernel(img_ref, f_ref, o_ref, *, kmax: int, chans: int,
                 width: int):
    img = img_ref[...]
    f = f_ref[...]
    acc = jnp.zeros_like(img)
    # k=kmax+1 dropped like the XLA form: |f| < kmax by caller
    # contract, so its tent weight is identically zero
    for k in range(-kmax, kmax + 1):
        sel = jnp.maximum(0.0, 1.0 - jnp.abs(f - k))
        acc = acc + sel * pltpu.roll(img, (-chans * k) % width, 1)
    o_ref[...] = acc


def resample_rows_field_pallas(img, shift, kmax: int, *,
                               interpret: bool = False):
    """Drop-in for :func:`ops.warp._resample_rows_field` on TPU:
    ``out[y, x] = img[y, x + shift[y, x]]`` (2-tap lerp, zero outside).

    img: [H, W, C] (any float dtype; computes f32), shift: [H, W] f32.
    """
    h, w, c = img.shape
    wc = w * c
    # the pass is row-local, so odd heights pad with garbage-free zero
    # rows (each tile computes independently) and slice back
    hp = -(-h // 16) * 16
    rows = _rows_for(hp)
    # out-of-frame -> sentinel far outside the k window: no tent fires,
    # the output row zero-fills (the XLA path's `valid` mask semantics)
    src = jnp.arange(w, dtype=shift.dtype)[None, :] + shift
    valid = (src >= 0.0) & (src <= w - 1)
    f = jnp.where(valid, shift, jnp.asarray(kmax + 4.0, shift.dtype))
    f3 = jnp.broadcast_to(f[..., None], (h, w, c)).reshape(h, wc)
    img2 = img.reshape(h, wc).astype(jnp.float32)
    if hp != h:
        img2 = jnp.pad(img2, ((0, hp - h), (0, 0)))
        f3 = jnp.pad(f3, ((0, hp - h), (0, 0)),
                     constant_values=kmax + 4.0)

    out = pl.pallas_call(
        functools.partial(_pass_kernel, kmax=kmax, chans=c, width=wc),
        grid=(hp // rows,),
        in_specs=[
            pl.BlockSpec((rows, wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, wc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wc), jnp.float32),
        interpret=interpret,
    )(img2, f3.astype(jnp.float32))
    return out[:h].reshape(h, w, c).astype(img.dtype)


def resample_cols_field_pallas(img, shift, kmax: int, *,
                               interpret: bool = False):
    """Vertical pass ``out[y, x] = img[y + shift[y, x], x]`` — sublane
    rotates are slow/broken in Mosaic, so this transposes to horizontal
    form, runs the row kernel, and transposes back."""
    out = resample_rows_field_pallas(
        img.transpose(1, 0, 2), shift.T, kmax, interpret=interpret)
    return out.transpose(1, 0, 2)


