"""Bilinear resampling core shared by the geometric augmentations.

The reference gets these from Kornia's grid_sample-based ops
(augment_data.py:60-85: RandomRotation / RandomPerspective /
RandomElasticTransform).  Here one gather-based bilinear sampler backs
rotation, perspective and elastic warps; everything is static-shape and
differentiable, vmappable over the batch dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img, ys, xs, fill: float = 0.0):
    """Sample HWC `img` at float coords (ys, xs), bilinear, zero-fill
    outside (grid_sample(padding_mode='zeros') semantics, Kornia default).

    ys/xs: float arrays of any (matching) shape, in pixel coordinates.
    Returns array of shape ys.shape + (C,).
    """
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[yc, xc]                       # gather -> [..., C]
        return jnp.where(valid[..., None], vals, fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_sample_packed(img, ys, xs, *, tap_dtype=None, fill: float = 0.0):
    """Bilinear sampling with all four taps packed into ONE gather.

    The naive sampler issues four [H,W]-indexed gathers of 3 floats each —
    the dominant cost of every geometric augmentation on TPU (measured
    254 ms per 128x224x224 warp).  Packing (pixel, right, down, diag)
    into a [H*W, 4C] array makes each gathered row 4x wider and cuts the
    gather count to one (155 ms in f32, 113 ms with bf16 taps).

    `tap_dtype=jnp.bfloat16` halves gather bandwidth; tap values then
    carry ~3 decimal digits — indistinguishable after the uint8/JPEG
    quantization the augmented images land in.  Interpolation weights
    stay f32.  Out-of-bounds pixels fill with `fill`; coords within one
    pixel of the frame edge-clamp rather than partial-coverage fade (the
    naive per-tap sampler fades to fill there) — values always stay in
    the source range, never extrapolated.
    """
    h, w = img.shape[0], img.shape[1]
    c = img.shape[2]
    src = img.astype(tap_dtype) if tap_dtype is not None else img
    right = jnp.pad(src, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:]
    down = jnp.pad(src, ((0, 1), (0, 0), (0, 0)), mode="edge")[1:]
    diag = jnp.pad(right, ((0, 1), (0, 0), (0, 0)), mode="edge")[1:]
    pack = jnp.concatenate([src, right, down, diag],
                           axis=-1).reshape(h * w, 4 * c)

    valid = ((ys >= -1.0) & (ys <= h - 0.0) &
             (xs >= -1.0) & (xs <= w - 0.0))[..., None]
    y0i = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
    x0i = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
    # weights relative to the CLIPPED base so edge pixels pick the right
    # tap (e.g. x = w-1 -> base w-2, wx = 1 -> the 'right' tap); CLAMPED
    # to [0,1] so coords within 1px outside the frame edge-clamp instead
    # of linearly extrapolating out of the value range
    wy = jnp.clip(ys - y0i, 0.0, 1.0)[..., None]
    wx = jnp.clip(xs - x0i, 0.0, 1.0)[..., None]
    taps = jnp.take(pack, y0i * w + x0i, axis=0)
    v00 = taps[..., 0:c].astype(jnp.float32)
    v01 = taps[..., c:2 * c].astype(jnp.float32)
    v10 = taps[..., 2 * c:3 * c].astype(jnp.float32)
    v11 = taps[..., 3 * c:4 * c].astype(jnp.float32)
    out = ((v00 * (1 - wx) + v01 * wx) * (1 - wy) +
           (v10 * (1 - wx) + v11 * wx) * wy)
    return jnp.where(valid, out, fill)


def _use_pallas_rolls() -> bool:
    """Dispatch the roll resamplers to the Pallas scanline kernel.

    Requires a TPU backend AND a single-device execution context: the
    augmenter runs INSIDE the pjit'd train step (batch_prep), and GSPMD
    cannot partition a pallas_call — on a multi-device mesh (detected
    via the attention_sharding trace context the Trainer enters, or the
    raw device count when no context is set) the XLA roll form compiles
    under GSPMD instead."""
    if jax.default_backend() != "tpu":
        return False
    from .attention import _context
    mesh = _context["mesh"]
    if mesh is not None:
        return mesh.devices.size == 1
    return jax.device_count() == 1


def _resample_rows_roll(img, shifts, kmax: int):
    """Per-ROW fractional x-resample:
    ``out[y, x] = in[y, x + shifts[y]]`` built from masked STATIC rolls.

    TPU gathers are the most expensive primitive in the augmentation
    stack (254 ms per 128x224 warp); a bounded family of static rolls +
    per-row select compiles to pure vector ops (the whole 3-shear
    rotation lands at ~19 ms/batch, round-2 measurement).  ``kmax`` is a
    static bound with |shifts| <= kmax; out-of-frame sources fill 0.

    Thin wrapper over :func:`_resample_rows_field` (the [h] shift
    vector broadcasts to the [h, w] field) — ONE copy of the subtle
    masked-roll accumulation, not four.
    """
    h, w, _ = img.shape
    return _resample_rows_field(
        img, jnp.broadcast_to(shifts[:, None], (h, w)), kmax)


def _resample_cols_roll(img, shifts, kmax: int):
    """As :func:`_resample_rows_roll` but along y with a per-COLUMN
    shift: ``out[y, x] = in[y + shifts[x], x]`` (thin wrapper over
    :func:`_resample_cols_field`)."""
    h, w, _ = img.shape
    return _resample_cols_field(
        img, jnp.broadcast_to(shifts[None, :], (h, w)), kmax)


def _resample_rows_field(img, shift, kmax: int):
    """Per-PIXEL fractional x-resample via masked static rolls:
    ``out[y, x] = in[y, x + shift[y, x]]``, zero-fill outside the frame.

    The 2-D generalization of :func:`_resample_rows_roll` (whose masks
    are per-row vectors): `shift` is a full [h, w] field, |shift| <=
    kmax (callers clamp).  Still gather-free — TPU dynamic gathers cost
    ~100 ms/128-batch (exp_r4_augbreak.py) while the roll family is
    pure vector ops.  On TPU the accumulation runs as a Pallas kernel
    with the row tile VMEM-resident (14x the XLA rolls; within one f32
    ulp — tent-weight rounding, see ops/warp_pallas.py); this XLA form
    is the CPU/reference path."""
    if _use_pallas_rolls():
        from .warp_pallas import resample_rows_field_pallas
        return resample_rows_field_pallas(
            img, shift.astype(jnp.float32), kmax)
    h, w, _ = img.shape
    i0 = jnp.floor(shift).astype(jnp.int32)             # [h, w]
    f = (shift - i0).astype(img.dtype)
    acc = jnp.zeros_like(img)
    # terms up to kmax suffice: callers bound shift < kmax
    # (clip to kmax-1e-3 / shear kmax-1 by construction), so
    # i0 <= kmax-1 and the k=kmax+1 weight is identically 0 —
    # one full-image roll+FMA of dead work per pass otherwise
    for k in range(-kmax, kmax + 1):
        sel = ((i0 == k).astype(img.dtype) * (1 - f)
               + (i0 == k - 1).astype(img.dtype) * f)   # [h, w]
        acc = acc + sel[..., None] * jnp.roll(img, -k, axis=1)
    src = jnp.arange(w, dtype=shift.dtype)[None, :] + shift
    valid = ((src >= 0.0) & (src <= w - 1))[..., None]
    return jnp.where(valid, acc, 0.0)


def _resample_cols_field(img, shift, kmax: int):
    """As :func:`_resample_rows_field` but along y:
    ``out[y, x] = in[y + shift[y, x], x]``."""
    if _use_pallas_rolls():
        from .warp_pallas import resample_cols_field_pallas
        return resample_cols_field_pallas(
            img, shift.astype(jnp.float32), kmax)
    h, w, _ = img.shape
    i0 = jnp.floor(shift).astype(jnp.int32)
    f = (shift - i0).astype(img.dtype)
    acc = jnp.zeros_like(img)
    # terms up to kmax suffice: callers bound shift < kmax
    # (clip to kmax-1e-3 / shear kmax-1 by construction), so
    # i0 <= kmax-1 and the k=kmax+1 weight is identically 0 —
    # one full-image roll+FMA of dead work per pass otherwise
    for k in range(-kmax, kmax + 1):
        sel = ((i0 == k).astype(img.dtype) * (1 - f)
               + (i0 == k - 1).astype(img.dtype) * f)
        acc = acc + sel[..., None] * jnp.roll(img, -k, axis=0)
    src = jnp.arange(h, dtype=shift.dtype)[:, None] + shift
    valid = ((src >= 0.0) & (src <= h - 1))[..., None]
    return jnp.where(valid, acc, 0.0)


def perspective_shift_fields(hm, h: int, w: int):
    """Shift fields for the EXACT two-pass (Catmull-Smith) decomposition
    of the inverse homography `hm` (dest -> src, 3x3).

    Pass 1 (horizontal): ``tmp[t, x] = src[t, x + fh[t, x]]`` with
    ``fh(t, x) = sx(x, y*(x, t)) - x`` where ``y*`` analytically inverts
    ``sy(x, .) = t`` along y — rational in (x, t), no iteration:
    for H = [[a,b,c],[d,e,f],[g,h2,i]], sy = (dx+ey+f)/(gx+h2y+i) = t
    gives ``y* = ((i t - f) + x (g t - d)) / (e - h2 t)``.
    Pass 2 (vertical): ``out[y, x] = tmp[y + fv[y, x], x]`` with
    ``fv = sy(x, y) - y``.

    The two scanline passes each sample the true source row at its own
    correct x — coordinate-exact (only the interpolation order differs
    from a single bilinear resample)."""
    ys, xs = _dest_grid(h, w)
    a, b, c = hm[0, 0], hm[0, 1], hm[0, 2]
    d, e, f = hm[1, 0], hm[1, 1], hm[1, 2]
    g, h2, i = hm[2, 0], hm[2, 1], hm[2, 2]
    t = ys
    den1 = e - h2 * t
    den1 = jnp.where(jnp.abs(den1) < 1e-6,
                     jnp.where(den1 < 0, -1e-6, 1e-6), den1)
    ystar = ((i * t - f) + xs * (g * t - d)) / den1
    den2 = g * xs + h2 * ystar + i
    den2 = jnp.where(jnp.abs(den2) < 1e-8,
                     jnp.where(den2 < 0, -1e-8, 1e-8), den2)
    fh = (a * xs + b * ystar + c) / den2 - xs
    den3 = g * xs + h2 * ys + i
    den3 = jnp.where(jnp.abs(den3) < 1e-8,
                     jnp.where(den3 < 0, -1e-8, 1e-8), den3)
    fv = (d * xs + e * ys + f) / den3 - ys
    return fh, fv


def perspective_warp_2pass(img, hm, kmax: int = 32):
    """Gather-free perspective warp: exact two-pass scanline resampling
    (fields from :func:`perspective_shift_fields`, each pass masked
    static rolls).  `kmax` statically bounds |shift| — fields clamp to
    it, so homographies must keep displacements under kmax (distortion
    0.2 tier peaks at ~28 px on 224^2)."""
    h, w = img.shape[0], img.shape[1]
    fh, fv = perspective_shift_fields(hm, h, w)
    lim = float(kmax) - 1e-3
    out = _resample_rows_field(img, jnp.clip(fh, -lim, lim), kmax)
    return _resample_cols_field(out, jnp.clip(fv, -lim, lim), kmax)


def displacement_warp_2pass(img, dy, dx, kmax: int = 8):
    """Gather-free elastic warp: vertical then horizontal scanline pass.
    Two-pass error is ``dx * d(dy)/dx`` — for sigma-32-smooth fields of
    ~1 px amplitude that is <0.1 px, far under interpolation noise.
    Fields clamp to the static roll bound (P(|field| > 8 px) ~ 1e-11
    for the reference's alpha=1/sigma=32 tier)."""
    lim = float(kmax) - 1e-3
    out = _resample_cols_field(img, jnp.clip(dy, -lim, lim), kmax)
    return _resample_rows_field(out, jnp.clip(dx, -lim, lim), kmax)


def rotate_3shear(img, theta, max_degrees: float):
    """Rotation about the image center via the Paeth 3-shear
    decomposition R(t) = ShX(-tan t/2) . ShY(sin t) . ShX(-tan t/2),
    each shear a gather-free masked-roll resample.

    ``max_degrees`` is the STATIC bound on |theta| (in degrees) that
    sizes the roll families.  Quality: three chained linear interps
    instead of one bilinear sample — the classic scanline rotation
    (Paeth '86), visually equivalent for small angles; zero fill outside
    the frame like grid_sample(padding_mode='zeros').
    """
    import math as _math

    h, w = img.shape[0], img.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rad = _math.radians(max_degrees)
    kx = int(_math.ceil(_math.tan(rad / 2.0) * max(cy, 1.0))) + 1
    ky = int(_math.ceil(_math.sin(rad) * max(cx, 1.0))) + 1

    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    out = _resample_rows_roll(img, a * ys, kx)
    out = _resample_cols_roll(out, b * xs, ky)
    return _resample_rows_roll(out, a * ys, kx)


def _dest_grid(h, w, dtype=jnp.float32):
    ys = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xs = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    return ys, xs


def affine_warp(img, matrix, fill: float = 0.0):
    """Warp HWC `img` by the inverse affine `matrix` (2x3, maps DEST pixel
    coords -> SRC pixel coords).  Rotation-about-center etc. are expressed
    by the caller via the matrix."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = _dest_grid(h, w)
    sx = matrix[0, 0] * xs + matrix[0, 1] * ys + matrix[0, 2]
    sy = matrix[1, 0] * xs + matrix[1, 1] * ys + matrix[1, 2]
    return bilinear_sample(img, sy, sx, fill)


def rotation_matrix(angle_rad, center_y, center_x):
    """Inverse-mapping matrix for rotation by `angle_rad` about center.

    Matches torchvision/Kornia rotate: positive angle = counter-clockwise
    rotation of the image content; the inverse map rotates dest coords by
    +angle to find src coords.
    """
    c = jnp.cos(angle_rad)
    s = jnp.sin(angle_rad)
    # dest->src: translate to center, rotate by +angle, translate back
    m00, m01 = c, -s
    m10, m11 = s, c
    tx = center_x - m00 * center_x - m01 * center_y
    ty = center_y - m10 * center_x - m11 * center_y
    return jnp.array([[m00, m01, tx], [m10, m11, ty]])


def perspective_warp(img, homography, fill: float = 0.0):
    """Warp HWC `img` by inverse 3x3 homography (dest -> src)."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = _dest_grid(h, w)
    d = homography[2, 0] * xs + homography[2, 1] * ys + homography[2, 2]
    d = jnp.where(jnp.abs(d) < 1e-8, 1e-8, d)
    sx = (homography[0, 0] * xs + homography[0, 1] * ys + homography[0, 2]) / d
    sy = (homography[1, 0] * xs + homography[1, 1] * ys + homography[1, 2]) / d
    return bilinear_sample(img, sy, sx, fill)


def displacement_warp(img, dy, dx, fill: float = 0.0):
    """Warp by per-pixel displacement fields (elastic transform core):
    src = dest + (dy, dx)."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = _dest_grid(h, w)
    return bilinear_sample(img, ys + dy, xs + dx, fill)


def homography_from_points(src_pts, dst_pts):
    """Solve the 3x3 homography mapping 4 `dst_pts` -> 4 `src_pts`
    (each [4,2] as (x, y)).  Used by random perspective: sample displaced
    corners, then build the dest->src map.  Solved as the standard 8x8
    DLT linear system."""
    rows = []
    rhs = []
    for i in range(4):
        xd, yd = dst_pts[i, 0], dst_pts[i, 1]
        xs_, ys_ = src_pts[i, 0], src_pts[i, 1]
        rows.append(jnp.stack([xd, yd, jnp.ones_like(xd), jnp.zeros_like(xd),
                               jnp.zeros_like(xd), jnp.zeros_like(xd),
                               -xd * xs_, -yd * xs_]))
        rhs.append(xs_)
        rows.append(jnp.stack([jnp.zeros_like(xd), jnp.zeros_like(xd),
                               jnp.zeros_like(xd), xd, yd, jnp.ones_like(xd),
                               -xd * ys_, -yd * ys_]))
        rhs.append(ys_)
    a = jnp.stack(rows)
    b = jnp.stack(rhs)
    sol = jnp.linalg.solve(a, b)
    return jnp.concatenate([sol, jnp.ones((1,), sol.dtype)]).reshape(3, 3)
