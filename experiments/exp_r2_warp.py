"""Round-2: can the train-time geometric warp beat the packed gather?

The train-time chain's geometry (hflip + rotation + crop) is AFFINE, so
it admits a Paeth 3-shear decomposition: R = ShX(a) . ShY(b) . ShX(a),
each pass a 1-D fractional resample along one axis.  Variants timed at
B=128, 224x224x3 (per-sample random angles):

  packed      shipped bilinear_sample_packed warp        (baseline)
  pure_take   the packed gather alone, no weight math    (floor)
  shear_gather 3x take_along_axis 2-tap resamples
  shear_roll  3x masked static-roll accumulation (no gather at all)
plus per-op timings of the remaining chain stages (crop/jitter/erase).

Correctness: PSNR of each variant vs the direct affine warp on the
interior (3-shear is a different resampling; expect high-but-not-inf).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.ops import augment as A
from vit_spoof_detection_pda_tpu.ops import warp as W

B, H, Wd, C = 128, 224, 224, 3


def timed(fn, *args, n1=10, n2=30):
    np.asarray(fn(*args)).ravel()[:1]

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(o).ravel()[:1]
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


# ---------------------------------------------------------------------------
# 1-D fractional resamples
# ---------------------------------------------------------------------------


def _resample_rows(img, shifts):
    """out[y, x] = in[y, x + shifts[y]] via 2-tap take_along_axis."""
    h, w, c = img.shape
    src = jnp.arange(w, dtype=jnp.float32)[None, :] + shifts[:, None]
    i0 = jnp.floor(src).astype(jnp.int32)
    f = (src - i0)[..., None]
    valid = ((src >= -1.0) & (src <= w))[..., None]
    a = jnp.take_along_axis(img, jnp.clip(i0, 0, w - 1)[..., None], axis=1)
    b = jnp.take_along_axis(img, jnp.clip(i0 + 1, 0, w - 1)[..., None],
                            axis=1)
    return jnp.where(valid, a * (1 - f) + b * f, 0.0)


def _resample_cols(img, shifts):
    """out[y, x] = in[y + shifts[x], x]."""
    h, w, c = img.shape
    src = jnp.arange(h, dtype=jnp.float32)[:, None] + shifts[None, :]
    i0 = jnp.floor(src).astype(jnp.int32)
    f = (src - i0)[..., None]
    valid = ((src >= -1.0) & (src <= h))[..., None]
    a = jnp.take_along_axis(img, jnp.clip(i0, 0, h - 1)[..., None], axis=0)
    b = jnp.take_along_axis(img, jnp.clip(i0 + 1, 0, h - 1)[..., None],
                            axis=0)
    return jnp.where(valid, a * (1 - f) + b * f, 0.0)


def _resample_rows_roll(img, shifts, kmax):
    """Same as _resample_rows but via masked STATIC rolls (no gather).
    shifts must satisfy |shifts| <= kmax."""
    h, w, c = img.shape
    i0 = jnp.floor(shifts).astype(jnp.int32)            # [h]
    f = (shifts - i0)[:, None, None]
    acc = jnp.zeros_like(img)
    for k in range(-kmax, kmax + 2):
        sel = ((i0 == k).astype(img.dtype) * (1 - f[:, 0, 0])
               + (i0 == k - 1).astype(img.dtype) * f[:, 0, 0])
        acc = acc + sel[:, None, None] * jnp.roll(img, -k, axis=1)
    src = jnp.arange(w, dtype=jnp.float32)[None, :] + shifts[:, None]
    valid = ((src >= 0.0) & (src <= w - 1))[..., None]
    return jnp.where(valid, acc, 0.0)


def _resample_cols_roll(img, shifts, kmax):
    h, w, c = img.shape
    i0 = jnp.floor(shifts).astype(jnp.int32)            # [w]
    f = shifts - i0                                     # [w]
    acc = jnp.zeros_like(img)
    for k in range(-kmax, kmax + 2):
        sel = ((i0 == k).astype(img.dtype) * (1 - f)
               + (i0 == k - 1).astype(img.dtype) * f)   # [w]
        acc = acc + sel[None, :, None] * jnp.roll(img, -k, axis=0)
    src = jnp.arange(h, dtype=jnp.float32)[:, None] + shifts[None, :]
    valid = ((src >= 0.0) & (src <= h - 1))[..., None]
    return jnp.where(valid, acc, 0.0)


def _shear_shifts(theta, h, w):
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    return a * ys, b * xs, a * ys


def rotate_3shear_gather(img, theta):
    s1, s2, s3 = _shear_shifts(theta, img.shape[0], img.shape[1])
    out = _resample_rows(img, s1)
    out = _resample_cols(out, s2)
    return _resample_rows(out, s3)


def rotate_3shear_roll(img, theta, kx=12, ky=22):
    s1, s2, s3 = _shear_shifts(theta, img.shape[0], img.shape[1])
    out = _resample_rows_roll(img, s1, kx)
    out = _resample_cols_roll(out, s2, ky)
    return _resample_rows_roll(out, s3, kx)


def main():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, Wd, C)), jnp.float32)
    thetas = jnp.asarray(rng.uniform(-10, 10, B) * np.pi / 180, jnp.float32)

    # baseline: direct affine warp through the shipped packed sampler
    @jax.jit
    def packed(x, th):
        def one(img, t):
            m = W.rotation_matrix(t, (H - 1) / 2, (Wd - 1) / 2)
            ys, xs = W._dest_grid(H, Wd)
            sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
            sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
            return W.bilinear_sample_packed(img, sy, sx,
                                            tap_dtype=jnp.bfloat16)
        return jax.vmap(one)(x, th)

    # the gather alone (same index/packing work, no interp math)
    @jax.jit
    def pure_take(x, th):
        def one(img, t):
            src = img.astype(jnp.bfloat16)
            pack = jnp.concatenate([src, src, src, src],
                                   axis=-1).reshape(H * Wd, 4 * C)
            idx = (jnp.arange(H * Wd) * 7919) % (H * Wd)  # scattered
            return jnp.take(pack, idx, axis=0)
        return jax.vmap(one)(x, th)

    @jax.jit
    def shear_gather(x, th):
        return jax.vmap(rotate_3shear_gather)(x, th)

    @jax.jit
    def shear_roll(x, th):
        return jax.vmap(rotate_3shear_roll)(x, th)

    ref = np.asarray(packed(imgs, thetas))
    for name, fn in [("packed", packed), ("pure_take", pure_take),
                     ("shear_gather", shear_gather),
                     ("shear_roll", shear_roll)]:
        try:
            t = timed(fn, imgs, thetas)
            msg = f"{name}: {t*1e3:.1f} ms  {B/t:.0f} img/s"
            if name.startswith("shear"):
                got = np.asarray(fn(imgs, thetas))
                m = 30  # interior (borders differ by fill handling)
                d = (got - ref)[:, m:-m, m:-m]
                psnr = 10 * np.log10(1.0 / np.mean(d ** 2))
                msg += f"  interior PSNR vs direct: {psnr:.1f} dB"
            print(msg, flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # ---- the rest of the train-time chain, per op -------------------------
    key = jax.random.PRNGKey(0)
    big = jnp.asarray(rng.random((B, 256, 256, C)), jnp.float32)

    def chain_op(fn):
        @jax.jit
        def run(k, x):
            ks = jax.random.split(k, x.shape[0])
            return jax.vmap(fn)(ks, x)
        return run

    ops = {
        "crop256->224": (chain_op(lambda k, im: A.random_crop(k, im, 224)),
                         big),
        "color_jitter": (chain_op(lambda k, im: A.color_jitter(
            k, im, 0.2, 0.2, 0.2, 0.1, p=1.0)), imgs),
        "random_erase": (chain_op(lambda k, im: A.random_erasing(
            k, im, p=0.25)), imgs),
    }
    for name, (fn, x) in ops.items():
        try:
            t = timed(fn, key, x)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
