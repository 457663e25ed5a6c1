"""Round-4: where do the heavy/medium tiers' ~120 ms/batch actually go?

VERDICT r2: only ~16 ms of the fused heavy step's aug cost is the
measured gather floor; the rest (interp math, blur, elastic field gen in
XLA) is unexamined headroom.  This experiment times every component of
the heavy tier at production shape (B=128, 224^2, bf16 aug policy) plus
prototypes of the candidate fixes:

  - elastic field at LOW resolution (56^2 noise+blur, MXU upsample)
  - photometric blurs as banded MATMULS instead of vmapped grouped convs
  - the packed gather+interp with precomputed coords (isolates sampling)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.augment.policy import CHAINS
from vit_spoof_detection_pda_tpu.ops import augment as A
from vit_spoof_detection_pda_tpu.ops import warp as W

B, H, Wd, C = 128, 224, 224, 3
DT = jnp.bfloat16
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.random((B, H, Wd, C), np.float32), DT)
key = jax.random.PRNGKey(0)
keys = jax.random.split(key, B)


def timed(fn, *args, n1=10, n2=30):
    np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]

    def run(n):
        o = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1) * 1000  # ms


results = {}


def report(name, ms):
    results[name] = ms
    print(f"{name:42s} {ms:8.2f} ms/batch  ({B / ms * 1000:6.0f} img/s)",
          flush=True)


# --- A. full chains (baseline) --------------------------------------------
for tier in ("heavy", "medium"):
    chain = CHAINS[tier]()
    f = jax.jit(lambda k, b, ch=chain: A.apply_chain(k, b, ch))
    report(f"{tier} full chain", timed(f, key, imgs))

# --- B. composed_geometric alone ------------------------------------------
geo_heavy = jax.jit(jax.vmap(lambda k, im: A.composed_geometric(
    k, im, hflip_p=0.5, rotation=(20.0, 0.7), perspective=(0.2, 0.4),
    elastic=(1.0, 32.0, 63, 0.3))))
report("heavy composed_geometric", timed(geo_heavy, keys, imgs))

geo_medium = jax.jit(jax.vmap(lambda k, im: A.composed_geometric(
    k, im, hflip_p=0.5, rotation=(15.0, 0.6), perspective=(0.15, 0.3))))
report("medium composed_geometric", timed(geo_medium, keys, imgs))

# --- C. coords only (no sampling) -----------------------------------------


def heavy_coords(k, im):
    h, w = im.shape[0], im.shape[1]
    kf, kr_gate, kr, kp_gate, kp, ke_gate, ke = jax.random.split(k, 7)
    ys, xs = W._dest_grid(h, w)
    alpha, sigma, ksize, p = (1.0, 32.0, 63, 0.3)
    kex, key_ = jax.random.split(ke)
    nx = jax.random.uniform(kex, (h, w), im.dtype, -1.0, 1.0)
    ny = jax.random.uniform(key_, (h, w), im.dtype, -1.0, 1.0)
    kern = A._gaussian_kernel1d(ksize, sigma, im.dtype)
    dx = A._separable_blur2d(nx[..., None], kern)[..., 0] * alpha * (w / 2)
    dy = A._separable_blur2d(ny[..., None], kern)[..., 0] * alpha * (h / 2)
    gate = jax.random.bernoulli(ke_gate, p).astype(im.dtype)
    xs = xs + dx * gate
    ys = ys + dy * gate
    scale, p = (0.2, 0.4)
    off = jax.random.uniform(kp, (4, 2))
    dst = jnp.asarray([[0.0, 0.0], [w - 1.0, 0.0],
                       [w - 1.0, h - 1.0], [0.0, h - 1.0]])
    inward = jnp.asarray([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0],
                          [1.0, -1.0]])
    src = dst + off * jnp.asarray([scale * (w - 1) / 2,
                                   scale * (h - 1) / 2]) * inward
    hm = W.homography_from_points(src, dst)
    eye = jnp.eye(3, dtype=hm.dtype)
    hm = jnp.where(jax.random.bernoulli(kp_gate, p), hm, eye)
    den = hm[2, 0] * xs + hm[2, 1] * ys + hm[2, 2]
    den = jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)
    xs, ys = ((hm[0, 0] * xs + hm[0, 1] * ys + hm[0, 2]) / den,
              (hm[1, 0] * xs + hm[1, 1] * ys + hm[1, 2]) / den)
    angle = jax.random.uniform(kr, (), minval=-20.0, maxval=20.0)
    angle = angle * jax.random.bernoulli(kr_gate, 0.7)
    m = W.rotation_matrix(jnp.deg2rad(angle), (h - 1) / 2, (w - 1) / 2)
    xs, ys = (m[0, 0] * xs + m[0, 1] * ys + m[0, 2],
              m[1, 0] * xs + m[1, 1] * ys + m[1, 2])
    do_flip = jax.random.bernoulli(kf, 0.5)
    xs = jnp.where(do_flip, (w - 1.0) - xs, xs)
    return ys, xs


coords_fn = jax.jit(jax.vmap(heavy_coords))
report("heavy coords only", timed(coords_fn, keys, imgs))

# --- D. elastic field gen alone (full res, current) -----------------------


def elastic_field(k, im):
    kex, key_ = jax.random.split(k)
    nx = jax.random.uniform(kex, (H, Wd), im.dtype, -1.0, 1.0)
    ny = jax.random.uniform(key_, (H, Wd), im.dtype, -1.0, 1.0)
    kern = A._gaussian_kernel1d(63, 32.0, im.dtype)
    dx = A._separable_blur2d(nx[..., None], kern)[..., 0]
    dy = A._separable_blur2d(ny[..., None], kern)[..., 0]
    return dx, dy


report("elastic field full-res (2x 63-tap conv)",
       timed(jax.jit(jax.vmap(elastic_field)), keys, imgs))

# --- E. elastic field low-res prototype -----------------------------------
HL = 56
FACTOR = H // HL


def _up_matrix(n_hi, n_lo):
    """[n_hi, n_lo] linear-interp upsample (half-pixel centers, edge
    clamp)."""
    src = (np.arange(n_hi) + 0.5) * n_lo / n_hi - 0.5
    i0 = np.clip(np.floor(src).astype(int), 0, n_lo - 2)
    f = np.clip(src - i0, 0.0, 1.0)
    up = np.zeros((n_hi, n_lo), np.float32)
    up[np.arange(n_hi), i0] = 1 - f
    up[np.arange(n_hi), i0 + 1] = f
    return jnp.asarray(up, DT)


UP = _up_matrix(H, HL)


def elastic_field_lowres(k, im):
    kex, key_ = jax.random.split(k)
    nx = jax.random.uniform(kex, (HL, HL), im.dtype, -1.0, 1.0)
    ny = jax.random.uniform(key_, (HL, HL), im.dtype, -1.0, 1.0)
    kern = A._gaussian_kernel1d(17, 32.0 / FACTOR, im.dtype)
    dx = A._separable_blur2d(nx[..., None], kern)[..., 0] / FACTOR
    dy = A._separable_blur2d(ny[..., None], kern)[..., 0] / FACTOR
    # MXU upsample: [224,56] @ [56,56] @ [56,224]
    dx = UP @ dx @ UP.T
    dy = UP @ dy @ UP.T
    return dx, dy


report("elastic field low-res 56 + MXU upsample",
       timed(jax.jit(jax.vmap(elastic_field_lowres)), keys, imgs))

# amplitude check (host, one batch)
dxf, _ = jax.jit(jax.vmap(elastic_field))(keys, imgs)
dxl, _ = jax.jit(jax.vmap(elastic_field_lowres))(keys, imgs)
print(f"field std full={np.asarray(dxf, np.float32).std():.5f} "
      f"low={np.asarray(dxl, np.float32).std():.5f}", flush=True)

# --- F. sampling alone (precomputed coords) -------------------------------
ys_pre, xs_pre = coords_fn(keys, imgs)
ys_pre, xs_pre = (jnp.asarray(np.asarray(ys_pre, np.float32)),
                  jnp.asarray(np.asarray(xs_pre, np.float32)))
samp = jax.jit(jax.vmap(lambda im, ys, xs: W.bilinear_sample_packed(
    im, ys, xs, tap_dtype=jnp.bfloat16)))
report("packed sampler (precomputed coords)",
       timed(samp, imgs, ys_pre, xs_pre))

# --- G. photometric ops, current impls ------------------------------------
cj = jax.jit(jax.vmap(lambda k, im: A.color_jitter(
    k, im, 0.4, 0.4, 0.4, 0.2, p=0.8, order="fixed")))
report("color_jitter (current)", timed(cj, keys, imgs))

gb = jax.jit(jax.vmap(lambda k, im: A.gaussian_blur(
    k, im, 5, (0.1, 2.0), p=0.5)))
report("gaussian_blur 5x5 (current conv)", timed(gb, keys, imgs))

gn = jax.jit(jax.vmap(lambda k, im: A.gaussian_noise(
    k, im, std=0.05, p=0.3)))
report("gaussian_noise (current)", timed(gn, keys, imgs))

sh = jax.jit(jax.vmap(lambda k, im: A.random_sharpness(
    k, im, 2.0, p=0.3)))
report("sharpness (current)", timed(sh, keys, imgs))

# --- H. blur as banded matmul prototype -----------------------------------
KS, PAD = 5, 2
# reflect-101 banded accumulation matrices E[t] (static)
E = np.zeros((KS, H, H), np.float32)
for t in range(KS):
    for i in range(H):
        j = i + t - PAD
        if j < 0:
            j = -j
        elif j >= H:
            j = 2 * H - 2 - j
        E[t, i, j] += 1.0
E = jnp.asarray(E, DT)


def blur_matmul(k, im):
    ksig, kg = jax.random.split(k)
    sigma = jax.random.uniform(ksig, (), minval=0.1, maxval=2.0)
    kern = A._gaussian_kernel1d(KS, sigma, DT)
    Kb = jnp.einsum("t,tij->ij", kern, E)
    out = jnp.einsum("ij,jxc->ixc", Kb, im)
    out = jnp.einsum("ij,yjc->yic", Kb, out)
    return jnp.where(jax.random.bernoulli(kg, 0.5), out, im)


report("gaussian_blur 5x5 (banded matmul)",
       timed(jax.jit(jax.vmap(blur_matmul)), keys, imgs))

print("\nRESULTS", {k: round(v, 1) for k, v in results.items()})
