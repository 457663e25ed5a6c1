"""Round-4 part 2: decompose the 101.6 ms packed sampler.

Part 1 (exp_r4_augbreak.py) showed the sampler with PRECOMPUTED coords
costs 101.6 of the ~113 ms composed warp — the round-2 "16 ms gather
floor" was measured with compile-time-CONSTANT indices (exp_r2_warp.py
pure_take uses jnp.arange*7919%N), so the true dynamic-index batched
gather was never isolated.  This probe splits the sampler and tries
alternative gather formulations:

  pack-only         build the [HW, 4C] bf16 pack (no gather)
  take (vmap)       the shipped batched take, random precomputed indices
  take (flat)       ONE global take over a [B*HW, 4C] pack (no batching)
  take (u8)         uint8 taps (12B rows instead of 24B)
  interp-only       weights+select given pre-gathered taps
plus the photometric ops (f32 inputs, as the real chains feed them) and
the full-chain numbers that scrolled out of part 1's tail.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.augment.policy import CHAINS
from vit_spoof_detection_pda_tpu.ops import augment as A

B, H, Wd, C = 128, 224, 224, 3
HW = H * Wd
rng = np.random.default_rng(0)
imgs32 = jnp.asarray(rng.random((B, H, Wd, C), np.float32))
imgs = imgs32.astype(jnp.bfloat16)
key = jax.random.PRNGKey(0)
keys = jax.random.split(key, B)
# random-warp-like indices/weights (precomputed, dynamic at trace time)
idx_np = rng.integers(0, (H - 1) * (Wd - 1), (B, H, Wd), dtype=np.int32)
idx = jnp.asarray(idx_np)
wy = jnp.asarray(rng.random((B, H, Wd), np.float32))
wx = jnp.asarray(rng.random((B, H, Wd), np.float32))


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
    return (t2 - t1) / (n2 - n1) * 1000


def report(name, ms):
    print(f"{name:44s} {ms:8.2f} ms/batch  ({B / ms * 1000:6.0f} img/s)",
          flush=True)


def make_pack(img, dt):
    src = img.astype(dt)
    right = jnp.pad(src, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:]
    down = jnp.pad(src, ((0, 1), (0, 0), (0, 0)), mode="edge")[1:]
    diag = jnp.pad(right, ((0, 1), (0, 0), (0, 0)), mode="edge")[1:]
    return jnp.concatenate([src, right, down, diag],
                           axis=-1).reshape(HW, 4 * C)


# --- pack construction only -----------------------------------------------
pack_only = jax.jit(jax.vmap(lambda im: make_pack(im, jnp.bfloat16)))
report("pack-only (bf16)", timed(pack_only, imgs))

# --- gather formulations --------------------------------------------------
take_vmap = jax.jit(jax.vmap(
    lambda im, ix: jnp.take(make_pack(im, jnp.bfloat16),
                            ix.reshape(-1), axis=0)))
report("pack + take (vmap, shipped shape)", timed(take_vmap, imgs, idx))


@jax.jit
def take_flat(ims, ix):
    packs = jax.vmap(lambda im: make_pack(im, jnp.bfloat16))(ims)
    flat = packs.reshape(B * HW, 4 * C)
    off = (jnp.arange(B, dtype=jnp.int32) * HW)[:, None, None]
    gi = (ix + off).reshape(-1)
    return jnp.take(flat, gi, axis=0)


report("pack + take (ONE flat global take)", timed(take_flat, imgs, idx))

take_u8 = jax.jit(jax.vmap(
    lambda im, ix: jnp.take(
        make_pack((im.astype(jnp.float32) * 255).astype(jnp.uint8),
                  jnp.uint8),
        ix.reshape(-1), axis=0)))
report("pack + take (vmap, uint8 taps)", timed(take_u8, imgs, idx))

# gather only [HW] f32 single channel (field resample cost reference)
take_field = jax.jit(jax.vmap(
    lambda f, ix: jnp.take(f.reshape(-1), ix.reshape(-1), axis=0)))
report("take single-channel field", timed(take_field, wy, idx))

# --- interp only (taps pre-gathered) --------------------------------------
taps = take_vmap(imgs, idx)
taps = jnp.asarray(np.asarray(taps.astype(jnp.float32)), jnp.bfloat16)


@jax.jit
def interp_only(tp, wyv, wxv):
    def one(t, wyi, wxi):
        t = t.reshape(H, Wd, 4 * C)
        v00 = t[..., 0:C].astype(jnp.float32)
        v01 = t[..., C:2 * C].astype(jnp.float32)
        v10 = t[..., 2 * C:3 * C].astype(jnp.float32)
        v11 = t[..., 3 * C:4 * C].astype(jnp.float32)
        wyc = wyi[..., None]
        wxc = wxi[..., None]
        return ((v00 * (1 - wxc) + v01 * wxc) * (1 - wyc)
                + (v10 * (1 - wxc) + v11 * wxc) * wyc)
    return jax.vmap(one)(tp, wyv, wxv)


report("interp-only (given taps)", timed(interp_only, taps, wy, wx))

# --- photometric ops at the dtype the chains actually feed (f32) ----------
cj = jax.jit(jax.vmap(lambda k, im: A.color_jitter(
    k, im, 0.4, 0.4, 0.4, 0.2, p=0.8, order="fixed")))
report("color_jitter f32 (current)", timed(cj, keys, imgs32))

gb = jax.jit(jax.vmap(lambda k, im: A.gaussian_blur(
    k, im, 5, (0.1, 2.0), p=0.5)))
report("gaussian_blur 5x5 f32 (current conv)", timed(gb, keys, imgs32))

gn = jax.jit(jax.vmap(lambda k, im: A.gaussian_noise(
    k, im, std=0.05, p=0.3)))
report("gaussian_noise f32 (current)", timed(gn, keys, imgs32))

sh = jax.jit(jax.vmap(lambda k, im: A.random_sharpness(
    k, im, 2.0, p=0.3)))
report("sharpness f32 (current)", timed(sh, keys, imgs32))

# --- full chains (lost from part 1's tail) --------------------------------
for tier in ("heavy", "medium", "light"):
    chain = CHAINS[tier]()
    f = jax.jit(lambda k, b, ch=chain: A.apply_chain(k, b, ch))
    report(f"{tier} full chain (bf16 in)", timed(f, key, imgs))
