"""Round-4: photometric op costs after the tower (heavy chain still
carries ~15-25 ms of blur/noise/jitter).  Candidate: the separable
gaussian blur as BANDED MATMULS (per-sample kernel built from sigma,
reflect padding folded into static accumulation matrices) instead of a
vmapped grouped conv.  High-n timing to beat relay noise."""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.ops import augment as A

B, H, W, C = 128, 224, 224, 3
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.random((B, H, W, C), np.float32), jnp.bfloat16)
key = jax.random.PRNGKey(0)
keys = jax.random.split(key, B)


def timed(fn, *args, n1=20, n2=60):
    np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]

    def run(n):
        o = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]
        return time.perf_counter() - t0

    run(5)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1) * 1000


def report(name, ms):
    print(f"{name:46s} {ms:8.2f} ms/batch", flush=True)


def banded_matrices(ks, h):
    """E[t] with E[t][i, reflect(i + t - pad)] += 1 (reflect-101)."""
    pad = ks // 2
    e = np.zeros((ks, h, h), np.float32)
    for t in range(ks):
        for i in range(h):
            j = i + t - pad
            if j < 0:
                j = -j
            elif j >= h:
                j = 2 * h - 2 - j
            e[t, i, j] += 1.0
    return e


for ks, hi in ((5, 2.0), (3, 1.5)):
    E = jnp.asarray(banded_matrices(ks, H), jnp.bfloat16)

    def blur_mm(k, im, ks=ks, hi=hi, E=E):
        ksig, kg = jax.random.split(k)
        sigma = jax.random.uniform(ksig, (), minval=0.1, maxval=hi)
        kern = A._gaussian_kernel1d(ks, sigma, jnp.bfloat16)
        Kb = jnp.einsum("t,tij->ij", kern, E)
        out = jnp.einsum("ij,jxc->ixc", Kb, im)
        out = jnp.einsum("ij,yjc->yic", Kb, out)
        return jnp.where(jax.random.bernoulli(kg, 0.5), out, im)

    cur = jax.jit(jax.vmap(lambda k, im, ks=ks, hi=hi: A.gaussian_blur(
        k, im, ks, (0.1, hi), p=0.5)))
    mm = jax.jit(jax.vmap(blur_mm))
    report(f"gaussian_blur {ks}x{ks} (current conv)",
           timed(cur, keys, imgs))
    report(f"gaussian_blur {ks}x{ks} (banded matmul)",
           timed(mm, keys, imgs))

gn = jax.jit(jax.vmap(lambda k, im: A.gaussian_noise(
    k, im, std=0.05, p=0.3)))
report("gaussian_noise (current)", timed(gn, keys, imgs))

cj = jax.jit(jax.vmap(lambda k, im: A.color_jitter(
    k, im, 0.4, 0.4, 0.4, 0.2, p=0.8, order="fixed")))
report("color_jitter fixed (current)", timed(cj, keys, imgs))

sh = jax.jit(jax.vmap(lambda k, im: A.random_sharpness(
    k, im, 2.0, p=0.3)))
report("sharpness (current)", timed(sh, keys, imgs))
