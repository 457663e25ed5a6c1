"""Round-4: can Mosaic swallow a per-pixel masked-roll scanline pass?

One horizontal pass of the warp tower (kmax=33 -> 68 static roll terms,
tent-function weights) as a Pallas kernel vs the XLA version of the
same pass.  Decides whether the full in-VMEM tower kernel (est. ~10 ms
vs ~40 ms XLA) is worth building: the risk is instruction-count blowup
from ~68 unrolled [224,672] vector ops.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

B, H, W, C = 128, 224, 224, 3
KMAX = 33
rng = np.random.default_rng(0)
# f32: Mosaic's lane rotate is 32-bit only ("Rotate with non-32-bit
# data" compile error on bf16 — probed this round)
imgs = jnp.asarray(rng.random((B, H, W * C), np.float32))
# smooth per-pixel shift field in [-20, 20], replicated over channels
f_small = rng.random((B, 8, 8)) * 40 - 20
field = np.repeat(np.repeat(f_small, 28, axis=1), 28, axis=2)
field = np.repeat(field, C, axis=2).astype(np.float32)     # [B, H, W*C]
field_j = jnp.asarray(field)


def timed(fn, *args, n1=10, n2=30):
    np.asarray(fn(*args)).ravel()[:1]

    def run(n):
        o = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        np.asarray(o).ravel()[:1]
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1) * 1000


# --- XLA version ----------------------------------------------------------


@jax.jit
def xla_pass(img, f):
    acc = jnp.zeros_like(img)
    for k in range(-KMAX, KMAX + 1):
        sel = jnp.maximum(0.0, 1.0 - jnp.abs(f - k)).astype(img.dtype)
        acc = acc + sel * jnp.roll(img, -3 * k, axis=2)
    return acc


# --- Pallas version -------------------------------------------------------


ROWS = 16   # row tile: the x-pass is row-local, so blocks need no halo


def kernel_unrolled(img_ref, f_ref, o_ref):
    img = img_ref[0]
    f = f_ref[0]
    acc = jnp.zeros_like(img)
    for k in range(-KMAX, KMAX + 1):
        sel = jnp.maximum(0.0, 1.0 - jnp.abs(f - k)).astype(img.dtype)
        acc = acc + sel * pltpu.roll(img, (-3 * k) % (W * C), 1)
    o_ref[0] = acc


def kernel_loop(img_ref, f_ref, o_ref):
    img = img_ref[0]
    f = f_ref[0]

    def body(i, acc):
        k = i - KMAX
        sel = (jnp.maximum(0.0, 1.0 - jnp.abs(f - k.astype(f.dtype)))
               .astype(img.dtype))
        return acc + sel * pltpu.roll(img, (-3 * k) % (W * C), 1)

    o_ref[0] = jax.lax.fori_loop(0, 2 * KMAX + 1, body,
                                 jnp.zeros_like(img))


def make_pass(kernel, rows):
    @jax.jit
    def f(img, fld):
        return pl.pallas_call(
            kernel,
            grid=(B, H // rows),
            in_specs=[
                pl.BlockSpec((1, rows, W * C), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, W * C), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, W * C), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W * C), img.dtype),
        )(img, fld)
    return f


out_x = np.asarray(xla_pass(imgs, field_j))
for name, fn in (("unrolled rows=16", make_pass(kernel_unrolled, ROWS)),
                 ("fori+dyn-rotate rows=224",
                  make_pass(kernel_loop, H))):
    try:
        t0 = time.perf_counter()
        out_p = np.asarray(fn(imgs, field_j))
        dt = time.perf_counter() - t0
        err = np.abs(out_p.astype(np.float32) - out_x).max()
        print(f"{name}: compile+exec {dt:.1f} s, max diff {err:.5f}, "
              f"{timed(fn, imgs, field_j):.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {str(e)[:300]}", flush=True)

print(f"xla 68-term pass: {timed(xla_pass, imgs, field_j):8.2f} ms",
      flush=True)
