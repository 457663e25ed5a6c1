"""Round-4 part 2: the vertical (sublane-rotate) roll pass + bf16 I/O.

Part 1: horizontal per-pixel masked-roll pass in Pallas = 3.34 ms vs
46.9 ms XLA (14x, bit-exact) with 16-row tiles; fori_loop+traced rotate
does not lower.  Remaining questions for the production tower kernels:

  y-pass      rolls on the SUBLANE dim, lane-tiled blocks (1, 224, L)
  in-place    accumulate into o_ref per term (1 live intermediate)
  bf16 io     bf16 HBM arrays, f32 in-kernel (rotate is 32-bit only)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

B, H, W, C = 128, 224, 224, 3
WC = W * C
KMAX = 40           # the heavy tier's worst vertical bound (shear-y)
NK = 2 * KMAX + 1
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.random((B, H, WC), np.float32))
imgs_bf = imgs.astype(jnp.bfloat16)
f_small = rng.random((B, 8, 8)) * 60 - 30
field = np.repeat(np.repeat(f_small, 28, axis=1), 28, axis=2)
field = np.repeat(field, C, axis=2).astype(np.float32)
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


@jax.jit
def xla_pass_y(img, f):
    acc = jnp.zeros_like(img)
    for k in range(-KMAX, KMAX + 1):
        sel = jnp.maximum(0.0, 1.0 - jnp.abs(f - k)).astype(img.dtype)
        acc = acc + sel * jnp.roll(img, -k, axis=1)
    return acc


def kernel_y(img_ref, f_ref, o_ref):
    img = img_ref[0]
    f = f_ref[0]
    acc = jnp.zeros_like(img)
    for k in range(-KMAX, KMAX + 1):
        sel = jnp.maximum(0.0, 1.0 - jnp.abs(f - k)).astype(img.dtype)
        acc = acc + sel * pltpu.roll(img, (-k) % H, 0)
    o_ref[0] = acc


def kernel_y_inplace(img_ref, f_ref, o_ref):
    img = img_ref[0]
    f = f_ref[0]
    o_ref[0] = jnp.zeros_like(img)
    for k in range(-KMAX, KMAX + 1):
        sel = jnp.maximum(0.0, 1.0 - jnp.abs(f - k)).astype(img.dtype)
        o_ref[0] = o_ref[0] + sel * pltpu.roll(img, (-k) % H, 0)


def make_pass_y(kernel, lanes):
    @jax.jit
    def f(img, fld):
        return pl.pallas_call(
            kernel,
            grid=(B, WC // lanes),
            in_specs=[
                pl.BlockSpec((1, H, lanes), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, lanes), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, lanes), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, WC), img.dtype),
        )(img, fld)
    return f


def kernel_x_bf16(img_ref, f_ref, o_ref):
    img = img_ref[0].astype(jnp.float32)
    f = f_ref[0]
    acc = jnp.zeros_like(img)
    for k in range(-33, 34):
        sel = jnp.maximum(0.0, 1.0 - jnp.abs(f - k))
        acc = acc + sel * pltpu.roll(img, (-3 * k) % WC, 1)
    o_ref[0] = acc.astype(o_ref.dtype)


@jax.jit
def pallas_x_bf16(img, fld):
    return pl.pallas_call(
        kernel_x_bf16,
        grid=(B, H // 16),
        in_specs=[
            pl.BlockSpec((1, 16, WC), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, WC), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, WC), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, WC), jnp.bfloat16),
    )(img, fld)


want = np.asarray(xla_pass_y(imgs, field_j))
for name, fn in (
        ("y-pass unrolled lanes=128", make_pass_y(kernel_y, 128)),
        ("y-pass in-place lanes=128", make_pass_y(kernel_y_inplace, 128)),
        ("y-pass unrolled lanes=256", make_pass_y(kernel_y, 256)),
):
    try:
        t0 = time.perf_counter()
        got = np.asarray(fn(imgs, field_j))
        dt = time.perf_counter() - t0
        err = np.abs(got - want).max()
        print(f"{name}: compile+exec {dt:.1f} s, diff {err:.6f}, "
              f"{timed(fn, imgs, field_j):.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)

try:
    t0 = time.perf_counter()
    got = np.asarray(pallas_x_bf16(imgs_bf, field_j)).astype(np.float32)
    dt = time.perf_counter() - t0
    print(f"x-pass bf16 io: compile+exec {dt:.1f} s, "
          f"{timed(pallas_x_bf16, imgs_bf, field_j):.2f} ms", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"x-pass bf16 io: FAILED {str(e)[:200]}", flush=True)

print(f"xla y-pass ({NK} terms): {timed(xla_pass_y, imgs, field_j):.2f} ms",
      flush=True)
