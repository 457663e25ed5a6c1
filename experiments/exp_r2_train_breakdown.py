"""Where do the train step's 130 ms go?  (B=128, ViT-B/16, focal+AdamW)

fwd-only ~40 ms and total FLOPs say fwd+bwd should be ~3x fwd GEMM time
(~26 ms bwd at the 175 TFLOP/s the MLP GEMMs measure), yet the step costs
130 ms.  Measure the pieces:
  A. loss forward only
  B. jax.grad (fwd+bwd), no optimizer
  C. B + global-norm clip + AdamW update (the full step, no metrics)
  D. attention fwd kernel alone x12  /  E. attention bwd kernel alone x12
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import optax

from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.ops.attention import fused_attention_qkv

B = 128
module = ViTAntiSpoof(dtype=jnp.bfloat16)
variables = module.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))
params = variables["params"]
loss_fn = losses.make_loss_fn("focal")

rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((B, 224, 224, 3)), jnp.float32)
lab = jnp.asarray(np.arange(B) % 2, jnp.int32)

tx = optax.chain(optax.clip_by_global_norm(1.0),
                 optax.adamw(3e-4, weight_decay=0.05))
opt_state = tx.init(params)


def loss_of(p):
    logits = module.apply({"params": p}, img)
    return loss_fn(logits.astype(jnp.float32), lab)


@jax.jit
def fwd_only(p):
    return loss_of(p)


@jax.jit
def fwd_bwd(p):
    l, g = jax.value_and_grad(loss_of)(p)
    return l + sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in jax.tree.leaves(g)) * 0.0


@jax.jit
def full_step(p, o):
    l, g = jax.value_and_grad(loss_of)(p)
    updates, o = tx.update(g, o, p)
    p = optax.apply_updates(p, updates)
    return l, p, o


qkv = jnp.asarray(rng.standard_normal((B, 197, 3 * 768)) * 0.3,
                  jnp.bfloat16)


@jax.jit
def attn_fwd12(x):
    for _ in range(12):
        x = fused_attention_qkv(x, 12)
        x = jnp.concatenate([x, x, x], axis=-1) * 0.33   # keep [B,T,3D]
    return x.astype(jnp.float32).sum()


@jax.jit
def concat12(x):
    for _ in range(12):
        y = x[..., :768]
        x = jnp.concatenate([y, y, y], axis=-1) * 0.33
    return x.astype(jnp.float32).sum()


@jax.jit
def attn_bwd12(x):
    def f(y):
        out = y
        for _ in range(12):
            out = fused_attention_qkv(out, 12)
            out = jnp.concatenate([out, out, out], axis=-1) * 0.33
        return out.astype(jnp.float32).sum()
    return jax.grad(f)(x).astype(jnp.float32).sum()


def timed(f, *a, n1=10, n2=30):
    r = f(*a)
    jax.tree.map(lambda x: np.asarray(x[..., :1] if getattr(
        x, "ndim", 0) else x), jax.tree.leaves(r)[0])

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*a)
        first = jax.tree.leaves(o)[0]
        np.asarray(first if getattr(first, "ndim", 0) == 0
                   else first.ravel()[0])
        return time.perf_counter() - t0
    run(3)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


for name, f, a in [
        ("A fwd loss only", fwd_only, (params,)),
        ("B fwd+bwd", fwd_bwd, (params,)),
        ("D attn fwd x12", attn_fwd12, (qkv,)),
        ("D0 concat chain only", concat12, (qkv,)),
        ("E attn fwd+bwd x12", attn_bwd12, (qkv,)),
]:
    t = timed(f, *a)
    print(f"{name}: {t*1e3:7.1f} ms", flush=True)

# full step: time via state threading (donation semantics differ but fine)
float(full_step(params, opt_state)[0])
t0 = time.perf_counter()
p, o = params, opt_state
for _ in range(10):
    l, p, o = full_step(p, o)
float(l)
t1 = time.perf_counter()
for _ in range(30):
    l, p, o = full_step(p, o)
float(l)
t2 = time.perf_counter()
print(f"C full step: {((t2-t1)-(t1-t0))/20*1e3:7.1f} ms", flush=True)
