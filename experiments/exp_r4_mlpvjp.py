"""Round-4: the one untried train-step lever (VERDICT r2 item 4) —
recompute-free fused MLP VJP.

Hypothesis under test: storing the [rows, 3072] hidden activation for
the backward costs ~300 MB/layer of HBM residual traffic that a
store-only-LN-xhat VJP (backward recomputes the hidden with one extra
roofline GEMM) would save.

Counter-hypothesis (round-2 breakdown): the non-attention backward
already sits at the measured 175 TFLOP/s GEMM roofline, i.e. the
residual traffic is fully OVERLAPPED with MXU compute and the recompute
GEMM is pure loss.

Variants, 12-layer MLP chain at production shape (B=128, T=200 rows,
D=768, hidden 3072, bf16 compute / f32 accum), fwd-only and fwd+bwd:

  autodiff      plain jax.grad over the chain (the shipped path)
  remat         jax.checkpoint per layer (recompute EVERYTHING)
  xhat_vjp      custom VJP saving only (x, xhat); backward recomputes
                xn (elementwise) and hidden (one GEMM) per layer
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

B, T, D, HID, L = 128, 200, 768, 3072, 12
DT = jnp.bfloat16
EPS = 1e-6

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((B, T, D)), DT)
params = []
for i in range(L):
    r = np.random.default_rng(i)
    params.append(dict(
        lns=jnp.asarray(r.standard_normal(D) * 0.02 + 1.0, jnp.float32),
        lnb=jnp.asarray(r.standard_normal(D) * 0.02, jnp.float32),
        w1=jnp.asarray(r.standard_normal((D, HID)) * 0.02, DT),
        b1=jnp.asarray(r.standard_normal(HID) * 0.02, jnp.float32),
        w2=jnp.asarray(r.standard_normal((HID, D)) * 0.02, DT),
        b2=jnp.asarray(r.standard_normal(D) * 0.02, jnp.float32),
    ))


def _ln(x, s, b):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    xh = (x32 - mu) * jax.lax.rsqrt(var + EPS)
    return xh, xh * s + b


def mlp_layer(x, p):
    _, yn = _ln(x, p["lns"], p["lnb"])
    yn = yn.astype(DT)
    h = (jnp.dot(yn, p["w1"], preferred_element_type=jnp.float32)
         + p["b1"]).astype(DT)
    a = jax.nn.gelu(h, approximate=False)
    out = (jnp.dot(a, p["w2"], preferred_element_type=jnp.float32)
           + p["b2"])
    return (x.astype(jnp.float32) + out).astype(DT)


# --- custom VJP: save only (x, xhat); recompute hidden in backward --------


@jax.custom_vjp
def mlp_layer_xhat(x, lns, lnb, w1, b1, w2, b2):
    return mlp_layer(x, dict(lns=lns, lnb=lnb, w1=w1, b1=b1, w2=w2,
                             b2=b2))


def _fwd(x, lns, lnb, w1, b1, w2, b2):
    xh, yn = _ln(x, lns, lnb)
    yn = yn.astype(DT)
    h = (jnp.dot(yn, w1, preferred_element_type=jnp.float32) + b1).astype(DT)
    a = jax.nn.gelu(h, approximate=False)
    out = (jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2)
    y = (x.astype(jnp.float32) + out).astype(DT)
    return y, (x, xh.astype(DT), lns, lnb, w1, b1, w2)


def _bwd(res, g):
    x, xh, lns, lnb, w1, b1, w2 = res
    g32 = g.astype(jnp.float32)
    xh32 = xh.astype(jnp.float32)
    xn = (xh32 * lns + lnb).astype(DT)
    # recompute hidden: the traded GEMM
    h = (jnp.dot(xn, w1, preferred_element_type=jnp.float32) + b1).astype(DT)
    a = jax.nn.gelu(h, approximate=False)
    da = jnp.dot(g.astype(DT), w2.T, preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(
        a.reshape(-1, HID), g32.reshape(-1, D).astype(DT),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db2 = jnp.sum(g32, axis=(0, 1))
    h32 = h.astype(jnp.float32)
    cdf = 0.5 * (1 + jax.lax.erf(h32 / np.sqrt(2.0)))
    pdf = jnp.exp(-0.5 * h32 * h32) / np.sqrt(2 * np.pi)
    dh = (da * (cdf + h32 * pdf)).astype(DT)
    dw1 = jax.lax.dot_general(
        xn.reshape(-1, D), dh.reshape(-1, HID), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=(0, 1))
    dxn = jnp.dot(dh, w1.T, preferred_element_type=jnp.float32)
    dlns = jnp.sum(dxn * xh32, axis=(0, 1))
    dlnb = jnp.sum(dxn, axis=(0, 1))
    dxh = dxn * lns
    x32 = x.astype(jnp.float32)
    var = jnp.var(x32, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + EPS)
    dx_ln = inv * (dxh - jnp.mean(dxh, axis=-1, keepdims=True)
                   - xh32 * jnp.mean(dxh * xh32, axis=-1, keepdims=True))
    dx = (g32 + dx_ln).astype(DT)
    return (dx, dlns, dlnb, dw1.astype(DT), db1, dw2.astype(DT), db2)


mlp_layer_xhat.defvjp(_fwd, _bwd)


def chain(variant):
    def f(x, ps):
        for p in ps:
            if variant == "autodiff":
                x = mlp_layer(x, p)
            elif variant == "remat":
                x = jax.checkpoint(mlp_layer)(x, p)
            else:
                x = mlp_layer_xhat(x, p["lns"], p["lnb"], p["w1"],
                                   p["b1"], p["w2"], p["b2"])
        return jnp.sum(x.astype(jnp.float32))
    return f


def timed(fn, *args, n1=10, n2=30):
    jax.tree.leaves(fn(*args))[0].block_until_ready()
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


# numeric parity check first (CPU-cheap shapes would differ; do it on
# device with the real shapes, tolerance bf16)
g_auto = jax.jit(jax.grad(chain("autodiff"), argnums=(0, 1)))
g_xhat = jax.jit(jax.grad(chain("xhat_vjp"), argnums=(0, 1)))
ga = g_auto(x0, params)
gx = g_xhat(x0, params)
err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
          for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gx)))
print(f"grad max-abs-diff xhat_vjp vs autodiff: {err:.3e}", flush=True)

for variant in ("autodiff", "remat", "xhat_vjp"):
    fwd = jax.jit(chain(variant))
    grad = jax.jit(jax.grad(chain(variant), argnums=(0, 1)))
    t_f = timed(fwd, x0, params)
    t_g = timed(grad, x0, params)
    print(f"{variant:10s} fwd {t_f:7.2f} ms   fwd+bwd {t_g:7.2f} ms",
          flush=True)
