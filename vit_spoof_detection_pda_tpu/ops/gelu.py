"""GELU with a lean VJP: store only the pre-activation.

``jax.nn.gelu``'s autodiff saves the input, the erf/tanh gate, AND the
output over the transformer MLP's [B, T, 4D] hidden — the round-20
XProf trace showed the fc1 forward fusion writing three
bf16[128,197,3072] tensors (444 MB/layer) per ViT-B/16 layer.
``gelu_lean`` saves one tensor and recomputes the gate in the backward
(elementwise VPU work that fuses into the cotangent chain; the
recompute stays in the caller's compute dtype per the round-4 lesson).

Measured verdict (v5e, B=128, BENCH_NOTES round 20): step-time NEUTRAL
(the residual writes were overlapped behind MXU work) but the stored
residual set shrinks ~1.8 GB/step — B=256 fits in the default autodiff
mode where it previously OOM'd.  Gradients are f32-bit-exact vs
``jax.nn.gelu`` (same formula, different residuals);
tests/test_fasttrain.py::test_gelu_lean_matches_plain_gelu.
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gelu_lean(x, approximate: bool = False):
    return jax.nn.gelu(x, approximate=approximate)


def _gelu_lean_fwd(x, approximate):
    return jax.nn.gelu(x, approximate=approximate), x


def _gelu_lean_bwd(approximate, x, g):
    _, vjp = jax.vjp(lambda t: jax.nn.gelu(t, approximate=approximate), x)
    return (vjp(g)[0],)


gelu_lean.defvjp(_gelu_lean_fwd, _gelu_lean_bwd)
