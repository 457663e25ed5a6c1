"""AOT executable cache (utils/aot.py): compile-once / reload-fast."""

import numpy as np

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.utils.aot import cached_compile


def _fn(a, b):
    return jnp.tanh(a @ b).sum(axis=1)


def test_cached_compile_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)

    exe1 = cached_compile(_fn, (a, b), key="t", cache_dir=str(tmp_path))
    want = np.asarray(exe1(a, b))
    files = list(tmp_path.glob("t-*.jaxexec"))
    assert len(files) == 1

    # second call: loads the serialized executable (cache hit)
    exe2 = cached_compile(_fn, (a, b), key="t", cache_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(exe2(a, b)), want, atol=1e-6)

    # different shape -> different cache entry
    a2 = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    cached_compile(_fn, (a2, b), key="t", cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("t-*.jaxexec"))) == 2


def test_cached_compile_corrupt_entry_falls_back(tmp_path):
    a = jnp.ones((4, 4), jnp.float32)
    b = jnp.ones((4, 4), jnp.float32)
    exe = cached_compile(_fn, (a, b), key="c", cache_dir=str(tmp_path))
    want = np.asarray(exe(a, b))
    path = next(tmp_path.glob("c-*.jaxexec"))
    path.write_bytes(b"garbage")
    exe2 = cached_compile(_fn, (a, b), key="c", cache_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(exe2(a, b)), want, atol=1e-6)


def test_cached_compile_traces_dispatch_logic(tmp_path):
    """Cache hits must still run trace-time dispatch (the Pallas-path
    accounting bench.py asserts on) — a fresh fn object per process, as
    bench.py has, re-traces even on a cache hit."""
    from vit_spoof_detection_pda_tpu.ops import attention as att

    qkv = jnp.zeros((2, 8, 3 * 16), jnp.float32)

    def make_fn():
        def fn(x):
            with att.attention_sharding(interpret=True):
                return att.dispatch_attention_qkv(
                    x, 2, lambda q: q[..., :16])
        return fn

    cached_compile(make_fn(), (qkv,), key="d", cache_dir=str(tmp_path))
    before = att._context["pallas_calls"]
    cached_compile(make_fn(), (qkv,), key="d", cache_dir=str(tmp_path))
    assert att._context["pallas_calls"] > before
