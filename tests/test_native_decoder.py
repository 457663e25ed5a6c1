"""Native C++ decoder: builds, decodes JPEG/PNG, agrees with PIL within
resampling tolerance, survives corrupt input, and is faster than PIL."""

import time

import numpy as np
import pytest
from PIL import Image

from vit_spoof_detection_pda_tpu.data.native import get_lib, native_decode


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native decoder unavailable (no g++/libjpeg/libpng)")
    return lib


def _write_images(tmp_path, size=240):
    rng = np.random.default_rng(0)
    # smooth image so JPEG loss / resample differences stay small
    base = np.zeros((size, size, 3), np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base[..., 0] = yy
    base[..., 1] = xx
    base[..., 2] = 0.5 + 0.3 * np.sin(6 * yy) * np.cos(6 * xx)
    u8 = (np.clip(base, 0, 1) * 255).astype(np.uint8)
    jpg = tmp_path / "img.jpg"
    png = tmp_path / "img.png"
    Image.fromarray(u8).save(jpg, quality=95)
    Image.fromarray(u8).save(png)
    return jpg, png, u8


def test_jpeg_and_png_decode(lib, tmp_path):
    jpg, png, u8 = _write_images(tmp_path)
    for path in (jpg, png):
        out = native_decode(str(path), 224, "exact")
        assert out is not None and out.shape == (224, 224, 3)
        ref = np.asarray(Image.open(path).convert("RGB")
                         .resize((224, 224), Image.BILINEAR)).astype(int)
        diff = np.abs(out.astype(int) - ref)
        # PIL-exact triangle resampling: at 240->224 no DCT prescale
        # engages either, so BOTH formats decode bit-identically to PIL
        assert diff.max() == 0, (path.suffix, diff.max())


def test_png_resize_bit_identical_to_pil(lib, tmp_path):
    """The native resampler replicates Pillow's Resample.c fixed-point
    BILINEAR exactly — lossless sources must match bit-for-bit at any
    scale (down, up, identity, non-square)."""
    rng = np.random.default_rng(2)
    for i, (h, w) in enumerate([(300, 260), (224, 224), (100, 150),
                                (640, 480), (31, 57)]):
        u8 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"r{i}.png"
        Image.fromarray(u8).save(p)
        out = native_decode(str(p), 224, "exact")
        want = np.asarray(Image.fromarray(u8).resize((224, 224),
                                                     Image.BILINEAR))
        np.testing.assert_array_equal(out, want, err_msg=f"{h}x{w}")


def test_jpeg_prescale_drift_bounded(lib, tmp_path):
    """Large JPEGs decode through libjpeg's DCT-domain prescale (the
    perf win); the only remaining deviation from the PIL path.  Bound:
    mean <= 1.5 u8 levels, max <= 12 on textured natural-ish content."""
    rng = np.random.default_rng(3)
    base = (rng.random((30, 40, 3)) * 255).astype(np.uint8)
    img = np.asarray(Image.fromarray(base).resize((1200, 900),
                                                  Image.BILINEAR))
    img = np.clip(img.astype(np.int16)
                  + rng.integers(-20, 20, img.shape), 0, 255).astype(np.uint8)
    p = tmp_path / "big.jpg"
    Image.fromarray(img).save(p, quality=90)
    out = native_decode(str(p), 224, "exact")
    want = np.asarray(Image.open(p).convert("RGB")
                      .resize((224, 224), Image.BILINEAR)).astype(int)
    diff = np.abs(out.astype(int) - want)
    assert diff.mean() <= 1.5 and diff.max() <= 12, (diff.mean(),
                                                     diff.max())


def test_decoder_score_stability(lib, tmp_path):
    """Decode the same JPEGs via the native path and the PIL path, run
    both through eval preprocessing + a fixed model: the score delta
    from the DCT prescale must stay within the serving numerics noise
    (documented bound: 5e-3 absolute — an order below the fastserve
    path's own accepted bf16 drift of ~1e-2)."""
    import jax
    import jax.numpy as jnp

    import vit_spoof_detection_pda_tpu.data.native as natmod
    from vit_spoof_detection_pda_tpu.data.loader import decode_image
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.ops import image as I

    rng = np.random.default_rng(4)
    paths = []
    for i in range(6):
        base = (rng.random((25, 30, 3)) * 255).astype(np.uint8)
        img = np.asarray(Image.fromarray(base).resize((640, 520),
                                                      Image.BILINEAR))
        img = np.clip(img.astype(np.int16) + rng.integers(-25, 25,
                                                          img.shape),
                      0, 255).astype(np.uint8)
        p = tmp_path / f"s{i}.jpg"
        Image.fromarray(img).save(p, quality=90)
        paths.append(str(p))

    nat = np.stack([decode_image(p, 224, "exact") for p in paths])
    real = natmod.native_decode
    natmod.native_decode = lambda *a, **k: None   # force the PIL branch
    try:
        pil = np.stack([decode_image(p, 224, "exact") for p in paths])
    finally:
        natmod.native_decode = real
    assert not np.array_equal(nat, pil)   # prescale engaged (else vacuous)

    m = ViTAntiSpoof(embed_dim=64, depth=2, num_heads=2, hidden=16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def score(x):
        logits = m.apply(v, I.normalize(I.to_float(x)))
        return jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1]

    delta = np.abs(np.asarray(score(jnp.asarray(nat)))
                   - np.asarray(score(jnp.asarray(pil))))
    assert delta.max() < 5e-3, delta


def test_shorter_side_mode(lib, tmp_path):
    rng = np.random.default_rng(1)
    u8 = (rng.random((120, 200, 3)) * 255).astype(np.uint8)
    p = tmp_path / "rect.png"
    Image.fromarray(u8).save(p)
    out = native_decode(str(p), 96, "shorter")
    assert out is not None and out.shape == (96, 96, 3)


def test_corrupt_input_returns_none(lib, tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8garbagegarbage")
    assert native_decode(str(bad), 64) is None
    empty = tmp_path / "empty.png"
    empty.write_bytes(b"")
    assert native_decode(str(empty), 64) is None


def test_loader_integration_uses_native(lib, tmp_path):
    from vit_spoof_detection_pda_tpu.data.loader import decode_image
    jpg, _, _ = _write_images(tmp_path)
    out = decode_image(str(jpg), 128)
    assert out.shape == (128, 128, 3)
    assert out.any()


def test_native_faster_than_pil(lib, tmp_path):
    jpg, _, _ = _write_images(tmp_path, size=1024)

    def pil():
        im = Image.open(jpg).convert("RGB").resize((224, 224),
                                                   Image.BILINEAR)
        return np.asarray(im)

    native_decode(str(jpg), 224)    # warm cache
    pil()
    n = 20

    def best_of(fn, rounds=3):
        # min-of-rounds: robust to transient system load (this test
        # flaked once while a TPU measurement saturated the host)
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_native = best_of(lambda: native_decode(str(jpg), 224))
    t_pil = best_of(pil)
    # DCT prescale should beat full decode + resize comfortably
    assert t_native < t_pil, (t_native, t_pil)


def test_native_encode_jpeg_matches_pil_pixels(tmp_path):
    """The native libjpeg encoder's output decodes to the SAME pixels
    as a PIL encode at the same quality (both drive libjpeg with
    default settings), and the roundtrip error stays in the q95
    envelope."""
    import io

    from PIL import Image

    from vit_spoof_detection_pda_tpu.data.native import native_encode_jpeg

    rng = np.random.default_rng(3)
    # smooth gradient + noise: a JPEG-representative signal
    yy, xx = np.mgrid[0:64, 0:64]
    arr = np.stack([yy * 2, xx * 2, (yy + xx)], axis=-1)
    arr = np.clip(arr + rng.normal(0, 4, arr.shape), 0,
                  255).astype(np.uint8)

    data = native_encode_jpeg(arr, 95)
    if data is None:
        pytest.skip("native encoder unavailable (no g++/libjpeg)")
    back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"),
                      np.int32)
    # q95 + 4:2:0 chroma subsampling envelope: small mean error,
    # bounded worst pixel (sharp chroma edges can hit ~20)
    assert np.abs(back - arr).mean() <= 3.0
    assert np.abs(back - arr).max() <= 40

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    pil_back = np.asarray(Image.open(io.BytesIO(buf.getvalue()))
                          .convert("RGB"), np.int32)
    np.testing.assert_array_equal(back, pil_back)


def test_native_encode_jpeg_rejects_bad_input():
    from vit_spoof_detection_pda_tpu.data.native import native_encode_jpeg

    assert native_encode_jpeg(np.zeros((8, 8), np.uint8)) is None
    assert native_encode_jpeg(np.zeros((8, 8, 4), np.uint8)) is None
    assert native_encode_jpeg(np.zeros((8, 8, 3), np.float32)) is None


def test_materializer_write_jpeg_uses_native_path(tmp_path):
    """_write_jpeg (augment/engine.py) produces a decodable JPEG through
    the native fast path and still writes via PIL when the native
    module is unavailable."""
    from PIL import Image

    import vit_spoof_detection_pda_tpu.data.native as native
    from vit_spoof_detection_pda_tpu.augment.engine import _write_jpeg

    arr = np.full((32, 32, 3), 128, np.uint8)
    assert _write_jpeg(arr, tmp_path / "a.jpg", 95) == 1
    got = np.asarray(Image.open(tmp_path / "a.jpg").convert("RGB"))
    assert got.shape == (32, 32, 3)
    assert np.abs(got.astype(int) - 128).max() <= 3

    # force the PIL fallback
    old = native.native_encode_jpeg
    try:
        native.native_encode_jpeg = lambda *a, **k: None
        assert _write_jpeg(arr, tmp_path / "b.jpg", 95) == 1
    finally:
        native.native_encode_jpeg = old
    assert (tmp_path / "b.jpg").exists()
