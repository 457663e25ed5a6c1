"""Portable serving artifacts (models/artifact.py): jax.export
round-trip, symbolic batch, the raw-bytes weight codec, and the
TPU-Pallas export path (lowering only — execution needs a chip)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.eval.runner import make_infer_fn
from vit_spoof_detection_pda_tpu.models import artifact as A
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof


def _tiny():
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                     hidden=16)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return m, variables


def _u8(b, rng_seed=1):
    rng = np.random.default_rng(rng_seed)
    return jnp.asarray(rng.integers(0, 256, (b, 32, 32, 3),
                                    dtype=np.uint8))


def test_module_artifact_symbolic_batch_roundtrip(tmp_path):
    """save -> load -> call at two batch sizes == the live infer fn."""
    m, variables = _tiny()
    meta = A.save_serving_artifact(tmp_path / "art", m, variables,
                                   mode="module", batch_size=None,
                                   img_size=32)
    assert meta["batch_size"] is None
    assert "tpu" in meta["platforms"] and "cpu" in meta["platforms"]

    art = A.load_serving_artifact(tmp_path / "art")
    infer = make_infer_fn(m)
    for b in (3, 5):
        batch = _u8(b, rng_seed=b)
        got = art(batch)
        want = infer(variables, batch)
        np.testing.assert_allclose(np.asarray(got["prob1"]),
                                   np.asarray(want["prob1"]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got["pred"]),
                                      np.asarray(want["pred"]))


def test_module_artifact_fixed_batch_shape_check(tmp_path):
    m, variables = _tiny()
    A.save_serving_artifact(tmp_path / "art", m, variables,
                            mode="module", batch_size=4, img_size=32,
                            platforms=("cpu",))
    art = A.load_serving_artifact(tmp_path / "art")
    assert art(_u8(4))["prob1"].shape == (4,)
    with pytest.raises(ValueError):
        art(_u8(2))


def test_weights_codec_preserves_dtypes_and_structure(tmp_path):
    tree = {
        "a": {"w": jnp.asarray(np.arange(6).reshape(2, 3), jnp.bfloat16),
              "b": jnp.asarray([1.5, -2.25], jnp.float32)},
        "t": (jnp.asarray([[7]], jnp.int32),
              jnp.asarray(np.float16([0.5, 0.25]))),
        "l": [jnp.asarray([True, False])],
    }
    spec = A._save_weights(tmp_path / "w.npz", tree)
    back = A._load_weights(tmp_path / "w.npz", spec)
    assert isinstance(back["t"], tuple) and isinstance(back["l"], list)
    flat_a, _ = jax.tree.flatten(tree)
    flat_b, _ = jax.tree.flatten(back)
    for want, got in zip(flat_a, flat_b):
        assert np.asarray(want).dtype == got.dtype
        np.testing.assert_array_equal(np.asarray(want), got)


def test_weights_codec_json_spec_is_serializable(tmp_path):
    _, variables = _tiny()
    spec = A._save_weights(tmp_path / "w.npz", variables)
    json.dumps(spec)          # meta.json embeds it verbatim
    back = A._load_weights(tmp_path / "w.npz", spec)
    flat_a, td_a = jax.tree.flatten(variables)
    flat_b, td_b = jax.tree.flatten(back)
    assert td_a == td_b
    for want, got in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_pallas_mode_exports_tpu_program_from_cpu_host(tmp_path):
    """Cross-platform lowering: the fused fastserve program (Mosaic
    custom calls inside) serializes for TPU from this CPU host; the
    artifact deserializes and reports the right contract.  Execution is
    covered on hardware (experiments/exp_r10_artifact.py)."""
    m, variables = _tiny()
    meta = A.save_serving_artifact(tmp_path / "art", m, variables,
                                   mode="fastserve", batch_size=4,
                                   img_size=32)
    assert meta["platforms"] == ["tpu"]
    assert meta["compute_dtype"] == "bfloat16"
    art = A.load_serving_artifact(tmp_path / "art")
    assert art.exported.platforms == ("tpu",)
    in_aval = art.exported.in_avals[-1]
    assert tuple(in_aval.shape) == (4, 32, 32, 3)


def test_lowlat_modes_export_from_cpu_host(tmp_path):
    m, variables = _tiny()
    for mode in ("lowlat", "batch_grid"):
        meta = A.save_serving_artifact(tmp_path / mode, m, variables,
                                       mode=mode, batch_size=2,
                                       img_size=32)
        assert meta["mode"] == mode
        assert meta["int8_weights"] is False
        A.load_serving_artifact(tmp_path / mode)


def test_lowlat_int8_export(tmp_path):
    """int8_weights freezes the quantized encoder stream: the weight
    file shrinks vs the bf16 export and the descriptor records the
    quantization; non-lowlat modes reject the flag."""
    m, variables = _tiny()
    meta = A.save_serving_artifact(tmp_path / "bf16", m, variables,
                                   mode="lowlat", batch_size=1,
                                   img_size=32)
    meta8 = A.save_serving_artifact(tmp_path / "int8", m, variables,
                                    mode="lowlat", batch_size=1,
                                    img_size=32, int8_weights=True)
    assert meta8["int8_weights"] is True
    size = (tmp_path / "bf16" / "weights.npz").stat().st_size
    size8 = (tmp_path / "int8" / "weights.npz").stat().st_size
    assert size8 < size
    A.load_serving_artifact(tmp_path / "int8")

    with pytest.raises(ValueError, match="int8_weights"):
        A.export_serving(m, variables, mode="batch_grid", batch_size=2,
                         int8_weights=True)
    with pytest.raises(ValueError, match="int8_weights"):
        A.export_serving(m, variables, mode="module", batch_size=2,
                         int8_weights=True)


def test_pallas_mode_rejects_symbolic_batch_and_bad_platforms(tmp_path):
    m, variables = _tiny()
    with pytest.raises(ValueError, match="concrete batch_size"):
        A.export_serving(m, variables, mode="fastserve", batch_size=None)
    with pytest.raises(ValueError, match="platforms"):
        A.export_serving(m, variables, mode="fastserve", batch_size=2,
                         platforms=("cpu",))
    with pytest.raises(ValueError, match="unknown serving mode"):
        A.export_serving(m, variables, mode="warp9", batch_size=2)


def test_format_version_check(tmp_path):
    m, variables = _tiny()
    A.save_serving_artifact(tmp_path / "art", m, variables,
                            mode="module", batch_size=2, img_size=32,
                            platforms=("cpu",))
    meta_path = tmp_path / "art" / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["format_version"] = 99
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="format 99"):
        A.load_serving_artifact(tmp_path / "art")


def test_score_records_and_predict_cli(tmp_path):
    """Frozen artifact + image directory -> CSV scores through the
    predict CLI; score_records pads the tail to one compiled shape and
    matches direct artifact calls."""
    from util_synthetic import make_subject_tree

    from vit_spoof_detection_pda_tpu.cli.predict import main as predict
    from vit_spoof_detection_pda_tpu.data.manifest import Record

    m, variables = _tiny()
    A.save_serving_artifact(tmp_path / "art", m, variables,
                            mode="module", batch_size=4, img_size=32,
                            platforms=("cpu",))
    paths = make_subject_tree(tmp_path / "imgs", subjects=1,
                              per_class=3, size=32)
    assert len(paths) == 6            # 4-batch + tail of 2

    art = A.load_serving_artifact(tmp_path / "art")
    records = [Record(path=str(p), label=-1) for p in sorted(paths)]
    out = A.score_records(art, records, num_workers=2)
    assert out["prob1"].shape == (6,)

    csv_path = tmp_path / "scores.csv"
    rows = predict([str(tmp_path / "art"), str(tmp_path / "imgs"),
                    "--output", str(csv_path), "--num-workers", "2"])
    assert len(rows) == 6
    got = {p: s for p, s, _ in rows}
    for rec, want in zip(records, out["prob1"]):
        np.testing.assert_allclose(got[rec.path], want, atol=1e-6)
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0] == "path,prob_live,pred" and len(lines) == 7


def test_predict_cli_rejects_empty_and_missing(tmp_path):
    from vit_spoof_detection_pda_tpu.cli.predict import main as predict
    m, variables = _tiny()
    A.save_serving_artifact(tmp_path / "art", m, variables,
                            mode="module", batch_size=2, img_size=32,
                            platforms=("cpu",))
    (tmp_path / "empty").mkdir()
    with pytest.raises(SystemExit):
        predict([str(tmp_path / "art"), str(tmp_path / "empty")])
    with pytest.raises(FileNotFoundError):
        predict([str(tmp_path / "art"), str(tmp_path / "nowhere")])


def test_export_serving_cli_registry_model(tmp_path):
    """--model freezes a registry entry (SigNet_F = placeholder
    ResNet50, no checkpoint needed); fine-tuned entries refuse to
    export random weights."""
    from vit_spoof_detection_pda_tpu.cli.export_serving import main

    out = tmp_path / "resnet_art"
    main([str(out), "--model", "SigNet_F", "--batch-size", "1"])
    art = A.load_serving_artifact(out)
    assert art.meta["model"] == "ResNet50"
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (1, 224, 224, 3), dtype=np.uint8))
    got = art(batch)
    assert 0.0 <= float(got["prob1"][0]) <= 1.0

    with pytest.raises(SystemExit):          # fine-tuned, no checkpoint
        main([str(tmp_path / "x"), "--model", "Custom_ViT_FineTuned"])
    with pytest.raises(SystemExit):          # pretrained, no weight file
        main([str(tmp_path / "x"), "--model", "Base_ViT_Pretrained"])
    with pytest.raises(SystemExit):          # unknown entry
        main([str(tmp_path / "x"), "--model", "NopeNet"])
    with pytest.raises(SystemExit):          # no --model, no checkpoint
        main([str(tmp_path / "x")])
    with pytest.raises(SystemExit):          # int8 needs --mode lowlat
        main([str(tmp_path / "x"), "--model", "SigNet_F",
              "--batch-size", "1", "--lowlat-int8"])


def test_fleet_artifact_sharded_roundtrip(tmp_path):
    """mesh export freezes the DP-sharded eval program; loading builds
    (or takes) a matching mesh and scores == the single-device path."""
    from vit_spoof_detection_pda_tpu.parallel.mesh import make_mesh

    m, variables = _tiny()
    mesh = make_mesh(data=8, model=1)
    meta = A.save_serving_artifact(tmp_path / "art", m, variables,
                                   mode="module", batch_size=8,
                                   img_size=32, platforms=("cpu",),
                                   mesh=mesh)
    assert meta["mesh"]["axis_names"][0] == "data"
    assert int(np.prod(meta["mesh"]["shape"])) == 8

    art = A.load_serving_artifact(tmp_path / "art")    # auto-mesh
    assert art.mesh is not None
    batch = _u8(8)
    got = art(batch)
    want = make_infer_fn(m)(variables, batch)
    np.testing.assert_allclose(np.asarray(got["prob1"]),
                               np.asarray(want["prob1"]), atol=1e-5)

    art2 = A.load_serving_artifact(tmp_path / "art", mesh=mesh)
    np.testing.assert_allclose(np.asarray(art2(batch)["prob1"]),
                               np.asarray(want["prob1"]), atol=1e-5)


def test_fleet_artifact_validation(tmp_path):
    from vit_spoof_detection_pda_tpu.parallel.mesh import make_mesh

    m, variables = _tiny()
    mesh = make_mesh(data=8, model=1)
    with pytest.raises(ValueError, match="not divisible"):
        A.export_serving(m, variables, mode="module", batch_size=6,
                         img_size=32, platforms=("cpu",), mesh=mesh)
    with pytest.raises(ValueError, match="module-mode only"):
        A.export_serving(m, variables, mode="fastserve", batch_size=8,
                         mesh=mesh)
    with pytest.raises(ValueError, match="concrete batch_size"):
        A.export_serving(m, variables, mode="module", batch_size=None,
                         mesh=mesh)
    # a single-device artifact refuses a mesh at load
    A.save_serving_artifact(tmp_path / "sd", m, variables,
                            mode="module", batch_size=2, img_size=32,
                            platforms=("cpu",))
    with pytest.raises(ValueError, match="single-device"):
        A.load_serving_artifact(tmp_path / "sd", mesh=mesh)
    # a fleet artifact refuses a wrong-size mesh
    A.save_serving_artifact(tmp_path / "fl", m, variables,
                            mode="module", batch_size=8, img_size=32,
                            platforms=("cpu",), mesh=mesh)
    small = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="needs 8 devices"):
        A.load_serving_artifact(tmp_path / "fl", mesh=small)


def test_benchmark_cli_artifact_mode(tmp_path):
    """--artifact routes the device-latency protocol through a frozen
    program; fixed-batch artifacts pin the batch size."""
    import vit_spoof_detection_pda_tpu.cli.benchmark as bench_cli

    m, variables = _tiny()
    A.save_serving_artifact(tmp_path / "art", m, variables,
                            mode="module", batch_size=4, img_size=32,
                            platforms=("cpu",))
    out = bench_cli.main(["--device-latency", "--artifact",
                          str(tmp_path / "art"), "--n1", "2",
                          "--batch-size", "999"])      # 999 overridden
    assert out["artifact_mode"] == "module"
    assert out["batch_size"] == 4 and out["ms_per_image"] > 0

    with pytest.raises(SystemExit):          # needs --device-latency
        bench_cli.main(["--artifact", str(tmp_path / "art")])
    with pytest.raises(SystemExit):          # live-path flag conflict
        bench_cli.main(["--device-latency", "--artifact",
                        str(tmp_path / "art"), "--fastserve"])


def test_benchmark_cli_lowlat_int8_flag_validation():
    import vit_spoof_detection_pda_tpu.cli.benchmark as bench_cli

    with pytest.raises(SystemExit):          # needs --lowlat
        bench_cli.main(["--device-latency", "--lowlat-int8"])
    with pytest.raises(SystemExit):          # incompatible flavors
        bench_cli.main(["--device-latency", "--lowlat", "--lowlat-int8",
                        "--lowlat-batch-grid", "--interpret"])


def test_threshold_operating_point(tmp_path):
    """A non-default threshold bakes into the frozen program's pred
    (P(live) > t), records in the descriptor, and loads back through
    ServingArtifact.threshold; default artifacts keep the implicit 0.5
    (= module mode's argmax rule)."""
    m, variables = _tiny()
    meta = A.save_serving_artifact(tmp_path / "t9", m, variables,
                                   mode="module", batch_size=8,
                                   img_size=32, platforms=("cpu",),
                                   threshold=0.9)
    assert meta["threshold"] == 0.9
    art = A.load_serving_artifact(tmp_path / "t9")
    assert art.threshold == 0.9
    batch = _u8(8)
    got = art(batch)
    p = np.asarray(got["prob1"])
    np.testing.assert_array_equal(np.asarray(got["pred"]),
                                  (p > 0.9).astype(np.int32))

    A.save_serving_artifact(tmp_path / "d", m, variables, mode="module",
                            batch_size=8, img_size=32,
                            platforms=("cpu",))
    d = A.load_serving_artifact(tmp_path / "d")
    assert d.threshold == 0.5
    np.testing.assert_array_equal(np.asarray(d(batch)["pred"]),
                                  (p > 0.5).astype(np.int32))
    # scores are threshold-independent
    np.testing.assert_allclose(np.asarray(d(batch)["prob1"]), p,
                               atol=1e-6)

    # the Pallas export paths carry it through _score_infer_fn
    meta_fs = A.save_serving_artifact(tmp_path / "fs", m, variables,
                                      mode="fastserve", batch_size=4,
                                      img_size=32, threshold=0.7)
    assert meta_fs["threshold"] == 0.7
    assert A.load_serving_artifact(tmp_path / "fs").threshold == 0.7

    for bad in (0.0, 1.0, -0.2, 1.5):
        with pytest.raises(ValueError, match="threshold"):
            A.export_serving(m, variables, mode="module", batch_size=2,
                             platforms=("cpu",), threshold=bad)


def test_temperature_calibrated_artifact(tmp_path):
    """temperature bakes sigmoid(logit(p)/T) into prob1 (oracle:
    analysis/calibration.py::apply_temperature on the uncalibrated
    artifact's scores), pred thresholds the calibrated scale, rankings
    are preserved, and the descriptor records T."""
    from vit_spoof_detection_pda_tpu.analysis.calibration import (
        apply_temperature)

    m, variables = _tiny()
    A.save_serving_artifact(tmp_path / "raw", m, variables,
                            mode="module", batch_size=8, img_size=32,
                            platforms=("cpu",))
    meta = A.save_serving_artifact(tmp_path / "cal", m, variables,
                                   mode="module", batch_size=8,
                                   img_size=32, platforms=("cpu",),
                                   temperature=2.0, threshold=0.6)
    assert meta["temperature"] == 2.0
    raw = A.load_serving_artifact(tmp_path / "raw")
    cal = A.load_serving_artifact(tmp_path / "cal")
    assert raw.temperature is None and cal.temperature == 2.0

    batch = _u8(8)
    p_raw = np.asarray(raw(batch)["prob1"], np.float64)
    out = cal(batch)
    p_cal = np.asarray(out["prob1"], np.float64)
    np.testing.assert_allclose(p_cal, apply_temperature(p_raw, 2.0),
                               atol=1e-5)
    np.testing.assert_array_equal(np.argsort(p_cal), np.argsort(p_raw))
    np.testing.assert_array_equal(np.asarray(out["pred"]),
                                  (p_cal > 0.6).astype(np.int32))

    with pytest.raises(ValueError, match="temperature"):
        A.export_serving(m, variables, mode="module", batch_size=2,
                         platforms=("cpu",), temperature=0.0)


def test_export_serving_cli_threshold_flag(tmp_path):
    """--threshold validation on the CLI: floats in (0,1) pass through;
    'optimal' demands an orbax checkpoint dir without --model."""
    from vit_spoof_detection_pda_tpu.cli.export_serving import main

    out = tmp_path / "art"
    main([str(out), "--model", "SigNet_F", "--batch-size", "1",
          "--threshold", "0.62"])
    assert A.load_serving_artifact(out).threshold == 0.62

    with pytest.raises(SystemExit):          # not a float
        main([str(tmp_path / "x"), "--model", "SigNet_F",
              "--batch-size", "1", "--threshold", "high"])
    with pytest.raises(SystemExit):          # out of range
        main([str(tmp_path / "x"), "--model", "SigNet_F",
              "--batch-size", "1", "--threshold", "1.0"])
    with pytest.raises(SystemExit):          # optimal needs a Trainer dir
        main([str(tmp_path / "x"), "--model", "SigNet_F",
              "--batch-size", "1", "--threshold", "optimal"])


def test_corrupt_weights_detected_at_load(tmp_path):
    """A truncated/bit-flipped weights file fails loudly at load (sha256
    in meta), not as garbage scores."""
    m, variables = _tiny()
    A.save_serving_artifact(tmp_path / "art", m, variables,
                            mode="module", batch_size=2, img_size=32,
                            platforms=("cpu",))
    wf = tmp_path / "art" / "weights.npz"
    data = bytearray(wf.read_bytes())
    data[len(data) // 2] ^= 0xFF
    wf.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="corrupt"):
        A.load_serving_artifact(tmp_path / "art")


def test_predict_cli_serves_fleet_artifact(tmp_path):
    """The consumer CLI drives a FLEET artifact end-to-end: load
    auto-builds the 8-device mesh, batches shard over the data axis."""
    from util_synthetic import make_subject_tree

    from vit_spoof_detection_pda_tpu.cli.predict import main as predict
    from vit_spoof_detection_pda_tpu.parallel.mesh import make_mesh

    m, variables = _tiny()
    mesh = make_mesh(data=8, model=1)
    A.save_serving_artifact(tmp_path / "art", m, variables,
                            mode="module", batch_size=8, img_size=32,
                            platforms=("cpu",), mesh=mesh)
    make_subject_tree(tmp_path / "imgs", subjects=2, per_class=3,
                      size=32)
    rows = predict([str(tmp_path / "art"), str(tmp_path / "imgs"),
                    "--output", str(tmp_path / "s.csv"),
                    "--num-workers", "2"])
    assert len(rows) == 12                      # 8-batch + padded tail
    assert all(0.0 <= r[1] <= 1.0 for r in rows)
