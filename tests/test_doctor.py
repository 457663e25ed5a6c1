"""`doctor` CLI: environment self-check (backend, kernels, codec,
cache, presets).  On the 8-virtual-device CPU backend nothing may FAIL;
TPU-only capabilities report warn, not fail."""

import json

from vit_spoof_detection_pda_tpu.cli.doctor import FAIL, OK, run_doctor


def test_doctor_no_failures_on_cpu():
    results = run_doctor()
    by_name = {r["check"]: r for r in results}
    assert set(by_name) == {
        "versions", "backend", "device_exec", "device_memory", "mesh",
        "pallas", "native_codec", "compile_cache", "config_presets"}
    failures = [r for r in results if r["status"] == FAIL]
    assert not failures, failures
    # hard-ok on every backend
    for name in ("versions", "device_exec", "mesh", "config_presets"):
        assert by_name[name]["status"] == OK, by_name[name]
    assert by_name["mesh"]["devices"] == 8


def test_doctor_only_filter_and_cli_json(capsys):
    from vit_spoof_detection_pda_tpu.cli.doctor import main

    main(["--json", "--only", "versions", "config_presets"])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip()]
    assert [l["check"] for l in lines] == ["versions", "config_presets"]
    assert all(l["status"] == "ok" for l in lines)


def test_doctor_probe_exception_reports_fail(monkeypatch):
    """A crashing probe must not kill the rest of the report."""
    from vit_spoof_detection_pda_tpu.cli import doctor

    def boom():
        raise RuntimeError("probe exploded")

    boom._check_name = "versions"
    monkeypatch.setattr(doctor, "CHECKS", [boom, doctor.check_config_presets])
    results = doctor.run_doctor()
    assert results[0]["status"] == FAIL
    assert "probe exploded" in results[0]["error"]
    assert results[1]["status"] == OK


def test_doctor_unknown_check_name_errors():
    """A typo in --only must error, not filter every check out and
    report 'doctor: ok' having validated nothing."""
    import pytest

    from vit_spoof_detection_pda_tpu.cli.doctor import main

    with pytest.raises(ValueError, match="unknown check name"):
        run_doctor(["backends"])
    with pytest.raises(SystemExit) as e:
        main(["--only", "backends"])
    assert e.value.code == 2
