"""Serving runtime (serve/): the MicroBatcher scheduler and the HTTP
front end, driven end-to-end over real frozen artifacts on CPU."""

import io
import json
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.models import artifact as A
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.serve import (MicroBatcher,
                                               build_programs_from_artifacts,
                                               make_server)

SIZE = 32


def _tiny():
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                     hidden=16)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, SIZE, SIZE, 3)))
    return m, variables


def _fake_program(calls=None, fail=False):
    """prob1 = mean pixel / 255 — row-identifying and order-preserving."""
    def program(batch):
        if fail:
            raise RuntimeError("boom")
        if calls is not None:
            calls.append(batch.shape[0])
        p = batch.reshape(batch.shape[0], -1).mean(axis=1) / 255.0
        return {"prob1": p.astype(np.float32),
                "pred": (p >= 0.5).astype(np.int32)}
    return program


def _img(value):
    return np.full((SIZE, SIZE, 3), value, np.uint8)


# --- MicroBatcher unit tests -------------------------------------------


def test_batcher_single_request_roundtrip():
    b = MicroBatcher({1: _fake_program(), 4: _fake_program()},
                     img_size=SIZE, max_wait_ms=1.0)
    try:
        out = b.submit(_img(51)).result(timeout=5)
        assert out["prob1"] == pytest.approx(51 / 255.0)
        assert out["pred"] == 0
        s = b.stats()
        assert s["requests"] == 1 and s["batches"] == 1
        assert s["padded_rows"] == 0          # 1 fits the B=1 shape
    finally:
        b.close()


def test_batcher_coalesces_concurrent_requests():
    calls = []
    b = MicroBatcher({4: _fake_program(calls)}, img_size=SIZE,
                     max_wait_ms=50.0)
    try:
        with ThreadPoolExecutor(8) as pool:
            futs = list(pool.map(
                lambda v: b.submit(_img(v)), [10, 20, 30, 40]))
        outs = [f.result(timeout=5) for f in futs]
        for v, o in zip([10, 20, 30, 40], outs):
            assert o["prob1"] == pytest.approx(v / 255.0)
        # everything coalesced into at most 2 device calls (the window
        # is 50 ms; thread scheduling may split one straggler off)
        assert 1 <= len(calls) <= 2
        assert all(c == 4 for c in calls)     # padded to the only shape
    finally:
        b.close()


def test_batcher_picks_smallest_fitting_shape():
    calls = []
    p = _fake_program(calls)
    b = MicroBatcher({1: p, 2: p, 8: p}, img_size=SIZE, max_wait_ms=0.0)
    try:
        assert b.batch_sizes == (1, 2, 8)
        b.submit(_img(1)).result(timeout=5)
        assert calls[-1] == 1                 # lone request -> B=1 shape
        with ThreadPoolExecutor(4) as pool:
            futs = [pool.submit(b.submit, _img(v)) for v in (2, 3, 4)]
            [f.result().result(timeout=5) for f in futs]
        assert set(calls[1:]) <= {1, 2, 8}    # only compiled shapes ran
        assert sum(calls) >= 4
    finally:
        b.close()


def test_batcher_error_propagates_to_every_request():
    b = MicroBatcher({2: _fake_program(fail=True)}, img_size=SIZE,
                     max_wait_ms=20.0)
    try:
        f1, f2 = b.submit(_img(1)), b.submit(_img(2))
        for f in (f1, f2):
            with pytest.raises(RuntimeError, match="boom"):
                f.result(timeout=5)
        assert b.stats()["errors"] == 2
    finally:
        b.close()


def test_batcher_validates_input_and_close():
    b = MicroBatcher({1: _fake_program()}, img_size=SIZE)
    with pytest.raises(ValueError, match="expected uint8"):
        b.submit(np.zeros((SIZE, SIZE, 3), np.float32))
    with pytest.raises(ValueError, match="expected uint8"):
        b.submit(np.zeros((8, 8, 3), np.uint8))
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(_img(0))
    with pytest.raises(ValueError, match="batch size"):
        MicroBatcher({}, img_size=SIZE)


def test_batcher_drains_queue_on_close():
    slow_gate = threading.Event()

    def slow_program(batch):
        slow_gate.wait(5)
        p = batch.reshape(batch.shape[0], -1).mean(axis=1) / 255.0
        return {"prob1": p.astype(np.float32),
                "pred": (p >= 0.5).astype(np.int32)}

    b = MicroBatcher({1: slow_program}, img_size=SIZE, max_wait_ms=0.0)
    f1 = b.submit(_img(10))
    time.sleep(0.05)                 # let the dispatcher pick up f1
    f2 = b.submit(_img(20))          # still queued behind the slow call
    slow_gate.set()
    b.close()
    assert f1.result(timeout=5)["prob1"] == pytest.approx(10 / 255.0)
    assert f2.result(timeout=5)["prob1"] == pytest.approx(20 / 255.0)


# --- artifact program table --------------------------------------------


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """One symbolic-batch + one fixed-batch(2) module artifact."""
    root = tmp_path_factory.mktemp("serve_artifacts")
    m, variables = _tiny()
    A.save_serving_artifact(root / "sym", m, variables, mode="module",
                            batch_size=None, img_size=SIZE,
                            platforms=("cpu",))
    A.save_serving_artifact(root / "b2", m, variables, mode="module",
                            batch_size=2, img_size=SIZE,
                            platforms=("cpu",))
    return root, m, variables


def test_build_programs_buckets_and_fixed(artifacts):
    root, _, _ = artifacts
    programs, img_size, metas = build_programs_from_artifacts(
        [str(root / "sym")], max_batch=8)
    assert img_size == SIZE
    assert sorted(programs) == [1, 2, 4, 8]
    out = programs[4](np.zeros((4, SIZE, SIZE, 3), np.uint8))
    assert out["prob1"].shape == (4,)

    programs2, _, _ = build_programs_from_artifacts(
        [str(root / "b2")], max_batch=8)
    assert sorted(programs2) == [2]

    # layering: the fixed artifact overrides the symbolic bucket at 2
    programs3, _, metas3 = build_programs_from_artifacts(
        [str(root / "sym"), str(root / "b2")], max_batch=4)
    assert sorted(programs3) == [1, 2, 4]
    assert len(metas3) == 2


def test_build_programs_rejects_mixed_img_size(artifacts, tmp_path):
    root, _, _ = artifacts
    m2 = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                      hidden=16)
    v2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    A.save_serving_artifact(tmp_path / "other", m2, v2,
                            mode="module", batch_size=None, img_size=64,
                            platforms=("cpu",))
    with pytest.raises(ValueError, match="img_size"):
        build_programs_from_artifacts(
            [str(root / "sym"), str(tmp_path / "other")])


# --- HTTP server end-to-end --------------------------------------------


def _jpeg_bytes(value, size=SIZE):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.full((size, size, 3), value, np.uint8)).save(
        buf, format="PNG")           # PNG: lossless, scores exact
    return buf.getvalue()


def _post(port, path, data):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method="POST",
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def server(artifacts):
    root, m, variables = artifacts
    srv = make_server([str(root / "sym")], port=0, max_batch=4,
                      max_wait_ms=2.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, m, variables
    srv.shutdown_clean()
    t.join(timeout=10)


def test_http_score_matches_direct_artifact(server, artifacts):
    srv, m, variables = server
    root, _, _ = artifacts
    port = srv.server_address[1]
    art = A.load_serving_artifact(root / "sym")

    status, out = _post(port, "/score", _jpeg_bytes(90))
    assert status == 200
    want = art(jnp.full((1, SIZE, SIZE, 3), 90, jnp.uint8))
    assert out["prob_live"] == pytest.approx(
        float(np.asarray(want["prob1"])[0]), abs=1e-6)
    assert out["pred"] in (0, 1)
    assert out["label"] == ("live" if out["pred"] == 1 else "spoof")
    assert out["latency_ms"] > 0


def test_http_concurrent_requests_batch_and_agree(server, artifacts):
    srv, _, _ = server
    root, _, _ = artifacts
    port = srv.server_address[1]
    art = A.load_serving_artifact(root / "sym")
    values = [15, 60, 120, 200, 240]
    before = srv.batcher.stats()["batches"]
    with ThreadPoolExecutor(len(values)) as pool:
        outs = list(pool.map(
            lambda v: _post(port, "/score", _jpeg_bytes(v)), values))
    want = np.asarray(art(jnp.stack([
        jnp.full((SIZE, SIZE, 3), v, jnp.uint8)
        for v in values]))["prob1"])
    for (status, out), w in zip(outs, want):
        assert status == 200
        assert out["prob_live"] == pytest.approx(float(w), abs=1e-6)
    stats = srv.batcher.stats()
    # 5 requests cannot have taken 5 separate device calls unless the
    # 2 ms window never coalesced anything — allow that worst case but
    # assert the accounting lines up either way
    assert stats["requests"] >= before + len(values) - 1  # first test ran 1
    assert stats["batches"] <= before + len(values)


def test_http_raw_frame_upload(server, artifacts):
    """application/x-pad-raw: pre-decoded uint8 RGB bytes skip the host
    JPEG decode; wrong length is a 400."""
    srv, _, _ = server
    root, _, _ = artifacts
    port = srv.server_address[1]
    art = A.load_serving_artifact(root / "sym")
    frame = np.full((SIZE, SIZE, 3), 77, np.uint8)

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/score", data=frame.tobytes(),
        method="POST", headers={"Content-Type": "application/x-pad-raw"})
    with urllib.request.urlopen(req, timeout=30) as r:
        out = json.loads(r.read())
    want = float(np.asarray(art(jnp.asarray(frame[None]))["prob1"])[0])
    assert out["prob_live"] == pytest.approx(want, abs=1e-6)

    bad = urllib.request.Request(
        f"http://127.0.0.1:{port}/score", data=b"\x00" * 10,
        method="POST", headers={"Content-Type": "application/x-pad-raw"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad, timeout=30)
    assert ei.value.code == 400


def test_batcher_plan_minimizes_padding():
    """The dispatch planner prefers zero-pad decompositions over one
    padded dispatch (round-15 hardware lesson: padded rows compute and
    transfer like real ones)."""
    p = _fake_program()
    b = MicroBatcher({1: p, 16: p, 128: p}, img_size=SIZE)
    try:
        assert b._plan(32) == (16, 16)
        assert b._plan(17) == (16, 1)
        assert b._plan(20) == (16, 1, 1, 1, 1)
        assert b._plan(128) == (128,)
        assert b._plan(1) == (1,)
        assert b._plan(127) == (16,) * 7 + (1,) * 15
    finally:
        b.close()
    b2 = MicroBatcher({4: p, 16: p}, img_size=SIZE)
    try:
        assert b2._plan(3) == (4,)        # must pad when no exact fit
        assert b2._plan(7) == (4, 4)      # 1 pad beats 9 pads on the 16
        assert b2._plan(12) == (4, 4, 4)
    finally:
        b2.close()


def test_batcher_split_window_routes_and_orders():
    """A window larger than the mid shape splits across dispatches and
    every future still gets its own row."""
    calls = []
    p = _fake_program(calls)
    b = MicroBatcher({1: p, 4: p, 32: p}, img_size=SIZE,
                     max_wait_ms=100.0)
    try:
        vals = list(range(10, 70, 10))    # 6 items -> plan (4, 1, 1)
        futs = b.submit_many(np.stack([_img(v) for v in vals]))
        outs = [f.result(timeout=5) for f in futs]
        for v, o in zip(vals, outs):
            assert o["prob1"] == pytest.approx(v / 255.0)
        assert sorted(calls) == [1, 1, 4]
        assert b.stats()["padded_rows"] == 0
    finally:
        b.close()


def test_batcher_submit_many_orders_and_coalesces():
    calls = []
    b = MicroBatcher({4: _fake_program(calls)}, img_size=SIZE,
                     max_wait_ms=50.0)
    try:
        vals = [10, 20, 30, 40, 50, 60]
        futs = b.submit_many(np.stack([_img(v) for v in vals]))
        outs = [f.result(timeout=5) for f in futs]
        for v, o in zip(vals, outs):
            assert o["prob1"] == pytest.approx(v / 255.0)
        assert len(calls) == 2 and all(c == 4 for c in calls)
        with pytest.raises(ValueError, match="expected uint8"):
            b.submit_many(np.zeros((2, SIZE, SIZE, 3), np.float32))
        with pytest.raises(ValueError, match="expected uint8"):
            b.submit_many(np.zeros((SIZE, SIZE, 3), np.uint8))
    finally:
        b.close()


def test_http_score_batch_endpoint(server, artifacts):
    """/score-batch: one request, N raw frames, ordered arrays back;
    wrong content type is 415, ragged length is 400."""
    srv, _, _ = server
    root, _, _ = artifacts
    port = srv.server_address[1]
    art = A.load_serving_artifact(root / "sym")
    vals = [15, 85, 170, 240, 33]
    frames = np.stack([_img(v) for v in vals])

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/score-batch", data=frames.tobytes(),
        method="POST", headers={"Content-Type": "application/x-pad-raw"})
    with urllib.request.urlopen(req, timeout=60) as r:
        out = json.loads(r.read())
    assert out["count"] == len(vals)
    want = np.asarray(art(jnp.asarray(frames))["prob1"])
    np.testing.assert_allclose(out["prob_live"], want, atol=1e-6)
    assert out["pred"] == [int(p >= 0.5) for p in want]

    # wrong content type -> 415
    bad_ct = urllib.request.Request(
        f"http://127.0.0.1:{port}/score-batch", data=frames.tobytes(),
        method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad_ct, timeout=30)
    assert ei.value.code == 415

    # non-multiple length -> 400
    ragged = urllib.request.Request(
        f"http://127.0.0.1:{port}/score-batch",
        data=frames.tobytes()[:-7], method="POST",
        headers={"Content-Type": "application/x-pad-raw"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(ragged, timeout=30)
    assert ei.value.code == 400


def test_http_admin_reload_swaps_programs(tmp_path):
    """/admin/reload rebuilds from the artifact dirs with zero downtime:
    a re-exported artifact (new weights) changes the served scores; a
    server without a rebuild source answers 403."""
    m, variables = _tiny()
    v2 = m.init(jax.random.PRNGKey(9), jnp.zeros((1, SIZE, SIZE, 3)))
    d = tmp_path / "art"
    A.save_serving_artifact(d, m, variables, mode="module",
                            batch_size=None, img_size=SIZE,
                            platforms=("cpu",))
    srv = make_server([str(d)], port=0, max_batch=2, max_wait_ms=1.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        frame = _img(77)

        def score():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/score", data=frame.tobytes(),
                method="POST",
                headers={"Content-Type": "application/x-pad-raw"})
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read())["prob_live"]

        s1 = score()
        A.save_serving_artifact(d, m, v2, mode="module",
                                batch_size=None, img_size=SIZE,
                                platforms=("cpu",))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload", data=b"",
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["reloaded"] is True
        assert out["batch_sizes"] == [1, 2]
        s2 = score()
        art2 = A.load_serving_artifact(d)
        want2 = float(np.asarray(art2(jnp.asarray(frame[None]))["prob1"])[0])
        assert s2 == pytest.approx(want2, abs=1e-6)
        assert abs(s1 - s2) > 1e-9    # new weights actually serving
    finally:
        srv.shutdown_clean()
        t.join(timeout=10)


def test_http_admin_reload_without_source_is_403():
    from vit_spoof_detection_pda_tpu.serve import make_server_from_programs
    srv = make_server_from_programs(
        {1: _fake_program()}, SIZE, [{"source": "test"}], port=0,
        max_wait_ms=1.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/admin/reload", data=b"",
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 403
    finally:
        srv.shutdown_clean()
        t.join(timeout=10)


def test_http_error_paths_close_keepalive_connection(server):
    """Error responses that may leave body bytes unread must carry
    Connection: close — otherwise an HTTP/1.1 keep-alive client has the
    leftover body parsed as its next request line."""
    import http.client
    srv, _, _ = server
    port = srv.server_address[1]
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    try:
        # wrong content type on /score-batch: 415 without reading body
        conn.request("POST", "/score-batch", body=b"\xff" * 5000,
                     headers={"Content-Type": "image/jpeg"})
        r = conn.getresponse()
        assert r.status == 415
        assert (r.getheader("Connection") or "").lower() == "close"
        r.read()
    finally:
        conn.close()


def test_http_content_type_parameters_and_truncated_body(server, artifacts):
    """MIME parameters on x-pad-raw still route to the raw path; a
    truncated raw body gets a clean 400, not a dropped connection."""
    import socket
    srv, _, _ = server
    root, _, _ = artifacts
    port = srv.server_address[1]
    art = A.load_serving_artifact(root / "sym")
    frame = _img(123)

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/score", data=frame.tobytes(),
        method="POST",
        headers={"Content-Type": "application/x-pad-raw; charset=binary"})
    with urllib.request.urlopen(req, timeout=30) as r:
        out = json.loads(r.read())
    want = float(np.asarray(art(jnp.asarray(frame[None]))["prob1"])[0])
    assert out["prob_live"] == pytest.approx(want, abs=1e-6)

    # declare a full frame, send half, half-close -> 400 "truncated"
    body = frame.tobytes()[: frame.nbytes // 2]
    s = socket.create_connection(("127.0.0.1", port), timeout=30)
    try:
        head = (f"POST /score HTTP/1.1\r\nHost: x\r\n"
                f"Content-Type: application/x-pad-raw\r\n"
                f"Content-Length: {frame.nbytes}\r\n\r\n").encode()
        s.sendall(head + body)
        s.shutdown(socket.SHUT_WR)
        resp = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            resp += chunk
        assert b" 400 " in resp.split(b"\r\n", 1)[0]
        assert b"truncated" in resp
    finally:
        s.close()


def test_http_reload_failure_keeps_serving(tmp_path):
    """A rebuild that raises yields 500 and the OLD programs keep
    serving; the half-built batcher is released."""
    from vit_spoof_detection_pda_tpu.serve import make_server_from_programs

    boom = {"on": False}

    def rebuild():
        if boom["on"]:
            raise RuntimeError("bad re-export")
        return {1: _fake_program()}, SIZE, [{"source": "v2"}]

    srv = make_server_from_programs(
        {1: _fake_program()}, SIZE, [{"source": "v1"}], port=0,
        max_wait_ms=1.0, rebuild=rebuild)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]

        def reload_req():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/admin/reload", data=b"",
                method="POST")
            return json.loads(urllib.request.urlopen(
                req, timeout=60).read())

        assert reload_req()["reloaded"] is True   # healthy swap works
        boom["on"] = True
        with pytest.raises(urllib.error.HTTPError) as ei:
            reload_req()
        assert ei.value.code == 500
        # old programs still serve after the failed reload
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score", data=_img(60).tobytes(),
            method="POST",
            headers={"Content-Type": "application/x-pad-raw"})
        out = json.loads(urllib.request.urlopen(req, timeout=30).read())
        assert out["prob_live"] == pytest.approx(60 / 255.0)
    finally:
        srv.shutdown_clean()
        t.join(timeout=10)


def test_build_programs_last_listed_wins_uniformly(artifacts, tmp_path):
    """Two symbolic artifacts: the LAST one owns every bucket (was
    first-wins via setdefault, contradicting the documented rule)."""
    root, m, variables = artifacts
    v2 = m.init(jax.random.PRNGKey(21), jnp.zeros((1, SIZE, SIZE, 3)))
    A.save_serving_artifact(tmp_path / "sym2", m, v2, mode="module",
                            batch_size=None, img_size=SIZE,
                            platforms=("cpu",))
    programs, _, _ = build_programs_from_artifacts(
        [str(root / "sym"), str(tmp_path / "sym2")], max_batch=2)
    batch = _img(77)[None]
    art2 = A.load_serving_artifact(tmp_path / "sym2")
    want = float(np.asarray(art2(jnp.asarray(batch))["prob1"])[0])
    got = float(programs[1](batch)["prob1"][0])
    assert got == pytest.approx(want, abs=1e-7)


def test_http_rejects_garbage_and_unknown_paths(server):
    srv, _, _ = server
    port = srv.server_address[1]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, "/score", b"not an image at all")
    assert ei.value.code == 422
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, "/score", b"")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, "/nope", b"x")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, "/nope")
    assert ei.value.code == 404


def test_http_healthz_and_stats(server):
    srv, _, _ = server
    port = srv.server_address[1]
    status, health = _get(port, "/healthz")
    assert status == 200 and health["status"] == "ok"
    assert health["img_size"] == SIZE
    assert health["batch_sizes"] == [1, 2, 4]
    assert health["artifacts"][0]["model"] == "ViTAntiSpoof"
    status, stats = _get(port, "/stats")
    assert status == 200
    assert stats["requests"] >= 1
    assert "latency_ms" in stats


def test_build_programs_live_regime_table(artifacts):
    """Live mode: per-shape programs on the measured regime winners,
    scores matching the artifact program (same folded weights)."""
    from vit_spoof_detection_pda_tpu.serve import build_programs_live
    root, m, variables = artifacts
    programs, img_size, metas = build_programs_live(
        m, variables, shapes=(1, 2, 4), img_size=SIZE, interpret=True)
    assert img_size == SIZE
    assert sorted(programs) == [1, 2, 4]
    assert metas[0]["shapes"] == {1: "lowlat", 2: "batch_grid",
                                  4: "batch_grid"}
    art = A.load_serving_artifact(root / "sym")
    batch = np.stack([_img(40), _img(200)])
    got = programs[2](batch)
    want = np.asarray(art(jnp.asarray(batch))["prob1"])
    # module artifact is f32; live Pallas regimes are bf16
    np.testing.assert_allclose(got["prob1"], want, atol=2e-2)
    assert got["pred"].dtype == np.int32
    b = MicroBatcher(programs, img_size=SIZE, max_wait_ms=1.0)
    try:
        out = b.submit(_img(40)).result(timeout=30)
        assert out["prob1"] == pytest.approx(float(got["prob1"][0]),
                                             abs=2e-2)
    finally:
        b.close()


def test_http_serves_fleet_artifact_data_parallel(artifacts, tmp_path):
    """The daemon serves a FLEET artifact end-to-end: loading
    auto-builds the 8-device mesh, incoming windows pad to the compiled
    batch and shard over the data axis, scores match the single-device
    module artifact."""
    from vit_spoof_detection_pda_tpu.parallel.mesh import make_mesh

    root, m, variables = artifacts
    mesh = make_mesh(data=8, model=1)
    A.save_serving_artifact(tmp_path / "fleet", m, variables,
                            mode="module", batch_size=8, img_size=SIZE,
                            platforms=("cpu",), mesh=mesh)
    srv = make_server([str(tmp_path / "fleet")], port=0, max_wait_ms=2.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        values = [20, 90, 160, 230]
        with ThreadPoolExecutor(4) as pool:
            results = list(pool.map(
                lambda v: _post(port, "/score", _jpeg_bytes(v)), values))
        want_art = A.load_serving_artifact(str(root / "sym"))
        for v, (status, out) in zip(values, results):
            assert status == 200
            batch = np.full((1, SIZE, SIZE, 3), v, np.uint8)
            want = float(np.asarray(want_art(jnp.asarray(batch))
                                    ["prob1"])[0])
            assert out["prob_live"] == pytest.approx(want, abs=1e-5)
        _status, stats = _get(port, "/stats")
        assert stats["requests"] >= 4
    finally:
        srv.shutdown_clean()
        t.join(timeout=10)


def test_build_programs_live_threshold(artifacts):
    """Live mode deploys a configured operating point: pred flips at
    prob > t, the meta records it, out-of-range values fail fast."""
    from vit_spoof_detection_pda_tpu.serve import build_programs_live
    _root, m, variables = artifacts
    programs, _sz, metas = build_programs_live(
        m, variables, shapes=(2,), img_size=SIZE, interpret=True,
        threshold=0.9)
    assert metas[0]["threshold"] == 0.9
    out = programs[2](np.stack([_img(40), _img(200)]))
    np.testing.assert_array_equal(
        out["pred"], (out["prob1"] > 0.9).astype(np.int32))

    with pytest.raises(ValueError, match="threshold"):
        build_programs_live(m, variables, shapes=(2,), img_size=SIZE,
                            interpret=True, threshold=1.0)

    # temperature calibrates the live scores the same way the frozen
    # artifact does (models/artifact.py::temper_probs semantics)
    from vit_spoof_detection_pda_tpu.analysis.calibration import (
        apply_temperature)
    progs_t, _sz, metas_t = build_programs_live(
        m, variables, shapes=(2,), img_size=SIZE, interpret=True,
        temperature=2.0)
    assert metas_t[0]["temperature"] == 2.0
    base = build_programs_live(m, variables, shapes=(2,),
                               img_size=SIZE, interpret=True)[0]
    batch = np.stack([_img(40), _img(200)])
    got = progs_t[2](batch)["prob1"]
    want = apply_temperature(
        np.asarray(base[2](batch)["prob1"], np.float64), 2.0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    with pytest.raises(ValueError, match="temperature"):
        build_programs_live(m, variables, shapes=(2,), img_size=SIZE,
                            interpret=True, temperature=-1.0)


def test_loadgen_against_live_server(server):
    """serve-bench's engine (serve/loadgen.py) drives a real server:
    raw + jpeg /score and the /score-batch endpoint, zero errors, sane
    stats, batch-fill computed from the /stats delta."""
    from vit_spoof_detection_pda_tpu.serve import run_load
    srv, _m, _v = server
    url = f"http://127.0.0.1:{srv.server_address[1]}"

    for kwargs in ({"mode": "raw"}, {"mode": "jpeg"}, {"batch": 3}):
        out = run_load(url, clients=4, requests=8, img_size=SIZE,
                       warmup=2, **kwargs)
        assert out["errors"] == 0, out
        assert out["images"] == (24 if kwargs.get("batch") else 8)
        assert out["img_per_s"] > 0
        assert out["latency_ms"]["p50"] > 0
        assert "server_stats" in out and "avg_batch_fill" in out

    with pytest.raises(ValueError, match="mode"):
        run_load(url, mode="bmp")
    with pytest.raises(ValueError, match="clients"):
        run_load(url, clients=0)


def test_serve_bench_cli(server, capsys):
    from vit_spoof_detection_pda_tpu.cli.serve_bench import main
    srv, _m, _v = server
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    out = main([url, "--clients", "2", "--requests", "4", "--warmup",
                "1", "--img-size", str(SIZE)])
    assert out["errors"] == 0 and out["images"] == 4
    json.loads(capsys.readouterr().out.strip())     # one JSON line

    with pytest.raises(SystemExit):
        main([url, "--clients", "0"])
    with pytest.raises(SystemExit):
        main([url, "--batch", "2", "--image", "/tmp/x.jpg"])


def test_serve_cli_validates_args():
    from vit_spoof_detection_pda_tpu.cli.serve import main
    with pytest.raises(SystemExit):
        main(["./nowhere", "--max-batch", "0"])
    with pytest.raises(SystemExit):
        main(["./nowhere", "--max-wait-ms", "-1"])
    with pytest.raises(SystemExit):          # artifacts carry their own
        main(["./nowhere", "--threshold", "0.7"])
    with pytest.raises(SystemExit):          # parsed compare: 0.50 too
        main(["./nowhere", "--threshold", "0.50"])
    with pytest.raises(SystemExit):          # --ema is live-mode only
        main(["./nowhere", "--ema"])
    with pytest.raises(SystemExit):          # not a float
        main(["--checkpoint", "./ck", "--threshold", "max"])
    with pytest.raises(SystemExit):          # out of range
        main(["--checkpoint", "./ck", "--threshold", "0"])


def test_serve_cli_passes_through(monkeypatch):
    import vit_spoof_detection_pda_tpu.serve as S
    from vit_spoof_detection_pda_tpu.cli.serve import main
    seen = {}
    monkeypatch.setattr(
        S, "serve", lambda dirs, **kw: seen.update(dirs=dirs, **kw))
    main(["./a", "./b", "--port", "0", "--max-batch", "8",
          "--max-wait-ms", "1.5", "--no-warmup"])
    assert seen == {"dirs": ["./a", "./b"], "host": "127.0.0.1",
                    "port": 0, "max_batch": 8, "max_wait_ms": 1.5,
                    "warmup": False}


def test_prometheus_text_renders_stats():
    from vit_spoof_detection_pda_tpu.serve.server import prometheus_text

    stats = {"requests": 7, "batches": 3, "images": 8, "padded_rows": 1,
             "errors": 0, "avg_batch": 8 / 3,
             "latency_ms": {"p50": 1.5, "p95": 2.5, "p99": 3.0,
                            "max": 3.25}}
    text = prometheus_text(stats, uptime_s=12.34)
    assert "pad_requests_total 7" in text
    assert "pad_padded_rows_total 1" in text
    assert "pad_batch_fill_avg 2.667" in text
    assert 'pad_latency_milliseconds{quantile="0.95"} 2.5' in text
    assert "pad_latency_milliseconds_max 3.25" in text
    assert "# TYPE pad_requests_total counter" in text
    # no latency block before any traffic
    empty = prometheus_text({"requests": 0, "batches": 0, "images": 0,
                             "padded_rows": 0, "errors": 0,
                             "avg_batch": 0.0}, uptime_s=1.0)
    assert "latency" not in empty
    assert "pad_requests_total 0" in empty


def test_http_metrics_endpoint(server):
    """GET /metrics serves the Prometheus view of /stats after real
    traffic, with the exposition content type."""
    srv, m, variables = server
    _post(srv.server_port, "/score", _jpeg_bytes(0.3))
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.server_port}/metrics")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    _, stats = _get(srv.server_port, "/stats")
    assert f"pad_requests_total {stats['requests']}" in text
    assert "pad_uptime_seconds" in text
    if "latency_ms" in stats:
        assert 'pad_latency_milliseconds{quantile="0.5"}' in text
