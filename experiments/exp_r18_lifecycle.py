"""One continuous hardware drive of the production lifecycle
(docs/DEPLOYMENT.md): augment -> train (preempted mid-epoch by SIGTERM)
-> resume -> describe -> evaluate -> calibrate -> freeze -> verify ->
predict -> serve -> load-test -> hot-swap -> torch export.

Every stage runs through the real CLI in a subprocess on the real TPU —
this is the playbook executed top to bottom, not per-stage unit checks.
The mid-epoch preemption exercises the exact-resume path (Trainer.fit
start_batch): the resumed run must restart at the preemption step's
(epoch, batch) position, not at the epoch start.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r18_lifecycle.py
Writes logs + a summary JSON under /tmp/pad_lifecycle/.
"""

import json
import os
import shutil
import signal
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

WORK = Path("/tmp/pad_lifecycle")
REPO = Path("/root/repo")
PY = [sys.executable, "-m", "vit_spoof_detection_pda_tpu"]
ENV = dict(os.environ)
# keep the axon plugin's sitecustomize AND the repo importable from the
# workdir (CLAUDE.md platform gotcha: overriding PYTHONPATH with just the
# repo drops the plugin and jax dies)
ENV["PYTHONPATH"] = "/root/.axon_site:/root/repo" + (
    ":" + ENV["PYTHONPATH"] if ENV.get("PYTHONPATH") else "")

SUMMARY = {}
T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def run(stage, args, timeout=1200, check=True, **kw):
    logf = WORK / f"{stage}.log"
    log(f"--- {stage}: {' '.join(map(str, args))}")
    t = time.time()
    with open(logf, "w") as f:
        p = subprocess.run(list(map(str, args)), stdout=f,
                           stderr=subprocess.STDOUT, env=ENV,
                           timeout=timeout, **kw)
    dt = time.time() - t
    SUMMARY.setdefault("stages", {})[stage] = {
        "seconds": round(dt, 1), "returncode": p.returncode}
    if check and p.returncode != 0:
        print(open(logf).read()[-4000:])
        raise SystemExit(f"stage {stage} failed (rc={p.returncode})")
    log(f"    {stage} done in {dt:.1f}s")
    return logf


def main():
    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    os.chdir(WORK)

    # ---- 0. synthetic raw data (class-separable so training learns)
    sys.path.insert(0, str(REPO / "tests"))
    from util_synthetic import make_subject_tree
    raw = WORK / "raw"
    test_dir = WORK / "test_split"
    # sized so an epoch is ~15 steps: wide enough to land the SIGTERM
    # mid-epoch (the poll sees the JSONL a few steps late)
    make_subject_tree(raw, subjects=6, per_class=10, size=256, seed=0)
    make_subject_tree(test_dir, subjects=4, per_class=8, size=256, seed=7)
    log(f"raw: {sum(1 for _ in raw.rglob('*.png'))} imgs, "
        f"test: {sum(1 for _ in test_dir.rglob('*.png'))} imgs")

    store = WORK / "store"
    ckpt = WORK / "ckpt"
    results = WORK / "results"
    jsonl = WORK / "train_metrics.jsonl"

    # ---- 1. materialize the differential-augmented store
    run("augment", PY + [
        "augment",
        "--set", f"augment.input_dir={raw}",
        "--set", f"augment.output_dir={store}",
        "--set", "augment.live_augmentations=2",
        "--set", "augment.spoof_augmentations=1",
        "--set", "augment.batch_size=16",
    ], timeout=2400)
    n_store = sum(1 for _ in store.rglob("*.jpg"))
    log(f"store: {n_store} imgs")
    SUMMARY["store_images"] = n_store

    # ---- 2. train with the deployment knobs ON; SIGTERM mid-epoch 1
    train_over = [
        "--set", f"data.data_root={store}",
        "--set", "data.batch_size=16",
        "--set", "data.eval_batch_size=16",
        "--set", "data.num_workers=4",
        "--set", "model.pretrained=false",
        "--set", "optim.num_epochs=4",
        "--set", "optim.ema_decay=0.999",
        "--set", f"checkpoint.save_dir={ckpt}",
        "--set", "checkpoint.async_save=true",
        "--set", f"telemetry.jsonl_path={jsonl}",
        "--set", "telemetry.log_interval=1",
    ]
    trainlog = WORK / "train_run1.log"
    log("--- train_run1 (will SIGTERM at epoch 1, batch >= 2)")
    t = time.time()
    with open(trainlog, "w") as f:
        proc = subprocess.Popen(
            list(map(str, PY + ["train"] + train_over)), stdout=f,
            stderr=subprocess.STDOUT, env=ENV)
        # steps/epoch: floor(0.85 * n_store / 16); SIGTERM once the
        # JSONL shows the global step inside epoch 1
        spe = int(0.85 * n_store) // 16
        target = spe + 2
        fired = False
        while proc.poll() is None:
            time.sleep(0.5)
            if not fired and jsonl.exists():
                steps = []
                for line in open(jsonl):
                    try:
                        steps.append(json.loads(line).get("step", -1))
                    except ValueError:
                        pass
                if steps and max(steps) >= target:
                    log(f"    firing SIGTERM at observed step "
                        f"{max(steps)} (target {target}, spe {spe})")
                    proc.send_signal(signal.SIGTERM)
                    fired = True
            if time.time() - t > 2400:
                proc.kill()
                raise SystemExit("train_run1 timed out")
        rc = proc.returncode
    SUMMARY["stages"]["train_run1"] = {
        "seconds": round(time.time() - t, 1), "returncode": rc,
        "sigterm_fired": fired}
    body = open(trainlog).read()
    if rc != 0:
        print(body[-4000:])
        raise SystemExit("train_run1 failed")
    if not fired:
        raise SystemExit("run finished before SIGTERM could fire — "
                         "enlarge the dataset or epochs")
    assert "preempt" in body.lower(), "no preemption checkpoint logged"
    log("    preemption checkpoint confirmed")

    # ---- 3. resume: must restart at the preemption (epoch, batch)
    resumelog = run("train_resume", PY + ["train", "--resume"] +
                    train_over, timeout=2400)
    rbody = open(resumelog).read()
    import re
    m = re.search(r"starting at epoch (\d+) batch (\d+)", rbody)
    assert m, "resume log line missing"
    ep, ba = int(m.group(1)), int(m.group(2))
    SUMMARY["resume_position"] = {"epoch": ep, "batch": ba}
    assert ep >= 1 and (ep > 1 or ba > 0), (
        f"resume did not land mid-horizon: epoch {ep} batch {ba}")
    assert "training done" in rbody
    log(f"    resumed at epoch {ep} batch {ba} (mid-epoch exact resume)")

    # ---- 4. inspect the checkpoint
    dlog = run("describe_ckpt", PY + ["describe", ckpt, "--json"])
    desc = [json.loads(l) for l in open(dlog) if l.strip().startswith("{")]
    SUMMARY["checkpoint_steps"] = [
        s.get("step") for d in desc for s in d.get("steps", [])]

    # ---- 5. evaluate on the held-out split (harness layout for analyze)
    run("evaluate", PY + [
        "evaluate-all", "--models", "Custom_ViT_FineTuned",
        "--checkpoint", ckpt,
        "--set", f"data.test_root={test_dir}",
        "--set", f"eval.output_dir={results}",
        "--set", "eval.batch_size=16",
    ], timeout=2400)
    summ = json.load(open(results / "Custom_ViT_FineTuned" /
                          "evaluation_summary.json"))
    SUMMARY["eval"] = {k: summ[k] for k in ("roc_auc", "eer")}
    log(f"    eval AUC={summ['roc_auc']:.4f} EER={summ['eer']:.4f}")

    # ---- 6. fit probability calibration
    run("calibrate", PY + [
        "analyze", "--calibration", "--results-dir", results])
    cal = json.load(open(results / "calibration_analysis.json"))
    temp = float(cal["Custom_ViT_FineTuned"]["temperature"])
    # full analysis suite over the fresh results tree (distributions,
    # failed cases, summary, figures)
    run("analyze_full", PY + [
        "analyze", "--results-dir", results, "--figures",
        "--test-data-dir", test_dir], timeout=1800)
    figs = list((results / "figures").glob("*.png"))
    SUMMARY["figures"] = len(figs)
    log(f"    analysis suite: {len(figs)} figures rendered")
    SUMMARY["temperature"] = temp
    log(f"    fitted temperature T={temp:.3f}")

    # ---- 7. freeze serving artifacts (operating point + EMA + T baked)
    art_lowlat = WORK / "art_lowlat"
    art_grid = WORK / "art_grid16"
    for name, mode, extra in (
            ("export_lowlat", "lowlat", []),
            ("export_grid16", "batch_grid", ["--batch-size", "16"])):
        run(name, PY + [
            "export-serving", ckpt,
            art_lowlat if mode == "lowlat" else art_grid,
            "--mode", mode, "--threshold", "optimal", "--ema",
            "--temperature", f"{temp}"] + extra, timeout=2400)

    # ---- 8. verify artifacts + offline predict
    run("describe_verify", PY + ["describe", art_lowlat, art_grid,
                                 "--verify"])
    plog = run("predict", PY + [
        "predict", art_grid, test_dir / "subj0",
        "--output", WORK / "scores.csv"], timeout=2400)
    import csv as _csv
    rows = list(_csv.DictReader(open(WORK / "scores.csv")))
    probs = [float(r["prob_live"]) for r in rows]
    assert rows and all(0.0 <= p <= 1.0 for p in probs)
    SUMMARY["predict_rows"] = len(rows)
    log(f"    predict scored {len(rows)} imgs")

    # ---- 9. serve + load-test + hot-swap
    port = 8471
    servelog = WORK / "serve.log"
    with open(servelog, "w") as f:
        serve = subprocess.Popen(
            list(map(str, PY + ["serve", art_lowlat, art_grid,
                                "--port", port, "--max-wait-ms", "2"])),
            stdout=f, stderr=subprocess.STDOUT, env=ENV)
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(600):
            time.sleep(2)
            try:
                urllib.request.urlopen(base + "/healthz", timeout=5)
                break
            except Exception:
                if serve.poll() is not None:
                    print(open(servelog).read()[-4000:])
                    raise SystemExit("serve died during warmup")
        else:
            raise SystemExit("serve never became healthy")
        log("    serve healthy")
        blog = run("serve_bench_raw", PY + [
            "serve-bench", base, "--mode", "raw",
            "--clients", "8", "--requests", "128"], timeout=1200)
        SUMMARY["serve_bench_raw"] = json.loads(
            [l for l in open(blog) if l.strip().startswith("{")][-1])
        blog2 = run("serve_bench_bulk", PY + [
            "serve-bench", base, "--mode", "raw", "--batch", "32",
            "--clients", "2", "--requests", "8"], timeout=1200)
        SUMMARY["serve_bench_bulk"] = json.loads(
            [l for l in open(blog2) if l.strip().startswith("{")][-1])
        # hot-swap: reload must succeed and keep serving
        req = urllib.request.Request(base + "/admin/reload", method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            SUMMARY["reload"] = json.loads(r.read() or b"{}")
        urllib.request.urlopen(base + "/healthz", timeout=10)
        log("    hot-swap reload ok, still healthy")
    finally:
        serve.send_signal(signal.SIGTERM)
        try:
            serve.wait(timeout=60)
        except subprocess.TimeoutExpired:
            serve.kill()

    # ---- 10. torch interop export
    pth = WORK / "best_model.pth"
    run("export_pth", PY + ["export", ckpt, pth, "--ema"])
    import torch
    sd = torch.load(pth, map_location="cpu", weights_only=False)
    sd = sd.get("model_state_dict", sd)
    keys = sorted(sd)
    assert any(k.startswith("vit.") for k in keys), keys[:5]
    assert any(k.startswith("classifier.") for k in keys)
    SUMMARY["pth_tensors"] = len(keys)
    log(f"    .pth export: {len(keys)} tensors, reference key layout")

    SUMMARY["total_seconds"] = round(time.time() - T0, 1)
    out = WORK / "summary.json"
    json.dump(SUMMARY, open(out, "w"), indent=1)
    print(json.dumps(SUMMARY, indent=1))
    log(f"LIFECYCLE COMPLETE -> {out}")


if __name__ == "__main__":
    main()
