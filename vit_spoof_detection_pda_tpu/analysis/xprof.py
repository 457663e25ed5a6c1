"""XProf trace analysis: per-op device-time tables from a jax.profiler
trace directory.

The reference's only observability is tqdm postfixes (SURVEY §5); this
module closes the loop on the framework's profiler story: capture with
``telemetry.profile_dir`` (Trainer, first epoch) or ``benchmark
--profile DIR`` (exactly the benchmarked program), then ``analyze
--xprof DIR`` for the breakdown — no TensorBoard server needed.  Works
on traces captured through the axon relay (device planes verified,
BENCH_NOTES round 19; the round-20 train-step anatomy was produced by
this path).

Converter: tensorboard-plugin-profile's native xspace tools (optional
dependency — install alongside tensorflow; everything degrades with a
clear message when absent).
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
from typing import Optional


def find_xplanes(trace_dir: str) -> list:
    return sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                            recursive=True))


def _converter():
    # the pure-python protobuf impl must be selected before
    # google.protobuf loads; if something already loaded the C++ impl
    # the plugin's older generated code cannot register its descriptors
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    try:
        from tensorflow.python.profiler.internal import (
            _pywrap_profiler_plugin as pp)
    except ImportError as e:
        raise RuntimeError(
            "xprof analysis needs tensorflow + tensorboard-plugin-profile "
            f"({e})") from e
    return pp


def load_tool(xplane_files, tool: str):
    """Run one plugin tool (hlo_stats, roofline_model, op_profile, ...)
    over the xplane files; returns parsed JSON (gviz tables)."""
    pp = _converter()
    out, ok = pp.xspace_to_tools_data(list(xplane_files), tool, {})
    if not ok:
        raise RuntimeError(f"xprof tool {tool!r} failed: {out!r}")
    try:
        return json.loads(out)
    except Exception as e:  # pragma: no cover - descriptor-registry issues
        raise RuntimeError(
            f"xprof tool {tool!r} returned non-JSON output; if protobuf "
            "was already loaded with the C++ implementation, re-run with "
            "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python") from e


def gviz_rows(gviz) -> list:
    cols = [c["id"] for c in gviz["cols"]]
    return [dict(zip(cols, [c.get("v") for c in r["c"]]))
            for r in gviz.get("rows", [])]


def summarize_trace(trace_dir: str, *, top: int = 25,
                    steps: Optional[int] = None) -> dict:
    """Aggregate a trace into {by_category, top_ops, bound_by, totals}.

    ``steps`` divides every total into per-step time (pass the traced
    execution count, e.g. benchmark iters); otherwise raw totals over
    the whole capture are reported.  Ops are grouped by base HLO name
    (``.N`` suffixes merged) + source line so the 12 per-layer clones
    of one fusion read as one row.
    """
    files = find_xplanes(trace_dir)
    if not files:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    hlo = gviz_rows(load_tool(files, "hlo_stats"))
    div = float(steps or 1)

    by_cat = collections.Counter()
    for r in hlo:
        by_cat[r["category"]] += r["total_self_time"]
    total = sum(by_cat.values())

    agg = collections.defaultdict(lambda: {
        "time_us": 0.0, "execs": 0, "category": "", "source": ""})
    for r in hlo:
        base = re.sub(r"\.\d+$", "", r["hlo_op_name"])
        key = (base, r.get("source_info") or "")
        a = agg[key]
        a["time_us"] += r["total_self_time"]
        a["execs"] += int(r["occurrences"])
        a["category"] = r["category"]
        a["source"] = r.get("source_info") or ""
    top_ops = [
        {"op": k[0], "source": k[1], "category": v["category"],
         "execs": v["execs"], "ms": v["time_us"] / 1e3 / div}
        for k, v in sorted(agg.items(),
                           key=lambda kv: -kv[1]["time_us"])[:top]]

    bound = collections.Counter()
    try:
        roof = load_tool(files, "roofline_model")
        t0 = roof[0] if isinstance(roof, list) else roof
        seen = {}
        for r in gviz_rows(t0):
            op = r.get("operation")
            if op and op not in seen and r.get("bound_by"):
                seen[op] = r
        for r in seen.values():
            bound[r["bound_by"]] += r.get("total_self_time") or 0.0
    except Exception:  # noqa: BLE001 - roofline schema varies by version
        pass

    bound_total = sum(bound.values())
    return {
        "xplane_files": files,
        "n_ops": len(hlo),
        "total_device_ms": total / 1e3 / div,
        "per_step": steps is not None,
        "by_category": [
            {"category": c, "ms": t / 1e3 / div,
             "percent": (100.0 * t / total) if total else 0.0}
            for c, t in by_cat.most_common()],
        "top_ops": top_ops,
        "bound_by": [
            {"bound_by": k, "ms": t / 1e3 / div,
             "percent": (100.0 * t / bound_total) if bound_total else 0.0}
            for k, t in bound.most_common()],
    }


def print_summary(summary: dict, repo_root: Optional[str] = None) -> None:
    unit = "ms/step" if summary["per_step"] else "ms total"
    print(f"{len(summary['xplane_files'])} xplane file(s), "
          f"{summary['n_ops']} ops, device time "
          f"{summary['total_device_ms']:.2f} {unit}")
    print("\n-- by HLO category:")
    for r in summary["by_category"]:
        print(f"  {r['category']:34s} {r['ms']:9.2f} {unit:8s} "
              f"{r['percent']:5.1f}%")
    print(f"\n-- top {len(summary['top_ops'])} op groups:")
    for r in summary["top_ops"]:
        src = r["source"]
        if repo_root and src.startswith(repo_root):
            src = src[len(repo_root):].lstrip("/")
        print(f"  {r['ms']:8.2f} {unit:8s} x{r['execs']:<5d} "
              f"{r['category'][:20]:20s} {r['op'][:34]:34s} {src}")
    if summary["bound_by"]:
        print("\n-- roofline bound-by (per-op attribution; does NOT "
              "compose into program time — overlapped work):")
        for r in summary["bound_by"]:
            print(f"  {r['bound_by']:12s} {r['ms']:9.2f} {unit:8s} "
                  f"{r['percent']:5.1f}%")
    if not summary["by_category"]:
        print("\n(no device HLO rows — host-only trace?  CPU-backend "
              "captures carry no TPU device plane)")
