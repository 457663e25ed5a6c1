"""Analyze a jax.profiler xplane trace of the train step (or any
program) into a per-op / per-category device-time breakdown.

Uses the installed tensorboard-plugin-profile native converter
(xspace_to_tools_data -> hlo_stats / roofline_model gviz JSON) — the
first op-level look inside the 123 ms train step this project has had;
round-19 established that the axon relay DOES capture device planes.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo \
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python experiments/exp_r20_trace_analysis.py /tmp/trace_train
"""

import collections
import glob
import json
import sys


def load_tool(xplane_files, tool):
    from tensorflow.python.profiler.internal import (
        _pywrap_profiler_plugin as pp)
    out, ok = pp.xspace_to_tools_data(list(xplane_files), tool, {})
    if not ok:
        raise RuntimeError(f"{tool}: {out!r}")
    return json.loads(out)


def rows(gviz):
    cols = [c["id"] for c in gviz["cols"]]
    for r in gviz.get("rows", []):
        yield dict(zip(cols, [c.get("v") for c in r["c"]]))


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_train"
    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    print("xplane:", files)

    hlo = load_tool(files, "hlo_stats")
    all_rows = list(rows(hlo))
    total_self = sum(r["total_self_time"] for r in all_rows)
    print(f"\n== hlo_stats: {len(all_rows)} ops, "
          f"total self time {total_self/1e3:.2f} ms (all executions)\n")

    by_cat = collections.Counter()
    occ_by_cat = collections.Counter()
    for r in all_rows:
        by_cat[r["category"]] += r["total_self_time"]
        occ_by_cat[r["category"]] += r["occurrences"]
    print("-- by HLO category (self time):")
    for cat, t in by_cat.most_common():
        print(f"  {cat:34s} {t/1e3:9.2f} ms  {100*t/total_self:5.1f}%"
              f"  ({int(occ_by_cat[cat])} execs)")

    print("\n-- top 25 ops by self time:")
    for r in sorted(all_rows, key=lambda r: -r["total_self_time"])[:25]:
        name = r["hlo_op_name"][:58]
        print(f"  {r['total_self_time']/1e3:8.2f} ms "
              f"{100*r['total_self_time']/total_self:5.1f}%  "
              f"x{int(r['occurrences']):<4d} {r['category'][:18]:18s} {name}")

    # roofline: bound-by + FLOPS/BW utilizations where present
    try:
        roof = load_tool(files, "roofline_model")
        tables = roof if isinstance(roof, list) else [roof]
        rr = list(rows(tables[0]))
        have = [r for r in rr if r.get("bound_by")]
        agg = collections.Counter()
        for r in have:
            agg[r["bound_by"]] += r.get("total_self_time", 0.0)
        if agg:
            print("\n-- roofline bound-by (self time):")
            tot = sum(agg.values())
            for k, t in agg.most_common():
                print(f"  {k:16s} {t/1e3:9.2f} ms {100*t/tot:5.1f}%")
        util = [r for r in rr
                if r.get("operation") not in (None, "IDLE")
                and r.get("flop_rate_gflops_per_sec")]
        util.sort(key=lambda r: -(r.get("total_self_time") or 0))
        if util:
            print("\n-- top 10 by time: measured GFLOP/s | GiB/s | opint:")
            for r in util[:10]:
                print(f"  {(r.get('total_self_time') or 0)/1e3:8.2f} ms "
                      f"{r.get('flop_rate_gflops_per_sec', 0):9.0f} GF/s "
                      f"{r.get('memory_bw_gibs_per_sec', r.get('hbm_bw_gibs_per_sec', 0)) or 0:7.1f} GiB/s "
                      f"{str(r.get('operation'))[:52]}")
    except Exception as e:  # noqa: BLE001 - roofline schema varies by version
        print("roofline tool unavailable:", e)


if __name__ == "__main__":
    main()
