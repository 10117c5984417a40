#!/usr/bin/env python3
"""Fold fresh per-SF bench runs of a query subset into BENCH_curve.json.

Usage: refresh_curve.py <note> <queries_json_file_per_sf>...
Each input is a BENCH_queries.json produced by `graft.Bench` with
SPARK_GRAFT_ONLY at one SF (the file records its own sf). For each query
present, the curve entry's value at that SF is REPLACED by the min of the
runs passed for that SF (the query's code changed this round, so prior
values describe dead code; the min methodology applies across the fresh
runs only). The x10 ratio for the top step is recomputed.
"""
import json, sys, collections, pathlib

note = sys.argv[1]
curve_path = pathlib.Path("BENCH_curve.json")
curve = json.loads(curve_path.read_text())
best = collections.defaultdict(dict)  # q -> sf -> min sec
for f in sys.argv[2:]:
    d = json.loads(pathlib.Path(f).read_text())
    sf = "sf" + d["sf"].rstrip("/").split("/sf")[-1]
    for q, sec in d["queries"].items():
        cur = best[q].get(sf)
        best[q][sf] = min(cur, sec) if cur is not None else sec
cs = curve["curve_sec"]
for q, by_sf in sorted(best.items()):
    row = cs.setdefault(q, {})
    for sf, sec in by_sf.items():
        row[sf] = round(sec, 3)
    if "sf0.01" in row and "sf0.1" in row and row["sf0.01"] > 0:
        row["x10_data_0.01_to_0.1"] = round(row["sf0.1"] / row["sf0.01"], 2)
curve["r20_refresh"] = note
curve_path.write_text(json.dumps(curve, indent=1))
print(f"refreshed {len(best)} queries: {', '.join(sorted(best))}")
