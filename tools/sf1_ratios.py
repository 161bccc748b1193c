#!/usr/bin/env python3
"""Merge chunked sf1 bench sidecars and print the per-query sf0.1→sf1
ratio table for SCALE.md (driver-side tooling only). Usage:
    python3 tools/sf1_ratios.py /tmp/bench_sf1_c*.json
Reads the sf0.1 reference from bench_per_query.json in the repo root.
"""
import sys, json, glob

sf01 = json.load(open("/root/repo/bench_per_query.json"))["queries"]
merged = {}
calib = []
for p in sys.argv[1:]:
    d = json.load(open(p))
    merged.update(d["queries"])
    calib.append((d.get("calib_before_ms"), d.get("calib_after_ms"),
                  d.get("loadavg_before"), d.get("loadavg_after")))
print(f"merged {len(merged)} queries from {len(sys.argv)-1} chunks")
print("calibrations per chunk (before_ms, after_ms, load_before, load_after):")
for c in calib:
    print("  ", c)
total = sum(v for v in merged.values() if v >= 0)
print(f"sf1 total: {total:.1f} s")
rows = []
for q, t1 in sorted(merged.items()):
    t0 = sf01.get(q)
    if t0 is None or t0 <= 0 or t1 < 0:
        rows.append((q, t0, t1, None))
    else:
        rows.append((q, t0, t1, t1 / t0))
print("\nqueries >= 0.5 s at sf1, by ratio desc:")
print(f"{'query':32s} {'sf0.1':>7s} {'sf1':>7s} {'ratio':>6s}")
for q, t0, t1, r in sorted(rows, key=lambda x: -(x[3] or 0)):
    if t1 is not None and t1 >= 0.5:
        print(f"{q:32s} {t0 or -1:7.2f} {t1:7.2f} {r or -1:6.1f}")
over = [(q, r) for q, _, t1, r in rows if r and r > 10 and t1 >= 0.5]
print(f"\n>10x at 10x rows (needs a named cause or a fix): {over or 'none'}")
