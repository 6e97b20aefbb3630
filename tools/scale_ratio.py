#!/usr/bin/env python3
"""Combine N full-bench runs at 1x and 10x into SCALE_r{N}.json.

Per query: min-across-runs at each scale (the shared host injects load
spikes — see PROGRESS r4/r6 — so the minimum is the least-contaminated
observation), raw 10x/1x ratio, and per-unit-data ratio (raw/10).
Queries with per-unit ratio > 1.5 AND a 10x time above the noise floor
are flagged for explanation.

Usage: scale_ratio.py OUT.json bench_1x_r*.json -- bench_10x_r*.json
"""
import json
import sys


def mins(paths):
    per = {}
    for p in paths:
        with open(p) as f:
            qs = json.load(f)["queries"]
        for k, v in qs.items():
            if "#" in k or v < 0:
                continue
            per.setdefault(k, []).append(v)
    return {k: min(v) for k, v in per.items()}


def main():
    out = sys.argv[1]
    sep = sys.argv.index("--")
    one = mins(sys.argv[2:sep])
    ten = mins(sys.argv[sep + 1:])
    rows = {}
    flagged = []
    for k in sorted(one):
        t1, t10 = one[k], ten.get(k)
        if t10 is None:
            continue
        raw = t10 / t1 if t1 > 0 else 0.0
        unit = raw / 10.0
        rows[k] = {"t_1x_s": round(t1, 3), "t_10x_s": round(t10, 3),
                   "ratio_raw": round(raw, 2), "ratio_per_unit": round(unit, 2)}
        if unit > 1.5 and t10 > 1.0:
            flagged.append(k)
    doc = {
        "metric": "scale_probe_10x",
        "sf_1x": "/root/testdata/sf0.1",
        "sf_10x": "10x of sf0.1 via graft.tools.ScaleUp",
        "shuffle": {"1x": 32, "10x": 128},
        "runs": {"1x": len(sys.argv[2:sep]), "10x": len(sys.argv[sep + 1:])},
        "policy": "min across runs per query per scale (shared-host load spikes)",
        "total_1x_s": round(sum(one[k] for k in rows), 1),
        "total_10x_s": round(sum(ten[k] for k in rows), 1),
        "flagged_superlinear": flagged,
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out}: {len(rows)} queries, flagged={flagged}")


if __name__ == "__main__":
    main()
