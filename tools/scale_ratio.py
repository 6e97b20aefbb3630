#!/usr/bin/env python3
"""Combine N full-bench runs at 1x and Fx into SCALE*_r{N}.json.

Per query: min-across-runs at each scale (the shared host injects load
spikes — see PROGRESS r4/r6 — so the minimum is the least-contaminated
observation), raw Fx/1x ratio, and per-unit-data ratio (raw/F).
Queries with per-unit ratio > 1.5 AND a Fx time above the noise floor
are flagged for explanation.

Usage: scale_ratio.py [--factor F] [--shuffle-1x N] [--shuffle-fx N] \
       OUT.json bench_1x_r*.json -- bench_Fx_r*.json
(factor defaults to 10; shuffle args record run provenance — pass what the
bench runs actually used, else the artifact records null, never a guess)
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


USAGE = ("usage: scale_ratio.py [--factor F] [--shuffle-1x N] [--shuffle-fx N]"
         " OUT.json bench_1x_r*.json -- bench_Fx_r*.json")


def main():
    argv = sys.argv[1:]
    factor = 10
    shuffle_1x = None
    shuffle_fx = None
    while argv and argv[0].startswith("--") and argv[0] != "--":
        if len(argv) < 2:
            sys.exit(f"flag {argv[0]} is missing its value\n{USAGE}")
        if argv[0] == "--factor":
            factor = int(argv[1])
        elif argv[0] == "--shuffle-1x":
            shuffle_1x = int(argv[1])
        elif argv[0] == "--shuffle-fx":
            shuffle_fx = int(argv[1])
        else:
            sys.exit(f"unknown flag {argv[0]}\n{USAGE}")
        argv = argv[2:]
    if not argv or "--" not in argv:
        sys.exit(USAGE)
    out = argv[0]
    sep = argv.index("--")
    if sep < 2 or sep == len(argv) - 1:
        sys.exit(f"need at least one bench file on each side of --\n{USAGE}")
    one = mins(argv[1:sep])
    ten = mins(argv[sep + 1:])
    rows = {}
    flagged = []
    for k in sorted(one):
        t1, t10 = one[k], ten.get(k)
        if t10 is None:
            continue
        raw = t10 / t1 if t1 > 0 else 0.0
        unit = raw / factor
        rows[k] = {"t_1x_s": round(t1, 3), f"t_{factor}x_s": round(t10, 3),
                   "ratio_raw": round(raw, 2), "ratio_per_unit": round(unit, 2)}
        if unit > 1.5 and t10 > 1.0:
            flagged.append(k)
    doc = {
        "metric": f"scale_probe_{factor}x",
        "sf_1x": "/root/testdata/sf0.1",
        f"sf_{factor}x": f"{factor}x of sf0.1 via graft.tools.ScaleUp",
        "shuffle": {"1x": shuffle_1x, f"{factor}x": shuffle_fx},
        "runs": {"1x": len(argv[1:sep]), f"{factor}x": len(argv[sep + 1:])},
        "policy": "min across runs per query per scale (shared-host load spikes)",
        "total_1x_s": round(sum(one[k] for k in rows), 1),
        f"total_{factor}x_s": round(sum(ten[k] for k in rows), 1),
        "flagged_superlinear": flagged,
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out}: {len(rows)} queries, flagged={flagged}")


if __name__ == "__main__":
    main()
