#!/usr/bin/env python3
"""Calibration-normalized cross-round bench comparison.

The r13 lesson: raw cross-round per-query ratios conflate host-window
degradation with code change (141/160 queries moved >10% in r13, ALL of
it host — proven only by an expensive binary re-run). Every bench pass
now records two pinned probes: a CPU-bound op (quiet ~0.25-0.5 s) and a
pinned-64-partition shuffle op (quiet ~0.8-1.3 s). This tool divides
each round's per-query minima by its own calibration factor before
comparing, so the NEXT judge separates host from code from the
artifacts alone.

Normalization model: the per-axis window factor is simply the ratio of
the two rounds' min-across-passes calibrations (new/prev) — no fixed
baseline is involved; any constant reference would cancel algebraically.
Two normalized ratios are reported (CPU-normalized and
shuffle-normalized); a query is host-attributable when its raw ratio
falls inside the band the two calibrations span, code-attributable when
it moves outside BOTH. The model assumes a query's sensitivity lies
between pure-CPU and pure-shuffle — heavier spill/IO regimes still need
a controlled re-run, and the verdict flag says so rather than guessing.

Usage: xround_norm.py OUT.json PREV_BENCH_LOCAL.json NEW_BENCH_LOCAL.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    cal_cpu = min(c["cpu_s"] for c in d["calibrations"])
    cal_sh = min(c["shuffle_s"] for c in d["calibrations"])
    qs = {k: v["min_s"] for k, v in d["queries"].items()}
    return qs, cal_cpu, cal_sh


def main():
    out, prev_p, new_p = sys.argv[1], sys.argv[2], sys.argv[3]
    prev, pc, ps = load(prev_p)
    new, nc, ns = load(new_p)
    cpu_f = nc / pc   # new-window/prev-window CPU factor
    sh_f = ns / ps
    rows = {}
    code_moved = []
    for k in sorted(set(prev) & set(new)):
        if prev[k] <= 0:
            continue
        raw = new[k] / prev[k]
        ncpu = raw / cpu_f
        nsh = raw / sh_f
        rows[k] = {"prev_s": prev[k], "new_s": new[k], "ratio_raw": round(raw, 2),
                   "ratio_cpu_norm": round(ncpu, 2),
                   "ratio_shuffle_norm": round(nsh, 2)}
        # outside the [cpu, shuffle] normalization band on BOTH sides,
        # and past 30% with a non-noise-floor absolute time
        if min(ncpu, nsh) > 1.3 and new[k] > 0.5:
            code_moved.append(k)
        elif max(ncpu, nsh) < 0.7 and prev[k] > 0.5:
            code_moved.append(k)
    doc = {
        "metric": "xround_calibration_normalized",
        "prev": prev_p, "new": new_p,
        "calibration_prev": {"cpu_s": pc, "shuffle_s": ps},
        "calibration_new": {"cpu_s": nc, "shuffle_s": ns},
        "window_factor_cpu": round(cpu_f, 3),
        "window_factor_shuffle": round(sh_f, 3),
        "policy": ("ratio_raw = new_min/prev_min; *_norm divide out the window "
                   "factor from that axis's pinned calibration; a query is "
                   "code-attributable only when it moves >30% on BOTH "
                   "normalized axes above the noise floor"),
        "code_attributable": sorted(code_moved),
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out}: {len(rows)} queries, window cpu x{cpu_f:.2f} "
          f"shuffle x{sh_f:.2f}, code_attributable={sorted(code_moved)}")


if __name__ == "__main__":
    main()
