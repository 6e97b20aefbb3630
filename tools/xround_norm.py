#!/usr/bin/env python3
"""Calibration-normalized cross-round bench comparison.

The r13 lesson: raw cross-round per-query ratios conflate host-window
degradation with code change (141/160 queries moved >10% in r13, ALL of
it host — proven only by an expensive binary re-run). Every bench pass
now records three pinned probes: a CPU-bound op (quiet ~0.25-0.5 s), a
pinned-64-partition shuffle op (quiet ~0.8-1.3 s), and — since r16 — an
empty 32-task job (quiet ~0.02-0.08 s) for the JOB-LAUNCH/scheduler
axis. This tool divides each round's per-query minima by its own
calibration factor before comparing, so the NEXT judge separates host
from code from the artifacts alone.

Why the third axis (r15 verdict #3): the r15 like-for-like drift
(69.4 -> 81.3 s) was invisible to both the CPU and shuffle probes —
sub-second queries moved 1.2-1.4x while both stayed quiet — and needed
a manual same-HEAD control run to adjudicate. Per-job fixed costs (DAG
submit, task serialize/launch/collect) dominate sub-second queries and
neither a 512M-row compute op nor a 16M-row shuffle op is sensitive to
them; the empty-job probe is.

Normalization model: the per-axis window factor is simply the ratio of
the two rounds' min-across-passes calibrations (new/prev) — no fixed
baseline is involved; any constant reference would cancel algebraically.
Up to three normalized ratios are reported; a query is host-attributable
when its raw ratio falls inside the band the calibrations span,
code-attributable when it moves outside ALL available axes. The launch
axis applies ONLY to sub-second queries (both rounds < 1 s): per-job
fixed cost is additive, so for a multi-second query it never explains a
>30% move — and since the probe's quiet band is 0.02-0.08 s, a loud
launch window yields 2-4x factors that would otherwise divide
multi-second ratios and misclassify genuine code moves as host (r16
ADVICE). When the PREV round predates the launch probe the axis is
reported as null and the two-axis rule applies unchanged.
Heavier spill/IO regimes still need a controlled re-run, and the verdict
flag says so rather than guessing.

Usage: xround_norm.py OUT.json PREV_BENCH_LOCAL.json NEW_BENCH_LOCAL.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    cal_cpu = min(c["cpu_s"] for c in d["calibrations"])
    cal_sh = min(c["shuffle_s"] for c in d["calibrations"])
    launches = [c["launch_s"] for c in d["calibrations"] if "launch_s" in c]
    cal_launch = min(launches) if launches else None
    qs = {k: v["min_s"] for k, v in d["queries"].items()}
    return qs, cal_cpu, cal_sh, cal_launch


def main():
    out, prev_p, new_p = sys.argv[1], sys.argv[2], sys.argv[3]
    prev, pc, ps, pl = load(prev_p)
    new, nc, ns, nl = load(new_p)
    cpu_f = nc / pc   # new-window/prev-window CPU factor
    sh_f = ns / ps
    launch_f = (nl / pl) if (pl and nl) else None
    rows = {}
    code_moved = []
    for k in sorted(set(prev) & set(new)):
        if prev[k] <= 0:
            continue
        raw = new[k] / prev[k]
        norms = {"ratio_cpu_norm": raw / cpu_f, "ratio_shuffle_norm": raw / sh_f}
        # The launch axis is SUB-SECOND-ONLY (r16 ADVICE): per-job launch
        # cost is additive and tiny, so for a multi-second query a loud
        # launch window (2-4x factors are routine at the probe's 0.02-0.08 s
        # quiet band) can never explain a >30% move — dividing such a
        # query's ratio by the launch factor only misclassifies genuine
        # code moves as host. Apply it where fixed per-job cost actually
        # dominates (both rounds sub-second); elsewhere the cpu/shuffle
        # axes decide, exactly as the model note above says.
        if launch_f and prev[k] < 1.0 and new[k] < 1.0:
            norms["ratio_launch_norm"] = raw / launch_f
        rows[k] = {"prev_s": prev[k], "new_s": new[k], "ratio_raw": round(raw, 2),
                   **{kk: round(vv, 2) for kk, vv in norms.items()}}
        # outside the normalization band on EVERY available axis, and past
        # 30% with a non-noise-floor absolute time
        if min(norms.values()) > 1.3 and new[k] > 0.5:
            code_moved.append(k)
        elif max(norms.values()) < 0.7 and prev[k] > 0.5:
            code_moved.append(k)
    doc = {
        "metric": "xround_calibration_normalized",
        "prev": prev_p, "new": new_p,
        "calibration_prev": {"cpu_s": pc, "shuffle_s": ps, "launch_s": pl},
        "calibration_new": {"cpu_s": nc, "shuffle_s": ns, "launch_s": nl},
        "window_factor_cpu": round(cpu_f, 3),
        "window_factor_shuffle": round(sh_f, 3),
        "window_factor_launch": round(launch_f, 3) if launch_f else None,
        "policy": ("ratio_raw = new_min/prev_min; *_norm divide out the window "
                   "factor from that axis's pinned calibration (cpu, shuffle, "
                   "and since r16 job-launch — the launch axis sub-second-only "
                   "per r16 ADVICE, since additive per-job cost never explains "
                   "a >30% move on a multi-second query); a query is "
                   "code-attributable only when it moves >30% on EVERY "
                   "normalized axis that applies to it above the noise floor"),
        "number_policy": ("UNIFORM (r15 verdict #2): every number here is the "
                          "min across that round's 5 full first-run passes "
                          "(BENCH_LOCAL min_s — repeat rows never feed this "
                          "artifact); the 100x scale tables use min over ALL "
                          "observations, first and in-JVM steady alike "
                          "(SCALE_r16 number_policy_100x)"),
        "code_attributable": sorted(code_moved),
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    launch_txt = f"launch x{launch_f:.2f}" if launch_f else "launch n/a"
    print(f"wrote {out}: {len(rows)} queries, window cpu x{cpu_f:.2f} "
          f"shuffle x{sh_f:.2f} {launch_txt}, "
          f"code_attributable={sorted(code_moved)}")


if __name__ == "__main__":
    main()