#!/usr/bin/env python3
"""Assemble SCALE_r15.json from the round-15 measurement files in /tmp/r15.

Inputs (produced by /tmp/r15/measure.sh + the probe runs):
  bench_1x_r{1,2}.json, bench_10x_r{1,2}.json       — whole-set JVM runs
  iso100x/bench_r{1..4}_<group>.json                — JVM-isolated 100x
  recall_{1x,10x}.json                              — RecallProbe lines
  skew_100x_hot{30,85}.json                         — SkewBench lines
Emits the r14-shaped sections (10x/100x/decade/calibrations) plus
rep_variance_100x computed from the per-rep isolated files, the
nndescent recall table, and the skew A/B table.
"""
import glob
import json
import os
import sys

D = "/tmp/r15"


def bench(path):
    with open(path) as f:
        return json.load(f)


def mins(paths):
    per = {}
    cals = []
    for p in paths:
        d = bench(p)
        cals.append({"cpu_s": round(d["calibration_s"], 3),
                     "shuffle_s": round(d["calibration_shuffle_s"], 3)})
        for k, v in d["queries"].items():
            if "#" in k or v < 0:
                continue
            per.setdefault(k, []).append(v)
    return {k: min(v) for k, v in per.items()}, per, cals


def section(one, big, factor, sf_big, shuffle_big, runs_big, cals):
    qs = {}
    flagged = []
    for k in sorted(set(one) & set(big)):
        raw = big[k] / one[k] if one[k] > 0 else None
        per_unit = raw / factor if raw is not None else None
        qs[k] = {"t_1x_s": round(one[k], 3), f"t_{factor}x_s": round(big[k], 3),
                 "ratio_raw": round(raw, 2), "ratio_per_unit": round(per_unit, 2)}
        if per_unit is not None and per_unit > 1.5 and big[k] > 1.0:
            flagged.append(k)
    return {
        "metric": f"scale_probe_{factor}x",
        "sf_1x": "/root/testdata/sf0.1",
        f"sf_{factor}x": f"{factor}x of sf0.1 via graft.tools.ScaleUp ({sf_big})",
        "shuffle": {"1x": 32, f"{factor}x": shuffle_big},
        "runs": {"1x": 2, f"{factor}x": runs_big},
        "policy": "min across runs per query per scale"
                  + (" (JVM-isolated: fresh JVM per family, per query for the"
                     " dedup/similarity family — tools/scale_bench.py)"
                     if factor == 100 else ""),
        "total_1x_s": round(sum(one[k] for k in qs), 1),
        f"total_{factor}x_s": round(sum(big[k] for k in qs), 1),
        "flagged_superlinear": flagged,
        "queries": qs,
        "calibrations": cals,
    }


def main():
    one, _, cal1 = mins(sorted(glob.glob(f"{D}/bench_1x_r*.json")))
    ten, _, cal10 = mins(sorted(glob.glob(f"{D}/bench_10x_r*.json")))
    hundred_by_rep = {}
    for r in (1, 2, 3, 4):
        paths = sorted(glob.glob(f"{D}/iso100x/bench_r{r}_*.json"))
        if paths:
            hundred_by_rep[r], _, _ = mins(paths)
    hund, perq, cal100 = mins(sorted(glob.glob(f"{D}/iso100x/bench_r*_*.json")))

    # per-rep spread on the dedup/similarity family — the r14 verdict #2
    # done-criterion (target: spread <= ~1.3x under JVM isolation)
    fam = [k for k in perq if k.startswith(("q_dedup", "q_sim", "q_corpus_dedup"))]
    spread = {k: {"reps_s": [round(x, 1) for x in perq[k]],
                  "spread_maxmin": round(max(perq[k]) / min(perq[k]), 2)}
              for k in sorted(fam)}
    rep_totals = [round(sum(v.values()), 1)
                  for _, v in sorted(hundred_by_rep.items())]

    def decade():
        qs = {}
        for k in sorted(set(ten) & set(hund)):
            raw = hund[k] / ten[k] if ten[k] > 0 else None
            qs[k] = {"t_10x_s": round(ten[k], 3), "t_100x_s": round(hund[k], 3),
                     "ratio_raw": round(raw, 2), "ratio_per_unit": round(raw / 10, 2)}
        return qs

    def jline(path):
        if not os.path.exists(path):
            return None
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
        return None

    doc = {
        "metric": "scale_probes_r15",
        "scope": "standing 37-query scale set (r14's 35 + q_sim_nndescent + "
                 "q_mm_resize_png) at 1x/10x/100x, quiet host, pinned "
                 "calibrations on every recording",
        "host": "local[32], 128 GiB, single node",
        "provenance": "1x/10x: whole-set JVM, 2 reps (continuity with r14). "
                      "100x: 4 reps, JVM-ISOLATED per family and per query "
                      "for the dedup/similarity family (r14 verdict #2) — "
                      "tools/scale_bench.py; min policy throughout.",
        "protocol_note": "every query registered in r15 has 1x/10x/100x rows "
                         "here AND 5-pass quiet BENCH_LOCAL rows at final "
                         "HEAD (r14 'closed by construction' discipline)",
        "calibrations": {
            "note": "cpu_s quiet ~0.25-0.5, shuffle_s pinned-64-partition "
                    "quiet ~0.8-1.6; one pair per Bench invocation "
                    "(per-JVM at 100x)",
            "1x_runs": cal1, "10x_runs": cal10,
            "100x_runs_per_jvm_minmax": [
                {"cpu_s": min(c["cpu_s"] for c in cal100),
                 "shuffle_s": min(c["shuffle_s"] for c in cal100)},
                {"cpu_s": max(c["cpu_s"] for c in cal100),
                 "shuffle_s": max(c["shuffle_s"] for c in cal100)}],
        },
        "10x": section(one, ten, 10, "/tmp/scale10x", 128, 2, cal10),
        "100x": section(one, hund, 100, "/tmp/scale100x", 1024, 4, None),
        "decade_10x_to_100x": decade(),
        "rep_variance_100x": {
            "what": "per-rep standing-set totals and per-query spread on the "
                    "dedup/similarity family under the NEW JVM-isolated "
                    "protocol (r14 verdict #2: target spread <= ~1.3x; r14 "
                    "single-JVM swings were up to 15.7x)",
            "rep_totals_s": rep_totals,
            "family_spread": spread,
        },
        "nndescent_recall": {
            "what": "recall@5 vs brute-force kNN for the SRP seed graph and "
                    "each NN-descent refinement round (tools/RecallProbe, "
                    "portable buckets — mirrors q_sim_nndescent exactly)",
            "1x": jline(f"{D}/recall_1x.json"),
            "10x": jline(f"{D}/recall_10x.json"),
        },
        "skew_ab_100x": {
            "what": "r14 verdict #6: salted vs AQE-skew-join vs plain at "
                    "100x events, hot key holding ~30% (and 85% for "
                    "contrast) of fact rows, broadcast disabled, "
                    "min-of-3 per variant (tools/SkewBench)",
            "hot30": jline(f"{D}/skew_100x_hot30.json"),
            "hot85": jline(f"{D}/skew_100x_hot85.json"),
        },
    }
    with open(sys.argv[1] if len(sys.argv) > 1 else "SCALE_r15.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(f"queries 1x={len(one)} 10x={len(ten)} 100x={len(hund)}; "
          f"rep_totals={rep_totals}; "
          f"worst family spread="
          f"{max((v['spread_maxmin'] for v in spread.values()), default=None)}")


if __name__ == "__main__":
    main()
