#!/usr/bin/env python3
"""Assemble SCALE_r15.json from the round-15 measurement files in /tmp/r15.

Inputs (produced by /tmp/r15/measure.sh + the probe runs):
  bench_1x_r{1,2}.json, bench_10x_r{1,2}.json   — whole-set JVM runs
  iso100x/bench_r{1..4}_<group>.json            — JVM-isolated 100x
      (reps 1-2 single-run; reps 3-4 SPARK_GRAFT_REPEAT=2, so each JVM
       also records a steady-state `q#2` second-run timing)
  recall_{1x,10x}.json                          — RecallProbe lines
  skew_100x_hot{5,30,85}.json                   — SkewBench lines
  suite3_under_load.log                         — 3x full-suite evidence

100x policy: t_100x_s = min over ALL observations (first-run and
steady) — identical in spirit to the r14 min policy, and empirically the
min lands on a steady-state run; first_run_min_s / steady_min_s are
reported alongside so the warm-up premium is visible instead of folded
into variance.
"""
import glob
import json
import os
import sys

D = "/tmp/r15"


def bench(path):
    with open(path) as f:
        return json.load(f)


def collect(paths):
    """first[q] = [first-run times], steady[q] = [in-JVM second-run times]"""
    first, steady, cals = {}, {}, []
    for p in paths:
        d = bench(p)
        cals.append({"cpu_s": round(d["calibration_s"], 3),
                     "shuffle_s": round(d["calibration_shuffle_s"], 3)})
        for k, v in d["queries"].items():
            if v < 0:
                continue
            if "#" in k:
                steady.setdefault(k.split("#")[0], []).append(v)
            else:
                first.setdefault(k, []).append(v)
    return first, steady, cals


def mins(per):
    return {k: min(v) for k, v in per.items()}


def main():
    one_f, _, cal1 = collect(sorted(glob.glob(f"{D}/bench_1x_r*.json")))
    ten_f, _, cal10 = collect(sorted(glob.glob(f"{D}/bench_10x_r*.json")))
    one, ten = mins(one_f), mins(ten_f)

    h_first, h_steady, cal100 = collect(
        sorted(glob.glob(f"{D}/iso100x/bench_r*_*.json")))
    hund = {k: min(h_first[k] + h_steady.get(k, [])) for k in h_first}
    by_rep = {}
    for r in (1, 2, 3, 4):
        f, s, _ = collect(sorted(glob.glob(f"{D}/iso100x/bench_r{r}_*.json")))
        if f:
            by_rep[r] = mins(f)

    def section(big, factor, sf_big, shuffle_big, runs_big, cals, extra=None):
        qs = {}
        flagged = []
        for k in sorted(set(one) & set(big)):
            raw = big[k] / one[k] if one[k] > 0 else None
            per_unit = raw / factor if raw is not None else None
            row = {"t_1x_s": round(one[k], 3),
                   f"t_{factor}x_s": round(big[k], 3),
                   "ratio_raw": round(raw, 2),
                   "ratio_per_unit": round(per_unit, 2)}
            if extra:
                row.update(extra(k))
            qs[k] = row
            if per_unit is not None and per_unit > 1.5 and big[k] > 1.0:
                flagged.append(k)
        return {
            "metric": f"scale_probe_{factor}x",
            "sf_1x": "/root/testdata/sf0.1",
            f"sf_{factor}x": f"{factor}x of sf0.1 via graft.tools.ScaleUp ({sf_big})",
            "shuffle": {"1x": 32, f"{factor}x": shuffle_big},
            "runs": runs_big,
            "policy": "min across all observations per query per scale"
                      + (" (100x JVM-ISOLATED: fresh JVM per family, per "
                         "QUERY for the dedup/similarity family — "
                         "tools/scale_bench.py; reps 3-4 add an in-JVM "
                         "second run = steady state)" if factor == 100 else ""),
            "total_1x_s": round(sum(one[k] for k in qs), 1),
            f"total_{factor}x_s": round(sum(big[k] for k in qs), 1),
            "flagged_superlinear": flagged,
            "queries": qs,
            "calibrations": cals,
        }

    def extra100(k):
        out = {"first_run_min_s": round(min(h_first[k]), 3)}
        if k in h_steady:
            out["steady_min_s"] = round(min(h_steady[k]), 3)
        return out

    fam = [k for k in h_first
           if k.startswith(("q_dedup", "q_sim", "q_corpus_dedup"))]
    spread = {}
    for k in sorted(fam):
        e = {"first_runs_s": [round(x, 1) for x in h_first[k]],
             "first_spread_maxmin": round(max(h_first[k]) / min(h_first[k]), 2)}
        if k in h_steady and len(h_steady[k]) >= 2:
            e["steady_runs_s"] = [round(x, 1) for x in h_steady[k]]
            e["steady_spread_maxmin"] = round(
                max(h_steady[k]) / min(h_steady[k]), 2)
        spread[k] = e

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

    steady_ok = [k for k in spread
                 if spread[k].get("steady_spread_maxmin", 99) <= 1.3]

    doc = {
        "metric": "scale_probes_r15",
        "scope": "standing 37-query scale set (r14's 35 + q_sim_nndescent + "
                 "q_mm_resize_png) at 1x/10x/100x, quiet host, pinned "
                 "calibrations on every recording",
        "host": "local[32], 128 GiB, single node",
        "provenance": "1x/10x: whole-set JVM, 2 reps (continuity with r14). "
                      "100x: 4 JVM-isolated reps (r14 verdict #2), reps 3-4 "
                      "with an in-JVM second run; q_sim_nndescent's 100x "
                      "rows postdate its lineage-truncation fix (6527fda) "
                      "and its min comes from the fixed code.",
        "protocol_note": "every query registered in r15 has 1x/10x/100x "
                         "rows here AND 5-pass quiet BENCH_LOCAL rows at "
                         "final HEAD (r14 'closed by construction' "
                         "discipline)",
        "suite_under_load": {
            "what": "r14 verdict #1 done-criterion: 3 consecutive full-suite "
                    "sbt -batch test runs while an 8-way CPU load ran",
            "results": ["266/266", "266/266", "266/266"],
            "wall_min": [10.2, 10.4, 10.8],
        },
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
        "10x": section(ten, 10, "/tmp/scale10x", 128,
                       {"1x": 2, "10x": 2}, cal10),
        "100x": section(hund, 100, "/tmp/scale100x", 1024,
                        {"1x": 2, "100x": "4 isolated (2 + 2 with repeat)"},
                        None, extra100),
        "decade_10x_to_100x": decade(),
        "rep_variance_100x": {
            "what": "r14 verdict #2: per-query spread on the dedup/"
                    "similarity family under the JVM-isolated protocol. "
                    "FINDING: isolation converts the r14 cross-query "
                    "old-gen coupling into a visible FIRST-RUN premium "
                    "(JIT + page cache, 1.6-6x on the heavy multi-stage "
                    "queries) while the in-JVM STEADY-STATE second runs "
                    "reproduce the r14 shared-JVM mins almost exactly "
                    "(jaccard 51.8 vs 49.8, containment 15.8 vs 15.9, "
                    "corpus_dedup_e2e 41.9 vs 43.8) — the steady rows are "
                    "the cross-round-comparable ones.",
            "per_rep_first_run_totals_s": [
                round(sum(v.values()), 1) for _, v in sorted(by_rep.items())],
            "family_spread": spread,
            "steady_spread_at_or_below_1p3": sorted(steady_ok),
        },
        "host_drift_control": {
            "what": "the first 5-pass set read ~1.2x over r14 on the many "
                    "sub-second queries while BOTH pinned calibrations were "
                    "quiet. Control: the 37-query standing set re-run at the "
                    "SAME HEAD in the same window reads identical to its "
                    "morning run — so the drift is host-side (small-query "
                    "overhead axis neither calibration captures), NOT code. "
                    "XROUND_r14_to_r15's single surviving flag (q_agg_wau, "
                    "0.47->0.67 s) is this effect at sub-second scale.",
            "standing_set_morning_s": round(bench(
                f"{D}/bench_1x_r1.json")["value"], 1),
            "standing_set_control_s": round(bench(
                f"{D}/control_1x.json")["value"], 1)
            if os.path.exists(f"{D}/control_1x.json") else None,
        },
        "nndescent_recall": {
            "what": "recall@5 vs brute-force kNN for the SRP seed graph and "
                    "each NN-descent refinement round (tools/RecallProbe, "
                    "portable buckets — mirrors q_sim_nndescent exactly). "
                    "Gains are modest BY FIXTURE: uniform random synthetic "
                    "embeddings have no manifold structure for neighbor "
                    "transitivity to exploit (see ADVICE open item).",
            "1x": jline(f"{D}/recall_1x.json"),
            "10x": jline(f"{D}/recall_10x.json"),
            "planted_note": "the planted-cluster mode (RecallProbe "
                "'planted': clusters of 4 jittered clones) raises ABSOLUTE "
                "recall (structure is found: seed 0.75 at 1x / 0.65 at 10x "
                "vs 0.37/0.12 on raw random) but the per-round LIFT stays "
                "small — near-identical cluster mates are already "
                "co-bucketed by SRP, so there is little for "
                "neighbor-of-neighbor expansion to recover on THIS fixture "
                "either; the remaining misses are the random cross-cluster "
                "tail of top-5.",
            "1x_planted": jline(f"{D}/recall_1x_planted.json"),
            "10x_planted": jline(f"{D}/recall_10x_planted.json"),
        },
        "skew_ab_100x": {
            "what": "r14 verdict #6: salted(8) vs AQE-skew-join vs plain at "
                    "100x events, broadcast disabled, hot key holding "
                    "5/30/85% of fact rows, min-of-3 per variant "
                    "(tools/SkewBench). Verdict: salting wins every point, "
                    "AQE close behind (within ~25%), unmitigated degrades "
                    "1.3x->5.7x with skew — salt KNOWN-hot keys, AQE is "
                    "the zero-code default for unknown distributions.",
            "hot5": jline(f"{D}/skew_100x_hot5.json"),
            "hot30": jline(f"{D}/skew_100x_hot30.json"),
            "hot85": jline(f"{D}/skew_100x_hot85.json"),
        },
    }
    with open(sys.argv[1] if len(sys.argv) > 1 else "SCALE_r15.json", "w") as f:
        json.dump(doc, f, indent=1)
    worst = max((v.get("steady_spread_maxmin", 0) for v in spread.values()),
                default=None)
    print(f"queries 1x={len(one)} 10x={len(ten)} 100x={len(hund)}; "
          f"first-run totals={doc['rep_variance_100x']['per_rep_first_run_totals_s']}; "
          f"worst steady spread={worst}; "
          f"steady<=1.3x: {len(steady_ok)}/{len(spread)}")


if __name__ == "__main__":
    main()
