#!/usr/bin/env python3
"""Assemble SCALE_r17.json from the round-17 measurement files in /tmp/r17.

Inputs (produced by /tmp/r17/measure.sh + probe runs):
  bench_1x_r{1,2}.json, bench_10x_r{1,2}.json   — whole-set JVM runs
  iso100x/bench_r{1..4}_<group>.json            — JVM-isolated 100x
      (reps 1-2 single-run; reps 3-4 SPARK_GRAFT_REPEAT=2 — in-JVM second
       runs, with the memo reset AND the NEW r17 repeat-row codegen
       prewarm + JIT-quiesce in Bench)
  recall_{1x,10x}_{raw,chained}.json            — RecallProbe lines
  srp_ab_*.json, knn_ab_*.txt                   — r17 A/B probe lines
  evlog_clusters_{10x,100x}/                    — stage-attribution logs

100x NUMBER POLICY (unchanged from r16, formal): t_100x_s = min over ALL
observations of a query in this round's isolated JVMs — first-run and
in-JVM steady alike. Fresh-JVM first runs carry a 1.6-6x JIT/page-cache
premium; in-JVM second runs can absorb a stochastic C2 recompilation
storm. The r17 prewarm (plan + Janino-compile + JIT-quiesce before each
repeat body) is expected to shrink the storm class; the min-over-all
policy stays so the series remains comparable with r14-r16.
"""
import glob
import json
import os
import sys

D = "/tmp/r17"


def bench(path):
    with open(path) as f:
        return json.load(f)


def collect(paths):
    first, steady, cals = {}, {}, []
    for p in paths:
        d = bench(p)
        cals.append({"cpu_s": round(d["calibration_s"], 3),
                     "shuffle_s": round(d["calibration_shuffle_s"], 3),
                     "launch_s": round(d.get("calibration_launch_s", -1), 4)})
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


def jline(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                return json.loads(line)
    return None


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
                      + (" (100x JVM-ISOLATED per family / per query for "
                         "dedup-similarity — tools/scale_bench.py; reps 3-4 "
                         "add an in-JVM second run with memo reset + the "
                         "NEW codegen prewarm/JIT-quiesce)" if factor == 100
                         else ""),
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
    storms = []
    for k in sorted(fam):
        e = {"first_runs_s": [round(x, 1) for x in h_first[k]],
             "first_spread_maxmin": round(max(h_first[k]) / min(h_first[k]), 2)}
        if k in h_steady and len(h_steady[k]) >= 2:
            e["steady_runs_s"] = [round(x, 1) for x in h_steady[k]]
            e["steady_spread_maxmin"] = round(
                max(h_steady[k]) / min(h_steady[k]), 2)
            if e["steady_spread_maxmin"] > 2.5:
                storms.append(k)
        spread[k] = e

    def decade():
        qs = {}
        for k in sorted(set(ten) & set(hund)):
            raw = hund[k] / ten[k] if ten[k] > 0 else None
            qs[k] = {"t_10x_s": round(ten[k], 3), "t_100x_s": round(hund[k], 3),
                     "ratio_raw": round(raw, 2),
                     "ratio_per_unit": round(raw / 10, 2)}
        return qs

    doc = {
        "metric": "scale_probes_r17",
        "scope": "standing 40-query scale set (r16's 38 + the two NEW "
                 "high-dim gated NN-descent queries q_sim_nndescent_highdim "
                 "and q_sim_nndescent_chain) at 1x/10x/100x, quiet host, "
                 "three pinned calibrations on every recording",
        "host": "local[32], 128 GiB, single node",
        "provenance": "1x/10x: whole-set JVM, 2 reps. 100x: 4 JVM-isolated "
                      "reps, reps 3-4 with an in-JVM second run; all rows "
                      "at final r17 HEAD (SrpBucket non-nullable fix, "
                      "bytes-derived bucket layouts, repeat-row codegen "
                      "prewarm all included).",
        "number_policy_100x": __doc__.split("100x NUMBER POLICY")[1]
            .split("\n\n")[0].replace("\n", " ").strip(),
        "calibrations": {
            "note": "cpu_s quiet ~0.2-0.5, shuffle_s pinned-64-partition "
                    "quiet ~0.8-1.6, launch_s empty-32-task-job quiet "
                    "~0.02-0.13; one triple per Bench invocation",
            "1x_runs": cal1, "10x_runs": cal10,
            "100x_runs_per_jvm_minmax": [
                {"cpu_s": min(c["cpu_s"] for c in cal100),
                 "shuffle_s": min(c["shuffle_s"] for c in cal100),
                 "launch_s": min(c["launch_s"] for c in cal100)},
                {"cpu_s": max(c["cpu_s"] for c in cal100),
                 "shuffle_s": max(c["shuffle_s"] for c in cal100),
                 "launch_s": max(c["launch_s"] for c in cal100)}],
        },
        "10x": section(ten, 10, "/tmp/scale10x", 128,
                       {"1x": 2, "10x": 2}, cal10),
        "100x": section(hund, 100, "/tmp/scale100x", 1024,
                        {"1x": 2, "100x": "4 isolated (2 + 2 with repeat)"},
                        None, extra100),
        "decade_10x_to_100x": decade(),
        "rep_variance_100x": {
            "what": "per-query spread on the dedup/similarity family under "
                    "the JVM-isolated protocol. r16 verdict #7 done-check: "
                    "with the repeat-row codegen prewarm + JIT-quiesce in "
                    "Bench, steady rows should no longer absorb 70 s C2 "
                    "storms (storm class = steady spread > 2.5x).",
            "per_rep_first_run_totals_s": [
                round(sum(v.values()), 1) for _, v in sorted(by_rep.items())],
            "storm_class_outliers": storms,
            "family_spread": spread,
        },
        "srp_bucket_ab": {
            "what": "r16 verdict #2: the fused SrpBucket codegen expression "
                    "(swept in at r16 end-of-round) vs the HOF "
                    "aggregate(zip_with) form it replaced — parity-gated "
                    "(the probe requires 0 mismatching buckets before "
                    "timing), interleaved arms, full-corpus bucket scan.",
            "100x_dim64": jline(f"{D}/srp_ab_100x_d64.json"),
            "100x_dim768": jline(f"{D}/srp_ab_100x_d768.json"),
            "1x_dim64": jline(f"{D}/srp_ab_1x_d64.json"),
            "finding": "6.4x at 200k vectors/dim64/12 bits (0.15 vs "
                       "0.97 s), 47.5x at dim768 (0.18 vs 8.67 s), 1.6x "
                       "at 2k vectors (overhead-bound). The expression "
                       "also restores the non-nullable bucket the HOF "
                       "fold produced — the r16 ReuseExchange regression "
                       "was its nullability, fixed + spec-pinned this "
                       "round (ExpressionSpec/ExchangeReuseSpec).",
        },
        "knn_decade_attribution": {
            "what": "r16 verdict #5: q_sim_knn/q_dedup_knn_e2e decade "
                    "ratios (7.9/8.1). Decomposition (KnnStageProbe, "
                    "KnnBucketAB, bucket-histogram cross-check).",
            "candidate_model": "per-row candidates = targetPop x (nBits+1) "
                "x skew(N): 381/453/985 per row at 1x/10x/100x; the 100x "
                "count (196,944,936 pairs) matches the bucket histogram "
                "exactly (sum over buckets of pop x (own + Hamming-1 "
                "pops)). Growth drivers per decade: probe fan-out "
                "(nBits+1: 10->13) and real-data bucket skew "
                "(sum(pop^2)/flat: 1.16 -> 1.55; max pop 414 vs mean 48.9).",
            "stage_probe_100x": jline(f"{D}/knn_stage_probe_100x.json"),
            "per_pair_cost": "~50 ns steady (join 1.5 s + cosine ~4 s + "
                "rank ~5 s for 197M pairs once codegen is warm); first "
                "runs pay a 6-10x C2 warm-up premium over the generated "
                "loops (117 -> 31 -> 10.8 -> 10.2 s across 4 in-JVM "
                "reps), which the min-over-all policy absorbs.",
            "bucket_dial_ab": {
                "10x_with_recall": jline(f"{D}/knn_ab_10x.txt"),
                "100x_walls": jline(f"{D}/knn_ab_100x.txt"),
                "verdict": "targetBucketSize 64->32->16 cuts 100x wall "
                    "62->9->5.4 s but recall@5 falls 0.119->0.086->0.061 "
                    "(10x, vs brute force) — recall-priced 1:1, NOT "
                    "shipped; the bound above is pinned in knnGraph's "
                    "scaladoc instead and the dial stays a caller "
                    "parameter.",
            },
        },
        "clusters_attribution": {
            "what": "r16 verdict #4: q_dedup_clusters 100x profile "
                    "(largest wall-time in the standing set).",
            "finding": "~75% edge generation, ~12% contraction: of a "
                "90 s 100x run, the jaccard candidate+verify joins "
                "account for the top stages (27.0 s wall/849 task-s "
                "writing 8.9 GB, 17.1 s/537 task-s writing 6.9 GB, "
                "11.6 s/344 task-s reading 8.9 GB, 11.3 s checkpoint "
                "reading 7.0 GB) — the shuffled bytes are the token-hash "
                "arrays riding candidate pairs through the two "
                "ReusedExchange verify joins; the distributed contraction "
                "rounds + bounded driver finish are the ~10 s tail "
                "(stages of 6.3/2.0/1.0 s). The 6.66 decade ratio is "
                "candidate growth in the verify join under pinned "
                "lossless prunes — linear-per-candidate work, no "
                "parallelism defect (1024/501-task stages), no spill. "
                "Knob at 100 TB: the corpus-gated SHJ dial (shipped r14) "
                "and array-bytes reduction; no plan change shipped this "
                "round.",
            "profile_file": "clusters_100x_profile.txt (stage table)",
        },
        "bucket_layout_derivation": {
            "what": "r16 ADVICE/verdict #6: bucketed-layout bucket counts "
                    "now derive from measured UnsafeRow bytes against one "
                    "2 MiB target (Tables.bucketCountByBytes) instead of "
                    "three hand-tuned per-table row divisors.",
            "layout_change_at_100x": "embed pair 80->53 buckets, band "
                "table 20->38, orders pair 60->229; sf0.001-0.1 all stay "
                "at the floor of 8 (spec-pinned, TablesSpec). The "
                "embed-incremental and colocated-join rows in this "
                "artifact measure the NEW layouts.",
        },
        "new_queries": {
            "q_sim_nndescent_highdim": "one gated round at dim=768 "
                "(prescoreFactor=3) over the deterministic extendDim "
                "fixture — the side of the r16 crossover where the int8 "
                "gate wins 4.4x; full DuckDB oracle "
                "(PortableSql.nnDescentCtes dim/prescore params).",
            "q_sim_nndescent_chain": "TWO chained gated rounds at "
                "dim=768 (PortableSql.nnDescentChainCtes composes the "
                "round CTE; oracle replays seed, both expansions, both "
                "int8 pre-ranks and exact reranks exactly).",
        },
        "nndescent_recall": {
            "what": "recall@5 vs brute-force kNN for the SRP seed graph "
                    "and each exact NN-descent round (tools/RecallProbe; "
                    "raw + chained fixtures — continuity with SCALE_r16).",
            "1x_raw": jline(f"{D}/recall_1x_raw.json"),
            "10x_raw": jline(f"{D}/recall_10x_raw.json"),
            "1x_chained": jline(f"{D}/recall_1x_chained.json"),
            "10x_chained": jline(f"{D}/recall_10x_chained.json"),
        },
    }
    with open(sys.argv[1] if len(sys.argv) > 1 else "SCALE_r17.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(f"queries 1x={len(one)} 10x={len(ten)} 100x={len(hund)}; "
          f"first-run totals={doc['rep_variance_100x']['per_rep_first_run_totals_s']}; "
          f"flagged10x={doc['10x']['flagged_superlinear']} "
          f"flagged100x={doc['100x']['flagged_superlinear']} "
          f"storms={storms}")


if __name__ == "__main__":
    main()
