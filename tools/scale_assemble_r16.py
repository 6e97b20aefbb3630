#!/usr/bin/env python3
"""Assemble SCALE_r16.json from the round-16 measurement files in /tmp/r16.

Inputs (produced by /tmp/r16/measure.sh + probe runs):
  bench_1x_r{1,2}.json, bench_10x_r{1,2}.json   — whole-set JVM runs
  iso100x/bench_r{1..4}_<group>.json            — JVM-isolated 100x
      (reps 1-2 single-run; reps 3-4 SPARK_GRAFT_REPEAT=2 — in-JVM
       second runs, WITH the r16 between-repeat memo reset in Bench)
  recall_{1x,10x}_{raw,planted,chained}.json    — RecallProbe lines
  diag_clusters_100x.txt                        — inversion diag lines
  nndescent_ab_100x.json / _1x.json             — NnDescentAB lines

100x NUMBER POLICY (r15 verdict #2, now formal): t_100x_s = min over
ALL observations of a query in this round's isolated JVMs — first-run
and in-JVM steady alike. Rationale: the two contamination modes pull in
OPPOSITE directions (fresh-JVM first runs carry a 1.6-6x JIT/page-cache
premium; in-JVM second runs can be inflated by the same-JVM residue
effect attributed in `inversion_attribution`), so neither "first" nor
"steady" is uniformly the clean observation — the min is, and it is the
policy r14 used, keeping every cross-round series comparable.
first_run_min_s / steady_min_s are reported per query so both premiums
stay visible. Memo honesty (r15 verdict #1): Bench now clears
query-level memos (bpe merges, sizing counts) between repeats, so a
steady row can never record a memo hit standing in for the work;
q_corpus_bpe_apply keeps its warm-memo semantics by documented design
(apply-only cost model).
"""
import glob
import json
import os
import re
import sys

D = "/tmp/r16"


def bench(path):
    with open(path) as f:
        return json.load(f)


def collect(paths):
    """first[q] = [first-run times], steady[q] = [in-JVM 2nd-run times]"""
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


def diag_lines(path):
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"diag"'):
                out.append(json.loads(line))
    return out


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
                         "add an in-JVM second run WITH the between-repeat "
                         "memo reset, r15 verdict #1)" if factor == 100 else ""),
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

    bpe_ok = None
    if "q_corpus_bpe" in hund and "q_corpus_bpe" in ten:
        bpe_ok = hund["q_corpus_bpe"] >= ten["q_corpus_bpe"]

    doc = {
        "metric": "scale_probes_r16",
        "scope": "standing 38-query scale set (r15's 37 + q_corpus_bpe_apply, "
                 "added per r15 verdict #1) at 1x/10x/100x, quiet host, "
                 "pinned calibrations (cpu, shuffle, and NEW job-launch "
                 "axis) on every recording",
        "host": "local[32], 128 GiB, single node",
        "provenance": "1x/10x: whole-set JVM, 2 reps (continuity with "
                      "r14/r15). 100x: 4 JVM-isolated reps, reps 3-4 with "
                      "an in-JVM second run; ALL rows postdate the r16 "
                      "between-repeat memo reset (Bench.scala), so steady "
                      "rows measure work, never memo hits.",
        "number_policy_100x": __doc__.split("100x NUMBER POLICY")[1]
            .split("\n\n")[0].replace("\n", " ").strip(),
        "bpe_rows_re_recorded": {
            "what": "r15 verdict #1 done-criterion: q_corpus_bpe's 100x "
                    "rows re-recorded under the memo reset; its 100x min "
                    "must be >= its 10x time (the r15 0.077 s row was a "
                    "bpeMergeCache hit).",
            "q_corpus_bpe_100x_ge_10x": bpe_ok,
            "policy_note": "Bench clears query-level memos between repeats "
                           "(QueryMemos.reset); q_corpus_bpe_apply is "
                           "repeat-exempt BY DESIGN: its first run consumes "
                           "the warm memo (train-once/apply-everywhere cost "
                           "model), so its repeats legitimately keep it.",
        },
        "calibrations": {
            "note": "cpu_s quiet ~0.2-0.5, shuffle_s pinned-64-partition "
                    "quiet ~0.8-1.6, launch_s empty-32-task-job quiet "
                    "~0.02-0.13 (NEW, r15 verdict #3); one triple per Bench "
                    "invocation (per-JVM at 100x)",
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
                    "the JVM-isolated protocol (continuity with SCALE_r15).",
            "per_rep_first_run_totals_s": [
                round(sum(v.values()), 1) for _, v in sorted(by_rep.items())],
            "family_spread": spread,
        },
        "inversion_attribution": {
            "what": "r15 verdict #2: q_dedup_clusters' 100x steady runs "
                    "read 1.3-1.6x SLOWER than its first run in r15. "
                    "ATTRIBUTION (r16): the inversion is a STOCHASTIC "
                    "JIT-recompilation storm, not query state. Evidence: "
                    "(1) not reproducible — across all 76 first/steady "
                    "pairs in this round's reps 3-4 exactly ONE inverted "
                    "(q_dedup_jaccard r3, 1.47x), and q_dedup_clusters "
                    "itself ran 0.74x/0.65x (steady FASTER) in both reps "
                    "plus 160->127->78 s monotone in a dedicated 3-run "
                    "diag; (2) in every observed slow second run "
                    "(SPARK_GRAFT_DIAG probes) that run's jit_ms EXCEEDED "
                    "the first run's (73-80 s vs 51-54 s) while fast "
                    "second runs show the normal decay (10-32 s); (3) all "
                    "other axes are flat across runs — gc_ms <= 6 s, heap "
                    "<= 400 MB after GC, code cache <= 80/240 MB, spark "
                    "local dir grows monotonically (no mid-run cleanup). "
                    "Mechanism: every repeat re-plans and re-generates "
                    "whole-stage-codegen classes; occasionally the C2 "
                    "queue floods and the run executes interpreted while "
                    "competing with compiler threads. CONSEQUENCE: "
                    "neither first nor steady is uniformly the clean "
                    "observation -> the formal 100x number is the min "
                    "over ALL observations (number_policy_100x), which "
                    "both XROUND and the decade table feed from.",
            "diag_probe": "SPARK_GRAFT_DIAG=1 Bench lines: per-run gc_ms/"
                          "gc_n/jit_ms/code_cache_mb/heap/local-dir "
                          "(diag_clusters_runs below)",
            "inversions_in_r16_reps": "1/76 first-steady pairs",
        },
        "nndescent_ab": {
            "what": "r15 verdict #4: int8 pre-score gate for nnDescentRound "
                    "— built (prescoreFactor dial + Int8Dot codegen "
                    "expression), measured, and NOT shipped in "
                    "q_sim_nndescent: the controlled A/B (seed excluded, "
                    "interleaved arms) puts the gated round SLOWER than the "
                    "exact round at dim=64/k=5 on page-cached local shuffle "
                    "— the two extra joins + per-src pre-rank window cost "
                    "more than the 8x-narrower candidate exchange saves. "
                    "The same work made q_sim_quant_rerank 2.5x faster at "
                    "100x (codes array<long> -> array<byte>, HOF dot -> "
                    "Int8Dot), where the coarse scan IS the hot loop.",
            "100x": jline(f"{D}/nndescent_ab_100x.json"),
            "1x": jline(f"{D}/nndescent_ab_1x.json"),
            "quant_rerank_100x_steady_before_after_s": [7.39, 2.94],
            "crossover": "the dial's full pricing (dim arg added to "
                "NnDescentAB): at dim=64 the gate loses at every probed "
                "scale; at dim=768 it loses at 20k vectors (3.35 vs "
                "2.88 s) and WINS 4.4x at 200k vectors (27.2 vs 120.6 s "
                "— the exact path moves ~120 GB of 6 KB vectors through "
                "the candidate exchange). Enable when candidate-pairs x "
                "vector-bytes is shuffle-bound: high-dim embeddings at "
                "corpus scale, or network-shuffle clusters. The shipped "
                "dim=64 q_sim_nndescent correctly stays exact.",
            "10x_dim768": jline(f"{D}/nndescent_ab_10x_d768.json"),
            "100x_dim768": jline(f"{D}/nndescent_ab_100x_d768.json"),
        },
        "nndescent_recall": {
            "what": "recall@5 vs brute-force kNN for the SRP seed graph and "
                    "each exact NN-descent round (tools/RecallProbe). NEW "
                    "chained mode (r15 verdict #5): 8-member great-circle "
                    "chains (theta=0.2 rad) — elongated structure WIDER "
                    "than one SRP bucket, so transitivity has cross-bucket "
                    "neighbors to recover.",
            "1x_raw": jline(f"{D}/recall_1x_raw.json"),
            "10x_raw": jline(f"{D}/recall_10x_raw.json"),
            "1x_planted": jline(f"{D}/recall_1x_planted.json"),
            "10x_planted": jline(f"{D}/recall_10x_planted.json"),
            "1x_chained": jline(f"{D}/recall_1x_chained.json"),
            "10x_chained": jline(f"{D}/recall_10x_chained.json"),
            "10x_chained_4rounds": jline(f"{D}/recall_10x_chained_r4.json"),
            "10x_chained_theta0.1": jline(f"{D}/recall_10x_chained_t0.1.json"),
            "10x_chained_theta0.3": jline(f"{D}/recall_10x_chained_t0.3.json"),
            "chained_findings": "lift grows with elongation (theta sweep at "
                "10x, seed->r1->r2: theta 0.1: 0.862->0.926->0.941; 0.2: "
                "0.656->0.770->0.824; 0.3: 0.486->0.605->0.672) — the more "
                "the cluster structure crosses SRP buckets, the lower the "
                "seed recall and the LARGER the per-round transitivity "
                "recovery, the r15 verdict #5 hypothesis confirmed in both "
                "directions. Convergence: rounds 3-4 add +0.011/+0.002 "
                "(0.824->0.835->0.837) — two rounds capture ~90% of the "
                "recoverable lift, matching the operator's documented "
                "posture.",
        },
        "embed_incremental_attribution": {
            "what": "r15 verdict #6: q_dedup_embed_incremental's 10x->100x "
                    "decade ratio read 11.5x for 10x data (reproduced in "
                    "r14/r15). ATTRIBUTION (r16, tools/stage_profile over "
                    "event-logged runs): the probe join against the "
                    "persisted SRP bucket/vector tables ran at the BUCKET "
                    "COUNT's parallelism — the layout was pinned at 8 "
                    "buckets at every scale, so at 100x the probe join was "
                    "an 8-task serial section (12.2 s wall, 93 task-s, "
                    "0.68 GB read by 8 tasks, of a 16.5 s query). Not "
                    "candidate growth — candidates scale linearly; the "
                    "parallelism didn't. FIX: Tables.bucketCount derives "
                    "bucket counts from corpus size (~2.5k vectors/bucket, "
                    "floor 8 keeps 1x/10x layouts and plan digests "
                    "identical): the same stage now runs 80 tasks / 3.3 s "
                    "wall; 100x rows re-recorded in reps 5-6.",
            "before_after_100x_steady_s": [12.84, 6.84],
            "before_after_probe_stage": {
                "tasks": [8, 80], "wall_s": [12.2, 3.3]},
        },
        "diag_clusters_runs": diag_lines(f"{D}/diag_clusters_100x.txt"),
    }
    with open(sys.argv[1] if len(sys.argv) > 1 else "SCALE_r16.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(f"queries 1x={len(one)} 10x={len(ten)} 100x={len(hund)}; "
          f"first-run totals={doc['rep_variance_100x']['per_rep_first_run_totals_s']}; "
          f"flagged10x={doc['10x']['flagged_superlinear']} "
          f"flagged100x={doc['100x']['flagged_superlinear']} "
          f"bpe_ok={bpe_ok}")


if __name__ == "__main__":
    main()
