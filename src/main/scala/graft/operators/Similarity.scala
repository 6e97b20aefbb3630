package graft.operators

import graft.functions.{MinHash, Portable, VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search and near-duplicate detection — SURVEY.md §2.10.
  *
  * Two regimes, chosen explicitly by the caller (SURVEY §4.2: the
  * brute-force→LSH rewrite is an API decision, not an optimizer rule):
  *
  *  - [[bruteForceTopK]]: exact cosine top-k for a SMALL query set against a
  *    large corpus — broadcast the queries, never materialize corpus×corpus.
  *  - [[lshBucketJoin]] / [[minhashCandidatePairs]]: the 100 TB path — hash
  *    rows into buckets (random-hyperplane bits for vectors, MinHash bands
  *    for documents) and only compare within buckets, turning all-pairs into
  *    an equi-join shuffle.
  */
object Similarity {

  /** Exact cosine top-k per query vector. `queries` must be small (it is
    * broadcast); the corpus scan stays fully distributed and the per-query
    * ranking is a partitioned window (never a global sort). */
  def bruteForceTopK(
      queries: DataFrame, // (q_id, qv: array<double>)
      corpus: DataFrame,  // (vec_id, cv: array<double>)
      k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .withColumn("cos", V.cosineNative(col("qv"), col("cv")))
    val w = Window.partitionBy("q_id").orderBy(round(col("cos"), 6).desc, col("vec_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** ColBERT-style late-interaction retrieval (Khattab & Zaharia, "ColBERT:
    * Efficient and Effective Passage Search via Contextualized Late
    * Interaction over BERT", SIGIR 2020): documents are BAGS of vectors and
    * score(q, d) = Σ over q's vectors of the max cosine against d's vectors
    * — finer-grained than single-vector cosine, the reranker shape of
    * retrieval-augmented training-data pipelines.
    *
    * `queries` must be small (broadcast, like [[bruteForceTopK]]); the
    * corpus scan stays distributed. The MaxSim reduction is two keyed
    * aggregations with map-side partials — the shuffle after the broadcast
    * join carries at most (corpus docs × query vectors) partial maxes per
    * partition, never the raw corpus×query cosine matrix — and the final
    * ranking is a partitioned window, never a global sort. */
  def maxSimTopK(
      queries: DataFrame, // (q_doc, qv_id, qv: array<double>) — SMALL
      corpus: DataFrame,  // (c_doc, cv: array<double>)
      k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .withColumn("cos", V.cosineNative(col("qv"), col("cv")))
      .groupBy("q_doc", "c_doc", "qv_id")
      .agg(max("cos").as("mx"))
      .groupBy("q_doc", "c_doc")
      .agg(sum("mx").as("maxsim"))
    val w = Window.partitionBy("q_doc")
      .orderBy(round(col("maxsim"), 6).desc, col("c_doc"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Quantized coarse scan + exact rerank — the MEMORY-bound ANN pattern
    * (Jégou et al.'s scan-then-refine shape on the simplest codebook:
    * symmetric per-vector int8): at 100 TB the embedding store, not the
    * flops, is the cost driver, so the full corpus is scanned as int8
    * codes (4x smaller than float32; here `round(x / (max|x|/127))`, the
    * q_embed_quant codec) under an INTEGER dot product, and only the top
    * `candidateFactor * k` coarse survivors per query fetch their float
    * vectors (one tiny equi-join) for the exact cosine rerank.
    *
    * Recall contract: approximate — the coarse order can drop a true
    * top-k member whose quantized score falls below rank m (the factor is
    * the dial; QuantRerank tests measure recall vs brute force). Both
    * engines derive identical int8 codes (IEEE double division + the
    * shared HALF_UP round on .5), so the result set is deterministic and
    * the DuckDB oracle replays it exactly.
    *
    * Zero-norm vectors are dropped on BOTH sides at quantize time, because
    * cosine is undefined on them: a zero-norm CORPUS vector simply never
    * appears in any ranking, and a zero-norm QUERY vector's q_id is absent
    * from the output entirely — a missing q_id means the query itself was
    * degenerate, not that the corpus was empty for it.
    *
    * Plan shape: corpus-side narrow map (quantize) → broadcast-queries
    * cross join under integer arithmetic → per-query window over the
    * coarse score → survivors join back to the float corpus (equi-join on
    * vec_id, candidate-volume-sized) → windowed exact rerank. No global
    * sort; nothing corpus-sized ever shuffles except the two windows'
    * hash exchanges on q_id. */
  def quantRerankTopK(
      queries: DataFrame, // (q_id, qv: array<double>) — SMALL (broadcast)
      corpus: DataFrame,  // (vec_id, cv: array<double>)
      k: Int,
      candidateFactor: Int = 4): DataFrame = {
    require(k >= 1 && candidateFactor >= 1)
    // the int8 store carries per-vector (scale, float norm) metadata —
    // computed ONCE at quantize time; the coarse score then approximates
    // COSINE (dot/|q||c|), the same ordering the rerank refines. Scoring
    // raw dot against a cosine rerank would misalign the cut on
    // mixed-norm corpora (measured: the planted near-dup fell out of the
    // coarse top-20 behind high-norm vectors).
    // zero vectors are DROPPED at quantize time (cosine is undefined on
    // them, and their scale-0 codes would divide to NaN — which Spark's
    // descending sort places FIRST, so an unguarded zero vector would
    // top every ranking instead of losing every ranking).
    // Codec = the shared Int8Codes native expression: scale, norm and
    // codes in one fused pass (codes as array<byte> — 1 byte/element in
    // Tungsten; the integer dot runs in the Int8Dot codegen loop). The
    // previous HOF spelling ran three interpreted passes per corpus row
    // and had to dodge the CollapseProject/HOF lambda-hoisting pitfall
    // with a projection barrier; the native struct is evaluated once per
    // row by construction (multi-referenced non-cheap alias).
    val corpusQ = corpus
      .select(col("vec_id"), V.int8Codes(col("cv")).as("__q"))
      .select(col("vec_id"),
        col("__q").getField("qs").as("c_scale"),
        col("__q").getField("qn").as("c_norm"),
        col("__q").getField("qc").as("cq"))
      .filter(col("c_scale") > 0)
    val queriesQ = queries
      .select(col("q_id"), V.int8Codes(col("qv")).as("__q"))
      .select(col("q_id"),
        col("__q").getField("qs").as("q_scale"),
        col("__q").getField("qn").as("q_norm"),
        col("__q").getField("qc").as("qq"))
      .filter(col("q_scale") > 0)
    // integer dot: |code| <= 127, so dim * 127^2 stays far inside Long
    val intDot = V.int8Dot(col("qq"), col("cq"))
    val coarse = corpusQ
      .crossJoin(broadcast(queriesQ))
      .withColumn("approx",
        intDot.cast("double") * col("q_scale") * col("c_scale") /
          (col("q_norm") * col("c_norm")))
    val wCoarse = Window.partitionBy("q_id")
      .orderBy(round(col("approx"), 6).desc, col("vec_id"))
    val survivors = coarse
      .withColumn("crn", row_number().over(wCoarse))
      .filter(col("crn") <= k * candidateFactor)
      .select("q_id", "vec_id")
    // float fetch for survivors only — the memory story: the coarse scan
    // never touches float32, the rerank never touches the full corpus
    val wExact = Window.partitionBy("q_id")
      .orderBy(round(col("cos"), 6).desc, col("vec_id"))
    survivors
      .join(corpus, Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .withColumn("cos", V.cosineNative(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wExact))
      .filter(col("rn") <= k)
  }

  /** Deterministic ±1 random-hyperplane entry for (plane j, dimension i) —
    * a fixed integer mix, no RNG state, so every executor and every round
    * derives the same planes. */
  private def hyperplaneSign(j: Int, i: Int): Double = {
    val x = j * 1315423911L + i * 2654435761L
    val mixed = (x ^ (x >>> 16)) * 0x45d9f3bL
    if (((mixed >>> 8) & 1L) == 0L) 1.0 else -1.0
  }

  /** nBits-bit signed-random-projection bucket id for a vector column.
    * `portable = true` derives the hyperplane signs from md5 instead of the
    * JVM integer mix (Portable.srpSign) — identical runtime cost (signs are
    * plan-time literals either way) but reproducible by the DuckDB oracle,
    * whose checked BIGINT arithmetic cannot replay the wrapping mix.
    *
    * Degenerate-input contract (pinned by ExpressionSpec): a NULL vector
    * and a vector whose length != dim both map to bucket 0L, and the
    * output is NON-nullable — the exact semantics of the original
    * per-bit when/otherwise fold. The nullability is load-bearing: a
    * nullable bucket join key lets Catalyst infer isnotnull filters that
    * push asymmetrically into [[lshBucketJoin]]/[[knnGraph]]'s
    * probe-vs-plain branches and break their one-corpus-exchange
    * ReuseExchange contract (the r16 regression). Rows bucketed to 0L by
    * the degenerate rule still never emit pairs: cosine against a NULL
    * vector is NULL, which fails every consumer's `cos >= threshold`
    * filter; zero-NORM vectors (whose cosine is NaN — and NaN compares
    * HIGH in both Spark and DuckDB) are dropped by knnGraph's explicit
    * norm guard before bucketing. */
  def srpBucket(vec: Column, dim: Int, nBits: Int, portable: Boolean = false): Column = {
    val sign: (Int, Int) => Double =
      if (portable) Portable.srpSign else hyperplaneSign
    // one fused codegen loop over a plan-constant sign matrix — the
    // previous per-bit aggregate(zip_with) trees ran nBits interpreted
    // HOF passes per corpus row (see graft.expressions.SrpBucket; FP
    // semantics bit-identical, oracle buckets unchanged)
    val signs = Array.tabulate(nBits, dim)((j, i) => sign(j, i))
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.expressions.SrpBucket(expression(vec), signs))
  }


  /** Bucket exchange with the partition count PINNED to the session's
    * shuffle parallelism. The bucket self-joins EXPLODE their input:
    * candidate-pair output is ~targetPop x (nBits+1) x the row count, so
    * the exchange's byte size wildly under-states the downstream stage's
    * work — AQE's byte-based partition coalescing (r17 finding) collapsed
    * the 100x gated-seed scoring stage to a HANDFUL of tasks (34 tasks,
    * one running the whole 451 s wall with 9.7 GB of sort spill: int8
    * codes compress ~10x better than floats, so the coalescer saw 0.5 GB
    * and threw the parallelism away). An explicit numPartitions makes the
    * repartition non-coalescable while staying config-driven (the scale
    * probes set spark.sql.shuffle.partitions per scale). */
  private def pinnedByBucket(df: DataFrame): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, col("bucket"))

  /** Bits for [[lshBucketJoin]] sized from the corpus: 2^nBits buckets
    * targeting `targetBucketSize` expected rows per bucket, so in-bucket
    * pair work stays ~corpus × targetBucketSize (linear, not quadratic)
    * and bucket count — the join's parallelism bound — GROWS with the
    * corpus instead of being a fixed constant that saturates at scale.
    * Clamped to [4, `maxBits`] (default 24): below 4 bits buckets are a
    * broadcast-sized handful; above 24 the hyperplane evaluation
    * dominates. PAST the cap the flat-population contract breaks by
    * design: expected bucket population becomes corpusSize / 2^maxBits —
    * linear in the corpus, independent of targetBucketSize — so the
    * operator's per-bucket pair work grows linearly too. The dials are
    * then `maxBits` itself (each extra bit halves the population at one
    * more hyperplane dot per row) or accepting the larger effective
    * bucket. `maxBits` is a parameter (not a constant) precisely so that
    * posture is executable: ScaleUpSpec forces a small cap and pins the
    * linear growth, plus the restore-by-raising-the-cap curve. */
  def lshNBits(corpusSize: Long, targetBucketSize: Long = 64L, maxBits: Int = 24): Int = {
    val buckets = math.max(1L, corpusSize / math.max(1L, targetBucketSize))
    math.min(maxBits, math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)))
  }

  /** Corpus-gated SHUFFLE_HASH dial — the ONE gate shared by BOTH
    * candidate joins (the jaccard prefix join AND the containment
    * expansion join) and mirrored by tools/JaccardProbe: hint
    * SHUFFLE_HASH once the caller's corpusRows says broadcast is already
    * out of reach (>= 20k docs, ~10 MB of index-prefix rows — the r14
    * A/B: −18% end-to-end at 100x, SCALE_r14 shj_dial_ab_100x), avoiding
    * sort-merge's input sorts; the per-partition hash build stays ~1k
    * docs' rows by the explicit repartition, bounded at any corpus size.
    *
    * Env override for probes, BOTH ways (1 forces the hint, 0 forces the
    * planner default): `SPARK_GRAFT_CAND_SHJ`, with the original
    * `SPARK_GRAFT_JACCARD_SHJ` honored as an alias — note that either
    * name governs BOTH candidate joins, not just the jaccard one. */
  private[graft] def shjGate(corpusRows: Option[Long]): Boolean =
    sys.env.get("SPARK_GRAFT_CAND_SHJ")
      .orElse(sys.env.get("SPARK_GRAFT_JACCARD_SHJ")) match {
      case Some(v) => v == "1"
      case None    => corpusRows.exists(_ >= 20000L)
    }

  /** LSH near-dup pairs over an embedding table: bucket by SRP bits, compare
    * only within buckets, keep pairs with cosine >= threshold. The self-join
    * is an equi-join on the bucket id — shuffle-partitioned, no cross join.
    *
    * `multiProbe` trades candidate volume for recall: the probe side also
    * emits every Hamming-distance-1 bucket (nBits extra keys per row), so a
    * near-dup pair split by ONE unlucky hyperplane still collides. The
    * probe keys per row are distinct, so each pair still matches at most
    * once and needs no dedup. Higher nBits (from [[lshNBits]]) + multiProbe
    * is the scale posture: smaller buckets, recall recovered by probing. */
  def lshBucketJoin(
      emb: DataFrame, // (vec_id, v: array<double>)
      dim: Int,
      nBits: Int,
      minCosine: Double,
      multiProbe: Boolean = false,
      portable: Boolean = false): DataFrame = {
    // exchange on the join key: materializes the bucket bits once instead
    // of letting CollapseProject recompute 16 dot products per joined row
    val bucketed = pinnedByBucket(
      emb.withColumn("bucket", srpBucket(col("v"), dim, nBits, portable)))
    val a = bucketed.select(
      col("bucket"), col("vec_id").as("id_a"), col("v").as("v_a"))
    // single-probe keeps b a plain projection so the join reuses the one
    // exchange above for both sides; only multi-probe pays the explode
    // (whose fresh join-key attribute forces a second shuffle)
    val b =
      if (!multiProbe)
        bucketed.select(
          col("bucket"), col("vec_id").as("id_b"), col("v").as("v_b"))
      else bucketed
        .select(col("bucket").as("b_bucket"),
          col("vec_id").as("id_b"), col("v").as("v_b"))
        .withColumn("bucket", explode(probeKeys(col("b_bucket"), nBits)))
        .drop("b_bucket")
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", V.cosineNative(col("v_a"), col("v_b")))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Persistable SRP bucket table of an embedding corpus: (vec_id,
    * bucket) — ONE long per vector, the ANN twin of [[bandTable]]. An
    * ingest pipeline keeps this table (plus the vectors themselves, which
    * it already stores) and near-dups new arrivals without recomputing a
    * single corpus bucket; growth = append the admitted vectors' rows. */
  def bucketTable(
      emb: DataFrame, // (vec_id, v: array<double>)
      dim: Int,
      nBits: Int,
      portable: Boolean = false): DataFrame =
    emb.select(col("vec_id"),
      srpBucket(col("v"), dim, nBits, portable).as("bucket"))

  /** Incremental embedding near-dup: which incoming vectors are
    * near-duplicates (cosine >= minCosine) of the EXISTING corpus,
    * joining the incoming batch's multi-probe keys (own bucket +
    * Hamming-1 neighbors, same recall contract as lshBucketJoin) against
    * the persisted [[bucketTable]]. Corpus buckets are never recomputed;
    * corpus VECTORS are fetched by id for candidate pairs only — an
    * equi-join that touches matching buckets' rows, not a rescan (at
    * warehouse scale: a semi-join read against the stored embedding
    * table). Probe keys per incoming row are distinct, so each (incoming,
    * existing) pair arises at most once — no dedup needed. Output one row
    * per (id, matched_id); anti-join ids off the batch to admit only
    * fresh vectors. */
  def incrementalEmbedDedup(
      existingBuckets: DataFrame, // (vec_id, bucket)
      existingVectors: DataFrame, // (vec_id, v) — candidate fetch target
      incoming: DataFrame,        // (vec_id, v)
      dim: Int,
      nBits: Int,
      minCosine: Double,
      portable: Boolean = false): DataFrame = {
    // exchange after bucketing: materialize the nBits hyperplane dot
    // products once, before the probe explode fans the row out nBits+1x
    val probed = incoming
      .withColumn("bucket", srpBucket(col("v"), dim, nBits, portable))
      .repartition(col("vec_id"))
      .withColumn("probe", explode(probeKeys(col("bucket"), nBits)))
    val cands = probed.join(
        existingBuckets.select(
          col("vec_id").as("matched_id"), col("bucket").as("probe")),
        Seq("probe"))
      .select(col("vec_id").as("id"), col("v"), col("matched_id"))
    cands.join(
        existingVectors.select(
          col("vec_id").as("matched_id"), col("v").as("mv")),
        Seq("matched_id"))
      .withColumn("cos", V.cosineNative(col("v"), col("mv")))
      .filter(col("cos") >= minCosine)
      .select(col("id"), col("matched_id"))
  }

  /** Multi-probe key set for a bucket: the bucket itself plus every
    * Hamming-distance-1 neighbor. ONE definition feeds both the self-join
    * (lshBucketJoin) and the query-vs-corpus (lshTopK) paths, matching
    * the DuckDB oracle's `bit_count(xor(a, b)) <= 1` contract — a probe
    * scheme change happens here or nowhere. */
  private[graft] def probeKeys(bucket: Column, nBits: Int): Column =
    array(bucket +:
      (0 until nBits).map(j => bucket.bitwiseXOR(lit(1L << j))): _*)

  /** Two-stage ANN retrieval: SRP-LSH recall (query probes its own bucket
    * plus every Hamming-1 neighbor) then exact-cosine rerank to top-k —
    * the production retrieval shape (cheap recall stage bounds the exact
    * stage's candidate set). Probe keys per query are distinct, so each
    * (query, corpus) candidate arises at most once — no dedup before the
    * rank window. The corpus side is bucket-partitioned ONCE; queries are
    * few, so their (nBits+1)-way explode is negligible; the rank window
    * partitions by query id. Ranking ties break on round(cos, 6) then
    * vec_id — deterministic across engines (same convention as ivfTopK).
    */
  def lshTopK(
      queries: DataFrame, // (q_id, qv: array<double>)
      corpus: DataFrame,  // (vec_id, cv: array<double>)
      dim: Int,
      nBits: Int,
      k: Int,
      portable: Boolean = false): DataFrame = {
    val cb = corpus
      .withColumn("bucket", srpBucket(col("cv"), dim, nBits, portable))
      .repartition(col("bucket"))
    val probes = queries
      .withColumn("__qb", srpBucket(col("qv"), dim, nBits, portable))
      .withColumn("bucket", explode(probeKeys(col("__qb"), nBits)))
      .drop("__qb")
    val w = Window.partitionBy("q_id")
      .orderBy(round(col("cos"), 6).desc, col("vec_id"))
    probes.join(cb, Seq("bucket"))
      .withColumn("cos", V.cosineNative(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rn"))
  }

  /** Approximate k-nearest-neighbor GRAPH over the whole corpus: for every
    * vector, its top-k neighbors among the vectors whose SRP bucket equals
    * its own or differs in exactly one bit (the lshBucketJoin/multi-probe
    * candidate contract, applied symmetrically). The kNN graph is the
    * building block the pair queries don't give you: graph-based dedup
    * clustering (feed the edges to [[graft.operators.Dedup.duplicateClusters]]),
    * neighborhood-quality audits, and the construction seed for
    * graph-traversal ANN indexes (the NN-descent/HNSW family starts from
    * exactly this bucketed approximation).
    *
    * Scale shape: ONE bucket exchange feeds both sides of the candidate
    * equi-join (the probe side explodes its own bucket + nBits Hamming-1
    * keys — distinct keys, so each (src, dst) candidate arises exactly
    * once); per-bucket population is bounded by the [[lshNBits]]
    * corpus-derived bit count under its 24-bit cap, so the per-bucket
    * quadratic term carries the same contract as [[lshBucketJoin]]; the
    * per-node ranking is a partitioned window over (cos desc, dst asc) —
    * never a global sort (Spark's WindowGroupLimit keeps the rank-k
    * prefilter map-side, so the src exchange carries survivors, not the
    * full candidate set) — and the output is k·N edges. `portable = true`
    * derives hyperplanes from the md5 family the DuckDB oracle replays
    * exactly.
    *
    * `prescoreFactor > 0` gates the SEED scoring the same way
    * [[nnDescentRound]]'s dial gates a round: candidate pairs are scored
    * on int8 codes ([[quantCodes]] — 1 byte/dim riding the bucket join
    * instead of 8) and only the per-src top `prescoreFactor * k` by
    * quantized cosine fetch float vectors for the exact rerank. At
    * dim=64 the exact path wins (r16 A/B) and callers keep the default;
    * at dim=768/200k vectors the exact seed is the single most expensive
    * scan in the registry (754 s first-run at 100x — 197M candidate
    * pairs x 6 KB of float vectors through the bucket join) and the gate
    * is the difference between a seed you can build and one you can't.
    * Deterministic and oracle-replayed exactly (the gated knnGraphCtes).
    *
    * PINNED COST BOUND (r17, measured at 1x/10x/100x): per-row candidate
    * count = targetPop × (nBits+1) × skew(N) — 381/453/985 per row at the
    * three scales, the 100x count (196.9M pairs) matching the bucket
    * histogram exactly. The O(log N) per-row growth is the probe fan-out
    * (nBits+1 keys) plus real-data bucket skew (sum(pop²)/flat = 1.16 at
    * 10x, 1.55 at 100x); per-pair steady cost is ~50 ns (KnnStageProbe
    * 100x: join 1.5 s + cosine ~4 s + rank ~5 s once codegen is warm —
    * first runs pay a 6-10x C2 warm-up premium over the 197M-iteration
    * generated loops, which the min-over-all measurement policy absorbs).
    * The obvious lever — smaller buckets via lshNBits targetBucketSize —
    * is RECALL-PRICED 1:1 and deliberately not taken (KnnBucketAB 10x:
    * target 64/32/16 → recall 0.119/0.086/0.061 while 100x wall drops
    * 62→9→5.4 s); at fixed recall the bound above is the operator's
    * honest cost, and the dial stays a caller parameter. */
  def knnGraph(
      emb: DataFrame, // (vec_id, v: array<double>)
      dim: Int,
      nBits: Int,
      k: Int,
      portable: Boolean = false,
      prescoreFactor: Int = 0,
      corpusRows: Option[Long] = None): DataFrame = {
    // zero-norm guard (same convention as quantizeRerank): cosine is
    // undefined for the zero vector and cosineNative yields NaN, which a
    // descending window ranks FIRST — one degenerate vector would become
    // every bucket-mate's top neighbor, and engines disagree on NaN
    // ordering. Dropped from both graph sides (the guard sits before the
    // probe/candidate split); the q_sim_knn oracle mirrors it. The gated
    // path's qs > 0 filter keeps exactly the same rows.
    val vecs = emb.filter(V.l2NormNative(col("v")) > 0)
    val w = Window.partitionBy("src")
      .orderBy(round(col("cos"), 6).desc, col("dst"))
    if (prescoreFactor <= 0) {
      val bucketed = pinnedByBucket(vecs
        .withColumn("bucket", srpBucket(col("v"), dim, nBits, portable)))
      val probes = bucketed
        .select(col("bucket").as("n_bucket"), col("vec_id").as("src"), col("v").as("sv"))
        .withColumn("bucket", explode(probeKeys(col("n_bucket"), nBits)))
        .drop("n_bucket")
      val cands = bucketed
        .select(col("bucket"), col("vec_id").as("dst"), col("v").as("dv"))
      probes.join(cands, Seq("bucket"))
        .filter(col("src") =!= col("dst"))
        .withColumn("cos", V.cosineNative(col("sv"), col("dv")))
        .select(col("src"), col("dst"), col("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
    } else {
      // gated seed: int8 CODES ride the bucket exchange/join (1 byte/dim),
      // the full float vectors are fetched only for the per-src survivor
      // set — same one-exchange discipline (bucketed feeds both sides)
      val bucketed = pinnedByBucket(quantCodes(vecs)
        .withColumn("bucket", srpBucket(col("v"), dim, nBits, portable))
        .select(col("vec_id"), col("qs"), col("qn"), col("qc"), col("bucket")))
      val probes = bucketed
        .select(col("bucket").as("n_bucket"), col("vec_id").as("src"),
          col("qc").as("sqc"), col("qs").as("sqs"), col("qn").as("sqn"))
        .withColumn("bucket", explode(probeKeys(col("n_bucket"), nBits)))
        .drop("n_bucket")
      val cands = bucketed
        .select(col("bucket"), col("vec_id").as("dst"),
          col("qc").as("dqc"), col("qs").as("dqs"), col("qn").as("dqn"))
      val wPre = Window.partitionBy("src")
        .orderBy(round(col("approx"), 6).desc, col("dst"))
      val surv = probes.join(cands, Seq("bucket"))
        .filter(col("src") =!= col("dst"))
        .withColumn("approx",
          V.int8Dot(col("sqc"), col("dqc")).cast("double") *
            col("sqs") * col("dqs") / (col("sqn") * col("dqn")))
        .select(col("src"), col("dst"), col("approx"))
        .withColumn("__qrn", row_number().over(wPre))
        .filter(col("__qrn") <= k * prescoreFactor)
        .select(col("src"), col("dst"))
      // Float-fetch joins carry a 6 KB vector onto every survivor pair —
      // under the planner's sort-merge default that intermediate is
      // SORTED (r17 profile: one Sort of a 16 GiB pair+vector exchange ran
      // 33 AQE-coalesced tasks x ~220 s = 250 s of the 100x wall). The
      // node-sized vector table is the natural hash BUILD side, so the
      // corpus-gated SHUFFLE_HASH hint streams the wide pair side
      // unsorted; below the gate the planner keeps its broadcast choice
      // (spec-scale plans unchanged).
      val fetch = fetchHint(corpusRows) _
      surv
        .join(fetch(vecs.select(col("vec_id").as("src"), col("v").as("sv"))), Seq("src"))
        .join(fetch(vecs.select(col("vec_id").as("dst"), col("v").as("dv"))), Seq("dst"))
        .withColumn("cos", V.cosineNative(col("sv"), col("dv")))
        .select(col("src"), col("dst"), col("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
    }
  }

  /** Corpus-gated SHUFFLE_HASH hint for the node-sized BUILD side of a
    * survivor-fetch join (float vectors / int8 codes keyed by vec_id):
    * same [[shjGate]] dial the candidate joins use — above it, sort-merge
    * would sort the WIDE pair-stream side (the r17 16 GiB-sort finding);
    * below it the planner's own choice (typically broadcast) stands.
    *
    * Gate-on, the build side is ALSO explicitly repartitioned on its join
    * key (the frame's FIRST column by the callers' selection contract)
    * with the candidate joins' corpus-derived count: SHJ's per-partition
    * hash build cannot spill, and inheriting default/AQE partitioning
    * would let build bytes per partition grow unboundedly with corpus and
    * dim (r17 ADVICE). ~1k vectors per partition ≈ 6 MB at dim=768,
    * capped at the session shuffle width; the user-specified count opts
    * the exchange out of AQE coalescing, and EnsureRequirements aligns
    * the pair-stream side to it, so the bound holds at any scale. */
  private def fetchHint(corpusRows: Option[Long])(df: DataFrame): DataFrame =
    if (!shjGate(corpusRows)) df
    else {
      val cap = df.sparkSession.sessionState.conf.numShufflePartitions
      val p = corpusRows
        .map(n => math.max(1L, math.min(cap.toLong, n / 1000 + 1)).toInt)
        .getOrElse(cap)
      df.repartition(p, col(df.columns.head)).hint("SHUFFLE_HASH")
    }

  /** int8 code table of non-degenerate vectors — THE codec every gated
    * path shares (quantRerankTopK, nnDescentRound's pre-score, the gated
    * [[knnGraph]] seed): per-vector symmetric scale max|x|/127, HALF_UP
    * byte codes (1 byte/dim in Tungsten), float norm for cosine
    * normalization — all three from ONE native fused pass
    * ([[graft.expressions.Int8Codes]]; the previous three interpreted HOF
    * passes measured ~1,100 task-seconds per 200k x 768 corpus scan, r17).
    * The NULL-struct degenerate rule + `qs > 0` keeps exactly the rows
    * the old scale filter kept. Output: (vec_id, v, qs, qn, qc). */
  private[graft] def quantCodes(vecs: DataFrame): DataFrame =
    vecs
      .select(col("vec_id"), col("v"), V.int8Codes(col("v")).as("__q"))
      .select(col("vec_id"), col("v"),
        col("__q").getField("qs").as("qs"),
        col("__q").getField("qn").as("qn"),
        col("__q").getField("qc").as("qc"))
      .filter(col("qs") > 0)

  /** One NN-descent refinement round over a kNN graph (Dong et al., WWW'11
    * — "Efficient K-Nearest Neighbor Graph Construction for Generic
    * Similarity Measures"): each node's candidate set is its current
    * neighborhood expanded by neighbors-of-neighbors, re-scored with exact
    * cosine and re-ranked by the same partitioned top-k window. Feed the
    * output of [[knnGraph]] in and iterate; one round already closes most
    * of the SRP bucketing's recall gap (the bucket miss a node's true
    * neighbor fell into is usually reachable through a SHARED neighbor —
    * the NN-descent observation that "a neighbor of a neighbor is likely a
    * neighbor").
    *
    * Scale shape: the neighborhood is made UNDIRECTED first (forward edges
    * ∪ reverse edges), with the reverse degree CAPPED at k by a window
    * over the incoming edges — the standard NN-descent reverse-sample
    * bound, here deterministic (round(cos,6) desc, src) instead of random,
    * so the oracle can replay it. A hub node therefore contributes at most
    * 2k edges in each direction, the middle-node self-join emits ≤ (2k)²
    * candidates per node — linear in N at fixed k — and the final ranking
    * is a window partitioned by src, never global. Exactly one exchange
    * per side of the expansion join (by the middle node) plus the window's
    * exchange; vectors are fetched by id AFTER dedup so each surviving
    * candidate pair scores exactly once.
    *
    * `emb` must be the SAME (vec_id, v) frame the graph was built from
    * (zero-norm rows are re-dropped here to keep cosine defined).
    * Output: (src, dst, cos, rn) with rn in 1..k per src — same schema as
    * [[knnGraph]], so rounds chain.
    *
    * `prescoreFactor > 0` inserts an int8 PRE-SCORE between expansion and
    * exact scoring (the [[quantRerankTopK]] codec: per-vector symmetric
    * `round(x / (max|x|/127))` codes, integer dot, cosine-normalized by
    * precomputed float norms): every candidate pair is scored on 64-BYTE
    * codes and only the top `prescoreFactor * k` per src fetch full
    * float vectors for the exact rerank. The expansion emits up to (2k)²
    * candidates per node but only O(k) survive to the final ranking, so
    * the wide exchange — full float vectors riding every candidate pair
    * — shrinks to the survivor set; the code columns riding the full
    * pair set are 8x narrower. The gate is candidate-ORDERING only (both
    * engines derive identical codes — IEEE double division + shared
    * HALF_UP round — and the integer dot is exact), so the result is
    * deterministic and the DuckDB oracle replays it exactly; recall vs
    * brute force is the spec-measured contract, as with
    * [[quantRerankTopK]].
    *
    * WHEN TO TURN IT ON (measured, tools/NnDescentAB, r16): the gate
    * trades two extra joins + a per-src pre-rank window for the narrower
    * exchange, so it pays only when exchange BYTES dominate. At dim=64
    * it loses at every probed scale (200k vectors: 9.5 s gated vs 7.5 s
    * exact); at dim=768 it loses at 20k vectors (3.3 vs 2.9 s) and WINS
    * 4.4x at 200k vectors (27.2 vs 120.6 s, where the exact path moves
    * ~120 GB of 6 KB vectors through the candidate exchange). Rule of
    * thumb: enable when candidatePairs x vectorBytes reaches the
    * shuffle-bandwidth-bound regime — high-dim embeddings at corpus
    * scale, or any network-shuffle cluster.
    *
    * `revDegreeCap` overrides the reverse-degree cap independently of the
    * output budget `k` (default -1 = cap at k). NN-descent's reverse
    * sample rate and its k are distinct dials (Dong WWW'11 §2.3 samples
    * rho*k reverse edges); ScaleUpSpec also uses this to count the FULL
    * candidate set (k = corpus size) while the cap stays at production
    * value. */
  def nnDescentRound(
      graph: DataFrame, // (src, dst, cos, ...) from knnGraph or a prior round
      emb: DataFrame,   // (vec_id, v: array<double>)
      k: Int,
      mode: CheckpointMode = CheckpointMode.Local,
      prescoreFactor: Int = 0,
      revDegreeCap: Int = -1,
      corpusRows: Option[Long] = None): DataFrame = {
    // The incoming graph feeds FOUR plan branches (fwd, the reverse-cap
    // window, and — through und — both sides of the expansion self-join);
    // without lineage truncation the entire seed pipeline (SRP bucket
    // exchange + per-node candidate window) re-executes per branch —
    // measured 185 s vs ~60 s at the 100x probe. The graph is k·N narrow
    // rows (two longs + a double), so materializing it is cheap at any
    // corpus size; same CheckpointMode contract as the other multi-branch
    // operators (see [[CheckpointMode]]).
    val lin = new Lineage(graph.sparkSession, mode)
    val (g, _) = lin.tracked(graph.select(col("src"), col("dst"), col("cos")))
    val fwd = g.select(col("src"), col("dst"))
    // reverse edges, degree-capped at k per target: without the cap a hub
    // that half the corpus lists as a neighbor would fan Σ deg_in·deg_out
    // candidates through the expansion join — the quadratic term NN-descent
    // bounds by sampling, bounded here deterministically instead
    val cap = if (revDegreeCap > 0) revDegreeCap else k
    val revW = Window.partitionBy("dst").orderBy(round(col("cos"), 6).desc, col("src"))
    val rev = g.select(col("src"), col("dst"), col("cos"))
      .withColumn("__rrn", row_number().over(revW))
      .filter(col("__rrn") <= cap)
      .select(col("dst").as("src"), col("src").as("dst"))
    // und is ≤ 2kN narrow rows read by BOTH sides of the expansion join —
    // truncated too, so the union+distinct runs once
    val (und, _) = lin.tracked(fwd.unionAll(rev).distinct())
    // neighbors-of-neighbors through the middle node, plus the current
    // edges; distinct BEFORE scoring so each pair scores once
    val cand = und.as("e1")
      .join(und.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("src"), col("e2.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .unionAll(fwd)
      .distinct()
    val vecs = emb.filter(V.l2NormNative(col("v")) > 0)
    val w = Window.partitionBy("src")
      .orderBy(round(col("cos"), 6).desc, col("dst"))
    // pre-score gate (see scaladoc): the survivor set that proceeds to
    // the full-vector joins — either every candidate (exact path) or the
    // per-src top prescoreFactor*k by quantized cosine
    val surv =
      if (prescoreFactor <= 0) cand
      else {
        // the shared gated-path codec (see [[quantCodes]]): codes are
        // array<byte> — 1 byte/element in Tungsten, so the pair exchange
        // carries 64 B of codes instead of 512 B of doubles.
        // Checkpointed (node-sized: ~dim bytes + 16 per vector) because it
        // feeds BOTH sides of the candidate gate join below — src and dst
        // projections build different exchanges, so ReuseExchange cannot
        // share them and the interpreted HOF quantize pass (~dim element
        // ops/row) would otherwise run twice per round (r17).
        val (q, _) = lin.tracked(quantCodes(vecs)
          .select(col("vec_id"), col("qs"), col("qn"), col("qc")))
        // exact integer dot via the native codegen expression — the HOF
        // aggregate-over-zip_with form ran interpreted and cost more than
        // the full-vector exchange it was saving (measured 4-6x at 100x)
        val qdot = V.int8Dot(col("sqc"), col("dqc"))
        val wPre = Window.partitionBy("src")
          .orderBy(round(col("approx"), 6).desc, col("dst"))
        // code joins: same sort-merge pathology as the float fetch below
        // at 1/8 the width — the node-sized code table is the hash build
        // side, the candidate pair stream streams unsorted (r17)
        val fetchQ = fetchHint(corpusRows) _
        cand
          .join(fetchQ(q.select(col("vec_id").as("src"), col("qc").as("sqc"),
            col("qs").as("sqs"), col("qn").as("sqn"))), Seq("src"))
          .join(fetchQ(q.select(col("vec_id").as("dst"), col("qc").as("dqc"),
            col("qs").as("dqs"), col("qn").as("dqn"))), Seq("dst"))
          .withColumn("approx",
            qdot.cast("double") * col("sqs") * col("dqs") /
              (col("sqn") * col("dqn")))
          .withColumn("__qrn", row_number().over(wPre))
          .filter(col("__qrn") <= k * prescoreFactor)
          .select(col("src"), col("dst"))
      }
    // corpus-gated SHUFFLE_HASH on the vector build side (see [[fetchHint]]
    // / the knnGraph gated fetch): above the gate, sort-merge sorted the
    // pair+vector intermediate — the r17 100x profile's single biggest
    // stage (16 GiB estimated, 33 tasks x ~220 s)
    val fetchV = fetchHint(corpusRows) _
    surv
      .join(fetchV(vecs.select(col("vec_id").as("src"), col("v").as("sv"))), Seq("src"))
      .join(fetchV(vecs.select(col("vec_id").as("dst"), col("v").as("dv"))), Seq("dst"))
      .withColumn("cos", V.cosineNative(col("sv"), col("dv")))
      .select(col("src"), col("dst"), col("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    * their nearest centroid once (a broadcast join against C centroids —
    * embarrassingly parallel); each query searches only the nprobe
    * partitions whose centroids are nearest to it. Recall/cost trade-off is
    * explicit; at 100 TB the per-query scan touches nprobe/C of the corpus.
    *
    * Centroid "training" is a deterministic sample (every C-th corpus
    * vector) — k-means iterations can replace it without changing the
    * query-side plan.
    */
  def ivfTopK(
      queries: DataFrame, // (q_id, qv: array<double>)
      corpus: DataFrame,  // (vec_id, cv: array<double>)
      nCentroids: Int,
      nProbe: Int,
      k: Int,
      refineIters: Int = 0): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(round(col("cos"), 6).desc, col("vec_id"))
    // refineIters > 0 replaces the deterministic sample with Lloyd-refined
    // centroids ([[kmeansCentroids]]) — tighter cells, same query plan
    val centroids =
      if (refineIters > 0) kmeansCentroids(corpus, nCentroids, refineIters)
      else corpus
        .orderBy("vec_id") // deterministic training sample
        .limit(nCentroids)
        .select(col("vec_id").as("c_id"), col("cv").as("centroid"))
    // The centroid table is bounded driver state (C×dim — the same category
    // as kmeans' per-iteration collect and MLlib KMeans). Riding it into
    // the NearestCells codegen expression makes both assignment and probing
    // NARROW MAPS: the previous crossJoin+window formulation shuffled
    // corpus×C rows through a per-vec_id window just to take an argmin —
    // C× the corpus through an exchange at 100 TB. (dist, id) tie-break
    // semantics identical to the window's orderBy(dist, c_id).
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val cents = centroids.collect()
    // an empty corpus has no cells and no results — return the empty
    // frame with the right schema instead of letting NearestCells'
    // invariants reject construction
    if (cents.isEmpty)
      return queries.select(col("q_id")).limit(0)
        .withColumn("vec_id", lit(0L))
        .withColumn("cos", lit(0.0))
        .withColumn("rn", lit(0))
        .select("q_id", "vec_id", "cos", "rn")
    // a corpus smaller than nProbe cells simply probes them all — the
    // window formulation's prn <= nProbe degraded the same way
    val probe = math.min(nProbe, cents.length)
    val centArr = cents.map(_.getSeq[Double](1).toArray)
    val idArr = cents.map(_.getLong(0))
    def nearest(v: Column, n: Int): Column =
      column(graft.expressions.NearestCells(expression(v), centArr, idArr, n))
    val assigned = corpus
      .withColumn("c_id", nearest(col("cv"), 1).getItem(0))
      .repartition(col("c_id")) // materialize assignment, cluster by cell
    // probe: each query's nProbe nearest cells, exploded — still no shuffle
    val probes = queries
      .withColumn("c_id", explode(nearest(col("qv"), probe)))
      .select(col("q_id"), col("qv"), col("c_id"))
    // search only the probed cells (equi-join on cell id, not a cross join)
    assigned.join(probes, Seq("c_id"))
      .withColumn("cos", V.cosineNative(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "vec_id", "cos", "rn")
  }

  /** Lloyd's k-means over an embedding table — centroid refinement for
    * [[ivfTopK]]. Each iteration is one broadcast-assign pass plus one
    * aggregation (element-wise mean via posexplode + groupBy), both fully
    * distributed; only the C×dim centroid table ever reaches the driver.
    * Deterministic: init = first C vectors by id, ties in assignment break
    * by centroid id.
    */
  def kmeansCentroids(
      corpus: DataFrame, // (vec_id, cv: array<double>)
      nCentroids: Int,
      iterations: Int): DataFrame = {
    var centroids = corpus
      .orderBy("vec_id")
      .limit(nCentroids)
      .select(col("vec_id").as("c_id"), col("cv").as("centroid"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("dist"), col("c_id"))
    for (_ <- 0 until iterations) {
      val assigned = corpus
        .crossJoin(broadcast(centroids))
        .withColumn("dist", V.l2Dist(col("cv"), col("centroid")))
        .withColumn("arn", row_number().over(wAssign))
        .filter(col("arn") === 1)
        .select(col("c_id"), col("cv"))
      // element-wise mean per cell: explode positions, average, re-assemble
      val means = assigned
        .select(col("c_id"), posexplode(col("cv")).as(Seq("pos", "x")))
        .groupBy("c_id", "pos")
        .agg(avg("x").as("m"))
        .groupBy("c_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("c_id"), transform(col("pm"), p => p.getField("m")).as("centroid"))
      // empty cells keep their previous centroid; collect the C×dim result
      // to the driver (bounded by centroid count — the one collect() the
      // 100 TB rules allow, same as MLlib KMeans) so each iteration starts
      // from a literal frame and plans don't stack across iterations
      val next = centroids.select(col("c_id"), col("centroid").as("prev"))
        .join(means, Seq("c_id"), "left")
        .select(col("c_id"), coalesce(col("centroid"), col("prev")).as("centroid"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toSeq
      val spark = corpus.sparkSession
      import spark.implicits._
      centroids = next.toDF("c_id", "centroid")
    }
    centroids
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster the embedding
    * space, then compare pairs ONLY within a cluster and drop every vector
    * whose cosine to a smaller-id cluster-mate is >= tau. The economy is
    * the cluster gate: O(Σ cell²) candidate pairs instead of O(n²). Keeper
    * policy is min-id per near-dup group (deterministic; the paper keeps
    * the vector farthest from the centroid — swap the keeper ordering to
    * get that). Two entry points share the pair/keeper tail
    * ([[inCellDedup]]):
    *
    *  - [[semanticDedup]] — caller-FIXED centroid count, flat argmin
    *    assignment (narrow map over plan-constant centroids), optional
    *    k-means refinement.
    *  - [[semanticDedupScaled]] — corpus-SCALED cell count (cells stay
    *    ~cellStride rows as the corpus grows, keeping the in-cell
    *    quadratic term bounded) with a constant-fan-out multi-level
    *    routing tree, so driver state is deployment-constant and per-row
    *    assignment cost grows only logarithmically with the corpus.
    *    This is the 100 TB entry point.
    *
    * Input: (vec_id, cv: array<double>); output: (vec_id, c_id) survivors.
    */
  /** Caller-FIXED-C variant: assignment is a narrow map over a NearestCells
    * expression holding all C centroids as plan constants, so driver state
    * is O(C·dim) and per-row cost O(C·dim) — the caller's contract is that
    * C is a constant of the deployment (like ivfTopK's nCentroids), NOT
    * derived from the corpus size. For corpus-scaled cell counts use
    * [[semanticDedupScaled]]: sizing C ~ N/cell through THIS entry point
    * makes assignment O(N²·dim) and grows the driver collect linearly —
    * the round-11 scale audit's one red flag.
    */
  def semanticDedup(
      corpus: DataFrame,
      nCentroids: Int,
      tau: Double,
      refineIters: Int = 0): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val centroids =
      if (refineIters > 0) kmeansCentroids(corpus, nCentroids, refineIters)
      else corpus
        .orderBy("vec_id")
        .limit(nCentroids)
        .select(col("vec_id").as("c_id"), col("cv").as("centroid"))
    // bounded driver state: C×dim, the same category as ivfTopK's collect
    val cents = centroids.collect()
    if (cents.isEmpty) return emptySurvivors(corpus)
    val centArr = cents.map(_.getSeq[Double](1).toArray)
    val idArr = cents.map(_.getLong(0))
    val assigned = corpus
      .withColumn("c_id",
        column(graft.expressions.NearestCells(
          expression(col("cv")), centArr, idArr, 1)).getItem(0))
      .repartition(col("c_id"))
    inCellDedup(assigned, tau)
  }

  /** Corpus-SCALED SemDeDup: cell count grows with the corpus (expected
    * cell size ~`cellStride`) while driver state stays DEPLOYMENT-CONSTANT
    * and per-row assignment cost grows only logarithmically. The round-11
    * audit showed the flat path cannot scale its cell count (argmin over
    * C = N/64 plan-constant centroids is O(N²·dim) compute with an O(N)
    * driver collect); the round-12 two-level fix still sized its router
    * table ceil(sqrt(F)) — an O(N^1.5) total-compute asymptote with a
    * sqrt(N) driver collect. This variant removes the last data-derived
    * constant:
    *
    *  - Fine cells are seeded by the stride-grid sample `vec_id %
    *    cellStride == 0` (plus the min id, so a nonempty corpus always has
    *    >= 1 seed) — a distributed filter, never a GlobalLimit.
    *  - Routing descends a RADIX-RANK TREE of constant fan-out `fanout`
    *    (the multi-level coarse-quantizer shape of Johnson et al. 2017,
    *    "Billion-scale similarity search with GPUs", with the hierarchy
    *    made deterministic): rank the F fine seeds by id (distributed
    *    dense rank, [[ZipIndex.withOrderedIndex]] — range partition +
    *    in-partition sort + offset arithmetic, no global window), set
    *    L = ⌈log_fanout F⌉ levels, and let the node of leaf rank r at
    *    depth d be ⌊r / fanout^(L-d)⌋ — contiguous rank blocks, each
    *    node represented by its minimum-rank fine seed. A row starts at
    *    the root and at each depth takes the (squared-L2 asc, id asc)
    *    argmin over its node's ≤ `fanout` child representatives — the
    *    root's children via a driver-collected
    *    [[graft.expressions.NearestCells]] narrow map (the ONLY driver
    *    state: ≤ fanout reps, a deployment constant like ivfTopK's
    *    nCentroids), every deeper level via an equi-join against that
    *    depth's DISTRIBUTED bundle table (one row per node, ≤ fanout
    *    structs wide — bounded row width by construction) and the
    *    [[graft.expressions.NearestInBundle]] codegen argmin. The last
    *    depth's bundles hold the fine seeds themselves, so the descent
    *    ends in an exact in-block argmin.
    *
    * Cost at corpus size N (F = N/cellStride): per-row fanout·L·dim flops
    * and L equi-joins → total assignment compute O(N·log N), vs N^1.5
    * (two-level) and N² (flat-at-this-sizing). Driver state: ≤ fanout
    * reps + one partition-count array — both deployment constants. Bundle
    * tables sum to ~F·fanout/(fanout-1) rows across depths, distributed,
    * broadcast while they fit and shuffled equi-joins beyond. Every row
    * always finds its bundle: a node exists iff it contains a fine, and
    * then its min-rank child exists in that node's bundle, so the inner
    * join drops nothing (no "inactive router" repair step — ownership is
    * structural, not distance-based).
    *
    * The cell MAP is a greedy-descent approximation of the flat argmin
    * (identical when L = 1, i.e. F <= fanout): SemDeDup's cluster gate is
    * itself a recall heuristic, so any deterministic partition of the
    * space is a valid gate (Abbas et al. 2023 accept exactly this trade
    * in their k-means), and near-identical vectors follow identical
    * comparisons, so duplicates always co-locate — the property the dedup
    * actually needs. The DuckDB oracle replays seed selection, ranking,
    * every descent level and the keeper arithmetic exactly
    * (PortableSql.semanticDedupOracle), so the correctness gate covers
    * this 100 TB code path itself; SimilaritySpec holds a brute-force
    * replay differential across 1-, 2- and 3-level corpora.
    *
    * Centroid refinement (kmeansCentroids) deliberately does NOT compose
    * here: its per-iteration broadcast-assign is O(C·dim) per row — the
    * very cost this variant removes. Refinement stays a caller-fixed-C
    * feature of [[semanticDedup]].
    *
    * Input: (vec_id, cv: array<double>); output: (vec_id, c_id) survivors.
    */
  def semanticDedupScaled(
      corpus: DataFrame,
      tau: Double,
      cellStride: Int = 64,
      fanout: Int = 32): DataFrame = {
    require(cellStride >= 1, s"cellStride must be >= 1, got $cellStride")
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    if (corpus.isEmpty) return emptySurvivors(corpus)
    inCellDedup(semanticAssignScaled(corpus, cellStride, fanout), tau)
  }

  /** The ranked fine-seed table and the derived radix-rank routing tree of
    * [[semanticDedupScaled]], factored out so ScaleUpSpec can pin the
    * deployment-constant bounds (root reps <= fanout, bundle width <=
    * fanout, levels = ⌈log_fanout F⌉) executable at growing F. `ranked` is
    * materialized once (localCheckpoint) — every level's bundle build and
    * the root collect reuse it instead of re-running the seed scan +
    * range shuffle per level. */
  private[graft] final case class RadixTree(
      ranked: DataFrame, // (c_id, centroid, r) — r = 0-based rank by c_id
      fineCount: Long,
      fanout: Int) {
    /** Levels of descent: smallest L with fanout^L >= F. */
    val levels: Int = {
      var l = 1
      var cap = fanout.toLong
      while (cap < fineCount) { cap *= fanout; l += 1 }
      l
    }
    private def ipow(e: Int): Long = {
      var p = 1L; var i = 0
      while (i < e) { p *= fanout; i += 1 }
      p
    }
    /** The root's <= fanout child reps: (gid, centroid). gid is the
      * child-node id at depth 1 — the leaf c_id itself when levels == 1
      * (rank order and id order coincide, so tie-breaks agree either
      * way). */
    def rootChildren: DataFrame = {
      val span = ipow(levels - 1)
      val gid =
        if (levels == 1) col("c_id") else expr(s"r DIV $span").cast("long")
      ranked.filter(col("r") % span === 0)
        .select(gid.as("gid"), col("centroid"))
    }
    /** Depth-d (2 <= d <= levels) bundle table: (g, bundle) with g the
      * depth-(d-1) node id and bundle the <= fanout child structs
      * (id, centroid) — id is the depth-d node id, or the leaf c_id at
      * the final depth. */
    def bundlesAt(d: Int): DataFrame = {
      require(d >= 2 && d <= levels, s"depth $d out of 2..$levels")
      val span = ipow(levels - d)
      val childId =
        if (d == levels) col("c_id") else expr(s"r DIV $span").cast("long")
      ranked.filter(col("r") % span === 0)
        .select(expr(s"r DIV ${span * fanout}").cast("long").as("g"),
          struct(childId.as("c_id"), col("centroid")).as("child"))
        .groupBy("g")
        .agg(collect_list(col("child")).as("bundle"))
    }
  }

  private[graft] def radixTree(
      corpus: DataFrame, cellStride: Int, fanout: Int): RadixTree = {
    // stride-grid fine seeds; the min id joins unconditionally so sparse /
    // offset id spaces still seed (idempotent when min % stride == 0)
    val minId = corpus.agg(min(col("vec_id"))).head.getLong(0)
    val fines = corpus
      .filter(col("vec_id") % cellStride === 0 || col("vec_id") === minId)
      .select(col("vec_id").as("c_id"), col("cv").as("centroid"))
    // withOrderedIndex materializes the sorted seed layout internally
    // (its correctness requires one frozen partitioning); `ranked` is that
    // checkpoint plus narrow arithmetic and a tiny broadcast join, so the
    // per-level bundle builds and the root collect re-derive it cheaply
    // and deterministically — no second materialization needed
    val ranked = ZipIndex.withOrderedIndex(fines, "c_id", "r")
    RadixTree(ranked, ranked.count(), fanout)
  }

  /** The radix-rank-tree assignment of [[semanticDedupScaled]], exposed for
    * the spec-level differential against a brute-force replay of the same
    * rule. Returns (vec_id, cv, c_id), repartitioned by cell for the
    * in-cell join. Caller guarantees a nonempty corpus. */
  private[graft] def semanticAssignScaled(
      corpus: DataFrame,
      cellStride: Int,
      fanout: Int = 32): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val tree = radixTree(corpus, cellStride, fanout)
    // level 1: argmin over the root's <= fanout reps — the only collect
    val rootRows = tree.rootChildren.collect()
    val rootCents = rootRows.map(_.getSeq[Double](1).toArray)
    val rootIds = rootRows.map(_.getLong(0))
    var cur = corpus.withColumn("g",
      column(graft.expressions.NearestCells(
        expression(col("cv")), rootCents, rootIds, 1)).getItem(0))
    // levels 2..L: equi-join the depth's bundle table on the current node,
    // argmin within the <= fanout child structs. Every g has a bundle (a
    // node exists iff it holds a fine, whose min-rank child is in the
    // bundle), so the inner join is total over rows.
    for (d <- 2 to tree.levels) {
      cur = cur.join(tree.bundlesAt(d), Seq("g"))
        .withColumn("g2", column(graft.expressions.NearestInBundle(
          expression(col("cv")), expression(col("bundle")))))
        .select(col("vec_id"), col("cv"), col("g2").as("g"))
    }
    cur.select(col("vec_id"), col("cv"), col("g").as("c_id"))
      .repartition(col("c_id"))
  }

  /** Shared SemDeDup tail: in-cell pair generation (equi-join on the cell
    * id over the pre-partitioned assignment — one exchange feeds both
    * sides) + min-id keeper. `assigned`: (vec_id, cv, c_id). */
  private def inCellDedup(assigned: DataFrame, tau: Double): DataFrame = {
    val dropped = assigned
      .select(col("c_id"), col("vec_id").as("id_a"), col("cv").as("v_a"))
      .join(assigned.select(col("c_id"), col("vec_id").as("id_b"), col("cv").as("v_b")),
        Seq("c_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(V.cosineNative(col("v_a"), col("v_b")) >= tau)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    Dedup.keepFromPairs(assigned.select("vec_id", "c_id"), "vec_id", dropped)
  }

  private def emptySurvivors(corpus: DataFrame): DataFrame =
    corpus.select(col("vec_id")).limit(0)
      .withColumn("c_id", lit(0L))
      .select("vec_id", "c_id")

  /** Exact-Jaccard near-dup pairs with log-length-band blocking.
    *
    * Candidates must share `lang` and land in the same or an ADJACENT
    * log(1+n_chars) band — real near-dups rarely have identical lengths
    * (the flaw of blocking on exact n_chars), but their length ratio is
    * bounded: token-set Jaccard >= 0.5 implies a <= 2x size ratio. The
    * adjacency join stays an equi-join: the probe side explodes each doc
    * to bands {b-1, b, b+1}, the build side keeps its own band, and a pair
    * matches exactly once (the three probe keys are distinct).
    *
    * `bandWidth` is the recall/cost dial: width w with +-1 adjacency
    * catches pairs whose length ratio is under ~e^(2w). The 0.1 default
    * (ratio ~1.2) suits corpora where near-dups are light edits; width
    * ln(2) ~ 0.7 guarantees full recall for any pair with Jaccard >= 0.5
    * at a larger candidate volume.
    */
  def jaccardNearDupPairs(
      docs: DataFrame, // (doc_id, lang, n_chars, toks: array<string>)
      minJaccard: Double,
      bandWidth: Double = 0.1,
      mode: CheckpointMode = CheckpointMode.Local,
      corpusRows: Option[Long] = None): DataFrame = {
    // mode = Reliable(dir): the lazy lineage truncations below become
    // reliable checkpoints, so an executor lost after materialization
    // re-reads instead of failing the job (CheckpointModeSpec proves
    // output parity)
    val lin = new Lineage(docs.sparkSession, mode)
    // Determinism note: the oracle computes the band as DuckDB
    // ln(1+n)/w while this side uses JVM log1p — different libm entry
    // points, so a value landing within 1 ULP of a band boundary could in
    // principle disagree. With band magnitudes ~40 the boundary window is
    // ~7e-14 per distinct n_chars; across thousands of values the flake
    // probability is ~1e-10 — accepted rather than redesigned around.
    def band(c: Column): Column = floor(log1p(c) / bandWidth).cast("long")
    // Jaccard is set-semantic, so only DISTINCT tokens matter from here on.
    // Lazy localCheckpoint: this subtree (scan + tokenize + distinct) feeds
    // THREE plan branches (token explode, and both candidate re-joins) —
    // checkpointing materializes it once on first use instead of running
    // the tokenizer three times per invocation.
    // Measured dead ends (sf0.1, do not redo): eager checkpoints, count()
    // barriers after each checkpoint, and checkpointing `cand` all came out
    // 1.5-1.6x SLOWER end-to-end than this lazy one-action form — the
    // single action lets AQE overlap the checkpoint-materializing stages,
    // and the dominant cost is the candidate join+dedup stage (~70%), not
    // recomputation. Profile `pairs` mode times build vs count if revisiting.
    // Token-HASH pipeline (round-9): every stage from here — the token
    // explode, the frequency table, the candidate join key and the verify
    // arrays — works on xxhash64(token) longs, not strings. The hash is
    // applied ONCE per document; `hs` is the sorted distinct hash array,
    // so the quadratic-ish candidate stage shuffles 8-byte longs (~40%
    // narrower rows than UTF8 tokens plus offsets) and the verify is a
    // primitive merge-intersection (JaccardSortedLongs) instead of a
    // per-pair UTF8 hash set. Exactness: Jaccard over the hash SETS
    // equals Jaccard over the token sets unless two distinct tokens of
    // one compared pair collide in 64 bits (~7e-17 per pair — accepted
    // risk class, see JaccardSortedLongs). The global frequency order
    // used for prefixes changes (ties order by hash, not lexicographs) —
    // irrelevant to losslessness, which only needs SOME consistent
    // global order.
    // Null tokens are dropped BEFORE hashing: xxhash64 maps a null input
    // to its seed constant (42), so a tokenizer emitting null elements
    // would otherwise count one phantom token shared by all such docs
    // (r9 ADVICE). The library tokenizers never emit null, so this filter
    // is a no-op in practice; it pins the semantics (Jaccard over the
    // non-null token set) rather than inheriting a hash artifact.
    // Eager-vs-lazy checkpoint dial for the two SHARED subtrees (base,
    // prefix). Lazy materialization lets AQE overlap the
    // checkpoint-building stages — but the overlap is also a RACE: the
    // candidate join's two sides (and verify's two corpus branches) can
    // compute the same not-yet-materialized checkpoint partitions
    // CONCURRENTLY, duplicating the tokenizer and the freq+window stage.
    // Measured round 13 at a 100x corpus (same window, fresh JVMs): lazy
    // 531/557/582/673 s vs eager 400/528 s — the duplicated prefix build
    // costs more than the lost overlap once the shared subtrees are
    // expensive. At sf0.1 the round-10 measurement went the other way
    // (eager barriers 1.5-1.6x slower — tiny stages, overlap wins), so
    // the dial is corpus-sized: lazy below ~100k docs, eager barriers
    // above. SPARK_GRAFT_JACCARD_EAGER overrides both ways for probes.
    val eagerCkpt = sys.env.get("SPARK_GRAFT_JACCARD_EAGER") match {
      case Some(v) => v == "1"
      case None    => corpusRows.exists(_ > 100000L)
    }
    val base = docs
      .select(col("doc_id"), col("lang"), band(col("n_chars")).as("band"),
        sort_array(array_distinct(transform(
          filter(col("toks"), _.isNotNull), xxhash64(_)))).as("hs"))
      .withColumn("n_toks", size(col("hs")))
      .transform(df => lin.tracked(df, eager = eagerCkpt)._1)

    // PPJoin prefix filter (Bayardo/Chaudhuri): under a global token order
    // (rarest first), any pair with Jaccard >= t shares at least one token
    // within each side's first |x| - ceil(t*|x|) + 1 tokens. Joining on
    // (lang, band, prefix-token) therefore loses NO qualifying pair —
    // the oracle brute-forces within bands and the result sets match —
    // while the candidate count is bounded by token co-occurrence instead
    // of growing quadratically with band population (the band-only join
    // measured 20x time at 10x corpus; this is the 100 TB shape).
    val toksExp = base.select(col("doc_id"), col("lang"), col("band"),
      col("n_toks"), explode(col("hs")).as("token"))
    val freq = toksExp.groupBy("token").agg(count(lit(1)).as("tf"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("tf"), col("token"))
    // FP slack (here and in the candidate prunes below): the thresholds are
    // doubles, so e.g. fl(0.8)*5 = 4.0000000000000004 and a bare ceil/compare
    // would over-prune a pair whose Jaccard is EXACTLY t. Subtracting 1e-9
    // before ceil/compare makes every prune conservatively slack — the final
    // exact-jaccard filter removes any extra candidates, so slack costs
    // nothing in correctness and keeps the prunes genuinely lossless.
    val prefix = toksExp.join(freq, Seq("token"))
      .withColumn("r", row_number().over(wDoc))
      .filter(col("r") <=
        col("n_toks") - ceil(lit(minJaccard) * col("n_toks") - lit(1e-9)) + 1)
      .select("doc_id", "lang", "band", "token", "n_toks", "r")
      // read by both sides of the candidate join
      .transform(df => lin.tracked(df, eager = eagerCkpt)._1)

    // Asymmetric prefixes (PPJoin, Xiao et al. WWW'08): orient each pair so
    // side b is the SMALLER document ((n, id) lexicographic tie-break) —
    // then b only needs the shorter INDEX prefix
    //   |y| - ceil(2t/(1+t) * |y|) + 1
    // while a keeps the probe prefix |x| - ceil(t*|x|) + 1. Lossless under
    // the size filter: if every common token sat beyond y's index prefix,
    // overlap <= ceil(2t/(1+t)*|y|) - 1 < 2t/(1+t)*|y| <= t/(1+t)*(|x|+|y|)
    // <= alpha (using |y| <= |x|) — contradiction, so the first common
    // token is inside BOTH prefixes. At t=0.5 the index prefix is ~n/3 vs
    // the probe ~n/2: a third fewer build-side rows into the candidate
    // join, which is the pipeline's dominant stage.
    val a = prefix.select(
      col("doc_id").as("doc_a"), col("lang"), col("band"), col("token"),
      col("n_toks").as("n_a"), col("r").as("r_a"))
    val b = prefix
      .filter(col("r") <= col("n_toks") -
        ceil(lit(2 * minJaccard / (1 + minJaccard)) * col("n_toks") - lit(1e-9)) + 1)
      .select(
        col("doc_id").as("doc_b"), col("lang"), col("band").as("b_band"), col("token"),
        col("n_toks").as("n_b"), col("r").as("r_b"))
      .withColumn("band",
        explode(array(col("b_band") - 1, col("b_band"), col("b_band") + 1)))
      .drop("b_band")
    // candidate ids only — token arrays stay out of the quadratic-ish join.
    // Two more PPJoin prunes, both applied INSIDE the join (before the
    // dedup shuffle), both lossless:
    //  - size filter: J(A,B) <= min/max, so t*|A| <= |B| <= |A|/t;
    //  - positional filter: a qualifying pair needs overlap
    //    alpha = ceil(t/(1+t) * (|A|+|B|)), and its FIRST common token (in
    //    the global frequency order) provably sits within BOTH prefixes, at
    //    positions (r_a, r_b) with overlap <= 1 + min(|A|-r_a, |B|-r_b).
    //    Testing that bound >= alpha on EVERY matched-token row is safe:
    //    the first-common-token row of any qualifying pair passes it.
    // Without these, shared-vocabulary corpora go quadratic on frequent
    // prefix tokens (measured 52x time at 10x corpus; with them, the
    // candidate stream stays proportional to true near-dup volume).
    val alpha = ceil(
      lit(minJaccard / (1 + minJaccard)) * (col("n_a") + col("n_b")) - lit(1e-9))
    // The pair-level dedup doubles as the FIRST-COMMON-TOKEN positional
    // filter: for a qualifying pair the globally-first shared token t0 is
    // inside both prefixes (proof above) and — both documents being sorted
    // by the same (tf, token) order — t0 has the minimum r_a AND the
    // minimum r_b among matched rows. So the packed per-side mins recover
    // t0's exact positions and the positional bound is tested on t0, not on
    // "some row" (the per-row variant keeps a pair if ANY matched row
    // passes; this kills every pair whose true first common token sits too
    // deep — strictly tighter, still lossless).
    // EXPANSION-JOIN partitioning (the 100x lesson): AQE sizes post-shuffle
    // partitions from the exchange's INPUT bytes, but this join expands its
    // ~GB-scale prefix inputs into tens of GB of matched candidate rows —
    // left to itself, AQE coalesces both sides to input-sized partition
    // counts (measured: 33 partitions at a 100x corpus, 360 s max tasks,
    // 16 GB of sort/agg spill, and the whole query superlinear at
    // per-unit 2.2). An explicit repartition with a user-specified count
    // marks the exchange non-coalescible, which AQE honors for the whole
    // join. Same medicine on the verify joins below, whose outputs carry
    // two token arrays per row. The count itself scales with the corpus
    // when the caller passes `corpusRows` (a memoized table count — free):
    // ~1 partition per 1k docs absorbs the measured ~2k-candidate-rows/doc
    // expansion within ~2M-row tasks, and small corpora skip the fixed
    // overhead of full-width shuffles (pinning the session cap at a 10x
    // corpus measured +84% on this query). Capped at
    // spark.sql.shuffle.partitions — the knob the caller already scales
    // with the corpus; without the hint, that cap is used directly.
    val cap = docs.sparkSession.sessionState.conf.numShufflePartitions
    val p = corpusRows
      .map(n => math.max(1L, math.min(cap.toLong, n / 1000 + 1)).toInt)
      .getOrElse(cap)
    // Candidate-join strategy dial (r14). Three regimes:
    //  - small corpora: the planner BROADCASTS the index side (it fits
    //    under the broadcast threshold) — the best plan; a hint here would
    //    defeat it (measured at sf0.1: hint forces SHJ and loses the
    //    broadcast's no-shuffle probe side).
    //  - large corpora: broadcast is impossible and the planner defaults
    //    to sort-merge, which SORTS both shuffled inputs before streaming
    //    the matched rows — pure overhead for this join, whose cost is
    //    producing/filtering the matched-prefix stream, not ordering it.
    //    SHUFFLE_HASH builds a per-partition hash map of the index side
    //    instead: measured at a 10x corpus 16.4 vs 19.7 s end-to-end
    //    (mins across 3 interleaved reps), at 100x see SCALE_r14. Build
    //    size is bounded by construction: the explicit repartition keeps
    //    ~1k docs' index prefixes per partition (~120k rows, single-digit
    //    MB) regardless of corpus size, so the hash map never approaches
    //    executor memory even at 1000x.
    // The dial is the same corpus-sized gate as the eager-checkpoint one:
    // hint only when the caller's corpusRows says broadcast is already
    // out of reach (see shjGate — ONE helper governs this join, the
    // containment expansion join, and the JaccardProbe mirror).
    val bSide = if (shjGate(corpusRows)) b.hint("SHUFFLE_HASH") else b
    val cand = a.repartition(p, col("lang"), col("band"), col("token"))
      .join(bSide, Seq("lang", "band", "token"))
      .filter(col("n_b") < col("n_a") ||
        (col("n_b") === col("n_a") && col("doc_b") < col("doc_a")))
      .filter(col("n_b") >= lit(minJaccard) * col("n_a") - lit(1e-9))
      .filter(lit(1) + least(col("n_a") - col("r_a"), col("n_b") - col("r_b")) >= alpha)
      // PACKED pair dedup (round-11): this agg's exchange is the
      // pipeline's largest by far (ShuffleProbe at a 10x corpus: 1.2 GB /
      // 57M rows — vs ~4 MB for the corpus arrays), so its ROW WIDTH is
      // the lever. Two facts let each side collapse to ONE long:
      //  - n is CONSTANT per (pair, side), so first(n) == min(n);
      //  - the matched ranks are ORDER-ISOMORPHIC across sides (both
      //    docs sort by the same global (tf, token) order, so a matched
      //    token preceding another in A precedes it in B too) — min(r_a)
      //    and min(r_b) are attained by the SAME row, the first common
      //    token t0 (the previous min_by(r_b, r_a) was therefore just
      //    min(r_b), extremum buffer wasted).
      // Pack (n << 32 | r): n constant per group makes the packed min
      // order BY r, so min(packed) == (n << 32 | r(t0)) exactly — two
      // plain 8-byte min buffers instead of two firsts (value+seen flag)
      // + a min + a min_by (value+ordering), roughly halving the
      // dominant shuffle's row width. Unpack is a narrow projection.
      // No overflow: n <= 2^31-1 so n<<32 < 2^63; 1 <= r <= n < 2^32.
      .select(col("doc_a"), col("doc_b"),
        (shiftleft(col("n_a").cast("long"), 32) + col("r_a")).as("pka"),
        (shiftleft(col("n_b").cast("long"), 32) + col("r_b")).as("pkb"))
      .groupBy("doc_a", "doc_b")
      .agg(min(col("pka")).as("pka"), min(col("pkb")).as("pkb"))
      .select(col("doc_a"), col("doc_b"),
        shiftright(col("pka"), 32).as("n_a"),
        col("pka").bitwiseAND(lit(0xFFFFFFFFL)).as("fa"),
        shiftright(col("pkb"), 32).as("n_b"),
        col("pkb").bitwiseAND(lit(0xFFFFFFFFL)).as("fb"))
      .filter(lit(1) + least(col("n_a") - col("fa"), col("n_b") - col("fb")) >= alpha)
      .select("doc_a", "doc_b")

    // merge-intersection over the sorted hash arrays — see the base-build
    // comment for why this is value-identical to string-set Jaccard
    val jac = {
      import org.apache.spark.sql.GraftColumnBridge.{column, expression}
      column(graft.expressions.JaccardSortedLongs(
        expression(col("hs_a")), expression(col("hs_b"))))
    }
    // Verify-stage shuffle discipline (round-10; the r9 VERDICT's top
    // lever — both arrays used to ride through two repartition+join
    // shuffles). Two changes, both pure plan reshapes:
    //  - ONE corpus-array exchange, reused: `baseArr` is repartitioned by
    //    doc_id below the per-join alias projections, so both joins see
    //    the required HashPartitioning through the alias
    //    (PartitioningPreservingUnaryExecNode) and the two exchange
    //    subtrees are canonically EQUAL (aliases and expr ids normalize
    //    away). Mechanism, measured not assumed: under AQE the reuse is
    //    invisible in the initial plan — it happens at stage
    //    materialization, when the second branch hits the runtime stage
    //    cache and the FINAL adaptive plan carries a ReusedExchange over
    //    the corpus branch (ExchangeReuseSpec executes this operator and
    //    asserts exactly that; r10 wrongly credited the static
    //    ReuseExchange rule, which never runs under AQE). With AQE off
    //    the static ReuseExchangeAndSubquery rule applies the same
    //    canonicalized-subtree match, which is why the PLANS.md digest
    //    (taken AQE-off) shows reuse>=1 here. Either way the corpus
    //    arrays shuffle once, not twice. Measured magnitude
    //    (ShuffleProbe A/B, spark.sql.exchange.reuse on/off, 10x corpus):
    //    identical wall, 1216 vs 1220 MB shuffle write — the SYNTHETIC
    //    corpus's ~30-token docs make the hs arrays ~4 MB total, while
    //    the candidate stream carries 56.8M rows / 1.2 GB. The discipline
    //    is sized for real corpora, where hs is hundreds-to-thousands of
    //    hashes per doc (100x the synthetic width) and the duplicated
    //    corpus exchange would be a material fraction of verify bytes.
    //  - the SMALL side's array is the only pair-expanded payload to
    //    cross an exchange: hs_b (candidates orient b as the smaller doc,
    //    n_b <= n_a) is fetched first and travels through the doc_a
    //    re-key; hs_a joins in last and is consumed by the jaccard
    //    projection inside the same stage, never entering an exchange.
    //    At minJaccard = 0.5 the b-side prefix bound gives
    //    sum(n_b) <= sum(n_a), typically ~25% fewer payload bytes, on
    //    top of the corpus-exchange halving.
    val baseArr = base.select(col("doc_id"), col("hs"))
      .repartition(p, col("doc_id"))
    cand
      .repartition(p, col("doc_b"))
      .join(baseArr.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .repartition(p, col("doc_a"))
      .join(baseArr.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= minJaccard)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"), col("jaccard"))
  }

  /** Asymmetric CONTAINMENT near-dup pairs: ordered (doc_a, doc_b) with
    * |A ∩ B| / |A| >= minContainment over the docs' DISTINCT token sets —
    * doc_a is the (mostly) CONTAINED document. This is the relation
    * symmetric Jaccard structurally misses: a doc wholly embedded in a
    * larger one (boilerplate supersets, quote-and-extend pages — the
    * Lee et al. 2022 §4 case, cf. the span-level q_dedup_substring
    * family) scores J = |A|/|B| ≈ 0 while containment = 1.
    *
    * Recall design — containment admits NO length banding (|B| is
    * unbounded above relative to |A|), so the PPJoin length-band frame of
    * [[jaccardNearDupPairs]] does not apply. What still holds is the
    * prefix-filter pigeonhole on the CONTAINED side only:
    *
    *  - required overlap: a qualifying pair needs
    *    |A ∩ B| >= need(A) = ceil(t·|A|).
    *  - probe prefix (A): under any global token order, if every common
    *    token sat beyond A's first |A| − need(A) + 1 tokens, overlap
    *    <= need(A) − 1 — contradiction. So joining A's prefix tokens
    *    against B's FULL token list loses no qualifying ordered pair
    *    (the asymmetric one-side-prefixed variant of Xiao et al.'s
    *    prefix filter: the index side cannot be prefixed because its
    *    bound would need |A|, unknown at index time).
    *  - the global order is rarest-first (tf, then token hash), so probe
    *    prefixes hold each document's globally rarest tokens and the
    *    candidate volume is Σ over prefix tokens of tf — bounded by true
    *    co-occurrence, not corpus². Same shape that keeps the Jaccard
    *    candidate stream linear per decade (tools/JaccardProbe).
    *  - prunes inside the join, both conservatively slack (1e-9, cf. the
    *    FP-slack note in [[jaccardNearDupPairs]]) and therefore lossless:
    *    |B| >= need(A) (overlap can't exceed |B|), and the positional
    *    bound 1 + min(|A|−r_a, |B|−r_b) >= need(A) tested on the pair's
    *    FIRST common token (recovered exactly by min/min_by over matched
    *    rows — both sides sort by the same global order, so the first
    *    common token minimizes both ranks; the proof in
    *    [[jaccardNearDupPairs]] carries over verbatim).
    *
    * Verify is exact: |A ∩ B| by primitive merge-intersection over the
    * sorted xxhash64 token arrays ([[graft.expressions.IntersectSortedLongs]]
    * — the count directly, never reconstructed from a ratio), then
    * containment = inter / |A| compared as a double exactly like the
    * brute-force oracle. Same 64-bit collision risk class as the Jaccard
    * pipeline (~7e-17/pair). Verify shuffle discipline matches the
    * round-10 Jaccard shape: ONE corpus-array exchange reused by both
    * joins, and the only pair-expanded array to cross an exchange is
    * hs_a — the CONTAINED side, which the |A| <= |B|/t bound keeps the
    * smaller side in the regime this operator exists for; hs_b joins in
    * last and is consumed by the containment projection in-stage.
    *
    * Output: (doc_a, doc_b, containment), ordered pairs, a ≠ b, same
    * lang; mutually-contained pairs appear in both directions. Empty
    * token sets are excluded (containment undefined).
    *
    * `minDocTokens` (default 1 = off): a CALLER CONTRACT that every doc
    * in `docs` has at least m distinct tokens, in exchange for an INDEX
    * prefix — the structural cost containment otherwise can't avoid.
    * With the floor, any qualifying pair needs overlap >= need(A) =
    * ceil(t·|A| − eps) >= ceil(t·m − eps) =: g, so if every common token
    * sat beyond B's first |B| − g + 1 (rarest-first) tokens, overlap <=
    * g − 1 — contradiction; keeping only that index prefix loses no
    * qualifying pair. The first common token t0 also remains inside BOTH
    * prefixes (it is the first, so "t0 beyond the g-prefix" puts every
    * common token beyond it — same contradiction), so the packed-min
    * positional recovery is untouched. At t = 0.8 and a 100-token floor
    * the index side drops 79 rows per doc from the candidate join's
    * build input. Docs violating the floor (n_toks < m) may lose recall
    * as CONTAINED sides — that is the contract, not a bug; the default
    * m = 1 makes the filter a no-op (SimilaritySpec proves m > 1 output
    * == m = 1 output on a floor-respecting corpus). */
  def containmentNearDupPairs(
      docs: DataFrame, // (doc_id, lang, toks: array<string>)
      minContainment: Double,
      mode: CheckpointMode = CheckpointMode.Local,
      corpusRows: Option[Long] = None,
      minDocTokens: Long = 1L): DataFrame = {
    val lin = new Lineage(docs.sparkSession, mode)
    // sorted distinct hash array — one hash pass per doc, shared by the
    // token explode and both verify joins (lazy checkpoint, cf. the
    // jaccard base-build note). Null tokens dropped before hashing.
    val base = docs
      .select(col("doc_id"), col("lang"),
        sort_array(array_distinct(transform(
          filter(col("toks"), _.isNotNull), xxhash64(_)))).as("hs"))
      .withColumn("n_toks", size(col("hs")))
      .filter(col("n_toks") > 0)
      .transform(df => lin.tracked(df, eager = false)._1)

    val toksExp = base.select(col("doc_id"), col("lang"), col("n_toks"),
      explode(col("hs")).as("token"))
    val freq = toksExp.groupBy("token").agg(count(lit(1)).as("tf"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("tf"), col("token"))
    // full per-doc ranks under the global rarest-first order: the probe
    // side filters to its prefix; the index side keeps every token unless
    // the caller asserts a size floor (minDocTokens — scaladoc proof)
    val ranked = toksExp.join(freq, Seq("token"))
      .withColumn("r", row_number().over(wDoc))
      .select("doc_id", "lang", "token", "n_toks", "r")
      .transform(df => lin.tracked(df, eager = false)._1)

    def need(nA: Column): Column = ceil(lit(minContainment) * nA - lit(1e-9))
    val a = ranked
      .filter(col("r") <=
        col("n_toks") - need(col("n_toks")) + 1)
      .select(col("doc_id").as("doc_a"), col("lang"), col("token"),
        col("n_toks").as("n_a"), col("r").as("r_a"))
    // index prefix under the caller's size floor (no-op at the default
    // m = 1: g = ceil(t − eps) = 1 keeps every rank r <= n_toks) —
    // losslessness proof in the scaladoc
    val g = math.ceil(minContainment * minDocTokens - 1e-9).toLong
    val b = ranked
      .filter(col("r") <= col("n_toks") - lit(g) + 1)
      .select(col("doc_id").as("doc_b"), col("lang"), col("token"),
        col("n_toks").as("n_b"), col("r").as("r_b"))

    // expansion-join partitioning: same AQE-coalescing opt-out and
    // corpus-derived sizing as the jaccard candidate join
    val cap = docs.sparkSession.sessionState.conf.numShufflePartitions
    val p = corpusRows
      .map(n => math.max(1L, math.min(cap.toLong, n / 1000 + 1)).toInt)
      .getOrElse(cap)
    // same corpus-gated SHUFFLE_HASH dial as the jaccard candidate join
    // (rationale and measurements there; shjGate is the one shared gate):
    // avoid SMJ's input sorts once broadcast is out of reach;
    // per-partition build stays ~1k docs' rows
    val bSide = if (shjGate(corpusRows)) b.hint("SHUFFLE_HASH") else b
    val cand = a.repartition(p, col("lang"), col("token"))
      .join(bSide, Seq("lang", "token"))
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("n_b") >= need(col("n_a")))
      .filter(lit(1) + least(col("n_a") - col("r_a"), col("n_b") - col("r_b")) >=
        need(col("n_a")))
      // packed pair dedup — same two facts and the same (n << 32 | r)
      // packing as the jaccard agg (see the proof there): n constant per
      // (pair, side) and rank order isomorphic across sides, so two plain
      // packed mins recover the first common token's exact positions at
      // half the row width of the first/min/min_by form. This agg's
      // exchange carries the full candidate stream (the index side is
      // unprefixed absent a minDocTokens floor), so width matters even
      // more here.
      .select(col("doc_a"), col("doc_b"),
        (shiftleft(col("n_a").cast("long"), 32) + col("r_a")).as("pka"),
        (shiftleft(col("n_b").cast("long"), 32) + col("r_b")).as("pkb"))
      .groupBy("doc_a", "doc_b")
      .agg(min(col("pka")).as("pka"), min(col("pkb")).as("pkb"))
      .select(col("doc_a"), col("doc_b"),
        shiftright(col("pka"), 32).as("n_a"),
        col("pka").bitwiseAND(lit(0xFFFFFFFFL)).as("fa"),
        shiftright(col("pkb"), 32).as("n_b"),
        col("pkb").bitwiseAND(lit(0xFFFFFFFFL)).as("fb"))
      .filter(lit(1) + least(col("n_a") - col("fa"), col("n_b") - col("fb")) >=
        need(col("n_a")))
      .select("doc_a", "doc_b", "n_a")

    val inter = {
      import org.apache.spark.sql.GraftColumnBridge.{column, expression}
      column(graft.expressions.IntersectSortedLongs(
        expression(col("hs_a")), expression(col("hs_b"))))
    }
    val baseArr = base.select(col("doc_id"), col("hs"))
      .repartition(p, col("doc_id"))
    cand
      .repartition(p, col("doc_a"))
      .join(baseArr.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .repartition(p, col("doc_b"))
      .join(baseArr.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .withColumn("containment", inter.cast("double") / col("n_a"))
      .filter(col("containment") >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("containment"))
  }

  /** Persistable band table of a shingled corpus: (id, band_idx,
    * band_hash) — the compact representation incremental dedup joins
    * against. k longs per doc regardless of document size, so the table is
    * orders of magnitude smaller than the corpus text and is the ONLY
    * state an ingest pipeline must keep to near-dup new arrivals. */
  def bandTable(
      docs: DataFrame, // (id, shingles: array<string>)
      k: Int,
      nBands: Int,
      portable: Boolean = false): DataFrame = {
    val rowsPerBand = k / nBands
    val signed = signShingles(docs, k, portable)
    val bandExpr =
      if (portable) Portable.bandKeys(col("sig"), nBands, rowsPerBand)
      else MinHash.bands(col("sig"), nBands, rowsPerBand)
    signed.select(col("id"),
      posexplode(bandExpr).as(Seq("band_idx", "band_hash")))
  }

  /** (id, shingles) -> (id, [hs,] sig): signature behind an id-hash
    * exchange so CollapseProject cannot inline the (expensive) signature
    * expression into downstream joins. Portable mode md5-hashes each
    * shingle ONCE before the exchange; the k components are affine maps of
    * that one base-hash array (graft.functions.Portable). */
  private def signShingles(docs: DataFrame, k: Int, portable: Boolean): DataFrame =
    if (portable)
      docs.withColumn("hs", transform(col("shingles"), Portable.h48(_)))
        .repartition(col("id"))
        .withColumn("sig", Portable.minhashFromHashes(col("hs"), k))
    else
      docs.repartition(col("id"))
        .withColumn("sig", MinHash.signatureNative(col("shingles"), k))

  /** Incremental near-dup: which incoming docs collide with the EXISTING
    * corpus, joining the new batch's bands against the persisted
    * [[bandTable]] — the corpus text is never rescanned. Output one row
    * per (incoming id, matched existing id); anti-join the ids off the
    * batch to admit only fresh content. The streaming-ingest shape: state
    * = band table, growth = append the admitted docs' bands. */
  def incrementalNearDup(
      existingBands: DataFrame, // (id, band_idx, band_hash)
      incoming: DataFrame,      // (id, shingles: array<string>)
      k: Int,
      nBands: Int,
      portable: Boolean = false): DataFrame = {
    val inBands = bandTable(incoming, k, nBands, portable)
    inBands.join(
        existingBands.select(col("id").as("matched_id"),
          col("band_idx"), col("band_hash")),
        Seq("band_idx", "band_hash"))
      .select(col("id"), col("matched_id"))
      .dropDuplicates("id", "matched_id")
  }

  /** MinHash/LSH candidate pairs over a document table: shingle → signature
    * → bands → band-key equi-join → distinct pairs with estimated Jaccard.
    * `docs` must carry (id, shingles: array<string>). */
  def minhashCandidatePairs(
      docs: DataFrame,
      k: Int,
      nBands: Int,
      minEstJaccard: Double,
      portable: Boolean = false): DataFrame = {
    val rowsPerBand = k / nBands
    // Barrier between shingling and signing (inside signShingles): without
    // it CollapseProject substitutes the caller's shingle expression into
    // each of the k signature components and the (interpreted) shingling
    // runs k times per row. The exchange materializes shingles once and
    // spreads the hashing across the cluster.
    val signed = signShingles(docs, k, portable)
    // The repartition is load-bearing, not a tuning knob: without an
    // exchange, CollapseProject inlines the signature expression into the
    // self-join and recomputes the full MinHash PER CANDIDATE PAIR (360s at
    // sf0.1). The exchange materializes signatures once, and because it
    // hash-partitions on the join keys the join adds no further shuffle.
    val bandExpr =
      if (portable) Portable.bandKeys(col("sig"), nBands, rowsPerBand)
      else MinHash.bands(col("sig"), nBands, rowsPerBand)
    val banded = signed
      .select(
        col("id"), col("sig"),
        posexplode(bandExpr).as(Seq("band_idx", "band_hash")))
      .repartition(col("band_idx"), col("band_hash"))
    val a = banded.select(
      col("band_idx"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(
      col("band_idx"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    // est-filter BEFORE the pair dedup: the estimate is a cheap per-row
    // expression, while dropDuplicates shuffles whole signature arrays —
    // on a shared-vocabulary corpus the candidate set is large and the
    // filter prunes it by orders of magnitude first.
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("est_jaccard", MinHash.estJaccard(col("sig_a"), col("sig_b"), k))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("id_a", "id_b", "est_jaccard")
      .dropDuplicates("id_a", "id_b")
  }
}
