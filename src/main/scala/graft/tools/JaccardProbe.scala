package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cardinality probe for the PPJoin near-dup pipeline: prints the row
  * counts of each pruning stage at a given sfDir so scaling behavior is
  * attributable to a STAGE, not guessed from end-to-end walltime.
  * Usage: runMain graft.tools.JaccardProbe <sfDir> [shuffle] [minJaccard] [time]
  *
  * With the 4th arg `time`, runs the WALL-TIME attribution instead: each
  * stage is eagerly materialized (localCheckpoint + count) and timed, so
  * the pair-gen cost splits into base / prefix-build / candidate-join /
  * verify. Materialization barriers remove the stage overlap AQE gives
  * the one-action production plan, so the stage SUM exceeds the
  * end-to-end wall (printed alongside from the real operator) — the
  * split is for attribution, the end-to-end number is the cost.
  *
  * With the 4th arg `v2`, runs the cardinality probe over the PEL-style
  * length-BUCKETED candidate key (partner-size log-buckets in the join
  * key; the probe side explodes only the bucket range its (n_a, r_a)
  * admits under the size + positional necessary conditions) — the
  * candidate-volume A/B for the bucketed pair-gen.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shuffle = if (args.length > 1) args(1) else "32"
    val minJ = if (args.length > 2) args(2).toDouble else 0.5
    val timed = args.length > 3 && args(3) == "time"
    val v2 = args.length > 3 && args(3) == "v2"
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (timed) { timedRun(spark, sfDir, minJ); spark.stop(); return }
    import graft.functions.{TextFunctions => T}
    val minJaccard = minJ
    val bandWidth = 0.1
    def band(c: org.apache.spark.sql.Column) =
      floor(log1p(c) / bandWidth).cast("long")
    // mirrors Similarity.jaccardNearDupPairs' hashed-token pipeline
    // (round-9): stages run on xxhash64 longs, cardinalities identical
    val base = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), band(col("n_chars")).as("band"),
        sort_array(array_distinct(
          transform(T.tokens(col("text")), xxhash64(_)))).as("hs"))
      .withColumn("n_toks", size(col("hs")))
      .localCheckpoint(false)
    val toksExp = base.select(col("doc_id"), col("lang"), col("band"),
      col("n_toks"), explode(col("hs")).as("token"))
    val freq = toksExp.groupBy("token").agg(count(lit(1)).as("tf"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("tf"), col("token"))
    val prefix = toksExp.join(freq, Seq("token"))
      .withColumn("r", row_number().over(wDoc))
      .filter(col("r") <=
        col("n_toks") - ceil(lit(minJaccard) * col("n_toks") - lit(1e-9)) + 1)
      .select("doc_id", "lang", "band", "token", "n_toks", "r")
      .localCheckpoint(false)
    val a0 = prefix.select(col("doc_id").as("doc_a"), col("lang"), col("band"),
      col("token"), col("n_toks").as("n_a"), col("r").as("r_a"))
    val b0 = prefix
      .filter(col("r") <= col("n_toks") -
        ceil(lit(2 * minJaccard / (1 + minJaccard)) * col("n_toks") - lit(1e-9)) + 1)
      .select(col("doc_id").as("doc_b"), col("lang"),
        col("band").as("b_band"), col("token"), col("n_toks").as("n_b"),
        col("r").as("r_b"))
      .withColumn("band", explode(array(col("b_band") - 1, col("b_band"), col("b_band") + 1)))
      .drop("b_band")
    // v2: PEL-style partner-size bucket in the key. Bucket width
    // w2 = ln(1/t)/2 puts the full valid partner range [t*n, n] across
    // <= 2 bucket widths, so the probe-side explode is 2-3 keys; the
    // range's upper end tightens with r_a via the positional necessary
    // condition n_b <= (1+t)/t*(n_a - r_a + 1) - n_a.
    val w2 = math.log(1.0 / minJ) / 2.0
    def tb(n: org.apache.spark.sql.Column) =
      floor(log(n.cast("double")) / w2).cast("long")
    val (a, b) = if (!v2) (a0, b0) else {
      val lowerN = ceil(lit(minJ) * col("n_a") - lit(1e-9))
      val upperN = least(col("n_a"),
        floor(lit((1 + minJ) / minJ) * (col("n_a") - col("r_a") + 1) -
          col("n_a") + lit(1e-6)))
      val av = a0
        .withColumn("__lo", tb(lowerN))
        .withColumn("__hi", tb(upperN))
        .filter(col("__hi") >= col("__lo"))
        .withColumn("tb", explode(sequence(col("__lo"), col("__hi"))))
        .drop("__lo", "__hi")
      val bv = b0.withColumn("tb", tb(col("n_b")))
      (av, bv)
    }
    val joinKeys = if (v2) Seq("lang", "band", "tb", "token")
                   else Seq("lang", "band", "token")
    val alpha = ceil(
      lit(minJaccard / (1 + minJaccard)) * (col("n_a") + col("n_b")) - lit(1e-9))
    val joined = a.join(b, joinKeys)
      .filter(col("n_b") < col("n_a") ||
        (col("n_b") === col("n_a") && col("doc_b") < col("doc_a")))
    val sized = joined
      .filter(col("n_b") >= lit(minJaccard) * col("n_a") - lit(1e-9))
    val positioned = sized
      .filter(lit(1) + least(col("n_a") - col("r_a"), col("n_b") - col("r_b")) >= alpha)
    val argmin = positioned
      .groupBy("doc_a", "doc_b")
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        min(col("r_a")).as("fa"), min_by(col("r_b"), col("r_a")).as("fb"))
      .filter(lit(1) + least(col("n_a") - col("fa"), col("n_b") - col("fb")) >= alpha)
    println(s"""{"sf": "$sfDir", "variant": "${if (v2) "v2" else "v1"}", "minJ": $minJ, "docs": ${base.count()}, "prefixRows": ${prefix.count()}, "probeRows": ${a.count()}, "indexRows": ${b.count()}, "joinRows": ${joined.count()}, "afterSize": ${sized.count()}, "afterPos": ${positioned.count()}, "candAnyRow": ${positioned.select("doc_a", "doc_b").distinct().count()}, "cand": ${argmin.count()}}""")
    spark.stop()
  }

  /** Wall-time attribution: the end-to-end operator first (one action, the
    * honest cost), then the same pipeline re-run with an eager
    * materialization barrier after each stage so each stage's wall is its
    * own. Mirrors Similarity.jaccardNearDupPairs including the
    * expansion-join repartition count and the packed pair-dedup agg. */
  private def timedRun(spark: SparkSession, sfDir: String, minJaccard: Double): Unit = {
    import graft.functions.{TextFunctions => T}
    import graft.operators.Similarity
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[jprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val bandWidth = 0.1
    def band(c: org.apache.spark.sql.Column) =
      floor(log1p(c) / bandWidth).cast("long")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        T.tokens(col("text")).as("toks"))
    val nDocs = graft.Tables.rowCount(spark, sfDir, "documents")
    // JIT/codegen warmup is NOT separated here: run reps at the caller
    // level and take later reps if that matters
    if (sys.env.get("SPARK_GRAFT_JPROBE_EXPLAIN").contains("1")) {
      val plan = Similarity.jaccardNearDupPairs(docs, minJaccard,
        corpusRows = Some(nDocs)).queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
          l.contains("BroadcastHashJoin")).map(_.trim.take(90))
      println(s"[jprobe] joins:\n  ${joins.mkString("\n  ")}")
    }
    time("end_to_end_pairs") {
      Similarity.jaccardNearDupPairs(docs, minJaccard,
        corpusRows = Some(nDocs)).count()
    }
    val base = time("s1_base_tokenize_hash") {
      val b = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), band(col("n_chars")).as("band"),
          sort_array(array_distinct(
            transform(T.tokens(col("text")), xxhash64(_)))).as("hs"))
        .withColumn("n_toks", size(col("hs")))
        .localCheckpoint(true)
      b.count(); b
    }
    val prefix = time("s2_freq_and_prefix") {
      val toksExp = base.select(col("doc_id"), col("lang"), col("band"),
        col("n_toks"), explode(col("hs")).as("token"))
      val freq = toksExp.groupBy("token").agg(count(lit(1)).as("tf"))
      val wDoc = Window.partitionBy("doc_id").orderBy(col("tf"), col("token"))
      val pr = toksExp.join(freq, Seq("token"))
        .withColumn("r", row_number().over(wDoc))
        .filter(col("r") <=
          col("n_toks") - ceil(lit(minJaccard) * col("n_toks") - lit(1e-9)) + 1)
        .select("doc_id", "lang", "band", "token", "n_toks", "r")
        .localCheckpoint(true)
      pr.count(); pr
    }
    val cap = spark.sessionState.conf.numShufflePartitions
    val p = math.max(1L, math.min(cap.toLong, nDocs / 1000 + 1)).toInt
    val alpha = ceil(
      lit(minJaccard / (1 + minJaccard)) * (col("n_a") + col("n_b")) - lit(1e-9))
    val cand = time("s3_candidate_join_dedup") {
      val a = prefix.select(col("doc_id").as("doc_a"), col("lang"),
        col("band"), col("token"), col("n_toks").as("n_a"), col("r").as("r_a"))
      val b = prefix
        .filter(col("r") <= col("n_toks") -
          ceil(lit(2 * minJaccard / (1 + minJaccard)) * col("n_toks") - lit(1e-9)) + 1)
        .select(col("doc_id").as("doc_b"), col("lang"),
          col("band").as("b_band"), col("token"), col("n_toks").as("n_b"),
          col("r").as("r_b"))
        .withColumn("band",
          explode(array(col("b_band") - 1, col("b_band"), col("b_band") + 1)))
        .drop("b_band")
      // the operator's corpus-gated SHUFFLE_HASH dial (shared shjGate —
      // same threshold and env override as both candidate joins)
      val bSide = if (Similarity.shjGate(Some(nDocs))) b.hint("SHUFFLE_HASH") else b
      val c = a.repartition(p, col("lang"), col("band"), col("token"))
        .join(bSide, Seq("lang", "band", "token"))
        .filter(col("n_b") < col("n_a") ||
          (col("n_b") === col("n_a") && col("doc_b") < col("doc_a")))
        .filter(col("n_b") >= lit(minJaccard) * col("n_a") - lit(1e-9))
        .filter(lit(1) + least(col("n_a") - col("r_a"), col("n_b") - col("r_b")) >= alpha)
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
        .localCheckpoint(true)
      c.count(); c
    }
    time("s4_verify_arrays") {
      import org.apache.spark.sql.GraftColumnBridge.{column, expression}
      val jac = column(graft.expressions.JaccardSortedLongs(
        expression(col("hs_a")), expression(col("hs_b"))))
      val baseArr = base.select(col("doc_id"), col("hs"))
        .repartition(p, col("doc_id"))
      cand
        .repartition(p, col("doc_b"))
        .join(baseArr.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
        .repartition(p, col("doc_a"))
        .join(baseArr.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
        .withColumn("jaccard", jac)
        .filter(col("jaccard") >= minJaccard)
        .count()
    }
  }
}
