package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.Similarity
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the containment `minDocTokens` index prefix (r11 commit
  * 0b37f79): the registered q_dedup_containment runs m = 1 (prefix off), so
  * the losslessness proof had no scale evidence. This probe runs the SAME
  * operator at m = 1 and m = floor, interleaved A/B in one JVM window, on a
  * corpus that satisfies the floor BY CONSTRUCTION (docs below it are
  * filtered out before either variant sees them — the caller contract the
  * prefix is priced for), and reports:
  *
  *   - recall identity: output row count and an order-insensitive content
  *     hash must be EQUAL (the m > 1 == m = 1 theorem, executed at scale);
  *   - the index-side candidate reduction the prefix buys: total shuffle
  *     write records/bytes per variant (ShuffleProbe-style stage listener);
  *   - wall per variant (min across interleaved reps).
  *
  * Usage: runMain graft.tools.ContainmentProbe <sfDir> [floor] [reps]
  * Floor default 12: the synthetic docs carry ~28 distinct word-3-gram
  * shingles, so 12 keeps most of the corpus while giving the prefix a
  * g = ceil(0.8*12) = 10 bite (9 index rows dropped per doc).
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val floor = args.drop(1).headOption.map(_.toLong).getOrElse(12L)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    val writeBytes = new AtomicLong(0)
    val writeRecords = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          writeRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })

    // floor-respecting corpus: distinct-shingle count >= floor, the exact
    // quantity the operator's n_toks measures (distinct non-null hashes)
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        T.ngrams(T.tokens(col("text")), 3).as("toks"))
      .filter(size(array_distinct(filter(col("toks"), _.isNotNull))) >= floor)
      .localCheckpoint(true)
    val nDocs = corpus.count()
    // blocks alive before any variant runs (the corpus checkpoint) must
    // survive the per-run cleanup or later reps read a dead block
    val keepRdds = spark.sparkContext.getPersistentRDDs.keySet
    val nAll = Tables.rowCount(spark, sfDir, "documents")
    println(s"[containment-probe] sfDir=$sfDir floor=$floor corpus=$nDocs/$nAll docs")

    def run(m: Long): (Long, java.math.BigDecimal, Double, Long, Long) = {
      writeBytes.set(0); writeRecords.set(0)
      val t0 = System.nanoTime()
      val out = Similarity.containmentNearDupPairs(
          corpus, minContainment = 0.8, corpusRows = Some(nDocs),
          minDocTokens = m)
        .agg(count(lit(1)),
          // order-insensitive content hash over (a, b, containment rounded
          // to the oracle's 2dp — bit-identical across plan shapes)
          sum(xxhash64(col("doc_a"), col("doc_b"),
            round(col("containment"), 2)).cast("decimal(38,0)")))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!keepRdds.contains(id)) rdd.unpersist(true) }
      (out.getLong(0), out.getDecimal(1), sec, writeRecords.get, writeBytes.get)
    }

    val results = (1 to reps).flatMap { r =>
      // alternate the variant order per rep: the first run of a pass pays
      // JIT/page-cache warmup, so a fixed order would bias the walls
      // toward whichever variant runs second
      (if (r % 2 == 1) Seq(1L, floor) else Seq(floor, 1L)).map { m =>
        val (n, h, sec, recs, bytes) = run(m)
        println(f"[containment-probe] rep$r m=$m: rows=$n wall=$sec%.2f s " +
          s"shuffleRecords=$recs shuffleMB=${bytes / 1024 / 1024} hash=$h")
        (m, n, h, sec, recs, bytes)
      }
    }
    val (base, pref) = (results.filter(_._1 == 1L), results.filter(_._1 == floor))
    require(base.map(r => (r._2, r._3)).distinct.size == 1 &&
      pref.map(r => (r._2, r._3)).distinct.size == 1 &&
      base.head._2 == pref.head._2 && base.head._3.compareTo(pref.head._3) == 0,
      s"RECALL MISMATCH: m=1 ${base.map(r => (r._2, r._3))} vs m=$floor ${pref.map(r => (r._2, r._3))}")
    def mins(rs: Seq[(Long, Long, java.math.BigDecimal, Double, Long, Long)]) =
      (rs.map(_._4).min, rs.map(_._5).min, rs.map(_._6).min)
    val (bw, brec, bbytes) = mins(base)
    val (pw, prec, pbytes) = mins(pref)
    println(f"""{"metric":"containment_mindoctokens_ab","sf":"$sfDir","floor":$floor,""" +
      f""""docs":$nDocs,"rows":${base.head._2},"recall_identical":true,""" +
      f""""m1":{"wall_s":$bw%.2f,"shuffle_records":$brec,"shuffle_mb":${bbytes / 1024 / 1024}},""" +
      f""""m$floor":{"wall_s":$pw%.2f,"shuffle_records":$prec,"shuffle_mb":${pbytes / 1024 / 1024}},""" +
      f""""record_reduction_pct":${100.0 * (brec - prec) / math.max(1L, brec)}%.1f}""")
    spark.stop()
  }
}
