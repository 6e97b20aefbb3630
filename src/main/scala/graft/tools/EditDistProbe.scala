package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.operators.StringJoin
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shuffle-volume probe for the PassJoin candidate stream at a vocabulary
  * size the parquet fixtures cannot reach: ScaleUp replicates part ROWS
  * with key offsets but never grows the distinct p_name vocabulary, and
  * editDistancePairs is vocabulary-first by design — so q_dedup_editdist's
  * candidate volume is scale-invariant on the fixtures (ShuffleProbe at
  * 100x: 1.9k shuffle records, everything broadcast). This probe builds an
  * N-string synthetic vocabulary (deterministic: xxhash64-mixed chars over
  * a 6-letter alphabet, lengths 8-23 — dense enough for real near-pairs)
  * and reports wall + shuffle records/bytes + the result count/hash, so an
  * old-vs-new A/B of the operator's shuffle shape is one run per build.
  *
  * `alpha`/`minLen`/`lenSpread` shape the vocabulary's collision regime:
  * a small alphabet with short strings (6/8/16) makes segment buckets
  * collide massively — the adversarial stress for the candidate join —
  * while a larger alphabet with longer strings (16/32/32) matches the
  * operator's real contract (part names, URLs, titles), where segments
  * are near-unique and the candidate stream tracks true near-dup volume.
  *
  * Usage: runMain graft.tools.EditDistProbe [n] [maxDist] [reps] [alpha] [minLen] [lenSpread]
  */
object EditDistProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val d = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val alpha = args.drop(3).headOption.map(_.toInt).getOrElse(6)
    val minLen = args.drop(4).headOption.map(_.toInt).getOrElse(8)
    val lenSpread = args.drop(5).headOption.map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "128"))
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

    // deterministic vocab: length minLen + hash%lenSpread, each char from
    // the alpha-letter alphabet by a per-(id, pos) hash — true near-pairs
    // exist via the length tail and rare per-char agreements but stay
    // sparse (the operator's design load)
    val letters = ('a' to 'z').take(alpha).mkString(",")
    val vocab = spark.range(n).select(
      concat_ws("",
        (0 until (minLen + lenSpread)).map(i =>
          when(lit(i) < lit(minLen) + pmod(xxhash64(col("id")), lit(lenSpread)),
            element_at(
              split(lit(letters), ","),
              (pmod(xxhash64(col("id"), lit(i)), lit(alpha)) + 1).cast("int")))
            .otherwise(lit(""))): _*).as("s"))
      .localCheckpoint(true)
    println(s"[editdist-probe] vocab=$n distinct=${vocab.distinct().count()} " +
      s"maxDist=$d alpha=$alpha len=[$minLen,${minLen + lenSpread})")

    (1 to reps).foreach { r =>
      writeBytes.set(0); writeRecords.set(0)
      val t0 = System.nanoTime()
      val out = StringJoin.editDistancePairs(vocab, "s", d)
        .agg(count(lit(1)),
          sum(xxhash64(col("left"), col("right"), col("dist"))
            .cast("decimal(38,0)")))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      println(f"[editdist-probe] rep$r: pairs=${out.getLong(0)} wall=$sec%.2f s " +
        s"shuffleWriteMB=${writeBytes.get / 1024 / 1024} " +
        s"shuffleWriteRecords=${writeRecords.get} hash=${out.getDecimal(1)}")
    }
    spark.stop()
  }
}
