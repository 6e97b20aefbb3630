package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-stratum statistics for corpus quality gating: exact median
  * and MAD (median absolute deviation) in pure integer arithmetic, and the
  * classic |x − med| > k·MAD outlier flag built from them.
  *
  * Why not `percentile`/`approx_percentile`: their interpolation and sketch
  * semantics differ across engines, so a DuckDB oracle could never replay
  * them bit-for-bit. Instead both median layers use the DOUBLED order
  * statistic med2 = x₍⌈n/2⌉₎ + x₍⌈(n+1)/2⌉₎ (the two middle values; twice
  * the middle value when n is odd) — an integer every engine computes
  * identically — and the outlier test |x − med| > k·MAD is evaluated in the
  * equivalent scaled form 2·|2x − med2| > k·mad4 where mad4 = med2 of the
  * per-row |2x − med2| (i.e. 4·MAD). No floats anywhere.
  *
  * Scale posture: two rank windows PARTITIONED by the stratum (never
  * global) and two stratum-sized aggregate tables joined back broadcast;
  * everything else is a narrow map. Linear in rows at any corpus size.
  */
object Robust {

  /** Per-stratum doubled median of `valueCol`: one row per stratum with
    * `med2` = the sum of the two middle order statistics (ties broken by
    * `idCol` for a total, engine-portable order). */
  def median2(df: DataFrame, stratumCol: String, valueCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(stratumCol)
    val rn = row_number().over(w.orderBy(col(valueCol), col(idCol)))
    val n = count(lit(1)).over(w)
    // middle positions (n+1) div 2 and (n+2) div 2 coincide for odd n:
    // weight the row by how many of the two positions it occupies.
    df.select(col(stratumCol), col(idCol), col(valueCol))
      .withColumn("__v", col(valueCol).cast("long"))
      .withColumn("__rn", rn).withColumn("__n", n)
      .withColumn("__w",
        (col("__rn") === expr("(__n + 1) div 2")).cast("long") +
          (col("__rn") === expr("(__n + 2) div 2")).cast("long"))
      .filter(col("__w") > 0)
      .groupBy(stratumCol)
      .agg(sum(col("__v") * col("__w")).as("med2"))
  }

  /** Rows whose value deviates from its stratum median by more than
    * `k`·MAD — exact, engine-portable. Returns the input rows (original
    * columns) of the outliers, plus the diagnostic `dev2` (= 2·|x−med|)
    * and `mad4` (= 4·MAD) columns the decision was made on. */
  def madOutliers(df: DataFrame, stratumCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    // ONE stratum exchange serves the whole operator (guide §2.4): the
    // input is hash-partitioned by the stratum up front, so the first
    // median's rank window consumes it directly, and — broadcast joins
    // and narrow maps preserving the child partitioning — the second
    // median's window and both median aggs run with NO further shuffle.
    // The repartitioned subtree is canonically identical across the
    // med / dev / output branches, so exchange reuse collapses the
    // operator to one scan + one shuffle (was: 4 scans, 3 shuffles —
    // each median2 re-shuffled an unpartitioned input and the dev frame
    // was planned twice). Stratum-bounded parallelism is inherent to the
    // per-stratum windows either way (class doc).
    val base = df.repartition(col(stratumCol))
    val med = median2(base, stratumCol, valueCol, idCol)
    val withDev = base
      .join(broadcast(med), stratumCol)
      .withColumn("dev2",
        abs(lit(2L) * col(valueCol).cast("long") - col("med2")))
    val mad = median2(withDev, stratumCol, "dev2", idCol)
      .withColumnRenamed("med2", "mad4")
    // |x − med| > k·MAD  ⇔  2·dev2 > k·mad4 (both sides ×4, exact)
    withDev.join(broadcast(mad), stratumCol)
      .filter(lit(2L) * col("dev2") > lit(k.toLong) * col("mad4"))
  }
}
