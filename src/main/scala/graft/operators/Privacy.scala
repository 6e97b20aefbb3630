package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators.
  *
  * Complements the PII scrubbing surface (`q_text_pii`): PII redaction
  * removes direct identifiers; k-anonymity bounds re-identification through
  * *quasi-identifier combinations* — a released row must be indistinguishable
  * from at least k-1 others on its QI columns (Sweeney, IJUFKS 2002).
  */
object Privacy {

  /** k-anonymity by suppression: every row whose quasi-identifier group has
    * fewer than `k` members gets its QI columns replaced with `"*"` (the
    * suppressed rows collapse into one indistinguishable group); rows in
    * groups of size >= k pass through unchanged. Adds `anon_suppressed`.
    *
    * QI columns must be strings (generalization — banding, truncation — is
    * the caller's projection; this operator enforces the group-size floor).
    *
    * Scale shape: one `count over (partition by QI)` window — a single
    * hash-shuffle on the QI columns, no driver state, no second pass. The
    * window carries only the grouped count, so partition memory is the QI
    * group's rows (bounded further by AQE skew splitting at cluster scale).
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(qiCols.map(col): _*)
    val sized = df.withColumn("__gsize", count(lit(1)).over(w))
    val suppressed = col("__gsize") < k
    // Lazy localCheckpoint: the star-floor gate below reads this frame
    // TWICE (the scalar count and the release itself) — without the
    // checkpoint both branches would re-run the source scan and the QI
    // window shuffle.
    val starred = qiCols.foldLeft(sized) { (acc, c) =>
        acc.withColumn(c, when(suppressed, lit("*")).otherwise(col(c)))
      }
      .withColumn("anon_suppressed", suppressed)
      .drop("__gsize")
      .localCheckpoint(false)
    // The '*' bucket is itself a QI group: if FEWER than k rows were
    // suppressed in total, releasing them would violate the k floor the
    // operator promises (they are already maximally generalized, so the
    // only sound move is to drop them). The gate is a broadcast scalar —
    // one tiny aggregate over the checkpointed frame, no extra wide
    // shuffle and no second source pass.
    val nSup = starred.filter(col("anon_suppressed"))
      .agg(count(lit(1)).as("__nsup"))
    starred.crossJoin(broadcast(nSup))
      .filter(!col("anon_suppressed") || col("__nsup") >= k)
      .drop("__nsup")
  }
}
