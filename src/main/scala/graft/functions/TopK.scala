package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-buffer grouped top-k as a typed UDAF — the scale-correct
  * alternative to window-function top-k for HIGH-CARDINALITY groups.
  *
  * The window formulation (`row_number().over(partitionBy(g).orderBy(n))`)
  * shuffles EVERY row to its group's partition and sorts there; this
  * aggregator keeps a k-entry buffer per group with map-side partial
  * aggregation, so the shuffle carries k entries per group regardless of
  * group size. Ordering is total — (value desc, key asc) — so the result
  * is deterministic and matches the window formulation exactly (the
  * query reuses the window version's oracle).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def top(xs: Seq[(String, Long)]): Seq[(String, Long)] =
    xs.sortBy { case (key, n) => (-n, key) }.take(k)

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(buf: Seq[(String, Long)], item: (String, Long)): Seq[(String, Long)] = {
    // `top` always returns a sorted buffer, so a full buffer can reject an
    // item that doesn't beat the current minimum without re-sorting — the
    // common case once a partition has seen k rows.
    if (buf.size == k) {
      val (tailKey, tailN) = buf.last
      if (item._2 < tailN || (item._2 == tailN && item._1 >= tailKey)) buf
      else top(buf :+ item)
    } else top(buf :+ item)
  }

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    top(a ++ b)

  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object TopK {
  /** Column form over (key: string, value: long) column pairs — the tuple
    * input encoder flattens to two call parameters. */
  def column(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(String, Long)]())
}
