package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed UDAF — the bounded-memory
  * "what are the frequent items" primitive a corpus pipeline needs at
  * 100 TB (vocabulary heads, hot domains, dominant languages) WITHOUT a
  * full per-item shuffle: the buffer is at most k counters regardless of
  * item cardinality, partial aggregation is map-side, and the shuffle
  * carries k (item, count) entries per group.
  *
  * Guarantee (classic MG bound): for every item, the sketched count is in
  * [true - n/(k+1), true] where n is the stream length — so any item with
  * true frequency above n/(k+1) is GUARANTEED present in the summary.
  * Merging two summaries sums counters, then applies one more MG
  * decrement (subtract the (k+1)-largest counter and drop non-positive)
  * to restore the size bound; the combined error stays additive
  * (Agarwal et al., "Mergeable Summaries", PODS'12).
  */
class HeavyHittersAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] = {
    if (item == null) buf
    else buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None =>
        // decrement-all step: every counter pays 1; zeros drop out.
        // The incoming item is NOT inserted (its 1 is consumed too).
        buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (i, c)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything; at most k
      // counters can exceed it, so the result respects the size bound
      val kth = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (i, c) => if (c > kth) Some(i -> (c - kth)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {
  /** Column form over a string item column. */
  def column(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new HeavyHittersAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
}
