package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash aggregator — SURVEY.md §2.4/§7.4 (the one custom UDAF the
  * engine genuinely needs beyond built-ins).
  *
  * Folds token hashes into a k-component MinHash signature ACROSS ROWS of a
  * group — the grouped counterpart of MinHash.signature (which is per-row).
  * Use case: a multi-row entity (a document split into chunks, a user's
  * event history) gets one signature without first collect_list-ing its
  * tokens into one giant array.
  *
  * The buffer is a fixed k-length array of mins — constant size per group,
  * merge is element-wise min — so partial aggregation is map-side and the
  * shuffle carries k longs per group regardless of group cardinality.
  */
class MinHashAggregator(k: Int, portable: Boolean = false)
    extends Aggregator[Seq[String], Array[Long], Seq[Long]] {

  /** Default: same per-(token, seed) hash family as MinHash.signature
    * (xxhash64 of the token with the seed hashed alongside) so grouped and
    * per-row signatures are comparable. Portable: the md5-derived affine
    * family (Portable.h48Jvm), reproducible by the DuckDB oracle. */
  private def hash(token: String, seed: Int): Long =
    if (portable)
      (Portable.a(seed) * (Portable.h48Jvm(token) % Portable.P) +
        Portable.b(seed)) % Portable.P
    else {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(token),
        org.apache.spark.sql.types.StringType, 42L)
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        seed, org.apache.spark.sql.types.IntegerType, h)
    }

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], tokens: Seq[String]): Array[Long] = {
    var j = 0
    while (j < k) {
      var m = buf(j)
      tokens.foreach { t =>
        val h = hash(t, j)
        if (h < m) m = h
      }
      buf(j) = m
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { a(j) = math.min(a(j), b(j)); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAggregator {
  /** Column form, registered over a token-array column via udaf(). */
  def column(k: Int, portable: Boolean = false)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new MinHashAggregator(k, portable),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]())
}
