package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash fingerprints — SURVEY.md §2.10 (near-dup family).
  *
  * 64-bit SimHash: each token votes ±1 per bit position of its hash; the
  * fingerprint sets bit j when the vote sum is positive.
  */
object SimHash {

  /** 64-bit SimHash (bigint) of a token array column — native codegen
    * expression (one hash per token; see graft.expressions.SimHash64). */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.expressions.SimHash64(expression(tokens)))
  }

  /** HOF formulation of [[simhash64]] — bit-identical values, kept as the
    * differential-test reference. 64 separate `aggregate` calls, each
    * re-hashing every token: 64x the work of the native expression. */
  def simhash64Hof(tokens: Column): Column = {
    val bitCols: Seq[Column] = (0 until 64).map { j =>
      val vote = aggregate(
        tokens,
        lit(0L),
        (acc, t) =>
          acc + when(shiftright(xxhash64(t), j) % 2 =!= 0, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}
