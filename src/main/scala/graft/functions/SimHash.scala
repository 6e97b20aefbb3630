package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash fingerprints — SURVEY.md §2.10 (near-dup family).
  *
  * 64-bit SimHash: each token votes ±1 per bit position of its hash; the
  * fingerprint sets bit j when the vote sum is positive. The 64 bit
  * positions are unrolled statically (j is a plan-time constant), so the
  * whole fingerprint is one codegen'd expression tree of built-ins.
  */
object SimHash {

  /** 64-bit SimHash (bigint) of a token array column. */
  def simhash64(tokens: Column): Column = {
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
