package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 64-bit SimHash of an array<string> as a native expression.
  *
  * Same hash family as the built-in formulation (per token
  * `xxhash64(t)` = XxHash64 seed 42; bit j votes +1 when `(h >> j) & 1`
  * is set, else -1; fingerprint bit j set when the vote sum is positive),
  * so values are bit-identical to the HOF version
  * (graft.functions.SimHash.simhash64Hof). The win is the computation
  * shape: the HOF version is 64 separate `aggregate` calls, each
  * re-hashing every token and re-traversing the array — 64x redundant
  * work in the interpreted higher-order evaluator. Here each token is
  * hashed ONCE and its 64 votes unrolled in a JIT-compiled loop.
  *
  * Codegen emits a single call to [[SimHash64.compute]] so the
  * whole-stage span stays intact while the loop runs as plain JVM code.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SimHash64.compute($a);")
}

object SimHash64 {
  /** One xxhash64 per token; 64 vote counters; bit j of the result set
    * when counter j ends positive. Empty input yields 0L (all votes 0,
    * none positive) — same as the HOF fold over an empty array. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // a null element votes with the unchanged seed, bit-identical to the
      // HOF formulation where xxhash64(null) folds the accumulator through
      // untouched (graft_simhash is SQL-exposed, so nulls can reach here)
      val h =
        if (tokens.isNullAt(i)) 42L
        else XxHash64Function.hash(tokens.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}
