package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** k-component MinHash signature of an array<string> as a native expression.
  *
  * Same hash family as the built-in formulation
  * `array_min(transform(shingles, t -> xxhash64(t, j)))` — XxHash64 folds
  * left over (string, j) from seed 42 — so values are bit-identical to
  * graft.functions.MinHash.signature. The win is the computation shape: ONE
  * string hash per shingle reused across all k components (the HOF path
  * re-hashes the string k times), in a JIT-compiled loop instead of the
  * interpreted higher-order evaluator.
  *
  * Codegen emits a single call to [[MinHashSignature.compute]] so the
  * whole-stage span stays intact while the loop runs as plain JVM code.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.MinHashSignature.compute($a, $k);")
}

object MinHashSignature {
  /** Seed-42 left fold over (string, componentIndex), matching xxhash64.
    * Empty input yields Long.MaxValue components (the fold identity) —
    * the HOF formulation yields NULL components there (array_min of an
    * empty array); callers filter empty shingle sets before signing
    * either way (Similarity.minhashCandidatePairs does). */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val h1 = XxHash64Function.hash(s, StringType, 42L)
      var j = 0
      while (j < k) {
        val h = XxHash64Function.hash(j, IntegerType, h1)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
