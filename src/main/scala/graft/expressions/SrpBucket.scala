package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** nBits-bit signed-random-projection bucket id of an `array<double>`
  * vector — the corpus-scan hot loop of every SRP-LSH operator
  * (Similarity.srpBucket feeds knnGraph / lshBucketJoin / bucketTable /
  * the embedding ingest sink). The previous formulation evaluated nBits
  * separate `aggregate(zip_with(vec, plane))` trees per row — nBits
  * interpreted HOF passes each allocating an intermediate array (the
  * same pathology [[CosineSimilarity]] and [[Int8Dot]] replaced). Here
  * the hyperplane signs ride as one plan constant (bounded nBits×dim
  * driver state) and both eval paths run a single fused loop.
  *
  * FP semantics are bit-identical to the HOF form: per bit j the dot is
  * a left fold over ascending i (exactly `aggregate`'s order), the sign
  * test is `dot > 0`, and the bucket is the OR of `1L << j` — so every
  * portable-bucket oracle replays unchanged.
  */
case class SrpBucket(child: Expression, signs: Array[Array[Double]])
    extends UnaryExpression {

  require(signs.nonEmpty && signs.length <= 63)

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_bucket"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(v: Any): Any =
    SrpBucket.bucket(v.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("signs", signs, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.SrpBucket.bucket($v, $s);")
  }
}

object SrpBucket {
  /** Shared by interpreted eval and codegen: one pass per hyperplane,
    * zero allocation. O(nBits·dim) per row. */
  def bucket(v: ArrayData, signs: Array[Array[Double]]): Long = {
    var b = 0L
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      val n = math.min(v.numElements(), row.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += v.getDouble(i) * row(i)
        i += 1
      }
      if (dot > 0) b |= (1L << j)
      j += 1
    }
    b
  }
}
