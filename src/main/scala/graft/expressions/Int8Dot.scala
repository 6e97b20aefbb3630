package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot product of two `array<byte>` int8 code columns as a native
  * Catalyst expression — the hot loop of the quantized pre-score gate
  * (Similarity.nnDescentRound prescoreFactor / quantRerankTopK's coarse
  * scan). Same rationale as [[CosineSimilarity]]: the HOF formulation
  * (aggregate over zip_with with per-element casts) materializes an
  * intermediate array per ROW on the interpreted path — measured 4-6x
  * end-to-end regression when it replaced the codegen cosine on the 100x
  * nndescent candidate exchange. This expression generates one fused
  * accumulation loop in whole-stage codegen.
  *
  * Semantics: sum over min(len) of a[i]*b[i] in left-to-right order,
  * every product exact in Long (|code| <= 127, so dim * 127^2 is far
  * inside Long — and inside double's 2^53 integer range, which keeps the
  * DuckDB oracle's list_sum arithmetic bit-identical).
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int8_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
}
