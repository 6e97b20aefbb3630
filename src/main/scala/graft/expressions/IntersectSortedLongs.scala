package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Intersection SIZE of two SORTED, DISTINCT, null-free array<long>
  * columns by a single primitive merge pass — the counting sibling of
  * [[JaccardSortedLongs]] (same merge, returns |a ∩ b| instead of the
  * Jaccard ratio). 0 for empty inputs.
  *
  * Used by the asymmetric-containment verify stage
  * (Similarity.containmentNearDupPairs): containment |A ∩ B| / |A| needs
  * the raw overlap count, not a symmetric ratio — reconstructing the
  * count from a Jaccard double would round-trip through floating point,
  * so the count is computed directly. Same 64-bit collision risk class
  * as [[JaccardSortedLongs]] (~n²/2⁶⁵ per pair).
  *
  * PRECONDITION (library-internal, not enforced): both arrays ascending,
  * duplicate-free, null-free — exactly what
  * `sort_array(array_distinct(transform(toks, xxhash64)))` produces.
  */
case class IntersectSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_hashed"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectSortedLongs.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.IntersectSortedLongs.compute($a, $b);")
}

object IntersectSortedLongs {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val nA = a.numElements()
    val nB = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < nA && j < nB) {
      val la = a.getLong(i)
      val lb = b.getLong(j)
      if (la == lb) { inter += 1; i += 1; j += 1 }
      else if (la < lb) i += 1
      else j += 1
    }
    inter
  }
}
