package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact token-set Jaccard similarity of two array<string> columns as a
  * native expression — value-identical to the built-in formulation
  * `size(array_intersect(array_distinct(a), array_distinct(b))) /
  *  size(array_union(a, b))` (including NaN for two empty sets), but one
  * hash-set pass per pair instead of three interpreted set operations.
  * This sits on the near-dup hot path: candidate volume after blocking is
  * ~corpus x bucket-size pairs, each paying this expression.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimilarity.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaccardSimilarity.compute($a, $b);")
}

object JaccardSimilarity {

  /** |distinct(a) ∩ distinct(b)| / |distinct(a) ∪ distinct(b)| with double
    * division semantics (0/0 = NaN, matching the built-in spelling).
    * A null element is one distinct value, exactly as array_distinct /
    * array_intersect / array_union treat it — relevant for the SQL-exposed
    * graft_jaccard, which accepts arbitrary arrays. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String](math.max(8, a.numElements() * 2))
    var nullA = false
    var i = 0
    val nA = a.numElements()
    while (i < nA) {
      if (a.isNullAt(i)) nullA = true else setA.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[UTF8String](math.max(8, b.numElements() * 2))
    var nullB = false
    var inter = 0
    var j = 0
    val nB = b.numElements()
    while (j < nB) {
      if (b.isNullAt(j)) nullB = true
      else {
        val t = b.getUTF8String(j)
        if (seenB.add(t) && setA.contains(t)) inter += 1
      }
      j += 1
    }
    if (nullA && nullB) inter += 1
    val sizeA = setA.size + (if (nullA) 1 else 0)
    val sizeB = seenB.size + (if (nullB) 1 else 0)
    val union = sizeA + sizeB - inter
    inter.toDouble / union.toDouble
  }
}
