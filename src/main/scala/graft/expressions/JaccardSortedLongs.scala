package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Jaccard similarity of two SORTED, DISTINCT, null-free array<long>
  * columns: |a ∩ b| / |a ∪ b| by a single primitive merge pass — no hash
  * sets, no string hashing/equality. NaN for two empty arrays (0/0),
  * matching [[JaccardSimilarity]].
  *
  * This is the token-HASH fast path of the near-dup verify stage
  * (Similarity.jaccardNearDupPairs): tokens are xxhash64-mapped once per
  * document, deduplicated and sorted, so the quadratic-ish candidate
  * stage shuffles 8-byte longs instead of strings and verifies each pair
  * by merge-intersection. Value-identical to string-set Jaccard unless
  * two DISTINCT tokens of the same pair collide in 64 bits (~n²/2⁶⁵ per
  * pair ≈ 7e-17 at 50 tokens — the library's accepted cross-engine risk
  * class, cf. the band-boundary note in SimilarityQueries).
  *
  * PRECONDITION (library-internal, not enforced): both arrays ascending,
  * duplicate-free, null-free — exactly what
  * `sort_array(array_distinct(transform(toks, xxhash64)))` produces.
  */
case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_hashed"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSortedLongs.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaccardSortedLongs.compute($a, $b);")
}

object JaccardSortedLongs {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val nA = a.numElements()
    val nB = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nA && j < nB) {
      val la = a.getLong(i)
      val lb = b.getLong(j)
      if (la == lb) { inter += 1; i += 1; j += 1 }
      else if (la < lb) i += 1
      else j += 1
    }
    inter.toDouble / (nA + nB - inter).toDouble
  }
}
