package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Argmin child id of a vector within one routing node's child-rep bundle
  * — the per-depth descent step of Similarity.semanticDedupScaled's
  * radix-rank routing tree.
  *
  * `left` is the row vector (`array<double>`); `right` is the routed
  * node's bundle, `array<struct<c_id: bigint, centroid: array<double>>>`
  * (<= fanout structs), which arrives PER ROW from the bundle join rather
  * than as a plan constant — that is the point: unlike [[NearestCells]],
  * whose centroid table rides on the driver and so must stay
  * caller-bounded, the bundle tables here are distributed state, so the
  * total fine-centroid count can grow with the corpus while the driver
  * holds only the root's <= fanout reps.
  *
  * Distance and tie-break are bit-identical to [[NearestCells.nearest]]
  * (same subtract/square/accumulate loop over squared L2, then
  * (dist asc, id asc)) so routing a row through a bundle that happens to
  * contain ALL fines reproduces the flat argmin exactly — the property the
  * SimilaritySpec differential relies on.
  */
case class NearestInBundle(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_in_bundle"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(v: Any, bundle: Any): Any =
    NearestInBundle.nearest(
      v.asInstanceOf[ArrayData], bundle.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b) =>
      s"${ev.value} = graft.expressions.NearestInBundle.nearest($v, $b);")
}

object NearestInBundle {
  /** Shared by interpreted eval and codegen. O(m·dim) per row for a bundle
    * of m fines; throws on an empty bundle (bundles are built by a groupBy
    * over the fine table, so every joined bundle has >= 1 member — an empty
    * one means the caller's join is broken and silence would mis-assign). */
  def nearest(v: ArrayData, fines: ArrayData): Long = {
    val m = fines.numElements()
    if (m == 0) throw new IllegalStateException("empty fine-cell bundle")
    var bestDist = 0.0
    var bestId = 0L
    var found = false
    var j = 0
    while (j < m) {
      val f = fines.getStruct(j, 2)
      val id = f.getLong(0)
      val cent = f.getArray(1)
      val n = math.min(v.numElements(), cent.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = v.getDouble(i) - cent.getDouble(i)
        s += d * d
        i += 1
      }
      if (!found || s < bestDist || (s == bestDist && id < bestId)) {
        found = true; bestDist = s; bestId = id
      }
      j += 1
    }
    bestId
  }
}
