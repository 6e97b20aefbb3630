package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The `nProbe` nearest IVF cells of a vector, as `array<bigint>` of cell
  * ids ordered by (squared L2 distance asc, cell id asc) — the argmin /
  * probe-list primitive of Similarity.ivfTopK.
  *
  * The centroid table rides INSIDE the expression as plan constants
  * (bounded C×dim driver state, the category MLlib KMeans also collects),
  * which turns both IVF stages into NARROW MAPS: the crossJoin+window
  * formulation this replaces shuffled corpus×C rows through a per-row
  * window just to take an argmin — C× the corpus through an exchange at
  * 100 TB — and the HOF (`transform`+`aggregate`) formulation runs on the
  * interpreted lambda path (measured ~1.5x whole-query slowdown at sf0.1).
  * Here both eval paths call one tight JVM helper; squared distance skips
  * the sqrt (ordering-equivalent, matching the oracle's `l2Sq` spelling).
  */
case class NearestCells(
    child: Expression,
    centroids: Array[Array[Double]],
    cellIds: Array[Long],
    nProbe: Int)
    extends UnaryExpression {

  require(centroids.length == cellIds.length && centroids.nonEmpty)
  require(nProbe >= 1 && nProbe <= centroids.length)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override protected def nullSafeEval(v: Any): Any =
    NearestCells.nearest(v.asInstanceOf[ArrayData], centroids, cellIds, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val ids = ctx.addReferenceObj("cellIds", cellIds, "long[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = graft.expressions.NearestCells.nearest(
      |  $v, $cents, $ids, $nProbe);
     """.stripMargin)
  }
}

object NearestCells {
  /** Shared by interpreted eval and codegen: squared-L2 to every centroid,
    * then partial selection of the nProbe smallest with (dist, id)
    * lexicographic tie-break. O(C·(dim + nProbe)) per row, zero allocation
    * beyond the result. */
  def nearest(
      v: ArrayData,
      centroids: Array[Array[Double]],
      cellIds: Array[Long],
      nProbe: Int): ArrayData = {
    val c = centroids.length
    val dists = new Array[Double](c)
    var j = 0
    while (j < c) {
      val cent = centroids(j)
      val n = math.min(v.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = v.getDouble(i) - cent(i)
        s += d * d
        i += 1
      }
      dists(j) = s
      j += 1
    }
    val taken = new Array[Boolean](c)
    val out = new Array[Long](nProbe)
    var r = 0
    while (r < nProbe) {
      var best = -1
      var k = 0
      while (k < c) {
        if (!taken(k) && (best < 0 ||
            dists(k) < dists(best) ||
            (dists(k) == dists(best) && cellIds(k) < cellIds(best)))) best = k
        k += 1
      }
      taken(best) = true
      out(r) = cellIds(best)
      r += 1
    }
    new GenericArrayData(out)
  }
}
