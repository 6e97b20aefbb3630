package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib-deflate compression ratio of a string column: compressed bytes /
  * raw bytes. The Gopher-family repetitiveness signal — highly repetitive
  * documents compress far below ~0.4 while diverse prose sits near 0.6+ —
  * computed per row with no shuffle.
  *
  * Native expression rather than a UDF for the usual reason (stays inside
  * whole-stage codegen), and because the deflate call needs a `finally
  * end()` to release the Deflater's native-memory window — a lambda UDF
  * that leaked it would OOM the executor off-heap long before the JVM GC
  * noticed. Output size for a given input is deterministic for a fixed
  * level (JDK zlib), so results are stable across runs and executors;
  * there is no DuckDB-side deflate, so queries built on this are
  * spec-verified rather than oracle-checked.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.DeflateRatio.compute($s);")
}

object DeflateRatio {

  /** Ratio = deflated size / raw size at level 6 (zlib default), raw
    * (nowrap) stream. Empty input compresses to a 2-byte empty block —
    * define the ratio as 1.0 instead of a division by zero. */
  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end() // releases native window memory NOW, not at GC
  }
}
