package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketches — the percentile twin of the HLL day-sketch
  * rollup (`q_agg_wau_sketch`).
  *
  * Reuses Spark's own Greenwald–Khanna summary
  * (`org.apache.spark.sql.catalyst.util.QuantileSummaries`, the engine
  * behind `percentile_approx`) rather than reimplementing a sketch: it is
  * mergeable by construction (that is how Spark combines map-side
  * partials), carries an explicit rank-error guarantee (ε of the summary;
  * a query at rank p returns a value whose true rank is within ε·n), and
  * is a pure JVM object we can serialize into a compact, stable byte
  * layout for a stored day-sketch table.
  *
  * The 100 TB property this family demonstrates: raw events are touched
  * ONCE (per-day sketches with map-side partial merge — the shuffle
  * carries one ~O(1/ε)-sized summary per day, not the data); any window
  * is then recombined from the metadata-sized day-sketch table, so a
  * 7-day / 30-day / arbitrary re-window never rescans the facts.
  */
object QuantileSketch {

  /** Default rank error — ~200 sampled tuples per compressed summary. */
  val DefaultError = 0.01

  /** Compact stable byte layout: relativeError, compressThreshold, count,
    * n, then (value, g, delta) per sampled tuple. Hand-rolled instead of
    * JVM serialization so the stored day-sketch table is readable by any
    * future version of this code (and is ~20x smaller). */
  def serialize(qs: QuantileSummaries): Array[Byte] = {
    val c = qs.compress()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeDouble(c.relativeError)
    out.writeInt(c.compressThreshold)
    out.writeLong(c.count)
    out.writeInt(c.sampled.length)
    c.sampled.foreach { s =>
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val err = in.readDouble()
    val thr = in.readInt()
    val count = in.readLong()
    val n = in.readInt()
    val sampled = Array.fill(n)(
      new QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong()))
    new QuantileSummaries(thr, err, sampled, count, true)
  }
}

/** Per-group quantile sketch builder: double values in, serialized
  * compressed summary out. The buffer is the live summary (bounded at
  * ~1/ε tuples after compression), so partial aggregation is map-side and
  * the shuffle carries one summary per group regardless of group size. */
class QuantileSketchAgg(relativeError: Double = QuantileSketch.DefaultError)
    extends Aggregator[Double, QuantileSummaries, Array[Byte]] {

  override def zero: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)

  override def reduce(buf: QuantileSummaries, v: Double): QuantileSummaries =
    buf.insert(v)

  override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())

  override def finish(buf: QuantileSummaries): Array[Byte] =
    QuantileSketch.serialize(buf)

  override def bufferEncoder: Encoder[QuantileSummaries] =
    Encoders.javaSerialization[QuantileSummaries]

  override def outputEncoder: Encoder[Array[Byte]] =
    ExpressionEncoder[Array[Byte]]()
}

/** Sketch UNION + query: merges stored serialized summaries (one per
  * group member, e.g. 7 day-sketches per window) and reads the requested
  * percentiles from the merged summary. */
class QuantileMergeAgg(percentiles: Seq[Double])
    extends Aggregator[Array[Byte], QuantileSummaries, Seq[Double]] {
  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 1))

  override def zero: QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, QuantileSketch.DefaultError)

  override def reduce(buf: QuantileSummaries, bytes: Array[Byte]): QuantileSummaries =
    buf.compress().merge(QuantileSketch.deserialize(bytes))

  override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())

  override def finish(buf: QuantileSummaries): Seq[Double] = {
    val c = buf.compress()
    percentiles.map(p => c.query(p).getOrElse(Double.NaN))
  }

  override def bufferEncoder: Encoder[QuantileSummaries] =
    Encoders.javaSerialization[QuantileSummaries]

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object QuantileSketchAgg {
  def column(relativeError: Double = QuantileSketch.DefaultError)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new QuantileSketchAgg(relativeError), ExpressionEncoder[Double]())
}

object QuantileMergeAgg {
  def column(percentiles: Seq[Double])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new QuantileMergeAgg(percentiles), ExpressionEncoder[Array[Byte]]())
}
