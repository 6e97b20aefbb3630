package graft.tools

import graft.Tables
import graft.functions.{Portable, VectorFunctions => V}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the fused SrpBucket codegen expression vs the HOF form it
  * replaced in r16 (per-bit `aggregate(zip_with(v, plane))` trees): times
  * the full corpus bucket scan — srpBucket + a count-distinct-free
  * aggregation that forces every bucket to materialize — with both
  * formulations, interleaved A,B,A,B so host drift biases both arms
  * equally. The expression shipped on the CosineSimilarity/Int8Dot
  * precedent but its own win was never measured (r16 verdict #2); this
  * probe closes that.
  *
  * Usage: runMain graft.tools.SrpBucketAB <sfDir> [nBits] [reps] [dim]
  * (dim > 64 extends vectors with the same deterministic mix the
  * q_sim_nndescent_highdim fixture uses — the hyperplane loop is
  * O(nBits*dim) per row, so the high-dim arm shows the asymptote.)
  */
object SrpBucketAB {

  /** The replaced HOF formulation, verbatim (pre-r16 Similarity.srpBucket
    * body): per bit j, when(dot(v, plane_j) > 0, 1<<j).otherwise(0),
    * OR-reduced — nBits interpreted HOF passes per row. */
  private def hofBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val bits: Seq[Column] = (0 until nBits).map { j =>
      val plane = array((0 until dim).map(i => lit(Portable.srpSign(j, i))): _*)
      when(V.dot(vec, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBits = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val dim = args.drop(3).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))
    val emb = (if (dim == 64) base
      else base.select(col("vec_id"), expr(
        s"concat(v, transform(sequence(64, ${dim - 1}), " +
          "xi -> (CAST(((((xi + 1L) * 40503L) % 100003L) * " +
          "((vec_id * 2654435761L) % 100003L + 1L) + xi * 97911L) % 100003L " +
          "AS DOUBLE) / 100003.0) - 0.5))").as("v"))).localCheckpoint(true)
    val n = emb.count()

    val native = graft.operators.Similarity
      .srpBucket(col("v"), dim, nBits, portable = true)
    // parity first: the A/B is meaningless if the arms disagree
    val mismatch = emb
      .select(native.as("a"), hofBucket(col("v"), dim, nBits).as("b"))
      .filter(col("a") =!= col("b")).count()
    require(mismatch == 0, s"arms disagree on $mismatch rows")

    def time(c: Column): Double = {
      val t0 = System.nanoTime()
      // bitwise-XOR fold: forces every bucket value, no shuffle beyond
      // the single partial-agg exchange, output one row
      emb.select(c.as("b")).agg(sum(col("b") % 1000003L)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val obs = (1 to reps).flatMap { r =>
      val a = time(native)
      val b = time(hofBucket(col("v"), dim, nBits))
      println(f"[srp-ab] rep$r native=$a%.2f s hof=$b%.2f s")
      Seq(("native", a), ("hof", b))
    }
    def arm(t: String) = obs.filter(_._1 == t).map(_._2)
    def js(v: Seq[Double]) = v.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"metric":"srp_bucket_ab","sf":"$sfDir","n":$n,""" +
      s""""nbits":$nBits,"dim":$dim,""" +
      s""""native_s":${js(arm("native"))},"hof_s":${js(arm("hof"))},""" +
      s""""native_min_s":${arm("native").min},"hof_min_s":${arm("hof").min},""" +
      s""""speedup":${arm("hof").min / arm("native").min}}""")
    spark.stop()
  }
}
