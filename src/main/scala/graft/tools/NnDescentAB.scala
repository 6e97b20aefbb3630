package graft.tools

import graft.Tables
import graft.functions.{VectorFunctions => V}
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the NN-descent int8 pre-score gate (r15 verdict #4):
  * builds the SRP seed graph ONCE (checkpointed — seed-build noise is
  * excluded from every timing), then times nnDescentRound with
  * prescoreFactor 0 (exact: full vectors ride every candidate pair) vs 3
  * (the shipped gate), N reps each, interleaved A,B,A,B so a host drift
  * mid-probe biases both arms equally. Prints one JSON line.
  *
  * Usage: runMain graft.tools.NnDescentAB <sfDir> [k] [reps] [dim]
  * (dim > 64 synthesizes the extra components per vector from the same
  * deterministic hash family ScaleUp uses — the HIGH-DIM arm of the
  * pricing question: at 768 dims a full vector is 6 KB/row on the
  * candidate exchange vs a 96x-narrower int8 code, the geometry the
  * gate exists for.)
  */
object NnDescentAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val dim = args.drop(3).headOption.map(_.toInt).getOrElse(64)
    require(dim >= 64, "dim must be >= 64 (the table's native width)")
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
        s"concat(v, transform(sequence(64, ${dim - 1}), i -> " +
          "(CAST(pmod(xxhash64(vec_id, i), 100000) AS DOUBLE) / 100000.0) - 0.5))"
      ).as("v"))).localCheckpoint(true)
    val n = emb.count()
    val nBits = Similarity.lshNBits(n)
    val seed = Similarity
      .knnGraph(emb, dim = dim, nBits = nBits, k = k, portable = true)
      .localCheckpoint(true)
    println(s"[nnd-ab] n=$n dim=$dim nBits=$nBits seed_edges=${seed.count()}")

    def timeRound(factor: Int): Double = {
      // keep emb/seed pinned; drop only the blocks THIS round created
      val keep = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      Similarity.nnDescentRound(seed, emb, k = k, prescoreFactor = factor).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(true))
      System.gc()
      dt
    }
    val obs = (1 to reps).flatMap { r =>
      val a = timeRound(0)
      val b = timeRound(3)
      println(f"[nnd-ab] rep$r exact=$a%.1f s gated=$b%.1f s")
      Seq(("exact", a), ("gated", b))
    }
    def arm(tag: String) = obs.filter(_._1 == tag).map(_._2)
    def js(v: Seq[Double]) = v.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(s"""{"metric":"nndescent_ab","sf":"$sfDir","n":$n,"k":$k,"dim":$dim,""" +
      s""""exact_s":${js(arm("exact"))},"gated_s":${js(arm("gated"))},""" +
      s""""exact_min_s":${arm("exact").min},"gated_min_s":${arm("gated").min}}""")
    spark.stop()
  }
}
