package graft.tools

import graft.Tables
import graft.functions.{VectorFunctions => V}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decomposes knnGraph's dominant 100x stage (r17: 1940 task-seconds at
  * 200k vectors — ~10 us per candidate pair, ~50x a codegen cosine) into
  * additive pieces, each timed end-to-end from the same bucketed inputs:
  *
  *   join      — SMJ on bucket + join condition, count(1) only
  *   cosine    — + graft_cosine per pair, sum-aggregated (no sort/window)
  *   sort      — + the (src, cos desc, dst) sort via partial group-limit
  *               count (approximates the shipped plan minus final window)
  *   full      — the shipped knnGraph
  *
  * The deltas attribute the per-pair cost to join machinery vs scoring vs
  * ranking, which decides whether the decade-ratio lever is the candidate
  * count (bucket dial, recall-priced) or the per-pair constant.
  *
  * Usage: runMain graft.tools.KnnStageProbe <sfDir> [k] [reps]
  */
object KnnStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale100x")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), V.asDouble(col("embedding")).as("v"))
      .localCheckpoint(true)
    val n = emb.count()
    val nBits = Similarity.lshNBits(n)
    println(s"[knn-stage] n=$n nBits=$nBits")

    def pairs(): (DataFrame, DataFrame) = {
      val bucketed = emb.filter(V.l2Norm(col("v")) > 0)
        .withColumn("bucket",
          Similarity.srpBucket(col("v"), 64, nBits, portable = true))
        .repartition(col("bucket"))
      val probes = bucketed
        .select(col("bucket").as("n_bucket"), col("vec_id").as("src"), col("v").as("sv"))
        .withColumn("bucket", explode(Similarity.probeKeys(col("n_bucket"), nBits)))
        .drop("n_bucket")
      val cands = bucketed
        .select(col("bucket"), col("vec_id").as("dst"), col("v").as("dv"))
      (probes, cands)
    }
    def timed(tag: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[knn-stage] $tag%-8s $dt%8.2f s ($rows rows)")
      dt
    }
    val out = (1 to reps).map { r =>
      val (p1, c1) = pairs()
      val tJoin = timed("join") {
        p1.join(c1, Seq("bucket")).filter(col("src") =!= col("dst"))
          .select(lit(1L).as("one")).agg(sum("one")).collect()(0).getLong(0)
      }
      val (p2, c2) = pairs()
      val tCos = timed("cosine") {
        p2.join(c2, Seq("bucket")).filter(col("src") =!= col("dst"))
          .select(round(V.cosineNative(col("sv"), col("dv")), 6).as("c"))
          .agg(sum("c")).collect(); 1L
      }
      val (p3, c3) = pairs()
      val w = Window.partitionBy("src")
        .orderBy(round(col("cos"), 6).desc, col("dst"))
      val tFull = timed("full") {
        p3.join(c3, Seq("bucket")).filter(col("src") =!= col("dst"))
          .withColumn("cos", V.cosineNative(col("sv"), col("dv")))
          .select(col("src"), col("dst"), col("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).count()
      }
      (tJoin, tCos, tFull)
    }
    def mins(f: ((Double, Double, Double)) => Double) = out.map(f).min
    println(s"""{"metric":"knn_stage_probe","sf":"$sfDir","n":$n,"nbits":$nBits,""" +
      s""""join_min_s":${mins(_._1)},"cosine_min_s":${mins(_._2)},""" +
      s""""full_min_s":${mins(_._3)}}""")
    spark.stop()
  }
}
