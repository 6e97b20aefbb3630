package graft.tools

import graft.Tables
import graft.functions.{VectorFunctions => V}
import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for knnGraph's bucket-population dial (r16 verdict #5): the
  * decade ratio of q_sim_knn/q_dedup_knn_e2e tracks per-row candidate
  * work ~ bucketPop x (nBits+1) x skew, all three of which grow with the
  * corpus (measured at 100x: pop 48.9, probe fanout 13, skew 1.55 ->
  * 985 candidates/row vs 453 at 10x). Each extra SRP bit halves the
  * population at one more probe key and ~zero scan cost (SrpBucketAB:
  * the fused expression buckets 200k rows in 0.15 s), so SMALLER buckets
  * may buy wall time — but they also shrink the same-or-Hamming-1
  * collision probability, so recall must be priced in the same probe.
  *
  * Times knnGraph at each targetBucketSize (interleaved round-robin,
  * `reps` sweeps), optionally scoring recall vs the brute-force truth
  * (feasible <= 10x; at 100x run walls-only).
  *
  * Usage: runMain graft.tools.KnnBucketAB <sfDir> <k> <reps> <recall:0|1> <target...>
  */
object KnnBucketAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = args(1).toInt
    val reps = args(2).toInt
    val withRecall = args(3) == "1"
    val targets = args.drop(4).map(_.toLong).toSeq
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

    val truth: Option[(DataFrame, Long)] = if (!withRecall) None else {
      val w = Window.partitionBy("src").orderBy(round(col("cos"), 6).desc, col("dst"))
      val t = emb.select(col("vec_id").as("src"), col("v").as("sv"))
        .crossJoin(broadcast(emb.select(col("vec_id").as("dst"), col("v").as("dv"))))
        .filter(col("src") =!= col("dst"))
        .withColumn("cos", V.cosineNative(col("sv"), col("dv")))
        .select("src", "dst", "cos")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select("src", "dst")
        .localCheckpoint(true)
      Some((t, t.count()))
    }

    def run(target: Long): (Int, Double, Double) = {
      val nBits = Similarity.lshNBits(n, targetBucketSize = target)
      val keep = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val g = Similarity.knnGraph(emb, dim = 64, nBits = nBits, k = k,
        portable = true).localCheckpoint(true)
      g.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val rec = truth.map { case (t, edges) =>
        g.select("src", "dst").join(t, Seq("src", "dst"), "left_semi")
          .count().toDouble / edges
      }.getOrElse(-1.0)
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(true))
      System.gc()
      (nBits, wall, rec)
    }
    val obs = (1 to reps).flatMap { r =>
      targets.map { tgt =>
        val (nBits, wall, rec) = run(tgt)
        println(f"[knn-ab] rep$r target=$tgt nBits=$nBits wall=$wall%.2f s recall=$rec%.3f")
        (tgt, nBits, wall, rec)
      }
    }
    val rows = targets.map { tgt =>
      val mine = obs.filter(_._1 == tgt)
      s"""{"target":$tgt,"nbits":${mine.head._2},""" +
        s""""wall_min_s":${mine.map(_._3).min},""" +
        s""""recall":${mine.map(_._4).max}}"""
    }
    println(s"""{"metric":"knn_bucket_ab","sf":"$sfDir","n":$n,"k":$k,""" +
      s""""arms":${rows.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
