package graft.tools

import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for q_dedup_clusters' cost structure: times the jaccard
  * pair build separately from the REAL Dedup.duplicateClusters call (so
  * the CC-side cost is attributed, not inferred by subtraction from the
  * bench total), and prints the pre-contraction cardinalities (edge count,
  * min-label node count, residual edge count) in the operator's CURRENT
  * oriented shape. Run with SPARK_GRAFT_CC_TIMING=1 to get the operator's
  * own per-phase timings (edges_build / minlabel_agg / contract_dedup /
  * minima_union / residual_resolve / star_round* / compose) on stderr.
  *
  * Usage: runMain graft.tools.CcProbe <sfDir> [reps]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"[ccprobe] === rep $rep ===")
      val t = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          T.tokens(col("text")).as("toks"))
      val pairs = time("pairs_build") {
        val p = Similarity.jaccardNearDupPairs(t, minJaccard = 0.5,
            corpusRows = Some(Tables.rowCount(spark, sfDir, "documents")))
          .select("doc_a", "doc_b").localCheckpoint(true)
        println(s"[ccprobe] n_pairs = ${p.count()}")
        p
      }
      // the REAL operator, phases visible via SPARK_GRAFT_CC_TIMING=1
      val n = time("cc_total")(Dedup.duplicateClusters(pairs).count())
      println(s"[ccprobe] n_labeled_nodes = $n")

      // pre-contraction cardinalities in the operator's oriented shape
      val e = pairs.select(
          greatest(col("doc_a"), col("doc_b")).as("u"),
          least(col("doc_a"), col("doc_b")).as("v"))
        .filter(col("u") =!= col("v")).localCheckpoint(true)
      println(s"[ccprobe] n_edge_rows = ${e.count()} (raw, pre-dedup)")
      val labels0 = e.groupBy("u").agg(min("v").as("root"))
        .select(col("u").as("id"), col("root")).localCheckpoint(true)
      println(s"[ccprobe] n_agg_nodes = ${labels0.count()}")
      // rows whose smaller endpoint is a local minimum — the raw volume a
      // fused minima recovery would push through the contraction exchange
      println(s"[ccprobe] n_min_incident_rows = ${
        e.join(labels0.select(col("id").as("v")), Seq("v"), "left_anti").count()}")
      val lu = labels0.select(col("id").as("u"), col("root").as("ru"))
      val lv = labels0.select(col("id").as("v"), col("root").as("rv"))
      val e1 = e.join(lu, Seq("u")).join(lv, Seq("v"), "left")
        .select(
          greatest(col("ru"), coalesce(col("rv"), col("v"))).as("u"),
          least(col("ru"), coalesce(col("rv"), col("v"))).as("v"))
        .filter(col("u") =!= col("v"))
        .dropDuplicates().localCheckpoint(true)
      println(s"[ccprobe] n_residual_edges = ${e1.count()}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
