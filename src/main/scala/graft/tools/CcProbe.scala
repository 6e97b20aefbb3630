package graft.tools

import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only cardinality probe for the CC pre-contraction: prints canonical
  * edge count, residual edge count after one min-label contraction, and
  * per-stage timings. Usage: runMain graft.tools.CcProbe <sfDir>
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        T.tokens(col("text")).as("toks"))
    val pairs = Similarity.jaccardNearDupPairs(t, minJaccard = 0.5,
        corpusRows = Some(Tables.rowCount(spark, sfDir, "documents")))
      .select("doc_a", "doc_b").localCheckpoint(true)
    println(s"[ccprobe] n_pairs = ${pairs.count()}")
    val e = time("canonical edges build")(
      pairs.select(
          greatest(col("doc_a"), col("doc_b")).as("u"),
          least(col("doc_a"), col("doc_b")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct().localCheckpoint(true))
    println(s"[ccprobe] n_edges = ${e.count()}")
    val labels0 = time("min-label round")(
      e.select(col("u").as("s"), col("v").as("d"))
        .unionAll(e.select(col("v").as("s"), col("u").as("d")))
        .groupBy("s").agg(min("d").as("mn"))
        .select(col("s").as("id"), least(col("s"), col("mn")).as("root"))
        .localCheckpoint(true))
    println(s"[ccprobe] n_nodes = ${labels0.count()}")
    val lu = labels0.select(col("id").as("u"), col("root").as("ru"))
    val lv = labels0.select(col("id").as("v"), col("root").as("rv"))
    val e1 = time("contract edges")(
      e.join(lu, Seq("u")).join(lv, Seq("v"))
        .select(
          greatest(col("ru"), col("rv")).as("u"),
          least(col("ru"), col("rv")).as("v"))
        .filter(col("u") =!= col("v"))
        .dropDuplicates().localCheckpoint(true))
    println(s"[ccprobe] n_residual_edges = ${e1.count()}")
    // second contraction round to see convergence depth
    val labels1 = e1.select(col("u").as("s"), col("v").as("d"))
      .unionAll(e1.select(col("v").as("s"), col("u").as("d")))
      .groupBy("s").agg(min("d").as("mn"))
      .select(col("s").as("id"), least(col("s"), col("mn")).as("root"))
      .localCheckpoint(true)
    val lu1 = labels1.select(col("id").as("u"), col("root").as("ru"))
    val lv1 = labels1.select(col("id").as("v"), col("root").as("rv"))
    val e2 = e1.join(lu1, Seq("u")).join(lv1, Seq("v"))
      .select(
        greatest(col("ru"), col("rv")).as("u"),
        least(col("ru"), col("rv")).as("v"))
      .filter(col("u") =!= col("v"))
      .dropDuplicates().localCheckpoint(true)
    println(s"[ccprobe] n_residual2_edges = ${e2.count()}")
    spark.stop()
  }
}
