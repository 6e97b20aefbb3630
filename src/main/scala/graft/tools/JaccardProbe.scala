package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cardinality probe for the PPJoin near-dup pipeline: prints the row
  * counts of each pruning stage at a given sfDir so scaling behavior is
  * attributable to a STAGE, not guessed from end-to-end walltime.
  * Usage: runMain graft.tools.JaccardProbe <sfDir> [shuffle] [minJaccard]
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shuffle = if (args.length > 1) args(1) else "32"
    val minJ = if (args.length > 2) args(2).toDouble else 0.5
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.{TextFunctions => T}
    val minJaccard = minJ
    val bandWidth = 0.1
    def band(c: org.apache.spark.sql.Column) =
      floor(log1p(c) / bandWidth).cast("long")
    // mirrors Similarity.jaccardNearDupPairs' hashed-token pipeline
    // (round-9): stages run on xxhash64 longs, cardinalities identical
    val base = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), band(col("n_chars")).as("band"),
        sort_array(array_distinct(
          transform(T.tokens(col("text")), xxhash64(_)))).as("hs"))
      .withColumn("n_toks", size(col("hs")))
      .localCheckpoint(false)
    val toksExp = base.select(col("doc_id"), col("lang"), col("band"),
      col("n_toks"), explode(col("hs")).as("token"))
    val freq = toksExp.groupBy("token").agg(count(lit(1)).as("tf"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("tf"), col("token"))
    val prefix = toksExp.join(freq, Seq("token"))
      .withColumn("r", row_number().over(wDoc))
      .filter(col("r") <=
        col("n_toks") - ceil(lit(minJaccard) * col("n_toks") - lit(1e-9)) + 1)
      .select("doc_id", "lang", "band", "token", "n_toks", "r")
      .localCheckpoint(false)
    val a = prefix.select(col("doc_id").as("doc_a"), col("lang"), col("band"),
      col("token"), col("n_toks").as("n_a"), col("r").as("r_a"))
    val b = prefix
      .filter(col("r") <= col("n_toks") -
        ceil(lit(2 * minJaccard / (1 + minJaccard)) * col("n_toks") - lit(1e-9)) + 1)
      .select(col("doc_id").as("doc_b"), col("lang"),
        col("band").as("b_band"), col("token"), col("n_toks").as("n_b"),
        col("r").as("r_b"))
      .withColumn("band", explode(array(col("b_band") - 1, col("b_band"), col("b_band") + 1)))
      .drop("b_band")
    val alpha = ceil(
      lit(minJaccard / (1 + minJaccard)) * (col("n_a") + col("n_b")) - lit(1e-9))
    val joined = a.join(b, Seq("lang", "band", "token"))
      .filter(col("n_b") < col("n_a") ||
        (col("n_b") === col("n_a") && col("doc_b") < col("doc_a")))
    val sized = joined
      .filter(col("n_b") >= lit(minJaccard) * col("n_a") - lit(1e-9))
    val positioned = sized
      .filter(lit(1) + least(col("n_a") - col("r_a"), col("n_b") - col("r_b")) >= alpha)
    val argmin = positioned
      .groupBy("doc_a", "doc_b")
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        min(col("r_a")).as("fa"), min_by(col("r_b"), col("r_a")).as("fb"))
      .filter(lit(1) + least(col("n_a") - col("fa"), col("n_b") - col("fb")) >= alpha)
    println(s"""{"sf": "$sfDir", "docs": ${base.count()}, "prefixRows": ${prefix.count()}, "indexRows": ${b.count()}, "joinRows": ${joined.count()}, "afterSize": ${sized.count()}, "afterPos": ${positioned.count()}, "candAnyRow": ${positioned.select("doc_a", "doc_b").distinct().count()}, "cand": ${argmin.count()}}""")
    spark.stop()
  }
}
