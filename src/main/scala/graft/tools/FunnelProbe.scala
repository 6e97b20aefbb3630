package graft.tools

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only A/B for the q_agg_funnel plan shape: staged filtered
  * min-aggs + user-level join chain (shipped) vs a window chain over one
  * user_id partitioning (zero joins, but shuffles the full event stream
  * with no map-side partial aggregation). Prints timings + row parity.
  * Usage: runMain graft.tools.FunnelProbe <sfDir>
  */
object FunnelProbe {
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
      println(f"[funnel] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))

    def joins(): DataFrame = {
      val t1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("t").as("t1"))
      val t2 = e.filter(col("event_type") === "click")
        .join(t1, "user_id").filter(col("t") > col("t1"))
        .groupBy("user_id").agg(min("t").as("t2"))
      val t3 = e.filter(col("event_type") === "purchase")
        .join(t2, "user_id").filter(col("t") > col("t2"))
        .groupBy("user_id").agg(min("t").as("t3"))
      e.select("user_id").distinct()
        .join(t1, Seq("user_id"), "left")
        .join(t2, Seq("user_id"), "left")
        .join(t3, Seq("user_id"), "left")
        .select(col("user_id"), col("t1"), col("t2"), col("t3"))
    }

    def windows(): DataFrame = {
      val w = Window.partitionBy("user_id")
      e.withColumn("t1",
          min(when(col("event_type") === "view", col("t"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("t") > col("t1"),
            col("t"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("t") > col("t2"),
            col("t"))).over(w))
        .groupBy("user_id")
        .agg(min("t1").as("t1"), min("t2").as("t2"), min("t3").as("t3"))
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    (1 to reps).foreach { r =>
      time(s"join-chain rep$r")(joins().count())
      time(s"window-chain rep$r")(windows().count())
    }
    val a = joins().collect().map(_.toSeq).sortBy(_.head.toString)
    val b = windows().collect().map(_.toSeq).sortBy(_.head.toString)
    println(s"[funnel] parity=${a.sameElements(b)} rows=${a.length}")
    spark.stop()
  }
}
