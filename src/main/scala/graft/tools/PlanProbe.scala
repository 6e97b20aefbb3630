package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** EXECUTED-plan inspection main — the adaptive sibling of [[graft.Explain]]
  * (which prints the static plan without running). Materializes the named
  * query and prints the FINAL adaptive plan, which is where runtime-only
  * shapes live: AQE ReusedExchange/stage-cache hits, empty-relation join
  * elimination, broadcast demotions. Usage:
  *   runMain graft.tools.PlanProbe <queryName> [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Tables.configure(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    df.collect()
    println("=====FINAL=====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
