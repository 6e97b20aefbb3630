package graft

import graft.sources.Warehouse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine's plain-SQL face: temp views over the tables + raw
  * spark.sql — a reference user who only writes SQL keeps working. */
class SqlSurfaceSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"

  test("TPC-H Q1 shape runs as raw SQL over registered views") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    val rows = spark.sql(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
                count(*) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""").collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    assert(rows.map(_.getLong(3)).sum == 6000L)
  }

  test("SQL result equals the DataFrame-API result for the same query") {
    Tables.orders(spark, sf).createOrReplaceTempView("orders_v")
    val viaSql = spark.sql(
      """SELECT o_orderpriority, count(*) AS n FROM orders_v
         GROUP BY 1 ORDER BY 1""").collect().toSeq
    val viaDf = Tables.orders(spark, sf)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(viaSql == viaDf)
  }

  test("partitioned sink prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Warehouse.writePartitioned(events, dir, Seq("day"))
    val firstDay = events.select(min("day")).collect()(0).getString(0)
    val pruned = spark.read.parquet(dir).filter(col("day") === firstDay)
    // partition filter appears as PartitionFilters in the scan, and only
    // that directory's rows are read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    assert(pruned.count() ==
      events.filter(col("day") === firstDay).count())
  }
}
