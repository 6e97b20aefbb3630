package graft

import org.apache.spark.sql.SparkSession

/** One shared local session per test JVM (suites reuse via getOrCreate). */
trait SparkTest {
  lazy val spark: SparkSession = Tables.configure(SparkSession.builder())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
