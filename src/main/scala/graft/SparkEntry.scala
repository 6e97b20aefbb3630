package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 is registered here via [[Registry]]:
  * `queries` maps each query key to a runnable DataFrame program over the
  * test tables, `oracleSql` carries the equivalent DuckDB SQL for the
  * driver's differential correctness check.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape, `q_agg_group`) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.defs.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
