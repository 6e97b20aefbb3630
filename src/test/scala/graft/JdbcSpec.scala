package graft

import graft.sources.Jdbc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the JDBC source/sink against embedded Derby (the
  * offline test engine bundled with Spark's metastore). Complements the
  * oracle-checked `q_jdbc_roundtrip`: this spec pins the pieces the driver
  * check can't see — columnTypes DDL overrides, partition-seam row
  * accounting, and the empty-table fallback.
  */
class JdbcSpec extends AnyFunSuite with SparkTest {

  private val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")
  private def url(db: String) = s"jdbc:derby:memory:jdbcspec_$db;create=true"

  test("write + readPartitioned round-trips rows and schema") {
    import spark.implicits._
    val src = (1L to 97L).map(i => (i, s"name_$i", i % 7)).toDF("id", "name", "grp")
    Jdbc.write(src, url("rt"), "t_rt", driver = driver,
      columnTypes = Some("name VARCHAR(32)"))
    val back = Jdbc.readPartitioned(spark, url("rt"), "t_rt", "id", 4, driver)
    assert(back.count() === 97L)
    assert(back.columns.map(_.toLowerCase).sorted === Array("grp", "id", "name"))
    // values survive, not just counts
    val sums = back.agg(sum("id"), sum("grp")).head()
    assert(sums.getLong(0) === (1L to 97L).sum)
    assert(sums.getLong(1) === (1L to 97L).map(_ % 7).sum)
  }

  test("readPartitioned covers the bound seams: no row lost or duplicated") {
    import spark.implicits._
    // ids deliberately include both range bounds and values that land
    // exactly on stride seams for numPartitions=4 over [1, 100]
    val ids = Seq(1L, 25L, 26L, 50L, 51L, 75L, 76L, 100L)
    Jdbc.write(ids.toDF("id"), url("seam"), "t_seam", driver = driver)
    val back = Jdbc.readPartitioned(spark, url("seam"), "t_seam", "id", 4, driver)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.select("id").as[Long].collect().sorted === ids.toArray)
  }

  test("columnTypes override makes string columns comparable (VARCHAR not CLOB)") {
    import spark.implicits._
    val src = Seq((1L, "b"), (2L, "a"), (3L, "c")).toDF("id", "name")
    Jdbc.write(src, url("ct"), "t_ct", driver = driver,
      columnTypes = Some("name VARCHAR(16)"))
    // MIN over a Derby CLOB column would fail; over VARCHAR it works —
    // run the aggregate remotely-sourced to prove the DDL override landed
    val m = Jdbc.readPartitioned(spark, url("ct"), "t_ct", "id", 2, driver)
      .agg(min("name")).head().getString(0)
    assert(m === "a")
  }

  test("readPartitioned on an empty table returns empty, not NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    Jdbc.write(empty, url("empty"), "t_empty", driver = driver,
      columnTypes = Some("name VARCHAR(16)"))
    val back = Jdbc.readPartitioned(spark, url("empty"), "t_empty", "id", 4, driver)
    assert(back.count() === 0L)
    assert(back.columns.map(_.toLowerCase).sorted === Array("id", "name"))
  }
}
