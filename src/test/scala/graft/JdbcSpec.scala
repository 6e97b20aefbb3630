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

  test("Tibero dialect: VARCHAR2/NUMBER(p,s)/DATE/CLOB map to the documented Spark types") {
    import graft.sources.TiberoDialect
    import org.apache.spark.sql.types._
    import java.sql.Types
    def read(typeName: String, size: Int, scale: Int = 0): Option[DataType] =
      TiberoDialect.getCatalystType(Types.OTHER, typeName, size,
        new MetadataBuilder().putLong("scale", scale.toLong))
    assert(read("VARCHAR2", 64).contains(StringType))
    assert(read("NVARCHAR2", 64).contains(StringType))
    assert(read("CLOB", 0).contains(StringType))
    assert(read("CHAR", 3).contains(StringType))
    // NUMBER family: scaled -> decimal; small integral precisions narrow
    assert(read("NUMBER", 10, 2).contains(DecimalType(10, 2)))
    assert(read("NUMBER", 9).contains(IntegerType))
    assert(read("NUMBER", 18).contains(LongType))
    assert(read("NUMBER", 22).contains(DecimalType(22, 0)))
    assert(read("NUMBER", 0).contains(DecimalType(38, 10))) // unconstrained
    // legal scale extremes: scale > precision (NUMBER(2,5) stores 0.000xy)
    // must not produce an invalid DecimalType; negative scale (NUMBER(8,-5)
    // stores values to ~10^13) must widen, not overflow an integral type
    assert(read("NUMBER", 2, 5).contains(DecimalType(5, 5)))
    assert(read("NUMBER", 8, -5).contains(DecimalType(13, 0)))
    // Tibero DATE carries time-of-day — must be a timestamp, not a date
    assert(read("DATE", 7).contains(TimestampType))
    assert(read("BINARY_DOUBLE", 0).contains(DoubleType))
    // unknown names fall through to Spark's stock Types.* mapping
    assert(read("SOMETHING_ELSE", 0).isEmpty)
  }

  test("Tibero dialect: registry resolves jdbc:tibero URLs to it; DDL write mapping") {
    import graft.sources.TiberoDialect
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    Jdbc.toString // force facade init (registers the dialect)
    val got = JdbcDialects.get("jdbc:tibero:thin:@host:8629:tibero")
    assert(got eq TiberoDialect)
    // Derby and friends are untouched
    assert(!(JdbcDialects.get("jdbc:derby:memory:x") eq TiberoDialect))
    assert(TiberoDialect.getJDBCType(StringType).map(_.databaseTypeDefinition)
      .contains("VARCHAR2(255)"))
    assert(TiberoDialect.getJDBCType(LongType).map(_.databaseTypeDefinition)
      .contains("NUMBER(19)"))
    assert(TiberoDialect.getJDBCType(BooleanType).map(_.databaseTypeDefinition)
      .contains("NUMBER(1)"))
  }

  test("partition-column predicate reaches the JDBC scan (PushedFilters)") {
    import spark.implicits._
    val src = (1L to 50L).map(i => (i, s"n_$i")).toDF("id", "name")
    Jdbc.write(src, url("pf"), "t_pf", driver = driver,
      columnTypes = Some("name VARCHAR(16)"))
    val filtered = Jdbc.readPartitioned(spark, url("pf"), "t_pf", "id", 2, driver)
      .filter(col("id") > 40L)
    val planStr = filtered.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters"), planStr)
    assert(planStr.contains("GreaterThan(") || planStr.contains("id > 40"), planStr)
    assert(filtered.count() === 10L)
  }
}
