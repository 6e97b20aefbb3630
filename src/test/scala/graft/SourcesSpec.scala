package graft

import graft.sources.{Ingest, UrlTemplating, Warehouse}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite with SparkTest {

  test("lenient typing nulls malformed values; strict ANSI typing throws") {
    import spark.implicits._
    val staged = Seq(("12", "ok"), ("oops", "bad"))
      .toDF("n", "tag").withColumn("id", monotonically_increasing_id())
    val schema = StructType(Seq(
      StructField("n", LongType), StructField("tag", StringType)))
    val lenient = Ingest.applyTypesLenient(staged, schema)
      .orderBy("id").select("n").collect()
    assert(lenient(0).getLong(0) == 12L)
    assert(lenient(1).isNullAt(0))
    intercept[Exception] {
      Ingest.applyTypes(staged, schema).collect()
    }
  }

  test("url templating reproduces the reference's sample-URL surgery") {
    import spark.implicits._
    val df = Seq("http://h/sample/xml/ListService/1/5").toDF("u")
    def one(c: org.apache.spark.sql.Column): String =
      df.select(c).collect()(0).getString(0)
    assert(one(UrlTemplating.withAuthKey(col("u"), lit("MYKEY"))) ==
      "http://h/MYKEY/xml/ListService/1/5")
    assert(one(UrlTemplating.ensureTrailingSlash(col("u"))) ==
      "http://h/sample/xml/ListService/1/5/")
    assert(one(UrlTemplating.dropLastSegments(col("u"), 2)) ==
      "http://h/sample/xml/ListService")
    assert(one(UrlTemplating.afterMarker(col("u"), "/sample/xml/")) ==
      "ListService/1/5")
  }

  test("bucketed tables join without an exchange (co-located join)") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
      val dim = (0L until 50L).map(k => (k, s"d$k")).toDF("k", "name")
      Warehouse.writeBucketed(fact, "t_fact", "k", 8)
      Warehouse.writeBucketed(dim, "t_dim", "k", 8)
      val joined = Warehouse.colocatedJoin(spark, "t_fact", "t_dim", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected bucket SMJ in:\n$plan")
      assert(joined.count() == 1000L)
      // the downstream per-bucket-key aggregate also needs no exchange:
      // bucketing satisfies the group-by's required distribution too
      val agg = joined.groupBy("k").count()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"unexpected shuffle in:\n$aggPlan")
      assert(agg.count() == 50L)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS t_fact")
      spark.sql("DROP TABLE IF EXISTS t_dim")
    }
  }
}
