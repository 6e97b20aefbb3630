package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-probe generator must preserve the invariants the bench relies
  * on: exact row multiplication, join-key consistency across tables, and
  * no phantom cross-copy near-dups in documents. */
class ScaleUpSpec extends AnyFunSuite with SparkTest {

  private lazy val outDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup").toString
    graft.tools.ScaleUp.run(spark, "/root/testdata/sf0.001", dir, 3)
    dir
  }

  test("fact tables triple, dimension tables stay") {
    val src = "/root/testdata/sf0.001"
    Seq("customer", "orders", "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        val n0 = spark.read.parquet(s"$src/$t.parquet").count()
        val n1 = spark.read.parquet(s"$outDir/$t.parquet").count()
        assert(n1 == 3 * n0, s"$t: $n1 != 3*$n0")
      }
    Seq("region", "nation").foreach { t =>
      assert(spark.read.parquet(s"$outDir/$t.parquet").count() ==
        spark.read.parquet(s"$src/$t.parquet").count(), t)
    }
  }

  test("join keys stay consistent: orders->customer hit rate is preserved") {
    def hitRate(dir: String): Double = {
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val c = spark.read.parquet(s"$dir/customer.parquet")
      o.join(c, col("o_custkey") === col("c_custkey")).count().toDouble /
        o.count()
    }
    assert(hitRate(outDir) == hitRate("/root/testdata/sf0.001"))
  }

  test("document replicas are not near-duplicates of their source copy") {
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
    val n0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    // same underlying doc in copy 0 and copy 1
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val a = docs.filter(col("doc_id") === 7L).select(t.as("ta"))
    val b = docs.filter(col("doc_id") === 7L + n0 + 1).select(t.as("tb"))
    val jac = a.crossJoin(b)
      .select(graft.functions.MinHash.exactJaccard(col("ta"), col("tb")))
      .collect()(0).getDouble(0)
    assert(jac < 0.5, s"cross-copy jaccard $jac should be sub-threshold")
  }
}
