package graft

import java.nio.file.Files
import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with SparkTest {

  private val sfDir = "/root/testdata/sf0.001"

  test("zorderWrite preserves the exact row multiset") {
    val out = Files.createTempDirectory("graft-zorder").toString + "/li"
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", out, nFiles = 8)
    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    assert(li.exceptAll(back).isEmpty && back.exceptAll(li).isEmpty)
  }

  test("z-ordered files cluster BOTH dimensions (range predicate touches few files)") {
    val out = Files.createTempDirectory("graft-zorder").toString + "/li"
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey")
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", out, nFiles = 8)
    val back = spark.read.parquet(out)
    val total = back.select(input_file_name()).distinct().count()
    assert(total >= 6, s"expected ~8 files, got $total") // range split may merge a couple

    val (minX, maxX) = {
      val r = li.agg(min("l_partkey"), max("l_partkey")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (minY, maxY) = {
      val r = li.agg(min("l_suppkey"), max("l_suppkey")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // bottom-5% range on each dimension: bucketized rank has its top bit
    // (and more) fixed at 0, so the matching z-range is a small fraction
    // of the space — only the files whose z-range intersects it hold rows
    def filesTouched(c: String, lo: Long, hi: Long): Long =
      back.filter(col(c) >= lo && col(c) <= hi)
        .select(input_file_name()).distinct().count()
    val fx = filesTouched("l_partkey", minX, minX + (maxX - minX) / 20)
    val fy = filesTouched("l_suppkey", minY, minY + (maxY - minY) / 20)
    assert(fx < total, s"x-range predicate touched all $total files")
    assert(fy < total, s"y-range predicate touched all $total files")
    assert(fx + fy < 2 * total * 3 / 4,
      s"clustering too weak: fx=$fx fy=$fy of $total files")
  }

  test("zValue2 interleaves bits (known values)") {
    import spark.implicits._
    // x=0b11, y=0b00 -> z=0b0101; x=0b00, y=0b11 -> z=0b1010
    val df = Seq((3L, 0L), (0L, 3L), (3L, 3L), (0L, 0L)).toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 2).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(5L, 10L, 15L, 0L))
  }
}
