package graft

import graft.operators.Robust
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact integer median/MAD: pinned against brute-force order statistics,
  * odd and even strata, and the scaled outlier inequality. */
class RobustSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  test("median2: sum of the two middle order stats, odd and even strata") {
    val rows = Seq(
      ("a", 1L, 10), ("a", 2L, 30), ("a", 3L, 20),            // odd: med=20
      ("b", 1L, 5), ("b", 2L, 7), ("b", 3L, 100), ("b", 4L, 6) // even: (6+7)
    ).toDF("s", "id", "v")
    val got = Robust.median2(rows, "s", "v", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("a" -> 40L, "b" -> 13L))
  }

  test("madOutliers == brute-force median/MAD decision on random data") {
    val data = (0 until 400).map(i =>
      ("s" + (i % 3), i.toLong, ((i * 37) % 101) + (if (i % 97 == 0) 500 else 0)))
    val got = Robust.madOutliers(data.toDF("s", "id", "v"), "s", "v", "id", k = 2)
      .collect().map(r => (r.getAs[String]("s"), r.getAs[Long]("id"))).toSet
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }
    val want = data.groupBy(_._1).toSeq.flatMap { case (s, rs) =>
      val m2 = med2(rs.map(_._3.toLong))
      val devs = rs.map(r => (r._2, (2 * r._3 - m2).abs))
      val mad4 = med2(devs.map(_._2))
      devs.filter(d => 2 * d._2 > 2 * mad4).map(d => (s, d._1))
    }.toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture must actually flag something")
  }
}
