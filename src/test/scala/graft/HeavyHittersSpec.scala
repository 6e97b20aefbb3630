package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite with SparkTest {

  // skewed stream: "hot" 40%, "warm" 20%, the rest spread over 100 cold keys
  private def stream = {
    import spark.implicits._
    val items =
      Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
        (0 until 400).map(i => s"cold${i % 100}")
    // deterministic shuffle so hot items interleave across partitions
    items.zipWithIndex.sortBy { case (s, i) => (i * 2654435761L) % 1000003 }
      .map(_._1).toDF("item").repartition(7)
  }

  test("misra-gries: every item's estimate is within [true - n/(k+1), true]") {
    val k = 10
    val sketch = stream.agg(HeavyHitters.column(k)(col("item")).as("hh"))
      .select(explode(col("hh")).as(Seq("item", "est")))
    val exact = stream.groupBy("item").agg(count(lit(1)).as("n_true"))
    val n = stream.count()
    val joined = sketch.join(exact, "item").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (est, t) = (r.getAs[Long]("est"), r.getAs[Long]("n_true"))
      assert(est <= t, s"${r.getString(0)}: est $est > true $t")
      assert(t - est <= n / (k + 1), s"${r.getString(0)}: est $est too far below $t")
    }
  }

  test("misra-gries: items above n/(k+1) are guaranteed present") {
    val k = 10
    val n = stream.count()
    val sketch = stream.agg(HeavyHitters.column(k)(col("item")).as("hh"))
      .select(explode(col("hh")).as(Seq("item", "est")))
      .collect().map(_.getString(0)).toSet
    // hot (400) and warm (200) are both > 1000/11 = 90
    assert(sketch.contains("hot"))
    assert(sketch.contains("warm"))
    assert(n / (k + 1) < 200)
  }

  test("misra-gries: grouped sketches stay within the per-group bound") {
    import spark.implicits._
    val k = 5
    val df = (Seq.fill(60)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++
      (0 until 30).map(i => ("a", s"z$i")) ++
      Seq.fill(50)(("b", "p")) ++ (0 until 10).map(i => ("b", s"q$i")))
      .toDF("g", "item").repartition(5)
    val sketches = df.groupBy("g")
      .agg(HeavyHitters.column(k)(col("item")).as("hh"))
      .select(col("g"), explode(col("hh")).as(Seq("item", "est")))
    val exact = df.groupBy("g", "item").agg(count(lit(1)).as("n_true"))
    val totals = df.groupBy("g").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sketches.join(exact, Seq("g", "item")).collect().foreach { r =>
      val (g, est, t) = (r.getString(0), r.getAs[Long]("est"), r.getAs[Long]("n_true"))
      assert(est <= t && t - est <= totals(g) / (k + 1), s"$g/${r.getString(1)}")
    }
    // dominant items of each group guaranteed present (60 > 120/6, 50 > 60/6)
    val present = sketches.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(present.contains(("a", "x")))
    assert(present.contains(("b", "p")))
  }

  test("bounded-buffer top-k equals the window formulation exactly") {
    import spark.implicits._
    import graft.functions.TopK
    import org.apache.spark.sql.expressions.Window
    // 40 groups x 60 distinct keys with duplicate counts and ties
    val counts = (0 until 2400).map { i =>
      (s"g${i % 40}", s"k${i % 60}", (i * 7 % 13 + 1).toLong)
    }.toDF("g", "key", "n").repartition(7)
    val viaUdaf = counts.groupBy("g")
      .agg(TopK.column(5)(col("key"), col("n")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), col("e._1").as("key"), col("e._2").as("n"),
        (col("pos") + 1).as("rn"))
      .orderBy("g", "rn").collect().toSeq
    val w = Window.partitionBy("g").orderBy(col("n").desc, col("key"))
    val viaWindow = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("g", "key", "n", "rn")
      .orderBy("g", "rn").collect().toSeq
    assert(viaUdaf == viaWindow)
  }
}
