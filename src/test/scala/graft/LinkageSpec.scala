package graft

import graft.operators.{Linkage, Sample}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Record linkage + the r14 deterministic-sampling additions: exactness of
  * the integer scoring arithmetic (the engine-portability claim), best-match
  * selection semantics, and the weighted/negative samplers' contracts. */
class LinkageSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // reference Levenshtein (classic DP) for exactness pins
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def refSim1000(a: String, b: String): Long =
    1000L - math.min(1000L,
      1000L * lev(a, b) / math.max(math.max(a.length, b.length), 1))

  test("sim1000 == exact integer reference on varied pairs (incl. unicode)") {
    val pairs = Seq(
      ("kitten", "sitting"), ("", "abc"), ("same", "same"),
      ("a", "zzzzzzzzzz"), ("한국어 텍스트", "한국어 테스트"),
      ("abcdefgh", "abXdefgh"), ("x", ""), ("ab", "ba"))
    val got = pairs.toDF("a", "b")
      .select(Linkage.sim1000(col("a"), col("b")).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (a, b) => refSim1000(a, b) })
  }

  test("resolve: best candidate per dirty row, tie on canonical id, threshold") {
    // block "k1": canonical 10 (exact on both fields) vs 11 (worse tail);
    // block "k2": canonical 20 and 21 IDENTICAL fields -> tie, lower id wins;
    // block "k3": only a bad candidate -> filtered by minScore.
    val canonical = Seq(
      (10L, "k1", "alpha", "omega"), (11L, "k1", "alpha", "zzzzz"),
      (20L, "k2", "beta", "gamma"), (21L, "k2", "beta", "gamma"),
      (30L, "k3", "aaaaaaaaaa", "bbbbbbbbbb")
    ).toDF("cid", "blk", "f1c", "f2c")
    val dirty = Seq(
      (1L, "k1", "alpha", "omega"),
      (2L, "k2", "beta", "gamma"),
      (3L, "k3", "zzzzzzzzzz", "qqqqqqqqqq")
    ).toDF("did", "blk", "f1d", "f2d")
    val out = Linkage.resolve(canonical, dirty, "cid", "did", "blk",
        Seq(Linkage.Field("f1c", "f1d", 600), Linkage.Field("f2c", "f2d", 400)),
        minScore = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(out.toSeq == Seq(
      (1L, 10L, 1000000L), // exact: 600*1000 + 400*1000
      (2L, 20L, 1000000L)  // tie between 20/21 -> lower canonical id
    )) // dirty 3: score 0 < threshold -> dropped
  }

  test("resolve: no cross-block pairs ever score (blocking is the only pair-gen)") {
    val canonical = Seq((1L, "A", "same")).toDF("cid", "blk", "fc")
    val dirty = Seq((9L, "B", "same")).toDF("did", "blk", "fd")
    val out = Linkage.resolve(canonical, dirty, "cid", "did", "blk",
      Seq(Linkage.Field("fc", "fd", 1000)), minScore = 0L)
    assert(out.count() == 0) // identical fields but different block -> no row
  }

  test("weightedPerStratum: k per stratum, matches brute-force priority order") {
    val rows = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 1 + (i % 37).toInt))
    val df = rows.toDF("id", "s", "w")
    val got = Sample.weightedPerStratum(df, "s", "id", "w", k = 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // brute-force: same hash, priority = h*2^20 / w (exact in Long)
    def h(id: Long) = ((id % 1000003L) * 2654435761L + 40503L) % 1000003L
    val want = rows.groupBy(_._2).toSeq.flatMap { case (s, rs) =>
      rs.sortBy { case (id, _, w) => (h(id) * 1048576L / w, id) }
        .take(5).map(r => (s, r._1))
    }.toSet
    assert(got == want)
    assert(got.count(_._1 == "a") == 5 && got.count(_._1 == "b") == 5)
  }

  test("weightedPerStratum: heavier rows are favored (monotone in weight)") {
    // same ids (same hashes), one stratum; give id 7 a huge weight vs tiny:
    // with weight 1 it may or may not be picked; with weight 10^6 its
    // priority is ~0 so it MUST be in the top-k.
    val heavy = (0L until 100L).map(i => (i, "x", if (i == 7L) 1000000 else 10))
    val got = Sample.weightedPerStratum(heavy.toDF("id", "s", "w"),
        "s", "id", "w", k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(7L))
  }

  test("negativePairs: k per row, never self, rep = min id of target bucket") {
    val ids = (0L until 300L).toDF("id")
    val out = Sample.negativePairs(ids, "id", k = 3, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def h(id: Long) = (((id % 1000003L) * 2654435761L + 40503L) % 1000003L % 64).toInt
    val reps = (0L until 300L).groupBy(h).map { case (b, g) => b -> g.min }
    // every (id, j) whose target bucket is populated appears exactly once
    val expected = for {
      id <- 0L until 300L; j <- 1L to 3L
      rep <- reps.get((h(id) + j.toInt) % 64)
    } yield (id, j, rep)
    assert(out.sorted.toSeq == expected.sorted)
    assert(out.forall { case (id, _, neg) => id != neg })
  }

  test("resolveIncremental: arrivals broadcast, canonical side never shuffled") {
    // The q_er_incremental scale claim made executable: with the broadcast
    // hint on the arrivals side, the candidate join is a BroadcastHashJoin
    // whose STREAMED side is the canonical scan — so below the join there
    // is no shuffle exchange at all (the corpus is probed map-side); the
    // only exchange in the whole plan is the arrivals-sized best-match
    // window above it. Disable AQE locally so the assertion reads the
    // statically planned exchanges.
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "false",
      // force sizes to NOT qualify for auto-broadcast: the HINT must do it
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = queries.LinkageQueries.defs
        .find(_.name == "q_er_incremental").get
        .run(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(800))
      val joinIdx = plan.indexOf("BroadcastHashJoin")
      val belowJoin = plan.substring(joinIdx)
      // exactly one shuffle in the full plan (the window) and none below
      // the join (the canonical probe side)
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        "canonical side must not shuffle:\n" + belowJoin.take(800))
      assert("Exchange hashpartitioning".r
        .findAllIn(plan).size == 1, "only the window may shuffle")
    }
  }

  test("survivorship: one winner per entity by precedence, candidate count kept") {
    val matches = Seq(
      (1L, 100L, 900000L), (2L, 100L, 880000L), (3L, 100L, 990000L),
      (4L, 200L, 700000L)
    ).toDF("did", "entity", "score")
    val dirty = Seq(
      (1L, 50), (2L, 80), (3L, 80), (4L, 10)
    ).toDF("did", "len")
    val out = Linkage.survivorship(matches, dirty, "did", "entity",
        precedence = Seq(col("len").desc, col("did")))
      .select("entity", "did", "n_candidates", "len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sorted.toSeq
    // entity 100: len ties at 80 between dids 2 and 3 -> lower did wins;
    // the len-50 record loses despite its higher score (precedence is the
    // caller's contract, not the match score)
    assert(out == Seq((100L, 2L, 3L, 80), (200L, 4L, 1L, 10)))
  }

  test("negativePairs: rejects buckets <= k") {
    intercept[IllegalArgumentException] {
      Sample.negativePairs(Seq(1L).toDF("id"), "id", k = 8, buckets = 8)
    }
  }

  test("asciiWindow: NULL text propagates NULL; non-ASCII still raises the contract error (r15 ADVICE)") {
    import org.apache.spark.sql.functions.col
    // AssertTrue raises on a NULL condition, so an unguarded NULL window
    // used to fail with a misleading "must be pure ASCII" error
    val got = Seq[(Long, String)]((1L, "plain ascii"), (2L, null))
      .toDF("id", "t")
      .select(col("id"), graft.queries.LinkageQueries.asciiWindow(col("t"), "t").as("w"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSet
    assert(got == Set((1L, "plain ascii"), (2L, null)))
    val err = intercept[Exception] {
      Seq("café").toDF("t")
        .select(graft.queries.LinkageQueries.asciiWindow(col("t"), "t"))
        .collect()
    }
    assert(err.getMessage.contains("pure ASCII"), s"wrong error: ${err.getMessage}")
  }
}
