package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runtime exchange-reuse gate for the near-dup verify joins.
  *
  * jaccardNearDupPairs (and containmentNearDupPairs) attach the corpus
  * hash arrays to the candidate pairs through TWO joins against the same
  * repartitioned `baseArr` frame. The design requires the corpus arrays to
  * shuffle ONCE: the two build-side subtrees are canonically equal, so
  * AQE's stage cache must serve the second join from the first's
  * materialized stage. That reuse is INVISIBLE statically — an adaptive
  * initial plan (what PlanDigest digests under AQE) renders both branches
  * as separate exchanges — so this spec executes the query with AQE ON
  * (the session default, i.e. the bench/production config) and asserts the
  * FINAL adaptive plan carries a ReusedExchange whose output includes the
  * hash-array column. PLANS.md covers the AQE-off static counterpart of
  * the same canonicalized-subtree match.
  */
class ExchangeReuseSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"

  private def finalPlanOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materializes every adaptive stage of df's own execution
    df.queryExecution.executedPlan.toString
  }

  private def assertCorpusArrayReuse(name: String): Unit = {
    val plan = finalPlanOf(name)
    assert(plan.contains("isFinalPlan=true"),
      s"$name did not execute adaptively — reuse gate needs AQE on")
    val reused = "ReusedExchange \\[[^\\]]*hs_".r.findAllIn(plan).size
    assert(reused >= 1,
      s"$name: no ReusedExchange over the corpus hash-array branch in the " +
        s"final adaptive plan — the corpus arrays shuffled twice:\n$plan")
  }

  test("q_dedup_jaccard verify joins reuse the corpus-array exchange") {
    assertCorpusArrayReuse("q_dedup_jaccard")
  }

  test("q_dedup_containment verify joins reuse the corpus-array exchange") {
    assertCorpusArrayReuse("q_dedup_containment")
  }
}
