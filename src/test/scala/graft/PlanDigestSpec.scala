package graft

import graft.tools.PlanDigest
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression gate: every registered query's plan digest
  * (scan/pushdown/exchange/broadcast/join-strategy counts at sf0.001)
  * must match the committed PLANS.md. A silently lost broadcast or
  * pushdown changes the digest and fails HERE, at the plan level, instead
  * of surfacing rounds later as a bench drift.
  *
  * After an INTENDED plan change, regenerate the golden file:
  *   SPARK_GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanDigestSpec"
  */
class PlanDigestSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"
  private val goldenPath = java.nio.file.Paths.get("PLANS.md")

  test("every query's physical-plan digest matches the committed PLANS.md") {
    val current = PlanDigest.digestAll(spark, sf)
    if (sys.env.contains("SPARK_GRAFT_REGEN_PLANS")) {
      java.nio.file.Files.write(
        goldenPath, PlanDigest.render(current).getBytes("UTF-8"))
      info(s"regenerated $goldenPath with ${current.size} digests")
    } else {
      assert(java.nio.file.Files.exists(goldenPath),
        "PLANS.md missing — regenerate with SPARK_GRAFT_REGEN_PLANS=1")
      val golden = PlanDigest.parse(
        new String(java.nio.file.Files.readAllBytes(goldenPath), "UTF-8"))
      val errors = Seq.newBuilder[String]
      current.foreach { case (name, d) =>
        golden.get(name) match {
          case None => errors += s"$name: not in PLANS.md (new query?) — regenerate"
          case Some(g) if g != d =>
            errors += s"$name:\n  golden : $g\n  current: $d"
          case _ => ()
        }
      }
      val gone = golden.keySet -- current.map(_._1).toSet
      gone.foreach(n => errors += s"$n: in PLANS.md but no longer registered")
      val es = errors.result()
      assert(es.isEmpty, s"\nplan digests drifted (${es.size}):\n${es.mkString("\n")}")
    }
  }
}
