package graft

import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** CheckpointMode RECOVERY contract (CheckpointModeSpec proves output
  * parity; this proves behavior under executor LOSS). Each case forks a
  * real multi-process cluster via graft.tools.FaultTolerance
  * (`local-cluster[2,1,…]`, separate executor JVMs) and SIGKILLs every
  * executor mid-loop — CC contraction and BPE merge learning, the two
  * loop-carried operator families — after the first round's lineage is
  * truncated,
  * so the kill provably lands on live loop state (a kill during the
  * first materialization is survivable from the intact original lineage
  * and made the naive version flaky). Workers restart replacements, so
  * what differs between the modes is only where round state lived:
  *
  *  - Reliable(dir): round state is re-read from checkpoint files — the
  *    job completes with the exact expected labeling.
  *  - Local: the killed executor's blocks are gone and the truncated
  *    lineage cannot recompute them — the job fails
  *    (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), which is the documented
  *    fail-fast contract of localCheckpoint, asserted here so the
  *    contrast stays demonstrated, not just claimed.
  *
  * Subprocess (not the shared test session) because the cluster manager
  * differs (`local-cluster` vs `local[4]`) and a killed executor must
  * never destabilize the suite's JVM.
  */
class FaultToleranceSpec extends AnyFunSuite {

  private def run(mode: String, op: String = "cc"): String = {
    val pb = new ProcessBuilder(
      "tools/jrun.sh", "graft.tools.FaultTolerance", mode, op)
    pb.directory(new java.io.File(sys.props("user.dir")))
    val env = pb.environment()
    env.put("SPARK_HOME", "/opt/spark")
    env.put("SPARK_SCALA_VERSION", "2.13") // executor launcher probes build dirs without it
    env.put("SPARK_DRIVER_MEM", "3g")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new StringBuilder
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val pump = new Thread(() => {
      var line = reader.readLine()
      while (line != null) {
        if (line.contains("[fault]")) out.append(line).append('\n')
        line = reader.readLine()
      }
    })
    pump.start()
    assert(p.waitFor(300, TimeUnit.SECONDS), s"FaultTolerance $mode timed out")
    pump.join(5000)
    assert(p.exitValue() == 0, s"FaultTolerance $mode exited ${p.exitValue()}\n$out")
    val log = out.toString
    assert(log.contains("killed_executor_pid="), s"no executor was killed:\n$log")
    log
  }

  test("CC, Reliable: job completes with correct labels despite executor SIGKILL") {
    val log = run("reliable")
    assert(log.contains("verdict=output_ok"), log)
  }

  test("CC, Local: executor SIGKILL fails the job (documented fail-fast contrast)") {
    val log = run("local")
    assert(log.contains("verdict=failed_as_expected"), log)
  }

  test("BPE learn, Reliable: faulted merge table equals the unfaulted reference") {
    val log = run("reliable", "bpe")
    assert(log.contains("verdict=output_ok"), log)
  }

  test("BPE learn, Local: executor SIGKILL fails the job (fail-fast contrast)") {
    val log = run("local", "bpe")
    assert(log.contains("verdict=failed_as_expected"), log)
  }

  test("ZipIndex ordered index, Reliable: ranks survive executor SIGKILL on the frozen layout") {
    val log = run("reliable", "zip")
    assert(log.contains("verdict=output_ok"), log)
  }

  test("ZipIndex ordered index, Local: executor SIGKILL fails the job (fail-fast contrast)") {
    val log = run("local", "zip")
    assert(log.contains("verdict=failed_as_expected"), log)
  }

  test("streaming dedup-ingest: admitted set survives executor SIGKILL mid-micro-batch") {
    // mode is ignored for the stream op (state = parquet + checkpoint by
    // design); the verdict is admitted-set equality with an unfaulted run
    val log = run("reliable", "stream")
    assert(log.contains("verdict=output_ok"), log)
  }

  test("streaming linkage-ingest: matched store survives executor SIGKILL (per-batch overwrite replay)") {
    // the ER sink's crash contract is stateless-per-batch resolve against
    // the static canonical table + batch=<id> overwrite; the verdict is
    // matched-set equality with an unfaulted reference run
    val log = run("reliable", "linkage")
    assert(log.contains("verdict=output_ok"), log)
  }

  test("streaming embed-ingest: admitted vectors + SRP bucket state survive executor SIGKILL") {
    // verdict folds in BOTH gates: admitted-vec_id equality with an
    // unfaulted run AND bucket-state/admitted-store consistency
    val log = run("reliable", "embed")
    assert(log.contains("verdict=output_ok"), log)
    assert(log.contains("bucket_state_consistent=true"), log)
  }
}
