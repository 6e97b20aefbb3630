package graft.tools

import scala.jdk.CollectionConverters._

import graft.operators.{Bpe, CheckpointMode, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fault-injection harness for [[CheckpointMode]]: runs a loop-carried
  * operator on a real multi-process cluster (`local-cluster[2,1,…]` —
  * separate executor JVMs, exactly the failure domain `local[_]` cannot
  * model), SIGKILLs every executor JVM mid-loop (once the first round's
  * lineage is truncated and its state live), and reports whether the job
  * completed with correct output. The Workers restart replacement
  * executors within seconds — the cluster heals either way; the verdict
  * is decided solely by WHERE the lost round state lived (blocks vs
  * files).
  *
  * Usage: runMain graft.tools.FaultTolerance <local|reliable> [cc|bpe] [size]
  *
  *  - `cc`  (default): Dedup.duplicateClusters on a `size`-long chain —
  *    every label must come out as the chain head.
  *  - `bpe`: Bpe.learnMerges on a deterministic `size`-word Zipf
  *    vocabulary — the faulted merge table must equal a second, unfaulted
  *    run on the healed cluster (learnMerges is deterministic, so any
  *    divergence means the fault corrupted round state).
  *
  * Expected behavior (FaultToleranceSpec asserts it from a subprocess):
  *  - `reliable`: the loop's round state lives in checkpoint FILES every
  *    executor can re-read — the job completes despite the kill with
  *    correct output (exit 0, line `verdict=output_ok`).
  *  - `local`: round state lives in the killed executors' blocks and the
  *    truncated lineage cannot recompute them — the job fails (exit 0
  *    with line `verdict=failed_as_expected` so the spec can assert the
  *    CONTRAST, not just a crash).
  *
  * Output lines are `[fault] key=value`; the last line is the verdict.
  */
object FaultTolerance {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("reliable")
    val op = args.drop(1).headOption.getOrElse("cc")
    val size = args.drop(2).headOption.map(_.toInt)
      .getOrElse(if (op == "bpe") 20000 else 120000)
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ft-ck").toString

    val spark = graft.Tables.configure(SparkSession.builder())
      // 2 workers x 1 core x 1536m: two single-core executor PROCESSES —
      // small enough to run beside CI, real enough that killing one loses
      // its block store
      .master("local-cluster[2,1,1536]")
      .appName(s"graft-fault-$mode")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // executors are forked JVMs: they need the Java 17 module opens the
      // parent got from jrun.sh / sbt
      .config("spark.executor.extraJavaOptions",
        Seq("java.lang", "java.lang.invoke", "java.nio", "java.util",
          "java.util.concurrent", "sun.nio.ch")
          .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED").mkString(" "))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      // wait for both executors to register (driver counts as none here)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def executors: Seq[String] =
        spark.sparkContext.getExecutorMemoryStatus.keys.toSeq
          .filterNot(_.startsWith("fallback"))
      while (executors.size < 3 && System.nanoTime() < deadline)
        Thread.sleep(200) // 2 executors + driver entry
      println(s"[fault] executors=${executors.size - 1}")

      val appId = spark.sparkContext.applicationId

      /** True once at least one loop round is fully materialized AND a
        * successor round has started — i.e. the first round's lineage has
        * been truncated and its state is being READ. Killing any earlier
        * is survivable even in Local mode (a kill during the FIRST
        * materialization recomputes from the still-intact original
        * lineage — observed, not hypothetical), which would make the spec
        * flaky. Mode-aware because the two modes keep round state in
        * different places: Local = executor blocks, Reliable = files.
        */
      def roundStateLive(): Boolean = mode match {
        case "reliable" =>
          // two distinct rdd-N checkpoint dirs with data files on disk
          val root = java.nio.file.Paths.get(ckDir)
          val stream = java.nio.file.Files.walk(root)
          try {
            stream.iterator().asScala
              .filter(p => p.getFileName.toString.startsWith("part-"))
              .map(_.getParent.getFileName.toString).toSet.size >= 2
          } finally stream.close()
        case _ =>
          // one persisted RDD fully cached + a second one appearing
          val infos = spark.sparkContext.getRDDStorageInfo
          infos.exists(i => i.numCachedPartitions == i.numPartitions &&
            i.numCachedPartitions > 0) && infos.length >= 2
      }

      val killer = new Thread(() => {
        val kd = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (!roundStateLive() && System.nanoTime() < kd) Thread.sleep(100)
        println(s"[fault] round_state_live=${roundStateLive()}")
        // SIGKILL EVERY executor JVM of THIS app (matched by appId so a
        // concurrent Spark run is never hit) — unannounced process death,
        // the real failure mode a 1000-executor cluster sees. All of them,
        // not one: killing a single executor is survivable whenever the
        // victim happens to hold no live round blocks (observed — task
        // placement on a 2x1-core cluster can put a whole round on one
        // executor). The standalone Workers restart replacements within
        // seconds, so the cluster heals either way; what decides the
        // outcome is solely WHERE the round state lived.
        val killed =
          try scala.sys.process.Process(Seq("bash", "-c",
            s"pgrep -f 'CoarseGrainedExecutorBackend.*$appId' " +
              "| xargs -r -I{} sh -c 'kill -9 {}; echo {}' | paste -sd, -")).!!.trim
          catch { case e: Throwable => s"ERROR:${e.getMessage}" }
        println(s"[fault] killed_executor_pid=$killed")
      })
      killer.setDaemon(true)

      val ckMode = mode match {
        case "reliable" => CheckpointMode.Reliable(ckDir)
        case _          => CheckpointMode.Local
      }

      /** The operator body under fault; returns "output_ok"/"output_wrong". */
      def runOp(): String = op match {
        case "bpe" =>
          // deterministic Zipf-ish vocabulary (same generator family as
          // Profile's bpe fixture): enough words that learnMerges spans
          // many rounds on the tiny cluster
          def vocab() = spark.range(size.toLong).select(
            array_join(transform(
              sequence(lit(0), pmod(col("id"), lit(8)) + lit(4)),
              i => chr(pmod(xxhash64(col("id"), i), lit(26)) + lit(97))), "")
              .as("word"),
            (lit(size.toLong) / (col("id") + 1) + 1).cast("long").as("n"))
            .groupBy("word").agg(max("n").as("n"))
          val k = 24
          val faulted = Bpe.learnMerges(vocab(), k, mode = ckMode)
            .orderBy("step").collect().map(_.toSeq).toSeq
          // healed-cluster reference run (no fault): learnMerges is
          // deterministic, so equality proves the fault lost nothing
          val reference = Bpe.learnMerges(vocab(), k, mode = ckMode)
            .orderBy("step").collect().map(_.toSeq).toSeq
          println(s"[fault] n_merges=${faulted.size} ref=${reference.size}")
          if (faulted.nonEmpty && faulted == reference) "output_ok"
          else "output_wrong"
        case _ =>
          import spark.implicits._
          // one long chain: diameter `size` forces multiple contraction
          // rounds, so the kill lands MID-loop, not after convergence
          val pairs = spark.range(1, size.toLong)
            .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
          // driverFinishEdges = 0: the fault contract under test is the
          // DISTRIBUTED loop's round state — the driver union-find finish
          // would absorb a 120k-edge chain residual and dodge the kill
          val labels = Dedup.duplicateClusters(pairs, maxIter = 30, mode = ckMode,
            driverFinishEdges = 0L)
          val bad = labels.filter(col("root") =!= lit(1L)).count()
          val n = labels.count()
          println(s"[fault] n_labels=$n bad_roots=$bad")
          if (n == size.toLong && bad == 0) "output_ok" else "output_wrong"
      }

      killer.start()
      val result =
        try runOp()
        catch {
          case e: Throwable =>
            println(s"[fault] job_failed=${e.getClass.getSimpleName}: " +
              s"${String.valueOf(e.getMessage).take(200)}")
            "failed_as_expected"
        }
      killer.join(15000) // let the kill line flush before the verdict
      println(s"[fault] mode=$mode op=$op verdict=$result")
    } finally spark.stop()
  }
}
