package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A/B probe for the columnar surrogate-id claim (r13's `q_scan_csv`
  * trade): [[graft.operators.ZipIndex.withRowIndex]] was priced as "real
  * money on a wide 100 TB ingest" versus the classic `rdd.zipWithIndex`
  * round-trip, but the bench fixture is an 8-row CSV where the columnar
  * path's counts-job + broadcast join can never amortize. This probe runs
  * the claimed case — a WIDE CSV (50+ columns) at sf0.1-scale row counts —
  * through both implementations with an identical full-width consumer
  * (hash of every column, aggregated), and reports min-of-N wall times
  * plus a plan check (the columnar path must show no `Scan ExistingRDD`;
  * the rdd path necessarily does).
  *
  * Usage: runMain graft.tools.ZipProbe [rows] [cols] [reps]
  */
object ZipProbe {

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(150000)
    val cols = args.drop(1).headOption.map(_.toInt).getOrElse(60)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixture: a real on-disk CSV — the ingest under test reads FILES (an
    // in-memory range would dodge the scan whose columnar execution is the
    // thing the columnar path preserves)
    val dir = java.nio.file.Files.createTempDirectory("graft-zipprobe").toString
    spark.range(rows.toLong).select(
      (col("id").as("id0") +: (1 until cols).map(i =>
        concat(lit(s"v${i}_"),
          pmod(xxhash64(col("id"), lit(i)), lit(100000L)).cast("string"))
          .as(s"c$i"))): _*)
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(
      StructField("id0", LongType) +:
        (1 until cols).map(i => StructField(s"c$i", StringType)))
    def readCsv(): DataFrame =
      spark.read.schema(schema).option("header", "true").csv(dir)

    // identical full-width consumer: hashing EVERY column (surrogate id
    // included) both exercises the wide post-id projection and doubles as
    // an equivalence check — the two variants must produce the same sum,
    // so they assigned the same id to the same row
    def consume(df: DataFrame): Long =
      df.select(pmod(xxhash64(df.columns.map(col): _*), lit(1000000007L)).as("h"))
        .agg(sum("h")).collect()(0).getLong(0) // mod keeps the ANSI sum from overflowing

    def columnar(): DataFrame =
      graft.operators.ZipIndex.withRowIndex(readCsv(), "rid")
    def rddTrip(): DataFrame = {
      val df = readCsv()
      val out = df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
      spark.createDataFrame(out, StructType(df.schema.fields :+ StructField("rid", LongType)))
    }

    def time(mk: () => DataFrame): (Double, Long) = {
      var best = Double.MaxValue
      var v = 0L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        v = consume(mk())
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, v)
    }

    consume(readCsv()) // scan/codegen warmup outside both timings
    val planCol = columnar().queryExecution.executedPlan.toString
    require(!planCol.contains("Scan ExistingRDD"),
      "columnar path fell off the DataFrame engine")
    val planRdd = rddTrip().queryExecution.executedPlan.toString
    require(planRdd.contains("Scan ExistingRDD"),
      "rdd path unexpectedly stayed columnar — probe is not measuring the contrast")
    val (tCol, vCol) = time(columnar _)
    val (tRdd, vRdd) = time(rddTrip _)
    require(vCol == vRdd, s"A/B outputs differ: $vCol vs $vRdd")
    println(
      s"""{"metric":"zip_index_ab","rows":$rows,"cols":$cols,"reps":$reps,""" +
        s""""columnar_min_s":${math.round(tCol * 1000) / 1000.0},""" +
        s""""rdd_zip_min_s":${math.round(tRdd * 1000) / 1000.0},""" +
        s""""speedup":${math.round(tRdd / tCol * 100) / 100.0},""" +
        s""""outputs_equal":true}""")
    spark.stop()
  }
}
