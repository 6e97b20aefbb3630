package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.WholeStageCodegenExec

/** Untimed codegen pre-generation for Bench repeat rows (r16 verdict #7).
  *
  * Plans the DataFrame WITHOUT executing it and force-compiles every
  * WholeStageCodegen subtree through the same Janino path execution would
  * take. Spark's CodeGenerator compile cache is keyed on source text, so
  * the timed run's identical stages hit the warm cache, and the Janino +
  * initial-JIT load lands before the measurement clock starts instead of
  * inside a 1-in-N steady row (the r16 "JIT storm" class: jit_ms 73-80 s
  * absorbed by one repeat observation).
  *
  * AQE caveat, by design: runtime re-planned stages can emit different
  * code than the initial plan and will still compile lazily at execution;
  * this prewarm removes the deterministic majority of compilation, it
  * does not promise zero. Failures are swallowed by the caller — a query
  * whose plan resists prewarm (e.g. commands, streaming shapes) simply
  * runs as before. */
object CodegenPrewarm {
  def prewarm(df: DataFrame): Unit = {
    df.queryExecution.executedPlan.foreach {
      case w: WholeStageCodegenExec =>
        try {
          val (_, code) = w.doCodeGen()
          CodeGenerator.compile(code)
        } catch { case _: Throwable => () }
      case _ => ()
    }
  }
}
