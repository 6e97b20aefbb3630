package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared by the query surface. */
object Num {

  /** Deterministic 2-decimal rounding for double aggregates, stable across
    * engines and summation orders.
    *
    * A plain `round(double, 2)` is fragile in differential testing: Spark
    * rounds via the double's shortest decimal representation while DuckDB
    * rounds the binary value, and two engines summing in different orders
    * land on different doubles around exact .xx5 boundaries. Casting to
    * DECIMAL(28,6) first absorbs the ±1e-9 summation noise (both engines
    * agree on the 6-decimal value), and rounding 6→2 is then exact decimal
    * arithmetic with the same half-away-from-zero rule in both. The final
    * cast back to double is exact and identical on both sides.
    *
    * The DuckDB oracle spelling of the same operation is
    * `CAST(round(CAST(x AS DECIMAL(28,6)), 2) AS DOUBLE)` — see
    * [[oracleRound2]].
    */
  def round2(c: Column): Column =
    round(c.cast("decimal(28,6)"), 2).cast("double")

  /** The oracle-SQL spelling of [[round2]] for embedding in query strings. */
  def oracleRound2(expr: String): String =
    s"CAST(round(CAST($expr AS DECIMAL(28,6)), 2) AS DOUBLE)"
}
