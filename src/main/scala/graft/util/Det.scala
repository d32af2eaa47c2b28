package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for oracle hash-matching (SURVEY.md §5.2).
  *
  * Two hazards make naive float output nondeterministic across engines:
  *
  *  1. Summation order. Spark sums doubles in partition/task order; DuckDB
  *     in its own order. Fix: cast to exact DECIMAL(38,6) before summing
  *     (inputs carry <= 4 meaningful decimals), sum exactly, then come back
  *     to double.
  *  2. round(double, 2) itself. Spark routes doubles through
  *     BigDecimal(HALF_UP on the shortest decimal repr); DuckDB rounds
  *     half-away on a scaled value. Ties land on different sides.
  *     Fix: never use either engine's round for the final output — use
  *     floor(x*100 + 0.5)/100, which is the exact same IEEE-754 op
  *     sequence in both engines, so results are bit-identical by
  *     construction.
  *
  * DuckDB mirror of dsum(x):
  *   floor(CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) * 100 + 0.5) / 100
  * (see sqlDsum/sqlDavg/sqlR2 below — keep both dialect spellings here).
  */
object Det {
  val D: DecimalType = DecimalType(38, 6)

  /** Deterministic 2dp round: identical IEEE-754 ops in Spark and DuckDB.
    * (Note: rounds halves toward +inf for negatives too — fine, since the
    * oracle uses the same formula.) */
  def r2(c: Column): Column = floor(c * lit(100.0) + lit(0.5)) / lit(100.0)

  /** Order-independent exact sum of a double expression, rounded to 2dp. */
  def dsum(c: Column): Column = r2(sum(c.cast(D)).cast("double"))

  /** Order-independent mean: exact decimal sum -> double, / count, 2dp. */
  def davg(c: Column): Column =
    r2(sum(c.cast(D)).cast("double") / count(lit(1)))

  /** Windowed variant of dsum. */
  def dsumOver(c: Column, w: WindowSpec): Column =
    r2(sum(c.cast(D)).over(w).cast("double"))

  /** Windowed moving average: exact sum over frame / count over frame. */
  def davgOver(c: Column, w: WindowSpec): Column =
    r2(sum(c.cast(D)).over(w).cast("double") / count(lit(1)).over(w))

  // SQL-side fragment builders for the DuckDB oracle strings — the same
  // determinism rules spelled in DuckDB's dialect.
  def sqlR2(x: String): String = s"floor(($x) * 100 + 0.5) / 100"
  def sqlDsum(x: String): String =
    sqlR2(s"CAST(sum(CAST($x AS DECIMAL(38,6))) AS DOUBLE)")
  def sqlDavg(x: String): String =
    sqlR2(s"CAST(sum(CAST($x AS DECIMAL(38,6))) AS DOUBLE) / count(*)")
}
