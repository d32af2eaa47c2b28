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
  *     in its own order. Fix: round each value to the 6-dp grid as a
  *     scaled BIGINT — `floor(x*1e6 + 0.5)`, the identical IEEE-754 op
  *     sequence in both engines — and sum that exactly as DECIMAL(18,0).
  *     An exact integer sum is independent of partitioning: any order,
  *     any cluster size. (Inputs carry <= 4 meaningful decimals and
  *     < ~1e12 magnitude, so the scaled value is the intended integer.)
  *     The long->decimal conversion just wraps the long — no per-row
  *     BigDecimal, unlike a double->decimal cast — and Spark's decimal
  *     sum fast-paths Long-backed adds, widening exactly on overflow
  *     (result type DECIMAL(28,0)), so it stays correct at any scale.
  *  2. round(double, 2) itself. Spark routes doubles through
  *     BigDecimal(HALF_UP on the shortest decimal repr); DuckDB rounds
  *     half-away on a scaled value. Ties land on different sides.
  *     Fix: never use either engine's round for the final output — use
  *     floor(x*100 + 0.5)/100, which is the exact same IEEE-754 op
  *     sequence in both engines, so results are bit-identical by
  *     construction.
  *
  * DuckDB mirror of dsum(x) (keep both dialect spellings in lockstep):
  *   floor(CAST(sum(CAST(CAST(floor(x*1e6 + 0.5) AS BIGINT)
  *                       AS DECIMAL(18,0))) AS DOUBLE) / 1e6 * 100 + 0.5)
  *   / 100
  */
object Det {
  /** Exact-sum element type for ad-hoc decimal sums (Long-backed). */
  val D: DecimalType = DecimalType(18, 6)

  private val S: DecimalType = DecimalType(18, 0)

  /** Deterministic 2dp round: identical IEEE-754 ops in Spark and DuckDB.
    * (Note: rounds halves toward +inf for negatives too — fine, since the
    * oracle uses the same formula.) */
  def r2(c: Column): Column = floor(c * lit(100.0) + lit(0.5)) / lit(100.0)

  /** Exact order-independent sum of x*1e6 as a Long-backed decimal. */
  private def scaledSum(c: Column): Column =
    sum(floor(c * lit(1e6) + lit(0.5)).cast("long").cast(S))

  /** Scaled sum exposed as a DOUBLE of the original unit — the building
    * block for deterministic higher moments (variance, correlation):
    * every moment derived from these sums via the SAME IEEE-754 op
    * sequence in both dialects is bit-identical by construction. */
  def dsumRaw(c: Column): Column = scaledSum(c).cast("double") / lit(1e6)

  /** Order-independent exact sum of a double expression, rounded to 2dp. */
  def dsum(c: Column): Column =
    r2(scaledSum(c).cast("double") / lit(1e6))

  /** Order-independent mean: exact scaled sum -> double, / count, 2dp. */
  def davg(c: Column): Column =
    r2(scaledSum(c).cast("double") / lit(1e6) / count(lit(1)))

  /** Windowed variant of dsum. */
  def dsumOver(c: Column, w: WindowSpec): Column =
    r2(scaledSum(c).over(w).cast("double") / lit(1e6))

  /** Windowed moving average: exact sum over frame / count over frame. */
  def davgOver(c: Column, w: WindowSpec): Column =
    r2(scaledSum(c).over(w).cast("double") / lit(1e6) / count(lit(1)).over(w))

  // SQL-side fragment builders for the DuckDB oracle strings — the same
  // determinism rules spelled in DuckDB's dialect.
  def sqlR2(x: String): String = s"floor(($x) * 100 + 0.5) / 100"
  def sqlScaledSum(x: String): String =
    s"sum(CAST(CAST(floor(($x) * 1e6 + 0.5) AS BIGINT) AS DECIMAL(18,0)))"
  def sqlDsum(x: String): String =
    sqlR2(s"CAST(${sqlScaledSum(x)} AS DOUBLE) / 1e6")
  def sqlDsumRaw(x: String): String =
    s"(CAST(${sqlScaledSum(x)} AS DOUBLE) / 1e6)"
  def sqlDavg(x: String): String =
    sqlR2(s"CAST(${sqlScaledSum(x)} AS DOUBLE) / 1e6 / count(*)")
}
