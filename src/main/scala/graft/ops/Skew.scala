package graft.ops

import graft.{Q, Tables => T}
import graft.util.Det.{dsum, sqlDsum}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SCALE.md "Joins" hazards).
  *
  * AQE's skew-join splitting handles most skew at runtime; explicit
  * salting is the tool for the pathological case it can't touch — a
  * single key so hot that even a split partition's build side won't fit.
  * The classic recipe: explode the SMALL side `factor` times (one copy
  * per salt value), salt the big side's key with a deterministic
  * per-row value in [0, factor), and equi-join on (key, salt). Each hot
  * key's rows then spread over `factor` shuffle partitions instead
  * of one.
  */
object Skew {

  /** Inner equi-join of `big` and `small` on `key`, salted `factor`
    * ways. Row-for-row identical to `big.join(small, key)` — including
    * duplicate keys on either side — because each big-side row meets
    * exactly the one small-side copy carrying its salt. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // The salt must be DETERMINISTIC in row content: it becomes a shuffle
    // key, and a nondeterministic one (e.g. monotonically_increasing_id)
    // can re-salt rows differently when a map task is recomputed after a
    // fetch failure — the classic duplicated/lost-row hazard. Hashing all
    // columns spreads a hot key as long as its rows differ anywhere;
    // fully identical rows share a salt, which costs spread, not
    // correctness.
    val salted = big.withColumn(
      "graft_salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(factor.toLong)))
    val replicated = small.withColumn(
      "graft_salt", explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    salted
      .join(replicated, Seq(key, "graft_salt"))
      .drop("graft_salt")
  }

  /** Top-`n` hottest values of `key` with their counts — the stats pass
    * that decides whether salting is worth a factor > 1. */
  def hotKeys(df: DataFrame, key: String, n: Int = 10): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(key)).limit(n)

  /** Convenience: salt only when the hottest key exceeds `threshold`
    * rows (stats-driven, mirrors what a planner rule would do). */
  def saltedJoinIfSkewed(big: DataFrame, small: DataFrame, key: String,
      factor: Int, threshold: Long): DataFrame = {
    val hottest = hotKeys(big, key, 1).collect()
    if (hottest.nonEmpty && hottest(0).getLong(1) > threshold)
      saltedJoin(big, small, key, factor)
    else big.join(small, Seq(key))
  }

  /** The salted join as a gate-checked operator: lineitem ⋈ supplier on
    * suppkey, salted 8 ways, revenue per nation. The ORACLE IS THE PLAIN
    * JOIN — salting must be invisible in the result, and the driver's
    * hash gate proves it (the property the scalatest row-identity check
    * asserts, re-proven end-to-end through DuckDB). */
  val qJoinSkewSalted = Q(
    "q_join_skew_salted",
    (s, d) => {
      val li = T.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val sup = T.supplier(s, d)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      saltedJoin(li, sup, "l_suppkey", 8)
        .groupBy("s_nationkey")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
               .as("revenue"),
             count(lit(1)).as("n_rows"))
        .orderBy("s_nationkey")
    },
    Some(s"""SELECT s_nationkey,
            ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
            count(*) AS n_rows
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_nationkey ORDER BY s_nationkey"""))

  val all: Seq[Q] = Seq(qJoinSkewSalted)
}
