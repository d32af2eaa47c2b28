package graft.ops

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (temporal) join — the classic operator Spark's join surface
  * lacks: for every left row, the latest right row with the same key and
  * `rightTs <= leftTs`.
  *
  * Implemented the scale-safe way: NOT as a theta-join (whose candidate
  * set is quadratic per key) but as a union + one partitioned
  * forward-fill window — tag both sides, sort each key's rows by
  * (ts, side) and carry the last seen right payload forward. One
  * exchange on the key, linear work, no join explosion; the same shape
  * Flink's temporal join and kdb's aj use.
  */
object AsOf {

  /** As-of join of `left` and `right` on `keys`, matching the latest
    * right row with `right(rightTs) <= left(leftTs)`. Left rows with no
    * prior right row keep nulls (left-outer semantics). The matched
    * right timestamp and `payload` columns come back as
    * `asof_<rightTs>` / `asof_<payload>`.
    *
    * Precondition for determinism: `right` has at most one row per
    * (keys, rightTs) — pre-aggregate otherwise (the declared query
    * does).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    // the struct's timestamp slot uses a reserved name so a payload
    // column called "ts" (or anything user-side) can never collide with
    // it and make the graft_fill.<field> extraction ambiguous
    require(!payload.contains("graft_rts"),
      "payload column name graft_rts is reserved by asofJoin")
    val leftOnly = left.columns.toSeq.filterNot(keys.contains).filterNot(_ == leftTs)
    // the carried right payload travels as ONE struct so ts + payload
    // always come from the same matched row (independent per-column
    // fills could mix rows when payload itself holds nulls)
    val rStructType = StructType(
      StructField("graft_rts", right.schema(rightTs).dataType) +:
        payload.map(p => right.schema(p)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("graft_ts"), lit(1).as("graft_side")) ++
        leftOnly.map(col) :+
        lit(null).cast(rStructType).as("graft_r"): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("graft_ts"), lit(0).as("graft_side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTs).as("graft_rts") +: payload.map(col): _*)
          .as("graft_r"): _*)
    // right rows sort before left rows at equal ts -> the match is
    // inclusive (rightTs == leftTs matches), like ASOF JOIN's >=
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("graft_ts"), col("graft_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols: Seq[Column] =
      keys.map(col) ++
        (col("graft_ts").as(leftTs) +: leftOnly.map(col)) ++
        (col("graft_fill.graft_rts").as(s"asof_$rightTs") +:
          payload.map(p => col(s"graft_fill.$p").as(s"asof_$p")))
    l.unionByName(r)
      .withColumn("graft_fill", last(col("graft_r"), ignoreNulls = true).over(w))
      .filter(col("graft_side") === 1)
      .select(outCols: _*)
  }

  /** Each click joined to the user's most recent purchase at or before
    * it — the canonical as-of query over the events stream. The purchase
    * side pre-aggregates to one row per (user, ms) so ties are
    * deterministic in both engines. */
  val qJoinAsof = Q(
    "q_join_asof",
    (s, d) => {
      val ev = T.events(s, d).withColumn("ms", unix_millis(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ms")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ms").agg(max(col("value")).as("pv"))
      asofJoin(clicks, purchases, Seq("user_id"), "ms", "ms", Seq("pv"))
        .select(col("event_id"), col("user_id"), col("ms"),
          col("asof_ms").as("prior_ms"), col("asof_pv").as("prior_value"))
        .orderBy("event_id")
    },
    Some("""WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS ms
                     FROM events WHERE event_type = 'click'),
                r AS (SELECT user_id, epoch_ms(ts) AS ms, max(value) AS pv
                     FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
           SELECT l.event_id, l.user_id, l.ms,
                  r.ms AS prior_ms, r.pv AS prior_value
           FROM l ASOF LEFT JOIN r
             ON l.user_id = r.user_id AND l.ms >= r.ms
           ORDER BY l.event_id"""))

  val all: Seq[Q] = Seq(qJoinAsof)
}
