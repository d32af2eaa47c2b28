package graft.ops

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (temporal) join — the classic operator Spark's join surface
  * lacks: for every left row, the latest right row with the same key and
  * `rightTs <= leftTs` (backward), the earliest with `rightTs >= leftTs`
  * (forward), or whichever of the two sits closer (nearest) — the full
  * pandas `merge_asof` direction surface.
  *
  * Implemented the scale-safe way: NOT as a theta-join (whose candidate
  * set is quadratic per key) but as a union + one partitioned
  * forward-fill window — tag both sides, sort each key's rows by
  * (ts, side) and carry the last seen right payload forward (backward
  * direction; forward mirrors with a following frame). One exchange on
  * the key, linear work, no join explosion; the same shape Flink's
  * temporal join and kdb's aj use.
  */
object AsOf {

  /** Both sides stacked into one frame: keys, `graft_ts`, `graft_side`
    * (1 = left), the left's payload columns (null on right rows), and
    * the right payload as ONE struct `graft_r` (null on left rows) so
    * ts + payload always come from the same matched row — independent
    * per-column fills could mix rows when payload itself holds nulls. */
  private def unionFrame(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      payload: Seq[String]): (DataFrame, Seq[String]) = {
    // the struct's timestamp slot uses a reserved name so a payload
    // column called "ts" (or anything user-side) can never collide with
    // it and make the graft_fill.<field> extraction ambiguous
    require(!payload.contains("graft_rts"),
      "payload column name graft_rts is reserved by asofJoin")
    val leftOnly =
      left.columns.toSeq.filterNot(keys.contains).filterNot(_ == leftTs)
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
    (l.unionByName(r), leftOnly)
  }

  /** Backward window: right rows sort BEFORE left rows at equal ts, so
    * a preceding frame anchored at the left row includes the equal-ts
    * right row — the match is inclusive, like ASOF JOIN's `>=`. */
  private def wBack(keys: Seq[String]) =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(col("graft_ts"), col("graft_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Forward window: left rows sort first at equal ts, so a following
    * frame anchored at the left row includes the equal-ts right row —
    * inclusive like ASOF's `<=`. */
  private def wFwd(keys: Seq[String]) =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(col("graft_ts"), col("graft_side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

  /** As-of join of `left` and `right` on `keys`: for direction
    * `"backward"` the latest right row with `right(rightTs) <=
    * left(leftTs)`, for `"forward"` the earliest with `rightTs >=
    * leftTs`. Left rows with no match keep nulls (left-outer
    * semantics). The matched right timestamp and `payload` columns come
    * back as `asof_<rightTs>` / `asof_<payload>`.
    *
    * Precondition for determinism: `right` has at most one row per
    * (keys, rightTs) — pre-aggregate otherwise (the declared queries
    * do).
    *
    * `tolerance` (pandas merge_asof's knob): a match further than this
    * many ts units away is discarded — the row keeps left-outer nulls.
    * Requires a numeric ts column (the declared queries use epoch ms).
    * Applied AFTER the fill as a map-side null-out, so the bounded
    * variant costs zero extra shuffles over the unbounded one. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    val (u, leftOnly) = unionFrame(left, right, keys, leftTs, rightTs, payload)
    val fill = direction match {
      case "backward" => last(col("graft_r"), ignoreNulls = true).over(wBack(keys))
      case "forward" => first(col("graft_r"), ignoreNulls = true).over(wFwd(keys))
      case other => throw new IllegalArgumentException(
        s"asofJoin direction must be backward|forward, got $other")
    }
    val filled = u.withColumn("graft_fill", fill)
    val bounded = tolerance match {
      case None => filled
      case Some(t) =>
        val gap =
          if (direction == "backward")
            col("graft_ts") - col("graft_fill.graft_rts")
          else col("graft_fill.graft_rts") - col("graft_ts")
        // when() without otherwise = null fill — left-outer semantics
        filled.withColumn("graft_fill",
          when(gap <= t, col("graft_fill")))
    }
    bounded.filter(col("graft_side") === 1)
      .select(outCols(keys, leftTs, leftOnly, rightTs, payload, "graft_fill"): _*)
  }

  /** Nearest-direction as-of join: whichever of the backward and forward
    * matches sits closer in time wins; exact ties go BACKWARD (the
    * deterministic rule — documented, and what a point-in-time-correct
    * feature lookup wants, since the backward row was observable).
    * Both fills ride the SAME key exchange: two windows over one
    * partitioning, differing only in sort direction — one shuffle,
    * two sorts, still linear and join-free. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val (u, leftOnly) = unionFrame(left, right, keys, leftTs, rightTs, payload)
    val picked = u
      .withColumn("graft_b", last(col("graft_r"), ignoreNulls = true).over(wBack(keys)))
      .withColumn("graft_f", first(col("graft_r"), ignoreNulls = true).over(wFwd(keys)))
      .withColumn("graft_fill",
        when(col("graft_b").isNull, col("graft_f"))
          .when(col("graft_f").isNull, col("graft_b"))
          .when(col("graft_ts") - col("graft_b.graft_rts") <=
            col("graft_f.graft_rts") - col("graft_ts"), col("graft_b"))
          .otherwise(col("graft_f")))
    picked.filter(col("graft_side") === 1)
      .select(outCols(keys, leftTs, leftOnly, rightTs, payload, "graft_fill"): _*)
  }

  private def outCols(keys: Seq[String], leftTs: String,
      leftOnly: Seq[String], rightTs: String, payload: Seq[String],
      fill: String): Seq[Column] =
    keys.map(col) ++
      (col("graft_ts").as(leftTs) +: leftOnly.map(col)) ++
      (col(s"$fill.graft_rts").as(s"asof_$rightTs") +:
        payload.map(p => col(s"$fill.$p").as(s"asof_$p")))

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

  /** The forward direction: each click joined to the user's NEXT
    * purchase at or after it — time-to-conversion semantics (`wait_ms`
    * is the conversion lag; null means the click never converted). */
  val qJoinAsofForward = Q(
    "q_join_asof_forward",
    (s, d) => {
      val ev = T.events(s, d).withColumn("ms", unix_millis(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ms")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ms").agg(max(col("value")).as("pv"))
      asofJoin(clicks, purchases, Seq("user_id"), "ms", "ms", Seq("pv"),
        direction = "forward")
        .select(col("event_id"), col("user_id"), col("ms"),
          col("asof_ms").as("next_ms"), col("asof_pv").as("next_value"),
          (col("asof_ms") - col("ms")).as("wait_ms"))
        .orderBy("event_id")
    },
    Some("""WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS ms
                     FROM events WHERE event_type = 'click'),
                r AS (SELECT user_id, epoch_ms(ts) AS ms, max(value) AS pv
                     FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
           SELECT l.event_id, l.user_id, l.ms,
                  r.ms AS next_ms, r.pv AS next_value,
                  r.ms - l.ms AS wait_ms
           FROM l ASOF LEFT JOIN r
             ON l.user_id = r.user_id AND l.ms <= r.ms
           ORDER BY l.event_id"""))

  /** The nearest direction: each click joined to the user's CLOSEST
    * purchase in time, ties backward — the attribution spelling when
    * causality direction is unknown. The oracle composes DuckDB's two
    * ASOF directions with the same tie rule. */
  val qJoinAsofNearest = Q(
    "q_join_asof_nearest",
    (s, d) => {
      val ev = T.events(s, d).withColumn("ms", unix_millis(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ms")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ms").agg(max(col("value")).as("pv"))
      asofNearest(clicks, purchases, Seq("user_id"), "ms", "ms", Seq("pv"))
        .select(col("event_id"), col("user_id"), col("ms"),
          col("asof_ms").as("near_ms"), col("asof_pv").as("near_value"))
        .orderBy("event_id")
    },
    Some("""WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS ms
                     FROM events WHERE event_type = 'click'),
                r AS (SELECT user_id, epoch_ms(ts) AS ms, max(value) AS pv
                     FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
                b AS (SELECT l.event_id, l.user_id, l.ms,
                        r.ms AS bms, r.pv AS bpv
                      FROM l ASOF LEFT JOIN r
                        ON l.user_id = r.user_id AND l.ms >= r.ms),
                f AS (SELECT l.event_id, r.ms AS fms, r.pv AS fpv
                      FROM l ASOF LEFT JOIN r
                        ON l.user_id = r.user_id AND l.ms <= r.ms)
           SELECT b.event_id, b.user_id, b.ms,
                  CASE WHEN bms IS NULL THEN fms
                       WHEN fms IS NULL THEN bms
                       WHEN b.ms - bms <= fms - b.ms THEN bms
                       ELSE fms END AS near_ms,
                  CASE WHEN bms IS NULL THEN fpv
                       WHEN fms IS NULL THEN bpv
                       WHEN b.ms - bms <= fms - b.ms THEN bpv
                       ELSE fpv END AS near_value
           FROM b JOIN f USING (event_id)
           ORDER BY b.event_id"""))

  /** Matching window for [[qJoinAsofTolerance]]: 5 minutes in ms —
    * beyond it, a "most recent purchase" is stale attribution noise. */
  val AsofToleranceMs = 300000L

  /** The backward as-of bounded by a tolerance — pandas merge_asof's
    * `tolerance` knob: a prior purchase more than 5 minutes old does
    * NOT attribute; the click keeps left-outer nulls. Same one-exchange
    * fill as q_join_asof plus a map-side gap null-out — the bound costs
    * nothing at any scale. Both bounded and unbounded spellings share
    * the events scan shape, and rows null under the bound are exactly
    * the unbounded matches with gap > tolerance (CONSISTENCY pinned in
    * AsOfSpec). */
  val qJoinAsofTolerance = Q(
    "q_join_asof_tolerance",
    (s, d) => {
      val ev = T.events(s, d).withColumn("ms", unix_millis(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ms")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ms").agg(max(col("value")).as("pv"))
      asofJoin(clicks, purchases, Seq("user_id"), "ms", "ms", Seq("pv"),
        tolerance = Some(AsofToleranceMs))
        .select(col("event_id"), col("user_id"), col("ms"),
          col("asof_ms").as("prior_ms"), col("asof_pv").as("prior_value"))
        .orderBy("event_id")
    },
    Some(s"""WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS ms
                     FROM events WHERE event_type = 'click'),
                r AS (SELECT user_id, epoch_ms(ts) AS ms, max(value) AS pv
                     FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
           SELECT l.event_id, l.user_id, l.ms,
                  CASE WHEN l.ms - r.ms <= $AsofToleranceMs
                       THEN r.ms END AS prior_ms,
                  CASE WHEN l.ms - r.ms <= $AsofToleranceMs
                       THEN r.pv END AS prior_value
           FROM l ASOF LEFT JOIN r
             ON l.user_id = r.user_id AND l.ms >= r.ms
           ORDER BY l.event_id"""))

  val all: Seq[Q] =
    Seq(qJoinAsof, qJoinAsofForward, qJoinAsofNearest, qJoinAsofTolerance)
}
