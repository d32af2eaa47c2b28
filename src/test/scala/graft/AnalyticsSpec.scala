package graft.ops

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** Event-analytics semantics on hand-built event logs (funnel ordering,
  * cohort offsets) plus an equivalence check of the bin-bucketed
  * interval join against the naive range predicate on real data.
  */
class AnalyticsSpec extends SparkSpec {

  private val tmp =
    java.nio.file.Files.createTempDirectory("analytics").toString

  /** Write an events.parquet in the sfDir layout: ts is nano-epoch long,
    * exactly like the driver's testdata (Tables.events truncates to µs). */
  private def events(rows: (Long, String, Long)*): Unit = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex
      .map { case ((u, et, tsSec), i) => (i.toLong, tsSec * 1000000000L, u, et) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
  }

  test("funnel requires strictly increasing stage times per user") {
    events(
      // user 1: full ordered funnel
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: click BEFORE first view — stops at stage 1
      (2L, "click", 100L), (2L, "view", 200L), (2L, "purchase", 300L),
      // user 3: view+click ordered, purchase before click — stops at 2
      (3L, "view", 100L), (3L, "purchase", 150L), (3L, "click", 200L),
      // user 4: never views — counts nowhere
      (4L, "click", 100L), (4L, "purchase", 200L))
    val got = Analytics.qEventsFunnel.fn(spark, tmp).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // stage 1 = {1,2,3} (any view); stage 2 = {1,3} (click after first
    // view); stage 3 = {1} (purchase after first qualifying click).
    assert(got === Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("OHLC bars replay the per-day event order and bracket extremes") {
    val bars = Analytics.qEventsOhlc.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))))
      .toMap
    val events = graft.Tables.events(spark, sf)
      .select(col("user_id"),
        unix_millis(date_trunc("day", col("ts"))).as("day_ms"),
        unix_millis(col("ts")).as("ms"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    def r2(x: Double): Double = math.floor(x * 100.0 + 0.5) / 100.0
    val expected = events.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      val sorted = es.sortBy(e => (e._3, e._4))
      k -> ((es.length.toLong, r2(sorted.head._5), r2(es.map(_._5).max),
        r2(es.map(_._5).min), r2(sorted.last._5)))
    }
    assert(bars === expected && bars.nonEmpty)
    bars.values.foreach { case (_, o, h, l, c) =>
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("cohort retention offsets are whole weeks from the first-seen week") {
    val day = 86400L
    events(
      // user 1 first seen week 0 (Mon 1970-01-05 epoch-week), active wk0+wk2
      (1L, "view", 4 * day), (1L, "view", 4 * day + 14 * day),
      // user 2 first seen same week, active that week only
      (2L, "view", 5 * day))
    val got = Analytics.qEventsCohort.fn(spark, tmp).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSet === Set((0, 2L), (2, 1L)))
  }

  test("binned interval join equals the naive range predicate") {
    val naive = {
      val w0 = to_date(lit("1994-01-01"))
      val wins = spark.range(24).select(
        col("id").as("w_id"),
        date_add(w0, (col("id") * 30).cast("int")).as("ws"),
        date_add(w0, (col("id") * 30 + 44).cast("int")).as("we"))
      graft.Tables.lineitem(spark, sf)
        .select(to_date(col("l_shipdate")).as("sd"))
        .join(wins, col("sd").between(col("ws"), col("we")))
        .groupBy("w_id").agg(count(lit(1)).as("n_items"))
        .orderBy("w_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    }
    val binned = Analytics.qJoinIntervalBinned.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(binned === naive && binned.nonEmpty)
  }

  test("anomaly census replays in plain Scala: 3-sigma verdicts + worst offender") {
    val rows = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (t, es) =>
      val n = es.length
      // the exact op sequence of Det.dsumRaw / the engine's moments
      val s1 = es.map(e => math.floor(e._3 * 1e6 + 0.5).toLong).sum
      val s2 = es.map(e => math.floor(e._3 * e._3 * 1e6 + 0.5).toLong).sum
      val mean = s1.toDouble / 1e6 / n
      val vr = s2.toDouble / 1e6 / n - mean * mean
      val dev2 = es.map(e => (e._2, (e._3 - mean) * (e._3 - mean)))
      val top = dev2.minBy(p => (-p._2, p._1))
      // outliers gated on POSITIVE variance (ADVICE r9) — a degenerate
      // group can never count fp-cancellation dust as outliers
      t -> ((n.toLong,
        (if (vr > 0) dev2.count(_._2 > 9 * vr) else 0).toLong, top._1))
    }
    val got = Analytics.qEventsAnomaly.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got === expected && got.nonEmpty)
  }

  test("anomaly scan: constant/singleton groups give sd 0, null z, no NaN") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("const", 1L, 5.0), ("const", 2L, 5.0), ("const", 3L, 5.0),
      // near-constant group with sub-quantum perturbations (±4e-7 is
      // below dsumRaw's 1e-6 grid): the quantized moments give var_v = 0
      // exactly while every raw dev2 > 0 — the ADVICE-r9 regime where
      // the old clamp-only gate counted all three rows as outliers
      ("cancel", 8L, 1000.0), ("cancel", 9L, 1000.0 + 4e-7),
      ("cancel", 10L, 1000.0 - 4e-7),
      ("single", 4L, 7.25),
      ("mixed", 5L, 1.0), ("mixed", 6L, 2.0), ("mixed", 7L, 30.0))
      .toDF("g", "id", "v")
    val got = Analytics.anomalyScan(df, "g", "id", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // (g, n, mean_v, sd_v, n_outliers, top_id, top_z)
    val const = got("const")
    assert(const.getDouble(2) == 5.0 && const.getDouble(3) == 0.0)
    assert(const.getLong(4) == 0L && const.isNullAt(6))
    val cancel = got("cancel")
    assert(cancel.getDouble(3) == 0.0 && cancel.getLong(4) == 0L &&
      cancel.isNullAt(6))
    val single = got("single")
    assert(single.getDouble(3) == 0.0 && single.getLong(4) == 0L &&
      single.isNullAt(6))
    val mixed = got("mixed")
    assert(!mixed.isNullAt(6) && !mixed.getDouble(6).isNaN &&
      mixed.getDouble(3) > 0.0)
  }

  test("binned interval-overlap join equals the naive overlap predicate") {
    val W = 21600000L
    val ms = unix_millis(col("ts"))
    val ui = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"),
        unix_millis(date_trunc("day", col("ts"))).as("day_ms"))
      .agg(min(ms).as("a_start"), max(ms).as("a_end"))
    val wins = ui.select("day_ms").distinct()
      .select(col("day_ms"), explode(typedLit(Seq(0L, 1L, 2L, 3L))).as("k"))
      .select((col("day_ms") + col("k") * W).as("w_start"),
        (col("day_ms") + col("k") * W + 5400000L).as("w_end"))
    val naive = wins
      .join(ui, col("a_start") <= col("w_end") && col("w_start") <= col("a_end"))
      .groupBy("w_start", "w_end")
      .agg(countDistinct(col("user_id")).as("n_users"),
        min("user_id").as("min_user"), max("user_id").as("max_user"))
      .orderBy("w_start").collect().map(_.toSeq).toSeq
    val binned = Analytics.qJoinIntervalOverlap.fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(binned === naive && binned.nonEmpty)
  }

  test("active users: rolling distinct replays in plain Scala") {
    val act = graft.Tables.events(spark, sf)
      .select((unix_millis(date_trunc("day", col("ts"))) / 86400000L)
        .cast("long").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = act.map(_._1).distinct.sorted
    val expected = days.map { d =>
      def active(w: Long) =
        act.filter(a => a._1 <= d && d - a._1 < w).map(_._2).distinct.length.toLong
      d -> ((active(1), active(7), active(28)))
    }.toMap
    val got = Analytics.qEventsActiveUsers.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected && got.nonEmpty)
    // envelope: dau <= wau <= mau on every day
    got.values.foreach { case (d, w, m) => assert(d <= w && w <= m) }
  }

  test("seasonal-naive backtest replays in plain Scala") {
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"),
        (unix_millis(date_trunc("day", col("ts"))) / 86400000L)
          .cast("long").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, ds) =>
      val seq = ds.sortBy(_._2).map(_._3)
      val scored = seq.drop(7).zip(seq.dropRight(7))
      val err = scored.map { case (a, p) => math.abs(a - p) }.sum
      val tot = scored.map(_._1).sum
      t -> ((scored.length.toLong, tot, err,
        (2000000L * err + tot) / (2 * tot)))
    }
    val got = Analytics.qEventsForecastNaive.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected && got.nonEmpty)
  }
}
