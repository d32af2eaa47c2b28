package graft

import graft.stream.Pipelines

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming semantics via MemoryStream (SURVEY.md §5.2.4):
  * watermark late-drop, session windows, custom state, streaming dedup.
  * No broker in CI — the Kafka wiring in stream.Sources is option-level
  * and exercised on a cluster, not here.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runToCompletion(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
  }

  test("tumbling windows drop events later than the watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val events = in.toDF().toDF("ts", "event_type")
    val q = Pipelines.tumblingCounts(events, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("tumbling").outputMode("append")
      .start()
    // batch 1: two on-time events at 12:xx -> watermark then 12:30-10min
    in.addData((ts("2026-01-01 12:10:00"), "a"), (ts("2026-01-01 12:30:00"), "a"))
    q.processAllAvailable()
    // batch 2: a very late event (10:05, far behind wm) and a future one
    in.addData((ts("2026-01-01 10:05:00"), "late"), (ts("2026-01-01 15:00:00"), "b"))
    q.processAllAvailable()
    // batch 3: advance watermark past every open window so they finalize
    in.addData((ts("2026-01-01 20:00:00"), "flush"))
    runToCompletion(q)
    val rows = s.sql("SELECT win_start, event_type, n FROM tumbling").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("2026-01-01 12:00:00.0", "a", 2L)))
    assert(rows.contains(("2026-01-01 15:00:00.0", "b", 1L)))
    assert(!rows.exists(_._2 == "late"), s"late row must be dropped, got $rows")
  }

  test("session windows merge events within the gap, split beyond it") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val events = in.toDF().toDF("ts", "user_id")
    val q = Pipelines.sessionCounts(events, "30 minutes", "1 minute")
      .writeStream.format("memory").queryName("sessions").outputMode("append")
      .start()
    in.addData(
      (ts("2026-01-01 09:00:00"), 1L), (ts("2026-01-01 09:10:00"), 1L),
      (ts("2026-01-01 09:20:00"), 1L),
      (ts("2026-01-01 11:00:00"), 1L), // > 30 min gap: second session
      (ts("2026-01-01 09:05:00"), 2L))
    q.processAllAvailable()
    in.addData((ts("2026-01-01 23:00:00"), 99L)) // flush watermark
    runToCompletion(q)
    val rows = s.sql("SELECT user_id, n_events FROM sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.count(_._1 == 1L) === 2)
    assert(rows.filter(_._1 == 1L).map(_._2).sorted.toSeq === Seq(1L, 3L))
    assert(rows.filter(_._1 == 2L).map(_._2).toSeq === Seq(1L))
  }

  test("flatMapGroupsWithState sessionization matches session_window") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Pipelines.SessionInput]
    val q = Pipelines.sessionsWithState(in.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("fmgws").outputMode("append")
      .start()
    in.addData(
      Pipelines.SessionInput(1L, ts("2026-01-01 09:00:00")),
      Pipelines.SessionInput(1L, ts("2026-01-01 09:10:00")),
      Pipelines.SessionInput(1L, ts("2026-01-01 11:00:00")))
    q.processAllAvailable()
    in.addData(Pipelines.SessionInput(9L, ts("2026-01-01 23:00:00")))
    q.processAllAvailable()
    in.addData(Pipelines.SessionInput(9L, ts("2026-01-02 10:00:00")))
    runToCompletion(q)
    val rows = s.sql("SELECT user_id, n_events FROM fmgws WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Set((1L, 2L), (1L, 1L)),
      s"expected sessions {2 events, 1 event}, got $rows")
  }

  test("transformWithState sessionization matches flatMapGroupsWithState") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      // transformWithState is backed by the RocksDB state store
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val in = MemoryStream[Pipelines.SessionInput]
      val q = Pipelines.sessionsWithStateV2(in.toDS(), gapMs = 30L * 60 * 1000)
        .writeStream.format("memory").queryName("tws").outputMode("append")
        .start()
      // same scenario as the fMGWS test: two sessions for user 1, the
      // second batch's far-future events advance the watermark past them
      in.addData(
        Pipelines.SessionInput(1L, ts("2026-01-01 09:00:00")),
        Pipelines.SessionInput(1L, ts("2026-01-01 09:10:00")),
        Pipelines.SessionInput(1L, ts("2026-01-01 11:00:00")))
      q.processAllAvailable()
      in.addData(Pipelines.SessionInput(9L, ts("2026-01-01 23:00:00")))
      q.processAllAvailable()
      in.addData(Pipelines.SessionInput(9L, ts("2026-01-02 10:00:00")))
      runToCompletion(q)
      val rows = s.sql(
        "SELECT user_id, sess_start, sess_end, n_events FROM tws WHERE user_id = 1")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // identical sessions to the fMGWS path: (09:00-09:10, 2 events)
      // and (11:00-11:00, 1 event)
      assert(rows === Set(
        (1L, ts("2026-01-01 09:00:00").getTime,
          ts("2026-01-01 09:10:00").getTime, 2L),
        (1L, ts("2026-01-01 11:00:00").getTime,
          ts("2026-01-01 11:00:00").getTime, 1L)), rows.toString)
    } finally prev match {
      case Some(v) =>
        s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("out-of-order cross-batch event extends a session, never shrinks it") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Pipelines.SessionInput]
    val q = Pipelines.sessionsWithState(in.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("fmgws_ooo").outputMode("append")
      .start()
    // batch 1: open session [09:00, 09:10]
    in.addData(
      Pipelines.SessionInput(1L, ts("2026-01-01 09:00:00")),
      Pipelines.SessionInput(1L, ts("2026-01-01 09:10:00")))
    q.processAllAvailable()
    // batch 2: out-of-order events above the 2h watermark — one inside
    // the open span, one before its start. The merge must take
    // min(start)/max(end): end stays 09:10 (s.copy(end = t) would drag
    // it back to 08:55 and emit a shrunken session).
    in.addData(
      Pipelines.SessionInput(1L, ts("2026-01-01 09:05:00")),
      Pipelines.SessionInput(1L, ts("2026-01-01 08:55:00")))
    q.processAllAvailable()
    // flush: advance the watermark far past the session close
    in.addData(Pipelines.SessionInput(9L, ts("2026-01-01 23:00:00")))
    runToCompletion(q)
    val rows = s.sql(
        "SELECT sess_start, sess_end, n_events FROM fmgws_ooo WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set((
      ts("2026-01-01 08:55:00").getTime,
      ts("2026-01-01 09:10:00").getTime, 4L)), s"got $rows")
  }

  test("an event a full gap before the open session opens its OWN session") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Pipelines.SessionInput]
    val q = Pipelines.sessionsWithState(in.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("fmgws_early")
      .outputMode("append").start()
    // batch 1: open session [09:00, 09:10]
    in.addData(
      Pipelines.SessionInput(1L, ts("2026-01-01 09:00:00")),
      Pipelines.SessionInput(1L, ts("2026-01-01 09:10:00")))
    q.processAllAvailable()
    // batch 2: out-of-order event at 08:00 — above the 2h watermark so
    // it is NOT dropped, but more than the 30min gap before the open
    // session's start: folding it against the session END alone
    // (t - end <= gap, trivially true for early events) would swallow
    // it into one [08:00, 09:10] session; correct semantics are two.
    in.addData(Pipelines.SessionInput(1L, ts("2026-01-01 08:00:00")))
    q.processAllAvailable()
    in.addData(Pipelines.SessionInput(9L, ts("2026-01-01 23:00:00")))
    runToCompletion(q)
    val rows = s.sql(
        "SELECT sess_start, sess_end, n_events FROM fmgws_early WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set(
      (ts("2026-01-01 08:00:00").getTime,
       ts("2026-01-01 08:00:00").getTime, 1L),
      (ts("2026-01-01 09:00:00").getTime,
       ts("2026-01-01 09:10:00").getTime, 2L)), s"got $rows")
  }

  test("dropDuplicatesWithinWatermark emits each key once") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val events = in.toDF().toDF("ts", "event_id")
    val q = Pipelines.dedupKeyed(events, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append")
      .start()
    in.addData(
      (ts("2026-01-01 12:00:00"), 1L), (ts("2026-01-01 12:01:00"), 1L),
      (ts("2026-01-01 12:02:00"), 2L))
    q.processAllAvailable()
    in.addData((ts("2026-01-01 12:03:00"), 1L)) // dup within watermark
    runToCompletion(q)
    val ids = s.sql("SELECT event_id FROM dedup").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq === Seq(1L, 2L))
  }

  test("streaming occupancy: per-(FPGA, channel) counts within orbit windows") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[(Timestamp, Int, Int)]
    val hits = in.toDF().toDF("ts", "FPGA", "TDC_CHANNEL")
    val q = Pipelines.occupancy(hits, "1 second", "5 seconds")
      .writeStream.format("memory").queryName("occ").outputMode("append")
      .start()
    in.addData(
      (ts("2026-01-01 00:00:00"), 0, 7), (ts("2026-01-01 00:00:00"), 0, 7),
      (ts("2026-01-01 00:00:00"), 1, 7), (ts("2026-01-01 00:00:01"), 0, 7))
    q.processAllAvailable()
    in.addData((ts("2026-01-01 00:01:00"), 0, 1)) // advance watermark, flush
    runToCompletion(q)
    val rows = s.sql("SELECT win_start, FPGA, TDC_CHANNEL, n_hits FROM occ")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(rows.contains(("2026-01-01 00:00:00.0", 0, 7, 2L)))
    assert(rows.contains(("2026-01-01 00:00:00.0", 1, 7, 1L)))
    assert(rows.contains(("2026-01-01 00:00:01.0", 0, 7, 1L)))
  }

  test("checkpoint recovery: restart resumes from committed offsets, exactly once") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (in, out, cp) = (s"$root/in", s"$root/out", s"$root/cp")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def runOnce(): Unit = {
      val q = s.readStream
        .schema("event_id LONG, v LONG")
        .json(in)
        .writeStream
        .format("parquet")
        .option("checkpointLocation", cp)
        .option("path", out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def addFile(name: String, ids: Range): Unit = {
      val body = ids.map(i => s"""{"event_id":$i,"v":${i * 10}}""").mkString("\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$in/$name"), body.getBytes("UTF-8"))
    }
    addFile("a.json", 1 to 3)
    runOnce()
    // the first batch's files stay in place; a restart must NOT reprocess
    // them (offset log) and must pick up only the new file
    addFile("b.json", 4 to 6)
    runOnce()
    val got = s.read.parquet(out).select("event_id").as[Long].collect().sorted
    assert(got.toSeq === (1L to 6L), s"expected exactly-once 1..6, got ${got.toSeq}")
  }

  test("stream-stream coincidence join matches within tolerance only") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val hitsIn = MemoryStream[(Long, Timestamp)]
    val trigIn = MemoryStream[(Long, Timestamp)]
    val q = Pipelines.coincidence(
        hitsIn.toDF().toDF("key", "ts"),
        trigIn.toDF().toDF("key", "ts"),
        toleranceSec = 5)
      .writeStream.format("memory").queryName("coinc").outputMode("append")
      .start()
    trigIn.addData((1L, ts("2026-01-01 00:00:10")))
    hitsIn.addData(
      (1L, ts("2026-01-01 00:00:08")), // within ±5s -> match
      (1L, ts("2026-01-01 00:00:14")), // within ±5s -> match
      (1L, ts("2026-01-01 00:00:20")), // 10s away -> no match
      (2L, ts("2026-01-01 00:00:10"))) // different key -> no match
    q.processAllAvailable()
    runToCompletion(q)
    val got = s.sql("SELECT h_key, h_ts FROM coinc").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(got === Set(
      (1L, "2026-01-01 00:00:08.0"),
      (1L, "2026-01-01 00:00:14.0")))
  }

  test("foreachBatch sink sees every micro-batch exactly once") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[Long]
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val q = in.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Long], id: Long) =>
        seen.put(id, batch.count())
        () // the sink owns idempotence by (batchId, epoch) at a real store
      }
      .start()
    in.addData(1L, 2L, 3L)
    q.processAllAvailable()
    in.addData(4L)
    runToCompletion(q)
    assert(seen.values.sum === 4L)
    assert(seen.keySet === Set(0L, 1L))
  }

  test("streaming tumbling counts equal the oracled batch query on real events") {
    val s = spark
    import s.implicits._
    // stream the events table itself (file source + AvailableNow), then
    // compare against the DuckDB-oracled batch spelling — the
    // batch/streaming unification claim on real data
    val batchDf = Tables.events(spark, sf)
    // the file stream source wants a directory; stage the single-file
    // table into one
    val dir = java.nio.file.Files.createTempDirectory("parity_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Tables.normalizeEventTs(s.readStream
      .schema(s.read.parquet(s"$sf/events.parquet").schema)
      .format("parquet")
      .load(dir.toString))
    val q = Pipelines.tumblingCounts(stream, "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("parity")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = s.sql("SELECT win_start, event_type, n FROM parity")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
      .toSet
    val batch = batchDf
      .groupBy(
        org.apache.spark.sql.functions.date_trunc("hour", org.apache.spark.sql.functions.col("ts")).as("w"),
        org.apache.spark.sql.functions.col("event_type"))
      .count()
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
  }

  test("stream-static enrichment joins the broadcast dim per batch, left-outer") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Long)]
    val q = Pipelines.enrichStatic(
        in.toDF().toDF("event_id", "user_id"), dim, "user_id")
      .writeStream.format("memory").queryName("enrich").outputMode("append")
      .start()
    in.addData((100L, 1L), (101L, 2L), (102L, 9L))
    q.processAllAvailable()
    q.stop()
    val rows = s.sql("SELECT event_id, user_id, tier FROM enrich").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    // matched rows enrich; the dim-less user flows through with null
    assert(rows === Set((100L, 1L, "gold"), (101L, 2L, "silver"),
      (102L, 9L, null)))
  }

  test("left-outer coincidence join emits unmatched hits once state evicts") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val hitsIn = MemoryStream[(Long, Timestamp)]
    val trigIn = MemoryStream[(Long, Timestamp)]
    val q = Pipelines.coincidence(
        hitsIn.toDF().toDF("key", "ts"),
        trigIn.toDF().toDF("key", "ts"),
        toleranceSec = 5, watermark = "10 seconds",
        joinType = "left_outer")
      .writeStream.format("memory").queryName("coinc_outer")
      .outputMode("append")
      .start()
    trigIn.addData((1L, ts("2026-01-01 00:00:10")))
    hitsIn.addData(
      (1L, ts("2026-01-01 00:00:08")),  // within ±5s -> match
      (1L, ts("2026-01-01 00:01:00"))) // no trigger near -> null-padded
    q.processAllAvailable()
    // advance BOTH watermarks far past 00:01:00 + 5s tolerance + 10s
    // delay so the unmatched hit's state provably cannot match anymore
    trigIn.addData((8L, ts("2026-01-01 00:10:00")))
    hitsIn.addData((7L, ts("2026-01-01 00:10:00")))
    q.processAllAvailable()
    trigIn.addData((8L, ts("2026-01-01 00:20:00")))
    hitsIn.addData((7L, ts("2026-01-01 00:20:00")))
    q.processAllAvailable()
    runToCompletion(q)
    val matched = s.sql(
      "SELECT h_ts FROM coinc_outer WHERE h_key = 1 AND t_key IS NOT NULL")
      .collect().map(_.getTimestamp(0).toString).toSet
    val unmatched = s.sql(
      "SELECT h_ts FROM coinc_outer WHERE h_key = 1 AND t_key IS NULL")
      .collect().map(_.getTimestamp(0).toString).toSet
    assert(matched === Set("2026-01-01 00:00:08.0"))
    assert(unmatched === Set("2026-01-01 00:01:00.0"))
  }

  test("update-mode tumbling agg re-emits changed windows per batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = Pipelines.tumblingCounts(
        in.toDF().toDF("event_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("tumb_update")
      .outputMode("update")
      .start()
    in.addData((1L, ts("2026-01-01 00:10:00"), "click"))
    q.processAllAvailable()
    val afterFirst = s.sql(
      "SELECT count(*) FROM tumb_update").collect().head.getLong(0)
    // same window grows in a second batch: update mode re-emits it
    in.addData((2L, ts("2026-01-01 00:20:00"), "click"))
    q.processAllAvailable()
    runToCompletion(q)
    val rows = s.sql(
      "SELECT n FROM tumb_update ORDER BY n").collect().map(_.getLong(0))
    // first emission n=1, re-emission n=2 — both sink rows present
    assert(afterFirst === 1L && rows.toSeq === Seq(1L, 2L))
  }
}
