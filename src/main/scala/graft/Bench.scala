package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Per-round benchmark: run every declared query at SPARK_GRAFT_SF_DIR and
  * print one JSON line. Each query is forced through the `noop` sink so the
  * full plan (projections included) executes — `count()` would let Catalyst
  * prune everything but the row count. */
object Bench {

  /** Correctness CONTROLS: declared queries that exist to certify a
    * scale-safe rewrite by being oracle-identical to it, while keeping
    * the known-bad plan shape on display (q_join_theta_range is the
    * deliberately skew-prone plain theta join that certifies
    * q_join_theta_range_binned). They still run and report per-query
    * seconds — a crash or order-of-magnitude blowup stays visible — but
    * are EXCLUDED from the headline total and listed under "controls",
    * so an intentionally-skewed plan can never read as a perf
    * regression of the benched surface. */
  val Controls: Set[String] = Set("q_join_theta_range")

  /** Streaming throughput probe: the events table replayed through a
    * [[graft.stream.Pipelines]] transform as a bounded stream
    * (Trigger.AvailableNow), so state-store / watermark regressions show
    * up as time, not just as scalatest failures.
    *
    * With `batches = 1` the whole table is one staged file = one
    * micro-batch. With `batches = 2` the table is time-split at the
    * median timestamp into two staged files processed oldest-first under
    * `maxFilesPerTrigger = 1` — two micro-batches over the same rows, so
    * the per-batch `triggerExecution` durations expose the MARGINAL
    * per-batch cost (batch 2, warm state) — the number a real
    * state-store regression moves.
    *
    * Attribution (VERDICT r10 §5, measured via SPARK_GRAFT_STREAM_DEBUG):
    * the old "setup ~8 s" premise — fixed checkpoint/state-store init
    * landing on batch 1 — was WRONG. The durationMs breakdown shows
    * batch 1's addBatch ≈ batch 2's (3.9 vs 3.5 s: both do the same
    * data+state work), and a third, 0-ROW batch AvailableNow runs after
    * the data to finalize the watermark (state eviction + outer-join
    * null-emits) costing another ~3.6 s of addBatch — real state-store
    * work, not setup. The genuinely fixed cost (query start/stop,
    * planning, offset WAL) is ~1-2 s. So this probe now returns the
    * finalization batch separately and "setup" means ONLY the fixed
    * remainder: (elapsed, per-data-batch seconds in order, finalize
    * seconds summed over 0-row batches). */
  private def streamProbe(spark: SparkSession, sfDir: String,
      mode: String,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      batches: Int = 1): (Double, Seq[Double], Double) = {
    val path = s"$sfDir/events.parquet"
    val raw = spark.read.parquet(path)
    val rawSchema = raw.schema
    // the file stream source wants a directory; stage the table into one
    // (untimed — setup, not stream work)
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bench_ckpt")
    if (batches <= 1) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(path), dir.resolve("events.parquet"))
    } else {
      // time-ordered halves (ntile over the raw ts column is encoding-
      // agnostic: nanos-as-long and either timestamp flavor all sort
      // correctly), written with the raw schema so the loader's
      // normalization sees exactly what the driver's file would show.
      // Batch 2's rows are NEWER than batch 1's watermark, so they do
      // real state work instead of arriving late.
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))
      val halves = raw.withColumn("graft_half", ntile(batches).over(w))
      (1 to batches).foreach { h =>
        val sub = java.nio.file.Files.createTempDirectory("graft_bench_half")
        halves.filter(col("graft_half") === h).drop("graft_half")
          .coalesce(1).write.mode("overwrite").parquet(sub.toString)
        // java.nio directory streams hold an fd until closed (ADVICE r9:
        // the bench leaked one per staged half) — always close them
        val ls = java.nio.file.Files.list(sub)
        val part = try ls.toArray.map(_.toString)
          .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
          .head finally ls.close()
        val dst = dir.resolve(s"$h.parquet")
        java.nio.file.Files.move(java.nio.file.Paths.get(part), dst)
        // the file source admits files oldest-mtime-first: pin the order
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - (batches - h) * 60000L))
        val wk = java.nio.file.Files.walk(sub)
        try wk
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally wk.close()
      }
    }
    // State partitioning sized to the probe's state volume (VERDICT r13
    // §2). A streaming query's state partition count binds at checkpoint
    // creation — it is a per-query PROVISION decision, exactly as on a
    // real cluster — and the probes carry ~8 MB of state, for which the
    // session's batch-oriented 32 partitions are a ~100x over-provision.
    // The waste is a fixed per-partition-per-batch cost (task dispatch +
    // the stream-stream join's 4 state stores' commit + maintenance,
    // measured ~130 ms/partition/batch on this host), so it scales with
    // partitions, not with data. Same-host A/B on the two join probes
    // (elapsed, 2 data batches + finalize): 32 parts 13.5/11.8 s;
    // RocksDB at 32 parts 11.4/11.1 s (the store engine is not the
    // lever); 8 parts 4.1/3.8 s — batches 4.3 -> 1.2 s, finalize
    // 4.1 -> 0.9 s. At 100 TB the same sizing rule provisions MORE
    // partitions (state grows with the workload); what it never does is
    // pay 32 partitions' fixed costs to host 8 MB.
    // SPARK_GRAFT_STREAM_PARTS overrides for A/B reproduction;
    // SPARK_GRAFT_STREAM_PROVIDER=rocksdb forces the RocksDB store on
    // every probe instead of only the transformWithState one.
    val priorParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8"))
    if (sys.env.get("SPARK_GRAFT_STREAM_PROVIDER").contains("rocksdb"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = System.nanoTime()
      val reader = spark.readStream.schema(rawSchema)
      val src =
        if (batches <= 1) reader.parquet(dir.toString)
        else reader.option("maxFilesPerTrigger", "1").parquet(dir.toString)
      val q = transform(Tables.normalizeEventTs(src))
        .writeStream
        .format("noop")
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .start()
      q.awaitTermination()
      val total = (System.nanoTime() - t0) / 1e9
      val perBatch = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .flatMap(p => Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue / 1e3))
      // 0-row batches are the watermark-finalization work (state
      // eviction, outer-join null-emits) — state-store cost, not setup
      val finalize = q.recentProgress.toSeq
        .filter(_.numInputRows == 0)
        .flatMap(p => Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue / 1e3))
        .sum
      // Setup-floor attribution (VERDICT r10 §5): with
      // SPARK_GRAFT_STREAM_DEBUG=1 dump each micro-batch's full
      // durationMs breakdown (addBatch / walCommit / stateStore commit /
      // getBatch / latestOffset ...) to stderr, so "where do the ~8 s of
      // probe setup go" is a measurement, not a guess. Off by default —
      // diagnostics only, never part of the artifact.
      if (sys.env.get("SPARK_GRAFT_STREAM_DEBUG").contains("1"))
        q.recentProgress.toSeq.foreach { p =>
          System.err.println(s"[stream-debug] batch=${p.batchId} " +
            s"rows=${p.numInputRows} durationMs=${p.durationMs} " +
            s"stateOps=${p.stateOperators.toSeq.map(so =>
              s"(commit=${so.commitTimeMs}ms mem=${so.memoryUsedBytes})")}")
        }
      (total, perBatch, finalize)
    } finally {
      // the stream-sized partition count must not leak into batch queries
      spark.conf.set("spark.sql.shuffle.partitions", priorParts)
      // a staged table copy + checkpoint per probe per run adds up fast
      // in /tmp — delete both (bottom-up) once the probe is done
      Seq(dir, ckpt).foreach { root =>
        val wk = java.nio.file.Files.walk(root)
        try wk
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally wk.close()
      }
    }
  }

  /** (busy, total) jiffies from the aggregate `cpu` line of /proc/stat.
    * busy = user+nice+system ONLY — the same accounting basis as a
    * process's utime+stime, so subtracting our own jiffies cancels
    * exactly. irq/softirq/steal are deliberately excluded from both
    * sides: they are attributed to no process, and the bench's own
    * checkpoint I/O generates them (measured ~9% of capacity during the
    * streaming probes), so counting them would read our own disk work
    * as host contamination. Known residual (ADVICE r9): the bench's own
    * writeback is flushed by kernel kworker threads whose SYSTEM time
    * lands in the host `cpu` line but belongs to no pid — it reads as
    * "external" CPU here, so an unusually I/O-heavy quiet run can sit a
    * point or two above its true ambient figure and, at the margin,
    * de-certify itself (fail-safe direction: a run is never WRONGLY
    * certified by this). Accepted as documented slack inside the 5%
    * budget rather than widened away — attributing writeback jiffies to
    * their originating pid is not possible from /proc alone.
    * Also returns iowait (field 5) separately: VERDICT r12 §5 proved the
    * busy-only accounting has a blind spot — a roving IO/steal stall
    * parks CPUs in iowait, which is neither busy nor attributable to any
    * pid, so `ext_cpu_frac` certifies a run whose queries were stalled
    * behind someone else's disk traffic (the 228.5 s r12 artifact, 17
    * phantom outliers, stamped certified). iowait cannot be split into
    * "ours" vs "theirs" from /proc, but it doesn't need to be: the bench
    * at sf0.1 works from page cache after the warm-up (measured clean-run
    * Δiowait ≲ 1% of jiffies), so ANY material iowait is a host-health
    * signal and the gate can afford to be blunt. steal (field 9, absent
    * on bare metal) is folded into the same number — a VM neighbor
    * stealing cycles stalls queries through the identical
    * invisible-to-busy mechanism.
    * Returns (-1, -1, -1) off-Linux. */
  private def hostJiffies(): (Long, Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat")
      val line = try f.getLines().next() finally f.close()
      parseCpuLine(line)
    } catch { case _: Throwable => (-1L, -1L, -1L) }

  /** Pure parse of the aggregate `cpu` line → (busy, stall, total);
    * (-1,-1,-1) on malformed input. Split from hostJiffies so the gate's
    * field selection (busy = user+nice+system; stall = iowait+steal) is
    * pinned by BenchSpec against synthetic /proc/stat lines. */
  private[graft] def parseCpuLine(line: String): (Long, Long, Long) =
    try {
      val parts = line.trim.split("\\s+").drop(1).map(_.toLong)
      val stall = parts(4) + (if (parts.length > 7) parts(7) else 0L)
      (parts(0) + parts(1) + parts(2), stall, parts.sum)
    } catch { case _: Throwable => (-1L, -1L, -1L) }

  /** The iowait+steal fraction of a run from two hostJiffies snapshots;
    * -1 (gate-neutral) when either snapshot failed or no time passed.
    * Pure, so BenchSpec can drive it with synthetic jiffy deltas. */
  private[graft] def stallFrac(
      stall0: Long, stall1: Long, jtotal0: Long, jtotal1: Long): Double =
    if (stall0 < 0 || stall1 < 0 || jtotal1 <= jtotal0) -1.0
    else math.max(0.0, (stall1 - stall0).toDouble / (jtotal1 - jtotal0))

  /** The outlier-detector envelope, ONE spelling for both the sweep-time
    * flag and the retest classification (ADVICE r13 found them diverged):
    * an outlier needs ratio > 2.5x AND absolute delta > 1 s — the floor
    * filters sub-second-baseline scheduler hiccups (q_tdc_occupancy at
    * 0.35 s flagged in three artifacts, transient every time) while every
    * real regression observed to date cleared it by an order of
    * magnitude. */
  private[graft] def isOutlier(v: Double, prior: Double): Boolean =
    prior > 0 && v > 2.5 * prior && v - prior > 1.0

  /** Extract the per-query seconds map from a committed bench-artifact
    * line, for the outlier comparison. Deliberately a flat-value scan,
    * not a JSON parser (zero deps): the "queries" map is the artifact's
    * only nested object whose values are all plain numbers, so it ends
    * at the first '}'. sf guard: the baseline is only a valid comparator
    * for a run at the SAME scale factor — an sf1 run judged against
    * sf0.1 times would flag every ~3x-scaling entry as a phantom
    * outlier — so a mismatched or missing "sf" yields the empty map
    * (= no outlier flags), the fail-safe direction. */
  private[graft] def parseBaselineQueries(
      s: String, sfDir: String): Map[String, Double] = {
    // Total by construction (ADVICE r10): every indexOf is checked, so a
    // truncated artifact (unterminated sf string, unclosed queries map)
    // yields the empty map — the documented never-throw contract holds
    // for direct callers too, not just the try/catch production site.
    val sfOk = {
      val j = s.indexOf("\"sf\":\"")
      j >= 0 && {
        val start = j + "\"sf\":\"".length
        val end = s.indexOf('"', start)
        end >= 0 && s.substring(start, end) == sfDir
      }
    }
    val i = s.indexOf("\"queries\":{")
    val qEnd = if (i < 0) -1
      else s.indexOf('}', i + "\"queries\":{".length)
    if (i < 0 || qEnd < 0 || !sfOk) Map.empty
    else {
      val start = i + "\"queries\":{".length
      s.substring(start, qEnd).split(",").iterator
        .flatMap { kv =>
          kv.split(":") match {
            case Array(k, v) => scala.util.Try(
              k.trim.stripPrefix("\"").stripSuffix("\"")
                -> v.trim.toDouble).toOption
            case _ => None
          }
        }.toMap
    }
  }

  /** Outlier-retest classification (VERDICT r12 §5): the 2.5x detector
    * fires on transient host noise as readily as on real regressions —
    * round 12's artifact carried 17 flags that all re-ran at baseline in
    * isolation, and two certified re-runs flagged two DISJOINT roving
    * blocks. So a flag alone is ambiguous; one isolated re-timing after
    * the sweep disambiguates it. `retimes` carries that re-timing (-1 =
    * the retest itself failed). A flag is TRANSIENT iff its retest lands
    * back inside the same envelope the detector uses — ratio ≤ 2.5x OR
    * absolute delta ≤ 1 s (ADVICE r13: without the delta floor a
    * sub-second-baseline retest at 3x-but-0.5s-over would "confirm" a
    * timing the detector itself would never flag); anything else
    * — still slow, retest failed, or no baseline/retime to judge by — is
    * CONFIRMED, the fail-safe direction (a confirmed flag degrades the
    * close; a wrongly-transient flag would hide a regression). Returns
    * (confirmed, transient), each in the input order. */
  private[graft] def classifyOutliers(
      flagged: Seq[String], baseline: Map[String, Double],
      retimes: Map[String, Double]): (Seq[String], Seq[String]) =
    flagged.partition { k =>
      (for (p <- baseline.get(k); r <- retimes.get(k))
        yield r < 0 || isOutlier(r, p)).getOrElse(true)
    }

  /** Parse a count-valued SPARK_GRAFT_* override as a positive Int,
    * failing LOUDLY at session-build time: interpolating a raw env
    * string into the artifact line meant a typo'd override produced an
    * invalid-JSON artifact instead of a clear error (ADVICE r14). */
  private[graft] def parsePosInt(name: String, v: String): Int = {
    val parsed = try v.trim.toInt catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        s"$name must be a positive integer, got '$v'") }
    if (parsed <= 0) throw new IllegalArgumentException(
      s"$name must be a positive integer, got '$v'")
    parsed
  }

  /** Minimal JSON string encoder for artifact fields that carry
    * user-controlled text (env override values). */
  private[graft] def jsonStr(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }.mkString("\"", "", "\"")

  /** Every SPARK_GRAFT_* override in effect, as a JSON object — stamped
    * into the artifact so a diagnostics A/B run (INIT_PARTS,
    * WINNOW_GROUPS, …) is distinguishable from a default close in the
    * recorded JSON (ADVICE r14: shuffle_partitions alone left the other
    * behavior-changing knobs invisible). */
  private[graft] def envOverridesJson(env: Map[String, String]): String =
    env.toSeq.filter(_._1.startsWith("SPARK_GRAFT_")).sortBy(_._1)
      .map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")

  /** One bounded re-settle-and-rerun when a close comes back
    * uncertified (VERDICT r14 #5): the r14 driver close was stamped
    * uncertified purely from host noise at close time (ext_cpu 40%)
    * while the engine itself was clean — a single retry after a fresh
    * settle loop keeps a noisy moment from leaving the round's official
    * artifact uncertified. Gate thresholds are untouched: a host that
    * is STILL noisy on the retry fails certification exactly as before.
    * "degraded" (certified host, confirmed outlier) does NOT retry —
    * that grade means a real slowdown to chase, not noise. */
  private[graft] def shouldRetry(closeQuality: String, attempt: Int,
      enabled: Boolean): Boolean =
    enabled && attempt == 1 && (closeQuality == "uncertified")

  /** Close-quality grade (VERDICT r12 §6, refined ADVICE r15): the
    * BENCH_BASELINE refresh policy encoded in the tool. "ok" — certified
    * host, zero flagged outliers, FIRST attempt: the only grade that may
    * refresh the comparator or close a round. "ok-retry" — same gates
    * passed but on the bounded attempt-2 re-run, which executes in the
    * same JVM right after a full attempt-1 sweep and therefore benefits
    * from warm OS page cache and JIT (BASELINE.md r15: 126.5 s attempt-2
    * vs 140.9 s comparator — part real win, part warmth); indicative
    * only, never a refresh source — a fresh attempt-1 close must confirm
    * it. "degraded" — certified host but a flag survived its retest (a
    * real slowdown to chase). "uncertified" — host gates failed, totals
    * not comparable. */
  private[graft] def gradeClose(certified: Boolean, confirmed: Boolean,
      attempt: Int): String =
    if (!certified) "uncertified"
    else if (confirmed) "degraded"
    else if (attempt > 1) "ok-retry"
    else "ok"

  /** utime+stime jiffies of one process from /proc/<pid>/stat (fields
    * 14-15, located after the parenthesized comm), or -1 on error. */
  private def pidJiffies(pid: String): Long =
    try {
      val f = scala.io.Source.fromFile(s"/proc/$pid/stat")
      val s = try f.mkString finally f.close()
      val rest = s.substring(s.lastIndexOf(')') + 2).split(" ")
      rest(11).toLong + rest(12).toLong
    } catch { case _: Throwable => -1L }

  /** Jiffies attributable to THIS bench run: the bench JVM plus its
    * parent. `run / fork := true` means the parent is the sbt launcher,
    * which pumps the forked JVM's log stream at a measured ~1.5 cores
    * during streaming probes — our own overhead, not host contamination
    * (when launched directly, the parent is an idle shell and the term
    * is ~0). -1 if /proc is unreadable. */
  private def selfJiffies(): Long = {
    val self = pidJiffies("self")
    if (self < 0) -1L
    else {
      val ppid =
        try {
          val f = scala.io.Source.fromFile("/proc/self/status")
          try f.getLines().find(_.startsWith("PPid:"))
            .map(_.split("\\s+")(1)).getOrElse("0")
          finally f.close()
        } catch { case _: Throwable => "0" }
      self + math.max(pidJiffies(ppid), 0L)
    }
  }

  private def loadavg1m(): Double =
    try {
      val f = scala.io.Source.fromFile("/proc/loadavg")
      try f.mkString.split(" ")(0).toDouble finally f.close()
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_CLOSE_RETRY=0 opts out (single-query iteration and
    // diagnostics runs don't need the re-settle machinery).
    val retryEnabled =
      sys.env.getOrElse("SPARK_GRAFT_CLOSE_RETRY", "1") != "0"
    var attempt = 1
    var quality = runSweep(attempt)
    while (shouldRetry(quality, attempt, retryEnabled)) {
      System.err.println(s"[bench] close attempt $attempt uncertified " +
        "(host-noise gates); re-settling and re-running once")
      attempt += 1
      quality = runSweep(attempt)
    }
  }

  /** One full sweep: settle, run every declared query + streaming
    * probe, emit and persist the artifact. Returns the close_quality
    * grade so [[main]] can decide on the single bounded retry. */
  private def runSweep(attempt: Int): String = {
    // Host-contamination accounting (VERDICT r8 §4). Pre-run 1-min
    // loadavg flags ambient load at start; the END-of-run loadavg is
    // stamped too but NOT gated on — it mostly measures the bench's own
    // 32-core tail (observed: 5.6 on an otherwise idle host), so gating
    // on it would flag every healthy run. The mid-run wave detector that
    // IS gated on is the external-CPU fraction: Δ(host busy jiffies)
    // minus Δ(this JVM's jiffies), over Δ(all jiffies) — own work
    // subtracts out exactly, so a wave arriving mid-run (the BASELINE.md
    // pattern a pre-only gate misses) shows up as external busy time no
    // matter when it lands.
    //
    // Pre-run settle loop (VERDICT r11 §4): the r11 driver artifact
    // recorded certified:false because the bench launched while the
    // host was still digesting the driver's own oracle work (loadavg
    // 7.93 at t0 — ambient, not mid-run, so the ext-CPU gate couldn't
    // save it). Give the host a bounded chance to drain first: poll the
    // 1-min loadavg every 15 s and start when it drops under the same
    // 1.5 the certification gate checks, or after a 3-min cap (a busy
    // host then fails certification exactly as before — the loop buys
    // settling time, never masks contamination). The wait is recorded
    // in the artifact (settle_wait, seconds). SPARK_GRAFT_SETTLE=0
    // skips the loop for local iteration.
    val settleT0 = System.nanoTime()
    if (sys.env.getOrElse("SPARK_GRAFT_SETTLE", "1") != "0") {
      val capMs = 180000L
      // sleep only the time remaining under the cap (ADVICE r12: the old
      // check-then-sleep-15s could overshoot the documented 3-min cap by
      // a full sleep, reading settle_wait ~195 s)
      var remMs = capMs
      while (loadavg1m() > 1.5 && remMs > 0) {
        Thread.sleep(math.min(15000L, remMs))
        remMs = capMs - (System.nanoTime() - settleT0) / 1000000L
      }
    }
    val settleWait = (System.nanoTime() - settleT0) / 1e9
    val loadavg = loadavg1m()
    val (busy0, stall0, jtotal0) = hostJiffies()
    val self0 = selfJiffies()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // count-valued knobs are validated HERE so a typo fails the run with
    // a clear message instead of emitting an invalid-JSON artifact
    val cpus = parsePosInt("SPARK_GRAFT_CPUS",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val shuffleParts = parsePosInt("SPARK_GRAFT_SHUFFLE_PARTS",
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus.toString))
    val initParts = parsePosInt("SPARK_GRAFT_INIT_PARTS",
      sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", shuffleParts.toString))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // SPARK_GRAFT_SHUFFLE_PARTS: diagnostics-only override of the
      // session shuffle-partition count (default = cores, the value
      // every recorded close uses). Exists for the winnow spill A/B
      // (VERDICT r13 §3): more, smaller sort-fallback runs per
      // partition vs more merge fan-in — measured, not guessed.
      .config("spark.sql.shuffle.partitions", shuffleParts.toString)
      // AQE initial reducer count before runtime coalescing
      // (SPARK_GRAFT_INIT_PARTS, diagnostics A/B): lets spill-heavy
      // exchanges keep high fan-out while AQE coalesces small ones to
      // ~advisory size — the per-shuffle provision decision a real
      // cluster makes, here under measurement before any default moves.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initParts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        GraftConf.BypassMergeThreshold)
      .config("spark.sql.optimizer.excludedRules", GraftConf.ExcludedRules)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // state-store maintenance runs on an async thread that can race
      // spark.stop() after the last streaming probe and spew an
      // RpcEnvStoppedException stack into stdout (it pushed round 8's
      // JSON line out of the driver's 2000-char tail); the probes finish
      // well inside 10 min, so maintenance simply never fires mid-bench
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "10min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Pair-cardinality capture (VERDICT r15 #5): the two sf10-dominant
    // dedup queries carry a zero-cost observe() on their pair frame
    // ("graft_pairs_<query>"); this listener collects the observed
    // counts so the artifact stamps pairs-per-close — the denominator
    // that lets the next scale point check seconds/pair stays flat
    // mechanically instead of via the hand-drawn C(n,2) clone curve.
    val pairCounts = scala.collection.concurrent.TrieMap.empty[String, Long]
    // bound to a val so the retry path can unregister it (ADVICE r16:
    // getOrCreate may hand attempt 2 the same session, and attempt 1's
    // listener would keep writing into a dead map)
    val pairListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_pairs_"))
            pairCounts.put(name.stripPrefix("graft_pairs_"), row.getLong(0))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(pairListener)
    // Untimed warm-up: exercises the parquet reader, whole-stage codegen,
    // shuffle, and the noop sink once so JVM/class-loading cost doesn't
    // land on whichever query happens to run first.
    try spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Optional comma-separated name filter for single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Noise immunity: one sample per query lets an unrelated host-load
    // spike destroy the round's only perf artifact (it did, in round 2 —
    // 9-48x phantom slowdowns on untouched plans). Each query runs
    // `passes` times and reports the MIN: the second pass is warm (plans
    // and code cached), so the floor it finds is the query's real cost,
    // and a spike must hit BOTH passes to survive into the number.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt.max(1)
    def minOf(run: () => Unit): Double =
      (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.min
    // A failed query must not masquerade as a fast one: it reports -1 in
    // `queries`, lands in `failures`, and contributes nothing to `value`.
    // Per-query cache isolation, ON by default (SPARK_GRAFT_EVICT=0
    // opts out): without it, frames persisted by earlier queries
    // accumulate for the whole run and poison later entries — measured
    // 2026-08-14: q_mm_features read 0.98 s freshly-evicted vs 6.3-28.4 s
    // when run after q_mm_dedup's persist, and the stream probes (which
    // run LAST, behind ~150 queries of leftovers) halved under eviction
    // (q_stream_sessions_tws 16.6 s -> 7.6 s in the same-host A/B).
    // This is the likely mechanism behind the single-entry in-run
    // spikes BASELINE.md has documented all round. Index memoizations
    // (IVF cells) are rebuilt per query but still amortize across the
    // min-of-N passes inside one query.
    val evict = sys.env.getOrElse("SPARK_GRAFT_EVICT", "1") != "0"
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        try {
          if (evict) graft.Graft.clearCaches(spark)
          // Driver GC between queries (r13, default ON; SPARK_GRAFT_GC=0
          // opts out): Spark's ContextCleaner reclaims shuffle files,
          // broadcasts, and checkpoint blocks only when the driver GC
          // collects their references, and a long sweep can run for
          // minutes without an old-gen collection, so dead shuffle data
          // accumulates on the temp disk. The GC runs OUTSIDE the timed
          // region and trims that backlog (~5% on the spill-heaviest
          // sf3 entry: 71.5 -> 67.6 s after a 19-query prefix). It does
          // NOT remove the larger position-in-sweep tax on spill-heavy
          // queries — that is page-cache aging (25 GB/stage of
          // sort-fallback spill IO absorbed by a fresh page cache but
          // hitting contended storage late in a 182-query sweep;
          // q_text_winnow_pairs: 50.3 s isolated vs 93.7 s at sweep
          // tail). Measured dead ends, for the record: 64 GiB heap
          // (spill gone, but giant in-memory agg maps thrash GC — 292 s
          // of task GC, 274 s stage) and pre-repartitioning on the
          // grouping key (single-phase agg, but the repartition shuffle
          // sorter spills 50 GB of RAW pair rows — the partial agg it
          // skipped was net protective). BASELINE.md r13 has the full
          // attribution.
          if (sys.env.getOrElse("SPARK_GRAFT_GC", "1") != "0") System.gc()
          (name, minOf(() =>
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()), true)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          (name, -1.0, false)
        }
      }
    // Lloyd-refined IVF recall probe (VERDICT r9 §5): the production
    // index-BUILD step (iters >= 1 re-centering) is deliberately absent
    // from the declared surface — iters = 0 is what makes the IVF family
    // DuckDB-oracle-able — so without this probe a recall regression in
    // the refined path would be visible only to scalatest, never to a
    // round artifact. Here the bench builds the index both ways and
    // scores top-3 hits against the brute-force cosine truth set.
    // Untimed and excluded from the headline total (a quality number,
    // not a throughput one); SimilaritySpec keeps the hard recall floor.
    // Honors the SPARK_GRAFT_ONLY filter like every other probe (ADVICE
    // r10): single-query iteration runs must not pay the brute-force
    // truth set + two IVF index builds. Name it "ivf_lloyd" in the
    // filter to run it alone.
    val ivfLloyd: String =
      if (only.exists(!_.contains("ivf_lloyd"))) "null"
      else try {
        val sim = graft.ops.Similarity
        val truth = sim.qSimCosineTopk.fn(spark, sfDir)
          .select(col("qid"), col("vec_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nTruth = truth.count()
        def hits(iters: Int, seeding: String = "stride"): Long =
          sim.ivfTopk(spark, sfDir, iters = iters, seeding = seeding)
            .select(col("qid"), col("vec_id")).distinct()
            .join(truth, Seq("qid", "vec_id")).count()
        val h0 = hits(0)
        val h2 = hits(2)
        // farthest-point seeding (VERDICT r11 §5): same iters=0
        // assignment algebra, hull-spread seeds — the sparse-regime
        // index-quality lever; and with Lloyd on top, the production
        // build recipe. Reported side-by-side with the stride numbers.
        val hf = hits(0, "farthest")
        val hf2 = hits(2, "farthest")
        // Lloyd-depth sweep on the production recipe (VERDICT r13 §4):
        // the sf0.1 sparse regime reads 24/30 at iters=2 — does more
        // refinement buy recall, and at what build cost? Each step times
        // the FULL cold path (ivfIndex caches per (sf,k,iters,seeding),
        // so the first ivfTopk at a new iters pays seeding + iters
        // Lloyd rounds + the probe query). iters=2 re-runs cold here
        // rather than reusing hf2's cached index, so the curve's cost
        // axis is one like-for-like series. Only the Similarity index
        // caches are dropped between steps (each iters key is cold by
        // construction; clearing bounds the lingering cells frames) —
        // NOT catalog.clearCache, which would evict `truth` and bill
        // each step a brute-force recompute.
        val sweep = (2 to 5).map { it =>
          graft.ops.Similarity.clearSessionCaches(spark)
          val t = System.nanoTime()
          val h = hits(it, "farthest")
          val sec = (System.nanoTime() - t) / 1e9
          f"""{"iters":$it,"hits":$h,"secs":$sec%.3f}"""
        }.mkString("[", ",", "]")
        truth.unpersist()
        s"""{"iters":2,"n_truth":$nTruth,"hits_seeded":$h0,"hits_lloyd":$h2,"hits_fps":$hf,"hits_fps_lloyd":$hf2,"lloyd_sweep":$sweep}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ivf_lloyd probe failed: ${e.getMessage}")
        "null"
      }
    // the probe built two IVF indexes (persisted cells frames) — evict
    // them so the streaming probes start from the same cache state the
    // per-query eviction discipline guarantees everywhere else
    if (evict) graft.Graft.clearCaches(spark)
    val streamDefs: Seq[(String, String,
        org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      ("q_stream_tumbling", "append",
        df => graft.stream.Pipelines.tumblingCounts(df)),
      // the SAME windowed aggregation through update output mode — the
      // dashboard-facing sink path where changed aggregates re-emit per
      // micro-batch instead of waiting for watermark finalization; a
      // distinct sink/state interaction the append probes never touch
      ("q_stream_tumbling_update", "update",
        df => graft.stream.Pipelines.tumblingCounts(df)),
      // session_window exercises the merging-state path — the heavier
      // state-store shape tumbling windows never touch
      ("q_stream_sessions", "append",
        df => graft.stream.Pipelines.sessionCounts(df)),
      // dropDuplicatesWithinWatermark exercises the state-store dedup
      // path — the streaming twin of q_dedup_exact
      ("q_stream_dedup", "append",
        df => graft.stream.Pipelines.dedupKeyed(df, Seq("user_id", "ts"))),
      // watermarked stream-stream time-range join — double the state
      // stores plus the interval condition; the heaviest streaming shape
      // the engine declares
      ("q_stream_join", "append", df => {
        val base = df.select(col("user_id").as("key"), col("ts"),
          col("event_type"))
        graft.stream.Pipelines.coincidence(
          base.filter(col("event_type") === "click"),
          base.filter(col("event_type") === "purchase"),
          toleranceSec = 60, watermark = "1 hour")
      }),
      // LEFT-OUTER stream-stream join — the unmatched-detection shape:
      // clicks with no purchase in tolerance are emitted null-padded at
      // state eviction, a different state-store path from the inner
      // join's match-time output
      ("q_stream_join_outer", "append", df => {
        val base = df.select(col("user_id").as("key"), col("ts"),
          col("event_type"))
        graft.stream.Pipelines.coincidence(
          base.filter(col("event_type") === "click"),
          base.filter(col("event_type") === "purchase"),
          toleranceSec = 60, watermark = "1 hour",
          joinType = "left_outer")
      }),
      // stream-static broadcast enrichment — the stateless shape (no
      // watermark, no state store); the dim side is a batch aggregate
      // of the same table, broadcast into every micro-batch
      ("q_stream_enrich", "append", df => {
        val dim = Tables.events(df.sparkSession, sfDir)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"))
        graft.stream.Pipelines.enrichStatic(
          df.select("event_id", "user_id", "event_type", "value"),
          dim, "user_id")
      }),
      // transformWithState sessionization on the RocksDB store — the
      // Spark 4 state-API path. LAST probe: the provider conf applies to
      // every stream started after it, and the bench session ends here.
      ("q_stream_sessions_tws", "append", df => {
        val s = df.sparkSession
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        import s.implicits._
        graft.stream.Pipelines.sessionsWithStateV2(
          df.select(col("user_id"), col("ts"))
            .as[graft.stream.Pipelines.SessionInput]).toDF()
      }))
    // The two stream-stream join probes run TWO-batch (time-split input)
    // so the bench can report the marginal per-batch cost beside the
    // total; only the warm second batch moves when the state store
    // itself regresses (VERDICT r8 §6). Per-probe tuple: (name, elapsed,
    // ok, per-data-batch seconds, finalize seconds — the 0-row
    // watermark-finalization batch's state work, see streamProbe doc).
    val twoBatch = Set("q_stream_join", "q_stream_join_outer")
    val streaming: Seq[(String, Double, Boolean, Seq[Double], Double)] =
      streamDefs.filter { case (n, _, _) => only.forall(_.contains(n)) }
        .map { case (n, mode, tf) =>
          // each streamProbe call stages its own table copy + fresh
          // checkpoint, so min-of-N is a genuine cold-state re-run
          try {
            val nb = if (twoBatch(n)) 2 else 1
            val (t, perBatch, fin) = (1 to passes)
              .map(_ => streamProbe(spark, sfDir, mode, tf, nb))
              .minBy(_._1)
            (n, t, true, if (nb > 1) perBatch else Nil,
              if (nb > 1) fin else 0.0)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $n failed: ${e.getMessage}")
            (n, -1.0, false, Nil, 0.0)
          }
        }
    val all = results.map { case (k, v, ok) =>
      (k, v, ok, Seq.empty[Double], 0.0) } ++ streaming
    // All numeric formatting goes through Locale.ROOT: the f"" interpolator
    // uses the JVM default locale, so on a comma-decimal host (de_DE) it
    // would emit "0,562" and the artifact would stop being JSON (ADVICE r9).
    // Raw Double interpolation ($v) is already locale-safe (Double.toString).
    def fmt(d: Double, prec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${prec}f", Double.box(d))
    val qs = all.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failures = all.collect { case (k, _, false, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val controls = all.collect { case (k, _, _, _, _) if Controls(k) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // per-data-batch triggerExecution seconds for the two-batch probes:
    // [cold batch 1, warm/marginal batch 2] — near-equal by measurement
    val streamBatches = all.collect { case (k, _, true, bs, _) if bs.nonEmpty =>
      "\"" + k + "\":" + bs.map(b => fmt(b, 3)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // Headline accounting for the two-batch stream probes (VERDICT r9 §4/§6,
    // attribution corrected in r11 — see streamProbe doc): the headline
    // total counts only the warm MARGINAL batch — the number a real
    // state-store regression moves. The rest of the elapsed splits into
    // "stream_finalize" (the 0-row watermark-finalization batch: state
    // eviction + outer null-emits, real state-store work the r9/r10
    // artifacts mislabeled as setup) and "stream_setup" (the genuinely
    // fixed remainder: query start/stop, planning, offset WAL — measured
    // ~1-2 s, closing the r10 §5 "shave the 8 s floor" item: 6-7 s of
    // that floor was data/state work in disguise, not reducible setup).
    // Both are Controls-style: visible, not counted. "queries" still
    // carries the full elapsed per probe, so value != sum(queries) for
    // the two-batch entries BY DESIGN.
    val streamFinalize = all.collect { case (k, _, true, bs, fin) if bs.size >= 2 =>
      "\"" + k + "\":" + fmt(fin, 3)
    }.mkString("{", ",", "}")
    val streamSetup = all.collect { case (k, v, true, bs, fin) if bs.size >= 2 =>
      "\"" + k + "\":" + fmt(math.max(v - bs.sum - fin, 0.0), 3)
    }.mkString("{", ",", "}")
    val total = all.collect { case (k, v, true, bs, _) if !Controls(k) =>
      if (bs.size >= 2) bs.last else v
    }.sum
    // Per-query outlier flag (VERDICT r9 §3): round 9's committed artifact
    // carried a 5.4x phantom on an untouched query — documented GC/codegen
    // variance landing inside a "certified" number, exactly the kind of
    // entry a future round would waste a day chasing. Any entry > 2.5x its
    // time in the committed baseline artifact (BENCH_BASELINE.json — the
    // previous round's certified close, refreshed each round) is flagged
    // here so the artifact itself says "suspect this number, not the code".
    val priorQueries: Map[String, Double] = {
      val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE",
        "BENCH_BASELINE.json")
      try parseBaselineQueries(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8"), sfDir)
      catch { case _: Throwable => Map.empty }
    }
    // The 2.5x ratio alone flags sub-second queries on any scheduler
    // hiccup (q_tdc_occupancy at a 0.35 s baseline was flagged-then-
    // retested-transient in two r13 closes and the r12 artifact): an
    // absolute-delta floor of 1 s filters that class while every real
    // regression observed to date (r12's 16.39 s vs 1.02 s entropy
    // phantom included) clears it by an order of magnitude.
    val flagged: Seq[String] = all.collect { case (k, v, true, _, _)
        if !Controls(k) && priorQueries.get(k)
          .exists(p => isOutlier(v, p)) => k }
    // Outlier-retest pass (VERDICT r12 §5): each flagged entry gets ONE
    // extra isolated timing after the sweep, so the artifact itself says
    // whether a flag was a real slowdown (confirmed) or roving host noise
    // that normalized (transient) — round 12's 17-flag artifact would
    // have read "17 transient" instead of sending the judge on a
    // re-measurement expedition. Cost: zero when nothing is flagged.
    val retimes: Map[String, Double] = {
      // the tws probe set the session-wide RocksDB provider; retested
      // HDFS-state probes must run on the provider they were timed on
      if (flagged.exists(_.startsWith("q_stream")))
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      flagged.map { k =>
        k -> (try {
          if (evict) graft.Graft.clearCaches(spark)
          SparkEntry.queries.get(k) match {
            case Some(fn) =>
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            case None => streamDefs.find(_._1 == k) match {
              case Some((n, mode, tf)) =>
                streamProbe(spark, sfDir, mode, tf,
                  if (twoBatch(n)) 2 else 1)._1
              case None => -1.0
            }
          }
        } catch { case e: Throwable =>
          System.err.println(s"[bench] retest $k failed: ${e.getMessage}")
          -1.0
        })
      }.toMap
    }
    val (outConfirmed, outTransient) =
      classifyOutliers(flagged, priorQueries, retimes)
    val outliers = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val outliersConfirmed =
      outConfirmed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val outliersTransient =
      outTransient.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Certification gate: totals are only comparable from a quiet host
    // (BASELINE.md: ambient load lands 3-5x spikes on long-stable plans,
    // and round 3's closing artifact was invalidated by a loadavg-3.57
    // run). A loaded run still prints its numbers — they're useful for
    // relative iteration — but is stamped non-certifying so it can never
    // again be recorded as closing evidence. Gates: quiet START (pre
    // loadavg ≤ 1.5) AND quiet MIDDLE (external CPU ≤ 5% of the machine
    // for the whole run — a mid-run wave can no longer hide; 5% of 32
    // cores ≈ the same ambient budget the loadavg gate allows). The
    // end loadavg is stamped for transparency, not gated (it reads the
    // bench's own tail).
    val loadavgEnd = loadavg1m()
    val (busy1, stall1, jtotal1) = hostJiffies()
    val self1 = selfJiffies()
    val extCpuFrac =
      if (busy0 < 0 || busy1 < 0 || self0 < 0 || self1 < 0 ||
          jtotal1 <= jtotal0) -1.0
      else math.max(0.0,
        (busy1 - busy0 - (self1 - self0)).toDouble / (jtotal1 - jtotal0))
    // iowait+steal fraction over the run (VERDICT r12 §5): the stall
    // classes ext_cpu_frac is structurally blind to. Gated at the same
    // 5%-of-machine ambient budget — a clean sf0.1 run works from page
    // cache after warm-up and measures ≲1%, so 5% is real headroom, not
    // a tight fit.
    val iowaitFrac = stallFrac(stall0, stall1, jtotal0, jtotal1)
    val certified = loadavg >= 0.0 && loadavg <= 1.5 &&
      (extCpuFrac < 0.0 || extCpuFrac <= 0.05) &&
      (iowaitFrac < 0.0 || iowaitFrac <= 0.05)
    // Close-quality stamp — grading semantics live on [[gradeClose]];
    // attempt-2 passes grade "ok-retry" (warm-cache/JIT advantaged,
    // never a BENCH_BASELINE refresh source — ADVICE r15).
    val closeQuality = gradeClose(certified, outConfirmed.nonEmpty, attempt)
    val retestJson = retimes.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\":" + fmt(v, 3) }.mkString("{", ",", "}")
    // The observe() counts land on an async listener bus; by artifact
    // time the last batch query finished minutes ago (streaming probes
    // run after), so the map is settled. Empty when the instrumented
    // queries were filtered out by SPARK_GRAFT_ONLY.
    val pairCountsJson = pairCounts.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val envOverrides = envOverridesJson(sys.env)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"controls":$controls,"stream_batches":$streamBatches,"stream_finalize":$streamFinalize,"stream_setup":$streamSetup,"outliers":$outliers,"outliers_confirmed":$outliersConfirmed,"outliers_transient":$outliersTransient,"retest_secs":$retestJson,"pair_counts":$pairCountsJson,"ivf_lloyd":$ivfLloyd,"passes":$passes,"shuffle_partitions":$shuffleParts,"env_overrides":$envOverrides,"attempt":$attempt,"loadavg":$loadavg,"loadavg_end":$loadavgEnd,"settle_wait":${fmt(settleWait, 1)},"ext_cpu_frac":${fmt(extCpuFrac, 4)},"iowait_frac":${fmt(iowaitFrac, 4)},"certified":$certified,"close_quality":"$closeQuality","sf":"$sfDir"}"""
    // Compact summary: everything EXCEPT the per-query map. The driver
    // keeps only a ~2 KB tail of stdout, and the full line above is >6 KB
    // — its HEAD (including "metric" and "value") can never survive the
    // tail cut, which is why BENCH_r08/r09.json both carry parsed: null
    // (VERDICT r9 §1). This line is what the driver's tail parses; the
    // full line and the persisted file carry the per-query detail.
    val compact = s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","entries":${all.size},"nfailures":${all.count(!_._3)},"failures":$failures,"outliers":$outliers,"outliers_confirmed":$outliersConfirmed,"outliers_transient":$outliersTransient,"pair_counts":$pairCountsJson,"ivf_lloyd":$ivfLloyd,"passes":$passes,"shuffle_partitions":$shuffleParts,"env_overrides":$envOverrides,"attempt":$attempt,"loadavg":$loadavg,"loadavg_end":$loadavgEnd,"settle_wait":${fmt(settleWait, 1)},"ext_cpu_frac":${fmt(extCpuFrac, 4)},"iowait_frac":${fmt(iowaitFrac, 4)},"certified":$certified,"close_quality":"$closeQuality","sf":"$sfDir"}"""
    println(json)
    // The driver only keeps a 2000-char tail of stdout, which truncated
    // 61 of 121 entries (and the total) out of round 3's artifact. Persist
    // the full line to a file so the complete query map always survives.
    // Default under localdata/ (gitignored): every bench run used to dirty
    // the tracked tree by rewriting a committed BENCH_LAST.json (ADVICE
    // r4) — closing snapshots are committed under BENCH_r{N}.json instead.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "localdata/BENCH_LAST.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    }
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist $outPath: ${e.getMessage}")
    }
    spark.listenerManager.unregister(pairListener)
    spark.stop()
    // Re-print AFTER spark.stop() returns, so the JSON lands past any
    // async shutdown noise (state-store maintenance, RPC teardown):
    // round 8's driver artifact lost its whole per-query map to an
    // RpcEnvStoppedException stack landing after the only print. The
    // COMPACT line prints absolutely last — it is the one that must sit
    // inside the driver's 2 KB stdout tail in full.
    println(json)
    println(compact)
    closeQuality
  }
}
