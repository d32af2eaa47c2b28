package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's outlier comparison reads the PREVIOUS round's
  * committed line through [[Bench.parseBaselineQueries]] — driver-facing
  * logic that must fail SAFE (empty map = no outlier flags) on anything
  * unexpected, never throw or mis-flag. Pure function, no Spark session.
  */
class BenchSpec extends AnyFunSuite {

  private val line =
    """{"metric":"total","value":170.1,"unit":"sec","queries":{"q_a":0.5,"q_b":2.0,"q_c":0.25},"failures":[],"loadavg":0.5,"certified":true,"sf":"/data/sf0.1"}"""

  test("parses the queries map when the sf matches") {
    val m = Bench.parseBaselineQueries(line, "/data/sf0.1")
    assert(m === Map("q_a" -> 0.5, "q_b" -> 2.0, "q_c" -> 0.25))
  }

  test("sf mismatch yields the empty map (no phantom outliers at sf1)") {
    assert(Bench.parseBaselineQueries(line, "/data/sf1") === Map.empty)
  }

  test("missing sf field or queries map yields the empty map") {
    assert(Bench.parseBaselineQueries(
      line.replace("\"sf\":\"/data/sf0.1\"", "\"x\":1"), "/data/sf0.1")
      === Map.empty)
    assert(Bench.parseBaselineQueries(
      """{"metric":"total","sf":"/data/sf0.1"}""", "/data/sf0.1")
      === Map.empty)
  }

  test("truncated artifacts never throw (ADVICE r10: total function)") {
    // unterminated sf string — the closing quote never arrives
    assert(Bench.parseBaselineQueries(
      """{"queries":{"q_a":0.5},"sf":"/data/sf0.1""", "/data/sf0.1")
      === Map.empty)
    // queries map opened but never closed
    assert(Bench.parseBaselineQueries(
      """{"queries":{"q_a":0.5,"q_b":2.0""", "/data/sf0.1")
      === Map.empty)
    // both truncations at once
    assert(Bench.parseBaselineQueries("""{"queries":{""", "d") === Map.empty)
  }

  test("garbage entries are skipped, numeric ones survive") {
    val noisy =
      """{"queries":{"q_a":0.5,"q_bad":oops,"q_c":1.5},"sf":"d"}"""
    assert(Bench.parseBaselineQueries(noisy, "d")
      === Map("q_a" -> 0.5, "q_c" -> 1.5))
  }

  test("outlier retest classifies transient vs confirmed (VERDICT r12)") {
    val baseline = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0)
    // q_a re-ran at baseline (noise), q_b is still 3x (real), q_c's
    // retest failed (-1) — fail-safe to confirmed
    val (confirmed, transient) = Bench.classifyOutliers(
      Seq("q_a", "q_b", "q_c"), baseline,
      Map("q_a" -> 1.2, "q_b" -> 3.0, "q_c" -> -1.0))
    assert(transient === Seq("q_a"))
    assert(confirmed === Seq("q_b", "q_c"))
  }

  test("outlier retest: missing retime or baseline entry is confirmed") {
    // no retime recorded at all (retest machinery itself broke), or the
    // baseline entry vanished between flagging and classification —
    // both must land on the side that degrades the close, never hide
    val (confirmed, transient) = Bench.classifyOutliers(
      Seq("q_x", "q_y"), Map("q_x" -> 1.0), Map("q_y" -> 0.5))
    assert(confirmed === Seq("q_x", "q_y"))
    assert(transient === Seq())
  }

  test("outlier retest: boundary sits exactly at the 2.5x detector line") {
    val (confirmed, transient) = Bench.classifyOutliers(
      Seq("q_at", "q_over"), Map("q_at" -> 1.0, "q_over" -> 1.0),
      Map("q_at" -> 2.5, "q_over" -> 2.5000001))
    assert(transient === Seq("q_at"))
    assert(confirmed === Seq("q_over"))
  }

  test("detector envelope: 1 s absolute-delta floor (VERDICT r13 §5)") {
    // sub-second baseline, 3x ratio but only 0.6 s over: must NOT flag
    assert(!Bench.isOutlier(0.9, 0.3))
    // 1 s -> 3.6 s: ratio 3.6x AND delta 2.6 s — must flag
    assert(Bench.isOutlier(3.6, 1.0))
    // ratio at the line is not over it
    assert(!Bench.isOutlier(2.5, 1.0))
    // big delta but ratio under 2.5x (10 s -> 20 s): not an outlier
    assert(!Bench.isOutlier(20.0, 10.0))
    // delta exactly 1 s is not over the floor (4 s = 4x of 1 s... pick
    // a case where only the floor decides: 0.8 -> 1.8 is 2.25x, use
    // 0.5 -> 1.5: ratio 3x, delta exactly 1.0 — on the floor, no flag)
    assert(!Bench.isOutlier(1.5, 0.5))
    // missing/zero baseline never flags
    assert(!Bench.isOutlier(5.0, 0.0))
  }

  test("retest classification honors the same floor (ADVICE r13)") {
    // q_f: 0.3 s baseline, retest 0.9 s — 3x but under the 1 s floor,
    // the detector would not flag that timing, so the retest must read
    // it as TRANSIENT, not confirm it
    val (confirmed, transient) = Bench.classifyOutliers(
      Seq("q_f", "q_r"), Map("q_f" -> 0.3, "q_r" -> 1.0),
      Map("q_f" -> 0.9, "q_r" -> 3.6))
    assert(transient === Seq("q_f"))
    assert(confirmed === Seq("q_r"))
  }

  test("iowait/steal gate: cpu-line parse picks fields 5+9 (VERDICT r13)") {
    //            user nice sys  idle iowait irq softirq steal guest
    val line = "cpu  100  10   50   800  30     5   5       20    0"
    val (busy, stall, total) = Bench.parseCpuLine(line)
    assert(busy === 160)   // user+nice+system only
    assert(stall === 50)   // iowait + steal
    assert(total === 1020)
    // pre-2.6.33 kernels have no steal field: iowait alone, no throw
    val old = "cpu  100 10 50 800 30 5 5"
    assert(Bench.parseCpuLine(old) === ((160L, 30L, 1000L)))
    // malformed line fails to (-1,-1,-1), the gate-neutral sentinel
    assert(Bench.parseCpuLine("cpu garbage") === ((-1L, -1L, -1L)))
  }

  test("iowait/steal gate: stall fraction from synthetic jiffy deltas") {
    // 40 stall jiffies over a 1000-jiffy window = 4% — under the gate
    assert(Bench.stallFrac(10, 50, 0, 1000) === 0.04)
    // failed snapshot on either side is -1 (gate-neutral, not 0)
    assert(Bench.stallFrac(-1, 50, 0, 1000) === -1.0)
    assert(Bench.stallFrac(10, -1, 0, 1000) === -1.0)
    // no elapsed jiffies cannot divide
    assert(Bench.stallFrac(10, 50, 1000, 1000) === -1.0)
    // counter regression (proc restart) clamps at 0, never negative
    assert(Bench.stallFrac(50, 10, 0, 1000) === 0.0)
  }

  test("no flags means nothing to classify (zero-cost path)") {
    assert(Bench.classifyOutliers(Seq(), Map("q" -> 1.0), Map())
      === ((Seq(), Seq())))
  }

  test("count overrides parse strictly: positive ints only (ADVICE r14)") {
    assert(Bench.parsePosInt("SPARK_GRAFT_CPUS", "32") === 32)
    assert(Bench.parsePosInt("X", " 8 ") === 8)
    for (bad <- Seq("auto", "", "0", "-4", "3.5", "1e3"))
      assertThrows[IllegalArgumentException](Bench.parsePosInt("X", bad))
  }

  test("env_overrides stamp: SPARK_GRAFT_* only, sorted, JSON-escaped") {
    val env = Map(
      "SPARK_GRAFT_SHUFFLE_PARTS" -> "512",
      "SPARK_GRAFT_WINNOW_GROUPS" -> "1",
      "SPARK_GRAFT_INIT_PARTS" -> "256",
      "PATH" -> "/usr/bin",
      "HOME" -> "/root")
    assert(Bench.envOverridesJson(env) ===
      """{"SPARK_GRAFT_INIT_PARTS":"256","SPARK_GRAFT_SHUFFLE_PARTS":"512","SPARK_GRAFT_WINNOW_GROUPS":"1"}""")
    assert(Bench.envOverridesJson(Map("HOME" -> "/root")) === "{}")
    // a hostile value cannot break the artifact's JSON
    assert(Bench.envOverridesJson(Map("SPARK_GRAFT_X" -> "a\"b\\c\nd"))
      === "{\"SPARK_GRAFT_X\":\"a\\\"b\\\\c\\u000ad\"}")
  }

  test("close retry: once, only on uncertified, only when enabled (VERDICT r14 #5)") {
    assert(Bench.shouldRetry("uncertified", 1, enabled = true))
    // bounded: never a second retry
    assert(!Bench.shouldRetry("uncertified", 2, enabled = true))
    // "degraded" is a real slowdown to chase, not host noise — no retry
    assert(!Bench.shouldRetry("degraded", 1, enabled = true))
    assert(!Bench.shouldRetry("ok", 1, enabled = true))
    assert(!Bench.shouldRetry("uncertified", 1, enabled = false))
  }

  test("close grading: attempt-2 passes are ok-retry, never ok (ADVICE r15)") {
    assert(Bench.gradeClose(certified = true, confirmed = false, attempt = 1) === "ok")
    // warm-cache/JIT advantaged re-run: indicative only, refresh-ineligible
    assert(Bench.gradeClose(certified = true, confirmed = false, attempt = 2) === "ok-retry")
    // host/outlier gates outrank the attempt distinction
    assert(Bench.gradeClose(certified = false, confirmed = false, attempt = 2) === "uncertified")
    assert(Bench.gradeClose(certified = true, confirmed = true, attempt = 2) === "degraded")
    // and ok-retry never triggers another retry
    assert(!Bench.shouldRetry("ok-retry", 2, enabled = true))
  }

  test("the committed BENCH_BASELINE.json round-trips through the parser") {
    val p = java.nio.file.Paths.get("BENCH_BASELINE.json")
    assume(java.nio.file.Files.exists(p))
    val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // the committed baseline always targets the driver's sf0.1 dir
    val m = Bench.parseBaselineQueries(s, "/root/testdata/sf0.1")
    assert(m.size > 100, s"baseline parse collapsed: ${m.size} entries")
    assert(m.values.forall(v => v > 0 && v < 600))
  }
}
