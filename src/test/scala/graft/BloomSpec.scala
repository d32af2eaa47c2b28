package graft

import graft.functions.BloomFunctions
import org.apache.spark.sql.functions._

/** Bloom-filter semantics: the no-false-negative guarantee the exact
  * downstream join relies on, a false-positive sanity bound, and the
  * partitioning-invariance (OR-merge) property every sketch in the
  * engine must satisfy. */
class BloomSpec extends SparkSpec {

  private val keys = (0 until 5000).map(i => s"member_$i")

  test("no false negatives: every inserted key is contained") {
    val s = spark
    import s.implicits._
    val df = keys.toDF("k").repartition(8)
    val sketch = df.agg(BloomFunctions.bloom(col("k")).as("bf"))
    val probed = df.crossJoin(broadcast(sketch))
      .filter(BloomFunctions.mightContain(col("bf"), col("k")))
    assert(probed.count() === keys.size.toLong)
  }

  test("false-positive rate on disjoint keys stays below 2%") {
    val s = spark
    import s.implicits._
    val sketch = keys.toDF("k")
      .agg(BloomFunctions.bloom(col("k")).as("bf"))
    val outsiders = (0 until 20000).map(i => s"outsider_$i").toDF("k")
    val fp = outsiders.crossJoin(broadcast(sketch))
      .filter(BloomFunctions.mightContain(col("bf"), col("k")))
      .count()
    // 5k keys in 2^20 bits, k=5: theoretical FPR ~3e-7; 2% leaves three
    // orders of magnitude of slack before the test gets flaky
    assert(fp < 400, s"false-positive count $fp of 20000")
  }

  test("sketch is bit-identical under any partitioning (OR merge)") {
    val s = spark
    import s.implicits._
    def build(parts: Int): Seq[Long] =
      keys.toDF("k").repartition(parts)
        .agg(BloomFunctions.bloom(col("k")).as("bf"))
        .head().getSeq[Long](0)
    assert(build(1) === build(7))
  }

  test("null keys are skipped, empty input yields the empty sketch") {
    val s = spark
    import s.implicits._
    val withNulls = Seq(Some("a"), None, Some("b")).toDF("k")
      .agg(BloomFunctions.bloom(col("k")).as("bf"))
      .head().getSeq[Long](0)
    val noNulls = Seq("a", "b").toDF("k")
      .agg(BloomFunctions.bloom(col("k")).as("bf"))
      .head().getSeq[Long](0)
    assert(withNulls === noNulls)
    val empty = Seq.empty[String].toDF("k")
      .agg(BloomFunctions.bloom(col("k")).as("bf"))
      .head().getSeq[Long](0)
    // word 0 is the self-describing k header; the bit words are clear
    assert(empty.head === BloomFunctions.DefaultK.toLong)
    assert(empty.tail.forall(_ == 0L))
  }

  test("k rides in the sketch: a non-default build probes correctly") {
    val s = spark
    import s.implicits._
    // build with k=3; the probe has no k parameter to get wrong — it
    // reads the build's k from the sketch header
    val sketch = keys.toDF("k")
      .agg(BloomFunctions.bloom(col("k"), 1 << 16, 3).as("bf"))
    val found = keys.toDF("k").crossJoin(broadcast(sketch))
      .filter(BloomFunctions.mightContain(col("bf"), col("k")))
      .count()
    assert(found === keys.size.toLong)
  }

  test("non-sketch inputs fail descriptively, not with a raw index crash") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val key = UTF8String.fromString("x")
    // graft_bloom_contains is SQL-registered, so any array<long> can
    // arrive: empty, header-only, and garbage-k all must raise the
    // guard's message rather than out-of-bounds / modulo-zero in a task
    for (bad <- Seq(Array.empty[Long], Array(5L), Array(-3L, 0L),
        Array(999L, 0L))) {
      val e = intercept[IllegalArgumentException] {
        BloomFunctions.mightContain(new GenericArrayData(bad), key)
      }
      assert(e.getMessage.contains("graft_bloom_contains"), e.getMessage)
    }
    // the guard must not reject real sketches: round-trip still works
    val s = spark
    import s.implicits._
    val sketch = Seq("a").toDF("k")
      .agg(BloomFunctions.bloom(col("k")).as("bf")).head().getSeq[Long](0)
    assert(BloomFunctions.mightContain(
      new GenericArrayData(sketch.toArray), UTF8String.fromString("a")))
  }
}
