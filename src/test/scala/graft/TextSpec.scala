package graft

import graft.functions.Winnow
import graft.ops.TextOps

import org.apache.spark.sql.functions._

/** Winnowing fingerprint + regex tokenization semantics. */
class TextSpec extends SparkSpec {

  private def fps(texts: String*): Map[String, Seq[Long]] = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
      .select(col("text"), Winnow.fingerprints(col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
  }

  test("winnow: deterministic, shift-invariant shared substrings") {
    val a = "the quick brown fox jumps over the lazy dog today"
    val b = "PREFIX CHANGED the quick brown fox jumps over the lazy dog"
    val c = "completely different content with zero overlap at all"
    val m = fps(a, b, c)
    assert(m(a) === fps(a)(a), "fingerprints must be deterministic")
    val shared = m(a).toSet intersect m(b).toSet
    val unrelated = m(a).toSet intersect m(c).toSet
    assert(shared.size > unrelated.size,
      s"shared-substring docs share ${shared.size} fps, unrelated ${unrelated.size}")
  }

  test("winnow: short strings yield one fingerprint, empty yields none") {
    val m = fps("tiny", "")
    assert(m("tiny").isEmpty)        // shorter than k=16 -> no k-gram
    assert(m("").isEmpty)
    val s16 = "exactly 16 chars"     // one k-gram window
    assert(fps(s16)(s16).length === 1)
  }

  test("winnow SQL registration") {
    Winnow.register(spark)
    val n = spark.sql(
      "SELECT size(winnow_fingerprints('the quick brown fox jumps')) AS n")
      .head().getInt(0)
    assert(n >= 1)
  }

  test("regex tokenization counts alpha runs, digit runs, punctuation") {
    val s = spark
    import s.implicits._
    val row = Seq((1L, "ab12 cd! ab")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("u"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("textspec").toString
    row.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.qTextTokensRegex.fn(spark, dir).head()
    // tokens: ab, 12, cd, !, ab -> 5 total, 4 distinct
    assert(out.getInt(1) === 5)
    assert(out.getInt(2) === 4)
  }
}
