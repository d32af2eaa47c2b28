package graft

import graft.ops.Curation

import org.apache.spark.sql.functions._

/** Semantics of the curation surface on hand-built corpora: repetition
  * ratios, deterministic sampling, heavy hitters, PII redaction.
  */
class CurationSpec extends SparkSpec {

  private val tmp = java.nio.file.Files.createTempDirectory("curation").toString

  private def docs(rows: (Long, String)*): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("unit"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
  }

  test("repetition: all-same tokens max out both ratios; all-distinct zero them") {
    docs(
      1L -> "a a a a",             // 3 bigrams, 1 distinct; top token 4/4
      2L -> "w x y z")             // all distinct
    val got = Curation.qTextRepetition.fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) === ((0.67, 1.0)))  // 1 - 1/3 = 0.666..., r2 -> 0.67
    assert(got(2L) === ((0.0, 0.25)))
  }

  test("hash sampling is deterministic and stratified quotas are exact") {
    val a = Curation.qSampleHash.fn(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = Curation.qSampleHash.fn(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a === b && a.nonEmpty)
    val strat = Curation.qSampleStratified.fn(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(strat.nonEmpty)
    assert(strat.forall { case (n, mx) => n <= 20 && mx <= 20 && n == mx })
  }

  test("heavy hitters rank token frequencies per source") {
    docs(
      1L -> "z z z y y x",
      2L -> "y z w")
    val got = Curation.qAggHeavyHitters.fn(spark, tmp).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    assert(got.take(3).toSeq === Seq(("z", 4L, 1), ("y", 3L, 2), ("w", 1L, 3)))
  }

  test("PII scrub counts and redacts planted + in-text emails and numbers") {
    docs(
      7L -> "reach me at bob@host.org or call 123456 now")
    val Array(r) = Curation.qTextPiiScrub.fn(spark, tmp).collect()
    // in-text email + planted user7@example.com; in-text 123456 + planted 7*1234567
    assert(r.getInt(1) === 2, s"emails: $r")
    assert(r.getInt(2) === 2, s"longnums: $r")
    // clean text carries the placeholders, not the originals
    val cleanLen = r.getInt(3)
    val expected = ("reach me at <EMAIL> or call <NUM> now" +
      " contact <EMAIL> ref <NUM>").length
    assert(cleanLen === expected, s"clean_len $cleanLen != $expected")
  }
}
