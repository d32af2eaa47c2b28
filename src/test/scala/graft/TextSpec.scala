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

  test("tfidf: scores replay the integer idf formula, top-3 total-ordered") {
    val out = TextOps.qTextTfidf.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // independent replay in plain Scala
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.length.toLong
    val dfCount = docs.flatMap(_._2.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    def idf(tok: String): Long =
      java.lang.Long.toBinaryString(n / dfCount(tok)).length.toLong - 1
    val expected = docs.flatMap { case (id, tks) =>
      tks.groupBy(identity).toSeq
        .map { case (t, xs) => (t, xs.length.toLong) }
        .map { case (t, tf) => (id, t, tf, tf * idf(t)) }
        .sortBy { case (_, t, _, sc) => (-sc, t) }
        .take(3).zipWithIndex
        .map { case ((i, t, tf, sc), k) => (i, t, tf, sc, k + 1L) }
    }.sortBy(x => (x._1, x._5))
    assert(out.toSeq === expected)
    // the gate is non-vacuous only if some token is actually rare
    assert(out.exists(_._4 > 0), "all idf scores zero")
  }

  test("lambda matrix replays in plain Scala") {
    val out = TextOps.qScalarLambda.fn(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val expected = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val tk = r.getString(1).split(" ", -1)
        r.getLong(0) -> ((tk.count(_.length >= 5).toLong,
          tk.map(_.length).sum.toLong, tk.contains("the")))
      }.toMap
    assert(out === expected && out.nonEmpty)
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

  test("BPE encode matches hand-applied merges, word by word") {
    val s = spark
    import s.implicits._
    // Hand-derivation against functions.BpeEncode.Merges (rank order):
    //   the     -> th,e -> the
    //   another -> a,n,o,th,e,r -> an,o,th,e,r -> an,o,th,er
    //   testing -> t,e,s,t,in,g -> t,e,s,t,ing -> t,es,t,ing
    //   sting   -> s,t,in,g -> s,t,ing -> st,ing
    val got = Seq("the another testing sting", "a  b", "", "xyz")
      .toDF("text")
      .select(graft.functions.BpeEncode.encode(col("text")))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("the", "an", "o", "th", "er",
      "t", "es", "t", "ing", "st", "ing"))
    assert(got(1) === Seq("a", "b")) // consecutive spaces: no empty word
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq("x", "y", "z")) // no merge applies -> chars
  }

  test("BPE encode seeds by code point: non-BMP input never yields lone surrogates") {
    val s = spark
    import s.implicits._
    // "🦀" is U+1F980 (two Java chars). Per-char seeding would split it
    // into two lone-surrogate "tokens" — invalid UTF-8 through the
    // public facade (ADVICE r5). Code-point seeding keeps it whole.
    val got = Seq("ab 🦀x th🦀e")
      .toDF("text")
      .select(graft.functions.BpeEncode.encode(col("text")))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a", "b", "🦀", "x", "th", "🦀", "e"))
    // no token is an unpaired surrogate half
    got(0).foreach { t =>
      assert(!t.exists(c => Character.isSurrogate(c) && t.length == 1),
        s"lone surrogate token: ${t.map(_.toInt).mkString(",")}")
    }
    // the dynamic-table path shares the kernel — same guarantee
    val dyn = Seq("🦀🦀ab")
      .toDF("text")
      .select(graft.functions.BpeEncode.encodeWith(col("text"),
        Seq("🦀" -> "🦀", "a" -> "b")))
      .collect().map(_.getSeq[String](0))
    assert(dyn(0) === Seq("🦀🦀", "ab"))
  }

  test("fertility report replays the hand-derived token/word/char ratios") {
    val s = spark
    import s.implicits._
    // "the another testing sting": 11 BPE tokens (hand-derived above),
    // 4 words, 25 chars -> 2.75 tok/word, 44.0 tok/100c
    val rows = Seq((1L, "the another testing sting", "a"),
      (2L, "xyz", "b")) // 3 tokens (no merge applies), 1 word, 3 chars
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("textspec_fert").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.qTextFertility.fn(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("a") === ((11L, 4L, 2.75, 44.0)))
    assert(out("b") === ((3L, 1L, 3.0, 100.0)))
  }

  test("BPE query counts the hand-derived sequence; corpus is |-free") {
    val s = spark
    import s.implicits._
    val row = Seq((1L, "the another testing sting")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("u"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("textspec_bpe").toString
    row.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.qTextTokensBpe.fn(spark, dir).head()
    assert(out.getInt(1) === 11) // the|an|o|th|er|t|es|t|ing|st|ing
    assert(out.getInt(2) === 9)  // t, ing repeat
    // The oracle's replace chain delimits tokens with '|' — sound only
    // while the corpus alphabet is [a-z0-9 ]. Pin that at the gate sf.
    val offenders = Tables.documents(spark, "/root/testdata/sf0.01")
      .filter(col("text").rlike("[^a-z0-9 ]")).count()
    assert(offenders === 0L)
  }

  test("length histogram buckets by exact integer log2 of the token count") {
    val s = spark
    import s.implicits._
    // token counts 1, 2, 3, 4, 7, 8 -> buckets 0, 1, 1, 2, 2, 3
    val rows = Seq(1, 2, 3, 4, 7, 8).zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(j => s"w$j").mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("textspec_hist").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("u"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.qTextLengthHist.fn(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got(0L) === ((1L, 1L, 1L, 1L)))   // {1}
    assert(got(1L) === ((2L, 5L, 2L, 3L)))   // {2, 3}
    assert(got(2L) === ((2L, 11L, 4L, 7L)))  // {4, 7}
    assert(got(3L) === ((1L, 8L, 8L, 8L)))   // {8}
  }

  test("token entropy replays in plain Scala: quantized bits, vocab, ttr") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ", -1) // Spark split keeps trailing empties
      val n = toks.length.toLong
      val cnts = toks.groupBy(identity).map(_._2.length.toLong)
      id -> ((n, cnts.size.toLong, cnts.map(c => c * bitlen(n / c)).sum))
    }.toMap
    val got = TextOps.qTextEntropy.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expected && got.nonEmpty)
    // a doc of all-distinct tokens pays ~log2(n) bits per token; a doc of
    // one repeated token pays exactly 1 bit per token (bitlength(1)=1)
    got.values.foreach { case (n, v, e) => assert(e >= n && v <= n) }
  }

  test("OOV rate replays the top-K vocab cut in plain Scala") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
    val vocab = toks.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(TextOps.OovVocabTopK)
      .map(_._1).toSet
    val expected = toks.groupBy(_._1).map { case (s, ts) =>
      val n = ts.length.toLong
      val oov = ts.count(t => !vocab(t._2)).toLong
      s -> ((n, oov, (2000000L * oov + n) / (2 * n)))
    }
    val got = TextOps.qTextOovRate.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5))))
      .toMap
    assert(got === expected && got.nonEmpty)
    // both regimes must be live: some OOV mass, some in-vocab mass
    got.values.foreach { case (n, oov, _) => assert(oov > 0 && oov < n) }
  }
}
