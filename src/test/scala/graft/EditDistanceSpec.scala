package graft

import graft.functions.{EditDistanceFunctions, EditDistanceKernel}

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Exactness of the bit-parallel Levenshtein kernel (Myers/Hyyrö) —
  * the q_dedup_editdist hot path. Two independent pins: an in-process
  * property sweep against a textbook two-row DP over code points, and
  * a DataFrame-level sweep against Spark's own `levenshtein` (the
  * expression the DuckDB oracle is known to hash-match). */
class EditDistanceSpec extends SparkSpec {

  /** Independent reference: the classic two-row DP over code points —
    * deliberately naive, shares no code with the kernel under test. */
  private def refDp(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    var prev = Array.tabulate(y.length + 1)(identity)
    var curr = new Array[Int](y.length + 1)
    var i = 1
    while (i <= x.length) {
      curr(0) = i
      var j = 1
      while (j <= y.length) {
        val sub = prev(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1)
        curr(j) = math.min(math.min(prev(j) + 1, curr(j - 1) + 1), sub)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(y.length)
  }

  private def kernel(a: String, b: String): Int =
    EditDistanceKernel.dist(UTF8String.fromString(a), UTF8String.fromString(b))

  test("hand-picked edges: empties, equality, prefixes, full rewrite") {
    val cases = Seq(
      ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
      ("abc", "abd"), ("abc", "ab"), ("kitten", "sitting"),
      ("flaw", "lawn"), ("abcdef", "fedcba"), ("a", "b"))
    cases.foreach { case (a, b) =>
      assert(kernel(a, b) === refDp(a, b), s"($a, $b)")
    }
    // two known-by-hand anchors so the reference DP itself is pinned
    assert(kernel("kitten", "sitting") === 3)
    assert(kernel("", "xyz") === 3)
  }

  test("boundary lengths around the 64-row block edge: 63/64/65/128/129") {
    val rnd = new scala.util.Random(4242)
    val alpha = "abcd" // small alphabet → high match density in Peq
    def randStr(n: Int) =
      Array.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    for (la <- Seq(1, 63, 64, 65, 127, 128, 129, 200);
         lb <- Seq(1, 63, 64, 65, 127, 128, 129, 200)) {
      val a = randStr(la); val b = randStr(lb)
      assert(kernel(a, b) === refDp(a, b),
        s"len ($la, $lb): '$a' vs '$b'")
    }
  }

  test("property sweep: 2000 random ASCII pairs match the reference DP") {
    val rnd = new scala.util.Random(171717)
    (1 to 2000).foreach { k =>
      val la = rnd.nextInt(400); val lb = rnd.nextInt(400)
      // mixed alphabet sizes: tiny (dense Peq rows) through printable
      val span = 1 + rnd.nextInt(60)
      def mk(n: Int) =
        Array.fill(n)(('a' + rnd.nextInt(span)).toChar).mkString
      val a = mk(la); val b = mk(lb)
      assert(kernel(a, b) === refDp(a, b), s"case $k: '$a' vs '$b'")
    }
  }

  test("near-duplicate shapes: long shared cores with small edits") {
    val rnd = new scala.util.Random(99)
    val core = Array.fill(347)(('a' + rnd.nextInt(26)).toChar).mkString
    val edits = Seq(
      core, core.drop(3), core.take(300), "xyz" + core,
      core.updated(100, 'Z').toString, core.reverse,
      core.take(170) + "INSERTED" + core.drop(170))
    for (a <- edits; b <- edits)
      assert(kernel(a, b) === refDp(a, b))
  }

  test("non-ASCII: multi-byte and supplementary-plane code points") {
    val cases = Seq(
      ("héllo", "hello"), ("日本語のテキスト", "日本語のテクスト"),
      ("αβγδε" * 30, "αβγδζ" * 30), // >64 code points, 2-byte chars
      ("a😀b", "ab"),      // U+1F600 is ONE code point, not two
      ("😀" * 70, "😁" * 70),
      ("mixedASCIIと日本語", "mixedASCIIと日本語です"))
    cases.foreach { case (a, b) =>
      assert(kernel(a, b) === refDp(a, b), s"'$a' vs '$b'")
    }
    // one code point of edit, two UTF-16 units: byte- or unit-based
    // implementations would answer 2
    assert(kernel("a😀b", "ab") === 1)
  }

  test("DataFrame parity with the built-in levenshtein on fixture text") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(60)
    val pairs = docs.as("x").crossJoin(
        docs.select(col("doc_id").as("id2"), col("text").as("text2")).as("y"))
      .where(col("doc_id") < col("id2"))
    val diff = pairs.select(
        levenshtein(col("text"), col("text2")).as("builtin"),
        EditDistanceFunctions.levenshteinFast(col("text"), col("text2"))
          .as("fast"))
      .where(col("builtin") =!= col("fast"))
    assert(diff.count() === 0)
    // null semantics match the built-in: null in → null out
    val nulls = Seq((Some("a"), None: Option[String]), (None, Some("b")),
      (None, None), (Some("a"), Some("ab"))).toDF("a", "b")
    val got = nulls.select(
      EditDistanceFunctions.levenshteinFast(col("a"), col("b"))).collect()
    assert(got.map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq ===
      Seq(-1, -1, -1, 1))
  }
}
