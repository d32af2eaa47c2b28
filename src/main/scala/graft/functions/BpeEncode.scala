package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Subword (BPE) tokenization of a space-separated text against the
  * fixed merge table in the companion — the token count a real training
  * pipeline budgets with, as opposed to the whitespace/regex counts of
  * q_text_tokens / q_text_tokens_regex. Returns the full token array so
  * callers can count, distinct, or pack.
  *
  * Encoding algorithm: each word starts as its character sequence;
  * merges apply in rank order, each merging its pair's occurrences
  * left-to-right non-overlapping. For a well-formed merge table (every
  * pair component is a single character or the output of an EARLIER
  * merge — asserted at class-load below) this is exactly classic greedy
  * lowest-rank-first BPE: when rank r is processed, every lower rank is
  * fully applied and stays applied, because merging (a,b)->ab only
  * creates adjacencies involving ab, and any pair containing ab must
  * postdate rank r in a well-formed table. Rank-order application is
  * also literally a chain of string replacements over a
  * separator-guarded spelling of the token sequence, which is what makes
  * the DuckDB oracle possible: the oracle replays the SAME merge list as
  * nested `replace()` calls (see TextOps.qTextTokensBpe) and must match
  * bit-for-bit.
  *
  * One pass per merge over each word's token buffer, all map-side inside
  * whole-stage codegen (static call, same pattern as [[WordShingles]]).
  * The merge table is a compiled-in constant — the analogue of
  * broadcasting a vocab file to every executor, minus the I/O.
  */
case class BpeEncode(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_bpe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Adjacent within-word token pairs under a DYNAMIC merge table — the
  * map-side half of BPE training ([[graft.ops.Corpus.learnBpeMerges]]):
  * each learning round encodes with the merges learned so far and
  * counts these pairs globally. The table rides codegen as a reference
  * object (the learner's analogue of a broadcast variable — per-round
  * state is k pairs of short strings, driver-side by the same argument
  * as IVF centroids). */
case class BpePairs(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def prettyName: String = "graft_bpe_pairs"

  private lazy val flat: Array[String] =
    merges.flatMap(m => Seq(m._1, m._2)).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.pairsWith(input.asInstanceOf[UTF8String], flat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.pairsWith($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-text BPE encode under a DYNAMIC merge table — the inference
  * half of the learned-table round-trip ([[BpePairs]] is the training
  * half): encoding with [[graft.ops.Corpus.learnBpeMerges]]'s output
  * reproduces the trainer's final tokenization, because both run the
  * identical rank-order left-to-right kernel. Same codegen shape as
  * [[BpePairs]]: the table rides as a reference object (the broadcast
  * analogue — a learned table is k pairs of short strings). */
case class BpeEncodeWith(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def prettyName: String = "graft_bpe_with"

  private lazy val flat: Array[String] =
    merges.flatMap(m => Seq(m._1, m._2)).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.computeWith(input.asInstanceOf[UTF8String], flat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.computeWith($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** The merge table, in rank order (rank = index). A deterministic toy
    * vocabulary over common English letter pairs — stands in for a real
    * learned table; the ENCODER is what's under test, and it is
    * table-independent. Well-formedness (components are single chars or
    * earlier outputs) is required for the rank-order == greedy argument
    * in the class doc and asserted below. */
  val Merges: Vector[(String, String)] = Vector(
    "t" -> "h", // th
    "i" -> "n", // in
    "a" -> "n", // an
    "o" -> "n", // on
    "e" -> "r", // er
    "r" -> "e", // re
    "th" -> "e", // the
    "an" -> "d", // and
    "in" -> "g", // ing
    "e" -> "n", // en
    "e" -> "s", // es
    "o" -> "r", // or
    "t" -> "i", // ti
    "s" -> "t", // st
    "a" -> "r", // ar
    "a" -> "t", // at
    "o" -> "u", // ou
    "l" -> "e", // le
    "er" -> "s", // ers
    "ti" -> "on", // tion
    "s" -> "e", // se
    "d" -> "e", // de
    "c" -> "o", // co
    "r" -> "a", // ra
    "l" -> "i", // li
    "m" -> "e", // me
    "ing" -> "s", // ings
    "w" -> "h", // wh
    "c" -> "h", // ch
    "the" -> "r" // ther
  )

  // Well-formedness gate for the greedy-equivalence argument: every pair
  // component must be a single character or the output of an earlier
  // merge. A violating table would make rank-order application diverge
  // from true greedy BPE (and from the oracle's replace chain).
  {
    val formed = scala.collection.mutable.Set.empty[String]
    Merges.zipWithIndex.foreach { case ((a, b), i) =>
      require((a.length == 1 || formed(a)) && (b.length == 1 || formed(b)),
        s"merge $i ($a, $b) references a token no earlier merge produces")
      formed += (a + b)
    }
  }

  /** [[Merges]] as the flat [a0, b0, a1, b1, …] array the word encoder
    * consumes (rank = index/2). */
  private val MergesFlat: Array[String] =
    Merges.flatMap(m => Seq(m._1, m._2)).toArray

  /** Encode one word (no spaces) against a flat merge array: code
    * points, then merges in rank order, each applied left-to-right
    * non-overlapping. Returns the token buffer and its live length.
    * Seeding iterates by CODE POINT, not Java char: a non-BMP input
    * (emoji) through the public facade must never yield lone-surrogate
    * tokens / invalid UTF-8 (ADVICE r5) — this also matches the DuckDB
    * oracle, whose substring() is code-point based. */
  private def encodeWordTokens(w: String,
      merges: Array[String]): (Array[String], Int) = {
    var toks = new Array[String](w.length)
    var i = 0
    var n = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      toks(n) = new String(Character.toChars(cp))
      n += 1
      i += Character.charCount(cp)
    }
    var m = 0
    while (m + 1 < merges.length && n > 1) {
      val a = merges(m)
      val b = merges(m + 1)
      var r = 0 // read
      var k = 0 // write
      while (r < n) {
        if (r + 1 < n && toks(r) == a && toks(r + 1) == b) {
          toks(k) = a + b; r += 2
        } else {
          toks(k) = toks(r); r += 1
        }
        k += 1
      }
      n = k
      m += 2
    }
    (toks, n)
  }

  private def encodeWord(w: String, merges: Array[String],
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val (toks, n) = encodeWordTokens(w, merges)
    var i = 0
    while (i < n) { out += UTF8String.fromString(toks(i)); i += 1 }
  }

  /** Adjacent within-word token pairs ("a b", space-joined — tokens
    * never contain a space) after applying `merges` (flat pairs array):
    * the map-side unit of BPE LEARNING — counting these globally and
    * taking the argmax is one training round. Word boundaries are
    * respected (pairs never span words), which is why this exists
    * beside [[compute]] (whose output concatenates words). */
  def pairsWith(text: UTF8String, merges: Array[String]): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](s.length / 2 + 4)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) {
          val (toks, n) = encodeWordTokens(s.substring(start, i), merges)
          var j = 0
          while (j + 1 < n) {
            out += UTF8String.fromString(toks(j) + " " + toks(j + 1))
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Whole-text encode: split on single spaces (empty words from
    * consecutive separators contribute no tokens — mirrored by the
    * oracle's list_filter), each word encoded independently, token
    * arrays concatenated in document order. */
  def compute(text: UTF8String): ArrayData = computeWith(text, MergesFlat)

  /** [[compute]] against a caller-supplied flat merge table — the
    * inference half of the learned-table round-trip: feeding
    * [[graft.ops.Corpus.learnBpeMerges]]'s output here reproduces the
    * trainer's final tokenization exactly (same word scan, same
    * rank-order left-to-right kernel as the training passes). */
  def computeWith(text: UTF8String, merges: Array[String]): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](s.length / 3 + 4)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) encodeWord(s.substring(start, i), merges, out)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def encode(c: Column): Column =
    Bridge.column(BpeEncode(Bridge.expression(c)))

  def encodeWith(c: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeWith(Bridge.expression(c), merges))

  def pairs(c: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpePairs(Bridge.expression(c), merges))

  /** The DuckDB replay of the same encode, as SQL over a word column
    * expression `wd`: the word spelled as `|c1||c2||...||cn|` (every
    * token wrapped in `|`, so a merge (a,b) is the literal replacement
    * of `|a||b|` by `|ab|` — boundary-proof because the pattern carries
    * both tokens' full delimiters, and left-to-right non-overlapping
    * `replace` is exactly the encoder's scan order). `|` never occurs in
    * the corpus ([a-z0-9 ] only — asserted by TextSpec). The caller
    * splits the result on `||` after stripping the outer delimiters. */
  def oracleEncodeSql(wd: String): String = {
    val seed = s"('|' || array_to_string(list_transform(" +
      s"range(1, length($wd) + 1), i -> substring($wd, i, 1)), '||') || '|')"
    Merges.foldLeft(seed) { case (acc, (a, b)) =>
      s"replace($acc, '|$a||$b|', '|$a$b|')"
    }
  }
}
