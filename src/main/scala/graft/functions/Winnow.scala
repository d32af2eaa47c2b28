package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed rolling-hash document fingerprints (the MOSS/winnowing scheme,
  * Schleimer et al., SIGMOD'03 — public algorithm): polynomial rolling
  * hash over every k-byte window, then the minimum hash of each w-window
  * of those, deduplicated. Edit-robust: documents sharing enough
  * fingerprints share k-byte substrings regardless of position.
  *
  * One pass per document (cold path — selection/yield is the per-pair
  * join, which is plain explode + equi-join on the fingerprint). Codegen
  * emits a static call to [[Winnow.kernel]], so the expression stays
  * inside the whole-stage-codegen span with zero interpretive overhead.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Winnow.kernel(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Winnow.kernel($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object Winnow {
  private val Base = 257L
  private val Mod = 1000000007L

  /** Rolling k-gram hashes + min-of-each-w-window selection, distinct,
    * sorted. Static so generated code can call it directly. */
  def kernel(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling polynomial hash over byte windows of length k
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = pow * Base % Mod; i += 1 }
    val nh = n - k + 1
    val hs = new Array[Long](nh)
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    hs(0) = h
    i = 1
    while (i < nh) {
      h = (h - (bytes(i - 1) & 0xff) * pow % Mod + Mod * Base) % Mod
      h = (h * Base + (bytes(i + k - 1) & 0xff)) % Mod
      hs(i) = h
      i += 1
    }
    // winnow: min of each window of w consecutive hashes (rightmost min)
    val sel = scala.collection.mutable.SortedSet.empty[Long]
    if (nh <= w) {
      var m = hs(0); i = 1
      while (i < nh) { if (hs(i) <= m) m = hs(i); i += 1 }
      sel += m
    } else {
      i = 0
      while (i + w <= nh) {
        var m = hs(i)
        var j = i + 1
        while (j < i + w) { if (hs(j) <= m) m = hs(j); j += 1 }
        sel += m
        i += 1
      }
    }
    new GenericArrayData(sel.toArray)
  }

  def fingerprints(c: Column, k: Int = 16, w: Int = 8): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c), k, w))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerFunction(spark, "winnow_fingerprints", es =>
      WinnowFingerprints(es.head, 16, 8))
}
