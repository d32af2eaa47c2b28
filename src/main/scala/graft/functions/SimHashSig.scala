package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit token-frequency-weighted SimHash of a token array, in one pass.
  *
  * Same value as the relational spelling (explode tokens → count per
  * (doc, token) → md5-derived 32-bit plane per token → 32 signed
  * weighted bit sums → sign bits): integer sums are order-independent,
  * so folding per-doc map-side is exact, and it deletes the per-token
  * groupBy shuffle plus 32 per-row aggregate expressions. Plane `i` of a
  * token is bit `i` of its md5's first 4 bytes (the `conv(substring(md5,
  * 1, 8), 16, 10)` value); a token votes +count on set bits, −count on
  * clear bits; the signature sets bit `i` iff the sum is positive.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(tokens: ArrayData): Long = {
    val counts = new java.util.HashMap[UTF8String, Int]()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      counts.merge(t, 1, Integer.sum)
      i += 1
    }
    val sums = new Array[Long](32)
    val md = digest.get()
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      md.reset()
      md.update(e.getKey.getBytes)
      val h = md.digest()
      val plane = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      val cnt = e.getValue.toLong
      var b = 0
      while (b < 32) {
        if (((plane >> b) & 1L) == 1L) sums(b) += cnt else sums(b) -= cnt
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  def simhash(c: Column): Column =
    Bridge.column(SimHashSig(Bridge.expression(c)))
}
