package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Morton (Z-order) key of two integer columns: interleave the low 32
  * bits of each (x in the even bit positions, y in the odd), so sorting
  * by the result clusters rows that are close in BOTH dimensions — the
  * standard multi-dimensional clustering key (public technique; the
  * same curve Delta/Iceberg-style OPTIMIZE ZORDER sorts by).
  *
  * Feed it to [[graft.sources.Layout.clustered]]: a range write on the
  * z-key yields files whose per-file min/max of EACH source column span
  * only a fraction of its domain, so a 2-d box predicate skips most
  * files — where clustering on one column alone leaves the other
  * column's ranges covering the full domain in every file (LayoutSpec
  * measures exactly this).
  *
  * Domain note: bit interleaving weights both columns' raw bit widths
  * equally, so inputs should sit in comparable unsigned ranges — map
  * values to ranks/buckets first if the domains are wildly skewed
  * (the same pre-step every z-order implementation needs). Negative
  * inputs are rejected (sign bits would invert the curve's locality).
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_zvalue"

  override def dataType: DataType = LongType

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two integral columns, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(x: Any, y: Any): Any =
    ZValue.interleave(
      x.asInstanceOf[Number].longValue(),
      y.asInstanceOf[Number].longValue())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZValue.interleave((long)$a, (long)$b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValue {
  /** Spread the low 32 bits of v over the even bit positions of a long
    * (the classic parallel-prefix bit dilation). */
  private def dilate(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Static so generated code calls it directly (stays in the
    * whole-stage-codegen span). */
  def interleave(x: Long, y: Long): Long = {
    // out-of-range inputs must throw, not silently fold: a negative
    // would invert the curve, and a value >= 2^32 would alias onto its
    // low 32 bits — far-apart rows would share z-keys and the clustered
    // files would silently stop bounding the source dimensions
    if (x < 0 || y < 0 || x > 0xffffffffL || y > 0xffffffffL)
      throw new IllegalArgumentException(
        s"graft_zvalue needs inputs in [0, 2^32), got ($x, $y) — " +
          "rank/bucket-encode wider or signed domains first")
    dilate(x) | (dilate(y) << 1)
  }

  def zvalue(x: Column, y: Column): Column =
    Bridge.column(ZValue(Bridge.expression(x), Bridge.expression(y)))
}
