package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Elementwise mean of an array<double> column — the embedding-centroid
  * aggregate. The built-in spelling (`posexplode` to (dim, x) rows, two
  * groupBys, re-assemble with `collect_list` + `transform`) multiplies
  * row volume by the dimensionality and shuffles twice; this aggregate
  * keeps one (count, sums[dim]) buffer per group, merges map-side, and
  * shuffles a single row per group. Arrays shorter than the first-seen
  * dimensionality contribute to their prefix (inputs are fixed-dim in
  * practice).
  */
case class VectorAvgAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorAvgAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_avg expects array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def createAggregationBuffer(): VectorAvgAgg.Buf =
    new VectorAvgAgg.Buf(0L, Array.emptyDoubleArray)

  override def update(buf: VectorAvgAgg.Buf, input: InternalRow): VectorAvgAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums.length < n) {
        val widened = new Array[Double](n)
        System.arraycopy(buf.sums, 0, widened, 0, buf.sums.length)
        buf.sums = widened
      }
      var i = 0
      while (i < n) { buf.sums(i) += arr.getDouble(i); i += 1 }
      buf.count += 1L
    }
    buf
  }

  override def merge(a: VectorAvgAgg.Buf, b: VectorAvgAgg.Buf): VectorAvgAgg.Buf = {
    if (a.sums.length < b.sums.length) {
      val widened = new Array[Double](b.sums.length)
      System.arraycopy(a.sums, 0, widened, 0, a.sums.length)
      a.sums = widened
    }
    var i = 0
    while (i < b.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    a.count += b.count
    a
  }

  override def eval(buf: VectorAvgAgg.Buf): Any =
    if (buf.count == 0L) null
    else {
      val out = new Array[Any](buf.sums.length)
      var i = 0
      while (i < buf.sums.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VectorAvgAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + buf.sums.length * 8)
    bb.putLong(buf.count).putInt(buf.sums.length)
    buf.sums.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvgAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val n = bb.getInt
    val sums = new Array[Double](n)
    var i = 0
    while (i < n) { sums(i) = bb.getDouble; i += 1 }
    new VectorAvgAgg.Buf(count, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_vec_avg"
}

object VectorAvgAgg {
  final class Buf(var count: Long, var sums: Array[Double])

  /** Aggregate column: elementwise mean of array<double> values. */
  def vecAvg(c: Column): Column =
    Bridge.column(
      VectorAvgAgg(Bridge.expression(c)).toAggregateExpression())
}
