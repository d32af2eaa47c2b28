package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch over a string column: depth×width counter matrix,
  * flattened to array<long>.
  *
  * Why count-min and not SpaceSaving for the engine's frequency sketch:
  * CMS updates are counter INCREMENTS and the merge is an elementwise
  * SUM — both order-independent — so the sketch is bit-identical under
  * any partitioning, task order, or cluster size (the property every
  * declared query needs for stable output, and the property SpaceSaving
  * fundamentally lacks: its evictions depend on arrival order). The
  * price is that CMS only estimates *given* keys; pair it with a cheap
  * exact candidate pass (or a per-partition top-k pre-filter) for
  * extraction.
  *
  * Shuffle shape matches [[HistogramAgg]]: ONE row per group carrying
  * the whole sketch, merged map-side — shuffle volume scales with group
  * cardinality × (depth·width·8 bytes), independent of input rows or
  * key cardinality. At 100 TB that replaces the (group, token) shuffle
  * of the exact query — the one whose cost grows with vocabulary — with
  * a fixed-size one.
  *
  * Hashing is Murmur3_x86_32 over the UTF-8 bytes with the row index as
  * seed — deterministic across JVMs/engines by spec.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cms expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].getBytes
      var j = 0
      while (j < depth) {
        buf(j * width + CountMin.slot(s, j, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_cms"
}

/** Point estimate from a [[CountMinAgg]] sketch: min over the depth
  * counters the key hashes to — an upper bound on the true count, within
  * 2N/width of it with high probability. Runs on sketch-extraction rows
  * (a few per group), never on the corpus — interpreted eval is fine
  * outside the hot path. */
case class CmsEstimate(
    left: Expression,   // sketch: array<long>, length = depth * width
    right: Expression,  // key: string
    depth: Int = 4,
    width: Int = 1024)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_est expects (array<long>, string), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(sk: Any, key: Any): Any = {
    val arr = sk.asInstanceOf[ArrayData]
    val s = key.asInstanceOf[UTF8String].getBytes
    var est = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = arr.getLong(j * width + CountMin.slot(s, j, width))
      if (c < est) est = c
      j += 1
    }
    est
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cms_est"
}

object CountMin {
  /** Row-j slot for a key: murmur3(bytes, seed = j) mod width. */
  private[functions] def slot(bytes: Array[Byte], j: Int, width: Int): Int = {
    val h = Murmur3_x86_32.hashUnsafeBytes(
      bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, j)
    java.lang.Math.floorMod(h, width)
  }

  def cms(c: Column, depth: Int = 4, width: Int = 1024): Column =
    Bridge.column(
      CountMinAgg(Bridge.expression(c), depth, width).toAggregateExpression())

  def estimate(sketch: Column, key: Column,
      depth: Int = 4, width: Int = 1024): Column =
    Bridge.column(CmsEstimate(
      Bridge.expression(sketch), Bridge.expression(key), depth, width))
}
