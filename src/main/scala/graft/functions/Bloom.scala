package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter over a string column, as a bit set flattened to
  * array<long> — the engine's runtime semi-join reduction primitive.
  *
  * The pattern it exists for (and the one Spark's own
  * `InjectRuntimeFilter` applies to plain equi-joins, but cannot see
  * through an aggregate): when a big stream joins a SMALL key set,
  * aggregate the small side into a bloom filter, broadcast that single
  * fixed-size row, and drop non-matching big-side rows MAP-SIDE before
  * they reach the shuffle. No false negatives means every true match
  * survives; false positives only let a few extra rows through to the
  * exact join that follows, so the final result is bit-identical to the
  * unpruned plan — the filter buys shuffle reduction, never correctness.
  *
  * Determinism: inserts are bit ORs and the merge is a word-wise OR —
  * both commutative and idempotent — so the sketch is identical under
  * any partitioning, task order, or cluster size. Hashing is
  * Murmur3_x86_32 over the UTF-8 bytes with fixed seeds (the
  * Kirsch–Mitzenmacher double-hashing scheme), deterministic across
  * JVMs by spec.
  *
  * Sizing: the default 2^20 bits (128 KiB) holds ~100k distinct keys at
  * k=5 under a 1% false-positive rate; at 100 TB you'd size numBits to
  * the expected probe-side cardinality (the SMALL side — that is the
  * point), not the corpus.
  *
  * Self-describing output: the emitted array is `[k, word0, word1, ...]`
  * — both the bit count (from the length) and the hash count ride in
  * the sketch, so a probe can never run with a k that differs from the
  * build's (which would silently break the no-false-negative
  * guarantee).
  */
case class BloomAgg(
    child: Expression,
    numBits: Int = BloomFunctions.DefaultBits,
    k: Int = BloomFunctions.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && (numBits & 63) == 0,
    s"graft_bloom numBits must be a positive multiple of 64, got $numBits")
  require(k > 0, s"graft_bloom k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      BloomFunctions.insert(buf, v.asInstanceOf[UTF8String].getBytes, k)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(k.toLong +: buf)

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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_bloom"
}

/** Membership probe against a [[BloomAgg]] sketch (k and numBits both
  * read FROM the sketch — a probe cannot disagree with the build).
  * Unlike [[CmsEstimate]] (which runs on a handful of extraction rows),
  * this sits in the corpus-stream hot path — one call per big-side
  * row — so it generates a fused primitive loop and stays inside
  * whole-stage codegen. */
case class BloomMightContain(
    left: Expression,   // sketch: array<long>, [k, words...]
    right: Expression)  // key: string
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (array<long>, string), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(sk: Any, key: Any): Any =
    BloomFunctions.mightContain(
      sk.asInstanceOf[ArrayData],
      key.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, key) => {
      s"""
        |${ev.value} = graft.functions.BloomFunctions.mightContain(
        |  $sk, $key);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_bloom_contains"
}

object BloomFunctions {
  /** 2^20 bits = 128 KiB: ~1% FPR at 100k keys, k=5. */
  val DefaultBits: Int = 1 << 20
  val DefaultK: Int = 5

  private def h(bytes: Array[Byte], seed: Int): Int =
    Murmur3_x86_32.hashUnsafeBytes(
      bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)

  /** Set the k double-hashed bits for `bytes` in `words`. */
  def insert(words: Array[Long], bytes: Array[Byte], k: Int): Unit = {
    val numBits = words.length * 64
    val h1 = h(bytes, 0)
    val h2 = h(bytes, 1)
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(
        h1.toLong + i.toLong * h2.toLong, numBits.toLong).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** True iff all k bits for `key` are set (false-positive capable,
    * false-negative free). `sketch` is `[k, words...]` as [[BloomAgg]]
    * emits — both parameters of the build travel in the sketch. Called
    * from generated code — keep the signature JVM-primitive-friendly. */
  def mightContain(sketch: ArrayData, key: UTF8String): Boolean = {
    // The function is SQL-registered (graft_bloom_contains), so arbitrary
    // array<long> values can reach it: fail descriptively on non-sketch
    // input instead of reading out of bounds / modulo-zero crashing a task.
    if (sketch.numElements() < 2)
      throw new IllegalArgumentException(
        s"graft_bloom_contains: sketch must be [k, words...] with >= 1 word, " +
          s"got ${sketch.numElements()} element(s)")
    val k = sketch.getLong(0).toInt
    if (k < 1 || k > 64)
      throw new IllegalArgumentException(
        s"graft_bloom_contains: hash count k=$k out of sane range [1, 64]; " +
          "not a BloomAgg sketch?")
    val numBits = (sketch.numElements() - 1) * 64
    val bytes = key.getBytes
    val h1 = h(bytes, 0)
    val h2 = h(bytes, 1)
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(
        h1.toLong + i.toLong * h2.toLong, numBits.toLong).toInt
      if ((sketch.getLong(1 + (bit >>> 6)) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  def bloom(c: Column, numBits: Int = DefaultBits, k: Int = DefaultK): Column =
    Bridge.column(
      BloomAgg(Bridge.expression(c), numBits, k).toAggregateExpression())

  def mightContain(sketch: Column, key: Column): Column =
    Bridge.column(BloomMightContain(
      Bridge.expression(sketch), Bridge.expression(key)))
}
