package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 8-plane MinHash signature of a shingle array, in one pass.
  *
  * Bit-identical to the portable spelling the DuckDB oracle runs —
  * `h_i = min(substring(md5(seed || shingle), (i%4)*8+1, 8))` with seeds
  * `"0:"`/`"1:"` — because a lexicographic min over fixed-width lowercase
  * hex IS the numeric min of the corresponding unsigned 32-bit chunk.
  * The built-in spelling costs ten interpreted HOF passes per document
  * (two md5 transforms materializing hex-string arrays, then eight
  * substring+array_min passes); this expression digests each shingle
  * twice into a stack buffer, tracks eight integer minima, and formats
  * hex once at the end. Codegen emits a static call so the surrounding
  * stage stays whole-stage-compiled.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val Seed0 = "0:".getBytes("UTF-8")
  private val Seed1 = "1:".getBytes("UTF-8")

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(shingles: ArrayData): ArrayData = {
    val mins = Array.fill(8)(0xFFFFFFFFL)
    val md = digest.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val bytes = shingles.getUTF8String(i).getBytes
      var seed = 0
      while (seed < 2) {
        md.reset()
        md.update(if (seed == 0) Seed0 else Seed1)
        md.update(bytes)
        val h = md.digest()
        var c = 0
        while (c < 4) {
          val v = ((h(c * 4) & 0xffL) << 24) | ((h(c * 4 + 1) & 0xffL) << 16) |
            ((h(c * 4 + 2) & 0xffL) << 8) | (h(c * 4 + 3) & 0xffL)
          val idx = seed * 4 + c
          if (v < mins(idx)) mins(idx) = v
          c += 1
        }
        seed += 1
      }
      i += 1
    }
    val out = new Array[Any](8)
    var j = 0
    while (j < 8) {
      out(j) = UTF8String.fromString(f"${mins(j)}%08x")
      j += 1
    }
    new GenericArrayData(out)
  }

  /** array<string> of the 8 per-plane minima (lowercase hex, 8 chars). */
  def minhash(c: Column): Column =
    Bridge.column(MinHashSig(Bridge.expression(c)))
}
