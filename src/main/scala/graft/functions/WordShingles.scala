package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-bigram shingles of a space-separated text, in first
  * occurrence order — bit-identical to the built-in spelling
  * `array_distinct(transform(sequence(1, greatest(size(tk)-1, 1)),
  * i -> concat_ws(' ', slice(tk, i, 2))))` over `tk = split(text, ' ')`,
  * which the DuckDB oracle replicates (`string_split` + `list_transform`).
  *
  * That spelling is five nested HigherOrderFunctions, all interpreted:
  * per doc it allocates the token array, an index sequence, a lambda
  * frame per shingle, a slice copy, and an O(n²) array_distinct. This
  * expression does one pass with a hash set. Same output, one
  * allocation per shingle; codegen emits a static call so the
  * surrounding stage stays whole-stage-compiled.
  */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** One-pass shingling. Matches `split(text, ' ', -1)` semantics:
    * consecutive separators yield empty tokens, a single token yields
    * itself as the only "shingle" (the built-in's greatest(..., 1)
    * degenerate case). */
  def compute(text: UTF8String): ArrayData = {
    val space = UTF8String.fromString(" ")
    val toks = text.split(space, -1)
    val n = toks.length
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (n == 1) {
      seen.add(toks(0))
    } else {
      var i = 0
      while (i < n - 1) {
        seen.add(UTF8String.concatWs(space, toks(i), toks(i + 1)))
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def shingles(c: Column): Column =
    Bridge.column(WordShingles(Bridge.expression(c)))
}
