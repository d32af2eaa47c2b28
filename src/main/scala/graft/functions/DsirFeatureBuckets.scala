package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The DSIR hashed-feature pass fused into one expression: for a
  * space-separated text, the 2-hex-char md5-prefix bucket of every word
  * unigram and adjacent bigram, WITH multiplicity, unigrams first —
  * bit-identical to the built-in spelling
  * `transform(concat(tk, zip_with(slice(tk,1,n-1), slice(tk,2,n-1),
  * (a,b) -> concat_ws(' ', a, b))), f -> substring(md5(binary(f)),1,2))`
  * over `tk = split(text, ' ')`, which the DuckDB oracle replicates.
  *
  * That spelling is interpreted HOFs end to end (zip_with + transform
  * lambdas, two slice copies, a concat per bigram); measured at sf0.1
  * it dominated q_dsir_weights' runtime. This expression does one pass:
  * per feature one incremental md5 over the token bytes (bigrams feed
  * the digest token-by-token — the joined string is never allocated)
  * and a 2-char prefix, emitted inside whole-stage codegen.
  */
case class DsirFeatureBuckets(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_dsir_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${t.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DsirFeatureBuckets.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DsirFeatureBuckets.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirFeatureBuckets {
  private val HexDigits = "0123456789abcdef".toCharArray
  private val SpaceByte = Array[Byte](' ')

  private val digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First two lowercase-hex chars of md5 over the given byte chunks. */
  private def bucket(chunks: Array[Byte]*): UTF8String = {
    val md = digest.get()
    md.reset()
    chunks.foreach(md.update)
    val d = md.digest()
    val out = new Array[Byte](2)
    out(0) = HexDigits((d(0) >> 4) & 0xf).toByte
    out(1) = HexDigits(d(0) & 0xf).toByte
    UTF8String.fromBytes(out)
  }

  /** One-pass bucket stream: matches `split(text, ' ', -1)` semantics
    * (consecutive separators yield empty tokens); n unigrams followed
    * by n-1 bigrams, each bucket = substring(md5(feature), 1, 2). */
  def compute(text: UTF8String): ArrayData = {
    val toks = text.split(UTF8String.fromString(" "), -1)
    val n = toks.length
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bytes(i) = toks(i).getBytes; i += 1 }
    val out = new Array[Any](n + math.max(0, n - 1))
    i = 0
    while (i < n) { out(i) = bucket(bytes(i)); i += 1 }
    i = 0
    while (i < n - 1) {
      out(n + i) = bucket(bytes(i), SpaceByte, bytes(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  def buckets(c: Column): Column =
    Bridge.column(DsirFeatureBuckets(Bridge.expression(c)))
}
