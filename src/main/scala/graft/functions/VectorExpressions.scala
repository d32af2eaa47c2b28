package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst vector expressions (SURVEY.md §7.3 "custom code we
  * actually write").
  *
  * The built-in spelling of a dot product — `aggregate(zip_with(a, b,
  * (p,q) => p*q), 0d, (acc,v) => acc+v)` — is a HigherOrderFunction:
  * interpreted per element with lambda-variable dispatch and a materialized
  * intermediate array, and it blocks whole-stage codegen. For pairwise
  * similarity (the O(n·k) hot loop of dedup and ANN) that interpretive
  * overhead dominates. These expressions generate a fused primitive loop
  * instead, and keep exactly the HOF formula's floating-point op order —
  * left-to-right accumulation, dot/(sqrt(na)*sqrt(nb)) — so swapping them
  * in cannot change any oracle-checked output bit.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** Cosine similarity over two array<double> columns: one fused pass
  * computing dot, |a|^2, |b|^2. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, na, nb, i) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"))
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double xi = $a.getDouble($i);
        |  double yi = $b.getDouble($i);
        |  $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
        |}
        |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Plain dot product — the kernel for pre-normalized embeddings, where
  * cosine(a,b) = dot(a,b) and the per-pair norm work disappears. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, i) = (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("i"))
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $dot += $a.getDouble($i) * $b.getDouble($i);
        |}
        |${ev.value} = $dot;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Int8 quantization summary of an array<double> vector in ONE fused
  * pass: struct(scale, q_sum, q_l1) where scale = 127 / max|x_i| (0 for
  * the zero vector), q_i = floor(x_i * scale + 0.5) — the deterministic
  * round both engines compute bit-identically — and q_sum / q_l1 are the
  * exact integer sums of q_i / |q_i|. Vector compression for embedding
  * storage is a standard corpus-pipeline pass; the HOF spelling would be
  * three interpreted lambda chains and three passes over the array. */
case class QuantizeStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_quantize"

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_l1", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = 0.0; var i = 0
    while (i < n) { mx = math.max(mx, math.abs(x.getDouble(i))); i += 1 }
    val sc = if (mx == 0.0) 0.0 else 127.0 / mx
    var qs = 0L; var ql = 0L; i = 0
    while (i < n) {
      val q = math.floor(x.getDouble(i) * sc + 0.5).toLong
      qs += q; ql += math.abs(q)
      i += 1
    }
    new GenericInternalRow(Array[Any](sc, qs, ql))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (n, mx, sc, qs, ql, i) = (ctx.freshName("n"), ctx.freshName("mx"),
        ctx.freshName("sc"), ctx.freshName("qs"), ctx.freshName("ql"),
        ctx.freshName("i"))
      s"""
        |int $n = $a.numElements();
        |double $mx = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $mx = java.lang.Math.max($mx, java.lang.Math.abs($a.getDouble($i)));
        |}
        |double $sc = $mx == 0.0 ? 0.0 : 127.0 / $mx;
        |long $qs = 0L, $ql = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  long q = (long) java.lang.Math.floor($a.getDouble($i) * $sc + 0.5);
        |  $qs += q; $ql += java.lang.Math.abs(q);
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        |  new Object[]{$sc, $qs, $ql});
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Fused codegen cosine — drop-in for the HOF spelling, same FP results. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(expr(a), expr(b)))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(expr(a), expr(b)))

  /** Fused int8-quantization summary: struct(scale, q_sum, q_l1). */
  def quantizeStats(v: Column): Column =
    Bridge.column(QuantizeStats(expr(v)))

  /** Expose the expressions to SQL: `SELECT graft_cosine(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_cosine",
      es => CosineSim(es.head, es(1)))
    Bridge.registerFunction(spark, "graft_dot",
      es => DotProduct(es.head, es(1)))
  }

  private def expr(c: Column): Expression = Bridge.expression(c)
}
