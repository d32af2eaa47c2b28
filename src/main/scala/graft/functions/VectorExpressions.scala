package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

object VectorFunctions {
  /** Fused codegen cosine — drop-in for the HOF spelling, same FP results. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(expr(a), expr(b)))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(expr(a), expr(b)))

  /** Expose the expressions to SQL: `SELECT graft_cosine(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_cosine",
      es => CosineSim(es.head, es(1)))
    Bridge.registerFunction(spark, "graft_dot",
      es => DotProduct(es.head, es(1)))
  }

  private def expr(c: Column): Expression = Bridge.expression(c)
}
