package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Fused product-quantization kernels ([[graft.ops.Similarity.qVecPq]] /
  * `q_sim_pq_topk`). The codebook rides codegen as a reference object
  * (the [[BpePairs]] mechanism — the broadcast-variable analogue for
  * driver-built index state), and each expression is ONE static call, so
  * the generated code stays tiny no matter how many codewords the
  * codebook holds. The first spelling of these queries inlined the
  * whole k×M×sub arithmetic as a literal Column tree (~1k nodes), which
  * shifted seconds of janino compilation onto every fresh plan — the
  * data cost at bench scale was milliseconds.
  *
  * Arithmetic contract (what the DuckDB oracles replay bit-for-bit):
  * every subspace distance is the IN-ORDER sequential sum of squared
  * differences, the argmin scans codewords in ascending code order
  * keeping the FIRST minimum (ties -> lowest code, identical to the
  * struct-min and `ORDER BY d, j` spellings), and the residual sums
  * subspace bests in subspace order. */
private[graft] abstract class PqExpression extends UnaryExpression {
  def codebook: Array[Double] // flat: codeword j's vector at j*dim
  def nCodes: Int
  def nSub: Int

  protected def dim: Int = codebook.length / nCodes

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${t.catalogString}")
  }
}

/** Per-subspace nearest-codeword indices: array of [[nSub]] codes. */
case class PqCodes(child: Expression, codebook: Array[Double],
    nCodes: Int, nSub: Int) extends PqExpression {
  override def prettyName: String = "graft_pq_codes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PqFunctions.codes(input.asInstanceOf[ArrayData], codebook, nCodes, nSub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqFunctions.codes($c, $ref, $nCodes, $nSub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Total squared reconstruction error of the vector's PQ encoding. */
case class PqResidual(child: Expression, codebook: Array[Double],
    nCodes: Int, nSub: Int) extends PqExpression {
  override def prettyName: String = "graft_pq_residual"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    PqFunctions.residual(input.asInstanceOf[ArrayData], codebook, nCodes, nSub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqFunctions.residual($c, $ref, $nCodes, $nSub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The ADC query-side lookup table: nSub arrays of nCodes distances
  * from the query's subvectors to every codeword's. */
case class PqLuts(child: Expression, codebook: Array[Double],
    nCodes: Int, nSub: Int) extends PqExpression {
  override def prettyName: String = "graft_pq_luts"
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PqFunctions.luts(input.asInstanceOf[ArrayData], codebook, nCodes, nSub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqFunctions.luts($c, $ref, $nCodes, $nSub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The ADC distance itself: sum over subspaces of lut[m][code[m]], in
  * subspace order. Binary over the (luts, codes) pair computed by the
  * two expressions above — the per-pair work of a PQ scan. */
case class PqAdc(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<array<double>>, array<bigint>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    PqFunctions.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.PqFunctions.adc($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  /** dist(v's subvector m, codeword j's subvector m): in-order
    * sequential sum of squared differences. */
  private def subDist(v: ArrayData, flat: Array[Double], dim: Int,
      j: Int, m: Int, sub: Int): Double = {
    var dd = 0.0
    var i = 0
    while (i < sub) {
      val diff = v.getDouble(m * sub + i) - flat(j * dim + m * sub + i)
      dd += diff * diff
      i += 1
    }
    dd
  }

  def codes(v: ArrayData, flat: Array[Double], k: Int, nSub: Int): ArrayData = {
    val dim = flat.length / k
    val sub = dim / nSub
    val out = new Array[Any](nSub)
    var m = 0
    while (m < nSub) {
      var bestJ = 0L
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        val dd = subDist(v, flat, dim, j, m, sub)
        if (dd < bestD) { bestD = dd; bestJ = j.toLong }
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }

  def residual(v: ArrayData, flat: Array[Double], k: Int, nSub: Int): Double = {
    val dim = flat.length / k
    val sub = dim / nSub
    var err = 0.0
    var m = 0
    while (m < nSub) {
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        val dd = subDist(v, flat, dim, j, m, sub)
        if (dd < bestD) bestD = dd
        j += 1
      }
      err += bestD
      m += 1
    }
    err
  }

  def luts(v: ArrayData, flat: Array[Double], k: Int, nSub: Int): ArrayData = {
    val dim = flat.length / k
    val sub = dim / nSub
    val out = new Array[Any](nSub)
    var m = 0
    while (m < nSub) {
      val row = new Array[Any](k)
      var j = 0
      while (j < k) {
        row(j) = subDist(v, flat, dim, j, m, sub)
        j += 1
      }
      out(m) = new GenericArrayData(row)
      m += 1
    }
    new GenericArrayData(out)
  }

  def adc(luts: ArrayData, codes: ArrayData): Double = {
    var dist = 0.0
    var m = 0
    val n = codes.numElements()
    while (m < n) {
      dist += luts.getArray(m).getDouble(codes.getLong(m).toInt)
      m += 1
    }
    dist
  }

  def codes(c: Column, codebook: Array[Double], k: Int, nSub: Int): Column =
    Bridge.column(PqCodes(Bridge.expression(c), codebook, k, nSub))
  def residual(c: Column, codebook: Array[Double], k: Int, nSub: Int): Column =
    Bridge.column(PqResidual(Bridge.expression(c), codebook, k, nSub))
  def luts(c: Column, codebook: Array[Double], k: Int, nSub: Int): Column =
    Bridge.column(PqLuts(Bridge.expression(c), codebook, k, nSub))
  def adc(l: Column, r: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(l), Bridge.expression(r)))
}
