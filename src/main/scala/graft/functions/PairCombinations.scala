package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Lazy generator of the unordered pairs (a, b), a-before-b, of a sorted
  * id array — the inverted-index pair-expansion step of candidate
  * generation.
  *
  * The HOF spelling (`explode(flatten(transform(ids, (x, i) ->
  * transform(slice(ids, i+2, n), y -> struct(x, y)))))`) materializes the
  * whole n·(n-1)/2 pair array per posting list before exploding it —
  * interpreted lambdas, a slice copy per element, and for a hot bucket a
  * single giant allocation. This generator streams the pairs one
  * InternalRow at a time: constant memory per posting list regardless of
  * its size, no lambda dispatch.
  */
case class PairCombinations(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pairs expects array<bigint>, got ${t.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = j < n
        override def next(): InternalRow = {
          val r = InternalRow(arr.getLong(i), arr.getLong(j))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pairs"
}

object PairCombinations {
  /** Generator column: one (a, b) row per unordered pair of `ids`. */
  def pairs(ids: Column): Column =
    Bridge.column(PairCombinations(Bridge.expression(ids)))
}
