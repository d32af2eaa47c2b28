package graft

import graft.functions._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * Configure at session build (`spark.sql.extensions=graft.GraftExtensions`)
  * for a catalog-level install, or call [[GraftExtensions.registerAll]] on
  * a live session for the temp-function equivalent. Either way,
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works — the preference
  * order the design follows is built-in function > custom Expression >
  * UDF, and this class is what makes the middle tier first-class.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {

  private def foldedDouble(e: Expression, what: String): Double = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case n: java.lang.Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be numeric, got $other")
    }
  }

  private def foldedInt(e: Expression, what: String): Int =
    foldedDouble(e, what).toInt

  /** name -> SQL builder for every custom expression in the engine. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (es => CosineSim(es.head, es(1))),
    "graft_dot" -> (es => DotProduct(es.head, es(1))),
    "graft_shingles" -> (es => WordShingles(es.head)),
    "graft_minhash" -> (es => MinHashSig(es.head)),
    "graft_simhash" -> (es => SimHashSig(es.head)),
    "graft_quantize" -> (es => QuantizeStats(es.head)),
    "graft_zvalue" -> (es => ZValue(es.head, es(1))),
    "graft_cms" -> (es => CountMinAgg(es.head)),
    "graft_cms_est" -> (es => CmsEstimate(es.head, es(1))),
    "graft_bloom" -> (es => BloomAgg(es.head)),
    "graft_bloom_contains" -> (es => BloomMightContain(es.head, es(1))),
    // (k/numBits ride inside the sketch — no parameters to mismatch)
    "graft_vec_avg" -> (es => VectorAvgAgg(es.head)),
    "graft_histogram" -> (es =>
      HistogramAgg(es.head, foldedDouble(es(1), "histogram width"))),
    "winnow_fingerprints" -> {
      case Seq(c) => WinnowFingerprints(c, 16, 8)
      case Seq(c, k, w) =>
        WinnowFingerprints(c, foldedInt(k, "winnow k"), foldedInt(w, "winnow w"))
      case es => throw new IllegalArgumentException(
        s"winnow_fingerprints takes 1 or 3 arguments, got ${es.length}")
    })

  /** Post-hoc registration on a live session (temp functions). */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      Bridge.registerFunction(spark, name, b)
    }
}
