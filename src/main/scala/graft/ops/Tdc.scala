package graft.ops

import graft.Q
import graft.model.TdcFixture
import graft.time.OrbitTime
import org.apache.spark.sql.functions._

/** Declared queries over the TDC domain layer (SURVEY.md §1, §5.2.5):
  * the reference's actual physics shape — per-wire occupancy plus the
  * absolute-time span from the hierarchical orbit clock — run through
  * the driver's DuckDB gate on the embedded golden fixture
  * ([[graft.model.TdcFixture]]; there is no TDC table in the driver's
  * sfDir, so the fixture plays the role the 61-row golden CSV plays in
  * the reference, `code/test/test_data.csv`).
  */
object Tdc {

  /** Occupancy per (FPGA, TDC_CHANNEL) with the exact integer
    * [[OrbitTime.tdcCounts]] time span — the monitor the reference's
    * notebook user builds by hand over the decoded hit frame. */
  val qTdcOccupancy = Q(
    "q_tdc_occupancy",
    (s, _) => {
      val t = OrbitTime.tdcCounts(
        col("ORBIT_CNT"), col("BX_COUNTER"), col("TDC_MEAS"))
      s.createDataFrame(TdcFixture.hits)
        .groupBy("FPGA", "TDC_CHANNEL")
        .agg(count(lit(1)).as("n_hits"),
             min(t).as("t_min"), max(t).as("t_max"))
        .orderBy("FPGA", "TDC_CHANNEL")
    },
    Some {
      val values = TdcFixture.hits
        .map(h => s"(${h.FPGA}, ${h.TDC_CHANNEL}, ${h.ORBIT_CNT}, " +
          s"${h.BX_COUNTER}, ${h.TDC_MEAS})")
        .mkString(",\n             ")
      // ORBIT_CNT literals exceed int32, so DuckDB types them BIGINT and
      // the whole t expression stays in exact 64-bit integer space —
      // matching Spark's LongType bit-for-bit (no sum() -> no HUGEINT
      // widening hazard).
      s"""SELECT FPGA, TDC_CHANNEL, count(*) AS n_hits,
            min((ORBIT_CNT * 3564 + BX_COUNTER) * 30 + TDC_MEAS) AS t_min,
            max((ORBIT_CNT * 3564 + BX_COUNTER) * 30 + TDC_MEAS) AS t_max
          FROM (VALUES $values)
            AS hits(FPGA, TDC_CHANNEL, ORBIT_CNT, BX_COUNTER, TDC_MEAS)
          GROUP BY FPGA, TDC_CHANNEL
          ORDER BY FPGA, TDC_CHANNEL"""
    })

  /** Fine-time (drift-time proxy) spectrum per FPGA in 5-count buckets,
    * computed through the [[graft.functions.HistogramAgg]] sketch — ONE
    * shuffled row per FPGA carrying the whole spectrum (the plan a
    * 40 MHz-rate monitor needs: shuffle volume scales with FPGA count,
    * not hit rate). Exploding the sketch reproduces the plain
    * groupBy(FPGA, bucket) result, which is what the oracle states. */
  val qTdcDriftSpectrum = Q(
    "q_tdc_drift_spectrum",
    (s, _) =>
      s.createDataFrame(TdcFixture.hits)
        .groupBy("FPGA")
        .agg(graft.functions.HistogramAgg
          .histogram(col("TDC_MEAS"), 5.0).as("h"))
        .select(col("FPGA"), explode(col("h")))
        .toDF("FPGA", "bucket", "n_hits")
        .orderBy("FPGA", "bucket"),
    Some {
      val values = TdcFixture.hits
        .map(h => s"(${h.FPGA}, ${h.TDC_MEAS})")
        .mkString(",\n             ")
      s"""SELECT FPGA, CAST(floor(TDC_MEAS / 5.0) AS BIGINT) AS bucket,
            count(*) AS n_hits
          FROM (VALUES $values) AS hits(FPGA, TDC_MEAS)
          GROUP BY FPGA, bucket
          ORDER BY FPGA, bucket"""
    })

  val all: Seq[Q] = Seq(qTdcOccupancy, qTdcDriftSpectrum)
}
