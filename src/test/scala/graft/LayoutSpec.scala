package graft

import graft.sources.Layout

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Bucketed-layout guarantees: a join and an aggregation on the bucket
  * key plan with ZERO exchange, and results match the unbucketed
  * spelling. This is the storage-side shuffle elimination SCALE.md's
  * join section argues for — pinned on real plans, not prose.
  */
class LayoutSpec extends SparkSpec {

  private def explain(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("bucketed fact-fact join and bucket-key aggregation are exchange-free") {
    val s = spark
    Layout.bucketize(Tables.orders(s, sf), "orders_bk", "o_custkey", 8)
    Layout.bucketize(
      Tables.customer(s, sf)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
      "customer_bk", "o_custkey", 8)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = s.table("orders_bk").join(s.table("customer_bk"), "o_custkey")
      val jp = explain(j)
      assert(!jp.contains("Exchange"),
        "bucketed join still shuffles:\n" + jp)
      assert(jp.contains("SortMergeJoin"), jp)
      assert(jp.contains("SelectedBucketsCount"), jp)
      // same result as the unbucketed join
      val expected = Tables.orders(s, sf)
        .join(Tables.customer(s, sf),
          col("o_custkey") === col("c_custkey")).count()
      assert(j.count() === expected)

      val a = s.table("orders_bk").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      val ap = explain(a)
      assert(!ap.contains("Exchange"),
        "bucket-key aggregation still shuffles:\n" + ap)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS orders_bk")
      s.sql("DROP TABLE IF EXISTS customer_bk")
    }
  }

  test("date-partitioned layout prunes to the queried day at planning time") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("layout_part").toString
    Layout.partitioned(
      Tables.events(s, sf)
        .withColumn("day", to_date(col("ts"))),
      s"$tmp/events_by_day", "day")
    val days = s.read.parquet(s"$tmp/events_by_day")
      .select("day").distinct().collect().map(_.getDate(0)).sorted
    assert(days.length > 1, "fixture spans one day; partitioning test is vacuous")
    val one = s.read.parquet(s"$tmp/events_by_day")
      .filter(col("day") === lit(days(1)))
    val p = one.queryExecution.explainString(FormattedMode)
    // the day predicate must land in PartitionFilters — directory-level
    // pruning at planning time — not as a per-row data filter
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("day"), "day is not a partition filter:\n" + p)
    assert(!p.linesIterator.filter(_.contains("PushedFilters"))
      .mkString.contains("day"), "day degraded to a row filter:\n" + p)
    val expected = Tables.events(s, sf)
      .filter(to_date(col("ts")) === lit(days(1))).count()
    assert(one.count() === expected && expected > 0)
  }
}
