package graft

import graft.ops.Skew

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Working evidence for the SCALE.md partitioning claims: salting spreads
  * a hot join key without changing results, and bucketed tables join
  * with no exchange at all. */
class PartitioningSpec extends SparkSpec {

  test("salted join is row-identical to the plain join under heavy skew") {
    val s = spark
    import s.implicits._
    // zipf-ish: key 0 carries half the rows
    val big = (0 until 2000)
      .map(i => (if (i % 2 == 0) 0L else (i % 97).toLong, i.toLong))
      .toDF("k", "payload")
    val small = (0L until 97L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "attr").collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", factor = 8)
      .select("k", "payload", "attr").collect().toSet
    assert(salted === plain)
    assert(salted.size === 2000)
    // the hot-key stats pass identifies key 0 (the 1000 even rows plus
    // the 10 odd multiples of 97)
    val hot = Skew.hotKeys(big, "k", 1).head()
    assert(hot.getLong(0) === 0L && hot.getLong(1) === 1010L)
  }

  test("stats-driven salting only engages past the threshold") {
    val s = spark
    import s.implicits._
    val uniform = (0 until 100).map(i => (i.toLong, i)).toDF("k", "p")
    val small = (0L until 100L).map(k => (k, k * 2)).toDF("k", "q")
    val out = Skew.saltedJoinIfSkewed(uniform, small, "k", 8, threshold = 10L)
    assert(out.count() === 100)
  }

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val s = spark
    import s.implicits._
    // ~3 MB on key 0 vs ~1 KB elsewhere: with the thresholds below, AQE
    // must mark the join skewed and split the hot partition — the
    // runtime complement to the explicit salting path (salting is for
    // when you KNOW the key; AQE catches the ones you don't). Payloads
    // are seeded-random so shuffle COMPRESSION cannot shrink the hot
    // partition below the detection threshold (sizes are measured on
    // compressed blocks; a constant payload compresses to ~nothing).
    val rnd = new scala.util.Random(42)
    val big = (0 until 6000)
      .map(i => (if (i % 2 == 0) 0L else (i % 97).toLong,
        rnd.alphanumeric.take(1024).mkString))
      .toDF("k", "payload")
    val small = (0L until 97L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val joined = big.join(small, Seq("k"))
      // execute the frame itself — count() would plan a separate query
      // and leave this one's adaptive plan unexecuted
      assert(joined.collect().length === 6000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE did not mark the skewed join:\n" + finalPlan)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("bucketed tables sort-merge join with zero exchanges") {
    val s = spark
    import s.implicits._
    s.sql("DROP TABLE IF EXISTS graft_b_orders")
    s.sql("DROP TABLE IF EXISTS graft_b_customer")
    (0 until 1000).map(i => (i.toLong % 100, i.toLong))
      .toDF("custkey", "orderkey")
      .write.bucketBy(4, "custkey").sortBy("custkey")
      .mode("overwrite").saveAsTable("graft_b_orders")
    (0L until 100L).map(k => (k, s"c$k")).toDF("custkey", "name")
      .write.bucketBy(4, "custkey").sortBy("custkey")
      .mode("overwrite").saveAsTable("graft_b_customer")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("graft_b_orders")
        .join(s.table("graft_b_customer"), Seq("custkey"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan)
      assert(joined.count() === 1000)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS graft_b_orders")
      s.sql("DROP TABLE IF EXISTS graft_b_customer")
    }
  }
}
