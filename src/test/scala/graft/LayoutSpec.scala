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

  test("clustered write produces range-disjoint sorted files") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("layout_clus").toString
    Layout.clustered(Tables.orders(s, sf), s"$tmp/orders_c", 4, "o_totalprice")
    val files = new java.io.File(s"$tmp/orders_c").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 4)
    // per-file [min, max] of the clustering column must not overlap —
    // the property that lets parquet row-group stats skip whole files
    // for a range predicate
    val ranges = files.map { f =>
      val r = s.read.parquet(f)
        .agg(min("o_totalprice"), max("o_totalprice")).head()
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo,
        s"file ranges overlap: $hi > $lo")
      case _ =>
    }
    // nothing lost in the rewrite
    assert(s.read.parquet(s"$tmp/orders_c").count()
      === Tables.orders(s, sf).count())
  }

  test("compact repairs a small-files table to the byte-derived count") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("layout_cmp").toString
    // simulate an over-parallel writer: 64 tiny files
    Tables.orders(s, sf).repartition(64)
      .write.mode("overwrite").parquet(s"$tmp/small")
    val small = new java.io.File(s"$tmp/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(small === 64)
    val n = Layout.compact(s, s"$tmp/small", s"$tmp/big", targetMb = 512)
    assert(n === 1, s"sub-512MB table must compact to one file, got $n")
    val big = new java.io.File(s"$tmp/big").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(big === 1)
    assert(s.read.parquet(s"$tmp/big").count()
      === Tables.orders(s, sf).count())
    intercept[IllegalArgumentException] {
      Layout.compact(s, s"$tmp/small", s"$tmp/small")
    }
  }

  test("z-ordered clustering bounds BOTH dimensions per file; 1-d does not") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("layout_z").toString
    // uniform 100x100 grid — two equally-selective dimensions
    val grid = (0 until 10000).map(i => (i % 100, i / 100)).toDF("x", "y")
    Layout.clustered(grid.withColumn("z",
        graft.functions.ZValue.zvalue(col("x"), col("y"))),
      s"$tmp/zc", 16, "z")
    Layout.clustered(grid, s"$tmp/xc", 16, "x")
    def hits(path: String, lo: Int, hi: Int, dim: String): Int =
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).count { f =>
          val r = s.read.parquet(f.getPath)
            .agg(min(dim), max(dim)).head()
          r.getInt(0) <= hi && lo <= r.getInt(1)
        }
    // a y-band predicate: the x-clustered layout leaves y unconstrained
    // in every file (all 16 hit); the z-curve bounds y per file too
    val zHits = hits(s"$tmp/zc", 10, 19, "y")
    val xHits = hits(s"$tmp/xc", 10, 19, "y")
    assert(xHits === 16, s"1-d layout should not bound y, hit $xHits")
    assert(zHits <= 8, s"z layout should skip most files on y, hit $zHits")
    // and the z layout still bounds x as well (no dimension sacrificed)
    assert(hits(s"$tmp/zc", 10, 19, "x") <= 8)
    // the curve is a reordering, not a filter
    assert(s.read.parquet(s"$tmp/zc").count() === 10000)
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    val s = spark
    import s.implicits._
    // generation 1 writes (id, text); generation 2 adds a quality score
    // — the corpus-versioning reality every long-lived dataset hits.
    // mergeSchema must union the columns, null-filling the old files.
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "old doc")).toDF("id", "text")
      .write.mode("append").parquet(dir)
    Seq((2L, "new doc", 0.9)).toDF("id", "text", "quality")
      .write.mode("append").parquet(dir)
    val merged = s.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "quality", "text"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.toSeq === Seq(
      (1L, "old doc", None), (2L, "new doc", Some(0.9))))
    // without mergeSchema the footer of one file wins — the pitfall the
    // option exists for: the quality column may silently vanish
    val unmergedCols = s.read.parquet(dir).columns.length
    assert(unmergedCols <= 3)
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
