package graft

import org.apache.spark.sql.functions._

/** Direct coverage of [[Tables.spread]] / [[Tables.rowGroups]] — the
  * corpus splittability guard. Until r15 this logic was proven only by
  * sf10 probes (VERDICT r14 #3): the r14 defect it fixes (a 66 MB
  * single-row-group file planning 17 byte-range splits, 16 empty, so
  * every map phase ran one task) is pinned here at unit scale, along
  * with the ADVICE-r14 refinements: the split-count bound (planner
  * packing), the overflow-safe fallback sentinel, and the short-circuit
  * footer sweep.
  *
  * The shared test session is local[4], so target = defaultParallelism
  * = 4 and the repartition threshold is "effective parallelism < 2".
  * (Named SpreadGuardSpec since r16 — it shared the simple name
  * ScaleGuardSpec with graft.ops.ScaleGuardSpec, the df-cap guards,
  * which made test reports ambiguous.)
  */
class SpreadGuardSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sg_$tag").toString

  /** ~1.6 MB of incompressible single-row-group parquet. */
  private def writeOneRowGroup(path: String): Unit =
    spark.range(50000)
      .select(md5(col("id").cast("string")).as("s"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  test("r14 defect shape: single row group + many planned splits still spreads") {
    val dir = tmp("onerg")
    writeOneRowGroup(dir)
    // shrink maxSplitBytes so the planner cuts MANY byte-range splits
    // of the one-row-group file — the exact sf10 lying-proxy shape: the
    // old split-count test read "healthy" while every split but one was
    // empty. The footer count must win.
    // save whatever the shared session had so the finally block restores
    // the TRUE prior state, not hardcoded Spark defaults (ADVICE r15)
    val savedMax = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    val savedOpen = spark.conf.getOption("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      val df = spark.read.parquet(dir)
      assert(df.rdd.getNumPartitions >= 2,
        "precondition: the planner must cut multiple splits")
      assert(Tables.rowGroups(spark, dir) === 1)
      val out = Tables.spread(spark, df, dir)
      assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore("spark.sql.files.maxPartitionBytes", savedMax)
      restore("spark.sql.files.openCostInBytes", savedOpen)
    }
  }

  test("ADVICE r14: planned split count bounds from above even when row groups are plentiful") {
    val dir = tmp("packed")
    // 8 files = 8 row groups — the OLD row-group-only test would skip.
    spark.range(8000).select(md5(col("id").cast("string")).as("s"))
      .repartition(8).write.mode("overwrite").parquet(dir)
    assert(Tables.rowGroups(spark, dir) >= 2)
    // a plan that collapsed to 1 task (here: explicit coalesce standing
    // in for planner packing of small files) must still be spread
    val df = spark.read.parquet(dir).coalesce(1)
    val out = Tables.spread(spark, df, dir)
    assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
  }

  test("healthy layout is returned untouched (no gratuitous exchange)") {
    val dir = tmp("healthy")
    spark.range(8000).select(md5(col("id").cast("string")).as("s"))
      .repartition(8).write.mode("overwrite").parquet(dir)
    // read with enough planned splits AND enough row groups
    val df = spark.read.parquet(dir).repartition(4)
    val out = Tables.spread(spark, df, dir)
    assert(out eq df, "spread must be the identity when both bounds pass")
  }

  test("footer-read failure falls back to the planned count without overflowing") {
    val dir = tmp("garbage")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "x.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    // input has healthy planned parallelism (6 >= target/2), so only
    // the footer signal could force a repartition — and it is
    // unreadable. The Int.MaxValue sentinel must read as "trust the
    // planner" (old bug: Int.MaxValue * 2 == -2 forced the repartition,
    // the exact opposite).
    val df = spark.range(1000).toDF("id").repartition(6)
    val out = Tables.spread(spark, df, dir)
    assert(out eq df,
      "unreadable footer + healthy planned count must skip the repartition")
  }

  test("rowGroups counts across files and honors the short-circuit") {
    val dir = tmp("count")
    spark.range(3000).select(md5(col("id").cast("string")).as("s"))
      .repartition(3).write.mode("overwrite").parquet(dir)
    assert(Tables.rowGroups(spark, dir) === 3)
    // stopAt truncates the sweep: with 1-row-group files the running
    // count crosses stopAt=1 after the first footer and stops there
    assert(Tables.rowGroups(spark, dir, stopAt = 1) === 1)
  }

  test("rowGroups sees multiple row groups inside one file") {
    val dir = tmp("multirg")
    spark.range(20000)
      .select(md5(col("id").cast("string")).as("s"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "4096")
      .parquet(dir)
    assert(Tables.rowGroups(spark, dir) >= 2)
  }
}
