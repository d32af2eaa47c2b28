package graft.sources

import org.apache.spark.sql.DataFrame

/** Physical table layout for co-located execution (SCALE.md "Joins").
  *
  * Bucketing is the storage-side answer to the join shuffle: write both
  * fact tables hash-bucketed (and sorted) on the join key, and every
  * subsequent join or aggregation on that key runs with ZERO exchange —
  * the scan itself reports `HashPartitioning(key, n)`, so Catalyst
  * plans a sort-merge join straight off the files. At 100 TB this
  * converts the recurring cost of the biggest shuffle (fact ⋈ fact on a
  * shared key, re-shuffled by every query) into a one-time write-side
  * cost — the same trade a partitioned index makes.
  *
  * Constraints worth knowing at scale: both sides must agree on bucket
  * count (or be multiples under `spark.sql.bucketing` rules), the
  * bucket column must be the join key exactly, and writes must go
  * through the catalog (`saveAsTable` — parquet `save(path)` drops
  * bucket metadata). LayoutSpec pins the exchange-free plans.
  */
object Layout {

  /** Register `df` as managed table `name`, hash-bucketed and sorted on
    * `key` into `buckets` files per partition. */
  def bucketize(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)

  /** Write `df` directory-partitioned on `partCol` (e.g. an event day
    * derived from the timestamp). Time-partitioned layout is the other
    * half of the storage story: a time-ranged query then reads ONLY the
    * matching directories — partition pruning happens at planning time,
    * before any file is opened, so a one-day query over a year of data
    * scans 1/365th of it. LayoutSpec pins the pruned file count on the
    * real plan. */
  def partitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partCol)
      .save(path)

  /** Range-cluster `df` on `cols` into `n` files: rows land in
    * range-DISJOINT files, each sorted within, so parquet row-group
    * min/max statistics answer range predicates on the clustering
    * columns by skipping whole files/row groups at scan time — the
    * single-dimension clustering story (sort your dominant filter
    * column; multi-dimension needs an interleaved key, same write
    * shape). Complements [[partitioned]]: directory partitioning prunes
    * at PLANNING time on the partition column; clustering prunes at
    * SCAN time inside each partition, without the small-files cost of
    * over-partitioning. LayoutSpec pins the disjointness. */
  def clustered(df: DataFrame, path: String, n: Int, cols: String*): Unit =
    df.repartitionByRange(n, cols.map(df.col): _*)
      .sortWithinPartitions(cols.map(df.col): _*)
      .write.mode("overwrite").format("parquet").save(path)

  /** Compact a parquet directory into ~`targetMb` files at `dst` — the
    * small-files repair every long-lived ingest pipeline needs (a
    * streaming sink or over-parallel writer leaves thousands of KB-size
    * files; each costs a task + an open + a footer parse, so scan cost
    * is dominated by file COUNT, not bytes). File count derives from
    * the actual on-disk bytes. Returns the file count written.
    * Destination is a separate path — compacting in place while reading
    * would race the scan against the overwrite. */
  def compact(spark: org.apache.spark.sql.SparkSession, src: String,
      dst: String, targetMb: Int = 512): Int = {
    require(new org.apache.hadoop.fs.Path(src).toUri.getPath !=
      new org.apache.hadoop.fs.Path(dst).toUri.getPath,
      "compact src and dst must differ (in-place would race the scan)")
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1L, (bytes + targetMb.toLong * 1024 * 1024 - 1) /
      (targetMb.toLong * 1024 * 1024)).toInt
    spark.read.parquet(src).repartition(n)
      .write.mode("overwrite").format("parquet").save(dst)
    n
  }
}
