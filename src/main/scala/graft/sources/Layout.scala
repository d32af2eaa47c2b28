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
}
