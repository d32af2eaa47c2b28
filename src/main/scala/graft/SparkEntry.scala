package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Analytics, AsOf, Corpus, Curation, Dedup, Graph, Multimodal, Relational, Similarity, Skew, Tdc, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All declared queries live in graft.ops.* as [[Q]] values; this object
  * only flattens them into the driver's maps.
  */
object SparkEntry {

  /** Full declared engine surface (SURVEY.md §2b + mandate extensions). */
  def registry: Seq[Q] =
    Relational.all ++ TextOps.all ++ Dedup.all ++ Similarity.all ++
      Multimodal.all ++ Tdc.all ++ AsOf.all ++ Curation.all ++
      Graph.all ++ Analytics.all ++ Skew.all ++ Corpus.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggGroup.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
