package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query (SURVEY.md §2b).
  *
  * @param name   stable query name — the t2 API key
  * @param fn     Spark implementation: (session, sfDir) => result
  * @param oracle equivalent ANSI SQL runnable by DuckDB against the same
  *               parquet tables (bare table names); None for ops whose
  *               output is not SQL-expressible (driver falls back to a
  *               rows-only check; scalatest covers semantics instead).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Parquet table loaders. One file per table under sfDir (TESTDATA.md). */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default (PARQUET_TYPE_ILLEGAL). Read it as a nanosecond long and
    * truncate to a microsecond timestamp — exactly what DuckDB's
    * µs-native TIMESTAMP does on the same file, so event-time semantics
    * align engine-to-engine. `div` keeps the arithmetic in integer space
    * (a double division would lose precision above 2^53 ns). */
  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
