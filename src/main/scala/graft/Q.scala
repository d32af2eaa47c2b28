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

/** Session defaults shared by every entry point. */
object GraftConf {
  /** `InferFiltersFromGenerate` clones the generator's whole child
    * expression into a `size(...) > 0` filter and pushes it below
    * exchanges. Every generator input here is a computed, provably
    * non-empty array (token lists, shingles, LSH bands), so the inferred
    * filter never prunes a row — it only re-runs the expensive lambda
    * chain a second time, on the narrow pre-shuffle side of the plan.
    * Excluding the rule removes that double evaluation. */
  val ExcludedRules =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
}

/** Parquet table loaders. One file per table under sfDir (TESTDATA.md). */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Normalize events.ts to a session-timezone (UTC) microsecond
    * TimestampType regardless of how the fixture was written. The driver
    * has shipped events.parquet with two different physical encodings so
    * far — TIMESTAMP(NANOS) through round 5, TIMESTAMP_MICROS
    * (isAdjustedToUTC=false) from round 6 — so the loader adapts to the
    * schema it actually reads instead of assuming one:
    *
    *  - LongType: the file carries TIMESTAMP(NANOS), which Spark 4
    *    rejects by default (PARQUET_TYPE_ILLEGAL) and we read under
    *    `nanosAsLong` as raw nanoseconds. Truncate to µs in integer
    *    space (`div` — a double division loses precision above 2^53 ns),
    *    exactly what DuckDB's µs-native TIMESTAMP does on the same file.
    *  - TimestampNTZType: the file carries TIMESTAMP_MICROS with
    *    isAdjustedToUTC=false. Cast to TimestampType: every session here
    *    pins spark.sql.session.timeZone=UTC, so the cast reinterprets the
    *    naive wall-clock as the same UTC instant DuckDB reads.
    *  - TimestampType (isAdjustedToUTC=true fixtures): already right.
    *
    * Shared by the batch reader below and Bench's streaming probes so
    * both paths carry identical event-time semantics. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    // Harmless when ts is already µs; lets a TIMESTAMP(NANOS) fixture
    // load (as LongType) instead of failing the scan outright.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(t(s, d, "events"))
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame =
    spread(s, t(s, d, "documents"), s"$d/documents.parquet")
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(s, t(s, d, "embeddings"), s"$d/embeddings.parquet")

  /** The corpora feeding compute-heavy per-row work (shingling, hashing,
    * vector math) must be spread across the cluster even when the file
    * layout can't: parquet can never split INSIDE a row group, so a
    * single-row-group file scans as one non-empty task no matter how
    * many byte-range splits the planner cuts — and everything before the
    * first shuffle serializes on one core.
    *
    * Measured failure of the previous split-count test (r14, sf10): a
    * 66 MB single-row-group documents file under local[32] plans
    * 17 byte-range splits (maxSplitBytes = size/parallelism), 16 of them
    * EMPTY — the count looked healthy, the repartition was skipped, and
    * every interpreted-lambda map phase ran one task
    * (q_text_language_ngram: 691 s isolated). The honest splittability
    * signal is the ROW-GROUP count, a metadata-only footer read,
    * memoized per path. On a production corpus (thousands of files ×
    * row groups) this is a no-op; locally it is one narrow shuffle of a
    * small table. */
  private val rowGroupCounts =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  private def rowGroups(s: SparkSession, path: String): Int = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
      else Array(fs.getFileStatus(p))
    files.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
      try r.getFooter.getBlocks.size finally r.close()
    }.sum
  }

  private def spread(s: SparkSession, df: DataFrame, path: String): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    val parts = rowGroupCounts.getOrElseUpdate(path,
      try rowGroups(s, path) catch { case _: Throwable => Int.MaxValue })
    if (parts * 2 < target) df.repartition(target) else df
  }
}
