package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement main (dev only): prints the winnow fingerprint
  * df census — retained raw pair count Σ C(df,2) over df ≤ cap, the
  * capped-key count, and the retained posting-row count — per sf dir
  * given as args. Calibrates the pair-stage auto-provision estimator
  * (round 18); not part of the driver contract. */
object CensusProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules", graft.GraftConf.ExcludedRules)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cap = graft.ops.Dedup.MaxPostingDf
    for (d <- args) {
      val t0 = System.nanoTime()
      val census = graft.Tables.documents(spark, d)
        .select(col("doc_id"),
          explode(graft.functions.Winnow.fingerprints(col("text"))).as("fp"))
        .groupBy("fp").agg(count(lit(1)).as("df"))
      val row = census.agg(
        sum(when(col("df") <= cap,
          (col("df") * (col("df") - 1) / 2).cast("long"))
          .otherwise(0L)).as("raw_pairs"),
        sum(when(col("df") <= cap, col("df")).otherwise(0L)).as("postings"),
        sum(when(col("df") > cap, 1L).otherwise(0L)).as("capped_keys"),
        count(lit(1)).as("distinct_fps")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[census] $d raw_pairs=${row.getLong(0)} postings=${row.getLong(1)} capped_keys=${row.getLong(2)} distinct_fps=${row.getLong(3)} sec=$sec%.1f")
    }
    spark.stop()
  }
}
