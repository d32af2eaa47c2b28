package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (dev only, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules", GraftConf.ExcludedRules)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq("q_dedup_ngram_jaccard", "q_dedup_minhash", "q_text_winnow_pairs")) {
      noop(n)
      println(f"[probe] $n%-28s warm=${(1 to 3).map(_ => noop(n)).min}%.2f")
    }
    spark.stop()
  }
}
