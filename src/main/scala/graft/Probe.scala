package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (dev only, not part of the driver contract):
  * cold and warm (second-run) times per declared query. */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val names = SparkEntry.queries.keys.toSeq.sorted
    noop(names.head) // global warm
    val rows = names.map { n => (n, noop(n), noop(n)) }
    rows.sortBy(-_._3).take(8).foreach { case (n, c, w) =>
      println(f"[probe] $n%-28s cold=$c%5.2f warm=$w%5.2f")
    }
    println(f"[probe] TOTAL cold=${rows.map(_._2).sum}%.1f warm=${rows.map(_._3).sum}%.1f over ${rows.size} queries")
    spark.stop()
  }
}
