package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper for INTERNAL stage frames that the declared
  * queries truncate behind a localCheckpoint (the winnow pair stage's
  * plan is invisible in `graft.Explain` output — the checkpoint shows as
  * `Scan ExistingRDD`). Prints the formatted physical plan of the named
  * internal frame so optimization rounds can commit honest before/after
  * plan evidence. Not part of the driver contract.
  *
  * Usage: runMain graft.ops.PlanProbe <sfDir> <frame>
  * Frames: winnow_pairs_agg
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, frame) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        graft.GraftConf.BypassMergeThreshold)
      .config("spark.sql.optimizer.excludedRules", graft.GraftConf.ExcludedRules)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = frame match {
      case "winnow_pairs_agg" =>
        TextOps.winnowPairsAgg(spark, sfDir, Dedup.MaxPostingDf)
      case other => sys.error(s"unknown frame: $other")
    }
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
