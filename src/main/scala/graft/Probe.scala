package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev only, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules", GraftConf.ExcludedRules)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(docs.select(count(lit(1)).as("n"))) // warm
    val sets = docs
      .withColumn("tk", split(col("text"), " "))
      .withColumn("sh",
        array_distinct(expr(
          "transform(sequence(1, greatest(size(tk) - 1, 1))," +
          " i -> concat_ws(' ', slice(tk, i, 2)))")))
      .select(col("source"), col("doc_id"), explode(col("sh")).as("sh"))
    val qe = sets.queryExecution
    noop(sets)
    println("[plan-after-exec]")
    println(qe.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
