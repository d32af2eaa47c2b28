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
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables.lineitem(spark, d)
    noop(li.select(count(lit(1)).as("n"))) // warm
    def q1(src: org.apache.spark.sql.DataFrame) = src
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"),
           sum("l_extendedprice").as("sum_base"),
           avg("l_discount").as("avg_disc"), count(lit(1)).as("n"))
    time("q1 shape, raw (1 split)")(noop(q1(li)))
    time("q1 shape, raw again")(noop(q1(li)))
    time("q1 shape, spread")(noop(q1(li.repartition(32))))
    time("q1 shape, spread again")(noop(q1(li.repartition(32))))
    val ev = Tables.events(spark, d)
    def tumb(src: org.apache.spark.sql.DataFrame) = src
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    time("tumbling, raw (1 split)")(noop(tumb(ev)))
    time("tumbling, spread")(noop(tumb(ev.repartition(32))))
    spark.stop()
  }
}
