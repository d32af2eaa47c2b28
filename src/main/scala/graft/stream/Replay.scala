package graft.stream

import graft.model.TdcHit

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture replay — the engine's analogue of the reference's test producer
  * (`code/test/simulate_stream.py`, whole file): golden CSV → JSON records
  * → Kafka, round-robin over partitions. Batch-first: the same frame can
  * be written to Kafka (cluster) or used directly as a bounded source in
  * tests (offline CI has no broker — SURVEY.md §5.2.4).
  */
object Replay {

  /** CSV fixture → Kafka-transport-shaped frame (`value` JSON column). */
  def fromCsv(spark: SparkSession, csvPath: String,
      nPartitions: Option[Int] = None): DataFrame =
    Sources.toKafkaJson(Sources.hitsFromCsv(spark, csvPath), nPartitions)

  /** Full EP2: CSV → JSON → Kafka topic. Needs the kafka connector on the
    * classpath (cluster only). */
  def csvToKafka(spark: SparkSession, csvPath: String, bootstrap: String,
      topic: String, nPartitions: Int = 4): Unit =
    Sources.writeKafka(
      fromCsv(spark, csvPath, Some(nPartitions)), bootstrap, topic)

  /** Round-trip used by tests: typed hits → JSON transport frame →
    * schema-checked decode. Exercises R17-R19 + R9 without a broker. */
  def roundTrip(hits: DataFrame): DataFrame =
    Sources.decodeHits(Sources.toKafkaJson(hits))
}
