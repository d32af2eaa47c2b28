package graft.stream

import org.scalatest.funsuite.AnyFunSuite

/** Option-level tests for the Kafka wiring. The kafka format itself can't
  * load in this offline image (no `spark-sql-kafka-0-10`, no broker), so
  * the option maps — where a silent typo would otherwise hide until
  * deployment — are asserted directly against the reference's reader
  * semantics (reference `code/dask_kafka/core.py:12,23,111`).
  */
class SourcesSpec extends AnyFunSuite {

  test("kafkaStream options mirror the reference reader semantics") {
    val opts = Sources.kafkaStreamOptions(
      "broker:9092", "topic4-real", 10000L, "earliest", Some(8))
    assert(opts("kafka.bootstrap.servers") === "broker:9092")
    assert(opts("subscribe") === "topic4-real")
    // cold start from earliest = auto.offset.reset='earliest' (core.py:23)
    assert(opts("startingOffsets") === "earliest")
    // batch_size cap per micro-batch (core.py:12, applied core.py:111)
    assert(opts("maxOffsetsPerTrigger") === "10000")
    // oversplit lever; absent by default (reference pins 1:1 partitions)
    assert(opts("minPartitions") === "8")
    assert(!Sources.kafkaStreamOptions(
      "b", "t", 1L, "latest", None).contains("minPartitions"))
  }

  test("kafkaBatch options cover an explicit offset range") {
    val opts = Sources.kafkaBatchOptions(
      "broker:9092", "topic4", "earliest", "latest")
    assert(opts("kafka.bootstrap.servers") === "broker:9092")
    assert(opts("subscribe") === "topic4")
    assert(opts("startingOffsets") === "earliest")
    assert(opts("endingOffsets") === "latest")
  }
}
