package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Fixture-drift guard (VERDICT r6 §next-round 2).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * shipped events.ts under two different parquet encodings:
  * TIMESTAMP(NANOS) through round 5, TIMESTAMP_MICROS
  * (isAdjustedToUTC=false → TIMESTAMP_NTZ in Spark) from round 6. The
  * round-6 loader assumed the first and lost 22 queries + 5 stream probes
  * when the second arrived. This spec writes the same instants under every
  * encoding Spark can read back — nanos-as-long, NTZ micros, UTC-adjusted
  * micros — and asserts `Tables.events` yields byte-identical µs
  * timestamps for all of them, so the next regeneration is a no-op.
  */
class FixtureDriftSpec extends SparkSpec {

  /** Known instants (µs since epoch, UTC). Includes a sub-millisecond
    * component so µs precision loss would be caught. */
  private val micros = Seq(1735689600000001L, 1735693201500500L, 1735696803999999L)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_drift_$tag").toString

  /** Write rows with ts under `tsType`, read back via Tables.events. */
  private def roundTrip(tag: String, tsType: DataType,
      tsValue: Long => Any): Seq[(Long, Long)] = {
    val dir = tmp(tag)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType)))
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, tsValue(us))
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
      .selectExpr("event_id", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  private val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }

  test("nanos-as-long fixture normalizes to the same µs instants") {
    // A TIMESTAMP(NANOS) file under nanosAsLong reads as LongType; a
    // plain INT64 column exercises the identical loader branch.
    assert(roundTrip("nanos", LongType, us => us * 1000L) == expected)
  }

  test("TIMESTAMP_NTZ micros fixture (round-6 encoding) passes through") {
    // Driver writes isAdjustedToUTC=false micros; Spark reads NTZ. The
    // naive wall-clock equals the UTC instant (session tz is UTC).
    assert(roundTrip("ntz", TimestampNTZType,
      us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)
    ) == expected)
  }

  test("UTC-adjusted TIMESTAMP micros fixture passes through") {
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try assert(roundTrip("utc", TimestampType,
      us => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        us / 1000000L, (us % 1000000L) * 1000))) == expected)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
  }

  test("the real driver fixture loads as TimestampType with sane bounds") {
    val ts = Tables.events(spark, sf).schema("ts")
    assert(ts.dataType == TimestampType)
    val n = Tables.events(spark, sf).count()
    assert(n > 0)
  }

  // ---------------------------------------------------------------------
  // Schema snapshots for every driver table (VERDICT r6 §next-round 7).
  // The driver has now demonstrated it regenerates /root/testdata between
  // rounds; a silent column rename / type change should fail HERE, in one
  // clearly-named test, not as a 22-query outage in the correctness gate.
  // Timestamp columns are pinned flavor-insensitively ("timestamp" covers
  // both TIMESTAMP_NTZ and UTC-adjusted TIMESTAMP): that axis is exactly
  // what the round-6 regeneration flipped, the loaders tolerate both, and
  // under the pinned UTC session zone the two read as the same instants.
  // ---------------------------------------------------------------------

  /** Loaded dataType → snapshot token (timestamp flavors collapse). */
  private def tok(dt: DataType): String = dt match {
    case TimestampType | _: TimestampNTZType => "timestamp"
    case ArrayType(e, _)                     => s"array<${tok(e)}>"
    case other                               => other.simpleString
  }

  private def snapshot(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => (f.name, tok(f.dataType)))

  private val expectedSchemas: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  private val loaders: Map[String,
      (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)

  expectedSchemas.foreach { case (name, expectedCols) =>
    test(s"driver fixture `$name` still loads with the pinned schema") {
      assert(snapshot(loaders(name)(spark, sf)) == expectedCols,
        s"$name.parquet drifted from the schema every operator assumes — " +
          "check the driver's regenerated testdata before trusting any " +
          "downstream failure")
    }
  }
}
