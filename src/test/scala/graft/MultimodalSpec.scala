package graft

import graft.functions.VectorFunctions
import graft.ops.Multimodal
import graft.ops.Multimodal.StubCodecs

import org.apache.spark.sql.functions._

/** Multimodal plumbing: schemas, partition-batched decode, metadata
  * pruning, frame explosion. The codec is a deterministic stub — what is
  * under test is the Spark side (mandate: "make the plumbing real"). */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, sf)

  test("media table: 500 rows, binary blobs with typed metadata") {
    assert(media.count() === 500)
    val m = media.filter(_.media_id == 3L).head()
    assert(m.kind === "video")
    assert(m.bytes.length === 64 + 3)
    assert(m.meta.mime === "video/mp4")
    assert(m.meta.durationMs === 600L)
  }

  test("metadata stats never read the blob column (column pruning)") {
    val plan = Multimodal.metaStats(media).queryExecution.optimizedPlan
    // the scan beneath the aggregation must not require `bytes`
    val scanned = plan.collectLeaves().flatMap(_.output.map(_.name))
    assert(!scanned.contains("bytes"),
      s"blob column leaked into the scan: $scanned")
  }

  test("decode+featurize is deterministic and batch-shaped") {
    val f1 = Multimodal.imageFeatures(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.imageFeatures(
      Multimodal.sizeBucketed(media, 7)).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 === f2, "features must not depend on partitioning")
    assert(f1.values.forall(f => f.length === 16 &&
      math.abs(f.map(_.toDouble).sum - 1.0) < 1e-5))
  }

  test("thumbnails come back at the requested geometry") {
    val t = Multimodal.thumbnails(media, 8, 8).collect()
    // visual kinds only: ids with id % 3 == 1 are audio (167 of 500)
    assert(t.length === 333)
    assert(t.forall(f => f.width === 8 && f.height === 8 && f.pixels.length === 64))
  }

  test("frame sampling: videos only, every 2nd frame") {
    val frames = Multimodal.sampleFrames(media, 2).collect()
    val perVideo = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(perVideo.keySet.forall(_ % 3 == 0))
    perVideo.foreach { case (id, n) =>
      val count = StubCodecs.frameCount(
        media.filter(_.media_id == id).head().meta)
      assert(n === (count + 1) / 2, s"video $id: $n frames of $count")
    }
  }

  test("graft_cosine / graft_dot registered as SQL functions") {
    VectorFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_cosine(array(1d, 0d), array(1d, 0d)) AS c,
        |       graft_dot(array(1d, 2d), array(3d, 4d)) AS d""".stripMargin)
      .head()
    assert(row.getDouble(0) === 1.0)
    assert(row.getDouble(1) === 11.0)
  }
}
