package graft.ops

import graft.{Q, Tables => T}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column surface (builder mandate): image/audio/video as
  * opaque `binary` columns with typed metadata, decode / feature-extract /
  * resize / frame-sample as partition-batched transforms.
  *
  * The actual codec step is STUBBED — no image/audio libraries exist in
  * this container — with a deterministic fake (`StubCodecs`): every byte
  * path, schema, batch shape and partitioning decision is real Spark; only
  * the pixel math inside the per-record function is fake. Swapping in a
  * real codec is a one-function change.
  *
  * Scale design: media blobs are the 100 TB driver. The rules encoded
  * here — (a) metadata travels in a struct column next to the blob so
  * filters prune on it WITHOUT touching bytes (parquet column pruning
  * skips the blob pages entirely); (b) decode runs per-partition with
  * reused codec state, the mapPartitions analogue of a batched
  * arrow/pandas UDF; (c) blobs are size-bucketed before decode so one
  * task doesn't straggle on a run of large videos.
  */
object Multimodal {

  // ------------------------------------------------------------- schema

  final case class MediaMeta(
      mime: String, width: Int, height: Int, durationMs: Long)
  final case class Media(
      media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  final case class Frame(
      media_id: Long, frame_no: Int, width: Int, height: Int,
      pixels: Array[Byte])
  final case class MediaFeature(
      media_id: Long, kind: String, feature: Array[Float])

  // ------------------------------------------------- deterministic stub

  /** Fake codecs: deterministic functions of the blob bytes ONLY — stand-ins
    * for libjpeg/ffmpeg calls. Marked ??? -style on purpose; replace the
    * bodies, keep the signatures. */
  object StubCodecs {
    /** "Decode" an image: fabricate a width*height gray buffer whose
      * content hashes the input bytes. Real impl: ImageIO/libjpeg. */
    def decodeImage(bytes: Array[Byte], meta: MediaMeta): Array[Byte] = {
      val out = new Array[Byte](math.max(1, meta.width * meta.height))
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      i = 0
      while (i < out.length) { out(i) = ((h >>> (i % 57)) & 0xff).toByte; i += 1 }
      out
    }

    /** "Resize": nearest-neighbour downsample of the fake gray buffer —
      * the buffer arithmetic is real, the pixels are fake. */
    def resize(px: Array[Byte], w: Int, h: Int, w2: Int, h2: Int): Array[Byte] = {
      require(w > 0 && h > 0, s"resize needs a positive source raster, got ${w}x$h")
      val out = new Array[Byte](math.max(1, w2 * h2))
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          val sx = math.min(w - 1, x * w / math.max(1, w2))
          val sy = math.min(h - 1, y * h / math.max(1, h2))
          val idx = sy * w + sx
          out(y * w2 + x) = if (idx < px.length) px(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }

    /** "Feature-extract": 16 floats summarizing the buffer (histogram-ish).
      * Real impl: a vision model forward pass. */
    def features(px: Array[Byte]): Array[Float] = {
      val f = new Array[Float](16)
      var i = 0
      while (i < px.length) { f((px(i) & 0xff) % 16) += 1f; i += 1 }
      if (px.length > 0) { var j = 0; while (j < 16) { f(j) /= px.length; j += 1 } }
      f
    }

    /** Frame count a "video" carries: 1 frame / 100 ms of fake duration. */
    def frameCount(meta: MediaMeta): Int =
      math.max(1, (meta.durationMs / 100L).toInt)

    /** "Decode" audio to PCM-ish samples: 4 fake samples per input byte.
      * Real impl: libsndfile/ffmpeg decode to float PCM. */
    def decodeAudio(bytes: Array[Byte], meta: MediaMeta): Array[Float] = {
      val out = new Array[Float](bytes.length * 4)
      var i = 0
      while (i < out.length) {
        out(i) = ((bytes(i / 4) & 0xff) - 128) / 128f
        i += 1
      }
      out
    }
  }

  // --------------------------------------------------------- operators

  /** Synthesize a deterministic media table from `embeddings` (no media
    * fixture ships in testdata): blob bytes derive from the embedding
    * floats, metadata from the label. Stands in for `read.format
    * ("binaryFile")` / a parquet blob table at scale. */
  def mediaTable(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    T.embeddings(s, d).select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)]
      .map { case (id, emb, label) =>
        val bytes = new Array[Byte](64 + (id % 64).toInt)
        var i = 0
        while (i < bytes.length) {
          bytes(i) = java.lang.Float.floatToIntBits(emb(i % emb.length)).toByte
          i += 1
        }
        val kind = (id % 3) match {
          case 0 => "video"
          case 1 => "audio"
          case _ => "image"
        }
        Media(id, kind,
          bytes,
          MediaMeta(
            mime = kind match {
              case "video" => "video/mp4"
              case "audio" => "audio/wav"
              case _       => "image/jpeg"
            },
            width = if (kind == "audio") 0 else 16 + (label % 4) * 16,
            height = if (kind == "audio") 0 else 16 + (label % 3) * 16,
            durationMs =
              if (kind == "video") 300L + (id % 10) * 100L
              else if (kind == "audio") 1000L + (id % 5) * 500L
              else 0L))
      }
  }

  /** Metadata-only pruning: select/filter on the meta struct must not read
    * blob bytes (verify with explain: ReadSchema excludes `bytes`). */
  def metaStats(media: Dataset[Media]): DataFrame =
    media.toDF()
      .select(col("media_id"), col("kind"), col("meta.width"),
        col("meta.height"))
      .groupBy("kind", "width", "height")
      .agg(count(lit(1)).as("n"))

  /** Size-bucketed repartition before decode: spread large blobs across
    * tasks so decode work balances (the skew guard for real media). */
  def sizeBucketed(media: Dataset[Media], partitions: Int): Dataset[Media] =
    media.repartitionByRange(partitions,
      pmod(length(col("bytes")) + col("media_id"), lit(partitions.toLong)))

  /** Batched decode+featurize: one codec "instance" per partition, reused
    * across records — the mapPartitions analogue of a pandas/arrow batch
    * UDF (state amortized over the batch, not per record). */
  def imageFeatures(media: Dataset[Media]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec state would be initialized here (real codecs
      // are expensive to construct; stub has none)
      it.map { m =>
        val px = StubCodecs.decodeImage(m.bytes, m.meta)
        MediaFeature(m.media_id, m.kind, StubCodecs.features(px))
      }
    }
  }

  /** Decode + resize to thumbnails — visual kinds only (audio has no
    * raster to resize). */
  def thumbnails(media: Dataset[Media], w2: Int = 8, h2: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(m => m.kind == "image" || m.kind == "video").mapPartitions { it =>
      it.map { m =>
        val px = StubCodecs.decodeImage(m.bytes, m.meta)
        Frame(m.media_id, 0, w2, h2,
          StubCodecs.resize(px, m.meta.width, m.meta.height, w2, h2))
      }
    }
  }

  /** Frame sampling: videos explode into every `everyN`-th frame. flatMap
    * keeps it streaming-shaped (no driver materialization). */
  def sampleFrames(media: Dataset[Media], everyN: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val px = StubCodecs.decodeImage(m.bytes, m.meta)
      (0 until StubCodecs.frameCount(m.meta) by everyN).map { f =>
        Frame(m.media_id, f, m.meta.width, m.meta.height, px)
      }
    }
  }

  // ------------------------------------------------- declared queries

  /** Decode+featurize rollup — deterministic stub output, engine-specific
    * layout -> no SQL oracle; MultimodalSpec pins exact values. */
  val qMmFeatures = Q(
    "q_mm_features",
    (s, d) => {
      import s.implicits._
      imageFeatures(mediaTable(s, d)).toDF()
        .select(col("media_id"), col("kind"),
          graft.util.Det.r2(element_at(col("feature"), 1).cast("double"))
            .as("f0"))
        .orderBy("media_id")
    },
    None)

  /** Frame-sample accounting: frames per video after 1-in-2 sampling.
    * The frame count is pure metadata arithmetic, so DuckDB can oracle it
    * without any decode: frames = ceil(max(1, duration/100) / 2) with
    * duration = (id%10)*100+300 for video rows (vec_id % 3 = 0). */
  val qMmFrameSample = Q(
    "q_mm_frame_sample",
    (s, d) => {
      import s.implicits._
      sampleFrames(mediaTable(s, d)).groupByKey(_.media_id)
        .count().toDF("media_id", "n_frames")
        .orderBy("media_id")
    },
    Some("""SELECT vec_id AS media_id,
           CAST(ceil(greatest(1, ((vec_id % 10) * 100 + 300) / 100) / 2.0) AS BIGINT)
             AS n_frames
           FROM embeddings WHERE vec_id % 3 = 0 ORDER BY media_id"""))

  /** Metadata pruning rollup — blob column untouched (oracle replicates the
    * metadata synthesis from `embeddings`). */
  val qMmMetaStats = Q(
    "q_mm_meta_stats",
    (s, d) =>
      metaStats(mediaTable(s, d)).orderBy("kind", "width", "height"),
    Some("""SELECT CASE vec_id % 3 WHEN 0 THEN 'video' WHEN 1 THEN 'audio'
                ELSE 'image' END AS kind,
           CASE WHEN vec_id % 3 = 1 THEN 0
                ELSE 16 + (label % 4) * 16 END AS width,
           CASE WHEN vec_id % 3 = 1 THEN 0
                ELSE 16 + (label % 3) * 16 END AS height,
           count(*) AS n
           FROM embeddings
           GROUP BY 1, 2, 3 ORDER BY kind, width, height"""))

  /** Audio decode accounting: stub PCM sample counts per audio blob.
    * Sample count is metadata arithmetic (4 x blob length, blob length =
    * 64 + id%64), so DuckDB oracles it without decoding. */
  val qMmAudioStats = Q(
    "q_mm_audio_stats",
    (s, d) => {
      import s.implicits._
      mediaTable(s, d).filter(_.kind == "audio")
        .map(m => (m.media_id,
          StubCodecs.decodeAudio(m.bytes, m.meta).length.toLong,
          m.meta.durationMs))
        .toDF("media_id", "n_samples", "duration_ms")
        .orderBy("media_id")
    },
    Some("""SELECT vec_id AS media_id,
           (64 + vec_id % 64) * 4 AS n_samples,
           1000 + (vec_id % 5) * 500 AS duration_ms
           FROM embeddings WHERE vec_id % 3 = 1 ORDER BY media_id"""))

  val all: Seq[Q] =
    Seq(qMmFeatures, qMmFrameSample, qMmMetaStats, qMmAudioStats)
}
