package graft.ops

import graft.{Q, Tables => T}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column surface (builder mandate): image/audio/video as
  * opaque `binary` columns with typed metadata, decode / feature-extract /
  * resize / frame-sample as partition-batched transforms.
  *
  * The codec step is REAL as of round 4: blobs are genuine PNG images
  * (encoded and decoded through `javax.imageio.ImageIO`) and genuine WAV
  * PCM audio (`javax.sound.sampled.AudioSystem`) — both public JVM APIs,
  * no external libraries. "Video" is the one honest compromise: no
  * container demuxer ships with the JVM, so videos are a trivial
  * length-prefixed sequence of real PNG frames (`Codecs.VideoMagic`) —
  * the per-frame codec work is real ImageIO, only the 12-byte framing is
  * ours. The media fixture is synthesized deterministically from the
  * `embeddings` table (no media files ship in testdata), so every blob
  * round-trips encode -> bytes -> decode through the real codecs.
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

  // ------------------------------------------------------- real codecs

  /** Real JVM codecs (round-4 replacement for the former StubCodecs):
    * PNG through `javax.imageio.ImageIO`, WAV PCM through
    * `javax.sound.sampled.AudioSystem` — public platform APIs only.
    * Rasters are 8-bit grayscale (`TYPE_BYTE_GRAY`); PNG is lossless, so
    * encode -> decode round-trips pixels bit-exactly, which is what keeps
    * the decode outputs deterministic and partition-invariant. */
  object Codecs {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    // in-memory streams only: never spill ImageIO's scratch to /tmp files
    ImageIO.setUseCache(false)

    /** Our video framing: magic, frame count, then [len][png] per frame.
      * The JVM ships no mp4/mkv demuxer; the frames inside are real PNG. */
    val VideoMagic: Int = 0x47465631 // "GFV1"

    /** Per-thread cached PNG writer/reader (round 18): `ImageIO.write` /
      * `ImageIO.read` rebuild the codec and its image stream through the
      * SPI registry on EVERY call (thread dumps of the sf3 decode
      * queries sampled ~20% of image time in that setup,
      * `ImageIO.getCacheInfo` et al.). The cached instances are the
      * same JDK PNG plugin classes the convenience methods select, so
      * bytes and pixels are identical — MultimodalSpec pins both. */
    private val pngWriterTL =
      ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
        ImageIO.getImageWritersByFormatName("png").next())
    private val pngReaderTL =
      ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
        ImageIO.getImageReadersByFormatName("png").next())

    /** Encode an 8-bit gray raster as a real PNG. */
    def encodePng(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0 && px.length == w * h,
        s"raster/geometry mismatch: ${px.length} bytes for ${w}x$h")
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, px)
      val out = new ByteArrayOutputStream()
      val writer = pngWriterTL.get()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.write(img)
      } finally {
        writer.setOutput(null)
        ios.close()
      }
      out.toByteArray
    }

    /** The pre-r18 convenience-method spelling of [[encodePng]] — the
      * spec reference the cached-writer path is pinned byte-identical
      * to. */
    private[graft] def encodePngViaImageIO(
        px: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, px)
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    private val PngMagic =
      Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

    /** Decode any ImageIO-supported image (PNG/JPEG/GIF/BMP) to an 8-bit
      * gray raster. Returns (width, height, pixels). Blobs carrying the
      * PNG signature take the cached-reader fast path; anything else —
      * including the corruption-planted blobs whose signature is gone —
      * is decided by the pre-r18 `ImageIO.read` path, so failure
      * verdicts are unchanged. */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val isPng = bytes.length >= 8 && {
        var i = 0
        while (i < 8 && bytes(i) == PngMagic(i)) i += 1
        i == 8
      }
      val img =
        if (isPng) {
          val reader = pngReaderTL.get()
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis, true, true)
            reader.read(0)
          } finally {
            reader.setInput(null)
            iis.close()
          }
        } else ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "ImageIO could not decode the blob (not an image?)")
      val (w, h) = (img.getWidth, img.getHeight)
      val gray =
        if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
        else {
          // color sources: let the gray color model do the luminance map
          val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
          val gr = g.createGraphics()
          try gr.drawImage(img, 0, 0, null) finally gr.dispose()
          g
        }
      val px = new Array[Byte](w * h)
      gray.getRaster.getDataElements(0, 0, w, h, px)
      (w, h, px)
    }

    /** Nearest-neighbour downsample of a decoded gray raster. Kept as
      * explicit pixel math (not Graphics2D filtering) so the thumbnail
      * bytes are deterministic across JVMs/render pipelines. */
    def resize(px: Array[Byte], w: Int, h: Int, w2: Int, h2: Int): Array[Byte] = {
      require(w > 0 && h > 0, s"resize needs a positive source raster, got ${w}x$h")
      require(px.length == w * h,
        s"raster/geometry mismatch: ${px.length} bytes for ${w}x$h")
      val out = new Array[Byte](math.max(1, w2 * h2))
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          val sx = math.min(w - 1, x * w / math.max(1, w2))
          val sy = math.min(h - 1, y * h / math.max(1, h2))
          out(y * w2 + x) = px(sy * w + sx)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Feature-extract: normalized 16-bin gray-level histogram over real
      * decoded pixels (bin = value / 16, so bins are contiguous ranges). */
    def features(px: Array[Byte]): Array[Float] = {
      val f = new Array[Float](16)
      var i = 0
      while (i < px.length) { f((px(i) & 0xff) >>> 4) += 1f; i += 1 }
      if (px.length > 0) { var j = 0; while (j < 16) { f(j) /= px.length; j += 1 } }
      f
    }

    /** Wrap the frame PNGs in the length-prefixed video container. */
    def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
      val size = 8 + frames.map(4 + _.length).sum
      val bb = java.nio.ByteBuffer.allocate(size)
      bb.putInt(VideoMagic).putInt(frames.length)
      frames.foreach { f => bb.putInt(f.length); bb.put(f) }
      bb.array()
    }

    /** Split a video blob back into its frame PNGs (not yet decoded —
      * callers decode only the frames they keep, so 1-in-N sampling skips
      * the ImageIO work for dropped frames). */
    def videoFramePngs(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      require(bb.remaining >= 8 && bb.getInt() == VideoMagic,
        "not a graft video container")
      val n = bb.getInt()
      (0 until n).map { _ =>
        val len = bb.getInt()
        val f = new Array[Byte](len)
        bb.get(f)
        f
      }
    }

    /** Frame count a video carries: 1 frame / 100 ms of duration — the
      * synthesis contract the frame-sample oracle replays in SQL. */
    def frameCount(meta: MediaMeta): Int =
      math.max(1, (meta.durationMs / 100L).toInt)

    /** Encode signed 16-bit mono PCM as a real WAV (RIFF) blob.
      *
      * Round-18 lock-contention fix: every `AudioSystem` entry point
      * (write AND getAudioInputStream) runs a provider scan behind the
      * JVM-global `JSSecurityManager.getProviders` monitor — an
      * in-process thread dump of the sf3 decode queries showed 55/62
      * executor-thread samples BLOCKED on that one lock (task run time
      * ~9x task CPU time across the mm family). PCM16 WAVE output is a
      * fixed 44-byte canonical header plus little-endian samples, so
      * the encoder assembles the bytes directly — MultimodalSpec pins
      * byte-for-byte equality with [[encodeWavViaAudioSystem]], the
      * retired provider-based spelling, across lengths and rates. */
    def encodeWav(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val rate = sampleRate.toInt
      bb.putInt(0x46464952)             // "RIFF" (LE int of the ASCII)
        .putInt(36 + dataLen)
        .putInt(0x45564157)             // "WAVE"
        .putInt(0x20746d66)             // "fmt "
        .putInt(16)                     // PCM fmt chunk length
        .putShort(1)                    // wFormatTag = PCM
        .putShort(1)                    // mono
        .putInt(rate)
        .putInt(rate * 2)               // byte rate = rate * blockAlign
        .putShort(2)                    // blockAlign = 2 bytes/frame
        .putShort(16)                   // bits/sample
        .putInt(0x61746164)             // "data"
        .putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    /** The pre-r18 AudioSystem spelling of [[encodeWav]] — kept as the
      * spec reference the direct encoder is pinned byte-identical to. */
    private[graft] def encodeWavViaAudioSystem(
        samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
      val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        data(2 * i) = (samples(i) & 0xff).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new ByteArrayInputStream(data), fmt, samples.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode a WAV blob to float PCM in [-1, 1).
      *
      * Same r18 lock fix as [[encodeWav]]: a strict lock-free RIFF
      * parser handles the canonical PCM16-mono case; ANYTHING it does
      * not fully recognize — wrong magic, non-PCM format, odd chunk
      * geometry, truncation — falls back to [[decodeAudioViaAudioSystem]],
      * the provider-based path, which stays the authority on malformed
      * and exotic blobs. So well-formed blobs decode to the identical
      * floats without the global lock, and failure verdicts
      * (q_mm_decode_errors) are decided by exactly the pre-r18 code. */
    def decodeAudio(bytes: Array[Byte]): Array[Float] =
      decodeWavPcm16(bytes).getOrElse(decodeAudioViaAudioSystem(bytes))

    /** Strict canonical-PCM16-mono WAV parse; None on anything else. */
    private[graft] def decodeWavPcm16(bytes: Array[Byte]): Option[Array[Float]] = {
      if (bytes.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (bb.getInt(0) != 0x46464952 || bb.getInt(8) != 0x45564157)
        return None                     // not RIFF/WAVE
      var pos = 12
      var fmtOk = false
      var out: Array[Float] = null
      while (pos + 8 <= bytes.length) {
        val id = bb.getInt(pos)
        val len = bb.getInt(pos + 4)
        if (len < 0 || pos + 8 + len > bytes.length) return None // truncated
        if (id == 0x20746d66) {         // "fmt "
          if (len < 16) return None
          val tag = bb.getShort(pos + 8)
          val ch = bb.getShort(pos + 10)
          val bits = bb.getShort(pos + 22)
          if (tag != 1 || ch != 1 || bits != 16) return None // not PCM16 mono
          fmtOk = true
        } else if (id == 0x61746164) {  // "data"
          if (!fmtOk || out != null) return None // data before fmt / twice
          val n = len / 2
          val o = new Array[Float](n)
          var i = 0
          while (i < n) { o(i) = bb.getShort(pos + 8 + 2 * i) / 32768f; i += 1 }
          out = o
        }
        pos += 8 + len + (len & 1)      // RIFF chunks are word-aligned
      }
      Option(out)
    }

    /** The pre-r18 AudioSystem spelling of [[decodeAudio]] — the
      * fallback authority for non-canonical blobs, and the spec
      * reference the fast path is pinned float-identical to. */
    private[graft] def decodeAudioViaAudioSystem(bytes: Array[Byte]): Array[Float] = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected 16-bit mono PCM, got $fmt")
      val raw = ais.readAllBytes()
      val out = new Array[Float](raw.length / 2)
      var i = 0
      while (i < out.length) {
        val lo = raw(2 * i) & 0xff
        val hi = raw(2 * i + 1).toInt
        val s = if (fmt.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort
                else ((hi << 8) | lo).toShort
        out(i) = s / 32768f
        i += 1
      }
      out
    }

    /** 64-bit average-hash (aHash) of a decoded gray raster — the
      * classic perceptual image fingerprint: resize to 8×8 through the
      * deterministic nearest-neighbour [[resize]], bit i set iff
      * thumbnail pixel i >= the integer floor mean of the 64 pixels.
      * All-integer, so the hash is bit-stable across JVMs. */
    def aHash(px: Array[Byte], w: Int, h: Int): Long = {
      val t = resize(px, w, h, 8, 8)
      var sum = 0L
      var i = 0
      while (i < 64) { sum += (t(i) & 0xff); i += 1 }
      val mean = sum / 64
      var code = 0L
      i = 0
      while (i < 64) {
        if ((t(i) & 0xff) >= mean) code |= (1L << i)
        i += 1
      }
      code
    }

    /** The audio twin: 64 equal sample windows, bit i set iff window i's
      * mean amplitude >= the global mean. Computed on the raw 16-bit
      * sample values scaled to ints (never float sums), so the hash is
      * exact. */
    def audioHash(pcm: Array[Float]): Long = {
      if (pcm.isEmpty) return 0L
      val n = pcm.length
      val scaled = new Array[Long](n)
      var i = 0
      while (i < n) { scaled(i) = math.round(pcm(i) * 32768f).toLong; i += 1 }
      val winSum = new Array[Long](64)
      val winN = new Array[Long](64)
      i = 0
      while (i < n) {
        val w = math.min(63, i * 64 / n)
        winSum(w) += math.abs(scaled(i)); winN(w) += 1
        i += 1
      }
      val totalMeanNum = scaled.map(math.abs).sum
      var code = 0L
      var w = 0
      while (w < 64) {
        // compare window mean to global mean in cross-multiplied integer
        // space: winSum/winN >= total/n  <=>  winSum*n >= total*winN
        if (winN(w) > 0 && winSum(w) * n >= totalMeanNum * winN(w))
          code |= (1L << w)
        w += 1
      }
      code
    }
  }

  // --------------------------------------------------------- operators

  /** Deterministic gray raster for (id, frame): pixel values derive from
    * the embedding float bits — the synthetic stand-in for "whatever was
    * in the photo", chosen so every media_id gets distinct real content. */
  private def synthRaster(id: Long, emb: Array[Float], frame: Int,
      w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) {
      val bits = java.lang.Float.floatToIntBits(emb((i + frame) % emb.length))
      px(i) = ((bits >>> ((i + id.toInt + frame) % 24)) & 0xff).toByte
      i += 1
    }
    px
  }

  /** Synthesize a deterministic media table from `embeddings` (no media
    * fixture ships in testdata) — but the blobs are REAL encoded media:
    * images are PNG (ImageIO), audio is WAV PCM (javax.sound), video is
    * the length-prefixed PNG-frame container. Content derives from the
    * embedding floats, metadata from the label. Stands in for
    * `read.format("binaryFile")` / a parquet blob table at scale. */
  def mediaTable(s: SparkSession, d: String): Dataset[Media] =
    mediaFrom(s,
      T.embeddings(s, d).select(col("vec_id"), col("embedding"), col("label")))

  /** The media table with metadata only — `bytes` left empty, the
    * codecs never run. The synthesis map is a typed Dataset.map, which
    * is opaque to Catalyst: a downstream select of the meta struct
    * cannot prune the blob encode inside it (guide §4.1 — the engine
    * must do the pruning the optimizer can't see). Metadata-only
    * consumers ([[qMmMetaStats]]) read THIS frame; every field they
    * touch is byte-identical to [[mediaTable]]'s. */
  def mediaMetaTable(s: SparkSession, d: String): Dataset[Media] =
    mediaFrom(s,
      T.embeddings(s, d).select(col("vec_id"), col("embedding"), col("label")),
      withBytes = false)

  /** The synthesis map over an (id, embedding, label) frame — factored
    * out so a FILTERED source only encodes the blobs it keeps (the
    * planted-duplicate branch of [[qMmDedup]] pushes its predicate to
    * the embeddings scan instead of re-encoding the whole corpus). */
  private def mediaFrom(s: SparkSession,
      src: org.apache.spark.sql.DataFrame,
      withBytes: Boolean = true): Dataset[Media] = {
    import s.implicits._
    src.as[(Long, Array[Float], Int)]
      .map { case (id, emb, label) =>
        val kind = (id % 3) match {
          case 0 => "video"
          case 1 => "audio"
          case _ => "image"
        }
        val meta = MediaMeta(
          mime = kind match {
            case "video" => "video/x-graft-png-seq"
            case "audio" => "audio/wav"
            case _       => "image/png"
          },
          width = if (kind == "audio") 0 else 16 + (label % 4) * 16,
          height = if (kind == "audio") 0 else 16 + (label % 3) * 16,
          durationMs =
            if (kind == "video") 300L + (id % 10) * 100L
            else if (kind == "audio") 1000L + (id % 5) * 500L
            else 0L)
        val bytes = if (!withBytes) Array.emptyByteArray else kind match {
          case "image" =>
            Codecs.encodePng(
              synthRaster(id, emb, 0, meta.width, meta.height),
              meta.width, meta.height)
          case "video" =>
            Codecs.encodeVideo((0 until Codecs.frameCount(meta)).map(f =>
              Codecs.encodePng(
                synthRaster(id, emb, f, meta.width, meta.height),
                meta.width, meta.height)))
          case _ =>
            // sample count contract the audio-stats oracle replays:
            // (64 + id % 64) * 4 signed 16-bit samples
            val n = (64 + (id % 64).toInt) * 4
            val samples = new Array[Short](n)
            var i = 0
            while (i < n) {
              val bits = java.lang.Float.floatToIntBits(emb(i % emb.length))
              samples(i) = ((bits >>> (i % 17)) & 0xffff).toShort
              i += 1
            }
            Codecs.encodeWav(samples)
        }
        Media(id, kind, bytes, meta)
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

  /** The first decodable raster of a blob: the image itself, or a
    * video's frame 0. Real ImageIO decode either way. */
  private def firstRaster(m: Media): (Int, Int, Array[Byte]) = m.kind match {
    case "video" => Codecs.decodeImage(Codecs.videoFramePngs(m.bytes).head)
    case _       => Codecs.decodeImage(m.bytes)
  }

  /** Batched decode+featurize: one codec "instance" per partition, reused
    * across records — the mapPartitions analogue of a pandas/arrow batch
    * UDF (state amortized over the batch, not per record). Features are
    * modality-appropriate: gray histogram over real decoded pixels for
    * image/video, a 16-bin amplitude histogram over real decoded PCM for
    * audio. */
  def imageFeatures(media: Dataset[Media]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // ImageIO/AudioSystem plugin registries are JVM-global (loaded once
      // per executor); per-record codec construction cost is stream setup
      it.map { m =>
        val feature = m.kind match {
          case "audio" =>
            val pcm = Codecs.decodeAudio(m.bytes)
            val f = new Array[Float](16)
            var i = 0
            while (i < pcm.length) {
              f(math.min(15, (math.abs(pcm(i)) * 16).toInt)) += 1f
              i += 1
            }
            if (pcm.length > 0) {
              var j = 0; while (j < 16) { f(j) /= pcm.length; j += 1 }
            }
            f
          case _ =>
            Codecs.features(firstRaster(m)._3)
        }
        MediaFeature(m.media_id, m.kind, feature)
      }
    }
  }

  /** Decode + resize to thumbnails — visual kinds only (audio has no
    * raster to resize). Geometry comes from the DECODED raster, not the
    * metadata — the codec is the source of truth once bytes are open. */
  def thumbnails(media: Dataset[Media], w2: Int = 8, h2: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(m => m.kind == "image" || m.kind == "video").mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = firstRaster(m)
        Frame(m.media_id, 0, w2, h2, Codecs.resize(px, w, h, w2, h2))
      }
    }
  }

  /** Frame sampling: videos explode into every `everyN`-th frame, each
    * one a real PNG decode. Dropped frames never hit the codec — the
    * container is split first, ImageIO runs only on kept frames. flatMap
    * keeps it streaming-shaped (no driver materialization). */
  def sampleFrames(media: Dataset[Media], everyN: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val pngs = Codecs.videoFramePngs(m.bytes)
      (0 until pngs.length by everyN).map { f =>
        val (w, h, px) = Codecs.decodeImage(pngs(f))
        Frame(m.media_id, f, w, h, px)
      }
    }
  }

  // ------------------------------------------------- declared queries

  /** Decode+featurize rollup — real ImageIO/javax.sound decode per blob;
    * pixel-derived output has no SQL spelling -> no oracle; MultimodalSpec
    * pins exact values against an independent JVM-side decode. */
  val qMmFeatures = Q(
    "q_mm_features",
    (s, d) => {
      import s.implicits._
      imageFeatures(mediaTable(s, d)).toDF()
        .select(col("media_id"), col("kind"),
          graft.util.Det.r2(element_at(col("feature"), 1).cast("double"))
            .as("f0"))
        // materialize before the global sort: the range partitioner's
        // SAMPLING job otherwise re-executes the whole narrow
        // synthesize+decode chain (no shuffle boundary below the Sort)
        // — measured at sf3 as two identical ~39 s stages (the
        // winnowPairs r13 fix, applied to the codec family). Lazy, so
        // non-bench callers composing further transforms see no
        // eager execution.
        .localCheckpoint(false)
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
      // mediaMetaTable, not mediaTable: this rollup reads id/kind/meta
      // only, but the blob encode hides inside a typed map Catalyst
      // cannot prune through — the meta-only frame skips the codecs
      // for byte-identical output (measured at sf3: the rollup spent
      // ~54 s of executor time encoding blobs it never read)
      metaStats(mediaMetaTable(s, d)).orderBy("kind", "width", "height"),
    Some("""SELECT CASE vec_id % 3 WHEN 0 THEN 'video' WHEN 1 THEN 'audio'
                ELSE 'image' END AS kind,
           CASE WHEN vec_id % 3 = 1 THEN 0
                ELSE 16 + (label % 4) * 16 END AS width,
           CASE WHEN vec_id % 3 = 1 THEN 0
                ELSE 16 + (label % 3) * 16 END AS height,
           count(*) AS n
           FROM embeddings
           GROUP BY 1, 2, 3 ORDER BY kind, width, height"""))

  /** Audio decode accounting: REAL WAV decode per blob; the decoded
    * sample count follows the synthesis contract ((64 + id%64) * 4
    * samples), so DuckDB oracles it without decoding — the Spark side
    * still earns the number by opening every RIFF header. */
  val qMmAudioStats = Q(
    "q_mm_audio_stats",
    (s, d) => {
      import s.implicits._
      mediaTable(s, d).filter(_.kind == "audio")
        .map(m => (m.media_id,
          Codecs.decodeAudio(m.bytes).length.toLong,
          m.meta.durationMs))
        .toDF("media_id", "n_samples", "duration_ms")
        // same sampling-pass double-execution guard as q_mm_features
        .localCheckpoint(false)
        .orderBy("media_id")
    },
    Some("""SELECT vec_id AS media_id,
           (64 + vec_id % 64) * 4 AS n_samples,
           1000 + (vec_id % 5) * 500 AS duration_ms
           FROM embeddings WHERE vec_id % 3 = 1 ORDER BY media_id"""))

  /** Per-media 64-bit perceptual fingerprint: aHash of the first decoded
    * raster for image/video, the windowed amplitude-sign hash for audio.
    * One partition-batched decode pass; output is (media_id, kind,
    * phash) — 8 bytes per blob, the index a perceptual-dedup sweep
    * scans INSTEAD of the blobs. */
  def perceptualHash(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val ph = m.kind match {
          case "audio" => Codecs.audioHash(Codecs.decodeAudio(m.bytes))
          case _ =>
            val (w, h, px) = firstRaster(m)
            Codecs.aHash(px, w, h)
        }
        (m.media_id, m.kind, ph)
      }
    }.toDF("media_id", "kind", "phash")
  }

  /** Perceptual near-duplicate detection over a media table — the
    * image-dedup stage of a multimodal pipeline (exact byte dedup
    * misses re-encodes; perceptual hashes catch them): per media row,
    * the count of same-kind neighbours within Hamming distance
    * `maxHamming` of its [[perceptualHash]], and the min-id-owner
    * `keep` verdict (a row is pruned iff a LOWER-id neighbour exists —
    * the engine-wide deterministic survivor rule).
    *
    * Scale shape: blobs are decoded ONCE into 8-byte fingerprints;
    * everything after runs on the fingerprint index. Candidates come
    * from multi-index banding (4 × 16-bit bands — any pair at Hamming
    * <= 3 differs in at most 3 bands, so it collides EXACTLY on at
    * least one: the banding is complete at the default radius, not
    * approximate), grouped through [[Dedup.pairsFromGroups]] with its
    * hot-band df cap; the Hamming verify runs on candidate pairs only
    * (XOR+popcount on longs — [[Similarity.hammingDist]]). Blobs never
    * shuffle; the pair stage never sees more than band-collision
    * candidates. */
  def perceptualDedup(media: Dataset[Media], maxHamming: Int = 3): DataFrame = {
    val ph = perceptualHash(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (r19 measurement note: an eager ph.count() materialization was
    // tried against a suspected concurrent-stage cache race and made no
    // difference — summed executor run time is dominated by the
    // per-stage shuffle-writer file ops at this scale, not duplicate
    // synthesis; the one-pass cache behaves as designed.)
    val bands = ph.select(col("media_id").as("doc_id"), col("kind"),
      posexplode(array((0 until 4).map(b =>
        expr(s"(phash >> ${b * 16}) & 65535")): _*)))
      .toDF("doc_id", "kind", "band_no", "band")
    val cand = Dedup.pairsFromGroups(bands, Seq("kind", "band_no", "band"))
      .distinct()
    val withH = cand
      .join(ph.select(col("media_id").as("a"), col("phash").as("pa")), "a")
      .join(ph.select(col("media_id").as("b"), col("phash").as("pb")), "b")
      .filter(Similarity.hammingDist(col("pa"), col("pb")) <= maxHamming)
    val nbrs = withH.select(col("a").as("media_id"), col("b").as("nbr"))
      .unionAll(withH.select(col("b").as("media_id"), col("a").as("nbr")))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_nbrs"), min("nbr").as("min_nbr"))
    ph.join(nbrs, Seq("media_id"), "left")
      .select(col("media_id"), col("kind"), col("phash"),
        coalesce(col("n_nbrs"), lit(0L)).as("n_nbrs"),
        (col("min_nbr").isNull || col("min_nbr") > col("media_id"))
          .as("keep"))
  }

  /** Plant-id base: the smallest power of 10 (>= 100000) strictly above
    * every organic media_id, probed from the actual data — NOT a fixed
    * constant. Organic ids are vec_ids and grow ~linearly with scale
    * factor (46999 at sf1), so a fixed 100000/200000 offset silently
    * collides with organic ids at ~sf2+/sf5+, merging planted and
    * organic rows in the per-(kind,status) id extents (ADVICE r8). The
    * power-of-10 construction guarantees plants at `base` and `2·base`
    * never overlap each other or the organic space at ANY scale, while
    * reproducing the historical 100000/200000 ids at gate scales. The
    * probe is one max() over a single pruned column — bounded driver
    * state, the IVF-centroid class. */
  private[graft] def plantBase(s: SparkSession, d: String): Long = {
    // max() over an empty table is NULL — surface that as a clear error
    // instead of an NPE from getLong (ADVICE r9); an empty embeddings
    // table means the fixture dir is wrong, not that plants fit at 1e5
    val row = T.embeddings(s, d).agg(max(col("vec_id"))).head()
    require(!row.isNullAt(0),
      s"plantBase: embeddings table at $d is empty — cannot derive a plant-id base")
    val maxId = row.getLong(0)
    var b = 100000L
    while (b <= maxId) b *= 10
    b
  }

  /** The declared media table for [[qMmDedup]]: the synthesized corpus
    * plus PLANTED duplicates — every 50th media re-registered under
    * id+[[plantBase]] with identical bytes (the re-upload case; same
    * practice as the planted PII/nulls: the fixture has no organic media
    * dups, because each raster mixes its media_id into the pixel bits). */
  private def mediaWithPlants(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    val base = plantBase(s, d)
    // the plant branch filters at the embeddings SCAN, so only the ~2%
    // planted blobs are encoded a second time — not the whole corpus
    mediaTable(s, d).unionAll(
      mediaFrom(s, T.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), col("label"))
        .filter(col("vec_id") % 50 === 0))
        .map(m => m.copy(media_id = m.media_id + base)))
  }

  /** Perceptual dedup report over the planted corpus. Pixel-derived
    * hashes have no SQL spelling -> no oracle; MultimodalSpec replays
    * the full pipeline (hash + brute-force neighbours + survivors)
    * through the Codecs directly. */
  val qMmDedup = Q(
    "q_mm_dedup",
    (s, d) => perceptualDedup(mediaWithPlants(s, d)).orderBy("media_id"),
    None)

  /** Per-blob decode verdict: every blob is actually decoded through
    * its kind's codec (ALL video frames, the full PCM stream) inside a
    * Try — the ingest-audit primitive behind [[qMmDecodeErrors]].
    * Same mapPartitions batch shape as [[imageFeatures]]. */
  def decodeStatus(media: Dataset[Media]): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val ok = scala.util.Try {
          m.kind match {
            case "image" => Codecs.decodeImage(m.bytes)._3.nonEmpty
            case "video" =>
              val frames = Codecs.videoFramePngs(m.bytes)
              frames.nonEmpty &&
                frames.forall(p => Codecs.decodeImage(p)._3.nonEmpty)
            case _ => Codecs.decodeAudio(m.bytes).nonEmpty
          }
        }.getOrElse(false)
        (m.media_id, m.kind, if (ok) "ok" else "failed",
          m.bytes.length.toLong)
      }
    }.toDF("media_id", "kind", "status", "n_bytes")
  }

  /** Decode-failure audit — the robustness report a real ingest runs
    * before trusting a blob column (truncated uploads, wrong magic,
    * re-encodes gone bad): per (kind, status), blob count, byte mass
    * and id extents, with every blob ACTUALLY decoded (all frames, all
    * samples) under failure capture — a throwing codec marks the row
    * `failed` instead of killing the job, which is the operative
    * property at 100 TB where some corruption is a statistical
    * certainty. Corpus = the synthesized media plus PLANTED corruption
    * (every 25th blob re-registered under id+2·[[plantBase]] with its
    * first 8 bytes dropped — kills the PNG signature, the RIFF header
    * and the frame-container magic alike; the qMmDedup planting
    * practice, since the synthesized fixture contains no organic
    * corruption; the data-derived base keeps the planted id space
    * disjoint from organic ids at every scale factor). Rows-only
    * (pixel/codec behavior has no SQL spelling); MultimodalSpec pins
    * that exactly the planted blobs fail and counts conserve. */
  val qMmDecodeErrors = Q(
    "q_mm_decode_errors",
    (s, d) => {
      import s.implicits._
      val plantOffset = 2L * plantBase(s, d)
      val base = mediaTable(s, d)
      val corrupt = mediaFrom(s, T.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), col("label"))
          .filter(col("vec_id") % 25 === 0))
        .map(m => m.copy(media_id = m.media_id + plantOffset,
          bytes = m.bytes.drop(8)))
      decodeStatus(base.unionAll(corrupt))
        .groupBy("kind", "status")
        .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
          min("media_id").as("min_id"), max("media_id").as("max_id"))
        .orderBy("kind", "status")
    },
    None)

  val all: Seq[Q] =
    Seq(qMmFeatures, qMmFrameSample, qMmMetaStats, qMmAudioStats, qMmDedup,
      qMmDecodeErrors)
}
