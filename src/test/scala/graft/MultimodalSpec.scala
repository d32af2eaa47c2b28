package graft

import graft.functions.VectorFunctions
import graft.ops.Multimodal
import graft.ops.Multimodal.Codecs

import org.apache.spark.sql.functions._

/** Multimodal surface: schemas, partition-batched decode, metadata
  * pruning, frame explosion — over REAL codecs (ImageIO PNG,
  * javax.sound WAV). The fixture blobs are genuine encoded media, so
  * these tests exercise actual decode paths, not stand-ins. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, sf)

  test("media table: 500 rows, real encoded blobs with typed metadata") {
    assert(media.count() === 500)
    val m = media.filter(_.media_id == 3L).head()
    assert(m.kind === "video")
    assert(m.meta.mime === "video/x-graft-png-seq")
    assert(m.meta.durationMs === 600L)
    // 600 ms -> 6 real PNG frames in the container
    val frames = Codecs.videoFramePngs(m.bytes)
    assert(frames.length === 6)
    // each frame is a real PNG: ImageIO signature + decodable at the
    // metadata geometry
    frames.foreach { png =>
      assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte &&
        png(2) === 'N'.toByte && png(3) === 'G'.toByte)
      val (w, h, px) = Codecs.decodeImage(png)
      assert(w === m.meta.width && h === m.meta.height)
      assert(px.length === w * h)
    }
    // audio rows are real RIFF/WAVE files
    val a = media.filter(_.media_id == 1L).head()
    assert(new String(a.bytes.take(4), "US-ASCII") === "RIFF")
    assert(new String(a.bytes.slice(8, 12), "US-ASCII") === "WAVE")
    // image rows are real PNGs decodable at the metadata geometry
    val i = media.filter(_.media_id == 2L).head()
    val (iw, ih, _) = Codecs.decodeImage(i.bytes)
    assert(iw === i.meta.width && ih === i.meta.height)
  }

  test("PNG round-trip is lossless: known fixture decodes to exact pixels") {
    // 4x2 gradient fixture with every corner case byte value
    val px = Array[Byte](0, 1, 127, -128, -1, 64, -64, 32)
    val png = Codecs.encodePng(px, 4, 2)
    val (w, h, back) = Codecs.decodeImage(png)
    assert((w, h) === ((4, 2)))
    assert(back.toSeq === px.toSeq)
    // exact expected features of the fixture: 8 pixels -> gray bins
    // 0,0,7,8,15,4,12,2 (value >>> 4) each at weight 1/8
    val f = Codecs.features(px)
    val expect = new Array[Float](16)
    Seq(0, 0, 7, 8, 15, 4, 12, 2).foreach(b => expect(b) += 0.125f)
    assert(f.toSeq === expect.toSeq)
  }

  test("WAV round-trip: known samples decode to the exact PCM values") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 1234, -4321)
    val wav = Codecs.encodeWav(samples)
    val pcm = Codecs.decodeAudio(wav)
    assert(pcm.length === samples.length)
    samples.zip(pcm).foreach { case (s, f) =>
      assert(f === s / 32768f, s"sample $s decoded as $f")
    }
  }

  test("r18 lock-free WAV codec: encoder bytes identical to AudioSystem, " +
      "fast decode floats identical, corrupt blobs still rejected") {
    val shapes = Seq(
      Array[Short](),
      Array[Short](0),
      Array[Short](0, 1, -1, 32767, -32768, 1234, -4321),
      Array.tabulate(4096)(i => ((i * 2654435761L) >>> 7).toShort))
    for (samples <- shapes; rate <- Seq(8000f, 16000f, 44100f)) {
      val direct = Codecs.encodeWav(samples, rate)
      val viaAs = Codecs.encodeWavViaAudioSystem(samples, rate)
      assert(direct.toSeq === viaAs.toSeq,
        s"encoder bytes diverged for n=${samples.length} rate=$rate")
      // the strict parser must take the fast path on canonical blobs
      // and agree float-for-float with the AudioSystem reference
      val fast = Codecs.decodeWavPcm16(direct)
      assert(fast.isDefined, "canonical WAV must take the lock-free path")
      assert(fast.get.toSeq === Codecs.decodeAudioViaAudioSystem(direct).toSeq)
    }
    // the q_mm_decode_errors planting (first 8 bytes dropped) must still
    // fail: the fast parser bails (no RIFF magic) and the AudioSystem
    // fallback throws exactly as before
    val corrupt = Codecs.encodeWav(Array[Short](1, 2, 3)).drop(8)
    assert(Codecs.decodeWavPcm16(corrupt).isEmpty)
    intercept[Exception](Codecs.decodeAudio(corrupt))
    // a non-canonical but AudioSystem-readable shape must fall back, not
    // mis-parse: stereo PCM is outside the fast path's contract
    val stereo = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
      val data = Array[Byte](1, 0, 2, 0, 3, 0, 4, 0)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 2L)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    assert(Codecs.decodeWavPcm16(stereo).isEmpty,
      "stereo must not take the mono fast path")
    intercept[Exception](Codecs.decodeAudio(stereo)) // fallback's require fires
  }

  test("r18 cached PNG codec: encoder bytes identical to ImageIO.write, " +
      "cached-reader pixels identical to ImageIO.read") {
    val rasters = Seq(
      (1, 1, Array[Byte](0)),
      (3, 2, Array[Byte](0, 127, -1, 5, -128, 64)),
      (16, 16, Array.tabulate(256)(i => ((i * 37) & 0xff).toByte)),
      (48, 32, Array.tabulate(1536)(i => ((i * i + 11) & 0xff).toByte)))
    for ((w, h, px) <- rasters) {
      val cached = Codecs.encodePng(px, w, h)
      val viaIo = Codecs.encodePngViaImageIO(px, w, h)
      assert(cached.toSeq === viaIo.toSeq,
        s"PNG encoder bytes diverged for ${w}x$h")
      val (dw, dh, dpx) = Codecs.decodeImage(cached)
      assert((dw, dh) === (w, h))
      assert(dpx.toSeq === px.toSeq, s"decode round-trip broke for ${w}x$h")
    }
    // signature-stripped blobs (the q_mm_decode_errors planting) miss the
    // fast path and still fail through the ImageIO authority
    intercept[Exception](
      Codecs.decodeImage(Codecs.encodePng(Array[Byte](1, 2, 3, 4), 2, 2).drop(8)))
  }

  test("mediaMetaTable == mediaTable on every non-blob field (r18: the " +
      "meta-only frame behind q_mm_meta_stats skips the codecs)") {
    def rows(ds: org.apache.spark.sql.Dataset[Multimodal.Media]) =
      ds.collect().map(m =>
        (m.media_id, m.kind, m.meta.mime, m.meta.width, m.meta.height,
          m.meta.durationMs)).sortBy(_._1).toSeq
    assert(rows(Multimodal.mediaMetaTable(spark, sf)) === rows(media))
    // and the meta-only frame really carries no blob bytes
    assert(Multimodal.mediaMetaTable(spark, sf).collect()
      .forall(_.bytes.isEmpty))
    // end-to-end: the declared rollup is row-identical on either frame
    val viaMeta = Multimodal.metaStats(Multimodal.mediaMetaTable(spark, sf))
      .collect().map(_.toSeq).toSet
    val viaFull = Multimodal.metaStats(media).collect().map(_.toSeq).toSet
    assert(viaMeta === viaFull)
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

  test("featurize matches an independent local decode of the same blobs") {
    // the distributed mapPartitions path must agree bit-for-bit with a
    // plain driver-side ImageIO/javax.sound decode of the same bytes
    val distributed = Multimodal.imageFeatures(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val local = media.collect().map { m =>
      m.media_id -> (m.kind match {
        case "audio" =>
          val pcm = Codecs.decodeAudio(m.bytes)
          val f = new Array[Float](16)
          pcm.foreach(v => f(math.min(15, (math.abs(v) * 16).toInt)) += 1f)
          if (pcm.nonEmpty) (0 until 16).foreach(j => f(j) /= pcm.length)
          f.toSeq
        case "video" =>
          Codecs.features(
            Codecs.decodeImage(Codecs.videoFramePngs(m.bytes).head)._3).toSeq
        case _ =>
          Codecs.features(Codecs.decodeImage(m.bytes)._3).toSeq
      })
    }.toMap
    assert(distributed === local)
  }

  test("thumbnails come back at the requested geometry") {
    val t = Multimodal.thumbnails(media, 8, 8).collect()
    // visual kinds only: ids with id % 3 == 1 are audio (167 of 500)
    assert(t.length === 333)
    assert(t.forall(f => f.width === 8 && f.height === 8 && f.pixels.length === 64))
    // thumbnail pixels are a nearest-neighbour subset of the real decoded
    // raster — spot-check one image end-to-end
    val m = media.filter(_.media_id == 2L).head()
    val (w, h, px) = Codecs.decodeImage(m.bytes)
    val expect = Codecs.resize(px, w, h, 8, 8)
    val got = t.find(_.media_id == 2L).get.pixels
    assert(got.toSeq === expect.toSeq)
  }

  test("frame sampling: videos only, every 2nd frame, real decodes") {
    val frames = Multimodal.sampleFrames(media, 2).collect()
    val perVideo = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(perVideo.keySet.forall(_ % 3 == 0))
    perVideo.foreach { case (id, n) =>
      val count = Codecs.frameCount(
        media.filter(_.media_id == id).head().meta)
      assert(n === (count + 1) / 2, s"video $id: $n frames of $count")
    }
    // sampled frames carry the decoded raster, not container bytes
    val f0 = frames.find(f => f.media_id == 3L && f.frame_no == 2).get
    val container = media.filter(_.media_id == 3L).head()
    val (w, h, px) = Codecs.decodeImage(
      Codecs.videoFramePngs(container.bytes)(2))
    assert(f0.width === w && f0.height === h && f0.pixels.toSeq === px.toSeq)
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

  test("perceptual dedup: hashes, neighbours, and survivors replay locally") {
    val out = Multimodal.qMmDedup.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val base = media.collect()
    // plants live at the data-derived base (the smallest power of 10
    // above every organic id), never a fixed constant — 100000 at this
    // fixture scale
    val plantBase = Multimodal.plantBase(spark, sf)
    assert(plantBase === 100000L && base.forall(_.media_id < plantBase))
    val planted = base.filter(_.media_id % 50 == 0)
      .map(m => m.copy(media_id = m.media_id + plantBase))
    val allm = base ++ planted
    def hash(m: Multimodal.Media): Long = m.kind match {
      case "audio" => Codecs.audioHash(Codecs.decodeAudio(m.bytes))
      case "video" =>
        val (w, h, px) =
          Codecs.decodeImage(Codecs.videoFramePngs(m.bytes).head)
        Codecs.aHash(px, w, h)
      case _ =>
        val (w, h, px) = Codecs.decodeImage(m.bytes)
        Codecs.aHash(px, w, h)
    }
    val hs = allm.map(m => (m.media_id, m.kind, hash(m)))
    val expected = hs.sortBy(_._1).toSeq.map { case (id, k, h) =>
      val nbrs = hs.filter(o => o._1 != id && o._2 == k &&
        java.lang.Long.bitCount(o._3 ^ h) <= 3).map(_._1)
      (id, k, h, nbrs.length.toLong, nbrs.forall(_ > id))
    }
    // the 4x16-bit multi-index banding is COMPLETE at radius 3, so the
    // engine must equal the brute force exactly
    assert(out.toSeq === expected)
    // every plant resolves: >= 1 neighbour (its source) and pruned
    planted.foreach { m =>
      val row = out.find(_._1 == m.media_id).get
      assert(row._4 >= 1 && !row._5, s"plant ${m.media_id} not caught")
    }
    // the organic corpus is mostly unique (ids perturb the rasters)
    assert(out.count(_._5) > out.length / 2)
  }

  test("decode audit: exactly the planted corrupt blobs fail, counts conserve") {
    val rows = Multimodal.qMmDecodeErrors.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(4), r.getLong(5)))
    val nBase = Multimodal.mediaTable(spark, sf).count()
    val nPlanted = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 25 === 0).count()
    // every planted blob fails, every original decodes
    assert(rows.filter(_._2 == "failed").map(_._3).sum === nPlanted)
    assert(rows.filter(_._2 == "ok").map(_._3).sum === nBase)
    // failed rows live entirely in the planted id range (2·base, a
    // data-derived power of 10 disjoint from organic ids at any sf),
    // ok rows strictly below it
    val corruptBase = 2L * Multimodal.plantBase(spark, sf)
    rows.foreach { case (_, st, _, minId, maxId) =>
      if (st == "failed") assert(minId >= corruptBase)
      else assert(maxId < corruptBase)
    }
    // all three modalities report a failure row (the corruption is
    // format-agnostic: the dropped header kills every codec)
    assert(rows.filter(_._2 == "failed").map(_._1).toSet ===
      Set("image", "audio", "video"))
  }
}
