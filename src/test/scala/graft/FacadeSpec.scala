package graft

import org.apache.spark.sql.functions._

/** The public df-in/df-out facade resolves and composes — each entry
  * point's semantics are pinned in its operator's own suite; this only
  * guards the facade wiring itself. */
class FacadeSpec extends SparkSpec {

  test("facade entry points run end-to-end on ad-hoc frames") {
    val s = spark
    import s.implicits._

    val comps = Graft.connectedComponents(
      Seq(1L -> 2L, 3L -> 4L).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))

    val pairs = Graft.candidatePairs(
      Seq((10L, "k"), (20L, "k"), (30L, "other")).toDF("doc_id", "key"),
      Seq("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((10L, 20L)))

    val filled = Graft.gapfillDaily(
      Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
          (1L, java.sql.Timestamp.valueOf("2026-01-03 10:00:00")))
        .toDF("k", "ts"), "k", "ts")
      .orderBy("day")
      .collect().map(r => r.getDate(1).toString -> r.getLong(2))
    assert(filled.toSeq === Seq(
      "2026-01-01" -> 1L, "2026-01-02" -> 0L, "2026-01-03" -> 1L))

    val joined = Graft.saltedJoin(
      Seq((1L, "x")).toDF("k", "v"),
      Seq((1L, "dim")).toDF("k", "d"), "k", 4)
    assert(joined.count() === 1)
  }

  test("corpus-assembly cores work on arbitrary frames") {
    import spark.implicits._
    val rows = Seq(("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L),
      ("b", 4L, 50L)).toDF("shard", "id", "n_tok")
    val bins = Graft.packBins(rows, "shard", "id", "n_tok", 256)
      .orderBy("shard", "bin").collect()
    // shard a: ids 1,2 start at 0,100 (bin 0); id 3 starts at 200 (bin 0)
    // — all inside bin 0? 200 < 256 yes. So a -> one bin of 3 docs.
    assert(bins.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("a", 0L, 3L), ("b", 0L, 1L)))

    val probe = Seq((1L, "x y z w p q r s t"), (2L, "nothing shared here at all eight grams long")).toDF("id", "text")
    val corpus = Seq((9L, "x y z w p q r s t u v")).toDF("id", "text")
    val scan = Graft.contaminationScan(probe, corpus, "id", "text", 8)
      .orderBy("id").collect()
    assert(scan.map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 2L), (2L, 0L)))

    val mix = Graft.mixWeights(rows, "shard", "n_tok")
      .orderBy("shard").collect()
    // a holds 300/350 tokens (fair share 175) -> downsampled; b kept
    assert(mix.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(mix(0).getDouble(4) < 1.0 && mix(1).getDouble(4) === 1.0)

    val bloomScan = Graft
      .contaminationScanBloom(probe, corpus, "id", "text", 8)
      .orderBy("id").collect()
    assert(bloomScan.map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 2L), (2L, 0L)))

    val diff = Graft.snapshotDiff(
      Seq((1L, "h1"), (2L, "h2")).toDF("id", "fp"),
      Seq((2L, "h2x"), (3L, "h3")).toDF("id", "fp"),
      "id", "fp")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(diff.toSeq ===
      Seq((1L, "removed"), (2L, "changed"), (3L, "added")))

    // a NULL fingerprint on one side is a CHANGE (null-safe compare),
    // and null == null is unchanged
    val nullDiff = Graft.snapshotDiff(
      Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
        .toDF("id", "fp"),
      Seq((1L, Some("h1")), (2L, Option.empty[String])).toDF("id", "fp"),
      "id", "fp")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(nullDiff.toSeq === Seq((1L, "changed"), (2L, "unchanged")))
  }

  test("analytics and quality cores run on ad-hoc frames") {
    import spark.implicits._
    val ts = (h: Int, m: Int) =>
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val events = Seq(
      (1L, ts(9, 0), 10L, 5.0), (1L, ts(9, 30), 11L, 9.0),
      (1L, ts(10, 0), 12L, 2.0), (1L, ts(10, 5), 13L, 4.0))
      .toDF("k", "ts", "id", "v")
    val bars = Graft.ohlcBars(events, "k", "ts", "id", "v", "hour")
      .orderBy("bucket_ms").collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))
    assert(bars.toSeq === Seq(
      (2L, 5.0, 9.0, 5.0, 9.0),   // 9h: open 5, high 9, low 5, close 9
      (2L, 2.0, 4.0, 2.0, 4.0)))  // 10h: open 2, high 4, low 2, close 4

    val kw = Graft.tfidfKeywords(
      Seq((1L, "rare common common"), (2L, "common common other"))
        .toDF("id", "text"), "id", "text", 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // "common" is in every doc (idf 0); the doc-unique token wins
    assert(kw.toSeq === Seq((1L, "rare"), (2L, "other")))

    val prof = Graft.profile(
      Seq((Some(1), "a"), (None, "a"), (Some(3), "b"))
        .toDF("num", "cat"), Seq("num", "cat"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(prof.toSeq === Seq(("cat", 0L, 2L, 3L), ("num", 1L, 2L, 3L)))
  }

  test("round-5 facade entries run on ad-hoc frames") {
    import spark.implicits._
    // forward/nearest as-of: one key, right rows at 5 and 20
    val left = Seq((1L, 0L, 10L), (2L, 0L, 18L)).toDF("id", "k", "ts")
    val right = Seq((0L, 5L, 50L), (0L, 20L, 200L)).toDF("k", "rts", "v")
    val fwd = Graft.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"),
      direction = "forward").orderBy("id").collect()
    // output column order: keys, leftTs, left-only cols, asof_* carries
    assert(fwd.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      === Seq((1L, 20L, 200L), (2L, 20L, 200L)))
    val near = Graft.asofNearest(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .orderBy("id").collect()
    // ts=10: back Δ5 < fwd Δ10 -> back (5); ts=18: fwd Δ2 < back Δ13 (20)
    assert(near.map(r => (r.getLong(2), r.getLong(3))).toSeq
      === Seq((1L, 5L), (2L, 20L)))

    // substring dedup on a planted 3-token span
    val docs = Seq((1L, "a b c d"), (2L, "x a b c")).toDF("id", "text")
    val sd = Graft.substringDedup(docs, "id", "text", 3)
      .orderBy("id").collect()
    assert(sd.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((1L, 2L, 0L), (2L, 2L, 1L)))

    // BPE learning on a tiny corpus: "ab" twice -> (a,b) learned first
    val corpus = Seq("ab ab ac").toDF("text")
    val merges = Graft.learnBpeMerges(corpus, "text", 2)
    assert(merges.head === (("a", "b", 2L)))
  }

  test("round-6 facade entries run on ad-hoc frames") {
    import spark.implicits._
    // best-fit vs chunk on generic column names, budget 10,
    // one shard, tails 6,5,7 in id order:
    //   chunk: total 18 -> 2 bins, waste 2 (ppm 100000); doc 2 (off 6)
    //   crosses the first boundary -> 1 split
    //   best-fit: 6 -> bin(rem 4); 5 no fit -> bin(rem 5); 7 no fit ->
    //   bin(rem 3) => 3 bins, waste 12 (ppm 400000)
    val rows = Seq((1L, "g", 6L), (2L, "g", 5L), (3L, "g", 7L))
      .toDF("id", "grp", "toks")
    val rep = Graft.packBestFit(rows, "grp", "id", "toks", 10).head()
    assert(rep.getString(0) === "g")
    assert((rep.getLong(1), rep.getLong(2), rep.getLong(3), rep.getLong(4),
      rep.getLong(5), rep.getLong(6), rep.getLong(7))
      === ((3L, 18L, 2L, 1L, 100000L, 3L, 400000L)))

    // gopher matrix over a custom text column: a clean 25-worder keeps,
    // a 10-worder fails only the word-count rule
    val g = Graft.gopherRules(
      Seq((1L, (1 to 25).map(i => s"word$i").mkString(" ")),
          (2L, (1 to 10).map(i => s"word$i").mkString(" ")))
        .toDF("id", "body"), "body")
      .select("id", "ok_words", "gopher_keep").orderBy("id").collect()
    assert(g.map(r => (r.getBoolean(1), r.getBoolean(2))).toSeq
      === Seq((true, true), (false, false)))

    // learned-table encode round-trip through the column facade
    val enc = Seq("ab cd").toDF("text")
      .select(Graft.bpeEncodeWith(col("text"), Seq("a" -> "b")))
      .head().getSeq[String](0)
    assert(enc === Seq("ab", "c", "d"))
    val fixed = Seq("the").toDF("text")
      .select(Graft.bpeEncode(col("text"))).head().getSeq[String](0)
    assert(fixed === Seq("the"))
  }

  test("round-7 facade entries run on ad-hoc frames") {
    import spark.implicits._
    // PQ encode with a hand-built 2-codeword, 2-subspace codebook over
    // dim-4 vectors: codeword 0 = (0,0,0,0), codeword 1 = (1,1,1,1).
    // v = (0.9, 1.1, 0.1, -0.1): subspace 0 picks code 1 (dist 0.02),
    // subspace 1 picks code 0 (dist 0.02) -> err 0.04.
    val cb = Array(0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0)
    val out = Graft.pqEncode(
        Seq((1L, Seq(0.9, 1.1, 0.1, -0.1))).toDF("id", "v"),
        "v", cb, nCodes = 2, nSub = 2)
      .select("graft_codes", "graft_pq_err").head()
    assert(out.getSeq[Long](0) === Seq(1L, 0L))
    assert(math.abs(out.getDouble(1) - 0.04) < 1e-12)

    // mixApply on generic columns: one dominant shard downsamples,
    // the small one rides min(1, .) — verdicts accounted per shard
    val mix = Graft.mixApply(
        ((0L until 30L).map(i => ("big", i, 100L)) ++
          Seq(("small", 100L, 10L))).toDF("shard", "id", "toks"),
        "shard", "id", "toks")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mix("small") === 100L)
    assert(mix("big") < 100L)
  }

  test("round-7 selection facade entries run on ad-hoc frames") {
    import spark.implicits._
    // fuzzy decontamination: an exact copy is always an LSH candidate
    // (identical signature -> identical bands) and passes the Jaccard
    // verify; an unrelated doc shares no band
    val probe = Seq((1L, "a b c d e f")).toDF("id", "txt")
    val corpus = Seq((11L, "a b c d e f"), (12L, "q r s t u v"))
      .toDF("id", "txt")
    val fz = Graft.contaminationScanFuzzy(probe, corpus, "id", "txt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(fz.toSeq === Seq((1L, 1L, true)))

    // DSIR weights: a doc made of target-side tokens must outscore a
    // doc made of raw-only tokens under the target's distribution
    val rows = Seq(
      (1L, "t", "alpha alpha beta"), (2L, "t", "alpha beta beta"),
      (3L, "r", "gamma delta gamma"), (4L, "r", "delta gamma delta"),
      (5L, "r", "alpha beta alpha"), (6L, "r", "gamma delta delta"))
      .toDF("id", "src", "txt")
    val dw = Graft.dsirWeights(rows, "id", "txt", col("src") === "t")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dw(5L) > dw(6L),
      s"target-like doc 5 (${dw(5L)}) must outscore raw-like doc 6 (${dw(6L)})")

    // binary sign codes: 3 flipped dimensions = Hamming 3
    val va = Array.fill(64)(1.0)
    val vb = va.clone(); vb(3) = -1.0; vb(17) = -1.0; vb(42) = -1.0
    val h = Seq((va, vb)).toDF("a", "b")
      .select(Graft.hammingDist(
        Graft.binarySignCode("a"), Graft.binarySignCode("b")).as("h"))
      .head().getLong(0)
    assert(h === 3L)
  }

  test("bloomSemiJoin equals the plain left-semi join on any key type") {
    import spark.implicits._
    val big = (1L to 2000L).map(i => (i, s"row$i")).toDF("k", "v")
    val small = Seq(5L, 500L, 1500L, 9999L).toDF("k")
    val got = Graft.bloomSemiJoin(big, small, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = big.join(small.distinct(), Seq("k"), "left_semi")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === want.toSeq)
    assert(got.map(_._1).toSeq === Seq(5L, 500L, 1500L))
  }

  test("survivors keeps the best-quality member and the group size") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 9L), (2L, 20L, 1L))
      .toDF("comp", "id", "quality")
    val got = Graft.survivors(df, "comp", "quality", "id")
      .orderBy("comp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // comp 1: quality tie 11 vs 12 -> min id 11; size 3
    assert(got.toSeq === Seq((1L, 11L, 9L, 3L), (2L, 20L, 1L, 1L)))
  }

  test("clearCaches evicts memoized index artifacts and cached plans") {
    // memoized: two asks for the same (session, dataset, k, iters) hand
    // back the SAME frame instance...
    val before = ops.Similarity.ivfCells(spark, sf)
    assert(ops.Similarity.ivfCells(spark, sf) eq before)
    // a persisted operator frame registers in the session's cache manager
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cached = spark.range(3).toDF("x").persist(level)
    cached.count()
    assert(cached.storageLevel === level)

    Graft.clearCaches(spark)

    // ...and a DIFFERENT instance after eviction (rebuilt, not served
    // from the dead entry), with the old frame's storage released
    assert(!(ops.Similarity.ivfCells(spark, sf) eq before))
    assert(cached.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    // the rebuilt index still answers (fresh entry is live, not poisoned)
    assert(ops.Similarity.ivfCells(spark, sf).count() > 0)
  }

  test("round-8 facade entries run on ad-hoc frames") {
    val s = spark
    import s.implicits._

    // overlapJoin: [0,10]x[5,15] overlap, [0,10]x[20,30] don't
    val left = Seq((1L, 0L, 10L), (2L, 40L, 45L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 5L, 15L), (20L, 20L, 30L)).toDF("rid", "rs", "re")
    val ov = Graft.overlapJoin(left, right, "ls", "le", "rs", "re", 8L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ov.toSet === Set((1L, 10L)))

    // anomalyScan: one wild outlier in group "a"
    val vals = (1 to 50).map(i => ("a", i.toLong, 10.0)) :+ (("a", 99L, 1000.0))
    val an = Graft.anomalyScan(vals.toDF("g", "id", "v"), "g", "id", "v")
      .collect().head
    assert(an.getLong(4) === 1L && an.getLong(5) === 99L)

    // activeUsers: two users on day 0, one returns on day 3
    def ts(day: Int) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(day * 86400L))
    val act = Seq((ts(0), 1L), (ts(0), 2L), (ts(3), 1L)).toDF("ts", "u")
    val au = Graft.activeUsers(act, "ts", "u").orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(au.toSeq === Seq((0L, 2L, 2L, 2L), (3L, 1L, 2L, 2L)))
  }

  test("round-8b facade entries run on ad-hoc data") {
    // decodeStatus: a valid PNG decodes ok, a truncated blob fails
    val s = spark
    import s.implicits._
    import graft.ops.Multimodal.{Codecs, Media, MediaMeta}
    val good = Codecs.encodePng(Array.fill[Byte](16 * 16 * 1)(3), 16, 16)
    val media = Seq(
      Media(1L, "image", good, MediaMeta("image/png", 16, 16, 0L)),
      Media(2L, "image", good.drop(8), MediaMeta("image/png", 16, 16, 0L)))
      .toDS()
    val st = Graft.decodeStatus(media).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(st === Map(1L -> "ok", 2L -> "failed"))
  }
}
