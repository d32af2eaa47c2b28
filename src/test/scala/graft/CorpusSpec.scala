package graft

import graft.ops.Corpus
import org.apache.spark.sql.functions._

/** Semantics of the corpus-assembly operators (packing, contamination,
  * mixture weights) beyond the hash-match gate: accounting invariants
  * that must hold for ANY corpus, cross-checked against independent
  * spellings of the same quantity. */
class CorpusSpec extends SparkSpec {

  test("q_pack_sequences conserves documents and tokens per shard") {
    val bins = Corpus.qPackSequences.fn(spark, sf)
    val perSource = bins.groupBy("source")
      .agg(sum("n_docs").as("docs"), sum("n_tokens").as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val truth = Tables.documents(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // every document and every token lands in exactly one bin
    assert(perSource === truth)
  }

  test("q_pack_sequences bins are dense from 0 and docs start in their bin") {
    val rows = Corpus.qPackSequences.fn(spark, sf)
      .orderBy("source", "bin").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val bins = rs.map(_.getLong(1)).toSeq
      // chunking a contiguous token stream can skip a bin only if one
      // document spans it whole — impossible while every doc is shorter
      // than the budget, which holds for this corpus (max 99 tokens)
      assert(bins === (0L until bins.size).toSeq)
    }
    // a bin's docs' start offsets all lie inside the bin: cross-check
    // the per-bin doc count against an independent offset computation
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = docs.flatMap { case (src, ds) =>
      var off = 0L
      ds.sortBy(_._2).map { case (_, _, n) =>
        val bin = off / Corpus.PackBudget; off += n; (src, bin)
      }.groupBy(identity).map { case ((s, b), xs) => (s, b) -> xs.size.toLong }
    }
    val got = rows.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("q_contamination flags exactly the test docs sharing an 8-gram with train") {
    val out = Corpus.qContamination.fn(spark, sf).collect()
    // recompute the overlap independently (plain Scala, no Spark ops)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def split8(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      if (tk.length < Corpus.ContamNgram) Set.empty
      else tk.sliding(Corpus.ContamNgram).map(_.mkString(" ")).toSet
    }
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes).map("%02x".format(_)).mkString
      val h = hex.substring(0, 2)
      if (h < "cc") "train" else if (h < "e6") "val" else "test"
    }
    val train = docs.filter(d => splitOf(d._1) == "train")
      .flatMap(d => split8(d._2)).toSet
    val expected = docs.filter(d => splitOf(d._1) == "test")
      .map { case (id, t) => id -> split8(t).count(train.contains).toLong }
      .toMap
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap === expected)
    out.foreach(r => assert(r.getBoolean(2) === (r.getLong(1) > 0)))
    // the gate must not be vacuous: this corpus plants duplicate docs,
    // some of which straddle the split
    assert(out.exists(_.getBoolean(2)), "no contaminated doc found")
  }

  test("bloom-pruned contamination scan is bit-identical to the exact scan") {
    val exact = Corpus.qContamination.fn(spark, sf).collect().toSeq
    val bloom = Corpus.qContaminationBloom.fn(spark, sf).collect().toSeq
    assert(bloom === exact)
  }

  test("bloom prune stays exact when nothing can be pruned (probe == corpus)") {
    // pathological for the OPTIMIZATION (every train gram passes the
    // bloom, zero shuffle saved) — the result must still be exact
    val docs = Tables.documents(spark, sf).limit(50)
    val exact = Corpus.contaminationScan(docs, docs, "doc_id", "text",
      Corpus.ContamNgram).orderBy("doc_id").collect().toSeq
    val bloom = Corpus.contaminationScanBloom(docs, docs, "doc_id", "text",
      Corpus.ContamNgram).orderBy("doc_id").collect().toSeq
    assert(bloom === exact)
    // self-scan: every doc with >= n tokens shares all its grams with
    // itself, so every such doc is contaminated
    assert(exact.forall(r => r.getBoolean(2) || r.getLong(1) == 0L))
  }

  test("q_snapshot_diff statuses partition both versions exactly") {
    val rows = Corpus.qSnapshotDiff.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // recompute version membership independently
    def hex(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes).map("%02x".format(_)).mkString
    }
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val v1 = ids.filter(id => hex(id).substring(0, 2) >= "08").toSet
    val v2 = ids.filter(id => hex(id).substring(0, 2) < "f8").toSet
    val changed = v2.filter(id => hex(id).charAt(2) == '7')
    assert(byStatus.getOrElse("added", 0L) === (v2 -- v1).size.toLong)
    assert(byStatus.getOrElse("removed", 0L) === (v1 -- v2).size.toLong)
    assert(byStatus.getOrElse("changed", 0L) ===
      (changed intersect v1).size.toLong)
    assert(byStatus.values.sum === (v1 union v2).size.toLong)
    // all four statuses must actually occur, or the gate is vacuous
    assert(byStatus.keySet === Set("added", "removed", "changed", "unchanged"))
  }

  test("q_mix_weights rates are in (0,1] and shares sum to ~100%") {
    val rows = Corpus.qMixWeights.fn(spark, sf).collect()
    val totalToks = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val share = r.getDouble(3); val rate = r.getDouble(4)
      assert(rate > 0.0 && rate <= 1.0)
      assert(math.abs(share -
        r.getLong(2).toDouble * 100.0 / totalToks) < 0.01)
      // the uniform-target rule: a source at or below its fair share of
      // tokens is kept whole (rate 1), an oversized one is downsampled
      val fair = totalToks.toDouble / rows.length
      if (r.getLong(2) <= fair.floor) assert(rate === 1.0)
      else assert(rate < 1.0 + 1e-9)
    }
    assert(math.abs(rows.map(_.getDouble(3)).sum - 100.0) < 0.5)
  }

  test("q_mix_temperature: sqrt scaling up-weights small domains, sums to 100") {
    val temp = ops.Corpus.qMixTemperature.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val total = temp.values.map(_._1).sum.toDouble
    assert(math.abs(temp.values.map(_._2).sum - 100.0) < 0.5)
    temp.foreach { case (src, (n, w)) =>
      val prop = n / total * 100.0
      // temperature alpha=0.5 compresses toward uniform: below-average
      // domains gain weight vs proportional, above-average ones lose
      if (prop < 100.0 / temp.size) assert(w > prop, s"$src: $w !> $prop")
      else if (prop > 100.0 / temp.size) assert(w < prop, s"$src: $w !< $prop")
      // replay the exact arithmetic locally
      val denom = math.floor(temp.values.map(v =>
        math.floor(math.sqrt(v._1.toDouble) * 1e6 + 0.5)).sum / 1e6 * 100 + 0.5) / 100
      val want = math.floor(math.sqrt(n.toDouble) * 100.0 / denom * 100 + 0.5) / 100
      assert(w === want, s"$src: $w != replayed $want")
    }
  }

  test("q_corpus_ngram_counts: top-100 bigram census replays locally") {
    val got = ops.Corpus.qCorpusNgramCounts.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val local = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).split(" ", -1))
      .filter(_.length >= 2)
      .flatMap(tk => tk.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (g, n) => (-n, g) }
      .take(100)
    assert(got.toSeq === local)
    // top-1 must be a genuinely frequent gram, not a tie artifact
    assert(got.head._2 > got.last._2)
  }

  test("q_pack_sequences_bpe conserves BPE tokens and docs per shard") {
    val out = Corpus.qPackSequencesBpe.fn(spark, sf)
    val packed = out.groupBy("source")
      .agg(sum("n_docs").as("d"), sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val direct = Tables.documents(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("d"),
        sum(size(graft.functions.BpeEncode.encode(col("text")))
          .cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(packed === direct)
    // every group's bin equals the window of its running start offset —
    // unlike the whitespace variant, bins may legitimately SKIP here (a
    // >256-BPE-token doc spans a whole window, so no doc starts in it),
    // but each emitted bin must still be exactly floor(prefix/budget)
    val rows = out.select("source", "bin", "n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (src, rs) =>
      var running = 0L
      rs.sortBy(_._2).foreach { case (_, bin, nTok) =>
        assert(bin === running / Corpus.PackBudget,
          s"$src bin $bin at offset $running")
        running += nTok
      }
    }
  }

  test("q_corpus_drift: ppm shifts replay in plain Scala; the planted edit tops") {
    val gateSf = "/root/testdata/sf0.01"
    val got = Corpus.qCorpusDrift.fn(spark, gateSf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val docs = Tables.documents(spark, gateSf)
      .select("doc_id", "text").collect()
      .map(r => (md5hex(r.getLong(0).toString), r.getString(1)))
    def toks(t: String) = t.split(" ", -1).filter(_.nonEmpty).toSeq
    val c1 = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val c2 = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (hh, t) =>
      if (hh.substring(0, 2) >= "08") toks(t).foreach(c1(_) += 1L)
      if (hh.substring(0, 2) < "f8") {
        val t2 = if (hh.charAt(2) == '7') t + " v2" else t
        toks(t2).foreach(c2(_) += 1L)
      }
    }
    val (t1, t2) = (c1.values.sum, c2.values.sum)
    def ppm(n: Long, t: Long) = math.floor(1e6 * n / t + 0.5).toLong
    val expected = (c1.keySet ++ c2.keySet).toSeq
      .map { k =>
        val (p1, p2) = (ppm(c1(k), t1), ppm(c2(k), t2))
        (k, c1(k), c2(k), p1, p2, math.abs(p1 - p2))
      }
      .sortBy { case (k, _, _, _, _, d) => (-d, k) }
      .take(50)
    assert(got.toSeq === expected)
    // the planted ' v2' edit is version-2-only and must top the report
    assert(got.head._1 === "v2" && got.head._2 === 0L)
  }

  test("q_corpus_drift survives an empty version slice (division guard)") {
    // doc_id 27 hashes to 02e7... < '08': in v2 only, so the v1 slice is
    // EMPTY — without the greatest(t,1) guard the ppm would be 0/0
    val s = spark
    import s.implicits._
    val row = Seq((27L, "alpha beta", "u")).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("drift_edge").toString
    row.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.qCorpusDrift.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // every token is v2-only: n1 = 0, ppm1 = 0, ppm2 honest
    assert(got.nonEmpty)
    got.foreach { case (_, n1, ppm1, ppm2) =>
      assert(n1 === 0L && ppm1 === 0L && ppm2 > 0L)
    }
  }

  test("q_bpe_learn replays Sennrich BPE training in plain Scala") {
    val gateSf = "/root/testdata/sf0.001"
    val got = Corpus.qBpeLearn.fn(spark, gateSf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // local replay of the exact algorithm
    val words = Tables.documents(spark, gateSf)
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
      .filter(_.nonEmpty).toSeq
    def encode(w: String, merges: Seq[(String, String)]): Seq[String] = {
      var toks = w.map(String.valueOf(_)).toVector
      merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks
    }
    var merges = Vector.empty[(String, String)]
    val expected = (0 until Corpus.BpeLearnRounds).map { rank =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      words.foreach { w =>
        encode(w, merges).sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) += 1L
          case _ =>
        }
      }
      val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      merges :+= ((a, b))
      (rank, a, b, n)
    }
    assert(got === expected)
    // learned tables are well-formed by construction: every component is
    // a single char or an earlier merge's output (the BpeEncode invariant)
    val formed = scala.collection.mutable.Set.empty[String]
    got.foreach { case (_, a, b, _) =>
      assert(a.length == 1 || formed(a), s"unformed left $a")
      assert(b.length == 1 || formed(b), s"unformed right $b")
      formed += (a + b)
    }
    // the counts are genuinely decreasing-or-equal over rounds (greedy)
    got.sliding(2).foreach {
      case Seq((_, _, _, n1), (_, _, _, n2)) => assert(n1 >= n2)
      case _ =>
    }
  }

  test("q_pack_bestfit: plain-Scala replay, conservation, and chunk lower bound") {
    val out = Corpus.qPackBestfit.fn(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    val b = Corpus.PackBudget.toLong
    def ppm(w: Long, d: Long): Long = if (d == 0) 0 else (2000000L * w + d) / (2 * d)
    // independent replay: naive list-scan best-fit (first index of the
    // tightest fit) — multiset-equivalent to the TreeMap kernel
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).length.toLong))
      .groupBy(_._1)
    out.foreach { case (src, nDocs, total, cBins, cSplits, cPpm, bBins, bPpm) =>
      val shard = docs(src).sortBy(_._2)
      assert(nDocs === shard.length.toLong)
      assert(total === shard.map(_._3).sum)
      assert(cBins === (total + b - 1) / b)
      assert(cPpm === ppm(cBins * b - total, cBins * b))
      // chunk split replay
      var off = 0L; var splits = 0L
      shard.foreach { case (_, _, n) =>
        if (n > 0 && off / b != (off + n - 1) / b) splits += 1
        off += n
      }
      assert(cSplits === splits)
      // best-fit replay
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      var full = 0L
      shard.foreach { case (_, _, n) =>
        full += n / b
        val t = n % b
        if (t > 0) {
          var best = -1
          rem.indices.foreach { i =>
            if (rem(i) >= t && (best == -1 || rem(i) < rem(best))) best = i
          }
          if (best == -1) rem += (b - t) else rem(best) -= t
        }
      }
      assert(bBins === full + rem.length)
      // conservation: waste is exactly capacity minus tokens
      assert(bPpm === ppm(bBins * b - total, bBins * b))
      // chunk is the information-theoretic bin lower bound
      assert(bBins >= cBins)
    }
    // non-vacuous: the policies genuinely trade off somewhere
    assert(out.exists(_._5 > 0), "no boundary-split docs — chunk cost unexercised")
    assert(out.exists(_._8 > 0), "zero best-fit padding everywhere — waste unexercised")
  }

  test("learned-table round-trip: encode-with-learned ≡ trainer's final tokenization") {
    val gateSf = "/root/testdata/sf0.001"
    import graft.functions.BpeEncode
    val learned = Corpus.learnBpeMerges(
      Tables.documents(spark, gateSf), "text", Corpus.BpeLearnRounds)
      .map { case (a, b, _) => (a, b) }
    assert(learned.length === Corpus.BpeLearnRounds)
    // Spark-side: the dynamic encode expression with the learned table
    val got = Tables.documents(spark, gateSf)
      .select(col("doc_id"), BpeEncode.encodeWith(col("text"), learned).as("toks"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toVector
    // plain-Scala replay: rank-order left-to-right merge application —
    // the trainer's own tokenization after its final round
    def encode(w: String): Vector[String] = {
      var toks = w.map(String.valueOf(_)).toVector
      learned.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
      toks
    }
    val expected = Tables.documents(spark, gateSf)
      .select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).filter(_.nonEmpty).toVector
          .flatMap(encode)).toVector
    assert(got === expected)
    // non-vacuous: the learned table actually merged something
    assert(got.exists(_._2.exists(_.length > 1)))
    // fixed point: after full application no learned pair survives
    // adjacent within any word — the trainer's next round would never
    // re-count an adopted merge (well-formed-table invariant)
    val learnedSet = learned.toSet
    val residual = Tables.documents(spark, gateSf)
      .select(explode(BpeEncode.pairs(col("text"), learned)).as("p"))
      .collect().map(_.getString(0).split(" ", 2))
      .count(p => learnedSet.contains((p(0), p(1))))
    assert(residual === 0)
  }

  test("q_bpe_apply_learned census: counts replay from the round-trip encode") {
    val gateSf = "/root/testdata/sf0.001"
    import graft.functions.BpeEncode
    val learned = Corpus.learnBpeMerges(
      Tables.documents(spark, gateSf), "text", Corpus.BpeLearnRounds)
      .map { case (a, b, _) => (a, b) }
    val products = learned.map { case (a, b) => a + b }.toSet
    val counts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    Tables.documents(spark, gateSf).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .foreach { w =>
        var toks = w.map(String.valueOf(_)).toVector
        learned.foreach { case (a, b) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.result()
        }
        toks.foreach(t => counts(t) += 1L)
      }
    val expected = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(50)
      .map { case (t, n) => (t, n, products.contains(t)) }
    val got = Corpus.qBpeApplyLearned.fn(spark, gateSf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === expected)
    // both flag values present: merged tokens rank AND raw chars remain
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  test("q_corpus_upsert: actions replay in plain Scala, accounting closes") {
    val gateSf = "/root/testdata/sf0.01"
    val rows = Corpus.qCorpusUpsert.fn(spark, gateSf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val docs = Tables.documents(spark, gateSf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val snap = docs.filter { case (id, _) =>
      val p = md5hex(id.toString).substring(0, 2); p >= "10" && p < "d0" }
      .map { case (id, t) => id -> md5hex(t) }.toMap
    val expected = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    var mentioned = Set.empty[Long]
    docs.foreach { case (id, t) =>
      val hh = md5hex(id.toString)
      if (hh.substring(0, 2) < "40") {
        mentioned += id
        val tomb = hh.charAt(2) >= 'c'
        val bfp = md5hex(if (hh.charAt(3) < '8') t + " v2" else t)
        val action =
          if (tomb && snap.contains(id)) "deleted"
          else if (tomb) "delete_noop"
          else if (!snap.contains(id)) "inserted"
          else if (snap(id) == bfp) "upsert_noop"
          else "updated"
        expected(action) += 1L
      }
    }
    expected("kept") = snap.keysIterator.count(!mentioned.contains(_)).toLong
    assert(rows === expected.toMap)
    // the merge accounts for every row and the result size closes
    val resultRows = Corpus.qCorpusUpsert.fn(spark, gateSf)
      .select("result_rows").head().getLong(0)
    assert(resultRows ===
      rows("kept") + rows("updated") + rows("upsert_noop") + rows("inserted"))
    // all six actions are exercised at the gate sf (non-vacuity)
    assert(rows.keySet === Set("kept", "deleted", "delete_noop",
      "inserted", "upsert_noop", "updated"))
  }

  test("q_pack_budget_sweep prices every budget from one offset pass") {
    val s = spark
    import s.implicits._
    // one shard: docs of 100 and 50 tokens in id order. offsets 0, 100;
    // the second doc spans [100, 149] and crosses the 128 boundary only.
    val dir = java.nio.file.Files.createTempDirectory("packsweep").toString
    Seq((1L, (1 to 100).map(i => s"a$i").mkString(" ")),
        (2L, (1 to 50).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("u"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.qPackBudgetSweep.fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // T = 150: bins = ceil(150/b), padding = bins*b - 150; only b=128
    // cuts a doc (doc 2 spans offsets 100..149 across the 128 line)
    assert(got(128L) === ((2L, 1L, 106L)))
    assert(got(256L) === ((1L, 0L, 106L)))
    assert(got(512L) === ((1L, 0L, 362L)))
    assert(got(1024L) === ((1L, 0L, 874L)))
  }

  test("q_mix_apply replays the md5-bucket sampling in plain Scala") {
    val s = spark
    import s.implicits._
    // source "big" dominates tokens -> rate < 1; "small" rides min(1, .)
    val rows = (0L until 40L).map(i => ("big", i, 50L)) ++
      (100L until 110L).map(i => ("small", i, 5L))
    val df = rows.toDF("source", "doc_id", "n_tok")
    val got = Graft.mixApply(df, "source", "doc_id", "n_tok")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // plain-Scala replay
    val perTok = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val total = perTok.values.sum.toDouble
    def r2(x: Double) = math.floor(x * 100 + 0.5) / 100
    def ratePct(src: String) =
      math.floor(r2(math.min(1.0, total / perTok.size / perTok(src)))
        * 100 + 0.5).toLong
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val rp = ratePct(src)
      val kept = rs.filter(r => bucket(r._2) < rp)
      assert(got(src) === ((rp, rs.size.toLong, kept.size.toLong,
        rs.map(_._3).sum, kept.map(_._3).sum)), s"source $src")
    }
    // the planted asymmetry exercises both regimes
    assert(got("small")._1 === 100L)
    assert(got("big")._1 < 100L && got("big")._3 < got("big")._2)
  }

  test("q_contamination_fuzzy replays banded MinHash + Jaccard verify in plain Scala") {
    val out = Corpus.qContaminationFuzzy.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(id: Long): String = {
      val h = md5hex(id.toString).substring(0, 2)
      if (h < "cc") "train" else if (h < "e6") "val" else "test"
    }
    def shingles(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      if (tk.length == 1) Set(tk(0))
      else tk.sliding(2).map(_.mkString(" ")).toSet
    }
    // 8 planes: two seeded md5s per shingle, four 8-hex chunks each,
    // min per chunk — the MinHashSig spelling
    def sig(sh: Set[String]): IndexedSeq[String] =
      (0 to 1).flatMap { seed =>
        val hs = sh.toSeq.map(s => md5hex(s"$seed:$s"))
        (0 until 4).map(c => hs.map(_.substring(c * 8, c * 8 + 8)).min)
      }
    def bands(sh: Set[String]): Seq[(Int, String)] = {
      val s = sig(sh)
      Seq(0 -> s.slice(0, 4).mkString, 1 -> s.slice(4, 8).mkString)
    }
    val shm = docs.toMap.view.mapValues(shingles).toMap
    val test_ = docs.filter(d => splitOf(d._1) == "test").map(_._1)
    val train = docs.filter(d => splitOf(d._1) == "train").map(_._1)
    val trainBands = train.flatMap(id => bands(shm(id)).map(b => b -> id))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = test_.sorted.map { t =>
      val cand = bands(shm(t)).flatMap(trainBands.getOrElse(_, Array.empty[Long]))
        .distinct
      val n = cand.count { c =>
        val a = shm(t); val b = shm(c)
        val ns = (a & b).size
        ns.toDouble / (a.size + b.size - ns) >= Corpus.FuzzyContamJaccard
      }.toLong
      (t, n, n > 0)
    }
    assert(out.toSeq === expected)
    // non-vacuous: the corpus plants near-dups, some straddle the split
    assert(out.exists(_._3), "no fuzzy-contaminated doc found")
  }

  test("epoch shuffle: per-epoch prefixes replay and differ across epochs") {
    val docs = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    def md5hex(t: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    val expected = (0 until 3).flatMap { e =>
      docs.map(id => (e, id, md5hex(s"$e:$id")))
        .sortBy { case (_, id, h) => (h, id) }.take(5).zipWithIndex
        .map { case ((ep, id, h), i) => (ep, i + 1L, id, h) }
    }
    val got = graft.ops.Corpus.qCorpusEpochShuffle.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got === expected)
    // the three epochs genuinely produce different orders
    val prefixes = got.groupBy(_._1).view.mapValues(_.map(_._3)).values.toSeq
    assert(prefixes.distinct.size === 3)
  }
}
