package graft

import graft.ops.Curation

import org.apache.spark.sql.functions._

/** Semantics of the curation surface on hand-built corpora: repetition
  * ratios, deterministic sampling, heavy hitters, PII redaction.
  */
class CurationSpec extends SparkSpec {

  private val tmp = java.nio.file.Files.createTempDirectory("curation").toString

  private def docs(rows: (Long, String)*): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("unit"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
  }

  test("repetition: all-same tokens max out both ratios; all-distinct zero them") {
    docs(
      1L -> "a a a a",             // 3 bigrams, 1 distinct; top token 4/4
      2L -> "w x y z")             // all distinct
    val got = Curation.qTextRepetition.fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) === ((0.67, 1.0)))  // 1 - 1/3 = 0.666..., r2 -> 0.67
    assert(got(2L) === ((0.0, 0.25)))
  }

  test("hash sampling is deterministic and stratified quotas are exact") {
    val a = Curation.qSampleHash.fn(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = Curation.qSampleHash.fn(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a === b && a.nonEmpty)
    val strat = Curation.qSampleStratified.fn(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(strat.nonEmpty)
    assert(strat.forall { case (n, mx) => n <= 20 && mx <= 20 && n == mx })
  }

  test("heavy hitters rank token frequencies per source") {
    docs(
      1L -> "z z z y y x",
      2L -> "y z w")
    val got = Curation.qAggHeavyHitters.fn(spark, tmp).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
    assert(got.take(3).toSeq === Seq(("z", 4L, 1), ("y", 3L, 2), ("w", 1L, 3)))
  }

  test("PII scrub counts and redacts planted + in-text emails and numbers") {
    docs(
      7L -> "reach me at bob@host.org or call 123456 now")
    val Array(r) = Curation.qTextPiiScrub.fn(spark, tmp).collect()
    // in-text email + planted user7@example.com; in-text 123456 + planted 7*1234567
    assert(r.getInt(1) === 2, s"emails: $r")
    assert(r.getInt(2) === 2, s"longnums: $r")
    // clean text carries the placeholders, not the originals
    val cleanLen = r.getInt(3)
    val expected = ("reach me at <EMAIL> or call <NUM> now" +
      " contact <EMAIL> ref <NUM>").length
    assert(cleanLen === expected, s"clean_len $cleanLen != $expected")
  }

  test("CMS heavy hitters: estimates dominate exact counts within the bound") {
    val got = Curation.qAggHeavyHittersSketch.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4)))
    assert(got.nonEmpty)
    val s = spark
    import s.implicits._
    val totals = graft.Tables.documents(spark, sf)
      .select(col("source"),
        org.apache.spark.sql.functions.size(split(col("text"), " ")).as("nt"))
      .groupBy("source").agg(sum("nt").as("total"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (src, tok, n, nEst) =>
      assert(nEst >= n, s"CMS underestimated $src/$tok: $nEst < $n")
      val bound = n + 4L * totals(src) / 1024  // depth-independent slack
      assert(nEst <= bound, s"CMS overestimate $src/$tok: $nEst > $bound")
    }
  }

  test("CMS sketch is identical under any partitioning") {
    val s = spark
    import s.implicits._
    val data = (1 to 2000).map(i => s"tok${i % 37}")
    def sketchOf(parts: Int): Seq[Long] =
      data.toDF("tok").repartition(parts)
        .agg(graft.functions.CountMin.cms(col("tok")).as("sk"))
        .head().getSeq[Long](0)
    assert(sketchOf(1) === sketchOf(13))
  }

  test("train/val/test split is total, deterministic, and ~80/10/10") {
    val runs = Seq.fill(2)(
      Curation.qSampleSplit.fn(spark, sf).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
    assert(runs(0) === runs(1))
    val bySplit = runs(0).groupMapReduce(_._1._2)(_._2)(_ + _)
    val n = bySplit.values.sum
    assert(n === graft.Tables.documents(spark, sf).count())
    // hash ranges 0xcc/256 and 0x1a/256 bound the expected masses; the
    // tolerance absorbs small-sample noise at sf0.001 (500 docs).
    assert(math.abs(bySplit("train").toDouble / n - 0.80) < 0.06, bySplit)
    assert(math.abs(bySplit("val").toDouble / n - 0.10) < 0.05, bySplit)
    assert(math.abs(bySplit("test").toDouble / n - 0.10) < 0.05, bySplit)
  }

  test("profile rows cross-check against independent per-column queries") {
    import org.apache.spark.sql.functions._
    val prof = ops.Curation.qProfileTable.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val o = Tables.orders(spark, sf)
    val n = o.count()
    assert(prof.values.forall(_._3 == n))
    // planted nulls: exactly the '3-MEDIUM' rows of o_orderpriority
    val medium = o.filter(col("o_orderpriority") === "3-MEDIUM").count()
    assert(prof("o_orderpriority")._1 === medium && medium > 0)
    assert(prof("o_orderkey") === ((0L, n, n)), "orderkey is a unique key")
    val distinctStatus =
      o.select("o_orderstatus").distinct().count()
    assert(prof("o_orderstatus")._2 === distinctStatus)
    // nullif removes one value from the distinct set, null not counted
    val distinctPrio =
      o.select("o_orderpriority").distinct().count() - 1
    assert(prof("o_orderpriority")._2 === distinctPrio)
  }

  test("profile survives column names needing escaping") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // dots, spaces, hyphens, single quotes, even a backtick: names the
    // old string-built stack() either mis-parsed or crashed on
    val names = Seq("a.b", "with space", "has-hyphen", "it's", "tick`y")
    val df = Seq((1, "x", "y", "z", "w"), (2, null, "y", "q", "w"))
      .toDF(("id" +: names.tail): _*)
      .withColumnRenamed("id", names.head)
    val prof = ops.Curation.profile(df, names).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(prof.keySet === names.toSet)
    assert(prof("a.b") === ((0L, 2L, 2L)))
    assert(prof("with space") === ((1L, 1L, 2L)))
    assert(prof("it's") === ((0L, 2L, 2L)))
    assert(prof("tick`y") === ((0L, 1L, 2L)))
  }

  test("deletion audit replays the id-range selector per table") {
    val got = ops.Curation.qDeletionAudit.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def affected(ids: Array[Long]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      ids.count { id =>
        md.reset()
        val hex = md.digest(id.toString.getBytes)
          .map("%02x".format(_)).mkString
        hex.substring(0, 2) >= "f0"
      }.toLong
    }
    val docIds = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val vecIds = Tables.embeddings(spark, sf).select("vec_id").collect()
      .map(_.getLong(0))
    assert(got === Map(
      "documents" -> ((affected(docIds), docIds.length.toLong)),
      "embeddings" -> ((affected(vecIds), vecIds.length.toLong))))
    // the selector must actually select something, or the audit is vacuous
    assert(got.values.forall(_._1 > 0))
  }

  test("q_text_surprisal: exact integer bit scores, rare docs score higher") {
    val out = Curation.qTextSurprisal.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // recompute independently in plain Scala
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val all = docs.flatMap(_._2.split(" ", -1))
    val cnt = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = all.length.toLong
    def bits(tok: String): Long =
      java.lang.Long.toBinaryString(total / cnt(tok)).length.toLong
    val expect = docs.map { case (id, t) =>
      val ts = t.split(" ", -1)
      val bs = ts.map(bits).sum
      (id, ts.length.toLong, bs,
        math.floor(bs.toDouble / ts.length * 100 + 0.5) / 100)
    }.sortBy(_._1)
    assert(out.sortBy(_._1).toSeq === expect.toSeq)
    // every token carries at least one bit; means sit inside [1, 64]
    out.foreach { case (_, n, bs, m) =>
      assert(bs >= n && m >= 1.0 && m <= 64.0)
    }
  }

  test("curation funnel: every stage cuts on a planted corpus, replay matches") {
    val s = spark
    import s.implicits._
    def md5hex(x: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def weight(tok: String): Long = {
      val h = java.lang.Long.parseLong(md5hex(tok).substring(0, 8), 16)
      (h % Curation.QualityBuckets) * 2654435761L % 1001L - 500L
    }
    // tokens with known-positive weights -> docs built from them pass
    // the classifier; "badbad..." negatives flunk it
    // 4-char tokens only ("w100".."w999"), so every planted doc passes
    // the Gopher mean-word-length rule and fails only its TARGET stage
    val pos = (100 to 999).map(i => s"w$i").filter(weight(_) > 0L)
    val neg = (100 to 999).map(i => s"x$i").filter(weight(_) < 0L)
    assert(pos.length >= 32 && neg.length >= 10)
    // every doc that should survive the Gopher stage carries >= 20 words
    val span = pos.take(10)                    // a 10-token span
    val docs = Seq(
      // 1,2: identical first-8-token prefix -> prefix-dedup cuts doc 2
      1L -> (pos.slice(10, 18) ++ pos.slice(18, 31)).mkString(" "),
      2L -> (pos.slice(10, 18) ++ pos.slice(19, 32)).mkString(" "),
      // 3,4: share the mid-document span, DISJOINT unique prefixes
      // (3's is 1's mid-tokens REVERSED — different ordered-prefix md5),
      // both all-positive -> span stage cuts doc 4 (owner = 3)
      3L -> (pos.slice(10, 20).reverse ++ span).mkString(" "),
      4L -> (pos.slice(20, 30) ++ span).mkString(" "),
      // 5: >= 20 words, all negative weights -> flunks the classifier
      5L -> (neg.take(10) ++ neg.take(10)).mkString(" "),
      // 6: 21 alpha-free symbol tokens -> flunks the Gopher matrix
      //    (symbol + alpha rules) with a unique prefix
      6L -> Seq.fill(21)("###").mkString(" "))
      .toDF("doc_id", "text")
      .withColumn("source", lit("u")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.qCurationFunnel.fn(spark, dir).head()
    // in=6; prefix dedup cuts doc 2 -> 5; gopher cuts doc 6 -> 4;
    // classifier cuts doc 5 -> 3; span dedup cuts doc 4 -> 2
    assert((out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4), out.getLong(5)) === ((6L, 5L, 4L, 3L, 2L)))
    assert(out.getDouble(6) === 33.33) // floor(100*2/6*100+0.5)/100
  }

  test("gopher rule matrix: each rule cuts exactly its planted doc, keep is the conjunction") {
    // one doc per rule violation + one clean doc; every rule must be
    // non-vacuous (both verdicts present across the corpus)
    val clean = (1 to 25).map(i => s"word$i").mkString(" ")
    docs(
      1L -> clean,                                   // passes everything
      2L -> (1 to 10).map(i => s"tok$i").mkString(" "),  // too few words
      3L -> Seq.fill(21)("abcdefghijkl").mkString(" "),  // mean len 12 > 10
      4L -> (1 to 21).map(i => s"wo#rd$i").mkString(" "), // symbol-heavy
      5L -> (1 to 21).map(i => s"${i}000").mkString(" "), // alpha-free words
      6L -> (1 to 10).map(i => s"-alpha$i beta$i gamma$i").mkString("\n"),
      // ^ every line bullet-prefixed (ratio 1.0 > 0.9), tokens alphabetic
      7L -> (1 to 2).map(i =>
        ((1 to 11).map(j => s"line${i}w$j") :+ "end...").mkString(" "))
        .mkString("\n"))
      // ^ both lines end in '...' (ratio 1.0 > 0.3); 24 words, 2 '...'
      //   occurrences keep the symbol rule passing (20 <= 24)
    val out = Curation.qTextGopherRules.fn(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(8), r.getBoolean(9), r.getBoolean(10),
         r.getBoolean(11), r.getBoolean(12), r.getBoolean(13),
         r.getBoolean(14))).toMap
    // (ok_words, ok_mean_len, ok_symbol, ok_alpha, ok_bullet, ok_ellipsis, keep)
    assert(out(1L) === ((true, true, true, true, true, true, true)))
    assert(out(2L) === ((false, true, true, true, true, true, false)))
    assert(out(3L) === ((true, false, true, true, true, true, false)))
    assert(out(4L) === ((true, true, false, true, true, true, false)))
    assert(out(5L) === ((true, true, true, false, true, true, false)))
    assert(out(6L) === ((true, true, true, true, false, true, false)))
    assert(out(7L) === ((true, true, true, true, true, false, false)))
    // ratio display columns agree with hand-computed counts
    val r3 = Curation.qTextGopherRules.fn(spark, tmp)
      .filter(col("doc_id") === 3L).head()
    assert(r3.getDouble(3) === 12.0)   // mean_word_len
    val r6 = Curation.qTextGopherRules.fn(spark, tmp)
      .filter(col("doc_id") === 6L).head()
    assert(r6.getInt(2) === 10 && r6.getDouble(6) === 1.0) // n_lines, bullet_ratio
  }

  test("quality classifier score replays the hash-weight formula in plain Scala") {
    val gateSf = "/root/testdata/sf0.01"
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def weight(tok: String): Long = {
      val h = java.lang.Long.parseLong(md5hex(tok).substring(0, 8), 16)
      (h % Curation.QualityBuckets) * 2654435761L % 1001L - 500L
    }
    val docs = Tables.documents(spark, gateSf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val tk = t.split(" ", -1).filter(_.nonEmpty)
      (id, tk.length, tk.map(weight).sum)
    }.sortBy(_._1).toSeq
    val got = Curation.qTextQualityClassifier.fn(spark, gateSf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === expected)
    // the decision boundary splits the corpus — both classes non-vacuous
    val keeps = expected.count(_._3 >= 0L)
    assert(keeps > 0 && keeps < expected.length)
  }

  test("q_dsir_weights replays the hashed-bucket integer LLR in plain Scala") {
    val out = Curation.qDsirWeights.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // features WITH multiplicity: unigrams ++ adjacent bigrams
    def feats(t: String): Seq[String] = {
      val tk = t.split(" ", -1).toSeq
      tk ++ tk.zip(tk.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val buckets = docs.map { case (id, src, t) =>
      (id, src, feats(t).map(f => md5hex(f).substring(0, 2)))
    }
    val cr = buckets.flatMap(_._3).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val ct = buckets.filter(_._2 == "src0").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nr = cr.values.sum
    val nt = ct.values.sum
    def bitlen(x: Long): Long = (64 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    def dw(b: String): Long =
      bitlen((nr + Curation.DsirBuckets) / (cr.getOrElse(b, 0L) + 1)) -
        bitlen((nt + Curation.DsirBuckets) / (ct.getOrElse(b, 0L) + 1))
    val expected = buckets.sortBy(_._1).map { case (id, _, bs) =>
      val w = bs.map(dw).sum
      (id, bs.size.toLong, w, w > 0)
    }
    assert(out.toSeq === expected.toSeq)
    // the weight frame is a real discriminator, not a constant: the
    // corpus must contain both signs (or the op degenerates)
    assert(out.map(_._3).distinct.length > 1, "w_bits is constant")
  }

  test("q_text_quality_calibrated replays the frequency-frame decile cut") {
    val out = Curation.qTextQualityCalibrated.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val scores = Curation.qTextQualityClassifier.fn(spark, sf).collect()
      .map(_.getLong(2)).sorted.toSeq
    val n = scores.length.toLong
    // replay: per distinct score, decile = floor(10*count_below/N);
    // report per decile
    val freq = scores.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val expected = freq
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (s, c)) => (s, c, cum + c) }
      .drop(1)
      .map { case (s, c, cumIncl) => ((cumIncl - c) * 10 / n, s, c) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (dz, g) =>
        (dz, g.map(_._3).sum, g.map(_._2).min, g.map(_._2).max, dz >= 7L)
      }
    assert(out.toSeq === expected)
    assert(out.map(_._2).sum === n, "deciles must partition the corpus")
    assert(out.forall(r => r._1 >= 0 && r._1 <= 9 && r._3 <= r._4))
  }

  test("q_curriculum_phases: token conservation, monotone difficulty, balanced mass") {
    val out = Curation.qCurriculumPhases.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val docs = Curation.qTextSurprisal.fn(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(3))) // (n_tok, mean_bits)
    val totTok = docs.map(_._1).sum
    val totDocs = docs.length.toLong
    assert(out.map(_._2).sum === totDocs)
    assert(out.map(_._3).sum === totTok, "token mass must be conserved")
    assert(out.forall(p => p._1 >= 0 && p._1 < Curation.CurriculumPhases))
    // phases are difficulty-ordered and non-overlapping
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4,
        s"phase ${a._1} hi ${a._5} overlaps phase ${b._1} lo ${b._4}")
      case _ =>
    }
    // equal token mass up to the largest single score-group (ties are
    // indivisible by construction)
    val maxGroup = docs.groupBy(_._2).values.map(_.map(_._1).sum).max
    val target = totTok / Curation.CurriculumPhases
    out.foreach { p =>
      assert(p._3 <= target + maxGroup,
        s"phase ${p._1} mass ${p._3} exceeds target $target + maxGroup $maxGroup")
    }
  }

  test("q_text_surprisal_bigram replays the train-split backoff LM in plain Scala") {
    val out = Curation.qTextSurprisalBigram.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
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
    val toks = docs.map { case (id, t) => (id, t.split(" ", -1).toSeq) }
    def inModel(id: Long): Boolean =
      splitOf(id) == "train" && id % Curation.ModelDocStride == 0
    val trainToks = toks.filter(d => inModel(d._1)).flatMap(_._2)
    val trainPairs = toks.filter(d => inModel(d._1))
      .flatMap { case (_, tk) => tk.zip(tk.drop(1)) }
    val c1 = trainToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = trainPairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t1 = c1.values.sum
    def bitlen(x: Long): Long = (64 - java.lang.Long.numberOfLeadingZeros(x)).toLong
    def ub(w: String): Long = bitlen((t1 + 1) / (c1.getOrElse(w, 0L) + 1))
    val expected = toks.sortBy(_._1).map { case (id, tk) =>
      var bits = 0L; var back = 0L
      tk.zipWithIndex.foreach { case (w, i) =>
        if (i == 0) bits += ub(w)
        else c2.get((tk(i - 1), w)) match {
          case Some(n2) => bits += bitlen(c1(tk(i - 1)) / n2)
          case None => back += 1; bits += Curation.BackoffBits + ub(w)
        }
      }
      val mean = math.floor(bits.toDouble / tk.length * 100.0 + 0.5) / 100.0
      (id, tk.length.toLong, bits, back, mean)
    }
    assert(out.toSeq === expected.toSeq)
    // the backoff path must carry real traffic: scored docs outside the
    // strided model subcorpus contain model-unseen bigrams
    assert(out.filter(r => !inModel(r._1)).exists(_._4 > 0),
      "no held-out doc ever backed off")
    // and model docs never back off on themselves
    assert(out.filter(r => inModel(r._1)).forall(_._4 == 0L))
  }
}
