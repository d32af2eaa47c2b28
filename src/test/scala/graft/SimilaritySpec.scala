package graft

import graft.ops.Similarity

import org.apache.spark.sql.functions._

/** ANN quality: LSH buckets vs the brute-force baseline on sf0.001
  * (SURVEY.md §2b mandate row). */
class SimilaritySpec extends SparkSpec {

  test("brute-force topk: sims are in [-1,1] and 3 neighbours per query") {
    val rows = Similarity.qSimCosineTopk.fn(spark, sf).collect()
    val perQuery = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.size === 10)
    assert(perQuery.values.forall(_ === 3))
    assert(rows.forall { r => val s = r.getDouble(2); s >= -1.0 && s <= 1.0 })
  }

  test("centroids: full (label, pos) grid, counts match, means bracket native avg") {
    val rows = Similarity.qEmbedCentroids.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val perLabel = Tables.embeddings(spark, sf)
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dim = Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).head().getInt(0)
    assert(rows.length === perLabel.size * dim)
    rows.foreach { case (label, pos, n, _) =>
      assert(n === perLabel(label), s"label $label pos $pos")
    }
    // Det's mean differs from the native double avg only by the 1e-6
    // quantization + 2dp rounding
    val native = Tables.embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("m"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1).toLong) -> r.getDouble(2)).toMap
    rows.foreach { case (label, pos, _, m) =>
      assert(math.abs(m - native((label, pos))) < 0.006,
        s"label $label pos $pos: det $m vs native ${native((label, pos))}")
    }
  }

  test("cross-modal join covers every vector once with sane feature means") {
    val rows = Similarity.qJoinTextEmbedding.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum === total, "every vector joins exactly once")
    rows.foreach { case (label, n, avgTok, avgNorm) =>
      assert(n > 0 && avgTok > 0 && avgNorm > 0, s"label $label")
    }
    // Det means track the native double means within quantization slack
    val native = Tables.embeddings(spark, sf)
      .select(col("label"),
        sqrt(graft.functions.VectorFunctions.dot(
          col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"))).as("nrm"))
      .groupBy("label").agg(avg("nrm").as("m")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    rows.foreach { case (label, _, _, avgNorm) =>
      assert(math.abs(avgNorm - native(label)) < 0.006, s"label $label")
    }
  }

  test("precomputed SRP weights match the per-row md5 HOF spelling") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val hofBits = (0 until 8).map { pl =>
      val proj = aggregate(
        zip_with(col("v"),
          expr(s"transform(sequence(0, size(v) - 1), i -> " +
            s"CASE WHEN conv(substring(md5(concat('$pl:', i)), 1, 4), 16, 10) % 2 = 0" +
            s" THEN 1.0 ELSE -1.0 END)"),
          (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << pl)).otherwise(0L)
    }
    val hof = e.select(col("vec_id"), hofBits.reduce(_ + _).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Similarity.srpBuckets(spark, sf)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === hof)
  }

  test("SRP-LSH buckets: deterministic and similarity-preserving on average") {
    val b1 = Similarity.srpBuckets(spark, sf)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.srpBuckets(spark, sf)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 === b2, "buckets must be deterministic")

    // Top-1 neighbours should share more bucket bits than random pairs:
    // SRP guarantees P[bit match] = 1 - theta/pi, monotone in cosine.
    val top1 = Similarity.qSimCosineTopk.fn(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.maxBy(_.getDouble(2)).getLong(1) }
    def matchBits(a: Long, b: Long) = 8 - java.lang.Long.bitCount(a ^ b)
    val neighbourBits = top1.map { case (q, n) => matchBits(b1(q), b1(n)) }
    val rng = new scala.util.Random(7)
    val ids = b1.keys.toArray
    val randomBits = (0 until 200).map { _ =>
      matchBits(b1(ids(rng.nextInt(ids.length))), b1(ids(rng.nextInt(ids.length))))
    }
    val nAvg = neighbourBits.sum.toDouble / neighbourBits.size
    val rAvg = randomBits.sum.toDouble / randomBits.size
    assert(nAvg > rAvg,
      s"top-1 neighbours avg $nAvg bucket bits vs random $rAvg")
  }

  test("multi-probe LSH topk beats random candidate recall") {
    val truth = Similarity.qSimCosineTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.srpTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth intersect ann).size.toDouble / truth.size
    // 9 probes over 2^8 buckets cover ~3.5% of the corpus; random top-3
    // picks would land in the truth set ~0.6% of the time. Any
    // similarity-preserving hash must clear this by an order of magnitude.
    assert(recall >= 0.10, s"ANN recall $recall vs brute-force baseline")
    assert(ann.nonEmpty && ann.forall(_._1 < 10))
  }

  test("IVF topk: cells partition the corpus, recall beats random") {
    val cells = Similarity.ivfCells(spark, sf)
    val n = cells.count()
    assert(n === Tables.embeddings(spark, sf).count())
    assert(cells.groupBy("cell").count().count() > 1, "coarse quantizer collapsed")
    val truth = Similarity.qSimCosineTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.ivfTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth intersect ann).size.toDouble / truth.size
    // nprobe=4 of k=16 cells covers ~25% of the corpus; random top-3
    // picks recall ~0.6%. A data-adaptive quantizer must do far better.
    assert(recall >= 0.25, s"IVF recall $recall vs brute-force baseline")
    assert(ann.forall(_._1 < 10))
  }

  test("fused quantize stats match the HOF spelling bit-for-bit") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val hof = e.select(
      col("vec_id"), col("v"),
      array_max(transform(col("v"), x => abs(x))).as("mx"))
      .withColumn("sc",
        when(col("mx") === 0d, lit(0d)).otherwise(lit(127.0) / col("mx")))
      .withColumn("qv",
        transform(col("v"), x => floor(x * col("sc") + lit(0.5)).cast("long")))
      .select(col("vec_id"), col("sc"),
        aggregate(col("qv"), lit(0L), (a, x) => a + x).as("q_sum"),
        aggregate(col("qv"), lit(0L), (a, x) => a + abs(x)).as("q_l1"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    val fused = e.select(col("vec_id"),
        graft.functions.VectorFunctions.quantizeStats(col("v")).as("qs"))
      .select(col("vec_id"), col("qs.scale"), col("qs.q_sum"), col("qs.q_l1"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(fused === hof && fused.nonEmpty)
  }

  test("q_sim_recall_report matches independently computed intersections") {
    val report = Similarity.qSimRecallReport.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(report.keySet === Set("ivf", "lsh"))
    val truth = Similarity.qSimCosineTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def expect(ann: Array[(Long, Long)]): (Long, Long, Long) =
      (ann.map(_._1).distinct.length.toLong, ann.length.toLong,
        ann.count(truth.contains).toLong)
    assert(report("lsh") === expect(Similarity.srpTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))))
    assert(report("ivf") === expect(Similarity.ivfTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))))
    // the report must clear the same floors the recall tests pin, so a
    // regression fails here too, not only in the artifact diff
    val (_, lshPairs, lshHits) = report("lsh")
    val (_, ivfPairs, ivfHits) = report("ivf")
    assert(lshHits * 10 >= truth.size && lshPairs > 0)
    assert(ivfHits * 4 >= truth.size && ivfPairs > 0)
  }

  test("PQ codes: seeds reconstruct exactly, codes replay in plain Scala") {
    val rows = Similarity.qVecPq.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.length == e.size)
    // every code packs 8 4-bit fields -> fits one unsigned 32-bit word
    rows.foreach { case (id, code, err) =>
      assert(code >= 0L && code < (1L << 32), s"vec $id code $code")
      assert(err >= 0.0, s"vec $id err $err")
    }
    // replay the whole construction in plain Scala
    val k = Similarity.PqCodebook
    val stride = math.max(e.size.toLong / k, 1L)
    // positional codes (seed rank in vec_id order), the pqSeeds contract
    val seeds = e.keys.toSeq.sorted
      .filter(id => id % stride == 0 && id < stride * k)
      .zipWithIndex
      .map { case (id, rank) => rank.toLong -> e(id) }
    val sub = e.head._2.length / Similarity.PqSubspaces
    rows.foreach { case (id, code, err) =>
      val v = e(id)
      var expCode = 0L
      var expErr = 0.0
      (0 until Similarity.PqSubspaces).foreach { m =>
        val (bd, bj) = seeds.map { case (j, cv) =>
          var dd = 0.0
          (0 until sub).foreach { i =>
            val diff = v(m * sub + i) - cv(m * sub + i); dd += diff * diff
          }
          (dd, j)
        }.min
        expCode += bj * (1L << (4 * m))
        expErr += bd
      }
      assert(code == expCode, s"vec $id code")
      assert(err == math.floor(expErr * 100 + 0.5) / 100, s"vec $id err")
      // a seed vector is its own nearest codeword in every subspace
      if (id % stride == 0 && id < stride * k) assert(err == 0.0, s"seed $id")
    }
  }

  test("PQ ADC topk replays in plain Scala; seed points rank at exact L2") {
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val k = Similarity.PqCodebook
    val M = Similarity.PqSubspaces
    val stride = math.max(e.size.toLong / k, 1L)
    val seedIdList = e.keys.toSeq.sorted
      .filter(id => id % stride == 0 && id < stride * k)
    val seeds = seedIdList.zipWithIndex
      .map { case (id, rank) => rank.toLong -> e(id) }
    val sub = e.head._2.length / M
    def subDist(a: Array[Double], b: Array[Double], m: Int): Double = {
      var dd = 0.0
      (0 until sub).foreach { i =>
        val diff = a(m * sub + i) - b(m * sub + i); dd += diff * diff
      }
      dd
    }
    val codes = e.view.mapValues { v =>
      (0 until M).map(m => seeds.map { case (j, cv) =>
        (subDist(v, cv, m), j)
      }.min._2)
    }.toMap
    val expect = e.keys.toSeq.sorted.filter(_ < 10).flatMap { qid =>
      val qv = e(qid)
      val lut = (0 until M).map(m =>
        seeds.map { case (j, cv) => j -> subDist(qv, cv, m) }.toMap)
      e.keys.toSeq.filter(_ != qid)
        .map { id =>
          var dist = 0.0
          (0 until M).foreach(m => dist += lut(m)(codes(id)(m)))
          (qid, id, dist)
        }
        .sortBy { case (_, id, dist) => (dist, id) }
        .take(3)
        .map { case (q, id, dist) =>
          (q, id, math.floor(dist * 100 + 0.5) / 100) }
    }.sortBy(t => (t._1, t._2))
    val got = Similarity.qSimPqTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expect)
    // Residual-free invariant: a SEED corpus point quantizes to itself
    // (err 0, PQ spec above), so its ADC distance from any query equals
    // the exact L2 distance — ADC error is exactly the corpus point's
    // quantization residual, nothing else. (No recall floor here by
    // design: the isotropic fixture carries near-random ADC ranking
    // signal — see the operator's Scaladoc — so a floor would pin
    // noise. srpTopk/ivfTopk keep the fixture's recall floors.)
    val seedIds = seedIdList.toSet
    e.keys.toSeq.sorted.filter(_ < 10).foreach { qid =>
      val qv = e(qid)
      val lut = (0 until M).map(m =>
        seeds.map { case (j, cv) => j -> subDist(qv, cv, m) }.toMap)
      seedIds.filter(_ != qid).foreach { sid =>
        var adc = 0.0
        (0 until M).foreach(m => adc += lut(m)(codes(sid)(m)))
        val exact = (0 until M).map(m => subDist(qv, e(sid), m)).sum
        assert(math.abs(adc - exact) < 1e-9, s"q=$qid seed=$sid")
      }
    }
  }

  test("IVF-PQ topk replays from the engine's own index frames; hits lie in probed cells") {
    val cellRows = Similarity.ivfCells(spark, sf)
      .select("vec_id", "v", "cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    val e = cellRows.map(r => r._1 -> r._2).toMap
    val cellOf = cellRows.map(r => r._1 -> r._3).toMap
    val cents = Similarity.ivfIndex(spark, sf)._2.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // PQ codebook replay — the stride-seed construction the PQ spec pins
    val k = Similarity.PqCodebook
    val M = Similarity.PqSubspaces
    val stride = math.max(e.size.toLong / k, 1L)
    val seeds = e.keys.toSeq.sorted
      .filter(id => id % stride == 0 && id < stride * k)
      .zipWithIndex
      .map { case (id, rank) => rank.toLong -> e(id) }
    val sub = e.head._2.length / M
    def subDist(a: Array[Double], b: Array[Double], m: Int): Double = {
      var dd = 0.0
      (0 until sub).foreach { i =>
        val diff = a(m * sub + i) - b(m * sub + i); dd += diff * diff
      }
      dd
    }
    val codes = e.view.mapValues { v =>
      (0 until M).map(m => seeds.map { case (j, cv) =>
        (subDist(v, cv, m), j)
      }.min._2)
    }.toMap
    val expect = e.keys.toSeq.sorted.filter(_ < 10).flatMap { qid =>
      val qv = e(qid)
      val probed = cents
        .map { case (c, cv) => (-dot(qv, cv) + dot(cv, cv) / 2, c) }
        .sortBy(identity).take(4).map(_._2).toSet
      val lut = (0 until M).map(m =>
        seeds.map { case (j, cv) => j -> subDist(qv, cv, m) }.toMap)
      e.keys.toSeq.filter(id => id != qid && probed(cellOf(id)))
        .map { id =>
          var dist = 0.0
          (0 until M).foreach(m => dist += lut(m)(codes(id)(m)))
          (qid, id, cellOf(id), dist)
        }
        .sortBy { case (_, id, _, dist) => (dist, id) }
        .take(3)
        .map { case (q, id, c, dist) =>
          (q, id, c, math.floor(dist * 100 + 0.5) / 100) }
    }.sortBy(t => (t._1, t._2))
    val got = Similarity.qSimIvfpqTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expect)
    // the coarse stage genuinely prunes: every query got 3 hits, all
    // drawn from at most nprobe=4 cells
    assert(got.groupBy(_._1).forall(_._2.length == 3))
    assert(got.groupBy(_._1).forall(_._2.map(_._3).distinct.size <= 4))
  }

  test("PQ on a SPARSE id space: short gapped codebook, codes stay positional") {
    // The shipped fixtures carry dense vec_ids, where the stride-modulo
    // seed filter admits exactly k seeds whose id/stride quotients are
    // already 0..k-1 — the labeling bug this test pins (sf1 divergence,
    // round 9) was invisible there. Here ids are scattered over 0..100
    // (n=40, stride=2), so the filter admits FEWER than k seeds with
    // gapped quotients: codes must be the seeds' positional ranks and
    // the kernels must be sized by the actual seed count, or the flat
    // codebook layout (and the inferred dim) silently corrupts.
    val dir = java.nio.file.Files.createTempDirectory("pqsparse").toString
    val ids = (0 until 40).map(i => ((i * 37) % 101).toLong).sorted
    import spark.implicits._
    ids.map { id =>
      val v = Array.tabulate(64)(p => (((id * 64 + p) % 17) - 8).toFloat / 4f)
      (id, v, (id % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val e = ids.map { id =>
      id -> Array.tabulate(64)(p => ((((id * 64 + p) % 17) - 8).toFloat / 4f)
        .toDouble)
    }.toMap
    val k = Similarity.PqCodebook
    val M = Similarity.PqSubspaces
    val stride = math.max(ids.length.toLong / k, 1L)
    val seedIdList = ids.filter(id => id % stride == 0 && id < stride * k)
    assert(seedIdList.length < k, "fixture must under-fill the codebook")
    assert(seedIdList.exists(id => id / stride != seedIdList.indexOf(id)),
      "fixture must have gapped quotients")
    val seeds = seedIdList.zipWithIndex
      .map { case (id, rank) => rank.toLong -> e(id) }
    val sub = 64 / M
    def subDist(a: Array[Double], b: Array[Double], m: Int): Double = {
      var dd = 0.0
      (0 until sub).foreach { i =>
        val diff = a(m * sub + i) - b(m * sub + i); dd += diff * diff
      }
      dd
    }
    val got = Similarity.qVecPq.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == ids.length)
    got.foreach { case (id, code, err) =>
      val v = e(id)
      var expCode = 0L
      var expErr = 0.0
      (0 until M).foreach { m =>
        val (bd, bj) = seeds.map { case (j, cv) => (subDist(v, cv, m), j) }.min
        expCode += bj * (1L << (4 * m))
        expErr += bd
      }
      assert(code == expCode, s"sparse vec $id code")
      assert(err == math.floor(expErr * 100 + 0.5) / 100, s"sparse vec $id err")
      if (seedIdList.contains(id)) assert(err == 0.0, s"sparse seed $id")
    }
  }

  test("IVF on a SPARSE id space: gapped quotient cells still partition and replay") {
    // The IVF index is immune to the sparse-id regime that broke PQ —
    // its cell label is the id/stride quotient on BOTH engines, and no
    // flat-array kernel infers geometry from a nominal k — but that
    // immunity was argued, not pinned. Pin it: on a scattered-id corpus
    // the index yields FEWER than k cells with gapped quotient labels,
    // every vector assigns to the argmin seed (tie -> lowest cell) per
    // a plain-Scala replay, and the cells partition the corpus.
    val dir = java.nio.file.Files.createTempDirectory("ivfsparse").toString
    val ids = (0 until 40).map(i => ((i * 53) % 127).toLong).sorted
    import spark.implicits._
    ids.map { id =>
      val v = Array.tabulate(64)(p => (((id * 64 + p) % 23) - 11).toFloat / 5f)
      (id, v, (id % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val e = ids.map { id =>
      id -> Array.tabulate(64)(p => ((((id * 64 + p) % 23) - 11).toFloat / 5f)
        .toDouble)
    }.toMap
    val k = 16
    val stride = math.max(ids.length.toLong / k, 1L)
    val seedIds = ids.filter(id => id % stride == 0 && id < stride * k)
    val cellsOfSeeds = seedIds.map(_ / stride)
    assert(seedIds.length < k, "fixture must under-fill the cell set")
    assert(cellsOfSeeds != cellsOfSeeds.indices.map(_.toLong),
      "fixture must have gapped quotient labels")
    val got = Similarity.ivfCells(spark, dir)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == e.keySet, "cells must partition the corpus")
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    e.foreach { case (id, v) =>
      val expCell = seedIds.map { sid =>
        val cv = e(sid)
        (-dot(v, cv) + dot(cv, cv) / 2, sid / stride)
      }.min._2
      assert(got(id) == expCell, s"sparse vec $id cell")
    }
    // a seed sits in its own cell (self-distance -|c|^2/2 is minimal
    // for isotropic-ish data; holds on this fixture by construction)
    seedIds.foreach(sid => assert(got(sid) == sid / stride, s"seed $sid"))
  }

  test("hamming topk replays a plain-Scala sign-code brute force") {
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def code(v: Array[Double]): Long =
      v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (x >= 0.0) acc | (1L << i) else acc
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val codes = e.view.mapValues(code).toMap
    val expected = e.keys.filter(_ < 10).toSeq.sorted.flatMap { qid =>
      val cand = e.keys.filter(_ != qid).toSeq
        .map(id => (java.lang.Long.bitCount(codes(id) ^ codes(qid)).toLong, id))
        .sortBy(identity).take(16)
      cand.map { case (h, id) => (h, id, cos(e(qid), e(id))) }
        .sortBy { case (_, id, s) => (-s, id) }.take(3)
        .map { case (h, id, s) =>
          (qid, id, h, math.floor(s * 100.0 + 0.5) / 100.0)
        }
    }.sortBy { case (q, id, _, _) => (q, id) }
    val got = Similarity.qSimHammingTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
    // candidate stage must have pruned: hamming distances are small
    // relative to random (~dim/2) for at least the top hit per query
    assert(got.nonEmpty && got.forall(_._3 <= Similarity.BinaryDim))
  }

  test("binarySignCode packs one sign bit per dimension") {
    import spark.implicits._
    val v = Array.tabulate(64)(i => if (i % 3 == 0) -1.0 else 1.0)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(Similarity.binarySignCode("v").as("c")).head().getLong(0)
    val want = v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
      if (x >= 0.0) acc | (1L << i) else acc
    }
    assert(got === want)
    // all-negative -> 0; all-positive -> every bit set (-1 as a long)
    val zero = Seq(Tuple1(Array.fill(64)(-1.0))).toDF("v")
      .select(Similarity.binarySignCode("v").as("c")).head().getLong(0)
    val ones = Seq(Tuple1(Array.fill(64)(1.0))).toDF("v")
      .select(Similarity.binarySignCode("v").as("c")).head().getLong(0)
    assert(zero === 0L && ones === -1L)
  }

  test("dim-truncation sweep replays brute force; dim 64 is self-consistent") {
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double], d: Int): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < d) {
        s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      s / (math.sqrt(na) * math.sqrt(nb))
    }
    def topk(dim: Int): Set[(Long, Long)] =
      e.keys.filter(_ < 10).toSeq.flatMap { qid =>
        e.keys.filter(_ != qid).toSeq
          .map(id => (id, cos(e(qid), e(id), dim)))
          .sortBy { case (id, s) => (-s, id) }.take(3)
          .map { case (id, _) => (qid, id) }
      }.toSet
    val truth = topk(64)
    val expected = Seq(8, 16, 32, 64)
      .map(dd => dd.toLong -> (topk(dd) & truth).size.toLong).toMap
    val got = Similarity.qSimDimSweep.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got(64L) === 30L) // self-consistency control
  }

  test("nprobe sweep: monotone recall, np=4 reproduces q_sim_ivf_topk") {
    val rows = Similarity.qSimNprobeSweep.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L))
    // nested candidate sets: hits can only grow with probes
    rows.sliding(2).foreach { case Array(a, b) => assert(a._2 <= b._2) }
    // pairs per point bounded by queries x k, growing with probes
    rows.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._3) }
    assert(rows.forall(_._3 <= 30))
    // cross-consistency: np=4 hit count equals the declared ivf topk's
    val truth = Similarity.qSimCosineTopk.fn(spark, sf)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfHits = Similarity.ivfTopk(spark, sf).select("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .count(truth)
    assert(rows.find(_._1 == 4).get._2 === ivfHits.toLong)
  }

  test("Lloyd refinement (iters=1): moved centroids, recall holds the floor") {
    // the declared surface runs the iters=0 seeded-Voronoi index (fully
    // oracle-replayable); Lloyd refinement remains the index-build
    // capability — one re-center step must actually move centroids off
    // the seeds and keep (on this fixture: improve) probe recall
    val seeds = Similarity.ivfIndex(spark, sf, 16, 0)._2.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val refined = Similarity.ivfIndex(spark, sf, 16, 1)._2.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(refined.keySet === seeds.keySet)
    assert(refined.exists { case (c, v) => seeds(c) != v },
      "Lloyd step left every centroid on its seed")
    val truth = Similarity.qSimCosineTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.ivfTopk(spark, sf, 3, 16, 4, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth intersect ann).size.toDouble / truth.size
    assert(recall >= 0.25, s"Lloyd-refined IVF recall $recall")
  }

  test("Lloyd refinement (iters=2) never lowers recall@3 vs the seeded index") {
    // VERDICT r10 §4: the bench's ivf_lloyd probe shows iters=2 >= seeded
    // recall everywhere measured (16->19 of 30 on this fixture, 16->18 at
    // sf0.1, 30/30 both ways at sf1). Pin that monotonicity here so a
    // future kernel edit (assignment argmin, re-center algebra, probe
    // ranking) cannot silently degrade the index-BUILD path, which the
    // DuckDB oracle never sees (the declared query is iters=0). This is a
    // fixture-family property, not a k-means theorem — Lloyd recall is
    // not monotone in general — so the pin is on the same corpora the
    // probe certifies.
    val truth = Similarity.qSimCosineTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(iters: Int): Int = {
      val ann = Similarity.ivfTopk(spark, sf, 3, 16, 4, iters).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth intersect ann).size
    }
    val seeded = hits(0)
    val refined = hits(2)
    assert(refined >= seeded,
      s"Lloyd iters=2 recall@3 $refined/${truth.size} fell below " +
        s"seeded $seeded/${truth.size}")
    // keep the absolute floor too — monotone-but-terrible must still fail
    assert(refined.toDouble / truth.size >= 0.25,
      s"Lloyd-refined recall ${refined.toDouble / truth.size}")
  }

  test("farthest-point seeding: k distinct hull seeds, recall >= stride") {
    // VERDICT r11 §5: the deterministic RNG-free farthest-point seeding
    // (greedy k-center from the first stride seed) is the sparse-regime
    // index-quality option. Pins: (a) exactly k centroids, all distinct
    // vectors (stride seeding can land two seeds in one tight cluster;
    // FPS by construction cannot repeat a point while distinct points
    // remain); (b) determinism — two builds bit-identical; (c) the same
    // recall-monotonicity contract the Lloyd pin holds: FPS recall@3
    // never falls below the stride seeding's on the probe corpora, with
    // and without Lloyd refinement on top.
    val fps = Similarity.ivfIndex(spark, sf, 16, 0, "farthest")._2.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(fps.length === 16)
    assert(fps.map(_._2).distinct.length === 16,
      "farthest-point seeding repeated a seed vector")
    graft.Graft.clearCaches(spark)
    val fps2 = Similarity.ivfIndex(spark, sf, 16, 0, "farthest")._2.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(fps2.toSeq === fps.toSeq, "farthest-point seeding not deterministic")
    val truth = Similarity.qSimCosineTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(iters: Int, seeding: String): Int = {
      val ann = Similarity.ivfTopk(spark, sf, 3, 16, 4, iters, seeding)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth intersect ann).size
    }
    val stride = hits(0, "stride")
    val farthest = hits(0, "farthest")
    assert(farthest >= stride,
      s"FPS recall@3 $farthest/${truth.size} fell below stride " +
        s"$stride/${truth.size}")
    // FPS + Lloyd carries only the absolute floor here: on THIS ~500-vec
    // fixture Lloyd from hull seeds can trade a point or two of recall@3
    // (14 vs 16 measured — Lloyd recall is not monotone in general; same
    // caveat as the stride pin's comment). At the probe scales the combo
    // dominates everything else measured — sf0.1: stride 16 / lloyd 18 /
    // fps 19 / fps+lloyd 24 of 30; sf1: 30/30 all four — which is what
    // the bench's ivf_lloyd artifact certifies per round (VERDICT r11
    // §5 done-condition lives there, not on this fixture).
    val farthestLloyd = hits(2, "farthest")
    assert(farthestLloyd.toDouble / truth.size >= 0.25,
      s"FPS+Lloyd recall@3 $farthestLloyd/${truth.size} below floor")
  }

  test("Lloyd depth sweep (iters 2..5): bounded dip, no deep-refinement collapse") {
    // VERDICT r13 §4: the bench's lloyd_sweep artifact records the
    // recall/cost curve at sf0.1; this pins the curve's SHAPE on the
    // fixture so a kernel edit can't silently break the deep-refinement
    // path. Lloyd recall is NOT monotone (measured on this fixture:
    // 18 seeded, then 18/14/18/18/20/19 for iters 1..6 — the iters=2
    // dip is real k-means behavior, centroids migrating through a
    // boundary), so the honest pin is three-part: (a) no depth ever
    // dips more than jitter below the seeded index, (b) by the deep end
    // the sweep has recovered to at least seeded-1, (c) every depth
    // holds the absolute floor. A regression that makes refinement
    // destructive (e.g. a recenter-algebra bug that compounds per
    // round) fails (a)/(b) long before it fails the floor.
    val truth = Similarity.qSimCosineTopk.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(iters: Int): Int = {
      val ann = Similarity.ivfTopk(spark, sf, 3, 16, 4, iters, "farthest")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth intersect ann).size
    }
    val seeded = hits(0)
    val sweep = (2 to 5).map(it => it -> hits(it))
    val detail = s"seeded=$seeded sweep=$sweep of ${truth.size}"
    sweep.foreach { case (it, h) =>
      assert(h >= seeded - 5, s"iters=$it collapsed: $detail")
      assert(h.toDouble / truth.size >= 0.25, s"iters=$it floor: $detail")
    }
    assert(sweep.map(_._2).max >= seeded - 1,
      s"deep refinement never recovers to the seeded level: $detail")
  }

  test("seeding parameter is validated (ADVICE r12: no silent fallback)") {
    // a typo like "fps" used to silently select stride seeding — recall
    // numbers could then be reported under the wrong label
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfIndex(spark, sf, 16, 0, "fps")
    }
    assert(e.getMessage.contains("fps"))
  }

  test("farthest seeding degenerates to fewer cells when k > distinct vecs") {
    // ADVICE r12: with only d < k distinct vectors the greedy k-center
    // rounds hit max-distance 0 — the build must stop with the d
    // distinct seeds instead of stacking duplicate centroids
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dup_embed")
    try {
      val base = Seq(
        Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f),
        Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f))
      (0L until 12L).map(i => (i, base((i % 4).toInt), 0))
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      val cents = Similarity.ivfIndex(spark, dir.toString, 16, 0, "farthest")
        ._2.collect().map(r => r.getSeq[Double](1))
      assert(cents.length === 4, s"expected 4 distinct seeds, got ${cents.length}")
      assert(cents.distinct.length === 4, "duplicate centroids slipped through")
    } finally {
      val wk = java.nio.file.Files.walk(dir)
      try wk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally wk.close()
    }
  }
}
