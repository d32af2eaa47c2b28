package graft

import graft.functions.HistogramAgg
import graft.ops.Similarity

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property-based operator invariants (SURVEY.md §5.2.3). Each property
  * runs the real Spark operator on generated data — a handful of cases
  * with small row counts, since every case is a full Spark job.
  */
class PropertySpec extends SparkSpec {

  private val params =
    ScTest.Parameters.default.withMinSuccessfulTests(8).withMaxSize(40)

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private def docs(texts: List[String]) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  private val textGen: Gen[List[String]] =
    Gen.listOfN(30, Gen.oneOf("a b c", "a b", "x y z", "p q", "a b c d"))

  test("exact dedup is idempotent and never grows") {
    check(Prop.forAllNoShrink(textGen) { texts =>
      val d = docs(texts)
      val once = d.dropDuplicates("text")
      val twice = once.dropDuplicates("text")
      val (n0, n1, n2) = (d.count(), once.count(), twice.count())
      n1 == n2 && n1 <= n0 &&
        n1 == texts.distinct.length
    })
  }

  test("union cardinality is the sum of its branches") {
    check(Prop.forAllNoShrink(textGen, textGen) { (a, b) =>
      docs(a).unionAll(docs(b)).count() == a.length + b.length
    })
  }

  test("semi and anti joins partition the left keys") {
    val keyGen = Gen.listOfN(25, Gen.choose(0L, 12L))
    check(Prop.forAllNoShrink(keyGen, keyGen) { (l, r) =>
      val s = spark
      import s.implicits._
      val left = l.distinct.toDF("k")
      val right = r.toDF("k")
      val semi = left.join(right, Seq("k"), "left_semi").count()
      val anti = left.join(right, Seq("k"), "left_anti").count()
      semi + anti == l.distinct.length &&
        semi == l.distinct.count(r.contains)
    })
  }

  test("top-k is exactly the k-prefix of the total sort") {
    val rowGen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 1000), Gen.choose(0L, 1e6.toLong)))
    check(Prop.forAllNoShrink(rowGen) { rows =>
      val s = spark
      import s.implicits._
      val df = rows.toDF("k", "v")
      val k = 5
      val got = df.orderBy(desc("v"), col("k")).limit(k)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      val want = rows.sortBy { case (key, v) => (-v, key) }.take(k)
      got == want
    })
  }

  test("histogram sketch matches groupBy-floor for any width and sign") {
    val gen = Gen.zip(
      Gen.choose(0.1, 50.0),
      Gen.listOfN(40, Gen.choose(-1000.0, 1000.0)))
    check(Prop.forAllNoShrink(gen) { case (width, vals) =>
      val s = spark
      import s.implicits._
      val df = vals.toDF("v")
      val builtin = df.groupBy(floor(col("v") / width).cast("long").as("b"))
        .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sketch = df.agg(HistogramAgg.histogram(col("v"), width).as("h"))
        .select(explode(col("h"))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      sketch == builtin
    })
  }

  test("cosine similarity: self = 1, symmetric, in [-1, 1]") {
    val vecGen = Gen.listOfN(8, Gen.choose(-10.0, 10.0))
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))
    check(Prop.forAllNoShrink(vecGen, vecGen) { (a, b) =>
      val s = spark
      import s.implicits._
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val Array(row) = df.select(
        Similarity.cosine(col("a"), col("a")).as("self"),
        Similarity.cosine(col("a"), col("b")).as("ab"),
        Similarity.cosine(col("b"), col("a")).as("ba")).collect()
      val (self, ab, ba) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      math.abs(self - 1.0) < 1e-9 &&
        math.abs(ab - ba) < 1e-12 &&
        ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9
    })
  }

  test("Det.dsum is independent of partitioning and row order") {
    val gen = Gen.listOfN(60, Gen.choose(-99999.99, 99999.99))
    check(Prop.forAllNoShrink(gen) { xs =>
      val s = spark
      import s.implicits._
      val rounded = xs.map(x => math.floor(x * 100 + 0.5) / 100) // 2dp inputs
      def total(parts: Int, data: List[Double]): Double =
        data.toDF("x").repartition(parts)
          .agg(graft.util.Det.dsum(col("x")).as("t"))
          .head().getDouble(0)
      val a = total(1, rounded)
      val b = total(7, rounded)
      val c = total(13, rounded.reverse)
      a == b && b == c
    })
  }

  test("bit_xor version fingerprint is partitioning- and order-invariant") {
    // the property q_corpus_upsert's result_sig rests on: xor over a
    // 60-bit md5 slice agrees for ANY partitioning and arrival order of
    // the same (id, fp) set — what "same version => same fingerprint"
    // means on a cluster
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, 99999L)).map(_.distinct)
    check(Prop.forAllNoShrink(gen) { ids =>
      val s = spark
      import s.implicits._
      def sig(parts: Int, data: List[Long]): Long =
        data.toDF("doc_id")
          .withColumn("rfp", md5(col("doc_id").cast("string").cast("binary")))
          .repartition(parts)
          .agg(expr("""bit_xor(cast(conv(substring(
              md5(cast(concat(cast(doc_id as string), ':', rfp) as binary)),
              1, 15), 16, 10) as bigint))""").as("sig"))
          .head().getLong(0)
      val a = sig(1, ids)
      val b = sig(7, ids)
      val c = sig(13, ids.reverse)
      a == b && b == c
    })
  }

  test("rank over a partition equals the sorted-position of each row") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 20L)))
    check(Prop.forAllNoShrink(gen) { rows =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("k")).orderBy(col("v"))
      val got = rows.toDF("k", "v")
        .withColumn("r", rank().over(w))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
      got.forall { case (k, v, r) =>
        // rank = 1 + number of strictly smaller values in the partition
        r == 1 + rows.count(p => p._1 == k && p._2 < v)
      }
    })
  }

  test("lag returns the previous element of the partition-sorted sequence") {
    val gen = Gen.listOfN(25, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 1000L)))
    check(Prop.forAllNoShrink(gen) { raw =>
      // unique (k, v) pairs so the ordering is total
      val rows = raw.distinct
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("k")).orderBy(col("v"))
      val got = rows.toDF("k", "v")
        .withColumn("prev", lag(col("v"), 1).over(w))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
      got.forall { case (k, v, prev) =>
        val sorted = rows.filter(_._1 == k).map(_._2).sorted
        val idx = sorted.indexOf(v)
        prev == (if (idx == 0) None else Some(sorted(idx - 1)))
      }
    })
  }

  test("custom aggregate buffers serialize/deserialize losslessly") {
    val hGen = Gen.listOf(Gen.zip(Gen.choose(-50L, 50L), Gen.choose(1L, 9L)))
    check(Prop.forAllNoShrink(hGen) { entries =>
      val h = graft.functions.HistogramAgg(
        org.apache.spark.sql.catalyst.expressions.Literal(1.0), 1.0)
      val buf = h.createAggregationBuffer()
      entries.foreach { case (k, v) => buf.update(k, buf.getOrElse(k, 0L) + v) }
      val back = h.deserialize(h.serialize(buf))
      back.toMap == buf.toMap
    })
    val vGen = Gen.zip(Gen.choose(0L, 5L), Gen.listOfN(6, Gen.choose(-5.0, 5.0)))
    check(Prop.forAllNoShrink(vGen) { case (count, sums) =>
      val v = graft.functions.VectorAvgAgg(
        org.apache.spark.sql.catalyst.expressions.Literal(null,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))
      val buf = new graft.functions.VectorAvgAgg.Buf(count, sums.toArray)
      val back = v.deserialize(v.serialize(buf))
      back.count == count && back.sums.toSeq == sums
    })
  }

  test("custom aggregate merge handles empty and uneven buffers") {
    val h = graft.functions.HistogramAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0), 1.0)
    val empty = h.createAggregationBuffer()
    val one = h.createAggregationBuffer(); one.update(3L, 7L)
    assert(h.merge(h.createAggregationBuffer(), one).toMap === Map(3L -> 7L))
    assert(h.merge(one, h.createAggregationBuffer()).toMap === Map(3L -> 7L))
    assert(h.eval(empty).asInstanceOf[
      org.apache.spark.sql.catalyst.util.MapData].numElements() === 0)
    val v = graft.functions.VectorAvgAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    // uneven dims: merging a shorter buffer into a longer one and back
    val a = new graft.functions.VectorAvgAgg.Buf(1L, Array(1.0, 2.0))
    val b = new graft.functions.VectorAvgAgg.Buf(1L, Array(10.0, 20.0, 30.0))
    val m = v.merge(a, b)
    assert(m.count === 2L && m.sums.toSeq === Seq(11.0, 22.0, 30.0))
    assert(v.eval(new graft.functions.VectorAvgAgg.Buf(0L, Array.emptyDoubleArray))
      === null)
  }

  test("packBins conserves docs/tokens and bins are contiguous chunks") {
    val s = spark
    import s.implicits._
    val rowsGen = Gen.listOfN(24, for {
      shard <- Gen.oneOf("s0", "s1", "s2")
      n <- Gen.choose(1L, 120L)
    } yield (shard, n))
    check(Prop.forAllNoShrink(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((sh, n), i) => (sh, i.toLong, n) }
        .toDF("shard", "id", "n_tok")
      val bins = ops.Corpus.packBins(df, "shard", "id", "n_tok", 100)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // conservation: every row and token lands in exactly one bin
      val byShard = rows.zipWithIndex.groupBy(_._1._1)
      bins.groupBy(_._1).forall { case (sh, bs) =>
        bs.map(_._3).sum == byShard(sh).size &&
          bs.map(_._4).sum == byShard(sh).map(_._1._2).sum
      } && {
        // bin of each row = its running start offset / budget, computed
        // independently; the grouped report must agree exactly
        val expect = byShard.flatMap { case (sh, rs) =>
          var off = 0L
          rs.sortBy(_._2).map { case ((_, n), _) =>
            val b = off / 100; off += n; (sh, b)
          }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
        }
        bins.map(b => (b._1, b._2) -> b._3).toMap == expect
      }
    })
  }

  test("bloomSemiJoin equals the plain semi join for any key sets") {
    val s = spark
    import s.implicits._
    val setsGen = for {
      bigKeys <- Gen.listOf(Gen.choose(0L, 200L))
      smallKeys <- Gen.listOf(Gen.choose(0L, 400L))
    } yield (bigKeys, smallKeys)
    check(Prop.forAllNoShrink(setsGen) { case (bigKeys, smallKeys) =>
      val big = bigKeys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "row")
      val small = smallKeys.toDF("k")
      val got = Graft.bloomSemiJoin(big, small, "k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = big.join(small.distinct(), Seq("k"), "left_semi")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      got == want
    })
  }

  test("ohlcBars replays the per-bucket order for any event set") {
    val s = spark
    import s.implicits._
    val evGen = Gen.listOfN(40, for {
      key <- Gen.choose(1L, 3L)
      // seconds offset inside one hour, so "minute" bucketing yields
      // several buckets with multiple events each
      sec <- Gen.choose(0L, 3599L)
      v <- Gen.choose(-100, 100).map(_.toDouble / 4.0)
    } yield (key, sec, v))
    check(Prop.forAllNoShrink(evGen) { evs =>
      val rows = evs.zipWithIndex.map { case ((k, sec, v), i) =>
        (k, new java.sql.Timestamp(1767225600000L + sec * 1000L),
          i.toLong, v)
      }
      val got = Graft.ohlcBars(rows.toDF("k", "ts", "id", "v"),
          "k", "ts", "id", "v", "minute")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getDouble(6)))).toMap
      def r2(x: Double) = math.floor(x * 100.0 + 0.5) / 100.0
      val expected = rows.groupBy { case (k, ts, _, _) =>
        (k, ts.getTime / 60000L * 60000L)
      }.map { case (key, es) =>
        val sorted = es.sortBy(e => (e._2.getTime, e._3))
        key -> ((es.size.toLong, r2(sorted.head._4),
          r2(es.map(_._4).max), r2(es.map(_._4).min), r2(sorted.last._4)))
      }
      got == expected
    })
  }

  test("snapshotDiff statuses replay set algebra for any two versions") {
    val s = spark
    import s.implicits._
    val verGen = for {
      prev <- Gen.listOf(Gen.choose(0L, 30L)).map(_.distinct)
      cur <- Gen.listOf(Gen.choose(0L, 30L)).map(_.distinct)
      flipped <- Gen.listOf(Gen.choose(0L, 30L)).map(_.toSet)
    } yield (prev, cur, flipped)
    check(Prop.forAllNoShrink(verGen) { case (prev, cur, flipped) =>
      // fingerprint differs on `flipped` ids present in both versions
      val p = prev.map(i => (i, s"fp$i")).toDF("id", "fp")
      val c = cur.map(i =>
        (i, if (flipped(i)) s"fp$i'" else s"fp$i")).toDF("id", "fp")
      val got = Graft.snapshotDiff(p, c, "id", "fp")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val (ps, cs) = (prev.toSet, cur.toSet)
      got.keySet == (ps union cs) &&
        got.count(_._2 == "added") == (cs diff ps).size &&
        got.count(_._2 == "removed") == (ps diff cs).size &&
        got.count(_._2 == "changed") ==
          (ps intersect cs intersect flipped).size &&
        got.count(_._2 == "unchanged") ==
          (ps intersect cs diff flipped).size
    })
  }

  test("semanticDedup replays the seed-argmax + min-id-owner rule exactly") {
    val s = spark
    import s.implicits._
    // same fused accumulation order as the CosineSim kernel — bit-equal
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecGen = for {
      n <- Gen.choose(6, 24)
      vs <- Gen.listOfN(n, Gen.listOfN(6,
        Gen.choose(-4, 4).map(_.toDouble / 4)))
      // reject all-zero vectors (cosine undefined; fixture never has them)
      if vs.forall(_.exists(_ != 0.0))
    } yield vs.map(_.toArray)
    val k = 3
    val eps = 0.8
    check(Prop.forAllNoShrink(vecGen) { vs =>
      val ids = vs.indices.map(_.toLong)
      val got = Graft.semanticDedup(
          ids.zip(vs).toDF("vec_id", "v"), "vec_id", "v", k = k, eps = eps)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getBoolean(2),
            if (r.isNullAt(3)) -1L else r.getLong(3))))
        .toMap
      // plain-Scala replay of the declared rule
      val stride = math.max(vs.length.toLong / k, 1L)
      val seeds = ids.filter(id => id % stride == 0 && id < stride * k)
        .map(id => (id / stride, vs(id.toInt)))
      def cell(v: Array[Double]): Long =
        seeds.map { case (c, cv) => (-cos(v, cv), c) }.min._2
      val cells = ids.map(id => id -> cell(vs(id.toInt))).toMap
      val expect = ids.map { id =>
        val owner = ids.filter(o => o < id && cells(o) == cells(id) &&
          cos(vs(o.toInt), vs(id.toInt)) >= eps)
        id -> ((cells(id), owner.isEmpty,
          if (owner.isEmpty) -1L else owner.min))
      }.toMap
      got == expect
    })
  }

  test("PQ kernels: positional codes replay for ANY sparse id space and k") {
    // Kernel-level (no Spark job): for arbitrary scattered id sets the
    // stride-modulo filter may under-fill the codebook with gapped
    // quotients — the sf1 regime behind the round-9 parity fix. The
    // contract pinned here: codebooks are positional (seed rank in id
    // order), kernels are sized by the ACTUAL seed count, and the
    // kernels agree with a plain-Scala replay plus two exact
    // invariants — self-ADC(v) == residual(v), and seed residual == 0.
    import graft.functions.PqFunctions
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val M = 4
    val dim = 16
    val sub = dim / M
    def vecOf(id: Long): Array[Double] =
      Array.tabulate(dim)(p => (((id * dim + p) * 2654435761L) % 1000).toDouble / 250 - 2)
    val idsGen = Gen.chooseNum(6, 40)
      .flatMap(n => Gen.pick(n, 0 until 200))
      .map(_.map(_.toLong).toList.sorted)
    check(Prop.forAllNoShrink(idsGen, Gen.chooseNum(2, 16)) { (ids, k) =>
      val stride = math.max(ids.length.toLong / k, 1L)
      val seedIds = ids.filter(id => id % stride == 0 && id < stride * k)
      seedIds.isEmpty || {
        val seeds = seedIds.map(vecOf)
        val flat = seeds.flatten.toArray
        val nCodes = seeds.length
        def subDist(a: Array[Double], b: Array[Double], m: Int): Double = {
          var dd = 0.0
          (0 until sub).foreach { i =>
            val diff = a(m * sub + i) - b(m * sub + i); dd += diff * diff
          }
          dd
        }
        ids.forall { id =>
          val v = vecOf(id)
          val vd = new GenericArrayData(v)
          val codes = PqFunctions.codes(vd, flat, nCodes, M)
          val luts = PqFunctions.luts(vd, flat, nCodes, M)
          val res = PqFunctions.residual(vd, flat, nCodes, M)
          val expCodes = (0 until M).map(m =>
            seeds.zipWithIndex
              .map { case (cv, j) => (subDist(v, cv, m), j.toLong) }.min._2)
          val expRes = (0 until M).map(m =>
            seeds.map(cv => subDist(v, cv, m)).min).sum
          (0 until M).forall(m => codes.getLong(m) == expCodes(m)) &&
            res == expRes &&
            PqFunctions.adc(luts, codes) == res &&
            (!seedIds.contains(id) || res == 0.0)
        }
      }
    })
  }

  test("binned overlap join equals the naive predicate for any intervals/width") {
    val iv: Gen[List[(Long, Long)]] = Gen.listOfN(15,
      for {
        a <- Gen.chooseNum(0L, 200L)
        len <- Gen.chooseNum(0L, 60L)
      } yield (a, a + len))
    val gen = for {
      l <- iv; r <- iv
      w <- Gen.oneOf(1L, 7L, 16L, 64L, 300L)
    } yield (l, r, w)
    check(Prop.forAllNoShrink(gen) { case (l, r, w) =>
      val s = spark
      import s.implicits._
      val left = l.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("lid", "ls", "le")
      val right = r.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rid", "rs", "re")
      val got = graft.Graft.overlapJoin(left, right, "ls", "le", "rs", "re", w)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
        .toSet
      val want = (for {
        ((la, lb), li) <- l.zipWithIndex
        ((ra, rb), ri) <- r.zipWithIndex
        if la <= rb && ra <= lb
      } yield (li.toLong, ri.toLong)).toSet
      got == want
    })
  }
}
