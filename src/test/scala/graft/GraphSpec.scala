package graft.ops

import graft.{SparkSpec, Tables}

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Connected-components semantics: label propagation on hand-built
  * graphs (including a chain that needs several propagation rounds),
  * and cluster-assignment invariants on the real corpus tables.
  */
class GraphSpec extends SparkSpec {

  private def cc(edges: (Long, Long)*): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain + islands: components collapse to the min vertex id") {
    // 1-2-3-4-5 is a diameter-4 chain — takes multiple propagation
    // rounds; 10-11 is an island; 20-21-22 a fork.
    val got = cc(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
                 10L -> 11L, 20L -> 21L, 21L -> 22L)
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("a 40-vertex path converges well inside the round cap (pointer jumping)") {
    // Diameter 39 > the 25-round cap of plain propagation: only the
    // pointer-jump acceleration (O(log diameter) rounds) passes this —
    // and worst case the method throws instead of mislabeling.
    val edges = (1L until 40L).map(i => i -> (i + 1))
    val got = cc(edges: _*)
    assert(got === (1L to 40L).map(_ -> 1L).toMap)
  }

  test("components match a reference union-find on random graphs (property)") {
    val params =
      ScTest.Parameters.default.withMinSuccessfulTests(5).withMaxSize(40)
    val edgesGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 25L), Gen.choose(1L, 25L)).suchThat(p => p._1 != p._2))
    val prop = Prop.forAllNoShrink(edgesGen) { es =>
      val got = cc(es.map { case (a, b) => math.min(a, b) -> math.max(a, b) }: _*)
      // reference: plain driver-side union-find with min-root labels
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(v => v -> find(v)).toMap
      got == want
    }
    val res = ScTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private def ccStar(edges: (Long, Long)*): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph.alternatingStarComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("alternating-star matches union-find on random graphs incl. paths") {
    val params =
      ScTest.Parameters.default.withMinSuccessfulTests(5).withMaxSize(40)
    // half the cases are worst-shape long paths (shuffled ids so the
    // component min is interior, not an endpoint), half random graphs
    // a seeded permutation of 0..n-1 builds the path — the earlier
    // stride-7 walk degenerated into self-loops/tiny cycles whenever
    // gcd(7, n) != 1 (n = 7, 14, 21, 28), silently weakening coverage
    val pathGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(5, 30)
      off <- Gen.choose(0L, 100L)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield {
      val perm = new scala.util.Random(seed).shuffle((0L until n.toLong).toList)
      perm.zip(perm.tail).map { case (a, b) => (a + off, b + off) }
    }
    val randGen: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 25L), Gen.choose(1L, 25L)).suchThat(p => p._1 != p._2))
    val prop = Prop.forAllNoShrink(Gen.oneOf(pathGen, randGen)) { es0 =>
      val es = es0.filter { case (a, b) => a != b }
      es.isEmpty || {
        val got = ccStar(es: _*)
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(v => v -> find(v)).toMap
        got == want
      }
    }
    val res = ScTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("a 60-vertex path: alternating-star collapses it (log-round bound)") {
    val edges = (1L until 60L).map(i => i -> (i + 1))
    assert(ccStar(edges: _*) === (1L to 60L).map(_ -> 1L).toMap)
  }

  test("propagation cap-hit falls back to alternating-star, never throws") {
    val s = spark
    import s.implicits._
    // diameter-39 chain with maxIters=2: propagation cannot converge in
    // 2 rounds — pre-round-4 this threw; now it must fall back and
    // return the correct clustering
    val edges = (1L until 40L).map(i => i -> (i + 1)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, maxIters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 40L).map(_ -> 1L).toMap)
  }

  test("alternating-star equals propagation on the real LSH pair graph") {
    val pairs = Dedup.minhashPairs(spark, sf)
    val prop = Graph.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Graph.alternatingStarComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === prop)
    assert(prop.nonEmpty, "vacuous: no candidate pairs at this sf")
  }

  test("q_dedup_components: assignment is a fixed point over the pair graph") {
    val comp = Graph.qDedupComponents.fn(spark, sf)
    val pairs = Dedup.qDedupMinhash.fn(spark, sf)
    // Every candidate pair's two endpoints share a component...
    val broken = pairs
      .join(comp.withColumnRenamed("doc_id", "a")
                .withColumnRenamed("comp", "ca"), "a")
      .join(comp.withColumnRenamed("doc_id", "b")
                .withColumnRenamed("comp", "cb"), "b")
      .filter(col("ca") =!= col("cb"))
      .count()
    assert(broken === 0L)
    // ...and labels are canonical: comp <= doc_id, every label maps to
    // itself (so comp ids ARE survivor doc ids).
    val rows = comp.collect().map(r => r.getLong(0) -> r.getLong(1))
    val byId = rows.toMap
    assert(rows.forall { case (id, c) => c <= id && byId(c) == c })
  }

  test("q_dedup_cluster_sizes: histogram mass equals the corpus size") {
    val hist = Graph.qDedupClusterSizes.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nDocs = Tables.documents(spark, sf).count()
    assert(hist.map { case (sz, n) => sz * n }.sum === nDocs)
  }

  test("q_dedup_survivors: one best-quality survivor per cluster, sizes conserve") {
    val surv = Graph.qDedupSurvivors.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sizes cover the whole corpus; one row per cluster
    assert(surv.map(_._4).sum === Tables.documents(spark, sf).count())
    assert(surv.map(_._1).distinct.length === surv.length)
    // cross-check against the component assignment + token counts: the
    // survivor is the member with the most tokens (ties -> min doc_id)
    val comp = Graph.qDedupComponents.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = comp.groupBy(_._2).map { case (c, ms) =>
      val members = ms.map(_._1)
      c -> (members.maxBy(id => (nTok(id), -id)), members.size.toLong)
    }
    assert(surv.map(r => r._1 -> ((r._2, r._4))).toMap === expected)
    surv.foreach { case (_, s, st, _) => assert(nTok(s) === st) }
  }
  test("pair-degree histogram conserves edge endpoints and the corpus") {
    val hist = Graph.qDedupPairDegree.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nPairs = Dedup.minhashPairs(spark, sf).count()
    val nDocs = Tables.documents(spark, sf).count()
    // every pair contributes exactly two endpoints; every doc lands in
    // exactly one degree row (degree 0 included)
    assert(hist.map { case (d, n) => d * n }.sum === 2 * nPairs)
    assert(hist.map(_._2).sum === nDocs)
    assert(hist.map(_._1).distinct.length === hist.length)
  }

  test("triangle census replays brute force over the pair graph") {
    val edges = Dedup.minhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2))
    def adj(x: Long, y: Long) =
      edges((math.min(x, y), math.max(x, y)))
    val tris = (for {
      (a, b) <- edges; c <- verts
      if c > b && adj(b, c) && adj(a, c)
    } yield (a, b, c)).size.toLong
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.length.toLong)
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    val row = Graph.qGraphTriangles.fn(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      === ((verts.size.toLong, edges.size.toLong, wedges, tris)))
    // every triangle closes three wedges
    assert(3 * tris <= wedges || wedges == 0)
  }
}
