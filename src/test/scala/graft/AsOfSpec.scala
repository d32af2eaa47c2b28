package graft

import graft.ops.AsOf

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** The as-of join operator against its brute-force definition: for every
  * left row, the matched right row is the one with the greatest
  * rts <= ts among equal keys (inclusive), nulls when none exists.
  */
class AsOfSpec extends SparkSpec {

  test("asofJoin matches the brute-force definition (property)") {
    val params =
      ScTest.Parameters.default.withMinSuccessfulTests(6).withMaxSize(40)
    val leftGen = Gen.listOfN(20,
      Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
    val rightGen = Gen.listOfN(15,
      Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
    val prop = Prop.forAllNoShrink(leftGen, rightGen) { (lRaw, rRaw) =>
      val s = spark
      import s.implicits._
      val lRows = lRaw.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      // unique (key, ts) on the right — the operator's precondition
      val rRows = rRaw.distinct.map { case (k, t) => (k, t, t * 10 + k) }
      val left = lRows.toDF("id", "k", "ts")
      val right = rRows.toDF("k", "rts", "v")
      val got = AsOf.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
        .select("id", "asof_rts", "asof_v")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toSet
      val want = lRows.map { case (id, k, t) =>
        val m = rRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption
        (id, m.map(_._2), m.map(_._3))
      }.toSet
      got == want
    }
    val res = ScTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("forward and nearest directions match brute force (property)") {
    val params =
      ScTest.Parameters.default.withMinSuccessfulTests(6).withMaxSize(40)
    val leftGen = Gen.listOfN(20,
      Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
    val rightGen = Gen.listOfN(15,
      Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
    val prop = Prop.forAllNoShrink(leftGen, rightGen) { (lRaw, rRaw) =>
      val s = spark
      import s.implicits._
      val lRows = lRaw.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rRows = rRaw.distinct.map { case (k, t) => (k, t, t * 10 + k) }
      val left = lRows.toDF("id", "k", "ts")
      val right = rRows.toDF("k", "rts", "v")
      def run(df: org.apache.spark.sql.DataFrame) = df
        .select("id", "asof_rts", "asof_v").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toSet
      val gotF = run(AsOf.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("v"), direction = "forward"))
      val wantF = lRows.map { case (id, k, t) =>
        val m = rRows.filter(r => r._1 == k && r._2 >= t).sortBy(_._2).headOption
        (id, m.map(_._2), m.map(_._3))
      }.toSet
      val gotN = run(AsOf.asofNearest(left, right, Seq("k"), "ts", "rts", Seq("v")))
      val wantN = lRows.map { case (id, k, t) =>
        // closest in |Δt|; exact tie -> backward (the documented rule)
        val m = rRows.filter(_._1 == k)
          .sortBy(r => (math.abs(r._2 - t), r._2 - t))
          .headOption
        (id, m.map(_._2), m.map(_._3))
      }.toSet
      gotF == wantF && gotN == wantN
    }
    val res = ScTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("asofJoin keeps every left row exactly once (left-outer cardinality)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 0L, 5L), (2L, 0L, 5L), (3L, 1L, 2L))
      .toDF("id", "k", "ts") // duplicate (k, ts) on the LEFT is fine
    val right = Seq((0L, 5L, 99L)).toDF("k", "rts", "v")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
    assert(out.count() === 3)
    // equal timestamps match inclusively
    val byId = out.collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        (if (r.isNullAt(r.fieldIndex("asof_v"))) None
         else Some(r.getLong(r.fieldIndex("asof_v"))))).toMap
    assert(byId(1L) === Some(99L) && byId(2L) === Some(99L))
    assert(byId(3L) === None)
  }

  test("a right payload column named ts does not collide with the carried timestamp") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 0L, 5L)).toDF("id", "k", "ts")
    // payload column literally named "ts" — the struct's timestamp slot
    // must use its reserved name or this becomes ambiguous
    val right = Seq((0L, 3L, 77L)).toDF("k", "rts", "ts")
    val Array(r) = AsOf.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("ts"))
      .select("id", "asof_rts", "asof_ts").collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 3L, 77L)))
  }

  test("tolerance null-outs are exactly the unbounded matches with gap > tol (property)") {
    val params =
      ScTest.Parameters.default.withMinSuccessfulTests(6).withMaxSize(40)
    val leftGen = Gen.listOfN(20,
      Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
    val rightGen = Gen.listOfN(15,
      Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
    val tolGen = Gen.choose(0L, 20L)
    val prop = Prop.forAllNoShrink(leftGen, rightGen, tolGen) { (lRaw, rRaw, tol) =>
      val s = spark
      import s.implicits._
      val lRows = lRaw.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rRows = rRaw.distinct.map { case (k, t) => (k, t, t * 10 + k) }
      val left = lRows.toDF("id", "k", "ts")
      val right = rRows.toDF("k", "rts", "v")
      def run(tolerance: Option[Long]) =
        AsOf.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"),
            tolerance = tolerance)
          .select("id", "ts", "asof_rts", "asof_v")
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))
          .toMap
      val free = run(None)
      val bound = run(Some(tol))
      free.keySet == bound.keySet && free.forall { case (id, (ts, rts, v)) =>
        bound(id) == (rts match {
          case Some(m) if ts - m > tol => (ts, None, None)
          case _ => (ts, rts, v)
        })
      }
    }
    val res = ScTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
