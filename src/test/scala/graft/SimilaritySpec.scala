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
}
