package graft

import graft.ops.Similarity

/** Cosine/top-k semantics on literal vectors. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f), 0),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f), 1),  // opposite of 0, other cell
    (4L, Array(2.0f, 0.0f, 0.0f), 1)    // same direction as 0, other cell
  ).toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks by cosine with deterministic tiebreak") {
    val out = Similarity.topKBruteForce(
        vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 3)
      .select("cand_id", "cosine", "rank")
      .as[(Long, Double, Int)].collect().toList
    assert(out.map(_._1) == List(4L, 1L, 2L)) // cos: 1.0, ~0.994, 0.0
    assert(out.head._2 == 1.0)
    assert(out.last._2 == 0.0)
  }

  test("scale-invariance: cosine of colinear vectors is exactly 1") {
    val out = Similarity.topKBruteForce(
        vecs.filter($"vec_id" === 0), vecs.filter($"vec_id" === 4),
        "vec_id", "embedding", 1)
      .select("cosine").head().getDouble(0)
    assert(out == 1.0)
  }

  test("IVF restricts candidates to the query's cell") {
    val out = Similarity.topKIvf(
        vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", "label", 10)
      .select("cand_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L)) // cell 0 only; 3/4 unreachable by design
  }

  test("vector stats: norms and dims") {
    val row = Similarity.vectorStats(vecs, "vec_id", "embedding")
      .filter($"vec_id" === 4).select("dim", "l2_norm").head()
    assert(row.getInt(0) == 3 && row.getDouble(1) == 2.0)
  }

  test("cosine near-dups finds the in-cell colinear pair only") {
    val nd = Similarity.cosineNearDups(vecs, "vec_id", "embedding", "label", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd == Set((0L, 1L))) // 3-4 are opposite (cos -1); 0-4 cross-cell
  }
}
