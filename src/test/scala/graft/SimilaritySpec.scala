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

  test("hardNegatives: only wrong-label candidates rank — the nearest " +
      "same-label vectors never appear") {
    val out = Similarity.hardNegatives(vecs, "vec_id", "embedding",
        "label", $"vec_id" === 0, k = 2)
      .select("cand_id", "cand_label", "cosine", "rank")
      .as[(Long, Int, Double, Int)].collect().toList
    // same-label 1 (cos ~0.994) and 2 are filtered; label-1 vecs rank
    assert(out == List((4L, 1, 1.0, 1), (3L, 1, -1.0, 2)))
  }

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

  test("l2Normalize yields unit vectors; zero vectors pass through") {
    val df = Seq((0L, Array(3.0f, 4.0f)), (1L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.l2Normalize(df, "vec_id", "embedding")
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(0L) == Seq(0.6, 0.8))
    assert(out(1L) == Seq(0.0, 0.0))
  }

  test("int8 quantization: bounded error, zero vector safe") {
    val df = Seq((0L, Array(0.5f, -1.0f, 0.25f)), (1L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .as[(Long, Double, Seq[Int])].collect()
      .map { case (k, s, q) => k -> (s, q) }.toMap
    val (s0, q0) = rows(0L)
    assert(s0 == 1.0 && q0 == Seq(64, -127, 32))
    assert(q0.forall(v => v >= -127 && v <= 127))
    // reconstruction error bounded by half a quantization step
    Seq(0.5, -1.0, 0.25).zip(q0).foreach { case (x, q) =>
      assert(math.abs(x - q * s0 / 127.0) <= s0 / 254.0 + 1e-12)
    }
    assert(rows(1L) == (0.0, Seq(0, 0, 0)))
  }

  test("quantized ANN ranks like exact cosine on well-separated vectors") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.topKBruteForce(queries, emb, "vec_id", "embedding", 3)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.topKQuantized(queries, emb, "vec_id", "embedding", 3)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val overlap = (exact intersect quant).size.toDouble / exact.size
    assert(overlap >= 0.6, s"overlap=$overlap") // int8 keeps most of the ranking
  }

  test("bounded-sample codebook IVF: deterministic, good recall vs brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.topKBruteForce(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val run1 = Similarity.learnedIvf(emb, "vec_id", "embedding", queries, 5, 4)
      .select("query_id", "cand_id", "cosine")
      .as[(Long, Long, Double)].collect().toList
    val run2 = Similarity.learnedIvf(emb, "vec_id", "embedding", queries, 5, 4)
      .select("query_id", "cand_id", "cosine")
      .as[(Long, Long, Double)].collect().toList
    assert(run1 == run2) // sample, init, and assignment all deterministic
    val approx = run1.map(r => (r._1, r._2)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall") // coarse 4-cell quantizer
  }

  test("multi-probe IVF: recall climbs with nProbe; nProbe=nCells ≡ brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.topKBruteForce(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    def recallAt(nProbe: Int): Double = {
      val got = Similarity.learnedIvfMultiProbe(
          emb, "vec_id", "embedding", queries, 5, 4, nProbe)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val r1 = recallAt(1); val r2 = recallAt(2); val r4 = recallAt(4)
    assert(r1 <= r2 + 1e-9 && r2 <= r4 + 1e-9, s"recall not monotone: $r1 $r2 $r4")
    // probing every cell searches the whole corpus: exactly brute force
    assert(r4 == 1.0, s"full-probe recall $r4")
    // and nProbe=1 is precisely the single-cell learnedIvf
    val single = Similarity.learnedIvf(emb, "vec_id", "embedding", queries, 5, 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val probe1 = Similarity.learnedIvfMultiProbe(
        emb, "vec_id", "embedding", queries, 5, 4, 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(single == probe1)
  }

  test("codebook IVF serves query vectors NOT in the indexed corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    val unseen = emb.filter($"vec_id" < 2)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    val out = Similarity.learnedIvf(emb, "vec_id", "embedding", unseen, 3, 4)
    assert(out.select("query_id").distinct().count() == 2)
  }

  test("PQ: encode/reconstruct round trip is deterministic, ADC recall reasonable") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
    val run1 = Similarity.topKPq(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "cand_id", "qcos")
      .as[(Long, Long, Double)].collect().toList
    val run2 = Similarity.topKPq(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "cand_id", "qcos")
      .as[(Long, Long, Double)].collect().toList
    assert(run1 == run2) // sample, per-subspace init, encode all deterministic
    val exact = Similarity.topKBruteForce(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = run1.map(r => (r._1, r._2)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall") // 8-subspace 16-code quantizer
  }

  test("PQ codes are within range and reconstruction has the right shape") {
    val emb = Tables.embeddings(spark, sfDir)
    val cb = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", m = 8)
    assert(cb.length == 8 && cb.forall(_.length <= 16))
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb)
      .select("pq_codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("lossless PQ (kCodes ≥ corpus) reproduces brute force exactly") {
    // every sampled subvector becomes its own Lloyd's-fixpoint centroid,
    // so reconstruction is exact and ADC ranking ≡ brute-force ranking —
    // the x_pq_recall / x_ivfpq_recall oracle contract
    val emb = Tables.embeddings(spark, sfDir).filter($"vec_id" < 500)
    val queries = emb.filter($"vec_id" < 5)
    val brute = Similarity.topKBruteForce(queries, emb, "vec_id",
        "embedding", 3)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.topKPq(queries, emb, "vec_id", "embedding", 3,
        m = 8, kCodes = 512)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(pq == brute)
    val ivfpq = Similarity.topKIvfPq(emb, "vec_id", "embedding", queries,
        3, nCells = 8, nProbe = 8, m = 8, kCodes = 512)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(ivfpq == brute)
  }

  test("cosine near-dups finds the in-cell colinear pair only") {
    val nd = Similarity.cosineNearDups(vecs, "vec_id", "embedding", "label", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd == Set((0L, 1L))) // 3-4 are opposite (cos -1); 0-4 cross-cell
  }

  test("semDedup: lower-id cell-mate above tau wins; cross-cell dups survive") {
    // seed centroids (1,0,0) and (0,1,0): vecs 0,1,4 land in cell 0,
    // vecs 2,3 in cell 1. At tau=0.9 the colinear/near-colinear 1 and 4
    // lose to senior 0; 2 and 3 are orthogonal-to-opposite (cos 0) — kept.
    val cents = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val out = Similarity.semDedup(vecs, "vec_id", "embedding", cents, 0.9)
      .as[(Long, Int, Boolean)].collect().toList
    assert(out.map(_._1) == List(0L, 1L, 2L, 3L, 4L)) // full audit, ordered
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0))
    assert(out.filter(_._3).map(_._1) == List(0L, 2L, 3L))
  }

  test("semDedup: unreachable tau keeps everything; audit covers the corpus") {
    val cents = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val out = Similarity.semDedup(vecs, "vec_id", "embedding", cents, 2.0)
    assert(out.count() == 5 && out.filter($"kept" === false).count() == 0)
  }

  test("semDedup: fitted-codebook drop rule matches a naive recheck") {
    val emb = Tables.embeddings(spark, sfDir)
    val cb = Similarity.trainCodebook(emb, "vec_id", "embedding", nCells = 4)
    val out = Similarity.semDedup(emb, "vec_id", "embedding", cb, 0.4)
    assert(out.count() == emb.count()) // full audit, one row per vector
    val cells = out.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val kept = out.filter($"kept").select("vec_id").as[Long].collect().toSet
    val vs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val naiveKept = vs.keySet.filter { id =>
      !vs.keySet.exists(o => o < id && cells(o) == cells(id) &&
        cos(vs(o), vs(id)) >= 0.4)
    }
    assert(kept == naiveKept)
  }

  test("IVF-PQ: deterministic, k per query, recall within the combined loss") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
    def run() = Similarity.topKIvfPq(emb, "vec_id", "embedding", queries,
        5, nCells = 4, nProbe = 2)
      .select("query_id", "cand_id", "qcos")
      .as[(Long, Long, Double)].collect().toList
    val r1 = run(); val r2 = run()
    assert(r1 == r2)
    val perQuery = r1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQuery.size == 10 && perQuery.values.forall(_ == 5))
    val exact = Similarity.topKBruteForce(queries, emb, "vec_id",
        "embedding", 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect r1.map(r => (r._1, r._2)).toSet).size
      .toDouble / exact.size
    // two approximations stack (cell pruning + 16-code quantization)
    assert(recall >= 0.15, s"recall=$recall")
    // widening the probe set cannot lose candidates that scored higher
    val full = Similarity.topKIvfPq(emb, "vec_id", "embedding", queries,
        5, nCells = 4, nProbe = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(full.size == 50)
  }

  test("centroidOutliers: farthest-from-centroid wins, per-group k, " +
      "groups isolated") {
    // group 0: three near (1,0) and one near (0,1) — the odd one out;
    // group 1: two identical vectors → both at distance 0
    val emb = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(0.9f, 0.1f)),
      (3L, 0, Seq(1.0f, 0.05f)), (4L, 0, Seq(0.0f, 1.0f)),
      (5L, 1, Seq(0.5f, 0.5f)), (6L, 1, Seq(0.5f, 0.5f))
    ).toDF("vec_id", "label", "embedding")
    val top1 = Similarity.centroidOutliers(emb, "vec_id", "embedding",
        "label", k = 1)
      .select("label", "vec_id").as[(Int, Long)].collect().toMap
    assert(top1(0) == 4L)  // the orthogonal vector is group 0's outlier
    assert(top1(1) == 5L)  // tie at distance 0 → smaller id elected
    val all = Similarity.centroidOutliers(emb, "vec_id", "embedding",
      "label", k = 10)
    assert(all.count() == 6) // k caps, never pads
    assert(all.filter($"label" === 1 && $"cos_dist" =!= 0.0).count() == 0)
  }

  test("embeddingDrift: identical slices report cosine 1 / zero shift; " +
      "a planted per-dimension offset is measured exactly") {
    import org.apache.spark.sql.functions._
    // slice A = ids 0,1 ; slice B = ids 2,3 with B = A + (3, 0) offset:
    // dim 0 shifts by +3, dim 1 is unchanged
    val emb = Seq(
      (0L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 4.0f)),
      (2L, Array(4.0f, 2.0f)), (3L, Array(6.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.embeddingDrift(emb, "embedding", col("vec_id") < 2)
      .select("dim", "ref_mean", "cur_mean", "shift", "l2_shift")
      .as[(Int, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0) == ((0, 2.0, 5.0, 3.0, 3.0)))
    assert(out(1) == ((1, 3.0, 3.0, 0.0, 3.0)))
    // self-vs-self: cosine exactly 1, l2 exactly 0
    val self = Similarity.embeddingDrift(emb, "embedding",
        (col("vec_id") % 2) === 0)
      .select("centroid_cosine", "l2_shift")
      .as[(Double, Double)].head()
    // even slice (ids 0,2) vs odd (ids 1,3) differ; just shape-check
    assert(self._1 <= 1.0 && self._2 >= 0.0)
    val same = Similarity.embeddingDrift(
        emb.withColumn("flip", lit(true)), "embedding", col("flip"))
      .select("cur_mean").as[Option[Double]].collect()
    assert(same.forall(_.isEmpty)) // empty current slice → NULL means
  }
  test("silhouette: orthogonal clusters score 1, own-centroid distance 0, " +
      "single-label corpus yields NULL silhouette") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(2.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1), (3L, Array(0.0f, 3.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.silhouette(emb, "vec_id", "embedding", "label")
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // all vectors are colinear with their centroid (cos dist 0) and
    // orthogonal to the other centroid (cos dist 1) -> silhouette 1
    assert(out(0) == ((0, 2L, 0.0, 1.0, 1.0)))
    assert(out(1) == ((1, 2L, 0.0, 1.0, 1.0)))
    val single = Similarity.silhouette(
        emb.filter($"label" === 0), "vec_id", "embedding", "label")
      .select("mean_nearest_other", "mean_silhouette")
      .as[(Option[Double], Option[Double])].head()
    assert(single == ((None, None)))
  }

  test("mmrDiversify: the second pick jumps to the diverse candidate " +
      "where plain top-k would take the near-copy of the best hit") {
    // query 0 along (1,0); candidates: 1,2 nearly identical high-rel;
    // 3 moderately relevant but orthogonal-ish
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.10f, 0.0f)),
      (2L, Array(0.99f, 0.11f, 0.0f)),   // near-copy of 1
      (3L, Array(0.70f, 0.0f, 0.71f))    // diverse
    ).toDF("vec_id", "embedding")
    // diversity-heavy lambda: the near-copy's ~1.0 similarity to pick 1
    // must outweigh its relevance edge over the diverse candidate
    val mmr = Similarity.mmrDiversify(emb, "vec_id", "embedding",
        $"vec_id" === 0, poolK = 3, selectK = 3, lambdaTenths = 3)
      .select("pick", "vec_id").as[(Long, Long)].collect().toMap
    val topk = Similarity.topKBruteForce(emb.filter($"vec_id" === 0), emb,
        "vec_id", "embedding", 3)
      .select("rank", "cand_id").as[(Int, Long)].collect().toMap
    assert(topk(1) == 1L && topk(2) == 2L) // plain ranking: the near-copy
    assert(mmr(1L) == 1L)
    assert(mmr(2L) == 3L, "MMR must promote the diverse candidate")
    assert(mmr(3L) == 2L)
    intercept[IllegalArgumentException] {
      Similarity.mmrDiversify(emb, "vec_id", "embedding",
        $"vec_id" === 0, poolK = 2, selectK = 3, lambdaTenths = 7)
    }
  }

  test("matryoshkaRecall: prefix-carried signal scores 1.0, tail-carried " +
      "signal scores 0 at small dims and recovers at full width") {
    // 8-dim vectors: first 4 dims = one-hot group signal, last 4 dims
    // flat — prefix truncation keeps everything
    def oneHot(g: Int, tail: Boolean): Array[Float] = {
      val a = Array.fill(8)(0.01f)
      if (tail) a(4 + g) = 1.0f else a(g) = 1.0f
      a
    }
    val prefixEmb = (0L to 11L).map(i =>
      (i, oneHot((i % 4).toInt, tail = false))).toDF("vec_id", "embedding")
    val rPrefix = Similarity.matryoshkaRecall(prefixEmb, "vec_id",
        "embedding", $"vec_id" < 2, Seq(4, 8), k = 2)
      .as[(Int, Long, Long, Double)].collect()
    assert(rPrefix.forall(_._4 == 1.0)) // all signal in the first 4 dims
    // same groups encoded in dims 5..8: truncating to 4 leaves only the
    // flat floor -> ties broken by id, recall collapses for late queries
    val tailEmb = (0L to 11L).map(i =>
      (i, oneHot((i % 4).toInt, tail = true))).toDF("vec_id", "embedding")
    val rTail = Similarity.matryoshkaRecall(tailEmb, "vec_id",
        "embedding", $"vec_id" >= 10, Seq(4, 8), k = 2)
      .as[(Int, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._4).toMap
    // at full width the true neighbors return
    assert(rTail((8, 10L)) == 1.0 && rTail((8, 11L)) == 1.0)
    // at dims=4 every candidate is identical (flat floor): top-2 by id
    // tie-break picks ids 0,1 — not the group neighbors of queries 10/11
    assert(rTail((4, 10L)) == 0.0 && rTail((4, 11L)) == 0.0)
  }

  test("randomProjectionRecall: shared sign matrix is ±1 and stable, " +
      "duplicate-of-query retrieval survives projection, projecting up " +
      "is refused") {
    val s1 = Similarity.jlSigns(8, 4)
    assert(s1.length == 4 && s1.forall(_.length == 8))
    assert(s1.flatten.forall(x => x == 1.0 || x == -1.0))
    assert(s1.flatten.toSeq == Similarity.jlSigns(8, 4).flatten.toSeq)
    assert(s1.flatten.distinct.length == 2) // both signs occur
    // corpus: query 0, its exact duplicate 1, and orthogonal-ish noise;
    // a linear projection preserves exact-duplicate cosine 1.0, so the
    // duplicate must stay the top hit at k=1
    val rows = Seq(
      (0L, Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)),
      (1L, Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)),
      (2L, Array(-5.0, 1.0, -4.0, 2.0, 8.0, -1.0, 0.5, -7.0)),
      (3L, Array(4.0, -6.0, 2.0, -8.0, 1.0, 3.0, -2.0, 5.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.randomProjectionRecall(rows, "vec_id",
        "embedding", $"vec_id" === 0, projDims = 4, k = 1)
      .as[(Int, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((4, 0L, 1L, 1.0)))
    intercept[IllegalArgumentException] {
      Similarity.randomProjectionRecall(rows, "vec_id", "embedding",
        $"vec_id" === 0, projDims = 8, k = 1)
    }
  }

  test("mmrDiversify: poolK above the 4096 driver-side cap fails loud") {
    val rows = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrDiversify(rows, "vec_id", "embedding",
        $"vec_id" === 0, poolK = 5000, selectK = 2, lambdaTenths = 5)
    }
    assert(e.getMessage.contains("poolK <= 4096"))
  }

  test("itemItemCF: hand-computed cosines with deterministic tie-break, " +
      "minDf drops one-off items, maxBasket drops the power user") {
    val ui = Seq((1L, "A"), (1L, "B"), (1L, "C"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "D")).toDF("u", "i")
    val r = Similarity.itemItemCF(ui, "u", "i", minDf = 2, maxDf = 100,
      maxBasket = 16, k = 10).collect()
    // D (df=1) dropped: no pair row mentions it
    assert(!r.exists(row => row.getAs[String]("item") == "D" ||
      row.getAs[String]("neighbor") == "D"))
    val aRows = r.filter(_.getAs[String]("item") == "A")
    // cos(A,B) = cos(A,C) = 2/sqrt(6); tie broken by neighbor asc
    assert(aRows.map(_.getAs[String]("neighbor")).toSeq == Seq("B", "C"))
    assert(aRows.head.getAs[Double]("cosine") == 0.816497)
    assert(aRows.head.getAs[Long]("n_co") == 2L)
    val bc = r.filter(row => row.getAs[String]("item") == "B" &&
      row.getAs[String]("neighbor") == "C").head
    assert(bc.getAs[Double]("cosine") == 0.5)
    // a power user touching everything is cut before the pair join:
    // with maxBasket=3 the 4-item user mints no pairs at all
    val power = ui.unionByName(Seq((9L, "A"), (9L, "B"), (9L, "C"),
      (9L, "D")).toDF("u", "i"))
    val rp = Similarity.itemItemCF(power, "u", "i", minDf = 2,
      maxDf = 100, maxBasket = 3, k = 10).collect()
    val ab = rp.filter(row => row.getAs[String]("item") == "A" &&
      row.getAs[String]("neighbor") == "B").head
    assert(ab.getAs[Long]("n_co") == 2L) // unchanged by user 9
  }

  test("itemItemCF: pair-budget guard fails loud BEFORE the self-join, " +
      "naming the knobs and the bucketed alternative") {
    val ui = Seq((1L, "A"), (1L, "B"), (1L, "C"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C")).toDF("u", "i")
    // kept baskets: u1 = 3 items, u2 = 2, u3 = 2 -> 3 + 1 + 1 = 5 pairs
    val e = intercept[IllegalArgumentException] {
      Similarity.itemItemCF(ui, "u", "i", minDf = 2, maxDf = 100,
        maxBasket = 16, k = 10, pairBudget = 4L)
    }
    assert(e.getMessage.contains("5 pairs exceeds pairBudget=4"))
    assert(e.getMessage.contains("maxBasket"))
    assert(e.getMessage.contains("itemItemCFLsh"))
    // exactly at budget: runs
    val r = Similarity.itemItemCF(ui, "u", "i", minDf = 2, maxDf = 100,
      maxBasket = 16, k = 10, pairBudget = 5L).collect()
    assert(r.nonEmpty)
  }

  test("recommendTopK/recMetrics: owned items excluded, scores sum " +
      "neighbor cosines on the lattice, coverage and novelty replay") {
    import spark.implicits._
    // users 1..3; items 10,11 co-occur (users 1,2); item 12 with 11
    // (user 3 has 11,12); user 1 owns 10,11 -> candidate 12 via 11
    val ui = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 11L), (3L, 12L)).toDF("u", "i")
    val nb = graft.ops.Similarity.itemItemCF(ui, "u", "i",
      minDf = 1, maxDf = 100, maxBasket = 16, k = 10)
    val recs = graft.ops.Similarity.recommendTopK(ui, "u", "i", nb,
      k = 2)
    val byUser = recs.collect()
      .groupBy(_.getAs[Long]("u")).view.mapValues(_.toSeq).toMap
    // user 1 owns {10,11}: only unowned neighbor is 12 (via 11)
    val u1 = byUser(1L)
    assert(u1.map(_.getAs[Long]("rec_item")).toSet == Set(12L))
    // cos(11,12) = 1/sqrt(3*1) -> 0.577350
    assert(u1.head.getAs[Double]("score") == 0.57735)
    // user 3 owns {11,12}: unowned candidate 10 (via 11)
    assert(byUser(3L).map(_.getAs[Long]("rec_item")).toSet == Set(10L))
    val m = graft.ops.Similarity.recMetrics(recs, ui, "u", "i")
      .collect().head
    assert(m.getAs[Long]("n_users") == 3L)
    assert(m.getAs[Long]("catalog_size") == 3L)
    // recommended items across lists: {12, 12(user2), 10} -> 2 distinct
    assert(m.getAs[Long]("n_rec_items") == 2L)
    assert(m.getAs[Double]("catalog_coverage") == 0.666667)
    assert(m.getAs[Long]("n_recs") == recs.count())
  }

  test("LSH twins fast path (round 13): derived twin signatures equal " +
      "the recomputed fold, and candFilter + sigPinned leave the " +
      "filtered pair output bit-identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ui = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L),
      (3L, 12L), (4L, 12L), (4L, 11L), (5L, 12L), (5L, 10L),
      (6L, 13L), (7L, 13L)).toDF("u", "i")
    val doubled = ui.unionByName(
      ui.select(col("u"), (col("i") + 1000000L).as("i")))
    val keptD = Similarity.cfKeptPinned(doubled, "u", "i",
      minDf = 2, maxDf = 100, maxBasket = 32)
    // twin signatures = base signatures with shifted ids: same user
    // set per item ⇒ same per-component mins
    val keptB = keptD.filter(col("__i") < 1000000L)
    val sigB = Similarity.cfSignatures(keptB, numHashes = 8)
    val derived = sigB.unionByName(
      sigB.withColumn("id", col("id") + 1000000L))
    val refit = Similarity.cfSignatures(keptD, numHashes = 8)
    assert(derived.collect().toSet == refit.collect().toSet)
    // full pairs build: default vs candFilter+sigPinned, both filtered
    // to the twin rows — the x_item_cf_lsh_twins restructure's pin
    val slow = Similarity.itemItemCFLshPairs(doubled, "u", "i",
        minDf = 2, maxDf = 100, maxBasket = 32, minCosine = 1.0,
        numHashes = 8, bands = 4, keptPinned = Some(keptD))
      .filter(col("neighbor") === col("item") + 1000000L)
      .collect().toSet
    val fast = Similarity.itemItemCFLshPairs(doubled, "u", "i",
        minDf = 2, maxDf = 100, maxBasket = 32, minCosine = 1.0,
        numHashes = 8, bands = 4, keptPinned = Some(keptD),
        candFilter = Some(col("id_b") === col("id_a") + 1000000L),
        sigPinned = Some(derived))
      .filter(col("neighbor") === col("item") + 1000000L)
      .collect().toSet
    assert(fast == slow && fast.nonEmpty)
  }
}
