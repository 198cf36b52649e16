package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §7.4):
  * brute-force cosine top-k as the correctness baseline, and an
  * inverted-file (IVF-style) bucketed variant as the scale path.
  *
  * Vector math is `zip_with` + `aggregate` over `array<float>` upcast to
  * double — pure Catalyst expressions inside whole-stage codegen; no UDF,
  * no MLlib Vector conversion.
  *
  * Scale posture: brute force is O(|Q|·|C|) — correct but only viable with
  * a small broadcast query set; `topKIvf` restricts candidates to the
  * query's coarse partition (here the `label` column standing in for a
  * k-means cell id), turning the join into a keyed equi-join — the standard
  * IVF trade of recall for a 1-2 order-of-magnitude candidate cut. At
  * 100 TB the cell assignment comes from a trained codebook (broadcast),
  * and the per-cell join is hash-partitioned on cell id.
  */
object Similarity {

  private def d(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), _ + _)

  def norm(a: Column): Column =
    sqrt(aggregate(d(a), lit(0.0), (acc, x) => acc + x * x))

  /** Pairwise hot-path cosine: the native single-pass expression
    * (`graft.functions.Native`), bit-identical to dot/(‖a‖·‖b‖) with the
    * HOFs above but one JVM call per pair instead of an interpreted
    * closure per element.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.Native.cosine_similarity(a, b)

  /** Per-vector norms/means — sanity statistics over the embedding column. */
  def vectorStats(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(
        col(idCol),
        size(col(vecCol)).as("dim"),
        round(norm(col(vecCol)), 6).as("l2_norm"),
        round(aggregate(d(col(vecCol)), lit(0.0), _ + _) / size(col(vecCol)), 6)
          .as("mean_component"))
      .orderBy(col(idCol))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * candidates (self excluded). Query side must be small — it is broadcast;
    * every executor streams its candidate partition past all queries once.
    */
  def topKBruteForce(queries: DataFrame, candidates: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 6).as("cosine"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hard-negative mining for contrastive training: per query vector,
    * the k nearest candidates with a DIFFERENT label — the examples a
    * contrastive or reranker loss learns the most from (easy random
    * negatives saturate in one epoch; the near-but-wrong ones define
    * the decision boundary). Same broadcast-query brute-force kernel,
    * ranking convention, and tiebreak as [[topKBruteForce]], with the
    * label-mismatch filter applied BEFORE ranking so every returned
    * row is a usable negative.
    */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, isQuery: Column,
                    k: Int): DataFrame = {
    require(k >= 1, s"hardNegatives: k >= 1 (got $k)")
    val q = emb.filter(isQuery).select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), col(labelCol).as("query_label"))
    val c = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      col(labelCol).as("cand_label"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id") &&
        col("cand_label") =!= col("query_label"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("cand_id"),
        col("cand_label"), round(col("cos"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Matryoshka truncation audit: recall@k of top-k retrieval using only
    * the FIRST `d` embedding components, against full-dimension brute
    * force as ground truth — the evaluation that decides how far an
    * MRL-style embedding can be truncated before retrieval quality falls
    * off (Kusupati et al. 2022, "Matryoshka Representation Learning").
    * At 100 TB this is the dial between index size and recall: serving at
    * d=16 of 64 quarters the index bytes and the dot-product cost.
    *
    * One corpus scan: the broadcast query set crosses the candidate set
    * ONCE, and every truncation level's cosine is computed from array
    * prefixes of the same row (narrow projections — no per-level rescan);
    * per-level ranking windows run per (level, query) over the bounded
    * scored frame. Output: one row per (dims, query) with hits and
    * recall@k; ties broken by candidate id like [[topKBruteForce]].
    */
  def matryoshkaRecall(emb: DataFrame, idCol: String, vecCol: String,
                       queryPred: Column, dims: Seq[Int],
                       k: Int): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1),
      s"matryoshkaRecall: dims must be positive (got $dims)")
    require(k >= 1, s"matryoshkaRecall: k >= 1 (got $k)")
    // slice() past the vector length silently returns the full vector,
    // which would report full-dimension recall 1.0 under a misleading
    // dims label — check the declared levels against one observed row
    emb.select(size(col(vecCol))).head(1).foreach { r =>
      val obs = r.getInt(0)
      require(dims.forall(_ <= obs),
        s"matryoshkaRecall: dims ${dims.filter(_ > obs).mkString(", ")} " +
        s"exceed the embedding dimension $obs — a clamped slice would " +
        "mislabel full-dimension recall")
    }
    val q = emb.filter(queryPred)
      .select(col(idCol).as("query_id"), d(col(vecCol)).as("qv"))
    val c = emb.select(col(idCol).as("cand_id"), d(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos_full", cosine(col("qv"), col("cv")))
    val truthW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_full").desc, col("cand_id").asc)
    val truth = scored
      .withColumn("rank", row_number().over(truthW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"))
    // every truncation level from the same scored rows, then one window
    // per (dims, query) partition over the bounded frame
    val leveled = scored.select(col("query_id"), col("cand_id"),
      explode(array(dims.map(dd =>
        struct(lit(dd).as("dims"),
          cosine(slice(col("qv"), 1, dd), slice(col("cv"), 1, dd))
            .as("cos"))): _*)).as("lv"))
      .select(col("query_id"), col("cand_id"),
        col("lv.dims").as("dims"), col("lv.cos").as("cos"))
    val lvlW = Window.partitionBy(col("dims"), col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    val topTrunc = leveled
      .withColumn("rank", row_number().over(lvlW))
      .filter(col("rank") <= k)
    // left join (not semi) so a level with ZERO overlap still reports a
    // recall=0 row — every (dims, query) group has exactly k topTrunc rows
    topTrunc
      .join(truth.withColumn("__hit", lit(1)),
        Seq("query_id", "cand_id"), "left")
      .groupBy(col("dims"), col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .withColumn("recall",
        round(col("n_hits").cast("double") / k, 6))
      .select(col("dims"), col("query_id"), col("n_hits"), col("recall"))
      .orderBy(col("dims"), col("query_id"))
  }

  /** Deterministic Achlioptas ±1 projection matrix shared with the
    * DuckDB oracle generator: sign(j, i) from one minstd step, so both
    * engines embed the IDENTICAL literal matrix (p rows of d signs).
    */
  def jlSigns(d: Int, p: Int): Array[Array[Double]] =
    Array.tabulate(p, d) { (j, i) =>
      val h = ((j.toLong * 10007L + i.toLong + 1L) * 48271L) % 2147483647L
      if (h % 2 == 0L) 1.0 else -1.0
    }

  /** Random-projection (Johnson–Lindenstrauss) retrieval audit: recall@k
    * of top-k retrieval in a `projDims`-dimensional ±1 projection
    * (Achlioptas 2003 — database-friendly JL: signs instead of
    * Gaussians, no scaling needed for cosine ranking) against
    * full-dimension brute force. The dial next to [[matryoshkaRecall]]:
    * truncation assumes the embedding was TRAINED nested; the random
    * projection needs no such training and works on any vector column —
    * at 100 TB, a 64→16 projection quarters index bytes and dot cost
    * for whatever recall this audit measures.
    *
    * One corpus scan: each candidate's projection is computed ONCE
    * (p literal-sign dot products — narrow, codegen'd), the broadcast
    * query set crosses the projected candidates once, and ranking
    * windows run per query over the bounded scored frame. Ties break by
    * candidate id like [[topKBruteForce]]; the sign matrix is the
    * [[jlSigns]] constant, so the oracle replays bit-identical
    * projections.
    */
  def randomProjectionRecall(emb: DataFrame, idCol: String, vecCol: String,
                             queryPred: Column, projDims: Int,
                             k: Int): DataFrame = {
    require(projDims >= 1, s"randomProjectionRecall: projDims >= 1 " +
      s"(got $projDims)")
    require(k >= 1, s"randomProjectionRecall: k >= 1 (got $k)")
    val obsDim = emb.select(size(col(vecCol))).head().getInt(0)
    require(projDims < obsDim,
      s"randomProjectionRecall: projDims $projDims must be below the " +
      s"embedding dimension $obsDim — projecting up is not a reduction")
    val signs = jlSigns(obsDim, projDims)
    def proj(v: Column): Column = array(signs.map(row =>
      dot(v, array(row.map(lit): _*))): _*)
    val base = emb.select(col(idCol), d(col(vecCol)).as("__v"))
      .withColumn("__pv", proj(col("__v")))
    val q = base.filter(queryPred)
      .select(col(idCol).as("query_id"), col("__v").as("qv"),
        col("__pv").as("qpv"))
    val c = base.select(col(idCol).as("cand_id"), col("__v").as("cv"),
      col("__pv").as("cpv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
    val truthW = Window.partitionBy(col("query_id"))
      .orderBy(cosine(col("qv"), col("cv")).desc, col("cand_id").asc)
    val truth = scored
      .withColumn("rank", row_number().over(truthW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"))
    val projW = Window.partitionBy(col("query_id"))
      .orderBy(cosine(col("qpv"), col("cpv")).desc, col("cand_id").asc)
    scored
      .withColumn("rank", row_number().over(projW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"))
      .join(truth.withColumn("__hit", lit(1)),
        Seq("query_id", "cand_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .select(lit(projDims).as("proj_dims"), col("query_id"), col("n_hits"),
        round(col("n_hits").cast("double") / k, 6).as("recall"))
      .orderBy("query_id")
  }

  /** Maximal-Marginal-Relevance re-rank (Carbonell & Goldstein 1998):
    * greedily pick `selectK` of the top-`poolK` semantic candidates,
    * each step maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    * selected — the diversity-aware re-rank that stops a result list
    * collapsing onto near-duplicates of the best hit.
    *
    * Scale shape: the corpus-sized work is the top-`poolK` retrieval
    * (TakeOrdered); the greedy loop runs on the BOUNDED pool collected
    * driver-side (the codebook precedent — poolK rows, data-size-
    * independent). Every score is rounded at 6 BEFORE each comparison
    * and ties break by id, so the oracle's unrolled-step replay elects
    * identical winners.
    */
  def mmrDiversify(emb: DataFrame, idCol: String, vecCol: String,
                   queryPred: Column, poolK: Int, selectK: Int,
                   lambdaTenths: Int): DataFrame = {
    require(poolK >= selectK && selectK >= 1,
      s"mmrDiversify: need poolK >= selectK >= 1 (got $poolK, $selectK)")
    require(poolK <= 4096,
      s"mmrDiversify: poolK <= 4096 (got $poolK) — the greedy loop " +
        "collects the pool driver-side (the seedCentroids cap); an " +
        "unbounded poolK is a driver OOM, not a bigger re-rank")
    require(lambdaTenths >= 1 && lambdaTenths <= 9,
      s"mmrDiversify: lambdaTenths in [1, 9] (got $lambdaTenths)")
    val spark = emb.sparkSession
    val q = emb.filter(queryPred)
    val pool = topKBruteForce(q, emb, idCol, vecCol, poolK)
      .select(col("cand_id"), col("cosine"))
    val vecs = emb.select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .join(pool.select(col("cand_id").as("__id")), Seq("__id"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val cands = pool.collect()
      .map(r => (r.getLong(0), r.getDouble(1))) // (id, rel) rel rounded 6
    // EXACT integer election space: 6-rounded scores in micro-units, the
    // MMR combination in tenth-micro units — the λ·rel − (1−λ)·sim
    // lattice lands exactly on half-rounding boundaries, where double
    // re-rounding would flip between engines; integers cannot
    def microRound(x: Double): Long = math.round(x * 1e6)
    def cosMicro(a: Array[Double], b: Array[Double]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      microRound(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val selected = collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    val remaining = collection.mutable.LinkedHashMap(cands: _*)
    for (_ <- 1 to selectK) {
      val scoredStep = remaining.toSeq.map { case (id, rel) =>
        val maxSimMicro =
          if (selected.isEmpty) 0L
          else selected.map(s => cosMicro(vecs(id), vecs(s._1))).max
        val mmrE7 = lambdaTenths * microRound(rel) -
          (10 - lambdaTenths) * maxSimMicro
        (id, rel, mmrE7)
      }
      val best = scoredStep.minBy { case (id, _, mmr) => (-mmr, id) }
      selected += best
      remaining.remove(best._1)
    }
    import spark.implicits._
    selected.zipWithIndex.map { case ((id, rel, mmrE7), i) =>
      (i + 1L, id, rel, mmrE7)
    }.toSeq.toDF("pick", idCol, "relevance", "mmr_score_e7")
      .orderBy("pick")
  }

  /** Seed centroids: the first `n` vectors by id, collected as the
    * bounded codebook array (n rows — the trainCodebook sample posture,
    * never corpus-sized). Seeds instead of a fitted codebook keep oracle
    * replays exact — DuckDB re-derives the identical centroids from the
    * same rows; production swaps in [[trainCodebook]] without changing
    * any downstream plumbing.
    */
  def seedCentroids(emb: DataFrame, idCol: String, vecCol: String,
                    n: Int): Array[Array[Double]] = {
    require(n >= 1 && n <= 4096, s"seedCentroids: n in [1, 4096] (got $n)")
    emb.filter(col(idCol) < n).orderBy(idCol)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
  }

  /** The distinct coarse cells a bounded query set probes — the literal
    * list for a partition-pruning predicate over a cell-partitioned
    * serving index (one row per PROBE cell; the collect is query-set
    * bounded, ≤ |queries|).
    */
  def probeCells(queries: DataFrame, cellCol: String): Array[Int] =
    queries.select(col(cellCol)).distinct().collect().map(_.getInt(0))

  /** IVF-style bucketed ANN: candidates restricted to the query's coarse
    * cell (`cellCol`). Same output shape as brute force; recall < 1 by
    * construction, cost ∝ cell size instead of corpus size.
    */
  def topKIvf(queries: DataFrame, candidates: DataFrame, idCol: String,
              vecCol: String, cellCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(cellCol).as("cell"))
    val c = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      col(cellCol).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"), col("cand_id"),
        round(col("cos"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** L2-normalized copy of the embedding column (zero vectors pass through
    * unchanged rather than dividing by zero — ANSI-safe).
    */
  def l2Normalize(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = d(col(vecCol))
    emb.select(col(idCol), v.as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn("nvec",
        when(col("nrm") =!= 0.0, transform(col("v"), _ / col("nrm")))
          .otherwise(col("v")))
      .select(col(idCol), col("nvec"))
  }

  /** Per-vector symmetric int8 quantization: scale = max |component|,
    * q_i = round(127·x_i / scale) — the storage layout that cuts an
    * embedding corpus 4× (float32 → int8 + one float scale) and lets ANN
    * first-pass scoring run on integer dot products. Zero vectors quantize
    * to zeros with scale 0.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = d(col(vecCol))
    emb.select(col(idCol), v.as("v"))
      .withColumn("scale", array_max(transform(col("v"), abs(_))))
      .withColumn("qvec",
        when(col("scale") =!= 0.0,
          transform(col("v"), x => round(x * lit(127.0) / col("scale")).cast("int")))
        .otherwise(transform(col("v"), _ => lit(0))))
      .select(col(idCol), col("scale"), col("qvec"))
  }

  /** ANN top-k over the int8-quantized corpus: integer dot product
    * rescaled by the two quantization scales approximates the raw dot
    * (for L2-normalized inputs, the cosine). Ranking uses the ROUNDED
    * score with an id tiebreak so results are engine-independent. The
    * 100 TB first-pass: 4× less scan bandwidth, integer multiply-adds,
    * exact re-scoring only for the survivors.
    */
  def topKQuantized(queries: DataFrame, candidates: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    val q = quantizeInt8(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("scale").as("sq"), col("qvec").as("qq"))
    val c = quantizeInt8(candidates, idCol, vecCol)
      .select(col(idCol).as("cand_id"), col("scale").as("sc"), col("qvec").as("qc"))
    val dotq = aggregate(
      zip_with(col("qq"), col("qc"), (x, y) => (x * y).cast("long")),
      lit(0L), _ + _)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("qcos",
        round(dotq.cast("double") * col("sq") * col("sc") / lit(16129.0), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("qcos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Train an IVF coarse-quantizer codebook on a BOUNDED deterministic
    * sample, driver-side — the FAISS architecture: codebook training cost
    * is fixed by `sampleCap` regardless of corpus size (the sample is a
    * hash-ordered top-`sampleCap`, one distributed TakeOrdered), Lloyd's
    * runs in microseconds locally, and the resulting centroids ship to
    * executors inside the `NearestCentroid` expression. Contrast with
    * fitting distributed KMeans on the full corpus: 10+ full-scan jobs to
    * learn 8 cells nobody needs at full precision.
    *
    * Deterministic end to end: hash-ordered sample (ties broken by id),
    * seeded init, lowest-index tie-break in assignment; empty cells keep
    * their previous centroid.
    */
  /** Bounded deterministic training sample: hash-ordered top-`sampleCap`
    * (one distributed TakeOrdered, ties broken by id). The hash is the
    * md5 60-bit fold of the STRINGIFIED id — one SQL expression any
    * engine replays (`('0x'||substr(md5(id::VARCHAR),1,15))::BIGINT`),
    * replacing the xxhash64 order no oracle could reproduce. Vectors are
    * committed to the 1e-6 integer lattice on collection, so every
    * downstream trainer step is exact integer arithmetic.
    */
  private def collectSampleLat(emb: DataFrame, idCol: String,
                               vecCol: String,
                               sampleCap: Int): Array[Array[Long]] = {
    val hashCol = conv(substring(md5(col(idCol).cast("string")), 1, 15),
      16, 10).cast("long")
    val sample = emb
      .select(col(vecCol).cast("array<double>").as("v"))
      .orderBy(hashCol, col(idCol))
      .limit(sampleCap)
      .collect()
      .map(_.getSeq[Double](0).toArray.map(latCommit))
    require(sample.nonEmpty, "empty corpus")
    sample
  }

  /** 1e-6 lattice commit, half away from zero — the exact twin of
    * DuckDB `CAST(round(x * 1000000.0, 0) AS BIGINT)` (and Spark
    * `round(x*1e6, 0)`); bounded so squared distances can never
    * overflow a signed 64-bit (64 dims × (2·1.8e8)² < 2^63).
    */
  private def latCommit(v: Double): Long = {
    val l = BigDecimal(v * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    require(math.abs(l) <= 180000000L,
      s"codebook lattice bound: |component| <= 180 (got ${v})")
    l
  }

  /** Round-half-away-from-zero of the exact rational s/n (n > 0) using
    * only TRUNCATING integer division — the semantics both JVM `/` and
    * DuckDB `//` share, so the oracle replays it verbatim.
    */
  private def halfAwayDiv(s: Long, n: Long): Long =
    if (s >= 0L) (2L * s + n) / (2L * n) else -((2L * -s + n) / (2L * n))

  /** Deterministic INTEGER-EXACT local Lloyd's on the 1e-6 lattice:
    * init = greedy maximin over the hash-ordered lattice
    * sample (replacing the seeded shuffle no SQL engine could replay),
    * assignment = exact
    * integer squared-L2 argmin with lowest-index tie-break, update =
    * component sums in exact longs with the new centroid rounded back to
    * the lattice (half away from zero via truncating division — the
    * shared JVM/DuckDB semantics), empty cells keep their previous
    * centroid. Every step is integer arithmetic a SQL oracle replays
    * verbatim and is order-independent (integer sums commute), which is
    * what moves the PQ/IVF codebook queries onto full hash oracles —
    * the WordPiece/unigram bounded-deterministic-trainer discipline.
    * Returned centroids are the lattice values over 1e6 (exact doubles
    * both engines produce as `CAST(m AS DOUBLE) / 1000000.0`).
    */
  private def lloyds(sample: Array[Array[Long]], nCells: Int,
                     iters: Int): Array[Array[Double]] = {
    val dim = sample(0).length
    val k = math.min(nCells, sample.length)
    // greedy MAXIMIN init: c_0 = the first hash-ordered sample point, then
    // each next centroid is the point farthest (exact integer squared-L2)
    // from the chosen set, lowest sample rank on ties — deterministic,
    // better-spread than a random pick (first-k and stride inits both
    // measured PQ recall 0.16 vs maximin's 0.22 on the spec fixture), and
    // replayable as k−1 argmax CTE steps in the oracle
    val n = sample.length
    val chosen = new Array[Int](k)
    chosen(0) = 0
    // incremental maximin: keep each point's min squared-L2 to the chosen
    // set and refresh it against only the NEWEST centroid — O(k·n·dim)
    // instead of the O(k²·n·dim) re-scan (round 12: the re-scan owned the
    // kCodes=512 recall-config tail at ~4 s of driver time per query);
    // the argmax election and its lowest-rank tiebreak are unchanged, so
    // the selection — and the oracle replay — is bit-identical
    val dmins = new Array[Long](n)
    java.util.Arrays.fill(dmins, Long.MaxValue)
    var picked = 1
    while (picked < k) {
      val cv = sample(chosen(picked - 1))
      var best = -1
      var bd = -1L
      var idx = 0
      while (idx < n) {
        val x = sample(idx)
        var d2 = 0L; var i = 0
        while (i < x.length) { val dd = x(i) - cv(i); d2 += dd * dd; i += 1 }
        if (d2 < dmins(idx)) dmins(idx) = d2
        if (dmins(idx) > bd) { bd = dmins(idx); best = idx }
        idx += 1
      }
      chosen(picked) = best
      picked += 1
    }
    val centroids = Array.tabulate(k)(j => sample(chosen(j)).clone())
    val assign = new Array[Int](n)
    java.util.Arrays.fill(assign, -1)
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val sums = Array.ofDim[Long](k, dim)
      val counts = new Array[Long](k)
      var changed = false
      var p = 0
      while (p < n) {
        val v = sample(p)
        var best = 0; var bestDist = Long.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0L; var i = 0
          while (i < dim) { val d = v(i) - centroids(c)(i); dist += d * d; i += 1 }
          if (dist < bestDist) { bestDist = dist; best = c }
          c += 1
        }
        if (assign(p) != best) { assign(p) = best; changed = true }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
        p += 1
      }
      // assignment fixpoint ⇒ identical sums/counts ⇒ identical centroids
      // forever: stopping here is VALUE-IDENTICAL to running the fixed
      // iteration budget (the oracle's 20 materialized CTE steps keep
      // producing the same table), it just stops paying for no-op passes
      converged = !changed
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dim) {
            centroids(c)(i) = halfAwayDiv(sums(c)(i), counts(c)); i += 1
          }
        }
        c += 1
      }
      it += 1
    }
    centroids.map(_.map(_.toDouble / 1e6))
  }

  def trainCodebook(emb: DataFrame, idCol: String, vecCol: String,
                    nCells: Int, sampleCap: Int = 4096,
                    iters: Int = 20): Array[Array[Double]] =
    lloyds(collectSampleLat(emb, idCol, vecCol, sampleCap), nCells, iters)

  /** Product-quantization codebooks: the vector is cut into `m` equal
    * subvectors and each subspace gets its own `kCodes`-centroid codebook
    * (trained on the same bounded sample, sliced). Storage per vector
    * drops from dim floats to m small ints — with m=8, k=16 that is a
    * 64-dim float32 vector in 8 nibbles. Same bounded-cost training
    * posture as [[trainCodebook]].
    */
  def trainPqCodebooks(emb: DataFrame, idCol: String, vecCol: String,
                       m: Int, kCodes: Int = 16, sampleCap: Int = 4096,
                       iters: Int = 20): Array[Array[Array[Double]]] = {
    val sample = collectSampleLat(emb, idCol, vecCol, sampleCap)
    val dim = sample(0).length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    Array.tabulate(m) { s =>
      val sub = sample.map(_.slice(s * subDim, (s + 1) * subDim))
      lloyds(sub, kCodes, iters)
    }
  }

  /** Encode every vector as its `m` per-subspace code indices (the PQ
    * compressed representation) via broadcast `NearestCentroid` on each
    * slice — a narrow map, no shuffle.
    */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
               codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val subDim = codebooks(0)(0).length
    val v = d(col(vecCol))
    val codes = array(codebooks.indices.map { s =>
      graft.functions.Native.nearest_centroid(
        slice(v, s * subDim + 1, subDim), codebooks(s))
    }: _*)
    emb.select(col(idCol), codes.as("pq_codes"))
  }

  /** PQ ANN with asymmetric-distance scoring: the query vector stays
    * exact; each candidate is reconstructed from its codes
    * (`PqReconstruct`) and scored by cosine. The 100 TB shape: the scan
    * reads m-byte codes instead of dim floats (16-32× less bandwidth than
    * raw, 4-8× less than int8), reconstruction is a broadcast-codebook
    * lookup, and exact re-scoring runs only on the survivors.
    */
  def topKPq(queries: DataFrame, candidates: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8,
             kCodes: Int = 16): DataFrame = {
    val codebooks = trainPqCodebooks(candidates, idCol, vecCol, m, kCodes)
    val encoded = pqEncode(candidates, idCol, vecCol, codebooks)
      .select(col(idCol).as("cand_id"),
        graft.functions.Native.pq_reconstruct(col("pq_codes"), codebooks)
          .as("rv"))
    val q = queries.select(col(idCol).as("query_id"), d(col(vecCol)).as("qv"))
    // rank on the UNROUNDED ADC score (same semantics as topKBruteForce,
    // so lossless-codebook configurations reproduce brute force exactly —
    // the x_pq_recall oracle); round only for display
    val scored = encoded.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("qcos_raw", cosine(col("qv"), col("rv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos_raw").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("qcos_raw"), 6).as("qcos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Learned IVF ANN: bounded-sample codebook (above) assigns both the
    * corpus and the (possibly unseen) probe vectors to coarse cells via the
    * broadcast `NearestCentroid` expression; search is cell-local
    * (`topKIvf`). The 100 TB shape: one TakeOrdered for the sample, one
    * narrow map for assignment, one keyed equi-join for search.
    */
  def learnedIvf(emb: DataFrame, idCol: String, vecCol: String,
                 queries: DataFrame, k: Int, nCells: Int): DataFrame =
    learnedIvfMultiProbe(emb, idCol, vecCol, queries, k, nCells, nProbe = 1)

  /** Multi-probe learned IVF: each query searches its `nProbe` NEAREST
    * cells instead of one — the standard FAISS recall knob. Corpus rows
    * keep their single nearest-cell assignment; the query side explodes
    * onto its probe cells (query sets are small/broadcast, so the fan-out
    * is on the cheap side of the join) and the per-query rank dedupes
    * across probed cells. Cost ∝ nProbe·cellSize per query; recall climbs
    * toward brute force as nProbe → nCells (SimilaritySpec pins both
    * directions).
    */
  def learnedIvfMultiProbe(emb: DataFrame, idCol: String, vecCol: String,
                           queries: DataFrame, k: Int, nCells: Int,
                           nProbe: Int): DataFrame = {
    val cb = trainCodebook(emb, idCol, vecCol, nCells)
    val corpus = emb.select(col(idCol), col(vecCol),
      graft.functions.Native.nearest_centroid(col(vecCol), cb).as("cell"))
    val probed = queries.select(col(idCol), col(vecCol),
        explode(graft.functions.Native.nearest_centroids(col(vecCol), cb,
          nProbe)).as("cell"))
    topKIvf(probed, corpus, idCol, vecCol, "cell", k)
  }

  /** IVF-PQ: the full FAISS layout — a coarse learned-cell index bounds
    * WHICH candidates each query scores (nProbe nearest cells), and PQ
    * codes bound the BANDWIDTH of scoring them (m small ints per vector,
    * asymmetric-distance reconstruction at the scan). Corpus side is one
    * narrow projection (cell + codes), query side explodes onto its probe
    * cells, search is a cell-keyed equi-join. Both codebooks train on the
    * same bounded deterministic sample. Exactness is approximate twice
    * over (cell pruning + code quantization) — SimilaritySpec pins
    * determinism and recall against brute force.
    */
  def topKIvfPq(emb: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, k: Int, nCells: Int, nProbe: Int = 2,
                m: Int = 8, kCodes: Int = 16): DataFrame = {
    val cells = trainCodebook(emb, idCol, vecCol, nCells)
    val pq = trainPqCodebooks(emb, idCol, vecCol, m, kCodes)
    val subDim = pq(0)(0).length
    val v = d(col(vecCol))
    val codes = array(pq.indices.map { s =>
      graft.functions.Native.nearest_centroid(
        slice(v, s * subDim + 1, subDim), pq(s))
    }: _*)
    val corpus = emb.select(col(idCol).as("cand_id"),
        graft.functions.Native.nearest_centroid(v, cells).as("cell"),
        graft.functions.Native.pq_reconstruct(codes, pq).as("rv"))
    val q = queries.select(col(idCol).as("query_id"), v.as("qv"),
      explode(graft.functions.Native.nearest_centroids(v, cells, nProbe))
        .as("cell"))
    // unrounded ranking, as in topKPq: at nProbe = nCells with a lossless
    // codebook this must reproduce brute force (the x_ivfpq_recall oracle)
    val scored = corpus.join(broadcast(q), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("qcos_raw", cosine(col("qv"), col("rv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos_raw").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("qcos_raw"), 6).as("qcos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** SemDeDup — semantic deduplication over the embedding corpus (the
    * cluster-then-prune recipe of Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * every vector is assigned to its nearest centroid (broadcast codebook,
    * narrow map — the IVF assignment reused), pairwise cosine runs only
    * WITHIN a cell, and a vector is dropped when a more-senior (lower-id)
    * cell-mate sits at or above the similarity threshold. Emits the full
    * per-vector audit (id, cell, kept) rather than just the survivors, so
    * the drop decision itself is oracle-checkable.
    *
    * Deterministic: assignment ties break to the lowest centroid index,
    * the drop rule keys on ids, and the threshold compares the ROUNDED
    * cosine (same 6-decimal convention as [[cosineNearDups]]) so replays
    * are engine-independent.
    *
    * Scale shape: no all-pairs anything — the pair space is Σ cellSize²,
    * controlled by the codebook size exactly as in the paper (cells ≈
    * corpus/5k at web scale); assignment is one narrow projection, the
    * drop election is a distinct + a join on the (small) dropped-id set.
    * Centroids come from [[trainCodebook]] in production; the registry
    * query uses seed centroids (the first k vectors) so DuckDB can replay
    * the whole decision without Lloyd's.
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               centroids: Array[Array[Double]], tau: Double): DataFrame = {
    val assigned = emb.select(col(idCol), col(vecCol),
      graft.functions.Native.nearest_centroid(d(col(vecCol)), centroids)
        .as("cell"))
    val dropped = cosineNearDups(assigned, idCol, vecCol, "cell", tau)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("dup", lit(true))
    assigned
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("dup").isNull.as("kept"))
      .orderBy(col(idCol))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, via the IVF
    * cells to bound the pair space (id_a < id_b).
    */
  def cosineNearDups(emb: DataFrame, idCol: String, vecCol: String,
                     cellCol: String, threshold: Double): DataFrame = {
    val l = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col(cellCol).as("cell"))
    val r = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col(cellCol).as("cell"))
    l.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("cell"), col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding-space outlier report — the top-k vectors FARTHEST from
    * their group's centroid (cosine distance), per group: the mislabeled-
    * sample / noisy-caption screen for labeled embedding corpora (prune
    * before contrastive training, audit before clustering). Distances are
    * rounded at 6 BEFORE ranking (the g_weighted_sample election idiom)
    * so the per-group top-k is reproducible cross-engine.
    *
    * Centroids: explode to (group, dim-pos, component) → ONE avg shuffle
    * bounded by |groups|·dim → rebuilt arrays broadcast back (|groups|
    * rows). Ranking is a group-local window; k bounds the output. The
    * embedding column shuffles ONCE (the explode); at 100 TB the explode
    * carries (row × dim) narrow doubles with map-side partial avg — no
    * all-pairs anything.
    */
  def centroidOutliers(emb: DataFrame, idCol: String, vecCol: String,
                       groupCol: String, k: Int): DataFrame = {
    require(k >= 1, s"centroidOutliers: k >= 1 (got $k)")
    val cents = emb
      .select(col(groupCol), posexplode(d(col(vecCol))).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos")).agg(avg("v").as("c"))
      .groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col(groupCol), transform(col("pc"), x => x("c")).as("__cent"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cos_dist").desc, col(idCol).asc)
    emb.join(broadcast(cents), Seq(groupCol))
      .withColumn("cos_dist",
        round(lit(1.0) - cosine(d(col(vecCol)), col("__cent")), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(idCol), col(groupCol), col("cos_dist"))
      .orderBy(col(groupCol), col(idCol))
  }

  /** Embedding-space drift between two corpus slices (reference vs
    * current — yesterday's crawl vs today's, train vs serve): per
    * dimension, the two centroid components and their shift, plus the
    * global centroid cosine and L2 shift — the embedding analogue of
    * [[graft.ops.Drift.distributionSummary]], catching encoder or corpus
    * drift that scalar feature monitors miss.
    *
    * ONE pass: explode to (slice, dim, component) and aggregate both
    * slices' per-dimension means in the same shuffled aggregation
    * (conditional avg — no second scan, no join of two aggregates). The
    * shuffle key is the dimension index (≤ a few thousand groups) with
    * map-side partial avg, so the corpus-sized explode never lands in one
    * task. Global metrics (cosine of centroids, L2 of the shift vector)
    * fold over the DIM-bounded frame via an empty-partition window —
    * bounded per the PLANS.md global-window contract.
    */
  def embeddingDrift(emb: DataFrame, vecCol: String,
                     isRef: Column): DataFrame = {
    val exploded = emb
      .select(isRef.as("__ref"), posexplode(d(col(vecCol))).as(Seq("dim", "comp")))
    val perDim = exploded
      .groupBy(col("dim"))
      .agg(
        avg(when(col("__ref"), col("comp"))).as("ref_mean"),
        avg(when(!col("__ref"), col("comp"))).as("cur_mean"))
      .withColumn("shift", col("cur_mean") - col("ref_mean"))
    val all = Window.partitionBy()
    perDim
      .withColumn("centroid_cosine",
        round(sum(col("ref_mean") * col("cur_mean")).over(all) /
          (sqrt(sum(col("ref_mean") * col("ref_mean")).over(all)) *
           sqrt(sum(col("cur_mean") * col("cur_mean")).over(all))), 6))
      .withColumn("l2_shift",
        round(sqrt(sum(col("shift") * col("shift")).over(all)), 6))
      .select(col("dim"),
        round(col("ref_mean"), 6).as("ref_mean"),
        round(col("cur_mean"), 6).as("cur_mean"),
        round(col("shift"), 6).as("shift"),
        col("centroid_cosine"), col("l2_shift"))
      .orderBy("dim")
  }

  /** Simplified (centroid-based) silhouette per cluster label — the
    * cluster-quality readout for an embedding partition: per vector,
    * a = cosine distance to its OWN label centroid, b = distance to the
    * NEAREST other centroid, s = (b − a) / max(a, b); reported per label
    * as mean a / mean b / mean silhouette. Positive ≈ separated cluster,
    * ≈0 = boundary, negative = misassigned. The centroid form is the
    * standard scalable variant — per-point work is |labels| distances,
    * not the O(n²) pairwise silhouette.
    *
    * Plan: centroids from ONE explode + (label, dim) aggregation (both
    * stages bounded by |labels|·dim after the shuffle); each vector then
    * meets the |labels|-row broadcast centroid table, and the per-label
    * fold is the final bounded aggregation. Labels with a single cluster
    * (no "other" centroid) yield NULL b and NULL silhouette.
    */
  def silhouette(emb: DataFrame, idCol: String, vecCol: String,
                 labelCol: String): DataFrame = {
    val cent = emb
      .select(col(labelCol).as("__cl"),
        posexplode(d(col(vecCol))).as(Seq("__dim", "__comp")))
      .groupBy(col("__cl"), col("__dim"))
      .agg(avg(col("__comp")).as("__m"))
      .groupBy(col("__cl"))
      .agg(array_sort(collect_list(struct(col("__dim"), col("__m"))))
        .as("__sm"))
      .select(col("__cl"),
        transform(col("__sm"), s => s.getField("__m")).as("__cv"))
    val dist = emb
      .select(col(idCol), col(labelCol).as("__lab"), d(col(vecCol)).as("__v"))
      .crossJoin(broadcast(cent))
      .withColumn("__dist", lit(1.0) - cosine(col("__v"), col("__cv")))
    dist
      .groupBy(col(idCol), col("__lab"))
      .agg(min(when(col("__cl") === col("__lab"), col("__dist"))).as("__a"),
        min(when(col("__cl") =!= col("__lab"), col("__dist"))).as("__b"))
      .withColumn("__s",
        when(greatest(col("__a"), col("__b")) > 0,
          (col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
          .otherwise(when(col("__b").isNotNull, lit(0.0))))
      .groupBy(col("__lab").as("label"))
      .agg(count(lit(1)).as("n_vectors"),
        round(avg(col("__a")), 6).as("mean_intra"),
        round(avg(col("__b")), 6).as("mean_nearest_other"),
        round(avg(col("__s")), 6).as("mean_silhouette"))
      .orderBy("label")
  }

  /** Item-item collaborative filtering — top-k neighbors per item by
    * co-occurrence cosine over user baskets ("customers who bought X
    * also bought Y"), the classic implicit-feedback recommender that
    * needs no embeddings at all: sim(i,j) = c_ij / √(c_i·c_j) where
    * c_ij counts users holding both.
    *
    * Scale posture — the pair space is the hazard, bounded twice by
    * construction (the LSH maxDf discipline):
    *   1. `maxBasket` DROPS power users before the self-join: a user
    *      with B items mints B²/2 pairs, so the join is bounded at
    *      users·maxBasket² regardless of skew (power users carry
    *      near-zero signal per pair — the standard implicit-CF cut);
    *   2. `minDf`/`maxDf` drop one-off items (no pairable evidence)
    *      and ubiquitous items (co-occur with everything, recommend
    *      nothing) before pairs form.
    * Counts c_i are re-measured AFTER both cuts so the cosine is
    * internally consistent with the pair counts. All counts are exact
    * longs; the cosine double is the same tree in both engines, and
    * the per-item top-k window breaks ties (cosine, then co-count)
    * deterministically by neighbor id.
    *
    * Plan: distinct → keyed basket-size window → keyed self-join on
    * the user → pair aggregation → two keyed df joins → per-item
    * top-k window. Every exchange is keyed; no global sort, no
    * cartesian (the self-join is an equi-join on the user key).
    */
  /** Shared basket prep for the CF family: distinct (user, item), power
    * users past `maxBasket` dropped BEFORE pairs can form, items outside
    * [minDf, maxDf] dropped, df re-measured after both cuts. Returns
    * (kept(__u, __i, __df), dfs(__i, __df)).
    */
  private def cfKept(interactions: DataFrame, userCol: String,
                     itemCol: String, minDf: Int, maxDf: Int,
                     maxBasket: Int): (DataFrame, DataFrame) = {
    require(minDf >= 1 && maxDf >= minDf,
      s"itemItemCF: need 1 <= minDf <= maxDf (got $minDf..$maxDf)")
    require(maxBasket >= 2 && maxBasket <= 4096,
      s"itemItemCF: maxBasket in [2, 4096] bounds the pair space " +
        s"(got $maxBasket)")
    // one user-keyed exchange serves BOTH the (u, i) dedup and the
    // basket-size window: clustering by __u alone satisfies the
    // aggregate's (u, i) distribution (same key ⇒ same partition) and
    // the window's partitionBy — `.distinct()` instead planned its own
    // (u, i) exchange and then a SECOND user exchange for the window
    // (measured 1.4 vs 1.0 s warm at sf0.1, one exchange fewer per side)
    val ui = interactions
      .select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .filter(col("__u").isNotNull && col("__i").isNotNull)
      .repartition(col("__u"))
      .dropDuplicates("__u", "__i")
    val capped = ui
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy(col("__u"))))
      .filter(col("__bsz") <= maxBasket)
      .drop("__bsz")
    val dfs = capped.groupBy(col("__i"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf && col("__df") <= maxDf)
    (capped.join(dfs, Seq("__i")), dfs)
  }

  /** The pinned (item, user, df) capped-basket frame both CF builds
    * start from — public so the registry can materialize it ONCE per
    * corpus (the derived-table posture: in production the capped
    * interaction table is rebuilt on a schedule and read by every CF
    * job) and hand it to [[itemItemCF]] and [[itemItemCFLshPairs]] via
    * their `keptPinned` parameter instead of each re-running the
    * dedup / basket-cap / df chain (~3 s of each build's wall at sf0.1).
    */
  def cfKeptPinned(interactions: DataFrame, userCol: String,
                   itemCol: String, minDf: Int, maxDf: Int,
                   maxBasket: Int): DataFrame =
    cfKept(interactions, userCol, itemCol, minDf, maxDf, maxBasket)._1
      .localCheckpoint()

  def itemItemCF(interactions: DataFrame, userCol: String,
                 itemCol: String, minDf: Int = 2, maxDf: Int = 100000,
                 maxBasket: Int = 256, k: Int = 10,
                 pairBudget: Long = 200000000L,
                 keptPinned: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && k <= 100, s"itemItemCF: k in [1, 100] (got $k)")
    require(pairBudget >= 1L, s"itemItemCF: pairBudget >= 1 (got $pairBudget)")
    // user-keyed pair self-join: Catalyst reuses the identical exchange
    // under both sides, so the distinct+cap+df chain computes once (a
    // basket-array HOF-explode variant was measured 2.2× SLOWER —
    // interpreted lambdas per pair vs the codegen'd join). The pair
    // grain is Σ per-user basket², the inherent cost of exact item-CF;
    // maxBasket / minDf / maxDf are the knobs that bound it, and at
    // corpus scale the standard extra cut is a minimum co-count.
    // Exchange reuse covers only the self-join's two sides — the
    // pair-budget guard action and the two df scoring joins each re-ran
    // the whole chain, so pin it once and re-derive dfs from the pinned
    // frame (round 12, same fix as the LSH build); a registry-cached
    // pin arrives via keptPinned and skips the build entirely.
    val kept = keptPinned.getOrElse(
      cfKept(interactions, userCol, itemCol, minDf, maxDf, maxBasket)
        ._1.localCheckpoint())
    val dfs = kept.select(col("__i"), col("__df")).distinct()
    // fail-loud pair-budget guard: measure Σ basket·(basket−1)/2 with one
    // cheap keyed aggregate BEFORE the self-join launches — an over-budget
    // corpus raises a clean error naming the knobs instead of running an
    // unbounded-spill job to ENOSPC (the measured 100× failure mode:
    // 1.27 B pairs exhausted ~80 GB spill disk — BENCH.md itemcf10).
    val estPairs = kept.groupBy(col("__u"))
      .agg(count(lit(1)).as("__b"))
      .agg(coalesce(sum(col("__b").cast("decimal(38,0)") *
          (col("__b") - lit(1L))),
        lit(0L).cast("decimal(38,0)")).as("__p2"))
      .head().getDecimal(0)
      .divide(java.math.BigDecimal.valueOf(2))
    require(estPairs.compareTo(
        java.math.BigDecimal.valueOf(pairBudget)) <= 0,
      s"itemItemCF: exact pair grain = $estPairs pairs exceeds " +
        s"pairBudget=$pairBudget — tighten maxBasket/minDf/maxDf, raise " +
        "pairBudget deliberately, or use the bucketed itemItemCFLsh " +
        "build (propose-then-verify, the scale-safe alternative)")
    val pairs = kept.select(col("__u"), col("__i")).as("a")
      .join(kept.select(col("__u"), col("__i")).as("b"),
        col("a.__u") === col("b.__u") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("__ia"), col("b.__i").as("__ib"))
      .agg(count(lit(1)).as("n_co"))
    val sym = pairs.select(col("__ia").as("item"),
        col("__ib").as("neighbor"), col("n_co"))
      .unionByName(pairs.select(col("__ib").as("item"),
        col("__ia").as("neighbor"), col("n_co")))
    val scored = sym
      .join(dfs.select(col("__i").as("item"), col("__df").as("df_item")),
        Seq("item"))
      .join(dfs.select(col("__i").as("neighbor"),
        col("__df").as("df_neighbor")), Seq("neighbor"))
      .withColumn("cosine",
        round(col("n_co").cast("double") /
          sqrt(col("df_item").cast("double") * col("df_neighbor")), 6))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("item"))
        .orderBy(col("cosine").desc, col("n_co").desc,
          col("neighbor").asc)))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("neighbor"), col("n_co"),
        col("df_item"), col("df_neighbor"), col("cosine"))
      .orderBy(col("item"), col("rank"))
  }

  /** MinHash-LSH bucketed item-CF pairs — the 100 TB escape from the
    * exact pair grain. [[itemItemCF]]'s self-join mints Σ basket² pairs
    * (12.7 M at sf0.1, BENCH.md's documented inherent cost); here the
    * pair space is PROPOSED instead: each item's USER SET gets a
    * `numHashes`-component MinHash signature (per-component min of the
    * minstd-u01 of the quadratic key — an aggregation on the item key,
    * one shuffle, map-side combined), signatures band into slim (id, band,
    * bucket) rows ([[Dedup.bandBuckets]]), and only bucket-colliding
    * pairs are VERIFIED with exact co-counts (a candidate-keyed join —
    * never all pairs). Emitted pairs carry exact n_co/df/cosine, so
    * every survivor is EXACT; only recall is probabilistic: a pair with
    * user-set Jaccard J is proposed with 1-(1-J^rows)^bands, and
    * cosine ≥ minCosine bounds J from below through the df caps
    * (cos ≥ τ forces df_a/df_b ≤ 1/τ² and J ≥ τ·√(ab)/(a+b-τ√(ab))).
    * Identical user sets (J = 1) are proposed ALWAYS — every band
    * agrees — which is the provable MUST-FIND the x_item_cf_lsh_twins
    * anchor pins with a full hash oracle (the x_simhash_recall
    * pattern).
    *
    * Both directions of each pair are emitted (the [[itemItemCF]]
    * symmetric shape).
    */
  /** The MinHash signature table over a capped-basket frame (`__i`,
    * `__u`, …) — one row per item, `numHashes` per-component min
    * columns `__mh0..`. Extracted from [[itemItemCFLshPairs]] (round 13)
    * so the signature store can be materialized ONCE per corpus and
    * handed to each consumer via `sigPinned` — the production posture
    * (an LSH signature table is a persisted artifact, rebuilt with the
    * basket table, read by every candidate-generation job).
    *
    * Permutation family h_j(u) = minstd-u01 of the QUADRATIC key
    * (u + j·1000003)² mod M — nonlinear in u per j (the hashPoints
    * diagonal-line lesson: an affine family would give near-identical
    * argmin users across permutations), and one exact BIGINT expression
    * any engine replays — which is what makes this LSH build FULLY
    * oracle-checkable. The key is reduced mod M BEFORE squaring
    * (pmod(k,M)² < 2⁶²), so the product never overflows a signed 64-bit
    * at ANY key range in either engine. All `numHashes` per-component
    * mins fold in ONE item-keyed aggregation with parallel min columns
    * (round 12 — replaces an explode to (interaction × numHashes) rows;
    * the per-(i, j) min expression is unchanged, so signatures — and
    * the oracle replay — are bit-identical).
    */
  def cfSignatures(kept: DataFrame, numHashes: Int): DataFrame = {
    val m = lit(2147483647L)
    val sigAggs = (0 until numHashes).map { j =>
      val qm = pmod(col("__u") + lit(j.toLong * 1000003L), m)
      val qk = pmod(qm * qm, m)
      min(floor(Gen.u01(qk, 500L) * m).cast("long")).as(s"__mh$j")
    }
    kept.groupBy(col("__i").as("id"))
      .agg(sigAggs.head, sigAggs.tail: _*)
  }

  def itemItemCFLshPairs(interactions: DataFrame, userCol: String,
                         itemCol: String, minDf: Int = 2,
                         maxDf: Int = 100000, maxBasket: Int = 256,
                         minCosine: Double = 0.5, numHashes: Int = 32,
                         bands: Int = 16,
                         keptPinned: Option[DataFrame] = None,
                         candFilter: Option[Column] = None,
                         sigPinned: Option[DataFrame] = None): DataFrame = {
    require(minCosine > 0.0 && minCosine <= 1.0,
      s"itemItemCFLshPairs: minCosine in (0, 1] (got $minCosine)")
    require(numHashes % bands == 0,
      s"itemItemCFLshPairs: bands must divide numHashes " +
        s"(got $numHashes/$bands)")
    require(numHashes == 2 * bands,
      s"itemItemCFLshPairs: rows-per-band is fixed at 2 " +
        s"(got $numHashes hashes / $bands bands)")
    // kept is consumed five times with DIFFERENT downstream shapes
    // (signature aggregation, both sides of the candidate verify join,
    // and the two df scoring joins) — no exchange reuse applies, so pin
    // the slim (item, user, df) frame once instead of re-running the
    // interaction join + distinct + basket window per consumer
    // (round 12: the recompute, not the signature fold, owned this
    // build's wall time), and re-derive the df table from the PINNED
    // frame (every kept row carries its item's df — identical rows to
    // cfKept's dfs, zero upstream re-execution); a registry-cached pin
    // arrives via keptPinned and skips the build entirely.
    val kept = keptPinned.getOrElse(
      cfKept(interactions, userCol, itemCol, minDf, maxDf, maxBasket)
        ._1.localCheckpoint())
    val dfs = kept.select(col("__i"), col("__df")).distinct()
    // the signature table is itself a persistable artifact (the
    // minhashSigs64 posture for documents): a registry-cached signature
    // store arrives via sigPinned — it MUST be cfSignatures(kept,
    // numHashes) rows for the same kept frame — and skips the fold
    val sig = sigPinned.getOrElse(cfSignatures(kept, numHashes))
    // band b = (h_{2b}, h_{2b+1}) as a VALUE pair — no hash compression,
    // so the bucket key itself replays in SQL; the explode happens at
    // the ITEM grain (items × bands slim rows), never the interaction
    // grain
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b.toLong).as("band"), col(s"__mh${2 * b}").as("v1"),
        col(s"__mh${2 * b + 1}").as("v2"))
    }
    val bandsDf = sig
      .select(col("id"), explode(array(bandStructs: _*)).as("__bb"))
      .select(col("id"), col("__bb.band").as("band"),
        col("__bb.v1").as("v1"), col("__bb.v2").as("v2"))
    // candFilter (over id_a/id_b) restricts the PROPOSED pair set before
    // the exact-verify joins. A caller may pass it only when its own
    // downstream filter provably discards every pair the predicate drops
    // (the x_item_cf_lsh_twins anchor keeps just id_b = id_a + shift:
    // its final `neighbor = item + shift` filter can only be satisfied
    // via the id_a < id_b orientation, so pre-filtering candidates is
    // output-identical while the verify joins see ~#items pairs instead
    // of every natural collision in the doubled corpus).
    val cand = candFilter.foldLeft(
        bandsDf.as("l").join(bandsDf.as("r"),
          col("l.band") === col("r.band") && col("l.v1") === col("r.v1") &&
            col("l.v2") === col("r.v2") && col("l.id") < col("r.id"))
          .select(col("l.id").as("id_a"), col("r.id").as("id_b")))(
        (df, f) => df.filter(f))
      .distinct()
    // exact verification: co-counts for CANDIDATE pairs only (two keyed
    // joins against the capped basket table + a user-equality match)
    val co = cand
      .join(kept.select(col("__i").as("id_a"), col("__u").as("__ua")),
        Seq("id_a"))
      .join(kept.select(col("__i").as("__ib"), col("__u").as("__ub")),
        col("id_b") === col("__ib") && col("__ua") === col("__ub"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_co"))
    val sym = co.select(col("id_a").as("item"), col("id_b").as("neighbor"),
        col("n_co"))
      .unionByName(co.select(col("id_b").as("item"),
        col("id_a").as("neighbor"), col("n_co")))
    sym
      .join(dfs.select(col("__i").as("item"), col("__df").as("df_item")),
        Seq("item"))
      .join(dfs.select(col("__i").as("neighbor"),
        col("__df").as("df_neighbor")), Seq("neighbor"))
      .withColumn("__cos", col("n_co").cast("double") /
        sqrt(col("df_item").cast("double") * col("df_neighbor")))
      .filter(col("__cos") >= minCosine)
      .withColumn("cosine", round(col("__cos"), 6))
      .select(col("item"), col("neighbor"), col("n_co"), col("df_item"),
        col("df_neighbor"), col("cosine"))
  }

  /** The serving-shaped top-k over [[itemItemCFLshPairs]] — the
    * [[itemItemCF]] output contract (item, rank, neighbor, …) on the
    * bucketed pair set, so the two builds are drop-in swappable.
    */
  def itemItemCFLsh(interactions: DataFrame, userCol: String,
                    itemCol: String, minDf: Int = 2,
                    maxDf: Int = 100000, maxBasket: Int = 256,
                    k: Int = 10, minCosine: Double = 0.5,
                    numHashes: Int = 32, bands: Int = 16,
                    keptPinned: Option[DataFrame] = None,
                    sigPinned: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && k <= 100, s"itemItemCFLsh: k in [1, 100] (got $k)")
    itemItemCFLshPairs(interactions, userCol, itemCol, minDf, maxDf,
        maxBasket, minCosine, numHashes, bands, keptPinned,
        sigPinned = sigPinned)
      .withColumn("rank", row_number().over(Window.partitionBy(col("item"))
        .orderBy(col("cosine").desc, col("n_co").desc,
          col("neighbor").asc)))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("neighbor"), col("n_co"),
        col("df_item"), col("df_neighbor"), col("cosine"))
      .orderBy(col("item"), col("rank"))
  }

  /** The serving pass over [[itemItemCF]]'s neighbor table: per user,
    * score every neighbor of every basket item (similarities on the
    * 1e-6 lattice, so the per-candidate sum is an exact long in any
    * fold order), drop items the user already has (anti-join — a
    * recommender that recommends what you own is broken), and keep the
    * top `k` by (score, item) total order.
    *
    * Plan: one keyed join of the basket table against the BOUNDED
    * neighbor table (≤ k rows per item), one (user, candidate)
    * aggregation, one left-anti join, one per-user window over ≤
    * |basket|·k candidate rows. No cross join, no corpus sort.
    */
  def recommendTopK(interactions: DataFrame, userCol: String,
                    itemCol: String, neighbors: DataFrame,
                    k: Int = 5): DataFrame = {
    require(k >= 1 && k <= 100, s"recommendTopK: k in [1,100] (got $k)")
    val ui = interactions
      .select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .filter(col("__u").isNotNull && col("__i").isNotNull)
      .distinct()
    val nb = neighbors.select(col("item").as("__i"),
      col("neighbor").as("__cand"),
      round(col("cosine") * 1e6, 0).cast("long").as("__cl"))
    val cand = ui.join(nb, Seq("__i"))
      .groupBy(col("__u"), col("__cand"))
      .agg(sum(col("__cl")).as("__score"), count(lit(1)).as("n_sources"))
    val owned = ui.select(col("__u"), col("__i").as("__cand"))
    cand.join(owned, Seq("__u", "__cand"), "left_anti")
      .withColumn("rec_rank", row_number().over(
        Window.partitionBy(col("__u"))
          .orderBy(col("__score").desc, col("__cand").asc)))
      .filter(col("rec_rank") <= k)
      .select(col("__u").as(userCol), col("rec_rank"),
        col("__cand").as("rec_item"), col("n_sources"),
        round(col("__score").cast("double") / 1e6, 6).as("score"))
      .orderBy(userCol, "rec_rank")
  }

  /** Recommender-quality scorecard over a [[recommendTopK]] output:
    * catalog coverage (share of the interaction catalog that appears in
    * ANY list — a recommender that only ever surfaces 50 blockbusters
    * scores high on accuracy and useless on discovery), mean list
    * size, and mean novelty −log₂(df/users) of recommended items (high
    * = long-tail surfacing; each item's novelty commits to the 1e-9
    * lattice before the fold).
    *
    * Plan: bounded 1-row folds + one keyed join of the rec list
    * against the item-popularity table; no window.
    */
  def recMetrics(recs: DataFrame, interactions: DataFrame,
                 userCol: String, itemCol: String): DataFrame = {
    val ui = interactions
      .select(col(userCol).as("__u"), col(itemCol).as("__i"))
      .filter(col("__u").isNotNull && col("__i").isNotNull)
      .distinct()
    val pop = ui.groupBy(col("__i")).agg(count(lit(1)).as("__df"))
    val totals = ui.agg(
      countDistinct(col("__u")).as("__nu"),
      countDistinct(col("__i")).as("__cat"))
    val ln2 = log(lit(2.0))
    val scored = recs.select(col("rec_item").as("__i"))
      .join(pop, Seq("__i"))
      .crossJoin(broadcast(totals))
      .select(col("__i"),
        round((lit(0.0) - log(col("__df").cast("double") /
          col("__nu").cast("double")) / ln2) * 1e9, 0).cast("long")
          .as("__novLat"))
    val f = scored.agg(count(lit(1)).as("n_recs"),
      countDistinct(col("__i")).as("n_rec_items"),
      coalesce(sum(col("__novLat")), lit(0L)).as("__ns"))
      .crossJoin(broadcast(totals))
    f.select(col("__nu").as("n_users"), col("__cat").as("catalog_size"),
      col("n_recs"), col("n_rec_items"),
      round(col("n_rec_items").cast("double") /
        col("__cat").cast("double"), 6).as("catalog_coverage"),
      round(when(col("n_recs") > 0, col("__ns").cast("double") /
        (lit(1e9) * col("n_recs").cast("double"))), 6).as("mean_novelty"))
  }
}
