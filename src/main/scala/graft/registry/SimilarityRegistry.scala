package graft
package registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import Shared._

/** SURVEY §7.4 similarity search and multimodal columns.
  *
  * One domain slice of the query registry (split out of SparkEntry in
  * round 8 — wiring only, no behavior change; [[graft.SparkEntry]]
  * assembles and uniqueness-checks the full map).
  */
object SimilarityRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §7.4 similarity search --------------------------------------------
    "x_vector_stats" -> ((s, dir) =>
      Similarity.vectorStats(Tables.embeddings(s, dir), "vec_id", "embedding")),
    "x_knn_bruteforce" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.topKBruteForce(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", 3)
    }),
    "x_diverse_sample" -> ((s, dir) =>
      // structure-aware downsample: 5 seeded picks per Lloyd cell —
      // every region of embedding space stays represented
      Clustering.diverseSample(Tables.embeddings(s, dir), "vec_id",
        "embedding", k = 8, iterations = 3, perCell = 5)),
    "x_hard_negatives" -> ((s, dir) =>
      // contrastive-training curation: the 3 nearest WRONG-label
      // vectors per probe — the boundary-defining negatives
      Similarity.hardNegatives(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label", col("vec_id") < 5, k = 3)),
    "x_knn_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.topKIvf(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", "label", 3)
    }),
    "x_knn_learned_ivf" -> ((s, dir) => {   // FULL oracle: lattice Lloyd's replay
      val emb = Tables.embeddings(s, dir)
      Similarity.learnedIvf(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), 3, nCells = 8)
    }),
    "x_knn_ivf_multiprobe" -> ((s, dir) => { // FULL oracle; nProbe=2 recall knob
      val emb = Tables.embeddings(s, dir)
      Similarity.learnedIvfMultiProbe(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), 3, nCells = 8, nProbe = 2)
    }),
    "x_knn_ivfpq" -> ((s, dir) => {         // full FAISS IVF-PQ; FULL oracle
      val emb = Tables.embeddings(s, dir)
      Similarity.topKIvfPq(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), 3, nCells = 8, nProbe = 2)
    }),
    "x_knn_pq" -> ((s, dir) => {            // PQ/ADC ANN; FULL oracle
      val emb = Tables.embeddings(s, dir)
      Similarity.topKPq(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", 3)
    }),
    "x_matryoshka_recall" -> ((s, dir) =>
      // truncation dial: recall@10 of prefix-dim retrieval (4/8/16/32 of
      // 64) vs full-dim brute force — one scan, all levels from the same
      // scored rows
      Similarity.matryoshkaRecall(Tables.embeddings(s, dir), "vec_id",
        "embedding", col("vec_id") < 5, Seq(4, 8, 16, 32), k = 10)),
    "x_jl_projection_recall" -> ((s, dir) =>
      // the training-free reduction dial: recall@10 of retrieval in the
      // shared ±1 Achlioptas projection (64 -> 16) vs full-dim brute
      // force — projections computed once per candidate, oracle replays
      // the identical literal sign matrix
      Similarity.randomProjectionRecall(Tables.embeddings(s, dir),
        "vec_id", "embedding", col("vec_id") < 5, projDims = 16, k = 10)),
    "x_ann_recall" -> ((s, dir) => {
      // recall audit that turns the learned-IVF claim into an ORACLE: at
      // full probe width (nProbe = nCells) cell pruning vanishes, so the
      // learned pipeline — bounded-sample codebook, NearestCentroid
      // assignment, multi-probe explode, per-query rank — must reproduce
      // brute-force top-k EXACTLY. The query emits per-query hit counts of
      // learned-IVF ∩ brute-force; DuckDB independently replays brute
      // force, so any codebook/assignment/ranking defect surfaces as
      // recall < 1 and a hash mismatch.
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 5)
      val ivf = Similarity.learnedIvfMultiProbe(emb, "vec_id", "embedding",
          queries, 3, nCells = 8, nProbe = 8)
        .select(col("query_id"), col("cand_id"))
      val brute = Similarity.topKBruteForce(queries, emb, "vec_id",
          "embedding", 3)
        .select(col("query_id"), col("cand_id"))
      brute.join(ivf, Seq("query_id", "cand_id"), "left_semi")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"))
        .withColumn("k", lit(3))
        .withColumn("recall", round(col("n_hits") / col("k"), 6))
        .orderBy("query_id")
    }),
    "x_pq_recall" -> ((s, dir) => {
      // PQ-exactness audit → ORACLE: with kCodes ≥ corpus size every
      // sampled subvector is its own Lloyd's-fixpoint centroid, so
      // reconstruction is LOSSLESS and ADC scoring ≡ exact cosine — PQ
      // top-k must reproduce brute-force top-k exactly. DuckDB replays
      // brute force independently; any encode / reconstruct / rank defect
      // surfaces as recall < 1 and a hash mismatch. Corpus capped at 500
      // vectors so the degenerate codebook stays ≥ corpus at every SF.
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 500)
      val queries = emb.filter(col("vec_id") < 5)
      val pq = Similarity.topKPq(queries, emb, "vec_id", "embedding", 3,
          m = 8, kCodes = 512)
        .select(col("query_id"), col("cand_id"))
      val brute = Similarity.topKBruteForce(queries, emb, "vec_id",
          "embedding", 3)
        .select(col("query_id"), col("cand_id"))
      brute.join(pq, Seq("query_id", "cand_id"), "left_semi")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"))
        .withColumn("k", lit(3))
        .withColumn("recall", round(col("n_hits") / col("k"), 6))
        .orderBy("query_id")
    }),
    "x_ivfpq_recall" -> ((s, dir) => {
      // IVF-PQ at FULL probe width (nProbe = nCells ⇒ cell pruning drops
      // nothing) with the lossless kCodes ≥ corpus codebook: both
      // approximation knobs disarmed, so the full FAISS layout must
      // reproduce brute force exactly — the x_ann_recall pattern applied
      // to the compound index.
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 500)
      val queries = emb.filter(col("vec_id") < 5)
      val ivfpq = Similarity.topKIvfPq(emb, "vec_id", "embedding", queries,
          3, nCells = 8, nProbe = 8, m = 8, kCodes = 512)
        .select(col("query_id"), col("cand_id"))
      val brute = Similarity.topKBruteForce(queries, emb, "vec_id",
          "embedding", 3)
        .select(col("query_id"), col("cand_id"))
      brute.join(ivfpq, Seq("query_id", "cand_id"), "left_semi")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"))
        .withColumn("k", lit(3))
        .withColumn("recall", round(col("n_hits") / col("k"), 6))
        .orderBy("query_id")
    }),
    "x_minhash_mllib" -> ((s, dir) =>       // MLlib MinHashLSH; rows-only
      MLBridge.minHashLSHNearDups(
        Tables.documents(s, dir).filter(col("doc_id") < 60),
        "doc_id", "text", 3, 0.99)),
    "x_minhash_mllib_twins" -> ((s, dir) => {
      // MUST-FIND anchor for the MLlib bridge (the x_item_cf_lsh_twins
      // pattern): every shingle-eligible doc gets an identical-text twin
      // at doc_id + 1e6 — identical shingle sets hash to the identical
      // sparse vector, so the pair's MinHash signatures agree in EVERY
      // hash table at ANY seed and approxSimilarityJoin must surface it
      // at jaccard_dist = 0 exactly. DuckDB replays the eligibility set
      // (>= 3 whitespace words, the 3-shingle precondition) with the
      // certain answer (est_jaccard = 1.0); a missed twin or a wrong
      // candidate distance drops or splits a row. This is the registered
      // hash-green check the rows-only x_minhash_mllib entry anchors to.
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 60)
      val twins = docs.withColumn("doc_id", col("doc_id") + lit(1000000L))
      MLBridge.minHashLSHNearDups(docs.unionByName(twins), "doc_id",
          "text", 3, maxDistance = 0.5)
        .filter(col("id_b") === col("id_a") + lit(1000000L))
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"), col("est_jaccard"))
        .orderBy("id_a")
    }),
    "x_cosine_neardups" -> ((s, dir) =>
      Similarity.cosineNearDups(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label", 0.4)),
    "x_semdedup" -> ((s, dir) => {
      // SemDeDup with SEED centroids (the first 8 vectors) instead of the
      // fitted codebook, so DuckDB replays the whole decision — nearest-
      // centroid assignment included (assignment margins are ≥1e-4 at
      // every SF, far above cross-engine float-summation noise; the
      // fitted-codebook production path is pinned in SimilaritySpec).
      // Bounded 8-row collect at construction, same posture as
      // trainCodebook's 4096-row sample.
      val emb = Tables.embeddings(s, dir)
      val seeds = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
      Similarity.semDedup(emb, "vec_id", "embedding", seeds, tau = 0.4)
    }),

    "x_vector_normalize" -> ((s, dir) =>
      Similarity.l2Normalize(Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), posexplode(col("nvec")).as(Seq("idx", "nval")))
        .withColumn("nval", round(col("nval"), 6))
        .orderBy("vec_id", "idx")),
    "x_quantize_int8" -> ((s, dir) =>
      Similarity.quantizeInt8(Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          posexplode(col("qvec")).as(Seq("idx", "q")))
        .select(col("vec_id"), col("idx"), col("q"),
          round(col("scale"), 6).as("scale"))
        .orderBy("vec_id", "idx")),
    "x_quantized_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.topKQuantized(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", 3)
    }),

    // ---- §7.4 multimodal columns -------------------------------------------
    "x_binary_features" -> ((s, dir) =>
      Multimodal.binaryFeatures(
        Multimodal.asBinaryTable(Tables.documents(s, dir), "doc_id", "text"),
        "doc_id")),
    "x_decode_base64" -> ((s, dir) =>      // real mapPartitions codec: Base64→UTF-8
      Multimodal.decodeBase64Features(s,
        Multimodal.asBase64Table(Tables.documents(s, dir), "doc_id", "text"),
        "doc_id")),

    "q_attribution" -> ((s, dir) =>
      // last-touch + linear credit per channel, touches paired to
      // conversions by the binned interval join (7-day lookback)
      Eval.attribution(Tables.events(s, dir), "user_id", "ts", "event_id",
        "event_type",
        isTouch = col("event_type").isin("view", "click", "signup"),
        isConv = col("event_type") === "purchase",
        lookback = "7 DAYS")),
    "q_funnel" -> ((s, dir) => {
      // ordered conversion funnel: first view → first click at-or-after
      // it → first purchase at-or-after that; per-user mins keep every
      // join side bounded at one row per user
      val e = Tables.events(s, dir)
      // each stage frame feeds two consumers (next stage + its own
      // count): checkpoint the small per-user frames so the events scan
      // and funnel joins run once per stage, not per consumer
      val fv = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
        .localCheckpoint()
      val fc = e.filter(col("event_type") === "click").as("e")
        .join(fv, Seq("user_id"))
        .filter(col("ts") >= col("t_view"))
        .groupBy("user_id").agg(min(col("ts")).as("t_click"))
        .localCheckpoint()
      val fp = e.filter(col("event_type") === "purchase").as("e")
        .join(fc, Seq("user_id"))
        .filter(col("ts") >= col("t_click"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
      val nv = fv.agg(count(lit(1)).as("n_view"))
      val nc = fc.agg(count(lit(1)).as("n_click"))
      val np = fp.agg(count(lit(1)).as("n_purchase"))
      nv.crossJoin(nc).crossJoin(np)
        .withColumn("click_rate",
          round(col("n_click") / col("n_view").cast("double"), 6))
        .withColumn("purchase_rate",
          round(col("n_purchase") / col("n_click").cast("double"), 6))
    }),
    "q_funnel_windowed" -> ((s, dir) => {
      // the deadline funnel: click within 24h of first view, purchase
      // within 72h of that click — the attribution-realistic variant of
      // q_funnel's unbounded ordering; adds median stage latencies
      // (integer seconds -> both engines interpolate identical halves)
      val e = Tables.events(s, dir)
      val fv = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
        .localCheckpoint()
      val fc = e.filter(col("event_type") === "click").as("e")
        .join(fv, Seq("user_id"))
        .filter(col("ts") >= col("t_view") &&
          col("ts") < col("t_view") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min(col("ts")).as("t_click"),
          min(col("t_view")).as("t_view"))
        .localCheckpoint()
      val fp = e.filter(col("event_type") === "purchase").as("e")
        .join(fc, Seq("user_id"))
        .filter(col("ts") >= col("t_click") &&
          col("ts") < col("t_click") + expr("INTERVAL 72 HOURS"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"),
          min(col("t_click")).as("t_click2"))
      val nv = fv.agg(count(lit(1)).as("n_view"))
      val nc = fc.agg(count(lit(1)).as("n_click"),
        round(percentile((unix_micros(col("t_click").cast("timestamp")) -
          unix_micros(col("t_view").cast("timestamp"))) / lit(1000000L),
          lit(0.5)), 6).as("median_view_to_click_s"))
      val np = fp.agg(count(lit(1)).as("n_purchase"),
        round(percentile((unix_micros(col("t_purchase").cast("timestamp")) -
          unix_micros(col("t_click2").cast("timestamp"))) / lit(1000000L),
          lit(0.5)), 6).as("median_click_to_purchase_s"))
      nv.crossJoin(nc).crossJoin(np)
        .withColumn("click_rate",
          round(col("n_click") / col("n_view").cast("double"), 6))
        .withColumn("purchase_rate",
          round(col("n_purchase") / col("n_click").cast("double"), 6))
    }),
    "q_cohort_ltv" -> ((s, dir) => {
      // cohort lifetime value: cumulative purchase revenue per cohort
      // member by week of age — retention's revenue-sided twin (the
      // "when does a cohort pay back" curve); cumulative window over the
      // bounded (cohort, offset) grid
      val e = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("event_type"), col("value"))
      val first = e.groupBy("user_id")
        .agg(date_trunc("week", min(col("day"))).cast("date")
          .as("cohort_week"))
      val sizes = first.groupBy("cohort_week")
        .agg(countDistinct(col("user_id")).as("cohort_size"))
      val rev = e.filter(col("event_type") === "purchase")
        .join(first, Seq("user_id"))
        .withColumn("week_offset",
          (datediff(date_trunc("week", col("day")).cast("date"),
            col("cohort_week")) / 7).cast("int"))
        .groupBy("cohort_week", "week_offset")
        .agg(sum(col("value")).as("__rev"))
      val cum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cohort_week")).orderBy(col("week_offset"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      rev.join(sizes, Seq("cohort_week"))
        .withColumn("week_revenue", round(col("__rev"), 6))
        .withColumn("cum_revenue", round(sum(col("__rev")).over(cum), 6))
        .withColumn("cum_ltv_per_user",
          round(sum(col("__rev")).over(cum) /
            col("cohort_size").cast("double"), 6))
        .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
          col("week_revenue"), col("cum_revenue"), col("cum_ltv_per_user"))
        .orderBy("cohort_week", "week_offset")
    }),
    "q_cohort_retention" -> ((s, dir) => {
      // weekly cohort retention: users grouped by first-activity week,
      // distinct active users per (cohort, week offset)
      val e = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = e.groupBy("user_id")
        .agg(date_trunc("week", min(col("day"))).cast("date")
          .as("cohort_week"))
      val act = e.select(col("user_id"),
        date_trunc("week", col("day")).cast("date").as("act_week")).distinct()
      act.join(first, Seq("user_id"))
        .withColumn("week_offset",
          (datediff(col("act_week"), col("cohort_week")) / 7).cast("int"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),
    "x_item_cf" -> ((s, dir) =>
      // customers-who-bought-X-also-bought-Y: co-occurrence cosine
      // top-10 per part over customer baskets, pair space bounded by
      // the maxBasket power-user cut and the minDf/maxDf item cuts;
      // built once per corpus (Shared.cfNeighbors — the materialized-
      // artifact posture) and shared with the two rec queries
      Shared.cfNeighbors(s, dir)),
    "x_item_cf_lsh" -> ((s, dir) =>
      // the 100 TB CF path: MinHash-banded user-set signatures PROPOSE
      // (pair space = bucket collisions, never Σ basket²), exact
      // co-counts VERIFY — every emitted neighbor is exact, recall is
      // the documented 1-(1-J²)^16 banding curve. FULL hash oracle:
      // the quadratic-key minstd permutations and value-pair band keys
      // replay in SQL end to end (plus the x_item_cf_lsh_twins
      // MUST-FIND anchor)
      Similarity.itemItemCFLsh(Shared.cfInteractions(s, dir),
        "o_custkey", "l_partkey", minDf = 2, maxDf = 1000,
        maxBasket = 256, k = 10, minCosine = 0.1, numHashes = 32,
        bands = 16, keptPinned = Some(Shared.cfKept(s, dir)),
        sigPinned = Some(Shared.cfSigs(s, dir)))),
    "x_item_cf_lsh_twins" -> ((s, dir) => {
      // MUST-FIND anchor (the x_simhash_recall pattern): every part
      // gets a twin with an IDENTICAL customer set, so signatures agree
      // in every band — proposal is certain, not probabilistic — and
      // exact verification must land on n_co = df, cosine = 1.0
      // exactly. DuckDB replays the caps and dfs independently; any
      // signature / banding / verify-join defect drops a row.
      val inter = Shared.cfInteractions(s, dir)
      val twins = inter.select(col("o_custkey"),
        (col("l_partkey") + 1000000L).as("l_partkey"))
      // the doubled corpus' capped-basket frame derives EXACTLY from the
      // shared pin: a twin has its base item's user set, so per-item df
      // is unchanged (same cuts pass), and a doubled basket of size 2b
      // fits the 512 cap iff the base basket of size b fit the 256 cap —
      // so kept(doubled, 512) ≡ kept(base, 256) ∪ shift(kept(base, 256)),
      // row for row. The DuckDB oracle still replays the prep chain from
      // the doubled corpus independently, so a wrong derivation would
      // hash-split.
      val keptBase = Shared.cfKept(s, dir)
      // re-pin the doubled frame: the pairs build consumes kept five
      // times, and an unpinned union makes each consumer re-plan BOTH
      // checkpoint scans (plan audit measured 17 -> 27 exchanges)
      val keptTwins = keptBase.unionByName(
        keptBase.withColumn("__i", col("__i") + 1000000L))
        .localCheckpoint()
      // the doubled corpus' SIGNATURES derive from the shared store the
      // same way: a twin carries its base item's exact user set, and
      // each signature component is a per-item min over the item's
      // users — same users, same mins, only the id shifts. (The DuckDB
      // oracle still replays the signature fold from the doubled corpus
      // independently, so a wrong derivation would hash-split.)
      val sigBase = Shared.cfSigs(s, dir)
      val sigTwins = sigBase.unionByName(
        sigBase.withColumn("id", col("id") + 1000000L))
      // candFilter pushes the twin restriction BELOW the exact-verify
      // joins: the final `neighbor = item + 1e6` filter can only keep
      // co rows from the id_a < id_b orientation with id_b = id_a + 1e6
      // (the reverse orientation would need id_a = id_b + 1e6, which
      // contradicts id_a < id_b), so dropping every other candidate is
      // output-identical — and the verify joins now expand ~#items
      // certain twin pairs instead of every natural collision in the
      // doubled corpus. The final filter stays as the declared contract.
      Similarity.itemItemCFLshPairs(inter.unionByName(twins),
          "o_custkey", "l_partkey", minDf = 2, maxDf = 1000,
          maxBasket = 512, minCosine = 1.0, numHashes = 32, bands = 16,
          keptPinned = Some(keptTwins),
          candFilter = Some(col("id_b") === col("id_a") + 1000000L),
          sigPinned = Some(sigTwins))
        .filter(col("neighbor") === col("item") + 1000000L)
        .orderBy("item")
    }),
    "x_rec_topk" -> ((s, dir) =>
      // the serving pass: top-5 unowned parts per customer, scored by
      // lattice-summed neighbor cosines over the x_item_cf table —
      // materialized once per corpus (Shared.recTopK) and shared with
      // the scorecard, the batch-scoring-job posture
      Shared.recTopK(s, dir)),
    "x_rec_metrics" -> ((s, dir) =>
      // the quality scorecard over those lists: catalog coverage and
      // long-tail novelty beside the list-size counters
      Similarity.recMetrics(Shared.recTopK(s, dir),
        Shared.cfInteractions(s, dir), "o_custkey", "l_partkey")),
  )
}
