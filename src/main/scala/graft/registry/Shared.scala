package graft
package registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Helpers shared across the registry slices (and by
  * [[graft.SparkEntry.entry]]): the parsed-events frame, the reused A12
  * snapshot, and the two per-corpus trained-tokenizer caches.
  */
private[graft] object Shared {

  private[graft] def ev(s: SparkSession, dir: String): DataFrame =
    Parse.parseEvents(Tables.events(s, dir))

  /** Supplier co-order edge list (suppliers sharing an order, both
    * orientations) — the graph the q_supplier_* family analyzes.
    */
  /** The supplier co-order graph — cached per corpus dir like
    * [[cfNeighbors]]: a production graph is a DERIVED TABLE (rebuilt on a
    * schedule, read by every graph query), not something each query
    * re-mines from lineitem. Six registry queries (pagerank, BFS, HITS,
    * label propagation, assortativity, modularity) read it; the
    * localCheckpoint pins only the distinct directed edge list (~2.4 M
    * slim rows at sf0.1). The DISTINCT is applied here so consumers that
    * need it (pageRank) don't re-shuffle for it.
    */
  /** Per-corpus cache for CHECKPOINTED DataFrames. A localCheckpoint'd
    * frame's blocks die with the owning SparkSession, so a dir-only key
    * would hand a frame referencing dead blocks to a NEW session started
    * in the same JVM — validate the owner (identity + not stopped) and
    * rebuild on mismatch. The tokenizer caches hold plain Scala data and
    * don't need this.
    */
  private final class SessionFrameCache {
    private val m = new java.util.concurrent.ConcurrentHashMap[
      String, (SparkSession, DataFrame)]()
    def get(s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
      m.compute(dir, (_, cur) =>
        if (cur != null && (cur._1 eq s) && !s.sparkContext.isStopped) cur
        else (s, build))._2
  }

  /** The WEIGHTED undirected co-order pair table (src < dst, w = #shared
    * orders) — the one self-join every co-order graph query starts from.
    * q_supplier_kcore (w ≥ 5) and q_triangles (w ≥ 10) filter it
    * directly; [[coOrderEdges]] derives the directed distinct edge list
    * from it (both orientations of the distinct pairs — identical to the
    * old direct distinct build, since co-ordering is symmetric), so the
    * corpus pays the lineitem self-join ONCE for all nine graph queries.
    */
  private val coOrderPairWeightCache = new SessionFrameCache
  private[graft] def coOrderPairWeights(s: SparkSession,
                                        dir: String): DataFrame =
    coOrderPairWeightCache.get(s, dir) {
      import org.apache.spark.sql.functions.{col, count, lit}
      val base = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("bk"), col("l_suppkey").as("sk"))
        .distinct()
      base.as("a").join(base.as("b"),
          col("a.bk") === col("b.bk") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("src"), col("b.sk").as("dst"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint()
    }

  private val coOrderEdgeCache = new SessionFrameCache
  private[graft] def coOrderEdges(s: SparkSession, dir: String): DataFrame =
    coOrderEdgeCache.get(s, dir) {
      import org.apache.spark.sql.functions.col
      val pairs = coOrderPairWeights(s, dir).select("src", "dst")
      pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
    }

  /** A12 snapshot reused by several queries. */
  private[graft] def snapshot(s: SparkSession, dir: String): DataFrame =
    Materialize.latestPerKey(Tables.orders(s, dir), "o_custkey",
      "o_orderdate", "o_orderkey")

  /** Trained BPE merges per corpus dir — a deterministic artifact (the
    * trainer is superstep-exact), cached so the three BPE registry
    * entries train once per corpus instead of once per query; production
    * would persist the merge table next to the corpus like any fitted
    * vocabulary.
    */
  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  private[graft] def bpeMerges(s: SparkSession,
                               dir: String): Seq[(String, String)] =
    bpeCache.computeIfAbsent(dir, _ =>
      Bpe.trainMergesDistributed(Tables.documents(s, dir), "text",
        Bpe.OracleK))

  /** Trained unigram piece table per corpus dir — the [[bpeMerges]]
    * pattern for the second tokenizer family (deterministic artifact,
    * trained once per corpus across its registry entries).
    */
  private val unigramCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Long)]]()
  private[graft] def unigramTable(s: SparkSession,
                                  dir: String): Seq[(String, Long)] =
    unigramCache.computeIfAbsent(dir, _ =>
      Unigram.trainDistributed(Tables.documents(s, dir), "text",
        vocabSize = 200, rounds = 2, maxPieceLen = 4))

  /** The customer-basket interaction table behind the CF family
    * (x_item_cf / x_rec_topk / x_rec_metrics). */
  private[graft] def cfInteractions(s: SparkSession,
                                    dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
  }

  /** The trained item-CF neighbor table per corpus dir — the
    * [[bpeMerges]] pattern: in production this is a MATERIALIZED
    * artifact (rebuilt on a schedule, read by every serving query), so
    * the three CF registry entries share one build instead of
    * re-deriving the Σ basket² pair table each. localCheckpoint pins
    * only the neighbor grain (items × k rows).
    */
  /** The capped-basket (item, user, df) frame at the family's standard
    * cuts (minDf 2, maxDf 1000, maxBasket 256) — the derived table BOTH
    * CF trainers start from, materialized once per corpus and handed to
    * each build via `keptPinned` (the twins anchor keeps its own build:
    * its doubled input and 512 cap share nothing).
    */
  private val cfKeptCache = new SessionFrameCache
  private[graft] def cfKept(s: SparkSession, dir: String): DataFrame =
    cfKeptCache.get(s, dir) {
      Similarity.cfKeptPinned(cfInteractions(s, dir), "o_custkey",
        "l_partkey", minDf = 2, maxDf = 1000, maxBasket = 256)
    }

  /** The MinHash signature store over [[cfKept]] at the family's
    * standard width (32 hashes) — the [[minhashSigs64]] posture for the
    * basket table: an LSH signature table is a persisted artifact
    * (rebuilt with the basket table, read by every candidate-generation
    * job). x_item_cf_lsh reads it directly; the twins anchor derives the
    * doubled corpus' signatures from it (a twin has its base item's
    * user set, so its per-component mins are IDENTICAL — only the id
    * shifts). localCheckpoint pins the items × 32-longs grain.
    */
  private val cfSigCache = new SessionFrameCache
  private[graft] def cfSigs(s: SparkSession, dir: String): DataFrame =
    cfSigCache.get(s, dir) {
      Similarity.cfSignatures(cfKept(s, dir), numHashes = 32)
        .localCheckpoint()
    }

  private val cfNeighborCache = new SessionFrameCache
  private[graft] def cfNeighbors(s: SparkSession,
                                 dir: String): DataFrame =
    cfNeighborCache.get(s, dir) {
      Similarity.itemItemCF(cfInteractions(s, dir), "o_custkey",
        "l_partkey", minDf = 2, maxDf = 1000, maxBasket = 256, k = 10,
        keptPinned = Some(cfKept(s, dir)))
        .localCheckpoint()
    }

  /** The served top-5 rec list per corpus dir — the [[cfNeighbors]]
    * posture one level up: in production the batch scoring job's output
    * IS a materialized table (written on a schedule, read by the serving
    * path and the quality scorecard alike), so the two rec registry
    * entries share one build instead of each re-running the
    * basket × neighbor scoring chain. localCheckpoint pins only the
    * (user × ≤5) rec grain.
    */
  private val recTopKCache = new SessionFrameCache
  private[graft] def recTopK(s: SparkSession, dir: String): DataFrame =
    recTopKCache.get(s, dir) {
      Similarity.recommendTopK(cfInteractions(s, dir), "o_custkey",
          "l_partkey", cfNeighbors(s, dir), k = 5)
        .localCheckpoint()
    }

  /** The fitted quality-filter weights per corpus dir (1 row, 65
    * doubles) — the trained-model artifact of the x_lr_* family at its
    * standard config (label ≥ 5, η = 0.5, 3 supersteps). In production
    * the training job persists exactly this frame; the five consumers
    * (scores, noise screen, calibration, metrics, importance) read it
    * via `wPinned` instead of refitting the identical supersteps five
    * times.
    */
  private val lrWeightCache = new SessionFrameCache
  private[graft] def lrWeights(s: SparkSession, dir: String): DataFrame =
    lrWeightCache.get(s, dir) {
      import org.apache.spark.sql.functions.col
      Learn.fitWeights(Tables.embeddings(s, dir), "vec_id", "embedding",
          col("label") >= 5, eta = 0.5, iterations = 3)
        .localCheckpoint()
    }

  /** The scored corpus of the pinned [[lrWeights]] model — the batch
    * scoring job's output table (id, y, margin, prob, pred), read
    * directly by four of the five x_lr_* entries. localCheckpoint pins
    * the |embeddings|-row grain.
    */
  private val lrScoredCache = new SessionFrameCache
  private[graft] def lrScored(s: SparkSession, dir: String): DataFrame =
    lrScoredCache.get(s, dir) {
      import org.apache.spark.sql.functions.col
      Learn.logisticGD(Tables.embeddings(s, dir), "vec_id", "embedding",
          col("label") >= 5, eta = 0.5, iterations = 3,
          wPinned = Some(lrWeights(s, dir)))
        .localCheckpoint()
    }

  /** The bigram-LM perplexity scores per corpus dir — the CCNet-style
    * quality score table at the family's standard config (English
    * reference slice, vocab 100, λ = 0.5). The scorer is fitted and run
    * once; x_lm_perplexity exports it, x_curriculum cuts quartile
    * stages over it, and x_llm_pipeline_v3's filter stage thresholds
    * it — in production all three read the one scored table the LM job
    * writes. localCheckpoint pins the per-doc grain (5 doubles/doc).
    */
  private val lmScoredCache = new SessionFrameCache
  private[graft] def lmScored(s: SparkSession, dir: String): DataFrame =
    lmScoredCache.get(s, dir) {
      import org.apache.spark.sql.functions.col
      TextAnalysis.bigramPerplexity(Tables.documents(s, dir), "doc_id",
          "text", col("lang") === "en", vocabSize = 100)
        .localCheckpoint()
    }

  /** The winnow shared-span pair table per corpus dir (k = 32, w = 16,
    * maxDf = 5 — the family's standard MOSS config). x_shared_spans
    * exports it, x_contamination_spans slices the train×benchmark
    * pairs out of it, and x_llm_pipeline_v3's dedup stage drops the
    * later doc of each pair — one fingerprint pass for all three.
    */
  private val winnowSpanCache = new SessionFrameCache
  private[graft] def winnowSpans(s: SparkSession, dir: String): DataFrame =
    winnowSpanCache.get(s, dir) {
      TextAnalysis.sharedSpans(Tables.documents(s, dir), "doc_id", "text",
          k = 32, w = 16, maxDf = 5)
        .localCheckpoint()
    }

  /** The persisted MinHash signature store per corpus dir — 64 md5-fold
    * Carter–Wegman components over 3-gram shingles, the accumulated
    * artifact an incremental near-dup ingest maintains (appended per
    * batch, never re-derived from text). The per-permutation family
    * depends only on the permutation index, so every narrower config is
    * a column prefix: x_neardups_verified reads all 64,
    * x_minhash_neardups / x_dedup_incremental_lsh read mh_0..15, and
    * the incremental entries' seen-side slices are id filters.
    */
  private val minhashSigCache = new SessionFrameCache
  private[graft] def minhashSigs64(s: SparkSession,
                                   dir: String): DataFrame =
    minhashSigCache.get(s, dir) {
      Dedup.minHashSignatures(Tables.documents(s, dir), "doc_id", "text",
          n = 3, numHashes = 64)
        .localCheckpoint()
    }

  /** The persisted shingle store per corpus dir (distinct 3-gram arrays
    * per doc) — the second accumulated near-dup artifact, read by every
    * exact-Jaccard verify stage.
    */
  private val shingleCache = new SessionFrameCache
  private[graft] def shingles3(s: SparkSession, dir: String): DataFrame =
    shingleCache.get(s, dir) {
      Dedup.shingleRelation(Tables.documents(s, dir), "doc_id", "text",
          n = 3)
        .localCheckpoint()
    }

  /** The ExactSubstr duplicated-span table per corpus dir (k = 20) —
    * the span cut-list the substring-dedup job writes; x_dup_substrings
    * exports it and x_dup_substring_stats rolls it up per doc.
    */
  private val dupSpanCache = new SessionFrameCache
  private[graft] def dupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpanCache.get(s, dir) {
      Dedup.duplicatedSpans(Tables.documents(s, dir), "doc_id", "text",
          k = 20)
        .localCheckpoint()
    }

  /** The cross-document line-dedup relation per corpus dir over the
    * 8-word re-chunked corpus — the cleaned-corpus artifact the line-
    * dedup job writes; x_dedup_lines exports it (plus the id sort) and
    * x_llm_pipeline_v2's clean stage chains from it.
    */
  private val dedupLinesCache = new SessionFrameCache
  private[graft] def dedupedLines(s: SparkSession, dir: String): DataFrame =
    dedupLinesCache.get(s, dir) {
      import org.apache.spark.sql.functions.{array_join, col, trim}
      val lined = Tables.documents(s, dir)
        .filter(trim(col("text")) =!= "")
        .select(col("doc_id"),
          array_join(TextAnalysis.chunkTexts(col("text"), 8, 8), "\n")
            .as("text"))
      TextAnalysis.dedupLinesRelation(lined, "doc_id", "text")
        .localCheckpoint()
    }

  /** Trained WordPiece vocabulary per corpus dir — the [[bpeMerges]]
    * pattern for the third tokenizer family.
    */
  private val wordPieceCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[String], Seq[String])]()
  private[graft] def wordPieceTables(
      s: SparkSession, dir: String): (Seq[String], Seq[String]) =
    wordPieceCache.computeIfAbsent(dir, _ =>
      Bpe.wordPieceVocab(Tables.documents(s, dir), "text",
        maxPieceLen = 6, topK = 64))

  /** Every shared artifact's BUILD, enumerated for the bench's pin-cold
    * instrumentation pass (round 13): the sweep's per-query min is
    * pin-warm (all pins survive between the two passes), so one-time
    * builds are charged to no query — this list lets `graft.Bench` time
    * each build in a fresh session and report it separately. Ordered
    * dependencies-first so each number is that artifact's OWN cost.
    * Frame builders run through the session-keyed caches (a fresh
    * session rebuilds); the dir-keyed tokenizer tables are timed by
    * invoking their trainers directly with the same args as the cache
    * entries above (kept adjacent so the configs can't drift).
    */
  private[graft] val artifactBuilders:
      Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "co_order_pair_weights" ->
      ((s, d) => { coOrderPairWeights(s, d).count(); () }),
    "co_order_edges" -> ((s, d) => { coOrderEdges(s, d).count(); () }),
    "cf_kept" -> ((s, d) => { cfKept(s, d).count(); () }),
    "cf_sigs" -> ((s, d) => { cfSigs(s, d).count(); () }),
    "cf_neighbors" -> ((s, d) => { cfNeighbors(s, d).count(); () }),
    "rec_topk" -> ((s, d) => { recTopK(s, d).count(); () }),
    "lr_weights" -> ((s, d) => { lrWeights(s, d).count(); () }),
    "lr_scored" -> ((s, d) => { lrScored(s, d).count(); () }),
    "lm_scored" -> ((s, d) => { lmScored(s, d).count(); () }),
    "winnow_spans" -> ((s, d) => { winnowSpans(s, d).count(); () }),
    "minhash_sigs64" -> ((s, d) => { minhashSigs64(s, d).count(); () }),
    "shingles3" -> ((s, d) => { shingles3(s, d).count(); () }),
    "dup_spans" -> ((s, d) => { dupSpans(s, d).count(); () }),
    "deduped_lines" -> ((s, d) => { dedupedLines(s, d).count(); () }),
    "bpe_merges" -> ((s, d) => {
      Bpe.trainMergesDistributed(Tables.documents(s, d), "text",
        Bpe.OracleK); () }),
    "unigram_table" -> ((s, d) => {
      Unigram.trainDistributed(Tables.documents(s, d), "text",
        vocabSize = 200, rounds = 2, maxPieceLen = 4); () }),
    "wordpiece_tables" -> ((s, d) => {
      Bpe.wordPieceVocab(Tables.documents(s, d), "text",
        maxPieceLen = 6, topK = 64); () }))
}
