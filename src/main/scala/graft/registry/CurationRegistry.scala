package graft
package registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import Shared._

/** SURVEY §7.4 sampling / deterministic splits and dedup.
  *
  * One domain slice of the query registry (split out of SparkEntry in
  * round 8 — wiring only, no behavior change; [[graft.SparkEntry]]
  * assembles and uniqueness-checks the full map).
  */
object CurationRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §7.4 sampling / deterministic splits ------------------------------
    "q_split_assign" -> ((s, dir) =>
      Sampling.splitAssign(Tables.customer(s, dir).select("c_custkey"),
          "c_custkey", Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0))
        .orderBy("c_custkey")),
    "q_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(
          Tables.events(s, dir).select("event_id", "event_type"),
          "event_type", "event_id", 0.1)
        .orderBy("event_id")),
    "q_quota_cap" -> ((s, dir) =>
      Sampling.quotaCap(
          Tables.events(s, dir).select("event_id", "user_id", "ts"),
          "user_id", Seq(col("ts").desc, col("event_id").desc), 3)
        .orderBy("event_id")),
    "q_quota_cap_hashed" -> ((s, dir) =>
      // skew-proof per-domain cap: hash-priority selection, no group sort
      Sampling.quotaCapHashed(
          Tables.events(s, dir).select("event_id", "user_id"),
          "user_id", "event_id", 3)
        .orderBy("event_id")),
    "q_quota_cap_scalable" -> ((s, dir) =>
      // q_quota_cap's exact semantics (3 newest per user, ts/event_id
      // desc) through the priority-histogram selection — same oracle,
      // no per-user sort task
      Sampling.quotaCapByPriority(
          Tables.events(s, dir).select("event_id", "user_id", "ts"),
          "user_id",
          priority = -unix_micros(col("ts").cast("timestamp")),
          tiebreak = -col("event_id"), n = 3)
        .orderBy("event_id")),
    "q_uniform_sample" -> ((s, dir) =>
      Sampling.uniformSample(
          Tables.customer(s, dir).select("c_custkey", "c_name"),
          "c_custkey", 100)
        .orderBy("c_custkey")),
    "q_uniform_sample_scalable" -> ((s, dir) =>
      // same 100 rows, selected without the TakeOrdered driver merge
      Sampling.uniformSampleScalable(
          Tables.customer(s, dir).select("c_custkey", "c_name"),
          "c_custkey", 100)
        .orderBy("c_custkey")),
    "q_mixture_sample" -> ((s, dir) =>
      Sampling.mixtureSample(
          Tables.documents(s, dir).select("doc_id", "lang"),
          "lang", "doc_id",
          Seq("en" -> 0.6, "de" -> 0.2, "fr" -> 0.2), totalN = 200)
        .orderBy("doc_id")),
    "x_temperature_mixture" -> ((s, dir) =>
      // α=0.5 temperature rebalancing: per-language quotas ∝ √nᵢ,
      // derived from the corpus itself — no target list
      Sampling.temperatureMixture(
          Tables.documents(s, dir).select("doc_id", "lang"),
          "lang", "doc_id", alpha = 0.5, totalN = 300)
        .orderBy("doc_id")),
    "x_temperature_report" -> ((s, dir) =>
      // the audit twin: count, √-weight, derived quota, draw, shortfall
      Sampling.temperatureMixtureReport(
        Tables.documents(s, dir), "lang", alpha = 0.5, totalN = 300)),
    "x_embedding_drift" -> ((s, dir) =>
      // encoder/corpus drift in embedding space: per-dimension centroid
      // shift between the even/odd vec_id slices + global cosine/L2
      Similarity.embeddingDrift(
        Tables.embeddings(s, dir), "embedding", col("vec_id") % 2 === 0)),
    "x_budget_sample" -> ((s, dir) =>
      // data-recipe mixing in COST units (chars here, tokens in prod):
      // per-language hash-ordered prefix within a declared char budget;
      // es/fr carry no budget and are dropped entirely
      Sampling.budgetSample(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "doc_id", "n_chars",
          Map("en" -> 20000L, "de" -> 8000L, "zh" -> 10000L))
        .select(col("lang"), col("doc_id"), col("n_chars"), col("cum_cost"))
        .orderBy("lang", "cum_cost", "doc_id")),
    "q_pack_sequences" -> ((s, dir) =>
      Sampling.packSequences(
          Tables.documents(s, dir)
            .select(col("lang"), col("doc_id"),
              size(split(trim(col("text")), "\\s+")).as("n_tokens")),
          "lang", "doc_id", "n_tokens", maxTokens = 2048)
        .orderBy("lang", "doc_id")),
    "q_pack_report" -> ((s, dir) =>
      // padding-waste audit over the packing output
      Sampling.packReport(
        Sampling.packSequences(
          Tables.documents(s, dir)
            .select(col("lang"), col("doc_id"),
              size(split(trim(col("text")), "\\s+")).as("n_tokens")),
          "lang", "doc_id", "n_tokens", maxTokens = 2048),
        "lang", "n_tokens", maxTokens = 2048)),
    "q_mixture_report" -> ((s, dir) =>
      // shortfall audit the mixture draw publishes beside its sample
      Sampling.mixtureReport(
        Tables.documents(s, dir).select("doc_id", "lang"), "lang",
        // "xx" has no corpus supply: its whole quota surfaces as shortfall
        Seq("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "xx" -> 0.1),
        totalN = 2000)),

    // ---- §7.4 dedup --------------------------------------------------------
    "x_dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.documents(s, dir), "doc_id", "text")),
    "x_dedup_stats" -> ((s, dir) =>
      Dedup.stats(Tables.documents(s, dir), "text")),
    "x_dedup_incremental" -> ((s, dir) => {
      // ingest-shaped dedup: new batch vs the already-seen corpus
      val d = Tables.documents(s, dir)
      Dedup.exactIncremental(d.filter(col("doc_id") < 250),
        d.filter(col("doc_id") >= 250), "doc_id", "text")
    }),
    "x_dedup_incremental_lsh" -> ((s, dir) => {
      // ingest-shaped NEAR-dup check: the new batch probes the accumulated
      // MinHash signature table — corpus text is never re-read. FULL hash
      // oracle: md5-fold Carter–Wegman signatures + value-tuple banding
      // replay verbatim in DuckDB (DedupSpec additionally proves
      // batch-vs-full-corpus equivalence of the surviving id set)
      val d = Tables.documents(s, dir)
      // the accumulated store is the shared 64-wide signature artifact:
      // seen side = id slice of its first-16 column prefix (the same
      // rows minHashSignatures(seen, 16) would build)
      val seenSigs = minhashSigs64(s, dir)
        .select(col("id") +: (0 until 16).map(i => col(s"mh_$i")): _*)
        .filter(col("id") < 250)
      Dedup.minHashNearDupsIncremental(seenSigs,
        d.filter(col("doc_id") >= 250), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5)
    }),
    "x_incremental_verified" -> ((s, dir) => {
      // the INCREMENTAL rule, oracle-checkable: batch (doc_id >= 250)
      // probes the accumulated signature + shingle stores in the
      // provably-complete rows-per-band = 1 config with exact-Jaccard
      // verification, so the surviving set is exactly "smallest partner
      // with jaccard >= 0.5" — DuckDB replays it as a plain pair scan
      // restricted to batch-id larger sides. This turns the incremental
      // equivalence that previously lived only in DedupSpec into a
      // hash-green registry row.
      val d = Tables.documents(s, dir)
      // seen-side stores = id slices of the shared signature/shingle
      // artifacts (identical rows to building them over the seen docs)
      Dedup.nearDupsVerifiedIncremental(
        minhashSigs64(s, dir).filter(col("id") < 250),
        shingles3(s, dir).filter(col("id") < 250),
        d.filter(col("doc_id") >= 250), "doc_id", "text",
        n = 3, numHashes = 64, bands = 64, threshold = 0.5,
        minEst = 0.125)
        .withColumnRenamed("id", "doc_id")
    }),
    "x_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(
        Tables.documents(s, dir).filter(col("doc_id") < 60),
        "doc_id", "text", 3, 0.02, maxDf = 30)),
    "x_bleu_pairs" -> ((s, dir) => {
      // ordered-phrasing overlap where jaccard only sees shared
      // vocabulary: BLEU-2 (clipped precisions, brevity penalty) over
      // the near-dup pair table
      val probe = Tables.documents(s, dir).filter(col("doc_id") < 60)
      TextAnalysis.bleuPairs(probe, "doc_id", "text",
        Dedup.jaccardPairs(probe, "doc_id", "text", 3, 0.02, maxDf = 30)
          .select("id_a", "id_b"))
    }),
    "x_rouge_pairs" -> ((s, dir) => {
      // the in-order-but-gappy complement of BLEU over the same pair
      // table: ROUGE-L recall/precision/F1 via the all-integer LCS grid
      // fold (oracle replays the DP cell-per-step)
      val probe = Tables.documents(s, dir).filter(col("doc_id") < 60)
      TextAnalysis.rougeLPairs(probe, "doc_id", "text",
        Dedup.jaccardPairs(probe, "doc_id", "text", 3, 0.02, maxDf = 30)
          .select("id_a", "id_b"))
    }),
    "x_golden_record" -> ((s, dir) => {
      // survivorship after entity resolution: most-frequent name (ties
      // to smallest), max balance, per matched cluster; variants carry a
      // cent-drifted balance so the max rule visibly elects
      val c = Tables.customer(s, dir).filter(col("c_custkey") < 200)
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"), col("c_nationkey").as("nationkey"))
      val variants = c.select((col("id") + 100000).as("id"),
        concat(
          substring(col("name"), lit(1), length(col("name")) - 2),
          substring(col("name"), length(col("name")), lit(1)),
          substring(col("name"), length(col("name")) - 1, lit(1)))
          .as("name"),
        (col("acctbal") + 0.005).as("acctbal"), col("nationkey"))
      val u = c.unionByName(variants)
      val pairs = Dedup.fuzzyPairsKeyed(u, "id", "name",
        maxDistance = 2, blockKey = { s =>
          val t = lower(trim(s))
          val n = length(t)
          val c1 = substring(t, n - 1, lit(1))
          val c2 = substring(t, n, lit(1))
          concat(substring(t, lit(1), n - 2), least(c1, c2),
            greatest(c1, c2))
        }).select("id_a", "id_b")
      Dedup.goldenRecord(u, "id", pairs,
        freqElect = Seq("name", "nationkey"), maxElect = Seq("acctbal"))
    }),
    "x_containment_pairs" -> ((s, dir) =>
      // asymmetric near-dup: |∩|/min(|A|,|B|) catches a short doc quoted
      // wholesale inside a long one, which symmetric Jaccard scores ~0
      Dedup.containmentPairs(
        Tables.documents(s, dir).filter(col("doc_id") < 60),
        "doc_id", "text", 3, 0.05, maxDf = 30)),
    "x_entity_resolution" -> ((s, dir) => {
      // blocked fuzzy match: customers vs deterministically typo'd variants
      // (last two name chars swapped -> edit distance 2). The blocking key
      // is TRANSPOSITION-CANONICAL — string with its last two chars sorted
      // — so it is invariant under the injected typo yet one-entity
      // selective (max block 4, vs the corpus-wide block a "Customer#..."
      // prefix key degenerates to; DedupSpec asserts the bound)
      val c = Tables.customer(s, dir).filter(col("c_custkey") < 200)
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      val variants = c.select((col("id") + 100000).as("id"),
        concat(
          substring(col("name"), lit(1), length(col("name")) - 2),
          substring(col("name"), length(col("name")), lit(1)),
          substring(col("name"), length(col("name")) - 1, lit(1))).as("name"))
      Dedup.fuzzyPairsKeyed(c.unionByName(variants), "id", "name",
        maxDistance = 2, blockKey = { s =>
          val t = lower(trim(s))
          val n = length(t)
          val c1 = substring(t, n - 1, lit(1))
          val c2 = substring(t, n, lit(1))
          concat(substring(t, lit(1), n - 2), least(c1, c2), greatest(c1, c2))
        })
    }),
    "x_fuzzy_match_dl" -> ((s, dir) => {
      // the same blocked typo corpus scored by BOTH edit distances:
      // plain levenshtein bills the swapped-letters typo 2, true
      // Damerau-Levenshtein (native expression) bills it 1 — the
      // distance an entity-resolution cutoff should use
      val c = Tables.customer(s, dir).filter(col("c_custkey") < 200)
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      val variants = c.select((col("id") + 100000).as("id"),
        concat(
          substring(col("name"), lit(1), length(col("name")) - 2),
          substring(col("name"), length(col("name")), lit(1)),
          substring(col("name"), length(col("name")) - 1, lit(1)))
          .as("name"))
      def key(sc: org.apache.spark.sql.Column) = {
        val t = lower(trim(sc))
        val n = length(t)
        val c1 = substring(t, n - 1, lit(1))
        val c2 = substring(t, n, lit(1))
        concat(substring(t, lit(1), n - 2), least(c1, c2),
          greatest(c1, c2))
      }
      val all = c.unionByName(variants).withColumn("__k", key(col("name")))
      all.as("a").join(all.as("b"),
          col("a.__k") === col("b.__k") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          levenshtein(col("a.name"), col("b.name")).as("lev"),
          graft.functions.Native.damerau_levenshtein(
            col("a.name"), col("b.name")).as("dl"))
        .withColumn("transposition_only",
          col("dl") === 1 && col("lev") === 2)
        .orderBy("id_a", "id_b")
    }),
    "x_cluster_split" -> ((s, dir) =>
      // leakage-free split: hash the near-dup CLUSTER id so a document
      // and its near-copies can never straddle train/test
      Sampling.clusterAwareSplit(
        Tables.documents(s, dir), "doc_id",
        Dedup.jaccardPairs(
          Tables.documents(s, dir).filter(col("doc_id") < 60),
          "doc_id", "text", 3, 0.02, maxDf = 30).select("id_a", "id_b"),
        Seq(("train", 0.8), ("val", 0.9), ("test", 1.0)))),
    "x_dedup_clusters" -> ((s, dir) =>
      Dedup.dedupClusters(
        Dedup.jaccardPairs(Tables.documents(s, dir).filter(col("doc_id") < 60),
          "doc_id", "text", 3, 0.02, maxDf = 30).select("id_a", "id_b"))),
    "x_dedup_clusters_star" -> ((s, dir) =>
      // same pair list through the O(log n)-round large-star/small-star CC
      Dedup.connectedComponentsStar(
          Dedup.jaccardPairs(Tables.documents(s, dir).filter(col("doc_id") < 60),
            "doc_id", "text", 3, 0.02, maxDf = 30).select("id_a", "id_b"),
          "id_a", "id_b")
        .withColumn("is_canonical", col("id") === col("component"))
        .orderBy("id")),
    "x_dedup_clusters_full" -> ((s, dir) =>
      // FULL-corpus near-dup clustering — no probe-subset cap: exact
      // shingle-Jaccard pairs over every document (threshold 0.5 bounds
      // the pair list to true near-dups; maxDf 50 bounds hot shingle
      // buckets), resolved to components. The DuckDB oracle replays the
      // same pair derivation and a recursive-CTE transitive closure over
      // the whole table.
      // round 13: the pair derivation reads the SESSION-PINNED shingle
      // store (Shared.shingles3 — the persisted artifact every verify
      // stage already reads) instead of re-shingling the corpus text
      // once per consumer of the exploded relation.
      Dedup.dedupClusters(
        Dedup.jaccardPairs(Tables.documents(s, dir),
          "doc_id", "text", 3, 0.5, maxDf = 50,
          shinglesPinned = Some(Shared.shingles3(s, dir)))
          .select("id_a", "id_b"))),
    "x_dedup_retain" -> ((s, dir) => {
      // retention over the FULL corpus: near-dup clusters from the probe
      // subset keep their longest member; every other doc is a singleton
      val d = Tables.documents(s, dir)
      Dedup.dedupRetain(d, "doc_id", col("n_chars"),
        Dedup.jaccardPairs(d.filter(col("doc_id") < 60),
          "doc_id", "text", 3, 0.02, maxDf = 30).select("id_a", "id_b"))
    }),
    "x_dedup_weights" -> ((s, dir) => {
      // unbiased dedup: survivors weighted by cluster size so corpus
      // statistics keep their totals (sum of weights = corpus size)
      val d = Tables.documents(s, dir)
      Dedup.dedupRetainWeighted(d, "doc_id", col("n_chars"),
        Dedup.jaccardPairs(d.filter(col("doc_id") < 60),
          "doc_id", "text", 3, 0.02, maxDf = 30).select("id_a", "id_b"))
    }),
    "x_contamination" -> ((s, dir) => {
      // decontamination: per-test-doc 3-gram overlap with the train split
      val d = Tables.documents(s, dir)
      Dedup.contamination(d.filter(col("doc_id") < 250),
        d.filter(col("doc_id") >= 250), "doc_id", "text", n = 3)
    }),
    "x_multimodal_neardups" -> ((s, dir) => {
      // cross-modal dedup: TEXT near-dup pairs (shingle Jaccard) and
      // EMBEDDING near-dup pairs (cell-bucketed cosine) union into ONE
      // cluster resolution — a pair is a pair, whichever modality found
      // it; the oracle replays both pair generators + transitive closure
      val d = Tables.documents(s, dir).filter(col("doc_id") < 60)
      val textPairs = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.02,
        maxDf = 30).select("id_a", "id_b")
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 60)
      val vecPairs = Similarity.cosineNearDups(emb, "vec_id", "embedding",
        "label", 0.4).select("id_a", "id_b")
      Dedup.dedupClusters(textPairs.unionByName(vecPairs))
    }),
    "x_minhash_neardups" -> ((s, dir) =>   // FULL hash oracle (md5 family)
      // reads the first-16 prefix of the shared 64-wide signature store
      Dedup.minHashNearDups(Tables.documents(s, dir), "doc_id", "text",
        sigPinned = Some(minhashSigs64(s, dir)))),
    "x_neardups_verified" -> ((s, dir) =>
      // LSH propose + estimate trim + exact verify, in the
      // PROVABLY-COMPLETE banding config (rows-per-band = 1): a pair
      // reaches candidacy unless NONE of its 64 MinHash components
      // collide ((1-j)^64 ≤ 5e-20 at j ≥ 0.5), and the minEst=0.125 trim
      // drops a true pair only if < 8/64 components agree (≈ 2e-10 at
      // j = 0.5) — so the output is exactly "all pairs with exact Jaccard
      // ≥ 0.5" and DuckDB replays it as a full shingle-Jaccard pair scan
      // (the recall oracle for the whole LSH pipeline)
      Dedup.nearDupsVerified(Tables.documents(s, dir), "doc_id", "text",
        n = 3, numHashes = 64, bands = 64, threshold = 0.5,
        minEst = 0.125,
        sigPinned = Some(minhashSigs64(s, dir)),
        shPinned = Some(shingles3(s, dir)))),
    "x_simhash" -> ((s, dir) =>            // FULL hash oracle (md5 votes)
      Dedup.simHash(Tables.documents(s, dir).filter(col("doc_id") < 50),
        "doc_id", "text")),
    "x_simhash_neardups" -> ((s, dir) =>   // FULL hash oracle (md5 votes)
      // maxHamming < bands(4) keeps the pigeonhole recall guarantee: this
      // is exactly "all pairs within hamming 3", not a banding-luck subset
      Dedup.simHashNearDups(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 3)),
    "x_simhash_recall" -> ((s, dir) => {
      // recall ORACLE for the SimHash band search: every doc gets an
      // identical-text twin (doc_id + 1000000); identical text → identical
      // 64-bit fingerprint → hamming 0 < bands, so by the pigeonhole
      // guarantee every (id, twin) pair is a MUST-FIND. Restricted to the
      // injected pairs the output is fully deterministic — one row per doc
      // with hamming 0 — which DuckDB replays trivially; any fingerprint /
      // banding / verify-join defect drops a row and mismatches.
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val twins = d.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.simHashNearDups(d.unionByName(twins), "doc_id", "text",
          maxHamming = 3, bands = 4)
        .filter(col("id_b") === col("id_a") + 1000000L)
        .orderBy("id_a")
    }),

    "x_heavy_hitters" -> ((s, dir) =>
      // Misra-Gries propose + exact verify: ≡ GROUP BY + HAVING without
      // shuffling the key space (the hot-domain / hot-URL detector)
      Frequency.heavyHitters(Tables.events(s, dir), "event_type",
        minShare = 0.1)),
  )
}
