package graft
package registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._
import Shared._

/** SURVEY §7.4 text analysis and the LLM training-data pipelines.
  *
  * One domain slice of the query registry (split out of SparkEntry in
  * round 8 — wiring only, no behavior change; [[graft.SparkEntry]]
  * assembles and uniqueness-checks the full map).
  */
object TextRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §7.4 text analysis ------------------------------------------------
    "x_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(Tables.documents(s, dir), "doc_id", "text")),
    "x_heaps_law" -> ((s, dir) =>
      // vocabulary-growth curve in doc order: running token count and
      // running distinct-vocab size via the sliced prefix scan — the
      // corpus-health diagnostic that flags template/duplicated filler
      TextAnalysis.heapsLaw(Tables.documents(s, dir), "doc_id", "text")),
    "x_zipf_law" -> ((s, dir) =>
      // the static power-law companion: OLS of ln(count) on ln(rank)
      // over the top-300 vocabulary, lattice-committed OLS sums
      TextAnalysis.zipfLaw(Tables.documents(s, dir), "doc_id", "text",
        minCount = 5, maxRank = 300)),
    "x_curation_funnel" -> ((s, dir) =>
      // which quality gate eats the corpus: per-stage attrition over
      // the ordered filter rules, one fold
      TextAnalysis.curationFunnel(Tables.documents(s, dir), "doc_id",
        "text")),
    "x_span_corruption" -> ((s, dir) =>
      // T5 denoising targets: seeded-hash span selection (no RNG),
      // island coalescing, per-span rows with exact reassembled text
      TextAnalysis.spanCorruption(Tables.documents(s, dir), "doc_id",
        "text")),
    "x_naive_bayes" -> ((s, dir) =>
      // counting classifier trained in-engine on the modulus split:
      // per-test-doc language prediction, exact-long argmax
      Learn.naiveBayesText(Tables.documents(s, dir), "doc_id", "text",
        "lang")),
    "x_nb_confusion" -> ((s, dir) => {
      // true-vs-predicted language matrix with within-truth shares —
      // the one-glance readout over x_naive_bayes
      val nb = Learn.naiveBayesText(Tables.documents(s, dir), "doc_id",
        "text", "lang")
      val w = Window.partitionBy(col("label"))
      nb.groupBy(col("label"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share",
          round(col("n") / sum(col("n")).over(w).cast("double"), 6))
        .orderBy("label", "predicted")
    }),
    "x_ngram_novelty" -> ((s, dir) =>
      // duplicated-text share per doc (Lee et al. 2022, doc-granular):
      // fraction of each doc's distinct 3-grams first seen in an earlier
      // doc — no pair space, one gram-keyed join
      TextAnalysis.ngramNovelty(Tables.documents(s, dir), "doc_id", "text",
        n = 3)),
    "x_quality_scores" -> ((s, dir) =>
      TextAnalysis.qualityScores(Tables.documents(s, dir), "doc_id", "text")),
    "x_quality_filter" -> ((s, dir) =>
      // the C4/Gopher rule battery with per-rule audit columns — rounded
      // signals, engine-independent verdicts, one narrow projection
      TextAnalysis.qualityFilter(Tables.documents(s, dir), "doc_id",
        "text")),
    "x_lang_stats" -> ((s, dir) =>
      TextAnalysis.langStats(Tables.documents(s, dir), "lang", "text")),
    "x_lang_id" -> ((s, dir) =>
      TextAnalysis.languageId(Tables.documents(s, dir), "doc_id", "text")),
    "x_fingerprints" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir), "doc_id", "text")),
    "x_char_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(Tables.documents(s, dir), "doc_id", "text")),
    "x_repetition" -> ((s, dir) =>
      // Gopher-rule repetition filter: duplicate n-gram ratios per doc
      TextAnalysis.repetitionScores(Tables.documents(s, dir), "doc_id",
        "text")),
    "x_tfidf_terms" -> ((s, dir) =>
      // salient-term extraction: smooth-idf TF-IDF, top-3 per document
      TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text",
        k = 3)),
    "x_lm_surprisal" -> ((s, dir) =>
      // CCNet-style unigram-LM surprisal; 100-term vocab so the OOV
      // floor path carries real weight
      TextAnalysis.lmSurprisal(Tables.documents(s, dir), "doc_id", "text",
        vocabSize = 100)),
    "x_rake_keywords" -> ((s, dir) =>
      // phrase-level keywords tf-idf's single words can't give: RAKE
      // degree/frequency over stopword-break runs, top 20
      TextAnalysis.rakeKeywords(Tables.documents(s, dir), "doc_id",
        "text", stopwords = Seq("the", "a", "an", "of", "and", "in",
          "to", "is"), k = 20)),
    "x_kn_bigram" -> ((s, dir) =>
      // word-salad detector the unigram score misses: interpolated
      // Kneser-Ney bigram cross-entropy, -log2 p on the 1e-9 lattice
      TextAnalysis.knBigramEntropy(Tables.documents(s, dir), "doc_id",
        "text", discount = 0.75)),
    "x_shared_spans" -> ((s, dir) =>
      // winnowing dup-span detection (MOSS): any shared 47-char run
      // (k+w−1) is guaranteed a shared fingerprint; df∈[2,5] drops
      // corpus-wide boilerplate grams. The span table is the shared
      // per-corpus artifact (Shared.winnowSpans) the contamination
      // screen and the v3 pipeline's dedup stage also read
      winnowSpans(s, dir)),
    "x_readability" -> ((s, dir) =>
      // Flesch reading ease per doc (vowel-group syllable estimate,
      // terminal-punctuation sentences) + banding on the rounded score
      TextAnalysis.readability(Tables.documents(s, dir), "doc_id",
        "text")),
    "x_dup_substrings" -> ((s, dir) =>
      // ExactSubstr (Lee et al. 2022): maximal duplicated 20-gram span
      // islands per doc, corpus-global first occurrence kept — the
      // exact character ranges substring dedup would cut
      dupSpans(s, dir)),
    "x_dup_substring_stats" -> ((s, dir) =>
      // the go/no-go readout: per-doc removable duplicated chars and
      // ratio (zero-span docs included) — rolls up the SAME span table
      // x_dup_substrings exports (Shared.dupSpans) instead of re-mining
      // the gram windows
      Dedup.duplicatedSpanStats(Tables.documents(s, dir), "doc_id",
        "text", k = 20, spansPinned = Some(dupSpans(s, dir)))),
    "x_contamination_spans" -> ((s, dir) => {
      // benchmark-contamination detection at SPAN level (stronger than
      // x_contamination's shingle overlap): training docs sharing a
      // winnow-fingerprinted 32-gram with any held-out benchmark doc
      // (doc_id % 10 == 0), with the matched-span evidence
      val spans = winnowSpans(s, dir)
      val hits = spans
        .filter((col("doc_a") % 10 === 0) =!= (col("doc_b") % 10 === 0))
        .select(
          when(col("doc_a") % 10 === 0, col("doc_b"))
            .otherwise(col("doc_a")).as("train_doc"),
          when(col("doc_a") % 10 === 0, col("doc_a"))
            .otherwise(col("doc_b")).as("bench_doc"),
          col("n_shared"))
      hits.groupBy("train_doc")
        .agg(count(lit(1)).cast("long").as("n_bench_docs"),
          sum("n_shared").cast("long").as("n_shared_grams"),
          min("bench_doc").as("first_bench_doc"))
        .orderBy("train_doc")
    }),
    "x_langid_kappa" -> ((s, dir) => {
      // classifier-vs-gold label quality: Cohen's kappa of the n-gram
      // language-ID heuristic against the corpus lang column — the
      // chance-corrected agreement plain accuracy overstates
      val docs = Tables.documents(s, dir)
      val pred = TextAnalysis.languageId(docs, "doc_id", "text")
        .select(col("doc_id"), col("predicted_lang"))
      Eval.cohensKappa(
        pred.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")),
        "predicted_lang", "lang")
    }),
    "x_fleiss_kappa" -> ((s, dir) => {
      // annotation QA for a 5-labeler panel: each synthetic rater
      // reports the gold lang at 70% (u01 channel 100+r) and a hash-
      // confused lang otherwise (channel 300+r) — the complete-panel
      // agreement readout before majority-vote labels are trusted
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang")).filter(col("lang").isNotNull)
      val langs = Seq("de", "en", "es", "fr", "zh")
      def confused(r: Int) = {
        val idx = (ceil(Gen.u01(col("doc_id"), 300L + r) * 5)
          .cast("int") - 1)
        when(idx === 0, langs(0)).when(idx === 1, langs(1))
          .when(idx === 2, langs(2)).when(idx === 3, langs(3))
          .otherwise(langs(4))
      }
      val ratings = (1 to 5).map(r => docs.select(col("doc_id"),
          when(Gen.u01(col("doc_id"), 100L + r) < 0.7, col("lang"))
            .otherwise(confused(r)).as("cat")))
        .reduce(_ unionByName _)
      Eval.fleissKappa(ratings, "doc_id", "cat", nRaters = 5,
        cats = langs)
    }),
    "x_kripp_alpha" -> ((s, dir) => {
      // the missing-tolerant sibling: the same 5-rater panel but each
      // rater abstains 15% of the time (channel 200+r); units keep
      // pairable information with >=2 ratings — Krippendorff's alpha
      // over the exact-integer coincidence fold
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang")).filter(col("lang").isNotNull)
      val langs = Seq("de", "en", "es", "fr", "zh")
      def confused(r: Int) = {
        val idx = (ceil(Gen.u01(col("doc_id"), 300L + r) * 5)
          .cast("int") - 1)
        when(idx === 0, langs(0)).when(idx === 1, langs(1))
          .when(idx === 2, langs(2)).when(idx === 3, langs(3))
          .otherwise(langs(4))
      }
      val ratings = (1 to 5).map(r => docs
          .filter(Gen.u01(col("doc_id"), 200L + r) >= 0.15)
          .select(col("doc_id"),
            when(Gen.u01(col("doc_id"), 100L + r) < 0.7, col("lang"))
              .otherwise(confused(r)).as("cat")))
        .reduce(_ unionByName _)
      Eval.krippendorffAlpha(ratings, "doc_id", "cat", cats = langs)
    }),
    "x_vocab_drift" -> ((s, dir) =>
      // corpus drift at the token level: smoothed JS divergence between
      // slices over an integer-elected top-50 vocabulary + <other>
      TextAnalysis.vocabDrift(Tables.documents(s, dir), "text", "lang",
        "en", "de", topV = 50)),
    "x_langid_prf" -> ((s, dir) => {
      // the class-level complement of the kappa number: per-language
      // precision/recall/F1 — shows WHICH language the heuristic misses
      val docs = Tables.documents(s, dir)
      val pred = TextAnalysis.languageId(docs, "doc_id", "text")
        .select(col("doc_id"), col("predicted_lang"))
      Eval.classificationReport(
        pred.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")),
        goldCol = "lang", predCol = "predicted_lang")
    }),
    "x_wordpiece_vocab" -> ((s, dir) =>
      // the third tokenizer family: frequency-ranked WordPiece pieces
      // (top-64 initial + top-64 continuation + forced single chars),
      // trained on the distinct-word grain — fully SQL-replayable
      Bpe.wordPieceVocabDf(Tables.documents(s, dir), "text",
        maxPieceLen = 6, topK = 64)),
    "x_wordpiece_tokens" -> ((s, dir) => {
      // per-doc greedy-maxmatch token stats under the trained vocab;
      // the oracle replays maxmatch as a fixed-depth unroll over the
      // distinct-word grain (fail-loud guard on the unroll bound)
      val (init, cont) = wordPieceTables(s, dir)
      Bpe.wordPieceStats(Tables.documents(s, dir), "doc_id", "text",
        init, cont, maxPieceLen = 6, maxWordLen = 12)
    }),
    "x_unigram_tokens" -> ((s, dir) =>
      // the second tokenizer family: hard-EM (Viterbi) unigram-LM pieces
      // (Kudo 2018), trained once per corpus; per-doc token stats under
      // the trained table. FULL hash oracle since the lattice rewrite:
      // scores are 1e-9-lattice integers, so the oracle replays the
      // trainer verbatim and unrolls the Viterbi DP cell per cell
      Unigram.tokenStats(Tables.documents(s, dir), "doc_id", "text",
        unigramTable(s, dir), maxPieceLen = 4)),
    "x_tokenizer_shootout" -> ((s, dir) => {
      // the tokenizer-selection readout: all three trained families
      // (BPE merge-order, WordPiece maxmatch, unigram Viterbi) over the
      // same corpus in one table — artifact size vs corpus fertility is
      // THE budget trade a pipeline owner actually decides on. Shares
      // every trained artifact (bpeMerges / wordPieceTables /
      // unigramTable); the oracle concatenates all three trainer
      // replays into one statement
      val docs = Tables.documents(s, dir)
      val (init, cont) = wordPieceTables(s, dir)
      def roll(stats: DataFrame, name: String, vocabN: Long) = stats
        .agg(sum(col("n_words").cast("long")).as("total_words"),
          sum(col("n_tokens").cast("long")).as("total_tokens"))
        .select(lit(name).as("tokenizer"),
          lit(vocabN).as("vocab_entries"),
          col("total_words"), col("total_tokens"),
          round(col("total_tokens").cast("double") /
            col("total_words"), 6).as("fertility"))
      roll(Bpe.tokenStats(docs, "doc_id", "text", bpeMerges(s, dir)),
          "bpe", Bpe.OracleK.toLong)
        .unionByName(roll(Bpe.wordPieceStats(docs, "doc_id", "text",
          init, cont, maxPieceLen = 6, maxWordLen = 12),
          "wordpiece", (init.size + cont.size).toLong))
        .unionByName(roll(Unigram.tokenStats(docs, "doc_id", "text",
          unigramTable(s, dir), maxPieceLen = 4),
          "unigram", unigramTable(s, dir).size.toLong))
        .orderBy("tokenizer")
    }),
    "x_skipgram_pairs" -> ((s, dir) =>
      // the word2vec training-set generator: windowed positives +
      // seeded unigram^0.75 negatives (prefix-sum inverse CDF), every
      // draw a pure function of its (doc, pos, off, j) coordinates
      TextAnalysis.skipGramPairs(Tables.documents(s, dir), "doc_id",
        "text", window = 2, negK = 2)),
    "x_lexical_diversity" -> ((s, dir) =>
      // vocabulary richness per doc: TTR, hapax share, Simpson's D —
      // the type-frequency quality view beside length/stopword ratios
      TextAnalysis.lexicalDiversity(Tables.documents(s, dir), "doc_id",
        "text")),
    "x_unigram_vocab" -> ((s, dir) => {
      // the trained artifact itself (the x_wordpiece_vocab twin): piece +
      // 1e-9-lattice log-prob, full hash oracle via the trainer replay
      import s.implicits._
      unigramTable(s, dir).toDF("piece", "llp").orderBy("piece")
    }),
    "x_unigram_chars" -> ((s, dir) =>
      // the provably-replayable anchor: maxPieceLen = 1 forces every
      // segmentation to single characters, so token counts equal
      // non-whitespace character counts — which SQL computes directly
      Unigram.tokenStats(Tables.documents(s, dir), "doc_id", "text",
        Unigram.trainDistributed(Tables.documents(s, dir), "text",
          vocabSize = 200, rounds = 1, maxPieceLen = 1),
        maxPieceLen = 1)),
    "x_bpe_vocab_usage" -> ((s, dir) => {
      // vocabulary utilization: per-token usage over the encoded corpus
      // with cumulative coverage — the dead-weight-vocab audit (pieces
      // the budget paid for that the corpus never uses); vocab-bounded
      val toks = Tables.documents(s, dir)
        .select(explode(graft.ops.Bpe.encode(col("text"),
          bpeMerges(s, dir))).as("token"))
      val counts = toks.groupBy("token")
        .agg(count(lit(1)).cast("long").as("cnt"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      val ord = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("token"))
      counts
        .withColumn("__tot", sum(col("cnt")).over(w))
        .withColumn("share", round(col("cnt") / col("__tot"), 6))
        .withColumn("cum_share",
          round(sum(col("cnt")).over(ord.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            / col("__tot"), 6))
        .withColumn("rank", row_number().over(ord).cast("long"))
        .select(col("rank"), col("token"), col("cnt"), col("share"),
          col("cum_share"))
        .orderBy("rank")
    }),
    "x_unigram_fertility" -> ((s, dir) => {
      // tokenizer-fairness twin of x_bpe_fertility under the unigram
      // vocabulary (full hash oracle like x_unigram_tokens)
      val docs = Tables.documents(s, dir)
      val stats = Unigram.tokenStats(docs, "doc_id", "text",
        unigramTable(s, dir), maxPieceLen = 4)
      docs.select(col("doc_id"), col("lang"))
        .join(stats, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_words")).cast("long").as("total_words"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          round(sum(col("n_tokens")).cast("double") /
            sum(col("n_words")), 6).as("fertility"))
        .orderBy("lang")
    }),
    "x_bpe_fertility" -> ((s, dir) => {
      // tokenizer fairness: per-language fertility under the trained
      // merges — the multilingual-equity readout (a vocab fitted on one
      // language taxes the others with more tokens per word)
      val docs = Tables.documents(s, dir)
      Bpe.tokenStats(docs, "doc_id", "text", bpeMerges(s, dir))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_words").cast("long").as("total_words"),
          sum("n_tokens").cast("long").as("total_tokens"),
          round(sum("n_tokens").cast("double") / sum("n_words"), 6)
            .as("fertility"))
        .orderBy("lang")
    }),
    "x_lm_perplexity" -> ((s, dir) =>
      // the full CCNet recipe (x_lm_surprisal is the unigram degenerate):
      // interpolated bigram LM fitted on the English reference slice,
      // per-token cross-entropy scored over EVERY document. The scored
      // table is the shared per-corpus artifact (Shared.lmScored) the
      // curriculum stager and the v3 pipeline's filter stage also read
      lmScored(s, dir)),
    "x_curriculum" -> ((s, dir) => {
      // curriculum staging: perplexity quartiles → clean→noisy training
      // stages with per-stage token budgets (cuts are a broadcast 1-row
      // aggregate; stage election compares ROUNDED values both engines
      // share)
      val scored = lmScored(s, dir)
      val cuts = scored.agg(
        round(expr("percentile(ce_bits, 0.25D)"), 6).as("q1"),
        round(expr("percentile(ce_bits, 0.5D)"), 6).as("q2"),
        round(expr("percentile(ce_bits, 0.75D)"), 6).as("q3"))
      scored.crossJoin(broadcast(cuts))
        .withColumn("stage",
          when(col("ce_bits") <= col("q1"), 0)
            .when(col("ce_bits") <= col("q2"), 1)
            .when(col("ce_bits") <= col("q3"), 2).otherwise(3))
        .groupBy("stage")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_tokens").cast("long").as("total_tokens"),
          round(avg("ce_bits"), 6).as("avg_ce_bits"),
          round(min("ce_bits"), 6).as("min_ce_bits"),
          round(max("ce_bits"), 6).as("max_ce_bits"))
        .orderBy("stage")
    }),
    "x_llm_pipeline_v3" -> ((s, dir) => {
      // round-7 curation capstone — every stage individually
      // oracle-verified, chained end to end: bigram-perplexity filter
      // (≤ p75) → winnow span dedup (keep first occurrence, drop the
      // later doc of every fingerprinted pair) → pack survivors by REAL
      // BPE token cost → per-pack manifest
      val docs = Tables.documents(s, dir)
      // filter + dedup stages read the shared scored/span artifacts
      // (Shared.lmScored / winnowSpans) the standalone queries export
      val scored = lmScored(s, dir)
      val q3 = scored.agg(
        round(expr("percentile(ce_bits, 0.75D)"), 6).as("q3"))
      val kept = scored.crossJoin(broadcast(q3))
        .filter(col("ce_bits") <= col("q3")).select("doc_id")
      val drops = winnowSpans(s, dir)
        .select(col("doc_b").as("doc_id")).distinct()
      val surv = kept.join(drops, Seq("doc_id"), "left_anti")
      val counts = Bpe.tokenStats(docs, "doc_id", "text", bpeMerges(s, dir))
        .join(surv, Seq("doc_id"), "left_semi")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("lang"), col("doc_id"), col("n_tokens"))
      Sampling.packSequences(counts, "lang", "doc_id", "n_tokens",
          maxTokens = 4096)
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_tokens").cast("long").as("pack_tokens"))
        .orderBy("lang", "pack_id")
    }),
    "x_pack_bpe" -> ((s, dir) => {
      // context-window packing by REAL tokenizer cost (the whitespace
      // counts q_pack_sequences uses under-fill windows by the fertility
      // factor ~4×): same prefix-sum rule, BPE token costs
      val docs = Tables.documents(s, dir)
      val counts = Bpe.tokenStats(docs, "doc_id", "text", bpeMerges(s, dir))
        .select(col("doc_id"), col("n_tokens"))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("lang"), col("doc_id"), col("n_tokens"))
      Sampling.packSequences(counts, "lang", "doc_id", "n_tokens",
          maxTokens = 4096)
        .orderBy("lang", "doc_id")
    }),
    "x_rake_weights" -> ((s, dir) =>
      // balance the corpus mixture: IPF-rake (lang x source) cells to
      // uniform marginals, 3 lattice-committed supersteps
      Sampling.rakeWeights(Tables.documents(s, dir), "lang", "source")),
    "x_dataset_card" -> ((s, dir) =>
      // the release cover page: size, language spread, token volume,
      // exact-dup rate as metric/value rows from one scan
      TextAnalysis.datasetCard(Tables.documents(s, dir), "text", "lang")),
    "x_dsir_ess" -> ((s, dir) => {
      // how much statistical mass survives the DSIR reweighting: Kish
      // ESS over the per-token-normalized importance weights
      val w = TextAnalysis.dsirWeights(Tables.documents(s, dir),
        "doc_id", "text", col("lang") === "en", numBuckets = 1024)
      Sampling.effectiveSampleSize(
        w.select(col("doc_id"), exp(round(col("log_w"), 6) /
          greatest(col("n_tokens"), lit(1L)).cast("double")).as("weight")),
        "weight")
    }),
    "x_dsir_sample" -> ((s, dir) => {
      // DSIR: weight every doc by the hashed-unigram LM ratio toward the
      // English target slice, then Gumbel-top-k importance resampling —
      // priority rounded at 6 (the g_weighted_sample precedent) so both
      // engines elect the identical sample
      val w = TextAnalysis.dsirWeights(Tables.documents(s, dir),
        "doc_id", "text", col("lang") === "en", numBuckets = 1024)
      val u = least(graft.ops.Gen.u01(col("doc_id"), 97L),
        lit(1.0 - 1e-12)) // u=1 would send the Gumbel to +inf
      w.withColumn("key", round(col("log_w") - log(-log(u)), 6))
        .orderBy(col("key").desc, col("doc_id").asc)
        .limit(100)
        .select(col("doc_id"), col("n_tokens"),
          round(col("log_w"), 6).as("log_w"))
        .orderBy("doc_id")
    }),
    "x_chunk_windows" -> ((s, dir) =>
      // context-window prep: overlapping 32-token chunks every 16 tokens,
      // chunk index kept so downstream packing can restore document order
      TextAnalysis.chunkWindows(Tables.documents(s, dir), "doc_id", "text",
        window = 32, stride = 16)),
    "x_dedup_lines" -> ((s, dir) => {
      // cross-document line dedup (the RefinedWeb/Dolma paragraph rule:
      // each line survives only at its first corpus-wide occurrence). The
      // corpus is single-line, so the query injects line structure first —
      // every doc re-chunked into 8-word lines (deterministic, replayed by
      // the oracle) — then dedups lines across the whole corpus. Empty
      // docs are excluded symmetrically with the oracle's WHERE (the
      // operator itself keeps them as one blank line; the oracle's
      // line-derivation CTE cannot represent that).
      // the shared cleaned-corpus artifact plus the export's id sort
      dedupedLines(s, dir).orderBy(col("doc_id"))
    }),
    "x_corpus_shuffle" -> ((s, dir) =>
      // deterministic shuffled-shard layout for training reads: uniform
      // hash shard + independent-channel within-shard order, stable under
      // reruns and corpus append
      Sampling.corpusShuffle(Tables.documents(s, dir), "doc_id",
        nShards = 8)),
    "x_llm_pipeline_v2" -> ((s, dir) => {
      // the CHUNK-level training-data pipeline, composed from this round's
      // operators: inject 8-word line structure → cross-document line
      // dedup → doc floor (≥ 2 surviving lines) → 16-token context
      // windows → deterministic shard layout → per-shard corpus summary.
      // Every stage is individually oracle-checked; the composite chains
      // their CTEs in DuckDB.
      // unordered relation forms mid-pipeline: the export sorts inside
      // dedupLines/chunkWindows would otherwise survive as global
      // range-exchange+Sort stages under the final aggregate. The clean
      // stage chains from the shared line-dedup artifact
      // (Shared.dedupedLines — the same relation x_dedup_lines exports)
      val clean = dedupedLines(s, dir)
        .filter(col("n_lines_kept") >= 2)
        .select(col("doc_id"), col("clean_text").as("text"))
      // chunk_key is the ·10⁶ positional encoding, now GUARDED (posKey
      // raise_errors past a million chunks per doc instead of colliding);
      // the summary only needs the SHARD, so the assignment runs inline —
      // no within-shard rank, no checkpoint, no join back
      TextAnalysis.chunkRelation(clean, "doc_id", "text",
          window = 16, stride = 16)
        .withColumn("chunk_key",
          TextAnalysis.posKey(col("doc_id"), col("chunk_idx")))
        .withColumn("shard", Sampling.shardOf(col("chunk_key"), 8))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens").cast("long")).as("total_tokens"))
        .orderBy("shard")
    }),
    "x_pii_scrub" -> ((s, dir) => {
      // deterministic PII injection so the scrub exercises on every row
      val injected = concat(col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@mail.example.com or +1 (555) 010-"), col("doc_id"),
        lit(" ref 123456789"))
      val (ne, np) = TextAnalysis.piiCounts(injected)
      Tables.documents(s, dir).select(col("doc_id"),
          TextAnalysis.scrubPii(injected).as("clean_text"),
          ne.as("n_emails"), np.as("n_phones"))
        .orderBy("doc_id")
    }),

    // ---- the LLM training-data pipeline end to end -------------------------
    // quality filter (token floor + repetition cut) → exact dedup (lowest
    // id per content fingerprint) → per-language hashed cap → corpus
    "x_training_set_pipeline" -> ((s, dir) => {
      // the leakage-safe supervised-training prep, end to end: forward
      // labels (24h purchase horizon) → purged temporal split with
      // embargo ≥ horizon (so no test label is computed FROM train-time
      // futures) → entity-safe folds → per-(split, fold) class audit.
      // Every stage is an oracle-verified operator.
      val labeled = Retrieval.futureLabels(
        Tables.events(s, dir).select(col("event_id"), col("user_id"),
          col("ts"), col("event_type")),
        "user_id", "ts", "event_id",
        col("event_type") === "purchase", "24 HOURS")
      val split = Sampling.temporalSplit(labeled, "ts",
        "2024-01-15 00:00:00", embargoDays = 1)
      Sampling.groupKFold(split, "user_id", k = 5)
        .groupBy("split", "fold")
        .agg(count(lit(1)).as("n"),
          sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("split", "fold")
    }),
    // summary: every stage is an oracle-verified operator, composed the
    // way a real pretraining-data job chains them
    "x_llm_pipeline" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val filtered = d
        .withColumn("n_tokens",
          size(TextAnalysis.tokens(lower(col("text")))))
        .withColumn("dup2", TextAnalysis.dupNGramRatio(lower(col("text")), 2))
        .filter(col("n_tokens") >= 20 && col("dup2") <= 0.2)
      val deduped = filtered
        .withColumn("fp", Dedup.fingerprint(col("text")))
        .groupBy(col("fp"))
        .agg(min(struct(col("doc_id"), col("lang"), col("n_tokens")))
          .as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
          col("r.n_tokens").as("n_tokens"))
        // the histogram cap consumes its input twice (counts + selection);
        // checkpoint the small surviving id set so the shingle-scoring +
        // dedup upstream runs once, not per consumer
        .localCheckpoint()
      Sampling.quotaCapHashed(deduped, "lang", "doc_id", n = 150,
          channel = 41L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
        .orderBy("lang")
    }),
  )
}
