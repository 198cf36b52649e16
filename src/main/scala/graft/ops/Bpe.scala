package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Native

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the vocabulary
  * construction step of every modern LLM data pipeline, trained and applied
  * corpus-scale. The reference pipeline tokenizes by whitespace only
  * (`spark/apps/clickstream_aggregation.py` has no subword stage); this is
  * one of the SURVEY §7.4 training-data extensions.
  *
  * Three pieces, each with the 100 TB posture stated on it:
  *
  *   - [[trainMergesDistributed]] — the scale path. The corpus is scanned
  *     ONCE to build the (distinct word, frequency) table; every merge
  *     superstep after that runs on the vocab-bounded word table (a few
  *     hundred thousand rows for web-scale corpora — Heaps' law, not
  *     corpus-sized), as one map-side-combined pair-count aggregation plus
  *     a one-row argmax collect (the merge decision is inherently
  *     sequential — k driver round-trips of ONE ROW each, k = the vocab
  *     budget, independent of corpus size).
  *   - [[trainFromSample]] — the bounded-sample local trainer
  *     (SentencePiece-style input sampling; same sanctioned pattern as the
  *     IVF codebook sample in `Similarity.collectSample`).
  *   - [[encode]] — distributed application: the merge list rides inside
  *     the native `BpeEncode` expression (broadcast with the plan, one
  *     tight memoized JVM loop per row, no join, no shuffle).
  *
  * Determinism contract (what makes the DuckDB oracle replay exact): words
  * are `lower(trim(text))` split on `\s+`; a merge step counts adjacent
  * symbol pairs over the CURRENT segmentation (overlapping occurrences,
  * frequency-weighted) and elects max count with ties broken by
  * (left, right) ascending binary compare; applying a merge rewrites
  * left-to-right non-overlapping. Merges never cross word boundaries.
  * Symbols are codepoints in the local/encode paths; the oracle-checked
  * corpora are ASCII, where codepoint, UTF-16 unit and byte orderings all
  * coincide.
  */
object Bpe {

  /** Merge count used by the oracle-checked registry entries — the DuckDB
    * replay unrolls one CTE block per merge, so it stays small there; the
    * trainers take any budget.
    */
  val OracleK: Int = 6

  /** Codepoint-safe split of a word into single-character symbols (a
    * surrogate pair is ONE symbol).
    */
  def charSymbols(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      b += w.substring(i, i + n)
      i += n
    }
    b.result()
  }

  /** One left-to-right non-overlapping merge pass: `[a,a,a]` under merge
    * (a,a) becomes `[aa,a]`, never `[a,aa]`.
    */
  def mergePair(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Deterministic local trainer over a word-frequency table — the
    * reference semantics the distributed trainer and the DuckDB oracle
    * must both reproduce (BpeSpec asserts all three agree).
    */
  def trainMergesLocal(wordFreq: Seq[(String, Long)],
                       numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"bpe: numMerges must be >= 0, got $numMerges")
    var words: Vector[(Vector[String], Long)] =
      wordFreq.toVector.map { case (w, f) => (charSymbols(w), f) }
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (l, r) = counts.toVector.minBy {
          case ((a, b), c) => (-c, a, b)
        }._1
        merges += ((l, r))
        words = words.map { case (syms, f) => (mergePair(syms, l, r), f) }
        step += 1
      }
    }
    merges.result()
  }

  /** Bounded-sample trainer: hash-ordered deterministic top-`sampleCap`
    * documents collected to the driver (the `Similarity.collectSample`
    * pattern — fixed cost regardless of corpus size), word frequencies
    * folded locally, then [[trainMergesLocal]].
    */
  def trainFromSample(docs: DataFrame, idCol: String, textCol: String,
                      sampleCap: Int, numMerges: Int): Seq[(String, String)] = {
    val texts = docs
      .select(col(textCol).cast("string").as("t"), col(idCol))
      .filter(col("t").isNotNull)
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(sampleCap)
      .collect()
      .map(_.getString(0))
    val freq = mutable.HashMap.empty[String, Long]
    texts.foreach { t =>
      t.trim.toLowerCase.split("\\s+").foreach { w =>
        if (w.nonEmpty) freq.update(w, freq.getOrElse(w, 0L) + 1L)
      }
    }
    trainMergesLocal(freq.toSeq, numMerges)
  }

  /** The space-doubling literal-replace trick that applies one merge to a
    * space-joined, space-padded symbol string in three codegen'd
    * `replace` calls: double every separator so adjacent pair occurrences
    * stop competing for a shared space, rewrite the pair, collapse. This
    * reproduces left-to-right non-overlapping exactly (`" a a a "` under
    * (a,a) → `" aa a "`), and the DuckDB oracle uses the identical
    * three-replace chain.
    */
  def applyMerge(s: Column, l: String, r: String): Column =
    replace(
      replace(
        replace(s, lit(" "), lit("  ")),
        lit(s" $l  $r "), lit(s" $l$r ")),
      lit("  "), lit(" "))

  /** The 100 TB trainer. ONE corpus scan builds the (distinct word, freq)
    * table (map-side-combined aggregation, output vocab-bounded); each of
    * the `numMerges` supersteps then runs entirely on that table: one
    * pair-count aggregation (adjacent symbols via zip-with-shifted, again
    * map-side combined, output bounded by |symbol vocab|²-distinct-pairs),
    * a ONE-ROW argmax collect (count desc, pair ascending — the merge
    * election is inherently sequential), and a narrow three-`replace`
    * rewrite ([[applyMerge]]). `localCheckpoint` materializes the word
    * table once so supersteps never re-read the corpus.
    */
  def trainMergesDistributed(docs: DataFrame, textCol: String,
                             numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"bpe: numMerges must be >= 0, got $numMerges")
    var words = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "),
          trim(regexp_replace(col("w"), "(.)", "$1 ")), lit(" ")).as("s"),
        col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val top = words
        .select(col("freq"), split(trim(col("s")), " ").as("syms"))
        .select(col("freq"),
          explode(zip_with(col("syms"),
            slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .filter(col("p.r").isNotNull)
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        merges += ((l, r))
        words = words.select(applyMerge(col("s"), l, r).as("s"), col("freq"))
        step += 1
      }
    }
    merges.result()
  }

  /** Distributed application of a trained merge list: array of subword
    * tokens per document (see `Native.BpeEncode`).
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    Native.bpe_encode(text, merges)

  /** The learned merge table as a DataFrame — rank order IS merge order. */
  def mergesDf(spark: SparkSession,
               merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, l + r) }
      .toDF("rank", "left_sym", "right_sym", "merged")
  }

  /** Per-document subword statistics under a trained merge list: word
    * count, BPE token count, fertility (tokens per word — THE tokenizer
    * quality number), and the round-trip invariant (concatenating a
    * document's tokens must reproduce its normalized text exactly; merges
    * never cross word boundaries, so this catches any encode defect).
    * One narrow projection — no shuffle; whitespace-only documents are
    * excluded (no words to tokenize), symmetrically with the oracle.
    *
    * The DuckDB replay marks word boundaries with chr(1) inside its
    * flattened symbol string; a corpus that CONTAINS that codepoint would
    * alias with the marker, so the query fails loud (the `sweepExact`
    * guard precedent) instead of silently diverging.
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val t = col(textCol)
    val wordsArr = filter(split(trim(lower(t)), "\\s+"),
      w => w =!= "")
    val toks = encode(t, merges)
    docs
      .filter(trim(t) =!= "")
      .select(col(idCol),
        when(t.contains("\u0001"),
          raise_error(concat(lit("bpe: document "), col(idCol).cast("string"),
            lit(" contains the \\u0001 word-boundary marker"))))
          .otherwise(size(wordsArr)).cast("long").as("n_words"),
        size(toks).cast("long").as("n_tokens"),
        (array_join(toks, "") ===
          regexp_replace(trim(lower(t)), "\\s+", "")).as("roundtrip_ok"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          round(col("n_tokens").cast("double") / col("n_words"), 6)))
      .select(col(idCol), col("n_words"), col("n_tokens"), col("fertility"),
        col("roundtrip_ok"))
      .orderBy(col(idCol))
  }

  // -------------------------------------------------------------------
  // WordPiece (greedy longest-match) — the third tokenizer of the triad
  // -------------------------------------------------------------------

  /** Frequency-ranked WordPiece-style vocabulary: the top `topK`
    * word-INITIAL substrings and top `topK` CONTINUATION substrings
    * (length ≤ `maxPieceLen`, weighted by word frequency, ties by piece
    * string), with every corpus single character force-included in both
    * forms so greedy maxmatch always terminates. The canonical WordPiece
    * trainer ranks merges by likelihood gain; frequency ranking is the
    * deterministic, one-pass, SQL-replayable stand-in (documented
    * simplification — inference is the standard greedy maxmatch either
    * way).
    *
    * Scale posture: substring explosion runs on the DISTINCT-WORD grain
    * (bounded by Heaps' law, not corpus size) with fan-out ≤
    * len·maxPieceLen per word; the two driver-side collects are
    * top-K/alphabet bounded by construction.
    *
    * Returns (initial pieces, continuation pieces), each sorted.
    */
  def wordPieceVocab(docs: DataFrame, textCol: String,
                     maxPieceLen: Int = 6,
                     topK: Int = 64): (Seq[String], Seq[String]) = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"wordPieceVocab: maxPieceLen in [1,16] (got $maxPieceLen)")
    require(topK >= 1 && topK <= 4096,
      s"wordPieceVocab: topK in [1,4096] (got $topK)")
    val ranked = wordPieceVocabDf(docs, textCol, maxPieceLen, topK)
      .collect()
    val (cont, init) = ranked.partition(_.getAs[Boolean]("is_continuation"))
    (init.map(_.getAs[String]("piece")).toSeq.sorted,
      cont.map(_.getAs[String]("piece")).toSeq.sorted)
  }

  /** The trained WordPiece vocabulary as a DataFrame — one row per
    * (piece, form) with its corpus frequency; the oracle-checkable
    * artifact behind [[wordPieceVocab]].
    */
  def wordPieceVocabDf(docs: DataFrame, textCol: String,
                       maxPieceLen: Int = 6, topK: Int = 64): DataFrame = {
    val words = docs
      .select(explode(filter(split(trim(lower(col(textCol))), "\\s+"),
        w => w =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val pieces = words
      .select(col("w"), col("f"),
        explode(expr("sequence(0, length(w) - 1)")).as("i"))
      .select(col("f"), col("i"),
        explode(expr(s"sequence(1, least($maxPieceLen, " +
          "length(w) - i))")).as("l"),
        col("w"))
      .select(expr("substr(w, i + 1, l)").as("piece"),
        (col("i") > 0).as("is_continuation"), col("f"), col("l"))
    val freq = pieces.groupBy(col("piece"), col("is_continuation"))
      .agg(sum(col("f")).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("is_continuation"))
      .orderBy(col("freq").desc, col("piece"))
    val top = freq.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topK).drop("__rn")
    // force-include every single character in both forms (coverage)
    val chars = freq.filter(length(col("piece")) === 1)
    top.unionByName(chars)
      .groupBy(col("piece"), col("is_continuation"))
      .agg(max(col("freq")).as("freq"))
      .orderBy(col("is_continuation"), col("piece"))
  }

  /** Per-document WordPiece statistics under a trained vocabulary:
    * word count, greedy-maxmatch token count, fertility. Fails loud on
    * words longer than `maxWordLen` (the oracle replays maxmatch as a
    * fixed-depth unroll — a longer word means the corpus changed under
    * the declared bound and the query must not silently diverge).
    *
    * Plan: one narrow projection per document (the native
    * [[graft.functions.Native.WordPieceEncode]] expression, per-word
    * memoized); no shuffle before the final doc-grain aggregation.
    */
  def wordPieceStats(docs: DataFrame, idCol: String, textCol: String,
                     initials: Seq[String], conts: Seq[String],
                     maxPieceLen: Int = 6,
                     maxWordLen: Int = 12): DataFrame = {
    val t = col(textCol)
    val wordsArr = filter(split(trim(lower(t)), "\\s+"), w => w =!= "")
    // null text must DROP (the oracle's join silently drops it), not
    // raise: a null guard condition would fall through to raise_error
    val guarded = when(
      coalesce(aggregate(wordsArr, lit(0),
        (acc, w) => greatest(acc, length(w))), lit(0)) <= maxWordLen, t)
      .otherwise(raise_error(lit(
        s"wordPieceStats: word longer than $maxWordLen — oracle unroll " +
          "bound violated")))
    val toks = Native.wordpiece_encode(guarded, initials, conts,
      maxPieceLen)
    docs.filter(t.isNotNull)
      .select(col(idCol), size(wordsArr).as("n_words"),
        size(toks).as("n_tokens"))
      .filter(col("n_words") > 0)
      .withColumn("fertility",
        round(col("n_tokens").cast("double") /
          col("n_words").cast("double"), 6))
      .orderBy(col(idCol))
  }
}
