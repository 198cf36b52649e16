package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model), trained by hard-EM (Viterbi) rounds:
  * the second tokenizer family next to [[Bpe]], and the one modern
  * multilingual models mostly ship. Where BPE GROWS a vocabulary by
  * greedy merges, unigram SHRINKS one: seed with every substring
  * candidate, alternate (a) Viterbi-segment every word under current
  * piece probabilities and (b) re-estimate probabilities from usage
  * counts, pruning to the vocabulary budget.
  *
  * 100 TB posture (the [[Bpe.trainMergesDistributed]] contract): the
  * corpus is scanned ONCE into the (distinct word, freq) table — vocab-
  * bounded by Heaps' law, never corpus-sized; every EM round runs on that
  * table (the Viterbi is the native `UnigramSegment` expression with the
  * piece table riding in the plan; usage counts are one map-side-combined
  * aggregation), and EVERY driver-side artifact is budget-bounded: the
  * seed is pruned to the top `vocabSize` multi-character pieces IN THE
  * ENGINE (`orderBy(cnt desc, piece).limit(vocabSize)` — a distributed
  * TakeOrdered) plus the alphabet before collecting, and the EM-round
  * usage collects only ever see table pieces (segmentation emits nothing
  * else). Nothing driver-side scales with the corpus or with the
  * distinct-word count.
  *
  * Determinism contract: counts are exact longs (frequency-weighted);
  * piece scores are log-probabilities COMMITTED TO THE 1e-9 LATTICE
  * (`round(ln(cnt/total)·1e9)` as a long — the lognormal/Weibull ln-fold
  * precedent), so the Viterbi DP is pure integer arithmetic and every
  * engine that replays it (the DuckDB oracle unrolls the DP cell per
  * cell) lands on identical segmentations; Viterbi breaks score ties
  * toward the LONGER last piece (ascending start-position scan, strict
  * improvement); pruning keeps top `vocabSize` pieces by (count desc,
  * piece asc) and ALWAYS keeps single characters (coverage — every word
  * stays segmentable). Local and distributed trainers agree exactly
  * (UnigramSpec asserts it, including a 100k-distinct-word adversarial
  * corpus). Words longer than `maxWordLen` fail loud (the oracle replays
  * the DP as a fixed 12-cell unroll — the wordPieceStats guard
  * precedent).
  */
object Unigram {

  /** Max word length the oracle's fixed-depth DP unroll covers; words
    * beyond it fail loud rather than silently diverging from the replay.
    */
  val OracleMaxWordLen = 12

  /** ln(c/total) committed to the 1e-9 lattice, half-up away from zero —
    * the identical double tree (`ln(CAST(c AS DOUBLE)/CAST(t AS DOUBLE))
    * * 1e9` then `round(_, 0)`) the DuckDB oracle runs.
    */
  def latticeLogp(c: Long, total: Long): Long =
    BigDecimal(math.log(c.toDouble / total.toDouble) * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Deterministic Viterbi segmentation of one word under lattice
    * log-probs: maximize Σ llp(piece) in exact integer arithmetic; ties
    * prefer the longer last piece at every DP cell. Pieces are capped at
    * `maxLen` CODE POINTS. The local reference for the native expression
    * and the oracle's unrolled replay.
    */
  def segmentLocal(word: String, llp: String => Option[Long],
                   maxLen: Int): Vector[String] = {
    val cps = Bpe.charSymbols(word)
    val n = cps.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) > Long.MinValue) {
          val piece = cps.slice(j, i).mkString
          llp(piece) match {
            case Some(lp) =>
              val s = best(j) + lp
              // ascending j: the LONGEST candidate piece is seen first;
              // strict > keeps it on ties
              if (s > best(i)) { best(i) = s; back(i) = j }
            case None =>
          }
        }
        j += 1
      }
      require(back(i) >= 0 || best(i) > Long.MinValue,
        s"unigram: position $i of '$word' unreachable — single characters " +
          "must stay in the vocabulary")
      i += 1
    }
    val out = mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      out.prepend(cps.slice(j, pos).mkString)
      pos = j
    }
    out.toVector
  }

  /** Substring candidates of one word (≤ `maxLen` code points), with
    * multiplicity — the seed counts.
    */
  def substringsOf(word: String, maxLen: Int): Seq[String] = {
    val cps = Bpe.charSymbols(word)
    for {
      i <- 0 until cps.length
      l <- 1 to math.min(maxLen, cps.length - i)
    } yield cps.slice(i, i + l).mkString
  }

  /** Prune to the budget: top `vocabSize` by (count desc, piece asc),
    * plus every single character regardless (coverage guarantee).
    */
  private def prune(counts: Seq[(String, Long)], vocabSize: Int)
      : Seq[(String, Long)] = {
    val (chars, multi) = counts.partition(c => Bpe.charSymbols(c._1).length == 1)
    val kept = multi.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    chars ++ kept
  }

  private def toLattice(counts: Seq[(String, Long)])
      : Seq[(String, Long)] = {
    val total = counts.map(_._2).sum
    counts.map { case (p, c) => (p, latticeLogp(c, total)) }
      .sortBy(_._1) // canonical order: the artifact is a lookup table
  }

  /** The local reference trainer over a word-frequency table. */
  def trainLocal(wordFreq: Seq[(String, Long)], vocabSize: Int,
                 rounds: Int, maxPieceLen: Int): Seq[(String, Long)] = {
    require(vocabSize >= 1, s"unigram: vocabSize >= 1 (got $vocabSize)")
    require(rounds >= 1 && rounds <= 10,
      s"unigram: rounds in [1, 10] (got $rounds)")
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"unigram: maxPieceLen in [1, 16] (got $maxPieceLen)")
    // seed: frequency-weighted substring occurrence counts
    val seed = mutable.HashMap.empty[String, Long]
    wordFreq.foreach { case (w, f) =>
      substringsOf(w, maxPieceLen).foreach { p =>
        seed.update(p, seed.getOrElse(p, 0L) + f)
      }
    }
    var table = toLattice(prune(seed.toSeq, vocabSize))
    for (_ <- 1 to rounds) {
      val lp = table.toMap
      val used = mutable.HashMap.empty[String, Long]
      wordFreq.foreach { case (w, f) =>
        segmentLocal(w, lp.get, maxPieceLen).foreach { p =>
          used.update(p, used.getOrElse(p, 0L) + f)
        }
      }
      // unused single chars keep count 0? they must SURVIVE with some
      // mass for coverage: floor unused pieces' count at 1 (add-one on
      // the surviving vocabulary — deterministic, engine-free)
      val floored = table.map { case (p, _) =>
        (p, math.max(1L, used.getOrElse(p, 0L)))
      }
      table = toLattice(prune(floored, vocabSize))
    }
    table
  }

  /** The distributed trainer: ONE corpus scan → word-freq table
    * (localCheckpoint'd, vocab-bounded); seed counts and every EM round
    * are aggregations over it. The seed is pruned IN THE ENGINE to the
    * alphabet plus the top `vocabSize` multi-character pieces (a
    * TakeOrdered, never a full collect — the substring-piece table is
    * bounded by |distinct words| × maxPieceLen, billions of rows at
    * 100 TB), so every driver artifact is budget-bounded. Exactly
    * [[trainLocal]]'s result (counts are exact longs in both;
    * UnigramSpec asserts equality, including at 100k distinct words).
    */
  def trainDistributed(docs: DataFrame, textCol: String, vocabSize: Int,
                       rounds: Int, maxPieceLen: Int,
                       maxWordLen: Int = OracleMaxWordLen)
      : Seq[(String, Long)] = {
    require(rounds >= 1 && rounds <= 10,
      s"unigram: rounds in [1, 10] (got $rounds)")
    val words = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    // fail loud past the oracle's DP-unroll bound (1-row fold)
    val maxw = words.agg(coalesce(max(length(col("w"))), lit(0)))
      .collect()(0).getInt(0)
    require(maxw <= maxWordLen,
      s"unigram: word of length $maxw exceeds maxWordLen=$maxWordLen — " +
        "oracle unroll bound violated")
    val seedDf = words
      .select(col("freq"),
        explode(graft.functions.Native.substrings_upto(col("w"), maxPieceLen))
          .as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
    // code-point count of a piece (substrings_upto at maxLen=1 emits one
    // element per code point) — the prune()'s charSymbols partition
    val cpLen = size(graft.functions.Native.substrings_upto(col("piece"), 1))
    val chars = seedDf.filter(cpLen === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val kept = seedDf.filter(cpLen > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var table = toLattice(chars ++ kept)
    for (_ <- 1 to rounds) {
      val usedRows = words
        .select(col("freq"),
          explode(graft.functions.Native.unigram_segment(col("w"), table,
            maxPieceLen)).as("piece"))
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val floored = table.map { case (p, _) =>
        (p, math.max(1L, usedRows.getOrElse(p, 0L)))
      }
      table = toLattice(prune(floored, vocabSize))
    }
    table
  }

  /** Per-doc token statistics under a trained piece table — the
    * [[Bpe.tokenStats]] twin: words, tokens, fertility. Null-text docs
    * drop (the oracle's word join drops them silently); zero-word docs
    * drop the same way; words past `maxWordLen` fail loud (the
    * [[Bpe.wordPieceStats]] guard — the oracle unrolls the Viterbi DP to
    * a fixed depth).
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
                 table: Seq[(String, Long)], maxPieceLen: Int,
                 maxWordLen: Int = OracleMaxWordLen): DataFrame = {
    val t = col(textCol)
    val wordsArr = filter(split(trim(lower(t)), "\\s+"), w => w =!= "")
    val guarded = when(
      coalesce(aggregate(wordsArr, lit(0),
        (acc, w) => greatest(acc, length(w))), lit(0)) <= maxWordLen, t)
      .otherwise(raise_error(lit(
        s"unigram tokenStats: word longer than $maxWordLen — oracle " +
          "unroll bound violated")))
    val toks = graft.functions.Native.unigram_segment_text(
      guarded, table, maxPieceLen)
    docs.filter(t.isNotNull)
      .select(col(idCol), size(wordsArr).as("n_words"),
        size(toks).as("n_tokens"))
      .filter(col("n_words") > 0)
      .withColumn("fertility",
        round(col("n_tokens").cast("double") / col("n_words"), 6))
      .orderBy(col(idCol))
  }
}
