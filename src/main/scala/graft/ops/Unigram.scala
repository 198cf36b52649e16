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
  * aggregation), and the only driver artifact is the piece table itself —
  * bounded by the vocabulary budget, the merge-list/codebook precedent.
  *
  * Determinism contract: counts are exact longs (frequency-weighted), so
  * probabilities are identical divisions everywhere; Viterbi breaks score
  * ties toward the LONGER last piece (ascending start-position scan,
  * strict improvement); pruning keeps top `vocabSize` pieces by
  * (count desc, piece asc) and ALWAYS keeps single characters (coverage —
  * every word stays segmentable). Local and distributed trainers agree
  * exactly (UnigramSpec asserts it).
  */
object Unigram {

  /** Deterministic Viterbi segmentation of one word under log-probs:
    * maximize Σ log p(piece); ties prefer the longer last piece at every
    * DP cell. Pieces are capped at `maxLen` CODE POINTS. The local
    * reference for the native expression.
    */
  def segmentLocal(word: String, logp: String => Option[Double],
                   maxLen: Int): Vector[String] = {
    val cps = Bpe.charSymbols(word)
    val n = cps.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) > Double.NegativeInfinity) {
          val piece = cps.slice(j, i).mkString
          logp(piece) match {
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
      require(back(i) >= 0 || best(i) > Double.NegativeInfinity,
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

  private def toLogp(counts: Seq[(String, Long)])
      : Seq[(String, Double)] = {
    val total = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) => (p, math.log(c / total)) }
      .sortBy(_._1) // canonical order: the artifact is a lookup table
  }

  /** The local reference trainer over a word-frequency table. */
  def trainLocal(wordFreq: Seq[(String, Long)], vocabSize: Int,
                 rounds: Int, maxPieceLen: Int): Seq[(String, Double)] = {
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
    var table = toLogp(prune(seed.toSeq, vocabSize))
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
      table = toLogp(prune(floored, vocabSize))
    }
    table
  }

  /** The distributed trainer: ONE corpus scan → word-freq table
    * (localCheckpoint'd, vocab-bounded); seed counts and every EM round
    * are aggregations over it; the bounded piece table is the only
    * driver-side artifact. Exactly [[trainLocal]]'s result (counts are
    * exact longs in both; UnigramSpec asserts equality).
    */
  def trainDistributed(docs: DataFrame, textCol: String, vocabSize: Int,
                       rounds: Int, maxPieceLen: Int): Seq[(String, Double)] = {
    require(rounds >= 1 && rounds <= 10,
      s"unigram: rounds in [1, 10] (got $rounds)")
    val words = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val seed = words
      .select(col("freq"),
        explode(graft.functions.Native.substrings_upto(col("w"), maxPieceLen))
          .as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var table = toLogp(prune(seed, vocabSize))
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
      table = toLogp(prune(floored, vocabSize))
    }
    table
  }

  /** Per-doc token statistics under a trained piece table — the
    * [[Bpe.tokenStats]] twin: words, tokens, fertility.
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
                 table: Seq[(String, Double)], maxPieceLen: Int): DataFrame = {
    val toks = graft.functions.Native.unigram_segment_text(
      col(textCol), table, maxPieceLen)
    docs.select(
        col(idCol),
        size(filter(split(trim(lower(col(textCol))), "\\s+"),
          w => w =!= "")).as("n_words"),
        size(toks).as("n_tokens"))
      .withColumn("fertility",
        round(when(col("n_words") > 0,
          col("n_tokens").cast("double") / col("n_words")), 6))
      .orderBy(col(idCol))
  }
}
