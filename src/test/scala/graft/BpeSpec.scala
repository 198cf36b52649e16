package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE subword tokenizer: trainer semantics (local reference vs the
  * distributed superstep trainer), encode correctness (native expression
  * vs naive merge replay), round-trip and boundary invariants. End-to-end
  * values are oracle-verified by `x_bpe_merges` / `x_bpe_tokens` (the
  * DuckDB replay re-derives the merges itself).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent naive encode: replay merges in order per word. */
  private def refEncode(text: String,
                        merges: Seq[(String, String)]): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { w =>
      merges.foldLeft(Bpe.charSymbols(w)) { case (syms, (a, b)) =>
        Bpe.mergePair(syms, a, b)
      }
    }

  test("trainMergesLocal: hand-checked golden (hug/pug corpus)") {
    // freq-weighted pair counts: (u,g) appears in hug(10)+pug(5)+hugs(5)
    // = 20, the clear first merge; then (h,ug) 10+5=15 beats (p,ug) 5
    val freq = Seq("hug" -> 10L, "pug" -> 5L, "pun" -> 12L, "bun" -> 4L,
      "hugs" -> 5L)
    val merges = Bpe.trainMergesLocal(freq, 3)
    assert(merges.head == ("u", "g"))
    assert(merges(1) == ("u", "n")) // pun 12 + bun 4 = 16 > (h,ug) 15
    assert(merges(2) == ("h", "ug"))
  }

  test("trainMergesLocal: tie broken by (left, right) ascending") {
    // "ab" and "cd" both appear once -> (a,b) wins lexicographically
    val merges = Bpe.trainMergesLocal(Seq("ab" -> 1L, "cd" -> 1L), 1)
    assert(merges == Seq(("a", "b")))
  }

  test("trainMergesLocal: exhausts when no pairs remain") {
    // single-char words have no adjacent pairs at all
    assert(Bpe.trainMergesLocal(Seq("a" -> 5L, "b" -> 3L), 4).isEmpty)
    // one two-char word yields exactly one merge, then exhaustion
    assert(Bpe.trainMergesLocal(Seq("ab" -> 1L), 5) == Seq(("a", "b")))
  }

  test("mergePair: left-to-right non-overlapping ([a,a,a] -> [aa,a])") {
    assert(Bpe.mergePair(Vector("a", "a", "a"), "a", "a") ==
      Vector("aa", "a"))
    assert(Bpe.mergePair(Vector("a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "aa"))
    assert(Bpe.mergePair(Vector("x", "a", "b", "y"), "a", "b") ==
      Vector("x", "ab", "y"))
  }

  test("distributed trainer == local trainer on the same corpus") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the dog barks the fox runs over the hill",
      "quick quick slow slow the the the").toDF("text")
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    docs.as[String].collect().foreach(_.trim.toLowerCase.split("\\s+")
      .foreach(w => if (w.nonEmpty) freq.update(w, freq.getOrElse(w, 0L) + 1)))
    val local = Bpe.trainMergesLocal(freq.toSeq, 8)
    val dist = Bpe.trainMergesDistributed(docs, "text", 8)
    assert(dist == local)
  }

  test("trainFromSample == local trainer when the sample covers the corpus") {
    val docs = Seq((1L, "alpha beta beta"), (2L, "beta alpha alpha beta"))
      .toDF("doc_id", "text")
    val fromSample = Bpe.trainFromSample(docs, "doc_id", "text",
      sampleCap = 10, numMerges = 4)
    val local = Bpe.trainMergesLocal(
      Seq("alpha" -> 3L, "beta" -> 4L), 4)
    assert(fromSample == local)
  }

  test("native encode == naive merge replay (randomized corpus)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    val texts = Seq.tabulate(60) { _ =>
      Seq.fill(rnd.nextInt(8) + 1)(
        Seq.fill(rnd.nextInt(6) + 1)(alpha(rnd.nextInt(alpha.length)))
          .mkString).mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.trainMergesDistributed(docs, "text", 10)
    assert(merges.nonEmpty)
    val got = docs.select($"doc_id", Bpe.encode($"text", merges).as("toks"))
      .orderBy($"doc_id").as[(Long, Seq[String])].collect()
    got.foreach { case (id, toks) =>
      assert(toks == refEncode(texts(id.toInt), merges),
        s"doc $id: $toks vs ${refEncode(texts(id.toInt), merges)}")
    }
  }

  test("encode round-trips every document and respects word boundaries") {
    val docs = Seq("aa bb aa", "  padded   words  ", "single").toDF("text")
    val merges = Bpe.trainMergesDistributed(docs, "text", 4)
    val rows = docs.select($"text", Bpe.encode($"text", merges).as("toks"))
      .as[(String, Seq[String])].collect()
    rows.foreach { case (t, toks) =>
      assert(toks.mkString("") ==
        t.trim.toLowerCase.replaceAll("\\s+", ""))
      // no token may span a word boundary: splitting the token stream at
      // word lengths must reproduce each word
      val words = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      var rest = toks
      words.foreach { w =>
        var acc = ""
        while (acc.length < w.length) { acc += rest.head; rest = rest.tail }
        assert(acc == w, s"token crossed boundary of '$w'")
      }
    }
  }

  test("encode: codepoint-safe on astral-plane symbols, null in null out") {
    val emoji = new String(Character.toChars(0x1F600)) // surrogate pair
    val docs = Seq(Some(s"$emoji$emoji a"), None).toDF("text")
    // no trained merges: pure char split must keep the pair as ONE symbol
    val out = docs.select(Bpe.encode($"text", Nil).as("toks")).collect()
    assert(out(0).getSeq[String](0) == Seq(emoji, emoji, "a"))
    assert(out(1).isNullAt(0))
  }

  test("applyMerge column form == mergePair semantics (incl. runs)") {
    val rows = Seq(" a a a ", " a b a b ", " x a b y ", " q ")
      .toDF("s")
    val got = rows.select(Bpe.applyMerge($"s", "a", "b").as("s"))
      .as[String].collect().toSeq
    assert(got == Seq(" a a a ", " ab ab ", " x ab y ", " q "))
    val run = Seq(" a a a ").toDF("s")
      .select(Bpe.applyMerge($"s", "a", "a").as("s")).as[String].head()
    assert(run == " aa a ")
  }

  test("tokenStats: fertility bounds, roundtrip flags, marker guard") {
    val docs = Seq((1L, "aaaa bb"), (2L, "cc dd ee")).toDF("doc_id", "text")
    val merges = Bpe.trainMergesDistributed(docs, "text", 3)
    val stats = Bpe.tokenStats(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long, Double, Boolean)].collect().toList
    stats.foreach { case (_, nw, nt, fert, ok) =>
      assert(ok)
      assert(nt >= nw) // every word is at least one token
      assert(fert >= 1.0)
    }
    val poisoned = Seq((9L, "bad\u0001doc")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Bpe.tokenStats(poisoned, "doc_id", "text", merges).collect()
    }
    assert(ex.getMessage.contains("boundary marker"))
  }

  test("tokenStats excludes whitespace-only documents") {
    val docs = Seq((1L, "real words"), (2L, "   ")).toDF("doc_id", "text")
    val out = Bpe.tokenStats(docs, "doc_id", "text", Nil)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("wordPieceVocab: trainer replays the hand count (top-k per form " +
      "by freq desc / piece asc, single chars force-included)") {
    import spark.implicits._
    val docs = Seq((1L, "abc ab c")).toDF("doc_id", "text")
    val (init, cont) = Bpe.wordPieceVocab(docs, "text",
      maxPieceLen = 2, topK = 1)
    // initial: a(2) beats ab(2) on the piece-asc tie; chars a, c forced
    assert(init == Seq("a", "c"))
    // continuation: b(2) tops; chars b, c forced
    assert(cont == Seq("b", "c"))
  }

  test("wordPieceStats: greedy maxmatch counts replay the hand encode; " +
      "over-long words and out-of-vocab characters fail loud") {
    import spark.implicits._
    val docs = Seq((1L, "abc ab c")).toDF("doc_id", "text")
    val (init, cont) = Bpe.wordPieceVocab(docs, "text",
      maxPieceLen = 2, topK = 1)
    val out = Bpe.wordPieceStats(docs, "doc_id", "text", init, cont,
      maxPieceLen = 2, maxWordLen = 12).collect().head
    // abc -> a ##b ##c (3), ab -> a ##b (2), c -> c (1)
    assert(out.getAs[Int]("n_words") == 3)
    assert(out.getAs[Int]("n_tokens") == 6)
    assert(out.getAs[Double]("fertility") == 2.0)
    // direct encode spot check including the ## continuation marks
    val toks = docs.select(graft.functions.Native.wordpiece_encode(
        col("text"), init, cont, 2).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("a", "##b", "##c", "a", "##b", "c"))
    intercept[Exception] {
      Bpe.wordPieceStats(
        Seq((1L, "abcdefghabcdefgh")).toDF("doc_id", "text"),
        "doc_id", "text", init, cont, 2, maxWordLen = 12).collect()
    }
    intercept[Exception] {
      Bpe.wordPieceStats(Seq((1L, "xyz")).toDF("doc_id", "text"),
        "doc_id", "text", init, cont, 2, maxWordLen = 12).collect()
    }
  }
}
