package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** PII-scrub golden cases. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.scrubPii($"t")).head().getString(0)

  test("scrubPii redacts emails, phones and long digit runs") {
    assert(scrub("mail me at jane.doe+x@corp.example.org please") ==
      "mail me at <EMAIL> please")
    assert(scrub("call +1 (555) 010-9999 now") == "call <PHONE> now")
    assert(scrub("account 123456 ok") == "account <ID> ok")
    assert(scrub("short 12345 stays") == "short 12345 stays")
    assert(scrub("no pii here") == "no pii here")
  }

  test("scrubPii handles multiple hits per document (replace-all)") {
    assert(scrub("a@b.com and c@d.org") == "<EMAIL> and <EMAIL>")
  }

  test("piiCounts agree with the number of redactions") {
    val (ne, np) = TextAnalysis.piiCounts(lit("a@b.com x 555-010-2222 c@d.org"))
    val row = Seq(1).toDF("i").select(ne.as("e"), np.as("p")).head()
    assert(row.getInt(0) == 2 && row.getInt(1) == 1)
  }

  test("char entropy: goldens, bands, and explode-formulation agreement") {
    val docs = Seq(
      (1L, "aaaa"),              // one symbol: 0 bits -> low
      (2L, "abab"),              // two equiprobable symbols: 1 bit -> low
      (3L, "abcd"),              // four equiprobable: 2 bits -> normal
      (4L, ""),                  // empty: 0 by convention
      (5L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .as[(Long, Double, String)].collect()
      .map { case (k, e, b) => k -> ((e, b)) }.toMap
    assert(out(1L) == ((0.0, "low")))
    assert(out(2L) == ((1.0, "low")))
    assert(out(3L) == ((2.0, "normal")))
    assert(out(4L) == ((0.0, "low")))
    assert(out(5L)._1 > 3.0 && out(5L)._2 == "normal") // natural-text band

    // native one-loop expression ≡ explode-chars aggregation at round-6
    val exploded = docs.filter(length($"text") > 0)
      .select($"doc_id", explode(split($"text", "")).as("c"))
      .groupBy("doc_id", "c").count()
      .groupBy("doc_id")
      .agg((log2(sum("count")) -
        sum($"count" * log2($"count")) / sum("count")).as("h"))
      .select($"doc_id", round($"h", 6).as("h"))
      .as[(Long, Double)].collect().toMap
    exploded.foreach { case (id, h) => assert(out(id)._1 == h, s"doc $id") }
  }

  test("tfidfTopTerms matches hand-computed smooth-idf scores") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    def idf(df: Int) = math.log(4.0 / (df + 1.0)) + 1.0
    def sc(tf: Int, df: Int) =
      BigDecimal(tf * idf(df)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    // doc 1: apple tf=2 df=2, banana tf=1 df=2
    // doc 2: banana tf=1 df=2, cherry tf=1 df=2 -> tie, term asc
    // doc 3: cherry tf=2 df=2, apple tf=1 df=2
    val expected = Seq(
      (1L, "apple", 2L, 2L, sc(2, 2)), (1L, "banana", 1L, 2L, sc(1, 2)),
      (2L, "banana", 1L, 2L, sc(1, 2)), (2L, "cherry", 1L, 2L, sc(1, 2)),
      (3L, "cherry", 2L, 2L, sc(2, 2)), (3L, "apple", 1L, 2L, sc(1, 2)))
    assert(out.toSeq == expected)
  }

  test("tfidfTopTerms: k bounds output per doc; rare terms outrank common") {
    val docs = (1L to 20L).map(i => (i, s"common rare_$i common filler"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 1)
    assert(out.count() == 20)
    // the per-doc unique term (df=1) must beat "common" (df=20, tf=2)
    assert(out.collect().forall(_.getString(1).startsWith("rare_")))
  }

  test("repetitionScores: duplicate n-gram ratios and Gopher flags") {
    val docs = Seq(
      (1L, "a b a b a b"),   // 2-grams: 5 total / 2 distinct; 3-grams: 4/2
      (2L, "a b c d"),       // all n-grams distinct
      (3L, "word")           // single token: no n-grams at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScores(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 6, 0.6, 0.5, true),
      (2L, 4, 0.0, 0.0, false),
      (3L, 1, 0.0, 0.0, false)))
  }

  test("qualityFilter: per-rule verdicts attribute each drop") {
    val good = "the quick brown fox jumps over a lazy dog and then runs " +
      "to the old stone bridge in the misty morning light of an autumn day"
    val docs = Seq(
      (1L, good),                                       // passes everything
      (2L, "tiny doc"),                                 // under minTokens
      (3L, Seq.fill(30)("spam").mkString(" ")),         // pure repetition
      (4L, (1 to 25).map(i => s"module$i").mkString(" ")), // no stopwords
      (5L, (1 to 25).map(i => s"extraordinarily$i").mkString(" ")) // long words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .select("doc_id", "r_len", "r_word_len", "r_stopwords",
        "r_repetition", "r_entropy", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, true, true, true, true, true)))
    assert(!out(2L)._2 && !out(2L)._7)   // dropped for length
    assert(!out(3L)._5 && !out(3L)._7)   // dropped for repetition
    assert(out(4L)._2 && out(4L)._3 && !out(4L)._4 && !out(4L)._7)
    assert(!out(5L)._3 && !out(5L)._7)   // mean word length out of band
    // signals behind the verdicts are the rounded, oracle-shape values
    val sig = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .filter($"doc_id" === 3L)
      .select("n_tokens", "dup_2gram_ratio").as[(Int, Double)].head()
    assert(sig == ((30, 0.965517)))      // 1 − 1/29, rounded half-up
  }

  test("lmSurprisal: hand-computed unigram surprisal, OOV floor, empty doc") {
    // corpus counts: a=3 b=2 c=1 z=1, total=7; vocab(2) = {a, b};
    // s(a)=-log2(3/7), s(b)=-log2(2/7), OOV floor = log2(7)
    val sA = -math.log(3.0 / 7) / math.log(2)
    val sB = -math.log(2.0 / 7) / math.log(2)
    val oov = math.log(7.0) / math.log(2)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Seq(
      (1L, "a a b"), (2L, "a b c"), (3L, "z"), (4L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmSurprisal(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, r6((2 * sA + sB) / 3)),
      (2L, 3L, 1L, r6((sA + sB + oov) / 3)),
      (3L, 1L, 1L, r6(oov)),
      (4L, 0L, 0L, 0.0)))
    // ordering property: common-token text scores lower than OOV gibberish
    assert(out(0)._4 < out(2)._4)
  }

  test("chunkWindows: overlap, tail clamp, short and empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than window
      (3L, "")                                        // empty: zero chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkWindows(docs, "doc_id", "text",
        window = 4, stride = 2)
      .as[(Long, Int, String, Int)].collect().toList
    val doc1 = out.filter(_._1 == 1L)
    // starts 0,2,4,6 (ceil((10-4)/2)+1 = 4 chunks); last chunk full
    assert(doc1.map(_._3) == List(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    assert(doc1.map(_._4).forall(_ == 4))
    assert(out.filter(_._1 == 2L).map(_._3) == List("a b")) // one short chunk
    assert(!out.exists(_._1 == 3L))                         // empty vanishes
  }

  test("dedupLines keeps first corpus-wide occurrence, blank lines intact") {
    val docs = Seq(
      (1L, "alpha beta\nshared line\ngamma"),
      (2L, "shared line\n\ndelta"),      // duplicate + a blank line
      (3L, "shared line")                // entire doc duplicated away
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toList
    assert(out == List(
      (1L, "alpha beta\nshared line\ngamma", 3L, 0L),
      (2L, "\ndelta", 2L, 1L),           // blank kept, duplicate removed
      (3L, "", 0L, 1L)))                 // fully deduped doc → empty text
  }

  test("dedupLines is normalization-aware (case/whitespace variants collapse)") {
    val docs = Seq(
      (1L, "Hello World"),
      (2L, "  hello   world  ") // different raw bytes, same normalized fp
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toList
    assert(out == List(
      (1L, "Hello World", 1L, 0L),
      (2L, "", 0L, 1L)))
  }

  test("dedupLines ≡ naive sequential first-occurrence scan on random corpora") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa bb", "cc", "dd ee ff", "GG", "gg", " cc ", "")
    (1 to 3).foreach { trial =>
      val docs = (0L until 30L).map(id =>
        id -> Seq.fill(1 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
          .mkString("\n"))
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.map { case (id, text) =>
        val lines = text.split("\n", -1)
        val kept = lines.filter { l =>
          if (l.trim.isEmpty) true
          else seen.add(l.trim.toLowerCase.replaceAll("\\s+", " "))
        }
        (id, kept.mkString("\n"), kept.length.toLong,
          (lines.length - kept.length).toLong)
      }
      val got = TextAnalysis.dedupLines(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, String, Long, Long)].collect().toList
      assert(got == expected.toList, s"trial $trial diverged")
    }
  }

  test("chunkWindows ≡ naive sliding windows on random token counts") {
    val rnd = new scala.util.Random(23)
    val docs = (0L until 40L).map(id =>
      id -> (0 until rnd.nextInt(30)).map(i => s"t${rnd.nextInt(9)}_$i")
        .mkString(" "))
    val (window, stride) = (7, 3)
    val expected = docs.flatMap { case (id, text) =>
      val w = text.trim.split("\\s+").filter(_.nonEmpty)
      if (w.isEmpty) Nil
      else {
        // chunks advance by stride until one window covers the tail
        val n = math.max(math.ceil((w.length - window).toDouble / stride)
          .toInt, 0) + 1
        (0 until n).map(k =>
          (id, k, w.slice(k * stride, k * stride + window).mkString(" ")))
      }
    }
    val got = TextAnalysis.chunkWindows(docs.toDF("doc_id", "text"),
        "doc_id", "text", window, stride)
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Int, String)].collect().toList
    assert(got == expected.toList)
  }

  test("dedupLines elects the true first occurrence past 10^6 lines " +
      "(old doc*1e6+idx encoding would collide here)") {
    // doc 0 ends with "dup" at idx 1_000_001; doc 1 opens with "dup".
    // Under the retired arithmetic encoding, (0, 1_000_001) → 1_000_001 and
    // (1, 0) → 1_000_000, so doc 1 would have stolen the win; the struct
    // election keeps lexicographic (doc, idx) order at any document length.
    val big = ((0 until 1000001).map(i => s"u$i") :+ "dup").mkString("\n")
    val docs = Seq((0L, big), (1L, "dup\nzed")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesRelation(docs, "doc_id", "text")
      .select("doc_id", "n_lines_kept", "n_lines_removed")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, c) => a -> (b, c) }.toMap
    assert(out(0L) == (1000002L, 0L), "doc 0 must keep ALL its lines")
    assert(out(1L) == (1L, 1L), "doc 1 must lose its copy of 'dup'")
  }

  test("posKey guards the 10^6 encoding range in-plan") {
    val ok = Seq((5L, 999999)).toDF("id", "idx")
      .select(TextAnalysis.posKey($"id", $"idx")).as[Long].head()
    assert(ok == 5999999L)
    val e = intercept[Exception] {
      Seq((5L, 1000000)).toDF("id", "idx")
        .select(TextAnalysis.posKey($"id", $"idx")).as[Long].head()
    }
    assert(e.getMessage.contains("posKey") ||
      Option(e.getCause).exists(_.getMessage.contains("posKey")))
  }

  test("dsirWeights: target-like docs score higher, independent scala " +
      "replay agrees, tokenless doc gets 0") {
    // target vocabulary {alpha beta}, off-target {gamma delta}
    val docs = Seq(
      (1L, "alpha beta alpha", true),   // pure target
      (2L, "gamma delta gamma", false), // pure source-only
      (3L, "alpha gamma", false),       // mixed
      (4L, "", false)                   // tokenless
    ).toDF("doc_id", "text", "is_t")
    val out = TextAnalysis.dsirWeights(docs, "doc_id", "text", $"is_t",
        numBuckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // independent replay of the smoothed LM ratio
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val toks = Seq(1L -> "alpha beta alpha", 2L -> "gamma delta gamma",
        3L -> "alpha gamma", 4L -> "")
      .flatMap { case (id, t) => t.split("\\s+").filter(_.nonEmpty)
        .map(w => (id, bucket(w), id == 1L)) }
    val ct = toks.filter(_._3).groupBy(_._2).view.mapValues(_.size).toMap
    val cs = toks.groupBy(_._2).view.mapValues(_.size).toMap
    val (nt, ns) = (toks.count(_._3).toDouble, toks.size.toDouble)
    def dlog(b: Long) = math.log((ct.getOrElse(b, 0) + 1) / (nt + 64)) -
      math.log((cs.getOrElse(b, 0) + 1) / (ns + 64))
    val expect = toks.groupBy(_._1).view
      .mapValues(_.map(x => dlog(x._2)).sum).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(math.abs(out(id)._2 - expect(id)) < 1e-9, s"doc $id")
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2)
    assert(out(4L) == ((0L, 0.0)))
  }

  test("bm25Scores matches an independent scala computation; non-matching " +
      "and empty docs absent") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c"),
      (4L, "x y z"), (5L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25Scores(docs, "doc_id", "text", Seq("a", "c"))
      .as[(Long, Long, Double)].collect().toList
    // independent reference computation over the same corpus
    val toks = Map(1L -> Seq("a", "b", "a"), 2L -> Seq("b", "c"),
      3L -> Seq("c", "c", "c"), 4L -> Seq("x", "y", "z"), 5L -> Seq())
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    def idf(t: String) = {
      val df = toks.values.count(_.contains(t)).toDouble
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    def score(id: Long) = {
      val ws = Seq("a", "c").flatMap { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0) None
        else Some(idf(t) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * toks(id).size / avgdl)))
      }
      (ws.size.toLong, math.rint(ws.sum * 1e6) / 1e6)
    }
    val want = Seq(1L, 2L, 3L).map(id => (id, score(id)._1, score(id)._2))
      .sortBy { case (id, _, s) => (-s, id) }.toList
    assert(got == want)
    assert(!got.exists(r => r._1 == 4L || r._1 == 5L))
  }

  test("collocations: pair/unigram counts are exact and PMI matches the " +
      "hand-computed value over the unfiltered spaces") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 1, k = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // bigrams: (a,b) x3, (b,a) x1, (b,c) x1 -> nbig 5; unigrams a3 b3 c1
    // -> ntok 7
    assert(out.keySet == Set(("a", "b"), ("b", "a"), ("b", "c")))
    assert(out(("a", "b"))._3 == 3L && out(("a", "b"))._4 == 3L &&
      out(("a", "b"))._5 == 3L)
    def pmi(cab: Long, ca: Long, cb: Long) = BigDecimal(
      math.log((cab / 5.0) / ((ca / 7.0) * (cb / 7.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("a", "b"))._6 == pmi(3, 3, 3))
    assert(out(("b", "c"))._6 == pmi(1, 3, 1))
    // a one-doc corpus below minCount yields nothing
    assert(TextAnalysis.collocations(docs, "text", minCount = 4, k = 10)
      .count() == 0)
  }

  test("vocabulary: dense indices follow (count desc, token asc), " +
      "minCount trims, share covers the retained mass") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabulary(docs, "doc_id", "text", minCount = 2)
      .select("token", "term_count", "doc_freq", "idx", "share")
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._4)
    // counts: a 2 (1 doc), b 2 (2 docs), c 1 (cut); tie a/b -> a first
    assert(out.toSeq == Seq(("a", 2L, 1L, 0L, 0.5), ("b", 2L, 2L, 1L, 0.5)))
  }

  test("boilerplateShingles: per-GROUP doc frequency, within-doc repeats " +
      "count once, cross-group phrases stay out") {
    val docs = Seq(
      // "home about" recurs in 3 docs of site1 (twice inside doc 1 — one vote)
      (1L, "home about home about x y", "site1"),
      (2L, "home about z", "site1"),
      (3L, "q home about", "site1"),
      // the same phrase in only 1 doc of site2 -> not boilerplate there
      (4L, "home about w", "site2"),
      (5L, "w v", "site2")
    ).toDF("doc_id", "text", "source")
    val boiler = TextAnalysis.boilerplateShingles(docs, "doc_id", "text",
      "source", n = 2, minDf = 3)
      .as[(String, String, Long)].collect().toSeq
    assert(boiler == Seq(("site1", "home about", 3L)))

    val ratio = TextAnalysis.boilerplateRatio(docs, "doc_id", "text",
      "source", n = 2, minDf = 3)
      .select("doc_id", "n_shingles", "n_boiler", "boiler_ratio")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1 distinct bigrams: home-about, about-home, about-x, x-y (4, 1 hit)
    assert(ratio.find(_._1 == 1L).get == ((1L, 4L, 1L, 0.25)))
    // doc 3: q-home, home-about -> 1 of 2
    assert(ratio.find(_._1 == 3L).get == ((3L, 2L, 1L, 0.5)))
    // doc 4 (site2): home-about is NOT boilerplate in site2
    assert(ratio.find(_._1 == 4L).get._3 == 0L)
    intercept[IllegalArgumentException] {
      TextAnalysis.boilerplateShingles(docs, "doc_id", "text", "source", 2, 1)
    }
  }

  test("winnowFingerprints native == explode+window dataflow formulation") {
    import org.apache.spark.sql.expressions.Window
    val k = 8; val w = 4
    val rnd = new scala.util.Random(7)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "omega", "zeta")
    val texts = Seq.tabulate(40)(_ =>
      Seq.fill(rnd.nextInt(30) + 3)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val norm = docs.select($"doc_id",
      regexp_replace(trim(lower($"text")), "\\s+", " ").as("s"))
    val native = norm.select($"doc_id",
        explode(graft.functions.Native.winnow_fingerprints($"s", k, w))
          .as("pos"))
      .as[(Long, Int)].collect().toSet
    // independent dataflow formulation: gram explode -> polynomial hash
    // via aggregate() -> window min -> lag run-dedupe
    val M = 2147483647L
    val enc = norm
      .select($"doc_id", $"s",
        posexplode(sequence(lit(1), greatest(length($"s") - (k - 1), lit(0))))
          .as(Seq("idx", "pos")))
      .select($"doc_id", $"pos",
        (aggregate(
          transform(split($"s".substr($"pos", lit(k)), ""),
            c => ascii(c).cast("long")),
          lit(0L), (acc, c) => (acc * 257L + c) % M)
          * 10000L + (lit(9999L) - $"pos")).as("e"))
    val winWin = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(w - 1), Window.currentRow)
    val ref = enc.withColumn("we", min($"e").over(winWin))
      .filter($"pos" >= w)
      .withColumn("prev",
        lag($"we", 1).over(Window.partitionBy("doc_id").orderBy("pos")))
      .filter($"prev".isNull || $"prev" =!= $"we")
      .select($"doc_id", (lit(9999L) - ($"we" % 10000L)).cast("int").as("pos"))
      .as[(Long, Int)].collect().toSet
    assert(native == ref)
    assert(native.nonEmpty)
  }

  test("sharedSpans: planted duplicate span found, coverage guarantee") {
    val span = "the exact same stolen paragraph of text here"
    val docs = Seq(
      (1L, s"unique alpha words then $span and more alpha tail"),
      (2L, s"different beta opening $span closing beta remarks"),
      (3L, "completely unrelated gamma content with nothing shared at all " +
        "padding padding gamma delta omega")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.sharedSpans(docs, "doc_id", "text",
        k = 16, w = 8, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // span length 44 >= k+w-1 = 23: the coverage theorem guarantees a
    // shared fingerprint for the 1-2 pair; doc 3 shares nothing
    assert(out.nonEmpty)
    assert(out.forall { case (a, b, _) => a == 1L && b == 2L })
    assert(out.head._3 >= 1L)
    // oversized document fails loud, not silently mis-elected
    val big = Seq((9L, Seq.fill(3000)("word").mkString(" ")))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      TextAnalysis.sharedSpans(big, "doc_id", "text", 16, 8, 5).collect()
    }
    assert(ex.getMessage.contains("chunk long documents"))
  }

  test("bigramPerplexity: hand-checked model, OOV fold, ranking sanity") {
    // reference slice = docs 1..2 (en); vocabSize 3 keeps "a b c",
    // everything else folds to <unk>
    val docs = Seq(
      (1L, "a b a b c", "en"),
      (2L, "a b c c", "en"),
      (3L, "a b a b c", "fr"),   // scored, not trained on
      (4L, "z z z z", "fr")      // pure OOV gibberish
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.bigramPerplexity(docs, "doc_id", "text",
        $"lang" === "en", vocabSize = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

    // model: ref tokens (9 total): a,b,a,b,c | a,b,c,c
    // cu: a=3 b=3 c=3; vocab={a,b,c}; N=9, |vocab|+1=4
    // pu(a)=pu(b)=pu(c)=4/13; pu(unk)=1/13
    // cb: (a,b)=3 (b,a)=1 (b,c)=2 (c,c)=1
    def pu(cu: Int) = (cu + 1.0) / 13.0
    def p(cb: Int, cup: Int, cuw: Int) =
      0.5 * cb / math.max(cup, 1) + 0.5 * pu(cuw)
    val l2 = (x: Double) => -math.log(x) / math.log(2.0)
    // doc 1: a | b|a a|b b|a a|b ... tokens a b a b c
    val ce1 = (l2(pu(3)) + l2(p(3, 3, 3)) + l2(p(1, 3, 3)) +
      l2(p(3, 3, 3)) + l2(p(2, 3, 3))) / 5.0
    assert(math.abs(out(1L)._4 - ce1) < 1e-6)
    assert(out(1L)._2 == 5L && out(1L)._3 == 0L)
    // doc 3 is identical text to doc 1 -> identical score
    assert(out(3L)._4 == out(1L)._4)
    // doc 4: all OOV -> every token <unk> (cu=0): first pu=1/13, then
    // p = 0.5*0/1 + 0.5/13
    val ce4 = (l2(1.0 / 13) + 3 * l2(0.5 / 13)) / 4.0
    assert(math.abs(out(4L)._4 - ce4) < 1e-6)
    assert(out(4L)._3 == 4L)
    // gibberish scores strictly worse than fluent in-distribution text
    assert(out(4L)._4 > out(1L)._4)
    // non-complementable lambda fails loud
    intercept[IllegalArgumentException] {
      TextAnalysis.bigramPerplexity(docs, "doc_id", "text",
        $"lang" === "en", 3, lambda = 0.7)
    }
  }

  test("normalizeText: NFC-composes decomposed diacritics, strips " +
      "U+FFFD and control chars, collapses space/tab runs; byte counts " +
      "attribute each removal") {
    val docs = Seq(
      // decomposed e + COMBINING ACUTE (1+2 bytes) composes to 2 bytes
      (0L, "caf" + "e\u0301"),
      // two U+FFFD tombstones + a BEL control char + a tab run (tabs
      // survive the control strip, then collapse to one space)
      (1L, "bad\uFFFD\uFFFDdata\u0007x\t\tend"),
      // pure ASCII with double spaces and a trailing blank
      (2L, "plain  text "),
      (3L, "untouched")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeText(docs, "doc_id", "text")
      .as[(Long, Int, Int, Boolean, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap

    val (_, raw0, clean0, chg0, rep0, ctl0, _) = out(0L)
    assert(chg0 && rep0 == 0 && ctl0 == 0)
    assert(raw0 == 6 && clean0 == 5) // e+combining (1+2 bytes) -> 2
    val (_, _, _, chg1, rep1, ctl1, _) = out(1L)
    assert(!chg1 && rep1 == 2 && ctl1 == 1)
    val (_, raw2, clean2, chg2, rep2, ctl2, _) = out(2L)
    assert(!chg2 && rep2 == 0 && ctl2 == 0)
    assert(raw2 == 12 && clean2 == 10) // "plain text" after collapse+trim
    assert(out(3L)._2 == 9 && out(3L)._3 == 9)
    // md5 of the cleaned text matches a locally computed digest
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("plain text".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(2L)._7 == md)
  }

  test("normalizeText: already-clean corpus reports identity " +
      "(equal byte counts, zero removals)") {
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val r = TextAnalysis.normalizeText(docs, "doc_id", "text")
      .as[(Long, Int, Int, Boolean, Int, Int, String)].head()
    assert(r._2 == 11 && r._3 == 11 && !r._4 && r._5 == 0 && r._6 == 0)
  }

  test("vocabDrift: identical slices score 0, disjoint vocabularies " +
      "approach 1 bit, <other> absorbs the tail under a tight topV") {
    val same = Seq(("A", "alpha beta beta gamma"),
      ("B", "alpha beta beta gamma")).toDF("side", "text")
    val js0 = TextAnalysis.vocabDrift(same, "text", "side", "A", "B")
      .select("js_total").distinct().as[Double].head()
    assert(js0 == 0.0)
    val disjoint = Seq(("A", "aaa bbb aaa bbb aaa bbb aaa bbb"),
      ("B", "ccc ddd ccc ddd ccc ddd ccc ddd")).toDF("side", "text")
    val js1 = TextAnalysis.vocabDrift(disjoint, "text", "side", "A", "B")
      .select("js_total").distinct().as[Double].head()
    assert(js1 > 0.5 && js1 <= 1.0, s"disjoint JS $js1")
    // tight vocabulary: one elected term + the <other> fold
    val cut = TextAnalysis.vocabDrift(same, "text", "side", "A", "B",
        topV = 1)
      .select("term").as[String].collect().toSet
    assert(cut == Set("beta", "<other>")) // beta wins the count election
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabDrift(same, "text", "side", "A", "B", alpha = 0.0)
    }
  }

  test("zipfLaw: an exact 6/rank corpus fits slope -1 with R2 = 1; " +
      "a degenerate vocabulary reports NULLs") {
    // counts 6, 3, 2 at ranks 1, 2, 3 lie exactly on c = 6/r
    val words = Seq.fill(6)("aa") ++ Seq.fill(3)("bb") ++ Seq.fill(2)("cc")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.zipfLaw(docs, "doc_id", "text",
      minCount = 1, maxRank = 300).collect().head
    assert(r.getAs[Long]("n_terms") == 3L)
    assert(r.getAs[Double]("slope") == -1.0)
    assert(r.getAs[Double]("intercept") == 1.791759) // ln 6
    assert(r.getAs[Double]("r2") == 1.0)
    // two terms: under the 3-term floor -> NULL fit, n still reported
    val tiny = Seq((1L, "x x y")).toDF("doc_id", "text")
    val t = TextAnalysis.zipfLaw(tiny, "doc_id", "text", 1, 300)
      .collect().head
    assert(t.getAs[Long]("n_terms") == 2L)
    assert(t.isNullAt(t.fieldIndex("slope")))
  }

  test("curationFunnel: stage chain is consistent with the per-doc " +
      "verdicts — n_in chains, final survivors equal keep=true") {
    val good = ("the quick brown fox jumps over the lazy dog and then " +
      "the cat naps on a warm mat for hours today")
    val docs = Seq((1L, good), (2L, "too short"),
      (3L, good + " " + good)).toDF("doc_id", "text")
    val f = TextAnalysis.curationFunnel(docs, "doc_id", "text").collect()
    assert(f.length == 5)
    assert(f.head.getAs[Long]("n_in") == 3L)
    // n_in of each stage equals n_out of the previous
    f.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_in") == a.getAs[Long]("n_out")) }
    val keeps = TextAnalysis.qualityFilter(docs, "doc_id", "text")
      .filter(col("keep")).count()
    assert(f.last.getAs[Long]("n_out") == keeps)
    // shares consistent
    f.foreach { row =>
      assert(row.getAs[Long]("n_dropped") ==
        row.getAs[Long]("n_in") - row.getAs[Long]("n_out")) }
  }

  test("spanCorruption: seeded-hash picks replay the minstd recurrence " +
      "and adjacent picks coalesce into one span") {
    // u01(doc*1e6+pos, 7) < 0.15 masks doc1 pos {8,9}, doc2 pos {3}
    val docs = Seq(
      (1L, (0 until 12).map(i => s"t$i").mkString(" ")),
      (2L, (0 until 12).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.spanCorruption(docs, "doc_id", "text").collect()
    assert(r.length == 2)
    val d1 = r.find(_.getLong(0) == 1L).get
    assert(d1.getAs[Long]("span_id") == 1L)
    assert(d1.getAs[Int]("start_pos") == 8)
    assert(d1.getAs[Long]("span_len") == 2L)
    assert(d1.getAs[String]("span_text") == "t8 t9")
    val d2 = r.find(_.getLong(0) == 2L).get
    assert(d2.getAs[Int]("start_pos") == 3)
    assert(d2.getAs[Long]("span_len") == 1L)
    assert(d2.getAs[String]("span_text") == "w3")
    intercept[IllegalArgumentException] {
      TextAnalysis.spanCorruption(docs, "doc_id", "text", rate = 1.5)
    }
  }

  test("heapsLaw: hand-computed growth curve; empty doc keeps its row; " +
      "curve is partition-order independent") {
    val docs = Seq(
      (1L, "a b a"),          // tokens 3, new {a,b}=2
      (2L, ""),               // tokens 0, new 0
      (3L, "b c c d"),        // tokens 4, new {c,d}=2
      (4L, "A d e")           // lowercased: tokens 3, new {e}=1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.heapsLaw(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 3L, 2L, 2L),
      (2L, 0L, 3L, 0L, 2L),
      (3L, 4L, 7L, 2L, 4L),
      (4L, 3L, 10L, 1L, 5L)))
    val shuffled = TextAnalysis.heapsLaw(docs.repartition(3), "doc_id",
      "text").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(shuffled == out)
  }

  test("ngramNovelty: exact duplicate scores dup_share 1, fresh doc 0, " +
      "partial overlap counted gram-by-gram; short docs keep NULL share") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),      // 3 grams, all first here
      (2L, "the quick brown fox jumps"),      // exact dup -> share 1.0
      (3L, "a wholly different sentence here"), // fresh -> 0.0
      (4L, "the quick brown cat sits down"),  // shares 1 of 4 grams
      (5L, "too short")                       // < 3 words -> no grams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.getAs[java.lang.Double]("dup_share"))))).toMap
    assert(out(1L) == ((3L, 0L, Some(0.0))))
    assert(out(2L) == ((3L, 3L, Some(1.0))))
    assert(out(3L) == ((3L, 0L, Some(0.0))))
    assert(out(4L) == ((4L, 1L, Some(0.25))))
    assert(out(5L) == ((0L, 0L, None)))
  }

  test("readability: Flesch replays the closed form, fragment counts one " +
      "sentence, vowel-free words floor syllables, bands split on the " +
      "rounded score") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "tsk tsk"), // no vowels -> syllables floor at word count
      (3L, "extraordinarily unquestionably indubitably polysyllabically"),
      (4L, "   ")) // blank -> dropped
      .toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    def rep(t: String): (Long, Long, Long, Double) = {
      val w = t.trim.split("\\s+").length.toLong
      val s = math.max("[.!?]+".r.findAllIn(t).size, 1).toLong
      val y = math.max("[aeiouy]+".r.findAllIn(t.toLowerCase).size, w.toInt)
        .toLong
      val f = BigDecimal(206.835 - 1.015 * (w.toDouble / s)
          - 84.6 * (y.toDouble / w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (w, s, y, f)
    }
    assert(!out.contains(4L) && out.size == 3)
    val samples: Seq[(Long, String)] = Seq(
      1L -> "The cat sat. The dog ran!", 2L -> "tsk tsk",
      3L -> ("extraordinarily unquestionably indubitably " +
        "polysyllabically"))
    for ((id, t) <- samples) {
      val (w, s, y, f) = rep(t)
      val band = if (f >= 60.0) "easy"
        else if (f >= 30.0) "standard" else "difficult"
      assert(out(id) == ((id, w, s, y, f, band)), s"doc $id")
    }
    assert(out(1L)._6 == "easy" && out(3L)._6 == "difficult")
  }

  test("datasetCard: counts, ratios and the normalized dup key fold " +
      "exactly into metric rows") {
    import spark.implicits._
    // doc 3 is a whitespace-variant duplicate of doc 1
    val docs = Seq(
      (1L, "the cat sat", "en"),
      (2L, "le chat", "fr"),
      (3L, "  the   cat sat ", "en")).toDF("doc_id", "text", "lang")
    val out = graft.ops.TextAnalysis.datasetCard(docs, "text", "lang")
      .collect().map(r => r.getAs[String]("metric") ->
        r.getAs[Double]("value")).toMap
    assert(out("n_docs") == 3.0 && out("n_langs") == 2.0)
    assert(out("pct_english") == 0.666667)
    assert(out("total_tokens") == 8.0) // 3 + 2 + 3
    assert(out("exact_dup_rate") == 0.333333)
    assert(out("mean_doc_tokens") == 2.666667)
  }

  test("bleuPairs: hand-computed clipped precisions, brevity penalty " +
      "and geometric mean; identical pair scores 1; no overlap scores 0") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on mat"),
      (3L, "the cat sat on the mat"),
      (4L, "xyz zzz qqq www")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val r = graft.ops.TextAnalysis.bleuPairs(docs, "doc_id", "text", pairs)
      .collect().map(x => x.getAs[Long]("id_b") -> x).toMap
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // cand 2 vs ref 1: p1 = 5/5, p2 = 3/4, bp = exp(1 - 6/5)
    val b2 = r(2L)
    assert(b2.getAs[Long]("len_ref") == 6L && b2.getAs[Long]("len_cand") == 5L)
    assert(b2.getAs[Double]("p1") == 1.0)
    assert(b2.getAs[Double]("p2") == 0.75)
    val bp = math.exp(1.0 - 6.0 / 5.0)
    assert(b2.getAs[Double]("brevity_penalty") == r6(bp))
    assert(b2.getAs[Double]("bleu2") ==
      r6(bp * math.exp((math.log(1.0) + math.log(0.75)) / 2.0)))
    // identical text: everything 1
    assert(r(3L).getAs[Double]("bleu2") == 1.0)
    assert(r(3L).getAs[Double]("brevity_penalty") == 1.0)
    // zero overlap: clipped counts 0 -> exact 0
    assert(r(4L).getAs[Double]("p1") == 0.0)
    assert(r(4L).getAs[Double]("bleu2") == 0.0)
  }

  test("rakeKeywords: degree/frequency word scores and phrase sums " +
      "replay the hand computation; empty-normalized tokens break runs") {
    val docs = Seq(
      (1L, "deep learning of deep learning systems"),
      (2L, "deep learning"),
      (3L, "fast - cars")).toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.rakeKeywords(docs, "doc_id", "text",
      stopwords = Seq("the", "a", "an", "of", "and", "in", "to", "is"),
      k = 20).collect()
    // deep/learning: freq 3, deg 2+3+2 = 7 -> s9 = round(7/3 * 1e9);
    // systems: 3.0 exactly
    assert(r.length == 4)
    assert(r(0).getAs[String]("phrase") == "deep learning systems")
    assert(r(0).getAs[Long]("n_occurrences") == 1L)
    assert(r(0).getAs[Double]("rake_score") == 7.666667)
    assert(r(1).getAs[String]("phrase") == "deep learning")
    assert(r(1).getAs[Long]("n_occurrences") == 2L)
    assert(r(1).getAs[Double]("rake_score") == 4.666667)
    // "-" normalizes to empty -> break: two single-word phrases
    assert(r.map(_.getAs[String]("phrase")).toSet
      .contains("cars") && r.map(_.getAs[String]("phrase")).toSet
      .contains("fast"))
    assert(r(2).getAs[Double]("rake_score") == 1.0)
  }

  test("knBigramEntropy: hand-computed interpolated-KN probabilities " +
      "on a 3-bigram corpus; sub-2-token docs emit the zero row") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, ""), (4L, "z"))
      .toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis
      .knBigramEntropy(docs, "doc_id", "text", discount = 0.75)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // cvw: (a,b)=3 (b,a)=1 (b,c)=1; cv(a)=3 n1v(a)=1; cv(b)=2 n1v(b)=2;
    // n1w = 1 for each of a,b,c; N1+(..) = 3
    val d = 0.75
    def p(cvw: Long, cv: Long, n1v: Long, n1w: Long): Double =
      (math.max(cvw.toDouble - d, 0.0) +
        d * n1v.toDouble * (n1w.toDouble / 3.0)) / cv.toDouble
    def s9(pp: Double): Long = BigDecimal(-math.log(pp) / math.log(2.0)
      * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sAB = s9(p(3, 3, 1, 1)); val sBA = s9(p(1, 2, 2, 1))
    assert(r(1L).getAs[Long]("n_bigrams") == 3L)
    assert(r(1L).getAs[Double]("kn_entropy") ==
      r6((2 * sAB + sBA).toDouble / 1e9 / 3.0))
    assert(r(2L).getAs[Long]("n_bigrams") == 2L)
    assert(r(2L).getAs[Double]("kn_entropy") ==
      r6((sAB + sBA).toDouble / 1e9 / 2.0))
    assert(r(3L).getAs[Long]("n_bigrams") == 0L)
    assert(r(3L).getAs[Double]("kn_entropy") == 0.0)
    assert(r(4L).getAs[Long]("n_bigrams") == 0L)
  }

  test("lexicalDiversity: hand counts; single-token doc gets NULL " +
      "Simpson; looped text scores low hapax share") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c a"),  // 5 tokens, 3 types (a:3 b:1 c:1), hapax 2
      (2L, "x"),          // 1 token: TTR 1, Simpson NULL
      (3L, "go go go go")) // looped: 1 type, 0 hapax
      .toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .collect().map(x => (x.getAs[Long]("doc_id"), x)).toMap
    assert(r(1L).getAs[Long]("n_tokens") == 5L)
    assert(r(1L).getAs[Long]("n_types") == 3L)
    assert(r(1L).getAs[Long]("n_hapax") == 2L)
    assert(r(1L).getAs[Double]("ttr") == 0.6)
    // Simpson: 1 - (3*2 + 0 + 0)/(5*4) = 1 - 0.3 = 0.7
    assert(r(1L).getAs[Double]("simpson_d") == 0.7)
    assert(r(2L).getAs[Double]("ttr") == 1.0)
    assert(r(2L).isNullAt(r(2L).fieldIndex("simpson_d")))
    assert(r(3L).getAs[Long]("n_hapax") == 0L)
    assert(r(3L).getAs[Double]("simpson_d") == 0.0)
  }

  test("rougeLPairs: the nested grid fold lands on hand-computed LCS; " +
      "gappy in-order overlap scores where contiguity would not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a x b y e"),   // LCS vs 1: a b e = 3
      (3L, "e d c b a"),   // LCS vs 1: one token = 1 (reversed)
      (4L, "a b c d e"))   // identical: LCS = 5
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val r = graft.ops.TextAnalysis.rougeLPairs(docs, "doc_id", "text",
      pairs).collect().map(x => (x.getAs[Long]("id_b"), x)).toMap
    assert(r(2L).getAs[Long]("lcs_len") == 3L)
    assert(r(2L).getAs[Double]("rouge_recall") == 0.6)
    assert(r(2L).getAs[Double]("rouge_f1") == 0.6)
    assert(r(3L).getAs[Long]("lcs_len") == 1L)
    assert(r(4L).getAs[Long]("lcs_len") == 5L)
    assert(r(4L).getAs[Double]("rouge_f1") == 1.0)
    // fail loud past the DP bound
    intercept[Exception] {
      graft.ops.TextAnalysis.rougeLPairs(
        Seq((1L, Seq.fill(300)("w").mkString(" ")), (2L, "w w"))
          .toDF("doc_id", "text"),
        "doc_id", "text", Seq((1L, 2L)).toDF("id_a", "id_b"))
        .collect()
    }
  }
}
