package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two hot loops where built-in
  * higher-order functions (interpreted lambda-per-element) dominate
  * runtime (SURVEY.md §7.2 escalation order: compose built-ins → custom
  * `Expression` → custom operator). Both are deterministic scalar
  * expressions: one virtual call per ROW with a tight JVM loop inside,
  * versus one interpreted closure call per ELEMENT for the
  * `transform`/`aggregate`/`zip_with` formulation — a 50–100× constant-
  * factor win on 64-dim vectors / 100-shingle documents, with identical
  * results (same accumulation order).
  */
object Native {

  /** Per-thread MD5 digest shared by the hash-family expressions below.
    * Expression instances can be evaluated from several local-mode task
    * threads at once, so the digest is thread-local, reset per use.
    */
  private val md5Digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 64 bits of md5(s as UTF-8) read big-endian — numerically equal
    * to parsing the first 16 hex chars of the md5 hex string, which is how
    * the DuckDB oracle replays it (`('0x'||substr(md5(s),1,16))::UBIGINT`).
    */
  private def md5Hi64(s: String): Long = {
    val d = md5Digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (bytes(k) & 0xffL); k += 1 }
    h
  }

  /** MinHash signature of a document: word n-gram shingles → first 60 bits
    * of md5(shingle) reduced mod P = 2³¹−1 → per-permutation min of
    * (a_p·h + b_p) mod P with a_p = 1103515245 + 2p, b_p = 12345 + 7919p
    * (the Carter–Wegman affine family keyed by the md5 fold). Empty docs
    * (< n words) yield the sentinel signature of all 2³¹−1 (an empty
    * set's min).
    *
    * Every step is an exact BIGINT computation a SQL engine replays
    * verbatim: the 60-bit fold is `('0x'||substr(md5(s),1,15))::BIGINT`
    * and a_p·h < 2⁶² never overflows — which is what moves the whole
    * MinHash near-dup family onto full DuckDB hash oracles (the
    * x_item_cf_lsh minstd lesson; the previous FNV-1a fold relied on
    * wrapping 64-bit multiplies no SQL engine reproduces).
    */
  case class MinHashSignature(child: Expression, n: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    private val M = 2147483647L

    override def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
      val mins = Array.fill(numHashes)(M)
      if (words.length >= n) {
        val seen = new java.util.HashSet[Long]()
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i <= words.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          // first 60 bits (== first 15 hex chars) of the md5, mod P —
          // non-negative, so plain % matches SQL %
          val hx = (md5Hi64(sb.toString) >>> 4) % M
          if (seen.add(hx)) { // distinct shingles only (min is unaffected;
            var p = 0         // the set just skips redundant work)
            while (p < numHashes) {
              val v = ((1103515245L + 2L * p) * hx + (12345L + 7919L * p)) % M
              if (v < mins(p)) mins(p) = v
              p += 1
            }
          }
          i += 1
        }
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "minhash_signature"
  }

  /** Distinct word n-gram shingles of a document, first-occurrence order —
    * semantically identical to
    * `array_distinct(transform(sequence(...), i => concat_ws(" ",
    * slice(split(trim(text), "\\s+"), i+1, n))))`, but one tight JVM loop
    * per row instead of an interpreted closure per shingle (the HOF form
    * re-slices the word array per element). Documents with fewer than `n`
    * words yield an empty array, like the guarded HOF form.
    */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
      if (words.length < n) return new GenericArrayData(Array.empty[Any])
      val out = new java.util.LinkedHashSet[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
      val arr = new Array[Any](out.size)
      val it = out.iterator()
      var k = 0
      while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "word_shingles"
  }

  /** Cosine similarity of two float/double arrays, single pass, double
    * accumulation in element order — bit-identical to the
    * `aggregate(zip_with(...))` formulation it replaces (and hence to the
    * DuckDB oracle).
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true // NULL on dimension mismatch

    private def valueAt(a: ArrayData, et: DataType, i: Int): Double =
      et match {
        case FloatType  => a.getFloat(i).toDouble
        case DoubleType => a.getDouble(i)
        case _ => throw new IllegalArgumentException(s"bad element type $et")
      }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val la = l.asInstanceOf[ArrayData]
      val ra = r.asInstanceOf[ArrayData]
      // dimension mismatch → NULL (a corrupt embedding must not produce a
      // plausible similarity; matches zip_with's NULL on unequal lengths)
      if (la.numElements() != ra.numElements()) return null
      val let = left.dataType.asInstanceOf[ArrayType].elementType
      val ret = right.dataType.asInstanceOf[ArrayType].elementType
      val len = la.numElements()
      var dot = 0.0; var nl = 0.0; var nr = 0.0
      var i = 0
      while (i < len) {
        val x = valueAt(la, let, i); val y = valueAt(ra, ret, i)
        dot += x * y; nl += x * x; nr += y * y
        i += 1
      }
      dot / (math.sqrt(nl) * math.sqrt(nr))
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
    override def prettyName: String = "cosine_similarity"
  }

  /** All substrings of a word up to `maxLen` CODE POINTS, with
    * multiplicity — the unigram trainer's seed-candidate generator as a
    * narrow expression over the vocab-bounded word table.
    */
  case class SubstringsUpto(child: Expression, maxLen: Int)
      extends UnaryExpression with CodegenFallback {
    require(maxLen >= 1 && maxLen <= 16,
      s"substrings_upto: maxLen in [1, 16] (got $maxLen)")
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any = {
      val cps = graft.ops.Bpe.charSymbols(
        input.asInstanceOf[UTF8String].toString)
      val out = Array.newBuilder[UTF8String]
      var i = 0
      while (i < cps.length) {
        var l = 1
        val lim = math.min(maxLen, cps.length - i)
        while (l <= lim) {
          out += UTF8String.fromString(cps.slice(i, i + l).mkString)
          l += 1
        }
        i += 1
      }
      new GenericArrayData(out.result().asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "substrings_upto"
  }

  /** Viterbi unigram segmentation with the piece table riding in the
    * expression (the [[BpeEncode]] deployment shape): `perWord = true`
    * segments the input AS one word (the trainer's E-step over the word
    * table); `perWord = false` lower/splits the input text and
    * concatenates per-word segmentations (the corpus tokenizer), with
    * per-task word memoization. Tie-break and reachability contract live
    * in `graft.ops.Unigram.segmentLocal`, which this must match exactly
    * (UnigramSpec asserts it).
    */
  case class UnigramSegment(child: Expression,
                            table: Seq[(String, Long)], maxLen: Int,
                            perWord: Boolean)
      extends UnaryExpression with CodegenFallback {
    require(table.nonEmpty, "unigram_segment: empty piece table")
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    @transient private lazy val logp: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      table.foreach { case (p, lp) => m.put(p, lp) }
      m
    }
    @transient private lazy val memo =
      new java.util.HashMap[String, Array[UTF8String]]()

    private def segmentWord(w: String): Array[UTF8String] = {
      val hit = memo.get(w)
      if (hit != null) return hit
      val toks = graft.ops.Unigram.segmentLocal(w, { k =>
        val v = logp.get(k)
        if (v == null) None else Some(v.longValue())
      }, maxLen)
      val arr = toks.iterator.map(UTF8String.fromString).toArray
      if (memo.size < 65536) memo.put(w, arr)
      arr
    }

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      if (perWord) {
        new GenericArrayData(segmentWord(s).asInstanceOf[Array[Any]])
      } else {
        val words = s.toLowerCase.trim.split("\\s+")
        val out = Array.newBuilder[UTF8String]
        var i = 0
        while (i < words.length) {
          if (words(i).nonEmpty) out ++= segmentWord(words(i))
          i += 1
        }
        new GenericArrayData(out.result().asInstanceOf[Array[Any]])
      }
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "unigram_segment"
  }

  /** WordPiece-style greedy longest-match tokenization: per word,
    * repeatedly take the LONGEST vocabulary piece matching at the
    * current position — word-initial pieces from `initials`,
    * continuation pieces (emitted with the "##" prefix) from `conts`.
    * The vocabulary is trained on the same corpus with all single
    * characters force-included ([[graft.ops.Bpe.wordPieceVocab]]), so
    * a match always exists there; any out-of-vocabulary character
    * FAILS LOUD instead of emitting a silent [UNK] (the sweepExact
    * guard precedent — an engine that silently degrades token counts
    * poisons every downstream fertility metric).
    *
    * Greedy maxmatch is the canonical WordPiece inference (Devlin et
    * al. 2019 §B; the trainer here is frequency-ranked rather than
    * likelihood-ranked — documented simplification). Completes the
    * tokenizer triad next to [[BpeEncode]] (merge-order) and
    * [[UnigramSegment]] (Viterbi).
    */
  case class WordPieceEncode(child: Expression, initials: Seq[String],
                             conts: Seq[String], maxPieceLen: Int)
      extends UnaryExpression with CodegenFallback {
    require(initials.nonEmpty && conts.nonEmpty,
      "wordpiece_encode: empty vocabulary")
    require(maxPieceLen >= 1, "wordpiece_encode: maxPieceLen >= 1")
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    @transient private lazy val initSet = {
      val s = new java.util.HashSet[String]()
      initials.foreach(s.add); s
    }
    @transient private lazy val contSet = {
      val s = new java.util.HashSet[String]()
      conts.foreach(s.add); s
    }
    @transient private lazy val memo =
      new java.util.HashMap[String, Array[UTF8String]]()

    private def encodeWord(w: String): Array[UTF8String] = {
      val hit = memo.get(w)
      if (hit != null) return hit
      val out = Array.newBuilder[UTF8String]
      var pos = 0
      while (pos < w.length) {
        var l = math.min(maxPieceLen, w.length - pos)
        var matched = -1
        while (l >= 1 && matched < 0) {
          val piece = w.substring(pos, pos + l)
          val inVocab =
            if (pos == 0) initSet.contains(piece)
            else contSet.contains(piece)
          if (inVocab) matched = l else l -= 1
        }
        if (matched < 0)
          throw new IllegalStateException(
            s"wordpiece_encode: no piece matches '$w' at $pos — " +
              "vocabulary not trained on this corpus")
        val piece = w.substring(pos, pos + matched)
        out += UTF8String.fromString(
          if (pos == 0) piece else "##" + piece)
        pos += matched
      }
      val arr = out.result()
      if (memo.size < 65536) memo.put(w, arr)
      arr
    }

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val words = s.toLowerCase.trim.split("\\s+")
      val out = Array.newBuilder[UTF8String]
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) out ++= encodeWord(words(i))
        i += 1
      }
      new GenericArrayData(out.result().asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "wordpiece_encode"
  }

  /** Banded (Ukkonen) Levenshtein: the edit distance IF it is ≤ `k`,
    * NULL otherwise — the fuzzy-match filter+distance in one expression.
    * The full DP the builtin `levenshtein` runs is O(|s|·|t|) per pair;
    * a blocked fuzzy join only ever cares about distances ≤ k, and the
    * banded DP visits only the 2k+1 diagonal cells per row — O(k·n) —
    * with an early exit the moment the whole band exceeds k. At fuzzy-
    * join scale (millions of candidate pairs after blocking) this is the
    * difference between a 26×26 table and a 5-cell band per pair.
    * Exactly equal to `levenshtein(s, t) <= k ? levenshtein(s, t) : NULL`
    * (DedupSpec asserts equivalence against the builtin).
    */
  case class LevenshteinWithin(left: Expression, right: Expression, k: Int)
      extends BinaryExpression with CodegenFallback {
    require(k >= 0 && k <= 1000,
      s"levenshtein_within: k in [0, 1000] (got $k)")
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true

    override def nullSafeEval(l: Any, r: Any): Any = {
      // code POINTS, not UTF-16 units — the builtin levenshtein counts
      // code points, and equivalence with it is the contract
      val sp = l.asInstanceOf[UTF8String].toString.codePoints().toArray
      val tp = r.asInstanceOf[UTF8String].toString.codePoints().toArray
      // ensure b is the longer side (band logic is symmetric)
      val (a, b) = if (sp.length <= tp.length) (sp, tp) else (tp, sp)
      val n = a.length; val m = b.length
      if (m - n > k) return null
      if (m == 0) return 0
      val INF = k + 1
      // prev/cur over b's columns, but only the band [i-k, i+k] is live
      val prev = new Array[Int](m + 1)
      val cur = new Array[Int](m + 1)
      var j = 0
      while (j <= m) { prev(j) = if (j <= k) j else INF; j += 1 }
      var i = 1
      while (i <= n) {
        val lo = math.max(1, i - k)
        val hi = math.min(m, i + k)
        cur(lo - 1) = INF
        if (lo == 1) cur(0) = if (i <= k) i else INF
        var bandMin = INF
        j = lo
        while (j <= hi) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
          val del = if (prev(j) < INF) prev(j) + 1 else INF
          val ins = if (cur(j - 1) < INF) cur(j - 1) + 1 else INF
          var v = if (sub < del) sub else del
          if (ins < v) v = ins
          if (v > INF) v = INF
          cur(j) = v
          if (v < bandMin) bandMin = v
          j += 1
        }
        if (hi < m) cur(hi + 1) = INF
        if (bandMin > k) return null // whole band over budget: early exit
        System.arraycopy(cur, 0, prev, 0, m + 1)
        i += 1
      }
      if (prev(m) <= k) prev(m) else null
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
    override def prettyName: String = "levenshtein_within"
  }

  /** TRUE Damerau–Levenshtein distance (Lowrance–Wagner, unrestricted:
    * transposing two adjacent characters costs 1 even when later edits
    * land between them — 'CA'→'ABC' is 2 here where the common OSA
    * shortcut answers 3). Spark ships only plain `levenshtein`, which
    * bills every swapped-letter typo ("Mirheal" for "Mihreal") as TWO
    * edits and pushes it past tight fuzzy-join cutoffs; transpositions
    * are the most common human typo class, so entity resolution wants
    * them at cost 1. Matches DuckDB's `damerau_levenshtein` — the
    * oracle cross-check runs against a genuinely independent
    * implementation. Code points, like the builtin levenshtein.
    */
  case class DamerauLevenshtein(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[UTF8String].toString.codePoints().toArray
      val b = r.asInstanceOf[UTF8String].toString.codePoints().toArray
      val n = a.length; val m = b.length
      if (n == 0) return m
      if (m == 0) return n
      val inf = n + m
      val d = Array.ofDim[Int](n + 2, m + 2)
      d(0)(0) = inf
      var i = 0
      while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
      var j = 0
      while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
      // da: last row where each code point appeared in `a`
      val da = scala.collection.mutable.HashMap.empty[Int, Int]
      i = 1
      while (i <= n) {
        var db = 0 // last column where b matched a's current row
        j = 1
        while (j <= m) {
          val k = da.getOrElse(b(j - 1), 0)
          val l2 = db
          val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
          val sub = d(i)(j) + cost
          val ins = d(i + 1)(j) + 1
          val del = d(i)(j + 1) + 1
          val trans = d(k)(l2) + (i - 1 - k) + 1 + (j - 1 - l2)
          var v = if (sub < ins) sub else ins
          if (del < v) v = del
          if (trans < v) v = trans
          d(i + 1)(j + 1) = v
          j += 1
        }
        da(a(i - 1)) = i
        i += 1
      }
      d(n + 1)(m + 1)
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
    override def prettyName: String = "damerau_levenshtein"
  }

  /** Nearest-centroid assignment against a small codebook carried in the
    * expression itself (the broadcast-codebook IVF pattern: the quantizer
    * is trained on a bounded sample, the assignment is this narrow map).
    * Returns the argmin squared-L2 cell index, lowest index on ties;
    * NULL on a dimension mismatch (corrupt embedding must not land in a
    * plausible cell).
    */
  /** Read an array column's row value into a primitive double array,
    * resolving the element type ONCE per row (not per element inside the
    * distance loops).
    */
  private def readVec(a: ArrayData, et: DataType): Array[Double] = et match {
    case DoubleType => a.toDoubleArray()
    case FloatType =>
      val n = a.numElements()
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = a.getFloat(i).toDouble; i += 1 }
      out
    case _ => throw new IllegalArgumentException(s"bad element type $et")
  }

  /** Squared L2 distances of `vec` to every centroid — the shared inner
    * loop of [[NearestCentroid]] and [[NearestCentroids]].
    */
  private def sqDists(vec: Array[Double],
                      centroids: Array[Array[Double]]): Array[Double] = {
    val out = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dist = 0.0
      var i = 0
      while (i < vec.length) {
        val dd = vec(i) - cent(i)
        dist += dd * dd
        i += 1
      }
      out(c) = dist
      c += 1
    }
    out
  }

  case class NearestCentroid(child: Expression,
                             centroids: Array[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      if (centroids.length == 0 || centroids(0).length != a.numElements())
        return null
      val dists = sqDists(readVec(a, et), centroids)
      var best = 0
      var c = 1
      while (c < dists.length) {
        if (dists(c) < dists(best)) best = c
        c += 1
      }
      best
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "nearest_centroid"
  }

  /** The `nProbe` nearest centroid indices by squared L2, ascending
    * distance with an index tiebreak — the multi-probe IVF assignment
    * ([[NearestCentroid]] is the nProbe=1 special case; same metric, so a
    * corpus assigned by one and probed by the other is consistent).
    * Returns fewer than nProbe entries only when there are fewer
    * centroids. NULL on dimension mismatch.
    */
  case class NearestCentroids(child: Expression,
                              centroids: Array[Array[Double]], nProbe: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      if (centroids.length == 0 || centroids(0).length != a.numElements())
        return null
      val dists = sqDists(readVec(a, et), centroids)
      val order = dists.indices.sortBy(i => (dists(i), i))
      new GenericArrayData(
        order.take(math.min(nProbe, centroids.length)).map(Int.box).toArray[Any])
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "nearest_centroids"
  }

  /** 64-bit SimHash fingerprint: lowercase, whitespace-tokenize, hash each
    * token OCCURRENCE to the top 64 md5 bits (big-endian — exactly
    * `('0x'||substr(md5(tok),1,16))::UBIGINT`, so a SQL engine replays the
    * bit votes verbatim), vote ±1 per bit, sign-aggregate (ties → 0). One
    * tight loop per ROW — the explode+64-conditional-sums formulation it
    * replaces shuffles |corpus|×|tokens| rows through a 64-column
    * aggregate. (Previously xxhash64-seeded, which no SQL oracle could
    * reproduce; md5 voting has the same near-dup behavior and makes the
    * whole SimHash family hash-checkable.)
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[UTF8String]
        .toLowerCase.toString.trim.split("\\s+")
      val votes = new Array[Int](64)
      var w = 0
      while (w < words.length) {
        val h = md5Hi64(words(w))
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
        w += 1
      }
      var fp = 0L
      var i = 0
      while (i < 64) { if (votes(i) > 0) fp |= (1L << i); i += 1 }
      fp
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "simhash64"
  }

  /** Shannon entropy (bits) of a document's CODEPOINT histogram — the
    * standard gibberish/boilerplate quality signal (low entropy = repeated
    * filler, high = random noise; natural text sits in a stable band).
    * H = log₂(n) − (Σ cᵢ·log₂ cᵢ)/n computed in one pass per row with the
    * per-codepoint terms accumulated in ascending codepoint order, so the
    * value is deterministic and (at round-6) matches a SQL char-histogram
    * formulation. Empty/whitespace-only strings score 0.
    */
  case class CharEntropy(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      if (s.isEmpty) return 0.0
      val counts = new java.util.TreeMap[Integer, Long]()
      var i = 0
      var n = 0L
      while (i < s.length) {
        val cp = s.codePointAt(i)
        counts.merge(cp, 1L, (a, b) => a + b)
        n += 1
        i += Character.charCount(cp)
      }
      if (n == 0L) return 0.0
      var acc = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next().toDouble
        acc += c * (math.log(c) / math.log(2.0))
      }
      math.log(n.toDouble) / math.log(2.0) - acc / n
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "char_entropy"
  }

  /** Unicode NFC normalization (canonical decomposition + canonical
    * composition) — the first step of every serious text-cleanup pipeline
    * (CCNet normalizes before hashing; dedup fingerprints over
    * un-normalized text miss canonically-equal duplicates: "é" composed
    * vs "e"+U+0301 decomposed hash apart). Delegates to the JDK's ICU-
    * derived `java.text.Normalizer`, with an `isNormalized` fast path so
    * the (overwhelmingly common) already-NFC document costs one scan and
    * ZERO allocation. DuckDB's `nfc_normalize` implements the same
    * Unicode algorithm, which is what makes the result oracle-checkable.
    */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val u = input.asInstanceOf[UTF8String]
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "nfc_normalize"
  }

  /** Morton (Z-order) bit interleave of two bucket indices: bit `2i` of
    * the result is bit `i` of `left`, bit `2i+1` is bit `i` of `right`,
    * for `bits` bits per dimension (≤31; result fits a long for bits≤31).
    * Consecutive Z values are near each other in BOTH dimensions, so
    * range-partitioning a write by this value gives every output file a
    * bounded min/max span on each clustering column — two-dimensional
    * zone maps from one sort key (the layout `OPTIMIZE ZORDER BY` builds
    * in lakehouse engines). One tight loop per row.
    */
  case class InterleaveBits(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression with CodegenFallback {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[Int]
      val b = r.asInstanceOf[Int]
      var z = 0L
      var i = 0
      while (i < bits) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
    override def prettyName: String = "interleave_bits"
  }

  /** Product-quantization decode: an array of `m` code indices becomes the
    * concatenation of the corresponding per-subspace centroids — the
    * reconstruction used for asymmetric-distance (ADC) scoring, where the
    * query stays exact and only the candidate side is approximated.
    * Codebooks (m × k × subdim) ride inside the expression like
    * [[NearestCentroid]]'s centroids. NULL on a malformed code array.
    */
  case class PqReconstruct(child: Expression,
                           codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true

    private val subDim = if (codebooks.isEmpty) 0 else codebooks(0)(0).length

    override def nullSafeEval(input: Any): Any = {
      val codes = input.asInstanceOf[ArrayData]
      if (codes.numElements() != codebooks.length) return null
      val out = new Array[Any](codebooks.length * subDim)
      var s = 0
      while (s < codebooks.length) {
        // a NULL code (NearestCentroid's dimension-mismatch marker) must
        // not decode as centroid 0 — propagate the NULL
        if (codes.isNullAt(s)) return null
        val c = codes.getInt(s)
        if (c < 0 || c >= codebooks(s).length) return null
        val cent = codebooks(s)(c)
        var i = 0
        while (i < subDim) { out(s * subDim + i) = cent(i); i += 1 }
        s += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "pq_reconstruct"
  }

  /** Winnowing fingerprint positions (Schleimer/Wilkerson/Aiken 2003) of
    * a document in ONE loop per row: polynomial rolling hash of every
    * `k`-char gram (base 257 mod 2³¹−1 — the oracle replays the same
    * polynomial per gram via `list_reduce`), then each sliding window of
    * `w` hashes elects its minimum with the rightmost-on-ties rule via
    * the `h·10⁴ + (9999−pos)` encoding, and contiguous winner runs
    * collapse to their first window. Returns the strictly-increasing
    * 1-based winner positions. The dataflow formulation (1.3M-row gram
    * explode → md5/conv projection → per-doc window shuffle → lag
    * dedupe) computes the identical set ~5× slower; TextAnalysisSpec
    * keeps it as the semantic cross-check.
    *
    * Hash chars are UTF-16 units (== codepoints == bytes on the ASCII
    * corpora the oracle checks; non-BMP text would diverge from
    * DuckDB's per-codepoint replay — same caveat class as the BPE
    * trainer's ordering note). Documents with more than 9999 grams
    * throw (position slot width); fewer than `w` grams fingerprint
    * nothing, exactly like the window formulation's `pos >= w` filter.
    */
  case class WinnowFingerprints(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true

    private val M = 2147483647L
    private val B = 257L

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val total = s.length - k + 1
      if (total > 9999)
        throw new IllegalArgumentException(
          s"winnow_fingerprints: document exceeds 9999 $k-grams " +
            "(position slot of the winnow encoding); chunk first")
      if (total < w) return new GenericArrayData(Array.empty[Any])
      var p = 1L
      var i = 0
      while (i < k - 1) { p = p * B % M; i += 1 }
      val h = new Array[Long](total)
      var acc = 0L
      i = 0
      while (i < k) { acc = (acc * B + s.charAt(i)) % M; i += 1 }
      h(0) = acc
      i = 1
      while (i < total) {
        acc = ((acc - s.charAt(i - 1) * p % M + M) % M * B +
          s.charAt(i + k - 1)) % M
        h(i) = acc
        i += 1
      }
      val out = Array.newBuilder[Any]
      var lastWinner = -1L
      var pos = w
      while (pos <= total) {
        var best = Long.MaxValue
        var j = pos - w
        while (j < pos) {
          val e = h(j) * 10000L + (9999L - (j + 1))
          if (e < best) best = e
          j += 1
        }
        if (best != lastWinner) {
          lastWinner = best
          out += (9999L - best % 10000L).toInt
        }
        pos += 1
      }
      new GenericArrayData(out.result())
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "winnow_fingerprints"
  }

  /** BPE-encode a document with a trained merge list (Sennrich 2016):
    * lowercase + whitespace-tokenize, then per WORD replay the merges in
    * rank order — replay-in-training-order is the definition of BPE
    * encoding (the rank-priority-queue form is an equivalent
    * optimization). Merges never cross word boundaries, so concatenating
    * a word's tokens reproduces the word exactly — the round-trip
    * invariant `x_bpe_tokens` oracle-checks.
    *
    * The merge table (k entries, the vocab budget) rides inside the
    * expression like [[NearestCentroid]]'s centroids — broadcast with the
    * plan, no join. One tight JVM loop per row with a bounded per-word
    * memo (natural-language corpora repeat words heavily, so most words
    * hit the memo and cost one hash probe instead of k merge scans).
    * Codepoint-safe symbol splitting (a surrogate pair is ONE symbol).
    */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    // per-task instance (plans deserialize per task), so no sync needed
    @transient private lazy val memo =
      new java.util.HashMap[String, Array[UTF8String]]()

    private def encodeWord(w: String): Array[UTF8String] = {
      val hit = memo.get(w)
      if (hit != null) return hit
      // codepoint-safe char split
      var syms = {
        val b = Array.newBuilder[String]
        var i = 0
        while (i < w.length) {
          val n = Character.charCount(w.codePointAt(i))
          b += w.substring(i, i + n)
          i += n
        }
        b.result()
      }
      merges.foreach { case (a, b) =>
        var i = 0
        var found = false
        while (i < syms.length - 1 && !found) {
          found = syms(i) == a && syms(i + 1) == b; i += 1
        }
        if (found) { // skip the rebuild when the pair is absent (common)
          val out = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
      }
      val arr = syms.map(UTF8String.fromString)
      if (memo.size < 65536) memo.put(w, arr)
      arr
    }

    override def nullSafeEval(input: Any): Any = {
      val words = input.asInstanceOf[UTF8String].toString
        .toLowerCase.trim.split("\\s+")
      val out = Array.newBuilder[UTF8String]
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) out ++= encodeWord(words(i))
        i += 1
      }
      new GenericArrayData(out.result().asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "bpe_encode"
  }

  // Spark 4 classic bridge: Column <-> catalyst Expression
  private def toExpr(c: Column): Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)
  private def toCol(e: Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  def minhash_signature(text: Column, n: Int, numHashes: Int): Column =
    toCol(MinHashSignature(toExpr(text), n, numHashes))

  def word_shingles(text: Column, n: Int): Column =
    toCol(WordShingles(toExpr(text), n))

  def nearest_centroid(vec: Column, centroids: Array[Array[Double]]): Column =
    toCol(NearestCentroid(toExpr(vec), centroids))

  def nearest_centroids(vec: Column, centroids: Array[Array[Double]],
                        nProbe: Int): Column =
    toCol(NearestCentroids(toExpr(vec), centroids, nProbe))

  def pq_reconstruct(codes: Column,
                     codebooks: Array[Array[Array[Double]]]): Column =
    toCol(PqReconstruct(toExpr(codes), codebooks))

  def simhash64(text: Column): Column = toCol(SimHash64(toExpr(text)))

  def interleave_bits(a: Column, b: Column, bits: Int): Column =
    toCol(InterleaveBits(toExpr(a), toExpr(b), bits))

  def char_entropy(text: Column): Column = toCol(CharEntropy(toExpr(text)))

  def nfc_normalize(text: Column): Column = toCol(NfcNormalize(toExpr(text)))

  def cosine_similarity(a: Column, b: Column): Column =
    toCol(CosineSimilarity(toExpr(a), toExpr(b)))

  def levenshtein_within(a: Column, b: Column, k: Int): Column =
    toCol(LevenshteinWithin(toExpr(a), toExpr(b), k))

  def damerau_levenshtein(a: Column, b: Column): Column =
    toCol(DamerauLevenshtein(toExpr(a), toExpr(b)))

  def substrings_upto(w: Column, maxLen: Int): Column =
    toCol(SubstringsUpto(toExpr(w), maxLen))

  /** Per-WORD Viterbi segmentation (the trainer's E-step); the piece
    * table carries 1e-9-lattice log-probs as exact longs.
    */
  def unigram_segment(w: Column, table: Seq[(String, Long)],
                      maxLen: Int): Column =
    toCol(UnigramSegment(toExpr(w), table, maxLen, perWord = true))

  /** Whole-text unigram tokenization (lower/split, per-word memoized). */
  def unigram_segment_text(text: Column, table: Seq[(String, Long)],
                           maxLen: Int): Column =
    toCol(UnigramSegment(toExpr(text), table, maxLen, perWord = false))

  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    toCol(BpeEncode(toExpr(text), merges))

  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    toCol(WinnowFingerprints(toExpr(text), k, w))

  def wordpiece_encode(text: Column, initials: Seq[String],
                       conts: Seq[String], maxPieceLen: Int): Column =
    toCol(WordPieceEncode(toExpr(text), initials, conts, maxPieceLen))
}
