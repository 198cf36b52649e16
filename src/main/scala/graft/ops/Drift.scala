package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Drift-detection statistics (SURVEY.md §2.7, D1–D4) — the two-sample
  * Kolmogorov–Smirnov test of `scripts/drift_detection.py:15-54` plus the
  * distribution summaries of `:98-123`, built from windows + aggregates
  * (no UDAF; SURVEY.md §7.2).
  *
  * KS construction (D1):
  *   1. `groupBy(value)` pre-aggregates the two samples to per-distinct-value
  *      counts — this is the scale move: the subsequent ordered window runs
  *      over |distinct values| rows, not |sample| rows;
  *   2. a running sum over `Window.orderBy(value)` yields both ECDFs in one
  *      pass; D = max |F1 - F2|.
  *   3. the asymptotic p-value 2·Σ_{k≥1} (-1)^{k-1} e^{-2k²λ²},
  *      λ = D·√(nm/(n+m)), is a scalar series — computed as a projection
  *      (generate the k series with `sequence`), never on the driver.
  *
  * The ordered window is a single-partition sort over the distinct values —
  * documented caveat (SURVEY.md §7.3#1): for 100 TB, histogram the values
  * first (fixed-width bins via `width_bucket`) so the ordered pass is over a
  * bounded bin count; the exact-distinct form below is used at test scale.
  */
object Drift {

  /** D2: NaN/null cleanup (`drift_detection.py:37-38`). */
  def cleanSamples(df: DataFrame, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))

  /** INTEGER-LATTICE fixed-width binning — the shared scale move behind
    * every `*Binned` rank/ECDF twin (round-9: the one plan family the
    * round-8 audit called weak was exact rank statistics whose ordered
    * window runs at the distinct-value grain; on a continuous axis
    * distinct ≈ rows, so at 100 TB that window is a one-partition sort
    * of the corpus). Binning FIRST bounds every downstream ordered
    * window at ≤ `bins` rows while keeping the whole pipeline exactly
    * engine-replayable:
    *
    *   1. values commit to the centi lattice (`round(v·100)` as long —
    *      the [[cvmTest]] lattice);
    *   2. `lo`/`hi` are exact integer mins/maxes (a 1-row broadcast);
    *   3. `__bin = (vl − lo)·bins div (hi − lo + 1)` — INTEGER floor
    *      division of non-negative longs, so Spark's `div` and
    *      DuckDB's `//` agree bit-for-bit and `__bin ∈ [0, bins)` by
    *      construction (no float width, no `least` clamp);
    *   4. `__binv = (lo + (__bin·span) div bins)/100` — the bin's
    *      integer-lattice representative back in value units, for the
    *      twins whose statistic needs magnitudes (energy gaps,
    *      weighted median), not just order.
    *
    * The coarsening error is ≤ one bin width by construction; each
    * twin's spec pins its statistic-level bound. Overflow-safe while
    * span·bins < 2⁶³ (span = lattice range): ~9·10¹⁵ lattice units at
    * bins=1000 — fail-loud is the engines' ANSI/ overflow behavior,
    * not silence, because the product is integer arithmetic.
    *
    * Plan: one 1-row bounds aggregate broadcast into a projection —
    * zero extra shuffles; the downstream stat's per-bin aggregation is
    * the only corpus-sized exchange.
    */
  def latticeBin(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 100000,
      s"latticeBin: bins in [2, 100000] (got $bins)")
    val v = col(valueCol).cast("double")
    val lat = df.filter(v.isNotNull && !isnan(v))
      .withColumn("__vl", round(v * 100, 0).cast("long"))
    val bounds = lat.agg(min(col("__vl")).as("__lo"),
      max(col("__vl")).as("__hi"))
    lat.crossJoin(broadcast(bounds))
      .withColumn("__bin",
        expr(s"((__vl - __lo) * $bins) div (__hi - __lo + 1)"))
      .withColumn("__binv",
        (col("__lo") +
          expr(s"(__bin * (__hi - __lo + 1)) div $bins"))
          .cast("double") / 100.0)
      .drop("__vl", "__lo", "__hi")
  }

  /** Shared first step of the two-sample lattice statistics: ONE
    * corpus-sized aggregation to per-centi-lattice-value side counts.
    * Everything downstream (exact fold, or bin-then-fold) works on the
    * distinct-value frame — so the binned twins cost the SAME single
    * corpus pass as their exact siblings (the rank9 lesson: a separate
    * bounds pass over the corpus doubled the binned forms' scan cost).
    */
  private def sideCounts(tagged: DataFrame, valueCol: String,
                         sideCol: String, a: String, b: String): DataFrame =
    cleanSamples(tagged, valueCol)
      .filter(col(sideCol) === a || col(sideCol) === b)
      .groupBy(round(col(valueCol) * 100, 0).cast("long").as("__v"))
      .agg(sum(when(col(sideCol) === a, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(sideCol) === b, 1L).otherwise(0L)).as("__cb"))

  /** [[latticeBin]]'s integer binning applied to a PER-DISTINCT-VALUE
    * count frame (`__v` on the centi lattice + `countCols`): exact
    * integer bounds from the distinct frame itself (cheap — no corpus
    * pass), floor-division bin and representative per the latticeBin
    * contract, counts re-summed at the bin grain. Binning is a pure
    * function of `__v`, so bin-of-rows ≡ bin-of-distinct-values and the
    * `*_binned` oracles replay either way.
    */
  private[ops] def binCounts(perValue: DataFrame, bins: Int,
                             countCols: Seq[String]): DataFrame = {
    require(bins >= 2 && bins <= 100000,
      s"binCounts: bins in [2, 100000] (got $bins)")
    val bounds = perValue.agg(min(col("__v")).as("__lo"),
      max(col("__v")).as("__hi"))
    val aggs = countCols.map(c => sum(col(c)).as(c))
    perValue.crossJoin(broadcast(bounds))
      .withColumn("__bin",
        expr(s"((__v - __lo) * $bins) div (__hi - __lo + 1)"))
      .withColumn("__rv",
        expr(s"__lo + (__bin * (__hi - __lo + 1)) div $bins"))
      .groupBy(col("__bin"), col("__rv"))
      .agg(aggs.head, aggs.tail: _*)
  }

  private def cvmFold(perValue: DataFrame): DataFrame = {
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cum = perValue
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
    val totW = Window.partitionBy()
    val cum2 = cum
      .withColumn("__n", sum(col("__ca")).over(totW))
      .withColumn("__m", sum(col("__cb")).over(totW))
      .withColumn("__t", dec(col("__cuma")) * col("__m") -
        dec(col("__cumb")) * col("__n"))
    val f = cum2.agg(count(lit(1)).as("n_values"),
      max(col("__n")).as("n_a"), max(col("__m")).as("n_b"),
      sum(dec(col("__ca") + col("__cb")) * col("__t") * col("__t"))
        .as("__num"))
    val nD = col("n_a").cast("double"); val mD = col("n_b").cast("double")
    val t = col("__num").cast("double") /
      (((nD + mD) * (nD + mD)) * (nD * mD))
    val ok = col("n_a") > 0 && col("n_b") > 0
    f.select(col("n_a"), col("n_b"), col("n_values"),
      round(when(ok, t), 6).as("cvm_t"),
      when(ok, t > lit(0.461)).as("drifted"))
  }

  /** Two-sample Cramér–von Mises statistic — the INTEGRATED-squared
    * ECDF-gap drift test where KS takes only the single worst gap: a
    * distribution that drifts a little EVERYWHERE moves CvM long before
    * the KS supremum clears noise, and vice versa for one localized
    * spike — run both. T = nm/(n+m)² · Σ_pooled w·(F₁−F₂)², with the
    * asymptotic 5% critical value 0.461 (Anderson) as a shared literal
    * for the drift flag.
    *
    * Determinism: values commit to the centi lattice; the numerator
    * Σ w·(cumA·m − cumB·n)² is an EXACT decimal fold (never a float
    * ECDF difference); one fixed double tree at the end.
    *
    * Plan: one corpus aggregation to the distinct-value grain, the
    * documented bounded ECDF window (the q_ks_drift class), one 1-row
    * fold.
    *
    * Precision bound (fail-quiet edge): the numerator Σ(ca+cb)·t² with
    * |t| ≤ n·m grows like (n+m)·(nm)² — decimal(38,0) holds it through
    * ~5·10⁷ rows per side; beyond that Spark's non-ANSI decimal sum
    * would overflow to a silent NULL cvm_t. Past that scale use
    * [[cvmBinned]]: the same fold over ≤bins rows keeps the sum under
    * bins·(nm)², safe through ~5·10⁸ per side at bins=1000 (and the
    * single-partition distinct-value window is gone, which is the real
    * reason to switch long before the decimal bound bites).
    */
  def cvmTest(tagged: DataFrame, valueCol: String, sideCol: String,
              a: String, b: String): DataFrame =
    cvmFold(sideCounts(tagged, valueCol, sideCol, a, b))

  /** [[cvmTest]] over [[latticeBin]]-coarsened values — the 100 TB form
    * of the CvM drift test (the ksTestBinned pattern): the ordered ECDF
    * window runs over ≤ `bins` non-empty bins instead of the
    * distinct-value grain, and the decimal numerator stays within
    * bounds through ~5·10⁸ rows per side (vs ~5·10⁷ exact). The
    * statistic is the CvM T of the coarsened distributions — within-bin
    * mass relocates to one shared point on BOTH sides symmetrically, so
    * the T error is bounded by the pooled ECDF moving at most one bin's
    * mass (DriftSpec pins it on a shifted-normal pair). Binned twin ≡
    * exact statistic of coarsened values (what the oracle replays), at
    * the SAME single corpus pass as the exact form: per-value counts
    * first, the [[latticeBin]] integer binning applied to the distinct
    * frame ([[binCounts]]), the identical fold after.
    */
  def cvmBinned(tagged: DataFrame, valueCol: String, sideCol: String,
                a: String, b: String, bins: Int = 1000): DataFrame =
    cvmFold(binCounts(sideCounts(tagged, valueCol, sideCol, a, b), bins,
      Seq("__ca", "__cb"))
      // __v = bin·100: the lattice the delegation form committed to
      // (cvmTest re-lattices its value ×100), kept so the registered
      // oracle replays unchanged; ordering is the bin order either way
      .select((col("__bin") * 100L).as("__v"), col("__ca"), col("__cb")))

  /** Two-sample Anderson–Darling statistic (Scholz–Stephens 1987,
    * midrank/tie version A²akN) — the TAIL-WEIGHTED member of the
    * two-sample family: KS takes the worst single ECDF gap, CvM
    * integrates the squared gap uniformly, AD divides each gap by
    * H(1−H) so deviations in the TAILS — exactly where a drifted
    * feature hurts a trained model first — count most. Each distinct
    * value's term is a ratio of exact integers (2× mid-cumulatives, so
    * no half ever floats); the per-term double commits to the 1e-12
    * lattice (the ljungBox device) and sums in decimal(38,0), so
    * partition order cannot move the statistic.
    *
    * Plan: the [[cvmTest]] class — ONE corpus pass to per-value side
    * counts, the bounded ordered ECDF window, one fold. Use
    * [[andersonDarlingBinned]] when the distinct axis is data-sized.
    */
  def andersonDarling(tagged: DataFrame, valueCol: String, sideCol: String,
                      a: String, b: String): DataFrame =
    adFold(sideCounts(tagged, valueCol, sideCol, a, b))

  /** [[andersonDarling]] over the shared integer binning — same single
    * corpus pass, the fold over ≤ `bins` rows (order-only statistic,
    * so the coarsened axis is the bin id). */
  def andersonDarlingBinned(tagged: DataFrame, valueCol: String,
                            sideCol: String, a: String, b: String,
                            bins: Int = 1000): DataFrame =
    adFold(binCounts(sideCounts(tagged, valueCol, sideCol, a, b), bins,
      Seq("__ca", "__cb"))
      .select(col("__bin").as("__v"), col("__ca"), col("__cb")))

  private def adFold(perValue: DataFrame): DataFrame = {
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val totW = Window.partitionBy()
    val cum = perValue
      .withColumn("__l", col("__ca") + col("__cb"))
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cum", sum(col("__ca") + col("__cb")).over(w))
      .withColumn("__n", sum(col("__ca")).over(totW))
      .withColumn("__m", sum(col("__cb")).over(totW))
    // 2× mid-cumulatives keep the ½-tie convention integral
    val N = col("__n") + col("__m")
    val b2 = col("__cum") * 2L - col("__l")
    val m2a = col("__cuma") * 2L - col("__ca")
    val m2b = (col("__cum") - col("__cuma")) * 2L -
      (col("__l") - col("__ca"))
    val denom = b2 * (N * 2L - b2) - N * col("__l")
    def numTerm(m2: Column, ng: Column): Column = {
      val d = (N * m2 - ng * b2).cast("double")
      d * d / ng.cast("double")
    }
    val term = (col("__l").cast("double") / N.cast("double")) *
      (numTerm(m2a, col("__n")) + numTerm(m2b, col("__m"))) /
      denom.cast("double")
    val withT = cum
      .withColumn("__term",
        when(denom > 0 && col("__n") > 0 && col("__m") > 0,
          round(term * 1e12, 0).cast("decimal(38,0)")))
    val f = withT.agg(count(lit(1)).as("n_values"),
      max(col("__n")).as("n_a"), max(col("__m")).as("n_b"),
      coalesce(sum(col("__term")), lit(0L).cast("decimal(38,0)"))
        .as("__s"))
    val nD = col("n_a").cast("double") + col("n_b").cast("double")
    val ok = col("n_a") > 0 && col("n_b") > 0
    f.select(col("n_a"), col("n_b"), col("n_values"),
      round(when(ok, (nD - 1.0) / nD *
        (col("__s").cast("double") / 1e12)), 6).as("ad_stat"))
  }

  /** Two-sample ENERGY distance over centi-lattice values — the
    * moment-free drift metric with the clean closed form in 1-D:
    * D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'|, each expectation an EXACT
    * integer gap-fold over the pooled distinct-value grain
    * (E|X−Y| = Σ gap·(cumA·(m−cumB) + cumB·(n−cumA)) / nm — the
    * ∫ F(1−G)+G(1−F) identity), plus the Székely–Rizzo test statistic
    * nm/(n+m)·D². Zero iff the distributions are identical — it sees
    * mean shifts KS underweights AND shape changes a t-test misses.
    *
    * Determinism: gaps and cumulative counts are exact integers; all
    * three folds are exact decimal sums; one fixed double tree each.
    *
    * Plan: distinct-value aggregation + the bounded ECDF window + a
    * lead(1) gap + one 1-row fold (the q_ks_drift class).
    */
  def energyDistance(tagged: DataFrame, valueCol: String, sideCol: String,
                     a: String, b: String): DataFrame =
    energyFold(sideCounts(tagged, valueCol, sideCol, a, b))

  private def energyFold(perValue: DataFrame): DataFrame = {
    val ord = Window.orderBy(col("__v"))
    val w = ord.rowsBetween(Window.unboundedPreceding, 0)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cum = perValue
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .withColumn("__gap", lead(col("__v"), 1).over(ord) - col("__v"))
    val totW = Window.partitionBy()
    val cum2 = cum
      .withColumn("__n", sum(col("__ca")).over(totW))
      .withColumn("__m", sum(col("__cb")).over(totW))
      .filter(col("__gap").isNotNull)
    val f = cum2.agg(
      max(col("__n")).as("n_a"), max(col("__m")).as("n_b"),
      sum(dec(col("__gap")) * (dec(col("__cuma")) *
        (col("__m") - col("__cumb")) + dec(col("__cumb")) *
        (col("__n") - col("__cuma")))).as("__sxy"),
      sum(dec(col("__gap")) * dec(col("__cuma")) *
        (col("__n") - col("__cuma"))).as("__sxx"),
      sum(dec(col("__gap")) * dec(col("__cumb")) *
        (col("__m") - col("__cumb"))).as("__syy"))
    val nD = col("n_a").cast("double"); val mD = col("n_b").cast("double")
    val exy = col("__sxy").cast("double") / (nD * mD) / 100.0
    val exx = lit(2.0) * col("__sxx").cast("double") / (nD * nD) / 100.0
    val eyy = lit(2.0) * col("__syy").cast("double") / (mD * mD) / 100.0
    val d2 = lit(2.0) * exy - exx - eyy
    val ok = col("n_a") > 0 && col("n_b") > 0
    f.select(col("n_a"), col("n_b"),
      round(when(ok, exy), 6).as("e_between"),
      round(when(ok, exx), 6).as("e_within_a"),
      round(when(ok, eyy), 6).as("e_within_b"),
      round(when(ok, d2), 6).as("energy_d2"),
      round(when(ok, nD * mD / (nD + mD) * d2), 6).as("e_stat"))
  }

  /** [[energyDistance]] over [[latticeBin]]-coarsened values — the
    * 100 TB form: every E|·−·| expectation folds over gaps between ≤
    * `bins` bin representatives instead of the distinct-value grain
    * (the one-partition ECDF window is bounded). Magnitudes matter for
    * an integral, so the coarsened axis is `__binv` — the bin's
    * integer-lattice representative in ORIGINAL value units — and each
    * |x−y| moves by at most one bin width under coarsening, so
    * e_between, both e_within terms, and energy_d2 are each within one
    * bin width of exact (DriftSpec pins it). Same single-corpus-pass
    * count-grain plan as [[cvmBinned]].
    */
  def energyBinned(tagged: DataFrame, valueCol: String, sideCol: String,
                   a: String, b: String, bins: Int = 1000): DataFrame =
    energyFold(binCounts(sideCounts(tagged, valueCol, sideCol, a, b), bins,
      Seq("__ca", "__cb"))
      // __v = the bin's lattice representative: gaps stay in value
      // units for the E|·| integrals (the registered oracle's repr)
      .select(col("__rv").as("__v"), col("__ca"), col("__cb")))

  /** Exact two-sample KS survival probability P(D ≥ d) under the null, by
    * lattice-path counting (Hodges 1958 — the same construction
    * `scipy.stats.ks_2samp` uses in exact mode, which its auto mode picks
    * for small samples; the reference calls it at
    * `scripts/drift_detection.py:49`, so for small n the asymptotic series
    * alone diverges from the cited behavior).
    *
    * Paths from (0,0) to (n,m) staying strictly inside |i/n − j/m| < d are
    * counted in exact BigInt arithmetic (no overflow, no float
    * accumulation); d is snapped to the lattice as h = round(d·lcm(n,m)),
    * and the band test is pure integers: |i·m − j·n| < h·gcd(n,m).
    * p = 1 − inside/C(n+m,n), with the final division done double/double
    * so the DuckDB oracle (HUGEINT DP, same integers) matches bit-exactly.
    * O(n·m) scalar work on ONE aggregated row — never on the data path.
    */
  private[graft] def ksExactP(d: Double, n: Int, m: Int): Double = {
    if (d <= 0 || n <= 0 || m <= 0) return 1.0
    val g = BigInt(n).gcd(BigInt(m)).toLong
    val lcm = n.toLong * m / g
    val h = math.round(d * lcm)
    val band = h * g
    var prev = new Array[BigInt](m + 1)
    prev(0) = if (band > 0) BigInt(1) else BigInt(0)
    var j = 1
    while (j <= m) {
      prev(j) = if (j.toLong * n < band) prev(j - 1) else BigInt(0)
      j += 1
    }
    var i = 1
    while (i <= n) {
      val cur = new Array[BigInt](m + 1)
      cur(0) = if (i.toLong * m < band) prev(0) else BigInt(0)
      var jj = 1
      while (jj <= m) {
        cur(jj) =
          if ((i.toLong * m - jj.toLong * n).abs < band) cur(jj - 1) + prev(jj)
          else BigInt(0)
        jj += 1
      }
      prev = cur
      i += 1
    }
    var total = BigInt(1)
    var k = 1
    while (k <= n) { total = total * (m + k) / k; k += 1 } // C(n+m, n), exact
    (total - prev(m)).toDouble / total.toDouble
  }

  /** D1: two-sample KS statistic + p-value.
    *
    * p-value selection mirrors scipy's auto mode: EXACT (lattice-path
    * distribution, [[ksExactP]]) when max(n,m) ≤ `exactBelow`, the
    * asymptotic Kolmogorov series otherwise. The exact path is a scalar
    * UDF on the single post-aggregation row — off the distributed path.
    *
    * @param tagged rows with `valueCol` and a `sideCol` ∈ {a, b}
    * @return single row: (n_a, n_b, ks_stat, p_value, drift_detected,
    *         magnitude) — guard: fewer than `minSamples` clean rows on either
    *         side ⇒ (stat 0, p 1, no drift), matching
    *         `drift_detection.py:40-46`.
    */
  def ksTest(tagged: DataFrame, valueCol: String, sideCol: String,
             a: String, b: String, minSamples: Int = 10,
             alpha: Double = 0.05, exactBelow: Int = 256): DataFrame = {
    val clean = cleanSamples(tagged, valueCol)
      .filter(col(sideCol) === a || col(sideCol) === b)

    val perValue = clean.groupBy(col(valueCol).as("v")).agg(
      sum(when(col(sideCol) === a, 1L).otherwise(0L)).as("ca"),
      sum(when(col(sideCol) === b, 1L).otherwise(0L)).as("cb"))

    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perValue
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))

    val totW = Window.partitionBy()   // single-partition total over the
    val cum2 = cum                    // pre-aggregated distinct values (small)
      .withColumn("na", sum(col("ca")).over(totW))
      .withColumn("nb", sum(col("cb")).over(totW))
    val totals = cum2.agg(
      coalesce(max(col("na")), lit(0L)).as("n_a"),
      coalesce(max(col("nb")), lit(0L)).as("n_b"),
      coalesce(max(abs(
        col("cuma").cast("double") / col("na") -
        col("cumb").cast("double") / col("nb"))), lit(0.0)).as("d_raw"))

    // λ = D·√(nm/(n+m)); p = 2·Σ_{k=1..100} (-1)^{k-1} e^{-2k²λ²}, clamped
    // to [0,1] — the Kolmogorov distribution series (public formula; scipy
    // ks_2samp asymptotic mode uses the same). For λ < 0.05 the truncated
    // alternating series has not converged at 100 terms (and the true
    // survival value is 1 to >20 digits), so short-circuit to 1.
    val lam = col("d_raw") * sqrt(col("n_a") * col("n_b") /
      (col("n_a") + col("n_b")).cast("double"))
    val series = expr(
      """aggregate(
        |  transform(sequence(1, 100),
        |    k -> (CASE WHEN k % 2 = 1 THEN 2.0D ELSE -2.0D END)
        |         * exp(-2.0D * k * k * __lam * __lam)),
        |  0.0D, (acc, x) -> acc + x)""".stripMargin)

    val exactP = udf((d: Double, na: Long, nb: Long) =>
      ksExactP(d, na.toInt, nb.toInt))
    val useExact = greatest(col("n_a"), col("n_b")) <= exactBelow &&
      col("n_a") > 0 && col("n_b") > 0
    val guarded = totals
      .withColumn("__lam", lam)
      .withColumn("__p_raw",
        when(useExact, exactP(col("d_raw"), col("n_a"), col("n_b")))
          .otherwise(when(col("__lam") < 0.05, lit(1.0))
            .otherwise(least(greatest(series, lit(0.0)), lit(1.0)))))
      .withColumn("small", col("n_a") < minSamples || col("n_b") < minSamples)
      .select(
        col("n_a"), col("n_b"),
        round(when(col("small"), 0.0).otherwise(col("d_raw")), 6).as("ks_stat"),
        round(when(col("small"), 1.0).otherwise(col("__p_raw")), 6).as("p_value"))
      .withColumn("drift_detected", col("p_value") < alpha)
      .withColumn("magnitude", Parse.magnitudeBin(col("ks_stat")))
    guarded
  }

  /** D3: per-side distribution summary — count/mean/stddev_pop/median/min/max
    * (`drift_detection.py:98-123`; np.nanstd ddof=0 ⇒ population stddev,
    * SURVEY.md §5.3).
    */
  def distSummary(df: DataFrame, valueCol: String, sideCol: String): DataFrame =
    cleanSamples(df, valueCol)
      .groupBy(col(sideCol).as("side"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col(valueCol)), 6).as("mean"),
        round(stddev_pop(col(valueCol)), 6).as("std_pop"),
        round(expr(s"percentile($valueCol, 0.5D)"), 6).as("median"),
        round(min(col(valueCol)), 6).as("min_v"),
        round(max(col(valueCol)), 6).as("max_v"))
      .orderBy("side")

  /** D4: multi-feature drift sweep — KS per feature column, features melted
    * via `stack` so the sweep is one job, not a driver loop
    * (`drift_detection.py:171-225`).
    *
    * DEFAULT = the binned form: each feature's samples are histogrammed
    * into `bins` fixed-width buckets first, so the per-feature ordered
    * ECDF window runs over ≤ `bins` rows — bounded regardless of corpus
    * size. For continuous features |distinct| ≈ |rows|, which would make
    * the exact per-distinct-value window a full single-task sort per
    * feature at 100 TB; the binned D is within one bin's mass of exact
    * (DriftSpec bounds it). Use [[sweepExact]] when the domain is known
    * small (categorical codes, integer scores).
    */
  def sweep(df: DataFrame, sideCol: String, a: String, b: String,
            features: Seq[String], bins: Int = 1000): DataFrame = {
    val clean = cleanSamples(melt(df, sideCol, features), "v")
    val bounds = clean.groupBy(col("feature")).agg(
      min(col("v")).cast("double").as("lo"),
      max(col("v")).cast("double").as("hi"))
    val binned = clean.join(broadcast(bounds), "feature")
      .withColumn("bin",
        when(col("hi") === col("lo"), 0)
          .otherwise(least(
            floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / bins))
              .cast("int"),
            lit(bins - 1))))
    val perBin = binned.groupBy(col("feature"), col("bin")).agg(
      sum(when(col(sideCol) === a, 1L).otherwise(0L)).as("ca"),
      sum(when(col(sideCol) === b, 1L).otherwise(0L)).as("cb"))
    ecdfMax(perBin, col("bin"))
  }

  /** D4, exact variant: per-distinct-value ECDF — the small-domain opt-in.
    * The per-feature window sorts every distinct value in one task; fine
    * for bounded domains, a scale hazard for continuous ones (use the
    * binned default there).
    *
    * GUARDED: the plan carries a per-feature distinct-value count (a fully
    * parallel partial aggregate, one output row per feature, broadcast
    * back) and `raise_error`s any feature whose domain exceeds `maxDomain`
    * BEFORE its single-task ordered window can run — so a 100 TB user
    * pointing this at a continuous column gets a loud, named failure
    * instead of a stuck sort task. The guard is lazy (no extra eager job
    * at build time) and leaves passing results bit-identical.
    */
  def sweepExact(df: DataFrame, sideCol: String, a: String, b: String,
                 features: Seq[String], maxDomain: Long = 100000L): DataFrame = {
    val perValue = cleanSamples(melt(df, sideCol, features), "v")
      .groupBy(col("feature"), col("v")).agg(
        sum(when(col(sideCol) === a, 1L).otherwise(0L)).as("ca"),
        sum(when(col(sideCol) === b, 1L).otherwise(0L)).as("cb"))
    val domains = perValue.groupBy(col("feature"))
      .agg(count(lit(1)).as("__domain"))
    val guarded = perValue.join(broadcast(domains), "feature")
      .withColumn("v",
        when(col("__domain") <= maxDomain, col("v"))
          .otherwise(raise_error(concat(
            lit("sweepExact: feature '"), col("feature"), lit("' has "),
            col("__domain").cast("string"),
            lit(s" distinct values (> maxDomain=$maxDomain); use sweep() " +
              "binned for continuous domains or raise maxDomain")))))
      .drop("__domain")
    ecdfMax(guarded, col("v"))
  }

  private[graft] def meltKeep(df: DataFrame, keep: Seq[String],
                              features: Seq[String]): DataFrame = {
    val stackExpr = features.map(f => s"'$f', cast($f as double)")
      .mkString(s"stack(${features.size}, ", ", ", ") as (feature, v)")
    df.selectExpr(keep :+ stackExpr: _*)
  }

  private def melt(df: DataFrame, sideCol: String,
                   features: Seq[String]): DataFrame =
    meltKeep(df, Seq(sideCol), features)

  /** REFERENCE-frozen per-feature bin bounds — the production drift-
    * monitor posture: bin edges are fixed from the reference (training/
    * baseline) sample once, so the live side can be histogrammed
    * incrementally (a streaming aggregation) without a second pass over
    * the data for bounds. Live values outside the reference range clamp
    * into the edge bins — exactly the "new mass beyond the training
    * support" a drift monitor should pile up at the extremes, not drop.
    */
  def refBounds(ref: DataFrame, features: Seq[String]): DataFrame =
    cleanSamples(meltKeep(ref, Nil, features), "v")
      .groupBy(col("feature"))
      .agg(min(col("v")).cast("double").as("lo"),
        max(col("v")).cast("double").as("hi"))

  /** Per-feature histogram of `df` against the FROZEN `bounds` (from
    * [[refBounds]]): one broadcast join + one keyed count — the shape a
    * streaming engine can run incrementally (`keep` carries the
    * event-time window column through the melt). Bin rule matches
    * [[sweep]] plus the lower clamp frozen bounds make necessary.
    */
  /** The clamped frozen-bounds bin assignment shared by the batch and
    * streaming histogram twins — ONE definition so closed stream
    * windows can equal the batch sweep bit-for-bit. */
  private[graft] def binAgainstBounds(melted: DataFrame, bounds: DataFrame,
                                      bins: Int): DataFrame =
    melted.join(broadcast(bounds), "feature")
      .withColumn("bin",
        when(col("hi") === col("lo"), 0)
          .otherwise(least(greatest(
            floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / bins))
              .cast("int"), lit(0)), lit(bins - 1))))

  def refHistogram(df: DataFrame, features: Seq[String],
                   bounds: DataFrame, bins: Int = 1000,
                   keep: Seq[String] = Nil): DataFrame =
    binAgainstBounds(cleanSamples(meltKeep(df, keep, features), "v"),
      bounds, bins)
      .groupBy((keep :+ "feature" :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Binned KS of a current histogram against the reference histogram,
    * per (`groupCols`, feature) — the fold half of the split
    * histogram-then-compare drift monitor: all corpus-sized work
    * happened upstream in [[refHistogram]] (or its streaming twin
    * [[graft.streaming.Pipeline.streamingDriftHistogram]]); this joins
    * two ≤ features·bins-row frames and runs the bounded ECDF window.
    * `curHist` needs (groupCols, feature, bin, ca); `refHist`
    * (feature, bin, cb) — the reference repeats across every group
    * (window), including bins the live side never produced (an empty
    * live bin still moves the ECDF gap).
    */
  def ksFromHistograms(curHist: DataFrame, refHist: DataFrame,
                       groupCols: Seq[String] = Nil): DataFrame = {
    val refAll =
      if (groupCols.isEmpty) refHist
      else refHist.crossJoin(
        broadcast(curHist.select(groupCols.map(col): _*).distinct()))
    // merge via union + re-aggregate, not a full outer join: the
    // window roster above derives FROM curHist, and joining a frame
    // against its own lineage trips Catalyst's conflicting-reference
    // resolution; the union is also one shuffle on the final key
    val keyCols = groupCols ++ Seq("feature", "bin")
    val merged = curHist
      .select((keyCols.map(col) :+ col("ca") :+ lit(0L).as("cb")): _*)
      .unionByName(refAll.select(
        (keyCols.map(col) :+ lit(0L).as("ca") :+ col("cb")): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val keys = (groupCols :+ "feature").map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(keys: _*)
    merged
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(tot))
      .withColumn("nb", sum(col("cb")).over(tot))
      .groupBy(keys: _*)
      .agg(
        max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        round(max(abs(col("cuma").cast("double") / col("na") -
          col("cumb").cast("double") / col("nb"))), 6).as("ks_stat"))
      .orderBy((groupCols :+ "feature").map(col): _*)
  }

  /** D4 against a SEPARATE reference frame: the batch twin of the
    * streaming drift monitor (bounds frozen from `ref`, live side
    * clamped) — closed stream windows reproduce this bit-for-bit
    * (StreamingSmokeSpec asserts it). Use [[sweep]] when both sides
    * live in one tagged frame and bounds may pool.
    */
  def sweepVsRef(cur: DataFrame, ref: DataFrame, features: Seq[String],
                 bins: Int = 1000): DataFrame = {
    val bounds = refBounds(ref, features)
    val curH = refHistogram(cur, features, bounds, bins)
      .withColumnRenamed("cnt", "ca")
    val refH = refHistogram(ref, features, bounds, bins)
      .withColumnRenamed("cnt", "cb")
    ksFromHistograms(curH, refH)
  }

  /** Shared ECDF tail of both sweep forms: running sums over the ordered
    * axis within each feature, then max |F_a − F_b|.
    */
  private def ecdfMax(perAxis: DataFrame, axis: Column): DataFrame = {
    val w = Window.partitionBy(col("feature")).orderBy(axis)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("feature"))
    perAxis
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(tot))
      .withColumn("nb", sum(col("cb")).over(tot))
      .groupBy(col("feature"))
      .agg(
        max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        round(max(abs(col("cuma").cast("double") / col("na") -
          col("cumb").cast("double") / col("nb"))), 6).as("ks_stat"))
      .orderBy("feature")
  }

  /** Multiple-testing correction for a [[sweep]] report: attach each
    * feature's asymptotic KS p-value (Kolmogorov series over the rounded
    * D and side counts — the [[ksTest]] formula), then Benjamini–Hochberg
    * step-up: rank p ascending, BH value p·m/rank, adjusted p = the
    * running minimum of BH values from the largest rank down (capped at
    * 1), reject where p_adj ≤ alpha. A drift sweep over hundreds of
    * features WILL fire ~alpha·m false alarms under no drift at all —
    * BH is what keeps the expected false-discovery rate at alpha instead
    * of letting per-feature alarms stack up.
    *
    * Scale shape: every window here is global BUT over the sweep report —
    * one row per FEATURE, bounded by the declared feature list, never
    * data-sized (the registry's bounded-global-window class).
    */
  def sweepFdr(report: DataFrame, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0,
      s"sweepFdr: alpha in (0,1) (got $alpha)")
    val lam = col("ks_stat") * sqrt(col("n_a") * col("n_b") /
      (col("n_a") + col("n_b")).cast("double"))
    val series = expr(
      """aggregate(
        |  transform(sequence(1, 100),
        |    k -> (CASE WHEN k % 2 = 1 THEN 2.0D ELSE -2.0D END)
        |         * exp(-2.0D * k * k * __lam * __lam)),
        |  0.0D, (acc, x) -> acc + x)""".stripMargin)
    val withP = report
      .withColumn("__lam", lam)
      .withColumn("p_value",
        round(when(col("__lam") < 0.05, lit(1.0))
          .otherwise(least(greatest(series, lit(0.0)), lit(1.0))), 6))
    val whole = Window.partitionBy()
    val byP = Window.orderBy(col("p_value").asc, col("feature").asc)
    val tailMin = Window.orderBy(col("__rank").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    withP
      .withColumn("__m", count(lit(1)).over(whole))
      .withColumn("__rank", row_number().over(byP))
      .withColumn("__bh", col("p_value") * col("__m") / col("__rank"))
      .withColumn("p_adj",
        round(least(min(col("__bh")).over(tailMin), lit(1.0)), 6))
      .select(col("feature"), col("n_a"), col("n_b"), col("ks_stat"),
        col("p_value"), col("__rank").cast("long").as("rank"),
        col("p_adj"), (col("p_adj") <= alpha).as("reject"))
      .orderBy("rank")
  }

  /** The 100 TB KS path documented in SURVEY.md §7.3#1, implemented: the
    * samples are histogrammed into `bins` fixed-width buckets FIRST (one
    * shuffle on the bin id, fully parallel), so the ordered ECDF window
    * runs over ≤ `bins` rows regardless of corpus size — the exact form's
    * per-distinct-value window becomes a bounded constant. The statistic
    * is the KS D evaluated at bin boundaries: within one bin width of the
    * exact D (DriftSpec asserts the bound); use the exact `ksTest` when
    * |distinct| is small, this one when it is not.
    */
  def ksTestBinned(tagged: DataFrame, valueCol: String, sideCol: String,
                   a: String, b: String, bins: Int = 1000): DataFrame = {
    val clean = cleanSamples(tagged, valueCol)
      .filter(col(sideCol) === a || col(sideCol) === b)
    val bounds = clean.agg(
      min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi"))
    val binned = clean.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("hi") === col("lo"), 0)
          .otherwise(least(
            floor((col(valueCol) - col("lo")) / ((col("hi") - col("lo")) / bins))
              .cast("int"),
            lit(bins - 1))))
    val perBin = binned.groupBy(col("bin")).agg(
      sum(when(col(sideCol) === a, 1L).otherwise(0L)).as("ca"),
      sum(when(col(sideCol) === b, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy()
    perBin
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(totW))
      .withColumn("nb", sum(col("cb")).over(totW))
      .agg(
        coalesce(max(col("na")), lit(0L)).as("n_a"),
        coalesce(max(col("nb")), lit(0L)).as("n_b"),
        round(coalesce(max(abs(
          col("cuma").cast("double") / col("na") -
          col("cumb").cast("double") / col("nb"))), lit(0.0)), 6)
          .as("ks_stat_binned"))
  }

  /** Earth-mover drift: Wasserstein-1 distance over the same fixed-width
    * binning as [[ksTestBinned]] — W₁ = ∫|F_a − F_b| (the AREA between
    * the ECDFs) where KS is their maximum gap. The two disagree exactly
    * when drift is wide-but-shallow (mean shift across the whole range:
    * large W₁, modest KS) vs narrow-but-deep (one relocated mode: large
    * KS, modest W₁) — a monitoring stack wants both. Also emitted
    * normalized by the observed range (the average ECDF gap, in [0, 1]).
    *
    * Empty bins matter for an INTEGRAL (the ECDF gap persists across
    * them) where they cannot move a MAX: each present bin's gap is
    * weighted by the run length to the next present bin. Same bounded
    * plan: one bin aggregation, cumulative windows over ≤ `bins` rows.
    */
  def wasserstein1Binned(tagged: DataFrame, valueCol: String,
                         sideCol: String, a: String, b: String,
                         bins: Int = 1000): DataFrame = {
    val clean = cleanSamples(tagged, valueCol)
      .filter(col(sideCol) === a || col(sideCol) === b)
    val bounds = clean.agg(
      min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi"))
    val binned = clean.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("hi") === col("lo"), 0)
          .otherwise(least(
            floor((col(valueCol) - col("lo")) / ((col("hi") - col("lo")) / bins))
              .cast("int"),
            lit(bins - 1))))
    val perBin = binned.groupBy(col("bin")).agg(
      sum(when(col(sideCol) === a, 1L).otherwise(0L)).as("ca"),
      sum(when(col(sideCol) === b, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val step = Window.orderBy(col("bin"))
    val totW = Window.partitionBy()
    perBin
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(totW))
      .withColumn("nb", sum(col("cb")).over(totW))
      .withColumn("__gap",
        abs(col("cuma").cast("double") / col("na") -
          col("cumb").cast("double") / col("nb")))
      .withColumn("__run",
        lead(col("bin"), 1, bins).over(step) - col("bin"))
      .agg(
        coalesce(max(col("na")), lit(0L)).as("n_a"),
        coalesce(max(col("nb")), lit(0L)).as("n_b"),
        coalesce(sum(col("__gap") * col("__run")), lit(0.0)).as("__area"))
      .crossJoin(broadcast(bounds))
      .select(col("n_a"), col("n_b"),
        round(col("__area") * (col("hi") - col("lo")) / bins, 6)
          .as("wasserstein1"),
        round(col("__area") / bins, 6).as("w1_normalized"))
  }

  /** D5 (ext): Population Stability Index over reference-decile bins — the
    * industry-standard drift score next to KS (PSI < 0.1 stable, > 0.25
    * drifted). Bin edges come from the REFERENCE side's quantiles (the
    * standard construction); per-bin proportions from both sides;
    * contribution (p−q)·ln(p/q), empty-on-either-side bins contribute 0
    * (documented epsilon-free convention, deterministic in both engines).
    * Returns the per-bin table (auditable) with the scalar PSI repeated on
    * each row. Two aggregates + a broadcast of 9 cutpoints — no sort.
    */
  def psi(tagged: DataFrame, valueCol: String, sideCol: String,
          ref: String, cur: String, bins: Int = 10): DataFrame = {
    val clean = cleanSamples(tagged, valueCol)
      .filter(col(sideCol).isin(ref, cur))
    val cutExprs = (1 until bins).map(i =>
      expr(s"percentile(CASE WHEN $sideCol = '$ref' THEN $valueCol END, " +
        s"${i.toDouble / bins}D)").as(s"c$i"))
    val cuts = clean.agg(cutExprs.head, cutExprs.tail: _*)
    val binned = clean.crossJoin(broadcast(cuts))
      .withColumn("bin",
        (1 until bins).map(i =>
          when(col(valueCol) > col(s"c$i"), 1).otherwise(0)).reduce(_ + _))
    val counts = binned.groupBy(col("bin")).agg(
      sum(when(col(sideCol) === ref, 1L).otherwise(0L)).as("n_ref"),
      sum(when(col(sideCol) === cur, 1L).otherwise(0L)).as("n_cur"))
    val tot = Window.partitionBy()
    val contrib = counts
      .withColumn("p", col("n_ref").cast("double") / sum(col("n_ref")).over(tot))
      .withColumn("q", col("n_cur").cast("double") / sum(col("n_cur")).over(tot))
      .withColumn("contribution",
        when(col("p") > 0 && col("q") > 0,
          (col("p") - col("q")) * log(col("p") / col("q"))).otherwise(0.0))
    contrib
      .withColumn("psi", round(sum(col("contribution")).over(tot), 6))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        round(col("contribution"), 6).as("contribution"), col("psi"))
      .orderBy("bin")
  }

  /** D5b (ext): Jensen–Shannon divergence over pooled-quantile bins — the
    * bounded, symmetric companion to [[psi]] (JSD ∈ [0, ln 2] in nats;
    * PSI is unbounded and asymmetric). Bin edges come from the POOLED
    * sample's quantiles (symmetry demands neither side own the bins);
    * per-bin proportions p, q feed
    * `0.5·Σ p·ln(p/m) + 0.5·Σ q·ln(q/m)` with `m = (p+q)/2` and empty
    * sides contributing 0 (0·ln0 = 0 convention, deterministic in both
    * engines). Same plan shape as psi: one quantile aggregate broadcast
    * as cutpoints, one count aggregate, no sort.
    */
  def jsDivergence(tagged: DataFrame, valueCol: String, sideCol: String,
                   a: String, b: String, bins: Int = 10): DataFrame = {
    val clean = cleanSamples(tagged, valueCol)
      .filter(col(sideCol).isin(a, b))
    // one array-percentile aggregate (single value buffer), not one
    // percentile(...) per cutpoint (bins-1 full-column buffers)
    val fracs = (1 until bins).map(i => s"${i.toDouble / bins}D")
    val cuts = clean.agg(
      expr(s"percentile(CAST($valueCol AS DOUBLE), " +
        s"array(${fracs.mkString(",")}))").as("__cuts"))
    val binned = clean.crossJoin(broadcast(cuts))
      .withColumn("bin",
        (1 until bins).map(i =>
          when(col(valueCol) > element_at(col("__cuts"), i), 1).otherwise(0))
          .reduce(_ + _))
    val counts = binned.groupBy(col("bin")).agg(
      sum(when(col(sideCol) === a, 1L).otherwise(0L)).as("n_a"),
      sum(when(col(sideCol) === b, 1L).otherwise(0L)).as("n_b"))
    val tot = Window.partitionBy()
    counts
      .withColumn("p", col("n_a").cast("double") / sum(col("n_a")).over(tot))
      .withColumn("q", col("n_b").cast("double") / sum(col("n_b")).over(tot))
      .withColumn("m", (col("p") + col("q")) / 2.0)
      .withColumn("contribution",
        when(col("p") > 0, col("p") * log(col("p") / col("m")) / 2.0)
          .otherwise(0.0) +
        when(col("q") > 0, col("q") * log(col("q") / col("m")) / 2.0)
          .otherwise(0.0))
      .withColumn("jsd", round(sum(col("contribution")).over(tot), 6))
      .select(col("bin"), col("n_a"), col("n_b"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        round(col("contribution"), 6).as("contribution"), col("jsd"))
      .orderBy("bin")
  }

  /** D6 (ext): two-sample chi-square over a categorical column — drift for
    * columns KS cannot handle (device, country, referrer). Pure-arithmetic
    * statistic (no transcendentals beyond the squares), so the DuckDB
    * oracle matches exactly. Expected counts from the pooled margins;
    * categories missing on one side still contribute (observed 0).
    */
  def chiSquare(tagged: DataFrame, catCol: String, sideCol: String,
                ref: String, cur: String): DataFrame = {
    val clean = tagged.filter(col(sideCol).isin(ref, cur) &&
      col(catCol).isNotNull)
    val counts = clean.groupBy(col(catCol).as("category")).agg(
      sum(when(col(sideCol) === ref, 1L).otherwise(0L)).as("n_ref"),
      sum(when(col(sideCol) === cur, 1L).otherwise(0L)).as("n_cur"))
    val tot = Window.partitionBy()
    counts
      .withColumn("t_ref", sum(col("n_ref")).over(tot))
      .withColumn("t_cur", sum(col("n_cur")).over(tot))
      .withColumn("row_t", col("n_ref") + col("n_cur"))
      .withColumn("grand", col("t_ref") + col("t_cur"))
      .withColumn("e_ref",
        col("row_t").cast("double") * col("t_ref") / col("grand"))
      .withColumn("e_cur",
        col("row_t").cast("double") * col("t_cur") / col("grand"))
      .withColumn("cell",
        (col("n_ref") - col("e_ref")) * (col("n_ref") - col("e_ref")) / col("e_ref") +
        (col("n_cur") - col("e_cur")) * (col("n_cur") - col("e_cur")) / col("e_cur"))
      .withColumn("chi2", round(sum(col("cell")).over(tot), 6))
      .withColumn("dof", (count(lit(1)).over(tot) - 1).cast("int"))
      .select(col("category"), col("n_ref"), col("n_cur"),
        round(col("cell"), 6).as("cell_chi2"), col("chi2"), col("dof"))
      .orderBy("category")
  }

  /** Two-sided CUSUM changepoint monitor over a PRE-AGGREGATED ordered
    * series (per-day means, per-window counts — always ≤ a few hundred
    * rows, so the ordered windows below are the documented bounded
    * GLOBAL-WINDOW pattern, like PSI's bin table).
    *
    * The textbook recursion S⁺_t = max(0, S⁺_{t−1} + (x_t − μ₀ − k)) is
    * sequential, but distributes exactly via the prefix identity
    * S⁺_t = P_t − min_{0≤j≤t} P_j with P_t = Σ_{i≤t} (x_i − μ₀ − k) and
    * P₀ = 0 (the empty prefix is a legal minimum) — a
    * running sum minus its own running minimum, two window passes, no
    * recursion (the mirrored Q_t = Σ (μ₀ − x_i − k) gives S⁻). Reference
    * μ₀, slack k = `slackK`·σ₀ and threshold h = `h`·σ₀ all come from the
    * first `baselineRows` rows — the in-control period — via one bounded
    * aggregate broadcast back; alarms compare the ROUNDED statistic so
    * verdicts replay engine-independently.
    *
    * A constant baseline (σ₀ = 0) degenerates to k = h = 0: any deviation
    * from μ₀ alarms immediately — fail-sensitive, not fail-silent.
    */
  def cusum(series: DataFrame, ordCol: String, valCol: String,
            baselineRows: Int, slackK: Double = 0.5,
            h: Double = 3.0): DataFrame = {
    require(baselineRows >= 2, s"cusum: baselineRows >= 2, got $baselineRows")
    val ord = Window.orderBy(col(ordCol))
    val upToHere = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val ranked = series
      .select(col(ordCol), col(valCol).cast("double").as("x"))
      .withColumn("__rn", row_number().over(ord))
    val base = ranked.filter(col("__rn") <= baselineRows)
      .agg(avg(col("x")).as("__mu0"), stddev_pop(col("x")).as("__sigma0"))
    val k = lit(slackK) * col("__sigma0")
    val thr = lit(h) * col("__sigma0")
    ranked.crossJoin(broadcast(base))
      .withColumn("__p", sum(col("x") - col("__mu0") - k).over(upToHere))
      .withColumn("__q", sum(col("__mu0") - col("x") - k).over(upToHere))
      // the empty prefix P₀ = 0 is a legal minimum (all-positive
      // deviations must accumulate from zero, not reset at row 1)
      .withColumn("s_pos", round(
        col("__p") - least(lit(0.0), min(col("__p")).over(upToHere)), 6))
      .withColumn("s_neg", round(
        col("__q") - least(lit(0.0), min(col("__q")).over(upToHere)), 6))
      .withColumn("alarm",
        col("s_pos") > round(thr, 6) || col("s_neg") > round(thr, 6))
      .select(col(ordCol), round(col("x"), 6).as("x"),
        round(col("__mu0"), 6).as("mu0"), col("s_pos"), col("s_neg"),
        col("alarm"))
      .orderBy(col(ordCol))
  }

  /** Kuiper two-sample statistic V = D⁺ + D⁻ — the tail-balanced
    * sibling of [[ksTest]]'s D = max|·|: KS is most sensitive near the
    * median and nearly blind at the tails; Kuiper weighs every part of
    * the distribution equally (and is invariant under cyclic shifts —
    * the right test for hour-of-day style wrapped axes). Both
    * one-sided sups are elected on EXACT cross-multiplied integers
    * (max of cuma·n_b − cumb·n_a over the distinct-value ECDF), so no
    * float comparison ever picks the argmax; the two divisions happen
    * once at the close. Same bounded distinct-value window class as
    * ksTest.
    */
  def kuiperTest(tagged: DataFrame, valueCol: String, sideCol: String,
                 a: String, b: String): DataFrame = {
    val clean = cleanSamples(tagged, valueCol)
      .filter(col(sideCol) === a || col(sideCol) === b)
    val perValue = clean.groupBy(col(valueCol).as("v")).agg(
      sum(when(col(sideCol) === a, 1L).otherwise(0L)).as("ca"),
      sum(when(col(sideCol) === b, 1L).otherwise(0L)).as("cb"))
    kuiperFold(perValue)
  }

  private def kuiperFold(perValue: DataFrame): DataFrame = {
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy()
    val folded = perValue
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(totW))
      .withColumn("nb", sum(col("cb")).over(totW))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("cuma") * col("nb") - col("cumb") * col("na"))
          .as("__dp"),
        max(col("cumb") * col("na") - col("cuma") * col("nb"))
          .as("__dm"))
    val denom = (col("n_a") * col("n_b")).cast("double")
    val dp = greatest(col("__dp"), lit(0L)).cast("double") / denom
    val dm = greatest(col("__dm"), lit(0L)).cast("double") / denom
    folded.select(col("n_a"), col("n_b"),
      round(dp, 6).as("d_plus"), round(dm, 6).as("d_minus"),
      round(dp + dm, 6).as("v_stat"))
  }

  /** [[kuiperTest]] over [[latticeBin]]-coarsened values — the 100 TB
    * form: both one-sided sups are elected over ≤ `bins` ECDF points.
    * Kuiper only reads ORDER, so the coarsened axis is the bin id; each
    * one-sided sup can lose at most the largest single-bin mass, so V
    * is within one bin's pooled mass below exact (never above — a sup
    * over a subset of evaluation points). Same single-corpus-pass
    * count-grain plan as [[cvmBinned]].
    */
  def kuiperBinned(tagged: DataFrame, valueCol: String, sideCol: String,
                   a: String, b: String, bins: Int = 1000): DataFrame =
    kuiperFold(binCounts(sideCounts(tagged, valueCol, sideCol, a, b), bins,
      Seq("__ca", "__cb"))
      .select(col("__bin").as("v"), col("__ca").as("ca"),
        col("__cb").as("cb")))

  /** Total variation distance between two categorical distributions —
    * TVD = ½·Σ|pᵢ − qᵢ|, the "what fraction of probability mass moved"
    * number with a direct operational meaning ([[chiSquare]] tests
    * significance, [[jsDivergence]] is information-theoretic; TVD is
    * the bound on how differently ANY downstream decision can behave).
    * Per-category rows carry the contribution, the scalar repeats on
    * every row (the psi shape).
    *
    * Exact integers until the last division: each |pᵢ − qᵢ| term is
    * |cᵢ·n_cur − dᵢ·n_ref| over the common denominator, so category
    * order can't move the statistic.
    */
  def tvd(tagged: DataFrame, catCol: String, sideCol: String,
          ref: String, cur: String): DataFrame = {
    val counts = tagged
      .filter(col(sideCol).isin(ref, cur) && col(catCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(sum(when(col(sideCol) === ref, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col(sideCol) === cur, 1L).otherwise(0L)).as("n_cur"))
    val tot = Window.partitionBy()
    counts
      .withColumn("__tr", sum(col("n_ref")).over(tot))
      .withColumn("__tc", sum(col("n_cur")).over(tot))
      .withColumn("__num",
        abs(col("n_ref") * col("__tc") - col("n_cur") * col("__tr")))
      .withColumn("contribution", round(col("__num").cast("double") /
        (lit(2.0) * col("__tr") * col("__tc")), 6))
      .withColumn("tvd", round(sum(col("__num")).over(tot).cast("double") /
        (lit(2.0) * col("__tr") * col("__tc")), 6))
      .select(col("category"), col("n_ref"), col("n_cur"),
        col("contribution"), col("tvd"))
      .orderBy("category")
  }

  /** Quantile–quantile drift table: the ref and cur distributions'
    * exact interpolated quantiles side by side with the per-quantile
    * gap — WHERE along the distribution the drift lives, which the
    * scalar KS/PSI verdicts can't say (a pure tail shift and a median
    * shift can share a D statistic; their QQ tables look nothing
    * alike). Exact percentiles (the `percentile`/`quantile_cont`
    * parity contract of [[graft.ops.Stats.brownForsythe]]) in ONE
    * array pass per side; swap to approx_percentile off the oracle
    * path at extreme scale.
    */
  def qqTable(tagged: DataFrame, valueCol: String, sideCol: String,
              ref: String, cur: String,
              quantiles: Seq[Double] =
                (1 to 9).map(_ / 10.0)): DataFrame = {
    require(quantiles.nonEmpty && quantiles.size <= 99 &&
      quantiles == quantiles.sorted &&
      quantiles.forall(q => q > 0 && q < 1),
      s"qqTable: sorted quantiles strictly inside (0, 1), got $quantiles")
    val arr = quantiles.map(q => s"${q}D").mkString("array(", ", ", ")")
    def side(s: String, out: String) = tagged
      .filter(col(sideCol) === s && col(valueCol).isNotNull)
      .agg(expr(s"percentile($valueCol, $arr)").as(out))
    val qCol = array(quantiles.map(lit): _*)
    side(ref, "__qr").crossJoin(side(cur, "__qc"))
      .select(posexplode(arrays_zip(col("__qr"), col("__qc")))
        .as(Seq("__i", "__z")))
      .select(element_at(qCol, col("__i") + 1).as("quantile"),
        round(col("__z.__qr"), 6).as("q_ref"),
        round(col("__z.__qc"), 6).as("q_cur"),
        round(col("__z.__qc") - col("__z.__qr"), 6).as("gap"))
      .orderBy("quantile")
  }

  /** Page–Hinkley mean-shift monitor over a PRE-AGGREGATED ordered
    * series — [[cusum]]'s drift-literature sibling: where CUSUM tests
    * against a FIXED baseline mean µ₀ (the first `baselineRows`), PH
    * tests each point against the RUNNING mean of everything seen so
    * far, so it needs no in-control period and keeps adapting — the
    * standard concept-drift detector for model-monitoring streams
    * (Gama et al. 2004). Two-sided: `ph_up` catches upward shifts,
    * `ph_down` downward; alarm when either rounded statistic exceeds
    * `lambda`. `delta` is the magnitude slack (drifts smaller than δ
    * per point never accumulate).
    *
    * The sequential m_t = Σ_{i≤t}(x_i − x̄_i − δ) distributes exactly
    * like cusum: a running sum minus its own running min (empty prefix
    * 0 a legal minimum). Same bounded-global-window class; alarms
    * compare ROUNDED statistics against the shared λ literal so
    * verdicts replay engine-independently.
    */
  def pageHinkley(series: DataFrame, ordCol: String, valCol: String,
                  delta: Double, lambda: Double): DataFrame = {
    require(delta >= 0 && lambda > 0,
      s"pageHinkley: delta >= 0 and lambda > 0 (got $delta, $lambda)")
    val ord = Window.orderBy(col(ordCol))
    val upToHere = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    series.select(col(ordCol), col(valCol).cast("double").as("x"))
      .withColumn("__rn", row_number().over(ord).cast("long"))
      .withColumn("__rbar", sum(col("x")).over(upToHere) / col("__rn"))
      .withColumn("__up", col("x") - col("__rbar") - lit(delta))
      .withColumn("__dn", col("__rbar") - col("x") - lit(delta))
      .withColumn("__mu", sum(col("__up")).over(upToHere))
      .withColumn("__md", sum(col("__dn")).over(upToHere))
      .withColumn("ph_up", round(
        col("__mu") - least(lit(0.0), min(col("__mu")).over(upToHere)), 6))
      .withColumn("ph_down", round(
        col("__md") - least(lit(0.0), min(col("__md")).over(upToHere)), 6))
      .withColumn("alarm",
        col("ph_up") > lambda || col("ph_down") > lambda)
      .select(col(ordCol), round(col("x"), 6).as("x"),
        col("ph_up"), col("ph_down"), col("alarm"))
      .orderBy(col(ordCol))
  }

  /** Single-changepoint locator over the daily series (the binary-
    * segmentation step): the split k maximizing the centered cumulative
    * deviation |S_k − (k/n)·S_n| — where [[cusum]] streams an alarm
    * PATH, this names the most likely change DAY with the before/after
    * means. Elected on the EXACT integer |n·S_k − k·S_n| (centi-lattice
    * prefix sums, so the argmax can never flip on float noise; ties to
    * the earliest day), then the statistic is reported in value units.
    *
    * Plan: one keyed daily aggregation, one cumulative window + one
    * max-election over the calendar-bounded day table. One output row.
    */
  def changepoint(df: DataFrame, dateCol: Column,
                  valueCol: String): DataFrame = {
    val ord = Window.orderBy(col("__d"))
    val upToHere = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val whole = Window.partitionBy()
    val daily = df.groupBy(dateCol.as("__d"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("__vc"))
    val scored = daily
      .withColumn("__rn", row_number().over(ord).cast("long"))
      .withColumn("__cum", sum(col("__vc")).over(upToHere))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__tot", sum(col("__vc")).over(whole))
      .filter(col("__rn") < col("__n")) // a split needs a right side
      .withColumn("__t",
        abs(col("__n") * col("__cum") - col("__rn") * col("__tot")))
    scored
      .withColumn("__pick",
        row_number().over(Window.orderBy(col("__t").desc, col("__d"))))
      .filter(col("__pick") === 1)
      .select(col("__n").as("n_days"), col("__d").as("change_day"),
        col("__rn").as("days_before"),
        round(col("__t").cast("double")
          / (col("__n").cast("double") * 100.0), 6).as("t_stat"),
        round(col("__cum") / (lit(100.0) * col("__rn")), 6)
          .as("mean_before"),
        round((col("__tot") - col("__cum"))
          / (lit(100.0) * (col("__n") - col("__rn"))), 6).as("mean_after"))
      .withColumn("shift",
        round(col("mean_after") - col("mean_before"), 6))
  }
}
