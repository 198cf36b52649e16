package graft

import org.apache.spark.sql.functions._
import graft.ops.Drift

/** D1 golden tests: KS statistic/p-value against an independently computed
  * reference (asymptotic two-sample KS, same formula as scipy's 'asymp'
  * mode), the KS(x,x)=0 property, and the minimum-sample guard
  * (`drift_detection.py:40-46`).
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private val a = (0 until 40).map(i => (i % 7).toDouble + 0.5 * (i % 3))
  private val b = (0 until 30).map(i => (i % 5).toDouble + 0.7 * (i % 4))

  private def tagged(xs: Seq[Double], ys: Seq[Double]) =
    (xs.map(("a", _)) ++ ys.map(("b", _))).toDF("side", "v")

  test("KS statistic and p-value match independent golden computation") {
    // n=40/m=30 sits below the scipy-parity switchover ⇒ EXACT p by default
    val row = Drift.ksTest(tagged(a, b), "v", "side", "a", "b")
      .select("n_a", "n_b", "ks_stat", "p_value").head()
    assert(row.getLong(0) == 40 && row.getLong(1) == 30)
    assert(row.getDouble(2) == 0.166667) // golden (exact ECDF computation)
    assert(row.getDouble(3) == 0.677133) // golden (exact lattice-path DP)
    // asymptotic opt-out reproduces the Kolmogorov-series value
    val asymp = Drift.ksTest(tagged(a, b), "v", "side", "a", "b",
      exactBelow = 0).select("p_value").head().getDouble(0)
    assert(asymp == 0.727704) // golden (Kolmogorov series)
  }

  test("exact small-n p-values match independent integer-arithmetic goldens") {
    // goldens from a pure-python lattice-path count in exact Fractions
    // (the construction scipy ks_2samp mode='exact' implements); the DP
    // itself is cross-validated against brute-force permutation
    // enumeration below
    def mk(n: Int, off: Double, step: Double) =
      (0 until n).map(i => off + i * step)
    val cases = Seq(
      (mk(10, 0.0, 1.0), mk(10, 0.5, 1.1), 0.994458),
      (mk(15, 0.0, 1.0), mk(15, 3.25, 0.9), 0.678138),
      (mk(25, 0.0, 1.0), mk(25, 5.125, 1.05), 0.285042),
      (mk(10, 0.0, 1.0), mk(25, 2.5, 0.8), 0.003018)) // unequal sizes
    for ((xa, xb, pExp) <- cases) {
      val p = Drift.ksTest(tagged(xa, xb), "v", "side", "a", "b")
        .select("p_value").head().getDouble(0)
      assert(p == pExp, s"n=${xa.size} m=${xb.size}: got $p want $pExp")
    }
  }

  test("exact KS distribution equals brute-force permutation enumeration") {
    // n=m=6, d=1/3: all C(12,6)=924 label assignments enumerated offline
    // give P(D >= 1/3) = 860/924 = 0.930735930...
    assert(math.round(Drift.ksExactP(1.0 / 3, 6, 6) * 1e6) == 930736L)
    // degenerate guards
    assert(Drift.ksExactP(0.0, 10, 10) == 1.0)
    assert(Drift.ksExactP(1.0, 5, 7) > 0.0)
  }

  test("KS of a sample against itself is 0 with p=1") {
    val row = Drift.ksTest(tagged(a, a), "v", "side", "a", "b")
      .select("ks_stat", "p_value", "drift_detected").head()
    assert(row.getDouble(0) == 0.0)
    assert(row.getDouble(1) == 1.0)
    assert(!row.getBoolean(2))
  }

  test("KS invariant under strictly monotone transform") {
    val t1 = Drift.ksTest(tagged(a, b), "v", "side", "a", "b")
      .select("ks_stat").head().getDouble(0)
    val t2 = Drift.ksTest(tagged(a.map(x => math.exp(x)), b.map(math.exp)),
      "v", "side", "a", "b").select("ks_stat").head().getDouble(0)
    assert(t1 == t2)
  }

  test("fewer than 10 clean samples on either side disables the test") {
    val row = Drift.ksTest(tagged(a.take(5), b), "v", "side", "a", "b")
      .select("ks_stat", "p_value", "drift_detected").head()
    assert(row.getDouble(0) == 0.0 && row.getDouble(1) == 1.0)
    assert(!row.getBoolean(2))
  }

  test("NaN and null rows are dropped before the test (D2)") {
    val dirty = tagged(a, b)
      .unionByName(Seq(("a", Double.NaN)).toDF("side", "v"))
      .unionByName(Seq(("b", Double.NaN)).toDF("side", "v"))
    val row = Drift.ksTest(dirty, "v", "side", "a", "b")
      .select("n_a", "n_b").head()
    assert(row.getLong(0) == 40 && row.getLong(1) == 30)
  }

  test("shifted distribution is detected as drift (reference demo scenario)") {
    val shifted = b.map(_ + 50.0)
    val row = Drift.ksTest(tagged(a, shifted), "v", "side", "a", "b")
      .select("ks_stat", "drift_detected", "magnitude").head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getBoolean(1))
    assert(row.getString(2) == "very large")
  }

  test("sweepExact's per-feature KS agrees with the single-feature ksTest") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type".isin("purchase", "view"))
    val single = Drift.ksTest(events, "value", "event_type",
        "purchase", "view")
      .select("ks_stat").head().getDouble(0)
    val swept = Drift.sweepExact(events.select($"event_type", $"value"),
        "event_type", "purchase", "view", Seq("value"))
      .filter($"feature" === "value")
      .select("ks_stat").head().getDouble(0)
    assert(single == swept)
  }

  test("sweepExact guard fails loud above maxDomain, passes bounded domains") {
    // 60 distinct values on one feature; the other is 3-valued. With
    // maxDomain=10 the wide feature must abort the job with a named error
    // BEFORE its single-task ECDF window runs; the bounded feature alone
    // passes with output identical to the unguarded form's semantics.
    val wide = (0 until 60).flatMap(i =>
      Seq(("a", i.toDouble, (i % 3).toDouble), ("b", i.toDouble, (i % 3).toDouble)))
      .toDF("side", "wide_f", "small_f")
    val ex = intercept[Exception] {
      Drift.sweepExact(wide, "side", "a", "b", Seq("wide_f", "small_f"),
        maxDomain = 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("sweepExact") && m.contains("wide_f")))
    // guard transparent when the domain is within bounds
    val ok = Drift.sweepExact(wide, "side", "a", "b", Seq("small_f"),
      maxDomain = 10L).select("feature", "ks_stat").collect()
    assert(ok.map(_.getString(0)).toSeq == Seq("small_f"))
    assert(ok.head.getDouble(1) == 0.0) // identical sides: no drift
  }

  test("sweep's default binned KS agrees with the single-feature ksTestBinned") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type".isin("purchase", "view"))
    val single = Drift.ksTestBinned(events, "value", "event_type",
        "purchase", "view", bins = 1000)
      .select("ks_stat_binned").head().getDouble(0)
    val swept = Drift.sweep(events.select($"event_type", $"value"),
        "event_type", "purchase", "view", Seq("value"))
      .filter($"feature" === "value")
      .select("ks_stat").head().getDouble(0)
    assert(math.round(single * 1e6) == math.round(swept * 1e6))
    // and the binned default stays within one bin-mass of the exact sweep
    val exact = Drift.sweepExact(events.select($"event_type", $"value"),
        "event_type", "purchase", "view", Seq("value"))
      .filter($"feature" === "value")
      .select("ks_stat").head().getDouble(0)
    assert(swept <= exact + 1e-9)
  }

  // D5: the reference's three golden scenarios (`drift_detection.py:289-328`):
  // same-Poisson → no drift; Poisson mean shift → drift; Normal variance
  // inflation → drift. Deterministic fixtures from seeded java.util.Random
  // (stable LCG + specified nextGaussian algorithm).
  private def poisson(lambda: Double, n: Int, seed: Long): Seq[Double] = {
    val r = new java.util.Random(seed)
    Seq.fill(n) { // Knuth
      val l = math.exp(-lambda)
      var k = 0; var p = 1.0
      while ({ p *= r.nextDouble(); p > l }) k += 1
      k.toDouble
    }
  }
  private def normal(mu: Double, sd: Double, n: Int, seed: Long): Seq[Double] = {
    val r = new java.util.Random(seed)
    Seq.fill(n)(mu + sd * r.nextGaussian())
  }

  test("binned KS is within one bin-mass of the exact statistic") {
    val df = tagged(a, b)
    val exact = Drift.ksTest(df, "v", "side", "a", "b")
      .select("ks_stat").head().getDouble(0)
    val binned = Drift.ksTestBinned(df, "v", "side", "a", "b", bins = 1000)
      .select("ks_stat_binned").head().getDouble(0)
    // with 1000 bins over this range, every distinct value gets its own bin
    assert(math.abs(binned - exact) < 1e-6, s"exact=$exact binned=$binned")
    val coarse = Drift.ksTestBinned(df, "v", "side", "a", "b", bins = 8)
      .select("ks_stat_binned").head().getDouble(0)
    assert(coarse <= exact + 1e-9) // boundary evaluation can only lose mass
    assert(coarse > 0.0)
  }

  test("binned KS handles the degenerate all-equal sample") {
    val df = tagged(Seq.fill(20)(5.0), Seq.fill(20)(5.0))
    val row = Drift.ksTestBinned(df, "v", "side", "a", "b")
      .select("n_a", "n_b", "ks_stat_binned").head()
    assert(row.getLong(0) == 20 && row.getLong(1) == 20)
    assert(row.getDouble(2) == 0.0)
  }

  test("PSI: identical sides score ~0, shifted sides score high") {
    val same = tagged(a, a)
    val psiSame = Drift.psi(same, "v", "side", "a", "b")
      .select("psi").head().getDouble(0)
    assert(math.abs(psiSame) < 0.05, s"psi=$psiSame")
    val shifted = tagged(a, a.map(_ + 5.0))
    val psiShift = Drift.psi(shifted, "v", "side", "a", "b")
      .select("psi").head().getDouble(0)
    assert(psiShift > 0.25, s"psi=$psiShift") // industry drift threshold
    // proportions sum to 1 on both sides
    val bins = Drift.psi(shifted, "v", "side", "a", "b")
      .select("p", "q").as[(Double, Double)].collect()
    assert(math.abs(bins.map(_._1).sum - 1.0) < 1e-4)
    assert(math.abs(bins.map(_._2).sum - 1.0) < 1e-4)
  }

  test("chi-square: identical categorical mix scores 0, skewed mix scores high") {
    val same = (Seq.fill(50)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++
      Seq.fill(50)(("b", "x")) ++ Seq.fill(30)(("b", "y")))
      .toDF("side", "cat")
    val chiSame = Drift.chiSquare(same, "cat", "side", "a", "b")
      .select("chi2").head().getDouble(0)
    assert(chiSame == 0.0)
    val skew = (Seq.fill(50)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(75)(("b", "y")))
      .toDF("side", "cat")
    val row = Drift.chiSquare(skew, "cat", "side", "a", "b")
      .select("chi2", "dof").head()
    assert(row.getDouble(0) > 10.0) // far past the 95% critical value at dof 1
    assert(row.getInt(1) == 1)
  }

  test("golden: Poisson(15) vs Poisson(15) → no drift") {
    val row = Drift.ksTest(
      tagged(poisson(15, 1000, 1), poisson(15, 500, 2)), "v", "side", "a", "b")
      .select("drift_detected", "p_value").head()
    assert(!row.getBoolean(0), s"p=${row.getDouble(1)}")
  }

  test("golden: Poisson(15) vs Poisson(25) → drift (mean shift)") {
    val row = Drift.ksTest(
      tagged(poisson(15, 1000, 1), poisson(25, 500, 2)), "v", "side", "a", "b")
      .select("drift_detected", "magnitude").head()
    assert(row.getBoolean(0))
    assert(Seq("large", "very large").contains(row.getString(1)))
  }

  test("golden: Normal(15,2) vs Normal(15,8) → drift (variance inflation)") {
    val row = Drift.ksTest(
      tagged(normal(15, 2, 1000, 3), normal(15, 8, 500, 4)), "v", "side", "a", "b")
      .select("drift_detected").head()
    assert(row.getBoolean(0))
  }

  test("jsDivergence: zero on identical samples, symmetric, bounded by ln 2," +
      " larger under a mean shift") {
    val same = tagged(poisson(15, 800, 7), poisson(15, 800, 7))
    val sameJsd = Drift.jsDivergence(same, "v", "side", "a", "b")
      .select("jsd").head().getDouble(0)
    assert(sameJsd == 0.0)
    val shifted = tagged(poisson(15, 800, 8), poisson(25, 800, 9))
    val ab = Drift.jsDivergence(shifted, "v", "side", "a", "b")
      .select("jsd").head().getDouble(0)
    val ba = Drift.jsDivergence(shifted, "v", "side", "b", "a")
      .select("jsd").head().getDouble(0)
    assert(ab == ba, "JSD must be symmetric in the two sides")
    assert(ab > 0.05 && ab <= math.log(2.0) + 1e-9)
    assert(ab > sameJsd)
    // per-bin contributions sum to the scalar
    val rows = Drift.jsDivergence(shifted, "v", "side", "a", "b")
      .select("contribution").collect().map(_.getDouble(0))
    assert(math.abs(rows.sum - ab) < 1e-4)
  }

  test("cusum: prefix identity ≡ sequential recursion; a step change " +
      "alarms, the in-control period does not") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // baseline rows 1-4: μ₀ = 10, σ₀ = √2; rows 5-7 shift to 15
    val vals = Seq(10.0, 10.0, 12.0, 8.0, 15.0, 15.0, 15.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i + 1, v) }
      .toDF("t", "v")
    val out = Drift.cusum(df, "t", "v", baselineRows = 4)
      .select("t", "s_pos", "s_neg", "alarm")
      .as[(Int, Double, Double, Boolean)].collect().toList
    val mu0 = 10.0; val sigma = math.sqrt(2.0)
    val k = 0.5 * sigma; val h = 3 * sigma
    var sp = 0.0; var sn = 0.0
    val expect = vals.map { x =>
      sp = math.max(0.0, sp + x - mu0 - k)
      sn = math.max(0.0, sn + mu0 - x - k)
      (r6(sp), r6(sn), r6(sp) > r6(h) || r6(sn) > r6(h))
    }
    assert(out.map(r => (r._2, r._3, r._4)) == expect)
    assert(out.count(_._4) == 3 && out.takeWhile(!_._4).length == 4,
      s"alarm should first fire at the shift: $out")
    intercept[IllegalArgumentException] {
      Drift.cusum(df, "t", "v", baselineRows = 1)
    }
  }

  test("kuiperTest: a pure location shift loads one side only; " +
      "crossing distributions load both and V sums them") {
    // a strictly above b: D- = 1, D+ = 0, V = 1
    val shift = (Seq(10.0, 11.0).map(("a", _)) ++
      Seq(1.0, 2.0).map(("b", _))).toDF("side", "v")
    val s = Drift.kuiperTest(shift, "v", "side", "a", "b")
      .collect().head
    assert(s.getAs[Double]("d_plus") == 0.0)
    assert(s.getAs[Double]("d_minus") == 1.0)
    assert(s.getAs[Double]("v_stat") == 1.0)
    // a = {1, 4}, b = {2, 3}: ECDFs cross — both sides carry 0.5
    val cross = (Seq(1.0, 4.0).map(("a", _)) ++
      Seq(2.0, 3.0).map(("b", _))).toDF("side", "v")
    val c = Drift.kuiperTest(cross, "v", "side", "a", "b")
      .collect().head
    assert(c.getAs[Double]("d_plus") == 0.5 &&
      c.getAs[Double]("d_minus") == 0.5)
    assert(c.getAs[Double]("v_stat") == 1.0)
  }

  test("tvd: disjoint supports score 1, identical distributions 0, " +
      "and the half-moved case hits 0.5 exactly") {
    val disjoint = Seq(("a", "r"), ("b", "c")).toDF("cat", "side")
    val d = Drift.tvd(disjoint, "cat", "side", "r", "c").collect()
    assert(d.forall(_.getAs[Double]("tvd") == 1.0))
    val same = Seq(("a", "r"), ("b", "r"), ("a", "c"), ("b", "c"))
      .toDF("cat", "side")
    val s = Drift.tvd(same, "cat", "side", "r", "c").collect()
    assert(s.forall(_.getAs[Double]("tvd") == 0.0))
    // ref (a,a), cur (a,b): half the mass moved from a to b
    val half = Seq(("a", "r"), ("a", "r"), ("a", "c"), ("b", "c"))
      .toDF("cat", "side")
    val h = Drift.tvd(half, "cat", "side", "r", "c").collect()
    assert(h.forall(_.getAs[Double]("tvd") == 0.5))
    val contrib = h.map(r => r.getAs[String]("category") ->
      r.getAs[Double]("contribution")).toMap
    assert(contrib("a") == 0.25 && contrib("b") == 0.25)
  }

  test("qqTable: a pure location shift moves every quantile by the " +
      "shift; quantile labels and order are exact") {
    val rows = (1 to 5).map(i => ("r", i.toDouble)) ++
      (1 to 5).map(i => ("c", i + 10.0))
    val df = rows.toDF("side", "v")
    val out = Drift.qqTable(df, "v", "side", "r", "c",
      quantiles = Seq(0.25, 0.5, 0.75)).collect()
    assert(out.map(_.getAs[Double]("quantile")).toSeq ==
      Seq(0.25, 0.5, 0.75))
    assert(out.forall(_.getAs[Double]("gap") == 10.0))
    assert(out(1).getAs[Double]("q_ref") == 3.0 &&
      out(1).getAs[Double]("q_cur") == 13.0)
    intercept[IllegalArgumentException] {
      Drift.qqTable(df, "v", "side", "r", "c", quantiles = Seq(0.5, 0.1))
    }
  }

  test("pageHinkley: prefix identity ≡ the sequential recursion; a " +
      "constant run stays at 0, a step change alarms upward only") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vals = Seq.fill(10)(10.0) ++ Seq.fill(10)(11.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i + 1, v) }
      .toDF("t", "v")
    val out = Drift.pageHinkley(df, "t", "v", delta = 0.1, lambda = 2.0)
      .select("t", "ph_up", "ph_down", "alarm")
      .as[(Int, Double, Double, Boolean)].collect().toList
    // sequential replay: m_t = Σ(x - runningMean - δ), PH = m - min(0, m*)
    var cum = 0.0; var mu = 0.0; var md = 0.0
    var mnU = 0.0; var mnD = 0.0
    val expect = vals.zipWithIndex.map { case (x, i) =>
      cum += x
      val rbar = cum / (i + 1)
      mu += x - rbar - 0.1; md += rbar - x - 0.1
      mnU = math.min(mnU, mu); mnD = math.min(mnD, md)
      (r6(mu - mnU), r6(md - mnD))
    }
    assert(out.map(r => (r._2, r._3)) == expect)
    // constant prefix never alarms; the shift alarms on the up side only
    assert(out.take(10).forall(r => r._2 == 0.0 && !r._4))
    assert(out.last._4 && out.last._2 > 2.0 && out.forall(_._3 == 0.0))
    intercept[IllegalArgumentException] {
      Drift.pageHinkley(df, "t", "v", delta = -1.0, lambda = 2.0)
    }
  }

  test("wasserstein1Binned: point masses at the range ends score ~range, " +
      "identical sides score 0, empty-bin runs carry the gap") {
    import spark.implicits._
    val far = (Seq.fill(50)(("a", 0.0)) ++ Seq.fill(50)(("b", 10.0)))
      .toDF("side", "v")
    val r = Drift.wasserstein1Binned(far, "v", "side", "a", "b", bins = 1000)
      .collect().head
    // gap 1.0 persists across 999 empty bins: area 999/1000 of range 10
    assert(r.getAs[Double]("wasserstein1") == 9.99)
    assert(r.getAs[Double]("w1_normalized") == 0.999)
    assert(r.getAs[Long]("n_a") == 50L && r.getAs[Long]("n_b") == 50L)
    val same = (Seq.fill(30)(("a", 1.0)) ++ Seq.fill(30)(("b", 1.0)) ++
      Seq.fill(30)(("a", 5.0)) ++ Seq.fill(30)(("b", 5.0)))
      .toDF("side", "v")
    val z = Drift.wasserstein1Binned(same, "v", "side", "a", "b")
      .collect().head
    assert(z.getAs[Double]("wasserstein1") == 0.0)
  }

  test("sweepFdr: BH step-up — massive drift rejects, null feature " +
      "doesn't, adjusted p is the reverse running min capped at 1") {
    import spark.implicits._
    // hand-built sweep report: f_drift has D=0.5 over 1000v1000
    // (lambda = 11.2 -> p ~ 0); f_null has D=0 (lambda 0 -> p = 1);
    // f_mid has a small D with lambda just over the series floor
    val report = Seq(
      ("f_drift", 1000L, 1000L, 0.5),
      ("f_mid", 1000L, 1000L, 0.06),
      ("f_null", 1000L, 1000L, 0.0)
    ).toDF("feature", "n_a", "n_b", "ks_stat")
    val out = Drift.sweepFdr(report, alpha = 0.05)
      .as[(String, Long, Long, Double, Double, Long, Double, Boolean)]
      .collect()
    val byF = out.map(r => r._1 -> r).toMap
    assert(byF("f_drift")._5 == 0.0 && byF("f_drift")._8)   // p ~ 0, reject
    assert(byF("f_null")._5 == 1.0 && !byF("f_null")._8)    // p = 1, keep
    // ranks follow ascending p; adjusted p monotone along ranks, >= raw,
    // capped at 1
    val byRank = out.sortBy(_._6)
    assert(byRank.map(_._1).head == "f_drift" && byRank.last._1 == "f_null")
    assert(byRank.sliding(2).forall(p => p(0)._7 <= p(1)._7))
    assert(out.forall(r => r._7 >= r._5 && r._7 <= 1.0))
    intercept[IllegalArgumentException] { Drift.sweepFdr(report, 0.0) }
  }

  test("changepoint: a clean level shift locates the last pre-shift day " +
      "with exact means, ties break to the earliest day") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate
      .of(2024, 3, i))
    // 5 days at 10, then 5 at 20 -> split after day 5
    val series = ((1 to 5).map(i => (d(i), 10.0)) ++
      (6 to 10).map(i => (d(i), 20.0))).toDF("day", "v")
    val out = Drift.changepoint(series, col("day"), "v").collect().head
    assert(out.getAs[Long]("n_days") == 10L)
    assert(out.getAs[java.sql.Date]("change_day") == d(5))
    assert(out.getAs[Long]("days_before") == 5L)
    assert(out.getAs[Double]("t_stat") == 25.0) // |10*50 - 5*150|/10
    assert(out.getAs[Double]("mean_before") == 10.0)
    assert(out.getAs[Double]("mean_after") == 20.0)
    assert(out.getAs[Double]("shift") == 10.0)
    // flat series: every split scores 0 -> earliest day wins
    val flat = (1 to 6).map(i => (d(i), 5.0)).toDF("day", "v")
    val f = Drift.changepoint(flat, col("day"), "v").collect().head
    assert(f.getAs[java.sql.Date]("change_day") == d(1))
    assert(f.getAs[Double]("t_stat") == 0.0 && f.getAs[Double]("shift") == 0.0)
  }

  test("cvmTest: hand-computed T over {1,2} vs {2,3}; identical " +
      "samples score exactly 0") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("side", "value")
    val r = Drift.cvmTest(df, "value", "side", "a", "b").collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("n_values") == 3L)
    // num = 1*(2)^2 + 2*(2)^2 + 1*0 = 12; T = 12 / (16 * 4) = 0.1875
    assert(r.getAs[Double]("cvm_t") == 0.1875)
    assert(!r.getAs[Boolean]("drifted"))
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("side", "value")
    val s = Drift.cvmTest(same, "value", "side", "a", "b").collect().head
    assert(s.getAs[Double]("cvm_t") == 0.0)
  }

  test("energyDistance: closed-form expectations over {1,2} vs {2,3}; " +
      "identical samples give D2 exactly 0") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("side", "value")
    val r = Drift.energyDistance(df, "value", "side", "a", "b")
      .collect().head
    // E|X-Y| = (1+2+0+1)/4 = 1; E|X-X'| = E|Y-Y'| = 0.5
    assert(r.getAs[Double]("e_between") == 1.0)
    assert(r.getAs[Double]("e_within_a") == 0.5)
    assert(r.getAs[Double]("e_within_b") == 0.5)
    assert(r.getAs[Double]("energy_d2") == 1.0)
    assert(r.getAs[Double]("e_stat") == 1.0)
    val same = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0))
      .toDF("side", "value")
    val s = Drift.energyDistance(same, "value", "side", "a", "b")
      .collect().head
    assert(s.getAs[Double]("energy_d2") == 0.0)
    assert(s.getAs[Double]("e_between") == 1.0) // E|X-Y| = (0+2+2+0)/4
  }

  test("binned rank/ECDF twins: with bins >= lattice span the order-only " +
      "twins equal exact BIT-FOR-BIT; coarse bins stay within one bin's " +
      "mass/width of exact") {
    import spark.implicits._
    // two shifted samples on a small lattice: values 0.01..20.00 -> span
    // 2000 lattice units, so bins = 100000 >= span makes binning an
    // order-preserving relabeling (each lattice point its own bin)
    val rng = new scala.util.Random(7)
    val rows = (1 to 400).map(i => ("a", 1.0 + 10.0 * ((i * 37 % 400) / 400.0))) ++
      (1 to 400).map(i => ("b", 6.0 + 10.0 * ((i * 91 % 400) / 400.0)))
    val df = rows.toDF("side", "value")
      .withColumn("value", round(col("value"), 2))
    // exact == fine-binned for the order-only statistics
    val cvmE = Drift.cvmTest(df, "value", "side", "a", "b").collect().head
    val cvmF = Drift.cvmBinned(df, "value", "side", "a", "b",
      bins = 100000).collect().head
    assert(cvmE.getAs[Double]("cvm_t") == cvmF.getAs[Double]("cvm_t"))
    assert(cvmE.getAs[Long]("n_values") == cvmF.getAs[Long]("n_values"))
    val kuE = Drift.kuiperTest(df, "value", "side", "a", "b").collect().head
    val kuF = Drift.kuiperBinned(df, "value", "side", "a", "b",
      bins = 100000).collect().head
    assert(kuE.getAs[Double]("v_stat") == kuF.getAs[Double]("v_stat"))
    assert(kuE.getAs[Double]("d_plus") == kuF.getAs[Double]("d_plus"))
    // coarse bins: kuiper V is a sup over fewer evaluation points -> can
    // only drop, and by at most one bin's pooled mass (here <= ~2 bins'
    // share of 800 rows at bins=20 on a near-uniform pair)
    val kuC = Drift.kuiperBinned(df, "value", "side", "a", "b", bins = 20)
      .collect().head
    assert(kuC.getAs[Double]("v_stat") <= kuE.getAs[Double]("v_stat") + 1e-9)
    assert(kuE.getAs[Double]("v_stat") - kuC.getAs[Double]("v_stat") <= 0.15)
    // energy: repr-based, within one bin width (span 19.99 value units /
    // 100 bins ~ 0.2) on every expectation term
    val enE = Drift.energyDistance(df, "value", "side", "a", "b")
      .collect().head
    val enC = Drift.energyBinned(df, "value", "side", "a", "b", bins = 100)
      .collect().head
    val w = 19.99 / 100
    for (c <- Seq("e_between", "e_within_a", "e_within_b", "energy_d2"))
      assert(math.abs(enE.getAs[Double](c) - enC.getAs[Double](c)) <= w,
        s"$c off by more than one bin width")
    // cvm coarse: integrated statistic moves by at most O(one bin mass)
    val cvmC = Drift.cvmBinned(df, "value", "side", "a", "b", bins = 20)
      .collect().head
    assert(math.abs(cvmC.getAs[Double]("cvm_t")
      - cvmE.getAs[Double]("cvm_t")) <= 0.5)
    assert(cvmC.getAs[Boolean]("drifted") == cvmE.getAs[Boolean]("drifted"))
  }

  test("andersonDarling: identical per-value counts give exactly 0; a " +
      "shift registers; order-only invariance; binned == exact when " +
      "bins cover the lattice") {
    import spark.implicits._
    val same = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("side", "value")
    assert(Drift.andersonDarling(same, "value", "side", "a", "b")
      .collect().head.getAs[Double]("ad_stat") == 0.0)
    val rows = (1 to 300).map(i => ("a", 1.0 + (i % 60) / 4.0)) ++
      (1 to 300).map(i => ("b", 6.0 + (i % 60) / 4.0))
    val df = rows.toDF("side", "value")
    val ad = Drift.andersonDarling(df, "value", "side", "a", "b")
      .collect().head.getAs[Double]("ad_stat")
    assert(ad > 10.0) // strong shift on 300-vs-300
    // monotone lattice-preserving transform leaves AD unchanged
    val scaled = df.withColumn("value", col("value") * 2.0)
    assert(Drift.andersonDarling(scaled, "value", "side", "a", "b")
      .collect().head.getAs[Double]("ad_stat") == ad)
    // fine binning == exact (order-only statistic)
    assert(Drift.andersonDarlingBinned(df, "value", "side", "a", "b",
      bins = 100000).collect().head.getAs[Double]("ad_stat") == ad)
    // coarse binning stays within a modest distance
    val adC = Drift.andersonDarlingBinned(df, "value", "side", "a", "b",
      bins = 20).collect().head.getAs[Double]("ad_stat")
    assert(math.abs(adC - ad) / ad < 0.25)
  }
}
