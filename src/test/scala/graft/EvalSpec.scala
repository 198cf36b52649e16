package graft

import org.apache.spark.sql.functions._
import graft.ops.Eval

/** Hand-computable golden cases for the evaluation/experimentation ops. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("rocAuc: perfect separation 1, inverted 0, all-tied 0.5, " +
      "degenerate group NULL") {
    val df = Seq(
      // g: positives strictly above negatives
      ("g", 1, 3.0), ("g", 1, 4.0), ("g", 0, 1.0), ("g", 0, 2.0),
      // h: positive strictly below the negative
      ("h", 1, 1.0), ("h", 0, 2.0),
      // i: one tied score for both classes -> midrank 0.5
      ("i", 1, 5.0), ("i", 0, 5.0),
      // j: positives only -> undefined
      ("j", 1, 1.0), ("j", 1, 2.0)
    ).toDF("grp", "y", "s")
    val out = Eval.rocAuc(df, "grp", col("y") === 1, "s")
      .select("grp", "n_pos", "n_neg", "auc", "gini")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("g") == (("g", 2L, 2L, Some(1.0), Some(1.0))))
    assert(out("h") == (("h", 1L, 1L, Some(0.0), Some(-1.0))))
    assert(out("i") == (("i", 1L, 1L, Some(0.5), Some(0.0))))
    assert(out("j") == (("j", 2L, 0L, None, None)))
  }

  test("liftTable: top-decile lift = 1/base and capture accumulates to 1") {
    // scores 1..20, positives = the top five scores (16..20)
    val df = (1 to 20).map(i => (i.toDouble, if (i >= 16) 1 else 0))
      .toDF("s", "y")
    val out = Eval.liftTable(df, col("y") === 1, "s", bins = 10)
      .select("decile", "n", "n_pos", "lift", "cum_capture")
      .as[(Int, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out.size == 10 && out.values.forall(_._2 == 2L))
    // base rate 5/20; decile 0 holds {19, 20}: rate 1 -> lift 4
    assert(out(0)._3 == 2L && out(0)._4.get == 4.0)
    assert(out(0)._5.get == 0.4 && out(1)._5.get == 0.8)
    assert(out(2)._3 == 1L && out(2)._5.get == 1.0)
    assert((3 to 9).forall(d => out(d)._3 == 0L && out(d)._5.get == 1.0))
  }

  test("rateDecomposition: Bennet effects hit the closed form and sum " +
      "exactly to the total change; absent segments keep the identity") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, day).atTime(12, 0))
    val rows = Seq(
      ("a", ts(10), 1), ("a", ts(10), 0), ("b", ts(10), 0),
      ("b", ts(10), 0),
      ("a", ts(20), 1), ("b", ts(20), 0), ("b", ts(20), 0),
      ("b", ts(20), 0))
    val df = rows.toDF("seg", "ts", "pos")
    val out = Eval.rateDecomposition(df, "seg", "ts", col("pos") === 1,
      "2024-01-16").collect()
      .map(r => r.getAs[String]("segment") -> r).toMap
    val a = out("a")
    assert(a.getAs[Double]("mix_effect") == -0.1875)
    assert(a.getAs[Double]("rate_effect") == 0.1875)
    assert(out("b").getAs[Double]("mix_effect") == 0.0)
    assert(a.getAs[Double]("total_change") == 0.0)
    assert(a.getAs[Double]("total_mix_effect") == -0.1875)
    assert(a.getAs[Double]("total_rate_effect") == 0.1875)
    // a segment absent pre-period enters with share 0 / rate 0 and the
    // identity still closes: only-post segment c converts fully
    val withC = rows ++ Seq(("c", ts(20), 1))
    val o2 = Eval.rateDecomposition(withC.toDF("seg", "ts", "pos"),
      "seg", "ts", col("pos") === 1, "2024-01-16").collect()
    val tm = o2.head.getAs[Double]("total_mix_effect")
    val tr = o2.head.getAs[Double]("total_rate_effect")
    val tc = o2.head.getAs[Double]("total_change")
    assert(math.abs(tm + tr - tc) < 2e-6, s"$tm + $tr != $tc")
  }

  test("rmst: the step integral of the KM curve hits the closed form, " +
      "and a horizon below the first step degenerates to exactly tau") {
    def ts(h: Long) = new java.sql.Timestamp(h * 3600000L)
    // per-user durations to first qualifying event: 10, 10, 20, 40 h
    val rows = Seq(
      (1L, ts(0), 0), (1L, ts(10), 1),
      (2L, ts(0), 0), (2L, ts(10), 1),
      (3L, ts(0), 0), (3L, ts(20), 1),
      (4L, ts(0), 0), (4L, ts(40), 1))
    val df = rows.toDF("user_id", "ts", "flag")
    // S: [0,10)=1, [10,20)=.5, [20,40)=.25, [40,..)=0
    val r = Eval.rmst(df, "user_id", "ts", col("flag") === 1,
      horizonHours = 30L).collect().head
    assert(r.getAs[Long]("n_steps") == 2L)
    assert(r.getAs[Double]("rmst_hours") == 17.5) // 10 + 5 + 2.5
    assert(r.getAs[Double]("mean_survival") == 0.583333)
    val early = Eval.rmst(df, "user_id", "ts", col("flag") === 1,
      horizonHours = 5L).collect().head
    assert(early.getAs[Long]("n_steps") == 0L)
    assert(early.getAs[Double]("rmst_hours") == 5.0)
    assert(early.getAs[Double]("mean_survival") == 1.0)
    intercept[IllegalArgumentException] {
      Eval.rmst(df, "user_id", "ts", col("flag") === 1, 0L)
    }
  }

  test("cuped: a perfectly predictive covariate scores theta from the " +
      "exact sums, zeroes the adjusted lift, and reduces variance to 0") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, day).atTime(12, 0))
    // post == 2 * pre exactly: yadj = 2*xbar for every user
    val rows = (1L to 8L).flatMap(u =>
      Seq((u, ts(10), u.toDouble), (u, ts(20), 2.0 * u)))
    val df = rows.toDF("user_id", "ts", "value")
    val r = Eval.cuped(df, "user_id", "ts", "value", "2024-01-16")
      .collect().head
    assert(r.getAs[Long]("n_control") + r.getAs[Long]("n_treatment") == 8L)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("mean_adj_control") == 9.0) // 2 * mean(1..8)
    assert(r.getAs[Double]("mean_adj_treatment") == 9.0)
    assert(r.getAs[Double]("adj_lift") == 0.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)
    // constant pre-period: zero covariate variance -> theta 0, adjusted
    // readout degenerates to the raw one instead of dividing by zero
    val flat = (1L to 4L).flatMap(u =>
      Seq((u, ts(10), 5.0), (u, ts(20), u.toDouble)))
      .toDF("user_id", "ts", "value")
    val f = Eval.cuped(flat, "user_id", "ts", "value", "2024-01-16")
      .collect().head
    assert(f.getAs[Double]("theta") == 0.0)
    assert(f.getAs[Double]("adj_lift") == f.getAs[Double]("raw_lift"))
    assert(f.getAs[Double]("var_reduction") == 0.0)
  }

  test("oddsRatioRR: the 2x2 folds exactly and OR/RR + Wald CIs hit " +
      "the closed forms; an empty cell nulls the estimates") {
    // users: 2 exposed+pos, 2 exposed+neg, 1 unexposed+pos, 5 unexposed+neg
    val rows = (1L to 2L).flatMap(u => Seq((u, "x", 1), (u, "y", 1))) ++
      (3L to 4L).map(u => (u, "x", 0)) ++ Seq((5L, "n", 1)) ++
      (6L to 10L).map(u => (u, "n", 0))
    val df = rows.toDF("user_id", "tag", "out")
    val r = Eval.oddsRatioRR(df, "user_id", col("tag") === "x",
      col("out") === 1).collect().head
    assert(r.getAs[Long]("n_exposed_pos") == 2L &&
      r.getAs[Long]("n_unexposed_neg") == 5L)
    assert(r.getAs[Double]("odds_ratio") == 5.0)   // 2*5 / (2*1)
    assert(r.getAs[Double]("relative_risk") == 3.0) // (2/4) / (1/6)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val seOr = math.sqrt(1.0 / 2 + 1.0 / 2 + 1.0 / 1 + 1.0 / 5)
    assert(r.getAs[Double]("or_ci_lo") ==
      r6(math.exp(math.log(5.0) - 1.959964 * seOr)))
    assert(r.getAs[Double]("or_ci_hi") ==
      r6(math.exp(math.log(5.0) + 1.959964 * seOr)))
    val seRr = math.sqrt(1.0 / 2 - 1.0 / 4 + 1.0 / 1 - 1.0 / 6)
    assert(r.getAs[Double]("rr_ci_lo") ==
      r6(math.exp(math.log(3.0) - 1.959964 * seRr)))
    // no unexposed positives: estimates NULL, cells still reported
    val deg = Seq((1L, "x", 1), (2L, "x", 0), (3L, "n", 0))
      .toDF("user_id", "tag", "out")
    val d = Eval.oddsRatioRR(deg, "user_id", col("tag") === "x",
      col("out") === 1).collect().head
    assert(d.isNullAt(d.fieldIndex("odds_ratio")) &&
      d.getAs[Long]("n_unexposed_neg") == 1L)
  }

  test("precisionRecallAtK: the lcm-exact AP hits the closed form, " +
      "relevant items beyond the cut feed recall's denominator, and " +
      "no-relevant groups score AP 0 with NULL recall") {
    // u1 ranked [rel,0,rel | rel]: top-3 holds 2 of 3 relevant
    val rows = Seq((1L, 10L, 5.0, 1), (1L, 11L, 4.0, 0), (1L, 12L, 3.0, 1),
      (1L, 13L, 1.0, 1), (2L, 20L, 9.0, 0), (2L, 21L, 8.0, 0))
    val df = rows.toDF("g", "id", "s", "r")
    val out = Eval.precisionRecallAtK(df, "g", "id", "s",
      col("r") === 1, k = 3).collect()
    val u1 = out.find(_.getAs[Long]("g") == 1L).get
    assert(u1.getAs[Long]("n_rel_total") == 3L)
    assert(u1.getAs[Long]("n_rel_at_k") == 2L)
    assert(u1.getAs[Double]("precision_at_k") == 0.666667)
    assert(u1.getAs[Double]("recall_at_k") == 0.666667)
    // AP = (1/1 + 2/3) / min(3,3) = 5/9
    assert(u1.getAs[Double]("avg_precision") == 0.555556)
    val u2 = out.find(_.getAs[Long]("g") == 2L).get
    assert(u2.getAs[Double]("avg_precision") == 0.0)
    assert(u2.isNullAt(u2.fieldIndex("recall_at_k")))
    // MAP folds the rounded per-group APs: (0.555556 + 0) / 2
    assert(out.forall(_.getAs[Double]("map") == 0.277778))
    intercept[IllegalArgumentException] {
      Eval.precisionRecallAtK(df, "g", "id", "s", col("r") === 1, k = 21)
    }
  }

  test("mcnemar: the paired 2x2 folds per user and the discordant " +
      "statistics hit the closed form") {
    // u1 A-only; u2,u3 B-only; u4 both; u5 neither
    val rows = Seq((1L, "click"), (2L, "purchase"), (3L, "purchase"),
      (4L, "click"), (4L, "purchase"), (5L, "view"))
    val df = rows.toDF("user_id", "event_type")
    val out = Eval.mcnemar(df, "user_id",
      col("event_type") === "click", col("event_type") === "purchase")
      .collect().head
    assert(out.getAs[Long]("n_users") == 5L)
    assert(out.getAs[Long]("n_both") == 1L)
    assert(out.getAs[Long]("n_a_only") == 1L)
    assert(out.getAs[Long]("n_b_only") == 2L)
    assert(out.getAs[Long]("n_neither") == 1L)
    assert(out.getAs[Double]("chi2") == 0.333333)   // (1-2)^2 / 3
    assert(out.getAs[Double]("chi2_corrected") == 0.0) // (|1-2|-1)^2 / 3
    assert(out.getAs[Double]("discordant_odds") == 0.5)
    // no discordance at all: statistics are NULL, not a crash or a 0/0
    val tied = Seq((1L, "click"), (1L, "purchase"), (2L, "view"))
      .toDF("user_id", "event_type")
    val t = Eval.mcnemar(tied, "user_id",
      col("event_type") === "click", col("event_type") === "purchase")
      .collect().head
    assert(t.isNullAt(t.fieldIndex("chi2")) &&
      t.isNullAt(t.fieldIndex("discordant_odds")))
  }

  test("abTest: arms partition the users and the statistics replay the " +
      "closed-form formulas on the hash assignment") {
    val M = 2147483647L
    def u01(key: Long, c: Long): Double = {
      val h1 = (key + c * 1000003L) % M
      ((h1 * 48271L % M) * 48271L % M + 1).toDouble / M
    }
    // 40 users, 3 events each; conversion = any value > 95; the third
    // event pushes half the users over the line deterministically
    val rows = (1L to 40L).flatMap { u =>
      Seq((u, "e", 10.0), (u, "e", 20.0),
        (u, "e", if (u % 2 == 0) 96.0 else 30.0))
    }
    val df = rows.toDF("user_id", "event_type", "value")
    val out = Eval.abTest(df, "user_id", col("value") > 95.0, "value").head()
    def g(n: String) = out.getAs[Any](n)
    val (nc, nt) = (g("n_control").asInstanceOf[Long],
      g("n_treatment").asInstanceOf[Long])
    assert(nc + nt == 40L && nc > 0 && nt > 0)
    // replay the assignment + user aggregates in plain Scala
    val byArm = (1L to 40L).groupBy(u => u01(u, 59L) > 0.5)
    assert(nc == byArm(false).size && nt == byArm(true).size)
    def conv(us: Seq[Long]) = us.count(_ % 2 == 0).toLong
    assert(g("conversions_control") == conv(byArm(false)))
    assert(g("conversions_treatment") == conv(byArm(true)))
    def rev(u: Long) = 30.0 + (if (u % 2 == 0) 96.0 else 30.0)
    val (mc, mt) = (byArm(false).map(rev).sum / nc, byArm(true).map(rev).sum / nt)
    assert(math.abs(g("rev_mean_control").asInstanceOf[Double] - mc) < 1e-6)
    assert(math.abs(g("rev_mean_treatment").asInstanceOf[Double] - mt) < 1e-6)
    val (rc, rt) = (conv(byArm(false)).toDouble / nc, conv(byArm(true)).toDouble / nt)
    val pp = (conv(byArm(false)) + conv(byArm(true))).toDouble / 40
    val z = (rt - rc) / math.sqrt(pp * (1 - pp) * (1.0 / nc + 1.0 / nt))
    assert(math.abs(g("z_stat").asInstanceOf[Double] - z) < 1e-5)
  }

  test("shapleyAttribution: hand-computed two-channel game satisfies " +
      "the closed form and the efficiency identity") {
    // v(0)=0, v(A)=1/2, v(B)=0, v(AB)=1 -> phi_A=.75, phi_B=.25
    val df = Seq((1L, "A"), (1L, "conv"), (2L, "A"), (3L, "B"),
      (4L, "A"), (4L, "B"), (4L, "conv"), (5L, "other"))
      .toDF("u", "ch")
    val r = Eval.shapleyAttribution(df, "u", "ch", Seq("A", "B"),
      col("ch") === "conv").collect()
    val a = r.find(_.getString(0) == "A").get
    assert(a.getAs[Long]("n_exposed") == 3L)
    assert(a.getAs[Double]("v_alone") == 0.5)
    assert(a.getAs[Double]("shapley") == 0.75)
    assert(a.getAs[Double]("share") == 0.75)
    assert(a.getAs[Double]("total_phi") == 1.0) // v(all) - v(empty)
    val b = r.find(_.getString(0) == "B").get
    assert(b.getAs[Long]("n_exposed") == 2L)
    assert(b.getAs[Double]("v_alone") == 0.0)
    assert(b.getAs[Double]("shapley") == 0.25)
    intercept[IllegalArgumentException] {
      Eval.shapleyAttribution(df, "u", "ch", Seq.fill(9)("x")
        .zipWithIndex.map(t => t._1 + t._2), col("ch") === "conv")
    }
  }

  test("weibullFit: OLS over the rounded KM steps replays an " +
      "independent computation; under 3 usable steps reports NULLs") {
    def ts(h: Long) = new java.sql.Timestamp(1700000000000L + h * 3600000L)
    // four users, events at 1/2/4/8h: steps S = .75, .5, .25, 0 (last
    // dropped by the 0 < S < 1 filter) -> 3 usable (t, S) points
    val rows = Seq(
      (1L, ts(0), "s"), (1L, ts(1), "e"),
      (2L, ts(0), "s"), (2L, ts(2), "e"),
      (3L, ts(0), "s"), (3L, ts(4), "e"),
      (4L, ts(0), "s"), (4L, ts(8), "e")).toDF("user_id", "fts", "kind")
    val r = Eval.weibullFit(rows, "user_id", "fts", col("kind") === "e")
      .collect().head
    assert(r.getAs[Long]("n_steps") == 3L)
    assert(r.getAs[Double]("shape") == 1.134343)
    assert(r.getAs[Double]("scale") == 2.918239)
    assert(r.getAs[Double]("median_t") == 2.112505)
    assert(r.getAs[Double]("r2") == 0.995346)
    val tiny = Seq((1L, ts(0), "s"), (1L, ts(1), "e"),
      (2L, ts(0), "s"), (2L, ts(2), "e")).toDF("user_id", "fts", "kind")
    val t2 = Eval.weibullFit(tiny, "user_id", "fts", col("kind") === "e")
      .collect().head
    assert(t2.isNullAt(t2.fieldIndex("shape")))
  }

  test("kaplanMeier: survival steps only at event hours, censoring " +
      "shrinks the risk set, exhausted risk set pins survival to 0") {
    def ts(h: Long) = new java.sql.Timestamp(1700000000000L + h * 3600000L)
    // durations (hours): events at 1 (u1, u2) and 3 (u3); censored at 2
    // (u4) and 5 (u5)
    val rows = Seq(
      (1L, ts(0), "s"), (1L, ts(1), "e"),
      (2L, ts(0), "s"), (2L, ts(1), "e"),
      (3L, ts(0), "s"), (3L, ts(2), "s"), (3L, ts(3), "e"),
      (4L, ts(0), "s"), (4L, ts(2), "s"),
      (5L, ts(0), "s"), (5L, ts(5), "s")
    ).toDF("user_id", "fts", "kind")
    val out = Eval.kaplanMeier(rows, "user_id", "fts", col("kind") === "e")
      .select("t_hours", "n_risk", "n_events", "n_censored", "survival")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // S(1) = 1 - 2/5 = 0.6 ; S(3) = 0.6 * (1 - 1/2) = 0.3
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 5L, 2L), (3L, 2L, 1L)))
    assert(out.map(_._5).toSeq == Seq(0.6, 0.3))
    // everyone fires -> the last factor is 0 -> survival exactly 0
    val all = Seq((1L, ts(0), "s"), (1L, ts(1), "e"),
      (2L, ts(0), "s"), (2L, ts(1), "e")).toDF("user_id", "fts", "kind")
    val z = Eval.kaplanMeier(all, "user_id", "fts", col("kind") === "e")
      .select("survival").as[Double].collect()
    assert(z.toSeq == Seq(0.0))
  }

  test("seasonality: pure weekday signal decomposes to flat trend, " +
      "centered slots, zero residual, NULL trend edges") {
    // 21 consecutive days; value = 700 + slot where slot = epochdays % 7
    val d0 = java.time.LocalDate.of(2024, 1, 1) // epoch day 19723 -> slot 4
    val rows = (0 until 21).map { i =>
      val d = d0.plusDays(i.toLong)
      (java.sql.Date.valueOf(d), 700.0 + (d.toEpochDay % 7).toDouble)
    }
    val out = Eval.seasonality(rows.toDF("d", "v"), col("d"), "v")
      .select("day", "dow", "trend", "seasonal", "residual")
      .as[(java.sql.Date, Int, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1.getTime)
    assert(out.length == 21)
    assert(out(0)._2 == 4) // 2024-01-01 is slot 4 under epoch-mod-7
    // 3-day edges carry no trend
    assert(out.take(3).forall(_._3.isEmpty) && out.takeRight(3).forall(_._3.isEmpty))
    // interior: trend = 700 + mean(0..6) = 703, seasonal = slot - 3,
    // residual = 0
    out.slice(3, 18).foreach { r =>
      assert(r._3.get == 703.0)
      assert(r._4.get == (r._2 - 3).toDouble)
      assert(r._5.get == 0.0)
    }
  }
  test("forecastBaseline: linear series gives MAE 1 (naive) and 7 " +
      "(seasonal-naive), MASE 7, NULL forecasts at the head") {
    val d0 = java.time.LocalDate.of(2024, 3, 1)
    val rows = (0 until 14).map(i =>
      (java.sql.Date.valueOf(d0.plusDays(i.toLong)), (i + 1).toDouble))
    val out = Eval.forecastBaseline(rows.toDF("d", "v"), col("d"), "v")
      .select("actual", "naive", "snaive", "mae_naive", "mae_snaive", "mase")
      .as[(Double, Option[Double], Option[Double], Double, Double, Double)]
      .collect()
    assert(out.length == 14)
    assert(out.head._2.isEmpty && out.take(7).forall(_._3.isEmpty))
    assert(out.last._2.get == 13.0 && out.last._3.get == 7.0)
    assert(out.forall(r => r._4 == 1.0 && r._5 == 7.0 && r._6 == 7.0))
  }
  test("ndcgAtK: hand-computed DCG/IDCG, no-relevant NULL, relevance " +
      "outside the top k scores zero") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def disc(p: Int) = 1.0 / (math.log(p + 1.0) / math.log(2.0))
    val rows =
      // user 1: relevant at predicted positions 1 and 3
      Seq((1L, 11L, 4.0, 1), (1L, 12L, 3.0, 0), (1L, 13L, 2.0, 1),
        (1L, 14L, 1.0, 0)) ++
      // user 2: nothing relevant
      Seq((2L, 21L, 9.0, 0), (2L, 22L, 8.0, 0)) ++
      // user 3: 12 items, the only relevant one ranked 11th -> outside k
      (1 to 12).map(i => (3L, 30L + i, 100.0 - i, if (i == 11) 1 else 0))
    val out = Eval.ndcgAtK(rows.toDF("u", "id", "s", "rel"),
        "u", "id", "s", col("rel") === 1, k = 10)
      .select("u", "n_relevant", "dcg", "idcg", "ndcg")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val dcg1 = disc(1) + disc(3)
    val idcg1 = disc(1) + disc(2)
    assert(out(1L)._3.get == r6(dcg1) && out(1L)._4.get == r6(idcg1))
    assert(out(1L)._5.get == r6(dcg1 / idcg1))
    assert(out(2L) == ((2L, 0L, Some(0.0), None, None)))
    assert(out(3L)._2 == 1L && out(3L)._3.get == 0.0 &&
      out(3L)._5.get == 0.0)
  }
  test("abPower: closed-form replay of required n and MDE on the hash " +
      "assignment; zero-delta experiment reports NULL sizing") {
    val M = 2147483647L
    def u01(key: Long, c: Long): Double = {
      val h1 = (key + c * 1000003L) % M
      ((h1 * 48271L % M) * 48271L % M + 1).toDouble / M
    }
    val rows = (1L to 40L).map(u =>
      (u, if (u % 2 == 0) 96.0 else 30.0))
    val out = Eval.abPower(rows.toDF("user_id", "value"),
      "user_id", col("value") > 95.0).head()
    def g(n: String) = out.getAs[Any](n)
    val byArm = (1L to 40L).groupBy(u => u01(u, 59L) > 0.5)
    val (nc, nt) = (byArm(false).size, byArm(true).size)
    val (rc, rt) = (byArm(false).count(_ % 2 == 0).toDouble / nc,
      byArm(true).count(_ % 2 == 0).toDouble / nt)
    val zs = 1.959964 + 0.841621
    val d = math.abs(rt - rc)
    assert(d > 0) // this seed splits unevenly, so rates differ
    val req = math.ceil(zs * zs * (rc * (1 - rc) + rt * (1 - rt)) / (d * d))
    assert(g("required_n_per_arm") == req.toLong)
    assert(g("powered") == (math.min(nc, nt) >= req))
    // all-converted corpus: delta 0 -> NULL sizing, MDE still reported
    val flat = (1L to 10L).map(u => (u, 100.0)).toDF("user_id", "value")
    val f = Eval.abPower(flat, "user_id", col("value") > 95.0).head()
    assert(f.getAs[Any]("required_n_per_arm") == null &&
      f.getAs[Any]("powered") == null &&
      f.getAs[Any]("mde_at_current_n") != null)
  }

  test("timeToConvert: pre-exposure purchases excluded, non-converters " +
      "counted in the base, latencies hand-checked") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: view 10:00, purchase 10:10 -> 600 s
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:10:00"), "purchase"),
      // u2: purchase BEFORE first view (excluded), converts at +30 s
      (2L, t("2024-01-01 08:00:00"), "purchase"),
      (2L, t("2024-01-01 09:00:00"), "view"),
      (2L, t("2024-01-01 09:00:30"), "purchase"),
      // u3: views, never purchases
      (3L, t("2024-01-01 12:00:00"), "view"),
      // u4: purchases only — no view, outside the base entirely
      (4L, t("2024-01-01 13:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = Eval.timeToConvert(ev, "user_id", "ts", "event_type",
      "view", "purchase").head()
    assert(r.getAs[Long]("n_from") == 3L)
    assert(r.getAs[Long]("n_converted") == 2L)
    assert(r.getAs[Double]("conversion_rate") == 0.666667)
    assert(r.getAs[Double]("avg_latency_s") == 315.0)   // (600+30)/2
    assert(r.getAs[Double]("p50_latency_s") == 315.0)   // interp of 30,600
    assert(r.getAs[Double]("p90_latency_s") == 543.0)
  }

  test("cohensKappa: closed-form golden, NULL exclusion, degenerate cases") {
    // 10 items, 2 classes: joint x/x=4, x/y=1, y/x=2, y/y=3
    // po = 7/10; marginals a: x=5 y=5, b: x=6 y=4
    // pe = 0.5*0.6 + 0.5*0.4 = 0.5; kappa = (0.7-0.5)/0.5 = 0.4
    val pairs = Seq.fill(4)(("x", "x")) ++ Seq(("x", "y")) ++
      Seq.fill(2)(("y", "x")) ++ Seq.fill(3)(("y", "y"))
    val df = pairs.toDF("a", "b")
    val r = Eval.cohensKappa(df, "a", "b").head()
    assert(r.getAs[Long]("n_items") == 10L)
    assert(r.getAs[Double]("po") == 0.7)
    assert(r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4)
    // NULL on either side excluded from the joint
    val withNulls = (pairs.map { case (a, b) => (Option(a), Option(b)) } ++
      Seq((None: Option[String], Some("x")), (Some("y"), None))).toDF("a", "b")
    assert(Eval.cohensKappa(withNulls, "a", "b").head()
      .getAs[Long]("n_items") == 10L)
    // both sides constant and equal: pe = 1 -> kappa undefined (NULL)
    val const = Seq.fill(5)(("x", "x")).toDF("a", "b")
    val rc = Eval.cohensKappa(const, "a", "b").head()
    assert(rc.getAs[Double]("po") == 1.0 && rc.isNullAt(rc.fieldIndex("kappa")))
    // perfect disagreement on balanced marginals: kappa = -1
    val anti = (Seq.fill(5)(("x", "y")) ++ Seq.fill(5)(("y", "x"))).toDF("a", "b")
    assert(Eval.cohensKappa(anti, "a", "b").head()
      .getAs[Double]("kappa") == -1.0)
  }

  test("calibration: hand-computed bins, right-edge fold, ECE; a " +
      "perfectly calibrated scorer has ECE 0") {
    // bin 1 [0.1,0.2): probs 0.10/0.20? -> 0.20 goes to bin 2; use
    // explicit probes: two rows at 0.15 (one pos), one at 0.95 (pos),
    // one at exactly 1.0 (folds into bin 9)
    val df = Seq(
      (0.15, 0), (0.15, 1), (0.95, 1), (1.0, 1)
    ).toDF("prob", "y")
    val out = Eval.calibration(df, "prob", "y", bins = 10)
      .as[(Int, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1, 9))
    val b1 = out(1)
    assert(b1._2 == 2L && b1._3 == 0.15 && b1._4 == 0.5 &&
      b1._5 == 0.35 && b1._6 == 0.5)
    val b9 = out(9)
    assert(b9._2 == 2L && b9._3 == 0.975 && b9._4 == 1.0 && b9._5 == 0.025)
    // ECE = 0.5*0.35 + 0.5*0.025 = 0.1875, identical on every row
    assert(out.values.forall(_._7 == 0.1875))

    // perfect calibration: in each bin frac_pos equals mean prob
    val perfect = (Seq.fill(3)((0.25, 1)) ++ Seq.fill(9)((0.25, 0)) ++
      Seq.fill(9)((0.75, 1)) ++ Seq.fill(3)((0.75, 0))).toDF("prob", "y")
    val e = Eval.calibration(perfect, "prob", "y", bins = 10)
      .select("ece").distinct().as[Double].collect()
    assert(e.toSeq == Seq(0.0))
  }

  test("attribution: last-touch picks latest (id tie-break), linear " +
      "splits 1/n, out-of-window touch excluded, no-touch conv -> (none)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: view then click inside the window, purchase
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 10L, ts("2024-01-02 10:00:00"), "click"),
      (3L, 10L, ts("2024-01-03 10:00:00"), "purchase"),
      // u2: purchase with no touches at all
      (4L, 20L, ts("2024-01-05 10:00:00"), "purchase"),
      // u3: touch 8 days before conversion — outside the 7-day lookback
      (5L, 30L, ts("2024-01-01 00:00:00"), "view"),
      (6L, 30L, ts("2024-01-09 01:00:00"), "purchase"),
      // u4: two touches at the SAME instant — higher id wins last-touch
      (7L, 40L, ts("2024-02-01 09:00:00"), "view"),
      (8L, 40L, ts("2024-02-01 09:00:00"), "click"),
      (9L, 40L, ts("2024-02-01 10:00:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Eval.attribution(ev, "user_id", "ts", "event_id",
        "event_type", col("event_type").isin("view", "click"),
        col("event_type") === "purchase", "7 DAYS")
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // last-touch: u1 -> click, u4 -> click (id 8 > id 7 at equal ts)
    assert(out("click") == (("click", 2L, 1.0, 2L)))
    // linear: u1 view 0.5 + u4 view 0.5 = 1.0; u3's view never matches
    assert(out("view") == (("view", 0L, 1.0, 2L)))
    // u2 (no touches) and u3 (touch out of window) fall to (none)
    assert(out("(none)") == (("(none)", 2L, 0.0, 0L)))
    assert(out.values.map(_._2).sum == 4L) // credit reconciles to convs
  }

  test("ebShrinkage: every rate pulls toward the mean, small-n keys pull " +
      "hardest, degenerate spread falls back to raw") {
    // users with identical raw rate 0.5 at n=2 vs n=100, plus extremes
    val rows =
      Seq.fill(1)(("tiny", true)) ++ Seq.fill(1)(("tiny", false)) ++
      (1 to 50).map(_ => ("big", true)) ++ (1 to 50).map(_ => ("big", false)) ++
      (1 to 10).map(_ => ("low", false)) ++
      (1 to 10).map(_ => ("high", true))
    val df = rows.toDF("k", "c")
    val out = Eval.ebShrinkage(df, "k", col("c"))
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val m = 0.5 // rates are {0.5, 0.5, 0.0, 1.0} -> mean 0.5
    def shrunk(k: String) = out(k).getAs[Double]("shrunk_rate")
    def raw(k: String) = out(k).getAs[Double]("raw_rate")
    // pull toward the mean, never past it
    assert(shrunk("low") > raw("low") && shrunk("low") < m)
    assert(shrunk("high") < raw("high") && shrunk("high") > m)
    // same raw rate: the small-n key ends closer to its prior-dominated
    // value but both sit AT the mean here (raw == m -> no movement)
    assert(shrunk("tiny") == 0.5 && shrunk("big") == 0.5)
    // degenerate spread: all keys identical -> v = 0 -> raw passthrough
    val flat = (1 to 4).flatMap(i =>
      Seq((s"u$i", true), (s"u$i", false))).toDF("k", "c")
    val f = Eval.ebShrinkage(flat, "k", col("c")).collect().head
    assert(f.getAs[Double]("shrunk_rate") == 0.5 &&
      f.isNullAt(f.fieldIndex("alpha")))
  }

  test("classificationReport: per-class P/R/F1, never-predicted class " +
      "reports NULL precision and zero recall") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),   // a: support 3, tp 2
      ("b", "b"), ("b", "a"),               // b: support 2, tp 1
      ("c", "a")                            // c: never predicted
    ).toDF("gold", "pred")
    val out = Eval.classificationReport(df, "gold", "pred")
      .collect().map(r => r.getAs[String]("clazz") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("support") == 3L && a.getAs[Long]("tp") == 2L)
    assert(a.getAs[Long]("pred_n") == 4L) // predicted a for 4 rows
    assert(a.getAs[Double]("precision") == 0.5)
    assert(a.getAs[Double]("recall") == 0.666667)
    val b = out("b")
    assert(b.getAs[Double]("precision") == 0.5 &&
      b.getAs[Double]("recall") == 0.5 && b.getAs[Double]("f1") == 0.5)
    val c = out("c")
    assert(c.isNullAt(c.fieldIndex("precision")))
    assert(c.getAs[Double]("recall") == 0.0)
    assert(c.isNullAt(c.fieldIndex("f1")))
  }

  test("nelsonAalen: hand-computed hazard increments and variance; " +
      "censored-only durations drop") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (10L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (10L, ts("2024-01-01 01:00:00"), "buy", 100.0),  // event at t=1
      (20L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (20L, ts("2024-01-01 02:00:00"), "view", 0.0),   // censored at t=2
      (30L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (30L, ts("2024-01-01 01:00:00"), "buy", 100.0)   // event at t=1
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Eval.nelsonAalen(ev, "user_id", "ts",
        col("event_type") === "buy")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    // only t=1 has events: risk set 3, d=2 -> H = 2/3, var = 2/9
    assert(out.toSeq == Seq((1L, 3L, 2L, 0L, 0.666667, 0.222222)))
  }

  test("rfmSegments: tercile grid separates the champion / mid / lapsed " +
      "archetypes") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    val ev = (Seq(8, 9, 10).map(d => (1L, ts(d), "purchase", 100.0)) ++
      Seq(4, 5).map(d => (2L, ts(d), "purchase", 100.0)) ++
      Seq((3L, ts(0), "purchase", 100.0)) ++
      Seq((1L, ts(10), "view", 0.0))) // non-purchase noise ignored
      .toDF("user_id", "ts", "event_type", "value")
    val out = Eval.rfmSegments(ev, "user_id", "ts",
        col("event_type") === "purchase", "value")
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // A: recency 0 freq 3 monetary 300 -> 333; B: 5/2/200 -> 222;
    // C: 10/1/100 -> 111
    assert(out.keySet == Set(333, 222, 111))
    assert(out(333) == ((333, 1L, 0.0, 3.0, 300.0)))
    assert(out(222) == ((222, 1L, 5.0, 2.0, 200.0)))
    assert(out(111) == ((111, 1L, 10.0, 1.0, 100.0)))
  }

  test("conformal: hand-checked order statistic, tie covered, guard") {
    // train (split 0): group g mean = 10; cal (split 1): residuals 1,2,4
    // alpha=0.5 -> k = ceil(4*0.5) = 2 -> q_hat = 2nd smallest = 2.0
    // test (split 2): residuals 1.5 (in), 2.0 (tie, in), 3.0 (out)
    val df = Seq(
      (1L, "g", 10.0, 0), (2L, "g", 10.0, 0),
      (3L, "g", 11.0, 1), (4L, "g", 12.0, 1), (5L, "g", 14.0, 1),
      (6L, "g", 11.5, 2), (7L, "g", 12.0, 2), (8L, "g", 13.0, 2),
      // a group absent from train must drop from cal/test entirely
      (9L, "h", 99.0, 2)
    ).toDF("id", "grp", "value", "split")
    val r = Eval.conformal(df, "id", "grp", "value", "split", alpha = 0.5)
      .collect().head
    assert(r.getAs[Long]("n_cal") == 3L)
    assert(r.getAs[Long]("n_test") == 3L)
    assert(r.getAs[Double]("q_hat") == 2.0)
    assert(r.getAs[Double]("coverage") == 0.666667)
    assert(r.getAs[Boolean]("covered"))
    intercept[IllegalArgumentException] {
      Eval.conformal(df, "id", "grp", "value", "split", alpha = 1.0)
    }
  }

  test("upliftBands: quantile bands partition users top-down, counts and " +
      "rates match a hand fold, qini matches the closed form per band") {
    // 40 users, score = user_id, conversion for even ids
    val df = (1L to 40L).map(u => (u, if (u % 2 == 0) 1 else 0, u.toDouble))
      .toDF("user", "cf", "sc")
    val out = Eval.upliftBands(df, "user", col("cf") === 1,
        max(col("sc")), bands = 4)
      .as[(Int, Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect()
    // independent fold: arms from the same hash, banding replicated with
    // the known quantile cuts of 1..40 (10.75 / 20.5 / 30.25)
    val arms = df.select(col("user"),
        (graft.ops.Gen.u01(col("user"), 59L) > 0.5).as("t"))
      .as[(Long, Boolean)].collect().toMap
    def band(u: Long): Int =
      4 - Seq(10.75, 20.5, 30.25).count(c => u.toDouble > c)
    val byBand = (1L to 40L).groupBy(band)
    var (cnt, cnc, cct, ccc) = (0L, 0L, 0L, 0L)
    for (b <- 1 to 4) {
      val us = byBand(b)
      val (tr, ct) = us.partition(arms)
      val row = out.find(_._1 == b).get
      assert(row._2 == tr.size && row._3 == ct.size)
      assert(row._4 == tr.count(_ % 2 == 0) && row._5 == ct.count(_ % 2 == 0))
      cnt += tr.size; cnc += ct.size
      cct += tr.count(_ % 2 == 0); ccc += ct.count(_ % 2 == 0)
      val qini = BigDecimal(cct - ccc * (cnt.toDouble / cnc))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row._9.contains(qini))
    }
    assert(out.map(r => r._2 + r._3).sum == 40L)
  }

  test("seasonalStrength: pure weekday signal scores 1, flat series " +
      "degenerates to NULL strength") {
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    val pure = (0 until 21).map { i =>
      val d = d0.plusDays(i.toLong)
      (java.sql.Date.valueOf(d), 700.0 + (d.toEpochDay % 7).toDouble)
    }.toDF("d", "v")
    val p = Eval.seasonalStrength(pure, col("d"), "v").collect().head
    assert(p.getAs[Long]("n_days") == 15L) // 21 minus 3-day edges
    assert(p.getAs[Double]("var_residual") == 0.0)
    assert(p.getAs[Double]("seasonal_strength") == 1.0)
    val flat = (0 until 21).map(i =>
      (java.sql.Date.valueOf(d0.plusDays(i.toLong)), 5.0)).toDF("d", "v")
    val f = Eval.seasonalStrength(flat, col("d"), "v").collect().head
    assert(f.isNullAt(f.fieldIndex("seasonal_strength")))
  }

  test("logRank: identical arm curves score zero, early-vs-late events " +
      "replay the closed form on the lattice") {
    val M = 2147483647L
    def u01(key: Long, c: Long): Double = {
      val h1 = (key + c * 1000003L) % M
      (((h1 * 48271L % M) * 48271L % M) + 1).toDouble / M
    }
    val arm = (1L to 50L).map(u => u -> (u01(u, 59L) > 0.5)).toMap
    val tIds = (1L to 50L).filter(arm).take(2)
    val cIds = (1L to 50L).filterNot(arm).take(2)
    def ts(h: Long) = new java.sql.Timestamp(1700000000000L + h * 3600000L)
    // symmetric: each arm has one 1-hour event and one 2-hour censor
    val sym = Seq(
      (tIds(0), ts(0), "s"), (tIds(0), ts(1), "purchase"),
      (cIds(0), ts(0), "s"), (cIds(0), ts(1), "purchase"),
      (tIds(1), ts(0), "s"), (tIds(1), ts(2), "s"),
      (cIds(1), ts(0), "s"), (cIds(1), ts(2), "s"))
      .toDF("user_id", "ts", "event_type")
    val s = Eval.logRank(sym, "user_id", "ts",
      col("event_type") === "purchase").collect().head
    assert(s.getAs[Long]("n_treat") == 2L && s.getAs[Long]("n_ctrl") == 2L)
    assert(s.getAs[Double]("observed_minus_expected") == 0.0)
    assert(s.getAs[Double]("chi2") == 0.0)
    // treated events at 1h, control at 10h: om = 1, V = 1/3
    val asym = Seq(
      (tIds(0), ts(0), "s"), (tIds(0), ts(1), "purchase"),
      (tIds(1), ts(0), "s"), (tIds(1), ts(1), "purchase"),
      (cIds(0), ts(0), "s"), (cIds(0), ts(10), "purchase"),
      (cIds(1), ts(0), "s"), (cIds(1), ts(10), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val a = Eval.logRank(asym, "user_id", "ts",
      col("event_type") === "purchase").collect().head
    assert(a.getAs[Double]("observed_minus_expected") == 1.0)
    assert(a.getAs[Double]("variance") == 0.333333)
    assert(a.getAs[Double]("chi2") == 3.000003) // 1 / 0.333333
  }

  test("mrrAtK: first hit at rank 2 scores 0.5, relevance outside k " +
      "scores 0 with NULL rank, success tracks any hit") {
    val rows = Seq(
      // g1: relevant at predicted rank 2
      ("g1", 1L, 9.0, 0), ("g1", 2L, 8.0, 1), ("g1", 3L, 7.0, 1),
      // g2: only relevant item sits at rank 4 — outside k=3
      ("g2", 1L, 9.0, 0), ("g2", 2L, 8.0, 0), ("g2", 3L, 7.0, 0),
      ("g2", 4L, 6.0, 1)).toDF("g", "id", "s", "r")
    val out = Eval.mrrAtK(rows, "g", "id", "s", col("r") === 1, k = 3)
      .as[(String, Option[Int], Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("g1") == (("g1", Some(2), 0.5, true)))
    assert(out("g2") == (("g2", None, 0.0, false)))
  }

  test("diffInDiff: cell means replay the hash-arm fold and DiD nets " +
      "out the common shift") {
    val M = 2147483647L
    def u01(key: Long, c: Long): Double = {
      val h1 = (key + c * 1000003L) % M
      (((h1 * 48271L % M) * 48271L % M) + 1).toDouble / M
    }
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 09:00:00")
    // every user: pre value 10+u%3, post value 30+u%3 (common +20 shift,
    // no true effect) -> did must be exactly 0
    val rows = (1L to 40L).flatMap { u =>
      Seq((u, ts(5), 10.0 + (u % 3)), (u, ts(25), 30.0 + (u % 3)))
    }.toDF("user_id", "ts", "value")
    val out = Eval.diffInDiff(rows, "user_id", "ts", "value",
      cutoff = "2024-01-15").collect().head
    val byArm = (1L to 40L).groupBy(u => u01(u, 59L) > 0.5)
    def m(us: Seq[Long], off: Double) = BigDecimal(
        us.map(u => off + (u % 3)).sum / us.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Long]("n_treat_pre") == byArm(true).size.toLong)
    assert(out.getAs[Double]("mean_ctrl_pre") == m(byArm(false), 10.0))
    assert(out.getAs[Double]("mean_treat_post") == m(byArm(true), 30.0))
    assert(out.getAs[Double]("did") == 0.0)
  }

  test("psmAtt: nearest in-caliper control wins, out-of-caliper treated " +
      "unmatched, naive and matched contrasts replay the closed form") {
    val M = 2147483647L
    def u01(key: Long, c: Long): Double = {
      val h1 = (key + c * 1000003L) % M
      (((h1 * 48271L % M) * 48271L % M) + 1).toDouble / M
    }
    val arm = (1L to 50L).map(u => u -> (u01(u, 59L) > 0.5)).toMap
    val tIds = (1L to 50L).filter(arm).take(2)
    val cIds = (1L to 50L).filterNot(arm).take(2)
    // treated A score .01/outcome 6; controls at .011 (outcome 6.6, the
    // nearest) and .013 (7.8); treated B at .5 has no in-caliper control
    val rows = Seq(
      (tIds(0), "purchase", 6.0), (tIds(1), "purchase", 300.0),
      (cIds(0), "purchase", 6.6), (cIds(1), "purchase", 7.8))
      .toDF("user_id", "event_type", "value")
    val out = Eval.psmAtt(rows, "user_id",
      least(avg(col("value")) / 600.0, lit(1.0)),
      sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(0.0)),
      caliper = 0.02).collect().head
    assert(out.getAs[Long]("n_treated") == 2L)
    assert(out.getAs[Long]("n_matched") == 1L)
    assert(out.getAs[Double]("match_rate") == 0.5)
    assert(out.getAs[Double]("att") == -0.6) // 6.0 - 6.6
    assert(out.getAs[Double]("naive_diff") == 145.8) // 153 - 7.2
  }

  test("growthAccounting: ledger identity holds, churn lands one week " +
      "forward, trailing churn week appears, resurrection needs a gap") {
    def t(d: String) = java.sql.Timestamp.valueOf(s"2024-01-$d 10:00:00")
    // u1: W1,W2,W4 ; u2: W1 only ; u3: W3 only (weeks start Mon 01-01)
    val rows = Seq((1L, t("02")), (1L, t("10")), (1L, t("23")),
      (2L, t("03")), (3L, t("17"))).toDF("user_id", "ts")
    val out = Eval.growthAccounting(rows, "user_id", "ts")
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Long)].collect()
    def wk(d: String) = java.sql.Date.valueOf(s"2024-01-$d")
    assert(out.toSeq == Seq(
      (wk("01"), 2L, 2L, 0L, 0L, 0L, 2L), // W1: both new
      (wk("08"), 1L, 0L, 1L, 0L, 1L, -1L), // u1 retained, u2 churned in
      (wk("15"), 1L, 1L, 0L, 0L, 1L, 0L), // u3 new, u1 churned in
      (wk("22"), 1L, 0L, 0L, 1L, 1L, 0L), // u1 resurrected, u3 churned
      (wk("29"), 0L, 0L, 0L, 0L, 1L, -1L))) // trailing: u1 churns
    // ledger identity: delta active == net growth, week over week
    out.sliding(2).foreach { case Array(p, c) =>
      assert(c._2 - p._2 == c._7, s"identity at ${c._1}")
    }
  }

  test("crossCorrelation: an exact 2-step shift peaks at lag -2 with " +
      "full pair count, output covers every requested lag") {
    val x = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8).map(_.toDouble)
    val rows = (1 to 12).map { d =>
      (d, x(d - 1), if (d >= 3) x(d - 3) else 0.0) // y_t = x_{t-2}
    }.toDF("day", "x", "y")
    val out = graft.ops.Stats.crossCorrelation(rows, col("day"),
        avg(col("x")), avg(col("y")), maxLag = 3)
      .as[(Int, Option[Double], Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == (-3 to 3).toSet)
    assert(out(-2)._2.contains(1.0) && out(-2)._3 == 10L)
    assert(out(0)._2.exists(c => math.abs(c) < 1.0))
  }

  test("pinballLoss: asymmetric closed form at q=0.5/0.9, lag rows drop, " +
      "losses ride the lattice") {
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate
      .of(2024, 1, i))
    val rows = Seq((d(1), 10.0), (d(2), 20.0), (d(3), 15.0), (d(4), 5.0))
      .toDF("day", "v")
    val out = Eval.pinballLoss(rows, col("day"), "v",
        Seq(0.5, 0.9), season = 1)
      .as[(Double, Long, Double)].collect().map(r => r._1 -> r).toMap
    // forecasts (lag 1): 10, 20, 15 -> diffs +10, -5, -10
    assert(out(0.5) == ((0.5, 3L, 4.166667))) // (5 + 2.5 + 5)/3
    assert(out(0.9) == ((0.9, 3L, 3.5))) // (9 + 0.5 + 1)/3
    intercept[IllegalArgumentException] {
      Eval.pinballLoss(rows, col("day"), "v", Seq(1.5))
    }
  }

  test("removalAttribution: closed-form removal effects on a DAG chain, " +
      "no-impact channel earns zero, roster drift fails loud") {
    // u1: view,click,purchase ; u2: view,error(lost) ; u3: click,purchase
    val rows = Seq((1L, 1, 1L, "view"), (1L, 2, 2L, "click"),
      (1L, 3, 3L, "purchase"), (2L, 1, 4L, "view"), (2L, 2, 5L, "error"),
      (3L, 1, 6L, "click"), (3L, 2, 7L, "purchase"))
      .toDF("u", "t", "id", "s")
    val out = Eval.removalAttribution(rows, "u", "t", "id", "s",
        convState = "purchase", channels = Seq("click", "error", "view"))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // P_full = 2/3; removing click kills all paths, view half, error none
    assert(out("click") == (("click", 0.666667, 0.0, 1.0, 0.666667)))
    assert(out("view") == (("view", 0.666667, 0.333333, 0.5, 0.333333)))
    assert(out("error") == (("error", 0.666667, 0.666667, 0.0, 0.0)))
    intercept[IllegalArgumentException] {
      Eval.removalAttribution(rows, "u", "t", "id", "s",
        convState = "purchase", channels = Seq("click", "view")).collect()
    }
  }

  test("offPolicyEval: DM/IPS/SNIPS/DR match the closed form, unlogged " +
      "target action takes rhat 0, zero-match log yields NULL SNIPS") {
    // n=4, na(A)=na(B)=2, rhat(A)=15, rhat(B)=75, n/na=2
    val log = Seq(("A", 10.0, "A"), ("A", 20.0, "A"),
      ("B", 100.0, "A"), ("B", 50.0, "B")).toDF("a", "r", "pi")
    val out = Eval.offPolicyEval(log, "a", "r", "pi").collect().head
    assert(out.getAs[Long]("n_logged") == 4L)
    assert(out.getAs[Double]("match_rate") == 0.75)
    assert(out.getAs[Double]("dm") == 30.0) // (15+15+15+75)/4
    assert(out.getAs[Double]("ips") == 40.0) // (20+40+0+100)/4
    assert(out.getAs[Double]("snips") == 26.666667) // 160/6
    assert(out.getAs[Double]("dr") == 17.5) // (5+25+15+25)/4
    // target action never logged: DM term 0, weight 0
    val out2 = Eval.offPolicyEval(
      Seq(("A", 10.0, "C"), ("A", 30.0, "C")).toDF("a", "r", "pi"),
      "a", "r", "pi").collect().head
    assert(out2.getAs[Double]("dm") == 0.0)
    assert(out2.getAs[Double]("ips") == 0.0)
    assert(out2.isNullAt(out2.fieldIndex("snips"))) // Σw = 0
    assert(out2.getAs[Double]("dr") == 0.0)
  }

  test("sampleRatioCheck: hash arms on 200 users pass the 0.001 alarm; " +
      "a deliberately wrong declared ratio trips it") {
    import graft.ops.Gen
    val ids = (1L to 200L)
    val df = ids.flatMap(id => Seq((id, 1.0), (id, 2.0)))
      .toDF("user_id", "value")
    val arms = ids.map(_ -> false).toDF("user_id", "x")
      .select(col("user_id"), (Gen.u01(col("user_id"), 59L) > 0.5)
        .as("t")).collect().count(_.getBoolean(1))
    val r = Eval.sampleRatioCheck(df, "user_id").collect().head
    assert(r.getAs[Long]("n_treat") == arms.toLong)
    assert(r.getAs[Long]("n_treat") + r.getAs[Long]("n_ctrl") == 200L)
    val (t, c) = (r.getAs[Long]("n_treat").toDouble,
      r.getAs[Long]("n_ctrl").toDouble)
    val chi2 = (t - 100.0) * (t - 100.0) / 100.0 +
      (c - 100.0) * (c - 100.0) / 100.0
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("chi2") == r6(chi2))
    assert(!r.getAs[Boolean]("srm_alarm"))
    // declare 95/5 against a ~50/50 reality: alarm
    val w = Eval.sampleRatioCheck(df, "user_id",
      expectedTreatShare = 0.95).collect().head
    assert(w.getAs[Boolean]("srm_alarm"))
  }

  test("tostEquivalence: near-identical arms prove equivalence within " +
      "the margin; a planted 90-dollar gap fails the upper side") {
    import graft.ops.Gen
    val ids = (1L to 200L)
    val arms = ids.map(_ -> false).toDF("user_id", "x")
      .select(col("user_id"), (Gen.u01(col("user_id"), 59L) > 0.5)
        .as("t")).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    def mk(base: Long => Double) =
      ids.map(id => (id, base(id) + (if (id % 2 == 0) 1.0 else -1.0)))
        .toDF("user_id", "value")
    val same = mk(_ => 10.0)
    val r = Eval.tostEquivalence(same, "user_id", "value", margin = 5.0)
      .collect().head
    assert(math.abs(r.getAs[Double]("mean_diff")) < 1.0)
    assert(r.getAs[Boolean]("equivalent"))
    assert(r.getAs[Double]("z_lower") > 0 && r.getAs[Double]("z_upper") > 0)
    val shifted = mk(id => if (arms(id)) 100.0 else 10.0)
    val s = Eval.tostEquivalence(shifted, "user_id", "value", margin = 5.0)
      .collect().head
    assert(s.getAs[Double]("mean_diff") > 80.0)
    assert(!s.getAs[Boolean]("equivalent"))
    assert(s.getAs[Double]("z_upper") < 0)
  }

  test("permutationTest: a planted massive effect hits the add-one " +
      "floor 1/65; exchangeable data returns p = 1") {
    import graft.ops.Gen
    val ids = (1L to 200L)
    val arms = ids.map(_ -> false).toDF("user_id", "x")
      .select(col("user_id"), (Gen.u01(col("user_id"), 59L) > 0.5)
        .as("t")).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val planted = ids.map(id =>
      (id, if (arms(id)) 1000.0 else 10.0)).toDF("user_id", "value")
    val r = Eval.permutationTest(planted, "user_id", "value")
      .collect().head
    assert(r.getAs[Long]("n_users") == 200L)
    assert(r.getAs[Double]("obs_diff") == 990.0)
    // no hash re-randomization can match the aligned split: p = 1/65
    assert(r.getAs[Long]("n_geq") == 0L)
    assert(r.getAs[Double]("perm_p") == 0.015385)
    // constant outcome: every permutation ties the observed 0 -> p = 1
    val flat = ids.map(id => (id, 50.0)).toDF("user_id", "value")
    val f = Eval.permutationTest(flat, "user_id", "value").collect().head
    assert(f.getAs[Double]("obs_diff") == 0.0)
    assert(f.getAs[Long]("n_geq") == 64L)
    assert(f.getAs[Double]("perm_p") == 1.0)
  }

  test("quantileTreatmentEffects: planted uniform +5 shift appears at " +
      "every decile; null data gives qte 0 rows") {
    import graft.ops.Gen
    val ids = (1L to 60L)
    val arms = ids.map(_ -> false).toDF("user_id", "x")
      .select(col("user_id"), (Gen.u01(col("user_id"), 59L) > 0.5)
        .as("t")).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // each user contributes values 1..5; treated users shifted +5
    val rows = ids.flatMap { id =>
      val lift = if (arms(id)) 5.0 else 0.0
      (1 to 5).map(v => (id, v.toDouble + lift))
    }
    val df = rows.toDF("user_id", "value")
    val r = Eval.quantileTreatmentEffects(df, "user_id", "value")
      .collect()
    assert(r.length == 9)
    assert(r.map(_.getAs[Int]("decile")).toSeq == (1 to 9))
    // identical within-arm distributions shifted by +5: every decile
    // gap is exactly 5
    r.foreach(x => assert(x.getAs[Double]("qte") == 5.0))
    // no shift: every gap 0
    val flat = ids.flatMap(id => (1 to 5).map(v => (id, v.toDouble)))
      .toDF("user_id", "value")
    Eval.quantileTreatmentEffects(flat, "user_id", "value").collect()
      .foreach(x => assert(x.getAs[Double]("qte") == 0.0))
  }

  test("eventStudy: pre-period att is exactly 0 under parallel trends " +
      "and the post-period att recovers the planted lift") {
    import graft.ops.Gen
    val ids = (1L to 40L)
    val arms = ids.map(_ -> false).toDF("user_id", "dummy")
      .select(col("user_id"), (Gen.u01(col("user_id"), 59L) > 0.5)
        .as("t")).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(arms.values.exists(identity) && arms.values.exists(!_))
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val rows = ids.flatMap { id =>
      val lift = if (arms(id)) 5.0 else 0.0
      Seq((id, ts(10), 10.0), (id, ts(20), 10.0 + lift))
    }
    val df = rows.toDF("user_id", "ts", "value")
    val r = Eval.eventStudy(df, "user_id", "ts", "value", "2024-01-15")
      .collect().map(x => x.getAs[Int]("rel_day") -> x).toMap
    assert(r.keySet == Set(-5, 5))
    assert(r(-5).getAs[Double]("att") == 0.0)
    assert(r(-5).getAs[Double]("gap") == 0.0)
    assert(r(5).getAs[Double]("att") == 5.0)
    assert(r(5).getAs[Long]("n_treat") + r(5).getAs[Long]("n_ctrl") == 40L)
  }

  test("competingRisks: hand-computed Aalen-Johansen CIFs; the " +
      "same-hour tie elects event A; S + CIF_a + CIF_b = 1 throughout") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val rows = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "purchase"),
      (2L, ts(0), "view"), (2L, ts(1), "error"),
      (3L, ts(0), "view"), (3L, ts(2), "view"), // censored at 2h
      (4L, ts(0), "view"), (4L, ts(3), "purchase"),
      (5L, ts(0), "view"), (5L, ts(1), "purchase"), (5L, ts(1), "error"))
    val df = rows.toDF("user_id", "ts", "event_type")
    val r = Eval.competingRisks(df, "user_id", "ts",
      col("event_type") === "purchase", col("event_type") === "error")
      .collect()
    assert(r.length == 2)
    val t1 = r(0)
    assert(t1.getAs[Long]("t_hours") == 1L)
    assert(t1.getAs[Long]("n_risk") == 5L)
    assert(t1.getAs[Long]("d_a") == 2L && t1.getAs[Long]("d_b") == 1L)
    assert(t1.getAs[Double]("survival_allcause") == 0.4)
    assert(t1.getAs[Double]("cif_a") == 0.4)
    assert(t1.getAs[Double]("cif_b") == 0.2)
    val t3 = r(1)
    assert(t3.getAs[Long]("t_hours") == 3L)
    assert(t3.getAs[Long]("n_risk") == 1L)
    assert(t3.getAs[Double]("survival_allcause") == 0.0)
    assert(t3.getAs[Double]("cif_a") == 0.8)
    assert(t3.getAs[Double]("cif_b") == 0.2)
  }

  test("fisherExact: tea-tasting 3/1/1/3 table scores the textbook " +
      "p=0.485714; a strongly associated table is significant; " +
      "over-wide support fails loud with the chi2 pointer") {
    import spark.implicits._
    def mk(a: Int, b: Int, c: Int, d: Int) = (
      (1 to a).map(i => (i.toLong, 1, 1)) ++
        (1 to b).map(i => (1000L + i, 1, 0)) ++
        (1 to c).map(i => (2000L + i, 0, 1)) ++
        (1 to d).map(i => (3000L + i, 0, 0))).toDF("u", "e", "o")
    val r = graft.ops.Eval.fisherExact(mk(3, 1, 1, 3), "u",
      col("e") === 1, col("o") === 1).collect().head
    assert(r.getAs[Double]("p_two_sided") == 0.485714)
    assert(r.getAs[Double]("p_left") == 0.985714)
    assert(r.getAs[Double]("p_right") == 0.242857)
    assert(r.getAs[Double]("odds_ratio") == 9.0)
    val s = graft.ops.Eval.fisherExact(mk(10, 2, 3, 15), "u",
      col("e") === 1, col("o") === 1).collect().head
    assert(s.getAs[Double]("p_two_sided") == 0.000537)
    assert(s.getAs[Double]("p_right") == 0.000465)
    intercept[Exception] {
      graft.ops.Eval.fisherExact(mk(5, 5, 5, 5), "u",
        col("e") === 1, col("o") === 1, maxTerms = 4).collect()
    }
  }

  test("coxScore: hand-computed Breslow-tie case (U=0.25, V=2.020833, " +
      "z=0.175863); a covariate-free design scores U=0 terms") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00")
    val rows = Seq(
      (1L, t(0), "view"), (1L, t(1), "purchase"),
      (2L, t(0), "view"), (2L, t(2), "view"), (2L, t(3), "purchase"),
      (3L, t(0), "view"), (3L, t(5), "view"),
      (4L, t(0), "view"), (4L, t(1), "view"), (4L, t(2), "view"),
      (4L, t(3), "purchase")).toDF("user_id", "ts", "event_type")
    val r = graft.ops.Eval.coxScore(rows, "user_id", "ts",
      col("event_type") === "purchase", count(lit(1))).collect().head
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Double]("score_u") == 0.25)
    assert(r.getAs[Double]("variance") == 2.020833)
    assert(r.getAs[Double]("z") == 0.175863)
    // constant covariate: every U term is s_t - d_t*x = 0 and V = 0
    val c = graft.ops.Eval.coxScore(rows, "user_id", "ts",
      col("event_type") === "purchase", lit(7L)).collect().head
    assert(c.getAs[Double]("score_u") == 0.0)
    assert(c.isNullAt(c.fieldIndex("z")))
  }

  test("coxScore survives wide-lattice covariates that overflow a long " +
      "sum (round-12 decimal-container audit)") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00")
    // covariates ~3e9: the per-duration information term vT·1e6 is
    // ~1e19 > Long.MaxValue, so the pre-fix long SUM container wrapped
    // (or threw under ANSI); the decimal(38,0) container must fold it
    // exactly and produce a finite z
    val big = 3000000000L
    val rows = Seq(
      (1L, t(0), "view", big), (1L, t(1), "purchase", big),
      (2L, t(0), "view", 0L), (2L, t(2), "purchase", 0L),
      (3L, t(0), "view", big), (3L, t(3), "purchase", big),
      (4L, t(0), "view", 0L), (4L, t(4), "view", 0L))
      .toDF("user_id", "ts", "event_type", "x")
    val r = graft.ops.Eval.coxScore(rows, "user_id", "ts",
      col("event_type") === "purchase", max(col("x"))).collect().head
    assert(r.getAs[Long]("n_events") == 3L)
    val z = r.getAs[Double]("z")
    assert(!z.isNaN && !z.isInfinite, s"z=$z")
    val v = r.getAs[Double]("variance")
    assert(v > 0, s"variance=$v")
  }

  test("fleissKappa: hand case kappa=0.55, perfect agreement kappa=1, " +
      "incomplete panel fails loud, off-roster category fails loud") {
    import spark.implicits._
    val r3 = Seq(("u1", "a"), ("u1", "a"), ("u1", "a"),
      ("u2", "a"), ("u2", "b"), ("u2", "b"),
      ("u3", "b"), ("u3", "b"), ("u3", "b")).toDF("u", "c")
    val r = graft.ops.Eval.fleissKappa(r3, "u", "c", 3, Seq("a", "b"))
      .collect().head
    assert(r.getAs[Long]("n_units") == 3L)
    assert(r.getAs[Double]("p_bar") == 0.777778)
    assert(r.getAs[Double]("p_e") == 0.506173)
    assert(r.getAs[Double]("fleiss_kappa") == 0.55)
    val perfect = Seq(("u1", "a"), ("u1", "a"), ("u1", "a"),
      ("u2", "b"), ("u2", "b"), ("u2", "b")).toDF("u", "c")
    assert(graft.ops.Eval.fleissKappa(perfect, "u", "c", 3,
      Seq("a", "b")).collect().head.getAs[Double]("fleiss_kappa") == 1.0)
    val incomplete = Seq(("u1", "a"), ("u1", "a"), ("u2", "b"))
      .toDF("u", "c")
    intercept[Exception] {
      graft.ops.Eval.fleissKappa(incomplete, "u", "c", 3, Seq("a", "b"))
        .collect()
    }
    intercept[Exception] {
      graft.ops.Eval.fleissKappa(r3, "u", "c", 3, Seq("a", "x"))
        .collect()
    }
  }

  test("krippendorffAlpha: hand case alpha=0.444444 with a <2-rating " +
      "unit dropped; unanimous panel scores alpha=1") {
    import spark.implicits._
    val df = Seq(("u1", "a"), ("u1", "a"), ("u2", "a"), ("u2", "b"),
      ("u3", "b"), ("u3", "b"), ("u4", "b")).toDF("u", "c")
    val r = graft.ops.Eval.krippendorffAlpha(df, "u", "c", Seq("a", "b"))
      .collect().head
    assert(r.getAs[Long]("n_units") == 3L)
    assert(r.getAs[Long]("n_ratings") == 6L)
    assert(r.getAs[Double]("d_observed") == 0.333333)
    assert(r.getAs[Double]("d_expected") == 0.6)
    assert(r.getAs[Double]("kripp_alpha") == 0.444444)
    val unan = Seq(("u1", "a"), ("u1", "a"), ("u2", "b"), ("u2", "b"))
      .toDF("u", "c")
    assert(graft.ops.Eval.krippendorffAlpha(unan, "u", "c",
      Seq("a", "b")).collect().head.getAs[Double]("kripp_alpha") == 1.0)
  }

  test("mantelHaenszel: hand-computed two-stratum case (chi2, MH OR, " +
      "RBG CI, crude OR); a single-unit stratum contributes zero " +
      "variance instead of dividing by zero") {
    import spark.implicits._
    // stratum 1: a=4 b=1 c=2 d=3; stratum 2: a=3 b=2 c=1 d=4
    val rows =
      Seq.fill(4)(("s1", 1, 1)) ++ Seq.fill(1)(("s1", 1, 0)) ++
      Seq.fill(2)(("s1", 0, 1)) ++ Seq.fill(3)(("s1", 0, 0)) ++
      Seq.fill(3)(("s2", 1, 1)) ++ Seq.fill(2)(("s2", 1, 0)) ++
      Seq.fill(1)(("s2", 0, 1)) ++ Seq.fill(4)(("s2", 0, 0))
    val df = rows.toDF("s", "e", "o")
    val r = graft.ops.Eval.mantelHaenszel(df, "s",
      col("e") === 1, col("o") === 1).collect().head
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Long]("n_exposed_pos") == 7L)
    assert(r.getAs[Double]("cmh_chi2") == 1.687499)
    assert(r.getAs[Double]("mh_odds_ratio") == 6.0)
    assert(r.getAs[Double]("or_ci_lo") == 0.811703)
    assert(r.getAs[Double]("or_ci_hi") == 44.351182)
    assert(r.getAs[Double]("crude_odds_ratio") == 5.444444)
    // a 1-unit stratum: V-term guarded to 0, everything still finite
    val deg = (rows :+ (("s3", 1, 1))).toDF("s", "e", "o")
    val d = graft.ops.Eval.mantelHaenszel(deg, "s",
      col("e") === 1, col("o") === 1).collect().head
    assert(d.getAs[Long]("n_strata") == 3L)
    assert(!d.isNullAt(d.fieldIndex("mh_odds_ratio")))
  }

  test("poissonRateTest: hand-computed 8/100 vs 2/50 case (rate ratio " +
      "2, both z's, CI); an empty arm NULLs the estimates") {
    import spark.implicits._
    val df = (Seq.fill(8)(("pre", 1)) ++ Seq.fill(92)(("pre", 0)) ++
      Seq.fill(2)(("post", 1)) ++ Seq.fill(48)(("post", 0)))
      .toDF("g", "x")
    val r = graft.ops.Eval.poissonRateTest(df, col("g"), "pre", "post",
      col("x") === 1).collect().head
    assert(r.getAs[Long]("n_events_a") == 8L &&
      r.getAs[Long]("n_exposure_a") == 100L)
    assert(r.getAs[Double]("rate_ratio") == 2.0)
    assert(r.getAs[Double]("z_wald") == 0.87677)
    assert(r.getAs[Double]("z_conditional") == 0.894427)
    assert(r.getAs[Double]("rr_ci_lo") == 0.424714)
    assert(r.getAs[Double]("rr_ci_hi") == 9.418113)
    val empty = Seq(("pre", 1), ("pre", 0)).toDF("g", "x")
    val e = graft.ops.Eval.poissonRateTest(empty, col("g"), "pre",
      "post", col("x") === 1).collect().head
    assert(e.isNullAt(e.fieldIndex("rate_ratio")))
  }

  test("ivWald: LATE replays ITT_y/ITT_d on a constructed compliance " +
      "pattern; weak-instrument flag fires when arms behave alike") {
    import spark.implicits._
    val M = 2147483647L
    def u01(key: Long, c: Long): Double = {
      val h1 = (key + c * 1000003L) % M
      (((h1 * 48271L % M) * 48271L % M) + 1).toDouble / M
    }
    val arm = (1L to 60L).map(u => u -> (u01(u, 61L) > 0.5)).toMap
    // encouraged (z=1) users emit 30 events (heavy), others 5; heavy
    // users buy 10.00 twice, light users once -> d perfectly tracks z
    val rows = (1L to 60L).flatMap { u =>
      val heavy = arm(u)
      val n = if (heavy) 30 else 5
      val buys = if (heavy) 2 else 1
      (1 to n).map(i =>
        (u, if (i <= buys) "purchase" else "view",
          if (i <= buys) 10.0 else 0.0))
    }.toDF("user_id", "event_type", "value")
    val r = Eval.ivWald(rows, "user_id", count(lit(1)) >= 30L,
      sum(when(col("event_type") === "purchase",
        round(col("value") * 100, 0).cast("long")).otherwise(0L)))
      .collect().head
    val nT = arm.values.count(identity).toLong
    assert(r.getAs[Long]("n_z1") == nT)
    assert(r.getAs[Long]("n_z0") == 60L - nT)
    // first stage: p1=1, p0=0; ITT_y = 20 - 10; LATE = 10 exactly
    assert(r.getAs[Double]("treat_rate_z1") == 1.0)
    assert(r.getAs[Double]("treat_rate_z0") == 0.0)
    assert(r.getAs[Double]("first_stage") == 1.0)
    assert(r.getAs[Double]("itt") == 10.0)
    assert(r.getAs[Double]("late") == 10.0)
    assert(!r.getAs[Boolean]("weak_instrument"))
    // no arm-behavior link: first stage 0, LATE NULL, weak flag on
    val flat = (1L to 60L).map(u => (u, "purchase", 5.0))
      .toDF("user_id", "event_type", "value")
    val w = Eval.ivWald(flat, "user_id", count(lit(1)) >= 30L,
      sum(round(col("value") * 100, 0).cast("long"))).collect().head
    assert(w.getAs[Double]("first_stage") == 0.0)
    assert(w.isNullAt(w.fieldIndex("late")))
    assert(w.getAs[Boolean]("weak_instrument"))
  }

  test("oaxacaBlinder: hand-built lines decompose exactly — same slope " +
      "means the gap is pure endowment; slope shift shows up as the " +
      "coefficient part") {
    import spark.implicits._
    // A: y = 2x at x in {4,6} (mean x 5, mean y 10); B: y = 2x at
    // x in {1,3} (mean x 2, mean y 4). Same beta=2 -> gap 6 is ALL
    // endowment: beta_b*(5-2) = 6.
    val rows = Seq(("A", 4.0, 8.0), ("A", 6.0, 12.0),
      ("B", 1.0, 2.0), ("B", 3.0, 6.0)).toDF("g", "x", "y")
    val r = Eval.oaxacaBlinder(rows, "g", "A", "B", "x", "y")
      .collect().head
    assert(r.getAs[Double]("gap") == 6.0)
    assert(r.getAs[Double]("beta_a") == 2.0)
    assert(r.getAs[Double]("beta_b") == 2.0)
    assert(r.getAs[Double]("endowment_part") == 6.0)
    assert(r.getAs[Double]("coefficient_part") == 0.0)
    assert(r.getAs[Double]("endowment_share") == 1.0)
    // now steepen A's slope: y = 3x at the same x -> extra 5 on the
    // gap (mean_y_a 15): endowment still 6, coefficient picks up 5
    val rows2 = Seq(("A", 4.0, 12.0), ("A", 6.0, 18.0),
      ("B", 1.0, 2.0), ("B", 3.0, 6.0)).toDF("g", "x", "y")
    val r2 = Eval.oaxacaBlinder(rows2, "g", "A", "B", "x", "y")
      .collect().head
    assert(r2.getAs[Double]("gap") == 11.0)
    assert(r2.getAs[Double]("endowment_part") == 6.0)
    assert(r2.getAs[Double]("coefficient_part") == 5.0)
  }

  test("kleinbergBursts: a planted sustained surge is labeled exactly; " +
      "base days stay base despite the entry toll") {
    import spark.implicits._
    val start = java.time.LocalDate.parse("2024-03-01")
    // 20 days at 5 events/day, days 8-10 surge to 30
    val rows = (0 until 20).flatMap { d =>
      val n = if (d >= 7 && d <= 9) 30 else 5
      (1 to n).map(_ =>
        Tuple1(java.sql.Date.valueOf(start.plusDays(d.toLong))))
    }.toDF("d")
    val out = Eval.kleinbergBursts(rows, col("d"), s = 2.0, gamma = 0.5)
      .collect()
    assert(out.length == 20)
    val burstDays = out.filter(_.getAs[Int]("state") == 1)
      .map(_.getAs[java.sql.Date]("day").toLocalDate.getDayOfMonth).toSet
    assert(burstDays == Set(8, 9, 10))
    // lambda readouts: mean (17*5 + 3*30)/20 = 8.75, burst 17.5
    assert(out.head.getAs[Double]("lambda_base") == 8.75)
    assert(out.head.getAs[Double]("lambda_burst") == 17.5)
  }

  test("holtWinters: fitted values replay the sequential fold " +
      "bit-for-bit; the first day anchors level with zero residual") {
    import spark.implicits._
    val start = java.time.LocalDate.parse("2024-01-01")
    val vals = Seq(10.0, 12.0, 11.0, 15.0, 9.0, 14.0, 13.0, 16.0,
      12.0, 18.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(start.plusDays(i.toLong)), v) }
    val out = Eval.holtWinters(rows.toDF("d", "v"), col("d"), "v")
      .collect()
    // Scala replay of the identical fold (same IEEE ops, same order)
    var lvl = 0.0; var trd = 0.0; var n = 0
    val s = Array.fill(7)(0.0)
    val expect = rows.map { case (dt, v) =>
      val y = math.round(v * 100).toDouble / 100.0
      val slot = (((dt.toLocalDate.toEpochDay % 7) + 7) % 7).toInt
      val sp = s(slot)
      val fitted = if (n == 0) y else lvl + trd + sp
      val lvlN = if (n == 0) y else 0.25 * (y - sp) + 0.75 * (lvl + trd)
      val trdN = if (n == 0) 0.0 else 0.125 * (lvlN - lvl) + 0.875 * trd
      if (n > 0) s(slot) = 0.25 * (y - lvlN) + 0.75 * sp
      lvl = lvlN; trd = trdN; n += 1
      (dt, y, fitted)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.length == 10)
    out.zip(expect).foreach { case (row, (dt, y, f)) =>
      assert(row.getAs[java.sql.Date]("day") == dt)
      assert(row.getAs[Double]("actual") == r6(y))
      assert(row.getAs[Double]("fitted") == r6(f))
      assert(row.getAs[Double]("resid") == r6(y - f))
    }
    assert(out.head.getAs[Double]("resid") == 0.0)
    // forward readout: lvl + h*trd + s[slot] off the final fold state
    val fc = Eval.holtWintersForecast(rows.toDF("d", "v"), col("d"),
      "v", horizon = 3).collect()
    assert(fc.length == 3)
    fc.zipWithIndex.foreach { case (row, i) =>
      val h = i + 1
      val day = start.plusDays(9L + h)
      val slot = (((day.toEpochDay % 7) + 7) % 7).toInt
      assert(row.getAs[Int]("h") == h)
      assert(row.getAs[java.sql.Date]("day") ==
        java.sql.Date.valueOf(day))
      assert(row.getAs[Double]("forecast") ==
        r6(lvl + h.toDouble * trd + s(slot)))
    }
    intercept[IllegalArgumentException] {
      Eval.holtWinters(rows.toDF("d", "v"), col("d"), "v", alpha = 1.5)
    }
  }

  test("regDiscontinuity: a constructed jump at the cutoff is recovered " +
      "exactly; thin sides NULL out") {
    import spark.implicits._
    // left of 100: y = 10 flat; right: y = 30 flat -> tau = 20, zero
    // slopes; x values symmetric inside the +-50 bandwidth
    val rows = (1 to 20).map(i => (50.0 + 2.0 * i, 10.0)) ++
      (0 until 20).map(i => (100.0 + 2.0 * i, 30.0))
    val df = rows.toDF("x", "y")
    val r = Eval.regDiscontinuity(df, "x", col("y"),
      cutoff = 100.0, bandwidth = 50.0).collect().head
    assert(r.getAs[Long]("n_left") == 20L)
    assert(r.getAs[Long]("n_right") == 20L)
    assert(r.getAs[Double]("intercept_left") == 10.0)
    assert(r.getAs[Double]("intercept_right") == 30.0)
    assert(r.getAs[Double]("slope_left") == 0.0)
    assert(r.getAs[Double]("slope_right") == 0.0)
    assert(r.getAs[Double]("rdd_tau") == 20.0)
    // sloped but continuous: y = x -> intercepts meet at the cutoff
    val cont = (1 to 40).map(i => (75.0 + i.toDouble, 75.0 + i))
      .toDF("x", "y")
    val c = Eval.regDiscontinuity(cont, "x", col("y"), 100.0, 50.0)
      .collect().head
    assert(c.getAs[Double]("rdd_tau") == 0.0)
    assert(c.getAs[Double]("slope_left") == 1.0)
    // two points on a side: fit guarded NULL
    val thin = Seq((98.0, 1.0), (99.0, 2.0), (101.0, 1.0), (102.0, 2.0),
      (103.0, 3.0)).toDF("x", "y")
    val t = Eval.regDiscontinuity(thin, "x", col("y"), 100.0, 50.0)
      .collect().head
    assert(t.isNullAt(t.fieldIndex("intercept_left")))
    assert(t.isNullAt(t.fieldIndex("rdd_tau")))
  }

  test("syntheticControl: a donor tracking the treated pre-period " +
      "becomes the synthetic; the planted post jump is the ATT and the " +
      "pre gap is the zero placebo") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val months = Seq("2024-01-01", "2024-02-01", "2024-03-01",
      "2024-04-01").map(d)
    // donor A = 10+i; treated = A pre, A+5 post; donor B = 100 flat
    val rows = months.zipWithIndex.flatMap { case (mo, i) =>
      val a = 10.0 + i
      Seq(("A", mo, a), ("B", mo, 100.0),
        ("T", mo, if (i < 2) a else a + 5.0))
    }
    val df = rows.toDF("u", "dt", "v")
    val out = Eval.syntheticControl(df, "u", col("dt"), "v",
      treatedUnit = "T", intervention = "2024-03-01", donors = 1)
      .collect()
    assert(out.length == 4)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("synthetic") == 10.0 + i)
      assert(r.getAs[Double]("gap") == (if (i < 2) 0.0 else 5.0))
      assert(r.getAs[Boolean]("is_post") == (i >= 2))
      assert(r.getAs[Double]("att") == 5.0)
    }
    // two donors, adaptive harmonic weights 2:1 -> (2A + B)/3
    val two = Eval.syntheticControl(df, "u", col("dt"), "v",
      treatedUnit = "T", intervention = "2024-03-01", donors = 2)
      .collect().head
    assert(two.getAs[Double]("synthetic") == 40.0)
    intercept[IllegalArgumentException] {
      Eval.syntheticControl(df, "u", col("dt"), "v", "T",
        "2024-03-01", donors = 0)
    }
  }

  test("twfe: coincides with the cell-mean DiD (one group, common " +
      "timing) and recovers the planted effect under a common trend") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val months = Seq("2024-01-01", "2024-02-01", "2024-03-01",
      "2024-04-01").map(d)
    // common +1/month trend everywhere; treated jumps +5 post
    val rows = months.zipWithIndex.flatMap { case (mo, i) =>
      Seq(("A", mo, 10.0 + i), ("B", mo, 100.0 + i),
        ("T", mo, if (i < 2) 20.0 + i else 25.0 + i))
    }
    val df = rows.toDF("u", "dt", "v")
    val r = Eval.twfe(df, "u", col("dt"), "v", Seq("T"),
      intervention = "2024-03-01").collect().head
    assert(r.getAs[Long]("n_units") == 3L)
    assert(r.getAs[Long]("n_months") == 4L)
    assert(r.getAs[Long]("n_treated_cells") == 2L)
    assert(r.getAs[Double]("att_twfe") == 5.0)
    assert(r.getAs[Double]("did_check") == 5.0)
    intercept[IllegalArgumentException] {
      Eval.twfe(df, "u", col("dt"), "v", Seq.empty, "2024-03-01")
    }
  }

  test("seasonalAnomalies: a planted spike is flagged; the clean weekly " +
      "pattern is not (only the spike's trend window can co-flag)") {
    import spark.implicits._
    val start = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 28).map { i =>
      val base = 10.0 + (start.plusDays(i.toLong).toEpochDay % 7)
      (java.sql.Date.valueOf(start.plusDays(i.toLong)),
        if (i == 14) 100.0 else base)
    }
    val out = Eval.seasonalAnomalies(rows.toDF("d", "v"), col("d"), "v",
      k = 3.0).collect()
    val flagged = out.map(_.getAs[java.sql.Date]("day").toLocalDate)
    // the spike is flagged, and it is the MOST extreme flagged day
    // (the spike also pollutes its trend window and weekday slot, so
    // a near-zero MAD can legitimately co-flag other days)
    assert(flagged.contains(start.plusDays(14L)))
    val worst = out.maxBy(r => math.abs(r.getAs[Double]("residual") -
      r.getAs[Double]("resid_median")))
    assert(worst.getAs[java.sql.Date]("day").toLocalDate ==
      start.plusDays(14L))
    intercept[IllegalArgumentException] {
      Eval.seasonalAnomalies(rows.toDF("d", "v"), col("d"), "v", k = 0.0)
    }
  }

  test("dtwDistance: a one-month lag costs one warp step (hand DP), " +
      "lockstep L1 pays it every month") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val months = Seq("2024-01-01", "2024-02-01", "2024-03-01",
      "2024-04-01").map(d)
    val a = Seq(10.0, 20.0, 30.0, 40.0)
    val b = Seq(10.0, 10.0, 20.0, 30.0) // A lagged one month
    val rows = months.zipWithIndex.flatMap { case (mo, i) =>
      Seq(("A", mo, a(i)), ("B", mo, b(i))) }
    val r = Eval.dtwDistance(rows.toDF("u", "dt", "v"), "u", col("dt"),
      "v", unitA = "A", unitB = "B").collect().head
    assert(r.getAs[Long]("n_months") == 4L)
    // hand DP: DTW = 10.00 (the final unmatched 40 vs 30), L1 = 30.00
    assert(r.getAs[Double]("dtw_dist") == 10.0)
    assert(r.getAs[Double]("lockstep_dist") == 30.0)
    assert(r.getAs[Double]("warp_gain") == 0.666667)
    // identical series: both distances 0, gain NULL-guarded
    val same = months.flatMap(mo => Seq(("A", mo, 5.0), ("B", mo, 5.0)))
    val s0 = Eval.dtwDistance(same.toDF("u", "dt", "v"), "u", col("dt"),
      "v", "A", "B").collect().head
    assert(s0.getAs[Double]("dtw_dist") == 0.0)
    assert(s0.isNullAt(s0.fieldIndex("warp_gain")))
    intercept[IllegalArgumentException] {
      Eval.dtwDistance(same.toDF("u", "dt", "v"), "u", col("dt"), "v",
        "A", "A")
    }
  }
}
