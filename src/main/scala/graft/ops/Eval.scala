package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation and experimentation analytics: ROC AUC, lift/gains
  * tables, A/B significance tests, Kaplan–Meier survival, and seasonal
  * decomposition — the offline-evaluation block a feature store feeds
  * (the reference's serving metrics stop at latency; model quality lives
  * downstream, and these are the standard downstream queries).
  *
  * Scale posture: every operator aggregates the corpus ONCE to a bounded
  * grain (distinct scores per group, deciles, users → arms, distinct
  * durations, calendar days) and runs its windows/folds over THAT bounded
  * frame — the PLANS.md global-window contract. No corpus-wide sorts, no
  * driver loops.
  *
  * Reference: ML-Feature-Store-Enterprise-Grade
  * `monitoring/metrics.py` tracks serving-side counters only; these
  * operators complete the picture with the evaluation-side metrics.
  */
object Eval {

  /** ROC AUC (and Gini) per group via the Mann–Whitney rank-sum identity
    * with midrank tie handling: AUC = (R⁺ − P(P+1)/2) / (P·N) where R⁺ is
    * the sum of average ranks of the positives under an ascending score
    * order. Exactly equals the trapezoidal area under the ROC curve with
    * ties interpolated — no curve materialization, no threshold sweep.
    *
    * Plan: ONE aggregation to (group, score) grain (the only corpus-sized
    * stage, map-side combined), then a per-group cumulative window over
    * distinct scores (bounded per group), then the per-group fold.
    * Degenerate groups (no positives or no negatives) yield NULL auc
    * rather than a misleading 0/1. A single group with extreme distinct-
    * score cardinality sorts in one task — pre-bin the score first in
    * that regime (the q_ks_binned pattern; ranks over bins give the
    * identical AUC when bin boundaries respect ties).
    */
  def rocAuc(df: DataFrame, groupCol: String, label: Column,
             scoreCol: String): DataFrame = {
    val perScore = df
      .select(col(groupCol), label.cast("int").as("__y"),
        col(scoreCol).cast("double").as("__s"))
      .groupBy(col(groupCol), col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__npos"))
    val before = Window.partitionBy(col(groupCol)).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      // midrank of a tied block = (#rows before it) + (blockSize + 1)/2
      .withColumn("__rank",
        coalesce(sum(col("__n")).over(before), lit(0L)) +
          (col("__n") + 1L) / lit(2.0))
      .groupBy(col(groupCol))
      .agg(sum(col("__npos")).as("n_pos"),
        (sum(col("__n")) - sum(col("__npos"))).as("n_neg"),
        sum(col("__npos") * col("__rank")).as("__rsum"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("__rsum") -
            col("n_pos") * (col("n_pos") + 1L) / lit(2.0)) /
            (col("n_pos") * col("n_neg")).cast("double"), 6)))
      .withColumn("gini", round(lit(2.0) * col("auc") - 1.0, 6))
      .drop("__rsum")
      .orderBy(groupCol)
  }

  /** Decile lift/gains table: bin by score into `bins` equal-frequency
    * buckets (decile 0 = HIGHEST scores), then per decile the positive
    * rate, lift over the base rate, and cumulative capture of all
    * positives — "the top 20% of scores capture X% of conversions", the
    * campaign-targeting readout of a propensity model.
    *
    * Plan: cutpoints via ONE array-percentile aggregate (the
    * [[Stats.quantileBin]] machinery — swap `percentile_approx` in at
    * true 100 TB, same shape), broadcast to bin, one decile-grain
    * aggregation, folds over the bins-bounded frame.
    */
  def liftTable(df: DataFrame, label: Column, scoreCol: String,
                bins: Int = 10): DataFrame = {
    val binned = Stats.quantileBin(
      df.select(col(scoreCol), label.cast("int").as("__y")), scoreCol, bins)
    val whole = Window.partitionBy()
    val fromTop = Window.partitionBy().orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    binned
      .withColumn("decile", lit(bins - 1) - col(s"${scoreCol}_bin"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        round(min(col(scoreCol)), 6).as("score_lo"),
        round(max(col(scoreCol)), 6).as("score_hi"))
      .withColumn("pos_rate", round(col("n_pos") / col("n"), 6))
      .withColumn("lift",
        when(sum(col("n_pos")).over(whole) > 0,
          round((col("n_pos") / col("n")) /
            (sum(col("n_pos")).over(whole) /
              sum(col("n")).over(whole).cast("double")), 6)))
      .withColumn("cum_capture",
        when(sum(col("n_pos")).over(whole) > 0,
          round(sum(col("n_pos")).over(fromTop) /
            sum(col("n_pos")).over(whole).cast("double"), 6)))
      .orderBy("decile")
  }

  /** A/B experiment readout: deterministic 50/50 user-level hash
    * assignment (channel-keyed [[Gen.u01]], so assignment is reproducible
    * and independent of every sampler), user-grain conversion + revenue,
    * then the two-proportion pooled z statistic and Welch's unequal-
    * variance t with Satterthwaite degrees of freedom — one wide row.
    *
    * Plan: ONE user-grain aggregation (the corpus-sized stage), then a
    * single-row conditional fold — arms never shuffle separately. At any
    * corpus size the fold input is #users rows with map-side partial
    * aggregation.
    */
  def abTest(df: DataFrame, userCol: String, isConv: Column,
             valueCol: String, channel: Long = 59L): DataFrame = {
    val users = df
      .groupBy(col(userCol))
      .agg(max(isConv.cast("int")).as("__conv"),
        sum(coalesce(col(valueCol), lit(0.0))).as("__rev"))
      .withColumn("__t", Gen.u01(col(userCol), channel) > 0.5)
    def arm(t: Boolean, c: Column) = when(col("__t") === t, c)
    val folded = users.groupBy().agg(
      count(arm(false, lit(1))).as("n_control"),
      count(arm(true, lit(1))).as("n_treatment"),
      sum(arm(false, col("__conv"))).as("conversions_control"),
      sum(arm(true, col("__conv"))).as("conversions_treatment"),
      avg(arm(false, col("__rev"))).as("__mc"),
      avg(arm(true, col("__rev"))).as("__mt"),
      var_samp(arm(false, col("__rev"))).as("__vc"),
      var_samp(arm(true, col("__rev"))).as("__vt"))
    val rc = col("conversions_control") / col("n_control").cast("double")
    val rt = col("conversions_treatment") / col("n_treatment").cast("double")
    val pPool = (col("conversions_control") + col("conversions_treatment")) /
      (col("n_control") + col("n_treatment")).cast("double")
    val seZ = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_control") + lit(1.0) / col("n_treatment")))
    val seW2 = col("__vc") / col("n_control") + col("__vt") / col("n_treatment")
    folded
      .withColumn("rate_control", round(rc, 6))
      .withColumn("rate_treatment", round(rt, 6))
      .withColumn("abs_lift", round(rt - rc, 6))
      .withColumn("z_stat", when(seZ > 0, round((rt - rc) / seZ, 6)))
      .withColumn("rev_mean_control", round(col("__mc"), 6))
      .withColumn("rev_mean_treatment", round(col("__mt"), 6))
      .withColumn("welch_t",
        when(seW2 > 0, round((col("__mt") - col("__mc")) / sqrt(seW2), 6)))
      .withColumn("welch_df",
        when(seW2 > 0, round(seW2 * seW2 / (
          (col("__vc") / col("n_control")) * (col("__vc") / col("n_control")) /
            (col("n_control") - 1L) +
          (col("__vt") / col("n_treatment")) * (col("__vt") / col("n_treatment")) /
            (col("n_treatment") - 1L)), 6)))
      .drop("__mc", "__mt", "__vc", "__vt")
  }

  /** McNemar's test over PAIRED binary outcomes at the user grain —
    * "among the same users, is behavior A more prevalent than behavior
    * B?" (e.g. clicked-ever vs purchased-ever). The paired design makes
    * this the right test where the two-proportion z of [[abTest]] would
    * be wrong: each user is their own control, and only the DISCORDANT
    * cells (A-only / B-only) carry information. Reports the 2×2 paired
    * table, the χ² form (b−c)²/(b+c), Edwards' continuity-corrected
    * (|b−c|−1)²/(b+c), and the discordant odds ratio b/c.
    *
    * Every number is a ratio of exact longs from ONE user-grain
    * aggregation (map-side combined) plus a single-row fold — no float
    * sum anywhere, so the oracle matches bit-for-bit.
    */
  def mcnemar(df: DataFrame, userCol: String, aCond: Column,
              bCond: Column): DataFrame = {
    val users = df.groupBy(col(userCol))
      .agg(max(aCond.cast("int")).as("__a"),
        max(bCond.cast("int")).as("__b"))
    val folded = users.groupBy().agg(
      count(lit(1)).as("n_users"),
      sum(when(col("__a") === 1 && col("__b") === 1, 1L).otherwise(0L))
        .as("n_both"),
      sum(when(col("__a") === 1 && col("__b") === 0, 1L).otherwise(0L))
        .as("n_a_only"),
      sum(when(col("__a") === 0 && col("__b") === 1, 1L).otherwise(0L))
        .as("n_b_only"),
      sum(when(col("__a") === 0 && col("__b") === 0, 1L).otherwise(0L))
        .as("n_neither"))
    val b = col("n_a_only").cast("double")
    val c = col("n_b_only").cast("double")
    val disc = b + c
    folded.select(col("n_users"), col("n_both"), col("n_a_only"),
      col("n_b_only"), col("n_neither"),
      when(disc > 0, round((b - c) * (b - c) / disc, 6)).as("chi2"),
      when(disc > 0, round((abs(b - c) - 1.0) * (abs(b - c) - 1.0) / disc,
        6)).as("chi2_corrected"),
      when(col("n_b_only") > 0, round(b / c, 6)).as("discordant_odds"))
  }

  /** Always-valid sequential A/B readout (one row per day): the
    * normal-mixture SPRT (mSPRT — Johari et al. 2017, "Peeking at A/B
    * tests") over cumulative two-proportion counts. Unlike the fixed-n
    * z-test in [[abTest]], the always-valid p may be inspected after
    * EVERY day without inflating false positives: per day t,
    * Λ_t = √(V/(V+τ²)) · exp(θ̂²τ² / (2V(V+τ²))) with θ̂ the cumulative
    * rate difference and V its pooled variance; p_t = running min of
    * 1/Λ_t (capped at 1). τ² (taken directly, as `tau2`) is the mixture
    * VARIANCE — the prior spread of plausible effects; the test is valid
    * for any τ², merely most powerful near the true effect size. The
    * parameter is the square, not τ itself, so the exact double that
    * enters exp() is the same literal an oracle SQL writes (squaring
    * 0.1 yields 0.010000000000000002 ≠ the literal 0.01 — a latent
    * 6-decimal hash flake the old `tau` form carried).
    *
    * Plan: one daily keyed aggregation over the corpus, then cumulative
    * windows + the closed form over the BOUNDED day table (the
    * forecast/cusum global-window class).
    */
  def abSequential(df: DataFrame, userCol: String, tsCol: String,
                   isConv: Column, tau2: Double = 0.01,
                   alpha: Double = 0.05, channel: Long = 59L): DataFrame = {
    require(tau2 > 0.0, s"abSequential: tau2 > 0 (got $tau2)")
    require(alpha > 0.0 && alpha < 1.0,
      s"abSequential: alpha in (0,1) (got $alpha)")
    val tagged = df
      .withColumn("__t", Gen.u01(col(userCol), channel) > 0.5)
      .withColumn("__day", to_date(col(tsCol)))
    val daily = tagged.groupBy(col("__day").as("day"))
      .agg(
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__dnc"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__dnt"),
        sum(when(!col("__t") && isConv, 1L).otherwise(0L)).as("__dxc"),
        sum(when(col("__t") && isConv, 1L).otherwise(0L)).as("__dxt"))
    val cumW = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("n_c", sum(col("__dnc")).over(cumW))
      .withColumn("n_t", sum(col("__dnt")).over(cumW))
      .withColumn("x_c", sum(col("__dxc")).over(cumW))
      .withColumn("x_t", sum(col("__dxt")).over(cumW))
    val ok = col("n_c") > 0 && col("n_t") > 0
    val pPool = (col("x_c") + col("x_t")) /
      (col("n_c") + col("n_t")).cast("double")
    val theta = col("x_t") / col("n_t").cast("double") -
      col("x_c") / col("n_c").cast("double")
    val v = pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_c") + lit(1.0) / col("n_t"))
    val t2 = lit(tau2)
    val lambda = sqrt(v / (v + t2)) *
      exp(theta * theta * t2 / (lit(2.0) * v * (v + t2)))
    val pRaw = when(ok && v > 0, least(lit(1.0) / lambda, lit(1.0)))
      .otherwise(lit(1.0))
    cum
      .withColumn("__praw", pRaw)
      .withColumn("p_always_valid",
        round(min(col("__praw")).over(cumW), 6))
      .select(col("day"), col("n_c"), col("n_t"), col("x_c"), col("x_t"),
        round(when(ok, theta), 6).as("lift"),
        col("p_always_valid"),
        (col("p_always_valid") <= alpha).as("significant"))
      .orderBy("day")
  }

  /** A/B sizing readout — the "is this experiment big enough" audit
    * published next to [[abTest]]: from the same hash assignment and
    * user-grain conversion, the two-proportion sample size required per
    * arm to detect the OBSERVED lift at α = 0.05 (two-sided) with power
    * 0.80 — n = (z_{α/2}+z_β)²·(p₁(1−p₁)+p₂(1−p₂))/Δ² — plus the
    * minimum detectable effect at the CURRENT smaller arm,
    * MDE = (z_{α/2}+z_β)·√(2·p̄(1−p̄)/n_min), and a powered? verdict.
    * The z quantiles are fixed literals (1.959964, 0.841621), so both
    * engines compute the identical closed form — no inverse-CDF calls.
    *
    * Plan: identical to [[abTest]] — one user-grain aggregation, one
    * single-row fold.
    */
  def abPower(df: DataFrame, userCol: String, isConv: Column,
              channel: Long = 59L): DataFrame = {
    val zSum = lit(1.959964 + 0.841621)
    val users = df
      .groupBy(col(userCol))
      .agg(max(isConv.cast("int")).as("__conv"))
      .withColumn("__t", Gen.u01(col(userCol), channel) > 0.5)
    def arm(t: Boolean, c: Column) = when(col("__t") === t, c)
    val folded = users.groupBy().agg(
      count(arm(false, lit(1))).as("n_control"),
      count(arm(true, lit(1))).as("n_treatment"),
      sum(arm(false, col("__conv"))).as("__cc"),
      sum(arm(true, col("__conv"))).as("__ct"))
    val rc = col("__cc") / col("n_control").cast("double")
    val rt = col("__ct") / col("n_treatment").cast("double")
    val delta = abs(rt - rc)
    val pBar = (col("__cc") + col("__ct")) /
      (col("n_control") + col("n_treatment")).cast("double")
    val nMin = least(col("n_control"), col("n_treatment"))
    val reqN = ceil(zSum * zSum *
      (rc * (lit(1.0) - rc) + rt * (lit(1.0) - rt)) / (delta * delta))
    folded
      .withColumn("rate_control", round(rc, 6))
      .withColumn("rate_treatment", round(rt, 6))
      .withColumn("observed_delta", round(delta, 6))
      .withColumn("required_n_per_arm", when(delta > 0, reqN))
      .withColumn("mde_at_current_n",
        when(nMin > 0, round(zSum *
          sqrt(lit(2.0) * pBar * (lit(1.0) - pBar) / nMin), 6)))
      .withColumn("powered", when(delta > 0, nMin >= reqN))
      .drop("__cc", "__ct")
  }

  /** Kaplan–Meier survival over time-to-first-event: per key, the clock
    * starts at its first observation; keys that ever fire `isEvent` are
    * observed at their FIRST firing, the rest are right-censored at their
    * last observation. Durations are floored to whole hours (bounds the
    * distinct-time grain). Emits one row per hour with ≥1 observed event:
    * the risk set, event/censor counts, and the product-limit survival
    * estimate Ŝ(t) = Π_{s≤t} (1 − dₛ/nₛ).
    *
    * Plan: one key-grain aggregation (corpus-sized, combined map-side),
    * one duration-grain aggregation (≤ distinct hours), then the
    * cumulative product over that bounded frame as exp(Σ ln) — with an
    * explicit zero-factor flag so a risk set that empties (dₜ = nₜ) pins
    * survival to exactly 0 instead of routing ln(0) through the engines'
    * divergent conventions.
    */
  def kaplanMeier(df: DataFrame, keyCol: String, tsCol: String,
                  isEvent: Column): DataFrame = {
    val upTo = Window.partitionBy().orderBy(col("t_hours"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withRisk = survivalRiskTable(df, keyCol, tsCol, isEvent)
      .withColumn("__f",
        lit(1.0) - col("n_events") / col("n_risk").cast("double"))
    withRisk
      .withColumn("__hitZero", max((col("__f") === 0.0).cast("int")).over(upTo))
      .withColumn("survival",
        when(col("__hitZero") === 1, lit(0.0)).otherwise(
          round(exp(sum(when(col("__f") > 0, log(col("__f")))
            .otherwise(lit(0.0))).over(upTo)), 6)))
      .filter(col("n_events") > 0)
      .select(col("t_hours"), col("n_risk"), col("n_events"),
        col("n_censored"), col("survival"))
      .orderBy("t_hours")
  }

  /** Restricted mean survival time: ∫₀^τ S(t)dt under the
    * [[kaplanMeier]] step curve — the clinically-preferred one-number
    * summary when the median is never reached ("average event-free
    * hours in the first τ hours"), reported with its S(t)-average. The
    * integral is the exact step sum Σ sᵢ·(tᵢ₊₁∧τ − tᵢ) plus the
    * S=1 head segment [0, t₁∧τ); with no step below the horizon it
    * degenerates to exactly τ.
    *
    * Each step's contribution sᵢ·Δt is integer-valued on the 1e-6
    * lattice (6-decimal survival × whole hours), so the fold is an
    * exact long sum — step order can't move it. Runs entirely on the
    * BOUNDED KM step table (distinct event hours).
    */
  def rmst(df: DataFrame, keyCol: String, tsCol: String, isEvent: Column,
           horizonHours: Long): DataFrame = {
    require(horizonHours >= 1,
      s"rmst: horizonHours >= 1 (got $horizonHours)")
    val steps = kaplanMeier(df, keyCol, tsCol, isEvent)
      .select(col("t_hours").cast("long").as("__t"),
        col("survival").as("__s"))
      .filter(col("__t") < horizonHours)
    val ord = Window.orderBy(col("__t"))
    val contrib = steps
      .withColumn("__nxt",
        coalesce(lead(col("__t"), 1).over(ord), lit(horizonHours)))
      .withColumn("__c", round(col("__s") *
        (col("__nxt") - col("__t")).cast("double") * 1e6, 0).cast("long"))
    val folded = contrib.agg(count(lit(1)).as("n_steps"),
      coalesce(min(col("__t")), lit(horizonHours)).as("__first"),
      coalesce(sum(col("__c")), lit(0L)).as("__sc"))
    val raw = (col("__first") * 1000000L + col("__sc")).cast("double") / 1e6
    folded.select(lit(horizonHours).as("horizon_hours"), col("n_steps"),
      round(raw, 6).as("rmst_hours"),
      round(raw / lit(horizonHours.toDouble), 6).as("mean_survival"))
  }

  /** The shared duration/risk-set derivation behind [[kaplanMeier]] and
    * [[nelsonAalen]]: per key, first observation starts the clock, first
    * event observes, last observation censors; durations floored to whole
    * hours; one row per duration with event/censor counts and the risk
    * set n_risk = total − everyone who left strictly earlier.
    */
  /** Aalen–Johansen competing-risks table — when a user's journey can
    * END two different ways ("first purchase" vs "first error"),
    * 1−KM on either event alone OVERSTATES its incidence because it
    * treats the competing event as censoring; the cumulative incidence
    * function CIF_k(t) = Σ_{s≤t} S(s−)·d_k(s)/n(s) (S = all-cause
    * Kaplan–Meier) splits the all-cause risk correctly, with
    * CIF_a + CIF_b + S = 1 at every step. First-event election per
    * key; a same-timestamp tie elects event A (declared priority,
    * deterministic); keys with neither event censor at last sight.
    *
    * Determinism: durations and the (d_a, d_b, censored, n_risk)
    * table are exact integers; S and the CIFs replay the
    * [[kaplanMeier]] log-sum-exp cumulative pattern over the BOUNDED
    * distinct-hours frame with identical expression trees both sides.
    *
    * Plan: one key-grain aggregation, one duration-grain aggregation,
    * cumulative windows over ≤ distinct-hours rows. No corpus sort.
    */
  def competingRisks(df: DataFrame, keyCol: String, tsCol: String,
                     isEventA: Column, isEventB: Column): DataFrame = {
    val perKey = df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__t0"),
        min(when(isEventA, col(tsCol))).as("__ta"),
        min(when(isEventB, col(tsCol))).as("__tb"),
        max(col(tsCol)).as("__tl"))
      .withColumn("__te",
        when(col("__ta").isNotNull && col("__tb").isNotNull,
          least(col("__ta"), col("__tb")))
          .otherwise(coalesce(col("__ta"), col("__tb"))))
      .withColumn("__isA", col("__ta").isNotNull &&
        (col("__tb").isNull || col("__ta") <= col("__tb")))
      .withColumn("t_hours",
        floor((unix_micros(coalesce(col("__te"), col("__tl"))
          .cast("timestamp")) - unix_micros(col("__t0").cast("timestamp")))
          / lit(3600000000L)))
    val perT = perKey.groupBy(col("t_hours"))
      .agg(sum((col("__te").isNotNull && col("__isA")).cast("long"))
          .as("d_a"),
        sum((col("__te").isNotNull && !col("__isA")).cast("long"))
          .as("d_b"),
        sum(col("__te").isNull.cast("long")).as("n_censored"))
    val whole = Window.partitionBy()
    val before = Window.partitionBy().orderBy(col("t_hours"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy().orderBy(col("t_hours"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val atRisk = perT.withColumn("n_risk",
      sum(col("d_a") + col("d_b") + col("n_censored")).over(whole) -
        coalesce(sum(col("d_a") + col("d_b") + col("n_censored"))
          .over(before), lit(0L)))
    val fac = lit(1.0) -
      (col("d_a") + col("d_b")) / col("n_risk").cast("double")
    val steps = atRisk.withColumn("__f", fac)
      .withColumn("__hit0", max((col("__f") === 0.0).cast("int"))
        .over(upTo))
      .withColumn("__hit0b",
        coalesce(max((col("__f") === 0.0).cast("int")).over(before),
          lit(0)))
      .withColumn("__lsum", sum(when(col("__f") > 0, log(col("__f")))
        .otherwise(lit(0.0))).over(upTo))
      .withColumn("__lsumb",
        coalesce(sum(when(col("__f") > 0, log(col("__f")))
          .otherwise(lit(0.0))).over(before), lit(0.0)))
      .withColumn("__sm", when(col("__hit0b") === 1, lit(0.0))
        .otherwise(exp(col("__lsumb"))))
      .withColumn("__inca",
        col("__sm") * (col("d_a") / col("n_risk").cast("double")))
      .withColumn("__incb",
        col("__sm") * (col("d_b") / col("n_risk").cast("double")))
      .withColumn("__cifa", sum(col("__inca")).over(upTo))
      .withColumn("__cifb", sum(col("__incb")).over(upTo))
    steps.filter(col("d_a") + col("d_b") > 0)
      .select(col("t_hours"), col("n_risk"), col("d_a"), col("d_b"),
        col("n_censored"),
        when(col("__hit0") === 1, lit(0.0))
          .otherwise(round(exp(col("__lsum")), 6)).as("survival_allcause"),
        round(col("__cifa"), 6).as("cif_a"),
        round(col("__cifb"), 6).as("cif_b"))
      .orderBy("t_hours")
  }

  private def survivalRiskTable(df: DataFrame, keyCol: String,
                                tsCol: String, isEvent: Column): DataFrame = {
    val perKey = df
      .groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__t0"),
        min(when(isEvent, col(tsCol))).as("__te"),
        max(col(tsCol)).as("__tl"))
      .withColumn("__obs", col("__te").isNotNull)
      .withColumn("t_hours",
        floor((unix_micros(coalesce(col("__te"), col("__tl")).cast("timestamp"))
          - unix_micros(col("__t0").cast("timestamp"))) / lit(3600000000L)))
    val perT = perKey
      .groupBy(col("t_hours"))
      .agg(sum(col("__obs").cast("long")).as("n_events"),
        sum((!col("__obs")).cast("long")).as("n_censored"))
    val whole = Window.partitionBy()
    val before = Window.partitionBy().orderBy(col("t_hours"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perT
      .withColumn("n_risk",
        sum(col("n_events") + col("n_censored")).over(whole) -
          coalesce(sum(col("n_events") + col("n_censored")).over(before),
            lit(0L)))
  }

  /** Nelson–Aalen cumulative hazard over the same time-to-first-event
    * table as [[kaplanMeier]]: Ĥ(t) = Σ_{s≤t} dₛ/nₛ with the standard
    * variance Σ dₛ/nₛ² — the hazard-scale view of the survival curve
    * (additive where the product-limit is multiplicative, so it stays
    * finite when a risk set empties, and its increments ARE the hazard
    * rates a retention model fits). Same bounded plan: key-grain agg →
    * duration-grain agg → cumulative windows over ≤ distinct-hours rows.
    */
  /** Exact Shapley-value channel attribution over a DECLARED bounded
    * channel roster: each user's exposure SET (did they ever touch the
    * channel) defines a coalition; v(S) = conversion rate of users
    * exposed to exactly S (unobserved coalitions value 0 — the
    * standard data-driven-attribution convention); each channel's
    * credit is its exact Shapley value
    * φᵢ = Σ_{S∌i} |S|!(k−1−|S|)!/k! · (v(S∪i) − v(S)).
    * The game-theoretic completion of the attribution suite: last-touch
    * (`q_attribution`) over-credits closers, Markov removal
    * (`q_removal_attribution`) depends on the chain model; Shapley is
    * the unique symmetric/efficient split. Efficiency means Σφᵢ =
    * v(all) − v(∅), emitted as `total_phi` on every row so a reader can
    * verify it.
    *
    * Determinism: exposure masks and coalition counts are exact integer
    * folds; v values are single divisions of exact longs; each
    * marginal-contribution term commits to the 1e-12 lattice (with the
    * factorial weights injected as shared literals) before the
    * per-channel fold over the BOUNDED 2^k subset frame.
    *
    * Plan: one entity-grain aggregation (corpus-sized, map-side
    * combined), one ≤2^k-row subset aggregation, then k bounded
    * self-joins of the subset frame (≤ k·2^k rows total). Requires
    * k ≤ 8 — the subset lattice is the whole point and the whole cost.
    */
  def shapleyAttribution(df: DataFrame, keyCol: String,
                         channelCol: String, channels: Seq[String],
                         isConv: Column): DataFrame = {
    require(channels.nonEmpty && channels.size <= 8 &&
      channels.distinct == channels,
      s"shapleyAttribution: 1..8 distinct channels (got $channels)")
    val k = channels.size
    val aggs = channels.zipWithIndex.map { case (c, i) =>
      max(when(col(channelCol) === c, 1L).otherwise(0L)).as(s"__c$i")
    } :+ max(when(isConv, 1L).otherwise(0L)).as("__y")
    val per = df.groupBy(col(keyCol).as("__k")).agg(aggs.head, aggs.tail: _*)
    val mask = channels.indices
      .map(i => col(s"__c$i") * (1L << i)).reduce(_ + _)
    val subsets = per.withColumn("__m", mask)
      .groupBy(col("__m"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__cv"))
    val all = df.sparkSession.range(1L << k).toDF("__m")
      .join(subsets, Seq("__m"), "left")
      .select(col("__m"), coalesce(col("__n"), lit(0L)).as("__n"),
        coalesce(col("__cv"), lit(0L)).as("__cv"))
      .withColumn("__v", when(col("__n") > 0,
        col("__cv").cast("double") / col("__n").cast("double"))
        .otherwise(lit(0.0)))
      .localCheckpoint(eager = false)
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    val w = (0 until k).map(s => fact(s) * fact(k - 1 - s) / fact(k))
    val wArr = array(w.map(lit): _*)
    val perChannel = channels.zipWithIndex.map { case (c, i) =>
      val bit = 1L << i
      val s = all.filter(col("__m").bitwiseAND(bit) === 0)
        .select(col("__m"), col("__v").as("__vs"))
      val joined = s.join(
        all.select(col("__m").as("__m2"), col("__v").as("__vsi")),
        col("__m") + bit === col("__m2"))
        .withColumn("__w",
          element_at(wArr, expr("bit_count(__m)").cast("int") + 1))
        .agg(sum(round((col("__vsi") - col("__vs")) * col("__w") * 1e12,
          0).cast("long")).as("__phil"))
      val exposed = all.filter(col("__m").bitwiseAND(bit) =!= 0)
        .agg(sum(col("__n")).as("n_exposed"))
      val alone = all.filter(col("__m") === bit)
        .select(round(col("__v"), 6).as("v_alone"))
      joined.crossJoin(broadcast(exposed)).crossJoin(broadcast(alone))
        .withColumn("channel", lit(c))
    }.reduce(_ unionByName _).localCheckpoint(eager = false)
    val tot = perChannel.agg(sum(col("__phil")).as("__tot"))
    perChannel.crossJoin(broadcast(tot))
      .select(col("channel"), col("n_exposed"), col("v_alone"),
        round(col("__phil").cast("double") / 1e12, 6).as("shapley"),
        round(when(col("__tot") =!= 0L,
          col("__phil").cast("double") / col("__tot")), 6).as("share"),
        round(col("__tot").cast("double") / 1e12, 6).as("total_phi"))
      .orderBy("channel")
  }

  /** Parametric Weibull fit of the [[kaplanMeier]] curve: OLS of
    * ln(−ln S) on ln t over the step table gives the shape k (slope)
    * and scale λ (from the intercept) — one smooth two-parameter
    * summary where KM gives a staircase, with the implied median
    * survival time and the fit R² so a reader can SEE whether the
    * Weibull family even applies (R² well below 1 = don't trust the
    * extrapolation). Shape < 1 means the hazard falls with time
    * (early-dropout dynamics), > 1 it rises (wear-out).
    *
    * Determinism: chains from the ROUNDED 6-decimal survival column
    * (the logisticMetrics rounded-margin convention — both engines
    * fold identical S values); ln t and ln(−ln S) commit to the 1e-9
    * lattice per step, products fold in decimal(38,0), and
    * shape/scale/median/R² are one fixed double tree each (the
    * ln(ln 2) literal is injected verbatim). Degenerate step tables
    * (< 3 usable steps, zero ln-t variance, non-positive shape)
    * surface as NULLs.
    *
    * Plan: the KM chain (bounded distinct-hour step table) plus one
    * 1-row fold. Nothing data-sized.
    */
  def weibullFit(df: DataFrame, keyCol: String, tsCol: String,
                 isEvent: Column): DataFrame = {
    val lnln2 = -0.36651292058166435 // ln(ln 2), shared literal
    val steps = kaplanMeier(df, keyCol, tsCol, isEvent)
      .filter(col("survival") > 0.0 && col("survival") < 1.0 &&
        col("t_hours") > 0)
      .select(
        round(log(col("t_hours").cast("double")) * 1e9, 0).cast("long")
          .as("__x"),
        round(log(lit(0.0) - log(col("survival"))) * 1e9, 0).cast("long")
          .as("__y"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val f = steps.agg(count(lit(1)).as("n_steps"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(dec(col("__x")) * col("__y")).as("__sxy"),
      sum(dec(col("__x")) * col("__x")).as("__sxx"),
      sum(dec(col("__y")) * col("__y")).as("__syy"))
    val nD = col("n_steps").cast("double")
    val sx = col("__sx").cast("double") / 1e9
    val sy = col("__sy").cast("double") / 1e9
    val sxy = col("__sxy").cast("double") / 1e18
    val sxx = col("__sxx").cast("double") / 1e18
    val syy = col("__syy").cast("double") / 1e18
    val num = nD * sxy - sx * sy
    val denX = nD * sxx - sx * sx
    val denY = nD * syy - sy * sy
    val b = num / denX
    val a = (sy - b * sx) / nD
    val ok = col("n_steps") >= 3 && denX > 0
    f.select(col("n_steps"),
      round(when(ok, b), 6).as("shape"),
      round(when(ok && b > 0, exp((lit(0.0) - a) / b)), 6).as("scale"),
      round(when(ok && b > 0, exp((lit(lnln2) - a) / b)), 6)
        .as("median_t"),
      round(when(ok && denY > 0, num * num / (denX * denY)), 6).as("r2"))
  }

  def nelsonAalen(df: DataFrame, keyCol: String, tsCol: String,
                  isEvent: Column): DataFrame = {
    val upTo = Window.partitionBy().orderBy(col("t_hours"))
      .rowsBetween(Window.unboundedPreceding, 0)
    survivalRiskTable(df, keyCol, tsCol, isEvent)
      .withColumn("cum_hazard",
        round(sum(col("n_events") / col("n_risk").cast("double"))
          .over(upTo), 6))
      .withColumn("hazard_var",
        round(sum(col("n_events") /
          (col("n_risk") * col("n_risk")).cast("double")).over(upTo), 6))
      .filter(col("n_events") > 0)
      .select(col("t_hours"), col("n_risk"), col("n_events"),
        col("n_censored"), col("cum_hazard"), col("hazard_var"))
      .orderBy("t_hours")
  }

  /** Empirical-Bayes shrinkage of per-key conversion rates: a beta prior
    * moment-matched on the observed key-level rates
    * (α = m·(m(1−m)/v − 1), β = (1−m)·(m(1−m)/v − 1)), then every key's
    * rate posterior-shrunk to (x+α)/(n+α+β). The small-sample fix every
    * per-entity rate leaderboard needs: a 1-for-1 user stops outranking a
    * 9,800-for-10,000 one, keys pull toward the population mean in
    * proportion to their evidence. Degenerate spread (v ≤ 0 or an
    * out-of-range implied prior) falls back to the raw rate with NULL
    * prior columns — fail-soft, flagged, never a division blow-up.
    *
    * Plan: one keyed aggregation, one 1-row moment fold broadcast back,
    * a narrow projection — no windows at all.
    */
  def ebShrinkage(df: DataFrame, keyCol: String, isConv: Column): DataFrame = {
    val per = df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(isConv.cast("long")).as("conv"))
      .withColumn("raw_rate",
        round(col("conv") / col("n").cast("double"), 6))
    val mom = per.agg(
      avg(col("conv") / col("n").cast("double")).as("__m"),
      var_samp(col("conv") / col("n").cast("double")).as("__v"))
    val k = col("__m") * (lit(1.0) - col("__m")) / col("__v") - lit(1.0)
    val ok = col("__v") > 0 && k > 0
    per.crossJoin(broadcast(mom))
      .withColumn("alpha", round(when(ok, col("__m") * k), 6))
      .withColumn("beta",
        round(when(ok, (lit(1.0) - col("__m")) * k), 6))
      .withColumn("shrunk_rate",
        round(when(ok,
          (col("conv") + col("__m") * k) /
            (col("n") + k)).otherwise(
          col("conv") / col("n").cast("double")), 6))
      .select(col(keyCol), col("n"), col("conv"), col("raw_rate"),
        col("alpha"), col("beta"), col("shrunk_rate"))
      .orderBy(keyCol)
  }

  /** Per-class precision / recall / F1 from a (gold, predicted) pair
    * column — the class-level complement of [[cohensKappa]]'s single
    * agreement number (kappa can look healthy while one minority class
    * is never predicted; this table shows exactly which). Classes are
    * the GOLD roster (left joins — a class never predicted reports
    * precision NULL, recall 0); support = gold count.
    *
    * One shuffled aggregation on the bounded (gold, pred) joint; every
    * later fold runs over that |classes|²-row table.
    */
  def classificationReport(df: DataFrame, goldCol: String,
                           predCol: String): DataFrame = {
    val joint = df
      .filter(col(goldCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(goldCol).as("__g"), col(predCol).as("__p"))
      .agg(count(lit(1)).as("__n"))
    val goldN = joint.groupBy(col("__g").as("clazz"))
      .agg(sum(col("__n")).cast("long").as("support"))
    val predN = joint.groupBy(col("__p").as("clazz"))
      .agg(sum(col("__n")).cast("long").as("__pred_n"))
    val tp = joint.filter(col("__g") === col("__p"))
      .select(col("__g").as("clazz"), col("__n").cast("long").as("__tp"))
    val p = col("__tp").cast("double") / col("__pred_n")
    val r = col("__tp").cast("double") / col("support")
    goldN
      .join(tp, Seq("clazz"), "left")
      .join(predN, Seq("clazz"), "left")
      .withColumn("__tp", coalesce(col("__tp"), lit(0L)))
      .select(col("clazz"), col("support"), col("__tp").as("tp"),
        coalesce(col("__pred_n"), lit(0L)).as("pred_n"),
        round(when(col("__pred_n") > 0, p), 6).as("precision"),
        round(r, 6).as("recall"),
        round(when(col("__pred_n") > 0 && p + r > 0,
          lit(2.0) * p * r / (p + r)), 6).as("f1"))
      .orderBy("clazz")
  }

  /** RFM segmentation — the classic customer-value grid: per purchaser,
    * recency (days since last purchase, against the corpus's latest
    * purchase date), frequency (purchase count), monetary (value sum);
    * each scored 1–3 by tercile cuts (recency REVERSED — recent is best),
    * folded to one row per RFM cell (≤27) with size and value rollups.
    * Segment 333 is "champions", 111 the lapsed low-value tail.
    *
    * Determinism: metrics and tercile cutpoints are rounded at 6 before
    * comparison, so a customer sitting exactly on a cut scores the same
    * in both engines. Plan: one keyed aggregation, one 1-row percentile
    * fold broadcast back, one bounded cell fold — no data-sized window
    * anywhere (the ntile formulation would global-sort the user table).
    */
  def rfmSegments(df: DataFrame, userCol: String, tsCol: String,
                  isPurchase: Column, valueCol: String): DataFrame = {
    val p = df.filter(isPurchase)
    val anchor = p.agg(max(to_date(col(tsCol))).as("__a"))
    val per = p.groupBy(col(userCol))
      .agg(max(to_date(col(tsCol))).as("__last"),
        count(lit(1)).cast("long").as("frequency"),
        round(sum(col(valueCol)), 6).as("monetary"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("__a"), col("__last")).cast("long"))
    def cut(c: String, p: Double, as: String) =
      round(percentile(col(c), lit(p)), 6).as(as)
    val cuts = per.agg(
      cut("recency_days", 1.0 / 3, "r1"), cut("recency_days", 2.0 / 3, "r2"),
      cut("frequency", 1.0 / 3, "f1"), cut("frequency", 2.0 / 3, "f2"),
      cut("monetary", 1.0 / 3, "m1"), cut("monetary", 2.0 / 3, "m2"))
    val scored = per.crossJoin(broadcast(cuts))
      .withColumn("r_score", // low recency = recent = best
        when(col("recency_days") <= col("r1"), 3)
          .when(col("recency_days") <= col("r2"), 2).otherwise(1))
      .withColumn("f_score",
        when(col("frequency") <= col("f1"), 1)
          .when(col("frequency") <= col("f2"), 2).otherwise(3))
      .withColumn("m_score",
        when(col("monetary") <= col("m1"), 1)
          .when(col("monetary") <= col("m2"), 2).otherwise(3))
    scored
      .groupBy((col("r_score") * 100 + col("f_score") * 10 +
        col("m_score")).as("segment"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        round(avg(col("recency_days")), 6).as("avg_recency_days"),
        round(avg(col("frequency")), 6).as("avg_frequency"),
        round(sum(col("monetary")), 6).as("total_monetary"))
      .orderBy("segment")
  }

  /** NDCG@k of a scored ranking against binary relevance, per group —
    * the ranking-quality readout for retrieval / recommendation features:
    * within each group, items are ranked by (score desc, id asc); DCG@k
    * discounts each relevant item by 1/log₂(position+1); IDCG@k is the
    * all-relevant-first ideal; ndcg = dcg/idcg. Groups with no relevant
    * item report NULL (not 0 — "nothing to find" is not "found nothing").
    * The log₂ is spelled ln(x)/ln(2) so every engine computes the
    * identical operation sequence.
    *
    * Plan: one per-group window ranks (per-key bounded), positions > k
    * drop before the fold, and IDCG folds a ≤k-element generated
    * sequence per group — no joins, no global sort.
    */
  def ndcgAtK(df: DataFrame, groupCol: String, idCol: String,
              scoreCol: String, isRelevant: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"ndcgAtK: k in [1, 1000] (got $k)")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    def ln2 = log(lit(2.0))
    val ranked = df
      .withColumn("__rel", isRelevant.cast("int"))
      .withColumn("__pos", row_number().over(w))
    ranked
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"),
        sum(col("__rel")).as("n_relevant"),
        sum(when(col("__pos") <= k,
          col("__rel") / (log(col("__pos").cast("double") + 1.0) / ln2))
          .otherwise(lit(0.0))).as("__dcg"))
      .withColumn("__idcg",
        when(col("n_relevant") > 0,
          aggregate(sequence(lit(1), least(col("n_relevant"), lit(k))),
            lit(0.0),
            (acc, i) => acc + lit(1.0) / (log(i.cast("double") + 1.0) / ln2))))
      .select(col(groupCol), col("n_items"), col("n_relevant"),
        round(col("__dcg"), 6).as("dcg"),
        round(col("__idcg"), 6).as("idcg"),
        when(col("__idcg") > 0, round(col("__dcg") / col("__idcg"), 6))
          .as("ndcg"))
      .orderBy(groupCol)
  }

  /** Forecast-baseline scorecard over a daily series: the naive (lag-1)
    * and seasonal-naive (lag-7) forecasts every real model must beat,
    * with per-day absolute errors and the global MAE of both plus MASE
    * (seasonal-naive MAE / naive MAE) repeated on each row — the
    * denominator every forecasting paper scales by (Hyndman & Koehler
    * 2006). Lags are over the OBSERVED series (calendar gaps are not
    * interpolated — same honesty rule as [[Stats.autocorr]]).
    *
    * Plan: one day-grain aggregation, then every lag, error, and global
    * fold in windows over the calendar-bounded series.
    */
  def forecastBaseline(df: DataFrame, dateCol: Column,
                       valueCol: String): DataFrame = {
    val daily = df.groupBy(dateCol.as("day")).agg(sum(col(valueCol)).as("__x"))
    val w = Window.partitionBy().orderBy(col("day"))
    val whole = Window.partitionBy()
    val scored = daily
      .withColumn("naive", lag(col("__x"), 1).over(w))
      .withColumn("snaive", lag(col("__x"), 7).over(w))
      .withColumn("__e1", abs(col("__x") - col("naive")))
      .withColumn("__e7", abs(col("__x") - col("snaive")))
    scored
      .withColumn("mae_naive", avg(col("__e1")).over(whole))
      .withColumn("mae_snaive", avg(col("__e7")).over(whole))
      .select(col("day"), round(col("__x"), 2).as("actual"),
        round(col("naive"), 2).as("naive"),
        round(col("snaive"), 2).as("snaive"),
        round(col("__e1"), 2).as("abs_err_naive"),
        round(col("__e7"), 2).as("abs_err_snaive"),
        round(col("mae_naive"), 6).as("mae_naive"),
        round(col("mae_snaive"), 6).as("mae_snaive"),
        when(col("mae_naive") > 0,
          round(col("mae_snaive") / col("mae_naive"), 6)).as("mase"))
      .orderBy("day")
  }

  /** Holt–Winters additive smoothing (level + trend + weekly season)
    * over the daily series: one-step-ahead fitted values and residuals
    * per day — the first REAL forecaster to reach for once a model must
    * beat [[forecastBaseline]]'s naive/seasonal-naive floor. The weekday
    * slot is days-since-epoch mod 7 ([[seasonality]]'s calendar-free
    * convention); smoothing weights default to DYADIC rationals
    * (1/4, 1/8, 1/4) so the complements (3/4, 7/8) are exactly
    * representable doubles in any engine.
    *
    * Determinism: the recursion is inherently sequential, so BOTH
    * engines run the SAME left fold over the day-ordered series — the
    * update expressions are identical fixed double trees (here: one
    * `aggregate` HOF over the sorted day array; oracle: a recursive
    * CTE stepping the same formulas) and IEEE-754 round-to-nearest
    * makes every per-step double bit-identical by induction. Daily
    * sums commit to the centi lattice before entering the fold.
    *
    * Plan: ONE corpus aggregation to the calendar-bounded day grain,
    * then a single 1-row fold over the collected day array (bounded by
    * the calendar — ~2.6k rows for seven years; the PLANS.md
    * bounded-fold contract) exploded back to per-day rows. The corpus
    * stage distributes; the fold is O(days) on one task.
    */
  def holtWinters(df: DataFrame, dateCol: Column, valueCol: String,
                  alpha: Double = 0.25, beta: Double = 0.125,
                  gamma: Double = 0.25): DataFrame = {
    val folded = hwFold(df, dateCol, valueCol, alpha, beta, gamma)
    folded.select(explode(col("__f").getField("out")).as("r"))
      .select(col("r.d").as("day"),
        round(col("r.actual"), 6).as("actual"),
        round(col("r.fitted"), 6).as("fitted"),
        round(col("r.actual") - col("r.fitted"), 6).as("resid"))
      .orderBy("day")
  }

  /** The h-step-ahead forecast off [[holtWinters]]' final state:
    * ŷ(T+h) = level + h·trend + s[slot(T+h)] for h = 1..horizon — the
    * actual forward readout (the per-day query shows the FIT; this one
    * answers "what does next week look like"). Same bit-exact fold;
    * the oracle reads the recursion's final row and steps the same
    * projection tree.
    */
  def holtWintersForecast(df: DataFrame, dateCol: Column,
                          valueCol: String, horizon: Int = 7,
                          alpha: Double = 0.25, beta: Double = 0.125,
                          gamma: Double = 0.25): DataFrame = {
    require(horizon >= 1 && horizon <= 365,
      s"holtWintersForecast: horizon in [1,365] (got $horizon)")
    val folded = hwFold(df, dateCol, valueCol, alpha, beta, gamma)
    val f = col("__f")
    val lastDay = element_at(f.getField("out"),
      size(f.getField("out"))).getField("d")
    folded
      .select(f.getField("lvl").as("__lvl"), f.getField("trd").as("__trd"),
        f.getField("s").as("__s"), lastDay.as("__last"))
      .withColumn("h", explode(expr(s"sequence(1, $horizon)")))
      .withColumn("day", date_add(col("__last"), col("h")))
      .withColumn("forecast", round(col("__lvl") +
        col("h").cast("double") * col("__trd") +
        element_at(col("__s"),
          pmod(datediff(col("day"), lit("1970-01-01").cast("date")),
            lit(7)) + lit(1)), 6))
      .select(col("h"), col("day"), col("forecast"))
      .orderBy("h")
  }

  /** Oaxaca–Blinder twofold decomposition of a group outcome gap
    * (Oaxaca 1973): fit y = α + βx per group by exact-lattice OLS, then
    * split ȳ_A − ȳ_B into the ENDOWMENT part β_B·(x̄_A − x̄_B) ("group A
    * simply has more x, priced at B's rate") and the COEFFICIENT part
    * (the rest: different slopes/intercepts) — the standard audit for
    * "is this gap composition or treatment" in pricing/pay-gap
    * analyses. Group B is the reference.
    *
    * Determinism: x and y both commit to the centi lattice per row;
    * per-group OLS sums are exact 128-bit integers (the q_ransac_fit
    * refit machinery); every mean/β/share is one fixed double tree.
    *
    * Plan: ONE corpus aggregation folding both groups' five sufficient
    * statistics in a single pass; a 1-row projection after. No window,
    * no join.
    */
  def oaxacaBlinder(df: DataFrame, groupCol: String, groupA: String,
                    groupB: String, xCol: String,
                    yCol: String): DataFrame = {
    require(groupA != groupB,
      s"oaxacaBlinder: groups must differ (got '$groupA' twice)")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val xc = round(col(xCol) * 100, 0).cast("long")
    val yc = round(col(yCol) * 100, 0).cast("long")
    val inA = col(groupCol) === groupA
    val inB = col(groupCol) === groupB
    def sums(flag: Column, tag: String) = Seq(
      count(when(flag, lit(1))).as(s"n$tag"),
      coalesce(sum(when(flag, xc)), lit(0L)).as(s"sx$tag"),
      coalesce(sum(when(flag, yc)), lit(0L)).as(s"sy$tag"),
      coalesce(sum(when(flag, dec(xc) * yc)),
        lit(0L).cast("decimal(38,0)")).as(s"sxy$tag"),
      coalesce(sum(when(flag, dec(xc) * xc)),
        lit(0L).cast("decimal(38,0)")).as(s"sxx$tag"))
    val allSums = sums(inA, "a") ++ sums(inB, "b")
    val f = df.filter((inA || inB) && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .agg(allSums.head, allSums.tail: _*)
    def d(c: String) = col(c).cast("double")
    def fit(tag: String): (Column, Column, Column, Column) = {
      val nD = d(s"n$tag")
      val mx = d(s"sx$tag") / (lit(100.0) * nD)
      val my = d(s"sy$tag") / (lit(100.0) * nD)
      val cxy = d(s"sxy$tag") - d(s"sx$tag") * d(s"sy$tag") / nD
      val cxx = d(s"sxx$tag") - d(s"sx$tag") * d(s"sx$tag") / nD
      (mx, my, cxy / cxx, col(s"n$tag") >= 2 && cxx > 0)
    }
    val (mxa, mya, ba, oka) = fit("a")
    val (mxb, myb, bb, okb) = fit("b")
    val ok = oka && okb
    val gap = mya - myb
    val explained = bb * (mxa - mxb)
    f.select(col("na").as("n_a"), col("nb").as("n_b"),
      round(when(col("na") >= 1, mya), 6).as("mean_y_a"),
      round(when(col("nb") >= 1, myb), 6).as("mean_y_b"),
      round(when(col("na") >= 1 && col("nb") >= 1, gap), 6).as("gap"),
      round(when(oka, ba), 6).as("beta_a"),
      round(when(okb, bb), 6).as("beta_b"),
      round(when(ok, explained), 6).as("endowment_part"),
      round(when(ok, gap - explained), 6).as("coefficient_part"),
      round(when(ok && gap =!= 0.0, explained / gap), 6)
        .as("endowment_share"))
  }

  /** Discrete periodogram over candidate periods — FINDS the cycle the
    * seasonality family assumes (q_seasonality hardcodes period 7): for
    * each candidate period p the mean-centered daily series projects
    * onto cos/sin(2πt/p), and spectral power (C²+S²) is reported as a
    * share of the candidate set's total, dominant period flagged.
    *
    * Determinism: the series centers WITHOUT division (ỹ_t = y_t·n − Σy,
    * exact longs); each trig value commits to the 1e-9 lattice per
    * (day, period) cell — the only transcendentals — so the projections
    * are exact 128-bit integer folds and the power shares are one fixed
    * double tree. Ranks break ties by period.
    *
    * Plan: one day-grain aggregation, a ×|periods| bounded fan-out on
    * the calendar-bounded series (the q_hurst replication class), one
    * period-grain fold, a ≤|periods|-row ranking window.
    */
  def periodogram(df: DataFrame, dateCol: Column, valueCol: String,
                  minPeriod: Int = 2, maxPeriod: Int = 30): DataFrame = {
    require(minPeriod >= 2 && maxPeriod > minPeriod && maxPeriod <= 366,
      s"periodogram: need 2 <= min < max <= 366 (got $minPeriod..$maxPeriod)")
    val daily = df.groupBy(dateCol.as("__d"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("__yc"))
    val w = Window.orderBy(col("__d"))
    val seq0 = daily.withColumn("__t", row_number().over(w).cast("long"))
    val tot = seq0.agg(sum(col("__yc")).as("__s"),
      count(lit(1)).as("__n"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val twoPi = lit(6.283185307179586)
    val cells = seq0.crossJoin(broadcast(tot))
      .withColumn("__yt", col("__yc") * col("__n") - col("__s"))
      .withColumn("__p", explode(array(
        (minPeriod to maxPeriod).map(p => lit(p.toLong)): _*)))
      .withColumn("__c9",
        round(cos(twoPi * col("__t").cast("double") /
          col("__p").cast("double")) * 1e9, 0).cast("long"))
      .withColumn("__s9",
        round(sin(twoPi * col("__t").cast("double") /
          col("__p").cast("double")) * 1e9, 0).cast("long"))
    val proj = cells.groupBy(col("__p"))
      .agg(sum(dec(col("__yt")) * col("__c9")).as("__cp"),
        sum(dec(col("__yt")) * col("__s9")).as("__sp"))
      .withColumn("__pow",
        col("__cp").cast("double") * col("__cp").cast("double") +
          col("__sp").cast("double") * col("__sp").cast("double"))
    val all = Window.partitionBy()
    val rk = Window.orderBy(col("__pow").desc, col("__p").asc)
    proj
      .withColumn("power_share",
        round(col("__pow") / sum(col("__pow")).over(all), 6))
      .withColumn("rank", row_number().over(rk).cast("long"))
      .select(col("__p").as("period"), col("power_share"), col("rank"),
        (col("rank") === 1L).as("dominant"))
      .orderBy("period")
  }

  /** Kleinberg burst detection (Kleinberg 2002, "Bursty and Hierarchical
    * Structure in Streams", 2-state automaton): each day is in the base
    * state (Poisson rate λ₀ = corpus mean) or the burst state (λ₁ = s·λ₀);
    * day costs are the negative Poisson log-likelihoods WITH the ln(c!)
    * term dropped (identical across states, so the argmin is unchanged)
    * and entering a burst costs γ·ln(n). The Viterbi argmin path labels
    * every day — the principled "is this surge sustained enough to be a
    * burst" detector next to the CUSUM/EWMA threshold fences.
    *
    * Determinism: the per-day costs are EXACT integers — A_q − c·B_q with
    * A_q = round(λ_q·1e9), B_q = round(ln λ_q·1e9) committed once on the
    * lattice — so the whole DP is integer arithmetic (the q_dtw_distance
    * contract) and the oracle replays it day per day in one recursive
    * CTE. Ties prefer the LOWER state at every cell.
    *
    * Plan: one day-grain aggregation (the only corpus-sized stage); the
    * DP and both argmax paths ride in ONE row's aggregate fold
    * (calendar-bounded array); one final explode back to days.
    */
  def kleinbergBursts(df: DataFrame, dateCol: Column, s: Double = 2.0,
                      gamma: Double = 0.5): DataFrame = {
    require(s > 1.0 && s <= 16.0,
      s"kleinbergBursts: s in (1, 16] (got $s)")
    require(gamma > 0.0 && gamma <= 8.0,
      s"kleinbergBursts: gamma in (0, 8] (got $gamma)")
    val daily = df.groupBy(dateCol.as("day"))
      .agg(count(lit(1)).as("__c"))
    val arr = daily.agg(
      sort_array(collect_list(struct(col("day"), col("__c")))).as("__a"),
      sum(col("__c")).as("__tot"), count(lit(1)).as("__n"))
    val lam0 = col("__tot").cast("double") / col("__n").cast("double")
    val lam1 = lam0 * lit(s)
    val base = arr.select(col("__a"),
      round(lam0 * 1e9, 0).cast("long").as("__a0"),
      round(log(lam0) * 1e9, 0).cast("long").as("__b0"),
      round(lam1 * 1e9, 0).cast("long").as("__a1"),
      round(log(lam1) * 1e9, 0).cast("long").as("__b1"),
      round(log(col("__n").cast("double")) * lit(gamma) * 1e9, 0)
        .cast("long").as("__t"),
      round(lam0, 6).as("__l0"), round(lam1, 6).as("__l1"))
    val init = struct(lit(0L).as("d0"),
      lit(Long.MaxValue / 4).as("d1"),
      array().cast("array<int>").as("p0"),
      array().cast("array<int>").as("p1"))
    val folded = base.select(col("__a"), col("__l0"), col("__l1"),
      aggregate(col("__a"), init, (acc, x) => {
        val c = x.getField("__c")
        val cost0 = col("__a0") - c * col("__b0")
        val cost1 = col("__a1") - c * col("__b1")
        val enter = acc.getField("d0") + col("__t")
        struct(
          (cost0 + least(acc.getField("d0"), acc.getField("d1"))).as("d0"),
          (cost1 + least(enter, acc.getField("d1"))).as("d1"),
          concat(when(acc.getField("d0") <= acc.getField("d1"),
            acc.getField("p0")).otherwise(acc.getField("p1")),
            array(lit(0))).as("p0"),
          concat(when(enter <= acc.getField("d1"),
            acc.getField("p0")).otherwise(acc.getField("p1")),
            array(lit(1))).as("p1"))
      }).as("__f"))
    val path = when(col("__f.d0") <= col("__f.d1"), col("__f.p0"))
      .otherwise(col("__f.p1"))
    folded
      .select(col("__l0"), col("__l1"),
        explode(zip_with(col("__a"), path, (d, st) =>
          struct(d.getField("day").as("day"), d.getField("__c").as("n"),
            st.as("state")))).as("r"))
      .select(col("r.day").as("day"), col("r.n").as("n_orders"),
        col("r.state").as("state"), col("__l0").as("lambda_base"),
        col("__l1").as("lambda_burst"))
      .orderBy("day")
  }

  private def hwFold(df: DataFrame, dateCol: Column, valueCol: String,
                     alpha: Double, beta: Double,
                     gamma: Double): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta >= 0 && beta < 1 &&
      gamma >= 0 && gamma < 1,
      s"holtWinters: weights in (0,1) (got $alpha/$beta/$gamma)")
    val daily = df.groupBy(dateCol.as("__d"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("__yc"))
    val arr = daily.agg(sort_array(collect_list(
      struct(col("__d").as("d"), col("__yc").as("yc")))).as("__a"))
    val init = struct(lit(0).as("n"), lit(0.0).as("lvl"),
      lit(0.0).as("trd"), array_repeat(lit(0.0), 7).as("s"),
      array().cast("array<struct<d:date,actual:double,fitted:double>>")
        .as("out"))
    val folded = arr.select(aggregate(col("__a"), init, (acc, x) => {
      val d = x.getField("d")
      val y = x.getField("yc").cast("double") / lit(100.0)
      val slot = pmod(
        datediff(d, lit("1970-01-01").cast("date")), lit(7))
      val sPrev = element_at(acc.getField("s"), slot + lit(1))
      val first = acc.getField("n") === 0
      val fitted = when(first, y)
        .otherwise(acc.getField("lvl") + acc.getField("trd") + sPrev)
      val lvlNew = when(first, y)
        .otherwise(lit(alpha) * (y - sPrev) +
          lit(1.0 - alpha) * (acc.getField("lvl") + acc.getField("trd")))
      val trdNew = when(first, lit(0.0))
        .otherwise(lit(beta) * (lvlNew - acc.getField("lvl")) +
          lit(1.0 - beta) * acc.getField("trd"))
      val sNew = when(first, acc.getField("s")).otherwise(
        zip_with(acc.getField("s"), sequence(lit(1), lit(7)), (v, i) =>
          when(i === slot + lit(1),
            lit(gamma) * (y - lvlNew) + lit(1.0 - gamma) * v)
            .otherwise(v)))
      struct((acc.getField("n") + lit(1)).as("n"), lvlNew.as("lvl"),
        trdNew.as("trd"), sNew.as("s"),
        concat(acc.getField("out"), array(struct(d.as("d"),
          y.as("actual"), fitted.as("fitted")))).as("out"))
    }).as("__f"))
    folded
  }

  /** Additive seasonal decomposition of a daily series with period 7:
    * trend = centered 7-day moving average (NULL on the 3-day edges, no
    * silent partial windows), seasonal = the mean detrended value of the
    * day's weekday slot re-centered to sum to zero across the 7 slots,
    * residual = observed − trend − seasonal. The weekday slot is computed
    * as `days-since-epoch mod 7` — calendar-free, so Spark and any oracle
    * engine agree without touching their (incompatible) DOW conventions.
    *
    * Plan: one day-grain aggregation (corpus-sized stage), a 7-row-frame
    * window over the calendar-bounded series, a 7-row slot aggregate
    * broadcast back. Bounded everywhere past the first shuffle.
    */
  def seasonality(df: DataFrame, dateCol: Column,
                  valueCol: String): DataFrame = {
    val daily = df
      .groupBy(dateCol.as("day"))
      .agg(sum(col(valueCol)).as("__x"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1970-01-01").cast("date")), lit(7)))
    val ma = Window.partitionBy().orderBy(col("day")).rowsBetween(-3, 3)
    val trended = daily
      .withColumn("trend",
        when(count(lit(1)).over(ma) === 7, avg(col("__x")).over(ma)))
      .withColumn("__detr", col("__x") - col("trend"))
    val slotAll = Window.partitionBy()
    val slots = trended
      .groupBy(col("dow").as("__sd"))
      .agg(avg(col("__detr")).as("__raw"))
      .withColumn("__seas", col("__raw") - avg(col("__raw")).over(slotAll))
      .select(col("__sd"), col("__seas"))
    trended
      .join(broadcast(slots), col("dow") === col("__sd"), "left")
      .select(col("day"), col("dow"),
        round(col("__x"), 2).as("revenue"),
        round(col("trend"), 6).as("trend"),
        round(col("__seas"), 6).as("seasonal"),
        round(col("__x") - col("trend") - col("__seas"), 6).as("residual"))
      .orderBy("day")
  }

  /** Seasonal anomaly days: [[seasonality]]'s residual (observed −
    * trend − weekday effect) fenced by the residual distribution's own
    * median ± k·MAD — the robust "is today WEIRD given the trend and
    * the weekday" alarm (a z-fence inflates under exactly the heavy
    * days it should flag; the MAD fence has 50% breakdown). Emits the
    * flagged days with the fence beside them. Fences fold the ROUNDED
    * residual (the engine-stable 6 dp quantity, the
    * [[graft.ops.Learn.logisticMetrics]] chaining rule).
    *
    * Plan: the [[seasonality]] chain (bounded day-grain windows), two
    * exact percentile folds over the ≤|days| residual frame, one
    * bounded filter. Day grain everywhere after the first aggregation.
    */
  def seasonalAnomalies(df: DataFrame, dateCol: Column,
                        valueCol: String, k: Double = 3.0): DataFrame = {
    require(k > 0, s"seasonalAnomalies: k > 0 (got $k)")
    val resid = seasonality(df, dateCol, valueCol)
      .filter(col("residual").isNotNull)
      .select(col("day"), col("revenue"), col("residual"))
    val med = resid.agg(expr("percentile(residual, 0.5D)").as("med"))
    val fences = resid.crossJoin(broadcast(med))
      .agg(min(col("med")).as("med"),
        expr("percentile(abs(residual - med), 0.5D)").as("mad"))
    resid.crossJoin(broadcast(fences))
      .filter(abs(col("residual") - col("med")) > col("mad") * k)
      .select(col("day"), col("revenue"),
        col("residual"),
        round(col("med"), 6).as("resid_median"),
        round(col("mad"), 6).as("resid_mad"),
        round(col("mad") * k, 6).as("fence"))
      .orderBy("day")
  }

  /** Time-to-convert latency distribution: for each user, the delay from
    * their FIRST `fromType` event to their first `toType` event at or
    * after it, summarized in one row (population, converted count, rate,
    * mean and exact p50/p90 latency seconds). The funnel query
    * (`q_funnel`) reports stage COUNTS; this is the latency complement —
    * "how long does conversion take", the metric that sizes attribution
    * windows and TTLs. Both stage frames are one-row-per-user bounded
    * aggregates; the final fold is a single 1-row summary.
    */
  def timeToConvert(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, fromType: String,
                    toType: String): DataFrame = {
    val first = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t0"))
    val conv = events.filter(col(typeCol) === toType)
      .join(first, userCol)
      .filter(col(tsCol) >= col("__t0"))
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t1"))
    first.join(conv, Seq(userCol), "left")
      .select(col("__t0"),
        ((unix_micros(col("__t1").cast("timestamp")) -
          unix_micros(col("__t0").cast("timestamp"))) / 1000000.0)
          .as("__lat"))
      .agg(
        count(lit(1)).as("n_from"),
        count(col("__lat")).as("n_converted"),
        round(count(col("__lat")) / count(lit(1)).cast("double"), 6)
          .as("conversion_rate"),
        round(avg(col("__lat")), 6).as("avg_latency_s"),
        round(expr("percentile(__lat, 0.5D)"), 6).as("p50_latency_s"),
        round(expr("percentile(__lat, 0.9D)"), 6).as("p90_latency_s"))
  }

  /** Cohen's kappa agreement between two categorical label columns —
    * chance-corrected accuracy, the standard readout for classifier-vs-
    * gold (or annotator-vs-annotator) label quality. Rows where either
    * side is NULL are excluded (unlabeled items carry no agreement
    * information).
    *
    * ONE shuffled aggregation builds the (a, b) joint count table
    * (bounded by |domain(a)|·|domain(b)|, never corpus-sized); observed
    * agreement, marginal-product chance agreement and kappa all fold
    * from that KB-sized table. Kappa is recomputed from the ROUNDED
    * po/pe the row exposes (the `q_auc`→gini precedent) so both engines
    * chain identically. Perfect chance agreement (pe = 1: both sides
    * constant) yields NULL kappa — 0/0 has no defined agreement.
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val joint = df
      .select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
    val na = joint.groupBy("a").agg(sum("n").as("na"))
    val nb = joint.groupBy("b").agg(sum("n").as("nb"))
    val tot = joint.agg(sum("n").cast("double").as("__t"),
      coalesce(sum(when(col("a") === col("b"), col("n"))), lit(0L))
        .cast("double").as("__agree"))
    val pe = na.join(nb, col("a") === col("b"))
      .crossJoin(broadcast(tot))
      .agg(coalesce(sum(col("na").cast("double") * col("nb") /
        (col("__t") * col("__t"))), lit(0.0)).as("__pe"))
    tot.crossJoin(broadcast(pe))
      .select(col("__t").cast("long").as("n_items"),
        round(col("__agree") / col("__t"), 6).as("po"),
        round(col("__pe"), 6).as("pe"))
      .withColumn("kappa",
        when(col("pe") < 1.0,
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6)))
  }

  /** Calibration / reliability readout for a probabilistic scorer — the
    * check a quality-filter model gets before its scores become sampling
    * weights (a miscalibrated filter silently reweights the corpus):
    * equal-width probability bins, each with its mean predicted
    * probability, empirical positive rate, the |gap| between them, and
    * the bin's share of all rows. ECE = Σ share·gap over the (bounded)
    * bin frame — emitted on every row so the report is self-contained.
    *
    * One keyed aggregation at bin grain (≤ `bins` final rows) + a
    * broadcast total; `gap` chains from the ROUNDED bin aggregates (the
    * kappa/gini precedent) so both engines compute it identically. The
    * right-edge probability 1.0 folds into the last bin.
    */
  def calibration(df: DataFrame, probCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"calibration: bins in [2, 1000]")
    val binned = df.withColumn("bin",
        least(floor(col(probCol) * bins), lit(bins - 1)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(sum(col(probCol)) / count(lit(1)).cast("double"), 6)
          .as("mean_prob"),
        round(sum(col(labelCol).cast("double"))
          / count(lit(1)).cast("double"), 6).as("frac_pos"))
      .withColumn("gap", round(abs(col("mean_prob") - col("frac_pos")), 6))
    val tot = binned.agg(sum(col("n")).cast("double").as("__t"))
    val withShare = binned.crossJoin(broadcast(tot))
      .withColumn("share", round(col("n") / col("__t"), 6))
    val ece = withShare
      .agg(round(sum(col("n") / col("__t") * col("gap")), 6).as("__ece"))
    withShare.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("mean_prob"), col("frac_pos"),
        col("gap"), col("share"), col("__ece").as("ece"))
      .orderBy(col("bin"))
  }

  /** Multi-touch attribution over an event stream: for every conversion,
    * the touches (caller-defined predicate) in the `lookback` window
    * strictly BEFORE it; credit assigned under the two standard models at
    * once — last-touch (1.0 to the latest touch, ties broken by event id)
    * and linear (1/n to each of the n touches). Conversions with no touch
    * in window report under the `(none)` channel so per-model credit
    * totals reconcile to the conversion count.
    *
    * Scale shape: the touch×conversion pairing is the BINNED
    * [[Retrieval.intervalJoin]] (daily-bin equi-join, never a nested
    * loop); per-conversion windows (n, latest) partition by conversion id
    * over the matched pairs — bounded by touches-per-window, never
    * corpus-wide; the final fold is one keyed aggregation per channel.
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, channelCol: String, isTouch: Column,
                  isConv: Column, lookback: String): DataFrame = {
    val touches = events.filter(isTouch)
      .select(col(userCol), col(channelCol).as("__channel"),
        col(tsCol).as("__t_ts"), col(idCol).as("__t_id"))
    val convs = events.filter(isConv)
      .select(col(userCol), col(tsCol).as("__c_ts"), col(idCol).as("__c_id"))
      .withColumn("__w_start", col("__c_ts") - expr(s"INTERVAL $lookback"))
    // two consumers (credit windows + the unattributed anti-join):
    // checkpoint so the interval join runs once, not per consumer
    val matched = graft.ops.Retrieval.intervalJoin(
      touches, convs, Seq(userCol), "__t_ts", "__w_start", "__c_ts")
      .localCheckpoint(eager = false)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__c_id"))
    val wOrd = w.orderBy(col("__t_ts").desc, col("__t_id").desc)
    val credited = matched
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(wOrd))
    val perChannel = credited.groupBy(col("__channel").as("channel"))
      .agg(
        sum(when(col("__rn") === 1, 1).otherwise(0)).cast("long")
          .as("last_touch_convs"),
        round(sum(lit(1.0) / col("__n")), 6).as("linear_credit"),
        count(lit(1)).cast("long").as("touches"))
    val unattributed = convs
      .join(matched.select(col("__c_id")).distinct(), Seq("__c_id"),
        "left_anti")
      .agg(count(lit(1)).cast("long").as("last_touch_convs"))
      .select(lit("(none)").as("channel"), col("last_touch_convs"),
        lit(0.0).as("linear_credit"), lit(0L).as("touches"))
    perChannel.unionByName(unattributed).orderBy("channel")
  }

  /** Split-conformal prediction audit (one row): fit a groupwise-mean
    * baseline on the TRAIN split, take the ⌈(n+1)(1−α)⌉-th smallest
    * absolute residual on the CALIBRATION split as the interval half-width
    * q̂ (the EXACT order statistic — no interpolation, so both engines
    * elect the identical value), and report empirical coverage of
    * `pred ± q̂` on the TEST split. Split-conformal's guarantee — coverage
    * ≥ 1−α for ANY model, assuming exchangeability — is the
    * distribution-free error bar a feature store can attach to every
    * served prediction without trusting the model; the audit checks the
    * guarantee holds on held-out data.
    *
    * Splits come from the caller's deterministic hash column (0=train,
    * 1=calibration, 2=test). Scale shape: the model and coverage passes
    * are keyed aggregations; the order statistic is the exact
    * `percentile` AGGREGATE evaluated at the integral index
    * p = (k−1)/(n−1) — index p·(n−1) = k−1 exactly, so no interpolation
    * happens and no global sort window enters the plan (the calibration
    * count is the one bounded 1-row `.head()`, the heavyHitters-total
    * precedent; swap `percentile` for `percentile_approx` at 100 TB like
    * the q_percentiles family documents).
    */
  def conformal(df: DataFrame, idCol: String, groupCol: String,
                valueCol: String, splitCol: String,
                alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0,
      s"conformal: alpha in (0,1) (got $alpha)")
    val model = df.filter(col(splitCol) === 0)
      .groupBy(col(groupCol))
      .agg((sum(col(valueCol)) / count(lit(1))).as("__pred"))
    val scored = df.filter(col(splitCol) =!= 0)
      .join(broadcast(model), Seq(groupCol)) // groups absent in train drop
      // residuals rounded BEFORE the order statistic and the coverage
      // comparison: both engines then rank/compare identical values, so
      // a test residual exactly tying q-hat cannot flip on float noise
      .withColumn("__resid", round(abs(col(valueCol) - col("__pred")), 6))
    val cal = scored.filter(col(splitCol) === 1)
    val n = cal.agg(count(lit(1))).head().getLong(0)
    require(n >= 2, s"conformal: calibration split needs >= 2 rows (got $n)")
    // k = ceil((n+1)(1-alpha)) clamped to n (alpha below 1/(n+1) would
    // demand an order statistic past the sample — report the max)
    val k = math.min(n, math.ceil((n + 1) * (1.0 - alpha)).toLong)
    // re-rounded at 6: percentile's integral-index evaluation can sit a
    // few ulp below the true k-th order statistic; the residuals are
    // 6-rounded, so re-rounding restores exact equality for the <=
    // coverage comparison. The percentage is a typed DOUBLE literal —
    // a "a.b / c.d" SQL string would parse as DECIMAL division, truncate
    // the ratio at ~7 digits, and shift the interpolation off the
    // integral index (observed: q-hat landing between order statistics).
    val qhat = cal.agg(
      round(percentile(col("__resid"),
        lit((k - 1).toDouble / (n - 1).toDouble)), 6).as("__qhat"))
    val test = scored.filter(col(splitCol) === 2)
    test.crossJoin(broadcast(qhat))
      .agg(
        count(lit(1)).cast("long").as("n_test"),
        lit(n).as("n_cal"),
        min(col("__qhat")).as("q_hat"),
        lit(1.0 - alpha).as("target_coverage"),
        round(sum(when(col("__resid") <= col("__qhat"), 1).otherwise(0))
          / count(lit(1)).cast("double"), 6).as("coverage"))
      .withColumn("covered", col("coverage") >= col("target_coverage"))
  }

  /** Uplift / Qini readout of a targeting score over the hash-randomized
    * experiment of [[abTest]]: users fold to (converted, score, arm),
    * score quantile cuts split them into `bands` equal-population bands
    * (band 1 = TOP scores — the targeting order), and each band reports
    * treated/control conversion rates, their difference (the band's
    * uplift — a GOOD targeting score concentrates uplift in band 1), and
    * the cumulative Qini number Q(d) = cumConvT − cumConvC·(cumNT/cumNC)
    * — the incremental conversions earned by treating only the top d
    * bands, the area under which is the Qini coefficient.
    *
    * Plan: one corpus aggregation to user grain, one broadcast
    * quantile-cut assignment (the [[rfmSegments]] pattern — no global
    * sort; cuts are rounded so both engines band identical values), one
    * keyed band aggregation, then cumulative windows over the ≤20-row
    * band table. Everything downstream of the user fold is integer
    * counts and single divisions — engine-exact by construction.
    */
  def upliftBands(df: DataFrame, userCol: String, isConv: Column,
                  scoreAgg: Column, bands: Int = 5,
                  channel: Long = 59L): DataFrame = {
    require(bands >= 2 && bands <= 20,
      s"upliftBands: bands in [2, 20] (got $bands)")
    val users = df.groupBy(col(userCol))
      .agg(max(isConv.cast("int")).as("__conv"),
        round(scoreAgg.cast("double"), 6).as("__score"))
      .withColumn("__t", Gen.u01(col(userCol), channel) > 0.5)
    val cutExprs = (1 until bands).map(i =>
      round(percentile(col("__score"), lit(i.toDouble / bands)), 6)
        .as(s"__c$i"))
    val cuts = users.agg(cutExprs.head, cutExprs.tail: _*)
    val banded = users.crossJoin(broadcast(cuts))
      .withColumn("band",
        lit(bands) - (1 until bands).map(i =>
          when(col("__score") > col(s"__c$i"), 1).otherwise(0))
          .reduce(_ + _))
    val per = banded.groupBy("band").agg(
      count(when(col("__t"), 1)).as("n_treat"),
      count(when(!col("__t"), 1)).as("n_ctrl"),
      coalesce(sum(when(col("__t"), col("__conv"))), lit(0)).cast("long")
        .as("conv_treat"),
      coalesce(sum(when(!col("__t"), col("__conv"))), lit(0)).cast("long")
        .as("conv_ctrl"))
    val w = Window.orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("rate_treat", when(col("n_treat") > 0,
        round(col("conv_treat") / col("n_treat").cast("double"), 6)))
      .withColumn("rate_ctrl", when(col("n_ctrl") > 0,
        round(col("conv_ctrl") / col("n_ctrl").cast("double"), 6)))
      .withColumn("uplift", when(col("n_treat") > 0 && col("n_ctrl") > 0,
        round(col("conv_treat") / col("n_treat").cast("double")
          - col("conv_ctrl") / col("n_ctrl").cast("double"), 6)))
      .withColumn("qini", when(sum(col("n_ctrl")).over(w) > 0,
        round(sum(col("conv_treat")).over(w)
          - sum(col("conv_ctrl")).over(w)
            * (sum(col("n_treat")).over(w).cast("double")
              / sum(col("n_ctrl")).over(w)), 6)))
      .orderBy("band")
  }

  /** Off-policy evaluation of a deterministic target policy from logged
    * bandit feedback — the "would the new recommendation rule beat what
    * we logged?" readout computed WITHOUT an online experiment. One row:
    * the four standard estimators over (logged action, reward, target
    * action) — DM (direct method: the reward model's score of the
    * target policy, biased when the model is), IPS (inverse-propensity,
    * unbiased, high variance), SNIPS (self-normalized IPS — the weight
    * renormalization that trades a vanishing bias for much lower
    * variance), and DR (doubly robust: DM baseline + IPS correction of
    * its residual; unbiased if EITHER the propensities or the reward
    * model are right). Propensities are the logging policy's empirical
    * action frequencies; the reward model is the per-action mean —
    * both estimated from the same log, the standard offline protocol.
    *
    * Plan: one bounded action-frequency aggregate (broadcast), two
    * broadcast lookups (logged and target action), then ONE corpus pass
    * folding the per-row estimator terms. Float determinism: every
    * per-row term is committed to the 1e-6 integer lattice BEFORE the
    * fold (per-row scalar chains are engine-identical; only SUM order
    * isn't), and rewards ride the centi lattice, so every sum is exact
    * long addition — the q_price_elasticity rule applied to estimator
    * sums. Rows whose target action never appears in the log take
    * rhat(π)=0 (DM scores what the model knows; IPS/SNIPS are unaffected
    * since the weight is 0 there anyway).
    */
  def offPolicyEval(df: DataFrame, actionCol: String, rewardCol: String,
                    targetCol: String): DataFrame = {
    val base = df.select(col(actionCol).as("__a"), col(targetCol).as("__pi"),
      round(col(rewardCol) * 100, 0).cast("long").as("__rc"))
    val freq = base.groupBy("__a")
      .agg(count(lit(1)).as("__na"), sum(col("__rc")).as("__sc"))
      .withColumn("__rhat", col("__sc") / (lit(100.0) * col("__na")))
    val tot = base.agg(count(lit(1)).as("__n"))
    val scored = base
      .join(broadcast(freq.select(col("__a"), col("__na"), col("__rhat"))),
        Seq("__a"))
      .join(broadcast(freq.select(col("__a").as("__pi"),
        col("__rhat").as("__rhat_pi"))), Seq("__pi"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("__w", when(col("__a") === col("__pi"),
        col("__n").cast("double") / col("__na").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("__r", col("__rc").cast("double") / lit(100.0))
      .withColumn("__rp", coalesce(col("__rhat_pi"), lit(0.0)))
    val folded = scored.agg(
      count(lit(1)).as("n_logged"),
      sum(when(col("__a") === col("__pi"), 1L).otherwise(0L)).as("__match"),
      // per-row lattice terms stay exact longs; the SUM container is
      // decimal(38,0) because the importance-weight products are
      // O(n/n_arm)·1e6 per row — a long sum overflows near Σterms 9.2e18,
      // which a skewed logging policy reaches at scale (round-12 audit of
      // the ADVICE Long-overflow shape); DuckDB's BIGINT sum is HUGEINT
      // so the oracle already had the exact semantics
      sum(round(col("__w") * lit(1000000.0), 0).cast("decimal(38,0)"))
        .as("__wm"),
      sum(round(col("__w") * col("__r") * lit(1000000.0), 0)
        .cast("decimal(38,0)")).as("__im"),
      sum(round(col("__rp") * lit(1000000.0), 0).cast("decimal(38,0)"))
        .as("__dm"),
      sum(round((col("__rp") + col("__w") * (col("__r") - col("__rhat")))
        * lit(1000000.0), 0).cast("decimal(38,0)")).as("__drm"))
    folded.select(
      col("n_logged"),
      round(col("__match").cast("double") / col("n_logged"), 6)
        .as("match_rate"),
      round(col("__dm") / lit(1000000.0) / col("n_logged"), 6).as("dm"),
      round(col("__im") / lit(1000000.0) / col("n_logged"), 6).as("ips"),
      when(col("__wm") > 0,
        round(col("__im").cast("double") / col("__wm"), 6)).as("snips"),
      round(col("__drm") / lit(1000000.0) / col("n_logged"), 6).as("dr"))
  }

  /** Propensity-style caliper matching ATT: each treated user matches
    * its nearest control BY SCORE within a caliper (with replacement —
    * the deterministic, order-free variant; greedy without-replacement
    * matching is sequential by construction), and the average
    * treated-minus-matched-control outcome estimates the effect on the
    * treated. Reported next to the naive arm-mean difference — the gap
    * between them is what matching corrected. Unmatched treated users
    * (no control within the caliper) are excluded and counted.
    *
    * Plan: one user-grain fold, then a BIN-BANDED candidate join —
    * scores bucket at caliper width and each treated row probes only
    * its own and adjacent buckets (never treated × controls), the
    * [[Dedup]] blocking idiom; the nearest pick is a per-treated-user
    * window with (rounded distance, control id) tie-break. Outcomes on
    * the centi lattice; ATT is one exact-sum division.
    */
  def psmAtt(df: DataFrame, userCol: String, scoreAgg: Column,
             outcomeAgg: Column, caliper: Double,
             channel: Long = 59L): DataFrame = {
    require(caliper > 0, s"psmAtt: caliper > 0 (got $caliper)")
    val users = df.groupBy(col(userCol).as("__u"))
      .agg(round(scoreAgg.cast("double"), 6).as("__score"),
        round(outcomeAgg.cast("double") * 100, 0).cast("long").as("__yc"))
      .withColumn("__t", Gen.u01(col("__u"), channel) > 0.5)
      .withColumn("__bin", floor(col("__score") / lit(caliper)).cast("long"))
    val treated = users.filter(col("__t"))
      .select(col("__u").as("__tid"), col("__score").as("__ts"),
        col("__yc").as("__ty"), col("__bin"))
    val controls = users.filter(!col("__t"))
      .select(col("__u").as("__cid"), col("__score").as("__cs"),
        col("__yc").as("__cy"), col("__bin").as("__jb"))
    val cand = treated
      .withColumn("__nb", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__jb", col("__bin") + col("__nb"))
      .join(controls, Seq("__jb"))
      .withColumn("__d", round(abs(col("__ts") - col("__cs")), 6))
      .filter(col("__d") <= caliper)
    val pickW = Window.partitionBy(col("__tid"))
      .orderBy(col("__d"), col("__cid"))
    val matched = cand
      .withColumn("__rn", row_number().over(pickW))
      .filter(col("__rn") === 1)
    val m = matched.agg(
      count(lit(1)).as("n_matched"),
      sum(col("__ty") - col("__cy")).as("__dsum"))
    val arms = users.agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("n_treated"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("n_control"),
      sum(when(col("__t"), col("__yc"))).as("__st"),
      sum(when(!col("__t"), col("__yc"))).as("__sc"))
    arms.crossJoin(broadcast(m)).select(
      col("n_treated"), col("n_control"), col("n_matched"),
      round(col("n_matched").cast("double") / col("n_treated"), 6)
        .as("match_rate"),
      round(col("__st") / (lit(100.0) * col("n_treated"))
        - col("__sc") / (lit(100.0) * col("n_control")), 6)
        .as("naive_diff"),
      when(col("n_matched") > 0,
        round(col("__dsum") / (lit(100.0) * col("n_matched")), 6))
        .as("att"))
  }

  /** Seasonal-strength summary of the [[seasonality]] decomposition
    * (Hyndman's F_s): 1 − Var(residual)/Var(seasonal + residual),
    * clamped at 0 — the one-number "is the weekly pattern real" readout
    * over the decomposition's full-window days. Components enter on the
    * WHOLE-unit integer lattice (daily aggregates are large, so a centi
    * lattice would overflow the squared sums; unit rounding is far
    * below the variance scale), so both variances come from exact long
    * sums and the ratio is a single engine-identical double chain.
    */
  def seasonalStrength(df: DataFrame, dateCol: Column,
                       valueCol: String): DataFrame = {
    val dec = seasonality(df, dateCol, valueCol)
      .filter(col("residual").isNotNull)
      .select(round(col("residual"), 0).cast("long").as("__r"),
        round(col("seasonal") + col("residual"), 0).cast("long")
          .as("__sr"))
    val folded = dec.agg(count(lit(1)).as("n_days"),
      sum(col("__r")).as("__s1"), sum(col("__r") * col("__r")).as("__q1"),
      sum(col("__sr")).as("__s2"),
      sum(col("__sr") * col("__sr")).as("__q2"))
    val m1 = col("__s1").cast("double") / col("n_days")
    val m2 = col("__s2").cast("double") / col("n_days")
    val vr = col("__q1").cast("double") / col("n_days") - m1 * m1
    val vsr = col("__q2").cast("double") / col("n_days") - m2 * m2
    folded.select(col("n_days"),
      round(vr, 6).as("var_residual"),
      round(vsr, 6).as("var_detrended"),
      when(vsr > 0.0,
        round(greatest(lit(0.0), lit(1.0) - vr / vsr), 6))
        .as("seasonal_strength"))
  }

  /** Two-sample log-rank test between the hash-randomized arms'
    * survival curves — the significance companion to [[kaplanMeier]]'s
    * picture: at every event time, the treated arm's observed events
    * are compared with the expectation under "both curves are equal"
    * (E₁ = d·n₁/n, hypergeometric variance), and
    * χ² = (Σ(d₁−E₁))² / ΣV. Durations are whole hours from first
    * activity to first event (censored at last activity) — integer, so
    * the risk-set arithmetic is exact.
    *
    * Plan: one user-grain fold, one (duration, arm)-grain count, risk
    * sets via cumulative windows over the BOUNDED distinct-duration
    * table (the kaplanMeier grain), per-time (d₁−E₁) and V terms
    * committed to the 1e-6 lattice before the fold. One output row.
    */
  def logRank(df: DataFrame, userCol: String, tsCol: String,
              isEvent: Column, channel: Long = 59L): DataFrame = {
    val users = df.groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__start"),
        min(when(isEvent, col(tsCol))).as("__ev"),
        max(col(tsCol)).as("__last"))
      .withColumn("__t", Gen.u01(col("__u"), channel) > 0.5)
      .withColumn("__dur",
        floor((unix_micros(coalesce(col("__ev"), col("__last"))
          .cast("timestamp"))
          - unix_micros(col("__start").cast("timestamp")))
          / lit(3600000000L)).cast("long"))
      .withColumn("__e", col("__ev").isNotNull.cast("int"))
    val g = users.groupBy(col("__dur"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__a1"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__a0"),
        sum(when(col("__t"), col("__e")).otherwise(0)).cast("long")
          .as("__d1"),
        sum(when(!col("__t"), col("__e")).otherwise(0)).cast("long")
          .as("__d0"))
    val before = Window.orderBy("__dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy()
    val risk = g
      .withColumn("__r1", sum(col("__a1")).over(whole)
        - coalesce(sum(col("__a1")).over(before), lit(0L)))
      .withColumn("__r0", sum(col("__a0")).over(whole)
        - coalesce(sum(col("__a0")).over(before), lit(0L)))
      .withColumn("__n1", sum(col("__a1")).over(whole))
      .withColumn("__n0", sum(col("__a0")).over(whole))
      .withColumn("__e1s", sum(col("__d1")).over(whole))
      .withColumn("__e0s", sum(col("__d0")).over(whole))
      .filter(col("__d1") + col("__d0") > 0)
    val dt = (col("__d1") + col("__d0")).cast("double")
    val nt = col("__r1") + col("__r0")
    val share = col("__r1").cast("double") / nt
    val e1 = dt * share
    val v = when(nt > 1L,
      dt * share * (lit(1.0) - share)
        * ((nt - (col("__d1") + col("__d0"))).cast("double") / (nt - 1L)))
      .otherwise(lit(0.0))
    val folded = risk.agg(
      min(col("__n1")).as("n_treat"), min(col("__n0")).as("n_ctrl"),
      min(col("__e1s")).as("events_treat"),
      min(col("__e0s")).as("events_ctrl"),
      // decimal(38,0) sum containers: the O−E and variance terms are
      // O(deaths-at-t)·1e6 per duration row, so a long sum overflows
      // once users·durations passes ~3.7e13 (round-12 audit of the
      // ADVICE Long-overflow shape); per-term lattice rounding unchanged
      sum(round((col("__d1").cast("double") - e1) * 1000000, 0)
        .cast("decimal(38,0)")).as("__om"),
      sum(round(v * 1000000, 0).cast("decimal(38,0)")).as("__vm"))
    folded.select(col("n_treat"), col("n_ctrl"), col("events_treat"),
      col("events_ctrl"),
      round(col("__om") / lit(1000000.0), 6).as("observed_minus_expected"),
      round(col("__vm") / lit(1000000.0), 6).as("variance"),
      when(col("__vm") > 0L, round(
        (col("__om") / lit(1000000.0)) * (col("__om") / lit(1000000.0))
          / (col("__vm") / lit(1000000.0)), 6)).as("chi2"))
  }

  /** Fisher's EXACT test for a user-grain 2×2 — the small-sample
    * companion to [[oddsRatioRR]]/[[mantelHaenszel]]: when any cell is
    * in single digits the χ² approximation lies, and the exact
    * hypergeometric tail is the honest answer. Emits the two-sided p
    * (R's convention: sum of all tables no more probable than the
    * observed, with the 1+1e-7 relative tolerance), both one-sided
    * tails, and the sample OR.
    *
    * No factorials anywhere: the hypergeometric support (k from
    * max(0, c₁−r₂) to min(r₁, c₁)) is generated as a bounded series,
    * consecutive-term log-ratios ln[(r₁−k+1)(c₁−k+1)/(k(r₂−c₁+k))]
    * accumulate in ONE ordered window, terms normalize by their own
    * max-shifted ordered sum — so both engines replay the identical
    * double chain (no Σexp whose order the engine picks). Fisher is
    * inherently a SMALL-margin test: a support wider than `maxTerms`
    * fails loud with the pointer to [[mantelHaenszel]]/chi2 (the
    * theilSenPerKey fail-loud contract), so the bounded windows are
    * bounded by construction.
    *
    * Plan: one user-grain fold to a 1-row frame, a bounded explode,
    * bounded ordered windows, one fold.
    */
  def fisherExact(df: DataFrame, userCol: String, exposure: Column,
                  outcome: Column, maxTerms: Int = 4096): DataFrame = {
    require(maxTerms >= 2 && maxTerms <= 1000000,
      s"fisherExact: maxTerms in [2, 1e6] (got $maxTerms)")
    val users = df.groupBy(col(userCol))
      .agg(max(exposure.cast("int")).as("__e"),
        max(outcome.cast("int")).as("__o"))
    val folded = users.groupBy().agg(
      sum(when(col("__e") === 1 && col("__o") === 1, 1L).otherwise(0L))
        .as("__a"),
      sum(when(col("__e") === 1 && col("__o") === 0, 1L).otherwise(0L))
        .as("__b"),
      sum(when(col("__e") === 0 && col("__o") === 1, 1L).otherwise(0L))
        .as("__c"),
      sum(when(col("__e") === 0 && col("__o") === 0, 1L).otherwise(0L))
        .as("__d"))
      .withColumn("__r1", col("__a") + col("__b"))
      .withColumn("__r2", col("__c") + col("__d"))
      .withColumn("__c1", col("__a") + col("__c"))
      .withColumn("__kmin", greatest(lit(0L), col("__c1") - col("__r2")))
      .withColumn("__kmax", least(col("__r1"), col("__c1")))
      .withColumn("__kmax",
        when(col("__kmax") - col("__kmin") + 1L <= maxTerms, col("__kmax"))
          .otherwise(raise_error(concat(lit(
            s"fisherExact: hypergeometric support wider than $maxTerms " +
              "terms — Fisher is a small-sample test; use chi2/" +
              "mantelHaenszel at this scale. margins: "),
            col("__r1").cast("string"), lit("x"),
            col("__c1").cast("string")))))
    val series = folded.withColumn("k",
      explode(sequence(col("__kmin"), col("__kmax"))))
    val r1D = col("__r1").cast("double"); val r2D = col("__r2").cast("double")
    val c1D = col("__c1").cast("double"); val kD = col("k").cast("double")
    val lr = when(col("k") > col("__kmin"),
      log((r1D - kD + 1.0) * (c1D - kD + 1.0) /
        (kD * (r2D - c1D + kD)))).otherwise(lit(0.0))
    val ordK = Window.partitionBy(col("__a")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("__a"))
    val scored = series
      .withColumn("__L", sum(lr).over(ordK))
      .withColumn("__M", max(col("__L")).over(whole))
      .withColumn("__w", exp(col("__L") - col("__M")))
      .withColumn("__wa",
        max(when(col("k") === col("__a"), col("__w"))).over(whole))
      .withColumn("__cumw", sum(col("__w")).over(ordK))
      .withColumn("__cumt",
        sum(when(col("__w") <= col("__wa") * (1.0 + 1e-7), col("__w"))
          .otherwise(lit(0.0))).over(ordK))
    val f = scored.agg(
      max(col("__a")).as("n_exposed_pos"),
      max(col("__b")).as("n_exposed_neg"),
      max(col("__c")).as("n_unexposed_pos"),
      max(col("__d")).as("n_unexposed_neg"),
      max(col("__cumw")).as("__tot"),
      max(col("__cumt")).as("__tott"),
      max(when(col("k") === col("__a"), col("__cumw"))).as("__cwa"),
      max(when(col("k") === col("__a"), col("__w"))).as("__wobs"))
    val tot = col("__tot")
    val aD = col("n_exposed_pos").cast("double")
    val bD = col("n_exposed_neg").cast("double")
    val cD = col("n_unexposed_pos").cast("double")
    val dD = col("n_unexposed_neg").cast("double")
    val orOk = col("n_exposed_neg") > 0 && col("n_unexposed_pos") > 0
    f.select(col("n_exposed_pos"), col("n_exposed_neg"),
      col("n_unexposed_pos"), col("n_unexposed_neg"),
      round(least(col("__tott") / tot, lit(1.0)), 6).as("p_two_sided"),
      round(col("__cwa") / tot, 6).as("p_left"),
      round(lit(1.0) - col("__cwa") / tot + col("__wobs") / tot, 6)
        .as("p_right"),
      round(when(orOk, aD * dD / (bD * cD)), 6).as("odds_ratio"))
  }

  /** Cox proportional-hazards SCORE test at β=0 for a single
    * integer-valued covariate — the continuous-covariate
    * generalization of [[logRank]] (which IS this test for a binary
    * covariate): "does time-to-event depend on x?" without fitting
    * anything — U = Σ_t [s_t − d_t·(Sx_t/n_t)] compares the covariate
    * mass of the users who convert at each event time against the
    * risk-set mean (Breslow tie handling), V = Σ_t d_t·(Sxx_t/n_t −
    * (Sx_t/n_t)²), z = U/√V. A positive z means high-x users convert
    * FASTER (higher hazard).
    *
    * Determinism: durations are whole hours (the [[kaplanMeier]]
    * grain) and the covariate is required integral, so risk-set sums
    * (n_t, Sx_t, Sxx_t) are exact long/decimal cumulative folds; each
    * event-time's U and V terms commit to the 1e-6 lattice before the
    * final fold (the [[logRank]] device). One output row.
    *
    * Plan: one user-grain fold, one duration-grain aggregation,
    * cumulative windows over the BOUNDED distinct-duration table, one
    * fold.
    */
  def coxScore(df: DataFrame, userCol: String, tsCol: String,
               isEvent: Column, covarAgg: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val users = df.groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__start"),
        min(when(isEvent, col(tsCol))).as("__ev"),
        max(col(tsCol)).as("__last"),
        covarAgg.cast("long").as("__x"))
      .withColumn("__dur",
        floor((unix_micros(coalesce(col("__ev"), col("__last"))
          .cast("timestamp"))
          - unix_micros(col("__start").cast("timestamp")))
          / lit(3600000000L)).cast("long"))
      .withColumn("__e", col("__ev").isNotNull.cast("int"))
    val g = users.groupBy(col("__dur"))
      .agg(count(lit(1)).as("__a"),
        sum(col("__e")).cast("long").as("__d"),
        sum(col("__x")).as("__sxa"),
        sum(when(col("__e") === 1, col("__x")).otherwise(0L)).as("__sxe"),
        sum(dec(col("__x")) * col("__x")).as("__sxx"))
    val before = Window.orderBy("__dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy()
    val risk = g
      .withColumn("__nt", sum(col("__a")).over(whole)
        - coalesce(sum(col("__a")).over(before), lit(0L)))
      .withColumn("__sx", sum(col("__sxa")).over(whole)
        - coalesce(sum(col("__sxa")).over(before), lit(0L)))
      .withColumn("__sxx2", sum(col("__sxx")).over(whole)
        - coalesce(sum(col("__sxx")).over(before),
          lit(0L).cast("decimal(38,0)")))
      .withColumn("__nu", sum(col("__a")).over(whole))
      .withColumn("__ne", sum(col("__d")).over(whole))
      .filter(col("__d") > 0)
    val ntD = col("__nt").cast("double")
    val mx = col("__sx").cast("double") / ntD
    val uT = col("__sxe").cast("double") - col("__d").cast("double") * mx
    val vT = col("__d").cast("double") *
      (col("__sxx2").cast("double") / ntD - mx * mx)
    val folded = risk.agg(
      min(col("__nu")).as("n_users"), min(col("__ne")).as("n_events"),
      // decimal(38,0) sum containers: the score/information terms are
      // O(deaths·covar²)·1e6 per duration row — with a wide-lattice
      // covariate a long sum overflows at moderate event counts
      // (round-12 audit of the ADVICE Long-overflow shape)
      sum(round(uT * 1000000, 0).cast("decimal(38,0)")).as("__um"),
      sum(round(vT * 1000000, 0).cast("decimal(38,0)")).as("__vm"))
    folded.select(col("n_users"), col("n_events"),
      round(col("__um") / lit(1000000.0), 6).as("score_u"),
      round(col("__vm") / lit(1000000.0), 6).as("variance"),
      when(col("__vm") > 0L, round(
        (col("__um") / lit(1000000.0)) /
          sqrt(col("__vm") / lit(1000000.0)), 6)).as("z"))
  }

  /** MRR@k / success@k per group — the first-relevant-hit metrics next
    * to [[ndcgAtK]]'s graded view: reciprocal rank of the FIRST relevant
    * item within the top k of the (score desc, id asc) ranking (0 when
    * none lands in the window), and the binary success flag. The
    * metric pair navigation/QA retrieval is actually tuned on (one
    * right answer; position 1 vs 3 matters, graded gain doesn't).
    * Same per-group bounded-window plan shape as ndcg.
    */
  def mrrAtK(df: DataFrame, groupCol: String, idCol: String,
             scoreCol: String, isRelevant: Column, k: Int): DataFrame = {
    require(k >= 1, s"mrrAtK: k >= 1 (got $k)")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.select(col(groupCol), col(idCol), col(scoreCol),
        isRelevant.cast("int").as("__rel"))
      .withColumn("__pos", row_number().over(w))
      .filter(col("__pos") <= k)
      .groupBy(col(groupCol))
      .agg(min(when(col("__rel") === 1, col("__pos"))).as("first_rank"),
        max(col("__rel")).as("__any"))
      .select(col(groupCol), col("first_rank"),
        round(coalesce(lit(1.0) / col("first_rank"), lit(0.0)), 6)
          .as("reciprocal_rank"),
        (col("__any") === 1).as("success"))
      .orderBy(groupCol)
  }

  /** Kitagawa / Bennet decomposition of a rate difference: how much of
    * the period-over-period move in an overall rate came from the MIX
    * shifting between segments vs the within-segment RATES changing —
    * the first question a metrics review asks ("did conversion drop,
    * or did traffic shift to a low-converting segment?"). Symmetric
    * (Bennet) weights make the two effects sum EXACTLY to the total
    * change, per segment and overall; a segment absent from one period
    * enters with share 0 / rate 0 and the identity still closes.
    *
    * Every share and rate is a single division of exact longs from ONE
    * conditional-aggregate pass; contributions are fixed double trees
    * over them, and the totals fold over the bounded segment table.
    */
  def rateDecomposition(df: DataFrame, segmentCol: String, tsCol: String,
                        isPositive: Column, cutoff: String): DataFrame = {
    val cut = lit(cutoff).cast("timestamp_ntz")
    val seg = df.filter(col(segmentCol).isNotNull)
      .groupBy(col(segmentCol).as("segment"))
      .agg(
        sum(when(col(tsCol) < cut, 1L).otherwise(0L)).as("n1"),
        sum(when(col(tsCol) < cut && isPositive, 1L).otherwise(0L))
          .as("p1"),
        sum(when(col(tsCol) >= cut, 1L).otherwise(0L)).as("n2"),
        sum(when(col(tsCol) >= cut && isPositive, 1L).otherwise(0L))
          .as("p2"))
    val tot = Window.partitionBy()
    val withT = seg
      .withColumn("__t1", sum(col("n1")).over(tot))
      .withColumn("__t2", sum(col("n2")).over(tot))
    val sh1 = col("n1").cast("double") / col("__t1")
    val sh2 = col("n2").cast("double") / col("__t2")
    val r1 = when(col("n1") > 0,
      col("p1").cast("double") / col("n1")).otherwise(lit(0.0))
    val r2 = when(col("n2") > 0,
      col("p2").cast("double") / col("n2")).otherwise(lit(0.0))
    val mix = (sh2 - sh1) * ((r1 + r2) / 2.0)
    val rate = ((sh1 + sh2) / 2.0) * (r2 - r1)
    withT
      .withColumn("share_pre", round(sh1, 6))
      .withColumn("share_post", round(sh2, 6))
      .withColumn("rate_pre", round(r1, 6))
      .withColumn("rate_post", round(r2, 6))
      .withColumn("mix_effect", round(mix, 6))
      .withColumn("rate_effect", round(rate, 6))
      // totals fold per-segment terms committed to the 1e-12 lattice so
      // the segment order can't move them
      .withColumn("total_mix_effect", round(
        sum(round(mix * 1e12, 0).cast("long")).over(tot) / 1e12, 6))
      .withColumn("total_rate_effect", round(
        sum(round(rate * 1e12, 0).cast("long")).over(tot) / 1e12, 6))
      .withColumn("total_change", round(
        sum(round((sh2 * r2 - sh1 * r1) * 1e12, 0).cast("long"))
          .over(tot) / 1e12, 6))
      .select(col("segment"), col("share_pre"), col("share_post"),
        col("rate_pre"), col("rate_post"), col("mix_effect"),
        col("rate_effect"), col("total_mix_effect"),
        col("total_rate_effect"), col("total_change"))
      .orderBy("segment")
  }

  /** CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et
    * al. 2013) variance-reduced A/B readout: per user, pre-period and
    * post-period revenue around `cutoff`; θ = cov(pre, post)/var(pre)
    * fitted on the POOLED users (assignment-independent, so the
    * adjustment is unbiased); adjusted outcome y − θ·(x − x̄) compared
    * across the deterministic hash arms of [[abTest]]. Reports raw and
    * adjusted arm means, both lifts, θ, and the realized variance
    * reduction — the point of CUPED: the same experiment decided with
    * substantially fewer users.
    *
    * Determinism: pre/post user totals ride the centi lattice (exact
    * longs); θ's sufficient sums n·Σxy − Σx·Σy and n·Σx² − (Σx)² are
    * exact DECIMAL integers (their ratio is ONE double division); each
    * user's adjusted outcome commits to the 1e-6 lattice before arm
    * sums, and the pooled variances fold from exact lattice sums.
    *
    * Plan: ONE user-grain aggregation (map-side combined), a single-row
    * θ fold broadcast back, a second single-row arm fold — no global
    * sort, no window, corpus touched once.
    */
  def cuped(df: DataFrame, userCol: String, tsCol: String,
            valueCol: String, cutoff: String,
            channel: Long = 59L): DataFrame = {
    val cut = lit(cutoff).cast("timestamp_ntz")
    val users = df.groupBy(col(userCol))
      .agg(
        sum(when(col(tsCol) < cut,
          round(col(valueCol) * 100, 0).cast("long")).otherwise(0L))
          .as("__x"),
        sum(when(col(tsCol) >= cut,
          round(col(valueCol) * 100, 0).cast("long")).otherwise(0L))
          .as("__y"))
      .withColumn("__t", Gen.u01(col(userCol), channel) > 0.5)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val thetaFold = users.groupBy().agg(
      count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"),
      sum(col("__y")).as("__sy"),
      sum(dec(col("__x")) * col("__y")).as("__sxy"),
      sum(dec(col("__x")) * col("__x")).as("__sxx"))
    val num = (dec(col("__n")) * col("__sxy") -
      dec(col("__sx")) * col("__sy")).cast("double")
    val den = (dec(col("__n")) * col("__sxx") -
      dec(col("__sx")) * col("__sx")).cast("double")
    val scalar = thetaFold.select(col("__n"), col("__sx"), col("__sy"),
      when(den > 0, num / den).otherwise(lit(0.0)).as("__theta"),
      (col("__sx").cast("double") / col("__n")).as("__xbar"))
    // per-user adjusted outcome in cents, committed to the 1e-6 lattice
    val adj = users.crossJoin(broadcast(scalar))
      .withColumn("__yadj", round((col("__y").cast("double") -
        col("__theta") * (col("__x").cast("double") - col("__xbar")))
        * 1e6, 0).cast("long"))
    def arm(t: Boolean, c: Column) = when(col("__t") === t, c)
    val folded = adj.groupBy().agg(
      max(col("__theta")).as("__th"),
      count(arm(false, lit(1))).as("n_control"),
      count(arm(true, lit(1))).as("n_treatment"),
      sum(arm(false, col("__y"))).as("__yc"),
      sum(arm(true, col("__y"))).as("__yt"),
      sum(arm(false, col("__yadj"))).as("__ac"),
      sum(arm(true, col("__yadj"))).as("__at"),
      count(lit(1)).as("__n"),
      sum(col("__y")).as("__sy"),
      sum(dec(col("__y")) * col("__y")).as("__syy"),
      sum(col("__yadj")).as("__sa"),
      sum(dec(col("__yadj")) * col("__yadj")).as("__saa"))
    // pooled variances from exact sums: var = (n·Σv² − (Σv)²)/n² — the
    // adjusted one descaled by the 1e6 lattice factor squared
    val varY = (dec(col("__n")) * col("__syy") -
      dec(col("__sy")) * col("__sy")).cast("double") /
      (col("__n").cast("double") * col("__n"))
    val varA = (dec(col("__n")) * col("__saa") -
      dec(col("__sa")) * col("__sa")).cast("double") /
      (col("__n").cast("double") * col("__n")) / 1e12
    val mrc = col("__yc").cast("double") / col("n_control") / 100.0
    val mrt = col("__yt").cast("double") / col("n_treatment") / 100.0
    val mac = col("__ac").cast("double") / col("n_control") / 1e8
    val mat = col("__at").cast("double") / col("n_treatment") / 1e8
    folded.select(col("n_control"), col("n_treatment"),
      round(col("__th"), 6).as("theta"),
      round(mrc, 6).as("mean_raw_control"),
      round(mrt, 6).as("mean_raw_treatment"),
      round(mrt - mrc, 6).as("raw_lift"),
      round(mac, 6).as("mean_adj_control"),
      round(mat, 6).as("mean_adj_treatment"),
      round(mat - mac, 6).as("adj_lift"),
      when(varY > 0, round(lit(1.0) - varA / varY, 6))
        .as("var_reduction"))
  }

  /** Odds ratio and relative risk of a binary outcome given a binary
    * exposure, both at the user grain, with Wald log-scale 95% CIs —
    * the observational-association readout ([[abTest]] needs a
    * randomized arm; this quantifies "high-value users purchase X×
    * more often" from exposure the data already carries, CI and all).
    *
    * Cells are exact longs from ONE user-grain fold; OR = ad/bc and
    * RR = (a/(a+b))/(c/(c+d)) are fixed double trees over them;
    * CIs are exp(ln(est) ± z·se) with z = 1.959964 shared verbatim by
    * both engines and se the textbook Wald forms. Any empty cell nulls
    * the estimates (the report stays, the math doesn't divide by zero).
    */
  def oddsRatioRR(df: DataFrame, userCol: String, exposure: Column,
                  outcome: Column): DataFrame = {
    val z = 1.959964
    val users = df.groupBy(col(userCol))
      .agg(max(exposure.cast("int")).as("__e"),
        max(outcome.cast("int")).as("__o"))
    val folded = users.groupBy().agg(
      sum(when(col("__e") === 1 && col("__o") === 1, 1L).otherwise(0L))
        .as("n_exposed_pos"),
      sum(when(col("__e") === 1 && col("__o") === 0, 1L).otherwise(0L))
        .as("n_exposed_neg"),
      sum(when(col("__e") === 0 && col("__o") === 1, 1L).otherwise(0L))
        .as("n_unexposed_pos"),
      sum(when(col("__e") === 0 && col("__o") === 0, 1L).otherwise(0L))
        .as("n_unexposed_neg"))
    val a = col("n_exposed_pos").cast("double")
    val b = col("n_exposed_neg").cast("double")
    val c = col("n_unexposed_pos").cast("double")
    val d = col("n_unexposed_neg").cast("double")
    val ok = col("n_exposed_pos") > 0 && col("n_exposed_neg") > 0 &&
      col("n_unexposed_pos") > 0 && col("n_unexposed_neg") > 0
    val or = a * d / (b * c)
    val seOr = sqrt(lit(1.0) / a + lit(1.0) / b + lit(1.0) / c +
      lit(1.0) / d)
    val rr = (a / (a + b)) / (c / (c + d))
    val seRr = sqrt(lit(1.0) / a - lit(1.0) / (a + b) + lit(1.0) / c -
      lit(1.0) / (c + d))
    folded.select(col("n_exposed_pos"), col("n_exposed_neg"),
      col("n_unexposed_pos"), col("n_unexposed_neg"),
      when(ok, round(or, 6)).as("odds_ratio"),
      when(ok, round(exp(log(or) - lit(z) * seOr), 6)).as("or_ci_lo"),
      when(ok, round(exp(log(or) + lit(z) * seOr), 6)).as("or_ci_hi"),
      when(ok, round(rr, 6)).as("relative_risk"),
      when(ok, round(exp(log(rr) - lit(z) * seRr), 6)).as("rr_ci_lo"),
      when(ok, round(exp(log(rr) + lit(z) * seRr), 6)).as("rr_ci_hi"))
  }

  /** Precision@k / recall@k / average precision per ranking group, with
    * the corpus MAP repeated on every row — the full ranked-retrieval
    * report card next to [[mrrAtK]] (first hit only) and [[ndcgAtK]]
    * (graded gains): precision reads top-k purity, recall coverage of
    * ALL relevant items (denominator from the full list, not the cut),
    * AP the area under the precision-recall curve.
    *
    * Determinism: every AP term cum_i/i is a rational with denominator
    * dividing lcm(1..k), so terms are EXACT longs after scaling by the
    * lcm (no lattice rounding anywhere inside a group); the group AP is
    * one division, and MAP folds the per-group APs through the 1e-6
    * lattice. Groups with no relevant items score AP 0 (kept in the
    * roster, not dropped) and a NULL recall.
    *
    * Plan: one partitioned rank + one cumulative window + one keyed
    * aggregation — corpus-sized but fully keyed, no global stage except
    * the bounded MAP window over the group roster.
    */
  def precisionRecallAtK(df: DataFrame, groupCol: String, idCol: String,
                         scoreCol: String, isRelevant: Column,
                         k: Int): DataFrame = {
    require(k >= 1 && k <= 20,
      s"precisionRecallAtK: 1 <= k <= 20 so lcm(1..k) stays exact " +
        s"(got $k)")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = (1 to k).foldLeft(1L)((l, i) => l * i / gcd(l, i))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val wg = Window.partitionBy(col(groupCol))
    val base = df.select(col(groupCol), col(idCol), col(scoreCol),
        isRelevant.cast("int").as("__rel"))
      .withColumn("__pos", row_number().over(w))
      .withColumn("__relTotal", sum(col("__rel")).over(wg).cast("long"))
      .filter(col("__pos") <= k)
      .withColumn("__cum", sum(col("__rel"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .withColumn("__apn", expr(s"__rel * __cum * ($lcm div __pos)"))
    val per = base.groupBy(col(groupCol))
      .agg(max(col("__relTotal")).as("n_rel_total"),
        sum(col("__rel")).cast("long").as("n_rel_at_k"),
        sum(col("__apn")).cast("long").as("__apnum"))
    val apRaw = when(col("n_rel_total") > 0,
      col("__apnum").cast("double") /
        (lit(lcm) * least(col("n_rel_total"), lit(k.toLong)))
          .cast("double"))
      .otherwise(lit(0.0))
    // MAP as a 1-row fold broadcast back — NOT a partition-less window,
    // which would drag the whole group roster into one partition at scale
    val withAp = per.withColumn("__ap", apRaw)
    val mapScalar = withAp.agg(round(
      sum(round(col("__ap") * 1e6, 0).cast("long")) /
        count(lit(1)).cast("double") / 1e6, 6).as("map"))
    withAp
      .withColumn("precision_at_k",
        round(col("n_rel_at_k").cast("double") / lit(k.toDouble), 6))
      .withColumn("recall_at_k", when(col("n_rel_total") > 0,
        round(col("n_rel_at_k").cast("double") /
          col("n_rel_total").cast("double"), 6)))
      .withColumn("avg_precision", round(col("__ap"), 6))
      .crossJoin(broadcast(mapScalar))
      .select(col(groupCol), col("n_rel_total"), col("n_rel_at_k"),
        col("precision_at_k"), col("recall_at_k"), col("avg_precision"),
        col("map"))
      .orderBy(groupCol)
  }

  /** Difference-in-differences estimate around a policy cutoff: the
    * four (arm × pre/post) cell means of the outcome and
    * DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) — the causal
    * workhorse when randomization is the hash arm but the INTERVENTION
    * is a launch date: the control arm's pre/post drift nets out
    * seasonality and shocks the naive post-mean comparison would absorb
    * as treatment effect. Repeated cross-section form (cells over
    * events); one wide row.
    *
    * Plan: ONE conditional-aggregate pass (8 counters), outcomes on the
    * centi lattice so cell sums are exact longs and each mean is a
    * single engine-identical division — the [[abTest]] shape with the
    * time axis added.
    */
  def diffInDiff(df: DataFrame, userCol: String, tsCol: String,
                 valueCol: String, cutoff: String,
                 channel: Long = 59L): DataFrame = {
    val base = df.select(
      (Gen.u01(col(userCol), channel) > 0.5).as("__t"),
      (col(tsCol) >= lit(cutoff).cast("timestamp_ntz")).as("__post"),
      round(col(valueCol) * 100, 0).cast("long").as("__vc"))
    def cell(t: Boolean, post: Boolean, c: Column) =
      when(col("__t") === t && col("__post") === post, c)
    val folded = base.agg(
      count(cell(false, false, lit(1))).as("n_ctrl_pre"),
      count(cell(false, true, lit(1))).as("n_ctrl_post"),
      count(cell(true, false, lit(1))).as("n_treat_pre"),
      count(cell(true, true, lit(1))).as("n_treat_post"),
      sum(cell(false, false, col("__vc"))).as("__s00"),
      sum(cell(false, true, col("__vc"))).as("__s01"),
      sum(cell(true, false, col("__vc"))).as("__s10"),
      sum(cell(true, true, col("__vc"))).as("__s11"))
    def mean(s: String, n: String) =
      col(s) / (lit(100.0) * col(n))
    folded.select(
      col("n_ctrl_pre"), col("n_ctrl_post"),
      col("n_treat_pre"), col("n_treat_post"),
      round(mean("__s00", "n_ctrl_pre"), 6).as("mean_ctrl_pre"),
      round(mean("__s01", "n_ctrl_post"), 6).as("mean_ctrl_post"),
      round(mean("__s10", "n_treat_pre"), 6).as("mean_treat_pre"),
      round(mean("__s11", "n_treat_post"), 6).as("mean_treat_post"),
      round((mean("__s11", "n_treat_post") - mean("__s10", "n_treat_pre"))
        - (mean("__s01", "n_ctrl_post") - mean("__s00", "n_ctrl_pre")), 6)
        .as("did"))
  }

  /** Two-way-fixed-effects (TWFE) panel estimator on the completed
    * unit×month grid: τ̂ = Σ D̃·Ỹ / Σ D̃² after demeaning by unit, by
    * month, and overall — the regression form of DiD (with ONE treated
    * group and COMMON timing they coincide exactly; the plain
    * cell-mean DiD rides along as the in-plan cross-check, and
    * staggered-adoption designs should NOT use this estimator —
    * Goodman-Bacon 2021 — which the scaladoc states rather than
    * silently mis-averaging).
    *
    * Determinism: on the balanced grid the within-transform clears
    * denominators exactly — Ỹ·NT = NT·y − N·S_i − T·S_t + S is an
    * exact integer (same for D̃) — so both folds are exact decimal
    * sums and τ̂ is ONE double division (the NT factors cancel).
    *
    * Plan: one corpus aggregation to the grid; per-unit / per-month /
    * total sums are bounded aggregations joined back; one bounded
    * fold. No corpus sort.
    */
  def twfe(df: DataFrame, unitCol: String, dateCol: Column,
           valueCol: String, treatedUnits: Seq[String],
           intervention: String): DataFrame = {
    require(treatedUnits.nonEmpty, "twfe: at least one treated unit")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cut = lit(intervention).cast("date")
    val g = monthlyPanel(df, unitCol, dateCol, valueCol)
      .withColumn("__t", col("__u").isin(treatedUnits: _*))
      .withColumn("__p", col("__m") >= cut)
      .withColumn("__dd", (col("__t") && col("__p")).cast("long"))
    val perU = g.groupBy(col("__u"))
      .agg(sum(col("__y")).as("__si"), sum(col("__dd")).as("__di"))
    val perM = g.groupBy(col("__m"))
      .agg(sum(col("__y")).as("__st"), sum(col("__dd")).as("__dt"))
    val tot = g.agg(sum(col("__y")).as("__s"), sum(col("__dd")).as("__dg"),
      countDistinct(col("__u")).as("__nu"),
      countDistinct(col("__m")).as("__nt"))
    val cells = g.join(perU, Seq("__u")).join(perM, Seq("__m"))
      .crossJoin(broadcast(tot))
      .withColumn("__yt", dec(col("__y")) * col("__nu") * col("__nt") -
        dec(col("__si")) * col("__nu") - dec(col("__st")) * col("__nt") +
        dec(col("__s")))
      .withColumn("__dtil", dec(col("__dd")) * col("__nu") * col("__nt") -
        dec(col("__di")) * col("__nu") - dec(col("__dt")) * col("__nt") +
        dec(col("__dg")))
    def cell(t: Boolean, p: Boolean, c: Column) =
      when(col("__t") === t && col("__p") === p, c)
    val f = cells.agg(
      sum(col("__dtil") * col("__yt")).as("__num"),
      sum(col("__dtil") * col("__dtil")).as("__den"),
      min(col("__nu")).as("n_units"), min(col("__nt")).as("n_months"),
      sum(col("__dd")).as("n_treated_cells"),
      count(cell(true, true, lit(1))).as("__n11"),
      count(cell(true, false, lit(1))).as("__n10"),
      count(cell(false, true, lit(1))).as("__n01"),
      count(cell(false, false, lit(1))).as("__n00"),
      coalesce(sum(cell(true, true, col("__y"))), lit(0L)).as("__s11"),
      coalesce(sum(cell(true, false, col("__y"))), lit(0L)).as("__s10"),
      coalesce(sum(cell(false, true, col("__y"))), lit(0L)).as("__s01"),
      coalesce(sum(cell(false, false, col("__y"))), lit(0L)).as("__s00"))
    def mean(s: String, n: String) =
      col(s).cast("double") / (lit(100.0) * col(n).cast("double"))
    val okDid = col("__n11") > 0 && col("__n10") > 0 &&
      col("__n01") > 0 && col("__n00") > 0
    f.select(col("n_units"), col("n_months"), col("n_treated_cells"),
      round(when(col("__den") > 0,
        (col("__num").cast("double") / col("__den").cast("double"))
          / 100.0), 6).as("att_twfe"),
      round(when(okDid,
        (mean("__s11", "__n11") - mean("__s10", "__n10")) -
          (mean("__s01", "__n01") - mean("__s00", "__n00"))), 6)
        .as("did_check"))
  }

  /** Dynamic-time-warping distance between two units' monthly series
    * on the completed panel — the alignment-tolerant series similarity
    * (a one-month lead/lag that would wreck the lockstep L1 costs only
    * one warp step), with the lockstep L1 beside it: warp_gain near 0
    * means the series already align, large means one LAGS the other —
    * the readout correlation can't give. Unconstrained DTW, classic
    * cumulative DP.
    *
    * Determinism: the costs |aᵢ − bⱼ| are exact centi longs, so the
    * WHOLE DP is integer arithmetic — no float anywhere until the
    * final /100 display scaling. The DP is inherently sequential and
    * runs as one bounded fold over the month grain (the
    * [[holtWinters]] contract, generalized from a 1-D recurrence to a
    * 2-D table): Spark nests two `aggregate` HOFs (row fold inside
    * grid fold); the oracle replays cell-by-cell with a sliding
    * (m+1)-cell list state. Identical integers by induction.
    *
    * Plan: one corpus aggregation to the panel, two 1-row series
    * folds, one O(n·m) in-row DP over the calendar-bounded grain
    * (≤ ~100 months → ≤ 10⁴ cells). No corpus sort.
    */
  def dtwDistance(df: DataFrame, unitCol: String, dateCol: Column,
                  valueCol: String, unitA: String,
                  unitB: String): DataFrame = {
    require(unitA != unitB, "dtwDistance: distinct units")
    val grid = monthlyPanel(df, unitCol, dateCol, valueCol)
    def series(u: String, nm: String) = grid.filter(col("__u") === u)
      .agg(transform(sort_array(collect_list(
        struct(col("__m").as("m"), col("__y").as("y")))),
        s => s.getField("y")).as(nm))
    val inf = lit(Long.MaxValue / 4)
    val joined = series(unitA, "__a").crossJoin(broadcast(series(unitB, "__b")))
    val aArr = col("__a"); val bArr = col("__b")
    val n = size(aArr); val m = size(bArr)
    val dpLast = aggregate(
      sequence(lit(1), n),
      array().cast("array<bigint>"),
      (prevRow, i) => {
        val ai = element_at(aArr, i)
        aggregate(
          sequence(lit(1), m),
          array().cast("array<bigint>"),
          (newRow, j) => {
            val c = abs(ai - element_at(bArr, j))
            val up = when(i > 1, element_at(prevRow, j)).otherwise(inf)
            val diag = when(i === 1 && j === 1, lit(0L))
              .when(i > 1 && j > 1, element_at(prevRow, j - 1))
              .otherwise(inf)
            val left = when(j > 1, element_at(newRow, j - 1))
              .otherwise(inf)
            concat(newRow, array(c + least(up, diag, left)))
          })
      })
    val lockstep = aggregate(zip_with(aArr, bArr, (x, y) => abs(x - y)),
      lit(0L), (acc, x) => acc + x)
    joined.select(n.as("n_months"),
        element_at(dpLast, m).as("__dtw"), lockstep.as("__lock"))
      .select(col("n_months").cast("long").as("n_months"),
        round(col("__dtw").cast("double") / 100.0, 2).as("dtw_dist"),
        round(col("__lock").cast("double") / 100.0, 2).as("lockstep_dist"),
        round(when(col("__lock") > 0,
          (col("__lock") - col("__dtw")).cast("double") /
            col("__lock").cast("double")), 6).as("warp_gain"))
  }

  /** The completed unit×month panel behind [[twfe]] and
    * [[syntheticControl]]: corpus → (unit, month, centi sum), grid
    * completed with zeros so the panel is balanced (absence of revenue
    * IS the value at this grain).
    */
  private def monthlyPanel(df: DataFrame, unitCol: String,
                           dateCol: Column,
                           valueCol: String): DataFrame = {
    // pin the corpus aggregation: the month/unit axes derive from it
    // (2 more refs here) and every caller re-references the grid 2-4×
    // (treated/donor splits, per-unit/per-month margins) — without the
    // pin the corpus re-aggregates once per reference. The pinned frame
    // is bounded by |units|·|months|.
    // lazy like the grid frame below (r12 advice): an eager checkpoint
    // here executed the corpus aggregation at DataFrame-construction
    // time — even for explain/plan-dump paths that never run the query
    val monthly = df.groupBy(col(unitCol).as("__u"),
        date_trunc("month", dateCol).cast("date").as("__m"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("__y"))
      .localCheckpoint(eager = false)
    val months = monthly.select(col("__m")).distinct()
    val units = monthly.select(col("__u")).distinct()
    months.crossJoin(broadcast(units))
      .join(monthly, Seq("__u", "__m"), "left")
      .withColumn("__y", coalesce(col("__y"), lit(0L)))
      .localCheckpoint(eager = false)
  }

  /** Synthetic-control-lite at the unit×month grain: the counterfactual
    * for ONE treated unit is the harmonic-weighted mean of its `donors`
    * nearest donor units by pre-period squared distance (weights
    * 1, 1/2, …, 1/donors over the closeness ranks — the deterministic,
    * closed-form stand-in for the constrained-regression weights of
    * Abadie et al.; the rank weights need no QP solver and replay in
    * any engine). Emits the month-by-month treated vs synthetic series
    * with the gap, and the ATT (mean post gap − mean pre gap) repeated
    * on every row — the placebo readout is the PRE-period gap hovering
    * near zero: a pre gap as large as the post gap means the donors
    * never tracked the treated unit and the ATT is fiction.
    *
    * Determinism: the panel is completed to a full unit×month grid
    * (missing cells = 0 — absence of revenue IS the value here);
    * distances are exact decimal sums of centi diffs²; donor ranks
    * break ties by unit name; rank weights are exact integers
    * L/r (L = lcm(1..donors)), so the weighted fold is an exact
    * decimal sum with ONE final division; per-month gaps commit to
    * the 1e-6 lattice before the ATT fold.
    *
    * Plan: one corpus aggregation to the unit×month grain; everything
    * after runs on bounded frames (|units|·|months|) — the bounded
    * grid crossJoin, the ≤donors ranked frame, 1-row ATT fold
    * broadcast back. No corpus sort.
    */
  def syntheticControl(df: DataFrame, unitCol: String, dateCol: Column,
                       valueCol: String, treatedUnit: String,
                       intervention: String,
                       donors: Int = 5): DataFrame = {
    require(donors >= 1 && donors <= 20,
      s"syntheticControl: donors in [1,20] (got $donors)")
    val L = (1 to donors).foldLeft(1L)((a, r) =>
      a / BigInt(a).gcd(BigInt(r)).toLong * r) // lcm(1..donors)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val grid = monthlyPanel(df, unitCol, dateCol, valueCol)
    val treated = grid.filter(col("__u") === treatedUnit)
      .select(col("__m"), col("__y").as("__yt"))
    val donorsG = grid.filter(col("__u") =!= treatedUnit)
    val cut = lit(intervention).cast("date")
    val dist = donorsG.join(treated, Seq("__m"))
      .filter(col("__m") < cut)
      .groupBy(col("__u"))
      .agg(sum(dec(col("__y") - col("__yt")) *
        (col("__y") - col("__yt"))).as("__d2"))
    val ranked = dist
      .withColumn("__r", row_number().over(
        Window.orderBy(col("__d2"), col("__u"))))
      .filter(col("__r") <= donors)
      .withColumn("__w", (lit(L) / col("__r").cast("long")).cast("long"))
    val denom = ranked.agg(sum(col("__w")).as("__wsum"))
    val synth = donorsG
      .join(broadcast(ranked.select(col("__u"), col("__w"))), Seq("__u"))
      .groupBy(col("__m"))
      .agg(sum(dec(col("__y")) * col("__w")).as("__num"))
      .crossJoin(broadcast(denom))
    val series = treated.join(synth, Seq("__m"))
      .withColumn("__synD", (col("__num").cast("double") /
        col("__wsum").cast("double")) / 100.0)
      .withColumn("__tD", col("__yt").cast("double") / 100.0)
      .withColumn("__gapLat",
        round((col("__tD") - col("__synD")) * 1e6, 0).cast("long"))
      .withColumn("__post", col("__m") >= cut)
    val att = series.agg(
      count(when(col("__post"), lit(1))).as("__np"),
      count(when(!col("__post"), lit(1))).as("__nb"),
      coalesce(sum(when(col("__post"), col("__gapLat"))), lit(0L))
        .as("__sp"),
      coalesce(sum(when(!col("__post"), col("__gapLat"))), lit(0L))
        .as("__sb"))
    series.crossJoin(broadcast(att))
      .select(col("__m").as("month"),
        round(col("__tD"), 2).as("treated"),
        round(col("__synD"), 6).as("synthetic"),
        round(col("__gapLat").cast("double") / 1e6, 6).as("gap"),
        col("__post").as("is_post"),
        round(when(col("__np") > 0 && col("__nb") > 0,
          col("__sp").cast("double") / (lit(1e6) * col("__np").cast("double"))
            - col("__sb").cast("double") /
              (lit(1e6) * col("__nb").cast("double"))), 6).as("att"))
      .orderBy("month")
  }

  /** Instrumental-variable (Wald) estimator under an encouragement
    * design: when the hash arm z only ENCOURAGES a behavior d (nobody
    * can be forced to be a heavy user), the naive treated-vs-untreated
    * contrast is confounded by self-selection; the IV ratio
    * LATE = ITT_y / ITT_d = (ȳ_{z=1} − ȳ_{z=0}) / (d̄_{z=1} − d̄_{z=0})
    * recovers the complier-average effect using only the randomized z.
    * Emits both stages, the naive (confounded) contrast beside the
    * LATE, and the standard weak-instrument alarm: first-stage
    * F = t² < 10 (two-proportion z over exact counts) means the ratio
    * is noise-amplified and should not be read.
    *
    * Determinism: the caller commits EACH value to the centi lattice
    * before the per-user fold (`outcomeCenti` is an exact-long
    * aggregate, e.g. `sum(round(value*100,0).cast("long"))`), so the
    * user-grain sums are order-free exact longs in both engines —
    * a post-sum round of a double fold could flip at a .5-centi
    * boundary; treatment counts are exact longs; every
    * rate/mean/F/LATE is one fixed double tree over them.
    *
    * Plan: one user-grain aggregation (outcome + behavior per user),
    * one 1-row eight-counter fold. No window, no sort.
    */
  def ivWald(df: DataFrame, userCol: String, treatedIf: Column,
             outcomeCenti: Column, channel: Long = 61L): DataFrame = {
    val users = df.groupBy(col(userCol))
      .agg(treatedIf.as("__d"),
        outcomeCenti.cast("long").as("__yc"))
      .select((Gen.u01(col(userCol), channel) > 0.5).as("__z"),
        col("__d"), col("__yc"))
    val f = users.agg(
      count(when(col("__z"), lit(1))).as("n_z1"),
      count(when(!col("__z"), lit(1))).as("n_z0"),
      count(when(col("__z") && col("__d"), lit(1))).as("__d1"),
      count(when(!col("__z") && col("__d"), lit(1))).as("__d0"),
      coalesce(sum(when(col("__z"), col("__yc"))), lit(0L)).as("__s1"),
      coalesce(sum(when(!col("__z"), col("__yc"))), lit(0L)).as("__s0"),
      coalesce(sum(when(col("__d"), col("__yc"))), lit(0L)).as("__sd1"),
      count(when(col("__d"), lit(1))).as("__nd1"))
    val n1 = col("n_z1").cast("double")
    val n0 = col("n_z0").cast("double")
    val p1 = col("__d1").cast("double") / n1
    val p0 = col("__d0").cast("double") / n0
    val firstStage = p1 - p0
    val m1 = col("__s1").cast("double") / (lit(100.0) * n1)
    val m0 = col("__s0").cast("double") / (lit(100.0) * n0)
    val itt = m1 - m0
    // two-proportion z on the first stage; F = z² (weak-IV rule F < 10)
    val se2 = p1 * (lit(1.0) - p1) / n1 + p0 * (lit(1.0) - p0) / n0
    val fStat = when(se2 > 0, firstStage * firstStage / se2)
    val nAll = col("n_z1") + col("n_z0")
    val nD0 = (nAll - col("__nd1")).cast("double")
    val naive = when(col("__nd1") > 0 && nAll > col("__nd1"),
      col("__sd1").cast("double") / (lit(100.0) * col("__nd1").cast("double"))
        - (col("__s1") + col("__s0") - col("__sd1")).cast("double")
        / (lit(100.0) * nD0))
    val ok = col("n_z1") > 0 && col("n_z0") > 0
    f.select(col("n_z1"), col("n_z0"),
      round(when(ok, p1), 6).as("treat_rate_z1"),
      round(when(ok, p0), 6).as("treat_rate_z0"),
      round(when(ok, firstStage), 6).as("first_stage"),
      round(when(ok, fStat), 6).as("first_stage_f"),
      round(when(ok, m1), 6).as("mean_y_z1"),
      round(when(ok, m0), 6).as("mean_y_z0"),
      round(when(ok, itt), 6).as("itt"),
      round(when(ok, naive), 6).as("naive_contrast"),
      round(when(ok && firstStage =!= 0.0, itt / firstStage), 6).as("late"),
      // strong iff F >= 10, or the degenerate perfect stage (zero
      // sampling variance with a nonzero effect — F is +inf)
      when(ok, !(coalesce(fStat >= 10.0, lit(false)) ||
        (se2 === 0.0 && firstStage =!= 0.0))).as("weak_instrument"))
  }

  /** Sharp regression discontinuity at a DECLARED cutoff of a running
    * variable: fit the local linear trend separately just below and
    * just above the cutoff (within ±bandwidth) and read the outcome
    * jump τ = α_right − α_left at the threshold — the causal design
    * for rule-based treatments (free shipping over $X, review flag
    * over a score) where units just beside the line are comparable.
    * Emits both local fits so a slope mismatch (a kinked trend
    * masquerading as a jump) is visible next to τ.
    *
    * Determinism: the centered running variable and the outcome live
    * on centi lattices, so each side's (n, Σx, Σy, Σxy, Σx²) folds
    * exactly in decimal; intercepts/slopes/τ are fixed double trees
    * (the [[Stats.chowTest]] OLS shape at a value cutoff instead of a
    * date cutoff).
    *
    * Plan: one bandwidth-filtered aggregation (pushed to the scan),
    * one 1-row two-segment fold. No window, no sort.
    */
  def regDiscontinuity(df: DataFrame, runningCol: String, outcome: Column,
                       cutoff: Double, bandwidth: Double): DataFrame = {
    require(bandwidth > 0, s"regDiscontinuity: bandwidth > 0 (got $bandwidth)")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df
      .filter(col(runningCol) >= cutoff - bandwidth &&
        col(runningCol) < cutoff + bandwidth)
      .select(
        (round(col(runningCol) * 100, 0).cast("long") -
          lit(math.round(cutoff * 100))).as("__x"),
        round(outcome * 100, 0).cast("long").as("__y"))
      .withColumn("__right", col("__x") >= 0L)
    def sums(flag: Column, tag: String) = Seq(
      count(when(flag, lit(1))).as(s"n$tag"),
      coalesce(sum(when(flag, col("__x"))), lit(0L)).as(s"sx$tag"),
      coalesce(sum(when(flag, col("__y"))), lit(0L)).as(s"sy$tag"),
      coalesce(sum(when(flag, dec(col("__x")) * col("__y"))),
        lit(0L).cast("decimal(38,0)")).as(s"sxy$tag"),
      coalesce(sum(when(flag, dec(col("__x")) * col("__x"))),
        lit(0L).cast("decimal(38,0)")).as(s"sxx$tag"))
    val allSums = sums(!col("__right"), "l") ++ sums(col("__right"), "r")
    val f = base.agg(allSums.head, allSums.tail: _*)
    def d(c: String) = col(c).cast("double")
    def fit(tag: String): (Column, Column, Column) = {
      val nD = d(s"n$tag")
      val cxy = d(s"sxy$tag") - d(s"sx$tag") * d(s"sy$tag") / nD
      val cxx = d(s"sxx$tag") - d(s"sx$tag") * d(s"sx$tag") / nD
      val slope = cxy / cxx
      val alpha = d(s"sy$tag") / nD - slope * (d(s"sx$tag") / nD)
      val ok = col(s"n$tag") >= 3 && cxx > 0
      // centi x, centi y: intercept /100 to dollars; slope is y-centi
      // per x-centi = dollars per dollar already
      (when(ok, alpha / 100.0), when(ok, slope), ok)
    }
    val (aL, bL, okL) = fit("l")
    val (aR, bR, okR) = fit("r")
    f.select(col("nl").as("n_left"), col("nr").as("n_right"),
      round(aL, 6).as("intercept_left"),
      round(aR, 6).as("intercept_right"),
      round(bL, 6).as("slope_left"),
      round(bR, 6).as("slope_right"),
      round(when(okL && okR, aR - aL), 6).as("rdd_tau"))
  }

  /** Sample-ratio-mismatch check — the FIRST thing to read on any A/B
    * dashboard: if the arm split itself deviates from the declared
    * ratio, every downstream metric is suspect (broken assignment,
    * bot filtering one arm, logging loss) and no lift number should be
    * trusted. χ² with 1 df against the declared ratio, flagged at the
    * conventional SRM alarm p < 0.001 (χ² > 10.828 — shared literal;
    * the loose 0.05 would false-alarm a healthy platform weekly).
    *
    * Determinism: counts are exact user-grain longs; the χ² is one
    * fixed tree over them and the declared-ratio literal.
    *
    * Plan: one user-grain aggregation, one 1-row fold.
    */
  def sampleRatioCheck(df: DataFrame, userCol: String,
                       expectedTreatShare: Double = 0.5,
                       channel: Long = 59L): DataFrame = {
    require(expectedTreatShare > 0.0 && expectedTreatShare < 1.0,
      s"sampleRatioCheck: share in (0,1) (got $expectedTreatShare)")
    val chi2crit = 10.827566170662733 // chi2(1) at p = 0.001
    val users = df.select(col(userCol)).distinct()
      .select((Gen.u01(col(userCol), channel) > 0.5).as("__t"))
    val f = users.agg(count(when(col("__t"), lit(1))).as("n_treat"),
      count(when(!col("__t"), lit(1))).as("n_ctrl"))
    val nD = (col("n_treat") + col("n_ctrl")).cast("double")
    val et = nD * lit(expectedTreatShare)
    val ec = nD * lit(1.0 - expectedTreatShare)
    val tD = col("n_treat").cast("double")
    val cD = col("n_ctrl").cast("double")
    val chi2 = (tD - et) * (tD - et) / et + (cD - ec) * (cD - ec) / ec
    val ok = col("n_treat") + col("n_ctrl") > 0
    f.select(col("n_treat"), col("n_ctrl"),
      round(when(ok, tD / nD), 6).as("treat_share"),
      lit(expectedTreatShare).as("expected_share"),
      round(when(ok, chi2), 6).as("chi2"),
      when(ok, chi2 > lit(chi2crit)).as("srm_alarm"))
  }

  /** TOST equivalence test on the arm revenue means — the inverted
    * question a significance test can't answer: "can we SHOW the arms
    * are the same (within ±margin)?" — the do-no-harm gate for
    * refactors and migrations, where failing to find a difference is
    * NOT evidence of equivalence. Two one-sided z tests against the
    * declared margin; equivalent iff BOTH reject at 5% one-sided
    * (z > 1.6448536269514722, shared literal).
    *
    * Determinism: user-grain revenue on the centi lattice; means and
    * the pooled-variance se from exact sums via explicit
    * (Σx²−(Σx)²/n)/(n−1) trees; z's are fixed trees with the margin
    * literal.
    *
    * Plan: one user-grain aggregation, one 1-row fold.
    */
  def tostEquivalence(df: DataFrame, userCol: String, valueCol: String,
                      margin: Double, channel: Long = 59L): DataFrame = {
    require(margin > 0.0, s"tostEquivalence: margin > 0 (got $margin)")
    val zCrit = 1.6448536269514722
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val users = df.groupBy(col(userCol))
      .agg(sum(round(coalesce(col(valueCol), lit(0.0)) * 100, 0)
        .cast("long")).as("__rev"))
      .withColumn("__t", Gen.u01(col(userCol), channel) > 0.5)
    def arm(t: Boolean, c: Column) = when(col("__t") === t, c)
    val f = users.agg(
      count(arm(true, lit(1))).as("n_treat"),
      count(arm(false, lit(1))).as("n_ctrl"),
      coalesce(sum(arm(true, col("__rev"))), lit(0L)).as("__st"),
      coalesce(sum(arm(false, col("__rev"))), lit(0L)).as("__sc"),
      coalesce(sum(arm(true, dec(col("__rev")) * col("__rev"))),
        lit(0L).cast("decimal(38,0)")).as("__st2"),
      coalesce(sum(arm(false, dec(col("__rev")) * col("__rev"))),
        lit(0L).cast("decimal(38,0)")).as("__sc2"))
    def d(c: String) = col(c).cast("double")
    val (nt, nc) = (d("n_treat"), d("n_ctrl"))
    val mt = d("__st") / nt / 100.0
    val mc = d("__sc") / nc / 100.0
    val vt = (d("__st2") - d("__st") * d("__st") / nt) / (nt - lit(1.0)) /
      10000.0
    val vc = (d("__sc2") - d("__sc") * d("__sc") / nc) / (nc - lit(1.0)) /
      10000.0
    val se = sqrt(vt / nt + vc / nc)
    val diff = mt - mc
    val z1 = (diff + lit(margin)) / se
    val z2 = (lit(margin) - diff) / se
    val ok = col("n_treat") >= 2 && col("n_ctrl") >= 2 && vt + vc > 0
    f.select(col("n_treat"), col("n_ctrl"),
      round(when(ok, diff), 6).as("mean_diff"),
      lit(margin).as("margin"),
      round(when(ok, z1), 6).as("z_lower"),
      round(when(ok, z2), 6).as("z_upper"),
      when(ok, z1 > lit(zCrit) && z2 > lit(zCrit)).as("equivalent"))
  }

  /** Hash-seeded permutation test of the arm mean difference — the
    * distribution-free significance check that needs NO normality, no
    * variance formula, and no asymptotics: re-randomize the arm
    * assignment B times (each permutation is the shared multiplicative
    * hash on its own channel — no RNG, both engines replay it),
    * recompute the mean difference under each, and report
    * p = (1 + #{|d_b| ≥ |d_obs|}) / (B + 1) (the add-one rule that
    * keeps p valid at any B). The exact-inference sibling of
    * [[abTest]]'s z/Welch approximations.
    *
    * Determinism: user revenue commits to the centi lattice; every
    * permutation's means come from exact conditional integer sums in
    * ONE fold; the B comparisons are identical doubles both engines
    * derive from those sums.
    *
    * Permutation family — NOT the u01 channel family: u01(id, c) is
    * AFFINE in c (u01(id, c₂) = u01(id, c₁) + const mod M), so two
    * channels give the same partition rotated — some "permutations"
    * would be near-copies of the observed split and the null would be
    * degenerate. Each permutation instead uses its own MULTIPLIER map
    * (id·(48271 + 1 000 003·b) mod 2³¹−1): different multipliers are
    * genuinely different permutations of Z_M, and none equals the
    * observed channel's composite multiplier.
    *
    * Plan: one user-grain aggregation, one 1-row fold carrying
    * 4·(B+1) conditional aggregates (wide but single-pass — B is a
    * knob, not data), zero joins.
    */
  def permutationTest(df: DataFrame, userCol: String, valueCol: String,
                      channel: Long = 59L, perms: Int = 64): DataFrame = {
    require(perms >= 8 && perms <= 256,
      s"permutationTest: perms in [8, 256] (got $perms)")
    val M = 2147483647L
    val users = df.groupBy(col(userCol))
      .agg(sum(round(coalesce(col(valueCol), lit(0.0)) * 100, 0)
        .cast("long")).as("__rev"))
      .localCheckpoint(eager = false)
    // the extra ·48271 mod M scramble matters: id·m_b alone stays
    // below M/2 for small consecutive ids (an EMPTY arm and an ANSI
    // divide-by-zero); the second multiplication wraps it thousands of
    // times regardless of the id range. The id is reduced mod M BEFORE
    // the first multiplication so the product stays within 63 bits for
    // ANY BIGINT id (< M·1.7e7 < 2^63): ids above ~3.6e10 would
    // otherwise wrap silently in Spark but raise in ANSI engines — an
    // engine divergence the shared-replay contract forbids.
    def arm(b: Int): Column =
      pmod(pmod(pmod(col(userCol), lit(M)) * lit(48271L + 1000003L * b),
        lit(M)) * lit(48271L), lit(M)) > lit((M - 1) / 2)
    def armAggs(t: Column, tag: String): Seq[Column] =
      Seq(count(when(t, lit(1))).as(s"__nt$tag"),
        count(when(!t, lit(1))).as(s"__nc$tag"),
        coalesce(sum(when(t, col("__rev"))), lit(0L)).as(s"__st$tag"),
        coalesce(sum(when(!t, col("__rev"))), lit(0L)).as(s"__sc$tag"))
    val allAggs = armAggs(Gen.u01(col(userCol), channel) > 0.5, "o") ++
      (1 to perms).flatMap(b => armAggs(arm(b), s"$b"))
    val f = users.agg(allAggs.head, allAggs.tail: _*)
    def diff(tag: String): Column =
      col(s"__st$tag").cast("double") /
        (lit(100.0) * col(s"__nt$tag")) -
        col(s"__sc$tag").cast("double") / (lit(100.0) * col(s"__nc$tag"))
    // a degenerate permutation (an empty arm) counts as ≥ — the
    // CONSERVATIVE direction (p can only grow) — and is never divided
    val nGeq = (1 to perms).map(b =>
      when(col(s"__nt$b") === 0L || col(s"__nc$b") === 0L, 1L)
        .when(abs(diff(s"$b")) >= abs(diff("o")), 1L).otherwise(0L))
      .reduce(_ + _)
    val ok = col("__nto") > 0 && col("__nco") > 0
    f.select((col("__nto") + col("__nco")).as("n_users"),
      round(when(ok, diff("o")), 6).as("obs_diff"),
      lit(perms).as("n_perms"),
      when(ok, nGeq).as("n_geq"),
      round(when(ok, (lit(1.0) + nGeq.cast("double")) /
        lit((perms + 1).toDouble)), 6).as("perm_p"))
  }

  /** Quantile treatment effects across the u01 hash arms — the
    * DISTRIBUTIONAL readout a mean-lift A/B test hides: the per-decile
    * treat−control quantile gap shows whether a +2% mean lift is a
    * broad shift (all deciles up) or a whale effect (p90 up, median
    * flat) — the decision between "ship for everyone" and "ship for
    * the top segment". Exact (interpolated) quantiles per arm from ONE
    * array-percentile pass each, melted to one row per decile.
    *
    * Determinism: Spark's `percentile` and DuckDB's `quantile_cont`
    * share the linear-interpolation definition over identical values
    * (the q_percentiles parity); gaps are fixed trees of the two
    * elected quantiles. EXACT percentile buffers the values — at
    * 100 TB swap in the sketch variant (the
    * [[Stats.percentilesApprox]] posture).
    *
    * Plan: one narrow projection, one 1-row two-array fold, a 9-row
    * stack. No window, no join.
    */
  def quantileTreatmentEffects(df: DataFrame, userCol: String,
                               valueCol: String,
                               channel: Long = 59L): DataFrame = {
    val base = df.select(
      (Gen.u01(col(userCol), channel) > 0.5).as("__t"),
      col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val probs = (1 to 9).map(i => s"0.${i}D").mkString(", ")
    val f = base.agg(
      count(when(col("__t"), lit(1))).as("n_treat"),
      count(when(!col("__t"), lit(1))).as("n_ctrl"),
      expr(s"percentile(CASE WHEN __t THEN __v END, array($probs))")
        .as("__qt"),
      expr(s"percentile(CASE WHEN NOT __t THEN __v END, array($probs))")
        .as("__qc"))
    val arms = (1 to 9).map { i =>
      s"$i, n_treat, n_ctrl, round(element_at(__qt, $i), 6)," +
        s" round(element_at(__qc, $i), 6)," +
        s" round(element_at(__qt, $i) - element_at(__qc, $i), 6)"
    }.mkString(", ")
    f.select(expr(s"stack(9, $arms) AS (decile, n_treat, n_ctrl," +
        " q_treat, q_ctrl, qte)"))
      .orderBy("decile")
  }

  /** Event-study readout around the [[diffInDiff]] cutoff — the
    * PER-DAY view a single DiD number hides: for every day relative to
    * the intervention, the treat−control gap and the ATT after
    * netting the pooled PRE-period gap. Pre-period rows are the
    * parallel-trends diagnostic (their att should hover near 0 — a
    * drifting pre-period att says the DiD identification is broken);
    * post-period rows show effect onset and decay.
    *
    * Determinism: the arm is the shared u01 hash; per-(day, arm) cells
    * are exact centi sums and counts; means, gaps, and att are fixed
    * double trees; days with either arm absent emit null att rather
    * than a silent zero.
    *
    * Plan: one corpus aggregation to (rel_day, arm), one bounded
    * pre-period fold broadcast back, calendar-bounded output.
    */
  def eventStudy(df: DataFrame, userCol: String, tsCol: String,
                 valueCol: String, cutoff: String,
                 channel: Long = 59L): DataFrame = {
    val base = df.select(
      (Gen.u01(col(userCol), channel) > 0.5).as("__t"),
      datediff(to_date(col(tsCol)),
        lit(cutoff).cast("date")).as("rel_day"),
      round(col(valueCol) * 100, 0).cast("long").as("__vc"))
    def arm(t: Boolean, c: Column) = when(col("__t") === t, c)
    val daily = base.groupBy(col("rel_day")).agg(
      count(arm(true, lit(1))).as("n_treat"),
      count(arm(false, lit(1))).as("n_ctrl"),
      coalesce(sum(arm(true, col("__vc"))), lit(0L)).as("__st"),
      coalesce(sum(arm(false, col("__vc"))), lit(0L)).as("__sc"))
    val pre = daily.filter(col("rel_day") < 0).agg(
      sum(col("n_treat")).as("__npt"), sum(col("n_ctrl")).as("__npc"),
      sum(col("__st")).as("__spt"), sum(col("__sc")).as("__spc"))
      .select(when(col("__npt") > 0 && col("__npc") > 0,
        col("__spt") / (lit(100.0) * col("__npt")) -
          col("__spc") / (lit(100.0) * col("__npc"))).as("__gap_pre"))
    val mt = col("__st") / (lit(100.0) * col("n_treat"))
    val mc = col("__sc") / (lit(100.0) * col("n_ctrl"))
    val both = col("n_treat") > 0 && col("n_ctrl") > 0
    daily.crossJoin(broadcast(pre))
      .select(col("rel_day"), col("n_treat"), col("n_ctrl"),
        round(when(col("n_treat") > 0, mt), 6).as("mean_treat"),
        round(when(col("n_ctrl") > 0, mc), 6).as("mean_ctrl"),
        round(when(both, mt - mc), 6).as("gap"),
        round(when(both, (mt - mc) - col("__gap_pre")), 6).as("att"))
      .orderBy("rel_day")
  }

  /** Weekly growth accounting — the standard active-user decomposition
    * (new / retained / resurrected, plus churned attributed to the week
    * the user FAILED to return): for every (user, active-week),
    * `new` = first week ever, `retained` = also active the previous
    * week, `resurrected` = returning after a gap; a user active in w
    * but not w+1 churns INTO w+1. The identity
    * Δactive = new + resurrected − churned holds by construction —
    * the product-analytics ledger behind "are we growing or churning".
    *
    * Plan: one distinct to (user, week) grain (the corpus-sized stage),
    * one per-user lag/lead window (per-key bounded), two keyed weekly
    * counts, one bounded full-outer merge (the churn series extends one
    * week past the last active week). Integer end to end.
    */
  def growthAccounting(df: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val act = df.select(col(userCol).as("__u"),
      date_trunc("week", to_date(col(tsCol))).cast("date").as("__wk"))
      .distinct()
    val w = Window.partitionBy("__u").orderBy("__wk")
    val lagged = act
      .withColumn("__prev", lag(col("__wk"), 1).over(w))
      .withColumn("__next", lead(col("__wk"), 1).over(w))
    val status = when(col("__prev").isNull, "new")
      .when(datediff(col("__wk"), col("__prev")) === 7, "retained")
      .otherwise("resurrected")
    val active = lagged.groupBy(col("__wk").as("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(status === "new", 1).otherwise(0)).cast("long")
          .as("n_new"),
        sum(when(status === "retained", 1).otherwise(0)).cast("long")
          .as("n_retained"),
        sum(when(status === "resurrected", 1).otherwise(0)).cast("long")
          .as("n_resurrected"))
    val churn = lagged
      .filter(col("__next").isNull ||
        datediff(col("__next"), col("__wk")) > 7)
      .groupBy(date_add(col("__wk"), 7).as("week"))
      .agg(count(lit(1)).cast("long").as("n_churned"))
    active.join(churn, Seq("week"), "full")
      .select(col("week"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .withColumn("net_growth",
        col("n_new") + col("n_resurrected") - col("n_churned"))
      .orderBy("week")
  }

  /** Pinball (quantile) loss of the lag-`season` seasonal-naive
    * forecast over the daily series — the scoring rule that makes
    * quantile forecasts honest (loss_q = q·(y−f)⁺ + (1−q)·(f−y)⁺; the
    * forecast minimizing it IS the q-quantile), reported per requested
    * quantile. The [[forecastBaseline]] companion: MAE scores the
    * median path; this prices the asymmetric tails a capacity planner
    * actually cares about (under-forecast at q=0.9 costs 9× what
    * over-forecast does).
    *
    * Plan: one keyed daily aggregation (corpus-sized, values on the
    * centi lattice so the day totals are exact longs), a lag window
    * over the calendar-bounded day table, and a per-quantile fold with
    * every per-day loss committed to an integer lattice (milli-centi)
    * before the sum — engine-exact even though q·diff is irrational in
    * binary. The (1−q) factors are computed ONCE here and mirrored
    * literally by the oracle generator (the tau2 lesson: 1−0.9 is not
    * the literal 0.1).
    */
  def pinballLoss(df: DataFrame, dateCol: Column, valueCol: String,
                  quantiles: Seq[Double], season: Int = 7): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q < 1),
      s"pinballLoss: quantiles in (0,1) (got $quantiles)")
    require(season >= 1, s"pinballLoss: season >= 1 (got $season)")
    val daily = df.groupBy(dateCol.as("day"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("__vc"))
    val w = Window.orderBy("day")
    val withF = daily
      .withColumn("__fc", lag(col("__vc"), season).over(w))
      .filter(col("__fc").isNotNull)
    val perQ = withF.select(explode(array(quantiles.map { q =>
      struct(lit(q).as("q"),
        when(col("__vc") >= col("__fc"),
          round(lit(q) * (col("__vc") - col("__fc")) * 1000, 0))
          .otherwise(
            round(lit(1.0 - q) * (col("__fc") - col("__vc")) * 1000, 0))
          .cast("long").as("lm"))
    }: _*)).as("s"))
      .select(col("s.q").as("quantile"), col("s.lm"))
    perQ.groupBy("quantile")
      .agg(count(lit(1)).as("n_days"), sum(col("lm")).as("__l"))
      .select(col("quantile"), col("n_days"),
        round(col("__l") / lit(100000.0) / col("n_days"), 6)
          .as("mean_pinball"))
      .orderBy("quantile")
  }

  /** Markov removal-effect attribution (Anderl et al. 2014) — the
    * principled multi-touch alternative to [[attribution]]'s positional
    * rules: per-user journeys are truncated at the first `convState`
    * touch and framed as start → touches → conv|null chains; the
    * baseline conversion probability is the absorbing-chain P(conv from
    * start), and each channel's REMOVAL EFFECT is how much of it dies
    * when journeys through that channel are lost
    * (1 − P_removed/P_full, with the channel's absorption pinned to 0).
    * Shares normalize the removal effects — a channel whose removal
    * kills most conversions earns most credit, regardless of position.
    *
    * Plan: journey framing is ONE per-user window pass (truncation flag
    * + lag/lead neighbors — no self-joins), transition counts collect a
    * |states|²-bounded table (the [[Retrieval.markovSteadyState]]
    * codebook precedent), and the |channels|+1 value iterations run on
    * that bounded matrix driver-side with exact-integer-division
    * probabilities — both engines iterate identical doubles and the
    * oracle unrolls the same supersteps. `channels` declares the
    * expected roster so a drifted corpus fails loud instead of
    * hash-flaking against a hardcoded oracle.
    */
  def removalAttribution(df: DataFrame, userCol: String, tsCol: String,
                         idCol: String, stateCol: String, convState: String,
                         channels: Seq[String] = Nil,
                         iterations: Int = 40): DataFrame = {
    require(iterations >= 1 && iterations <= 200,
      s"removalAttribution: iterations in [1, 200] (got $iterations)")
    require(!channels.exists(Set("start", "conv", "null")),
      "removalAttribution: 'start'/'conv'/'null' are reserved state names")
    val spark = df.sparkSession
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val isConv = (col(stateCol) === convState).cast("int")
    val j = df
      .withColumn("__cp", sum(isConv)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__cp") - isConv === 0) // up to + incl. first conversion
      .withColumn("__s",
        when(col(stateCol) === convState, "conv").otherwise(col(stateCol)))
      .select(col(userCol), col(tsCol), col(idCol), col("__s"))
    val jw = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val p0 = j
      .withColumn("__prev", lag(col("__s"), 1).over(jw))
      .withColumn("__nxt", lead(col("__s"), 1).over(jw))
    val pairs = p0.filter(col("__prev").isNull)
      .select(lit("start").as("f"), col("__s").as("t"))
      .unionByName(p0.filter(col("__nxt").isNotNull)
        .select(col("__s").as("f"), col("__nxt").as("t")))
      .unionByName(p0.filter(col("__nxt").isNull && col("__s") =!= "conv")
        .select(col("__s").as("f"), lit("null").as("t")))
    // Bounded pre-probe BEFORE the |states|² count collect (the
    // observedChain posture): ≤65 rows ever reach the driver, so a
    // drifted corpus with millions of distinct states fails loud
    // without materializing its transition table.
    val statesProbe = j.select(col("__s")).distinct().limit(65).collect()
      .map(_.getString(0))
    require(statesProbe.length <= 64,
      s"removalAttribution: observed >64 distinct states (sample: " +
        statesProbe.take(8).sorted.mkString("[", ", ", ", ...]") +
        ") — the chain collects a |states|^2 table; declare/clean the " +
        "roster first")
    val counts = pairs.groupBy("f", "t").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val states = counts.keysIterator
      .flatMap { case (f, t) => Iterator(f, t) }.toSeq.distinct.sorted
    val observedChannels =
      states.filterNot(Set("start", "conv", "null")).sorted
    if (channels.nonEmpty) {
      val exp = channels.sorted
      require(observedChannels == exp,
        s"removalAttribution: observed channel roster " +
        s"${observedChannels.mkString("[", ", ", "]")} differs from the " +
        s"declared roster ${exp.mkString("[", ", ", "]")} — the companion " +
        "oracle hardcodes the roster, so a drifted corpus must fail loud")
    }
    val d = states.length
    val totals = states.map(f =>
      states.foldLeft(0L)((acc, t) => acc + counts.getOrElse((f, t), 0L)))
    val p = Array.tabulate(d, d) { (i, k) =>
      if (totals(i) == 0L) { if (i == k) 1.0 else 0.0 }
      else counts.getOrElse((states(i), states(k)), 0L).toDouble / totals(i)
    }
    val ci = states.indexOf("conv")
    val ni = states.indexOf("null")
    val si = states.indexOf("start")
    require(si >= 0, "removalAttribution: no journeys observed")
    // absorption P(conv from each state) with an optional extra pinned-0
    // state (the removed channel); both engines fold j ascending
    def absorb(removed: Int): Double = {
      var a = Array.tabulate(d)(i => if (i == ci) 1.0 else 0.0)
      for (_ <- 1 to iterations) {
        a = Array.tabulate(d) { i =>
          if (i == ci) 1.0
          else if (i == ni || i == removed) 0.0
          else (0 until d).foldLeft(0.0)((acc, k) => acc + p(i)(k) * a(k))
        }
      }
      a(si)
    }
    val pFull = absorb(-1)
    val removed = observedChannels.map(c => c -> absorb(states.indexOf(c)))
    val effects = removed.map { case (c, pr) =>
      (c, pr, if (pFull > 0.0) 1.0 - pr / pFull else 0.0)
    }
    // fixed left-to-right fold in sorted channel order = the oracle's
    // literal sum order
    val totalEffect = effects.foldLeft(0.0)((acc, e) => acc + e._3)
    import spark.implicits._
    effects.map { case (c, pr, re) =>
      (c, pFull, pr, re,
        if (totalEffect > 0.0) re / totalEffect else 0.0)
    }.toDF("channel", "p_conv_full", "p_conv_removed", "removal_effect",
      "attribution")
      .select(col("channel"), round(col("p_conv_full"), 6).as("p_conv_full"),
        round(col("p_conv_removed"), 6).as("p_conv_removed"),
        round(col("removal_effect"), 6).as("removal_effect"),
        round(col("attribution"), 6).as("attribution"))
      .orderBy("channel")
  }

  /** Fleiss' kappa — chance-corrected agreement for a FIXED-SIZE rater
    * panel (R raters per unit, R > 2 where [[cohensKappa]] stops): the
    * annotation-QA readout for LLM labeling pipelines — "do the R
    * labelers (human or model) agree beyond what their marginal label
    * rates predict?" before any majority-vote label is trusted.
    *
    * Determinism: per-unit agreement P_u has the FIXED denominator
    * R(R−1), so ΣΣ n_uc² is an exact long fold and P̄ is one rational;
    * P_e folds the k declared-category totals through one fixed double
    * tree. Units with a rating count ≠ R fail loud (Fleiss requires a
    * complete panel; [[krippendorffAlpha]] is the missing-tolerant
    * sibling). Categories outside the declared roster fail loud.
    *
    * Plan: one keyed (unit, category) aggregation, one keyed per-unit
    * fold, one 1-row combine — no windows, no joins; scales in the
    * unit count.
    */
  def fleissKappa(df: DataFrame, unitCol: String, catCol: String,
                  nRaters: Int, cats: Seq[String]): DataFrame = {
    require(nRaters >= 2 && nRaters <= 64,
      s"fleissKappa: 2..64 raters (got $nRaters)")
    require(cats.size >= 2 && cats.size <= 32 && cats.distinct == cats,
      s"fleissKappa: 2..32 distinct declared categories (got $cats)")
    val sorted = cats.sorted
    val base = df.select(col(unitCol).as("__u"), col(catCol).as("__c"))
      .filter(col("__u").isNotNull)
      .withColumn("__c", when(col("__c").isin(sorted: _*), col("__c"))
        .otherwise(raise_error(concat(
          lit("fleissKappa: category outside the declared roster: "),
          col("__c").cast("string")))))
    val uc = base.groupBy(col("__u"), col("__c"))
      .agg(count(lit(1)).as("__n"))
    val perUnit = uc.groupBy(col("__u"))
      .agg(sum(col("__n")).as("__nu"),
        sum(col("__n") * col("__n")).as("__sq"))
      .withColumn("__nu", when(col("__nu") === nRaters, col("__nu"))
        .otherwise(raise_error(concat(
          lit(s"fleissKappa: unit with rating count != $nRaters " +
            "(incomplete panel; use krippendorffAlpha): "),
          col("__u").cast("string")))))
    val catAggs = sorted.zipWithIndex.map { case (c, i) =>
      sum(when(col("__c") === c, col("__n")).otherwise(0L)).as(s"__t$i") }
    val catTotals = uc.agg(catAggs.head, catAggs.tail: _*)
    // __nu feeds the fold so the complete-panel raise_error guard
    // survives column pruning (a dead guard column is no guard)
    val f = perUnit.agg(count(lit(1)).as("n_units"),
        sum(col("__nu")).as("__totr"),
        sum(col("__sq")).as("__ssq"))
      .crossJoin(broadcast(catTotals))
    val totR = col("__totr").cast("double")
    val pBar = (col("__ssq").cast("double") - totR) /
      (totR * lit((nRaters - 1).toDouble))
    val pE = sorted.indices.map { i =>
      val p = col(s"__t$i").cast("double") / totR
      p * p
    }.reduce(_ + _)
    val ok = col("n_units") >= 2L && pE < 1.0
    f.select(col("n_units"), lit(nRaters).as("n_raters"),
      round(pBar, 6).as("p_bar"),
      round(pE, 6).as("p_e"),
      round(when(ok, (pBar - pE) / (lit(1.0) - pE)), 6)
        .as("fleiss_kappa"))
  }

  /** Krippendorff's alpha (nominal) — the agreement coefficient that
    * tolerates MISSING ratings (abstaining labelers, sampled audits):
    * the general-purpose annotation-reliability number when
    * [[fleissKappa]]'s complete-panel requirement doesn't hold. α =
    * 1 − D_o/D_e over the coincidence matrix; units with fewer than 2
    * ratings carry no pairable information and are dropped (the
    * standard treatment, stated so both engines agree).
    *
    * Determinism: each unit's disagreement term (n_u² − Σ_c n_uc²)/
    * (n_u − 1) is scaled by L = lcm(1..maxRaters−1) so it is an EXACT
    * integer (the per-unit factor L/(n_u−1) divides evenly), folded as
    * an exact long sum; D_e folds the k declared-category totals in
    * one fixed double tree. A unit with more than `maxRaters` ratings
    * fails loud (the L guarantee would silently break).
    *
    * Plan: the [[fleissKappa]] plan — two keyed aggregations + a 1-row
    * combine; scales in the unit count, no windows.
    */
  def krippendorffAlpha(df: DataFrame, unitCol: String, catCol: String,
                        cats: Seq[String],
                        maxRaters: Int = 8): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 13,
      s"krippendorffAlpha: 2..13 maxRaters so lcm stays exact " +
        s"(got $maxRaters)")
    require(cats.size >= 2 && cats.size <= 32 && cats.distinct == cats,
      s"krippendorffAlpha: 2..32 distinct declared categories " +
        s"(got $cats)")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmL = (1 until maxRaters).foldLeft(1L)((l, i) => l * i / gcd(l, i))
    val sorted = cats.sorted
    val base = df.select(col(unitCol).as("__u"), col(catCol).as("__c"))
      .filter(col("__u").isNotNull && col("__c").isNotNull)
      .withColumn("__c", when(col("__c").isin(sorted: _*), col("__c"))
        .otherwise(raise_error(concat(
          lit("krippendorffAlpha: category outside the declared " +
            "roster: "), col("__c").cast("string")))))
    val uc = base.groupBy(col("__u"), col("__c"))
      .agg(count(lit(1)).as("__n"))
    val catAggsU = sorted.zipWithIndex.map { case (c, i) =>
      sum(when(col("__c") === c, col("__n")).otherwise(0L)).as(s"__c$i") }
    val puAggs = Seq(sum(col("__n")).as("__nu"),
      sum(col("__n") * col("__n")).as("__sq")) ++ catAggsU
    val perUnit = uc.groupBy(col("__u"))
      .agg(puAggs.head, puAggs.tail: _*)
      .filter(col("__nu") >= 2L)
      .withColumn("__nu", when(col("__nu") <= maxRaters, col("__nu"))
        .otherwise(raise_error(concat(
          lit(s"krippendorffAlpha: unit with more than $maxRaters " +
            "ratings: "), col("__u").cast("string")))))
      // L/(n_u - 1) divides evenly by the lcm construction -> exact long
      .withColumn("__w",
        (col("__nu") * col("__nu") - col("__sq")) *
          (lit(lcmL) / (col("__nu") - 1L)).cast("long"))
    val aggs = Seq(count(lit(1)).as("n_units"),
      sum(col("__nu")).as("n_ratings"),
      sum(col("__w")).as("__sw")) ++
      sorted.zipWithIndex.map { case (_, i) =>
        sum(col(s"__c$i")).as(s"__t$i") }
    val f = perUnit.agg(aggs.head, aggs.tail: _*)
    val nT = col("n_ratings").cast("double")
    val dO = col("__sw").cast("double") /
      (lit(lcmL.toDouble) * when(nT > 0, nT))
    val sumT2 = sorted.indices.map(i =>
      col(s"__t$i").cast("double") * col(s"__t$i")).reduce(_ + _)
    val dE = (nT * nT - sumT2) / (nT * when(nT > 1.0, nT - 1.0))
    val ok = col("n_units") >= 2L && dE > 0
    f.select(col("n_units"), col("n_ratings"),
      round(when(ok, dO), 6).as("d_observed"),
      round(when(ok, dE), 6).as("d_expected"),
      round(when(ok, lit(1.0) - dO / when(dE > 0, dE)), 6)
        .as("kripp_alpha"))
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 analysis — the
    * confounder-proof companion to [[oddsRatioRR]]: when exposure and
    * outcome are both associated with a stratum variable (Simpson's
    * trap), the crude OR lies; CMH tests the exposure–outcome
    * association WITHIN strata and pools a common odds ratio across
    * them (Mantel–Haenszel estimator with the Robins–Breslow–Greenland
    * variance for its CI).
    *
    * Scale posture: strata are NOT a declared bounded roster — the op
    * aggregates per-stratum 2×2 cells with one keyed shuffle, commits
    * each stratum's rational terms (Eᵢ, Vᵢ, Rᵢ, Sᵢ, the three RBG
    * products) to the 1e-6 lattice, and folds exact decimal sums — so
    * millions of strata cost two exchanges and no window, and both
    * engines replay the identical per-stratum double→lattice step. The
    * lattice coarsening bounds each summed term's error at 5e-7 per
    * stratum (spec'd). Single-unit strata contribute zero variance
    * (V's N−1 guard), the standard treatment.
    *
    * Emits the continuity-corrected CMH χ² (df=1), the pooled MH odds
    * ratio with its RBG 95% CI, and the crude pooled 2×2 beside it —
    * the Simpson's-paradox readout is crude OR vs MH OR.
    */
  def mantelHaenszel(df: DataFrame, stratumCol: String,
                     exposure: Column, outcome: Column): DataFrame = {
    val z = 1.959964
    val cells = df.select(col(stratumCol).as("__s"),
        exposure.cast("int").as("__e"), outcome.cast("int").as("__o"))
      .filter(col("__s").isNotNull)
      .groupBy(col("__s")).agg(
        sum(when(col("__e") === 1 && col("__o") === 1, 1L).otherwise(0L))
          .as("__a"),
        sum(when(col("__e") === 1 && col("__o") === 0, 1L).otherwise(0L))
          .as("__b"),
        sum(when(col("__e") === 0 && col("__o") === 1, 1L).otherwise(0L))
          .as("__c"),
        sum(when(col("__e") === 0 && col("__o") === 0, 1L).otherwise(0L))
          .as("__d"))
    val aD = col("__a").cast("double"); val bD = col("__b").cast("double")
    val cD = col("__c").cast("double"); val dD = col("__d").cast("double")
    val nD = aD + bD + cD + dD
    val eI = (aD + bD) * (aD + cD) / nD
    val vI = when(nD > 1.0,
      (aD + bD) * (cD + dD) * (aD + cD) * (bD + dD) /
        (nD * nD * (nD - 1.0))).otherwise(lit(0.0))
    val rI = aD * dD / nD
    val sI = bD * cD / nD
    val pI = (aD + dD) / nD
    val qI = (bD + cD) / nD
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def lat(c: Column) = dec(round(c * 1e6, 0).cast("long"))
    val f = cells.agg(count(lit(1)).as("n_strata"),
      sum(col("__a")).as("n_exposed_pos"),
      sum(col("__b")).as("n_exposed_neg"),
      sum(col("__c")).as("n_unexposed_pos"),
      sum(col("__d")).as("n_unexposed_neg"),
      sum(lat(eI)).as("__se"), sum(lat(vI)).as("__sv"),
      sum(lat(rI)).as("__sr"), sum(lat(sI)).as("__ss"),
      sum(lat(pI * rI)).as("__spr"),
      sum(lat(pI * sI + qI * rI)).as("__spsqr"),
      sum(lat(qI * sI)).as("__sqs"))
    val sumA = col("n_exposed_pos").cast("double")
    val sE = col("__se").cast("double") / 1e6
    val sV = col("__sv").cast("double") / 1e6
    val sR = col("__sr").cast("double") / 1e6
    val sS = col("__ss").cast("double") / 1e6
    val sPR = col("__spr").cast("double") / 1e6
    val sPSQR = col("__spsqr").cast("double") / 1e6
    val sQS = col("__sqs").cast("double") / 1e6
    // denominators guarded IN PLACE (the cronbachAlpha lesson: repeated
    // subexpressions escape the when(ok) gate via hoisting under ANSI)
    val sRg = when(sR > 0, sR); val sSg = when(sS > 0, sS)
    val gap = abs(sumA - sE) - 0.5
    val chi2 = greatest(gap, lit(0.0)) * greatest(gap, lit(0.0)) /
      when(sV > 0, sV)
    val mhOr = sR / sSg
    val seLn = sqrt(sPR / (lit(2.0) * sRg * sRg) +
      sPSQR / (lit(2.0) * sRg * sSg) +
      sQS / (lit(2.0) * sSg * sSg))
    val crudeOr = sumA * col("n_unexposed_neg").cast("double") /
      when(col("n_exposed_neg") > 0 && col("n_unexposed_pos") > 0,
        col("n_exposed_neg").cast("double") * col("n_unexposed_pos"))
    val ok = sV > 0 && sR > 0 && sS > 0
    f.select(col("n_strata"), col("n_exposed_pos"), col("n_exposed_neg"),
      col("n_unexposed_pos"), col("n_unexposed_neg"),
      round(when(ok, chi2), 6).as("cmh_chi2"),
      round(when(ok, mhOr), 6).as("mh_odds_ratio"),
      round(when(ok, exp(log(mhOr) - lit(z) * seLn)), 6).as("or_ci_lo"),
      round(when(ok, exp(log(mhOr) + lit(z) * seLn)), 6).as("or_ci_hi"),
      round(crudeOr, 6).as("crude_odds_ratio"))
  }

  /** Two-sample Poisson rate test — the guardrail for COUNT-per-
    * exposure metrics (error rates, crash rates, requests per user)
    * where [[abTest]]'s per-user means are the wrong grain: compares
    * eventA-count / exposure between two declared groups with the Wald
    * z on the log rate ratio AND the conditional (binomial) z — the
    * exact-conditioning framing X_a | X ~ Bin(X, T_a/(T_a+T_b)) that
    * stays honest when one side's count is small.
    *
    * All four inputs are exact integer counts from ONE corpus fold;
    * every emitted number is a fixed double tree over them (z =
    * 1.959964 shared verbatim). Empty counts or exposures NULL the
    * estimates rather than throw.
    *
    * Plan: one map-side-combined fold to a single row — no shuffle
    * beyond the 1-row combine, no window, no join.
    */
  def poissonRateTest(df: DataFrame, group: Column, groupA: String,
                      groupB: String, isEvent: Column): DataFrame = {
    val z = 1.959964
    val base = df.select(group.as("__g"), isEvent.cast("int").as("__x"))
      .filter(col("__g").isin(groupA, groupB))
    val f = base.agg(
      sum(when(col("__g") === groupA, col("__x").cast("long"))
        .otherwise(0L)).as("n_events_a"),
      sum(when(col("__g") === groupA, 1L).otherwise(0L))
        .as("n_exposure_a"),
      sum(when(col("__g") === groupB, col("__x").cast("long"))
        .otherwise(0L)).as("n_events_b"),
      sum(when(col("__g") === groupB, 1L).otherwise(0L))
        .as("n_exposure_b"))
    val xa = col("n_events_a").cast("double")
    val ta = col("n_exposure_a").cast("double")
    val xb = col("n_events_b").cast("double")
    val tb = col("n_exposure_b").cast("double")
    val ok = col("n_events_a") > 0 && col("n_events_b") > 0 &&
      col("n_exposure_a") > 0 && col("n_exposure_b") > 0
    // in-place denominator guards (the cronbachAlpha hoisting lesson)
    val taG = when(ta > 0, ta); val tbG = when(tb > 0, tb)
    val xaG = when(xa > 0, xa); val xbG = when(xb > 0, xb)
    val rr = (xa / taG) / (xb / tbG)
    val seLn = sqrt(lit(1.0) / xaG + lit(1.0) / xbG)
    val p = ta / when(ta + tb > 0, ta + tb)
    val zCond = (xa - (xa + xb) * p) / sqrt((xa + xb) * p * (lit(1.0) - p))
    f.select(col("n_events_a"), col("n_exposure_a"),
      col("n_events_b"), col("n_exposure_b"),
      round(when(ok, xa / taG), 6).as("rate_a"),
      round(when(ok, xb / tbG), 6).as("rate_b"),
      round(when(ok, rr), 6).as("rate_ratio"),
      round(when(ok, exp(log(rr) - lit(z) * seLn)), 6).as("rr_ci_lo"),
      round(when(ok, exp(log(rr) + lit(z) * seLn)), 6).as("rr_ci_hi"),
      round(when(ok, log(rr) / seLn), 6).as("z_wald"),
      round(when(ok, zCond), 6).as("z_conditional"))
  }
}
