package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits for training-data release: k-anonymity and
  * l-diversity over declared quasi-identifier columns, plus the numeric
  * generalization (banding) step of the classic anonymization loop
  * (Sweeney 2002, "k-anonymity: a model for protecting privacy";
  * Machanavajjhala et al. 2007, "l-diversity").
  *
  * A 100 TB corpus release gate runs exactly this shape: one shuffled
  * aggregation on the quasi-identifier key builds the equivalence-class
  * table (map-side combined; output bounded by |domain(QI)|, never
  * corpus-sized), and every report below folds that bounded table — no
  * second pass over the raw data, no per-row risk scoring.
  *
  * Reference anchor: the reference validates uniqueness/in-set constraints
  * per entity (`scripts/data_quality_checks.py:61-118`) but has no re-id
  * risk audit; this is the release-side complement a feature store feeding
  * shared training data needs.
  */
object Privacy {

  /** Equivalence classes: one row per distinct QI combination with its
    * size. The building block the reports fold; exposed for callers that
    * want the full histogram.
    */
  def equivalenceClasses(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity: at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
  }

  /** K-anonymity report (one row): the dataset's k (smallest equivalence
    * class), class counts, and how many classes/rows fall below the
    * declared threshold. `k_anonymity >= k_threshold` is the release gate.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
                       kThreshold: Int): DataFrame = {
    require(kThreshold >= 2, s"kAnonymity: threshold >= 2 (got $kThreshold)")
    equivalenceClasses(df, quasiCols).agg(
      count(lit(1)).as("n_classes"),
      sum(col("class_size")).cast("long").as("n_rows"),
      min(col("class_size")).cast("long").as("k_anonymity"),
      sum(when(col("class_size") < kThreshold, 1).otherwise(0))
        .cast("long").as("classes_below_k"),
      sum(when(col("class_size") < kThreshold, col("class_size"))
        .otherwise(0)).cast("long").as("rows_below_k"))
  }

  /** The offending QI combinations (class_size < kThreshold), smallest —
    * i.e. most identifying — first. Output bounded by the number of rare
    * classes; at scale this is the suppression worklist.
    */
  def kAnonymityOffenders(df: DataFrame, quasiCols: Seq[String],
                          kThreshold: Int): DataFrame = {
    require(kThreshold >= 2, s"kAnonymity: threshold >= 2 (got $kThreshold)")
    equivalenceClasses(df, quasiCols)
      .filter(col("class_size") < kThreshold)
      .orderBy(col("class_size") +: quasiCols.map(col): _*)
  }

  /** L-diversity report (one row): per equivalence class, the number of
    * DISTINCT sensitive values; the dataset's l is the minimum. A class
    * that is k-anonymous but l=1 still leaks the sensitive attribute
    * exactly (the homogeneity attack l-diversity exists to catch).
    * One aggregation on (QI, sensitive) then a fold over the bounded
    * class table — the sensitive domain never ships to the driver.
    */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: Column, lThreshold: Int): DataFrame = {
    require(lThreshold >= 2, s"lDiversity: threshold >= 2 (got $lThreshold)")
    val classes = df
      .groupBy(quasiCols.map(col) :+ sensitiveCol.as("__sens"): _*)
      .agg(count(lit(1)).as("n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("l_div"), sum(col("n")).as("class_size"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      min(col("l_div")).cast("long").as("l_diversity"),
      sum(when(col("l_div") < lThreshold, 1).otherwise(0))
        .cast("long").as("classes_below_l"),
      sum(when(col("l_div") < lThreshold, col("class_size")).otherwise(0))
        .cast("long").as("rows_below_l"))
  }

  /** T-closeness report (one row): per equivalence class, the total-
    * variation distance between the class's sensitive-value distribution
    * and the GLOBAL sensitive distribution; the dataset's t is the
    * maximum. Closes the gap l-diversity leaves open (Li et al. 2007,
    * "t-closeness"): a class can hold l distinct sensitive values yet
    * still be skewed far from the population (the skewness attack — 99%
    * "positive" in a class where the population is 1% positive leaks
    * nearly as much as homogeneity).
    *
    * TVD identity that keeps the fold join-free over absent values:
    * Σ_s |p_c − p_g| / 2 = Σ_s max(p_c − p_g, 0), and p_c > p_g ≥ 0
    * requires s PRESENT in the class — so summing `greatest(p_c − p_g, 0)`
    * over observed (QI, s) pairs alone is exact, no outer join against the
    * sensitive domain. One aggregation on (QI, sensitive), one on QI, one
    * bounded fold — same two-scan shape as [[lDiversityReport]].
    */
  def tClosenessReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: Column, tThreshold: Double): DataFrame = {
    require(tThreshold > 0.0 && tThreshold < 1.0,
      s"tCloseness: threshold in (0,1) (got $tThreshold)")
    val joint = df
      .groupBy(quasiCols.map(col) :+ sensitiveCol.as("__sens"): _*)
      .agg(count(lit(1)).cast("double").as("__nqs"))
    val global = df.groupBy(sensitiveCol.as("__sens"))
      .agg(count(lit(1)).cast("double").as("__ns"))
    val n = df.agg(count(lit(1)).cast("double").as("__n"))
    val classes = joint
      .join(global, Seq("__sens"))
      .crossJoin(broadcast(n))
      .withColumn("__cls_n",
        sum(col("__nqs")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(quasiCols.map(col): _*)))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(greatest(col("__nqs") / col("__cls_n")
          - col("__ns") / col("__n"), lit(0.0))).as("tvd"),
        min(col("__cls_n")).cast("long").as("class_size"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      round(max(col("tvd")), 6).as("t_closeness"),
      sum(when(col("tvd") > tThreshold, 1).otherwise(0))
        .cast("long").as("classes_above_t"),
      sum(when(col("tvd") > tThreshold, col("class_size")).otherwise(0))
        .cast("long").as("rows_above_t"))
  }

  /** Numeric generalization: coarsen a value to its band floor
    * (`floor(v / width) * width`) — the standard k-anonymity repair move
    * for continuous quasi-identifiers. Pure projection; recompute the
    * report on the banded column to measure the privacy/utility trade.
    */
  def band(c: Column, width: Double): Column = {
    require(width > 0, s"band: width > 0 (got $width)")
    floor(c / width) * width
  }

  /** ε-differentially-private histogram release via the two-sided
    * geometric mechanism (Ghosh–Roughgarden–Sundararajan 2009 — the
    * discrete Laplace: noise = G₁ − G₂ with Gᵢ geometric, the optimal
    * integer mechanism for counting queries at sensitivity 1). Noise is
    * SEEDED per category from the md5-prefix key through the shared
    * minstd [[Gen.u01]] stream (two channels), so the release is
    * reproducible and oracle-checkable — the audit form of the
    * mechanism: swap a real entropy source over the same inverse-CDF
    * (floor(ln u / −ε)) for production. Raw noisy counts are released
    * unclamped (negative counts are part of the unbiased mechanism;
    * post-process downstream if a consumer needs ℕ).
    *
    * Plan: one keyed count (the only corpus-sized stage), then a narrow
    * projection per category row — the noise costs nothing at any
    * scale. Integer end to end except the two per-category ln calls.
    */
  /** Seeded randomized-response prevalence estimate (Warner 1965,
    * forced-response variant — the local-DP mechanism): each entity
    * answers TRUTHFULLY with probability p, otherwise a forced coin
    * answers yes/no 50/50; the population rate deconvolves as
    * π̂ = (reported_rate − (1−p)/2) / p. Like [[dpHistogram]] the
    * randomness is seeded per entity through the shared minstd stream —
    * the reproducible AUDIT form (the true rate rides along so the
    * estimator's error is visible; a real deployment never sees it and
    * uses client entropy). ε = ln((p + (1−p)/2) / ((1−p)/2)).
    *
    * One entity-grain fold + one 1-row aggregate; the estimate is a
    * single engine-identical division chain over exact counts.
    */
  def randomizedResponse(df: DataFrame, userCol: String,
                         sensitive: Column, p: Double = 0.75,
                         channel: Long = 101L): DataFrame = {
    require(p > 0.0 && p < 1.0,
      s"randomizedResponse: p in (0,1) (got $p)")
    val forcedYesShare = (1.0 - p) / 2.0
    val users = df.groupBy(col(userCol).as("__u"))
      .agg(max(sensitive.cast("int")).as("__truth"))
      .withColumn("__honest", Gen.u01(col("__u"), channel) <= p)
      .withColumn("__forced",
        (Gen.u01(col("__u"), channel + 1) > 0.5).cast("int"))
      .withColumn("__reported",
        when(col("__honest"), col("__truth")).otherwise(col("__forced")))
    users.agg(
      count(lit(1)).as("n"),
      sum(col("__reported")).cast("long").as("n_reported_yes"),
      sum(col("__truth")).cast("long").as("n_true_yes"))
      .select(col("n"), col("n_reported_yes"), col("n_true_yes"),
        round(col("n_reported_yes") / col("n").cast("double"), 6)
          .as("reported_rate"),
        round((col("n_reported_yes") / col("n").cast("double")
          - lit(forcedYesShare)) / lit(p), 6).as("estimated_rate"),
        round(col("n_true_yes") / col("n").cast("double"), 6)
          .as("true_rate"),
        lit(p).as("p_truth"))
  }

  /** ε-DP mean release via the standard sum/count decomposition: clip
    * to the DECLARED [lo, hi] (clipping bounds the sensitivity — an
    * unbounded value has no finite-ε mean), release a noisy SUM
    * (two-sided geometric at centi sensitivity (hi−lo)·100, ε/2) and a
    * noisy COUNT (sensitivity 1, ε/2), and post-process the ratio.
    * Noise is seeded through the shared minstd stream like
    * [[dpHistogram]] — the reproducible AUDIT form (the exact mean
    * rides along so the mechanism's error is visible; production swaps
    * real entropy over the same inverse CDF). Both engines compute the
    * ε subdivisions as the same runtime double ops, so the draws are
    * bit-identical.
    *
    * Plan: one clipped 1-row fold; the noise is two ln calls.
    */
  def dpMean(df: DataFrame, valueCol: String, lo: Double, hi: Double,
             epsilon: Double, channel: Long = 201L): DataFrame = {
    require(epsilon > 0.0 && epsilon <= 10.0,
      s"dpMean: epsilon in (0, 10] (got $epsilon)")
    require(hi > lo, s"dpMean: need lo < hi (got [$lo, $hi])")
    val sens = math.round((hi - lo) * 100)
    // a clip range under one centi would make sens = 0 and e2/sens
    // infinite — the geometric noise silently collapses to 0 and the
    // release is labeled epsilon-DP with NO sum noise; fail loud
    require(sens >= 1,
      s"dpMean: clip range must be >= 0.01 (got hi - lo = ${hi - lo})")
    val key = lit(777L) // single-release seed
    def geom(c: Long, eps: Double): Column =
      floor(log(Gen.u01(key, c)) / lit(-eps)).cast("long")
    val e2 = epsilon / 2.0
    val sumNoise = geom(channel, e2 / sens.toDouble) -
      geom(channel + 1, e2 / sens.toDouble)
    val cntNoise = geom(channel + 2, e2) - geom(channel + 3, e2)
    val vc = round(least(greatest(col(valueCol), lit(lo)), lit(hi)) * 100,
      0).cast("long")
    val f = df.filter(col(valueCol).isNotNull)
      .agg(count(lit(1)).as("n"), coalesce(sum(vc), lit(0L)).as("__s"))
    val noisyN = col("n") + cntNoise
    val exactMean = when(col("n") > 0,
      col("__s").cast("double") / (lit(100.0) * col("n").cast("double")))
    val dpM = when(noisyN > 0, (col("__s") + sumNoise).cast("double") /
      (lit(100.0) * noisyN.cast("double")))
    f.select(col("n"),
      round(exactMean, 6).as("exact_mean"),
      noisyN.as("noisy_n"),
      round(dpM, 6).as("dp_mean"),
      round(when(exactMean.isNotNull && dpM.isNotNull,
        abs(dpM - exactMean)), 6).as("abs_err"),
      lit(epsilon).as("epsilon"))
  }

  def dpHistogram(df: DataFrame, catCol: String,
                  epsilon: Double, channel: Long = 97L): DataFrame = {
    require(epsilon > 0.0 && epsilon <= 10.0,
      s"dpHistogram: epsilon in (0, 10] (got $epsilon)")
    val key = conv(substring(md5(col("category")), 1, 8), 16, 10)
      .cast("long")
    def geom(c: Long): Column =
      floor(log(Gen.u01(key, c)) / lit(-epsilon)).cast("long")
    val noise = (geom(channel) - geom(channel + 1)).as("noise")
    df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"))
      .select(col("category"), col("n"), noise,
        (col("n") + (geom(channel) - geom(channel + 1))).as("noisy_n"),
        lit(epsilon).as("epsilon"))
      .orderBy("category")
  }
}
