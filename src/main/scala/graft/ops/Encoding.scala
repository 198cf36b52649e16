package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical feature encoders for the training handoff (SURVEY.md §7.4
  * extension set): the hashing trick and explicit one-hot indicators.
  * Both are narrow codegen'd projections — no shuffle, no fitted
  * vocabulary state — and both use engine-parity hashing/derivations so
  * every encoded value is DuckDB-oracle checkable.
  */
object Encoding {

  /** Hashing-trick bucket of a categorical value: the first 8 hex chars of
    * md5, parsed as an integer, mod `nBuckets` — stable across engines
    * (md5 is bytewise identical; the 32-bit prefix fits a long with no
    * sign issues) and across corpus growth (no fitted dictionary, the
    * property that makes the hashing trick the 100 TB encoder: unseen
    * categories at serving time map without a vocabulary broadcast).
    * NULL categories map to NULL (caller decides imputation).
    */
  def hashBucket(cat: Column, nBuckets: Int): Column =
    (conv(substring(md5(cat), 1, 8), 16, 10).cast("long") % nBuckets)
      .cast("int")

  /** Append a hashed-bucket column per categorical column:
    * `<col>_bucket`. */
  def featureHash(df: DataFrame, catCols: Seq[String],
                  nBuckets: Int): DataFrame =
    catCols.foldLeft(df)((d, c) =>
      d.withColumn(s"${c}_bucket", hashBucket(col(c), nBuckets)))

  /** Explicit one-hot indicators over a DECLARED category list (the
    * bounded-domain encoder — order of `categories` fixes column order;
    * values outside the list get all-zero indicators, the standard
    * handle-unknown=ignore contract). Indicator columns are
    * `is_<category>` ints; the declared categories must be distinct and
    * identifier-safe (they become column names) — enforced up front so a
    * stray space or duplicate fails loud instead of producing broken or
    * colliding columns.
    */
  def oneHot(df: DataFrame, catCol: String,
             categories: Seq[String]): DataFrame = {
    require(categories.distinct.size == categories.size,
      s"oneHot: duplicate categories in ${categories.mkString(",")}")
    val unsafe = categories.filterNot(_.matches("[A-Za-z0-9_]+"))
    require(unsafe.isEmpty,
      s"oneHot: categories must be identifier-safe ([A-Za-z0-9_]+) to " +
        s"become column names; got ${unsafe.mkString(",")}")
    categories.foldLeft(df)((d, c) =>
      d.withColumn(s"is_$c",
        when(col(catCol) === c, 1).otherwise(0)))
  }

  /** Smoothed target (mean) encoding: each category's target mean shrunk
    * toward the global mean by a pseudo-count prior —
    * `enc = (Σ target + m·global_mean) / (n + m)` — the classic
    * high-cardinality categorical encoder (bayesian mean encoding). Rare
    * categories collapse to the global mean instead of memorizing noise;
    * `m` is the prior strength in pseudo-rows. NULL categories are
    * excluded (caller imputes first if they carry signal).
    *
    * Returns the fitted encoding TABLE (cat, n, enc) — the bounded
    * artifact to broadcast-join onto training/serving frames — not the
    * projected input: one full-input aggregation on the category key plus
    * a broadcast 1-row global, so the plan is a single shuffle bounded by
    * category cardinality at any corpus size.
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   smoothing: Double = 10.0): DataFrame = {
    val nonNull = df.filter(col(catCol).isNotNull)
    val global = nonNull.agg(avg(col(targetCol)).as("__global"))
    nonNull.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(col(targetCol)).as("__sum"))
      .crossJoin(broadcast(global))
      .withColumn("enc",
        round((col("__sum") + lit(smoothing) * col("__global")) /
          (col("n") + lit(smoothing)), 6))
      .select(col(catCol), col("n"), col("enc"))
      .orderBy(col(catCol))
  }

  /** Leakage-safe (out-of-fold) smoothed target encoding — the form of
    * [[targetEncode]] a training pipeline must actually use: rows are
    * assigned to `folds` deterministic hash folds BY ENTITY (`keyCol`,
    * so all of one user's rows share a fold and a user can never see its
    * own label), and fold f's encoding of category c is fitted on the
    * OTHER folds only: enc(c, f) = (Σ_oof target + m·G) / (n_oof + m),
    * with G the global mean and m the prior strength. A category seen
    * only inside fold f collapses to G exactly ((0 + mG)/(0 + m)) — the
    * smoothing is the cold-start path, not a special case.
    *
    * Returns the fitted (category, fold) TABLE — category × folds rows,
    * the bounded artifact a trainer broadcast-joins onto each row by
    * (cat, fold(key)) — computed as ONE category×fold aggregation plus
    * in-plan totals (no per-fold passes over the corpus).
    *
    * Float determinism: per-row targets commit to the centi lattice
    * before any sum, so fold/total sums are exact longs and the single
    * final division is engine-identical — encodings can be compared
    * across engines at 6 decimals without accumulation-order risk.
    */
  def targetEncodeOof(df: DataFrame, catCol: String, targetCol: String,
                      keyCol: String, folds: Int = 5,
                      smoothing: Double = 10.0,
                      channel: Long = 83L): DataFrame = {
    require(folds >= 2 && folds <= 64,
      s"targetEncodeOof: folds in [2, 64] (got $folds)")
    require(smoothing > 0,
      s"targetEncodeOof: smoothing > 0 (got $smoothing)")
    val base = df.filter(col(catCol).isNotNull)
      .select(col(catCol).as("category"),
        least(floor(Gen.u01(col(keyCol), channel) * folds),
          lit(folds - 1L)).cast("int").as("fold"),
        round(col(targetCol) * 100, 0).cast("long").as("__tc"))
    val perCatFold = base.groupBy(col("category"), col("fold"))
      .agg(count(lit(1)).as("n_in_fold"), sum(col("__tc")).as("__sc"))
    val wCat = Window.partitionBy(col("category"))
    val tot = base.agg(count(lit(1)).as("__n"), sum(col("__tc")).as("__s"))
      .withColumn("__g", col("__s") / (lit(100.0) * col("__n")))
    perCatFold
      .withColumn("__nc", sum(col("n_in_fold")).over(wCat))
      .withColumn("__scat", sum(col("__sc")).over(wCat))
      .crossJoin(broadcast(tot.select(col("__g"))))
      .withColumn("n_out_of_fold", col("__nc") - col("n_in_fold"))
      .withColumn("enc", round(
        (((col("__scat") - col("__sc")) / lit(100.0))
          + lit(smoothing) * col("__g"))
          / (col("n_out_of_fold") + lit(smoothing)), 6))
      .select(col("category"), col("fold"), col("n_in_fold"),
        col("n_out_of_fold"), col("enc"))
      .orderBy("category", "fold")
  }

  /** Z-score standardization of numeric columns: `(x − μ)/σ_pop` appended
    * as `<col>_z`, with constant columns (σ = 0) mapping to 0.0 instead
    * of NULL/Inf. The fit is ONE broadcast 1-row aggregate over all
    * columns at once (no per-column pass), and the transform is a narrow
    * codegen'd projection — the scaling feeds straight into the training
    * handoff at any scale. Column names become `<col>_z`, so they must be
    * identifier-safe — enforced up front, mirroring [[oneHot]].
    *
    * Not [[graft.ops.Stats.scaleFeatures]] with fewer columns: that is
    * the exploratory REPORT form (sample σ, z + min-max side by side,
    * NULL on spread-free columns so a human sees the degenerate column).
    * This is the sklearn-StandardScaler serving convention — population
    * σ and 0.0 imputation, so a constant feature never injects NULLs
    * into a model input vector.
    */
  def standardScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    val unsafe = cols.filterNot(_.matches("[A-Za-z0-9_]+"))
    require(unsafe.isEmpty,
      s"standardScale: column names must be identifier-safe to derive " +
        s"'_z' names; got ${unsafe.mkString(",")}")
    val statAggs = cols.flatMap(c => Seq(
      avg(col(c)).as(s"__mu_$c"), stddev_pop(col(c)).as(s"__sigma_$c")))
    val withStats = df.crossJoin(
      broadcast(df.agg(statAggs.head, statAggs.tail: _*)))
    cols.foldLeft(withStats)((d, c) =>
        d.withColumn(s"${c}_z",
          round(when(col(s"__sigma_$c") > 0.0,
            (col(c) - col(s"__mu_$c")) / col(s"__sigma_$c"))
            .otherwise(0.0), 6)))
      .drop(cols.flatMap(c => Seq(s"__mu_$c", s"__sigma_$c")): _*)
  }

  /** Robust (median/IQR) scaling — the outlier-immune sibling of
    * [[standardScale]] for heavy-tailed features, where a single extreme
    * value drags μ/σ but leaves the quartiles untouched:
    * `(x − median) / (q3 − q1)` appended as `<col>_rs`, constant-IQR
    * columns mapping to 0.0. Same plan: one broadcast exact-percentile
    * aggregate over all columns, then a narrow projection.
    */
  def robustScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    val unsafe = cols.filterNot(_.matches("[A-Za-z0-9_]+"))
    require(unsafe.isEmpty,
      s"robustScale: column names must be identifier-safe to derive " +
        s"'_rs' names; got ${unsafe.mkString(",")}")
    // one array-percentile per column (single value buffer each), split
    // into median/IQR in the projection below
    val statAggs = cols.map(c =>
      expr(s"percentile(CAST($c AS DOUBLE), array(0.25D, 0.5D, 0.75D))")
        .as(s"__q_$c"))
    val withStats = df.crossJoin(
      broadcast(df.agg(statAggs.head, statAggs.tail: _*)))
    cols.foldLeft(withStats) { (d, c) =>
        val med = element_at(col(s"__q_$c"), 2)
        val iqr = element_at(col(s"__q_$c"), 3) - element_at(col(s"__q_$c"), 1)
        d.withColumn(s"${c}_rs",
          round(when(iqr > 0.0, (col(c) - med) / iqr).otherwise(0.0), 6))
      }
      .drop(cols.map(c => s"__q_$c"): _*)
  }
  /** Weight-of-evidence encoding + information value — the
    * credit-scoring-standard supervised categorical encoder: per
    * category, WOE = ln(posShare / negShare) over additively-smoothed
    * class distributions (smoothing `s` spread over the K observed
    * categories, the [[graft.ops.TextAnalysis.dsirWeights]] convention,
    * so empty classes never hit ln(0)), and the IV term
    * (posShare − negShare)·WOE whose total ranks the feature's
    * predictive power (<0.02 useless, >0.3 strong — Siddiqi's bands).
    *
    * Plan: ONE aggregation to category grain (the corpus-sized stage,
    * map-side combined); shares, WOE, and the IV fold all run over the
    * K-row category frame.
    */
  def woeEncode(df: DataFrame, catCol: String, label: Column,
                smoothing: Double = 0.5): DataFrame = {
    require(smoothing > 0.0, s"woeEncode: smoothing > 0 (got $smoothing)")
    val whole = Window.partitionBy()
    val per = df.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"), sum(label.cast("long")).as("n_pos"))
      .withColumn("n_neg", col("n") - col("n_pos"))
    val k = count(lit(1)).over(whole)
    val ps = (col("n_pos") + lit(smoothing)) /
      (sum(col("n_pos")).over(whole) + lit(smoothing) * k)
    val ns = (col("n_neg") + lit(smoothing)) /
      (sum(col("n_neg")).over(whole) + lit(smoothing) * k)
    per
      .withColumn("__woe", log(ps) - log(ns))
      .withColumn("__iv", (ps - ns) * (log(ps) - log(ns)))
      .select(col("category"), col("n"), col("n_pos"), col("n_neg"),
        round(col("__woe"), 6).as("woe"),
        round(col("__iv"), 6).as("iv_term"),
        round(sum(col("__iv")).over(whole), 6).as("iv_total"))
      .orderBy("category")
  }
}