package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine model training — deterministic full-batch logistic regression
  * expressed as declarative gradient-descent supersteps, the training-side
  * complement of [[MLBridge.trainOnFeatures]] (which delegates to MLlib's
  * sampled/quasi-Newton fit and is therefore not engine-replayable).
  *
  * A curation pipeline trains small linear quality/language classifiers over
  * engineered features constantly (fastText-style filters, CCNet's quality
  * buckets); this is that trainer as a pure dataflow: every superstep is one
  * broadcast of the (1-row) weight frame, one narrow projection computing
  * each row's residual, and ONE keyed aggregation at (dimension) grain —
  * n·(d+1) rows shuffled per step with map-side partial sums, state bounded
  * by d+1 doubles regardless of corpus size. No driver-side math: weights
  * live in a DataFrame end to end.
  *
  * Determinism contract (same discipline as [[Clustering.kmeans]] /
  * [[Graph.pageRank]]): zero-initialized weights, a FIXED superstep count
  * (no float-tolerance convergence test), gradient = sum(resid·x)/count
  * with the division spelled explicitly (sum-then-divide, never a built-in
  * mean/co-moment whose accumulation algorithm differs across engines —
  * the trendPerKey lesson), and the sigmoid/dot spelled with the identical
  * expression tree the DuckDB oracle replays.
  */
object Learn {

  /** Σ aᵢ·bᵢ with strict left-to-right accumulation — HOF twin of DuckDB's
    * `list_inner_product` (same shape as [[Clustering]]'s).
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def sigmoid(m: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-m))

  /** Full-batch logistic-regression GD: returns one row per input row with
    * the final margin wᵀx, probability σ(wᵀx), hard prediction at 0.5 and
    * the true label — the scored corpus a quality-filter stage consumes.
    *
    * Features are the embedding with a prepended intercept component
    * (x₀ = 1). Each of the `iterations` supersteps computes
    * w ← w − η · Σᵢ(σ(wᵀxᵢ) − yᵢ)·xᵢ / n via posexplode to (dim) grain +
    * one aggregation (d+1 final rows), folds the gradient back into an
    * array with the kmeans sort-struct idiom, and truncates lineage with
    * `localCheckpoint` (swap `checkpoint` on a cluster). The weight and
    * gradient frames are 1-row broadcasts; the corpus is never collected,
    * sorted, or replicated.
    */
  def logisticGD(emb: DataFrame, idCol: String, vecCol: String,
                 label: Column, eta: Double = 0.5,
                 iterations: Int = 3): DataFrame = {
    require(eta > 0 && eta <= 10.0, s"logisticGD: eta in (0, 10] (got $eta)")
    require(iterations >= 1 && iterations <= 20,
      s"logisticGD: iterations in [1, 20] (got $iterations)")
    val vecs = emb.select(col(idCol).as("__id"),
        concat(array(lit(1.0)), col(vecCol).cast("array<double>")).as("__x"),
        label.cast("int").as("__y"))
      .localCheckpoint()
    val w = fitLr(vecs, eta, iterations)
    vecs.crossJoin(broadcast(w))
      .withColumn("__m", dot(col("__w"), col("__x")))
      .select(col("__id").as(idCol),
        col("__y").as("y"),
        round(col("__m"), 6).as("margin"),
        round(sigmoid(col("__m")), 6).as("prob"),
        (sigmoid(col("__m")) >= 0.5).cast("int").as("pred"))
      .orderBy(idCol)
  }

  /** The full-batch GD weight fit shared by [[logisticGD]] and
    * [[logisticImportance]] — zero init, `iterations` supersteps of
    * w ← w − η·mean((σ(w·x) − y)·x), oracle-replayed step for step. */
  private def fitLr(vecs: DataFrame, eta: Double,
                    iterations: Int): DataFrame = {
    // zero init: length from any row (values are zeros either way)
    var w = vecs.orderBy(col("__id")).limit(1)
      .select(transform(col("__x"), _ => lit(0.0)).as("__w"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iterations) {
      val grad = vecs.crossJoin(broadcast(w))
        .select((sigmoid(dot(col("__w"), col("__x")))
          - col("__y").cast("double")).as("__r"),
          posexplode(col("__x")).as(Seq("__dim", "__c")))
        .groupBy(col("__dim"))
        .agg(sum(col("__r") * col("__c")).as("__s"),
          count(lit(1)).as("__n"))
        .agg(array_sort(collect_list(struct(col("__dim"),
          (col("__s") / col("__n").cast("double")).as("__g")))).as("__sg"))
        .select(transform(col("__sg"), s => s.getField("__g")).as("__grad"))
      w = w.crossJoin(grad)
        .select(zip_with(col("__w"), col("__grad"),
          (a, g) => a - lit(eta) * g).as("__w"))
        .localCheckpoint(eager = false)
    }
    w
  }

  /** Standardized-coefficient feature importance of the [[logisticGD]]
    * model: per dimension, the fitted weight, the feature's population
    * std, and importance = |w|·std — the unit-free ranking (a large
    * weight on a tiny-variance feature moves nothing). The honest
    * screen for "which embedding dimensions does the quality filter
    * actually use", without k refit passes.
    *
    * Feature moments ride the 1e-6 lattice (exact long/HUGEINT sums),
    * the weight comes from the superstep-replayed fit, and the rank
    * orders by the ROUNDED importance (dim tiebreak) so it can never
    * flip on sub-rounding noise. Dim 0 is the intercept (std 0,
    * importance 0, kept and labeled).
    */
  def logisticImportance(emb: DataFrame, idCol: String, vecCol: String,
                         label: Column, eta: Double = 0.5,
                         iterations: Int = 3): DataFrame = {
    require(eta > 0 && eta <= 10.0,
      s"logisticImportance: eta in (0, 10] (got $eta)")
    require(iterations >= 1 && iterations <= 20,
      s"logisticImportance: iterations in [1, 20] (got $iterations)")
    val vecs = emb.select(col(idCol).as("__id"),
        concat(array(lit(1.0)), col(vecCol).cast("array<double>")).as("__x"),
        label.cast("int").as("__y"))
      .localCheckpoint()
    val w = fitLr(vecs, eta, iterations)
    val wDims = w.select(posexplode(col("__w")).as(Seq("__dim", "__wv")))
    val stats = vecs
      .select(posexplode(col("__x")).as(Seq("__dim", "__v")))
      .withColumn("__vu", round(col("__v") * 1e6, 0).cast("long"))
      .groupBy(col("__dim"))
      .agg(count(lit(1)).as("__n"), sum(col("__vu")).as("__sv"),
        sum(col("__vu").cast("decimal(38,0)") * col("__vu")).as("__svv"))
    val nD = col("__n").cast("double")
    val std = sqrt((col("__n").cast("decimal(38,0)") * col("__svv") -
      col("__sv").cast("decimal(38,0)") * col("__sv")).cast("double") /
      (nD * nD)) / 1e6
    val scored = stats.join(broadcast(wDims), Seq("__dim"))
      .withColumn("feature_std", round(std, 6))
      .withColumn("weight", round(col("__wv"), 6))
      .withColumn("importance", round(abs(col("__wv")) * std, 6))
    scored
      .withColumn("rank", row_number().over(
        Window.orderBy(col("importance").desc, col("__dim"))))
      .select(col("__dim").as("dim"), col("weight"), col("feature_std"),
        col("importance"), col("rank"))
      .orderBy("dim")
  }

  /** Training-run report over [[logisticGD]] scores: count, base rate,
    * accuracy and mean log-loss in one aggregation. Log-loss is computed
    * from the ROUNDED margin via ln(1+e^∓m) — deliberately: the rounded
    * margin is the cross-engine-stable quantity (it hash-matches at 6 dp),
    * so chaining from it keeps the metrics row exactly replayable instead
    * of re-amplifying sub-rounding float noise through exp/ln.
    */
  def logisticMetrics(scored: DataFrame): DataFrame = {
    val m = col("margin")
    // −ln p = ln(1+e^−m); −ln(1−p) = ln(1+e^m)
    val loss = when(col("y") === 1, log(lit(1.0) + exp(-m)))
      .otherwise(log(lit(1.0) + exp(m)))
    scored.agg(
      count(lit(1)).as("n"),
      sum(col("y").cast("long")).as("n_pos"),
      round(sum((col("pred") === col("y")).cast("int").cast("double"))
        / count(lit(1)).cast("double"), 6).as("accuracy"),
      round(sum(loss) / count(lit(1)).cast("double"), 6).as("log_loss"))
  }
}
