package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed linear algebra in the MLlib shape: the DATA-sized work (a
  * d×d Gramian / correlation matrix) runs as ONE map-side-combined
  * aggregation pass over the corpus; the MATRIX-sized work (the
  * eigensolve) runs on the bounded d×d result — exactly how
  * `RowMatrix.computePrincipalComponents` splits the job, and the only
  * split that survives 100 TB (d is feature count, data-size-independent;
  * the bounded fold is the FAISS-codebook precedent, not a driver loop
  * over data).
  *
  * The eigensolve is FIXED-ITERATION power iteration (not a convergence
  * loop): a deterministic closed-form function of the correlation entries
  * that the DuckDB oracle replays step for step (materialized CTE per
  * iteration), keeping the whole result oracle-exact like the unrolled
  * PageRank/k-means supersteps.
  *
  * Reference anchor: the reference computes per-feature statistics but no
  * cross-feature structure (`spark/apps/batch_generator.py:118-167`); PCA
  * over the feature matrix is the standard next step a feature store's
  * consumers run for redundancy pruning and embedding compression.
  */
object Linalg {

  /** The shared fixed-iteration power eigensolve on a bounded correlation
    * matrix: returns (sign-normalized eigenvector, dominant eigenvalue).
    * Arithmetic is kept in the exact textual order the oracle replays:
    * w_i = ((c_i0·v_0 + c_i1·v_1) + …), norm = sqrt(((w_0² + w_1²) + …)).
    * Start vector is the normalized ramp (1, 2, …, d) — the uniform
    * vector is EXACTLY orthogonal to the dominant eigenvector of any
    * exchange-antisymmetric matrix (e.g. corr = −1 on two columns),
    * where the iteration would hit a zero image; the ramp breaks that
    * symmetry while staying an exact literal both engines share.
    */
  private def powerIterate(c: Array[Array[Double]],
                           iterations: Int): (Array[Double], Double) = {
    val d = c.length
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).foldLeft(0.0)((acc, j) =>
        acc + c(i)(j) * v(j)))
    val rampNorm = math.sqrt((1 to d).foldLeft(0.0)((acc, j) =>
      acc + j.toDouble * j.toDouble))
    var v = Array.tabulate(d)(i => (i + 1).toDouble / rampNorm)
    for (_ <- 1 to iterations) {
      val w = matVec(v)
      val norm = math.sqrt(w.foldLeft(0.0)((acc, x) => acc + x * x))
      require(norm > 0.0,
        "powerIterate: iteration image collapsed to zero (start vector " +
          "lies in the correlation matrix's null space)")
      v = w.map(_ / norm)
    }
    val wFinal = matVec(v)
    val lambda = (0 until d).foldLeft(0.0)((acc, i) => acc + v(i) * wFinal(i))
    val sign = if (v(0) < 0) -1.0 else 1.0
    (v.map(sign * _), lambda)
  }

  private def emit(spark: SparkSession, cols: Seq[String],
                   v: Array[Double], lambda: Double): DataFrame = {
    import spark.implicits._
    val d = cols.size
    cols.indices.map { i =>
      (i.toLong, cols(i), v(i), lambda, lambda / d)
    }.toDF("feature_idx", "feature", "loading", "eigenvalue",
        "explained_ratio")
      .select(col("feature_idx"), col("feature"),
        round(col("loading"), 6).as("loading"),
        round(col("eigenvalue"), 6).as("eigenvalue"),
        round(col("explained_ratio"), 6).as("explained_ratio"))
      .orderBy("feature_idx")
  }

  /** Top principal component of the CORRELATION matrix of `cols` (scale-
    * free — price-magnitude columns don't drown unit-magnitude ones), via
    * `iterations` unrolled power-iteration steps. Output: one row per
    * input column — loading (sign-normalized: first component ≥ 0), the
    * shared dominant eigenvalue, and explained_ratio = λ/d (trace of a
    * correlation matrix is exactly d).
    */
  def pcaPowerTop(spark: SparkSession, df: DataFrame, cols: Seq[String],
                  iterations: Int): DataFrame = {
    val d = cols.size
    require(d >= 2 && d <= 16, s"pcaPowerTop: 2..16 columns (got $d)")
    require(iterations >= 1 && iterations <= 50,
      s"pcaPowerTop: iterations in [1, 50] (got $iterations)")
    // one corpus pass: all d(d-1)/2 off-diagonal correlations in a single
    // HashAggregate; the result is a bounded 1-row frame (matrix-sized,
    // not data-sized — safe to fold locally, the codebook precedent)
    val pairs = for { i <- 0 until d; j <- (i + 1) until d } yield (i, j)
    val aggs = pairs.map { case (i, j) =>
      corr(col(cols(i)).cast("double"), col(cols(j)).cast("double"))
        .as(s"c${i}_$j")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // corr() returns NULL for a constant column or < 2 non-null pairs;
    // name the degenerate pair instead of NPE-ing out of getDouble
    pairs.foreach { case (i, j) =>
      require(!row.isNullAt(pairs.indexOf((i, j))),
        s"pcaPowerTop: corr(${cols(i)}, ${cols(j)}) is undefined " +
        "(constant column or fewer than 2 non-null pairs) — drop or " +
        "re-scale the degenerate column before the PCA pass")
    }
    val c = Array.tabulate(d, d) { (i, j) =>
      if (i == j) 1.0 // exact literal diagonal in BOTH engines
      else row.getDouble(pairs.indexOf(if (i < j) (i, j) else (j, i)))
    }
    val (v, lambda) = powerIterate(c, iterations)
    emit(spark, cols, v, lambda)
  }

  /** MERGEABLE correlation partials: one row per input batch holding the
    * raw-moment sums (n, Σxᵢ, Σxᵢxⱼ for i ≤ j). Partials from disjoint
    * batches ADD — the incremental-maintenance contract: a 100 TB store
    * keeps one partials row per ingest batch (or per date partition) and
    * never rescans history to refresh the correlation structure.
    *
    * Numerical note: the raw-moment corr formula cancels catastrophically
    * when |mean| ≫ stddev on large-magnitude columns — pre-scale such
    * columns to O(1–100) magnitude before calling (corr is scale-
    * invariant, so scaling changes nothing but conditioning). The
    * registry's `q_pca_incremental` scales extendedprice by 1e-5.
    */
  def corrPartials(df: DataFrame, cols: Seq[String]): DataFrame = {
    val d = cols.size
    require(d >= 2 && d <= 16, s"corrPartials: 2..16 columns (got $d)")
    val sums = (0 until d).map(i =>
      sum(col(cols(i)).cast("double")).as(s"s$i"))
    val crosses = for { i <- 0 until d; j <- i until d } yield
      sum(col(cols(i)).cast("double") * col(cols(j)).cast("double"))
        .as(s"s${i}_$j")
    val aggs = (count(lit(1)).cast("double").as("n") +: sums) ++ crosses
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** [[pcaPowerTop]] maintained INCREMENTALLY: per-batch [[corrPartials]]
    * are summed (the mergeable fold), the correlation matrix is rebuilt
    * from the merged raw moments via
    * corr = (n·Sᵢⱼ − Sᵢ·Sⱼ) / (√(n·Sᵢᵢ − Sᵢ·Sᵢ) · √(n·Sⱼⱼ − Sⱼ·Sⱼ))
    * — the exact formula the oracle replays — and the same fixed-iteration
    * eigensolve runs on the bounded result. Equal to the full-scan
    * [[pcaPowerTop]] up to raw-moment conditioning (LinalgSpec bounds it).
    */
  def pcaPowerTopIncremental(spark: SparkSession, batches: Seq[DataFrame],
                             cols: Seq[String], iterations: Int): DataFrame = {
    val d = cols.size
    require(batches.nonEmpty, "pcaPowerTopIncremental: at least one batch")
    require(iterations >= 1 && iterations <= 50,
      s"pcaPowerTopIncremental: iterations in [1, 50] (got $iterations)")
    val merged = batches.map(corrPartials(_, cols))
      .reduce(_ unionByName _)
      .groupBy()
      .agg(sum(col("n")).as("n"),
        ((0 until d).map(i => sum(col(s"s$i")).as(s"s$i")) ++
          (for { i <- 0 until d; j <- i until d } yield
            sum(col(s"s${i}_$j")).as(s"s${i}_$j"))): _*)
      .head()
    val n = merged.getAs[Double]("n")
    def s(i: Int) = merged.getAs[Double](s"s$i")
    def sx(i: Int, j: Int) =
      if (i <= j) merged.getAs[Double](s"s${i}_$j")
      else merged.getAs[Double](s"s${j}_$i")
    val c = Array.tabulate(d, d) { (i, j) =>
      if (i == j) 1.0
      else (n * sx(i, j) - s(i) * s(j)) /
        (math.sqrt(n * sx(i, i) - s(i) * s(i)) *
          math.sqrt(n * sx(j, j) - s(j) * s(j)))
    }
    val (v, lambda) = powerIterate(c, iterations)
    emit(spark, cols, v, lambda)
  }
}
