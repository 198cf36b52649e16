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

  /** Top principal component of the CORRELATION matrix of `cols` (scale-
    * free — price-magnitude columns don't drown unit-magnitude ones), via
    * `iterations` unrolled power-iteration steps from the uniform unit
    * vector. Output: one row per input column — loading (sign-normalized:
    * first component ≥ 0), the shared dominant eigenvalue, and
    * explained_ratio = λ/d (trace of a correlation matrix is exactly d).
    *
    * Arithmetic is kept in the exact textual order the oracle replays
    * (left-to-right dot products) so both engines run the identical IEEE
    * sequence over near-identical corr inputs; final values round at 6.
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
    val c = Array.tabulate(d, d) { (i, j) =>
      if (i == j) 1.0 // exact literal diagonal in BOTH engines
      else row.getDouble(pairs.indexOf(if (i < j) (i, j) else (j, i)))
    }
    // unrolled power iteration — identical operation order to the oracle:
    // w_i = ((c_i0·v_0 + c_i1·v_1) + …), norm = sqrt(((w_0² + w_1²) + …)).
    // Start vector is the normalized ramp (1, 2, …, d) — the uniform
    // vector is EXACTLY orthogonal to the dominant eigenvector of any
    // exchange-antisymmetric matrix (e.g. corr = −1 on two columns),
    // where the iteration would hit a zero image; the ramp breaks that
    // symmetry while staying an exact literal both engines share.
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
        "pcaPowerTop: iteration image collapsed to zero (start vector " +
          "lies in the correlation matrix's null space)")
      v = w.map(_ / norm)
    }
    val wFinal = matVec(v)
    val lambda = (0 until d).foldLeft(0.0)((acc, i) => acc + v(i) * wFinal(i))
    val sign = if (v(0) < 0) -1.0 else 1.0
    import spark.implicits._
    cols.indices.map { i =>
      (i.toLong, cols(i), sign * v(i), lambda, lambda / d)
    }.toDF("feature_idx", "feature", "loading", "eigenvalue",
        "explained_ratio")
      .select(col("feature_idx"), col("feature"),
        round(col("loading"), 6).as("loading"),
        round(col("eigenvalue"), 6).as("eigenvalue"),
        round(col("explained_ratio"), 6).as("explained_ratio"))
      .orderBy("feature_idx")
  }
}
