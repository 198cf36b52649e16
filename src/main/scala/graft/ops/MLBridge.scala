package graft.ops

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{MinHashLSH, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib integration (the north-star "DataFrame ops + MLlib pipelines"):
  *
  * - `learnedIvf`: a REAL IVF index — seeded KMeans learns the coarse
  *   quantizer, vectors are assigned to their nearest centroid cell, and
  *   ANN search joins only within the probe's cell (`Similarity.topKIvf`).
  *   At 100 TB the fitted model is a broadcast codebook; assignment is a
  *   narrow map.
  * - `minHashLSHNearDups`: MLlib's MinHashLSH `approxSimilarityJoin` as a
  *   second, independent near-dup implementation cross-checked against
  *   our native one in MLlibSpec.
  * - `trainOnFeatures`: the feature-store consumer path — assemble +
  *   scale features, fit a classifier; proves the engine's outputs plug
  *   straight into an MLlib Pipeline.
  */
object MLBridge {

  private val toVec = udf((a: Seq[Float]) =>
    Vectors.dense(a.map(_.toDouble).toArray))

  /** Fit a seeded KMeans codebook on the corpus. */
  def fitCodebook(emb: DataFrame, vecCol: String, k: Int,
                  seed: Long = 42L): org.apache.spark.ml.clustering.KMeansModel = {
    val feat = emb.select(toVec(col(vecCol)).as("features"))
    // a coarse quantizer needs rough cells, not convergence — 10 iterations
    // is the standard IVF training budget
    new KMeans().setK(k).setSeed(seed).setMaxIter(10).fit(feat)
  }

  /** Assign ANY vector set to its nearest codebook centroid — queries need
    * not be part of the indexed corpus (the normal ANN serving case).
    */
  def assignCells(model: org.apache.spark.ml.clustering.KMeansModel,
                  df: DataFrame, idCol: String, vecCol: String): DataFrame =
    model.transform(
        df.select(col(idCol), col(vecCol), toVec(col(vecCol)).as("features")))
      .select(col(idCol), col(vecCol), col("prediction").as("cell"))

  /** ANN over the learned quantizer: one fitted codebook assigns both the
    * corpus and the (possibly unseen) probe vectors; search is cell-local.
    */
  def learnedIvf(emb: DataFrame, idCol: String, vecCol: String,
                 queries: DataFrame, k: Int, nCells: Int): DataFrame = {
    val model = fitCodebook(emb, vecCol, nCells)
    val corpus = assignCells(model, emb, idCol, vecCol)
    val probes = assignCells(model, queries, idCol, vecCol)
    Similarity.topKIvf(probes, corpus, idCol, vecCol, "cell", k)
  }

  /** MLlib MinHashLSH near-dup join over binary shingle vectors. The
    * featurized table feeds the fit AND both join sides, so it is cached —
    * without it the shingle+UDF pipeline runs three times.
    */
  def minHashLSHNearDups(docs: DataFrame, idCol: String, textCol: String,
                         n: Int, maxDistance: Double,
                         numHashTables: Int = 4): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      Dedup.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    // hash shingles into a fixed sparse binary space (MinHashLSH input)
    val dim = 1 << 18
    val toSparse = udf((s: Seq[String]) => {
      val idx = s.map(x => math.floorMod(x.hashCode, dim)).distinct.sorted
      Vectors.sparse(dim, idx.toArray, Array.fill(idx.length)(1.0))
    })
    val feat = sh.select(col("id"), toSparse(col("sh")).as("features"))
      .cache()
    val lsh = new MinHashLSH().setNumHashTables(numHashTables).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(feat)
    val out = model.approxSimilarityJoin(feat, feat, maxDistance, "jaccard_dist")
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        round(lit(1.0) - col("jaccard_dist"), 6).as("est_jaccard"))
      .filter(col("id_a") < col("id_b"))
      .orderBy(col("id_a"), col("id_b"))
    out
  }

  /** Feature-store → training handoff: assemble numeric features produced
    * by the engine, scale, fit logistic regression. Returns the fitted
    * pipeline's training predictions (for assertion, not serving).
    */
  def trainOnFeatures(features: DataFrame, labelCol: String,
                      featureCols: Seq[String]): DataFrame = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("rawFeatures")
      .setHandleInvalid("keep")
    val scaler = new StandardScaler()
      .setInputCol("rawFeatures").setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setMaxIter(25)
    val pipeline = new Pipeline().setStages(Array(assembler, scaler, lr))
    val model = pipeline.fit(features)
    model.transform(features)
      .select(col(labelCol), col("prediction"), col("probability"))
  }
}
