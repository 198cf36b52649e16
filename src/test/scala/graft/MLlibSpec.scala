package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, MLBridge, Similarity}

/** MLlib integration: learned IVF recall, LSH cross-check vs native
  * Jaccard, and the feature → training-pipeline handoff.
  */
class MLlibSpec extends SparkSpec {
  import spark.implicits._

  test("learned-KMeans IVF achieves reasonable recall vs brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.topKBruteForce(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val approx = MLBridge.learnedIvf(emb, "vec_id", "embedding",
        queries, 5, nCells = 4)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall") // coarse 4-cell quantizer
    assert(approx.nonEmpty)
  }

  test("learned IVF serves query vectors NOT in the indexed corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    // synthesize unseen probes: corpus vectors under fresh ids
    val unseen = emb.filter($"vec_id" < 2)
      .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
    val out = MLBridge.learnedIvf(emb, "vec_id", "embedding",
      unseen, 3, nCells = 4)
    assert(out.select("query_id").distinct().count() == 2)
  }

  test("MLlib MinHashLSH agrees with native Jaccard on the clearest pair") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then naps"),
      (2L, "the quick brown fox jumps over the lazy dog and then sleeps"),
      (3L, "completely unrelated text about distributed query engines")
    ).toDF("doc_id", "text")
    val mllib = MLBridge.minHashLSHNearDups(docs, "doc_id", "text", 3, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val native = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(native.contains((1L, 2L)))
    assert(mllib.contains((1L, 2L)))
    assert(!native.contains((1L, 3L)) && !mllib.contains((1L, 3L)))
  }

  test("MLlib twins anchor: every eligible doc's identical twin MUST surface") {
    // the registered x_minhash_mllib_twins contract: identical text ⇒
    // identical hashed-shingle vector ⇒ signatures collide in every hash
    // table at any seed ⇒ approxSimilarityJoin emits the pair at
    // distance 0 with certainty, not probability
    val docs = Tables.documents(spark, sfDir).filter($"doc_id" < 60)
    val eligible = docs
      .filter(size(split(trim($"text"), "\\s+")) >= 3)
      .select($"doc_id").as[Long].collect().toSet
    val twins = docs.withColumn("doc_id", $"doc_id" + lit(1000000L))
    val found = MLBridge.minHashLSHNearDups(docs.unionByName(twins),
        "doc_id", "text", 3, 0.5)
      .filter($"id_b" === $"id_a" + 1000000L)
      .select($"id_a", $"est_jaccard").as[(Long, Double)].collect()
    assert(found.map(_._1).toSet == eligible,
      s"missing twins: ${eligible -- found.map(_._1).toSet}")
    assert(found.forall(_._2 == 1.0))
  }

  test("engine features feed an MLlib training pipeline end to end") {
    val prof = graft.ops.Gen.profiles(
      Tables.customer(spark, sfDir).select("c_custkey"), "c_custkey")
    val labeled = prof.withColumn("label",
      when($"subscription_tier".isin("premium", "enterprise"), 1.0)
        .otherwise(0.0))
    val preds = MLBridge.trainOnFeatures(labeled, "label",
      Seq("age", "signup_days_ago", "activity_weight"))
    assert(preds.count() == prof.count())
    assert(preds.select("prediction").distinct().count() >= 1)
  }
}
