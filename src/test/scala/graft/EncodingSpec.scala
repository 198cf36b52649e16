package graft

import graft.ops.Encoding
import org.apache.spark.sql.functions._

/** Categorical encoders: hashing-trick bucket properties and one-hot
  * indicator semantics (values verified end to end by the
  * q_feature_hashing / q_onehot_events oracles).
  */
class EncodingSpec extends SparkSpec {
  import spark.implicits._

  test("hashBucket: in range, deterministic, spreads categories") {
    val cats = Seq("view", "click", "purchase", "signup", "error",
      "alpha", "beta", "gamma", "delta", "epsilon").toDF("c")
    val buckets = cats.select(Encoding.hashBucket($"c", 64).as("b"))
      .as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b < 64))
    assert(buckets.distinct.length > 1)        // not degenerate
    val again = cats.select(Encoding.hashBucket($"c", 64).as("b"))
      .as[Int].collect()
    assert(buckets.toSeq == again.toSeq)       // stable
    // NULL category → NULL bucket, not a synthetic 0
    val withNull = Seq(Some("x"), None).toDF("c")
      .select(Encoding.hashBucket($"c", 64)).collect()
    assert(withNull(0).get(0) != null && withNull(1).isNullAt(0))
  }

  test("featureHash appends one bucket column per categorical") {
    val df = Seq(("a", "x"), ("b", "y")).toDF("c1", "c2")
    val out = Encoding.featureHash(df, Seq("c1", "c2"), 16)
    assert(out.columns.toSeq == Seq("c1", "c2", "c1_bucket", "c2_bucket"))
    assert(out.count() == 2)
  }

  test("oneHot: declared categories get exactly one indicator, unknowns none") {
    val df = Seq((1L, "view"), (2L, "click"), (3L, "error")).toDF("id", "t")
    val out = Encoding.oneHot(df, "t", Seq("view", "click", "purchase"))
      .select("id", "is_view", "is_click", "is_purchase")
      .as[(Long, Int, Int, Int)].collect().toList
    assert(out == List((1L, 1, 0, 0), (2L, 0, 1, 0), (3L, 0, 0, 0)))
  }
}
