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

  test("targetEncode: smoothed means shrink toward the global mean; NULL " +
      "categories excluded") {
    // a: values 1,3 (mean 2); b: value 10; global mean 14/3; m=2
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (Some("b"), 10.0),
      (None, 99.0)).toDF("cat", "v")
    val out = Encoding.targetEncode(df, "cat", "v", smoothing = 2.0)
      .as[(String, Long, Double)].collect().toList
    val g = 14.0 / 3.0
    assert(out == List(
      ("a", 2L, math.rint((4.0 + 2.0 * g) / 4.0 * 1e6) / 1e6),
      ("b", 1L, math.rint((10.0 + 2.0 * g) / 3.0 * 1e6) / 1e6)))
    // rare category sits closer to the global mean than its raw mean
    val encB = out.find(_._1 == "b").get._3
    assert(math.abs(encB - g) < math.abs(10.0 - g))
  }

  test("standardScale: z-scores against population stats; constant column " +
      "maps to 0; unsafe names rejected") {
    val df = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("x", "c")
    val out = Encoding.standardScale(df, Seq("x", "c"))
      .select("x_z", "c_z").as[(Double, Double)].collect().toList.sortBy(_._1)
    val sigma = math.sqrt(2.0 / 3.0)
    def z(v: Double) = math.rint((v - 2.0) / sigma * 1e6) / 1e6
    assert(out == List((z(1.0), 0.0), (z(2.0), 0.0), (z(3.0), 0.0)))
    intercept[IllegalArgumentException] {
      Encoding.standardScale(df.withColumnRenamed("x", "x y"), Seq("x y"))
    }
  }

  test("robustScale: median/IQR scaling ignores the outlier z-scores chase; " +
      "constant column maps to 0") {
    // 1..9 plus an outlier 1000: median 5.5, q1 3.25, q3 7.75, iqr 4.5
    val vals = ((1 to 9).map(_.toDouble) :+ 1000.0)
    val df = vals.map(v => (v, 1.0)).toDF("x", "c")
    val out = Encoding.robustScale(df, Seq("x", "c"))
      .select("x", "x_rs", "c_rs").as[(Double, Double, Double)]
      .collect().sortBy(_._1).toList
    def rs(v: Double) = math.rint((v - 5.5) / 4.5 * 1e6) / 1e6
    assert(out.map(_._2) == vals.sorted.map(rs).toList)
    assert(out.forall(_._3 == 0.0))
    // the outlier inflates sigma ~300x but shifts the IQR fit not at all:
    // a typical value keeps an O(1) robust score
    assert(math.abs(rs(9.0)) < 1.0)
  }
  test("woeEncode: hand-computed smoothed shares, WOE sign tracks class " +
      "skew, IV total folds the terms") {
    // cat a: 3 pos 1 neg; cat b: 1 pos 3 neg -> P=4, N=4, K=2
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 0),
      ("b", 1), ("b", 0), ("b", 0), ("b", 0)).toDF("c", "y")
    val out = graft.ops.Encoding.woeEncode(df, "c", col("y") === 1)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def share(c: Long, tot: Long) = (c + 0.5) / (tot + 0.5 * 2)
    def woe(p: Long, q: Long) =
      math.log(share(p, 4)) - math.log(share(q, 4))
    assert(out("a")._2 == 4L && out("a")._3 == 3L && out("a")._4 == 1L)
    assert(out("a")._5 == r6(woe(3, 1)) && out("b")._5 == r6(woe(1, 3)))
    assert(out("a")._5 > 0 && out("b")._5 < 0)      // sign tracks skew
    val iv = (share(3, 4) - share(1, 4)) * woe(3, 1) +
      (share(1, 4) - share(3, 4)) * woe(1, 3)
    assert(out.values.forall(_._7 == r6(iv)))
  }

  test("targetEncodeOof: folds partition by key, leave-fold-out means " +
      "match the closed form, single-fold category collapses to global") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // cat A over keys 1..8 (target = key), cat B only on key 9
    val df = ((1L to 8L).map(k => ("A", k.toDouble, k)) :+ (("B", 100.0, 9L)))
      .toDF("cat", "t", "k")
    val out = Encoding.targetEncodeOof(df, "cat", "t", "k",
        folds = 3, smoothing = 2.0)
      .as[(String, Int, Long, Long, Double)].collect()
    // replicate the hash-fold assignment and the lattice arithmetic
    val M = 2147483647L
    def u01(key: Long, c: Long): Double = {
      val h1 = (key + c * 1000003L) % M
      (((h1 * 48271L % M) * 48271L % M) + 1).toDouble / M
    }
    def fold(k: Long): Int =
      math.min(math.floor(u01(k, 83L) * 3).toLong, 2L).toInt
    val g = 13600 / (100.0 * 9) // Σ centi-targets / (100 · n)
    val bRow = out.filter(_._1 == "B").head
    assert(bRow._4 == 0L && bRow._5 == r6(g)) // cold start = global mean
    val byFold = (1L to 8L).groupBy(fold)
    for ((f, ks) <- byFold) {
      val row = out.find(r => r._1 == "A" && r._2 == f).get
      val oof = (1L to 8L).filterNot(ks.contains)
      assert(row._3 == ks.size.toLong && row._4 == oof.size.toLong)
      val enc = ((oof.map(_ * 100L).sum / 100.0) + 2.0 * g) /
        (oof.size + 2.0)
      assert(row._5 == r6(enc))
    }
    assert(out.filter(_._1 == "A").map(_._3).sum == 8L)
  }
}