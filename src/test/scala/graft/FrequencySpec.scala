package graft

import org.apache.spark.sql.functions._
import graft.ops.Frequency

/** Heavy hitters via Misra-Gries propose + exact verify: result equals
  * the full groupBy + HAVING under skew, candidates stay bounded, and the
  * frequency-floor guarantee holds at the threshold boundary.
  */
class FrequencySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic zipf-ish corpus: key i appears ~C/i times. */
  private def zipf(nKeys: Int, c: Int) =
    (1 to nKeys).flatMap(i => Seq.fill(c / i)(s"key_$i"))

  test("equals exact groupBy + HAVING on a skewed corpus") {
    // shuffle the row order deterministically so partitions interleave keys
    val rows = scala.util.Random.javaRandomToRandom(
      new java.util.Random(42)).shuffle(zipf(200, 4000))
    val df = rows.toDF("k").repartition(8)
    for (minShare <- Seq(0.02, 0.05, 0.2)) {
      val total = df.count().toDouble
      val exact = df.groupBy("k").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" >= lit(minShare) * lit(total))
        .withColumn("share", round($"cnt" / lit(total), 6))
        .collect().toSet
      val hh = Frequency.heavyHitters(df, "k", minShare).collect().toSet
      assert(hh == exact, s"mismatch at minShare=$minShare")
      // the lower thresholds must actually find hitters for the test to
      // mean anything (at 0.2 the zipf head falls short — exact is empty,
      // and the operator must agree)
      if (minShare <= 0.05)
        assert(hh.nonEmpty, s"no hitters found at minShare=$minShare")
    }
  }

  test("candidate set stays bounded by k per partition") {
    val rows = (1 to 50000).map(i => s"key_${i % 1000}")
    val df = rows.toDF("k").repartition(8)
    val k = 10
    val nCand = Frequency.mgCandidates(df, "k", k).count()
    assert(nCand <= k * 8, s"candidates $nCand exceed k×partitions")
  }

  test("key exactly at the threshold is kept") {
    // 10 distinct keys, each exactly 10% — every key is a heavy hitter at
    // minShare=0.1 (count == minShare·N exactly)
    val df = (1 to 10).flatMap(i => Seq.fill(50)(s"k$i")).toDF("k")
      .repartition(4)
    val hh = Frequency.heavyHitters(df, "k", 0.1)
    assert(hh.count() == 10)
    assert(hh.select("share").collect().forall(_.getDouble(0) == 0.1))
  }

  test("NULL keys are excluded from candidates and the total") {
    val df = (Seq.fill(90)(Some("hot")) ++ Seq.fill(10)(None))
      .toDF("k").repartition(2)
    val hh = Frequency.heavyHitters(df, "k", 0.5).collect()
    assert(hh.map(_.getString(0)).toSeq == Seq("hot"))
    // share is over the 90 non-null rows, not 100
    assert(hh.head.getDouble(2) == 1.0)
  }
  test("basketRules: supports, confidence and lift match hand values; " +
      "minSupport cuts; both directions emitted") {
    val items = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b"),
      (4L, "b") // duplicate line collapses in the distinct
    ).toDF("bk", "it")
    val out = Frequency.basketRules(items, "bk", "it",
        minPairSupport = 2, k = 10)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // pairs: (a,b) 2, (a,c) 2, (b,c) 1 (cut); supports a3 b3 c2, N=4
    assert(out.keySet ==
      Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")))
    assert(out(("a", "b"))._3 == 2L && out(("a", "b"))._4 == 3L &&
      out(("a", "b"))._5 == 3L)
    assert(out(("a", "b"))._6 == 0.666667)            // conf 2/3
    assert(out(("a", "b"))._7 == 0.888889)            // lift (2/3)/(3/4)
    assert(out(("c", "a"))._6 == 1.0)                 // conf 2/2
    assert(out(("c", "a"))._7 == 1.333333)            // lift 1/(3/4)
    assert(out(("a", "c"))._7 == 1.333333)
  }
}
