package graft

import org.apache.spark.sql.functions._
import graft.ops.Bloom

/** Bloom-prune correctness: the maybe-set is a superset of the true
  * matches (no false negatives — this also pins that the filter built by
  * `stat.bloomFilter` and the probe in `BloomMightContain` hash the same
  * way), and the exact semi/anti joins equal their plain counterparts at
  * any fpp, including deliberately undersized filters.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 2000L).map(k => (k, s"row_$k"))
    .toDF("k", "payload").repartition(4)
  // selective dim: 5% of the key space, plus keys absent from the fact
  private def dim = ((1L to 100L) ++ Seq(90001L, 90002L)).toDF("k")

  test("prune keeps every true match (no false negatives)") {
    val bf = Bloom.keyFilter(dim, "k", expectedItems = 1000L, fpp = 0.01)
    val pruned = Bloom.bloomPrune(fact, "k", bf).select("k").collect()
      .map(_.getLong(0)).toSet
    val truth = fact.join(dim, Seq("k"), "left_semi").select("k").collect()
      .map(_.getLong(0)).toSet
    assert(truth.subsetOf(pruned), "bloom dropped a real match")
    // and with a selective dim it actually prunes
    assert(pruned.size < 2000, "bloom pruned nothing")
  }

  test("bloomSemiJoin equals plain left_semi, fpp-independent") {
    val plain = fact.join(dim.withColumnRenamed("k", "k"), Seq("k"),
      "left_semi").collect().toSet
    // generous filter
    val a = Bloom.bloomSemiJoin(fact, dim, "k", "k").collect().toSet
    assert(a == plain)
    // deliberately undersized filter (capacity 8 for 102 keys → high fpp):
    // more survivors reach the join, result must not change
    val b = Bloom.bloomSemiJoin(fact, dim, "k", "k",
      expectedItems = 8L, fpp = 0.4).collect().toSet
    assert(b == plain)
  }

  test("bloomAntiJoin equals plain left_anti, NULL keys kept") {
    val withNulls = fact.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], "null_row"))
        .toDF("k", "payload").select($"k".cast("long").as("k"), $"payload"))
    val plain = withNulls.join(dim, Seq("k"), "left_anti").collect().toSet
    val a = Bloom.bloomAntiJoin(withNulls, dim, "k", "k").collect().toSet
    assert(a == plain)
    assert(a.exists(_.getString(1) == "null_row"), "anti join lost NULL key")
    val b = Bloom.bloomAntiJoin(withNulls, dim, "k", "k",
      expectedItems = 8L, fpp = 0.4).collect().toSet
    assert(b == plain)
  }

  test("anti join short-circuit: only the maybe-set reaches the join") {
    val bf = Bloom.keyFilter(dim, "k", expectedItems = 1000L, fpp = 0.01)
    val maybe = Bloom.bloomPrune(fact, "k", bf).count()
    // the definite-miss bulk (2000 - maybe rows) never joins; with 1% fpp
    // the maybe-set is ~the 100 true matches, far below the fact size
    assert(maybe >= 100 && maybe < 300,
      s"maybe-set $maybe out of expected band")
  }
}
