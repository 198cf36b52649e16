package graft

import graft.ops.Gen

/** G1–G4: deterministic weighted generation — bounds, reproducibility,
  * rough distribution shape.
  */
class GenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (0L until 2000L).toDF("c_custkey")
  private lazy val prof = Gen.profiles(keys, "c_custkey").cache()

  test("generation is reproducible (pure function of the key)") {
    val again = Gen.profiles(keys, "c_custkey")
    assert(prof.exceptAll(again).count() == 0)
  }

  test("ages stay inside the banded range 18..80") {
    assert(prof.filter($"age" < 18 || $"age" > 80).count() == 0)
  }

  test("activity weight respects the 2.0 cap and positivity") {
    assert(prof.filter($"activity_weight" <= 0 ||
      $"activity_weight" > 2.0).count() == 0)
  }

  test("tier weights are roughly honored (free ≈ 60%)") {
    val free = prof.filter($"subscription_tier" === "free").count().toDouble
    assert(free / 2000 > 0.5 && free / 2000 < 0.7)
  }

  test("signup offsets wrap below 1095 days") {
    assert(prof.filter($"signup_days_ago" < 0 ||
      $"signup_days_ago" >= 1095).count() == 0)
  }

  test("weighted pick: one key per draw, frequencies ∝ weights, deterministic") {
    val w = Seq(("a", 1.0), ("b", 2.0), ("c", 7.0)).toDF("k", "wt")
    val out = Gen.weightedPick(w, "k", "wt", nDraws = 20000)
    assert(out.count() == 20000)
    assert(out.select("draw_id").distinct().count() == 20000)
    val freq = out.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    // expectation 2000/4000/14000; minstd-hash deviation is well inside 5σ
    assert(math.abs(freq("a") - 2000) < 300, s"a drew ${freq("a")}")
    assert(math.abs(freq("b") - 4000) < 400, s"b drew ${freq("b")}")
    assert(math.abs(freq("c") - 14000) < 600, s"c drew ${freq("c")}")
    val again = Gen.weightedPick(w, "k", "wt", nDraws = 20000)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("weighted pick: zero-weight keys are never drawn") {
    val w = Seq(("live", 1.0), ("dead", 0.0)).toDF("k", "wt")
    val out = Gen.weightedPick(w, "k", "wt", nDraws = 500)
    assert(out.count() == 500)
    assert(out.filter($"k" === "dead").count() == 0)
  }
}
