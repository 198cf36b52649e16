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
}
