package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Gen, Sampling}

/** Property: the histogram/boundary-bucket selection equals the naive
  * full-stratum rank window for randomized corpora — skewed stratum
  * sizes, duplicate-heavy priorities, random fractions and caps.
  * (Seeded java.util.Random: deterministic across runs.)
  */
class SamplingPropertySpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample ≡ naive rank for 25 random corpora") {
    val r = new java.util.Random(1717)
    (1 to 25).foreach { round =>
      val nStrata = 1 + r.nextInt(5)
      val rows = (0 until nStrata).flatMap { s =>
        val size = 1 + r.nextInt(if (s == 0) 800 else 40) // stratum 0 dominates
        Seq.fill(size)((math.abs(r.nextLong()) % 1000000L, s"s$s"))
      }.distinct
      val f = math.max(0.01, r.nextDouble())
      val df = rows.toDF("id", "stratum")
      val fast = Sampling.stratifiedSample(df, "stratum", "id", f)
        .as[(Long, String)].collect().toSet
      val pick = Window.partitionBy($"stratum")
        .orderBy(Gen.u01($"id", 33), $"id")
      val whole = Window.partitionBy($"stratum")
      val slow = df.withColumn("rn", row_number().over(pick))
        .withColumn("n", count(lit(1)).over(whole))
        .filter($"rn" <= ceil($"n" * f)).drop("rn", "n")
        .as[(Long, String)].collect().toSet
      assert(fast == slow, s"round $round fraction $f")
    }
  }

  test("priority quota cap ≡ rank window for 25 random tie-heavy corpora") {
    val r = new java.util.Random(2929)
    (1 to 25).foreach { round =>
      val rows = (1 to 300 + r.nextInt(700)).map { i =>
        (i.toLong, (r.nextInt(4) + 1).toLong,
          r.nextInt(1 + r.nextInt(40)).toLong) // heavy priority ties
      }
      val n = 1 + r.nextInt(12)
      val df = rows.toDF("id", "grp", "score")
      val fast = Sampling.quotaCapByPriority(df, "grp",
          priority = -$"score", tiebreak = $"id", n = n)
        .as[(Long, Long, Long)].collect().toSet
      val slow = Sampling.quotaCap(df, "grp",
          Seq($"score".desc, $"id".asc), n)
        .as[(Long, Long, Long)].collect().toSet
      assert(fast == slow, s"round $round cap $n")
    }
  }
}
