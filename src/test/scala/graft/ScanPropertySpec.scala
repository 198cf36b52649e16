package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Scan

/** Property: the two-level sliced prefix sum equals the naive
  * `sum() OVER` on the same total order, for randomized corpora under
  * adversarial slicing — slice counts 1/3/32, input partitionings 1/7,
  * tie-dense order keys, negative values, skewed group sizes, and the
  * global (no-groups) scan. prefixSum underpins budgetSample,
  * packSequences, weightedPick and the quotaCap family, so a slicing bug
  * here corrupts four query families at once. (Seeded java.util.Random:
  * deterministic across runs.)
  */
class ScanPropertySpec extends SparkSpec {
  import spark.implicits._

  private def withSlices[A](n: Int)(body: => A): A = {
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("grouped prefixSum ≡ sum() OVER across slice/partition configs " +
      "for 10 random tie-dense signed corpora") {
    val r = new java.util.Random(4242)
    (1 to 10).foreach { round =>
      val nGroups = 1 + r.nextInt(4)
      val rows = (0 until nGroups).flatMap { g =>
        val size = 1 + r.nextInt(if (g == 0) 600 else 50) // group 0 dominates
        (0 until size).map { _ =>
          (s"g$g",
            r.nextInt(8).toLong,              // tie-DENSE order key
            (r.nextInt(2001) - 1000).toLong)  // signed values
        }
      }.zipWithIndex.map { case ((g, o, v), id) => (g, o, v, id.toLong) }
      val df = rows.toDF("g", "o", "v", "id")
      val expected = df.withColumn("cum", sum($"v").over(
          Window.partitionBy($"g").orderBy($"o", $"id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"id", $"cum").as[(Long, Long)].collect().toSet
      for (slices <- Seq(1, 3, 32); inParts <- Seq(1, 7)) {
        val got = withSlices(slices) {
          Scan.prefixSum(df.repartition(inParts), Seq("g"),
              struct($"o", $"id"), $"v", "cum")
            .select($"id", $"cum").as[(Long, Long)].collect().toSet
        }
        assert(got == expected,
          s"round=$round slices=$slices inParts=$inParts")
      }
    }
  }

  test("global (no-groups) prefixSum ≡ sum() OVER under the same chaos") {
    val r = new java.util.Random(7878)
    (1 to 5).foreach { round =>
      val rows = (0 until 400 + r.nextInt(400)).map { id =>
        (r.nextInt(5).toLong, (r.nextInt(401) - 200).toLong, id.toLong)
      }
      val df = rows.toDF("o", "v", "id")
      val expected = df.withColumn("cum", sum($"v").over(
          Window.orderBy($"o", $"id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"id", $"cum").as[(Long, Long)].collect().toSet
      for (slices <- Seq(1, 32); inParts <- Seq(1, 7)) {
        val got = withSlices(slices) {
          Scan.prefixSum(df.repartition(inParts), Nil,
              struct($"o", $"id"), $"v", "cum")
            .select($"id", $"cum").as[(Long, Long)].collect().toSet
        }
        assert(got == expected,
          s"round=$round slices=$slices inParts=$inParts")
      }
    }
  }
}
