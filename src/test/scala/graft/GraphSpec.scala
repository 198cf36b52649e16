package graft

import graft.ops.Graph

/** PageRank golden cases on hand-solvable graphs. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: one-iteration values match the closed form, dangling " +
      "mass redistributes, 2-cycle stays uniform, mass is conserved") {
    // a <-> b, a -> c; c has out-degree 0 (dangling)
    val g = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val one = Graph.pageRank(g, "src", "dst", iterations = 1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // init 1/3 each; dangling mass = c's 1/3; contributions: a <- b/1,
    // b <- a/2, c <- a/2
    def step(in: Double) = BigDecimal(0.15 / 3 + 0.85 * (in + (1.0 / 3) / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(one(1L)._2 == 2L && one(2L)._2 == 1L && one(3L)._2 == 0L)
    assert(one(1L)._3 == step(1.0 / 3))
    assert(one(2L)._3 == step(1.0 / 6))
    assert(one(3L)._3 == step(1.0 / 6))
    // mass conservation after several steps
    val five = Graph.pageRank(g, "src", "dst", iterations = 5)
      .as[(Long, Long, Double)].collect()
    assert(math.abs(five.map(_._3).sum - 1.0) < 1e-4)
    // pure 2-cycle: uniform forever
    val cyc = Graph.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
        "src", "dst", iterations = 3)
      .as[(Long, Long, Double)].collect()
    assert(cyc.length == 2 && cyc.forall(_._3 == 0.5))
  }
}
