package graft

import graft.ops.Linalg

/** pcaPowerTop: recovers a known dominant direction, respects the sign
  * convention, and guards its bounds.
  */
class LinalgSpec extends SparkSpec {
  import spark.implicits._

  test("top PC of two perfectly correlated columns + independent noise " +
      "is (1/sqrt2, 1/sqrt2, ~0) with eigenvalue ~2") {
    // y = 2x (corr exactly 1); z cycles independently of x (corr ~0 by
    // construction over full cycles of a balanced pattern)
    val n = 240
    val df = (1 to n).map { i =>
      val z = (i % 4) match { case 0 => 1.0; case 1 => -1.0
        case 2 => -1.0; case _ => 1.0 }
      (i.toDouble, 2.0 * i, z)
    }.toDF("x", "y", "z")
    val r = Linalg.pcaPowerTop(spark, df, Seq("x", "y", "z"), 20)
      .as[(Long, String, Double, Double, Double)].collect()
    val byFeat = r.map(t => t._2 -> t._3).toMap
    assert(math.abs(byFeat("x") - 1.0 / math.sqrt(2)) < 1e-3)
    assert(math.abs(byFeat("y") - 1.0 / math.sqrt(2)) < 1e-3)
    assert(math.abs(byFeat("z")) < 0.05)
    val lambda = r.head._4
    assert(math.abs(lambda - 2.0) < 1e-2)
    // explained_ratio = lambda / d
    assert(math.abs(r.head._5 - lambda / 3.0) < 1e-6)
    // row order follows the declared column order
    assert(r.sortBy(_._1).map(_._2).toSeq == Seq("x", "y", "z"))
  }

  test("sign convention: first loading is non-negative even when the " +
      "iteration lands on the negative eigenvector") {
    // anti-correlated pair: corr(x, y) = -1; dominant eigvec is
    // (1/sqrt2, -1/sqrt2) up to sign — convention picks x >= 0
    val df = (1 to 100).map(i => (i.toDouble, -3.0 * i)).toDF("x", "y")
    val r = Linalg.pcaPowerTop(spark, df, Seq("x", "y"), 20)
      .as[(Long, String, Double, Double, Double)].collect()
    val byFeat = r.map(t => t._2 -> t._3).toMap
    assert(byFeat("x") > 0.7 && byFeat("y") < -0.7)
    assert(math.abs(r.head._4 - 2.0) < 1e-6) // eigenvalue exactly 2
  }

  test("incremental PCA over merged batch partials equals the full-scan " +
      "result after rounding, for any batch split") {
    val n = 300
    val df = (1 to n).map { i =>
      val z = (i % 4) match { case 0 => 1.0; case 1 => -1.0
        case 2 => -1.0; case _ => 1.0 }
      (i.toLong, i.toDouble, 2.0 * i + z, z * 3.0 + i % 7)
    }.toDF("id", "x", "y", "z")
    val full = graft.ops.Linalg.pcaPowerTop(spark, df, Seq("x", "y", "z"), 20)
      .collect().map(_.toSeq).toSeq
    // three arbitrary disjoint batches (uneven sizes)
    val batches = Seq($"id" % 5 < 2, $"id" % 5 === 2, $"id" % 5 > 2)
      .map(df.filter(_))
    val inc = graft.ops.Linalg.pcaPowerTopIncremental(spark, batches,
      Seq("x", "y", "z"), 20).collect().map(_.toSeq).toSeq
    assert(inc == full)
    // a single batch degenerates to the full scan too
    val one = graft.ops.Linalg.pcaPowerTopIncremental(spark, Seq(df),
      Seq("x", "y", "z"), 20).collect().map(_.toSeq).toSeq
    assert(one == full)
  }

  test("guards fail loud") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Linalg.pcaPowerTop(spark, df, Seq("a"), 5)
    }
    intercept[IllegalArgumentException] {
      Linalg.pcaPowerTop(spark, df, Seq("a", "b"), 0)
    }
  }
}
