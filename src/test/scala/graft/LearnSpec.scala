package graft

import graft.ops.Learn
import org.apache.spark.sql.functions._

/** Logistic-GD trainer: dataflow ≡ local reference implementation, plus
  * behavioral checks (separable data classifies perfectly; zero-init
  * first step is label-balance-driven).
  */
class LearnSpec extends SparkSpec {
  import spark.implicits._

  /** Local full-batch GD with the identical recipe: intercept prepended,
    * zero init, w ← w − η·Σ(σ(w·x)−y)·x/n, strict left-to-right dot.
    */
  private def localGD(rows: Seq[(Long, Array[Float], Int)], eta: Double,
                      iterations: Int): Map[Long, (Double, Double, Int)] = {
    val xs = rows.map { case (id, v, y) =>
      (id, 1.0 +: v.map(_.toDouble), y) }
    val d = xs.head._2.length
    var w = Array.fill(d)(0.0)
    def dot(a: Array[Double], b: Seq[Double]): Double = {
      var acc = 0.0
      for (i <- 0 until d) acc += a(i) * b(i)
      acc
    }
    for (_ <- 1 to iterations) {
      val grad = Array.fill(d)(0.0)
      xs.foreach { case (_, x, y) =>
        val r = 1.0 / (1.0 + math.exp(-dot(w, x))) - y
        for (i <- 0 until d) grad(i) += r * x(i)
      }
      w = Array.tabulate(d)(i => w(i) - eta * grad(i) / xs.length)
    }
    xs.map { case (id, x, y) =>
      val m = dot(w, x)
      id -> (m, 1.0 / (1.0 + math.exp(-m)), y)
    }.toMap
  }

  private val corpus: Seq[(Long, Array[Float], Int)] = {
    val rnd = new scala.util.Random(42)
    (0L until 80L).map { id =>
      val y = (id % 2).toInt
      // class-dependent mean with overlap so training is non-trivial
      val v = Array.fill(5)((rnd.nextGaussian() + (if (y == 1) 0.8 else -0.4)).toFloat)
      (id, v, y)
    }
  }

  test("logisticGD ≡ local reference on an overlapping two-class corpus " +
      "(margins to 1e-9, probs/preds exact)") {
    val df = corpus.toDF("vec_id", "embedding", "y")
    val out = Learn.logisticGD(df, "vec_id", "embedding", col("y") === 1,
        eta = 0.5, iterations = 4)
      .as[(Long, Int, Double, Double, Int)].collect()
    val ref = localGD(corpus, eta = 0.5, iterations = 4)
    assert(out.length == corpus.length)
    out.foreach { case (id, y, margin, prob, pred) =>
      val (rm, rp, ry) = ref(id)
      assert(y == ry)
      assert(math.abs(margin - BigDecimal(rm).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"id=$id margin $margin vs ref $rm")
      assert(pred == (if (rp >= 0.5) 1 else 0))
    }
  }

  test("separable data: enough supersteps reach accuracy 1.0; metrics " +
      "row folds count/base-rate/accuracy/log-loss") {
    val sep = (0L until 40L).map { id =>
      val y = (id % 2).toInt
      (id, Array.fill(3)(if (y == 1) 2.0f else -2.0f), y)
    }
    val scored = Learn.logisticGD(sep.toDF("vec_id", "embedding", "y"),
      "vec_id", "embedding", col("y") === 1, eta = 0.5, iterations = 8)
    val m = Learn.logisticMetrics(scored)
      .as[(Long, Long, Double, Double)].head()
    assert(m._1 == 40L && m._2 == 20L)
    assert(m._3 == 1.0, s"accuracy ${m._3}")
    assert(m._4 > 0.0 && m._4 < 0.35, s"log_loss ${m._4}")
  }

  test("logisticImportance: the predictive feature outranks the " +
      "constant one; intercept and constant dims score importance 0") {
    // dim 1 (signed feature) separates the classes; dim 2 is constant
    val rows = (0L until 16L).map { id =>
      val y = (id % 2).toInt
      (id, Array(if (y == 1) 1.0f else -1.0f, 3.0f), y)
    }
    val df = rows.toDF("vec_id", "embedding", "y")
    val out = Learn.logisticImportance(df, "vec_id", "embedding",
      col("y") === 1, eta = 0.5, iterations = 3).collect()
      .map(r => r.getAs[Int]("dim") ->
        (r.getAs[Double]("feature_std"), r.getAs[Double]("importance"),
          r.getAs[Int]("rank"))).toMap
    assert(out(0)._1 == 0.0 && out(0)._2 == 0.0) // intercept
    assert(out(1)._1 == 1.0 && out(1)._2 > 0.0)  // signed feature: std 1
    assert(out(2)._1 == 0.0 && out(2)._2 == 0.0) // constant feature
    assert(out(1)._3 == 1)                       // top importance rank
  }

  test("first superstep from zero init moves the intercept by " +
      "η·(base_rate − 1/2): exact closed form") {
    // at w=0 every σ(w·x)=1/2, so the intercept gradient is (1/2 − p̂)
    val df = (0L until 10L).map(id =>
      (id, Array(0.0f), (if (id < 3) 1 else 0))).toDF("vec_id", "embedding", "y")
    val out = Learn.logisticGD(df, "vec_id", "embedding", col("y") === 1,
        eta = 1.0, iterations = 1)
      .select("margin").distinct().as[Double].collect()
    // margin = intercept = −η·(1/2 − 0.3) = −0.2 for every row (x=0)
    assert(out.toSeq == Seq(-0.2))
  }
}
