package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.PlanGuardRule

/** The nested-loop lint: unbounded cartesian/BNLJ raises, the engine's
  * bounded broadcast shapes pass, the conf gates everything.
  */
class PlanGuardSpec extends SparkSpec {
  import spark.implicits._

  // sparkPlan, not executedPlan: the adaptive wrapper hides its subtree
  // until execution (at runtime the rule sees the real tree via the AQE
  // query-stage prep hook — the integration test below covers that path)
  private def checked(df: org.apache.spark.sql.DataFrame): Unit =
    PlanGuardRule(spark).apply(df.queryExecution.sparkPlan)

  private def withGuard[A](f: => A): A = {
    spark.conf.set("spark.graft.planGuard.enabled", "true")
    try f finally spark.conf.unset("spark.graft.planGuard.enabled")
  }

  test("unbounded cross join raises; bounded 1-row-aggregate broadcast " +
      "and limited sides pass; disabled conf is inert") {
    val big = spark.range(10000).toDF("a")
    val big2 = spark.range(10000).toDF("b")
    withGuard {
      val e = intercept[IllegalStateException] {
        checked(big.crossJoin(big2))
      }
      assert(e.getMessage.contains("corpus-squared"))
      // the engine's own pattern: crossJoin(broadcast(ungrouped agg))
      checked(big.crossJoin(broadcast(big2.agg(max($"b").as("m")))))
      // a limited side is bounded
      checked(big.crossJoin(big2.limit(3)))
      // literal frames are LocalTableScan
      checked(big.crossJoin(Seq(1, 2).toDF("c")))
    }
    // guard off -> same naughty plan passes untouched
    checked(big.crossJoin(big2))
  }

  test("non-equi BNLJ raises with the remediation hint") {
    val l = spark.range(5000).toDF("a")
    val r = spark.range(5000).toDF("b")
    withGuard {
      val e = intercept[IllegalStateException] {
        checked(l.join(broadcast(r), $"a" < $"b"))
      }
      assert(e.getMessage.contains("BroadcastNestedLoopJoin") &&
        e.getMessage.contains("equi-key"))
      // the same shape against a bounded build side is fine
      checked(l.join(broadcast(r.agg(max($"b").as("b"))), $"a" < $"b"))
    }
  }

  test("rule is live in a session built with GraftExtensions (AQE " +
      "query-stage prep)") {
    val active = SparkSession.getActiveSession
    val default = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      s2.conf.set("spark.graft.planGuard.enabled", "true")
      val big = s2.range(20000).toDF("a")
      val big2 = s2.range(20000).toDF("b")
      val e = intercept[Exception] {
        big.crossJoin(big2).count() // guard fires during stage prep
      }
      def root(t: Throwable): Throwable =
        if (t.getCause == null) t else root(t.getCause)
      assert(e.getMessage.contains("corpus-squared") ||
        root(e).getMessage.contains("corpus-squared"))
      s2.conf.set("spark.graft.planGuard.enabled", "false")
      assert(big.crossJoin(big2.limit(2)).count() == 40000)
    } finally {
      active.foreach(SparkSession.setActiveSession)
      default.foreach(SparkSession.setDefaultSession)
    }
  }
}
