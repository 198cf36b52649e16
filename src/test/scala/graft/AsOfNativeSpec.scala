package graft

import graft.ops.Retrieval

/** The custom physical as-of join (AsOfJoinExec) is equivalent to the
  * union+window formulation, including NULL semantics and TTL boundaries,
  * and its plan contains the custom exec node.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val day = 86400L * 1000000L

  private val features = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10.0),
    (1L, ts("2024-01-05 00:00:00"), 50.0),
    (2L, ts("2024-01-03 00:00:00"), 30.0)
  ).toDF("user_id", "fts", "fval")

  private val probes = Seq(
    (100L, 1L, ts("2024-01-06 00:00:00")), // hits day5
    (101L, 1L, ts("2024-01-05 00:00:00")), // boundary: fts == ts
    (102L, 2L, ts("2024-01-10 00:00:00")), // boundary: fts == ts - ttl
    (103L, 1L, ts("2024-02-01 00:00:00")), // beyond ttl
    (104L, 2L, ts("2024-01-01 00:00:00")), // before any feature
    (105L, 99L, ts("2024-01-06 00:00:00")) // no history
  ).toDF("event_id", "user_id", "ts")

  private def run(p: org.apache.spark.sql.DataFrame) =
    Retrieval.asOfJoinNative(p, features, "user_id", "ts", "fts", 7L * day)
      .toDF("event_id", "user_id", "ts", "f_user", "fts", "fval")
      .select("event_id", "fval")
      .as[(Long, Option[Double])].collect().toMap

  test("native as-of matches the window formulation on all edge cases") {
    val got = run(probes)
    val want = Retrieval.asOfJoin(probes, features, "user_id", "ts", "fts",
        "INTERVAL 7 DAYS", Seq("fval"))
      .select("event_id", "fval").as[(Long, Option[Double])].collect().toMap
    assert(got == want)
    assert(got(100L).contains(50.0) && got(101L).contains(50.0))
    assert(got(102L).contains(30.0))
    assert(got(103L).isEmpty && got(104L).isEmpty && got(105L).isEmpty)
  }

  test("plan contains the custom AsOfJoinExec node") {
    val df = Retrieval.asOfJoinNative(probes, features, "user_id", "ts",
      "fts", 7L * day)
    val hasExec = df.queryExecution.sparkPlan.collect {
      case e: graft.plans.AsOfJoinExec => e
    }.nonEmpty
    assert(hasExec)
  }

  test("bucketed-sorted inputs run the as-of join exchange-free and sort-free") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // one task per bucket → one sorted file per bucket, the condition for
    // the scan to carry the sortBy order into outputOrdering
    probes.repartition(4, $"user_id").write.mode("overwrite")
      .bucketBy(4, "user_id").sortBy("user_id", "ts").saveAsTable("asof_p_b")
    features.repartition(4, $"user_id").write.mode("overwrite")
      .bucketBy(4, "user_id").sortBy("user_id", "fts").saveAsTable("asof_f_b")
    try {
      val df = Retrieval.asOfJoinNative(spark.table("asof_p_b"),
        spark.table("asof_f_b"), "user_id", "ts", "fts", 7L * day)
      // audit the POST-EnsureRequirements plan: requirement-driven
      // exchanges/sorts are only inserted during preparation, so the
      // pre-preparation sparkPlan would be vacuously exchange-free. AQE
      // off so executedPlan is a plain walkable tree, and the legacy
      // bucketedTableScan.outputOrdering conf on so the scan EXPOSES the
      // per-bucket sortBy order (off by default since Spark 3.0 — without
      // it the merge's ordering requirement forces a per-partition Sort
      // even over single-file sorted buckets).
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      var shuffles = 0; var sorts = 0
      try df.queryExecution.executedPlan.foreach {
        case _: ShuffleExchangeExec => shuffles += 1
        case _: SortExec => sorts += 1
        case _ =>
      } finally {
        spark.conf.unset("spark.sql.adaptive.enabled")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      }
      assert(shuffles == 0, "bucketed as-of join must not shuffle")
      assert(sorts == 0, "sorted buckets must satisfy the merge's ordering")
      // and the fast path computes the same result
      val got = df.toDF("event_id", "user_id", "ts", "f_user", "fts", "fval")
        .select("event_id", "fval")
        .as[(Long, Option[Double])].collect().toMap
      assert(got == run(probes))
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_p_b")
      spark.sql("DROP TABLE IF EXISTS asof_f_b")
    }
  }

  test("native as-of matches window formulation on randomized data") {
    val r = new java.util.Random(77)
    (1 to 10).foreach { _ =>
      val feats = Seq.fill(r.nextInt(30))(
          (1L + r.nextInt(5), r.nextInt(2000).toLong, r.nextInt(100).toDouble))
        .groupBy(f => (f._1, f._2))
        .map { case ((k, t), fs) => (k, t, fs.map(_._3).max) }.toSeq
      val prbs = Seq.tabulate(1 + r.nextInt(30))(i =>
        (i.toLong, 1L + r.nextInt(5), r.nextInt(2000).toLong))
      val fDf = feats.toDF("user_id", "l", "fval")
        .selectExpr("user_id", "timestamp_micros(l) AS fts", "fval")
      val pDf = prbs.toDF("event_id", "user_id", "l")
        .selectExpr("event_id", "user_id", "timestamp_micros(l) AS ts")
      val native = Retrieval.asOfJoinNative(pDf, fDf, "user_id", "ts", "fts", 500L)
        .toDF("event_id", "user_id", "ts", "f_user", "fts", "fval")
        .select("event_id", "fval")
        .as[(Long, Option[Double])].collect().toMap
      val window = Retrieval.asOfJoin(pDf, fDf, "user_id", "ts", "fts",
          "INTERVAL '0.0005' SECOND", Seq("fval"))
        .select("event_id", "fval").as[(Long, Option[Double])].collect().toMap
      assert(native == window)
    }
  }
}
