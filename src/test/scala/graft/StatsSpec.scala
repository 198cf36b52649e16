package graft

import graft.ops.Stats

/** Golden cases for the rolling-feature and IQR-outlier operators. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("rollingFeatures: lag, bounded rolling mean, running index") {
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      (1L, 7L, ts(0), 10.0), (2L, 7L, ts(1), 20.0), (3L, 7L, ts(2), 30.0),
      (4L, 8L, ts(0), 5.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Stats.rollingFeatures(df, "user_id", "ts", "event_id", "value",
        frameRows = 2)
      .select("event_id", "prev_value", "rolling_avg", "event_idx")
      .as[(Long, Option[Double], Double, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((None, 10.0, 1)))
    assert(out(2L) == ((Some(10.0), 15.0, 2)))
    assert(out(3L) == ((Some(20.0), 25.0, 3))) // frame is 2 rows, not 3
    assert(out(4L) == ((None, 5.0, 1)))        // other key unaffected
  }

  test("iqrOutliers: fences catch the planted extreme point only") {
    val df = (Seq.tabulate(100)(i => ("a", 50.0 + (i % 11))) :+ (("a", 10000.0)))
      .toDF("grp", "value")
    val row = Stats.iqrOutliers(df, "grp", "value")
      .select("n_outliers", "n_rows").head()
    assert(row.getLong(0) == 1 && row.getLong(1) == 101)
  }
}
