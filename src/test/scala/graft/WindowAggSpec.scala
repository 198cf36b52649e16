package graft

import org.apache.spark.sql.functions._
import graft.ops.{Parse, WindowAgg}

/** A1–A9 semantics on the real corpus + window-shape invariants. */
class WindowAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val parsed = Parse.parseEvents(Tables.events(spark, sfDir))

  test("hourly feature counts reconcile with raw event counts") {
    val agg = WindowAgg.hourlyFeatures(parsed)
    val totalFromAgg = agg.agg(sum("total_events")).head().getLong(0)
    assert(totalFromAgg == parsed.count())
    val clicks = agg.agg(sum("click_count")).head().getLong(0)
    assert(clicks == parsed.filter($"event_type" === "click").count())
  }

  test("sliding windows assign each event to exactly 6 windows (1h/10min)") {
    val sliding = WindowAgg.slidingFeatures(parsed)
    val totalFromSliding = sliding.agg(sum("total_events")).head().getLong(0)
    assert(totalFromSliding == 6 * parsed.count())
  }

  test("windows are epoch-aligned and exactly one hour long") {
    val agg = WindowAgg.hourlyFeatures(parsed)
    val bad = agg.filter(
      unix_timestamp($"window_end") - unix_timestamp($"window_start") =!= 3600 ||
      unix_timestamp($"window_start") % 3600 =!= 0)
    assert(bad.count() == 0)
  }

  test("rates are NULL (not error) when denominator is zero — ANSI-safe") {
    val agg = WindowAgg.hourlyFeatures(parsed)
    val noViews = agg.filter($"view_count" === 0)
    if (noViews.count() > 0)
      assert(noViews.filter($"click_through_rate".isNotNull).count() == 0)
  }

  test("total_revenue only counts purchase events") {
    val agg = WindowAgg.hourlyFeatures(parsed)
    val fromAgg = agg.agg(round(sum("total_revenue"), 0)).head().getDouble(0)
    val raw = parsed.filter($"event_type" === "purchase")
      .agg(round(sum("value"), 0)).head().getDouble(0)
    assert(math.abs(fromAgg - raw) <= 1.0) // per-window rounding tolerance
  }
}
