package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The flagship windowed clickstream aggregation (SURVEY.md §2.3, A1–A9).
  *
  * Re-expresses `apply_windowed_aggregation`
  * (`spark/apps/clickstream_aggregation.py:112-201`): per-entity event-time
  * windows with counts, filtered counts, exact distincts, conditional
  * sums/averages and guarded derived ratios. The same pure transform serves
  * batch (oracle-checked here) and streaming (graft.streaming.Pipeline adds
  * watermark + sink; Spark's `window()` semantics are identical in both).
  *
  * Scale posture:
  * - single shuffle on (group keys, window) — partial aggregation
  *   (map-side combine) happens before the exchange, so the shuffle carries
  *   pre-aggregated partials, not raw events;
  * - `countDistinct` triggers Catalyst's `RewriteDistinctAggregates` Expand;
  *   for 100 TB the HLL variant below (`hourlyFeaturesApprox`) replaces the
  *   Expand with mergeable sketches — one narrow pass, no per-key blowup;
  * - derived ratios are post-aggregation projections (free);
  * - sliding windows multiply state by (window/slide) = 6; at cluster scale
  *   prefer tumbling windows + a rolling post-aggregation over window starts
  *   if state becomes the bottleneck.
  */
object WindowAgg {

  private def aggs(exact: Boolean): Seq[Column] = {
    val uniqueK =
      if (exact) countDistinct(col("k")) else approx_count_distinct(col("k"))
    Seq(
      count(lit(1)).as("total_events"),                                      // A3
      sum(Parse.flagIf(col("event_type") === "click")).as("click_count"),    // A4
      sum(Parse.flagIf(col("event_type") === "view")).as("view_count"),
      sum(Parse.flagIf(col("event_type") === "purchase")).as("purchase_count"),
      sum(Parse.flagIf(col("event_type") === "signup")).as("signup_count"),
      sum(Parse.flagIf(col("event_type") === "error")).as("error_count"),
      uniqueK.as("unique_k"),                                                // A5
      round(sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(lit(0.0))), 2).as("total_revenue"),                       // A6
      round(avg(when(col("event_type") === "view", col("value"))), 6)
        .as("avg_view_value"),                                               // A7
      min(when(col("event_type") === "click", col("k")))
        .as("primary_k")                                                     // A8 (deterministic min, SURVEY §5.3)
    )
  }

  private def derived(df: DataFrame): DataFrame =
    df.withColumn("click_through_rate",
        round(Parse.safeRatio(col("click_count"), col("view_count")), 6))    // P9/A9
      .withColumn("conversion_rate",
        round(Parse.safeRatio(col("purchase_count"), col("click_count")), 6))

  /** Tumbling 1-hour windows (slide == duration). */
  def hourlyFeatures(parsedEvents: DataFrame): DataFrame = {
    val w = window(col("ts_parsed"), "1 hour")                               // A2
    val a = aggs(exact = true)
    val out = parsedEvents
      .groupBy(col("user_id"), w.as("win"))
      .agg(a.head, a.tail: _*)
      .withColumn("window_start", col("win.start"))                          // A9
      .withColumn("window_end", col("win.end"))
      .withColumn("event_date", to_date(col("window_start")))                // P10
      .withColumn("feature_timestamp", col("window_end"))                    // P11
      .drop("win")
    derived(out)
      .select(
        col("user_id"), col("window_start"), col("window_end"),
        col("total_events"), col("click_count"), col("view_count"),
        col("purchase_count"), col("signup_count"), col("error_count"),
        col("unique_k"), col("total_revenue"), col("avg_view_value"),
        col("primary_k"), col("click_through_rate"), col("conversion_rate"),
        col("event_date"), col("feature_timestamp"))
      .orderBy("user_id", "window_start")
  }

  /** Sliding windows — the reference's exact shape: 1 h window / 10 min slide
    * (`clickstream_aggregation.py:27-28,131-140`). Each event lands in 6
    * windows; Spark expands via the `window()` generator before the single
    * keyed shuffle.
    */
  def slidingFeatures(parsedEvents: DataFrame): DataFrame = {
    val w = window(col("ts_parsed"), "1 hour", "10 minutes")
    val a = aggs(exact = true)
    val out = parsedEvents
      .groupBy(col("user_id"), w.as("win"))
      .agg(a.head, a.tail: _*)
      .withColumn("window_start", col("win.start"))
      .withColumn("window_end", col("win.end"))
      .drop("win")
    derived(out)
      .select(
        col("user_id"), col("window_start"), col("window_end"),
        col("total_events"), col("click_count"), col("view_count"),
        col("purchase_count"), col("signup_count"), col("error_count"),
        col("unique_k"), col("total_revenue"), col("avg_view_value"),
        col("primary_k"), col("click_through_rate"), col("conversion_rate"))
      .orderBy("user_id", "window_start")
  }

  /** The reference's EXACT flagship output — all 21 columns of
    * `apply_windowed_aggregation` (`clickstream_aggregation.py:112-201`,
    * output schema FIXTURES.md §A3) over a reference-shaped event stream:
    * keys (user, country, tier, window), 14 aggregates including
    * product/category/session distincts, device splits, revenue =
    * Σ price·quantity on purchases, view-only average duration,
    * deterministic primary referrer (min — SURVEY §5.3), and the three
    * derived ratios CTR = click/view, cart_rate = cart/click,
    * conversion = purchase/cart (`:193-195`), all NULL-guarded.
    */
  def referenceFeatures(enriched: DataFrame): DataFrame = {
    val out = enriched
      .groupBy(col("user_id"), col("user_country"), col("user_tier"),
        window(col("ts"), "1 hour").as("win"))
      .agg(
        count(lit(1)).as("total_events"),
        sum(Parse.flagIf(col("event_type") === "click")).as("click_count"),
        sum(Parse.flagIf(col("event_type") === "view")).as("view_count"),
        sum(Parse.flagIf(col("event_type") === "cart")).as("cart_count"),
        sum(Parse.flagIf(col("event_type") === "purchase")).as("purchase_count"),
        countDistinct(col("product_id")).as("unique_products"),
        countDistinct(col("product_category")).as("unique_categories"),
        countDistinct(col("session_id")).as("session_count"),
        sum(Parse.flagIf(col("device_type") === "mobile")).as("mobile_events"),
        sum(Parse.flagIf(col("device_type") === "desktop")).as("desktop_events"),
        round(sum(when(col("event_type") === "purchase",
          col("price") * col("quantity")).otherwise(lit(0.0))), 2)
          .as("total_revenue"),
        round(avg(when(col("event_type") === "view",
          col("view_duration_sec"))), 6).as("avg_view_duration_sec"),
        min(when(col("event_type") === "click", col("referrer")))
          .as("primary_referrer"))
      .withColumn("click_through_rate",
        round(Parse.safeRatio(col("click_count"), col("view_count")), 6))
      .withColumn("cart_rate",
        round(Parse.safeRatio(col("cart_count"), col("click_count")), 6))
      .withColumn("conversion_rate",
        round(Parse.safeRatio(col("purchase_count"), col("cart_count")), 6))
      .withColumn("window_start", col("win.start"))
      .withColumn("window_end", col("win.end"))
      .withColumn("event_date", to_date(col("window_start")))
      .withColumn("feature_timestamp", col("window_end"))
      .drop("win")
    out.orderBy("user_id", "window_start")
  }

  /** 100 TB variant of the flagship: HyperLogLog distincts instead of the
    * exact-distinct Expand (`approx_count_distinct`, SURVEY.md §7.2). Not
    * oracle-checked (sketches aren't reproducible in DuckDB); benchmarked.
    */
  def hourlyFeaturesApprox(parsedEvents: DataFrame): DataFrame = {
    val w = window(col("ts_parsed"), "1 hour")
    val a = aggs(exact = false)
    parsedEvents
      .groupBy(col("user_id"), w.as("win"))
      .agg(a.head, a.tail: _*)
      .withColumn("window_start", col("win.start"))
      .drop("win")
      .orderBy("user_id", "window_start")
  }

  /** [[hourlyFeaturesApprox]] with an in-plan tolerance oracle: the full
    * exact flagship output (DuckDB-replayable, the q_clickstream_hourly
    * schema) plus `unique_k_ok` — the HLL estimate within
    * max(2, 15% = 3σ at the default rsd 0.05) of the exact distinct
    * count. HLL register merges are commutative maxes, so the estimate
    * is deterministic for fixed data, and per-(user, hour) cardinalities
    * sit in HLL++'s near-exact sparse range — the boolean is stably true
    * and the whole row hashes. Both distincts run in the one keyed
    * aggregation (the exact side still pays the Expand; this is the
    * CHECK query, not the 100 TB serving shape — that's
    * [[hourlyFeaturesApprox]]).
    */
  def hourlyFeaturesApproxChecked(parsedEvents: DataFrame): DataFrame = {
    val w = window(col("ts_parsed"), "1 hour")
    val a = aggs(exact = true) :+
      approx_count_distinct(col("k")).as("__unique_k_hll")
    val out = parsedEvents
      .groupBy(col("user_id"), w.as("win"))
      .agg(a.head, a.tail: _*)
      .withColumn("window_start", col("win.start"))
      .withColumn("window_end", col("win.end"))
      .withColumn("event_date", to_date(col("window_start")))
      .withColumn("feature_timestamp", col("window_end"))
      .drop("win")
    derived(out)
      .withColumn("unique_k_ok",
        abs(col("__unique_k_hll") - col("unique_k")).cast("double") <=
          greatest(lit(2.0), col("unique_k") * 0.15))
      .select(
        col("user_id"), col("window_start"), col("window_end"),
        col("total_events"), col("click_count"), col("view_count"),
        col("purchase_count"), col("signup_count"), col("error_count"),
        col("unique_k"), col("total_revenue"), col("avg_view_value"),
        col("primary_k"), col("click_through_rate"), col("conversion_rate"),
        col("event_date"), col("feature_timestamp"), col("unique_k_ok"))
      .orderBy("user_id", "window_start")
  }

  /** Mergeable PARTIAL state of the flagship hourly aggregation — the
    * aggregate-table (incremental view maintenance) architecture: each
    * ingest batch folds to per-(user, window) partials, partial tables
    * MERGE by key without re-reading raw events, and [[finalizeHourly]]
    * projects the serving schema. Every column's state is associative —
    * counts and value sums add, primary_k mins — and the one
    * non-additive statistic (distinct k) is carried as a DataSketches
    * HLL sketch (union-mergeable) instead of a final count. This is how
    * a 100 TB flagship table stays fresh: O(batch) work per ingest, a
    * bounded merge over partials, never a full recompute.
    */
  def hourlyPartials(parsedEvents: DataFrame,
                     extraKeys: Column*): DataFrame = {
    // extraKeys: optional additional grouping columns (e.g. an ingest
    // batch id) — the fold stays one scan + one shuffle while producing
    // one partial row per (user, window, batch), exactly the rows the
    // per-batch calls would produce separately (round 13: the
    // incremental flagship folds both ingest halves in ONE pass keyed by
    // the half instead of two filtered scans; [[mergeHourlyPartials]] is
    // unchanged and still proves the merge).
    val w = window(col("ts_parsed"), "1 hour")
    parsedEvents
      .groupBy(Seq(col("user_id"), w.as("win")) ++ extraKeys: _*)
      .agg(
        count(lit(1)).as("total_events"),
        sum(Parse.flagIf(col("event_type") === "click")).as("click_count"),
        sum(Parse.flagIf(col("event_type") === "view")).as("view_count"),
        sum(Parse.flagIf(col("event_type") === "purchase"))
          .as("purchase_count"),
        sum(Parse.flagIf(col("event_type") === "signup")).as("signup_count"),
        sum(Parse.flagIf(col("event_type") === "error")).as("error_count"),
        hll_sketch_agg(col("k"), lit(12)).as("k_sketch"),
        sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))).as("revenue_sum"),
        sum(when(col("event_type") === "view", col("value")))
          .as("view_value_sum"),
        count(when(col("event_type") === "view", col("value")))
          .as("view_value_cnt"),
        min(when(col("event_type") === "click", col("k")))
          .as("primary_k_min"))
      .withColumn("window_start", col("win.start"))
      .withColumn("window_end", col("win.end"))
      .drop("win")
  }

  /** Merge any number of partial tables: sums add, sketches union, mins
    * min — one keyed shuffle over the BOUNDED partial tables. */
  def mergeHourlyPartials(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("user_id"), col("window_start"), col("window_end"))
      .agg(
        sum(col("total_events")).cast("long").as("total_events"),
        sum(col("click_count")).cast("long").as("click_count"),
        sum(col("view_count")).cast("long").as("view_count"),
        sum(col("purchase_count")).cast("long").as("purchase_count"),
        sum(col("signup_count")).cast("long").as("signup_count"),
        sum(col("error_count")).cast("long").as("error_count"),
        hll_union_agg(col("k_sketch"), lit(true)).as("k_sketch"),
        sum(col("revenue_sum")).as("revenue_sum"),
        sum(col("view_value_sum")).as("view_value_sum"),
        sum(col("view_value_cnt")).cast("long").as("view_value_cnt"),
        min(col("primary_k_min")).as("primary_k_min"))

  /** Project merged partials into the flagship serving schema; the
    * distinct column surfaces as `unique_k_approx` (sketch estimate). */
  def finalizeHourly(partials: DataFrame): DataFrame =
    partials.select(
      col("user_id"), col("window_start"), col("window_end"),
      col("total_events"), col("click_count"), col("view_count"),
      col("purchase_count"), col("signup_count"), col("error_count"),
      hll_sketch_estimate(col("k_sketch")).as("unique_k_approx"),
      round(col("revenue_sum"), 2).as("total_revenue"),
      round(when(col("view_value_cnt") > 0,
        col("view_value_sum") / col("view_value_cnt")), 6)
        .as("avg_view_value"),
      col("primary_k_min").as("primary_k"),
      round(Parse.safeRatio(col("click_count"), col("view_count")), 6)
        .as("click_through_rate"),
      round(Parse.safeRatio(col("purchase_count"), col("click_count")), 6)
        .as("conversion_rate"),
      to_date(col("window_start")).as("event_date"),
      col("window_end").as("feature_timestamp"))

  /** The CHECK form of the incremental path, oracle-shaped exactly like
    * [[hourlyFeaturesApproxChecked]]: every additive/min column comes
    * from the MERGED PARTIALS (so the oracle hash proves the merge), the
    * exact `unique_k` is recomputed from raw (check-side only), and
    * `unique_k_ok` bounds the sketch against it.
    */
  def finalizeHourlyChecked(partials: DataFrame,
                            parsedEvents: DataFrame): DataFrame = {
    val fin = finalizeHourly(partials)
    val exactK = parsedEvents
      .groupBy(col("user_id"), window(col("ts_parsed"), "1 hour").as("win"))
      .agg(countDistinct(col("k")).as("unique_k"))
      .withColumn("window_start", col("win.start"))
      .drop("win")
    fin.join(exactK, Seq("user_id", "window_start"))
      .withColumn("unique_k_ok",
        abs(col("unique_k_approx") - col("unique_k")).cast("double") <=
          greatest(lit(2.0), col("unique_k") * 0.15))
      .select(
        col("user_id"), col("window_start"), col("window_end"),
        col("total_events"), col("click_count"), col("view_count"),
        col("purchase_count"), col("signup_count"), col("error_count"),
        col("unique_k"), col("total_revenue"), col("avg_view_value"),
        col("primary_k"), col("click_through_rate"), col("conversion_rate"),
        col("event_date"), col("feature_timestamp"), col("unique_k_ok"))
      .orderBy("user_id", "window_start")
  }

  /** Rolling distinct actives — DAU + trailing-`windowDays` WAU per day,
    * EXACT. Distinct counts don't sum across days, so the rolling window
    * can't reuse daily aggregates; the scalable exact form replicates
    * each (user, day) pair onto the `windowDays` report days it covers
    * (`explode(sequence)` — a bounded ×W blow-up of the DISTINCT pair
    * table, not of the raw events) and de-dups per report day. Three
    * keyed shuffles, never a per-day re-scan of the corpus; windows at
    * the range edges are clipped (a day's WAU covers only observed
    * history), and only days with activity are reported.
    */
  def rollingActiveUsers(events: DataFrame, keyCol: String, tsCol: String,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"rollingActiveUsers: windowDays >= 1")
    val pairs = events
      .select(to_date(col(tsCol)).as("day"), col(keyCol).as("u")).distinct()
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = pairs
      .select(col("u"), explode(
        sequence(col("day"), date_add(col("day"), windowDays - 1)))
        .as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day")).orderBy("day")
  }

  /** [[rollingActiveUsers]] with the 100 TB path VERIFIED in-plan: per-day
    * HLL sketches of the key, rolling WAU = `hll_union_agg` over the
    * trailing frame — a few-KB sketch per day instead of the ×W pair
    * replication, the mergeable-sketch idiom streaming backfill shares.
    * The window is global but BOUNDED: it runs over the per-day aggregate
    * (one row per day), the documented bounded-global-window class. Emits
    * the exact DAU/WAU (DuckDB-replayable) plus `wau_ok` asserting the
    * sketch landed within `relTol` — deterministic for a given corpus
    * (HLL is deterministic), so the whole row hashes.
    */
  def rollingActiveUsersApproxChecked(events: DataFrame, keyCol: String,
                                      tsCol: String, windowDays: Int = 7,
                                      relTol: Double = 0.05): DataFrame = {
    val exact = rollingActiveUsers(events, keyCol, tsCol, windowDays)
    val daily = events
      .select(to_date(col(tsCol)).as("day"), col(keyCol).as("u"))
      .groupBy("day").agg(hll_sketch_agg(col("u")).as("sk"))
    val frame = Window.orderBy(col("day"))
      .rowsBetween(-(windowDays - 1), Window.currentRow)
    val approx = daily
      .withColumn("wau_approx",
        hll_sketch_estimate(hll_union_agg(col("sk")).over(frame)))
      .select(col("day"), col("wau_approx"))
    exact.join(approx, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        (abs(col("wau_approx").cast("double") / col("wau") - 1.0) <= relTol)
          .as("wau_ok"))
      .orderBy("day")
  }
}
