package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted synthetic-data generation (SURVEY.md §2.8, G1–G5) — the
  * reference's profile/event generators (`scripts/batch_generator.py`,
  * `scripts/stream_generator.py`) as deterministic column transforms.
  *
  * Instead of `random.choices`, randomness is a Lehmer-style multiplicative
  * hash of the row key: u = ((key·48271 + c) mod 2³¹−1) / (2³¹−1). This is
  * (a) reproducible across engines — the DuckDB oracle evaluates the exact
  * same integer arithmetic, and (b) partition-independent — no seed state,
  * so generation is embarrassingly parallel at any scale (SURVEY.md §5.3
  * determinism rule: seed or eliminate `rand`).
  */
object Gen {

  private val M = 2147483647L // 2^31 - 1

  /** Deterministic uniform in (0, 1], stream `c` decorrelates channels.
    * Two iterated Lehmer (minstd) steps after a channel offset — a single
    * multiply does not mix small sequential keys (they'd all land in the
    * first weight bucket). All intermediates stay < 2^47, so the identical
    * integer arithmetic runs overflow-free in DuckDB's strict BIGINT math.
    */
  def u01(key: Column, c: Long): Column = {
    val h1 = (key + lit(c * 1000003L)) % M
    val h2 = (h1 * 48271L) % M
    val h3 = (h2 * 48271L) % M
    ((h3 + 1L).cast("double")) / M.toDouble
  }

  /** G1: weighted categorical sampling via cumulative-weight `when` cascade
    * (`batch_generator.py:25-43`). `weighted` = (value, cumulativeUpperBound).
    */
  def weightedChoice(u: Column, weighted: Seq[(String, Double)]): Column =
    weighted.init.foldRight(lit(weighted.last._1): Column) {
      case ((v, ub), acc) => when(u <= ub, v).otherwise(acc)
    }

  /** The reference's country / tier / event-type weight tables
    * (`batch_generator.py:25-43`, `stream_generator.py:32-37`).
    */
  val countries: Seq[(String, Double)] = Seq(
    "US" -> 0.30, "UK" -> 0.42, "DE" -> 0.52, "FR" -> 0.60, "JP" -> 0.68,
    "IN" -> 0.76, "BR" -> 0.83, "CA" -> 0.90, "AU" -> 0.96, "OTHER" -> 1.0)
  val tiers: Seq[(String, Double)] = Seq(
    "free" -> 0.60, "basic" -> 0.85, "premium" -> 0.97, "enterprise" -> 1.0)

  /** G2: age from weighted bands then uniform inside the band
    * (`batch_generator.py:45-65`).
    */
  def bandedAge(u1: Column, u2: Column): Column = {
    val bands = Seq( // (cumWeight, lo, hi) per batch_generator.py:46-53
      (0.15, 18, 24), (0.40, 25, 34), (0.65, 35, 44),
      (0.85, 45, 54), (0.95, 55, 64), (1.01, 65, 80))
    bands.init.foldRight(
      inBand(u2, bands.last._2, bands.last._3): Column) {
      case ((ub, lo, hi), acc) => when(u1 <= ub, inBand(u2, lo, hi)).otherwise(acc)
    }
  }
  private def inBand(u: Column, lo: Int, hi: Int): Column =
    (floor(u * (hi - lo + 1)) + lo).cast("int")

  /** G3: exponential-recency signup offset —
    * `int(expovariate(1/365)) % 1095` days ago (`batch_generator.py:68-76`).
    */
  def signupDaysAgo(u: Column): Column =
    (floor(-log(u) * 365.0).cast("long") % 1095L).cast("int")

  /** G4: rule-based activity weight — tier base × age factor × U(0.5,1.5),
    * capped at 2.0 (`batch_generator.py:79-108`).
    */
  def activityWeight(tier: Column, age: Column, u: Column): Column = {
    val base = when(tier === "enterprise", 1.5)
      .when(tier === "premium", 1.3)
      .when(tier === "basic", 1.1)
      .otherwise(0.9)
    val ageFactor = when(age < 25, 1.2)
      .when(age < 35, 1.1)
      .when(age < 55, 1.0)
      .otherwise(0.8)
    round(least(base * ageFactor * (u + 0.5), lit(2.0)), 6)
  }

  /** G5: event synthesis with per-type fields
    * (`stream_generator.py:184-217`): each key emits `perKey` events; type
    * from the reference's weights (view .50 / click .30 / cart .15 /
    * purchase .05); view→duration 3–120 s, click→position 1–20 + referrer,
    * cart/purchase→quantity 1–5, purchase→price U(9.99, 499.99); fields
    * NULL for other types (nullable schema per
    * `clickstream_aggregation.py:61-65`). Unordered: every column is a
    * pure function of (key, sq) — callers that export the rows order at
    * the edge rather than paying a corpus-wide range exchange mid-plan.
    */
  val eventTypes: Seq[(String, Double)] = Seq(
    "view" -> 0.50, "click" -> 0.80, "cart" -> 0.95, "purchase" -> 1.0)
  val referrers: Seq[(String, Double)] = Seq(
    "search" -> 0.2, "recommendation" -> 0.4, "homepage" -> 0.6,
    "email" -> 0.8, "direct" -> 1.0)

  def events(keys: DataFrame, key: String, perKey: Int): DataFrame = {
    val seqd = keys
      .select(col(key), explode(sequence(lit(1), lit(perKey))).as("sq"))
      .withColumn("ek", col(key) * perKey + col("sq"))
    val t = weightedChoice(u01(col("ek"), 11), eventTypes)
    seqd
      .withColumn("event_type", t)
      .withColumn("view_duration_sec",
        when(col("event_type") === "view",
          (floor(u01(col("ek"), 12) * 118) + 3).cast("int")))
      .withColumn("click_position",
        when(col("event_type") === "click",
          (floor(u01(col("ek"), 13) * 20) + 1).cast("int")))
      .withColumn("referrer",
        when(col("event_type") === "click",
          weightedChoice(u01(col("ek"), 14), referrers)))
      .withColumn("quantity",
        when(col("event_type").isin("cart", "purchase"),
          (floor(u01(col("ek"), 15) * 5) + 1).cast("int")))
      .withColumn("price",
        when(col("event_type") === "purchase",
          round(u01(col("ek"), 16) * (499.99 - 9.99) + 9.99, 6)))
      .select(col(key), col("sq"), col("event_type"),
        col("view_duration_sec"), col("click_position"), col("referrer"),
        col("quantity"), col("price"))
  }

  /** Full reference-shaped clickstream synthesis (G5 + P14): every field of
    * the reference's 15-field event schema that feeds the flagship
    * aggregation (`stream_generator.py:184-217`, schema
    * `clickstream_aggregation.py:50-66`): type, product (category + id),
    * device, session, per-type nullable fields, and a deterministic
    * event-time spread over 7 days.
    */
  val categories: Seq[(String, Double)] = Seq(
    "electronics" -> 0.18, "clothing" -> 0.33, "home" -> 0.46,
    "books" -> 0.58, "sports" -> 0.70, "beauty" -> 0.81,
    "toys" -> 0.91, "grocery" -> 1.0)
  val devices: Seq[(String, Double)] = Seq(
    "mobile" -> 0.55, "desktop" -> 0.90, "tablet" -> 1.0)

  def clickstream(keys: DataFrame, key: String, perKey: Int): DataFrame = {
    val base = events(keys, key, perKey)
      .withColumn("ek", col(key) * perKey + col("sq"))
    base
      // money has 2 decimals: keeps Σ price·qty away from round-half
      // boundaries, so the cross-engine sum is rounding-stable at any scale
      .withColumn("price", round(col("price"), 2))
      .withColumn("product_category",
        weightedChoice(u01(col("ek"), 21), categories))
      .withColumn("product_id",
        Parse.formatCode(col("product_category"),
          floor(u01(col("ek"), 22) * 500).cast("int")))
      .withColumn("device_type", weightedChoice(u01(col("ek"), 23), devices))
      .withColumn("session_id",
        format_string("%d_%d", col(key), expr("sq div 4")))
      .withColumn("__mins", floor(u01(col("ek"), 17) * 10080).cast("int"))
      .withColumn("ts",
        lit("2024-01-01 00:00:00").cast("timestamp_ntz") +
          expr("make_dt_interval(0, 0, __mins, 0)"))
      .drop("ek", "__mins")
  }

  /** G6: distributed weighted sampling WITH replacement — the engine-side
    * `random.choices(users, weights=activity_weights)` of the reference's
    * stream generator (`scripts/stream_generator.py:69-111`): draw `nDraws`
    * keys, each key picked with probability ∝ its weight.
    *
    * Construction (all deterministic, DuckDB-oracle exact):
    *   1. weights are scaled to integers (×10⁶, matching their 6-decimal
    *      precision) so every cumulative sum is exact integer arithmetic —
    *      no float-accumulation order sensitivity anywhere;
    *   2. the cumulative weight axis is built with [[Scan.prefixSum]]
    *      (distributed — no single-task global window over the key table);
    *      key i owns the interval (cum−w, cum];
    *   3. draw j's target is u01(j)·totalWeight; instead of an interval
    *      (theta) join — which Spark would plan as a nested loop — the
    *      weight axis is cut into `buckets` equal cells, each key's
    *      interval is exploded onto the ≤ span cells it overlaps (most
    *      keys hit 1–2 cells; a hot key's span is capped at `buckets`),
    *      and draws equi-join their cell, then filter to the exact
    *      interval. FP-safe: cell(x) = floor(x/total·buckets) is monotone,
    *      so a target strictly inside (lo, hi] can only land in a cell the
    *      interval also covers.
    *
    * Work per draw ≈ #keys/buckets + 1 candidates — size `buckets` ≈ 4× the
    * key count at scale. Returns (draw_id, key) with exactly one key per
    * draw.
    */
  def weightedPick(weights: DataFrame, keyCol: String, weightCol: String,
                   nDraws: Long, channel: Long = 41L,
                   buckets: Int = 1 << 16): DataFrame = {
    val base = weights
      .select(col(keyCol), round(col(weightCol) * 1e6).cast("long").as("__w"))
      .filter(col("__w") > 0)
    val cum = Scan.prefixSum(base, Nil, col(keyCol), col("__w"), "__hi")
      .withColumn("__lo", col("__hi") - col("__w"))
    val total = base.agg(sum(col("__w")).as("__total"))

    val cellOf = (x: Column, tot: Column) =>
      least(floor(x.cast("double") / tot * buckets), lit(buckets - 1L))
        .cast("long")
    val spans = cum.crossJoin(broadcast(total))
      .withColumn("__cell", explode(sequence(
        cellOf(col("__lo"), col("__total")),
        cellOf(col("__hi"), col("__total")))))
      .select(col("__cell"), col(keyCol), col("__lo"), col("__hi"))

    weights.sparkSession.range(1, nDraws + 1).toDF("draw_id")
      .crossJoin(broadcast(total))
      .withColumn("__target", u01(col("draw_id"), channel) * col("__total"))
      .withColumn("__cell", cellOf(col("__target"), col("__total")))
      .join(spans, Seq("__cell"))
      .filter(col("__lo") < col("__target") && col("__target") <= col("__hi"))
      .select(col("draw_id"), col(keyCol))
  }

  /** Full profile synthesis (G1–G4) from a key column — the engine-side
    * equivalent of `generate_user_profiles` (`batch_generator.py:111-137`).
    */
  def profiles(keys: DataFrame, key: String): DataFrame =
    keys.select(
        col(key),
        Parse.formatUserId(col(key)).as("user_id"),
        weightedChoice(u01(col(key), 1), countries).as("country"),
        weightedChoice(u01(col(key), 2), tiers).as("subscription_tier"),
        bandedAge(u01(col(key), 3), u01(col(key), 4)).as("age"),
        signupDaysAgo(u01(col(key), 5)).as("signup_days_ago"))
      .withColumn("activity_weight",
        activityWeight(col("subscription_tier"), col("age"), u01(col(key), 6)))
      .orderBy(col(key))
}
