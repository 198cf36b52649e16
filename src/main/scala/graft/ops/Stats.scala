package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k / order statistics / distribution reports
  * (SURVEY.md §2.5 T1–T4 and §2.3 A10–A11).
  *
  * Scale posture: top-k is `TakeOrderedAndProject` (per-partition heaps, no
  * global sort); percentiles ship both the exact form (oracle-checked) and
  * `percentile_approx` (mergeable t-digest-style sketch — the 100 TB path);
  * distribution shares reuse one aggregate with a broadcast total.
  */
object Stats {

  /** T1: top-k groups by count desc (`batch_generator.py:165-167`), with a
    * deterministic name tiebreak.
    */
  def topKByCount(df: DataFrame, key: String, k: Int): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(k)

  /** T2: deterministic probe sample — the reference samples random keys for
    * validation (`validate_online_store.py:59-62`); we key off a modulus so
    * the oracle can reproduce it (SURVEY.md §5.3 seeding rule).
    */
  def probeSample(df: DataFrame, key: String, modulus: Int): DataFrame =
    df.filter(col(key) % modulus === 0)

  /** T3: order statistics — exact percentiles (`inference_service.py:190-199`
    * computes p95 by sorted index; SQL `percentile` interpolates the same
    * way as DuckDB `quantile_cont`).
    */
  def percentiles(df: DataFrame, valueCol: String): DataFrame =
    df.agg(
      round(expr(s"percentile($valueCol, 0.5D)"), 6).as("p50"),
      round(expr(s"percentile($valueCol, 0.9D)"), 6).as("p90"),
      round(expr(s"percentile($valueCol, 0.95D)"), 6).as("p95"),
      round(expr(s"percentile($valueCol, 0.99D)"), 6).as("p99"),
      round(min(col(valueCol)), 6).as("min_v"),
      round(max(col(valueCol)), 6).as("max_v"),
      round(avg(col(valueCol)), 6).as("avg_v"))

  /** T3 at 100 TB: the sketch-based variant (single-pass, mergeable,
    * bounded memory). Not oracle-checked — benchmarked.
    */
  def percentilesApprox(df: DataFrame, valueCol: String): DataFrame =
    df.agg(
      percentile_approx(col(valueCol), lit(0.95), lit(10000)).as("p95_approx"),
      percentile_approx(col(valueCol), lit(0.5), lit(10000)).as("p50_approx"))

  /** A10: group distribution — count per key + share of total
    * (`batch_generator.py:160-177`). The grand total is computed once and
    * broadcast back (scalar cross join), not recomputed per group.
    */
  def groupDistribution(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val total = df.agg(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col(key), col("cnt"),
        round(col("cnt").cast("double") / col("total"), 6).as("share"))
      .orderBy(col(key))
  }

  /** A11: numeric summary — mean/min/max + threshold count
    * (`batch_generator.py:179-193`).
    */
  def numericSummary(df: DataFrame, valueCol: String,
                     threshold: Double): DataFrame =
    df.agg(
      count(lit(1)).as("n"),
      round(avg(col(valueCol)), 6).as("mean"),
      round(min(col(valueCol)), 6).as("min_v"),
      round(max(col(valueCol)), 6).as("max_v"),
      sum(when(col(valueCol) > threshold, 1L).otherwise(0L)).as("above_threshold"))

  /** A8 (deterministic mode): the reference approximates "primary referrer"
    * with `first()` (`clickstream_aggregation.py:170`); the robust form is
    * the true per-key mode with a total tiebreak (count desc, then value
    * asc) — reproducible under any partitioning, expressible identically
    * in the oracle (SURVEY.md §5.3/§7.2). One keyed count + one windowed
    * pick; both shuffles are on the (key) / (key, value) axes.
    */
  def deterministicMode(df: DataFrame, key: String, valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(key), col(valueCol))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("cnt").desc, col(valueCol).asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(key), col(valueCol).as("mode_value"), col("cnt"))
      .orderBy(col(key))
  }

  /** T4: most-recent-partitions tail (`feature_store_materialization.py:153`):
    * newest N distinct dates.
    */
  def recentPartitions(df: DataFrame, dateCol: String, n: Int): DataFrame =
    df.select(col(dateCol)).distinct()
      .orderBy(col(dateCol).desc).limit(n)
}
