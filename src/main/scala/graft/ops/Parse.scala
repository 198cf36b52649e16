package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projection / scalar-function operators (SURVEY.md §2.2, P1–P14).
  *
  * Mirrors the reference's event-parsing stage
  * (`spark/apps/clickstream_aggregation.py:82-109`): cast → JSON parse →
  * flatten → timestamp parse with pattern + coalesce fallback → null filter.
  * Everything is built-in `functions._` (codegen'd, whole-stage-compiled);
  * no UDFs, matching the reference's zero-UDF design
  * (`clickstream_aggregation.py:8`).
  *
  * Scale posture: all narrow transformations — no shuffle; filters and the
  * `props` JSON access are pushed into / evaluated directly over the
  * vectorized parquet scan.
  */
object Parse {

  /** P2/P3: parse the JSON `props` payload with an explicit schema (the
    * reference's `from_json(value, schema)` at `clickstream_aggregation.py:89-91`)
    * and flatten the struct.
    */
  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  /** The full reference parse stage over the `events` table (P1–P7, P10, P11).
    *
    * - P1 cast: `props` treated as raw string payload (Kafka value stand-in)
    * - P2 from_json with declared schema → P3 flatten (`data.*`)
    * - P4/P5 timestamp parse with explicit pattern, coalesce fallback
    *   (`clickstream_aggregation.py:93-104`) — exercised as a format→parse
    *   round-trip so batch correctness is oracle-checkable
    * - P7 null filter on the entity key (`:108`)
    * - P10 `event_date = to_date(ts)` partition key (`:198`)
    * - P11 derived column rename (`feature_timestamp`)
    */
  def parseEvents(events: DataFrame): DataFrame = {
    val pattern = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val parsed = events
      .withColumn("payload", col("props").cast(StringType))                     // P1
      .withColumn("data", from_json(col("payload"), propsSchema))               // P2
      .select(col("*"), col("data.*"))                                          // P3
      .withColumn("ts_string", date_format(col("ts"), pattern))
      .withColumn(
        "ts_parsed",
        coalesce(                                                               // P5
          to_timestamp_ntz(col("ts_string"), lit(pattern)),                     // P4
          to_timestamp_ntz(col("ts_string"))
        )
      )
      .withColumn("event_date", to_date(col("ts_parsed")))                      // P10
      .withColumn("feature_timestamp", col("ts_parsed"))                        // P11
    parsed
      .filter(col("user_id").isNotNull)                                         // P7
      .select(
        "event_id", "user_id", "event_type", "value",
        "k", "ts_parsed", "event_date", "feature_timestamp"
      )
  }

  /** P8: conditional expression — `when(pred, x).otherwise(y)`
    * (`clickstream_aggregation.py:144-147,155-162`).
    */
  def flagIf(pred: Column): Column = when(pred, lit(1L)).otherwise(lit(0L))

  /** P9: guarded ratio — NULL (not error / not inf) on zero denominator.
    * Spark 4 runs ANSI mode by default, so the division must be explicitly
    * guarded; this also matches DuckDB's NULL-on-/0 for the oracle.
    */
  def safeRatio(num: Column, den: Column): Column =
    when(den =!= 0, num.cast(DoubleType) / den.cast(DoubleType))

  /** P12: KS-magnitude binning (`scripts/drift_detection.py:157-168`) —
    * a `when` cascade mapping a statistic to a label.
    */
  def magnitudeBin(c: Column): Column =
    when(c < 0.1, "negligible")
      .when(c < 0.2, "small")
      .when(c < 0.3, "moderate")
      .when(c < 0.5, "large")
      .otherwise("very large")

  /** P13: percent change with zero-reference guard
    * (`scripts/drift_detection.py:119-123`).
    */
  def pctChange(cur: Column, ref: Column): Column =
    when(ref === 0, lit(0.0)).otherwise((cur - ref) / ref * 100.0)

  /** P14: entity-id string formatting — `user_%06d`, `CAT_%05d` prefixes
    * (`batch_generator.py:116`, `stream_generator.py:161-177`).
    */
  def formatUserId(c: Column): Column = format_string("user_%06d", c)
  def formatCode(category: Column, n: Column): Column =
    concat(upper(substring(category, 1, 3)), lit("_"), format_string("%05d", n))
}
