package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9: the JDBC feature registry — the reference's PostgreSQL metadata and
  * offline-feature tables (`init-scripts/01-init-db.sql:22-59`: a
  * `feature_freshness(feature_view_name PK, last_updated_at, row_count)`
  * metadata table plus composite-PK `features.user_features` tables)
  * re-expressed as REAL `spark.read/write.jdbc` round trips. The sandbox
  * has no Postgres, so the same code paths run against embedded Derby
  * (shipped in Spark's jars): the DataFrameReader/Writer JDBC machinery,
  * dialect mapping, and partitioned parallel reads are all genuinely
  * exercised; swapping the URL (and credentials) retargets Postgres.
  *
  * Scale posture:
  * - registry/metadata tables are one row per feature VIEW — reading them
  *   single-partition is correct at any corpus size;
  * - offline feature tables are read with `partitionColumn`/`numPartitions`
  *   bounds ([[readTablePartitioned]]) so Spark issues one range-predicate
  *   query per partition — the standard parallel JDBC ingestion shape
  *   (each executor pulls its slice; no driver bottleneck);
  * - freshness publication ([[publishFreshness]]) writes the REGISTRY
  *   aggregate, not data: one row per view, computed by the A13 freshness
  *   aggregation before it reaches JDBC.
  */
object JdbcRegistry {

  /** Overwrite-write a frame as a JDBC table (drop + recreate, the
    * idempotent materialization shape). String columns are created as
    * VARCHAR(255) — the reference registry's own column type
    * (`01-init-db.sql:24`) — instead of the dialect default (Derby maps
    * StringType to CLOB, which cannot appear in pushed-down equality
    * predicates).
    */
  def writeTable(df: DataFrame, url: String, table: String): Unit = {
    val varchars = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(255)")
    val w = df.write.mode("overwrite")
    (if (varchars.isEmpty) w
     else w.option("createTableColumnTypes", varchars.mkString(", ")))
      .jdbc(url, table, new java.util.Properties)
  }

  /** Single-partition read — for registry/metadata tables (one row per
    * feature view).
    */
  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new java.util.Properties)

  /** Range-partitioned parallel read: Spark issues `numPartitions` JDBC
    * queries, each bounded by a `partitionColumn` range predicate — the
    * shape that lets 1000 executors drain an offline feature table
    * without funnelling through the driver.
    */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
                           partitionColumn: String, lowerBound: Long,
                           upperBound: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, new java.util.Properties)

  /** A13-over-JDBC: compute the per-view freshness aggregate
    * (`last_updated`, `row_count`, and a content checksum) from an offline
    * feature frame and publish it as the registry's `feature_freshness`
    * table. Returns the published frame read BACK through JDBC, so
    * consumers observe exactly what the registry stores.
    */
  def publishFreshness(features: DataFrame, viewCol: String, tsMicrosCol: String,
                       valueCol: String, url: String,
                       table: String = "feature_freshness"): DataFrame = {
    val fresh = features.groupBy(col(viewCol).as("feature_view_name"))
      .agg(max(col(tsMicrosCol)).as("last_updated_us"),
        count(lit(1)).as("row_count"),
        sum(col(valueCol)).as("value_sum"))
    writeTable(fresh, url, table)
    readTable(features.sparkSession, url, table)
  }
}
