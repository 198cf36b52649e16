package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver corpus (`/root/testdata/sf*`, schemas in FIXTURES.md §B).
  *
  * Design note (100 TB posture): every loader is a plain parquet scan — Catalyst
  * pushes filters and prunes columns into the scan, so operators compose on top of
  * these without materializing anything. At cluster scale the same call reads a
  * partitioned directory; nothing here assumes single-file inputs.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table has shipped `ts` as either parquet TIMESTAMP(NANOS, ntz)
    * (older corpus drops; Spark's vectorized reader rejects it, so read nanos as
    * long via the legacy flag and truncate to micros) or TIMESTAMP(MICROS, ntz)
    * (current drops; loads natively). Both branches land on microsecond
    * TIMESTAMP_NTZ — exactly what DuckDB produces reading the same file, keeping
    * the oracle bit-identical regardless of which generation wrote the file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", ts)
  }
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
