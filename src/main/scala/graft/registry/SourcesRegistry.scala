package graft
package registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import Shared._

/** SURVEY §2.1 sources/sinks, §2.8 weighted generation, and the
  * reference's end-to-end pipeline.
  *
  * One domain slice of the query registry (split out of SparkEntry in
  * round 8 — wiring only, no behavior change; [[graft.SparkEntry]]
  * assembles and uniqueness-checks the full map).
  */
object SourcesRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.1 sources / sinks ----------------------------------------------
    "s_csv_roundtrip" -> ((s, dir) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_mktsegment",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_acctbal",
          org.apache.spark.sql.types.DoubleType)))
      graft.sources.Sources.csvRoundTrip(s,
          Tables.customer(s, dir)
            .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"),
          schema)
        .orderBy("c_custkey")
    }),
    "s_json_roundtrip" -> ((s, dir) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_mktsegment",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_acctbal",
          org.apache.spark.sql.types.DoubleType)))
      graft.sources.Sources.jsonRoundTrip(s,
          Tables.customer(s, dir)
            .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"),
          schema)
        .orderBy("c_custkey")
    }),
    "p_json_malformed" -> ((s, dir) => {
      // from_json robustness twin of s_csv_malformed: every 7th props
      // payload is TRUNCATED (unterminated object — a trailing brace is
      // NOT enough, from_json stops at the root value and ignores
      // trailing bytes) — the parse must null it, not kill the job, and
      // the audit reconciles counts and the clean-side k sum
      val raw = Tables.events(s, dir).select(col("event_id"),
        when(pmod(col("event_id"), lit(7)) === 0,
          expr("substring(props, 1, length(props) - 1)"))
          .otherwise(col("props")).as("js"))
      val parsed = raw.select(col("event_id"),
        from_json(col("js"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType))))
          .as("p"))
      parsed.agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(when(col("p").isNotNull && col("p.k").isNotNull, 1)
          .otherwise(0)).cast("long").as("n_parsed"),
        sum(when(col("p").isNull || col("p.k").isNull, 1).otherwise(0))
          .cast("long").as("n_corrupt"),
        sum(when(col("p").isNotNull, col("p.k")).otherwise(0L))
          .cast("long").as("clean_k_sum"))
    }),
    "s_csv_malformed" -> ((s, dir) => {
      // robustness: every 10th row's numeric field is corrupted at the
      // TEXT level; PERMISSIVE + corrupt-record audit must neither kill
      // the read (FAILFAST) nor drop rows silently (DROPMALFORMED)
      val lines = Tables.customer(s, dir).select(concat_ws(",",
        col("c_custkey"), col("c_name"),
        when(pmod(col("c_custkey"), lit(10)) === 0,
          concat(col("c_acctbal").cast("string"), lit("x")))
          .otherwise(col("c_acctbal").cast("string"))).as("value"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_acctbal",
          org.apache.spark.sql.types.DoubleType)))
      val parsed = graft.sources.Sources.csvPermissiveRead(s, lines,
        schema, "_corrupt")
      parsed.agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(when(col("_corrupt").isNull, 1).otherwise(0)).cast("long")
          .as("n_clean"),
        sum(when(col("_corrupt").isNotNull, 1).otherwise(0)).cast("long")
          .as("n_corrupt"),
        round(sum(when(col("_corrupt").isNull, col("c_acctbal"))
          .otherwise(0.0)), 6).as("clean_acctbal_sum"))
    }),
    "s_orc_roundtrip" -> ((s, dir) => {
      // the Hive-warehouse interchange format next to parquet/CSV/JSON;
      // schema still DECLARED on the read side (no inference pass)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_mktsegment",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_acctbal",
          org.apache.spark.sql.types.DoubleType)))
      graft.sources.Sources.orcRoundTrip(s,
          Tables.customer(s, dir)
            .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"),
          schema)
        .orderBy("c_custkey")
    }),
    "s_offline_store" -> ((s, dir) => {
      val withDate = Tables.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
      val root = graft.sources.Sources.writeOfflineStore(withDate, "event_date")
      graft.sources.Sources.readPartition(s, root, "event_date", "2024-01-15")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),
    "s_jdbc_registry" -> ((s, dir) => {
      // S9, for real: the reference's registry flow
      // (init-scripts/01-init-db.sql:22-59) over an actual JDBC database
      // (embedded Derby — same spark.read/write.jdbc code paths as
      // Postgres). Offline feature rows land in `user_features` via JDBC
      // write, come back through a range-PARTITIONED parallel JDBC read,
      // fold to the per-view freshness aggregate, and the aggregate round
      // trips through the `feature_freshness` registry table. Every hop is
      // identity-preserving, so DuckDB replays the whole thing straight
      // from events.parquet — any JDBC type-mapping or partition-predicate
      // defect breaks the hash.
      val db = java.nio.file.Files.createTempDirectory("graft_derby_")
        .toString + "/registry"
      val url = s"jdbc:derby:$db;create=true"
      val e = Tables.events(s, dir)
      val feats = e.filter(col("event_type").isin("click", "purchase"))
        .select(
          concat(lit("user_"), col("user_id")).as("entity_id"),
          unix_micros(col("ts").cast("timestamp")).as("event_us"),
          col("event_type").as("view_name"),
          col("value").as("feature_1"))
      graft.sources.JdbcRegistry.writeTable(feats, url, "user_features")
      val bounds = feats.agg(min(col("event_us")), max(col("event_us"))).head()
      val back = graft.sources.JdbcRegistry.readTablePartitioned(s, url,
        "user_features", "event_us", bounds.getLong(0), bounds.getLong(1) + 1, 4)
      val out = graft.sources.JdbcRegistry
        .publishFreshness(back, "view_name", "event_us", "feature_1", url)
        .select(col("feature_view_name"),
          timestamp_micros(col("last_updated_us")).cast("timestamp_ntz")
            .as("last_updated_at"),
          col("row_count"),
          round(col("value_sum"), 6).as("value_sum"))
        .orderBy("feature_view_name")
        // eager checkpoint: the result must not lazily re-read Derby after
        // the engine below is shut down and the directory removed
        .localCheckpoint()
      try java.sql.DriverManager.getConnection(s"jdbc:derby:$db;shutdown=true")
      catch { case _: java.sql.SQLException => () } // shutdown SIGNALS via SQLException
      val dbDir = new java.io.File(db).getParentFile
      org.apache.commons.io.FileUtils.deleteQuietly(dbDir)
      out
    }),
    "s_kv_store" -> ((s, dir) => {
      // S8, for real: the Redis online store stood in by an embedded KV
      // engine (RocksDB, from Spark's own jars). Split the feature history
      // at a date cutoff, upsert the halves OUT OF ORDER (new half first,
      // then the old half, then REPLAY the old half): event-time
      // last-write-wins must converge to exactly latestPerKey(full
      // history) regardless of arrival order or replay — the foreachBatch
      // idempotency contract, verified here against DuckDB's window
      // replay of the full history. Doubles round-trip as raw IEEE bits,
      // so the hash compare sees the parquet-exact values.
      val tmp = java.nio.file.Files.createTempDirectory("graft_kv_")
      val path = tmp.toString + "/store"
      val e = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          col("event_type"))
      val cutoff = lit("2024-01-15").cast("timestamp_ntz")
      val feats = Seq("value", "event_type")
      val kv = graft.sources.KvStore
      kv.upsertLatest(e.filter(col("ts") >= cutoff), path, "user_id", "ts",
        "event_id", feats)
      kv.upsertLatest(e.filter(col("ts") < cutoff), path, "user_id", "ts",
        "event_id", feats)
      kv.upsertLatest(e.filter(col("ts") < cutoff), path, "user_id", "ts",
        "event_id", feats)
      val out = kv.snapshot(s, path)
        .select(col("entity_id").cast("long").as("user_id"),
          col("feature_ts"), col("tiebreak").as("event_id"),
          round(col("value"), 6).as("value"), col("event_type"))
        .orderBy("user_id")
        .localCheckpoint()
      kv.destroy(path)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      out
    }),
    "s_sorted_layout" -> ((s, dir) => {
      // layout round trip: range-clustered sorted write, read back through a
      // range predicate (file/row-group skipping path), aggregate — oracle
      // is the same aggregate over the raw table
      val root = graft.sources.Sources.sortedLayoutWrite(
        Tables.events(s, dir).select("event_id", "user_id", "ts", "value"),
        "ts", 8)
      s.read.parquet(root)
        .filter(col("ts") >= lit("2024-01-10").cast("timestamp_ntz") &&
          col("ts") < lit("2024-01-17").cast("timestamp_ntz"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("value")), 2).as("sum_value"),
          min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    }),
    "s_ann_index" -> ((s, dir) => {
      // disk-partitioned IVF serving layout: corpus written partitionBy
      // cell (seed centroids, so DuckDB replays assignment + search), a
      // 5-query probe reads ONLY its cells via partition pruning, then
      // the usual cell-local top-k. The one bounded collect fetches the
      // ≤5 probe cells for the literal pruning predicate.
      val emb = Tables.embeddings(s, dir)
      val seeds = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
      val root = graft.sources.Sources.annIndexWrite(
        emb, "vec_id", "embedding", seeds)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding"),
          graft.functions.Native.nearest_centroid(
            col("embedding").cast("array<double>"), seeds).as("cell"))
      val probeCells = Similarity.probeCells(queries, "cell")
      val indexed = s.read.parquet(root)
        .filter(col("cell").isin(probeCells.map(Int.box): _*))
      Similarity.topKIvf(queries, indexed, "vec_id", "embedding", "cell", 3)
    }),
    "s_zorder_layout" -> ((s, dir) => {
      // two-dimensional clustered layout round trip: Z-order write, read
      // back through predicates on BOTH clustering columns (file-skipping
      // on either dim), aggregate — oracle is the same aggregate on the
      // raw table
      val root = graft.sources.Sources.zorderLayoutWrite(
        Tables.events(s, dir).select("event_id", "user_id", "value"),
        "user_id", "value", nFiles = 8)
      s.read.parquet(root)
        .filter(col("user_id").between(100, 400) &&
          col("value").between(50.0, 200.0))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("value")), 2).as("sum_value"),
          min(col("event_id")).as("min_event"),
          max(col("event_id")).as("max_event"))
    }),
    "s_zorder_quantile" -> ((s, dir) => {
      // skew-proof variant: quantile bucket boundaries, same read-back
      // aggregate and the same oracle as s_zorder_layout (layout changes,
      // content does not)
      val root = graft.sources.Sources.zorderLayoutWriteQuantile(
        Tables.events(s, dir).select("event_id", "user_id", "value"),
        "user_id", "value", nFiles = 8)
      s.read.parquet(root)
        .filter(col("user_id").between(100, 400) &&
          col("value").between(50.0, 200.0))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("value")), 2).as("sum_value"),
          min(col("event_id")).as("min_event"),
          max(col("event_id")).as("max_event"))
    }),
    "s_parquet_footer" -> ((s, dir) =>
      // storage metadata audit from footers only (no data pages): the
      // oracle-checkable projection — per-column value counts must
      // reconcile with the table's row count exactly; byte-size fields
      // are layout-dependent and verified in LayoutSpec instead
      graft.sources.Sources.parquetFooter(s, s"$dir/events.parquet")
        .groupBy("column_name")
        .agg(sum(col("num_values")).cast("long").as("num_values"))
        .orderBy("column_name")),
    "s_partition_probe" -> ((s, dir) => {
      val withDate = Tables.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
      val root = graft.sources.Sources.writeOfflineStore(withDate, "event_date")
      graft.sources.Sources.recentPartitions(s, root, "event_date", 7)
    }),

    // ---- §2.8 weighted data generation -------------------------------------
    "g_profiles" -> ((s, dir) =>
      Gen.profiles(Tables.customer(s, dir).select("c_custkey"), "c_custkey")),
    "g_events" -> ((s, dir) =>
      Gen.events(Tables.customer(s, dir).select("c_custkey"), "c_custkey", 3)
        .orderBy("c_custkey", "sq")),
    "g_weighted_sample" -> ((s, dir) => {
      // Efraimidis–Spirakis weighted sample WITHOUT replacement:
      // inclusion ∝ activity_weight, deterministic via the shared hash
      val prof = Gen.profiles(Tables.customer(s, dir).select("c_custkey"),
        "c_custkey")
      Sampling.weightedSampleNoReplacement(
          prof.select(col("c_custkey"), col("activity_weight")),
          "c_custkey", "activity_weight", n = 100)
        .orderBy("c_custkey")
    }),
    "g_weighted_pick" -> ((s, dir) => {
      // G6: emitting-user selection ∝ activity_weight
      // (stream_generator.py:69-111) — cumulative-weight inverse-CDF draw
      val prof = Gen.profiles(Tables.customer(s, dir).select("c_custkey"),
        "c_custkey")
      Gen.weightedPick(prof.select(col("c_custkey"), col("activity_weight")),
          "c_custkey", "activity_weight", nDraws = 2000)
        .orderBy("draw_id")
    }),

    // ---- the reference's EXACT end-to-end pipeline -------------------------
    // profiles (G1–G4) → clickstream synthesis (G5/P14) → enrichment join
    // (J4) → the full 21-column flagship aggregation (A1–A9, FIXTURES §A3)
    "q_reference_pipeline" -> ((s, dir) => {
      val keys = Tables.customer(s, dir).select("c_custkey")
      val evs = Gen.clickstream(keys, "c_custkey", 8)
        .withColumnRenamed("c_custkey", "user_id")
      val prof = Gen.profiles(keys, "c_custkey")
        .select(col("c_custkey").as("user_id"),
          col("country").as("user_country"),
          col("subscription_tier").as("user_tier"))
      WindowAgg.referenceFeatures(Retrieval.enrich(evs, prof, "user_id"))
    }),
  )
}
