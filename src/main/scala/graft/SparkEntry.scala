package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator row of SURVEY.md §2 (S/P/A/J/T/Q/D/G groups) and the
  * §7.4 LLM-pipeline extensions is registered here as a pure batch query
  * over the driver corpus, with an ANSI-SQL DuckDB oracle where the
  * semantics are SQL-expressible. Determinism rules (SURVEY.md §5.3):
  * every output is fully ordered, every double is `round`ed, every
  * aggregate is aliased identically in Spark and SQL, `first` is replaced
  * by `min`, and randomness is a multiplicative hash both engines compute.
  */
object SparkEntry {

  private def ev(s: SparkSession, dir: String) = Parse.parseEvents(Tables.events(s, dir))

  /** A12 snapshot reused by several queries. */
  private def snapshot(s: SparkSession, dir: String): DataFrame =
    Materialize.latestPerKey(Tables.orders(s, dir), "o_custkey", "o_orderdate",
      "o_orderkey")

  /** Trained BPE merges per corpus dir — a deterministic artifact (the
    * trainer is superstep-exact), cached so the three BPE registry
    * entries train once per corpus instead of once per query; production
    * would persist the merge table next to the corpus like any fitted
    * vocabulary.
    */
  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()
  private def bpeMerges(s: SparkSession, dir: String): Seq[(String, String)] =
    bpeCache.computeIfAbsent(dir, _ =>
      Bpe.trainMergesDistributed(Tables.documents(s, dir), "text",
        Bpe.OracleK))

  /** Trained unigram piece table per corpus dir — the [[bpeMerges]]
    * pattern for the second tokenizer family (deterministic artifact,
    * trained once per corpus across its registry entries).
    */
  private val unigramCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Double)]]()
  private def unigramTable(s: SparkSession, dir: String): Seq[(String, Double)] =
    unigramCache.computeIfAbsent(dir, _ =>
      Unigram.trainDistributed(Tables.documents(s, dir), "text",
        vocabSize = 200, rounds = 2, maxPieceLen = 4))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WindowAgg.hourlyFeatures(ev(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.2 projections / scalar functions -------------------------------
    "p_parse_events" -> ((s, dir) =>
      ev(s, dir).orderBy("event_id")),
    "p_value_bins" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(Parse.magnitudeBin(col("value") / 1000.0).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cnt"))
        .orderBy("bin")),
    "p_pct_change" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val cur = e.filter(col("event_type") === "purchase")
        .agg(avg(col("value")).as("cur_mean"))
      val ref = e.filter(col("event_type") === "view")
        .agg(avg(col("value")).as("ref_mean"))
      cur.crossJoin(ref).select(
        round(col("cur_mean"), 6).as("cur_mean"),
        round(col("ref_mean"), 6).as("ref_mean"),
        round(Parse.pctChange(col("cur_mean"), col("ref_mean")), 6)
          .as("pct_change"))
    }),
    "p_id_format" -> ((s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey"),
        Parse.formatUserId(col("c_custkey")).as("user_id"),
        Parse.formatCode(col("c_mktsegment"), col("c_nationkey")).as("code"))
        .orderBy("c_custkey")),

    // ---- §2.3 aggregations & time windows ----------------------------------
    "q_clickstream_hourly" -> ((s, dir) =>
      WindowAgg.hourlyFeatures(ev(s, dir))),
    "q_clickstream_sliding" -> ((s, dir) =>
      WindowAgg.slidingFeatures(ev(s, dir))),
    "q_clickstream_hourly_approx" -> ((s, dir) =>   // HLL vs exact, tolerance-oracled
      WindowAgg.hourlyFeaturesApproxChecked(ev(s, dir))),
    "q_sessions" -> ((s, dir) =>
      Session.sessionWindows(Tables.events(s, dir), "user_id", "ts",
        "30 minutes").orderBy("user_id", "session_start")),
    "q_slo_burn" -> ((s, dir) => {
      // SRE burn-rate over the event stream: daily error rate against a
      // 1% error budget (99% SLO), burn multiple, cumulative budget
      // consumed, and the fast-burn alert (burn > 2x) — windows over the
      // bounded day table (the cusum/forecast class)
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("errors"))
      val cumW = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val budget = 0.01
      daily
        .withColumn("error_rate",
          round(col("errors") / col("n").cast("double"), 6))
        .withColumn("burn",
          round(col("errors") / col("n").cast("double") / lit(budget), 6))
        .withColumn("budget_consumed",
          round(sum(col("errors")).over(cumW) /
            (lit(budget) * sum(col("n")).over(cumW).cast("double")), 6))
        .withColumn("fast_burn",
          col("errors") / col("n").cast("double") / lit(budget) > 2.0)
        .select(col("day"), col("n"), col("errors"), col("error_rate"),
          col("burn"), col("budget_consumed"), col("fast_burn"))
        .orderBy("day")
    }),
    "q_session_stats" -> ((s, dir) => {
      // the product readout over sessionization: bounce rate (single-
      // event sessions), mean depth, median active span, value totals —
      // one bounded fold over the session table
      val sw = Session.sessionWindows(Tables.events(s, dir), "user_id",
        "ts", "30 minutes")
      val spanS = (unix_micros(col("session_end").cast("timestamp")) -
        unix_micros(col("session_start").cast("timestamp"))) /
        lit(1000000L) - lit(1800.0) // session_window end includes the gap
      sw.agg(
        count(lit(1)).cast("long").as("n_sessions"),
        count_distinct(col("user_id")).cast("long").as("n_users"),
        round(sum(when(col("n_events") === 1, 1).otherwise(0)) /
          count(lit(1)).cast("double"), 6).as("bounce_rate"),
        round(sum(col("n_events")) / count(lit(1)).cast("double"), 6)
          .as("avg_events"),
        round(percentile(spanS, lit(0.5)), 6).as("median_span_s"),
        round(sum(col("session_value")), 2).as("total_value"))
    }),
    "q_rolling_active_users" -> ((s, dir) =>
      // DAU + exact trailing-7-day WAU via bounded pair replication
      WindowAgg.rollingActiveUsers(Tables.events(s, dir), "user_id", "ts")),
    "q_rolling_active_users_approx" -> ((s, dir) =>
      // the mergeable-sketch WAU path, tolerance-oracled against exact
      WindowAgg.rollingActiveUsersApproxChecked(
        Tables.events(s, dir), "user_id", "ts")),
    "x_sql_cosine" -> ((s, dir) => {
      graft.functions.GraftExtensions.register(s)
      Tables.embeddings(s, dir).createOrReplaceTempView("emb_sql")
      s.sql("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |  round(cosine_similarity(CAST(a.embedding AS ARRAY<DOUBLE>),
              |        CAST(b.embedding AS ARRAY<DOUBLE>)), 6) AS cos
              |FROM emb_sql a JOIN emb_sql b ON a.vec_id + 1 = b.vec_id
              |ORDER BY id_a""".stripMargin)
    }),
    "q_group_distribution" -> ((s, dir) =>
      Stats.groupDistribution(Tables.customer(s, dir), "c_nationkey")),
    "q_numeric_summary" -> ((s, dir) =>
      Stats.numericSummary(Tables.lineitem(s, dir), "l_quantity", 25.0)),
    "q_latest_snapshot" -> ((s, dir) =>
      snapshot(s, dir)
        .select(col("o_custkey"), col("o_orderdate").as("feature_ts"),
          col("o_totalprice"), col("o_orderstatus"))
        .orderBy("o_custkey")),
    "q_incremental_snapshot" -> ((s, dir) => {
      // materialize-incremental contract: fold the post-cutoff delta into
      // the pre-cutoff snapshot; must equal the full-history snapshot
      // (oracle = the same snapshot SQL as q_latest_snapshot)
      val o = Tables.orders(s, dir)
      val cutoff = "1999-01-01"
      val base = Materialize.latestPerKey(
        o.filter(col("o_orderdate") < lit(cutoff).cast("timestamp_ntz")),
        "o_custkey", "o_orderdate", "o_orderkey")
      val delta = o.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp_ntz"))
      Materialize.incremental(base, delta, "o_custkey", "o_orderdate",
          "o_orderkey")
        .select(col("o_custkey"), col("o_orderdate").as("feature_ts"),
          col("o_totalprice"), col("o_orderstatus"))
        .orderBy("o_custkey")
    }),
    "q_snapshot_asof" -> ((s, dir) =>
      // time travel: the online store as it looked at the 1997-06-01 cutoff
      Materialize.snapshotAsOf(Tables.orders(s, dir), "o_custkey",
          "o_orderdate", "o_orderkey", "1997-06-01")
        .select(col("o_custkey"), col("o_orderdate").as("feature_ts"),
          col("o_totalprice"), col("o_orderstatus"))
        .orderBy("o_custkey")),
    "q_feature_scaling" -> ((s, dir) =>
      // standardize + min-max transforms from one stats pass; probe rows
      // subsampled by key modulus (stats still computed over ALL rows)
      Stats.scaleFeatures(Tables.orders(s, dir), "o_orderkey",
          Seq("o_totalprice"))
        .filter(col("o_orderkey") % 300 === 0)),
    "q_freshness" -> ((s, dir) =>
      Materialize.freshness(Seq(
        ("events", Tables.events(s, dir), "ts"),
        ("orders", Tables.orders(s, dir), "o_orderdate")))),
    "q_coverage" -> ((s, dir) => {
      val probed = Retrieval.pointLookup(
        Tables.customer(s, dir).select(col("c_custkey")),
        snapshot(s, dir).withColumnRenamed("o_custkey", "c_custkey")
          .select("c_custkey", "o_totalprice"),
        "c_custkey")
      Materialize.coverage(probed, "o_totalprice")
    }),

    "q_materialization_dag" -> ((s, dir) => {
      // §3.2 end to end: partition probe (S11 fallback: last-7 partitions) →
      // latest-per-key materialization (A12) → sampled point lookups (T2/J2)
      // → non-null coverage (A14) — the reference's daily Airflow DAG as one
      // declarative plan
      val events = Tables.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
      val recent = Stats.recentPartitions(events, "event_date", 7)
      val filtered = events.join(broadcast(recent), Seq("event_date"))
      val snap = Materialize.latestPerKey(filtered, "user_id", "ts", "event_id")
        .select(col("user_id"), col("value").as("feature_value"))
      val probes = Stats.probeSample(Tables.customer(s, dir), "c_custkey", 13)
        .select(col("c_custkey").as("user_id"))
      Materialize.coverage(
        Retrieval.pointLookup(probes, snap, "user_id"), "feature_value")
    }),

    // ---- §2.4 joins / point-in-time retrieval ------------------------------
    "q_asof_features" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val probes = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val feats = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("fts"))
        .agg(max(col("value")).as("last_purchase_value"))
      Retrieval.asOfJoin(probes, feats, "user_id", "ts", "fts",
          "INTERVAL 7 DAYS", Seq("last_purchase_value"))
        .orderBy("event_id")
    }),
    "q_asof_native" -> ((s, dir) => {
      // J1 via the custom LogicalPlan/Strategy/SparkPlan operator — checked
      // against the SAME DuckDB ASOF oracle as the window formulation
      val e = Tables.events(s, dir)
      val probes = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val feats = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("fts"))
        .agg(max(col("value")).as("last_purchase_value"))
      Retrieval.asOfJoinNative(probes, feats, "user_id", "ts", "fts",
          7L * 86400L * 1000000L)
        .toDF("event_id", "user_id", "ts", "f_user", "feature_ts",
          "last_purchase_value")
        .select("event_id", "user_id", "ts", "last_purchase_value",
          "feature_ts")
        .orderBy("event_id")
    }),
    "s_bucketed_asof" -> ((s, dir) => {
      // the zero-exchange/zero-sort as-of fast path as a registered query:
      // both sides land as bucketed-sorted tables on the join key, so
      // AsOfJoinExec's required distribution+ordering are satisfied at the
      // SCAN and EnsureRequirements inserts nothing — the 100 TB shape
      // where feature tables are written bucketed once and every as-of
      // retrieval afterwards is shuffle-free. Same DuckDB ASOF oracle as
      // the exchange-planned form (layout changes, semantics do not);
      // PLANS.md carries the exchange-free plan.
      val e = Tables.events(s, dir)
      // bucket sort metadata is only exposed to planning under this conf
      // (off by default since Spark 3.0 because it lists files at plan
      // time); without it the merge's ordering requirement re-sorts each
      // bucket. Left set: it is behavior-neutral beyond planning cost.
      s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // a fresh session's in-memory catalog doesn't know about a previous
      // run's managed-table LOCATION — drop both the entry and the files
      for (t <- Seq("graft_asof_probes_bkt", "graft_asof_feats_bkt")) {
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + "/" + t)
        loc.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(loc, true)
      }
      // repartition onto the bucket hash BEFORE the bucketed write: each
      // task then holds exactly one bucket, so every bucket lands as ONE
      // sorted file — the condition under which the scan's outputOrdering
      // carries the sortBy order and EnsureRequirements inserts no Sort
      // (multi-file buckets are only per-file sorted, forcing a re-sort)
      e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
        .repartition(8, col("user_id"))
        .write.mode("overwrite").bucketBy(8, "user_id")
        .sortBy("user_id", "ts").saveAsTable("graft_asof_probes_bkt")
      e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("fts"))
        .agg(max(col("value")).as("last_purchase_value"))
        .repartition(8, col("user_id"))
        .write.mode("overwrite").bucketBy(8, "user_id")
        .sortBy("user_id", "fts").saveAsTable("graft_asof_feats_bkt")
      Retrieval.asOfJoinNative(s.table("graft_asof_probes_bkt"),
          s.table("graft_asof_feats_bkt"), "user_id", "ts", "fts",
          7L * 86400L * 1000000L)
        .toDF("event_id", "user_id", "ts", "f_user", "feature_ts",
          "last_purchase_value")
        .select("event_id", "user_id", "ts", "last_purchase_value",
          "feature_ts")
        .orderBy("event_id")
    }),
    "q_fs_historical" -> ((s, dir) => {
      // the FeatureStore facade end to end: apply view → point-in-time
      // retrieval — same ASOF oracle as q_asof_features, view__feature cols
      val e = Tables.events(s, dir)
      val probes = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val feats = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts").as("fts"))
        .agg(max(col("value")).as("last_purchase_value"))
      val fs = new graft.FeatureStore(s)
      fs.applyView(graft.FeatureView("purchases", feats, "user_id", "fts",
        "last_purchase_value", Seq("last_purchase_value")))
      fs.getHistoricalFeatures(probes, "purchases", "ts")
        .orderBy("event_id")
    }),
    "q_fs_multiview" -> ((s, dir) => {
      // the multi-view feature list: two registered views join point-in-
      // time onto one probe frame in a single call, features side by side
      val e = Tables.events(s, dir)
      val probes = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      def latest(t: String, out: String) = e.filter(col("event_type") === t)
        .groupBy(col("user_id"), col("ts").as("fts"))
        .agg(max(col("value")).as(out))
      val fs = new graft.FeatureStore(s)
      fs.applyView(graft.FeatureView("purchases", latest("purchase",
        "last_purchase_value"), "user_id", "fts", "last_purchase_value",
        Seq("last_purchase_value")))
      fs.applyView(graft.FeatureView("pageviews", latest("view",
        "last_view_value"), "user_id", "fts", "last_view_value",
        Seq("last_view_value")))
      fs.getHistoricalFeaturesMulti(probes, Seq("purchases", "pageviews"),
          "ts")
        .orderBy("event_id")
    }),
    "q_point_lookup" -> ((s, dir) => {
      val keys = Stats.probeSample(Tables.customer(s, dir), "c_custkey", 7)
        .select(col("c_custkey"), col("c_mktsegment"))
      val snap = snapshot(s, dir).withColumnRenamed("o_custkey", "c_custkey")
        .select("c_custkey", "o_totalprice", "o_orderstatus")
      Retrieval.pointLookup(keys, snap, "c_custkey")
        .select(col("c_custkey"),
          col("c_mktsegment").as("customer__mktsegment"),
          col("o_totalprice").as("orders__totalprice"),
          col("o_orderstatus").as("orders__orderstatus"),
          col("o_totalprice").isNotNull.as("has_features"))
        .orderBy("c_custkey")
    }),
    "q_enrichment" -> ((s, dir) => {
      val enriched = Retrieval.enrich(
        Tables.events(s, dir).select("event_id", "user_id", "event_type"),
        Tables.customer(s, dir)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"),
            col("c_nationkey")),
        "user_id")
      Retrieval.enrich(enriched,
          Tables.nation(s, dir).select(col("n_nationkey").as("c_nationkey"),
            col("n_name")),
          "c_nationkey")
        .select("event_id", "user_id", "event_type", "c_mktsegment", "n_name")
        .orderBy("event_id")
    }),

    // ---- §2.5 sorts / limits / top-k / sampling ----------------------------
    "q_topk_segments" -> ((s, dir) =>
      Stats.topKByCount(Tables.customer(s, dir), "c_mktsegment", 3)),
    "q_probe_sample" -> ((s, dir) =>
      Stats.probeSample(Tables.customer(s, dir), "c_custkey", 50)
        .select("c_custkey", "c_name").orderBy("c_custkey")),
    "q_percentiles" -> ((s, dir) =>
      Stats.percentiles(Tables.lineitem(s, dir), "l_extendedprice")),
    "q_percentiles_approx" -> ((s, dir) =>   // sketch vs exact, tolerance-oracled
      Stats.percentilesApproxChecked(Tables.lineitem(s, dir),
        "l_extendedprice")),
    "q_mode_per_key" -> ((s, dir) =>
      Stats.deterministicMode(Tables.events(s, dir), "user_id", "event_type")),
    "q_rolling_features" -> ((s, dir) =>
      Stats.rollingFeatures(
          Tables.events(s, dir).select("event_id", "user_id", "ts", "value"),
          "user_id", "ts", "event_id", "value")
        .orderBy("event_id")),
    "q_rolling_anomalies" -> ((s, dir) =>
      // trailing-window z-score anomalies per user (|z| > 2 on the
      // ROUNDED score, so both engines select identical rows)
      Stats.rollingZScore(
          Tables.events(s, dir).select("event_id", "user_id", "ts", "value"),
          "user_id", "ts", "event_id", "value")
        .filter(abs(col("z")) > 2)
        .select("event_id", "user_id", "value", "roll_avg", "roll_std", "z")
        .orderBy("event_id")),
    "q_iqr_outliers" -> ((s, dir) =>
      Stats.iqrOutliers(Tables.events(s, dir), "event_type", "value")),
    "q_iqr_outliers_approx" -> ((s, dir) =>    // sketch quartiles, tolerance-oracled
      Stats.iqrOutliersApproxChecked(Tables.events(s, dir), "event_type",
        "value")),
    "q_group_percentiles_approx" -> ((s, dir) => // sketch vs exact, tolerance-oracled
      Stats.groupPercentilesApproxChecked(Tables.events(s, dir), "event_type",
        "value")),
    "q_recent_partitions" -> ((s, dir) =>
      Stats.recentPartitions(
        Tables.events(s, dir).withColumn("event_date", to_date(col("ts"))),
        "event_date", 7)),

    // ---- §2.6 data-quality expectations ------------------------------------
    "q_constraint_suggest" -> ((s, dir) =>
      // Deequ-style suggestion: one profile pass emits the expectations
      // the data currently satisfies (bootstrap of the quality loop)
      Quality.suggestConstraints(Tables.events(s, dir),
        numericCols = Seq("event_id", "user_id", "value"),
        enumCandidates = Seq("event_type"))),
    "q_quality_report" -> ((s, dir) =>
      Quality.report(Tables.customer(s, dir), Seq(
        Quality.NotNull("c_name"),
        Quality.NotNull("c_mktsegment"),
        Quality.Between("c_acctbal", -1000.0, 10000.0),
        Quality.Between("c_nationkey", 0.0, 24.0),
        Quality.InSet("c_mktsegment", Seq("AUTOMOBILE", "BUILDING",
          "FURNITURE", "HOUSEHOLD", "MACHINERY"))))),
    "q_profile" -> ((s, dir) =>
      // data-catalog column profile: one aggregation pass, melted report
      Quality.profile(Tables.customer(s, dir),
        Seq("c_custkey", "c_name", "c_mktsegment"))),
    "q_unique_check" -> ((s, dir) =>
      Quality.uniqueReport(Tables.customer(s, dir), "c_custkey")),
    "q_quality_offenders" -> ((s, dir) =>
      Quality.offenders(
          Tables.customer(s, dir).select("c_custkey", "c_name", "c_acctbal"),
          Quality.Between("c_acctbal", 0.0, 9000.0), "c_custkey", 5)),
    "q_dataset_fingerprint" -> ((s, dir) =>
      // order-invariant 64-bit content hash + row count: the "exact same
      // dataset?" stamp for the registry (string-stable columns only —
      // float stringification is engine-specific, so value/ts stay out)
      Quality.datasetFingerprint(Tables.events(s, dir),
        Seq("event_id", "user_id", "event_type", "props"))),
    "q_fk_integrity" -> ((s, dir) =>
      // cross-table FK health: orphans + match rate per declared edge
      Quality.referentialIntegrity(Seq(
        ("lineitem.l_orderkey->orders.o_orderkey",
          Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey"),
        ("orders.o_custkey->customer.c_custkey",
          Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey"),
        ("events.user_id->customer.c_custkey",
          Tables.events(s, dir), "user_id",
          Tables.customer(s, dir), "c_custkey")))),
    "q_snapshot_diff" -> ((s, dir) =>
      // governance diff: which keys the 1997-06-01 → 1998-01-01
      // materialization window added or changed (delta only, never the
      // full store)
      Materialize.snapshotDiff(Tables.orders(s, dir), "o_custkey",
          "o_orderdate", "o_orderkey", "o_totalprice",
          "1997-06-01", "1998-01-01")
        .orderBy("o_custkey")),

    // ---- §2.7 drift detection ----------------------------------------------
    "q_ks_drift" -> ((s, dir) =>
      // large-sample KS: asymptotic p pinned (exactBelow=0) so the series
      // oracle holds at every sf — sf0.001 sides (~200) would otherwise
      // flip into the exact small-n path, which q_ks_exact oracle-checks
      Drift.ksTest(Tables.events(s, dir), "value", "event_type",
        "purchase", "view", exactBelow = 0)),
    "q_ks_exact" -> ((s, dir) => {
      // D1 small-n: scipy-parity EXACT p-value (lattice-path distribution)
      // on a deterministic 30-vs-30 probe; the DuckDB oracle replays the
      // same integer DP in HUGEINT inside a recursive CTE
      val e = Tables.events(s, dir)
      def side(t: String) = e.filter(col("event_type") === t)
        .orderBy("event_id").limit(30).select("event_type", "value")
      Drift.ksTest(side("purchase").unionByName(side("view")),
        "value", "event_type", "purchase", "view")
    }),
    "q_dist_summary" -> ((s, dir) =>
      Drift.distSummary(Tables.events(s, dir), "value", "event_type")),
    "q_drift_sweep" -> ((s, dir) =>
      // binned ECDF default: per-feature windows bounded at ≤1000 rows
      Drift.sweep(
        Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "view"))
          .select(col("event_type"), col("value"),
            get_json_object(col("props"), "$.k").cast("double").as("k")),
        "event_type", "purchase", "view", Seq("k", "value"))),
    "q_drift_fdr" -> ((s, dir) =>
      // BH step-up over the 4-feature lineitem sweep (A vs N return
      // flags): per-feature asymptotic KS p, ranked, adjusted, gated at
      // FDR 0.05 — the alarm-rate control a wide sweep needs
      Drift.sweepFdr(
        Drift.sweep(
          Tables.lineitem(s, dir)
            .filter(col("l_returnflag").isin("A", "N"))
            .select(col("l_returnflag"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "l_returnflag", "A", "N",
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
        alpha = 0.05)),
    "q_drift_sweep_exact" -> ((s, dir) =>
      // small-domain opt-in: per-distinct-value ECDF
      Drift.sweepExact(
        Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "view"))
          .select(col("event_type"), col("value"),
            get_json_object(col("props"), "$.k").cast("double").as("k")),
        "event_type", "purchase", "view", Seq("k", "value"))),

    "q_ks_binned" -> ((s, dir) =>
      Drift.ksTestBinned(Tables.events(s, dir), "value", "event_type",
        "purchase", "view", bins = 1000)),
    "q_wasserstein" -> ((s, dir) =>
      // the AREA between the ECDFs over the same binning KS takes the
      // MAX of — catches wide-but-shallow drift KS underweights
      Drift.wasserstein1Binned(Tables.events(s, dir), "value",
        "event_type", "purchase", "view", bins = 1000)),
    "q_group_percentiles" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5D)"), 6).as("p50"),
          round(expr("percentile(value, 0.9D)"), 6).as("p90"),
          round(expr("percentile(value, 0.99D)"), 6).as("p99"))
        .orderBy("event_type")),
    "q_psi_drift" -> ((s, dir) =>
      Drift.psi(Tables.events(s, dir), "value", "event_type",
        "view", "purchase")),
    "q_chi2_drift" -> ((s, dir) =>
      Drift.chiSquare(
        Tables.events(s, dir)
          .withColumn("vbin", Parse.magnitudeBin(col("value") / 1000.0)),
        "vbin", "event_type", "view", "purchase")),
    "q_time_since_target" -> ((s, dir) =>
      // recency feature: seconds since the user's last purchase, NULL for
      // never-purchased — the backward mirror of q_future_labels
      Retrieval.timeSinceTarget(
          Tables.events(s, dir).select(col("event_id"), col("user_id"),
            col("ts"), col("event_type")),
          "user_id", "ts", "event_id", col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("last_target_ts"),
          col("secs_since_target"))
        .orderBy("event_id")),
    "q_transition_matrix" -> ((s, dir) =>
      // behavioral flow: P(next event type | current) per user sequence
      Retrieval.transitionMatrix(
        Tables.events(s, dir).select(col("event_id"), col("user_id"),
          col("ts"), col("event_type")),
        "user_id", "ts", "event_id", "event_type")),
    "q_markov_steady" -> ((s, dir) =>
      // where the behavioral flow settles: stationary distribution of
      // the event-type chain (30 unrolled power steps on the bounded
      // transition table, oracle-replayed step for step)
      Retrieval.markovSteadyState(
        Tables.events(s, dir).select(col("event_id"), col("user_id"),
          col("ts"), col("event_type")),
        "user_id", "ts", "event_id", "event_type", iterations = 30,
        expectedStates = Seq("click", "error", "purchase", "signup", "view"))),
    "q_steps_to_convert" -> ((s, dir) =>
      // expected transitions until the first purchase from each state —
      // the step-count companion to time_to_convert's wall-clock view
      Retrieval.markovHittingSteps(
        Tables.events(s, dir).select(col("event_id"), col("user_id"),
          col("ts"), col("event_type")),
        "user_id", "ts", "event_id", "event_type", target = "purchase",
        iterations = 60, expectedStates = Seq("click", "error", "purchase", "signup", "view"))),
    "q_convert_before_error" -> ((s, dir) =>
      // competing risks on the behavioral chain: P(purchase before
      // error) from every state — outcome odds next to the step counts
      Retrieval.markovAbsorbProb(
        Tables.events(s, dir).select(col("event_id"), col("user_id"),
          col("ts"), col("event_type")),
        "user_id", "ts", "event_id", "event_type",
        win = "purchase", lose = "error", iterations = 60,
        expectedStates = Seq("click", "error", "purchase", "signup", "view"))),
    "q_future_labels" -> ((s, dir) =>
      // forward-window conversion labels: did the user purchase within
      // 24h after each event? — one per-key window, no self-join
      Retrieval.futureLabels(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts"),
              col("event_type")),
          "user_id", "ts", "event_id",
          col("event_type") === "purchase", "24 HOURS")
        .select(col("event_id"), col("user_id"), col("next_target_ts"),
          col("label"))
        .orderBy("event_id")),
    "q_nearest_join" -> ((s, dir) =>
      // bidirectional as-of: for each purchase, the same user's view
      // nearest in time (either direction, tie → earlier) — merged
      // per-key stream, one window pass, no self-join
      Retrieval.nearestJoin(
          Tables.events(s, dir)
            .filter(col("event_type").isin("purchase", "view"))
            .select(col("event_id"), col("user_id"), col("ts"),
              col("event_type")),
          "user_id", "ts", "event_id",
          col("event_type") === "purchase", col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("prev_ref_ts"),
          col("next_ref_ts"), col("nearest_ref_ts"), col("gap_secs"))
        .orderBy("event_id")),
    "q_scd2" -> ((s, dir) =>
      // SCD type-2 dimension: per-user event_type validity intervals —
      // run-length collapse via one per-key window + run groupBy
      Materialize.scd2(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts"),
              col("event_type")),
          "user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"), col("last_ts"), col("n_rows"), col("is_current"))
        .orderBy("user_id", "valid_from")),
    "q_scd2_incremental" -> ((s, dir) => {
      // split-history fold: SCD2 of the first half folded with the
      // second half's batch must equal SCD2 of full history (the
      // q_incremental_snapshot convention — the oracle replays the
      // full-history SQL)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"))
      val cut = lit("2024-01-16").cast("timestamp_ntz")
      val existing = Materialize.scd2(ev.filter(col("ts") < cut),
        "user_id", "ts", "event_id", "event_type")
      Materialize.scd2Incremental(existing, ev.filter(col("ts") >= cut),
          "user_id", "ts", "event_id", "event_type")
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"), col("last_ts"), col("n_rows"), col("is_current"))
        .orderBy("user_id", "valid_from")
    }),
    "q_ab_power" -> ((s, dir) =>
      // experiment sizing audit: required n per arm for the observed
      // lift at alpha=.05/power=.80, MDE at current size, powered?
      Eval.abPower(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("value")),
        "user_id",
        col("event_type") === "purchase" && col("value") > 95.0)),
    "q_autocorr" -> ((s, dir) =>
      // seasonality diagnostic: lag-1..14 autocorrelation of the daily
      // order-revenue series — one bucket agg + one bounded window pass
      Stats.autocorr(
        Tables.orders(s, dir), to_date(col("o_orderdate")),
        "o_totalprice", maxLag = 14)),
    "q_cusum_drift" -> ((s, dir) =>
      // two-sided CUSUM over the daily-mean series: baseline = first 7
      // in-control days, slack 0.5σ₀, alarm at 3σ₀ — the sequential
      // recursion distributed via the prefix-minus-running-min identity
      Drift.cusum(
        Tables.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(avg(col("value")).as("daily_avg")),
        "day", "daily_avg", baselineRows = 7)),
    "q_temporal_split" -> ((s, dir) =>
      // purged time-series split: 3-day embargo after the cutoff is
      // quarantined so trailing-window features cannot leak into test
      Sampling.temporalSplit(
          Tables.events(s, dir).select(col("event_id"), col("ts")),
          "ts", "2024-01-15 00:00:00", embargoDays = 3)
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
        .orderBy("split")),
    "q_interval_join" -> ((s, dir) => {
      // campaign attribution: 5 weekly 10-day campaigns per event type
      // OVERLAP, so events match 1-2 concurrent campaigns — the
      // many-to-many interval join as-of can't express; binned to the
      // daily equi-join path, never a nested loop
      val campaigns = Tables.events(s, dir).select("event_type").distinct()
        .crossJoin(s.range(5).select(col("id").cast("int").as("w")))
        .select(col("event_type"),
          concat(col("event_type"), lit("_w"), col("w").cast("string"))
            .as("campaign_id"),
          date_add(lit("2024-01-01").cast("date"), col("w") * 7)
            .cast("timestamp_ntz").as("cstart"),
          date_add(lit("2024-01-01").cast("date"), col("w") * 7 + lit(10))
            .cast("timestamp_ntz").as("cend"))
      Retrieval.intervalJoin(
          Tables.events(s, dir).select(col("event_id"), col("user_id"),
            col("event_type"), col("ts")),
          campaigns, Seq("event_type"), "ts", "cstart", "cend")
        .select(col("event_id"), col("campaign_id"))
        .orderBy("event_id", "campaign_id")
    }),
    "q_group_kfold" -> ((s, dir) =>
      // entity-leakage-safe CV folds: all of a user's events share a fold
      Sampling.groupKFold(
          Tables.events(s, dir).select(col("event_id"), col("user_id")),
          "user_id", k = 5)
        .orderBy("event_id")),
    "q_negative_downsample" -> ((s, dir) =>
      // CTR-style class rebalance: keep all purchases, 25% of the rest,
      // 1/rate importance weight on survivors
      Sampling.negativeDownsample(
          Tables.events(s, dir).select(col("event_id"), col("event_type")),
          "event_id", col("event_type") === "purchase", rate = 0.25)
        .select(col("event_id"), col("label"), col("weight"))
        .orderBy("event_id")),
    "q_quality_windows" -> ((s, dir) =>
      Quality.windowedReport(
        Tables.events(s, dir).withColumn("ts", col("ts").cast("timestamp_ntz")),
        "ts", Seq(
          Quality.NotNull("user_id"),
          Quality.Between("value", 0.0, 400.0),
          Quality.InSet("event_type", Seq("click", "view", "purchase",
            "signup", "error"))))),

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
      val seeds = emb.filter(col("vec_id") < 8).orderBy("vec_id")
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
      val root = graft.sources.Sources.annIndexWrite(
        emb, "vec_id", "embedding", seeds)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id"), col("embedding"),
          graft.functions.Native.nearest_centroid(
            col("embedding").cast("array<double>"), seeds).as("cell"))
      val probeCells = queries.select("cell").distinct()
        .collect().map(_.getInt(0))
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
      Gen.events(Tables.customer(s, dir).select("c_custkey"), "c_custkey", 3)),
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

    // ---- §7.4 sampling / deterministic splits ------------------------------
    "q_split_assign" -> ((s, dir) =>
      Sampling.splitAssign(Tables.customer(s, dir).select("c_custkey"),
          "c_custkey", Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0))
        .orderBy("c_custkey")),
    "q_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(
          Tables.events(s, dir).select("event_id", "event_type"),
          "event_type", "event_id", 0.1)
        .orderBy("event_id")),
    "q_quota_cap" -> ((s, dir) =>
      Sampling.quotaCap(
          Tables.events(s, dir).select("event_id", "user_id", "ts"),
          "user_id", Seq(col("ts").desc, col("event_id").desc), 3)
        .orderBy("event_id")),
    "q_quota_cap_hashed" -> ((s, dir) =>
      // skew-proof per-domain cap: hash-priority selection, no group sort
      Sampling.quotaCapHashed(
          Tables.events(s, dir).select("event_id", "user_id"),
          "user_id", "event_id", 3)
        .orderBy("event_id")),
    "q_quota_cap_scalable" -> ((s, dir) =>
      // q_quota_cap's exact semantics (3 newest per user, ts/event_id
      // desc) through the priority-histogram selection — same oracle,
      // no per-user sort task
      Sampling.quotaCapByPriority(
          Tables.events(s, dir).select("event_id", "user_id", "ts"),
          "user_id",
          priority = -unix_micros(col("ts").cast("timestamp")),
          tiebreak = -col("event_id"), n = 3)
        .orderBy("event_id")),
    "q_uniform_sample" -> ((s, dir) =>
      Sampling.uniformSample(
          Tables.customer(s, dir).select("c_custkey", "c_name"),
          "c_custkey", 100)
        .orderBy("c_custkey")),
    "q_uniform_sample_scalable" -> ((s, dir) =>
      // same 100 rows, selected without the TakeOrdered driver merge
      Sampling.uniformSampleScalable(
          Tables.customer(s, dir).select("c_custkey", "c_name"),
          "c_custkey", 100)
        .orderBy("c_custkey")),
    "q_mixture_sample" -> ((s, dir) =>
      Sampling.mixtureSample(
          Tables.documents(s, dir).select("doc_id", "lang"),
          "lang", "doc_id",
          Seq("en" -> 0.6, "de" -> 0.2, "fr" -> 0.2), totalN = 200)
        .orderBy("doc_id")),
    "x_temperature_mixture" -> ((s, dir) =>
      // α=0.5 temperature rebalancing: per-language quotas ∝ √nᵢ,
      // derived from the corpus itself — no target list
      Sampling.temperatureMixture(
          Tables.documents(s, dir).select("doc_id", "lang"),
          "lang", "doc_id", alpha = 0.5, totalN = 300)
        .orderBy("doc_id")),
    "x_temperature_report" -> ((s, dir) =>
      // the audit twin: count, √-weight, derived quota, draw, shortfall
      Sampling.temperatureMixtureReport(
        Tables.documents(s, dir), "lang", alpha = 0.5, totalN = 300)),
    "x_embedding_drift" -> ((s, dir) =>
      // encoder/corpus drift in embedding space: per-dimension centroid
      // shift between the even/odd vec_id slices + global cosine/L2
      Similarity.embeddingDrift(
        Tables.embeddings(s, dir), "embedding", col("vec_id") % 2 === 0)),
    "x_budget_sample" -> ((s, dir) =>
      // data-recipe mixing in COST units (chars here, tokens in prod):
      // per-language hash-ordered prefix within a declared char budget;
      // es/fr carry no budget and are dropped entirely
      Sampling.budgetSample(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "doc_id", "n_chars",
          Map("en" -> 20000L, "de" -> 8000L, "zh" -> 10000L))
        .select(col("lang"), col("doc_id"), col("n_chars"), col("cum_cost"))
        .orderBy("lang", "cum_cost", "doc_id")),
    "q_pack_sequences" -> ((s, dir) =>
      Sampling.packSequences(
          Tables.documents(s, dir)
            .select(col("lang"), col("doc_id"),
              size(split(trim(col("text")), "\\s+")).as("n_tokens")),
          "lang", "doc_id", "n_tokens", maxTokens = 2048)
        .orderBy("lang", "doc_id")),
    "q_pack_report" -> ((s, dir) =>
      // padding-waste audit over the packing output
      Sampling.packReport(
        Sampling.packSequences(
          Tables.documents(s, dir)
            .select(col("lang"), col("doc_id"),
              size(split(trim(col("text")), "\\s+")).as("n_tokens")),
          "lang", "doc_id", "n_tokens", maxTokens = 2048),
        "lang", "n_tokens", maxTokens = 2048)),
    "q_mixture_report" -> ((s, dir) =>
      // shortfall audit the mixture draw publishes beside its sample
      Sampling.mixtureReport(
        Tables.documents(s, dir).select("doc_id", "lang"), "lang",
        // "xx" has no corpus supply: its whole quota surfaces as shortfall
        Seq("en" -> 0.5, "de" -> 0.2, "fr" -> 0.2, "xx" -> 0.1),
        totalN = 2000)),

    // ---- §7.4 dedup --------------------------------------------------------
    "x_dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.documents(s, dir), "doc_id", "text")),
    "x_dedup_stats" -> ((s, dir) =>
      Dedup.stats(Tables.documents(s, dir), "text")),
    "x_dedup_incremental" -> ((s, dir) => {
      // ingest-shaped dedup: new batch vs the already-seen corpus
      val d = Tables.documents(s, dir)
      Dedup.exactIncremental(d.filter(col("doc_id") < 250),
        d.filter(col("doc_id") >= 250), "doc_id", "text")
    }),
    "x_dedup_incremental_lsh" -> ((s, dir) => {
      // ingest-shaped NEAR-dup check: the new batch probes the accumulated
      // MinHash signature table — corpus text is never re-read (rows-only:
      // xxhash64-based signatures; DedupSpec proves batch-vs-full-corpus
      // equivalence of the surviving id set)
      val d = Tables.documents(s, dir)
      val seenSigs = Dedup.minHashSignatures(
        d.filter(col("doc_id") < 250), "doc_id", "text", 3, 16)
      Dedup.minHashNearDupsIncremental(seenSigs,
        d.filter(col("doc_id") >= 250), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5)
    }),
    "x_incremental_verified" -> ((s, dir) => {
      // the INCREMENTAL rule, oracle-checkable: batch (doc_id >= 250)
      // probes the accumulated signature + shingle stores in the
      // provably-complete rows-per-band = 1 config with exact-Jaccard
      // verification, so the surviving set is exactly "smallest partner
      // with jaccard >= 0.5" — DuckDB replays it as a plain pair scan
      // restricted to batch-id larger sides. This turns the incremental
      // equivalence that previously lived only in DedupSpec into a
      // hash-green registry row.
      val d = Tables.documents(s, dir)
      val seen = d.filter(col("doc_id") < 250)
      Dedup.nearDupsVerifiedIncremental(
        Dedup.minHashSignatures(seen, "doc_id", "text", 3, 64),
        Dedup.shingleRelation(seen, "doc_id", "text", 3),
        d.filter(col("doc_id") >= 250), "doc_id", "text",
        n = 3, numHashes = 64, bands = 64, threshold = 0.5,
        minEst = 0.125)
        .withColumnRenamed("id", "doc_id")
    }),
    "x_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(
        Tables.documents(s, dir).filter(col("doc_id") < 60),
        "doc_id", "text", 3, 0.02, maxDf = 30)),
    "x_golden_record" -> ((s, dir) => {
      // survivorship after entity resolution: most-frequent name (ties
      // to smallest), max balance, per matched cluster; variants carry a
      // cent-drifted balance so the max rule visibly elects
      val c = Tables.customer(s, dir).filter(col("c_custkey") < 200)
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"), col("c_nationkey").as("nationkey"))
      val variants = c.select((col("id") + 100000).as("id"),
        concat(
          substring(col("name"), lit(1), length(col("name")) - 2),
          substring(col("name"), length(col("name")), lit(1)),
          substring(col("name"), length(col("name")) - 1, lit(1)))
          .as("name"),
        (col("acctbal") + 0.005).as("acctbal"), col("nationkey"))
      val u = c.unionByName(variants)
      val pairs = Dedup.fuzzyPairsKeyed(u, "id", "name",
        maxDistance = 2, blockKey = { s =>
          val t = lower(trim(s))
          val n = length(t)
          val c1 = substring(t, n - 1, lit(1))
          val c2 = substring(t, n, lit(1))
          concat(substring(t, lit(1), n - 2), least(c1, c2),
            greatest(c1, c2))
        }).select("id_a", "id_b")
      Dedup.goldenRecord(u, "id", pairs,
        freqElect = Seq("name", "nationkey"), maxElect = Seq("acctbal"))
    }),
    "x_containment_pairs" -> ((s, dir) =>
      // asymmetric near-dup: |∩|/min(|A|,|B|) catches a short doc quoted
      // wholesale inside a long one, which symmetric Jaccard scores ~0
      Dedup.containmentPairs(
        Tables.documents(s, dir).filter(col("doc_id") < 60),
        "doc_id", "text", 3, 0.05, maxDf = 30)),
    "x_entity_resolution" -> ((s, dir) => {
      // blocked fuzzy match: customers vs deterministically typo'd variants
      // (last two name chars swapped -> edit distance 2). The blocking key
      // is TRANSPOSITION-CANONICAL — string with its last two chars sorted
      // — so it is invariant under the injected typo yet one-entity
      // selective (max block 4, vs the corpus-wide block a "Customer#..."
      // prefix key degenerates to; DedupSpec asserts the bound)
      val c = Tables.customer(s, dir).filter(col("c_custkey") < 200)
        .select(col("c_custkey").as("id"), col("c_name").as("name"))
      val variants = c.select((col("id") + 100000).as("id"),
        concat(
          substring(col("name"), lit(1), length(col("name")) - 2),
          substring(col("name"), length(col("name")), lit(1)),
          substring(col("name"), length(col("name")) - 1, lit(1))).as("name"))
      Dedup.fuzzyPairsKeyed(c.unionByName(variants), "id", "name",
        maxDistance = 2, blockKey = { s =>
          val t = lower(trim(s))
          val n = length(t)
          val c1 = substring(t, n - 1, lit(1))
          val c2 = substring(t, n, lit(1))
          concat(substring(t, lit(1), n - 2), least(c1, c2), greatest(c1, c2))
        })
    }),
    "x_cluster_split" -> ((s, dir) =>
      // leakage-free split: hash the near-dup CLUSTER id so a document
      // and its near-copies can never straddle train/test
      Sampling.clusterAwareSplit(
        Tables.documents(s, dir), "doc_id",
        Dedup.jaccardPairs(
          Tables.documents(s, dir).filter(col("doc_id") < 60),
          "doc_id", "text", 3, 0.02, maxDf = 30).select("id_a", "id_b"),
        Seq(("train", 0.8), ("val", 0.9), ("test", 1.0)))),
    "x_dedup_clusters" -> ((s, dir) =>
      Dedup.dedupClusters(
        Dedup.jaccardPairs(Tables.documents(s, dir).filter(col("doc_id") < 60),
          "doc_id", "text", 3, 0.02, maxDf = 30).select("id_a", "id_b"))),
    "x_dedup_clusters_star" -> ((s, dir) =>
      // same pair list through the O(log n)-round large-star/small-star CC
      Dedup.connectedComponentsStar(
          Dedup.jaccardPairs(Tables.documents(s, dir).filter(col("doc_id") < 60),
            "doc_id", "text", 3, 0.02, maxDf = 30).select("id_a", "id_b"),
          "id_a", "id_b")
        .withColumn("is_canonical", col("id") === col("component"))
        .orderBy("id")),
    "x_dedup_clusters_full" -> ((s, dir) =>
      // FULL-corpus near-dup clustering — no probe-subset cap: exact
      // shingle-Jaccard pairs over every document (threshold 0.5 bounds
      // the pair list to true near-dups; maxDf 50 bounds hot shingle
      // buckets), resolved to components. The DuckDB oracle replays the
      // same pair derivation and a recursive-CTE transitive closure over
      // the whole table.
      Dedup.dedupClusters(
        Dedup.jaccardPairs(Tables.documents(s, dir),
          "doc_id", "text", 3, 0.5, maxDf = 50).select("id_a", "id_b"))),
    "x_dedup_retain" -> ((s, dir) => {
      // retention over the FULL corpus: near-dup clusters from the probe
      // subset keep their longest member; every other doc is a singleton
      val d = Tables.documents(s, dir)
      Dedup.dedupRetain(d, "doc_id", col("n_chars"),
        Dedup.jaccardPairs(d.filter(col("doc_id") < 60),
          "doc_id", "text", 3, 0.02, maxDf = 30).select("id_a", "id_b"))
    }),
    "x_dedup_weights" -> ((s, dir) => {
      // unbiased dedup: survivors weighted by cluster size so corpus
      // statistics keep their totals (sum of weights = corpus size)
      val d = Tables.documents(s, dir)
      Dedup.dedupRetainWeighted(d, "doc_id", col("n_chars"),
        Dedup.jaccardPairs(d.filter(col("doc_id") < 60),
          "doc_id", "text", 3, 0.02, maxDf = 30).select("id_a", "id_b"))
    }),
    "x_contamination" -> ((s, dir) => {
      // decontamination: per-test-doc 3-gram overlap with the train split
      val d = Tables.documents(s, dir)
      Dedup.contamination(d.filter(col("doc_id") < 250),
        d.filter(col("doc_id") >= 250), "doc_id", "text", n = 3)
    }),
    "x_multimodal_neardups" -> ((s, dir) => {
      // cross-modal dedup: TEXT near-dup pairs (shingle Jaccard) and
      // EMBEDDING near-dup pairs (cell-bucketed cosine) union into ONE
      // cluster resolution — a pair is a pair, whichever modality found
      // it; the oracle replays both pair generators + transitive closure
      val d = Tables.documents(s, dir).filter(col("doc_id") < 60)
      val textPairs = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.02,
        maxDf = 30).select("id_a", "id_b")
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 60)
      val vecPairs = Similarity.cosineNearDups(emb, "vec_id", "embedding",
        "label", 0.4).select("id_a", "id_b")
      Dedup.dedupClusters(textPairs.unionByName(vecPairs))
    }),
    "x_minhash_neardups" -> ((s, dir) =>   // xxhash64-based; rows-only
      Dedup.minHashNearDups(Tables.documents(s, dir), "doc_id", "text")),
    "x_neardups_verified" -> ((s, dir) =>
      // LSH propose + estimate trim + exact verify, in the
      // PROVABLY-COMPLETE banding config (rows-per-band = 1): a pair
      // reaches candidacy unless NONE of its 64 MinHash components
      // collide ((1-j)^64 ≤ 5e-20 at j ≥ 0.5), and the minEst=0.125 trim
      // drops a true pair only if < 8/64 components agree (≈ 2e-10 at
      // j = 0.5) — so the output is exactly "all pairs with exact Jaccard
      // ≥ 0.5" and DuckDB replays it as a full shingle-Jaccard pair scan
      // (the recall oracle for the whole LSH pipeline)
      Dedup.nearDupsVerified(Tables.documents(s, dir), "doc_id", "text",
        n = 3, numHashes = 64, bands = 64, threshold = 0.5,
        minEst = 0.125)),
    "x_simhash" -> ((s, dir) =>            // xxhash64-based; rows-only
      Dedup.simHash(Tables.documents(s, dir).filter(col("doc_id") < 50),
        "doc_id", "text")),
    "x_simhash_neardups" -> ((s, dir) =>   // xxhash64-based; rows-only
      // maxHamming < bands(4) keeps the pigeonhole recall guarantee: this
      // is exactly "all pairs within hamming 3", not a banding-luck subset
      Dedup.simHashNearDups(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 3)),
    "x_simhash_recall" -> ((s, dir) => {
      // recall ORACLE for the SimHash band search: every doc gets an
      // identical-text twin (doc_id + 1000000); identical text → identical
      // 64-bit fingerprint → hamming 0 < bands, so by the pigeonhole
      // guarantee every (id, twin) pair is a MUST-FIND. Restricted to the
      // injected pairs the output is fully deterministic — one row per doc
      // with hamming 0 — which DuckDB replays trivially; any fingerprint /
      // banding / verify-join defect drops a row and mismatches.
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val twins = d.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.simHashNearDups(d.unionByName(twins), "doc_id", "text",
          maxHamming = 3, bands = 4)
        .filter(col("id_b") === col("id_a") + 1000000L)
        .orderBy("id_a")
    }),

    "x_heavy_hitters" -> ((s, dir) =>
      // Misra-Gries propose + exact verify: ≡ GROUP BY + HAVING without
      // shuffling the key space (the hot-domain / hot-URL detector)
      Frequency.heavyHitters(Tables.events(s, dir), "event_type",
        minShare = 0.1)),

    // ---- §7.4 text analysis ------------------------------------------------
    "x_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(Tables.documents(s, dir), "doc_id", "text")),
    "x_quality_scores" -> ((s, dir) =>
      TextAnalysis.qualityScores(Tables.documents(s, dir), "doc_id", "text")),
    "x_quality_filter" -> ((s, dir) =>
      // the C4/Gopher rule battery with per-rule audit columns — rounded
      // signals, engine-independent verdicts, one narrow projection
      TextAnalysis.qualityFilter(Tables.documents(s, dir), "doc_id",
        "text")),
    "x_lang_stats" -> ((s, dir) =>
      TextAnalysis.langStats(Tables.documents(s, dir), "lang", "text")),
    "x_lang_id" -> ((s, dir) =>
      TextAnalysis.languageId(Tables.documents(s, dir), "doc_id", "text")),
    "x_fingerprints" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir), "doc_id", "text")),
    "x_char_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(Tables.documents(s, dir), "doc_id", "text")),
    "x_repetition" -> ((s, dir) =>
      // Gopher-rule repetition filter: duplicate n-gram ratios per doc
      TextAnalysis.repetitionScores(Tables.documents(s, dir), "doc_id",
        "text")),
    "x_tfidf_terms" -> ((s, dir) =>
      // salient-term extraction: smooth-idf TF-IDF, top-3 per document
      TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text",
        k = 3)),
    "x_lm_surprisal" -> ((s, dir) =>
      // CCNet-style unigram-LM surprisal; 100-term vocab so the OOV
      // floor path carries real weight
      TextAnalysis.lmSurprisal(Tables.documents(s, dir), "doc_id", "text",
        vocabSize = 100)),
    "x_shared_spans" -> ((s, dir) =>
      // winnowing dup-span detection (MOSS): any shared 47-char run
      // (k+w−1) is guaranteed a shared fingerprint; df∈[2,5] drops
      // corpus-wide boilerplate grams
      TextAnalysis.sharedSpans(Tables.documents(s, dir), "doc_id", "text",
        k = 32, w = 16, maxDf = 5)),
    "x_contamination_spans" -> ((s, dir) => {
      // benchmark-contamination detection at SPAN level (stronger than
      // x_contamination's shingle overlap): training docs sharing a
      // winnow-fingerprinted 32-gram with any held-out benchmark doc
      // (doc_id % 10 == 0), with the matched-span evidence
      val spans = TextAnalysis.sharedSpans(Tables.documents(s, dir),
        "doc_id", "text", k = 32, w = 16, maxDf = 5)
      val hits = spans
        .filter((col("doc_a") % 10 === 0) =!= (col("doc_b") % 10 === 0))
        .select(
          when(col("doc_a") % 10 === 0, col("doc_b"))
            .otherwise(col("doc_a")).as("train_doc"),
          when(col("doc_a") % 10 === 0, col("doc_a"))
            .otherwise(col("doc_b")).as("bench_doc"),
          col("n_shared"))
      hits.groupBy("train_doc")
        .agg(count(lit(1)).cast("long").as("n_bench_docs"),
          sum("n_shared").cast("long").as("n_shared_grams"),
          min("bench_doc").as("first_bench_doc"))
        .orderBy("train_doc")
    }),
    "x_langid_kappa" -> ((s, dir) => {
      // classifier-vs-gold label quality: Cohen's kappa of the n-gram
      // language-ID heuristic against the corpus lang column — the
      // chance-corrected agreement plain accuracy overstates
      val docs = Tables.documents(s, dir)
      val pred = TextAnalysis.languageId(docs, "doc_id", "text")
        .select(col("doc_id"), col("predicted_lang"))
      Eval.cohensKappa(
        pred.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")),
        "predicted_lang", "lang")
    }),
    "x_vocab_drift" -> ((s, dir) =>
      // corpus drift at the token level: smoothed JS divergence between
      // slices over an integer-elected top-50 vocabulary + <other>
      TextAnalysis.vocabDrift(Tables.documents(s, dir), "text", "lang",
        "en", "de", topV = 50)),
    "x_langid_prf" -> ((s, dir) => {
      // the class-level complement of the kappa number: per-language
      // precision/recall/F1 — shows WHICH language the heuristic misses
      val docs = Tables.documents(s, dir)
      val pred = TextAnalysis.languageId(docs, "doc_id", "text")
        .select(col("doc_id"), col("predicted_lang"))
      Eval.classificationReport(
        pred.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")),
        goldCol = "lang", predCol = "predicted_lang")
    }),
    "x_unigram_tokens" -> ((s, dir) =>
      // the second tokenizer family: hard-EM (Viterbi) unigram-LM pieces
      // (Kudo 2018), trained once per corpus; per-doc token stats under
      // the trained table. Rows-only (the Viterbi DP is not SQL-
      // expressible); anchored by x_unigram_chars' oracle-exact
      // degenerate config + UnigramSpec trainer/segmentation equivalences
      Unigram.tokenStats(Tables.documents(s, dir), "doc_id", "text",
        unigramTable(s, dir), maxPieceLen = 4)),
    "x_unigram_chars" -> ((s, dir) =>
      // the provably-replayable anchor: maxPieceLen = 1 forces every
      // segmentation to single characters, so token counts equal
      // non-whitespace character counts — which SQL computes directly
      Unigram.tokenStats(Tables.documents(s, dir), "doc_id", "text",
        Unigram.trainDistributed(Tables.documents(s, dir), "text",
          vocabSize = 200, rounds = 1, maxPieceLen = 1),
        maxPieceLen = 1)),
    "x_bpe_vocab_usage" -> ((s, dir) => {
      // vocabulary utilization: per-token usage over the encoded corpus
      // with cumulative coverage — the dead-weight-vocab audit (pieces
      // the budget paid for that the corpus never uses); vocab-bounded
      val toks = Tables.documents(s, dir)
        .select(explode(graft.ops.Bpe.encode(col("text"),
          bpeMerges(s, dir))).as("token"))
      val counts = toks.groupBy("token")
        .agg(count(lit(1)).cast("long").as("cnt"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      val ord = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("token"))
      counts
        .withColumn("__tot", sum(col("cnt")).over(w))
        .withColumn("share", round(col("cnt") / col("__tot"), 6))
        .withColumn("cum_share",
          round(sum(col("cnt")).over(ord.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            / col("__tot"), 6))
        .withColumn("rank", row_number().over(ord).cast("long"))
        .select(col("rank"), col("token"), col("cnt"), col("share"),
          col("cum_share"))
        .orderBy("rank")
    }),
    "x_unigram_fertility" -> ((s, dir) => {
      // tokenizer-fairness twin of x_bpe_fertility under the unigram
      // vocabulary (rows-only like x_unigram_tokens; same anchor)
      val docs = Tables.documents(s, dir)
      val stats = Unigram.tokenStats(docs, "doc_id", "text",
        unigramTable(s, dir), maxPieceLen = 4)
      docs.select(col("doc_id"), col("lang"))
        .join(stats, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_words")).cast("long").as("total_words"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          round(sum(col("n_tokens")).cast("double") /
            sum(col("n_words")), 6).as("fertility"))
        .orderBy("lang")
    }),
    "x_bpe_fertility" -> ((s, dir) => {
      // tokenizer fairness: per-language fertility under the trained
      // merges — the multilingual-equity readout (a vocab fitted on one
      // language taxes the others with more tokens per word)
      val docs = Tables.documents(s, dir)
      Bpe.tokenStats(docs, "doc_id", "text", bpeMerges(s, dir))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_words").cast("long").as("total_words"),
          sum("n_tokens").cast("long").as("total_tokens"),
          round(sum("n_tokens").cast("double") / sum("n_words"), 6)
            .as("fertility"))
        .orderBy("lang")
    }),
    "x_lm_perplexity" -> ((s, dir) =>
      // the full CCNet recipe (x_lm_surprisal is the unigram degenerate):
      // interpolated bigram LM fitted on the English reference slice,
      // per-token cross-entropy scored over EVERY document
      TextAnalysis.bigramPerplexity(Tables.documents(s, dir), "doc_id",
        "text", col("lang") === "en", vocabSize = 100)),
    "x_curriculum" -> ((s, dir) => {
      // curriculum staging: perplexity quartiles → clean→noisy training
      // stages with per-stage token budgets (cuts are a broadcast 1-row
      // aggregate; stage election compares ROUNDED values both engines
      // share)
      val scored = TextAnalysis.bigramPerplexity(Tables.documents(s, dir),
        "doc_id", "text", col("lang") === "en", vocabSize = 100)
      val cuts = scored.agg(
        round(expr("percentile(ce_bits, 0.25D)"), 6).as("q1"),
        round(expr("percentile(ce_bits, 0.5D)"), 6).as("q2"),
        round(expr("percentile(ce_bits, 0.75D)"), 6).as("q3"))
      scored.crossJoin(broadcast(cuts))
        .withColumn("stage",
          when(col("ce_bits") <= col("q1"), 0)
            .when(col("ce_bits") <= col("q2"), 1)
            .when(col("ce_bits") <= col("q3"), 2).otherwise(3))
        .groupBy("stage")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_tokens").cast("long").as("total_tokens"),
          round(avg("ce_bits"), 6).as("avg_ce_bits"),
          round(min("ce_bits"), 6).as("min_ce_bits"),
          round(max("ce_bits"), 6).as("max_ce_bits"))
        .orderBy("stage")
    }),
    "x_llm_pipeline_v3" -> ((s, dir) => {
      // round-7 curation capstone — every stage individually
      // oracle-verified, chained end to end: bigram-perplexity filter
      // (≤ p75) → winnow span dedup (keep first occurrence, drop the
      // later doc of every fingerprinted pair) → pack survivors by REAL
      // BPE token cost → per-pack manifest
      val docs = Tables.documents(s, dir)
      val scored = TextAnalysis.bigramPerplexity(docs, "doc_id", "text",
        col("lang") === "en", vocabSize = 100)
      val q3 = scored.agg(
        round(expr("percentile(ce_bits, 0.75D)"), 6).as("q3"))
      val kept = scored.crossJoin(broadcast(q3))
        .filter(col("ce_bits") <= col("q3")).select("doc_id")
      val drops = TextAnalysis.sharedSpans(docs, "doc_id", "text",
          k = 32, w = 16, maxDf = 5)
        .select(col("doc_b").as("doc_id")).distinct()
      val surv = kept.join(drops, Seq("doc_id"), "left_anti")
      val counts = Bpe.tokenStats(docs, "doc_id", "text", bpeMerges(s, dir))
        .join(surv, Seq("doc_id"), "left_semi")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("lang"), col("doc_id"), col("n_tokens"))
      Sampling.packSequences(counts, "lang", "doc_id", "n_tokens",
          maxTokens = 4096)
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_tokens").cast("long").as("pack_tokens"))
        .orderBy("lang", "pack_id")
    }),
    "x_pack_bpe" -> ((s, dir) => {
      // context-window packing by REAL tokenizer cost (the whitespace
      // counts q_pack_sequences uses under-fill windows by the fertility
      // factor ~4×): same prefix-sum rule, BPE token costs
      val docs = Tables.documents(s, dir)
      val counts = Bpe.tokenStats(docs, "doc_id", "text", bpeMerges(s, dir))
        .select(col("doc_id"), col("n_tokens"))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("lang"), col("doc_id"), col("n_tokens"))
      Sampling.packSequences(counts, "lang", "doc_id", "n_tokens",
          maxTokens = 4096)
        .orderBy("lang", "doc_id")
    }),
    "x_dsir_sample" -> ((s, dir) => {
      // DSIR: weight every doc by the hashed-unigram LM ratio toward the
      // English target slice, then Gumbel-top-k importance resampling —
      // priority rounded at 6 (the g_weighted_sample precedent) so both
      // engines elect the identical sample
      val w = TextAnalysis.dsirWeights(Tables.documents(s, dir),
        "doc_id", "text", col("lang") === "en", numBuckets = 1024)
      val u = least(graft.ops.Gen.u01(col("doc_id"), 97L),
        lit(1.0 - 1e-12)) // u=1 would send the Gumbel to +inf
      w.withColumn("key", round(col("log_w") - log(-log(u)), 6))
        .orderBy(col("key").desc, col("doc_id").asc)
        .limit(100)
        .select(col("doc_id"), col("n_tokens"),
          round(col("log_w"), 6).as("log_w"))
        .orderBy("doc_id")
    }),
    "x_chunk_windows" -> ((s, dir) =>
      // context-window prep: overlapping 32-token chunks every 16 tokens,
      // chunk index kept so downstream packing can restore document order
      TextAnalysis.chunkWindows(Tables.documents(s, dir), "doc_id", "text",
        window = 32, stride = 16)),
    "x_dedup_lines" -> ((s, dir) => {
      // cross-document line dedup (the RefinedWeb/Dolma paragraph rule:
      // each line survives only at its first corpus-wide occurrence). The
      // corpus is single-line, so the query injects line structure first —
      // every doc re-chunked into 8-word lines (deterministic, replayed by
      // the oracle) — then dedups lines across the whole corpus. Empty
      // docs are excluded symmetrically with the oracle's WHERE (the
      // operator itself keeps them as one blank line; the oracle's
      // line-derivation CTE cannot represent that).
      val lined = Tables.documents(s, dir)
        .filter(trim(col("text")) =!= "")
        .select(col("doc_id"),
          array_join(TextAnalysis.chunkTexts(col("text"), 8, 8), "\n")
            .as("text"))
      TextAnalysis.dedupLines(lined, "doc_id", "text")
    }),
    "x_corpus_shuffle" -> ((s, dir) =>
      // deterministic shuffled-shard layout for training reads: uniform
      // hash shard + independent-channel within-shard order, stable under
      // reruns and corpus append
      Sampling.corpusShuffle(Tables.documents(s, dir), "doc_id",
        nShards = 8)),
    "x_llm_pipeline_v2" -> ((s, dir) => {
      // the CHUNK-level training-data pipeline, composed from this round's
      // operators: inject 8-word line structure → cross-document line
      // dedup → doc floor (≥ 2 surviving lines) → 16-token context
      // windows → deterministic shard layout → per-shard corpus summary.
      // Every stage is individually oracle-checked; the composite chains
      // their CTEs in DuckDB.
      val lined = Tables.documents(s, dir)
        .filter(trim(col("text")) =!= "")  // symmetric with the oracle CTE
        .select(col("doc_id"),
          array_join(TextAnalysis.chunkTexts(col("text"), 8, 8), "\n")
            .as("text"))
      // unordered relation forms mid-pipeline: the export sorts inside
      // dedupLines/chunkWindows would otherwise survive as global
      // range-exchange+Sort stages under the final aggregate
      val clean = TextAnalysis.dedupLinesRelation(lined, "doc_id", "text")
        .filter(col("n_lines_kept") >= 2)
        .select(col("doc_id"), col("clean_text").as("text"))
      // chunk_key is the ·10⁶ positional encoding, now GUARDED (posKey
      // raise_errors past a million chunks per doc instead of colliding);
      // the summary only needs the SHARD, so the assignment runs inline —
      // no within-shard rank, no checkpoint, no join back
      TextAnalysis.chunkRelation(clean, "doc_id", "text",
          window = 16, stride = 16)
        .withColumn("chunk_key",
          TextAnalysis.posKey(col("doc_id"), col("chunk_idx")))
        .withColumn("shard", Sampling.shardOf(col("chunk_key"), 8))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens").cast("long")).as("total_tokens"))
        .orderBy("shard")
    }),
    "x_pii_scrub" -> ((s, dir) => {
      // deterministic PII injection so the scrub exercises on every row
      val injected = concat(col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@mail.example.com or +1 (555) 010-"), col("doc_id"),
        lit(" ref 123456789"))
      val (ne, np) = TextAnalysis.piiCounts(injected)
      Tables.documents(s, dir).select(col("doc_id"),
          TextAnalysis.scrubPii(injected).as("clean_text"),
          ne.as("n_emails"), np.as("n_phones"))
        .orderBy("doc_id")
    }),

    // ---- the LLM training-data pipeline end to end -------------------------
    // quality filter (token floor + repetition cut) → exact dedup (lowest
    // id per content fingerprint) → per-language hashed cap → corpus
    "x_training_set_pipeline" -> ((s, dir) => {
      // the leakage-safe supervised-training prep, end to end: forward
      // labels (24h purchase horizon) → purged temporal split with
      // embargo ≥ horizon (so no test label is computed FROM train-time
      // futures) → entity-safe folds → per-(split, fold) class audit.
      // Every stage is an oracle-verified operator.
      val labeled = Retrieval.futureLabels(
        Tables.events(s, dir).select(col("event_id"), col("user_id"),
          col("ts"), col("event_type")),
        "user_id", "ts", "event_id",
        col("event_type") === "purchase", "24 HOURS")
      val split = Sampling.temporalSplit(labeled, "ts",
        "2024-01-15 00:00:00", embargoDays = 1)
      Sampling.groupKFold(split, "user_id", k = 5)
        .groupBy("split", "fold")
        .agg(count(lit(1)).as("n"),
          sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("split", "fold")
    }),
    // summary: every stage is an oracle-verified operator, composed the
    // way a real pretraining-data job chains them
    "x_llm_pipeline" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val filtered = d
        .withColumn("n_tokens",
          size(TextAnalysis.tokens(lower(col("text")))))
        .withColumn("dup2", TextAnalysis.dupNGramRatio(lower(col("text")), 2))
        .filter(col("n_tokens") >= 20 && col("dup2") <= 0.2)
      val deduped = filtered
        .withColumn("fp", Dedup.fingerprint(col("text")))
        .groupBy(col("fp"))
        .agg(min(struct(col("doc_id"), col("lang"), col("n_tokens")))
          .as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
          col("r.n_tokens").as("n_tokens"))
        // the histogram cap consumes its input twice (counts + selection);
        // checkpoint the small surviving id set so the shingle-scoring +
        // dedup upstream runs once, not per consumer
        .localCheckpoint()
      Sampling.quotaCapHashed(deduped, "lang", "doc_id", n = 150,
          channel = 41L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
        .orderBy("lang")
    }),

    // ---- §7.4 similarity search --------------------------------------------
    "x_vector_stats" -> ((s, dir) =>
      Similarity.vectorStats(Tables.embeddings(s, dir), "vec_id", "embedding")),
    "x_knn_bruteforce" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.topKBruteForce(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", 3)
    }),
    "x_knn_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.topKIvf(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", "label", 3)
    }),
    "x_knn_learned_ivf" -> ((s, dir) => {   // bounded-sample codebook; rows-only
      val emb = Tables.embeddings(s, dir)
      Similarity.learnedIvf(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), 3, nCells = 8)
    }),
    "x_knn_ivf_multiprobe" -> ((s, dir) => { // nProbe=2 recall knob; rows-only
      val emb = Tables.embeddings(s, dir)
      Similarity.learnedIvfMultiProbe(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), 3, nCells = 8, nProbe = 2)
    }),
    "x_knn_ivfpq" -> ((s, dir) => {         // full FAISS IVF-PQ; rows-only
      val emb = Tables.embeddings(s, dir)
      Similarity.topKIvfPq(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), 3, nCells = 8, nProbe = 2)
    }),
    "x_knn_pq" -> ((s, dir) => {            // PQ/ADC ANN; rows-only
      val emb = Tables.embeddings(s, dir)
      Similarity.topKPq(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", 3)
    }),
    "x_matryoshka_recall" -> ((s, dir) =>
      // truncation dial: recall@10 of prefix-dim retrieval (4/8/16/32 of
      // 64) vs full-dim brute force — one scan, all levels from the same
      // scored rows
      Similarity.matryoshkaRecall(Tables.embeddings(s, dir), "vec_id",
        "embedding", col("vec_id") < 5, Seq(4, 8, 16, 32), k = 10)),
    "x_ann_recall" -> ((s, dir) => {
      // recall audit that turns the learned-IVF claim into an ORACLE: at
      // full probe width (nProbe = nCells) cell pruning vanishes, so the
      // learned pipeline — bounded-sample codebook, NearestCentroid
      // assignment, multi-probe explode, per-query rank — must reproduce
      // brute-force top-k EXACTLY. The query emits per-query hit counts of
      // learned-IVF ∩ brute-force; DuckDB independently replays brute
      // force, so any codebook/assignment/ranking defect surfaces as
      // recall < 1 and a hash mismatch.
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 5)
      val ivf = Similarity.learnedIvfMultiProbe(emb, "vec_id", "embedding",
          queries, 3, nCells = 8, nProbe = 8)
        .select(col("query_id"), col("cand_id"))
      val brute = Similarity.topKBruteForce(queries, emb, "vec_id",
          "embedding", 3)
        .select(col("query_id"), col("cand_id"))
      brute.join(ivf, Seq("query_id", "cand_id"), "left_semi")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"))
        .withColumn("k", lit(3))
        .withColumn("recall", round(col("n_hits") / col("k"), 6))
        .orderBy("query_id")
    }),
    "x_pq_recall" -> ((s, dir) => {
      // PQ-exactness audit → ORACLE: with kCodes ≥ corpus size every
      // sampled subvector is its own Lloyd's-fixpoint centroid, so
      // reconstruction is LOSSLESS and ADC scoring ≡ exact cosine — PQ
      // top-k must reproduce brute-force top-k exactly. DuckDB replays
      // brute force independently; any encode / reconstruct / rank defect
      // surfaces as recall < 1 and a hash mismatch. Corpus capped at 500
      // vectors so the degenerate codebook stays ≥ corpus at every SF.
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 500)
      val queries = emb.filter(col("vec_id") < 5)
      val pq = Similarity.topKPq(queries, emb, "vec_id", "embedding", 3,
          m = 8, kCodes = 512)
        .select(col("query_id"), col("cand_id"))
      val brute = Similarity.topKBruteForce(queries, emb, "vec_id",
          "embedding", 3)
        .select(col("query_id"), col("cand_id"))
      brute.join(pq, Seq("query_id", "cand_id"), "left_semi")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"))
        .withColumn("k", lit(3))
        .withColumn("recall", round(col("n_hits") / col("k"), 6))
        .orderBy("query_id")
    }),
    "x_ivfpq_recall" -> ((s, dir) => {
      // IVF-PQ at FULL probe width (nProbe = nCells ⇒ cell pruning drops
      // nothing) with the lossless kCodes ≥ corpus codebook: both
      // approximation knobs disarmed, so the full FAISS layout must
      // reproduce brute force exactly — the x_ann_recall pattern applied
      // to the compound index.
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 500)
      val queries = emb.filter(col("vec_id") < 5)
      val ivfpq = Similarity.topKIvfPq(emb, "vec_id", "embedding", queries,
          3, nCells = 8, nProbe = 8, m = 8, kCodes = 512)
        .select(col("query_id"), col("cand_id"))
      val brute = Similarity.topKBruteForce(queries, emb, "vec_id",
          "embedding", 3)
        .select(col("query_id"), col("cand_id"))
      brute.join(ivfpq, Seq("query_id", "cand_id"), "left_semi")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"))
        .withColumn("k", lit(3))
        .withColumn("recall", round(col("n_hits") / col("k"), 6))
        .orderBy("query_id")
    }),
    "x_minhash_mllib" -> ((s, dir) =>       // MLlib MinHashLSH; rows-only
      MLBridge.minHashLSHNearDups(
        Tables.documents(s, dir).filter(col("doc_id") < 60),
        "doc_id", "text", 3, 0.99)),
    "x_cosine_neardups" -> ((s, dir) =>
      Similarity.cosineNearDups(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label", 0.4)),
    "x_semdedup" -> ((s, dir) => {
      // SemDeDup with SEED centroids (the first 8 vectors) instead of the
      // fitted codebook, so DuckDB replays the whole decision — nearest-
      // centroid assignment included (assignment margins are ≥1e-4 at
      // every SF, far above cross-engine float-summation noise; the
      // fitted-codebook production path is pinned in SimilaritySpec).
      // Bounded 8-row collect at construction, same posture as
      // trainCodebook's 4096-row sample.
      val emb = Tables.embeddings(s, dir)
      val seeds = emb.filter(col("vec_id") < 8).orderBy("vec_id")
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
      Similarity.semDedup(emb, "vec_id", "embedding", seeds, tau = 0.4)
    }),

    "x_vector_normalize" -> ((s, dir) =>
      Similarity.l2Normalize(Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), posexplode(col("nvec")).as(Seq("idx", "nval")))
        .withColumn("nval", round(col("nval"), 6))
        .orderBy("vec_id", "idx")),
    "x_quantize_int8" -> ((s, dir) =>
      Similarity.quantizeInt8(Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          posexplode(col("qvec")).as(Seq("idx", "q")))
        .select(col("vec_id"), col("idx"), col("q"),
          round(col("scale"), 6).as("scale"))
        .orderBy("vec_id", "idx")),
    "x_quantized_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.topKQuantized(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", 3)
    }),

    // ---- §7.4 multimodal columns -------------------------------------------
    "x_binary_features" -> ((s, dir) =>
      Multimodal.binaryFeatures(
        Multimodal.asBinaryTable(Tables.documents(s, dir), "doc_id", "text"),
        "doc_id")),
    "x_decode_base64" -> ((s, dir) =>      // real mapPartitions codec: Base64→UTF-8
      Multimodal.decodeBase64Features(s,
        Multimodal.asBase64Table(Tables.documents(s, dir), "doc_id", "text"),
        "doc_id")),

    "q_attribution" -> ((s, dir) =>
      // last-touch + linear credit per channel, touches paired to
      // conversions by the binned interval join (7-day lookback)
      Eval.attribution(Tables.events(s, dir), "user_id", "ts", "event_id",
        "event_type",
        isTouch = col("event_type").isin("view", "click", "signup"),
        isConv = col("event_type") === "purchase",
        lookback = "7 DAYS")),
    "q_funnel" -> ((s, dir) => {
      // ordered conversion funnel: first view → first click at-or-after
      // it → first purchase at-or-after that; per-user mins keep every
      // join side bounded at one row per user
      val e = Tables.events(s, dir)
      // each stage frame feeds two consumers (next stage + its own
      // count): checkpoint the small per-user frames so the events scan
      // and funnel joins run once per stage, not per consumer
      val fv = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
        .localCheckpoint()
      val fc = e.filter(col("event_type") === "click").as("e")
        .join(fv, Seq("user_id"))
        .filter(col("ts") >= col("t_view"))
        .groupBy("user_id").agg(min(col("ts")).as("t_click"))
        .localCheckpoint()
      val fp = e.filter(col("event_type") === "purchase").as("e")
        .join(fc, Seq("user_id"))
        .filter(col("ts") >= col("t_click"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
      val nv = fv.agg(count(lit(1)).as("n_view"))
      val nc = fc.agg(count(lit(1)).as("n_click"))
      val np = fp.agg(count(lit(1)).as("n_purchase"))
      nv.crossJoin(nc).crossJoin(np)
        .withColumn("click_rate",
          round(col("n_click") / col("n_view").cast("double"), 6))
        .withColumn("purchase_rate",
          round(col("n_purchase") / col("n_click").cast("double"), 6))
    }),
    "q_funnel_windowed" -> ((s, dir) => {
      // the deadline funnel: click within 24h of first view, purchase
      // within 72h of that click — the attribution-realistic variant of
      // q_funnel's unbounded ordering; adds median stage latencies
      // (integer seconds -> both engines interpolate identical halves)
      val e = Tables.events(s, dir)
      val fv = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
        .localCheckpoint()
      val fc = e.filter(col("event_type") === "click").as("e")
        .join(fv, Seq("user_id"))
        .filter(col("ts") >= col("t_view") &&
          col("ts") < col("t_view") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(min(col("ts")).as("t_click"),
          min(col("t_view")).as("t_view"))
        .localCheckpoint()
      val fp = e.filter(col("event_type") === "purchase").as("e")
        .join(fc, Seq("user_id"))
        .filter(col("ts") >= col("t_click") &&
          col("ts") < col("t_click") + expr("INTERVAL 72 HOURS"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"),
          min(col("t_click")).as("t_click2"))
      val nv = fv.agg(count(lit(1)).as("n_view"))
      val nc = fc.agg(count(lit(1)).as("n_click"),
        round(percentile((unix_micros(col("t_click").cast("timestamp")) -
          unix_micros(col("t_view").cast("timestamp"))) / lit(1000000L),
          lit(0.5)), 6).as("median_view_to_click_s"))
      val np = fp.agg(count(lit(1)).as("n_purchase"),
        round(percentile((unix_micros(col("t_purchase").cast("timestamp")) -
          unix_micros(col("t_click2").cast("timestamp"))) / lit(1000000L),
          lit(0.5)), 6).as("median_click_to_purchase_s"))
      nv.crossJoin(nc).crossJoin(np)
        .withColumn("click_rate",
          round(col("n_click") / col("n_view").cast("double"), 6))
        .withColumn("purchase_rate",
          round(col("n_purchase") / col("n_click").cast("double"), 6))
    }),
    "q_cohort_ltv" -> ((s, dir) => {
      // cohort lifetime value: cumulative purchase revenue per cohort
      // member by week of age — retention's revenue-sided twin (the
      // "when does a cohort pay back" curve); cumulative window over the
      // bounded (cohort, offset) grid
      val e = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("event_type"), col("value"))
      val first = e.groupBy("user_id")
        .agg(date_trunc("week", min(col("day"))).cast("date")
          .as("cohort_week"))
      val sizes = first.groupBy("cohort_week")
        .agg(countDistinct(col("user_id")).as("cohort_size"))
      val rev = e.filter(col("event_type") === "purchase")
        .join(first, Seq("user_id"))
        .withColumn("week_offset",
          (datediff(date_trunc("week", col("day")).cast("date"),
            col("cohort_week")) / 7).cast("int"))
        .groupBy("cohort_week", "week_offset")
        .agg(sum(col("value")).as("__rev"))
      val cum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cohort_week")).orderBy(col("week_offset"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      rev.join(sizes, Seq("cohort_week"))
        .withColumn("week_revenue", round(col("__rev"), 6))
        .withColumn("cum_revenue", round(sum(col("__rev")).over(cum), 6))
        .withColumn("cum_ltv_per_user",
          round(sum(col("__rev")).over(cum) /
            col("cohort_size").cast("double"), 6))
        .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
          col("week_revenue"), col("cum_revenue"), col("cum_ltv_per_user"))
        .orderBy("cohort_week", "week_offset")
    }),
    "q_cohort_retention" -> ((s, dir) => {
      // weekly cohort retention: users grouped by first-activity week,
      // distinct active users per (cohort, week offset)
      val e = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = e.groupBy("user_id")
        .agg(date_trunc("week", min(col("day"))).cast("date")
          .as("cohort_week"))
      val act = e.select(col("user_id"),
        date_trunc("week", col("day")).cast("date").as("act_week")).distinct()
      act.join(first, Seq("user_id"))
        .withColumn("week_offset",
          (datediff(col("act_week"), col("cohort_week")) / 7).cast("int"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // ---- classic analytics heft (A6/A10/J4 composites) ---------------------
    "q_lineitem_pricing" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q_selective_revenue" -> ((s, dir) =>
      // TPC-H Q6 shape: tight filters pushed into the parquet scan
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"), count(lit(1)).as("n_rows"))),
    "q_regional_revenue" -> ((s, dir) => {
      // TPC-H Q5 shape: fact ⋈ fact ⋈ broadcast dimension chain
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),
    "q_winsorize" -> ((s, dir) =>
      // heavy-tail clipping at the 5th/95th percentile: one array-
      // percentile fit, broadcast bounds, narrow clip projection
      Stats.winsorize(
          Tables.events(s, dir).select(col("event_id"), col("value")),
          "value", 0.05, 0.95)
        .select(col("event_id"), round(col("value"), 6).as("value"),
          round(col("value_w"), 6).as("value_w"))
        .orderBy("event_id")),
    "q_ewma_features" -> ((s, dir) =>
      // per-user exponentially-weighted trailing mean, truncated to the
      // last 8 events (bounded state — the honest 100 TB recursion)
      Stats.ewmaFeatures(Tables.events(s, dir), "user_id", "ts",
          "event_id", "value", alpha = 0.3, frameRows = 8)
        .select(col("event_id"), col("user_id"),
          round(col("value"), 6).as("value"), col("ewma"))
        .orderBy("event_id")),
    "q_rollup_pricing" -> ((s, dir) =>
      // ROLLUP subtotal lattice: leaf (flag, status), per-flag, grand
      // total — all three dashboard granularities from ONE shuffled
      // aggregation instead of three GROUP BY passes
      Olap.rollupAgg(Tables.lineitem(s, dir),
        Seq("l_returnflag", "l_linestatus"),
        Seq(
          "sum_qty" -> round(sum(col("l_quantity")), 2),
          "revenue" ->
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2),
          "n_items" -> count(lit(1))))),
    "q_cube_events" -> ((s, dir) =>
      // CUBE over (event_type, month): all four grouping sets in one pass
      Olap.cubeAgg(
        Tables.events(s, dir).withColumn("month", month(col("ts"))),
        Seq("event_type", "month"),
        Seq(
          "n_events" -> count(lit(1)),
          "avg_value" -> round(avg(col("value")), 6)))),
    "q_pivot_events" -> ((s, dir) =>
      // wide per-day activity matrix over the DECLARED event-type set —
      // static schema, single aggregation, no distinct-discovery job
      Olap.pivotCounts(Tables.events(s, dir), to_date(col("ts")), "day",
        "event_type", Seq("view", "click", "purchase", "signup", "error"))),
    "q_feature_hashing" -> ((s, dir) =>
      // hashing-trick encoder: md5-prefix bucket per category — no fitted
      // vocabulary, stable under unseen categories (the 100 TB encoder)
      Encoding.featureHash(
          Tables.events(s, dir).select(col("event_id"), col("event_type")),
          Seq("event_type"), nBuckets = 64)
        .orderBy("event_id")),
    "q_onehot_events" -> ((s, dir) =>
      // explicit one-hot over a DECLARED category list; 'error' rows fall
      // outside it and get all-zero indicators (handle-unknown=ignore)
      Encoding.oneHot(
          Tables.events(s, dir).select(col("event_id"), col("event_type")),
          "event_type", Seq("view", "click", "purchase", "signup"))
        .orderBy("event_id")),
    "q_activity_profile" -> ((s, dir) =>
      // behavioral rhythm per user: hour histogram entropy + peak hour
      Stats.activityProfile(Tables.events(s, dir), "user_id", "ts")),
    "q_join_cardinality" -> ((s, dir) =>
      // forecast lineitem ⋈ orders size + hottest key BEFORE running it
      Stats.joinCardinality(Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey")),
    "q_purge_audit" -> ((s, dir) =>
      // GDPR erasure audit: purge the probe-sampled users (plus one
      // never-present key) from events; file the proof
      Materialize.purgeAudit(Tables.events(s, dir), "user_id",
        Tables.customer(s, dir)
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey").as("uid"))
          .unionByName(s.range(1).select((col("id") + 1000000L).as("uid"))),
        "uid")),
    "q_forget_cascade" -> ((s, dir) => {
      // cascading right-to-be-forgotten manifest across the relational
      // schema: requested customers hit customer/orders/events directly,
      // lineitem transitively THROUGH the purged orders (the FK cascade a
      // single-table purge silently misses). One scan per table; the
      // derived order-key set is data-proportional, so no broadcast hint
      // on the lineitem hop
      val reqs = Tables.customer(s, dir)
        .filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey").as("uid"))
        .unionByName(s.range(1).select((col("id") + 1000000L).as("uid")))
      val purgedOrders = Tables.orders(s, dir)
        .join(broadcast(reqs.distinct()), col("o_custkey") === col("uid"),
          "left_semi")
        .select(col("o_orderkey"))
      Materialize.purgeManifestRow("customer", Tables.customer(s, dir),
          "c_custkey", reqs, "uid")
        .unionByName(Materialize.purgeManifestRow("orders",
          Tables.orders(s, dir), "o_custkey", reqs, "uid"))
        .unionByName(Materialize.purgeManifestRow("lineitem",
          Tables.lineitem(s, dir), "l_orderkey", purgedOrders, "o_orderkey",
          hintBroadcast = false))
        .unionByName(Materialize.purgeManifestRow("events",
          Tables.events(s, dir), "user_id", reqs, "uid"))
        .orderBy("table_name")
    }),
    "q_supplier_kcore" -> ((s, dir) => {
      // 3-round k=3 core peel of the co-order supplier graph (w>=5 —
      // non-empty at every SF; q_triangles' w>=10 cut empties at sf0.1
      // where co-order weight dilutes across 1000 suppliers): the dense-
      // backbone vs periphery separation, unrolled supersteps replayed
      val base = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("bk"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = base.as("a").join(base.as("b"),
          col("a.bk") === col("b.bk") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("src"), col("b.sk").as("dst"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 5)
        .select("src", "dst")
      Graph.kCore(edges, "src", "dst", k = 3, rounds = 3)
        .withColumnRenamed("node", "s_suppkey")
    }),
    "x_embedding_outliers" -> ((s, dir) =>
      // mislabeled-sample screen: 10 vectors farthest from their label
      // centroid, per label; distances rounded before the rank election
      Similarity.centroidOutliers(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label", k = 10)),
    "q_salted_distinct" -> ((s, dir) =>
      // exact per-key count(DISTINCT user) as TWO bounded shuffles: salt
      // partitions the distinct-VALUE space so per-salt counts sum exactly
      // — the skew rewrite for the one aggregate partial-agg can't spread
      Skew.saltedDistinctAgg(Tables.events(s, dir), "event_type",
        "user_id", nSalts = 16)),
    "q_salted_join" -> ((s, dir) => {
      // hot-key split join: Misra–Gries finds keys ≥1% of probe rows,
      // those take the replicated (key, salt) path, the rest join plain;
      // result is row-for-row the plain inner join the oracle replays
      val joined = Skew.saltedHotKeyJoin(
        Tables.events(s, dir), Tables.customer(s, dir),
        probeKey = "user_id", buildKey = "c_custkey", saltBy = "event_id",
        nSalts = 8, minShare = 0.01)
      joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 6).as("total_value"))
        .orderBy("c_mktsegment")
    }),
    "q_skew_report" -> ((s, dir) =>
      // pre-shuffle key diagnostics: per-key count percentiles, hottest
      // key share, max/median skew ratio
      Stats.skewReport(Tables.events(s, dir), "user_id")),
    "q_rank_features" -> ((s, dir) =>
      // within-group standing: rank / percent_rank / quartile of value
      // inside each event type; sorts are group-local
      Stats.rankFeatures(
          Tables.events(s, dir).select(col("event_id"), col("event_type"),
            col("value")),
          "event_type", "value", "event_id")
        .orderBy("event_id")),
    "q_mad_outliers" -> ((s, dir) =>
      // robust (median/MAD) outlier report — the heavy-tail-safe sibling
      // of the Tukey IQR fences
      Stats.madOutliers(Tables.events(s, dir), "event_type", "value",
        k = 3.0)),
    "q_feature_corr" -> ((s, dir) =>
      // pairwise Pearson matrix in ONE aggregation pass, melted to rows
      Stats.corrMatrix(Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),
    "q_pca_power" -> ((s, dir) =>
      // MLlib split: corpus-sized work = ONE corr-matrix aggregation pass;
      // matrix-sized work = fixed-iteration power eigensolve on the
      // bounded d×d result, replayed step-for-step by the oracle
      Linalg.pcaPowerTop(s, Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        iterations = 12)),
    "q_pca_incremental" -> ((s, dir) => {
      // the mergeable-partials twin of q_pca_power: per-batch raw-moment
      // sums (split at a ship-date cutoff) add into the merged corr
      // matrix — no history rescan; extendedprice pre-scaled to O(1)
      // magnitude so the raw-moment formula stays well-conditioned
      val li = Tables.lineitem(s, dir)
        .withColumn("l_price_scaled", col("l_extendedprice") / 100000.0)
      val cut = lit("1997-01-01").cast("timestamp_ntz")
      Linalg.pcaPowerTopIncremental(s,
        Seq(li.filter(col("l_shipdate") < cut),
          li.filter(col("l_shipdate") >= cut)),
        Seq("l_quantity", "l_discount", "l_tax", "l_price_scaled"),
        iterations = 12)
    }),
    "q_mutual_info" -> ((s, dir) =>
      // model-free relevance screen: MI between event type and the value
      // magnitude bin, over the bounded joint-count table
      Stats.mutualInfo(
        Tables.events(s, dir)
          .withColumn("vbin", Parse.magnitudeBin(col("value") / 1000.0)),
        "event_type", "vbin")),
    "q_mi_matrix" -> ((s, dir) =>
      // all-pairs MI/NMI in one scan: event type x weekday x magnitude
      // bin (weekday(ts) 0=Monday matches DuckDB isodow-1)
      Stats.mutualInfoMatrix(
        Tables.events(s, dir)
          .withColumn("dow", weekday(col("ts")))
          .withColumn("vbin", Parse.magnitudeBin(col("value") / 1000.0)),
        Seq("event_type", "dow", "vbin"))),
    "q_incremental_hourly" -> ((s, dir) => {
      // incremental flagship maintenance: two ingest halves fold to
      // mergeable partials, merge, finalize — additive/min columns from
      // the MERGED state (the oracle hash proves the merge), exact
      // unique_k recomputed check-side, sketch bounded by unique_k_ok
      val e = ev(s, dir)
      val merged = WindowAgg.mergeHourlyPartials(
        WindowAgg.hourlyPartials(e.filter(pmod(col("event_id"), lit(2)) === 0)),
        WindowAgg.hourlyPartials(e.filter(pmod(col("event_id"), lit(2)) === 1)))
      WindowAgg.finalizeHourlyChecked(merged, e)
    }),
    "q_manifest_diff" -> ((s, dir) => {
      // partition-level resync list between two export generations:
      // BEFORE lacks 2024-01-05 (-> added in AFTER); AFTER drops every
      // 97th event of other days (-> those days changed)
      val e = Tables.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
      val before = Quality.groupFingerprints(
        e.filter(col("event_date") =!= lit("2024-01-05").cast("date")),
        "event_date", Seq("event_id", "user_id", "event_type", "props"))
      val after = Quality.groupFingerprints(
        e.filter(col("event_date") === lit("2024-01-05").cast("date") ||
          pmod(col("event_id"), lit(97)) =!= 0),
        "event_date", Seq("event_id", "user_id", "event_type", "props"))
      Quality.manifestDiff(before, after, "event_date")
    }),
    "q_calibration" -> ((s, dir) =>
      // reliability diagram + ECE: score = clipped value/500 against the
      // purchase outcome, 10 equal-width bins
      Stats.calibrationBins(
        Tables.events(s, dir)
          .withColumn("score", least(col("value") / 500.0, lit(1.0))),
        "score", col("event_type") === "purchase", bins = 10)),
    "q_target_encoding" -> ((s, dir) =>
      // smoothed mean encoding of event_type against the purchase value —
      // the fitted table a serving join broadcasts
      Encoding.targetEncode(
        Tables.events(s, dir).select(col("event_type"), col("value")),
        "event_type", "value", smoothing = 10.0)),
    "q_standard_scale" -> ((s, dir) =>
      // z-score standardization: one broadcast stats row, narrow transform
      Encoding.standardScale(
          Tables.lineitem(s, dir).select(col("l_orderkey"),
            col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
            col("l_discount")),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity_z"), col("l_extendedprice_z"), col("l_discount_z"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    "x_mmr_rerank" -> ((s, dir) =>
      // diversity-aware re-rank: greedy MMR (lambda = 0.7) over the
      // top-20 cosine pool — stops the list collapsing onto near-copies
      // of the best hit; election in exact integer micro-units
      Similarity.mmrDiversify(Tables.embeddings(s, dir), "vec_id",
        "embedding", col("vec_id") === 0, poolK = 20, selectK = 5,
        lambdaTenths = 7)),
    "x_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25
      // lexical ranking and the cosine semantic ranking — the fusion
      // rule hybrid search engines ship (a doc strong in either channel
      // surfaces; no score calibration needed, only ranks). Both
      // channels cut to top-100 via TakeOrdered; the fusion window runs
      // over those bounded lists
      val lex = TextAnalysis.bm25Scores(Tables.documents(s, dir),
          "doc_id", "text", Seq("spark", "join", "window"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(100)
      val lexRank = lex.withColumn("lex_rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("lex_rank"))
      val emb = Tables.embeddings(s, dir)
      val sem = Similarity.topKBruteForce(emb.filter(col("vec_id") === 0),
          emb, "vec_id", "embedding", 100)
        .select(col("cand_id").as("doc_id"),
          col("rank").cast("long").as("sem_rank"))
      lexRank.join(sem, Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("sem_rank")), lit(0.0)), 6))
        .orderBy(col("rrf").desc, col("doc_id")).limit(20)
        .select(col("doc_id"), col("lex_rank"), col("sem_rank"), col("rrf"))
    }),
    "x_bm25_search" -> ((s, dir) =>
      // BM25 lexical search over the corpus for a fixed 3-term query
      TextAnalysis.bm25Scores(Tables.documents(s, dir), "doc_id", "text",
        Seq("spark", "join", "window"))),
    "q_js_divergence" -> ((s, dir) =>
      // symmetric bounded drift score over pooled-decile bins
      Drift.jsDivergence(Tables.events(s, dir), "value", "event_type",
        "view", "purchase", bins = 10)),
    "q_quantile_bins" -> ((s, dir) =>
      // equal-frequency discretization audit: per-bucket count and range
      Stats.quantileBin(
          Tables.lineitem(s, dir).select(col("l_extendedprice")),
          "l_extendedprice", 10)
        .groupBy(col("l_extendedprice_bin").as("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("l_extendedprice")), 2).as("lo"),
          round(max(col("l_extendedprice")), 2).as("hi"))
        .orderBy(col("bin"))),
    "q_robust_scale" -> ((s, dir) =>
      // median/IQR scaling of the heavy-tailed purchase value
      Encoding.robustScale(
          Tables.events(s, dir).select(col("event_id"), col("value")),
          Seq("value"))
        .select(col("event_id"), col("value_rs"))
        .orderBy(col("event_id"))),
    "x_user_sequences" -> ((s, dir) =>
      // last-20 action strings per user, oldest->newest — sequence-model
      // training features
      Session.eventSequences(Tables.events(s, dir), "user_id", "ts",
        "event_id", "event_type", k = 20)),
    "q_promo_revenue" -> ((s, dir) =>
      // TPC-H Q14 shape: fact ⋈ broadcast part dim, conditional revenue
      // share — part is orders-of-magnitude smaller than lineitem, so the
      // dim broadcasts and the fact never shuffles
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount")))
              .otherwise(0.0)) /
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
            .as("promo_revenue_pct"),
          count(lit(1)).as("n_items"))),
    "q_supplier_volume" -> ((s, dir) => {
      // TPC-H Q9-lite: revenue by supplier nation — fact ⋈ broadcast
      // supplier ⋈ broadcast nation, one hash aggregate
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),
    "q_bloom_semi" -> ((s, dir) => {
      // explicit runtime filter: bloom built from the selective dim side
      // prunes the fact scan BEFORE the join shuffle; the exact semi join
      // on the survivors makes the result fpp-independent (≡ plain ⋉)
      val dim = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"))
      Bloom.bloomSemiJoin(Tables.orders(s, dir), dim,
          "o_custkey", "c_custkey", expectedItems = 1L << 17)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy("o_orderstatus")
    }),
    "q_bloom_anti" -> ((s, dir) => {
      // bloom short-circuit anti join: definite misses skip the join
      val dim = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey"))
      Bloom.bloomAntiJoin(Tables.orders(s, dir), dim,
          "o_custkey", "c_custkey", expectedItems = 1L << 17)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy("o_orderstatus")
    }),
    "q_revenue_by_segment" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment")
    }),
    "q_auc" -> ((s, dir) =>
      // per-day ROC AUC of value as a purchase score — Mann–Whitney
      // rank-sum with midrank ties, no curve materialization
      Eval.rocAuc(
        Tables.events(s, dir)
          .select(to_date(col("ts")).as("day"), col("event_type"),
            col("value")),
        "day", col("event_type") === "purchase", "value")),
    "q_lift_table" -> ((s, dir) =>
      // decile gains table: per-decile positive rate, lift over base,
      // cumulative capture from the top decile down
      Eval.liftTable(
        Tables.events(s, dir).select(col("value"), col("event_type")),
        col("event_type") === "purchase", "value", bins = 10)),
    "q_ab_test" -> ((s, dir) =>
      // deterministic 50/50 hash-split experiment readout: pooled
      // two-proportion z on high-value conversion + Welch t on revenue
      Eval.abTest(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("value")),
        "user_id",
        col("event_type") === "purchase" && col("value") > 95.0, "value")),
    "q_eb_shrinkage" -> ((s, dir) =>
      // the leaderboard fix: per-user conversion rates posterior-shrunk
      // under a moment-matched beta prior — evidence-proportional pull
      // toward the population mean
      Eval.ebShrinkage(Tables.events(s, dir), "user_id",
        col("event_type") === "purchase" && col("value") > 95.0)),
    "q_ab_sequential" -> ((s, dir) =>
      // always-valid mSPRT over the same hash-split experiment: peek
      // after every day without inflating false positives
      Eval.abSequential(
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"),
            col("value")),
        "user_id", "ts",
        isConv = col("event_type") === "purchase" && col("value") > 95.0)),
    "q_nelson_aalen" -> ((s, dir) =>
      // the hazard-scale twin of Kaplan-Meier: cumulative hazard + its
      // variance over the same time-to-first-event table
      Eval.nelsonAalen(
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"),
            col("value")),
        "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 95.0)),
    "q_rfm_segmentation" -> ((s, dir) =>
      // the customer-value grid: tercile-scored recency/frequency/
      // monetary, folded to <=27 segment cells
      Eval.rfmSegments(
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"),
            col("value")),
        "user_id", "ts", col("event_type") === "purchase", "value")),
    "q_kaplan_meier" -> ((s, dir) =>
      // product-limit survival of time-to-first-high-value-purchase,
      // right-censored at each user's last observed event
      Eval.kaplanMeier(
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"),
            col("value")),
        "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 95.0)),
    "q_seasonality" -> ((s, dir) =>
      // additive period-7 decomposition of daily order revenue with a
      // calendar-free epoch-mod-7 weekday slot
      Eval.seasonality(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "x_collocations" -> ((s, dir) =>
      // top PMI bigrams (Church–Hanks collocations) with a min-count cut
      TextAnalysis.collocations(Tables.documents(s, dir), "text",
        minCount = 5, k = 50)),
    "x_vocabulary" -> ((s, dir) =>
      // frequency-ordered dense-index vocabulary — embedding-table prep
      TextAnalysis.vocabulary(Tables.documents(s, dir), "doc_id", "text",
        minCount = 10)),
    "x_bpe_merges" -> ((s, dir) =>
      // distributed BPE trainer: ONE corpus scan → vocab-bounded word
      // table → merge supersteps (pair-count agg + 1-row argmax each).
      // The oracle re-derives the merges in SQL as dynamically-
      // parameterized unrolled supersteps — the PageRank/k-means
      // precedent, except each superstep's rewrite PATTERN is itself
      // computed by the previous step's argmax
      Bpe.mergesDf(s, bpeMerges(s, dir))),
    "x_bpe_tokens" -> ((s, dir) => {
      // subword corpus statistics under the trained merges: per-doc token
      // count, fertility (tokens/word — THE tokenizer quality number) and
      // the round-trip invariant, every column replayed exactly by DuckDB
      val docs = Tables.documents(s, dir)
      Bpe.tokenStats(docs, "doc_id", "text", bpeMerges(s, dir))
    }),
    "q_basket_rules" -> ((s, dir) =>
      // market-basket mining: top part-pair association rules by lift,
      // pairs bounded per order (never corpus²)
      Frequency.basketRules(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minPairSupport = 2, k = 100)),
    "q_supplier_pagerank" -> ((s, dir) => {
      // 5-superstep damped PageRank over the supplier co-order graph —
      // the declarative Pregel loop, deterministic via fixed iterations
      val base = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("bk"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = base.as("a").join(base.as("b"),
          col("a.bk") === col("b.bk") && col("a.sk") =!= col("b.sk"))
        .select(col("a.sk").as("src"), col("b.sk").as("dst"))
      Graph.pageRank(edges, "src", "dst", iterations = 5)
        .withColumnRenamed("node", "s_suppkey")
    }),
    "q_supplier_bfs" -> ((s, dir) => {
      // 4-superstep multi-source BFS (min-plus Pregel) over the same
      // co-order graph: hop distance from the seed suppliers — the
      // blast-radius / lineage-closure primitive
      val base = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("bk"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = base.as("a").join(base.as("b"),
          col("a.bk") === col("b.bk") && col("a.sk") =!= col("b.sk"))
        .select(col("a.sk").as("src"), col("b.sk").as("dst"))
      val seeds = Tables.supplier(s, dir)
        .filter(col("s_suppkey") % 17 === 0)
      Graph.bfsHops(edges, "src", "dst", seeds, "s_suppkey", rounds = 4)
        .withColumnRenamed("node", "s_suppkey")
    }),
    "q_forecast_baseline" -> ((s, dir) =>
      // the two baselines every forecast must beat: lag-1 naive and
      // lag-7 seasonal-naive over daily revenue, with MAE + MASE folds
      Eval.forecastBaseline(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_benford" -> ((s, dir) =>
      // Benford first-digit audit of order totals: observed vs
      // log10(1+1/d) shares with per-digit and total chi-square
      Quality.benford(Tables.orders(s, dir), "o_totalprice")),
    "x_silhouette" -> ((s, dir) =>
      // centroid-silhouette cluster quality of the labeled embedding
      // partition: per-label intra/nearest-other distance and score
      Similarity.silhouette(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label")),
    "x_kmeans" -> ((s, dir) =>
      // deterministic Lloyd k-means (id-ordered seeds, fixed supersteps,
      // lowest-cluster tie rule) — assignment + distance per vector
      Clustering.kmeans(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iterations = 3)),
    "q_ndcg" -> ((s, dir) =>
      // ranking quality of value-as-score against purchase relevance,
      // per user: DCG@10 / ideal, ln-ratio log2 on both engines
      Eval.ndcgAtK(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            col("event_type")),
        "user_id", "event_id", "value",
        col("event_type") === "purchase" && col("value") > 90.0, k = 10)),
    "q_revenue_gini" -> ((s, dir) =>
      // revenue concentration across customers: Gini + Lorenz tail
      // shares over the entity-grain aggregate
      Stats.giniConcentration(Tables.orders(s, dir), "o_custkey",
        "o_totalprice")),
    "q_woe_encoding" -> ((s, dir) =>
      // weight-of-evidence of event_type for predicting high-value
      // events, with the information-value feature-power total
      Encoding.woeEncode(
        Tables.events(s, dir).select(col("event_type"), col("value")),
        "event_type", col("value") > 90.0)),
    "q_triangles" -> ((s, dir) => {
      // community density of the strong co-order supplier graph (pairs
      // sharing >= 10 orders): per-node triangles + clustering coeff
      val base = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("bk"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = base.as("a").join(base.as("b"),
          col("a.bk") === col("b.bk") && col("a.sk") < col("b.sk"))
        .groupBy(col("a.sk").as("src"), col("b.sk").as("dst"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 10)
        .select("src", "dst")
      Graph.triangleCounts(edges, "src", "dst")
        .withColumnRenamed("node", "s_suppkey")
    }),

    // ---- privacy release audits (k-anonymity / l-diversity) ----------------
    "q_k_anonymity" -> ((s, dir) =>
      Privacy.kAnonymityReport(Tables.customer(s, dir),
        Seq("c_mktsegment", "c_nationkey"), kThreshold = 10)),
    "q_k_offenders" -> ((s, dir) =>
      Privacy.kAnonymityOffenders(Tables.customer(s, dir),
        Seq("c_mktsegment", "c_nationkey"), kThreshold = 8)),
    "q_l_diversity" -> ((s, dir) =>
      Privacy.lDiversityReport(Tables.customer(s, dir),
        Seq("c_mktsegment", "c_nationkey"),
        Privacy.band(col("c_acctbal"), 2000.0), lThreshold = 4)),
    "q_t_closeness" -> ((s, dir) =>
      // the skewness-attack audit l-diversity misses: max TVD between any
      // class's sensitive distribution and the global one
      Privacy.tClosenessReport(Tables.customer(s, dir),
        Seq("c_mktsegment", "c_nationkey"),
        Privacy.band(col("c_acctbal"), 2000.0), tThreshold = 0.2)),

    // ---- web-corpus curation: domain-scoped boilerplate --------------------
    "x_boilerplate_ngrams" -> ((s, dir) =>
      TextAnalysis.boilerplateShingles(Tables.documents(s, dir), "doc_id",
        "text", "source", n = 2, minDf = 3)),
    "x_boilerplate_ratio" -> ((s, dir) =>
      TextAnalysis.boilerplateRatio(Tables.documents(s, dir), "doc_id",
        "text", "source", n = 2, minDf = 3)),

    // ---- mergeable-sketch store (pre-agg daily HLL, union rollup) ----------
    "q_sketch_weekly" -> ((s, dir) =>
      Sketches.weeklyDistinctChecked(Tables.events(s, dir), "ts", "user_id")),

    // histogram store: per-day equi-width bins merged to weekly quantile
    // readouts — exact integer bin counts, so (unlike HLL) the whole
    // pipeline is deterministic arithmetic the oracle replays bit-for-bit
    "q_histogram_weekly" -> ((s, dir) =>
      Sketches.rollupQuantiles(
        Sketches.dailyHistogramStore(Tables.events(s, dir), "ts", "value",
          lo = 0.0, hi = 600.0, nBins = 600),
        date_trunc("week", _), lo = 0.0, hi = 600.0, nBins = 600,
        ps = Seq(0.5, 0.95))),

    // latency complement of q_funnel: how long conversion takes
    "q_time_to_convert" -> ((s, dir) =>
      Eval.timeToConvert(Tables.events(s, dir), "user_id", "ts",
        "event_type", fromType = "view", toType = "purchase")),

    // Freedman-Diaconis sizing for the histogram store
    "q_histogram_config" -> ((s, dir) =>
      Sketches.histogramConfig(
        Tables.events(s, dir).select("value"), "value")),

    // backfill grid: as-of snapshots at three year-end cutoffs in ONE pass
    "q_snapshot_series" -> ((s, dir) =>
      Materialize.snapshotSeries(Tables.orders(s, dir), "o_custkey",
        "o_orderdate", "o_orderkey",
        Seq("1996-12-31 23:59:59", "1998-12-31 23:59:59",
          "2000-12-31 23:59:59"),
        Seq("o_totalprice", "o_orderstatus"))),

    // drift monitoring from the histogram store: daily PSI vs the first
    // week's pooled bin distribution, no raw re-read
    "q_psi_from_store" -> ((s, dir) =>
      Sketches.psiFromStore(
        Sketches.dailyHistogramStore(Tables.events(s, dir), "ts", "value",
          lo = 0.0, hi = 600.0, nBins = 600),
        "2024-01-01", "2024-01-07", nBins = 600)),

    // retention from the sketch store: week-over-week overlap via
    // inclusion-exclusion on stored sketches (counts can't intersect)
    "q_sketch_retention" -> ((s, dir) =>
      Sketches.weeklyRetentionChecked(Tables.events(s, dir), "ts",
        "user_id")),

    // per-segment store: weekly p50/p95 per event type from the grouped
    // histogram store (the per-feature monitoring shape)
    "q_histogram_by_type" -> ((s, dir) =>
      Sketches.rollupGroupedQuantiles(
        Sketches.dailyGroupedHistogramStore(Tables.events(s, dir), "ts",
          "event_type", "value", lo = 0.0, hi = 600.0, nBins = 600),
        date_trunc("week", _), lo = 0.0, hi = 600.0, nBins = 600,
        ps = Seq(0.5, 0.95))),

    // ---- CDC changelog apply (upserts + deletes -> current snapshot) -------
    "q_cdc_apply" -> ((s, dir) =>
      // events as a CDC feed: 'error' events are tombstones; the snapshot
      // keeps only keys whose LATEST change is an upsert
      Materialize.applyChangelog(
        Tables.events(s, dir).withColumn("op",
          when(col("event_type") === "error", "delete").otherwise("upsert")),
        "user_id", "ts", "event_id", "op", "delete",
        Seq("event_type", "value"))),

    // ---- missingness-pattern profile over the feature table ----------------
    "q_null_patterns" -> ((s, dir) =>
      Quality.nullPatterns(WindowAgg.hourlyFeatures(ev(s, dir)),
        Seq("primary_k", "avg_view_value", "click_through_rate",
          "conversion_rate"))),

    // ---- partition-continuity audit (backfill planner input) ---------------
    "q_partition_gaps" -> ((s, dir) =>
      Stats.partitionGaps(Tables.orders(s, dir), "o_orderdate")),

    // the backfill WORK-LIST: the actual missing days, one row each
    "q_backfill_plan" -> ((s, dir) =>
      Stats.missingDays(Tables.orders(s, dir), "o_orderdate")),

    // export manifest: per-partition row counts + order-invariant content
    // fingerprints of the date-partitioned offline store, read back from
    // the written files — the handoff integrity record
    "s_export_manifest" -> ((s, dir) => {
      val withDate = Tables.events(s, dir)
        .withColumn("event_date", to_date(col("ts")))
      val root = graft.sources.Sources.writeOfflineStore(withDate, "event_date")
      Quality.groupFingerprints(
        s.read.parquet(root), "event_date",
        Seq("event_id", "user_id", "event_type", "props"))
    }),

    // ---- rendezvous re-sharding audit (minimal-movement property) ----------
    "q_shard_movement" -> ((s, dir) =>
      Sampling.rendezvousMovementReport(Tables.documents(s, dir), "doc_id",
        nFrom = 8, nTo = 10)),

    // ---- histogram-based percentile-rank normalization (no global sort) ----
    "q_rank_normalize" -> ((s, dir) =>
      Sketches.rankNormalize(
        Tables.events(s, dir).select("event_id", "value"),
        "value", lo = 0.0, hi = 600.0, nBins = 600)
        .select("event_id", "value", "rank_est")
        .orderBy("event_id")),

    // ---- per-key OLS trend (regr_* sufficient statistics, one agg) ---------
    "q_trend_per_key" -> ((s, dir) => {
      // y on an INTEGER lattice (centi-revenue): values carry 2 decimals,
      // so round(value*100) is per-row exact and sum(long) is identical
      // in any accumulation order — the q_price_elasticity lesson; a
      // double y left one intercept on a round(6) boundary (r7 hash miss).
      // Slope unit: centi-revenue per day.
      val daily = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .as("x"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      Stats.trendPerKey(daily, "user_id", "x", "y", exact = true)
    }),
    "q_bootstrap_ci" -> ((s, dir) =>
      // deterministic Poisson bootstrap: both engines draw identical
      // resamples via the shared u01 hash, so the CI is oracle-exact
      Stats.bootstrapCI(
        Tables.events(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id"), col("value")),
        "event_id", "value", reps = 200)),
    "q_price_elasticity" -> ((s, dir) => {
      // demand response per brand: OLS of mean quantity on the discount
      // level. BOTH axes integer — x = discount percent bin, y = mean
      // quantity in CENTI-units (quantities are integral, so the mean is
      // an exact int/int division and round(·100) is engine-identical;
      // integer y makes every OLS sum exact in any order, where
      // 6-decimal-rounded doubles left one brand's slope on a rounding
      // boundary). Slope unit: centi-quantity per discount point.
      val li = Tables.lineitem(s, dir).join(Tables.part(s, dir),
        col("l_partkey") === col("p_partkey"))
      val lvl = li.groupBy(col("p_brand"),
          round(col("l_discount") * 100).cast("int").as("x"))
        .agg(round(avg(col("l_quantity")) * 100).cast("long").as("y"))
      Stats.trendPerKey(lvl, "p_brand", "x", "y", exact = true)
    }),
    "q_theilsen_trend" -> ((s, dir) => {
      // the robust twin of q_trend_per_key: median pairwise slope +
      // median residual intercept, outlier-immune where OLS chases one
      // corrupted day; per-key pair space guarded fail-loud
      val daily = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .as("x"))
        .agg(round(sum(col("value")), 2).as("y"))
      Stats.theilSenPerKey(daily, "user_id", "x", "y")
    }),

    // ---- video frame-sampling plumbing (metadata-only projection) ----------
    "x_frame_sample" -> ((s, dir) =>
      Multimodal.frameSampleOffsets(Tables.documents(s, dir), "doc_id",
        round(col("n_chars") / 50.0, 2), fps = 30.0, k = 4)),

    // ---- schema-evolution read (mergeSchema across generations) ------------
    "s_schema_evolution" -> ((s, dir) => {
      // two parquet generations of the same table — gen2 grew a derived
      // column — read back as ONE frame via mergeSchema (the decade-of-
      // partitions reality at 100 TB: old files simply surface NULLs for
      // columns they predate). The aggregate proves column alignment and
      // NULL-fill; DuckDB replays it straight from orders.parquet.
      val o = Tables.orders(s, dir)
      val root = java.nio.file.Files.createTempDirectory("graft_evo_").toString
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$root/gen1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          round(col("o_totalprice") * 0.92, 2).as("o_totalprice_eur"))
        .write.mode("overwrite").parquet(s"$root/gen2")
      val merged = s.read.option("mergeSchema", "true")
        .parquet(s"$root/gen1", s"$root/gen2")
      val out = merged.agg(
        count(lit(1)).as("n_rows"),
        count(col("o_totalprice_eur")).as("n_eur"),
        round(sum(col("o_totalprice")), 2).as("usd_total"),
        round(sum(col("o_totalprice_eur")), 2).as("eur_total"))
        .localCheckpoint() // must not lazily re-read the dir removed below
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      out
    }),

    // ---- in-engine classifier training (unrolled-GD logistic regression) --
    "x_conformal" -> ((s, dir) =>
      // distribution-free error bars: split-conformal half-width from the
      // calibration order statistic, coverage audited on the test split
      Eval.conformal(
        Tables.events(s, dir)
          .withColumn("split", pmod(col("event_id"), lit(3))),
        "event_id", "event_type", "value", "split", alpha = 0.1)),
    "x_lr_scores" -> ((s, dir) =>
      // train a linear "high-label" classifier on the embeddings by 3
      // full-batch GD supersteps (zero init, η=0.5, intercept prepended)
      // and score every vector — the fastText-style quality-filter
      // trainer as pure dataflow, superstep-replayed by the oracle
      Learn.logisticGD(Tables.embeddings(s, dir), "vec_id", "embedding",
        col("label") >= 5, eta = 0.5, iterations = 3)),
    "x_label_noise" -> ((s, dir) => {
      // confident-learning screen (Northcutt's class-conditional
      // thresholds): a row is a label-error candidate when its predicted
      // prob crosses the MEAN prob of the opposite class — flags the
      // examples the trained scorer is confident were mislabeled
      val scored = Learn.logisticGD(Tables.embeddings(s, dir), "vec_id",
        "embedding", col("label") >= 5, eta = 0.5, iterations = 3)
      val th = scored.agg(
        round(avg(when(col("y") === 1, col("prob"))), 6).as("t1"),
        round(avg(when(col("y") === 0, col("prob"))), 6).as("t0"))
      scored.crossJoin(broadcast(th))
        .withColumn("suspected_label",
          when(col("y") === 0 && col("prob") >= col("t1"), 1)
            .when(col("y") === 1 && col("prob") <= col("t0"), 0))
        .filter(col("suspected_label").isNotNull)
        .withColumn("noise_score",
          round(when(col("y") === 1, lit(1.0) - col("prob"))
            .otherwise(col("prob")), 6))
        .select(col("vec_id"), col("y"), col("prob"),
          col("suspected_label"), col("noise_score"))
        .orderBy(col("noise_score").desc, col("vec_id"))
    }),
    "x_mixture_waterfill" -> ((s, dir) =>
      // epoch-capped token-budget mixture planning: target weights
      // ∝ source index + 1, budget 1.2× total supply, 2-epoch cap —
      // exact closed-form water-filling over the bounded domain frame
      Sampling.mixtureWaterfill(Tables.documents(s, dir), "text", "source",
        expr("CAST(substring(domain, 4) AS INT) + 1"),
        budgetFraction = 1.2, epochCap = 2.0)),
    "x_text_normalize" -> ((s, dir) =>
      // Unicode cleanup report: native NFC + control/U+FFFD strip +
      // whitespace collapse, all counts in engine-independent BYTES
      TextAnalysis.normalizeText(Tables.documents(s, dir), "doc_id",
        "text")),
    "x_lr_calibration" -> ((s, dir) =>
      // reliability diagram + ECE over the trained scorer's (rounded)
      // probabilities — 10 equal-width bins, self-contained report
      Eval.calibration(
        Learn.logisticGD(Tables.embeddings(s, dir), "vec_id", "embedding",
          col("label") >= 5, eta = 0.5, iterations = 3),
        "prob", "y", bins = 10)),
    "x_lr_metrics" -> ((s, dir) =>
      // training-run report chained from the ROUNDED margins (the
      // cross-engine-stable quantity): accuracy + mean log-loss
      Learn.logisticMetrics(
        Learn.logisticGD(Tables.embeddings(s, dir), "vec_id", "embedding",
          col("label") >= 5, eta = 0.5, iterations = 3)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops → driver
    * records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = OracleSql.all
}
