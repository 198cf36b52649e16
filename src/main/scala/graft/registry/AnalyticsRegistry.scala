package graft
package registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._
import Shared._

/** classic analytics heft: OLAP composites, sessionization,
  * stats/eval/privacy extensions, layout round trips, learning ops.
  *
  * One domain slice of the query registry (split out of SparkEntry in
  * round 8 — wiring only, no behavior change; [[graft.SparkEntry]]
  * assembles and uniqueness-checks the full map).
  */
object AnalyticsRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "q_grouping_sets" -> ((s, dir) =>
      // the three slices a dashboard reads — (type, month), (type),
      // (month) — WITHOUT cube's grand total or rollup's prefix rule
      Olap.groupingSetsAgg(
        Tables.events(s, dir).withColumn("month", month(col("ts"))),
        Seq("event_type", "month"),
        Seq(Seq("event_type", "month"), Seq("event_type"), Seq("month")),
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
      // backbone vs periphery separation, unrolled supersteps replayed.
      // The weighted pair table is the shared per-corpus graph artifact
      // (Shared.coOrderPairWeights) q_triangles cuts at w>=10
      val edges = Shared.coOrderPairWeights(s, dir)
        .filter(col("w") >= 5).select("src", "dst")
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
      // round 13: both ingest halves fold in ONE scan keyed by the half
      // (identical partial rows to the two filtered scans — each
      // (user, window, half) group aggregates exactly its half's events),
      // then the SAME merge proves the partials are mergeable. One corpus
      // scan + one shuffle replaces two of each; oracle re-proven x3 SFs.
      val parts = WindowAgg.hourlyPartials(e,
        pmod(col("event_id"), lit(2)).as("__batch"))
      val merged = WindowAgg.mergeHourlyPartials(parts.drop("__batch"))
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
    "q_hosmer_lemeshow" -> ((s, dir) =>
      // is the miscalibration statistically real? HL chi2 over the
      // same 10 bins, expected = the model's own score sums
      Stats.hosmerLemeshow(
        Tables.events(s, dir)
          .withColumn("score", least(col("value") / 500.0, lit(1.0))),
        "score", col("event_type") === "purchase", bins = 10)),
    "q_isotonic_calibration" -> ((s, dir) =>
      // the monotone remap that FIXES what q_calibration diagnoses:
      // PAVA via the min-max identity over the same 10 bins
      Stats.isotonicCalibration(
        Tables.events(s, dir)
          .withColumn("score", least(col("value") / 500.0, lit(1.0))),
        "score", col("event_type") === "purchase", bins = 10)),
    "q_brier" -> ((s, dir) =>
      // recalibrate or retrain? Murphy split of the Brier score into
      // reliability / resolution / uncertainty over the same bins
      Stats.brierDecomposition(
        Tables.events(s, dir)
          .withColumn("score", least(col("value") / 500.0, lit(1.0))),
        "score", col("event_type") === "purchase", bins = 10)),
    "q_effect_sizes" -> ((s, dir) =>
      // is the purchase-vs-view value gap MEANINGFUL? Cohen's d /
      // Hedges' g / Glass's delta with a 95% CI on d
      Stats.effectSizes(Tables.events(s, dir), "event_type", "value",
        "purchase", "view")),
    "q_target_encoding" -> ((s, dir) =>
      // smoothed mean encoding of event_type against the purchase value —
      // the fitted table a serving join broadcasts
      Encoding.targetEncode(
        Tables.events(s, dir).select(col("event_type"), col("value")),
        "event_type", "value", smoothing = 10.0)),
    "q_target_encoding_oof" -> ((s, dir) =>
      // the leakage-safe form: user-hash folds, each fold's encoding
      // fitted on the other folds only — the table a trainer joins by
      // (event_type, fold(user))
      Encoding.targetEncodeOof(
        Tables.events(s, dir)
          .select(col("event_type"), col("value"), col("user_id")),
        "event_type", "value", "user_id", folds = 5, smoothing = 10.0)),
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
    "q_rate_decomposition" -> ((s, dir) =>
      // why did the high-value rate move: mix shift between event types
      // vs within-type rate changes, Bennet-symmetric, identity-exact
      Eval.rateDecomposition(
        Tables.events(s, dir).select(col("event_type"), col("ts"),
          col("value")),
        "event_type", "ts", col("value") > 150.0,
        cutoff = "2024-01-16")),
    "q_cuped" -> ((s, dir) =>
      // variance-reduced A/B: pre-period revenue as the CUPED covariate
      // (theta on pooled users), adjusted lift + realized var reduction
      Eval.cuped(
        Tables.events(s, dir).select(col("user_id"), col("ts"),
          col("value")),
        "user_id", "ts", "value", cutoff = "2024-01-16")),
    "q_odds_ratio" -> ((s, dir) =>
      // observational association with Wald CIs: do high-value users
      // purchase more often? OR and RR from the user-grain 2x2
      Eval.oddsRatioRR(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("value")),
        "user_id", col("event_type") === "error" && col("value") > 160.0,
        col("event_type") === "purchase" && col("value") > 175.0)),
    "q_fisher_exact" -> ((s, dir) =>
      // the small-sample 2x2: among very large orders, is URGENT
      // priority associated with finished status? exact hypergeometric
      // tails via the bounded log-ratio recurrence (no factorials)
      Eval.fisherExact(
        Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0),
        "o_orderkey", col("o_orderpriority") === "1-URGENT",
        col("o_orderstatus") === "F", maxTerms = 65536)),
    "q_mantel_haenszel" -> ((s, dir) =>
      // stratified 2x2: big-order -> unfinished status association
      // pooled across order priorities; crude OR beside the MH OR is
      // the Simpson's-paradox readout, CI is Robins-Breslow-Greenland
      Eval.mantelHaenszel(Tables.orders(s, dir), "o_orderpriority",
        col("o_totalprice") > 150000.0, col("o_orderstatus") === "F")),
    "q_poisson_rate" -> ((s, dir) =>
      // did the error rate per event change after mid-month? Wald z on
      // the log rate ratio + the conditional binomial z
      Eval.poissonRateTest(Tables.events(s, dir),
        when(col("ts") < lit("2024-01-16").cast("timestamp_ntz"),
          lit("pre")).otherwise(lit("post")),
        "pre", "post", col("event_type") === "error")),
    "q_cochran_armitage" -> ((s, dir) => {
      // does conversion climb with account balance? exact integer trend
      // statistic over acctbal deciles vs has-an-order. The decile
      // window is the entity-grain global sort (the gini caveat); at
      // billions of customers swap ntile for quantile-bin thresholds.
      val scored = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_acctbal"))
        .withColumn("decile", ntile(10).over(
          Window.orderBy(col("c_acctbal"), col("c_custkey"))) - 1)
      val buyers = Tables.orders(s, dir).select(col("o_custkey")).distinct()
      Stats.cochranArmitage(
        scored.join(buyers, col("c_custkey") === col("o_custkey"), "left"),
        "decile", col("o_custkey").isNotNull)
    }),
    "q_cochran_armitage_binned" -> ((s, dir) => {
      // 100 TB twin: fixed-width lattice-bin scores replace the ntile
      // decile sort (value-uniform scoring, stated)
      val buyers = Tables.orders(s, dir).select(col("o_custkey")).distinct()
      Stats.cochranArmitageBinned(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal"))
          .join(buyers, col("c_custkey") === col("o_custkey"), "left"),
        "c_acctbal", col("o_custkey").isNotNull, bins = 10)
    }),
    "q_decision_stump" -> ((s, dir) => {
      // where does account balance best split buyers from non-buyers?
      // full Gini-gain curve over decile boundaries, winner flagged
      val buyers = Tables.orders(s, dir).select(col("o_custkey")).distinct()
      Learn.decisionStump(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal"))
          .join(buyers, col("c_custkey") === col("o_custkey"), "left"),
        "c_custkey", "c_acctbal", col("o_custkey").isNotNull, bins = 10)
    }),
    "q_decision_stump_binned" -> ((s, dir) => {
      // 100 TB twin: fixed-width lattice bins replace the ntile global
      // sort — no corpus sort anywhere, histogram-split posture
      val buyers = Tables.orders(s, dir).select(col("o_custkey")).distinct()
      Learn.decisionStumpBinned(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal"))
          .join(buyers, col("c_custkey") === col("o_custkey"), "left"),
        "c_custkey", "c_acctbal", col("o_custkey").isNotNull, bins = 256)
    }),
    "q_tier_migration" -> ((s, dir) =>
      // week-over-week spend-tier flow matrix with churn column and
      // per-cohort shares — the retention/upsell dashboard
      Olap.tierMigration(Tables.events(s, dir), "user_id", "ts", "value",
        Seq(("low", 0.0), ("mid", 500.0), ("high", 1200.0)))),
    "q_mcnemar" -> ((s, dir) =>
      // paired binary prevalence at the user grain: clicked-ever vs
      // purchased-ever — only the discordant cells carry information
      Eval.mcnemar(
        Tables.events(s, dir).select(col("user_id"), col("event_type")),
        "user_id",
        col("event_type") === "click", col("event_type") === "purchase")),
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
    "q_rmst" -> ((s, dir) =>
      // restricted mean survival time over the first 14 days: exact
      // step integral of the q_kaplan_meier curve
      Eval.rmst(
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"),
            col("value")),
        "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 95.0,
        horizonHours = 336L)),
    "q_competing_risks" -> ((s, dir) =>
      // which resolution wins a user's journey, purchase or error?
      // Aalen-Johansen CIFs splitting the all-cause KM risk correctly
      Eval.competingRisks(
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type")),
        "user_id", "ts",
        col("event_type") === "purchase", col("event_type") === "error")),
    "q_kaplan_meier" -> ((s, dir) =>
      // product-limit survival of time-to-first-high-value-purchase,
      // right-censored at each user's last observed event
      Eval.kaplanMeier(
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"),
            col("value")),
        "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 95.0)),
    "q_shapley_attribution" -> ((s, dir) =>
      // the game-theoretic split next to last-touch and Markov removal:
      // exact Shapley credit per channel over the 2^3 exposure lattice
      Eval.shapleyAttribution(Tables.events(s, dir), "user_id",
        "event_type", Seq("view", "click", "signup"),
        col("event_type") === "purchase")),
    "q_weibull_fit" -> ((s, dir) =>
      // parametric smooth of the KM staircase: Weibull shape/scale via
      // ln(-ln S) OLS, implied median, and the fit R2 honesty check
      Eval.weibullFit(
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"),
            col("value")),
        "user_id", "ts",
        col("event_type") === "purchase" && col("value") > 95.0)),
    "q_capture_recapture" -> ((s, dir) =>
      // how many users exist beyond what either week saw? Chapman
      // two-window census from exact per-user flags
      Stats.chapmanEstimate(Tables.events(s, dir), "user_id",
        col("ts") < lit("2024-01-08").cast("timestamp"),
        col("ts") >= lit("2024-01-08").cast("timestamp") &&
          col("ts") < lit("2024-01-15").cast("timestamp"))),
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
    "q_supplier_pagerank" -> ((s, dir) =>
      // 5-superstep damped PageRank over the shared supplier co-order
      // graph artifact — the declarative Pregel loop, deterministic via
      // fixed iterations
      Graph.pageRank(Shared.coOrderEdges(s, dir), "src", "dst",
          iterations = 5)
        .withColumnRenamed("node", "s_suppkey")),
    "q_supplier_bfs" -> ((s, dir) => {
      // 4-superstep multi-source BFS (min-plus Pregel) over the same
      // co-order graph: hop distance from the seed suppliers — the
      // blast-radius / lineage-closure primitive
      val seeds = Tables.supplier(s, dir)
        .filter(col("s_suppkey") % 17 === 0)
      Graph.bfsHops(Shared.coOrderEdges(s, dir), "src", "dst", seeds,
          "s_suppkey", rounds = 4)
        .withColumnRenamed("node", "s_suppkey")
    }),
    "q_supplier_hits" -> ((s, dir) =>
      // 4-superstep HITS over the co-order graph: lattice-exact
      // normalized hub/authority scores, SQL-replayable recursion
      Graph.hits(Shared.coOrderEdges(s, dir), "src", "dst",
          iterations = 4)
        .withColumnRenamed("node", "s_suppkey")),
    "q_assortativity" -> ((s, dir) =>
      // do well-connected suppliers co-order with each other or with
      // the periphery? Degree-degree Pearson, decimal-exact folds
      Graph.degreeAssortativity(Shared.coOrderEdges(s, dir),
        "src", "dst")),
    "q_modularity" -> ((s, dir) =>
      // is the co-order graph denser within nations than a
      // degree-preserving rewiring? Newman Q by s_nationkey partition
      Graph.modularity(Shared.coOrderEdges(s, dir), "src", "dst",
        Tables.supplier(s, dir), "s_suppkey", "s_nationkey")),
    "q_label_propagation" -> ((s, dir) =>
      // deterministic sync LPA (most-frequent neighbor label, min-label
      // ties, 4 fixed supersteps) — PRODUCES the communities q_modularity
      // grades; per-node community + its size
      Graph.labelPropagation(Shared.coOrderEdges(s, dir), "src", "dst",
          rounds = 4, presymmetrized = true)
        .withColumnRenamed("node", "s_suppkey")),
    "q_uplift_qini" -> ((s, dir) =>
      // does targeting by activity concentrate incremental conversions?
      // per-quintile treated/control rates + cumulative Qini over the
      // hash-randomized arms (band 1 = most active users)
      Eval.upliftBands(Tables.events(s, dir), "user_id",
        col("event_type") === "purchase" && col("value") > 95.0,
        count(lit(1)), bands = 5)),
    "q_offpolicy_eval" -> ((s, dir) =>
      // would "recommend purchase to even users, click to odd" have
      // beaten the logged traffic? DM / IPS / SNIPS / DR estimators
      // from the log alone, every estimator sum on the integer lattice
      Eval.offPolicyEval(
        Tables.events(s, dir).withColumn("target_action",
          when(col("user_id") % 2 === 0, lit("purchase"))
            .otherwise(lit("click"))),
        "event_type", "value", "target_action")),
    "q_harmonic_centrality" -> ((s, dir) => {
      // seed-sampled harmonic centrality of the supplier co-order graph
      // (Σ 1/d from the %17 seed sample, 3 supersteps, lattice-exact).
      // Reads the shared co-order edge artifact: the op distincts its
      // edge input, and the old inline build's multi-edges (one per
      // shared order) distinct to exactly Shared.coOrderEdges' rows
      val seeds = Tables.supplier(s, dir)
        .filter(col("s_suppkey") % 17 === 0)
      Graph.harmonicCentrality(Shared.coOrderEdges(s, dir), "src", "dst",
          seeds, "s_suppkey", rounds = 3)
        .withColumnRenamed("node", "s_suppkey")
    }),
    "q_forecast_baseline" -> ((s, dir) =>
      // the two baselines every forecast must beat: lag-1 naive and
      // lag-7 seasonal-naive over daily revenue, with MAE + MASE folds
      Eval.forecastBaseline(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_holt_winters" -> ((s, dir) =>
      // level+trend+weekly-season smoother over daily revenue: per-day
      // one-step-ahead fit via the bit-exact sequential fold (dyadic
      // weights 1/4, 1/8, 1/4; oracle steps the same recursion)
      Eval.holtWinters(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_lognormal_fit" -> ((s, dir) =>
      // the canonical revenue distribution: MLE on ln(o_totalprice)
      // with the fitted p95 vs the observed exact p95 as the
      // tail-quality readout (the hillTail alternative's counterpart)
      Stats.lognormalFit(Tables.orders(s, dir), "o_totalprice")),
    "q_gpd_tail" -> ((s, dir) =>
      // extreme-value tail: GPD method-of-moments over the p95 excesses
      // with the fitted vs empirical p99.9 as the trust readout
      Stats.gpdTail(Tables.orders(s, dir), "o_totalprice")),
    "q_dtw_distance" -> ((s, dir) => {
      // alignment-tolerant similarity of two nations' monthly revenue:
      // integer DTW with the lockstep L1 beside it; warp_gain >> 0
      // means one series lags the other
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))
      val joined = Tables.orders(s, dir)
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      Eval.dtwDistance(joined, "n_name", to_date(col("o_orderdate")),
        "o_totalprice", unitA = "NATION_1", unitB = "NATION_2")
    }),
    "q_p_chart" -> ((s, dir) =>
      // attribute SPC: daily URGENT-priority share against variable-n
      // 3-sigma binomial limits — the proportion complement of the
      // X-bar/R chart (low-volume days get WIDER fences, not alarms)
      Stats.pChart(Tables.orders(s, dir), to_date(col("o_orderdate")),
        col("o_orderpriority") === "1-URGENT")),
    "q_oaxaca_blinder" -> ((s, dir) =>
      // is the returned-vs-kept price gap composition or pricing?
      // twofold decomposition of the mean extendedprice gap over the
      // quantity covariate, group N as reference
      Eval.oaxacaBlinder(Tables.lineitem(s, dir), "l_returnflag",
        groupA = "R", groupB = "N", xCol = "l_quantity",
        yCol = "l_extendedprice")),
    "q_periodogram" -> ((s, dir) =>
      // which cycle does daily revenue actually carry? spectral power
      // share over candidate periods 2..30 — the detector behind
      // q_seasonality's hardcoded 7
      Eval.periodogram(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_gmm_bic" -> ((s, dir) =>
      // is the second component statistically justified? BIC of the
      // 2-component fit vs the exact-moment single Gaussian on the
      // same lattice histogram
      Learn.gmmBic(Tables.orders(s, dir), "o_totalprice", bins = 256,
        rounds = 3)),
    "q_gmm_em" -> ((s, dir) =>
      // is order value one population or two? 2-component Gaussian EM
      // on the 256-bin lattice histogram, 3 fixed rounds, average
      // log-likelihood riding along
      Learn.gmmEm(Tables.orders(s, dir), "o_totalprice", bins = 256,
        rounds = 3)),
    "q_burst_detection" -> ((s, dir) =>
      // Kleinberg 2-state bursts on daily order volume: a day is
      // "bursting" only when the SUSTAINED surge pays the gamma*ln(n)
      // entry toll — the principled alternative to a threshold fence
      Eval.kleinbergBursts(Tables.orders(s, dir),
        to_date(col("o_orderdate")), s = 2.0, gamma = 0.5)),
    "q_seasonal_anomalies" -> ((s, dir) =>
      // weird days given trend + weekday: seasonality residual fenced
      // at 3 MAD of its own distribution, flagged days only
      Eval.seasonalAnomalies(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice", k = 3.0)),
    "q_holt_winters_forecast" -> ((s, dir) =>
      // the forward readout: 7-day-ahead level + h*trend + season off
      // the fold's final state (same bit-exact recursion)
      Eval.holtWintersForecast(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_max_drawdown" -> ((s, dir) =>
      // worst peak-to-trough decline of daily revenue per priority
      // lane, trough pinned by (drawdown desc, date asc) total order
      Stats.maxDrawdown(Tables.orders(s, dir), "o_orderpriority",
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_synthetic_control" -> ((s, dir) => {
      // the causal-suite capstone: NATION_0's monthly revenue vs a
      // harmonic-weighted synthetic of its 5 closest donors at the
      // declared 1999-01-01 intervention; pre-gap is the placebo
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))
      val joined = Tables.orders(s, dir)
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      Eval.syntheticControl(joined, "n_name",
        to_date(col("o_orderdate")), "o_totalprice",
        treatedUnit = "NATION_0", intervention = "1999-01-01")
    }),
    "q_twfe" -> ((s, dir) => {
      // TWFE panel DiD: nations 0-4 treated at 1999-01-01 on the
      // balanced nation x month grid; the cell-mean DiD rides along —
      // with one group and common timing the two must coincide
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))
      val n = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))
      val joined = Tables.orders(s, dir)
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      Eval.twfe(joined, "n_name", to_date(col("o_orderdate")),
        "o_totalprice",
        treatedUnits = (0 to 4).map(i => s"NATION_$i"),
        intervention = "1999-01-01")
    }),
    "q_ransac_fit" -> ((s, dir) =>
      // robust price-vs-quantity line: 32 hash-seeded 2-point samples,
      // consensus by inlier count at eps=$20k, exact OLS refit on the
      // winning inliers with the naive full OLS beside it
      Learn.ransacLine(
        Tables.lineitem(s, dir).select(
          (col("l_orderkey") * 8 + col("l_linenumber")).as("rid"),
          col("l_quantity"), col("l_extendedprice")),
        "rid", "l_quantity", "l_extendedprice", eps = 20000.0,
        arms = 32)),
    "q_decayed_features" -> ((s, dir) =>
      // the feature-store recency feature: per-user revenue halved
      // every 7 days of age at the 2024-01-31 as-of — pure-integer
      // half-up shifts, order-free exact fold, no pow()
      Stats.decayedSum(Tables.events(s, dir), "user_id",
        to_date(col("ts")), "value", asOf = "2024-01-31",
        halfLifeDays = 7)),
    "q_geo_nearest" -> ((s, dir) =>
      // nearest supplier site within radius 0.08 for every customer on
      // the hash-synthesized [0,1]^2 map: bounded 9-cell fan-out
      // equi-join (never a cross join), exact integer dist^2 cut,
      // unmatched customers carried through as NULL coverage signal
      Geo.gridNearest(
        Geo.hashPoints(Tables.customer(s, dir), "c_custkey", 171L, 172L),
        "c_custkey",
        Geo.hashPoints(Tables.supplier(s, dir), "s_suppkey", 173L, 174L),
        "s_suppkey", radiusMicro = 800000L)),
    "q_geo_catchment" -> ((s, dir) =>
      // the site-capacity view: per supplier site, customers within
      // the radius (zero kept — an unreachable store is the finding)
      // and the nearest one by (dist2, id) total order
      Geo.gridCatchment(
        Geo.hashPoints(Tables.customer(s, dir), "c_custkey", 171L, 172L),
        "c_custkey",
        Geo.hashPoints(Tables.supplier(s, dir), "s_suppkey", 173L, 174L),
        "s_suppkey", radiusMicro = 800000L)),
    "q_lof" -> ((s, dir) =>
      // density-RELATIVE outliers on the customer map: radius-bounded
      // LOF via the 9-cell self-join — exact classical LOF wherever the
      // k-th neighbor is inside the radius, NULL (with n_in_radius
      // exposed) where the neighborhood outruns it
      Geo.gridLof(
        Geo.hashPoints(Tables.customer(s, dir), "c_custkey", 171L, 172L),
        "c_custkey", radiusMicro = 400000L, k = 3)),
    "q_geo_coverage" -> ((s, dir) =>
      // the aggregate readout over q_geo_nearest: match rate + mean
      // in-range distance on the 1e-6 lattice
      Geo.gridCoverage(Geo.gridNearest(
        Geo.hashPoints(Tables.customer(s, dir), "c_custkey", 171L, 172L),
        "c_custkey",
        Geo.hashPoints(Tables.supplier(s, dir), "s_suppkey", 173L, 174L),
        "s_suppkey", radiusMicro = 800000L), "c_custkey")),
    "q_psm_att" -> ((s, dir) =>
      // caliper-matched treatment effect on the treated: value-profile
      // score, purchase-revenue outcome, matched vs naive contrast
      Eval.psmAtt(Tables.events(s, dir), "user_id",
        least(avg(col("value")) / 600.0, lit(1.0)),
        sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(0.0)),
        caliper = 0.02)),
    "q_diff_in_diff" -> ((s, dir) =>
      // causal readout around the 2024-01-15 "launch": arm-by-period
      // cell means + DiD, control drift netting out seasonality
      Eval.diffInDiff(Tables.events(s, dir), "user_id", "ts", "value",
        cutoff = "2024-01-15")),
    "q_iv_wald" -> ((s, dir) =>
      // encouragement design: hash arm z as instrument for the
      // self-selected "heavy user" behavior (>= 30 events), outcome
      // total purchase revenue; LATE = ITT_y / ITT_d with the
      // first-stage-F weak-instrument alarm
      Eval.ivWald(Tables.events(s, dir), "user_id",
        count(lit(1)) >= 30L,
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100, 0).cast("long")).otherwise(0L)))),
    "q_reg_discontinuity" -> ((s, dir) =>
      // sharp RDD at the $300k order-value line: does URGENT-priority
      // share jump at the threshold, or is the local trend smooth?
      Eval.regDiscontinuity(Tables.orders(s, dir), "o_totalprice",
        when(col("o_orderpriority") === "1-URGENT", 1.0).otherwise(0.0),
        cutoff = 300000.0, bandwidth = 100000.0)),
    "q_srm_check" -> ((s, dir) =>
      // read this before any lift number: does the arm split itself
      // deviate from 50/50? chi2(1) at the 0.001 SRM alarm bar
      Eval.sampleRatioCheck(Tables.events(s, dir), "user_id")),
    "q_tost_equivalence" -> ((s, dir) =>
      // the do-no-harm gate: can we SHOW the arms are equal within
      // +-5 dollars of user revenue? two one-sided z tests
      Eval.tostEquivalence(Tables.events(s, dir), "user_id", "value",
        margin = 5.0)),
    "q_permutation_test" -> ((s, dir) =>
      // distribution-free significance for the arm revenue gap: 64
      // hash-seeded re-randomizations, add-one p — no asymptotics
      Eval.permutationTest(Tables.events(s, dir), "user_id", "value")),
    "q_qte" -> ((s, dir) =>
      // broad shift or whale effect? per-decile treat-control quantile
      // gaps across the same hash arms as q_ab_test
      Eval.quantileTreatmentEffects(Tables.events(s, dir), "user_id",
        "value")),
    "q_event_study" -> ((s, dir) =>
      // the per-day view the single DiD number hides: daily ATT around
      // the 2024-01-15 launch, pre-period rows = parallel-trends check
      Eval.eventStudy(Tables.events(s, dir), "user_id", "ts", "value",
        cutoff = "2024-01-15")),
    "q_growth_accounting" -> ((s, dir) =>
      // the weekly active-user ledger: new/retained/resurrected plus
      // churned-into-week; net = new + resurrected - churned
      Eval.growthAccounting(Tables.events(s, dir), "user_id", "ts")),
    "q_cross_correlation" -> ((s, dir) =>
      // does purchase volume lead or lag average order value? CCF at
      // k = -7..7 over the daily series (one fold, all lags at once)
      Stats.crossCorrelation(Tables.events(s, dir), to_date(col("ts")),
        avg(col("value")),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)),
        maxLag = 7)),
    "q_quadratic_trend" -> ((s, dir) =>
      // is revenue accelerating or just rising? quadratic fit with the
      // nested F-test of curvature against the linear model
      Stats.quadraticTrend(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_granger" -> ((s, dir) =>
      // does yesterday's order volume predict today's revenue beyond
      // yesterday's revenue (and the reverse)? nested-OLS F per
      // direction from exact lattice sums
      Stats.grangerLagOne(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_tail_dependence" -> ((s, dir) =>
      // do extremes co-occur? empirical upper/lower tail dependence of
      // (price, quantity) at matched 0.9/0.95/0.99 quantiles
      Stats.tailDependence(Tables.lineitem(s, dir), "l_extendedprice",
        "l_quantity")),
    "q_partial_corr" -> ((s, dir) =>
      // are price and quantity related, or does discount drive both?
      // first-order partial correlation from one exact-lattice fold
      Stats.partialCorr(Tables.lineitem(s, dir), "l_extendedprice",
        "l_quantity", "l_discount")),
    "q_seasonal_mk" -> ((s, dir) =>
      // trend test a weekly cycle can't poison: Mann-Kendall within
      // weekday slots (Hirsch-Slack), per-slot rows + combined -1 row
      Stats.seasonalMannKendall(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_process_capability" -> ((s, dir) =>
      // does the stable process FIT the spec? Cp/Cpk of event values
      // against the declared 0..500 envelope; capable bar 1.33
      Stats.processCapability(Tables.events(s, dir), "value",
        lsl = 0.0, usl = 500.0)),
    "q_turning_points" -> ((s, dir) =>
      // too few local extrema = trend, too many = over-correction:
      // Kendall's turning-points z over the daily revenue series
      Stats.turningPoints(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_chow_test" -> ((s, dir) =>
      // did the revenue trend break at the declared mid-span date?
      // two-segment lattice OLS + the pooled-RSS F ratio
      Stats.chowTest(Tables.orders(s, dir), to_date(col("o_orderdate")),
        "o_totalprice", breakDate = "1995-06-30")),
    "q_negbin_fit" -> ((s, dir) =>
      // Poisson or overdispersed? NB moment fit over per-user lifetime
      // event counts; the population view of q_burstiness
      Stats.negbinFit(Tables.events(s, dir), "user_id")),
    "q_control_chart" -> ((s, dir) =>
      // SPC: is this week out of control or just noise? Shewhart
      // X-bar/R over full 7-day weeks with the n=7 constants
      Stats.controlChart(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_gumbel_maxima" -> ((s, dir) =>
      // how big a revenue day once a year? Gumbel L-moment fit over
      // weekly block maxima with the 52-block return level
      Stats.gumbelMaxima(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_haar_energy" -> ((s, dir) =>
      // which timescale carries the revenue variance: Haar band energy
      // at 2/4/8-day blocks, exact integer details end-to-end
      Stats.haarEnergy(Tables.orders(s, dir), to_date(col("o_orderdate")),
        "o_totalprice", levels = 3)),
    "q_wilcoxon_signed" -> ((s, dir) =>
      // paired per-user shift at the DiD cutoff: did each user's total
      // spend move, rank-weighted — robust where a means test is
      // dragged by a few heavy users moving the other way
      Stats.wilcoxonSignedRank(Tables.events(s, dir), "user_id",
        to_date(col("ts")), "value", cutoff = "2024-01-15")),
    "q_sign_test" -> ((s, dir) =>
      // week-over-week shift with an EXACT binomial p (no normal
      // approximation): daily event value vs 7 positions earlier
      Stats.signTest(Tables.events(s, dir), to_date(col("ts")),
        "value", lagK = 7)),
    "q_white_test" -> ((s, dir) =>
      // does the noise grow with volume? White LM = n*R2 of e^2 on
      // (x, x^2) against the chi2(2) 5% critical value
      Stats.whiteTest(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_cointegration" -> ((s, dir) =>
      // do daily revenue and order volume share a trend, or does their
      // spread wander? Engle-Granger: lattice OLS + 1e-6 residual
      // lattice + exact ADF(0) folds
      Stats.cointegration(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_durbin_watson" -> ((s, dir) =>
      // serial correlation of the DETRENDED daily revenue: DW around 2
      // is clean, toward 0 the trend CI is overconfident
      Stats.durbinWatson(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_runs_test" -> ((s, dir) =>
      // are daily revenue up/down moves random, or do up-days cluster?
      // Wald-Wolfowitz runs over exact centi-lattice sign moves
      Stats.runsTest(Tables.orders(s, dir), to_date(col("o_orderdate")),
        "o_totalprice")),
    "q_jarque_bera" -> ((s, dir) =>
      // can value take normal-theory tests at all: skew/kurtosis from
      // exact raw moments, JB = n/6 (S^2 + K^2/4)
      Stats.jarqueBera(Tables.events(s, dir), "value")),
    "q_hill_tail" -> ((s, dir) =>
      // how heavy is the revenue tail: Hill exponent over the top-100
      // customers — alpha <= 2 means infinite-variance planning territory
      Stats.hillTail(Tables.orders(s, dir), "o_custkey", "o_totalprice",
        k = 100)),
    "q_abc_parts" -> ((s, dir) =>
      // Pareto working answer for the catalog: parts classed A/B/C by
      // cumulative revenue share, exact integer boundaries at 80/95
      Stats.abcClassification(Tables.lineitem(s, dir), "l_partkey",
        "l_extendedprice")),
    "q_kendall_tau" -> ((s, dir) =>
      // pair-concordance of daily order volume and daily revenue:
      // tie-corrected tau-b from exact integer pair comparisons
      Stats.kendallTau(Tables.orders(s, dir),
        to_date(col("o_orderdate")),
        count(lit(1)).cast("long"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")))),
    "q_cramers_v" -> ((s, dir) =>
      // association strength between document language and source on a
      // 0..1 scale, with the Bergsma small-sample bias correction
      Stats.cramersV(Tables.documents(s, dir), "lang", "source")),
    "q_crosstab_residuals" -> ((s, dir) =>
      // WHICH lang x source cells drive the association: standardized
      // and adjusted Pearson residuals per observed cell
      Stats.crosstabResiduals(Tables.documents(s, dir), "lang",
        "source")),
    "q_cochran_q" -> ((s, dir) =>
      // did the same users keep purchasing week over week? Cochran's Q
      // across the four declared week slots, full-roster semantics
      Stats.cochranQ(Tables.events(s, dir), "user_id",
        floor((dayofmonth(col("ts")) - 1) / 7),
        col("event_type") === "purchase", Seq(0, 1, 2, 3))),
    "q_skyline_parts" -> ((s, dir) =>
      // the price-vs-size Pareto frontier over parts: nothing cheaper
      // is at least as large, nothing as cheap is larger
      Olap.skyline2D(Tables.part(s, dir), "p_partkey", "p_retailprice",
        "p_size")),
    "q_brown_forsythe" -> ((s, dir) =>
      // variance-homogeneity gate: do event types have equal value
      // SPREAD? median-centered deviations on the micro lattice
      Stats.brownForsythe(Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_weighted_median" -> ((s, dir) =>
      // the median DOLLAR's line price, not the median LINE's: price
      // weighted by quantity per return flag, exact integer election
      Stats.weightedMedian(Tables.lineitem(s, dir), "l_returnflag",
        "l_extendedprice", "l_quantity")),
    "q_cliffs_delta" -> ((s, dir) =>
      // HOW MUCH do purchase and view values differ: ordinal effect
      // size from exact distinct-value dominance counts
      Stats.cliffsDelta(Tables.events(s, dir), "event_type", "value",
        "purchase", "view")),
    "q_cliffs_delta_binned" -> ((s, dir) =>
      // 100 TB twin: dominance folds over <=1000 lattice bins instead
      // of the data-sized distinct-value axis
      Stats.cliffsDeltaBinned(Tables.events(s, dir), "event_type",
        "value", "purchase", "view")),
    "q_weighted_median_binned" -> ((s, dir) =>
      // 100 TB twin of q_weighted_median: per-group election over one
      // shared <=1000-bin grid; median within one bin width
      Stats.weightedMedianBinned(Tables.lineitem(s, dir), "l_returnflag",
        "l_extendedprice", "l_quantity")),
    "q_friedman" -> ((s, dir) =>
      // blocked rank ANOVA: do event types differ in daily revenue once
      // day-level shifts are absorbed? exact within-day 2x-midranks
      Stats.friedman(Tables.events(s, dir), to_date(col("ts")),
        "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_kruskal_wallis" -> ((s, dir) =>
      // nonparametric ANOVA: do value distributions differ across event
      // types at all? exact 2x-midrank sums, fixed-order H combine
      Stats.kruskalWallis(Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_kruskal_wallis_binned" -> ((s, dir) =>
      // 100 TB twin: 2x-midranks at the <=1000-bin grain, bounded
      // ordered window; within-bin values are exact ties
      Stats.kruskalWallisBinned(Tables.events(s, dir), "event_type",
        "value", Seq("view", "click", "purchase", "signup", "error"))),
    "q_jonckheere" -> ((s, dir) =>
      // do values INCREASE along the funnel order? ordered-alternative
      // trend test, 2U exact from count-grain folds, tie-corrected z
      Stats.jonckheereTerpstra(Tables.events(s, dir), "event_type",
        "value", Seq("view", "click", "signup", "purchase"))),
    "q_page_trend" -> ((s, dir) =>
      // do daily revenues increase along the funnel WITHIN each day
      // block? Page's L over within-day 2x-midranks
      Stats.pageTrend(Tables.events(s, dir), to_date(col("ts")),
        "event_type", "value",
        Seq("view", "click", "signup", "purchase"))),
    "q_anova" -> ((s, dir) =>
      // parametric companion: classic F + eta2/omega2 effect sizes +
      // Welch's heteroscedastic F, all from one lattice-exact fold
      Stats.anovaOneWay(Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_mann_whitney" -> ((s, dir) =>
      // do purchase values stochastically dominate views? exact
      // 2x-midrank U, tie-corrected z, effect size r
      Stats.mannWhitney(Tables.events(s, dir), "event_type", "value",
        "purchase", "view")),
    "q_mann_whitney_binned" -> ((s, dir) =>
      // 100 TB twin: U/z/r from bin-grain midranks; dominance direction
      // preserved when |z| clears the coarsening noise
      Stats.mannWhitneyBinned(Tables.events(s, dir), "event_type",
        "value", "purchase", "view")),
    "q_ansari_bradley" -> ((s, dir) =>
      // rank dispersion test: are purchase values more SPREAD than
      // views? center-folded scores, tie-honest conditional moments
      Stats.ansariBradley(Tables.events(s, dir), "event_type", "value",
        "purchase", "view")),
    "q_mood_median" -> ((s, dir) =>
      // coarsest k-sample location test: above/below the exact pooled
      // median, outlier-proof 2xk chi-square
      Stats.moodMedian(Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_van_der_waerden" -> ((s, dir) =>
      // normal-scores rank ANOVA: near-parametric power, rank
      // robustness — probit midrank scores on the shared fixed tree
      Stats.vanDerWaerden(Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_van_der_waerden_binned" -> ((s, dir) =>
      // 100 TB twin (kruskal_wallis_binned contract)
      Stats.vanDerWaerdenBinned(Tables.events(s, dir), "event_type",
        "value", Seq("view", "click", "purchase", "signup", "error"))),
    "q_fligner_killeen" -> ((s, dir) =>
      // rank dispersion across all 5 event types: half-normal scores
      // of |v - group median|, the outlier-proof rung above bartlett
      Stats.flignerKilleen(Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_fligner_killeen_binned" -> ((s, dir) =>
      // 100 TB twin: deviations from the bin representative (__binv)
      Stats.flignerKilleenBinned(Tables.events(s, dir), "event_type",
        "value", Seq("view", "click", "purchase", "signup", "error"))),
    "q_kpss" -> ((s, dir) =>
      // stationarity null: is daily revenue mean-stable? Bartlett
      // long-run variance at the weekly lag window, eta vs 0.463
      Stats.kpss(Tables.orders(s, dir), to_date(col("o_orderdate")),
        "o_totalprice")),
    "q_adf" -> ((s, dir) =>
      // unit-root null (the kpss complement): constant + 1 aug lag,
      // exact centered-moment Cramer solve, t vs -2.863
      Stats.adfTest(Tables.orders(s, dir), to_date(col("o_orderdate")),
        "o_totalprice")),
    "q_dunn_test" -> ((s, dir) =>
      // post-hoc pairwise drill-down after kruskal_wallis rejects:
      // shared-pool midrank z per pair, |z| rank = the BH ordering
      Stats.dunnTest(Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_dunn_test_binned" -> ((s, dir) =>
      // 100 TB twin: bin-grain midranks (the kruskal_wallis_binned
      // contract), pairwise z's within the one-bin relocation bound
      Stats.dunnTestBinned(Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_bartlett" -> ((s, dir) =>
      // parametric equal-variance test across the 5 event types: max
      // power under normality, the ladder rung above brown_forsythe
      Stats.bartlett(Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_dagostino_k2" -> ((s, dir) =>
      // normality omnibus with separately-calibrated skew/kurtosis z's
      // (the moderate-n repair of jarque_bera's asymptotic chi2)
      Stats.dagostinoK2(Tables.events(s, dir), "value")),
    "q_cronbach_alpha" -> ((s, dir) =>
      // internal consistency of the 4-item lineitem numeric battery:
      // raw + standardized alpha with the mean inter-item correlation
      Stats.cronbachAlpha(Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),
    "q_brunner_munzel" -> ((s, dir) =>
      // rank Behrens-Fisher: relative effect P(purchase<view)+ties/2
      // with per-group placement variances and Welch-style df
      Stats.brunnerMunzel(Tables.events(s, dir), "event_type", "value",
        "purchase", "view")),
    "q_welch_ttest" -> ((s, dir) =>
      // the classic named two-sample test: Welch t and df with a CI on
      // the raw purchase-vs-view value gap
      Stats.welchTTest(Tables.events(s, dir), "event_type", "value",
        "purchase", "view")),
    "q_daily_bars" -> ((s, dir) =>
      // OHLC candlesticks + VWAP + day-over-day return for the event
      // value stream; open/close elected exactly in (ts, id) order
      Olap.dailyBars(Tables.events(s, dir), "ts", "event_id", "value")),
    "q_price_index" -> ((s, dir) =>
      // like-for-like 1994->1995 price movement over the matched part
      // basket: Laspeyres / Paasche / Fisher from lattice cross terms
      Olap.priceIndex(
        Tables.lineitem(s, dir).join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey")),
        "l_partkey", "l_quantity", "l_extendedprice",
        year(col("o_orderdate")) === 1994,
        year(col("o_orderdate")) === 1995)),
    "q_regression_influence" -> ((s, dir) =>
      // which days steer the revenue trend line? leverage, standardized
      // residuals, Cook's D per day with the 4/n flag
      Stats.regressionInfluence(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_tukey_hsd" -> ((s, dir) =>
      // the post-hoc drill-down: which event-type pairs differ?
      // studentized-range q per pair from the same lattice fold
      Stats.tukeyHsd(Tables.events(s, dir), "event_type", "value",
        Seq("view", "click", "purchase", "signup", "error"))),
    "q_icc" -> ((s, dir) =>
      // are event values user-clustered? ICC(1) over the unbounded
      // user grouping — the per-event-tests-overstate-n warning light
      Stats.iccOneWay(Tables.events(s, dir), "user_id", "value")),
    "q_retention_halflife" -> ((s, dir) => {
      // one number per cohort: weeks to lose half the active users —
      // exponential fit of the weekly retention curve
      val e = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = e.groupBy("user_id")
        .agg(date_trunc("week", min(col("day"))).cast("date")
          .as("cohort_week"))
      val act = e.select(col("user_id"),
        date_trunc("week", col("day")).cast("date").as("act_week"))
        .distinct()
      val ret = act.join(first, Seq("user_id"))
        .withColumn("week_offset",
          (datediff(col("act_week"), col("cohort_week")) / 7).cast("int"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("n_users"))
      val base0 = ret.filter(col("week_offset") === 0)
        .select(col("cohort_week"), col("n_users").as("base"))
      val rates = ret.filter(col("week_offset") >= 1)
        .join(base0, Seq("cohort_week"))
        .select(col("cohort_week"), col("week_offset"),
          (col("n_users").cast("double") / col("base").cast("double"))
            .as("rate"))
      Stats.expDecayPerKey(rates, "cohort_week", "week_offset", "rate")
    }),
    "q_entropy_profile" -> ((s, dir) =>
      // information content per column: entropy / normalized entropy /
      // modal share — the default-value-flood detector
      Quality.entropyProfile(
        Tables.events(s, dir).select(col("event_type"),
          to_date(col("ts")).as("event_day"),
          hour(col("ts")).as("event_hour")),
        Seq("event_type", "event_day", "event_hour"))),
    "q_ljung_box" -> ((s, dir) =>
      // any autocorrelation in the first 14 lags of daily revenue? the
      // portmanteau gate on i.i.d. assumptions
      Stats.ljungBox(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice", maxLag = 14)),
    "q_hurst" -> ((s, dir) =>
      // long-range dependence of daily revenue: R/S rescaled-range
      // slope — H>0.5 persistent, <0.5 mean-reverting
      Stats.hurstRS(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_seasonal_strength" -> ((s, dir) =>
      // is the weekly pattern real: Hyndman F_s over the decomposition,
      // components on the centi lattice
      Eval.seasonalStrength(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_burstiness" -> ((s, dir) =>
      // active-day dispersion per user: Fano factor of daily counts
      Stats.burstiness(Tables.events(s, dir), "user_id", "ts")),
    "q_mann_kendall" -> ((s, dir) =>
      // nonparametric monotone-trend test on daily revenue: exact pair
      // signs on the centi lattice, tie-corrected variance, z
      Stats.mannKendall(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_changepoint" -> ((s, dir) =>
      // the most likely level-shift day of daily revenue: argmax of the
      // exact integer |n*S_k - k*S_n| with before/after means
      Drift.changepoint(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice")),
    "q_pinball_loss" -> ((s, dir) =>
      // quantile scoring of the seasonal-naive path: pinball loss at
      // q=0.1/0.5/0.9 over daily revenue, per-day losses lattice-exact
      Eval.pinballLoss(Tables.orders(s, dir),
        to_date(col("o_orderdate")), "o_totalprice",
        Seq(0.1, 0.5, 0.9), season = 7)),
    "q_benford" -> ((s, dir) =>
      // Benford first-digit audit of order totals: observed vs
      // log10(1+1/d) shares with per-digit and total chi-square
      Quality.benford(Tables.orders(s, dir), "o_totalprice")),
    "x_silhouette" -> ((s, dir) =>
      // centroid-silhouette cluster quality of the labeled embedding
      // partition: per-label intra/nearest-other distance and score
      Similarity.silhouette(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label")),
    "x_grid_density_clusters" -> ((s, dir) =>
      // DBSCAN's cell-grid relaxation with NO distance join: eps-cells,
      // dense >= 3, 8-adjacency CC; noise remainder rides as -1
      Clustering.gridDensityClusters(Tables.embeddings(s, dir),
        "embedding", eps = 0.02, minPts = 3)),
    "x_kmeans" -> ((s, dir) =>
      // deterministic Lloyd k-means (id-ordered seeds, fixed supersteps,
      // lowest-cluster tie rule) — assignment + distance per vector
      Clustering.kmeans(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iterations = 3)),
    "x_cluster_purity" -> ((s, dir) =>
      // did unsupervised structure find the labels: purity + NMI of the
      // same Lloyd run against the ground-truth label column
      Clustering.clusterPurity(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label", k = 8, iterations = 3)),
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
    "q_theil" -> ((s, dir) =>
      // is customer-revenue inequality a nation story or a within-nation
      // story? additive Theil T split, lattice-exact folds
      Stats.theilDecomposition(
        Tables.orders(s, dir)
          .join(Tables.customer(s, dir),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.nation(s, dir),
            col("c_nationkey") === col("n_nationkey")),
        "n_name", "o_custkey", "o_totalprice")),
    "q_lorenz" -> ((s, dir) =>
      // the full concentration curve behind the Gini number: cumulative
      // entity vs value share per revenue decile, diagonal gaps
      Stats.lorenzCurve(Tables.orders(s, dir), "o_custkey",
        "o_totalprice")),
    "q_inequality_ratios" -> ((s, dir) =>
      // the distribution summary next to gini/lorenz: bottom-50%/
      // top-10%/top-1% shares, Palma and S80/S20 ratios, one row
      Stats.inequalityRatios(Tables.orders(s, dir), "o_custkey",
        "o_totalprice")),
    "q_inequality_binned" -> ((s, dir) =>
      // billions-of-entities twin: Lorenz over <=1000 lattice bins of
      // the per-customer totals, whole-bin quantile shares
      Stats.inequalityRatiosBinned(Tables.orders(s, dir), "o_custkey",
        "o_totalprice")),
    "q_wilson_ci" -> ((s, dir) =>
      // per-cohort purchase conversion with the small-n-honest Wilson
      // score interval (user-grain trials, pmod cohorts)
      Stats.wilsonIntervals(Tables.events(s, dir),
        pmod(col("user_id"), lit(8L)), "user_id",
        col("event_type") === "purchase")),
    "q_bradley_terry" -> ((s, dir) => {
      // who wins head-to-head: supplier with the larger revenue share
      // on each shared order; BT credits wins by opponent strength
      // (win COUNTS misrank under uneven schedules).
      // Matchup build: per-(order, supplier) cent sums self-joined on
      // the order key. A one-shuffle collect_list + HOF pair generator
      // was measured in round 12 and REJECTED (4.4 s vs 3.4 s warm —
      // the interpreted lambda / per-element array-copy overhead costs
      // more than the shuffle it saves); the self-join keeps every
      // operator codegen'd.
      // one-exchange prep (the cfKept pattern): cluster by the order
      // key once — hashpartitioning(ok) satisfies the (ok, sk)
      // aggregation's distribution AND both self-join sides, so the
      // (ok, sk) exchange disappears (measured 1.8 -> 1.3 s warm; the
      // cent sum is an exact integer fold, order-free)
      val rev = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          round(col("l_extendedprice") *
            (lit(1.0) - col("l_discount")) * 100, 0).cast("long").as("c"))
        .repartition(col("ok"))
        .groupBy(col("ok"), col("sk")).agg(sum(col("c")).as("rev"))
      val comps = rev.as("a").join(rev.as("b"),
          col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
        .filter(col("a.rev") =!= col("b.rev"))
        .select(when(col("a.rev") > col("b.rev"), col("a.sk"))
            .otherwise(col("b.sk")).as("winner"),
          when(col("a.rev") > col("b.rev"), col("b.sk"))
            .otherwise(col("a.sk")).as("loser"))
      Learn.bradleyTerry(comps, "winner", "loser", iterations = 4)
    }),
    "q_topsis_suppliers" -> ((s, dir) => {
      // rank suppliers by revenue AND order volume AND discount spend
      // at once: TOPSIS closeness to the ideal point, exact lattices
      val per = Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("s_suppkey"))
        .agg(sum(round(col("l_extendedprice") *
            (lit(1.0) - col("l_discount")) * 100, 0).cast("long"))
          .as("revenue"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          sum(round(col("l_discount") * 10000, 0).cast("long"))
            .as("discount_bp"))
      Olap.topsis(per, "s_suppkey", Seq(("revenue", true),
        ("n_orders", true), ("discount_bp", false)))
    }),
    "q_hhi" -> ((s, dir) =>
      // supply concentration per nation market: HHI over supplier
      // revenue shares, effective-competitor count, leader share
      Stats.herfindahl(
        Tables.lineitem(s, dir)
          .join(Tables.supplier(s, dir),
            col("l_suppkey") === col("s_suppkey"))
          .join(Tables.nation(s, dir),
            col("s_nationkey") === col("n_nationkey"))
          .withColumn("rev",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        "n_name", "s_suppkey", "rev")),
    "q_woe_encoding" -> ((s, dir) =>
      // weight-of-evidence of event_type for predicting high-value
      // events, with the information-value feature-power total
      Encoding.woeEncode(
        Tables.events(s, dir).select(col("event_type"), col("value")),
        "event_type", col("value") > 90.0)),
    "q_triangles" -> ((s, dir) => {
      // community density of the strong co-order supplier graph (pairs
      // sharing >= 10 orders): per-node triangles + clustering coeff —
      // the w>=10 cut of the shared weighted pair artifact
      val edges = Shared.coOrderPairWeights(s, dir)
        .filter(col("w") >= 10).select("src", "dst")
      Graph.triangleCounts(edges, "src", "dst")
        .withColumnRenamed("node", "s_suppkey")
    }),
    "q_link_prediction" -> ((s, dir) => {
      // which parts SHOULD be co-ordered but weren't: top-500
      // common-neighbor / Adamic-Adar / Jaccard non-edges of the 1995
      // part co-order graph (the year slice keeps the graph sparse at
      // every SF — the full-history projection saturates into a clique)
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1996-01-01").cast("timestamp_ntz"))
      val base = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey").as("bk"), col("l_partkey").as("sk"))
        .distinct()
      val edges = base.as("a").join(base.as("b"),
          col("a.bk") === col("b.bk") && col("a.sk") < col("b.sk"))
        .select(col("a.sk").as("src"), col("b.sk").as("dst"))
      Graph.linkPrediction(edges, "src", "dst", minCommon = 2, topK = 500)
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

    "q_randomized_response" -> ((s, dir) =>
      // local-DP prevalence of "ever hit an error": seeded forced-
      // response mechanism + deconvolved estimate next to the truth
      Privacy.randomizedResponse(Tables.events(s, dir), "user_id",
        col("event_type") === "error", p = 0.75)),
    "q_spearman" -> ((s, dir) =>
      // monotone association of quantity and line price: exact integer
      // midranks (2x lattice), Pearson alongside for the contrast
      Stats.spearman(Tables.lineitem(s, dir), "l_quantity",
        "l_extendedprice")),
    "q_spearman_binned" -> ((s, dir) =>
      // 100 TB twin: per-axis <=1000-bin grids bound both midrank
      // windows; pearson on the bin representatives
      Stats.spearmanBinned(Tables.lineitem(s, dir), "l_quantity",
        "l_extendedprice")),
    "q_mrr" -> ((s, dir) =>
      // first-relevant-hit retrieval metrics per user, same ranking
      // convention as q_ndcg
      Eval.mrrAtK(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            col("event_type")),
        "user_id", "event_id", "value",
        col("event_type") === "purchase" && col("value") > 90.0, k = 10)),
    "q_precision_recall" -> ((s, dir) =>
      // full ranked-retrieval report card per user: P@10, R@10, exact
      // lcm-rational AP, corpus MAP — same relevance rule as q_mrr
      Eval.precisionRecallAtK(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            col("event_type")),
        "user_id", "event_id", "value",
        col("event_type") === "purchase" && col("value") > 90.0, k = 10)),
    "q_dp_histogram" -> ((s, dir) =>
      // ε=0.5 DP release of the event-type histogram: two-sided
      // geometric noise seeded per category through the shared minstd
      // stream — reproducible, oracle-checkable, unclamped
      Privacy.dpHistogram(Tables.events(s, dir), "event_type",
        epsilon = 0.5)),
    "q_dp_mean" -> ((s, dir) =>
      // ε=1 DP mean of clipped event value via the sum/count
      // decomposition (ε/2 each), exact mean beside it for the audit
      Privacy.dpMean(Tables.events(s, dir), "value", lo = 0.0,
        hi = 500.0, epsilon = 1.0)),

    // ---- declared functional-dependency audit (TANE g3 measure) ------------
    "q_fd_audit" -> ((s, dir) =>
      // key -> attribute holds; is totalprice a candidate key?;
      // behavioral attributes don't — the schema-inference readout
      Quality.fdAudit(Tables.orders(s, dir), Seq(
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderstatus"),
        ("o_orderstatus", "o_orderpriority"),
        ("o_totalprice", "o_orderkey")))),

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

    // ---- small-file compaction planning (OPTIMIZE as a query) --------------
    "q_compaction_plan" -> ((s, dir) => {
      // synthesize a realistic manifest (per-day shard files with
      // payload-sum sizes), then plan 4 KiB target bins per day
      val manifest = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("d"),
          (col("user_id") % 16).as("f"))
        .agg(sum(length(col("props")) + 64).cast("long").as("b"))
      Sampling.compactionPlan(manifest, "d", "f", "b", targetBytes = 4096L)
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
      // trainer as pure dataflow, superstep-replayed by the oracle.
      // The fit + scored table are the shared per-corpus artifacts all
      // five x_lr_* entries read (Shared.lrWeights / lrScored)
      Shared.lrScored(s, dir)),
    "x_label_noise" -> ((s, dir) => {
      // confident-learning screen (Northcutt's class-conditional
      // thresholds): a row is a label-error candidate when its predicted
      // prob crosses the MEAN prob of the opposite class — flags the
      // examples the trained scorer is confident were mislabeled
      val scored = Shared.lrScored(s, dir)
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
      Eval.calibration(Shared.lrScored(s, dir), "prob", "y", bins = 10)),
    "x_lr_importance" -> ((s, dir) =>
      // which embedding dims the quality filter actually uses:
      // standardized-coefficient importance |w|·std, rank on the
      // rounded score (the one consumer that needs the WEIGHTS, not
      // the scored rows — it reads the pinned fit)
      Learn.logisticImportance(Tables.embeddings(s, dir), "vec_id",
        "embedding", col("label") >= 5, eta = 0.5, iterations = 3,
        wPinned = Some(Shared.lrWeights(s, dir)))),
    "x_lr_metrics" -> ((s, dir) =>
      // training-run report chained from the ROUNDED margins (the
      // cross-engine-stable quantity): accuracy + mean log-loss
      Learn.logisticMetrics(Shared.lrScored(s, dir))),
  )
}
