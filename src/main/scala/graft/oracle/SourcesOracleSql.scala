package graft
package oracle

/** DuckDB oracle SQL — sources/sinks and storage-layout queries (SourcesRegistry). One domain slice of the former
  * monolithic OracleSql map; entries are verbatim, parity rules on
  * [[graft.OracleSql]].
  */
private[graft] object SourcesOracleSql {
  import OracleShared._

  val sql: Map[String, String] = Map(

    "g_profiles" -> s"""
      WITH $profilesCte
      SELECT c_custkey, user_id, country, subscription_tier, age,
             signup_days_ago, activity_weight
      FROM prof ORDER BY c_custkey""",


    // Efraimidis–Spirakis: priority u^(1/w), top-n win; same u01 hash
    // and the reconstructed profiles CTE on both sides
    "g_weighted_sample" -> s"""
      WITH $profilesCte,
      p AS (SELECT c_custkey, activity_weight,
                   round(pow(${uk("c_custkey", 43)},
                     1.0 / activity_weight), 6) AS pr
            FROM prof WHERE activity_weight > 0),
      sel AS (SELECT c_custkey, activity_weight FROM p
              ORDER BY pr DESC, c_custkey LIMIT 100)
      SELECT c_custkey, activity_weight FROM sel ORDER BY c_custkey""",


    // G6: random.choices-with-weights parity — integer-scaled cumulative
    // weights (exact in both engines), target = u01(draw)·total, interval
    // containment join (the Spark side replaces this theta join with a
    // bucketized equi-join producing the identical match)
    "g_weighted_pick" -> s"""
      WITH $profilesCte,
      w AS (SELECT c_custkey,
                   CAST(round(activity_weight * 1e6) AS BIGINT) AS wi
            FROM prof WHERE round(activity_weight * 1e6) > 0),
      cum AS (SELECT c_custkey, wi,
                     CAST(sum(wi) OVER (ORDER BY c_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS hi
              FROM w),
      tot AS (SELECT CAST(sum(wi) AS BIGINT) AS total FROM w),
      d AS (SELECT CAST(gs.g AS BIGINT) AS draw_id
            FROM generate_series(1, 2000) gs(g)),
      t AS (SELECT draw_id, ${uk("draw_id", 41)} * total AS target
            FROM d, tot)
      SELECT t.draw_id, c.c_custkey
      FROM t JOIN cum c ON c.hi - c.wi < t.target AND t.target <= c.hi
      ORDER BY draw_id""",


    "s_csv_roundtrip" -> """
      SELECT c_custkey, c_name, c_mktsegment, c_acctbal
      FROM customer ORDER BY c_custkey""",


    // malformed-JSON audit: every event_id % 7 = 0 payload invalidated;
    // oracle recomputes the split + clean k sum from the source
    "p_json_malformed" -> s"""
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_parsed,
             CAST(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_corrupt,
             CAST(sum(CASE WHEN event_id % 7 <> 0 THEN $k ELSE 0 END)
               AS BIGINT) AS clean_k_sum
      FROM events""",


    // malformed-CSV audit: every custkey % 10 = 0 row was text-corrupted
    // (unparseable double), so the oracle recomputes the clean/corrupt
    // split and the clean-side sum from the source table directly
    "s_csv_malformed" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN c_custkey % 10 <> 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clean,
             CAST(sum(CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_corrupt,
             round(sum(CASE WHEN c_custkey % 10 <> 0 THEN c_acctbal
               ELSE 0 END), 6) AS clean_acctbal_sum
      FROM customer""",


    // ORC round trip is lossless for these types; oracle reads the
    // parquet original directly
    "s_orc_roundtrip" -> """
      SELECT c_custkey, c_name, c_mktsegment, c_acctbal
      FROM customer ORDER BY c_custkey""",


    "s_json_roundtrip" -> """
      SELECT c_custkey, c_name, c_mktsegment, c_acctbal
      FROM customer ORDER BY c_custkey""",


    "s_offline_store" -> """
      SELECT event_id, user_id, event_type, value FROM events
      WHERE CAST(ts AS DATE) = DATE '2024-01-15' ORDER BY event_id""",


    // footer value counts must reconcile with row counts per column —
    // the schema roster is the corpus contract (a drifted file layout
    // or schema fails the compare loudly)
    "s_parquet_footer" -> Seq("event_id", "event_type", "props", "ts",
        "user_id", "value")
      .map(c => s"SELECT '$c' AS column_name, " +
        "CAST(count(*) AS BIGINT) AS num_values FROM events")
      .mkString("", " UNION ALL ", " ORDER BY column_name"),


    "s_partition_probe" -> """
      SELECT DISTINCT CAST(ts AS DATE) AS event_date FROM events
      ORDER BY event_date DESC LIMIT 7""",


    // the JDBC registry round trip is identity-preserving (write →
    // partitioned read → freshness fold → registry write → read), so the
    // oracle is the direct per-view freshness aggregate off the raw table
    "s_jdbc_registry" -> """
      SELECT event_type AS feature_view_name, max(ts) AS last_updated_at,
             count(*) AS row_count, round(sum(value), 6) AS value_sum
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type ORDER BY feature_view_name""",


    // embedded-KV online store: out-of-order + replayed upserts must
    // converge to the plain latest-per-key window over the full history
    "s_kv_store" -> """
      WITH f AS (
        SELECT user_id, ts, event_id, value, event_type FROM events
        WHERE event_type IN ('click', 'purchase')),
      r AS (
        SELECT user_id, ts, event_id, value, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM f)
      SELECT user_id, ts AS feature_ts, event_id, round(value, 6) AS value,
             event_type
      FROM r WHERE rn = 1 ORDER BY user_id""",


    "g_events" -> s"""
      WITH seqd AS (
        SELECT c_custkey, CAST(gs.sq AS INTEGER) AS sq,
               c_custkey * 3 + gs.sq AS ek
        FROM customer CROSS JOIN generate_series(1, 3) gs(sq)),
      typed AS (
        SELECT c_custkey, sq, ek,
               CASE WHEN ${uk("ek", 11)} <= 0.50 THEN 'view'
                    WHEN ${uk("ek", 11)} <= 0.80 THEN 'click'
                    WHEN ${uk("ek", 11)} <= 0.95 THEN 'cart'
                    ELSE 'purchase' END AS event_type
        FROM seqd)
      SELECT c_custkey, sq, event_type,
             CASE WHEN event_type = 'view'
               THEN CAST(floor(${uk("ek", 12)} * 118) + 3 AS INTEGER) END
               AS view_duration_sec,
             CASE WHEN event_type = 'click'
               THEN CAST(floor(${uk("ek", 13)} * 20) + 1 AS INTEGER) END
               AS click_position,
             CASE WHEN event_type = 'click' THEN
               (CASE WHEN ${uk("ek", 14)} <= 0.2 THEN 'search'
                     WHEN ${uk("ek", 14)} <= 0.4 THEN 'recommendation'
                     WHEN ${uk("ek", 14)} <= 0.6 THEN 'homepage'
                     WHEN ${uk("ek", 14)} <= 0.8 THEN 'email'
                     ELSE 'direct' END) END AS referrer,
             CASE WHEN event_type IN ('cart', 'purchase')
               THEN CAST(floor(${uk("ek", 15)} * 5) + 1 AS INTEGER) END
               AS quantity,
             CASE WHEN event_type = 'purchase'
               THEN round(${uk("ek", 16)} * (499.99 - 9.99) + 9.99, 6) END
               AS price
      FROM typed ORDER BY c_custkey, sq""",


    "q_reference_pipeline" -> s"""
      WITH seqd AS (
        SELECT c_custkey, CAST(gs.sq AS INTEGER) AS sq,
               c_custkey * 8 + gs.sq AS ek
        FROM customer CROSS JOIN generate_series(1, 8) gs(sq)),
      typed AS (
        SELECT c_custkey, sq, ek,
               CASE WHEN ${uk("ek", 11)} <= 0.50 THEN 'view'
                    WHEN ${uk("ek", 11)} <= 0.80 THEN 'click'
                    WHEN ${uk("ek", 11)} <= 0.95 THEN 'cart'
                    ELSE 'purchase' END AS event_type,
               CASE WHEN ${uk("ek", 21)} <= 0.18 THEN 'electronics'
                    WHEN ${uk("ek", 21)} <= 0.33 THEN 'clothing'
                    WHEN ${uk("ek", 21)} <= 0.46 THEN 'home'
                    WHEN ${uk("ek", 21)} <= 0.58 THEN 'books'
                    WHEN ${uk("ek", 21)} <= 0.70 THEN 'sports'
                    WHEN ${uk("ek", 21)} <= 0.81 THEN 'beauty'
                    WHEN ${uk("ek", 21)} <= 0.91 THEN 'toys'
                    ELSE 'grocery' END AS product_category
        FROM seqd),
      ev AS (
        SELECT c_custkey AS user_id, sq, event_type, product_category,
               CASE WHEN event_type = 'view'
                 THEN CAST(floor(${uk("ek", 12)} * 118) + 3 AS INTEGER) END
                 AS view_duration_sec,
               CASE WHEN event_type = 'click' THEN
                 (CASE WHEN ${uk("ek", 14)} <= 0.2 THEN 'search'
                       WHEN ${uk("ek", 14)} <= 0.4 THEN 'recommendation'
                       WHEN ${uk("ek", 14)} <= 0.6 THEN 'homepage'
                       WHEN ${uk("ek", 14)} <= 0.8 THEN 'email'
                       ELSE 'direct' END) END AS referrer,
               CASE WHEN event_type IN ('cart', 'purchase')
                 THEN CAST(floor(${uk("ek", 15)} * 5) + 1 AS INTEGER) END
                 AS quantity,
               CASE WHEN event_type = 'purchase'
                 THEN round(round(${uk("ek", 16)} * (499.99 - 9.99) + 9.99, 6), 2) END
                 AS price,
               upper(substr(product_category, 1, 3)) || '_' ||
                 printf('%05d', CAST(floor(${uk("ek", 22)} * 500) AS INTEGER))
                 AS product_id,
               CASE WHEN ${uk("ek", 23)} <= 0.55 THEN 'mobile'
                    WHEN ${uk("ek", 23)} <= 0.90 THEN 'desktop'
                    ELSE 'tablet' END AS device_type,
               printf('%d_%d', c_custkey, sq // 4) AS session_id,
               TIMESTAMP '2024-01-01 00:00:00' +
                 CAST(floor(${uk("ek", 17)} * 10080) AS INTEGER)
                 * INTERVAL '1 minute' AS ts
        FROM typed),
      prof AS (
        SELECT c_custkey AS user_id,
               CASE WHEN ${u(1)} <= 0.30 THEN 'US' WHEN ${u(1)} <= 0.42 THEN 'UK'
                    WHEN ${u(1)} <= 0.52 THEN 'DE' WHEN ${u(1)} <= 0.60 THEN 'FR'
                    WHEN ${u(1)} <= 0.68 THEN 'JP' WHEN ${u(1)} <= 0.76 THEN 'IN'
                    WHEN ${u(1)} <= 0.83 THEN 'BR' WHEN ${u(1)} <= 0.90 THEN 'CA'
                    WHEN ${u(1)} <= 0.96 THEN 'AU' ELSE 'OTHER' END AS user_country,
               CASE WHEN ${u(2)} <= 0.60 THEN 'free' WHEN ${u(2)} <= 0.85 THEN 'basic'
                    WHEN ${u(2)} <= 0.97 THEN 'premium' ELSE 'enterprise' END
                 AS user_tier
        FROM customer),
      j AS (
        SELECT e.*, p.user_country, p.user_tier
        FROM ev e LEFT JOIN prof p ON e.user_id = p.user_id)
      SELECT user_id, user_country, user_tier,
             count(*) AS total_events,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_count,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_count,
             CAST(sum(CASE WHEN event_type = 'cart' THEN 1 ELSE 0 END) AS BIGINT) AS cart_count,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_count,
             CAST(count(DISTINCT product_id) AS BIGINT) AS unique_products,
             CAST(count(DISTINCT product_category) AS BIGINT) AS unique_categories,
             CAST(count(DISTINCT session_id) AS BIGINT) AS session_count,
             CAST(sum(CASE WHEN device_type = 'mobile' THEN 1 ELSE 0 END) AS BIGINT) AS mobile_events,
             CAST(sum(CASE WHEN device_type = 'desktop' THEN 1 ELSE 0 END) AS BIGINT) AS desktop_events,
             round(sum(CASE WHEN event_type = 'purchase'
               THEN price * quantity ELSE 0 END), 2) AS total_revenue,
             round(avg(CASE WHEN event_type = 'view'
               THEN view_duration_sec END), 6) AS avg_view_duration_sec,
             min(CASE WHEN event_type = 'click' THEN referrer END)
               AS primary_referrer,
             round(CASE WHEN sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) <> 0
               THEN CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE)
                    / sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) END, 6)
               AS click_through_rate,
             round(CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) <> 0
               THEN CAST(sum(CASE WHEN event_type = 'cart' THEN 1 ELSE 0 END) AS DOUBLE)
                    / sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) END, 6)
               AS cart_rate,
             round(CASE WHEN sum(CASE WHEN event_type = 'cart' THEN 1 ELSE 0 END) <> 0
               THEN CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                    / sum(CASE WHEN event_type = 'cart' THEN 1 ELSE 0 END) END, 6)
               AS conversion_rate,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             CAST(time_bucket(INTERVAL '1 hour', ts) AS DATE) AS event_date,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS feature_timestamp
      FROM j
      GROUP BY user_id, user_country, user_tier, time_bucket(INTERVAL '1 hour', ts)
      ORDER BY user_id, window_start""",


    // disk-partitioned IVF index round trip: seed-centroid assignment
    // (same argmin as x_semdedup) + cell-local top-k — partition pruning
    // cannot change results, only bytes read, so the oracle is the plain
    // cell-restricted search
    "s_ann_index" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id AS cidx, v AS cv FROM e WHERE vec_id < 8),
      asg AS (SELECT vec_id, cell FROM (
        SELECT e.vec_id, CAST(c.cidx AS INTEGER) AS cell,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_inner_product(e.v, e.v)
                   - 2 * list_inner_product(e.v, c.cv)
                   + list_inner_product(c.cv, c.cv) ASC, c.cidx ASC) AS rn
        FROM e CROSS JOIN c) WHERE rn = 1),
      q AS (SELECT e.vec_id AS query_id, a.cell, e.v AS qv
            FROM e JOIN asg a ON e.vec_id = a.vec_id WHERE e.vec_id < 5),
      scored AS (
        SELECT q.query_id, q.cell, e.vec_id AS cand_id,
               list_inner_product(q.qv, e.v)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(e.v, e.v))) AS cos
        FROM q JOIN asg a ON q.cell = a.cell
               JOIN e ON a.vec_id = e.vec_id
        WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, cell, cand_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id ASC) AS INTEGER) AS rank
        FROM scored)
      SELECT query_id, cell, cand_id, round(cos, 6) AS cosine, rank
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""",


    "s_sorted_layout" -> """
      SELECT count(*) AS n_rows, round(sum(value), 2) AS sum_value,
             min(ts) AS min_ts, max(ts) AS max_ts
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-17'""",


    "s_zorder_layout" -> zorderOracle,

    // same content contract, skew-proof quantile bucketing — shared oracle
    "s_zorder_quantile" -> zorderOracle)
}
