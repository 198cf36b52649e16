package graft
package oracle

/** DuckDB oracle SQL — SURVEY §2.2–§2.7 core operators (CoreRegistry). One domain slice of the former
  * monolithic OracleSql map; entries are verbatim, parity rules on
  * [[graft.OracleSql]].
  */
private[graft] object CoreOracleSql {
  import OracleShared._

  val sql: Map[String, String] = Map(
    "p_parse_events" -> s"""
      SELECT event_id, user_id, event_type, value, $k AS k,
             ts AS ts_parsed, CAST(ts AS DATE) AS event_date,
             ts AS feature_timestamp
      FROM events WHERE user_id IS NOT NULL ORDER BY event_id""",


    "p_value_bins" -> """
      SELECT CASE WHEN value/1000.0 < 0.1 THEN 'negligible'
                  WHEN value/1000.0 < 0.2 THEN 'small'
                  WHEN value/1000.0 < 0.3 THEN 'moderate'
                  WHEN value/1000.0 < 0.5 THEN 'large'
                  ELSE 'very large' END AS bin,
             count(*) AS cnt
      FROM events GROUP BY bin ORDER BY bin""",


    "p_pct_change" -> """
      WITH c AS (SELECT avg(value) AS cur FROM events WHERE event_type = 'purchase'),
           r AS (SELECT avg(value) AS ref FROM events WHERE event_type = 'view')
      SELECT round(cur, 6) AS cur_mean, round(ref, 6) AS ref_mean,
             round(CASE WHEN ref = 0 THEN 0.0 ELSE (cur - ref)/ref*100.0 END, 6)
               AS pct_change
      FROM c, r""",


    "p_id_format" -> """
      SELECT c_custkey, printf('user_%06d', c_custkey) AS user_id,
             upper(substr(c_mktsegment, 1, 3)) || '_' ||
               printf('%05d', c_nationkey) AS code
      FROM customer ORDER BY c_custkey""",


    "q_clickstream_hourly" -> s"""
      SELECT user_id,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             $clickAggs,
             CAST(time_bucket(INTERVAL '1 hour', ts) AS DATE) AS event_date,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS feature_timestamp
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id, time_bucket(INTERVAL '1 hour', ts)
      ORDER BY user_id, window_start""",


    // tolerance oracle: the exact flagship columns replay in DuckDB; the
    // HLL-vs-exact boolean is deterministically TRUE on the Spark side
    // (3σ bound at rsd 0.05, sparse-range cardinalities), literal here
    "q_clickstream_hourly_approx" -> s"""
      SELECT user_id,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             $clickAggs,
             CAST(time_bucket(INTERVAL '1 hour', ts) AS DATE) AS event_date,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS feature_timestamp,
             TRUE AS unique_k_ok
      FROM events WHERE user_id IS NOT NULL
      GROUP BY user_id, time_bucket(INTERVAL '1 hour', ts)
      ORDER BY user_id, window_start""",


    "q_clickstream_sliding" -> s"""
      WITH expanded AS (
        SELECT e.*, time_bucket(INTERVAL '10 minutes', e.ts)
               - gs.kk * INTERVAL '10 minutes' AS window_start
        FROM events e CROSS JOIN generate_series(0, 5) gs(kk)
        WHERE e.user_id IS NOT NULL)
      SELECT user_id, window_start,
             window_start + INTERVAL '1 hour' AS window_end,
             $clickAggs
      FROM expanded
      GROUP BY user_id, window_start
      ORDER BY user_id, window_start""",


    "q_sessions" -> """
      WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        FROM o)
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL '30 minutes' AS session_end,
             count(*) AS n_events,
             round(sum(value), 2) AS session_value
      FROM s GROUP BY user_id, sid
      ORDER BY user_id, session_start""",


    // SLO burn: daily error rate vs the 1% budget, burn multiple,
    // cumulative consumption, fast-burn alert
    "q_slo_burn" -> """
      WITH d AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) AS errors
        FROM events GROUP BY 1)
      SELECT day, n, errors,
             round(errors / CAST(n AS DOUBLE), 6) AS error_rate,
             round(errors / CAST(n AS DOUBLE) / 0.01, 6) AS burn,
             round(sum(errors) OVER w
               / (0.01 * CAST(sum(n) OVER w AS DOUBLE)), 6)
               AS budget_consumed,
             errors / CAST(n AS DOUBLE) / 0.01 > 2.0 AS fast_burn
      FROM d
      WINDOW w AS (ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY day""",


    // session product stats over the same lag/gap replay: bounce, depth,
    // median active span (end minus start minus the 30-min gap), value
    "q_session_stats" -> """
      WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        FROM o),
      sess AS (
        SELECT user_id,
               (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000 AS span_s,
               count(*) AS n_events,
               round(sum(value), 2) AS session_value
        FROM s GROUP BY user_id, sid)
      SELECT CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 6) AS bounce_rate,
             round(sum(n_events) / CAST(count(*) AS DOUBLE), 6)
               AS avg_events,
             round(quantile_cont(CAST(span_s AS DOUBLE), 0.5), 6)
               AS median_span_s,
             round(sum(session_value), 2) AS total_value
      FROM sess""",


    "x_sql_cosine" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_inner_product(a.v, b.v)
               / (sqrt(list_inner_product(a.v, a.v))
                  * sqrt(list_inner_product(b.v, b.v))), 6) AS cos
      FROM e a JOIN e b ON a.vec_id + 1 = b.vec_id
      ORDER BY id_a""",


    "q_group_distribution" -> """
      WITH t AS (SELECT count(*) AS total FROM customer)
      SELECT c_nationkey, count(*) AS cnt,
             round(CAST(count(*) AS DOUBLE) / max(t.total), 6) AS share
      FROM customer CROSS JOIN t
      GROUP BY c_nationkey ORDER BY c_nationkey""",


    "q_numeric_summary" -> """
      SELECT count(*) AS n, round(avg(l_quantity), 6) AS mean,
             round(min(l_quantity), 6) AS min_v,
             round(max(l_quantity), 6) AS max_v,
             CAST(sum(CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS above_threshold
      FROM lineitem""",


    "q_latest_snapshot" -> s"""
      WITH $snapshotCte
      SELECT o_custkey, o_orderdate AS feature_ts, o_totalprice, o_orderstatus
      FROM snap ORDER BY o_custkey""",


    "q_incremental_snapshot" -> s"""
      WITH $snapshotCte
      SELECT o_custkey, o_orderdate AS feature_ts, o_totalprice, o_orderstatus
      FROM snap ORDER BY o_custkey""",


    // dataset fingerprint: same per-row md5-prefix hash (15 hex chars =
    // 60 bits, sign-safe) XOR-folded; chr(1)/chr(2) mirror the Spark
    // u0001 separator and u0002 NULL sentinel
    "q_dataset_fingerprint" -> """
      SELECT bit_xor(CAST(CAST(concat('0x', substr(md5(
               concat_ws(chr(1),
                 coalesce(CAST(event_id AS VARCHAR), chr(2)),
                 coalesce(CAST(user_id AS VARCHAR), chr(2)),
                 coalesce(event_type, chr(2)),
                 coalesce(props, chr(2)))), 1, 15)) AS BIGINT) AS BIGINT))
               AS fingerprint,
             count(*) AS n_rows
      FROM events""",


    // FK audit: one LEFT JOIN onto distinct parent keys per edge, the
    // same predicate-aggregate fold; match_rate NULL when every fk is NULL
    "q_fk_integrity" -> """
      WITH edge AS (
        SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relationship,
               l_orderkey AS fk,
               (SELECT count(*) FROM orders o
                 WHERE o.o_orderkey = l.l_orderkey) > 0 AS hit
        FROM lineitem l
        UNION ALL
        SELECT 'orders.o_custkey->customer.c_custkey', o_custkey,
               (SELECT count(*) FROM customer c
                 WHERE c.c_custkey = o.o_custkey) > 0
        FROM orders o
        UNION ALL
        SELECT 'events.user_id->customer.c_custkey', user_id,
               (SELECT count(*) FROM customer c
                 WHERE c.c_custkey = e.user_id) > 0
        FROM events e)
      SELECT relationship, count(*) AS total,
             count(*) FILTER (fk IS NULL) AS null_fk,
             count(*) FILTER (fk IS NOT NULL AND NOT hit) AS orphans,
             round((count(*) FILTER (fk IS NOT NULL AND hit))
                   / nullif(CAST(count(*) FILTER (fk IS NOT NULL) AS DOUBLE),
                            0), 6) AS match_rate
      FROM edge GROUP BY relationship ORDER BY relationship""",


    // snapshot diff: both cutoffs replayed as row_number snapshots, FULL
    // JOIN on the key, unchanged (NULL-safe-equal values) rows dropped
    "q_snapshot_diff" -> """
      WITH snap1 AS (
        SELECT o_custkey, o_orderdate AS old_ts, o_totalprice AS old_value
        FROM (SELECT o_custkey, o_orderdate, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders WHERE o_orderdate <= TIMESTAMP '1997-06-01')
        WHERE rn = 1),
      snap2 AS (
        SELECT o_custkey, o_orderdate AS new_ts, o_totalprice AS new_value
        FROM (SELECT o_custkey, o_orderdate, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders WHERE o_orderdate <= TIMESTAMP '1998-01-01')
        WHERE rn = 1)
      SELECT coalesce(snap1.o_custkey, snap2.o_custkey) AS o_custkey,
             CASE WHEN old_ts IS NULL THEN 'added'
                  WHEN new_ts IS NULL THEN 'removed'
                  ELSE 'changed' END AS status,
             old_ts, new_ts, old_value, new_value
      FROM snap1 FULL JOIN snap2 ON snap1.o_custkey = snap2.o_custkey
      WHERE old_ts IS NULL OR new_ts IS NULL
         OR old_value IS DISTINCT FROM new_value
      ORDER BY 1""",


    "q_snapshot_asof" -> """
      SELECT o_custkey, o_orderdate AS feature_ts, o_totalprice,
             o_orderstatus
      FROM (
        SELECT o_custkey, o_orderdate, o_totalprice, o_orderstatus,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate <= TIMESTAMP '1997-06-01')
      WHERE rn = 1 ORDER BY o_custkey""",


    "q_feature_scaling" -> """
      WITH s AS (
        SELECT avg(o_totalprice) AS mu, stddev_samp(o_totalprice) AS sd,
               min(o_totalprice) AS mn, max(o_totalprice) AS mx
        FROM orders)
      SELECT o_orderkey,
             CASE WHEN sd > 0
               THEN round((o_totalprice - mu) / sd, 6) END AS z_o_totalprice,
             CASE WHEN mx > mn
               THEN round((o_totalprice - mn) / (mx - mn), 6)
               END AS mm_o_totalprice
      FROM orders, s WHERE o_orderkey % 300 = 0 ORDER BY o_orderkey""",


    "q_freshness" -> """
      SELECT * FROM (
        SELECT 'events' AS feature_view_name, max(ts) AS last_updated_at,
               count(*) AS row_count FROM events
        UNION ALL
        SELECT 'orders', max(o_orderdate), count(*) FROM orders)
      ORDER BY feature_view_name""",


    "q_coverage" -> s"""
      WITH $snapshotCte
      SELECT count(*) AS probed,
             CAST(sum(CASE WHEN s.o_totalprice IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS covered,
             round(sum(CASE WHEN s.o_totalprice IS NOT NULL THEN 1.0 ELSE 0.0 END)
               / count(*), 6) AS coverage_ratio
      FROM customer c LEFT JOIN snap s ON c.c_custkey = s.o_custkey""",


    "q_materialization_dag" -> """
      WITH recent AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
        ORDER BY d DESC LIMIT 7),
      f AS (
        SELECT e.* FROM events e JOIN recent r ON CAST(e.ts AS DATE) = r.d),
      snap AS (
        SELECT user_id, value AS feature_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn FROM f)
        WHERE rn = 1),
      probes AS (
        SELECT c_custkey AS user_id FROM customer WHERE c_custkey % 13 = 0)
      SELECT count(*) AS probed,
             CAST(sum(CASE WHEN s.feature_value IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS covered,
             round(sum(CASE WHEN s.feature_value IS NOT NULL
               THEN 1.0 ELSE 0.0 END) / count(*), 6) AS coverage_ratio
      FROM probes p LEFT JOIN snap s ON p.user_id = s.user_id""",


    "q_fs_historical" -> """
      WITH probes AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      feats AS (
        SELECT user_id, ts AS fts, max(value) AS last_purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      SELECT p.event_id, p.user_id, p.ts,
             CASE WHEN f.fts >= p.ts - INTERVAL '7 days'
               THEN f.last_purchase_value END AS purchases__last_purchase_value
      FROM probes p ASOF LEFT JOIN feats f
        ON p.user_id = f.user_id AND p.ts >= f.fts
      ORDER BY event_id""",


    // multi-view retrieval: DuckDB chains two ASOF LEFT JOINs the same
    // way the facade chains as-of joins on the accumulating probe frame
    "q_fs_multiview" -> """
      WITH probes AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      purch AS (
        SELECT user_id, ts AS fts, max(value) AS last_purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
      pv AS (
        SELECT user_id, ts AS fts, max(value) AS last_view_value
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
      SELECT p.event_id, p.user_id, p.ts,
             CASE WHEN f1.fts >= p.ts - INTERVAL '7 days'
               THEN f1.last_purchase_value END AS purchases__last_purchase_value,
             CASE WHEN f2.fts >= p.ts - INTERVAL '7 days'
               THEN f2.last_view_value END AS pageviews__last_view_value
      FROM probes p
      ASOF LEFT JOIN purch f1 ON p.user_id = f1.user_id AND p.ts >= f1.fts
      ASOF LEFT JOIN pv f2 ON p.user_id = f2.user_id AND p.ts >= f2.fts
      ORDER BY event_id""",


    "q_asof_features" -> """
      WITH probes AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      feats AS (
        SELECT user_id, ts AS fts, max(value) AS last_purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      SELECT p.event_id, p.user_id, p.ts,
             CASE WHEN f.fts >= p.ts - INTERVAL '7 days'
               THEN f.last_purchase_value END AS last_purchase_value,
             CASE WHEN f.fts >= p.ts - INTERVAL '7 days'
               THEN f.fts END AS feature_ts
      FROM probes p ASOF LEFT JOIN feats f
        ON p.user_id = f.user_id AND p.ts >= f.fts
      ORDER BY p.event_id""",


    "q_asof_native" -> asofNativeOracle,

    // bucketed fast path: layout changes, semantics do not — same oracle
    "s_bucketed_asof" -> asofNativeOracle,


    "q_point_lookup" -> s"""
      WITH $snapshotCte
      SELECT c.c_custkey, c.c_mktsegment AS customer__mktsegment,
             s.o_totalprice AS orders__totalprice,
             s.o_orderstatus AS orders__orderstatus,
             s.o_totalprice IS NOT NULL AS has_features
      FROM customer c LEFT JOIN snap s ON c.c_custkey = s.o_custkey
      WHERE c.c_custkey % 7 = 0 ORDER BY c.c_custkey""",


    "q_enrichment" -> """
      SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment, n.n_name
      FROM events e
      LEFT JOIN customer c ON e.user_id = c.c_custkey
      LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      ORDER BY e.event_id""",


    "q_topk_segments" -> """
      SELECT c_mktsegment, count(*) AS cnt
      FROM customer GROUP BY c_mktsegment
      ORDER BY cnt DESC, c_mktsegment ASC LIMIT 3""",


    "q_probe_sample" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey % 50 = 0 ORDER BY c_custkey""",


    "q_percentiles" -> """
      SELECT round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS p50,
             round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 6) AS p90,
             round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95), 6) AS p95,
             round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 6) AS p99,
             round(min(l_extendedprice), 6) AS min_v,
             round(max(l_extendedprice), 6) AS max_v,
             round(avg(l_extendedprice), 6) AS avg_v
      FROM lineitem""",


    // tolerance oracle: exact p50/p95 replay; the sketch-inside-±1%-rank
    // booleans are deterministically TRUE (GK rank error ≤ 1e-4)
    "q_percentiles_approx" -> """
      SELECT round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS p50,
             round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95), 6) AS p95,
             TRUE AS p50_ok, TRUE AS p95_ok
      FROM lineitem""",


    // rolling actives: the exact semantics as a day-grid range join over
    // the distinct (day, user) pair table
    "q_rolling_active_users" -> """
      WITH pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u FROM events),
      dau AS (SELECT day, count(*) AS dau FROM pairs GROUP BY day),
      wau AS (
        SELECT d.day, count(DISTINCT p.u) AS wau
        FROM (SELECT DISTINCT day FROM pairs) d
        JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day)
      SELECT dau.day, dau.dau, wau.wau
      FROM dau JOIN wau ON dau.day = wau.day ORDER BY dau.day""",


    // sketch twin: exact anchors replayed; the tolerance boolean is
    // deterministically true (HLL is deterministic per corpus)
    "q_rolling_active_users_approx" -> """
      WITH pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u FROM events),
      dau AS (SELECT day, count(*) AS dau FROM pairs GROUP BY day),
      wau AS (
        SELECT d.day, count(DISTINCT p.u) AS wau
        FROM (SELECT DISTINCT day FROM pairs) d
        JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day)
      SELECT dau.day, dau.dau, wau.wau, TRUE AS wau_ok
      FROM dau JOIN wau ON dau.day = wau.day ORDER BY dau.day""",


    "q_mode_per_key" -> """
      SELECT user_id, event_type AS mode_value, cnt FROM (
        SELECT user_id, event_type, count(*) AS cnt,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY count(*) DESC, event_type ASC) AS rn
        FROM events WHERE event_type IS NOT NULL
        GROUP BY user_id, event_type)
      WHERE rn = 1 ORDER BY user_id""",


    "q_recent_partitions" -> """
      SELECT DISTINCT CAST(ts AS DATE) AS event_date FROM events
      ORDER BY event_date DESC LIMIT 7""",


    "q_constraint_suggest" -> """
      WITH p AS (SELECT
        CAST(count(*) AS BIGINT) AS n,
        CAST(count(event_id) AS BIGINT) AS nn_eid,
        CAST(count(DISTINCT event_id) AS BIGINT) AS nd_eid,
        CAST(count(user_id) AS BIGINT) AS nn_uid,
        CAST(count(DISTINCT user_id) AS BIGINT) AS nd_uid,
        CAST(count(value) AS BIGINT) AS nn_val,
        CAST(count(DISTINCT value) AS BIGINT) AS nd_val,
        CAST(count(event_type) AS BIGINT) AS nn_et,
        CAST(count(DISTINCT event_type) AS BIGINT) AS nd_et,
        round(min(CAST(event_id AS DOUBLE)), 6) AS lo_eid,
        round(max(CAST(event_id AS DOUBLE)), 6) AS hi_eid,
        round(min(CAST(user_id AS DOUBLE)), 6) AS lo_uid,
        round(max(CAST(user_id AS DOUBLE)), 6) AS hi_uid,
        round(min(value), 6) AS lo_val,
        round(max(value), 6) AS hi_val,
        array_to_string(list_sort(list(DISTINCT CAST(event_type
          AS VARCHAR))), '|') AS dom_et
      FROM events),
      rows_ AS (
        SELECT 'event_id' AS "column", 'not_null' AS "constraint",
               nn_eid = n AS app, n - nn_eid AS n_nulls,
               nd_eid AS n_distinct, CAST(NULL AS DOUBLE) AS lo,
               CAST(NULL AS DOUBLE) AS hi, CAST(NULL AS VARCHAR) AS domain
        FROM p
        UNION ALL SELECT 'user_id', 'not_null', nn_uid = n, n - nn_uid,
               nd_uid, NULL, NULL, NULL FROM p
        UNION ALL SELECT 'value', 'not_null', nn_val = n, n - nn_val,
               nd_val, NULL, NULL, NULL FROM p
        UNION ALL SELECT 'event_type', 'not_null', nn_et = n, n - nn_et,
               nd_et, NULL, NULL, NULL FROM p
        UNION ALL SELECT 'event_id', 'unique',
               nd_eid = n AND nn_eid = n, n - nn_eid, nd_eid,
               NULL, NULL, NULL FROM p
        UNION ALL SELECT 'user_id', 'unique',
               nd_uid = n AND nn_uid = n, n - nn_uid, nd_uid,
               NULL, NULL, NULL FROM p
        UNION ALL SELECT 'value', 'unique',
               nd_val = n AND nn_val = n, n - nn_val, nd_val,
               NULL, NULL, NULL FROM p
        UNION ALL SELECT 'event_type', 'unique',
               nd_et = n AND nn_et = n, n - nn_et, nd_et,
               NULL, NULL, NULL FROM p
        UNION ALL SELECT 'event_id', 'between', true, n - nn_eid, nd_eid,
               lo_eid, hi_eid, NULL FROM p
        UNION ALL SELECT 'user_id', 'between', true, n - nn_uid, nd_uid,
               lo_uid, hi_uid, NULL FROM p
        UNION ALL SELECT 'value', 'between', true, n - nn_val, nd_val,
               lo_val, hi_val, NULL FROM p
        UNION ALL SELECT 'event_type', 'in_set',
               nd_et <= 20 AND nd_et > 1, n - nn_et, nd_et,
               NULL, NULL, dom_et FROM p)
      SELECT "column", "constraint", CAST(n_nulls AS BIGINT) AS n_nulls,
             n_distinct, lo, hi, domain
      FROM rows_ WHERE app
      ORDER BY "column", "constraint"""",


    "q_quality_report" -> """
      WITH t AS (SELECT
        count(*) AS total,
        CAST(sum(CASE WHEN c_acctbal IS NOT NULL
          AND NOT (c_acctbal >= -1000.0 AND c_acctbal <= 10000.0)
          THEN 1 ELSE 0 END) AS BIGINT) AS u_between_acctbal,
        CAST(sum(CASE WHEN c_nationkey IS NOT NULL
          AND NOT (c_nationkey >= 0.0 AND c_nationkey <= 24.0)
          THEN 1 ELSE 0 END) AS BIGINT) AS u_between_nationkey,
        CAST(sum(CASE WHEN c_mktsegment IS NOT NULL AND c_mktsegment NOT IN
          ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
          THEN 1 ELSE 0 END) AS BIGINT) AS u_inset_mkt,
        CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS u_nn_mkt,
        CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS u_nn_name
        FROM customer)
      SELECT rule, total, unexpected_count,
             round(CASE WHEN total = 0 THEN 0.0
               ELSE CAST(unexpected_count AS DOUBLE)/total*100.0 END, 6)
               AS unexpected_pct,
             unexpected_count = 0 AS passed
      FROM (
        SELECT 'between_c_acctbal' AS rule, total, u_between_acctbal AS unexpected_count FROM t
        UNION ALL SELECT 'between_c_nationkey', total, u_between_nationkey FROM t
        UNION ALL SELECT 'in_set_c_mktsegment', total, u_inset_mkt FROM t
        UNION ALL SELECT 'not_null_c_mktsegment', total, u_nn_mkt FROM t
        UNION ALL SELECT 'not_null_c_name', total, u_nn_name FROM t)
      ORDER BY rule""",


    "q_unique_check" -> """
      SELECT (SELECT count(*) FROM customer) AS total,
             (SELECT count(c_custkey) FROM customer) AS non_null,
             (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer)
               AS distinct_values,
             (SELECT count(*) FROM (
                SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL
                GROUP BY c_custkey HAVING count(*) > 1)) AS duplicate_keys,
             (SELECT count(c_custkey) FROM customer) =
               (SELECT count(DISTINCT c_custkey) FROM customer) AS passed""",


    "q_quality_offenders" -> """
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_acctbal IS NOT NULL
        AND NOT (c_acctbal >= 0.0 AND c_acctbal <= 9000.0)
      ORDER BY c_custkey LIMIT 5""",


    // QQ drift table: exact interpolated deciles per side, zipped
    // positionally, per-quantile gap
    "q_qq_drift" -> {
      val qs = (1 to 9).map(q => s"0.$q").mkString("[", ", ", "]")
      s"""
      WITH r AS (SELECT quantile_cont(value, $qs) AS q FROM events
                 WHERE event_type = 'purchase' AND value IS NOT NULL),
      c AS (SELECT quantile_cont(value, $qs) AS q FROM events
            WHERE event_type = 'view' AND value IS NOT NULL),
      z AS (SELECT generate_subscripts(r.q, 1) AS i,
              unnest(r.q) AS qr, unnest(c.q) AS qc
            FROM r, c)
      SELECT $qs[i] AS quantile,
             round(qr, 6) AS q_ref, round(qc, 6) AS q_cur,
             round(qc - qr, 6) AS gap
      FROM z ORDER BY quantile"""
    },


    // CvM: centi-lattice values, exact HUGEINT numerator, Anderson 5%
    "q_cvm_drift" -> """
      WITH pv AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS cb
        FROM events
        WHERE event_type IN ('purchase', 'view')
          AND value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1),
      c AS (SELECT *,
              sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cuma,
              sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cumb,
              sum(ca) OVER () AS n, sum(cb) OVER () AS m
            FROM pv),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_values,
              CAST(max(n) AS BIGINT) AS n_a,
              CAST(max(m) AS BIGINT) AS n_b,
              sum(CAST(ca + cb AS HUGEINT)
                * (CAST(cuma AS HUGEINT) * m - CAST(cumb AS HUGEINT) * n)
                * (CAST(cuma AS HUGEINT) * m - CAST(cumb AS HUGEINT) * n))
                AS num
            FROM c)
      SELECT n_a, n_b, n_values,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(num AS DOUBLE)
          / (((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
            * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
            * (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) END, 6)
          AS cvm_t,
        CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(num AS DOUBLE)
          / (((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
            * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
            * (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) > 0.461 END
          AS drifted
      FROM f""",


    // Energy distance: exact integer gap-folds for the three E|.| terms
    "q_energy_drift" -> """
      WITH pv AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS cb
        FROM events
        WHERE event_type IN ('purchase', 'view')
          AND value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1),
      c AS (SELECT *,
              sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cuma,
              sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cumb,
              lead(v, 1) OVER (ORDER BY v) - v AS gap,
              sum(ca) OVER () AS n, sum(cb) OVER () AS m
            FROM pv),
      f AS (SELECT
              CAST(max(n) AS BIGINT) AS n_a, CAST(max(m) AS BIGINT) AS n_b,
              sum(CAST(gap AS HUGEINT) * (CAST(cuma AS HUGEINT)
                * (m - cumb) + CAST(cumb AS HUGEINT) * (n - cuma)))
                AS sxy,
              sum(CAST(gap AS HUGEINT) * CAST(cuma AS HUGEINT)
                * (n - cuma)) AS sxx,
              sum(CAST(gap AS HUGEINT) * CAST(cumb AS HUGEINT)
                * (m - cumb)) AS syy
            FROM c WHERE gap IS NOT NULL),
      t AS (SELECT n_a, n_b,
              CAST(sxy AS DOUBLE) / (CAST(n_a AS DOUBLE)
                * CAST(n_b AS DOUBLE)) / 100.0 AS exy,
              2.0 * CAST(sxx AS DOUBLE) / (CAST(n_a AS DOUBLE)
                * CAST(n_a AS DOUBLE)) / 100.0 AS exx,
              2.0 * CAST(syy AS DOUBLE) / (CAST(n_b AS DOUBLE)
                * CAST(n_b AS DOUBLE)) / 100.0 AS eyy
            FROM f)
      SELECT n_a, n_b,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN exy END, 6) AS e_between,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN exx END, 6)
          AS e_within_a,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN eyy END, 6)
          AS e_within_b,
        round(CASE WHEN n_a > 0 AND n_b > 0
          THEN 2.0 * exy - exx - eyy END, 6) AS energy_d2,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(n_a AS DOUBLE)
          * CAST(n_b AS DOUBLE) / (CAST(n_a AS DOUBLE)
          + CAST(n_b AS DOUBLE)) * (2.0 * exy - exx - eyy) END, 6)
          AS e_stat
      FROM t""",


    "q_ks_drift" -> """
      WITH clean AS (
        SELECT value AS v, event_type FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
          AND event_type IN ('purchase', 'view')),
      pv AS (
        SELECT v,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM clean GROUP BY v),
      c AS (
        SELECT v,
          sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
          sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
          sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        FROM pv),
      s AS (
        SELECT CAST(coalesce(max(na), 0) AS BIGINT) AS n_a,
               CAST(coalesce(max(nb), 0) AS BIGINT) AS n_b,
               coalesce(max(abs(CAST(cuma AS DOUBLE)/na
                 - CAST(cumb AS DOUBLE)/nb)), 0.0) AS d
        FROM c),
      p AS (
        SELECT n_a, n_b, d,
               d * sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)) AS lam
        FROM s),
      ser AS (
        SELECT p.n_a, p.n_b, p.d,
               CASE WHEN p.lam < 0.05 THEN 1.0
                 ELSE least(greatest(sum(
                   (CASE WHEN gs.kk % 2 = 1 THEN 2.0 ELSE -2.0 END)
                   * exp(-2.0 * gs.kk * gs.kk * p.lam * p.lam)), 0.0), 1.0)
                 END AS praw
        FROM p CROSS JOIN generate_series(1, 100) gs(kk)
        GROUP BY p.n_a, p.n_b, p.d, p.lam),
      fin AS (
        SELECT n_a, n_b,
               round(CASE WHEN n_a < 10 OR n_b < 10 THEN 0.0 ELSE d END, 6) AS ks_stat,
               round(CASE WHEN n_a < 10 OR n_b < 10 THEN 1.0 ELSE praw END, 6) AS p_value
        FROM ser)
      SELECT n_a, n_b, ks_stat, p_value,
             p_value < 0.05 AS drift_detected,
             CASE WHEN ks_stat < 0.1 THEN 'negligible'
                  WHEN ks_stat < 0.2 THEN 'small'
                  WHEN ks_stat < 0.3 THEN 'moderate'
                  WHEN ks_stat < 0.5 THEN 'large'
                  ELSE 'very large' END AS magnitude
      FROM fin""",


    // exact small-n KS: the lattice-path DP replayed in HUGEINT — kk walks
    // the anti-diagonals, `diag` is the list of path counts A(i,j) on the
    // current one (A(kk+1, jx) = A_kk(jx) + A_kk(jx-1) when inside the
    // band |i·m − j·n| < round(d·lcm)·gcd), `bc` accumulates C(n+m,n)
    // by exact incremental division; p = (C − inside)/C in double, the
    // same division order as the Spark side
    "q_ks_exact" -> """
      WITH RECURSIVE pur AS (
        SELECT event_type, value FROM events WHERE event_type = 'purchase'
        ORDER BY event_id LIMIT 30),
      vw AS (
        SELECT event_type, value FROM events WHERE event_type = 'view'
        ORDER BY event_id LIMIT 30),
      clean AS (
        SELECT value AS v, event_type
        FROM (SELECT * FROM pur UNION ALL SELECT * FROM vw)
        WHERE value IS NOT NULL AND NOT isnan(value)),
      pv AS (
        SELECT v,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM clean GROUP BY v),
      c AS (
        SELECT
          sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
          sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
          sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        FROM pv),
      s AS (
        SELECT CAST(coalesce(max(na), 0) AS BIGINT) AS n_a,
               CAST(coalesce(max(nb), 0) AS BIGINT) AS n_b,
               CASE WHEN coalesce(max(na), 0) = 0 OR coalesce(max(nb), 0) = 0
                 THEN 0.0  -- empty side: 0/0 ECDF would be NaN; guard row
                 ELSE coalesce(max(abs(CAST(cuma AS DOUBLE)/na
                   - CAST(cumb AS DOUBLE)/nb)), 0.0) END AS d
        FROM c),
      prm AS (
        SELECT n_a, n_b, d,
               CASE WHEN n_a = 0 OR n_b = 0 THEN 0
                 ELSE CAST(round(d * (n_a * n_b / gcd(n_a, n_b))) AS BIGINT)
                   * gcd(n_a, n_b) END AS band
        FROM s),
      dp AS (
        SELECT 0 AS kk,
               [CAST(CASE WHEN band > 0 THEN 1 ELSE 0 END AS HUGEINT)] AS diag,
               CAST(1 AS HUGEINT) AS bc, n_a AS nn, n_b AS mm, band, d
        FROM prm
        UNION ALL
        SELECT kk + 1,
          list_transform(range(0, least(kk + 1, mm) + 1), jx ->
            CASE WHEN (kk + 1 - jx) <= nn
                   AND abs((kk + 1 - jx) * mm - jx * nn) < band
              THEN coalesce(diag[jx + 1], CAST(0 AS HUGEINT))
                 + coalesce(diag[jx], CAST(0 AS HUGEINT))
              ELSE CAST(0 AS HUGEINT) END),
          CASE WHEN kk < nn THEN bc * (mm + kk + 1) / (kk + 1) ELSE bc END,
          nn, mm, band, d
        FROM dp WHERE kk < nn + mm),
      fin AS (
        SELECT nn AS n_a, mm AS n_b,
               round(CASE WHEN nn < 10 OR mm < 10 THEN 0.0 ELSE d END, 6)
                 AS ks_stat,
               round(CASE WHEN nn < 10 OR mm < 10 THEN 1.0
                 ELSE CAST(bc - diag[CAST(mm AS INTEGER) + 1] AS DOUBLE)
                      / CAST(bc AS DOUBLE) END, 6) AS p_value
        FROM dp WHERE kk = nn + mm)
      SELECT n_a, n_b, ks_stat, p_value,
             p_value < 0.05 AS drift_detected,
             CASE WHEN ks_stat < 0.1 THEN 'negligible'
                  WHEN ks_stat < 0.2 THEN 'small'
                  WHEN ks_stat < 0.3 THEN 'moderate'
                  WHEN ks_stat < 0.5 THEN 'large'
                  ELSE 'very large' END AS magnitude
      FROM fin""",


    "q_dist_summary" -> """
      SELECT event_type AS side, count(*) AS n,
             round(avg(value), 6) AS mean,
             round(stddev_pop(value), 6) AS std_pop,
             round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS median,
             round(min(value), 6) AS min_v,
             round(max(value), 6) AS max_v
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
      GROUP BY event_type ORDER BY side""",


    // binned default: ≤1000-bin per-feature ECDF, mirrors Drift.sweep
    "q_drift_sweep" -> s"""
      WITH melted AS (
        SELECT event_type, 'k' AS feature,
               CAST($k AS DOUBLE) AS v FROM events
          WHERE event_type IN ('purchase', 'view')
        UNION ALL
        SELECT event_type, 'value', value FROM events
          WHERE event_type IN ('purchase', 'view')),
      clean AS (SELECT * FROM melted WHERE v IS NOT NULL AND NOT isnan(v)),
      bounds AS (
        SELECT feature, CAST(min(v) AS DOUBLE) AS lo,
               CAST(max(v) AS DOUBLE) AS hi
        FROM clean GROUP BY feature),
      binned AS (
        SELECT c.event_type, c.feature,
               CASE WHEN b.hi = b.lo THEN 0
                    ELSE least(CAST(floor((c.v - b.lo) / ((b.hi - b.lo) / 1000))
                               AS INTEGER), 999) END AS bin
        FROM clean c JOIN bounds b USING (feature)),
      pv AS (
        SELECT feature, bin,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM binned GROUP BY feature, bin),
      c AS (
        SELECT feature,
          sum(ca) OVER (PARTITION BY feature ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
          sum(cb) OVER (PARTITION BY feature ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
          sum(ca) OVER (PARTITION BY feature) AS na,
          sum(cb) OVER (PARTITION BY feature) AS nb
        FROM pv)
      SELECT feature, CAST(max(na) AS BIGINT) AS n_a,
             CAST(max(nb) AS BIGINT) AS n_b,
             round(max(abs(CAST(cuma AS DOUBLE)/na - CAST(cumb AS DOUBLE)/nb)), 6)
               AS ks_stat
      FROM c GROUP BY feature ORDER BY feature""",


    // BH-FDR over the 4-feature lineitem sweep: same binned-ECDF CTEs,
    // then asymptotic KS p (Kolmogorov series), rank, p*m/rank, reverse
    // running min capped at 1
    "q_drift_fdr" -> """
      WITH melted AS (
        SELECT l_returnflag, 'l_quantity' AS feature,
               CAST(l_quantity AS DOUBLE) AS v FROM lineitem
          WHERE l_returnflag IN ('A', 'N')
        UNION ALL
        SELECT l_returnflag, 'l_extendedprice',
               CAST(l_extendedprice AS DOUBLE) FROM lineitem
          WHERE l_returnflag IN ('A', 'N')
        UNION ALL
        SELECT l_returnflag, 'l_discount', CAST(l_discount AS DOUBLE)
          FROM lineitem WHERE l_returnflag IN ('A', 'N')
        UNION ALL
        SELECT l_returnflag, 'l_tax', CAST(l_tax AS DOUBLE)
          FROM lineitem WHERE l_returnflag IN ('A', 'N')),
      clean AS (SELECT * FROM melted WHERE v IS NOT NULL AND NOT isnan(v)),
      bounds AS (
        SELECT feature, CAST(min(v) AS DOUBLE) AS lo,
               CAST(max(v) AS DOUBLE) AS hi
        FROM clean GROUP BY feature),
      binned AS (
        SELECT c.l_returnflag, c.feature,
               CASE WHEN b.hi = b.lo THEN 0
                    ELSE least(CAST(floor((c.v - b.lo)
                               / ((b.hi - b.lo) / 1000))
                               AS INTEGER), 999) END AS bin
        FROM clean c JOIN bounds b USING (feature)),
      pv AS (
        SELECT feature, bin,
          CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
            AS BIGINT) AS ca,
          CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
            AS BIGINT) AS cb
        FROM binned GROUP BY feature, bin),
      c AS (
        SELECT feature,
          sum(ca) OVER (PARTITION BY feature ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
          sum(cb) OVER (PARTITION BY feature ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
          sum(ca) OVER (PARTITION BY feature) AS na,
          sum(cb) OVER (PARTITION BY feature) AS nb
        FROM pv),
      ks AS (
        SELECT feature, CAST(max(na) AS BIGINT) AS n_a,
               CAST(max(nb) AS BIGINT) AS n_b,
               round(max(abs(CAST(cuma AS DOUBLE)/na
                 - CAST(cumb AS DOUBLE)/nb)), 6) AS ks_stat
        FROM c GROUP BY feature),
      lamt AS (
        SELECT *, ks_stat * sqrt(n_a * n_b / CAST(n_a + n_b AS DOUBLE))
          AS lam FROM ks),
      pvals AS (
        SELECT feature, n_a, n_b, ks_stat,
               round(CASE WHEN lam < 0.05 THEN 1.0
                 ELSE least(greatest(
                   (SELECT sum((CASE WHEN k % 2 = 1 THEN 2.0 ELSE -2.0 END)
                      * exp(-2.0 * k * k * lam * lam))
                    FROM range(1, 101) t(k)), 0.0), 1.0) END, 6)
                 AS p_value
        FROM lamt),
      rk AS (
        SELECT *, row_number() OVER (ORDER BY p_value, feature) AS rnk,
               count(*) OVER () AS m
        FROM pvals),
      adj AS (
        SELECT *, round(least(min(p_value * m / rnk) OVER (
            ORDER BY rnk
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0), 6)
          AS p_adj
        FROM rk)
      SELECT feature, n_a, n_b, ks_stat, p_value,
             CAST(rnk AS BIGINT) AS rank, p_adj,
             p_adj <= 0.05 AS reject
      FROM adj ORDER BY rank""",


    "q_drift_sweep_exact" -> s"""
      WITH melted AS (
        SELECT event_type, 'k' AS feature,
               CAST($k AS DOUBLE) AS v FROM events
          WHERE event_type IN ('purchase', 'view')
        UNION ALL
        SELECT event_type, 'value', value FROM events
          WHERE event_type IN ('purchase', 'view')),
      clean AS (SELECT * FROM melted WHERE v IS NOT NULL AND NOT isnan(v)),
      pv AS (
        SELECT feature, v,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM clean GROUP BY feature, v),
      c AS (
        SELECT feature,
          sum(ca) OVER (PARTITION BY feature ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
          sum(cb) OVER (PARTITION BY feature ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
          sum(ca) OVER (PARTITION BY feature) AS na,
          sum(cb) OVER (PARTITION BY feature) AS nb
        FROM pv)
      SELECT feature, CAST(max(na) AS BIGINT) AS n_a,
             CAST(max(nb) AS BIGINT) AS n_b,
             round(max(abs(CAST(cuma AS DOUBLE)/na - CAST(cumb AS DOUBLE)/nb)), 6)
               AS ks_stat
      FROM c GROUP BY feature ORDER BY feature""",


    "q_profile" -> """
      WITH s AS (SELECT count(*) AS n_rows,
        count(c_custkey) AS nn1, count(DISTINCT c_custkey) AS nd1,
        CAST(min(c_custkey) AS VARCHAR) AS mn1,
        CAST(max(c_custkey) AS VARCHAR) AS mx1,
        count(c_name) AS nn2, count(DISTINCT c_name) AS nd2,
        min(c_name) AS mn2, max(c_name) AS mx2,
        count(c_mktsegment) AS nn3, count(DISTINCT c_mktsegment) AS nd3,
        min(c_mktsegment) AS mn3, max(c_mktsegment) AS mx3
        FROM customer)
      SELECT 'c_custkey' AS col_name, n_rows, n_rows - nn1 AS n_nulls,
             round((n_rows - nn1) / CAST(n_rows AS DOUBLE), 6) AS null_ratio,
             nd1 AS n_distinct, mn1 AS min_value, mx1 AS max_value FROM s
      UNION ALL
      SELECT 'c_mktsegment', n_rows, n_rows - nn3,
             round((n_rows - nn3) / CAST(n_rows AS DOUBLE), 6),
             nd3, mn3, mx3 FROM s
      UNION ALL
      SELECT 'c_name', n_rows, n_rows - nn2,
             round((n_rows - nn2) / CAST(n_rows AS DOUBLE), 6),
             nd2, mn2, mx2 FROM s
      ORDER BY col_name""",


    // binned KS (the 100 TB fallback): fixed-width histogram then bounded
    // cumulative window — same floor/least arithmetic in both engines
    // Wasserstein-1 over the same binning: gap × run-length to the next
    // present bin (empty bins persist an ECDF gap a MAX never sees)
    "q_wasserstein" -> """
      WITH clean AS (
        SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
          AND event_type IN ('purchase', 'view')),
      bounds AS (
        SELECT CAST(min(value) AS DOUBLE) AS lo,
               CAST(max(value) AS DOUBLE) AS hi FROM clean),
      binned AS (
        SELECT event_type,
               CASE WHEN hi = lo THEN 0
                    ELSE least(CAST(floor((value - lo) / ((hi - lo) / 1000))
                               AS INTEGER), 999) END AS bin
        FROM clean, bounds),
      per_bin AS (
        SELECT bin,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM binned GROUP BY bin),
      cum AS (
        SELECT bin, ca, cb,
               sum(ca) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
               sum(cb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
               sum(ca) OVER () AS na, sum(cb) OVER () AS nb,
               lead(bin, 1, 1000) OVER (ORDER BY bin) - bin AS run
        FROM per_bin),
      area AS (
        SELECT coalesce(CAST(max(na) AS BIGINT), 0) AS n_a,
               coalesce(CAST(max(nb) AS BIGINT), 0) AS n_b,
               coalesce(sum(abs(CAST(cuma AS DOUBLE) / na
                 - CAST(cumb AS DOUBLE) / nb) * run), 0.0) AS a
        FROM cum)
      SELECT n_a, n_b,
             round(a * ((SELECT hi FROM bounds) - (SELECT lo FROM bounds))
               / 1000, 6) AS wasserstein1,
             round(a / 1000, 6) AS w1_normalized
      FROM area""",


    "q_ks_binned" -> """
      WITH clean AS (
        SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
          AND event_type IN ('purchase', 'view')),
      bounds AS (
        SELECT CAST(min(value) AS DOUBLE) AS lo,
               CAST(max(value) AS DOUBLE) AS hi FROM clean),
      binned AS (
        SELECT event_type,
               CASE WHEN hi = lo THEN 0
                    ELSE least(CAST(floor((value - lo) / ((hi - lo) / 1000))
                               AS INTEGER), 999) END AS bin
        FROM clean, bounds),
      per_bin AS (
        SELECT bin,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM binned GROUP BY bin),
      cum AS (
        SELECT bin, ca, cb,
               sum(ca) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
               sum(cb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
               sum(ca) OVER () AS na, sum(cb) OVER () AS nb
        FROM per_bin)
      SELECT coalesce(CAST(max(na) AS BIGINT), 0) AS n_a,
             coalesce(CAST(max(nb) AS BIGINT), 0) AS n_b,
             round(coalesce(max(abs(CAST(cuma AS DOUBLE)/na
                                    - CAST(cumb AS DOUBLE)/nb)), 0.0), 6)
               AS ks_stat_binned
      FROM cum""",


    "q_group_percentiles" -> """
      SELECT event_type, count(*) AS n,
             round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
             round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
             round(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS p99
      FROM events GROUP BY event_type ORDER BY event_type""",


    // tolerance oracle: exact grouped percentiles replay; the
    // sketch-inside-±5%-rank booleans are deterministically TRUE
    "q_group_percentiles_approx" -> """
      SELECT event_type, count(*) AS n,
             round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
             round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
             round(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS p99,
             TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
      FROM events GROUP BY event_type ORDER BY event_type""",


    // backward recency: rows-preceding window max + µs-exact elapsed secs
    "q_time_since_target" -> """
      SELECT event_id, user_id,
             max(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_target_ts,
             round((epoch_us(ts) -
                    epoch_us(max(CASE WHEN event_type = 'purchase' THEN ts
                                 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING))) / 1e6, 6)
               AS secs_since_target
      FROM events ORDER BY event_id""",


    // Markov transitions: lead pairs → bounded |domain|² fold
    "q_transition_matrix" -> """
      WITH pairs AS (
        SELECT event_type AS from_state,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_state
        FROM events),
      c AS (SELECT from_state, to_state, count(*) AS n FROM pairs
            WHERE to_state IS NOT NULL GROUP BY 1, 2)
      SELECT from_state, to_state, n,
             round(n / sum(n) OVER (PARTITION BY from_state), 6) AS p
      FROM c ORDER BY from_state, to_state""",


    // forward-window labels: same rows-following window min — equal-ts
    // targets count as "after" via (ts, id) row order, both engines
    "q_future_labels" -> """
      WITH t AS (
        SELECT event_id, user_id, ts,
               min(CASE WHEN event_type = 'purchase' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                 AS next_target_ts
        FROM events)
      SELECT event_id, user_id, next_target_ts,
             (next_target_ts IS NOT NULL
              AND next_target_ts <= ts + INTERVAL 24 HOURS) AS label
      FROM t ORDER BY event_id""",


    // bidirectional as-of: refs-first tie order makes a simultaneous
    // view score gap 0 through the backward (max-over-preceding) arm
    "q_nearest_join" -> """
      WITH t AS (
        SELECT event_id, user_id, ts,
               (event_type = 'purchase') AS is_probe,
               CASE WHEN event_type = 'view' THEN ts END AS ref_ts
        FROM events WHERE event_type IN ('purchase', 'view')),
      w AS (
        SELECT event_id, user_id, ts, is_probe,
               max(ref_ts) OVER
                 (PARTITION BY user_id
                  ORDER BY ts, CAST(is_probe AS INT), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_ref_ts,
               min(ref_ts) OVER
                 (PARTITION BY user_id
                  ORDER BY ts, CAST(is_probe AS INT), event_id
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                 AS next_ref_ts
        FROM t),
      n AS (
        SELECT event_id, user_id, ts, prev_ref_ts, next_ref_ts,
               CASE WHEN prev_ref_ts IS NULL THEN next_ref_ts
                    WHEN next_ref_ts IS NULL THEN prev_ref_ts
                    WHEN epoch_us(ts) - epoch_us(prev_ref_ts)
                         <= epoch_us(next_ref_ts) - epoch_us(ts)
                      THEN prev_ref_ts
                    ELSE next_ref_ts END AS nearest_ref_ts
        FROM w WHERE is_probe)
      SELECT event_id, user_id, prev_ref_ts, next_ref_ts, nearest_ref_ts,
             round(abs(epoch_us(ts) - epoch_us(nearest_ref_ts)) / 1e6, 6)
               AS gap_secs
      FROM n ORDER BY event_id""",


    // SCD2: run-boundary lag + running boundary count = run id, then
    // lead(valid_from) chains [valid_from, valid_to) intervals.
    // q_scd2_incremental folds a split history and must reproduce this
    // full-history result EXACTLY, so it replays the same SQL.
    "q_scd2" -> scd2Sql,

    "q_scd2_incremental" -> scd2Sql,


    // lag-k autocorrelation: bucket agg, one ordered lag pass, then one
    // corr per k — unrolled as a UNION because corr is an aggregate
    "q_autocorr" -> {
      val lags = (1 to 14)
        .map(k => s"lag(x, $k) OVER (ORDER BY bucket) AS l$k")
        .mkString(",\n               ")
      val arms = (1 to 14)
        .map(k => s"SELECT $k AS lag, corr(x, l$k) AS c, " +
          s"count(l$k) AS n_pairs FROM l")
        .mkString("\n        UNION ALL ")
      s"""
      WITH s AS (SELECT CAST(o_orderdate AS DATE) AS bucket,
                        avg(o_totalprice) AS x
                 FROM orders GROUP BY 1),
      l AS (SELECT bucket, x,
               $lags
            FROM s)
      SELECT lag, round(c, 6) AS autocorr, n_pairs
      FROM ($arms)
      ORDER BY lag"""
    },


    // PACF lags 1-3: centi-lattice daily series, exact HUGEINT per-lag
    // sufficient sums, fixed correlation and Durbin-Levinson trees
    "q_pacf" -> {
      def sums(k: Int) =
        s"""count(CASE WHEN l$k IS NOT NULL THEN 1 END) AS n$k,
              sum(CASE WHEN l$k IS NOT NULL THEN CAST(y AS HUGEINT)
                END) AS sa$k,
              sum(CASE WHEN l$k IS NOT NULL THEN CAST(l$k AS HUGEINT)
                END) AS sb$k,
              sum(CASE WHEN l$k IS NOT NULL THEN CAST(y AS HUGEINT) * y
                END) AS saa$k,
              sum(CASE WHEN l$k IS NOT NULL THEN CAST(y AS HUGEINT) * l$k
                END) AS sab$k,
              sum(CASE WHEN l$k IS NOT NULL THEN CAST(l$k AS HUGEINT) * l$k
                END) AS sbb$k"""
      def rK(k: Int) =
        s"""CASE WHEN sqrt((CAST(n$k AS DOUBLE) * CAST(saa$k AS DOUBLE)
               - CAST(sa$k AS DOUBLE) * CAST(sa$k AS DOUBLE))
              * (CAST(n$k AS DOUBLE) * CAST(sbb$k AS DOUBLE)
               - CAST(sb$k AS DOUBLE) * CAST(sb$k AS DOUBLE))) > 0
            THEN (CAST(n$k AS DOUBLE) * CAST(sab$k AS DOUBLE)
               - CAST(sa$k AS DOUBLE) * CAST(sb$k AS DOUBLE))
              / sqrt((CAST(n$k AS DOUBLE) * CAST(saa$k AS DOUBLE)
               - CAST(sa$k AS DOUBLE) * CAST(sa$k AS DOUBLE))
              * (CAST(n$k AS DOUBLE) * CAST(sbb$k AS DOUBLE)
               - CAST(sb$k AS DOUBLE) * CAST(sb$k AS DOUBLE))) END AS r$k"""
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS y
            FROM orders GROUP BY 1),
      l AS (SELECT y, lag(y, 1) OVER (ORDER BY d) AS l1,
              lag(y, 2) OVER (ORDER BY d) AS l2,
              lag(y, 3) OVER (ORDER BY d) AS l3
            FROM daily),
      f AS (SELECT ${sums(1)},
              ${sums(2)},
              ${sums(3)} FROM l),
      r AS (SELECT n1, n2, n3, ${rK(1)}, ${rK(2)}, ${rK(3)} FROM f),
      p2 AS (SELECT *, 1.0 - r1 * r1 AS d22 FROM r),
      p3 AS (SELECT *, CASE WHEN d22 > 0
               THEN (r2 - r1 * r1) / d22 END AS p22 FROM p2),
      p4 AS (SELECT *, r1 - p22 * r1 AS p21 FROM p3),
      p5 AS (SELECT *, 1.0 - p21 * r1 - p22 * r2 AS den3 FROM p4),
      p6 AS (SELECT *, CASE WHEN den3 > 0
               THEN (r3 - p21 * r2 - p22 * r1) / den3 END AS p33 FROM p5)
      SELECT 1 AS lag, CAST(n1 AS BIGINT) AS n_pairs,
             round(r1, 6) AS acf, round(r1, 6) AS pacf FROM p6
      UNION ALL
      SELECT 2, CAST(n2 AS BIGINT), round(r2, 6), round(p22, 6) FROM p6
      UNION ALL
      SELECT 3, CAST(n3 AS BIGINT), round(r3, 6), round(p33, 6) FROM p6
      ORDER BY lag"""
    },


    // CUSUM: the prefix-minus-running-min identity replayed verbatim;
    // P₀ = 0 participates via least(0, running min)
    // DAU/MAU stickiness: each user-day fans out to the 7 days it keeps
    // the user window-active for; day roster clips the tail
    "q_stickiness" -> """
      WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
                  FROM events),
      dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
              FROM ud GROUP BY 1),
      ex AS (SELECT DISTINCT u, d + CAST(x AS INTEGER) AS day
             FROM ud, (SELECT unnest(generate_series(0, 6)) AS x)),
      mau AS (SELECT day, CAST(count(*) AS BIGINT) AS mau
              FROM ex GROUP BY 1)
      SELECT dau.day, dau.dau, mau.mau,
             round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
      FROM dau JOIN mau ON dau.day = mau.day
      ORDER BY dau.day""",


    // Page-Hinkley: running-mean drift monitor — daily means from exact
    // centi sums, the sequential statistic as running-sum-minus-running-
    // min (cusum's identity), rounded stats vs the shared lambda literal
    "q_page_hinkley" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
              CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                / count(*) / 100.0 AS x
            FROM events GROUP BY 1),
      r AS (SELECT day, x,
              CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
              sum(x) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM daily),
      t AS (SELECT day, x,
              x - cum / rn - 0.05 AS up,
              cum / rn - x - 0.05 AS dn
            FROM r),
      m AS (SELECT day, x,
              sum(up) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mu,
              sum(dn) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS md
            FROM t),
      f AS (SELECT day, x,
              round(mu - least(0.0, min(mu) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                AS ph_up,
              round(md - least(0.0, min(md) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                AS ph_down
            FROM m)
      SELECT day, round(x, 6) AS x, ph_up, ph_down,
             ph_up > 5.0 OR ph_down > 5.0 AS alarm
      FROM f ORDER BY day""",


    // inter-arrival profile: exact microsecond gaps, CV from exact
    // HUGEINT moment sums (the µs unit cancels in the ratio)
    "q_interarrival" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      g AS (SELECT user_id,
              us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us)
                AS gap
            FROM e),
      p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
              CAST(sum(gap) AS BIGINT) AS sg,
              sum(CAST(gap AS HUGEINT) * gap) AS sgg,
              CAST(min(gap) AS BIGINT) AS mn,
              CAST(max(gap) AS BIGINT) AS mx
            FROM g WHERE gap IS NOT NULL GROUP BY user_id)
      SELECT user_id, n_gaps,
             -- scale-0 round of the us mean (engine parity: round(x, 6)
             -- splits engines on exact 7th-digit-5 rationals)
             round(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE), 0) / 1e6
               AS mean_gap_s,
             round(CAST(mn AS DOUBLE) / 1e6, 6) AS min_gap_s,
             round(CAST(mx AS DOUBLE) / 1e6, 6) AS max_gap_s,
             CASE WHEN CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) > 0
             THEN round(sqrt(CAST(CAST(n_gaps AS HUGEINT) * sgg
                 - CAST(sg AS HUGEINT) * sg AS DOUBLE)
               / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
               / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 6)
             END AS cv
      FROM p ORDER BY user_id""",


    "q_cusum_drift" -> """
      WITH d AS (SELECT CAST(ts AS DATE) AS day, avg(value) AS x
                 FROM events GROUP BY 1),
      r AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
      b AS (SELECT avg(x) AS mu0, stddev_pop(x) AS sigma0
            FROM r WHERE rn <= 7),
      p AS (SELECT r.day, r.x, b.mu0, b.sigma0,
              sum(r.x - b.mu0 - 0.5 * b.sigma0) OVER (ORDER BY r.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
              sum(b.mu0 - r.x - 0.5 * b.sigma0) OVER (ORDER BY r.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qq
            FROM r CROSS JOIN b),
      sres AS (SELECT day, x, mu0, sigma0,
              round(pp - least(0, min(pp) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                AS s_pos,
              round(qq - least(0, min(qq) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
                AS s_neg
            FROM p)
      SELECT day, round(x, 6) AS x, round(mu0, 6) AS mu0, s_pos, s_neg,
             (s_pos > round(3.0 * sigma0, 6)
              OR s_neg > round(3.0 * sigma0, 6)) AS alarm
      FROM sres ORDER BY day""",


    "q_temporal_split" -> """
      SELECT split, count(*) AS n, min(ts) AS min_ts, max(ts) AS max_ts
      FROM (SELECT ts,
              CASE WHEN ts <= TIMESTAMP '2024-01-15 00:00:00' THEN 'train'
                   WHEN ts <= TIMESTAMP '2024-01-18 00:00:00' THEN 'embargo'
                   ELSE 'test' END AS split
            FROM events)
      GROUP BY split ORDER BY split""",


    // interval join: the oracle states the SEMANTICS (plain containment
    // join); the engine's bin replication is an execution detail it must
    // exactly reproduce
    "q_interval_join" -> """
      WITH c AS (
        SELECT t.event_type,
               t.event_type || '_w' || CAST(w AS VARCHAR) AS campaign_id,
               CAST(DATE '2024-01-01' + (w*7) * INTERVAL 1 DAY
                    AS TIMESTAMP) AS cstart,
               CAST(DATE '2024-01-01' + (w*7+10) * INTERVAL 1 DAY
                    AS TIMESTAMP) AS cend
        FROM (SELECT DISTINCT event_type FROM events) t,
             generate_series(0, 4) g(w))
      SELECT e.event_id, c.campaign_id
      FROM events e
      JOIN c ON e.event_type = c.event_type
            AND e.ts >= c.cstart AND e.ts < c.cend
      ORDER BY e.event_id, c.campaign_id""",


    // group k-fold: the shared minstd hash replayed on user_id, floor to
    // k buckets with the k-1 clamp (u = 1.0 edge) — both engines identical
    "q_group_kfold" -> s"""
      SELECT event_id, user_id,
             CAST(least(floor(${uk("user_id", 83)} * 5), 4) AS INT) AS fold
      FROM events ORDER BY event_id""",


    // negative downsample: survival + weight replayed from the same hash;
    // weight literals (1.0, 1/0.25) are exact doubles in both engines
    "q_negative_downsample" -> s"""
      SELECT event_id, (event_type = 'purchase') AS label,
             CAST(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 4.0 END
                  AS DOUBLE) AS weight
      FROM events
      WHERE event_type = 'purchase' OR ${uk("event_id", 89)} <= 0.25
      ORDER BY event_id""",


    "q_psi_drift" -> """
      WITH clean AS (
        SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
          AND event_type IN ('view', 'purchase')),
      cuts AS (
        SELECT quantile_cont(CASE WHEN event_type = 'view' THEN CAST(value AS DOUBLE) END, 0.1) AS c1,
               quantile_cont(CASE WHEN event_type = 'view' THEN CAST(value AS DOUBLE) END, 0.2) AS c2,
               quantile_cont(CASE WHEN event_type = 'view' THEN CAST(value AS DOUBLE) END, 0.3) AS c3,
               quantile_cont(CASE WHEN event_type = 'view' THEN CAST(value AS DOUBLE) END, 0.4) AS c4,
               quantile_cont(CASE WHEN event_type = 'view' THEN CAST(value AS DOUBLE) END, 0.5) AS c5,
               quantile_cont(CASE WHEN event_type = 'view' THEN CAST(value AS DOUBLE) END, 0.6) AS c6,
               quantile_cont(CASE WHEN event_type = 'view' THEN CAST(value AS DOUBLE) END, 0.7) AS c7,
               quantile_cont(CASE WHEN event_type = 'view' THEN CAST(value AS DOUBLE) END, 0.8) AS c8,
               quantile_cont(CASE WHEN event_type = 'view' THEN CAST(value AS DOUBLE) END, 0.9) AS c9
        FROM clean),
      binned AS (
        SELECT event_type,
               (CASE WHEN value > c1 THEN 1 ELSE 0 END +
                CASE WHEN value > c2 THEN 1 ELSE 0 END +
                CASE WHEN value > c3 THEN 1 ELSE 0 END +
                CASE WHEN value > c4 THEN 1 ELSE 0 END +
                CASE WHEN value > c5 THEN 1 ELSE 0 END +
                CASE WHEN value > c6 THEN 1 ELSE 0 END +
                CASE WHEN value > c7 THEN 1 ELSE 0 END +
                CASE WHEN value > c8 THEN 1 ELSE 0 END +
                CASE WHEN value > c9 THEN 1 ELSE 0 END) AS bin
        FROM clean, cuts),
      counts AS (
        SELECT bin,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        FROM binned GROUP BY bin),
      prop AS (
        SELECT bin, n_ref, n_cur,
               CAST(n_ref AS DOUBLE) / CAST(sum(n_ref) OVER () AS DOUBLE) AS p,
               CAST(n_cur AS DOUBLE) / CAST(sum(n_cur) OVER () AS DOUBLE) AS q
        FROM counts),
      contrib AS (
        SELECT bin, n_ref, n_cur, p, q,
               CASE WHEN p > 0 AND q > 0 THEN (p - q) * ln(p / q)
                    ELSE 0.0 END AS contribution
        FROM prop)
      SELECT bin, n_ref, n_cur, round(p, 6) AS p, round(q, 6) AS q,
             round(contribution, 6) AS contribution,
             round(sum(contribution) OVER (), 6) AS psi
      FROM contrib ORDER BY bin""",


    // Kuiper V = D+ + D-: both sups elected on exact cross-multiplied
    // integers over the distinct-value ECDF (the ks_drift chain)
    "q_kuiper" -> """
      WITH clean AS (
        SELECT value AS v, event_type FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
          AND event_type IN ('purchase', 'view')),
      pv AS (SELECT v,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS ca,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS cb
        FROM clean GROUP BY v),
      c AS (SELECT
          CAST(sum(ca) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cuma,
          CAST(sum(cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cumb,
          CAST(sum(ca) OVER () AS BIGINT) AS na,
          CAST(sum(cb) OVER () AS BIGINT) AS nb
        FROM pv),
      f AS (SELECT CAST(max(na) AS BIGINT) AS n_a,
          CAST(max(nb) AS BIGINT) AS n_b,
          CAST(max(cuma * nb - cumb * na) AS BIGINT) AS dp,
          CAST(max(cumb * na - cuma * nb) AS BIGINT) AS dm
        FROM c)
      SELECT n_a, n_b,
        round(CAST(greatest(dp, 0) AS DOUBLE)
          / CAST(n_a * n_b AS DOUBLE), 6) AS d_plus,
        round(CAST(greatest(dm, 0) AS DOUBLE)
          / CAST(n_a * n_b AS DOUBLE), 6) AS d_minus,
        round(CAST(greatest(dp, 0) AS DOUBLE)
            / CAST(n_a * n_b AS DOUBLE)
          + CAST(greatest(dm, 0) AS DOUBLE)
            / CAST(n_a * n_b AS DOUBLE), 6) AS v_stat
      FROM f""",


    // TVD: exact-integer cross-multiplied |p - q| terms over the same
    // magnitude bins, scalar repeated per row (the psi shape)
    "q_tvd_drift" -> """
      WITH t AS (
        SELECT CASE WHEN value/1000.0 < 0.1 THEN 'negligible'
                    WHEN value/1000.0 < 0.2 THEN 'small'
                    WHEN value/1000.0 < 0.3 THEN 'moderate'
                    WHEN value/1000.0 < 0.5 THEN 'large'
                    ELSE 'very large' END AS category, event_type
        FROM events WHERE event_type IN ('view', 'purchase')),
      counts AS (
        SELECT category,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_ref,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                 END) AS BIGINT) AS n_cur
        FROM t GROUP BY category),
      x AS (
        SELECT category, n_ref, n_cur,
               CAST(sum(n_ref) OVER () AS BIGINT) AS tr,
               CAST(sum(n_cur) OVER () AS BIGINT) AS tc
        FROM counts),
      y AS (
        SELECT *, CAST(abs(n_ref * tc - n_cur * tr) AS BIGINT) AS num
        FROM x)
      SELECT category, n_ref, n_cur,
             round(CAST(num AS DOUBLE)
               / (2.0 * CAST(tr AS DOUBLE) * CAST(tc AS DOUBLE)), 6)
               AS contribution,
             round(CAST(sum(num) OVER () AS DOUBLE)
               / (2.0 * CAST(tr AS DOUBLE) * CAST(tc AS DOUBLE)), 6)
               AS tvd
      FROM y ORDER BY category""",


    "q_chi2_drift" -> """
      WITH t AS (
        SELECT CASE WHEN value/1000.0 < 0.1 THEN 'negligible'
                    WHEN value/1000.0 < 0.2 THEN 'small'
                    WHEN value/1000.0 < 0.3 THEN 'moderate'
                    WHEN value/1000.0 < 0.5 THEN 'large'
                    ELSE 'very large' END AS category, event_type
        FROM events WHERE event_type IN ('view', 'purchase')),
      counts AS (
        SELECT category,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        FROM t GROUP BY category),
      x AS (
        SELECT category, n_ref, n_cur,
               CAST(sum(n_ref) OVER () AS BIGINT) AS t_ref,
               CAST(sum(n_cur) OVER () AS BIGINT) AS t_cur,
               n_ref + n_cur AS row_t
        FROM counts),
      y AS (
        SELECT *, t_ref + t_cur AS grand FROM x),
      z AS (
        SELECT *,
               CAST(row_t AS DOUBLE) * t_ref / grand AS e_ref,
               CAST(row_t AS DOUBLE) * t_cur / grand AS e_cur
        FROM y),
      w AS (
        SELECT *,
               (n_ref - e_ref) * (n_ref - e_ref) / e_ref +
               (n_cur - e_cur) * (n_cur - e_cur) / e_cur AS cell
        FROM z)
      SELECT category, n_ref, n_cur, round(cell, 6) AS cell_chi2,
             round(sum(cell) OVER (), 6) AS chi2,
             CAST(count(*) OVER () - 1 AS INTEGER) AS dof
      FROM w ORDER BY category""",


    "q_quality_windows" -> """
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             count(*) AS total,
             CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS unexpected_not_null_user_id,
             CAST(sum(CASE WHEN value IS NOT NULL
                            AND NOT (value >= 0.0 AND value <= 400.0)
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS unexpected_between_value,
             CAST(sum(CASE WHEN event_type IS NOT NULL
                            AND event_type NOT IN
                              ('click','view','purchase','signup','error')
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS unexpected_in_set_event_type
      FROM events GROUP BY 1 ORDER BY window_start""",


    "q_rolling_anomalies" -> """
      WITH w AS (
        SELECT event_id, user_id, value,
               avg(value) OVER win AS mu,
               stddev_samp(value) OVER win AS sd
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT event_id, user_id, value,
             round(mu, 6) AS roll_avg, round(sd, 6) AS roll_std,
             round((value - mu) / sd, 6) AS z
      FROM w
      WHERE sd > 0 AND abs(round((value - mu) / sd, 6)) > 2
      ORDER BY event_id""",


    "q_rolling_features" -> """
      SELECT event_id, user_id, ts, value,
             lag(value, 1) OVER w AS prev_value,
             round(avg(value) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
               AS rolling_avg,
             CAST(row_number() OVER w AS INTEGER) AS event_idx
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id""",


    "q_iqr_outliers" -> """
      WITH q AS (
        SELECT event_type,
               quantile_cont(CAST(value AS DOUBLE), 0.25) AS q1,
               quantile_cont(CAST(value AS DOUBLE), 0.75) AS q3
        FROM events GROUP BY event_type)
      SELECT e.event_type,
             round(min(q.q1), 6) AS q1, round(min(q.q3), 6) AS q3,
             round(min(q.q3 - q.q1), 6) AS iqr,
             CAST(sum(CASE WHEN e.value < q.q1 - 1.5*(q.q3 - q.q1)
                            OR  e.value > q.q3 + 1.5*(q.q3 - q.q1)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             count(*) AS n_rows
      FROM events e JOIN q ON e.event_type = q.event_type
      GROUP BY e.event_type ORDER BY e.event_type""",


    // tolerance oracle: exact quartiles/fences replay; sketch-quartile and
    // sketch-fence-count booleans are deterministically TRUE (bounds in
    // Stats.iqrOutliersApproxChecked scaladoc)
    "q_iqr_outliers_approx" -> """
      WITH q AS (
        SELECT event_type,
               quantile_cont(CAST(value AS DOUBLE), 0.25) AS q1,
               quantile_cont(CAST(value AS DOUBLE), 0.75) AS q3
        FROM events GROUP BY event_type)
      SELECT e.event_type,
             round(min(q.q1), 6) AS q1, round(min(q.q3), 6) AS q3,
             round(min(q.q3 - q.q1), 6) AS iqr,
             CAST(sum(CASE WHEN e.value < q.q1 - 1.5*(q.q3 - q.q1)
                            OR  e.value > q.q3 + 1.5*(q.q3 - q.q1)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             count(*) AS n_rows,
             TRUE AS quartiles_ok, TRUE AS outliers_ok
      FROM events e JOIN q ON e.event_type = q.event_type
      GROUP BY e.event_type ORDER BY e.event_type""",


    // trailing 1-hour RANGE frame over epoch micros per user: count +
    // centi-lattice sum, equal-timestamp peers share the frame
    "q_rolling_time_window" -> """
      WITH b AS (SELECT event_id, user_id, ts, round(value, 6) AS value,
              epoch_us(ts) AS es,
              CAST(round(value * 100, 0) AS BIGINT) AS vc
            FROM events)
      SELECT event_id, user_id, ts, value,
             CAST(count(*) OVER w AS BIGINT) AS n_window,
             round(CAST(sum(vc) OVER w AS BIGINT) / 100.0, 2)
               AS sum_window
      FROM b WINDOW w AS (PARTITION BY user_id ORDER BY es
        RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",


    // Markov steady state: 30 unrolled normalized power steps over the
    // exact-integer-division transition matrix
    "q_markov_steady" -> markovSql(
      Seq("click", "error", "purchase", "signup", "view"), 30),


    // entropy rate of the behavior chain: same prelude + power steps,
    // per-state conditional entropies folded in ascending order
    "q_markov_entropy" -> markovEntropySql(
      Seq("click", "error", "purchase", "signup", "view"), 30),


    // expected steps to first purchase: 60 unrolled value-iteration
    // steps, target row pinned to 0
    "q_steps_to_convert" -> markovHitSql(
      Seq("click", "error", "purchase", "signup", "view"), "purchase", 60),


    // competing risks: P(purchase before error), win row pinned 1 and
    // lose row pinned 0 through the same unrolled iteration
    "q_convert_before_error" -> markovAbsorbSql(
      Seq("click", "error", "purchase", "signup", "view"),
      "purchase", "error", 60),


    // top path trigrams: two leads per key, keyed count, deterministic
    // top-25 on (count desc, trigram asc), corpus share
    "q_path_trigrams" -> """
      WITH t AS (SELECT event_type AS step1,
              lead(event_type, 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS step2,
              lead(event_type, 2) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS step3
            FROM events),
      c AS (SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
            FROM t WHERE step2 IS NOT NULL AND step3 IS NOT NULL
            GROUP BY 1, 2, 3),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
      SELECT step1, step2, step3, n,
             round(n / CAST((SELECT tot FROM tot) AS DOUBLE), 6) AS share
      FROM c ORDER BY n DESC, step1, step2, step3 LIMIT 25""",


    // two-sample log-rank over integer-hour durations: risk sets from
    // cumulative windows on the bounded duration grid, per-time
    // (d1-E1)/V terms on the 1e-6 lattice before the fold
    // Cox score at beta=0, covariate = per-user event count: exact
    // duration-grain risk-set folds, per-event-time U/V on the 1e-6
    // lattice (the logrank device), z in one fixed tree
    "q_cox_score" -> s"""
      WITH u AS (SELECT user_id AS uid, min(ts) AS start,
              min(CASE WHEN event_type = 'purchase' THEN ts END) AS ev,
              max(ts) AS last,
              CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY user_id),
      a AS (SELECT uid, x,
              CAST(floor((epoch_us(coalesce(ev, last))
                - epoch_us(start)) / 3600000000) AS BIGINT) AS dur,
              CASE WHEN ev IS NOT NULL THEN 1 ELSE 0 END AS e
            FROM u),
      g AS (SELECT dur,
              CAST(count(*) AS BIGINT) AS na,
              CAST(sum(e) AS BIGINT) AS d,
              CAST(sum(x) AS BIGINT) AS sxa,
              CAST(sum(CASE WHEN e = 1 THEN x ELSE 0 END) AS BIGINT)
                AS sxe,
              sum(CAST(x AS HUGEINT) * x) AS sxx
            FROM a GROUP BY dur),
      r AS (SELECT *,
              CAST(sum(na) OVER () AS BIGINT)
                - CAST(coalesce(sum(na) OVER (ORDER BY dur ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                AS nt,
              CAST(sum(sxa) OVER () AS BIGINT)
                - CAST(coalesce(sum(sxa) OVER (ORDER BY dur ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                AS sx,
              sum(sxx) OVER ()
                - coalesce(sum(sxx) OVER (ORDER BY dur ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sxx2,
              CAST(sum(na) OVER () AS BIGINT) AS nu,
              CAST(sum(d) OVER () AS BIGINT) AS ne
            FROM g),
      terms AS (SELECT nu, ne,
              CAST(round((CAST(sxe AS DOUBLE) - CAST(d AS DOUBLE)
                * (CAST(sx AS DOUBLE) / CAST(nt AS DOUBLE)))
                * 1000000, 0) AS BIGINT) AS um,
              CAST(round((CAST(d AS DOUBLE)
                * (CAST(sxx2 AS DOUBLE) / CAST(nt AS DOUBLE)
                  - (CAST(sx AS DOUBLE) / CAST(nt AS DOUBLE))
                    * (CAST(sx AS DOUBLE) / CAST(nt AS DOUBLE))))
                * 1000000, 0) AS BIGINT) AS vm
            FROM r WHERE d > 0),
      f AS (SELECT CAST(min(nu) AS BIGINT) AS n_users,
              CAST(min(ne) AS BIGINT) AS n_events,
              CAST(sum(um) AS BIGINT) AS umt,
              CAST(sum(vm) AS BIGINT) AS vmt
            FROM terms)
      SELECT n_users, n_events,
             round(umt / 1000000.0, 6) AS score_u,
             round(vmt / 1000000.0, 6) AS variance,
             CASE WHEN vmt > 0 THEN round((umt / 1000000.0)
               / sqrt(vmt / 1000000.0), 6) END AS z
      FROM f""",

    "q_logrank" -> s"""
      WITH u AS (SELECT user_id AS uid, min(ts) AS start,
              min(CASE WHEN event_type = 'purchase' THEN ts END) AS ev,
              max(ts) AS last
            FROM events GROUP BY user_id),
      a AS (SELECT uid, ${uk("uid", 59)} > 0.5 AS t,
              CAST(floor((epoch_us(coalesce(ev, last))
                - epoch_us(start)) / 3600000000) AS BIGINT) AS dur,
              CASE WHEN ev IS NOT NULL THEN 1 ELSE 0 END AS e
            FROM u),
      g AS (SELECT dur,
              CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS a1,
              CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
                AS a0,
              CAST(sum(CASE WHEN t THEN e ELSE 0 END) AS BIGINT) AS d1,
              CAST(sum(CASE WHEN NOT t THEN e ELSE 0 END) AS BIGINT)
                AS d0
            FROM a GROUP BY dur),
      r AS (SELECT *,
              CAST(sum(a1) OVER () AS BIGINT)
                - CAST(coalesce(sum(a1) OVER (ORDER BY dur ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                AS r1,
              CAST(sum(a0) OVER () AS BIGINT)
                - CAST(coalesce(sum(a0) OVER (ORDER BY dur ROWS BETWEEN
                  UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                AS r0,
              CAST(sum(a1) OVER () AS BIGINT) AS n1,
              CAST(sum(a0) OVER () AS BIGINT) AS n0,
              CAST(sum(d1) OVER () AS BIGINT) AS e1s,
              CAST(sum(d0) OVER () AS BIGINT) AS e0s
            FROM g),
      terms AS (SELECT n1, n0, e1s, e0s,
              CAST(round((CAST(d1 AS DOUBLE)
                - CAST(d1 + d0 AS DOUBLE)
                  * (CAST(r1 AS DOUBLE) / (r1 + r0))) * 1000000, 0)
                AS BIGINT) AS om,
              CAST(round((CASE WHEN r1 + r0 > 1 THEN
                CAST(d1 + d0 AS DOUBLE)
                  * (CAST(r1 AS DOUBLE) / (r1 + r0))
                  * (1.0 - (CAST(r1 AS DOUBLE) / (r1 + r0)))
                  * (CAST((r1 + r0) - (d1 + d0) AS DOUBLE)
                    / ((r1 + r0) - 1))
                ELSE 0.0 END) * 1000000, 0) AS BIGINT) AS vm
            FROM r WHERE d1 + d0 > 0),
      f AS (SELECT CAST(min(n1) AS BIGINT) AS n_treat,
              CAST(min(n0) AS BIGINT) AS n_ctrl,
              CAST(min(e1s) AS BIGINT) AS events_treat,
              CAST(min(e0s) AS BIGINT) AS events_ctrl,
              CAST(sum(om) AS BIGINT) AS omt,
              CAST(sum(vm) AS BIGINT) AS vmt
            FROM terms)
      SELECT n_treat, n_ctrl, events_treat, events_ctrl,
             round(omt / 1000000.0, 6) AS observed_minus_expected,
             round(vmt / 1000000.0, 6) AS variance,
             CASE WHEN vmt > 0 THEN round(
               (omt / 1000000.0) * (omt / 1000000.0)
                 / (vmt / 1000000.0), 6) END AS chi2
      FROM f""",


    // modal next-state predictor scored in-sample: the row_number pick
    // (count desc, state asc) replayed, then one join-back fold
    "q_next_event_accuracy" -> """
      WITH pairs AS (SELECT event_type AS from_state,
              lead(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS actual
            FROM events),
      p2 AS (SELECT from_state, actual FROM pairs WHERE actual IS NOT NULL),
      c AS (SELECT from_state, actual AS cand, CAST(count(*) AS BIGINT) AS n
            FROM p2 GROUP BY 1, 2),
      pred AS (SELECT from_state, cand AS predicted_next FROM (
          SELECT from_state, cand, row_number() OVER (
              PARTITION BY from_state ORDER BY n DESC, cand ASC) AS rn
          FROM c) WHERE rn = 1)
      SELECT p2.from_state, CAST(count(*) AS BIGINT) AS n_transitions,
             min(pred.predicted_next) AS predicted_next,
             CAST(sum(CASE WHEN p2.actual = pred.predicted_next
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
             round(sum(CASE WHEN p2.actual = pred.predicted_next
                            THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 6) AS accuracy
      FROM p2 JOIN pred ON p2.from_state = pred.from_state
      GROUP BY p2.from_state ORDER BY p2.from_state""",


    // Markov removal-effect attribution: journeys truncated at first
    // purchase, one unrolled absorption chain per variant (full + each
    // channel pinned), shares in sorted-channel literal sum order
    "q_removal_attribution" -> removalAttributionSql(
      Seq("click", "error", "signup", "view"), 40),


    // fixed z-quantile literals (alpha=.05 two-sided, power=.80) — the
    // identical closed form on both engines, no inverse-CDF calls
    "q_ab_power" -> s"""
      WITH u AS (SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND value > 95.0
                        THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id),
      a AS (SELECT conv, ${uk("user_id", 59)} > 0.5 AS t FROM u),
      f AS (SELECT
              CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT)
                AS n_control,
              CAST(count(CASE WHEN t THEN 1 END) AS BIGINT)
                AS n_treatment,
              sum(CASE WHEN NOT t THEN conv END) AS cc,
              sum(CASE WHEN t THEN conv END) AS ct
            FROM a),
      e AS (SELECT *,
              cc / CAST(n_control AS DOUBLE) AS rc,
              ct / CAST(n_treatment AS DOUBLE) AS rt,
              abs(ct / CAST(n_treatment AS DOUBLE)
                - cc / CAST(n_control AS DOUBLE)) AS delta,
              (cc + ct) / CAST(n_control + n_treatment AS DOUBLE) AS pbar,
              least(n_control, n_treatment) AS nmin,
              1.959964 + 0.841621 AS zs
            FROM f)
      SELECT n_control, n_treatment,
             round(rc, 6) AS rate_control, round(rt, 6) AS rate_treatment,
             round(delta, 6) AS observed_delta,
             CASE WHEN delta > 0 THEN
               CAST(ceil(zs * zs * (rc * (1.0 - rc) + rt * (1.0 - rt))
                 / (delta * delta)) AS BIGINT) END AS required_n_per_arm,
             CASE WHEN nmin > 0 THEN
               round(zs * sqrt(2.0 * pbar * (1.0 - pbar) / nmin), 6)
             END AS mde_at_current_n,
             CASE WHEN delta > 0 THEN
               nmin >= ceil(zs * zs * (rc * (1.0 - rc) + rt * (1.0 - rt))
                 / (delta * delta)) END AS powered
      FROM e""",

    // ---- round-9 binned rank/ECDF twins (the latticeBin chain) ------------
    // Each replays the Scala delegation exactly: latticeBin first (shared
    // integer-lattice binning, OracleShared.latticeBinCtes), then the SAME
    // statistic fold as the exact sibling over the bin grain.

    // CvM over bins: pv at v = bin*100 (the Scala side feeds the bin id
    // into cvmTest, whose centi-lattice commit lands on exactly bin*100)
    "q_cvm_binned" -> s"""
      WITH ${latticeBinCtes("events", "value",
        "event_type IN ('purchase', 'view') AND value IS NOT NULL " +
          "AND NOT isnan(value)", "event_type")},
      pv AS (SELECT bin * 100 AS v,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS cb
             FROM binned GROUP BY 1),
      c AS (SELECT *,
              sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cuma,
              sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cumb,
              sum(ca) OVER () AS n, sum(cb) OVER () AS m
            FROM pv),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_values,
              CAST(max(n) AS BIGINT) AS n_a,
              CAST(max(m) AS BIGINT) AS n_b,
              sum(CAST(ca + cb AS HUGEINT)
                * (CAST(cuma AS HUGEINT) * m - CAST(cumb AS HUGEINT) * n)
                * (CAST(cuma AS HUGEINT) * m - CAST(cumb AS HUGEINT) * n))
                AS num
            FROM c)
      SELECT n_a, n_b, n_values,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(num AS DOUBLE)
          / (((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
            * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
            * (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) END, 6)
          AS cvm_t,
        CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(num AS DOUBLE)
          / (((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
            * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
            * (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) > 0.461 END
          AS drifted
      FROM f""",

    // Anderson-Darling (Scholz-Stephens midrank A2akN): 2x mid-
    // cumulatives keep half-ties integral; per-value term is a ratio of
    // exact integers committed to the 1e-12 lattice before the fold
    "q_anderson_darling" -> """
      WITH pv AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS cb
        FROM events
        WHERE event_type IN ('purchase', 'view')
          AND value IS NOT NULL AND NOT isnan(value)
        GROUP BY 1),
      c AS (SELECT *, ca + cb AS l,
              sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cuma,
              sum(ca + cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS cum,
              sum(ca) OVER () AS n, sum(cb) OVER () AS m
            FROM pv),
      t AS (SELECT n, m,
              CASE WHEN (cum * 2 - l) * ((n + m) * 2 - (cum * 2 - l))
                     - (n + m) * l > 0 AND n > 0 AND m > 0
                THEN CAST(round(
                  ((CAST(l AS DOUBLE) / CAST(n + m AS DOUBLE))
                    * (CAST((n + m) * (cuma * 2 - ca) - n * (cum * 2 - l)
                         AS DOUBLE)
                       * CAST((n + m) * (cuma * 2 - ca)
                           - n * (cum * 2 - l) AS DOUBLE)
                       / CAST(n AS DOUBLE)
                     + CAST((n + m) * ((cum - cuma) * 2 - (l - ca))
                         - m * (cum * 2 - l) AS DOUBLE)
                       * CAST((n + m) * ((cum - cuma) * 2 - (l - ca))
                           - m * (cum * 2 - l) AS DOUBLE)
                       / CAST(m AS DOUBLE))
                    / CAST((cum * 2 - l) * ((n + m) * 2 - (cum * 2 - l))
                        - (n + m) * l AS DOUBLE)) * 1e12, 0) AS HUGEINT)
                END AS term
            FROM c),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_values,
              CAST(max(n) AS BIGINT) AS n_a, CAST(max(m) AS BIGINT) AS n_b,
              coalesce(sum(term), 0) AS sterm
            FROM t)
      SELECT n_a, n_b, n_values,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN
          (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)
            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
            * (CAST(sterm AS DOUBLE) / 1e12) END, 6) AS ad_stat
      FROM f""",

    // AD over bins: same fold, pv at the bin grain
    "q_anderson_darling_binned" -> s"""
      WITH ${latticeBinCtes("events", "value",
        "event_type IN ('purchase', 'view') AND value IS NOT NULL " +
          "AND NOT isnan(value)", "event_type")},
      pv AS (SELECT bin AS v,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS cb
             FROM binned GROUP BY 1),
      c AS (SELECT *, ca + cb AS l,
              sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cuma,
              sum(ca + cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS cum,
              sum(ca) OVER () AS n, sum(cb) OVER () AS m
            FROM pv),
      t AS (SELECT n, m,
              CASE WHEN (cum * 2 - l) * ((n + m) * 2 - (cum * 2 - l))
                     - (n + m) * l > 0 AND n > 0 AND m > 0
                THEN CAST(round(
                  ((CAST(l AS DOUBLE) / CAST(n + m AS DOUBLE))
                    * (CAST((n + m) * (cuma * 2 - ca) - n * (cum * 2 - l)
                         AS DOUBLE)
                       * CAST((n + m) * (cuma * 2 - ca)
                           - n * (cum * 2 - l) AS DOUBLE)
                       / CAST(n AS DOUBLE)
                     + CAST((n + m) * ((cum - cuma) * 2 - (l - ca))
                         - m * (cum * 2 - l) AS DOUBLE)
                       * CAST((n + m) * ((cum - cuma) * 2 - (l - ca))
                           - m * (cum * 2 - l) AS DOUBLE)
                       / CAST(m AS DOUBLE))
                    / CAST((cum * 2 - l) * ((n + m) * 2 - (cum * 2 - l))
                        - (n + m) * l AS DOUBLE)) * 1e12, 0) AS HUGEINT)
                END AS term
            FROM c),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_values,
              CAST(max(n) AS BIGINT) AS n_a, CAST(max(m) AS BIGINT) AS n_b,
              coalesce(sum(term), 0) AS sterm
            FROM t)
      SELECT n_a, n_b, n_values,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN
          (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)
            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
            * (CAST(sterm AS DOUBLE) / 1e12) END, 6) AS ad_stat
      FROM f""",

    // Energy over bins: pv at v = repr (the bin's centi-lattice
    // representative — magnitudes matter for the gap integral)
    "q_energy_binned" -> s"""
      WITH ${latticeBinCtes("events", "value",
        "event_type IN ('purchase', 'view') AND value IS NOT NULL " +
          "AND NOT isnan(value)", "event_type")},
      pv AS (SELECT repr AS v,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS cb
             FROM binned GROUP BY 1),
      c AS (SELECT *,
              sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cuma,
              sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cumb,
              lead(v, 1) OVER (ORDER BY v) - v AS gap,
              sum(ca) OVER () AS n, sum(cb) OVER () AS m
            FROM pv),
      f AS (SELECT
              CAST(max(n) AS BIGINT) AS n_a, CAST(max(m) AS BIGINT) AS n_b,
              sum(CAST(gap AS HUGEINT) * (CAST(cuma AS HUGEINT)
                * (m - cumb) + CAST(cumb AS HUGEINT) * (n - cuma)))
                AS sxy,
              sum(CAST(gap AS HUGEINT) * CAST(cuma AS HUGEINT)
                * (n - cuma)) AS sxx,
              sum(CAST(gap AS HUGEINT) * CAST(cumb AS HUGEINT)
                * (m - cumb)) AS syy
            FROM c WHERE gap IS NOT NULL),
      t AS (SELECT n_a, n_b,
              CAST(sxy AS DOUBLE) / (CAST(n_a AS DOUBLE)
                * CAST(n_b AS DOUBLE)) / 100.0 AS exy,
              2.0 * CAST(sxx AS DOUBLE) / (CAST(n_a AS DOUBLE)
                * CAST(n_a AS DOUBLE)) / 100.0 AS exx,
              2.0 * CAST(syy AS DOUBLE) / (CAST(n_b AS DOUBLE)
                * CAST(n_b AS DOUBLE)) / 100.0 AS eyy
            FROM f)
      SELECT n_a, n_b,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN exy END, 6) AS e_between,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN exx END, 6)
          AS e_within_a,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN eyy END, 6)
          AS e_within_b,
        round(CASE WHEN n_a > 0 AND n_b > 0
          THEN 2.0 * exy - exx - eyy END, 6) AS energy_d2,
        round(CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(n_a AS DOUBLE)
          * CAST(n_b AS DOUBLE) / (CAST(n_a AS DOUBLE)
          + CAST(n_b AS DOUBLE)) * (2.0 * exy - exx - eyy) END, 6)
          AS e_stat
      FROM t""",

    // Frozen-bounds drift (streaming monitor's batch twin): bounds from
    // the view (reference) side only, live side clamped into edge bins,
    // full-outer histogram merge, per-feature binned ECDF max
    "q_drift_vs_ref" -> """
      WITH cur AS (SELECT 'value' AS feature, CAST(value AS DOUBLE) AS v
                   FROM events WHERE event_type = 'purchase'
                     AND value IS NOT NULL AND NOT isnan(value)),
      ref AS (SELECT 'value' AS feature, CAST(value AS DOUBLE) AS v
              FROM events WHERE event_type = 'view'
                AND value IS NOT NULL AND NOT isnan(value)),
      bounds AS (SELECT feature, CAST(min(v) AS DOUBLE) AS lo,
                   CAST(max(v) AS DOUBLE) AS hi
                 FROM ref GROUP BY feature),
      binc AS (SELECT c.feature,
                 CASE WHEN b.hi = b.lo THEN 0
                   ELSE least(greatest(CAST(floor((c.v - b.lo)
                     / ((b.hi - b.lo) / 1000)) AS INTEGER), 0), 999) END
                   AS bin
               FROM cur c JOIN bounds b USING (feature)),
      binr AS (SELECT r.feature,
                 CASE WHEN b.hi = b.lo THEN 0
                   ELSE least(greatest(CAST(floor((r.v - b.lo)
                     / ((b.hi - b.lo) / 1000)) AS INTEGER), 0), 999) END
                   AS bin
               FROM ref r JOIN bounds b USING (feature)),
      hc AS (SELECT feature, bin, CAST(count(*) AS BIGINT) AS ca
             FROM binc GROUP BY 1, 2),
      hr AS (SELECT feature, bin, CAST(count(*) AS BIGINT) AS cb
             FROM binr GROUP BY 1, 2),
      merged AS (SELECT coalesce(hc.feature, hr.feature) AS feature,
                   coalesce(hc.bin, hr.bin) AS bin,
                   coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
                 FROM hc FULL JOIN hr
                   ON hc.feature = hr.feature AND hc.bin = hr.bin),
      c AS (SELECT feature,
              sum(ca) OVER (PARTITION BY feature ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
              sum(cb) OVER (PARTITION BY feature ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
              sum(ca) OVER (PARTITION BY feature) AS na,
              sum(cb) OVER (PARTITION BY feature) AS nb
            FROM merged)
      SELECT feature, CAST(max(na) AS BIGINT) AS n_a,
             CAST(max(nb) AS BIGINT) AS n_b,
             round(max(abs(CAST(cuma AS DOUBLE) / na
               - CAST(cumb AS DOUBLE) / nb)), 6) AS ks_stat
      FROM c GROUP BY feature ORDER BY feature""",

    // Kuiper over bins: order-only, pv at v = bin
    "q_kuiper_binned" -> s"""
      WITH ${latticeBinCtes("events", "value",
        "event_type IN ('purchase', 'view') AND value IS NOT NULL " +
          "AND NOT isnan(value)", "event_type")},
      pv AS (SELECT bin AS v,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS ca,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS cb
        FROM binned GROUP BY 1),
      c AS (SELECT
          CAST(sum(ca) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cuma,
          CAST(sum(cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cumb,
          CAST(sum(ca) OVER () AS BIGINT) AS na,
          CAST(sum(cb) OVER () AS BIGINT) AS nb
        FROM pv),
      f AS (SELECT CAST(max(na) AS BIGINT) AS n_a,
          CAST(max(nb) AS BIGINT) AS n_b,
          CAST(max(cuma * nb - cumb * na) AS BIGINT) AS dp,
          CAST(max(cumb * na - cuma * nb) AS BIGINT) AS dm
        FROM c)
      SELECT n_a, n_b,
        round(CAST(greatest(dp, 0) AS DOUBLE)
          / CAST(n_a * n_b AS DOUBLE), 6) AS d_plus,
        round(CAST(greatest(dm, 0) AS DOUBLE)
          / CAST(n_a * n_b AS DOUBLE), 6) AS d_minus,
        round(CAST(greatest(dp, 0) AS DOUBLE)
            / CAST(n_a * n_b AS DOUBLE)
          + CAST(greatest(dm, 0) AS DOUBLE)
            / CAST(n_a * n_b AS DOUBLE), 6) AS v_stat
      FROM f""")
}
