package graft
package oracle

/** DuckDB oracle SQL — statistics, OLAP, graph, survival, eval (AnalyticsRegistry). One domain slice of the former
  * monolithic OracleSql map; entries are verbatim, parity rules on
  * [[graft.OracleSql]].
  */
private[graft] object AnalyticsOracleSql {
  import OracleShared._

  /** Shared Holt-Winters recursive CTE chain (daily -> seq -> hw);
    * both HW queries append their own projection. */
  private val hwCtes: String = """
      WITH RECURSIVE daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS yc
            FROM orders GROUP BY 1),
      seq AS (SELECT d, CAST(yc AS DOUBLE) / 100.0 AS y,
              CAST((d - DATE '1970-01-01') % 7 AS INTEGER) AS slot,
              row_number() OVER (ORDER BY d) AS t FROM daily),
      hw AS (
        SELECT t, d, y, y AS fitted, y AS lvl,
               CAST(0.0 AS DOUBLE) AS trd,
               CAST(0.0 AS DOUBLE) AS s0, CAST(0.0 AS DOUBLE) AS s1,
               CAST(0.0 AS DOUBLE) AS s2, CAST(0.0 AS DOUBLE) AS s3,
               CAST(0.0 AS DOUBLE) AS s4, CAST(0.0 AS DOUBLE) AS s5,
               CAST(0.0 AS DOUBLE) AS s6
        FROM seq WHERE t = 1
        UNION ALL
        SELECT t, d, y, lvl0 + trd0 + sp AS fitted, lvln AS lvl,
               0.125 * (lvln - lvl0) + 0.875 * trd0 AS trd,
               CASE WHEN slot = 0 THEN 0.25 * (y - lvln) + 0.75 * s0
                 ELSE s0 END AS s0,
               CASE WHEN slot = 1 THEN 0.25 * (y - lvln) + 0.75 * s1
                 ELSE s1 END AS s1,
               CASE WHEN slot = 2 THEN 0.25 * (y - lvln) + 0.75 * s2
                 ELSE s2 END AS s2,
               CASE WHEN slot = 3 THEN 0.25 * (y - lvln) + 0.75 * s3
                 ELSE s3 END AS s3,
               CASE WHEN slot = 4 THEN 0.25 * (y - lvln) + 0.75 * s4
                 ELSE s4 END AS s4,
               CASE WHEN slot = 5 THEN 0.25 * (y - lvln) + 0.75 * s5
                 ELSE s5 END AS s5,
               CASE WHEN slot = 6 THEN 0.25 * (y - lvln) + 0.75 * s6
                 ELSE s6 END AS s6
        FROM (SELECT q.t, q.d, q.y, q.slot,
                hw.lvl AS lvl0, hw.trd AS trd0,
                hw.s0, hw.s1, hw.s2, hw.s3, hw.s4, hw.s5, hw.s6,
                CASE q.slot WHEN 0 THEN hw.s0 WHEN 1 THEN hw.s1
                  WHEN 2 THEN hw.s2 WHEN 3 THEN hw.s3 WHEN 4 THEN hw.s4
                  WHEN 5 THEN hw.s5 ELSE hw.s6 END AS sp,
                0.25 * (q.y - CASE q.slot WHEN 0 THEN hw.s0
                    WHEN 1 THEN hw.s1 WHEN 2 THEN hw.s2 WHEN 3 THEN hw.s3
                    WHEN 4 THEN hw.s4 WHEN 5 THEN hw.s5 ELSE hw.s6 END)
                  + 0.75 * (hw.lvl + hw.trd) AS lvln
              FROM hw JOIN seq q ON q.t = hw.t + 1))"""

  // 2-component Gaussian EM CTE chain (bb -> gg0 -> gg -> hb/hh/hm ->
  // gp0..gp3) shared by q_gmm_em and q_gmm_bic; `select` appends its
  // own final CTEs + SELECT
  private def gmmSql(select: String): String = {
      val bins = 256; val rounds = 3
      val roundCtes = (1 to rounds).map { r =>
        s"""gpk$r AS (SELECT *,
            CAST(round((ln(w1) - 0.5 * ln(v1)) * 1e9, 0) AS BIGINT)
              AS k1,
            CAST(round((ln(1.0 - w1) - 0.5 * ln(v2)) * 1e9, 0)
              AS BIGINT) AS k2
          FROM gp${r - 1}),
      ge$r AS (SELECT h.b, h.c,
            CAST(round(1.0 / (1.0 + exp(0.0 - (
              CAST(pk.k1 - pk.k2 AS DOUBLE) / 1e9
              - (h.mb - pk.mu1) * (h.mb - pk.mu1) / (2.0 * pk.v1)
              + (h.mb - pk.mu2) * (h.mb - pk.mu2) / (2.0 * pk.v2))))
              * 1e6, 0) AS BIGINT) AS r6
          FROM hm h, gpk$r pk),
      gm$r AS (SELECT
            sum(CAST(c AS HUGEINT) * r6) AS n1,
            sum(CAST(c AS HUGEINT) * (1000000 - r6)) AS n2,
            sum(CAST(c AS HUGEINT) * r6 * (b * 2 + 1)) AS s1,
            sum(CAST(c AS HUGEINT) * (1000000 - r6) * (b * 2 + 1))
              AS s2,
            sum(CAST(c AS HUGEINT) * r6 * (b * 2 + 1) * (b * 2 + 1))
              AS q1,
            sum(CAST(c AS HUGEINT) * (1000000 - r6) * (b * 2 + 1)
              * (b * 2 + 1)) AS q2
          FROM ge$r),
      gp$r AS (SELECT n, lo, hi, loD, width, span, var0,
            CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE)
              + CAST(n2 AS DOUBLE)) AS w1,
            loD + e1 AS mu1,
            width * width * (CAST(q1 AS DOUBLE)
              / (4.0 * CAST(n1 AS DOUBLE))) - e1 * e1 AS v1,
            loD + e2 AS mu2,
            width * width * (CAST(q2 AS DOUBLE)
              / (4.0 * CAST(n2 AS DOUBLE))) - e2 * e2 AS v2
          FROM (SELECT gm$r.*, gg.*,
                  width * (CAST(s1 AS DOUBLE)
                    / (2.0 * CAST(n1 AS DOUBLE))) AS e1,
                  width * (CAST(s2 AS DOUBLE)
                    / (2.0 * CAST(n2 AS DOUBLE))) AS e2
                FROM gm$r, gg))"""
      }.mkString(",\n      ")
      s"""
      WITH bb AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT)
              AS xc
            FROM orders
            WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)),
      gg0 AS (SELECT min(xc) AS lo, max(xc) AS hi,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(xc) AS BIGINT) AS s,
              sum(CAST(xc AS HUGEINT) * xc) AS q
            FROM bb),
      gg AS (SELECT lo, hi, n,
              CAST(lo AS DOUBLE) / 100.0 AS loD,
              CAST(hi - lo + 1 AS DOUBLE) / 100.0 AS span,
              CAST(hi - lo + 1 AS DOUBLE) / ${100.0 * bins} AS width,
              (CAST(q AS DOUBLE) / 1e4 - (CAST(s AS DOUBLE) / 1e2)
                * (CAST(s AS DOUBLE) / 1e2) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE) AS var0
            FROM gg0),
      hb AS (SELECT ((bb.xc - gg.lo) * $bins) // (gg.hi - gg.lo + 1)
              AS b
            FROM bb, gg),
      hh AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM hb GROUP BY b),
      hm AS (SELECT hh.b, hh.c,
              gg.loD + CAST(hh.b * 2 + 1 AS DOUBLE) * gg.width / 2.0
                AS mb
            FROM hh, gg),
      gp0 AS (SELECT n, lo, hi, loD, width, span, var0,
              0.5 AS w1,
              loD + 0.25 * span AS mu1, var0 AS v1,
              loD + 0.75 * span AS mu2, var0 AS v2
            FROM gg),
      $roundCtes,
      $select"""
  }

  val sql: Map[String, String] = Map(

    // incremental flagship: SAME oracle as the approx-checked flagship —
    // all additive/min columns must hash-match the merged-partials path,
    // the exact distinct replays, the sketch boolean is stably TRUE
    "q_incremental_hourly" -> s"""
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


    // manifest diff: the same per-day fingerprints derived for the two
    // export generations, full-outer joined to the resync action list
    "q_manifest_diff" -> """
      WITH fp AS (
        SELECT CAST(ts AS DATE) AS event_date, event_id,
               CAST(CAST(concat('0x', substr(md5(
                 concat_ws(chr(1),
                   coalesce(CAST(event_id AS VARCHAR), chr(2)),
                   coalesce(CAST(user_id AS VARCHAR), chr(2)),
                   coalesce(event_type, chr(2)),
                   coalesce(props, chr(2)))), 1, 15)) AS BIGINT) AS BIGINT)
                 AS h
        FROM events),
      b AS (SELECT event_date, bit_xor(h) AS f, count(*) AS n FROM fp
            WHERE event_date <> DATE '2024-01-05' GROUP BY 1),
      a AS (SELECT event_date, bit_xor(h) AS f, count(*) AS n FROM fp
            WHERE event_date = DATE '2024-01-05' OR event_id % 97 <> 0
            GROUP BY 1),
      j AS (SELECT coalesce(b.event_date, a.event_date) AS event_date,
               CASE WHEN b.f IS NULL THEN 'added'
                    WHEN a.f IS NULL THEN 'removed'
                    WHEN b.f <> a.f THEN 'changed' END AS status,
               b.n AS rows_before, a.n AS rows_after
            FROM b FULL OUTER JOIN a ON b.event_date = a.event_date)
      SELECT event_date, status, rows_before, rows_after
      FROM j WHERE status IS NOT NULL ORDER BY event_date""",


    // constraint suggestion: one profile pass, one row per satisfied
    // (column, constraint); typed evidence columns, no number formatting
    // seeded randomized response: honest-vs-forced coin per user from
    // two minstd channels; estimate = (rate - 0.125) / 0.75
    "q_randomized_response" -> s"""
      WITH u AS (SELECT user_id AS uid,
              max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS truth
            FROM events GROUP BY user_id),
      r AS (SELECT uid, truth,
              CASE WHEN ${uk("uid", 101)} <= 0.75 THEN truth
                   ELSE CASE WHEN ${uk("uid", 102)} > 0.5 THEN 1
                        ELSE 0 END END AS reported
            FROM u),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(reported) AS BIGINT) AS n_reported_yes,
                   CAST(sum(truth) AS BIGINT) AS n_true_yes
            FROM r)
      SELECT n, n_reported_yes, n_true_yes,
             round(n_reported_yes / CAST(n AS DOUBLE), 6)
               AS reported_rate,
             round((n_reported_yes / CAST(n AS DOUBLE) - 0.125) / 0.75, 6)
               AS estimated_rate,
             round(n_true_yes / CAST(n AS DOUBLE), 6) AS true_rate,
             CAST(0.75 AS DOUBLE) AS p_truth
      FROM f""",


    // Spearman via exact integer 2x-midranks (2*#smaller + count + 1):
    // five exact long statistics, one closed-form double combine
    "q_spearman" -> """
      WITH base AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
              CAST(l_extendedprice AS DOUBLE) AS y
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      px AS (SELECT x, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY x),
      rx AS (SELECT x, CAST(2 * coalesce(sum(n) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + n + 1 AS BIGINT) AS rx2 FROM px),
      py AS (SELECT y, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY y),
      ry AS (SELECT y, CAST(2 * coalesce(sum(n) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + n + 1 AS BIGINT) AS ry2 FROM py),
      r AS (SELECT b.x, b.y, rx.rx2, ry.ry2 FROM base b
            JOIN rx ON b.x = rx.x JOIN ry ON b.y = ry.y),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(rx2) AS BIGINT) AS sx,
                CAST(sum(ry2) AS BIGINT) AS sy,
                CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
                CAST(sum(ry2 * ry2) AS BIGINT) AS syy,
                CAST(sum(rx2 * ry2) AS BIGINT) AS sxy,
                corr(x, y) AS pr
              FROM r)
      SELECT n,
             round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
               AS spearman_rho,
             round(pr, 6) AS pearson
      FROM agg""",


    // MRR@10 / success@10: first relevant position in the (value desc,
    // id asc) top-10 per user; 1/rank is a single exact division
    "q_mrr" -> """
      WITH ranked AS (SELECT user_id,
              CASE WHEN event_type = 'purchase' AND value > 90.0
                   THEN 1 ELSE 0 END AS rel,
              row_number() OVER (PARTITION BY user_id
                ORDER BY value DESC, event_id ASC) AS pos
            FROM events),
      g AS (SELECT user_id,
              min(CASE WHEN rel = 1 THEN pos END) AS first_rank,
              max(rel) AS any_rel
            FROM ranked WHERE pos <= 10 GROUP BY user_id)
      SELECT user_id, CAST(first_rank AS INTEGER) AS first_rank,
             round(coalesce(1.0 / first_rank, 0.0), 6)
               AS reciprocal_rank,
             any_rel = 1 AS success
      FROM g ORDER BY user_id""",


    // P@k / R@k / AP / MAP: every AP term scaled by lcm(1..10)=2520 into
    // exact longs (no in-group lattice), per-group APs fold to MAP on
    // the 1e-6 lattice
    "q_precision_recall" -> """
      WITH base AS (SELECT user_id AS g, event_id AS id, value AS s,
              CASE WHEN event_type = 'purchase' AND value > 90.0
                   THEN 1 ELSE 0 END AS rel
            FROM events),
      r AS (SELECT g, rel,
              row_number() OVER (PARTITION BY g
                ORDER BY s DESC, id ASC) AS pos,
              CAST(sum(rel) OVER (PARTITION BY g) AS BIGINT) AS rel_total
            FROM base),
      c AS (SELECT g, rel, pos, rel_total,
              CAST(sum(rel) OVER (PARTITION BY g ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
            FROM r WHERE pos <= 10),
      p AS (SELECT g, CAST(max(rel_total) AS BIGINT) AS n_rel_total,
              CAST(sum(rel) AS BIGINT) AS n_rel_at_k,
              CAST(sum(rel * cum * (2520 // pos)) AS BIGINT) AS apnum
            FROM c GROUP BY g),
      q AS (SELECT g, n_rel_total, n_rel_at_k,
              round(CAST(n_rel_at_k AS DOUBLE) / 10.0, 6)
                AS precision_at_k,
              CASE WHEN n_rel_total > 0 THEN
                round(CAST(n_rel_at_k AS DOUBLE)
                  / CAST(n_rel_total AS DOUBLE), 6) END AS recall_at_k,
              CASE WHEN n_rel_total > 0 THEN
                CAST(apnum AS DOUBLE)
                  / CAST(2520 * least(n_rel_total, 10) AS DOUBLE)
                ELSE 0.0 END AS ap_raw
            FROM p)
      SELECT g AS user_id, n_rel_total, n_rel_at_k, precision_at_k,
             recall_at_k, round(ap_raw, 6) AS avg_precision,
             round(CAST(sum(CAST(round(ap_raw * 1e6, 0) AS BIGINT))
                 OVER () AS BIGINT)
               / CAST(count(*) OVER () AS DOUBLE) / 1e6, 6) AS map
      FROM q ORDER BY user_id""",


    // ε-DP histogram: two-sided geometric noise seeded per category via
    // the md5-prefix key through the shared minstd stream — integer end
    // to end except the two ln calls, floor(ln u / −ε) both engines
    "q_dp_histogram" -> {
      val dpKey = "CAST(concat('0x', substr(md5(category), 1, 8)) AS BIGINT)"
      s"""
      WITH h AS (SELECT event_type AS category,
                        CAST(count(*) AS BIGINT) AS n
                 FROM events WHERE event_type IS NOT NULL GROUP BY 1),
      g AS (SELECT category, n,
              CAST(floor(ln(${uk(dpKey, 97)}) / (-0.5)) AS BIGINT)
              - CAST(floor(ln(${uk(dpKey, 98)}) / (-0.5)) AS BIGINT)
                AS noise
            FROM h)
      SELECT category, n, noise, n + noise AS noisy_n, 0.5 AS epsilon
      FROM g ORDER BY category"""
    },


    // ε=1 DP mean: clipped centi sum + two-sided geometric noise on
    // sum (ε/2 at sensitivity 50000 centi) and count (ε/2); the ε
    // subdivisions are the same runtime double ops on both engines
    "q_dp_mean" -> s"""
      WITH f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(coalesce(sum(CAST(round(least(greatest(value, 0.0),
                500.0) * 100, 0) AS BIGINT)), 0) AS BIGINT) AS s
            FROM events WHERE value IS NOT NULL),
      g AS (SELECT *,
              CAST(floor(ln(${uk("CAST(777 AS BIGINT)", 201)}) / (-(0.5 / 50000.0)))
                AS BIGINT)
              - CAST(floor(ln(${uk("CAST(777 AS BIGINT)", 202)}) / (-(0.5 / 50000.0)))
                AS BIGINT) AS snoise,
              CAST(floor(ln(${uk("CAST(777 AS BIGINT)", 203)}) / (-0.5)) AS BIGINT)
              - CAST(floor(ln(${uk("CAST(777 AS BIGINT)", 204)}) / (-0.5)) AS BIGINT)
                AS cnoise
            FROM f),
      t AS (SELECT *, n + cnoise AS noisy_n,
              CASE WHEN n > 0 THEN CAST(s AS DOUBLE)
                / (100.0 * CAST(n AS DOUBLE)) END AS em,
              CASE WHEN n + cnoise > 0 THEN CAST(s + snoise AS DOUBLE)
                / (100.0 * CAST(n + cnoise AS DOUBLE)) END AS dm
            FROM g)
      SELECT n, round(em, 6) AS exact_mean, noisy_n,
             round(dm, 6) AS dp_mean,
             round(CASE WHEN em IS NOT NULL AND dm IS NOT NULL
               THEN abs(dm - em) END, 6) AS abs_err,
             1.0 AS epsilon
      FROM t""",

    // compaction planning: per-day manifest, contiguous 4 KiB bin fill
    // by file id (floor(startOffset/target)), per-bin totals — integer
    // end to end; the prefix sum replays as one plain window
    "q_compaction_plan" -> """
      WITH m AS (SELECT CAST(ts AS DATE) AS "partition",
              user_id % 16 AS file_id,
              CAST(sum(len(props) + 64) AS BIGINT) AS bytes
            FROM events GROUP BY 1, 2),
      c AS (SELECT *, CAST(sum(bytes) OVER (PARTITION BY "partition"
              ORDER BY file_id ROWS BETWEEN UNBOUNDED PRECEDING AND
              CURRENT ROW) AS BIGINT) AS cum_bytes FROM m),
      b AS (SELECT *, CAST(floor((cum_bytes - bytes)
              / CAST(4096 AS DOUBLE)) AS BIGINT) AS bin FROM c)
      SELECT "partition", file_id, bytes, cum_bytes, bin,
             CAST(sum(bytes) OVER (PARTITION BY "partition", bin)
               AS BIGINT) AS bin_bytes,
             CAST(count(*) OVER (PARTITION BY "partition", bin)
               AS BIGINT) AS bin_files,
             (CAST(sum(bytes) OVER (PARTITION BY "partition", bin)
               AS BIGINT) < 4096) AS undersized
      FROM b ORDER BY "partition", file_id""",


    // g3 functional-dependency error per declared pair: per-key max-count
    // fold (linear; identical to the quadratic violating-pair definition)
    "q_fd_audit" -> {
      def pair(a: String, b: String) = s"""
      SELECT '$a' AS determinant, '$b' AS dependent,
             CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(coalesce(sum(n) - sum(m), 0) AS BIGINT) AS violations,
             CASE WHEN coalesce(sum(n), 0) > 0 THEN
               round(coalesce(sum(n) - sum(m), 0)
                 / CAST(sum(n) AS DOUBLE), 6) END AS error_g3,
             coalesce(sum(n) - sum(m), 0) = 0 AS holds
      FROM (SELECT d, sum(c) AS n, max(c) AS m
            FROM (SELECT $a AS d, $b AS v, count(*) AS c FROM orders
                  WHERE $a IS NOT NULL GROUP BY 1, 2)
            GROUP BY d)"""
      Seq(("o_orderkey", "o_custkey"), ("o_custkey", "o_orderstatus"),
        ("o_orderstatus", "o_orderpriority"),
        ("o_totalprice", "o_orderkey"))
        .map { case (a, b) => pair(a, b) }
        .mkString("", " UNION ALL ", " ORDER BY determinant, dependent")
    },


    "q_lineitem_pricing" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 6) AS avg_qty,
             round(avg(l_extendedprice), 6) AS avg_price,
             round(avg(l_discount), 6) AS avg_disc,
             count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",


    "q_winsorize" -> """
      WITH b AS (SELECT quantile_cont(CAST(value AS DOUBLE), 0.05) AS lo,
                        quantile_cont(CAST(value AS DOUBLE), 0.95) AS hi
                 FROM events)
      SELECT event_id, round(value, 6) AS value,
             round(least(greatest(value, b.lo), b.hi), 6) AS value_w
      FROM events CROSS JOIN b ORDER BY event_id""",


    // bounded-lag EWMA: the truncated weighted mean replayed as a
    // rank-bounded self-join (b.rn within the trailing 8-row frame)
    "q_ewma_features" -> """
      WITH t AS (SELECT event_id, user_id, value,
                        row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS rn
                 FROM events)
      SELECT a.event_id, a.user_id, round(a.value, 6) AS value,
             round(sum(b.value * pow(0.7, a.rn - b.rn))
               / sum(pow(0.7, a.rn - b.rn)), 6) AS ewma
      FROM t a JOIN t b ON a.user_id = b.user_id
                       AND b.rn BETWEEN a.rn - 7 AND a.rn
      GROUP BY a.event_id, a.user_id, a.value
      ORDER BY a.event_id""",


    // ROLLUP/CUBE: subtotal keys coalesced to the '(all)' sentinel and the
    // GROUPING bitmask kept alongside, dodging NULL-ordering conventions
    "q_rollup_pricing" -> """
      SELECT coalesce(CAST(l_returnflag AS VARCHAR), '(all)') AS l_returnflag,
             coalesce(CAST(l_linestatus AS VARCHAR), '(all)') AS l_linestatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag, l_linestatus""",


    "q_cube_events" -> """
      SELECT coalesce(CAST(event_type AS VARCHAR), '(all)') AS event_type,
             coalesce(CAST(month(ts) AS VARCHAR), '(all)') AS month,
             CAST(GROUPING(event_type, month(ts)) AS BIGINT) AS gid,
             count(*) AS n_events,
             round(avg(value), 6) AS avg_value
      FROM events GROUP BY CUBE(event_type, month(ts))
      ORDER BY gid, event_type, month""",


    // explicit grouping sets: the declared lattice slices only, same
    // sentinel/grouping_id conventions as cube/rollup
    "q_grouping_sets" -> """
      SELECT coalesce(CAST(event_type AS VARCHAR), '(all)') AS event_type,
             coalesce(CAST(month(ts) AS VARCHAR), '(all)') AS month,
             CAST(GROUPING(event_type, month(ts)) AS BIGINT) AS gid,
             count(*) AS n_events,
             round(avg(value), 6) AS avg_value
      FROM events GROUP BY GROUPING SETS ((event_type, month(ts)),
        (event_type), (month(ts)))
      ORDER BY gid, event_type, month""",


    "q_pivot_events" -> """
      SELECT CAST(ts AS DATE) AS day,
             count(*) FILTER (WHERE event_type = 'view') AS "view",
             count(*) FILTER (WHERE event_type = 'click') AS click,
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS signup,
             count(*) FILTER (WHERE event_type = 'error') AS error
      FROM events GROUP BY 1 ORDER BY 1""",


    "q_selective_revenue" -> """
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
             count(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.03 AND 0.07
        AND l_quantity < 24""",


    "q_regional_revenue" -> """
      SELECT r.r_name, n.n_name,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name ORDER BY r_name, n_name""",


    // hashing trick: first 8 md5 hex chars as an int, mod buckets —
    // engine-parity (md5 bytewise identical, 32-bit prefix sign-safe)
    "q_feature_hashing" -> """
      SELECT event_id, event_type,
             CAST(CAST(concat('0x', substr(md5(event_type), 1, 8)) AS BIGINT)
               % 64 AS INTEGER) AS event_type_bucket
      FROM events ORDER BY event_id""",


    "q_onehot_events" -> """
      SELECT event_id, event_type,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase,
             CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_signup
      FROM events ORDER BY event_id""",


    "q_mad_outliers" -> """
      WITH med AS (
        SELECT event_type, quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
        FROM events GROUP BY event_type),
      mad AS (
        SELECT e.event_type,
               quantile_cont(abs(CAST(e.value AS DOUBLE) - m.med), 0.5) AS mad
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type)
      SELECT e.event_type, round(m.med, 6) AS median, round(d.mad, 6) AS mad,
             CAST(sum(CASE WHEN abs(CAST(e.value AS DOUBLE) - m.med)
                                > d.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
             count(*) AS n_rows
      FROM events e
      JOIN med m ON e.event_type = m.event_type
      JOIN mad d ON e.event_type = d.event_type
      GROUP BY e.event_type, m.med, d.mad
      ORDER BY e.event_type""",


    // activity profile: hourly histogram → entropy fold; peak-hour tie
    // broken toward the smaller hour via the (c, 23-hr) struct max
    "q_activity_profile" -> """
      WITH h AS (
        SELECT user_id, hour(ts) AS hr, count(*) AS c
        FROM events GROUP BY 1, 2),
      hp AS (
        SELECT *, CAST(c AS DOUBLE)
                    / sum(c) OVER (PARTITION BY user_id) AS p
        FROM h),
      pk AS (
        SELECT user_id, hr,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY c DESC, hr ASC) AS rn
        FROM h),
      agg AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
               count(*) AS n_active_hours,
               round(-sum(p * ln(p)), 6) AS hour_entropy
        FROM hp GROUP BY user_id)
      SELECT agg.user_id, n_events, n_active_hours, hour_entropy,
             CAST(pk.hr AS INTEGER) AS peak_hour
      FROM agg JOIN pk ON agg.user_id = pk.user_id AND pk.rn = 1
      ORDER BY agg.user_id""",


    // join forecast: histogram join replayed; HUGEINT folds cast back
    "q_join_cardinality" -> """
      WITH lc AS (SELECT l_orderkey AS k, count(*) AS cl FROM lineitem
                  GROUP BY 1),
      rc AS (SELECT o_orderkey AS k, count(*) AS cr FROM orders GROUP BY 1),
      sides AS (
        SELECT (SELECT CAST(sum(cl) AS BIGINT) FROM lc) AS n_left,
               (SELECT CAST(sum(cr) AS BIGINT) FROM rc) AS n_right,
               (SELECT count(*) FROM lc) AS n_left_keys,
               (SELECT count(*) FROM rc) AS n_right_keys),
      joint AS (
        SELECT CAST(coalesce(sum(cl * cr), 0) AS BIGINT) AS predicted_rows,
               count(*) AS n_common_keys,
               CAST(coalesce(max(cl * cr), 0) AS BIGINT) AS hottest_key_rows
        FROM lc JOIN rc USING (k))
      SELECT n_left, n_right, n_left_keys, n_right_keys, n_common_keys,
             predicted_rows, hottest_key_rows,
             round(CAST(hottest_key_rows AS DOUBLE)
                   / nullif(CAST(predicted_rows AS DOUBLE), 0), 6)
               AS hottest_share
      FROM joint, sides""",


    // purge audit: the erasure proof replayed as a marked left join
    "q_purge_audit" -> """
      WITH reqs AS (
        SELECT DISTINCT c_custkey AS uid FROM customer
        WHERE c_custkey % 100 = 0
        UNION SELECT 1000000 AS uid),
      marked AS (
        SELECT e.user_id, r.uid FROM events e
        LEFT JOIN reqs r ON e.user_id = r.uid)
      SELECT count(*) AS rows_before,
             count(uid) AS rows_purged,
             count(*) - count(uid) AS rows_after,
             (SELECT count(*) FROM reqs) AS keys_requested,
             count(DISTINCT CASE WHEN uid IS NOT NULL THEN user_id END)
               AS keys_hit
      FROM marked""",


    // embedding outliers: per-label centroid from the positional explode,
    // cosine distance rounded at 6 before the per-label top-k election
    "x_embedding_outliers" -> """
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      comp AS (SELECT label, generate_subscripts(v, 1) AS pos,
                      unnest(v) AS val FROM e),
      cent AS (SELECT label, pos, avg(val) AS c FROM comp GROUP BY 1, 2),
      carr AS (SELECT label, list(c ORDER BY pos) AS centroid FROM cent
               GROUP BY label),
      scored AS (
        SELECT e.vec_id, e.label,
               round(1.0 - list_inner_product(e.v, carr.centroid)
                 / (sqrt(list_inner_product(e.v, e.v))
                    * sqrt(list_inner_product(carr.centroid, carr.centroid))),
                 6) AS cos_dist
        FROM e JOIN carr ON e.label = carr.label),
      ranked AS (
        SELECT vec_id, label, cos_dist,
               row_number() OVER (PARTITION BY label
                 ORDER BY cos_dist DESC, vec_id) AS rn
        FROM scored)
      SELECT vec_id, label, cos_dist FROM ranked WHERE rn <= 10
      ORDER BY label, vec_id""",


    // skew report: counts-of-counts fold; quantile_cont interpolates like
    // Spark percentile; HUGEINT sums cast back to BIGINT
    "q_skew_report" -> """
      WITH c AS (SELECT user_id, count(*) AS cnt FROM events
                 GROUP BY user_id)
      SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             count(*) AS n_keys,
             max(cnt) AS max_key_rows,
             round(quantile_cont(CAST(cnt AS DOUBLE), 0.5), 6)
               AS p50_key_rows,
             round(quantile_cont(CAST(cnt AS DOUBLE), 0.9), 6)
               AS p90_key_rows,
             round(quantile_cont(CAST(cnt AS DOUBLE), 0.99), 6)
               AS p99_key_rows,
             round(max(cnt) / quantile_cont(CAST(cnt AS DOUBLE), 0.5), 6)
               AS skew_ratio,
             round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top1_share
      FROM c""",


    // salted exact-distinct: the rewrite is a pure plan transformation,
    // so the oracle is the UN-salted aggregate it must equal
    "q_salted_distinct" -> """
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_cnt,
             CAST(count(*) AS BIGINT) AS row_cnt
      FROM events GROUP BY event_type ORDER BY event_type""",


    // salted hot-key join: oracle is the plain inner join + fold the
    // salted plan must reproduce row-for-row
    "q_salted_join" -> """
      SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
             round(sum(e.value), 6) AS total_value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",


    // rank analytics: tie-free (value, id) order makes rank/percent_rank/
    // ntile identical in both engines
    "q_rank_features" -> """
      SELECT event_id, event_type, value,
             CAST(rank() OVER w AS INTEGER) AS rnk,
             round(percent_rank() OVER w, 6) AS pct_rank,
             CAST(ntile(4) OVER w AS INTEGER) AS bucket
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
      ORDER BY event_id""",


    // mutual information: joint counts → window marginals → Σ p·ln(p/pq),
    // the same bounded-table fold both engines run; round(6) absorbs
    // last-ulp summation-order drift
    // all-pairs MI/NMI: same per-pair record explosion, joint counts and
    // pair-partitioned folds as Stats.mutualInfoMatrix
    "q_mi_matrix" -> """
      WITH base AS (
        SELECT event_type AS c1, CAST(isodow(ts) - 1 AS VARCHAR) AS c2,
               CASE WHEN value/1000.0 < 0.1 THEN 'negligible'
                    WHEN value/1000.0 < 0.2 THEN 'small'
                    WHEN value/1000.0 < 0.3 THEN 'moderate'
                    WHEN value/1000.0 < 0.5 THEN 'large'
                    ELSE 'very large' END AS c3
        FROM events),
      recs AS (
        SELECT 'event_type' AS col_a, 'dow' AS col_b, c1 AS x, c2 AS y
        FROM base WHERE c1 IS NOT NULL AND c2 IS NOT NULL
        UNION ALL
        SELECT 'event_type', 'vbin', c1, c3
        FROM base WHERE c1 IS NOT NULL AND c3 IS NOT NULL
        UNION ALL
        SELECT 'dow', 'vbin', c2, c3
        FROM base WHERE c2 IS NOT NULL AND c3 IS NOT NULL),
      joint AS (SELECT col_a, col_b, x, y, CAST(count(*) AS DOUBLE) AS nxy
                FROM recs GROUP BY 1, 2, 3, 4),
      t AS (SELECT col_a, col_b,
              nxy / sum(nxy) OVER (PARTITION BY col_a, col_b) AS pxy,
              sum(nxy) OVER (PARTITION BY col_a, col_b, x)
                / sum(nxy) OVER (PARTITION BY col_a, col_b) AS px,
              sum(nxy) OVER (PARTITION BY col_a, col_b, y)
                / sum(nxy) OVER (PARTITION BY col_a, col_b) AS py
            FROM joint)
      SELECT col_a, col_b,
             round(sum(pxy * ln(pxy / (px * py))), 6) AS mi_nats,
             round(sum(pxy * ln(pxy / (px * py)))
               / least(-sum(pxy * ln(px)), -sum(pxy * ln(py))), 6) AS nmi
      FROM t GROUP BY 1, 2 ORDER BY col_a, col_b""",


    "q_mutual_info" -> """
      WITH joint AS (
        SELECT event_type AS x,
               CASE WHEN value/1000.0 < 0.1 THEN 'negligible'
                    WHEN value/1000.0 < 0.2 THEN 'small'
                    WHEN value/1000.0 < 0.3 THEN 'moderate'
                    WHEN value/1000.0 < 0.5 THEN 'large'
                    ELSE 'very large' END AS y,
               CAST(count(*) AS DOUBLE) AS nxy
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      t AS (
        SELECT nxy / sum(nxy) OVER () AS pxy,
               sum(nxy) OVER (PARTITION BY x) / sum(nxy) OVER () AS px,
               sum(nxy) OVER (PARTITION BY y) / sum(nxy) OVER () AS py
        FROM joint)
      SELECT round(sum(pxy * ln(pxy / (px * py))), 6) AS mi_nats,
             round(sum(pxy * ln(pxy / (px * py))) /
                   least(-sum(pxy * ln(px)), -sum(pxy * ln(py))), 6) AS nmi
      FROM t""",


    // calibration bins: equal-width bin key with the bin-9 clamp at
    // score = 1.0; ECE = support-weighted |gap| via window totals
    "q_calibration" -> """
      WITH s AS (
        SELECT least(value/500.0, 1.0) AS score,
               (event_type = 'purchase') AS pos
        FROM events),
      b AS (
        SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
               count(*) AS n, avg(score) AS confidence,
               avg(CAST(pos AS INT)) AS accuracy
        FROM s GROUP BY 1)
      SELECT bin, n, round(confidence, 6) AS confidence,
             round(accuracy, 6) AS accuracy,
             round(abs(accuracy - confidence), 6) AS gap,
             round(sum(abs(accuracy - confidence) * n) OVER ()
                   / sum(n) OVER (), 6) AS ece
      FROM b ORDER BY bin""",


    // Hosmer-Lemeshow: 1e-6 lattice expected sums, per-bin chi2 terms
    // on the 1e-9 lattice before the fold, df=8 critical literal
    "q_hosmer_lemeshow" -> """
      WITH s AS (
        SELECT least(value/500.0, 1.0) AS score,
               (event_type = 'purchase') AS pos
        FROM events),
      b AS (
        SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS k,
               CAST(sum(CAST(round(score * 1e6, 0) AS BIGINT)) AS BIGINT)
                 AS e6
        FROM s GROUP BY 1),
      t AS (
        SELECT *, CAST(e6 AS DOUBLE) / 1e6 AS e,
               (CAST(e6 AS DOUBLE) / 1e6)
                 * (1.0 - CAST(e6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE))
                 AS den
        FROM b),
      t9 AS (
        SELECT *, CASE WHEN den > 0 THEN
          CAST(round((CAST(k AS DOUBLE) - e) * (CAST(k AS DOUBLE) - e)
            / den * 1e9, 0) AS BIGINT) END AS t9
        FROM t),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
              CAST(sum(n) AS BIGINT) AS n_rows,
              CAST(count(t9) AS BIGINT) AS nused,
              CAST(coalesce(sum(t9), 0) AS BIGINT) AS hl9
            FROM t9)
      SELECT n_bins, n_rows, CAST(nused - 2 AS BIGINT) AS df,
        round(CASE WHEN nused >= 3
          THEN CAST(hl9 AS DOUBLE) / 1e9 END, 6) AS hl_stat,
        CASE WHEN nused = 10 THEN
          CAST(hl9 AS DOUBLE) / 1e9 > 15.507313055865453 END
          AS miscalibrated
      FROM f""",


    // Isotonic calibration: exact per-bin (n, k), pooled rates as one
    // division of exact prefix-sum differences, min-max PAVA election
    "q_isotonic_calibration" -> """
      WITH s AS (
        SELECT least(value/500.0, 1.0) AS score,
               (event_type = 'purchase') AS pos
        FROM events),
      b AS (
        SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM s GROUP BY 1),
      pre AS (
        SELECT bin, n, k,
               CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
               CAST(sum(k) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS BIGINT) AS ck
        FROM b),
      pairs AS (
        SELECT i.bin AS bi, j.bin AS t,
               CAST(j.ck - (i.ck - i.k) AS DOUBLE) /
               CAST(j.cn - (i.cn - i.n) AS DOUBLE) AS a
        FROM pre i JOIN pre j ON i.bin <= j.bin),
      mv AS (
        SELECT bi, t, min(a) OVER (PARTITION BY bi ORDER BY t
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS m
        FROM pairs),
      iso AS (SELECT t, max(m) AS iso FROM mv GROUP BY 1)
      SELECT b.bin, b.n, b.k AS n_pos,
             round(CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE), 6)
               AS raw_rate,
             round(iso.iso, 6) AS iso_rate
      FROM b JOIN iso ON b.bin = iso.t ORDER BY b.bin""",


    // Quadratic trend: exact HUGEINT sums up to Sum x^4, the granger
    // centered-moment Cramer solve on (x, x^2), nested-F of curvature
    "q_quadratic_trend" -> {
      val nD = "CAST(n_days AS DOUBLE)"
      def dd(c: String) = s"CAST($c AS DOUBLE)"
      val cyy = s"(${dd("syy")} - ${dd("sy")} * ${dd("sy")} / $nD)"
      val cy1 = s"(${dd("sy1")} - ${dd("sy")} * ${dd("s1")} / $nD)"
      val cy2 = s"(${dd("sy2")} - ${dd("sy")} * ${dd("s2")} / $nD)"
      val c11 = s"(${dd("s2")} - ${dd("s1")} * ${dd("s1")} / $nD)"
      val c12 = s"(${dd("s3")} - ${dd("s1")} * ${dd("s2")} / $nD)"
      val c22 = s"(${dd("s4")} - ${dd("s2")} * ${dd("s2")} / $nD)"
      val rssR = s"($cyy - $cy1 * $cy1 / $c11)"
      val det = s"($c11 * $c22 - $c12 * $c12)"
      val b1 = s"(($cy1 * $c22 - $cy2 * $c12) / $det)"
      val b2 = s"(($cy2 * $c11 - $cy1 * $c12) / $det)"
      val rssU = s"($cyy - $b1 * $cy1 - $b2 * $cy2)"
      val ok = s"n_days >= 5 AND $c11 > 0 AND $det > 0"
      val fS = s"(($rssR - $rssU) / ($rssU / ($nD - 3.0)))"
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS y
            FROM orders GROUP BY 1),
      r AS (SELECT y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS x
            FROM daily),
      r2 AS (SELECT y, x, x * x AS x2 FROM r),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
              sum(CAST(x AS HUGEINT)) AS s1,
              sum(CAST(x2 AS HUGEINT)) AS s2,
              sum(CAST(y AS HUGEINT)) AS sy,
              sum(CAST(x AS HUGEINT) * x2) AS s3,
              sum(CAST(x2 AS HUGEINT) * x2) AS s4,
              sum(CAST(y AS HUGEINT) * x) AS sy1,
              sum(CAST(y AS HUGEINT) * x2) AS sy2,
              sum(CAST(y AS HUGEINT) * y) AS syy
            FROM r2)
      SELECT n_days,
             round(CASE WHEN $ok THEN $cy1 / $c11 / 100.0 END, 6)
               AS linear_slope,
             round(CASE WHEN $ok THEN $b1 / 100.0 END, 6)
               AS quad_linear_coef,
             round(CASE WHEN $ok THEN $b2 / 100.0 END, 6)
               AS quad_curvature,
             round(CASE WHEN $ok AND $rssU > 0 THEN $fS END, 6)
               AS f_curvature,
             round(CASE WHEN $ok AND $rssU > 0
               THEN $rssR / $rssU END, 6) AS rss_ratio
      FROM f"""
    },


    // Granger lag-1 screen: exact HUGEINT sufficient sums per direction,
    // centered moments / Cramer solve / F as the Spark side's fixed
    // double trees (scale cancels in F and the RSS ratio)
    "q_granger" -> {
      val nD = "CAST(n_eff AS DOUBLE)"
      def dd(c: String) = s"CAST($c AS DOUBLE)"
      val cyy = s"(${dd("syy")} - ${dd("sy")} * ${dd("sy")} / $nD)"
      val cy1 = s"(${dd("sy1")} - ${dd("sy")} * ${dd("s1")} / $nD)"
      val cy2 = s"(${dd("sy2")} - ${dd("sy")} * ${dd("s2")} / $nD)"
      val c11 = s"(${dd("s11")} - ${dd("s1")} * ${dd("s1")} / $nD)"
      val c12 = s"(${dd("s12")} - ${dd("s1")} * ${dd("s2")} / $nD)"
      val c22 = s"(${dd("s22")} - ${dd("s2")} * ${dd("s2")} / $nD)"
      val rssR = s"($cyy - $cy1 * $cy1 / $c11)"
      val det = s"($c11 * $c22 - $c12 * $c12)"
      val b1 = s"(($cy1 * $c22 - $cy2 * $c12) / $det)"
      val b2 = s"(($cy2 * $c11 - $cy1 * $c12) / $det)"
      val rssU = s"($cyy - $b1 * $cy1 - $b2 * $cy2)"
      val ok = s"n_eff >= 5 AND $c11 > 0 AND $det > 0"
      def sumsSql(resp: String, own: String, oth: String) = s"""
        SELECT CAST(count(*) AS BIGINT) AS n_eff,
          sum(CAST($resp AS HUGEINT)) AS sy,
          sum(CAST($own AS HUGEINT)) AS s1,
          sum(CAST($oth AS HUGEINT)) AS s2,
          sum(CAST($resp AS HUGEINT) * $resp) AS syy,
          sum(CAST($resp AS HUGEINT) * $own) AS sy1,
          sum(CAST($resp AS HUGEINT) * $oth) AS sy2,
          sum(CAST($own AS HUGEINT) * $own) AS s11,
          sum(CAST($own AS HUGEINT) * $oth) AS s12,
          sum(CAST($oth AS HUGEINT) * $oth) AS s22
        FROM l"""
      val proj = s"""n_eff, n_eff - 3 AS df2,
             round(CASE WHEN $ok AND $rssU > 0
               THEN ($rssR - $rssU) / ($rssU / ($nD - 3.0)) END, 6)
               AS f_stat,
             round(CASE WHEN $ok THEN $b1 END, 6) AS lag_own_coef,
             round(CASE WHEN $ok THEN $b2 END, 6) AS lag_other_coef,
             round(CASE WHEN $ok AND $rssU > 0
               THEN $rssR / $rssU END, 6) AS rss_ratio"""
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS y,
               CAST(count(*) AS BIGINT) AS x
            FROM orders GROUP BY 1),
      l0 AS (SELECT y, x, lag(y) OVER (ORDER BY d) AS y1,
               lag(x) OVER (ORDER BY d) AS x1
             FROM daily),
      l AS (SELECT y, x, y1, x1 FROM l0 WHERE y1 IS NOT NULL),
      sa AS (${sumsSql("y", "y1", "x1")}),
      sb AS (${sumsSql("x", "x1", "y1")})
      SELECT 'volume->value' AS direction, $proj FROM sa
      UNION ALL
      SELECT 'value->volume' AS direction, $proj FROM sb
      ORDER BY direction"""
    },


    // Murphy decomposition: row and bin terms on integer lattices, one
    // fixed tree per output; residual reported, never hidden
    "q_brier" -> {
      val nD = "CAST(n AS DOUBLE)"
      val obar = s"CAST(n_pos AS DOUBLE) / $nD"
      val nkD = "CAST(nk AS DOUBLE)"
      val fbar = s"CAST(sk AS DOUBLE) / 1e9 / $nkD"
      val obk = s"CAST(ok AS DOUBLE) / $nkD"
      val brier = s"CAST(bsum AS DOUBLE) / 1e12 / $nD"
      val rel = s"CAST(rel AS DOUBLE) / 1e12 / $nD"
      val res = s"CAST(res AS DOUBLE) / 1e12 / $nD"
      val unc = s"($obar) * (1.0 - ($obar))"
      s"""
      WITH rows0 AS (
        SELECT least(value/500.0, 1.0) AS s,
               CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                 AS BIGINT) AS o
        FROM events),
      rows1 AS (
        SELECT CAST(least(floor(s * 10), 9) AS INT) AS bin, o,
               CAST(round(s * 1e9, 0) AS BIGINT) AS su,
               CAST(round((s - CAST(o AS DOUBLE))
                 * (s - CAST(o AS DOUBLE)) * 1e12, 0) AS BIGINT) AS du
        FROM rows0),
      perbin AS (SELECT bin, CAST(count(*) AS BIGINT) AS nk,
                   CAST(sum(o) AS BIGINT) AS ok,
                   CAST(sum(su) AS BIGINT) AS sk
                 FROM rows1 GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(o) AS BIGINT) AS n_pos,
                CAST(sum(du) AS BIGINT) AS bsum
              FROM rows1),
      folded AS (SELECT
                  CAST(sum(CAST(round($nkD * (($fbar) - ($obk))
                    * (($fbar) - ($obk)) * 1e12, 0) AS BIGINT))
                    AS BIGINT) AS rel,
                  CAST(sum(CAST(round($nkD * (($obk) - ($obar))
                    * (($obk) - ($obar)) * 1e12, 0) AS BIGINT))
                    AS BIGINT) AS res
                 FROM perbin, tot)
      SELECT n, n_pos,
             round($brier, 6) AS brier,
             round($rel, 6) AS reliability,
             round($res, 6) AS resolution,
             round($unc, 6) AS uncertainty,
             round($brier - ($rel - $res + $unc), 6) AS residual,
             round(CASE WHEN $unc > 0
               THEN 1.0 - ($brier) / ($unc) END, 6) AS brier_skill
      FROM tot, folded"""
    },


    // Effect sizes: lattice sufficient statistics, scale cancelling in
    // d/g/delta, z-critical literal shared verbatim with the Spark side
    "q_effect_sizes" -> {
      def nD(s: String) = s"CAST(n$s AS DOUBLE)"
      def m(s: String) = s"(CAST(s$s AS DOUBLE) / ${nD(s)})"
      def ssd(s: String) = s"(CAST(q$s AS DOUBLE)"
        .concat(s" - CAST(s$s AS DOUBLE) * s$s / ${nD(s)})")
      val nT = s"(${nD("a")} + ${nD("b")})"
      val sp = s"sqrt((${ssd("a")} + ${ssd("b")}) / ($nT - 2.0))"
      val sb = s"sqrt(${ssd("b")} / (${nD("b")} - 1.0))"
      val d = s"((${m("a")} - ${m("b")}) / $sp)"
      val ok = s"na >= 2 AND nb >= 2 AND ${ssd("a")} + ${ssd("b")} > 0"
      val corr = s"(1.0 - 3.0 / (4.0 * $nT - 9.0))"
      val se = s"sqrt($nT / (${nD("a")} * ${nD("b")})"
        .concat(s" + $d * $d / (2.0 * $nT))")
      s"""
      WITH base AS (SELECT event_type AS g,
               CAST(round(CAST(value AS DOUBLE) * 1e6, 0) AS BIGINT) AS vu
            FROM events
            WHERE event_type IN ('purchase', 'view')
              AND value IS NOT NULL),
      f AS (SELECT
              CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS na,
              CAST(sum(CASE WHEN g = 'purchase' THEN vu ELSE 0 END)
                AS BIGINT) AS sa,
              sum(CASE WHEN g = 'purchase' THEN CAST(vu AS HUGEINT) * vu
                  ELSE CAST(0 AS HUGEINT) END) AS qa,
              CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS nb,
              CAST(sum(CASE WHEN g = 'view' THEN vu ELSE 0 END)
                AS BIGINT) AS sb,
              sum(CASE WHEN g = 'view' THEN CAST(vu AS HUGEINT) * vu
                  ELSE CAST(0 AS HUGEINT) END) AS qb
            FROM base)
      SELECT na AS n_a, nb AS n_b,
             round(${m("a")} / 1e6, 6) AS mean_a,
             round(${m("b")} / 1e6, 6) AS mean_b,
             round((${m("a")} - ${m("b")}) / 1e6, 6) AS mean_diff,
             round(CASE WHEN $ok THEN $sp / 1e6 END, 6) AS sd_pooled,
             round(CASE WHEN $ok THEN $d END, 6) AS cohens_d,
             round(CASE WHEN $ok THEN $d * $corr END, 6) AS hedges_g,
             round(CASE WHEN nb >= 2 AND ${ssd("b")} > 0
               THEN (${m("a")} - ${m("b")}) / $sb END, 6) AS glass_delta,
             round(CASE WHEN $ok
               THEN $d - 1.959963984540054 * $se END, 6) AS d_lo,
             round(CASE WHEN $ok
               THEN $d + 1.959963984540054 * $se END, 6) AS d_hi
      FROM f"""
    },


    "q_feature_corr" -> """
      SELECT col_a, col_b, round(c, 6) AS corr FROM (
        SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
               corr(l_quantity, l_extendedprice) AS c FROM lineitem
        UNION ALL
        SELECT 'l_quantity', 'l_discount', corr(l_quantity, l_discount)
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', 'l_tax', corr(l_quantity, l_tax) FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount',
               corr(l_extendedprice, l_discount) FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', 'l_tax', corr(l_extendedprice, l_tax)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', 'l_tax', corr(l_discount, l_tax) FROM lineitem)
      ORDER BY col_a, col_b""",


    // top principal component: corr matrix in one pass, then the SAME
    // fixed-iteration power sequence Linalg.pcaPowerTop runs — one
    // MATERIALIZED CTE per step (materialization stops the d^T symbolic
    // blow-up CTE inlining would cause), identical left-to-right IEEE
    // operation order
    "q_pca_power" -> pcaPowerSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), 12),


    // the mergeable-partials twin: per-batch raw-moment sums added, the
    // raw-moment corr formula, then the same unrolled iteration
    "q_pca_incremental" -> pcaPowerIncSql("lineitem",
      Seq("CAST(l_quantity AS DOUBLE)", "CAST(l_discount AS DOUBLE)",
        "CAST(l_tax AS DOUBLE)", "l_extendedprice / 100000.0"),
      Seq("l_quantity", "l_discount", "l_tax", "l_price_scaled"),
      Seq("l_shipdate < TIMESTAMP '1997-01-01'",
        "l_shipdate >= TIMESTAMP '1997-01-01'"), 12),


    "q_target_encoding" -> """
      WITH t AS (SELECT event_type, value FROM events
                 WHERE event_type IS NOT NULL),
      g AS (SELECT avg(value) AS gm FROM t)
      SELECT event_type, count(*) AS n,
             round((sum(value) + 10.0 * (SELECT gm FROM g))
                   / (count(*) + 10.0), 6) AS enc
      FROM t GROUP BY event_type ORDER BY event_type""",


    // leakage-safe OOF encoding: user-hash folds, per-(cat,fold) leave-
    // fold-out smoothed means; target sums ride the centi lattice so the
    // single final division is the only float op on either engine
    "q_target_encoding_oof" -> s"""
      WITH t AS (SELECT event_type AS category,
              CAST(least(floor(${uk("user_id", 83)} * 5), 4) AS INTEGER)
                AS fold,
              CAST(round(value * 100, 0) AS BIGINT) AS tc
            FROM events WHERE event_type IS NOT NULL),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(tc) AS BIGINT) AS s FROM t),
      pcf AS (SELECT category, fold, CAST(count(*) AS BIGINT) AS n_in_fold,
                     CAST(sum(tc) AS BIGINT) AS sc
              FROM t GROUP BY 1, 2),
      wc AS (SELECT *,
              CAST(sum(n_in_fold) OVER (PARTITION BY category) AS BIGINT)
                AS nc,
              CAST(sum(sc) OVER (PARTITION BY category) AS BIGINT) AS scat
            FROM pcf)
      SELECT category, fold, n_in_fold,
             nc - n_in_fold AS n_out_of_fold,
             round((((scat - sc) / 100.0)
                 + 10.0 * ((SELECT s FROM g) / (100.0 * (SELECT n FROM g))))
               / ((nc - n_in_fold) + 10.0), 6) AS enc
      FROM wc ORDER BY category, fold""",


    "q_standard_scale" -> """
      WITH s AS (SELECT avg(l_quantity) AS mq, stddev_pop(l_quantity) AS sq,
                        avg(l_extendedprice) AS mp,
                        stddev_pop(l_extendedprice) AS sp,
                        avg(l_discount) AS md, stddev_pop(l_discount) AS sd
                 FROM lineitem)
      SELECT l_orderkey, l_linenumber,
             round(CASE WHEN (SELECT sq FROM s) > 0.0 THEN
               (l_quantity - (SELECT mq FROM s)) / (SELECT sq FROM s)
               ELSE 0.0 END, 6) AS l_quantity_z,
             round(CASE WHEN (SELECT sp FROM s) > 0.0 THEN
               (l_extendedprice - (SELECT mp FROM s)) / (SELECT sp FROM s)
               ELSE 0.0 END, 6) AS l_extendedprice_z,
             round(CASE WHEN (SELECT sd FROM s) > 0.0 THEN
               (l_discount - (SELECT md FROM s)) / (SELECT sd FROM s)
               ELSE 0.0 END, 6) AS l_discount_z
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",


    "q_js_divergence" -> """
      WITH clean AS (
        SELECT event_type, CAST(value AS DOUBLE) AS value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
          AND event_type IN ('view', 'purchase')),
      cuts AS (
        SELECT quantile_cont(value, 0.1) AS c1, quantile_cont(value, 0.2) AS c2,
               quantile_cont(value, 0.3) AS c3, quantile_cont(value, 0.4) AS c4,
               quantile_cont(value, 0.5) AS c5, quantile_cont(value, 0.6) AS c6,
               quantile_cont(value, 0.7) AS c7, quantile_cont(value, 0.8) AS c8,
               quantile_cont(value, 0.9) AS c9
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
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b
        FROM binned GROUP BY bin),
      pq AS (
        SELECT bin, n_a, n_b,
               CAST(n_a AS DOUBLE) / sum(n_a) OVER () AS p,
               CAST(n_b AS DOUBLE) / sum(n_b) OVER () AS q
        FROM counts),
      contrib AS (
        SELECT *,
               (CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0)) / 2.0
                     ELSE 0.0 END +
                CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0)) / 2.0
                     ELSE 0.0 END) AS contribution
        FROM pq)
      SELECT bin, n_a, n_b, round(p, 6) AS p, round(q, 6) AS q,
             round(contribution, 6) AS contribution,
             round(sum(contribution) OVER (), 6) AS jsd
      FROM contrib ORDER BY bin""",


    "q_quantile_bins" -> """
      WITH cuts AS (
        SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.1) AS c1,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.2) AS c2,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.3) AS c3,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.4) AS c4,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS c5,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.6) AS c6,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.7) AS c7,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.8) AS c8,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS c9
        FROM lineitem)
      SELECT (CASE WHEN l_extendedprice > c1 THEN 1 ELSE 0 END +
              CASE WHEN l_extendedprice > c2 THEN 1 ELSE 0 END +
              CASE WHEN l_extendedprice > c3 THEN 1 ELSE 0 END +
              CASE WHEN l_extendedprice > c4 THEN 1 ELSE 0 END +
              CASE WHEN l_extendedprice > c5 THEN 1 ELSE 0 END +
              CASE WHEN l_extendedprice > c6 THEN 1 ELSE 0 END +
              CASE WHEN l_extendedprice > c7 THEN 1 ELSE 0 END +
              CASE WHEN l_extendedprice > c8 THEN 1 ELSE 0 END +
              CASE WHEN l_extendedprice > c9 THEN 1 ELSE 0 END) AS bin,
             count(*) AS n,
             round(min(l_extendedprice), 2) AS lo,
             round(max(l_extendedprice), 2) AS hi
      FROM lineitem, cuts GROUP BY bin ORDER BY bin""",


    "q_robust_scale" -> """
      WITH s AS (
        SELECT quantile_cont(CAST(value AS DOUBLE), 0.5) AS med,
               quantile_cont(CAST(value AS DOUBLE), 0.75)
                 - quantile_cont(CAST(value AS DOUBLE), 0.25) AS iqr
        FROM events)
      SELECT event_id,
             round(CASE WHEN (SELECT iqr FROM s) > 0.0 THEN
               (value - (SELECT med FROM s)) / (SELECT iqr FROM s)
               ELSE 0.0 END, 6) AS value_rs
      FROM events ORDER BY event_id""",


    "x_user_sequences" -> """
      WITH lastk AS (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type IS NOT NULL)
      SELECT user_id, count(*) AS seq_len,
             string_agg(event_type, ',' ORDER BY ts, event_id) AS sequence
      FROM lastk WHERE rn <= 20
      GROUP BY user_id ORDER BY user_id""",


    // MMR diversity re-rank: unrolled greedy steps in exact tenth-micro
    // integers over the bounded cosine pool
    "x_mmr_rerank" -> mmrSql(poolK = 20, selectK = 5, lamT = 7),


    // hybrid RRF: BM25 and cosine rankings cut at 100, fused by
    // 1/(60+rank) over the outer join, top-20 by (rrf desc, doc_id)
    "x_hybrid_rrf" -> """
      WITH dl AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                   t -> t <> '')) AS dl
        FROM documents),
      stats AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl
                FROM dl),
      toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
             WHERE term IN ('spark', 'join', 'window')
             GROUP BY doc_id, term),
      dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
      scored AS (
        SELECT tf.doc_id,
               ln(1.0 + ((SELECT n_docs FROM stats) - dft.df_t + 0.5)
                        / (dft.df_t + 0.5))
                 * (tf.tf * (1.2 + 1.0))
                 / (tf.tf + 1.2 * (0.25
                     + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS w
        FROM tf JOIN dft USING (term) JOIN dl USING (doc_id)),
      bm AS (SELECT doc_id, round(sum(w), 6) AS bm25
             FROM scored GROUP BY doc_id),
      lex AS (SELECT doc_id,
                CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                  AS BIGINT) AS lex_rank
              FROM bm QUALIFY lex_rank <= 100),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      semscored AS (
        SELECT e.vec_id AS doc_id,
               list_inner_product(q.qv, e.v)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(e.v, e.v))) AS cos
        FROM e CROSS JOIN q WHERE e.vec_id <> 0),
      sem AS (SELECT doc_id,
                CAST(row_number() OVER (ORDER BY cos DESC, doc_id)
                  AS BIGINT) AS sem_rank
              FROM semscored QUALIFY sem_rank <= 100),
      fused AS (
        SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
               lex.lex_rank, sem.sem_rank,
               round(coalesce(1.0 / (60 + lex.lex_rank), 0.0)
                 + coalesce(1.0 / (60 + sem.sem_rank), 0.0), 6) AS rrf
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
      SELECT doc_id, lex_rank, sem_rank, rrf
      FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""",


    "x_bm25_search" -> """
      WITH dl AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                   t -> t <> '')) AS dl
        FROM documents),
      stats AS (SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl
                FROM dl),
      toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
             WHERE term IN ('spark', 'join', 'window')
             GROUP BY doc_id, term),
      dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
      scored AS (
        SELECT tf.doc_id,
               ln(1.0 + ((SELECT n_docs FROM stats) - dft.df_t + 0.5)
                        / (dft.df_t + 0.5))
                 * (tf.tf * (1.2 + 1.0))
                 / (tf.tf + 1.2 * (0.25
                     + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS w
        FROM tf JOIN dft USING (term) JOIN dl USING (doc_id))
      SELECT doc_id, count(*) AS matched_terms, round(sum(w), 6) AS bm25
      FROM scored GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id""",


    "q_promo_revenue" -> """
      SELECT round(100.0 *
               sum(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0.0 END) /
               sum(l.l_extendedprice * (1 - l.l_discount)), 6)
               AS promo_revenue_pct,
             count(*) AS n_items
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""",


    "q_supplier_volume" -> """
      SELECT n.n_name,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name ORDER BY n_name""",


    "q_revenue_by_segment" -> """
      SELECT c.c_mktsegment,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",


    "q_bloom_semi" -> """
      SELECT o_orderstatus, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_price
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'AUTOMOBILE')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",


    "q_bloom_anti" -> """
      SELECT o_orderstatus, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_price
      FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                              WHERE c_mktsegment = 'AUTOMOBILE')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",


    // Mann–Whitney AUC with midrank ties; gini re-rounds from the
    // ROUNDED auc, mirroring the Spark column chain
    "q_auc" -> """
      WITH t AS (SELECT CAST(ts AS DATE) AS day,
                        CAST(event_type = 'purchase' AS INT) AS y,
                        CAST(value AS DOUBLE) AS s FROM events),
      ps AS (SELECT day, s, count(*) AS n, sum(y) AS npos
             FROM t GROUP BY day, s),
      r AS (SELECT day, n, npos,
               coalesce(sum(n) OVER (PARTITION BY day ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + (n + 1) / 2.0 AS rank
            FROM ps),
      g AS (SELECT day, CAST(sum(npos) AS BIGINT) AS n_pos,
               CAST(sum(n) - sum(npos) AS BIGINT) AS n_neg,
               sum(npos * rank) AS rsum FROM r GROUP BY day),
      a AS (SELECT day, n_pos, n_neg,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 round((rsum - n_pos * (n_pos + 1) / 2.0)
                   / CAST(n_pos * n_neg AS DOUBLE), 6) END AS auc
            FROM g)
      SELECT day, n_pos, n_neg, auc, round(2.0 * auc - 1.0, 6) AS gini
      FROM a ORDER BY day""",


    // decile 0 = highest scores; cuts replay the array-percentile bins
    "q_lift_table" -> """
      WITH cuts AS (
        SELECT quantile_cont(CAST(value AS DOUBLE),
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS c
        FROM events),
      b AS (SELECT 9 - (CASE WHEN value > c[1] THEN 1 ELSE 0 END +
                        CASE WHEN value > c[2] THEN 1 ELSE 0 END +
                        CASE WHEN value > c[3] THEN 1 ELSE 0 END +
                        CASE WHEN value > c[4] THEN 1 ELSE 0 END +
                        CASE WHEN value > c[5] THEN 1 ELSE 0 END +
                        CASE WHEN value > c[6] THEN 1 ELSE 0 END +
                        CASE WHEN value > c[7] THEN 1 ELSE 0 END +
                        CASE WHEN value > c[8] THEN 1 ELSE 0 END +
                        CASE WHEN value > c[9] THEN 1 ELSE 0 END) AS decile,
               CAST(event_type = 'purchase' AS INT) AS y, value
            FROM events, cuts),
      d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos,
               round(min(value), 6) AS score_lo,
               round(max(value), 6) AS score_hi
            FROM b GROUP BY decile)
      SELECT decile, n, n_pos, score_lo, score_hi,
             round(n_pos / CAST(n AS DOUBLE), 6) AS pos_rate,
             CASE WHEN sum(n_pos) OVER () > 0 THEN
               round((n_pos / CAST(n AS DOUBLE)) /
                 (sum(n_pos) OVER () / CAST(sum(n) OVER () AS DOUBLE)), 6)
             END AS lift,
             CASE WHEN sum(n_pos) OVER () > 0 THEN
               round(sum(n_pos) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / CAST(sum(n_pos) OVER () AS DOUBLE), 6)
             END AS cum_capture
      FROM d ORDER BY decile""",


    // user-grain conversion + revenue, hash 50/50 split, pooled z +
    // Welch t/df in one conditional fold
    // empirical-Bayes shrinkage: beta prior moment-matched on user-level
    // rates, posterior (x + m*k)/(n + k) with k = m(1-m)/v - 1
    "q_eb_shrinkage" -> """
      WITH per AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' AND value > 95.0
                 THEN 1 ELSE 0 END) AS BIGINT) AS conv
        FROM events GROUP BY user_id),
      mom AS (SELECT avg(conv / CAST(n AS DOUBLE)) AS m,
                     var_samp(conv / CAST(n AS DOUBLE)) AS v
              FROM per)
      SELECT user_id, n, conv,
             round(conv / CAST(n AS DOUBLE), 6) AS raw_rate,
             round(CASE WHEN v > 0 AND m * (1.0 - m) / v - 1.0 > 0
               THEN m * (m * (1.0 - m) / v - 1.0) END, 6) AS alpha,
             round(CASE WHEN v > 0 AND m * (1.0 - m) / v - 1.0 > 0
               THEN (1.0 - m) * (m * (1.0 - m) / v - 1.0) END, 6) AS beta,
             round(CASE WHEN v > 0 AND m * (1.0 - m) / v - 1.0 > 0
               THEN (conv + m * (m * (1.0 - m) / v - 1.0))
                    / (n + (m * (1.0 - m) / v - 1.0))
               ELSE conv / CAST(n AS DOUBLE) END, 6) AS shrunk_rate
      FROM per, mom ORDER BY user_id""",


    // always-valid mSPRT: cumulative two-proportion counts per day, the
    // normal-mixture likelihood ratio, running-min p
    "q_ab_sequential" -> s"""
      WITH tagged AS (
        SELECT CAST(ts AS DATE) AS day,
               ${uk("user_id", 59)} > 0.5 AS t,
               CASE WHEN event_type = 'purchase' AND value > 95.0
                 THEN 1 ELSE 0 END AS conv
        FROM events),
      daily AS (
        SELECT day,
               CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
                 AS dnc,
               CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS dnt,
               CAST(sum(CASE WHEN NOT t THEN conv ELSE 0 END) AS BIGINT)
                 AS dxc,
               CAST(sum(CASE WHEN t THEN conv ELSE 0 END) AS BIGINT)
                 AS dxt
        FROM tagged GROUP BY day),
      cum AS (
        SELECT day,
          CAST(sum(dnc) OVER w AS BIGINT) AS n_c,
          CAST(sum(dnt) OVER w AS BIGINT) AS n_t,
          CAST(sum(dxc) OVER w AS BIGINT) AS x_c,
          CAST(sum(dxt) OVER w AS BIGINT) AS x_t
        FROM daily
        WINDOW w AS (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      stat AS (
        SELECT *,
          (x_c + x_t) / CAST(n_c + n_t AS DOUBLE) AS pp,
          x_t / CAST(n_t AS DOUBLE) - x_c / CAST(n_c AS DOUBLE) AS theta
        FROM cum),
      lam AS (
        SELECT *,
          pp * (1.0 - pp) * (1.0 / n_c + 1.0 / n_t) AS v
        FROM stat),
      praw AS (
        SELECT *,
          CASE WHEN n_c > 0 AND n_t > 0 AND v > 0 THEN
            least(1.0 / (sqrt(v / (v + 0.01))
              * exp(theta * theta * 0.01 / (2.0 * v * (v + 0.01)))), 1.0)
          ELSE 1.0 END AS p_raw
        FROM lam)
      SELECT day, n_c, n_t, x_c, x_t,
             round(CASE WHEN n_c > 0 AND n_t > 0 THEN theta END, 6)
               AS lift,
             round(min(p_raw) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS p_always_valid,
             round(min(p_raw) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               <= 0.05 AS significant
      FROM praw ORDER BY day""",


    "q_ab_test" -> s"""
      WITH u AS (SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND value > 95.0
                        THEN 1 ELSE 0 END) AS conv,
               sum(coalesce(value, 0.0)) AS rev
            FROM events GROUP BY user_id),
      a AS (SELECT conv, rev, ${uk("user_id", 59)} > 0.5 AS t FROM u),
      f AS (SELECT
              CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT) AS n_control,
              CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n_treatment,
              CAST(sum(CASE WHEN NOT t THEN conv END) AS BIGINT)
                AS conversions_control,
              CAST(sum(CASE WHEN t THEN conv END) AS BIGINT)
                AS conversions_treatment,
              avg(CASE WHEN NOT t THEN rev END) AS mc,
              avg(CASE WHEN t THEN rev END) AS mt,
              var_samp(CASE WHEN NOT t THEN rev END) AS vc,
              var_samp(CASE WHEN t THEN rev END) AS vt
            FROM a),
      e AS (SELECT *,
              conversions_control / CAST(n_control AS DOUBLE) AS rc,
              conversions_treatment / CAST(n_treatment AS DOUBLE) AS rt,
              (conversions_control + conversions_treatment)
                / CAST(n_control + n_treatment AS DOUBLE) AS pp,
              vc / n_control + vt / n_treatment AS sw2
            FROM f)
      SELECT n_control, n_treatment, conversions_control,
             conversions_treatment,
             round(rc, 6) AS rate_control, round(rt, 6) AS rate_treatment,
             round(rt - rc, 6) AS abs_lift,
             CASE WHEN sqrt(pp * (1.0 - pp)
                    * (1.0 / n_control + 1.0 / n_treatment)) > 0 THEN
               round((rt - rc) / sqrt(pp * (1.0 - pp)
                 * (1.0 / n_control + 1.0 / n_treatment)), 6) END AS z_stat,
             round(mc, 6) AS rev_mean_control,
             round(mt, 6) AS rev_mean_treatment,
             CASE WHEN sw2 > 0
               THEN round((mt - mc) / sqrt(sw2), 6) END AS welch_t,
             CASE WHEN sw2 > 0 THEN
               round(sw2 * sw2 / (
                 (vc / n_control) * (vc / n_control) / (n_control - 1)
                 + (vt / n_treatment) * (vt / n_treatment)
                   / (n_treatment - 1)), 6) END AS welch_df
      FROM e""",


    // product-limit estimate over whole-hour durations; the zero-factor
    // flag pins survival to exact 0 instead of routing through ln(0)
    // Nelson-Aalen: same survival table, cumulative d/n and d/n^2 sums
    "q_nelson_aalen" -> """
      WITH k AS (SELECT user_id, min(ts) AS t0,
               min(CASE WHEN event_type = 'purchase' AND value > 95.0
                        THEN ts END) AS te,
               max(ts) AS tl
            FROM events GROUP BY user_id),
      d AS (SELECT te IS NOT NULL AS obs,
               CAST(floor((epoch_us(coalesce(te, tl)) - epoch_us(t0))
                 / 3600000000.0) AS BIGINT) AS t_hours
            FROM k),
      p AS (SELECT t_hours,
               CAST(sum(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_events,
               CAST(sum(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_censored
            FROM d GROUP BY t_hours),
      r AS (SELECT *,
               sum(n_events + n_censored) OVER ()
                 - coalesce(sum(n_events + n_censored) OVER (ORDER BY t_hours
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS n_risk
            FROM p),
      h AS (SELECT *,
               sum(n_events / CAST(n_risk AS DOUBLE))
                 OVER (ORDER BY t_hours
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS ch,
               sum(n_events / CAST(n_risk * n_risk AS DOUBLE))
                 OVER (ORDER BY t_hours
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS hv
            FROM r)
      SELECT t_hours, CAST(n_risk AS BIGINT) AS n_risk, n_events,
             n_censored, round(ch, 6) AS cum_hazard,
             round(hv, 6) AS hazard_var
      FROM h WHERE n_events > 0 ORDER BY t_hours""",


    // RFM grid: tercile cuts from 1-row quantile fold, reversed recency,
    // <=27 segment cells; metrics and cuts rounded before comparison
    "q_rfm_segmentation" -> """
      WITH p AS (SELECT user_id, ts, value FROM events
                 WHERE event_type = 'purchase'),
      a AS (SELECT max(CAST(ts AS DATE)) AS anchor FROM p),
      per AS (SELECT user_id,
                CAST(date_diff('day', max(CAST(ts AS DATE)),
                  (SELECT anchor FROM a)) AS BIGINT) AS recency_days,
                CAST(count(*) AS BIGINT) AS frequency,
                round(sum(value), 6) AS monetary
              FROM p GROUP BY user_id),
      c AS (SELECT
              round(quantile_cont(CAST(recency_days AS DOUBLE), 1.0/3), 6)
                AS r1,
              round(quantile_cont(CAST(recency_days AS DOUBLE), 2.0/3), 6)
                AS r2,
              round(quantile_cont(CAST(frequency AS DOUBLE), 1.0/3), 6)
                AS f1,
              round(quantile_cont(CAST(frequency AS DOUBLE), 2.0/3), 6)
                AS f2,
              round(quantile_cont(monetary, 1.0/3), 6) AS m1,
              round(quantile_cont(monetary, 2.0/3), 6) AS m2
            FROM per),
      sc AS (SELECT per.*,
               CASE WHEN recency_days <= c.r1 THEN 3
                    WHEN recency_days <= c.r2 THEN 2 ELSE 1 END AS rs,
               CASE WHEN frequency <= c.f1 THEN 1
                    WHEN frequency <= c.f2 THEN 2 ELSE 3 END AS fs,
               CASE WHEN monetary <= c.m1 THEN 1
                    WHEN monetary <= c.m2 THEN 2 ELSE 3 END AS ms
             FROM per, c)
      SELECT rs * 100 + fs * 10 + ms AS segment,
             CAST(count(*) AS BIGINT) AS n_users,
             round(avg(recency_days), 6) AS avg_recency_days,
             round(avg(frequency), 6) AS avg_frequency,
             round(sum(monetary), 6) AS total_monetary
      FROM sc GROUP BY 1 ORDER BY segment""",


    // Aalen-Johansen: first-event election with A-priority ties, exact
    // risk table, the KM log-sum-exp chain for S(t-) and both CIFs
    "q_competing_risks" -> """
      WITH k AS (SELECT user_id, min(ts) AS t0,
            min(CASE WHEN event_type = 'purchase' THEN ts END) AS ta,
            min(CASE WHEN event_type = 'error' THEN ts END) AS tb,
            max(ts) AS tl
          FROM events GROUP BY user_id),
      e AS (SELECT t0, tl,
            CASE WHEN ta IS NOT NULL AND tb IS NOT NULL
              THEN least(ta, tb) ELSE coalesce(ta, tb) END AS te,
            (ta IS NOT NULL AND (tb IS NULL OR ta <= tb)) AS isa
          FROM k),
      d AS (SELECT te IS NOT NULL AS obs, isa,
            CAST(floor((epoch_us(coalesce(te, tl)) - epoch_us(t0))
              / 3600000000.0) AS BIGINT) AS t_hours
          FROM e),
      p AS (SELECT t_hours,
            CAST(sum(CASE WHEN obs AND isa THEN 1 ELSE 0 END) AS BIGINT)
              AS d_a,
            CAST(sum(CASE WHEN obs AND NOT isa THEN 1 ELSE 0 END)
              AS BIGINT) AS d_b,
            CAST(sum(CASE WHEN obs THEN 0 ELSE 1 END) AS BIGINT)
              AS n_censored
          FROM d GROUP BY t_hours),
      r AS (SELECT *,
            sum(d_a + d_b + n_censored) OVER ()
              - coalesce(sum(d_a + d_b + n_censored) OVER (ORDER BY
                  t_hours ROWS BETWEEN UNBOUNDED PRECEDING AND
                  1 PRECEDING), 0) AS n_risk
          FROM p),
      f AS (SELECT *,
            1.0 - (d_a + d_b) / CAST(n_risk AS DOUBLE) AS fac FROM r),
      s AS (SELECT *,
            max(CASE WHEN fac = 0.0 THEN 1 ELSE 0 END)
              OVER (ORDER BY t_hours ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS hit0,
            coalesce(max(CASE WHEN fac = 0.0 THEN 1 ELSE 0 END)
              OVER (ORDER BY t_hours ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS hit0b,
            sum(CASE WHEN fac > 0 THEN ln(fac) ELSE 0.0 END)
              OVER (ORDER BY t_hours ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS lsum,
            coalesce(sum(CASE WHEN fac > 0 THEN ln(fac) ELSE 0.0 END)
              OVER (ORDER BY t_hours ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0.0) AS lsumb
          FROM f),
      g AS (SELECT *,
            CASE WHEN hit0b = 1 THEN 0.0 ELSE exp(lsumb) END AS sm
          FROM s),
      c AS (SELECT *,
            sum(sm * (d_a / CAST(n_risk AS DOUBLE)))
              OVER (ORDER BY t_hours ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cifa,
            sum(sm * (d_b / CAST(n_risk AS DOUBLE)))
              OVER (ORDER BY t_hours ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cifb
          FROM g)
      SELECT t_hours, CAST(n_risk AS BIGINT) AS n_risk, d_a, d_b,
        n_censored,
        CASE WHEN hit0 = 1 THEN 0.0 ELSE round(exp(lsum), 6) END
          AS survival_allcause,
        round(cifa, 6) AS cif_a, round(cifb, 6) AS cif_b
      FROM c WHERE d_a + d_b > 0 ORDER BY t_hours""",


    "q_kaplan_meier" -> s"""
      $kmChain
      SELECT t_hours, CAST(n_risk AS BIGINT) AS n_risk, n_events,
             n_censored,
             CASE WHEN hit0 = 1 THEN 0.0 ELSE round(exp(lsum), 6) END
               AS survival
      FROM s WHERE n_events > 0 ORDER BY t_hours""",


    // Shapley attribution: exact exposure-mask lattice, factorial
    // weights as shared literals, marginal terms on the 1e-12 lattice
    "q_shapley_attribution" -> {
      val channels = Seq("view", "click", "signup")
      val k = channels.size
      def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
      val w = (0 until k).map(s => fact(s) * fact(k - 1 - s) / fact(k))
      val wCase = "CASE bit_count(a1.m) " + (0 until k).map(s =>
        s"WHEN $s THEN ${java.lang.Double.toString(w(s))}")
        .mkString(" ") + " END"
      val cCols = channels.zipWithIndex.map { case (c, i) =>
        s"CAST(max(CASE WHEN event_type = '$c' THEN 1 ELSE 0 END)"
          .concat(s" AS BIGINT) AS c$i") }.mkString(",\n             ")
      val maskExpr = channels.indices
        .map(i => s"c$i * ${1L << i}").mkString(" + ")
      val chanRows = channels.zipWithIndex.map { case (c, i) =>
        val b = 1L << i
        s"""SELECT '$c' AS channel,
             (SELECT CAST(sum(n) AS BIGINT) FROM allm WHERE (m & $b) <> 0)
               AS n_exposed,
             (SELECT round(v, 6) FROM allm WHERE m = $b) AS v_alone,
             (SELECT CAST(sum(CAST(round((a2.v - a1.v) * ($wCase) * 1e12,
                  0) AS BIGINT)) AS BIGINT)
              FROM allm a1 JOIN allm a2 ON a1.m + $b = a2.m
              WHERE (a1.m & $b) = 0) AS phil"""
      }.mkString("\n        UNION ALL ")
      s"""
      WITH per AS (SELECT user_id,
             $cCols,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS y
            FROM events GROUP BY 1),
      sub AS (SELECT $maskExpr AS m, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(y) AS BIGINT) AS cv
              FROM per GROUP BY 1),
      allm AS MATERIALIZED (SELECT r.m, coalesce(s.n, 0) AS n,
               coalesce(s.cv, 0) AS cv,
               CASE WHEN coalesce(s.n, 0) > 0
                 THEN CAST(coalesce(s.cv, 0) AS DOUBLE)
                   / CAST(coalesce(s.n, 0) AS DOUBLE)
                 ELSE 0.0 END AS v
             FROM (SELECT unnest(range(0, ${1L << k})) AS m) r
             LEFT JOIN sub s ON r.m = s.m),
      rows0 AS ($chanRows),
      tot AS (SELECT CAST(sum(phil) AS BIGINT) AS t FROM rows0)
      SELECT channel, n_exposed, v_alone,
             round(CAST(phil AS DOUBLE) / 1e12, 6) AS shapley,
             round(CASE WHEN t <> 0
               THEN CAST(phil AS DOUBLE) / t END, 6) AS share,
             round(CAST(t AS DOUBLE) / 1e12, 6) AS total_phi
      FROM rows0, tot ORDER BY channel"""
    },


    // Weibull fit: chained from the ROUNDED KM survival, ln/lnln terms
    // on the 1e-9 lattice, HUGEINT product folds, ln(ln 2) literal
    // shared verbatim
    "q_weibull_fit" -> {
      val nD = "CAST(n_steps AS DOUBLE)"
      val sx = "(CAST(sx AS DOUBLE) / 1e9)"
      val sy = "(CAST(sy AS DOUBLE) / 1e9)"
      val sxy = "(CAST(sxy AS DOUBLE) / 1e18)"
      val sxx = "(CAST(sxx AS DOUBLE) / 1e18)"
      val syy = "(CAST(syy AS DOUBLE) / 1e18)"
      val num = s"($nD * $sxy - $sx * $sy)"
      val denX = s"($nD * $sxx - $sx * $sx)"
      val denY = s"($nD * $syy - $sy * $sy)"
      val b = s"($num / $denX)"
      val a = s"(($sy - $b * $sx) / $nD)"
      val ok = s"n_steps >= 3 AND $denX > 0"
      s"""
      $kmChain,
      km AS (SELECT t_hours,
               CASE WHEN hit0 = 1 THEN 0.0 ELSE round(exp(lsum), 6) END
                 AS sv
             FROM s WHERE n_events > 0),
      lt AS (SELECT
               CAST(round(ln(CAST(t_hours AS DOUBLE)) * 1e9, 0)
                 AS BIGINT) AS x,
               CAST(round(ln(0.0 - ln(sv)) * 1e9, 0) AS BIGINT) AS y
             FROM km WHERE sv > 0.0 AND sv < 1.0 AND t_hours > 0),
      wf AS (SELECT CAST(count(*) AS BIGINT) AS n_steps,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              sum(CAST(x AS HUGEINT) * y) AS sxy,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(y AS HUGEINT) * y) AS syy
            FROM lt)
      SELECT n_steps,
             round(CASE WHEN $ok THEN $b END, 6) AS shape,
             round(CASE WHEN $ok AND $b > 0
               THEN exp((0.0 - $a) / $b) END, 6) AS scale,
             round(CASE WHEN $ok AND $b > 0
               THEN exp((-0.36651292058166435 - $a) / $b) END, 6)
               AS median_t,
             round(CASE WHEN $ok AND $denY > 0
               THEN $num * $num / ($denX * $denY) END, 6) AS r2
      FROM wf"""
    },


    // Chapman capture-recapture: exact per-user window flags, one fixed
    // tree per output, z-critical literal shared verbatim
    "q_capture_recapture" -> {
      val n1 = "CAST(n_a AS DOUBLE)"
      val n2 = "CAST(n_b AS DOUBLE)"
      val m = "CAST(n_both AS DOUBLE)"
      val nHat = s"(($n1 + 1.0) * ($n2 + 1.0) / ($m + 1.0) - 1.0)"
      val varN = s"(($n1 + 1.0) * ($n2 + 1.0) * ($n1 - $m) * ($n2 - $m)"
        .concat(s" / (($m + 1.0) * ($m + 1.0) * ($m + 2.0)))")
      val ok = "n_a >= 1 AND n_b >= 1"
      s"""
      WITH per AS (SELECT user_id,
               CAST(max(CASE WHEN ts < TIMESTAMP '2024-01-08'
                 THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(max(CASE WHEN ts >= TIMESTAMP '2024-01-08'
                 AND ts < TIMESTAMP '2024-01-15'
                 THEN 1 ELSE 0 END) AS BIGINT) AS b
            FROM events GROUP BY 1),
      f AS (SELECT CAST(sum(a) AS BIGINT) AS n_a,
              CAST(sum(b) AS BIGINT) AS n_b,
              CAST(sum(a * b) AS BIGINT) AS n_both
            FROM per)
      SELECT n_a, n_b, n_both,
             round(CASE WHEN $ok THEN $nHat END, 6) AS n_hat,
             round(CASE WHEN $ok AND $varN >= 0
               THEN sqrt($varN) END, 6) AS se,
             round(CASE WHEN $ok AND $varN >= 0
               THEN $nHat - 1.959963984540054 * sqrt($varN) END, 6)
               AS n_lo,
             round(CASE WHEN $ok AND $varN >= 0
               THEN $nHat + 1.959963984540054 * sqrt($varN) END, 6)
               AS n_hi
      FROM f"""
    },


    // RMST: the KM chain replayed, each step's survival x whole-hour
    // width exact on the 1e-6 lattice, S=1 head segment, tau fallback
    "q_rmst" -> s"""
      $kmChain,
      km AS (SELECT CAST(t_hours AS BIGINT) AS t,
               CASE WHEN hit0 = 1 THEN 0.0 ELSE round(exp(lsum), 6) END
                 AS sv
             FROM s WHERE n_events > 0),
      st AS (SELECT t, sv,
               coalesce(lead(t, 1) OVER (ORDER BY t), 336) AS nxt
             FROM km WHERE t < 336),
      cb AS (SELECT t,
               CAST(round(sv * CAST(nxt - t AS DOUBLE) * 1e6, 0)
                 AS BIGINT) AS c
             FROM st),
      fd AS (SELECT CAST(count(*) AS BIGINT) AS n_steps,
               CAST(coalesce(min(t), 336) AS BIGINT) AS fst,
               CAST(coalesce(sum(c), 0) AS BIGINT) AS sc
             FROM cb)
      SELECT CAST(336 AS BIGINT) AS horizon_hours, n_steps,
             round(CAST(fst * 1000000 + sc AS DOUBLE) / 1e6, 6)
               AS rmst_hours,
             round(CAST(fst * 1000000 + sc AS DOUBLE) / 1e6 / 336.0, 6)
               AS mean_survival
      FROM fd""",


    // centered 7-row MA trend (NULL edges), epoch-mod-7 weekday slot,
    // slot means re-centered to sum 0 across the 7 slots
    "q_seasonality" -> """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum(o_totalprice) AS x,
               date_diff('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) % 7 AS dow
        FROM orders GROUP BY 1, 3),
      tr AS (SELECT *,
               CASE WHEN count(*) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
                 THEN avg(x) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) END AS trend
            FROM daily),
      sl AS (SELECT dow, avg(x - trend) AS raw FROM tr GROUP BY dow),
      ce AS (SELECT dow, raw - avg(raw) OVER () AS seas FROM sl)
      SELECT tr.day, tr.dow, round(tr.x, 2) AS revenue,
             round(tr.trend, 6) AS trend,
             round(ce.seas, 6) AS seasonal,
             round(tr.x - tr.trend - ce.seas, 6) AS residual
      FROM tr LEFT JOIN ce ON tr.dow = ce.dow
      ORDER BY tr.day""",


    // lognormal MLE: each ln commits to the 1e-9 lattice before the
    // fold; mu/sigma/quantiles are the mirrored fixed trees
    "q_lognormal_fit" -> """
      WITH f AS (SELECT
              CAST(count(CASE WHEN o_totalprice > 0.0 THEN 1 END)
                AS BIGINT) AS n,
              CAST(count(CASE WHEN o_totalprice IS NOT NULL
                AND NOT (o_totalprice > 0.0) THEN 1 END) AS BIGINT)
                AS n_nonpositive,
              CAST(coalesce(sum(CASE WHEN o_totalprice > 0.0 THEN
                CAST(round(ln(CAST(o_totalprice AS DOUBLE))
                  * 1000000000.0, 0) AS BIGINT) END), 0) AS BIGINT)
                AS s,
              coalesce(sum(CASE WHEN o_totalprice > 0.0 THEN
                CAST(round(ln(CAST(o_totalprice AS DOUBLE))
                  * 1000000000.0, 0) AS HUGEINT)
                * CAST(round(ln(CAST(o_totalprice AS DOUBLE))
                  * 1000000000.0, 0) AS BIGINT) END), 0) AS s2,
              quantile_cont(CASE WHEN o_totalprice > 0.0 THEN
                CAST(o_totalprice AS DOUBLE) END, 0.95) AS obs95
            FROM orders),
      t AS (SELECT *,
              CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) AS mu,
              (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) / 1e18
                AS varl
            FROM f)
      SELECT n, n_nonpositive,
             round(CASE WHEN n > 0 THEN mu END, 6) AS mu,
             round(CASE WHEN n >= 2 AND varl > 0 THEN sqrt(varl) END, 6)
               AS sigma,
             round(CASE WHEN n > 0 THEN exp(mu) END, 6)
               AS fitted_median,
             round(CASE WHEN n >= 2 AND varl > 0 THEN
               exp(mu + 1.6448536269514722 * sqrt(varl)) END, 6)
               AS fitted_p95,
             round(CASE WHEN n > 0 THEN obs95 END, 6) AS observed_p95
      FROM t""",

    // DTW between two nations' monthly series: the WHOLE DP is integer
    // (centi costs), replayed cell-by-cell — one recursion step per DP
    // cell, positive-index lookups into the append-only cell list
    // (left = d[t], up = d[t+1-m], diag = d[t-m]); INF = 2^61-ish
    // literal shared with the Spark fold
    "q_dtw_distance" -> """
      WITH RECURSIVE m AS (SELECT n.n_name AS u,
              CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                AS DATE) AS mo,
              CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2),
      mos AS (SELECT DISTINCT mo FROM m),
      a AS (SELECT list(coalesce(x.y, 0) ORDER BY mos.mo) AS av
            FROM mos LEFT JOIN (SELECT mo, y FROM m
              WHERE u = 'NATION_1') x ON mos.mo = x.mo),
      b AS (SELECT list(coalesce(x.y, 0) ORDER BY mos.mo) AS bv
            FROM mos LEFT JOIN (SELECT mo, y FROM m
              WHERE u = 'NATION_2') x ON mos.mo = x.mo),
      nn AS (SELECT CAST(len(av) AS BIGINT) AS n FROM a),
      mn AS (SELECT CAST(len(bv) AS BIGINT) AS mm FROM b),
      dp AS (
        SELECT CAST(1 AS BIGINT) AS t,
               [abs(a.av[1] - b.bv[1])] AS d
        FROM a, b
        UNION ALL
        SELECT t + 1,
               d || [abs(a.av[CAST(t // mn.mm AS INTEGER) + 1]
                       - b.bv[CAST(t % mn.mm AS INTEGER) + 1])
                 + least(
                     CASE WHEN t // mn.mm + 1 > 1
                       THEN d[CAST(t + 1 - mn.mm AS INTEGER)]
                       ELSE 2305843009213693951 END,
                     CASE WHEN t // mn.mm + 1 = 1 AND t % mn.mm + 1 = 1
                         THEN 0
                       WHEN t // mn.mm + 1 > 1 AND t % mn.mm + 1 > 1
                         THEN d[CAST(t - mn.mm AS INTEGER)]
                       ELSE 2305843009213693951 END,
                     CASE WHEN t % mn.mm + 1 > 1
                       THEN d[CAST(t AS INTEGER)]
                       ELSE 2305843009213693951 END)]
        FROM dp, a, b, mn, nn WHERE t < nn.n * mn.mm),
      fin AS (SELECT d[CAST(t AS INTEGER)] AS dtw FROM dp, nn, mn
              WHERE t = nn.n * mn.mm),
      lk AS (SELECT CAST(sum(abs(a.av[k] - b.bv[k])) AS BIGINT) AS lock
             FROM a, b, (SELECT unnest(range(1, CAST((SELECT n FROM nn)
               AS INTEGER) + 1)) AS k))
      SELECT nn.n AS n_months,
             round(CAST(fin.dtw AS DOUBLE) / 100.0, 2) AS dtw_dist,
             round(CAST(lk.lock AS DOUBLE) / 100.0, 2) AS lockstep_dist,
             round(CASE WHEN lk.lock > 0 THEN
               CAST(lk.lock - fin.dtw AS DOUBLE)
               / CAST(lk.lock AS DOUBLE) END, 6) AS warp_gain
      FROM fin, lk, nn""",

    // seasonal anomalies: the q_seasonality residual chain, 3-MAD
    // fence on the rounded residual (the engine-stable 6dp quantity)
    "q_seasonal_anomalies" -> """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum(o_totalprice) AS x,
               date_diff('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) % 7 AS dow
        FROM orders GROUP BY 1, 3),
      tr AS (SELECT *,
               CASE WHEN count(*) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
                 THEN avg(x) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) END AS trend
            FROM daily),
      sl AS (SELECT dow, avg(x - trend) AS raw FROM tr GROUP BY dow),
      ce AS (SELECT dow, raw - avg(raw) OVER () AS seas FROM sl),
      res AS (SELECT tr.day, round(tr.x, 2) AS revenue,
               round(tr.x - tr.trend - ce.seas, 6) AS residual
            FROM tr LEFT JOIN ce ON tr.dow = ce.dow
            WHERE tr.x - tr.trend - ce.seas IS NOT NULL),
      med AS (SELECT quantile_cont(residual, 0.5) AS med FROM res),
      fen AS (SELECT m.med,
               quantile_cont(abs(r.residual - m.med), 0.5) AS mad
            FROM res r, med m GROUP BY m.med)
      SELECT r.day, r.revenue, r.residual,
             round(f.med, 6) AS resid_median,
             round(f.mad, 6) AS resid_mad,
             round(f.mad * 3.0, 6) AS fence
      FROM res r, fen f
      WHERE abs(r.residual - f.med) > f.mad * 3.0
      ORDER BY r.day""",

    // PMI over the unfiltered probability spaces; minCount trims output
    // only. Operation order mirrors the Spark column chain exactly so
    // the IEEE division/multiplication sequence is bit-identical.
    "x_collocations" -> """
      WITH arr AS (SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 t -> t <> '') AS w
            FROM documents),
      uni AS (SELECT term, count(*) AS cnt
              FROM (SELECT unnest(w) AS term FROM arr) GROUP BY term),
      pos AS (SELECT doc_id, generate_subscripts(w, 1) AS idx,
                     unnest(w) AS term FROM arr),
      bg AS (SELECT term AS term_a,
               lead(term) OVER (PARTITION BY doc_id ORDER BY idx) AS term_b
            FROM pos),
      pc AS (SELECT term_a, term_b, count(*) AS pair_count
             FROM bg WHERE term_b IS NOT NULL GROUP BY 1, 2),
      nt AS (SELECT CAST(sum(cnt) AS DOUBLE) AS ntok FROM uni),
      nb AS (SELECT CAST(sum(pair_count) AS DOUBLE) AS nbig FROM pc),
      s AS (SELECT pc.term_a, pc.term_b,
               CAST(pc.pair_count AS BIGINT) AS pair_count,
               CAST(ua.cnt AS BIGINT) AS count_a,
               CAST(ub.cnt AS BIGINT) AS count_b,
               round(ln((pc.pair_count / nbig)
                 / ((ua.cnt / ntok) * (ub.cnt / ntok))), 6) AS pmi
            FROM pc
            JOIN uni ua ON pc.term_a = ua.term
            JOIN uni ub ON pc.term_b = ub.term, nt, nb
            WHERE pc.pair_count >= 5)
      SELECT term_a, term_b, pair_count, count_a, count_b, pmi
      FROM s ORDER BY pmi DESC, term_a, term_b LIMIT 50""",


    "x_vocabulary" -> """
      WITH tok AS (SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
            FROM documents),
      dt AS (SELECT doc_id, token, count(*) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
      v AS (SELECT token, CAST(sum(tf) AS BIGINT) AS term_count,
               CAST(count(*) AS BIGINT) AS doc_freq
            FROM dt GROUP BY token HAVING sum(tf) >= 10)
      SELECT token, term_count, doc_freq,
             CAST(row_number() OVER (ORDER BY term_count DESC, token) - 1
               AS BIGINT) AS idx,
             round(term_count / CAST(sum(term_count) OVER () AS DOUBLE), 6)
               AS share
      FROM v ORDER BY idx""",


    // rules in both directions from the unordered pair table; order by
    // the ROUNDED lift (matching the Spark column) with the pair as a
    // total tiebreak
    "q_basket_rules" -> """
      WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                 FROM lineitem),
      supp AS (SELECT it, count(*) AS s FROM b GROUP BY it),
      pc AS (SELECT l.it AS a, r.it AS b2, count(*) AS ps
             FROM b l JOIN b r ON l.bk = r.bk AND l.it < r.it
             GROUP BY 1, 2 HAVING count(*) >= 2),
      dr AS (SELECT a AS antecedent, b2 AS consequent, ps FROM pc
             UNION ALL SELECT b2, a, ps FROM pc),
      j AS (SELECT d.antecedent, d.consequent,
               CAST(d.ps AS BIGINT) AS pair_support,
               CAST(sa.s AS BIGINT) AS ante_support,
               CAST(sc.s AS BIGINT) AS cons_support,
               round(d.ps / CAST(sa.s AS DOUBLE), 6) AS confidence,
               round((d.ps / CAST(sa.s AS DOUBLE))
                 / (sc.s / (SELECT CAST(count(DISTINCT bk) AS DOUBLE)
                            FROM b)), 6) AS lift
            FROM dr d
            JOIN supp sa ON d.antecedent = sa.it
            JOIN supp sc ON d.consequent = sc.it)
      SELECT antecedent, consequent, pair_support, ante_support,
             cons_support, confidence, lift
      FROM j ORDER BY lift DESC, antecedent, consequent LIMIT 100""",


    // 5 unrolled PageRank supersteps — identical literal arithmetic to
    // the Spark loop ((1-d)/N, d, dm/N all in the same operation order)
    "q_supplier_pagerank" -> {
      // round 13 RE-ORACLE (the q_supplier_hits shape): the recursion
      // runs on the 1e-9 INTEGER lattice — ranks are BIGINTs, every
      // per-edge share / damping product / dangling share is an exact
      // half-up integer division ((2a + b) // (2b)), so DuckDB replays
      // the recursion bit-for-bit and the Spark driver fast path is
      // parity-safe (the old double recursion's fold order was
      // engine-dependent). Every iteration CTE is MATERIALIZED: p_i is
      // referenced TWICE (dangling fold + contribs), so DuckDB's default
      // inlining would expand the edge chain 2^5-fold — measured OOM at
      // sf0.1 with the old form.
      val iters = (1 to 5).map { i =>
        s"""d$i AS MATERIALIZED (SELECT CAST(coalesce(sum(rank), 0)
                 AS BIGINT) AS dm
               FROM p${i - 1} WHERE out_deg = 0),
      c$i AS MATERIALIZED (SELECT e.dst AS node,
              CAST(sum((2 * p.rank + p.out_deg)
                // (2 * p.out_deg)) AS BIGINT) AS inr
              FROM e JOIN p${i - 1} p ON e.src = p.node GROUP BY 1),
      p$i AS MATERIALIZED (SELECT g.node, g.out_deg,
                CAST(nn.base + (2 * 85 * (coalesce(c.inr, 0)
                  + ((2 * d.dm + nn.n) // (2 * nn.n))) + 100) // 200
                  AS BIGINT) AS rank
              FROM deg g LEFT JOIN c$i c ON g.node = c.node, d$i d, nn)"""
      }.mkString(",\n      ")
      s"""
      WITH base AS MATERIALIZED (SELECT DISTINCT l_orderkey AS bk,
                    l_suppkey AS sk FROM lineitem),
      e AS MATERIALIZED (SELECT DISTINCT a.sk AS src, b.sk AS dst
            FROM base a JOIN base b ON a.bk = b.bk AND a.sk <> b.sk),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      deg AS MATERIALIZED (SELECT n.node,
              CAST(coalesce(d.c, 0) AS BIGINT) AS out_deg
              FROM nodes n LEFT JOIN (SELECT src, count(*) AS c
                                      FROM e GROUP BY 1) d
                ON n.node = d.src),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST((2 * 1000000000 + count(*)) // (2 * count(*))
                 AS BIGINT) AS r0,
               CAST((30000000000 + 100 * count(*))
                 // (200 * count(*)) AS BIGINT) AS base
             FROM deg),
      p0 AS MATERIALIZED (SELECT node, out_deg, nn.r0 AS rank
             FROM deg, nn),
      $iters
      SELECT node AS s_suppkey, out_deg,
             CAST((rank * 2 + 1000) // 2000 AS DOUBLE) / 1e6 AS pagerank
      FROM p5 ORDER BY s_suppkey"""
    },


    // deterministic sync LPA: 4 unrolled supersteps, each = neighbor
    // label counts + (count DESC, label ASC) pick — integer-only, so
    // the replay is exact; community sizes off the final round
    "q_label_propagation" -> {
      val steps = (1 to 4).map { i =>
        s"""v$i AS MATERIALIZED (SELECT e.src AS node, l.label,
               count(*) AS c
             FROM e JOIN l${i - 1} l ON e.dst = l.node GROUP BY 1, 2),
      l$i AS MATERIALIZED (SELECT node, label FROM (
              SELECT node, label, row_number() OVER (PARTITION BY node
                ORDER BY c DESC, label) AS rn FROM v$i)
            WHERE rn = 1)"""
      }.mkString(",\n      ")
      s"""
      WITH base AS MATERIALIZED (SELECT DISTINCT l_orderkey AS bk,
              l_suppkey AS sk FROM lineitem),
      e AS MATERIALIZED (SELECT DISTINCT a.sk AS src, b.sk AS dst
            FROM base a JOIN base b ON a.bk = b.bk AND a.sk <> b.sk),
      l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
      $steps,
      sz AS (SELECT label, CAST(count(*) AS BIGINT) AS community_size
             FROM l4 GROUP BY 1)
      SELECT l4.node AS s_suppkey, l4.label AS community,
             sz.community_size
      FROM l4 JOIN sz ON l4.label = sz.label
      ORDER BY s_suppkey"""
    },

    // HITS: 4 unrolled supersteps, scores on the 1e-9 integer lattice —
    // each half-step is an exact BIGINT fold plus ONE correctly-rounded
    // division, so DuckDB replays the recursion bit-for-bit
    "q_supplier_hits" -> {
      // exact integer half-up rounding of raw*1e9/tot — no float in
      // the recursion (mirrors Graph.hits' decimal `div`). Every CTE is
      // MATERIALIZED: ar/hr are referenced twice (total + normalize),
      // and inlining would re-evaluate the whole chain per reference —
      // 2^8 blowup over four supersteps at sf0.1.
      val steps = (1 to 4).map { i =>
        s"""ar$i AS MATERIALIZED (SELECT e.dst AS node,
               CAST(sum(h.hm) AS BIGINT) AS raw
             FROM e JOIN h${i - 1} h ON e.src = h.node GROUP BY 1),
      at$i AS MATERIALIZED (SELECT CAST(sum(raw) AS BIGINT) AS tot
              FROM ar$i),
      a$i AS MATERIALIZED (SELECT n.node,
                CAST((CAST(coalesce(r.raw, 0) AS HUGEINT) * 2000000000
                  + t.tot) // (CAST(t.tot AS HUGEINT) * 2) AS BIGINT)
                  AS am
              FROM nodes n LEFT JOIN ar$i r ON n.node = r.node, at$i t),
      hr$i AS MATERIALIZED (SELECT e.src AS node,
               CAST(sum(a.am) AS BIGINT) AS raw
             FROM e JOIN a$i a ON e.dst = a.node GROUP BY 1),
      ht$i AS MATERIALIZED (SELECT CAST(sum(raw) AS BIGINT) AS tot
              FROM hr$i),
      h$i AS MATERIALIZED (SELECT n.node,
                CAST((CAST(coalesce(r.raw, 0) AS HUGEINT) * 2000000000
                  + t.tot) // (CAST(t.tot AS HUGEINT) * 2) AS BIGINT)
                  AS hm
              FROM nodes n LEFT JOIN hr$i r ON n.node = r.node, ht$i t)"""
      }.mkString(",\n      ")
      s"""
      WITH base AS MATERIALIZED (SELECT DISTINCT l_orderkey AS bk,
                      l_suppkey AS sk
                    FROM lineitem),
      e AS MATERIALIZED (SELECT DISTINCT a.sk AS src, b.sk AS dst
            FROM base a JOIN base b ON a.bk = b.bk AND a.sk <> b.sk),
      nodes AS MATERIALIZED (SELECT src AS node FROM e
                             UNION SELECT dst FROM e),
      h0 AS MATERIALIZED (SELECT node, CAST(1000000000 AS BIGINT) AS hm
                          FROM nodes),
      $steps
      SELECT a4.node AS s_suppkey,
             CAST((am * 2 + 1000) // 2000 AS DOUBLE) / 1e6 AS authority,
             CAST((hm * 2 + 1000) // 2000 AS DOUBLE) / 1e6 AS hub
      FROM a4 JOIN h4 ON a4.node = h4.node ORDER BY s_suppkey"""
    },


    // degree assortativity: HUGEINT sufficient sums over the
    // orientation-doubled edge list (x/y marginals coincide by
    // symmetry), one correctly-rounded division at the end
    "q_assortativity" -> """
      WITH base AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS sk
                    FROM lineitem),
      e0 AS (SELECT DISTINCT a.sk AS src, b.sk AS dst
             FROM base a JOIN base b ON a.bk = b.bk AND a.sk <> b.sk),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                  greatest(src, dst) AS b
                FROM e0 WHERE least(src, dst) < greatest(src, dst)),
      deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
              FROM (SELECT a AS node FROM canon
                    UNION ALL SELECT b FROM canon) t GROUP BY 1),
      sym AS (SELECT du.deg AS du, dv.deg AS dv
              FROM (SELECT a AS u, b AS v FROM canon
                    UNION ALL SELECT b, a FROM canon) s
              JOIN deg du ON s.u = du.node
              JOIN deg dv ON s.v = dv.node),
      f AS (SELECT CAST(count(*) AS HUGEINT) AS n,
              sum(CAST(du AS HUGEINT)) AS sx,
              sum(CAST(du AS HUGEINT) * du) AS sxx,
              sum(CAST(du AS HUGEINT) * dv) AS sxy
            FROM sym)
      SELECT CAST(n / 2 AS BIGINT) AS n_edges,
             round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS avg_degree,
             round(CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0 THEN
               CAST(n * sxy - sx * sx AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END, 6)
               AS assortativity
      FROM f""",


    // Newman modularity by nation: exact integer e_c/d_c/m, per-community
    // terms committed to the 1e-12 lattice before the global fold
    "q_modularity" -> """
      WITH base AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS sk
                    FROM lineitem),
      e0 AS (SELECT DISTINCT a.sk AS src, b.sk AS dst
             FROM base a JOIN base b ON a.bk = b.bk AND a.sk <> b.sk),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                  greatest(src, dst) AS b
                FROM e0 WHERE least(src, dst) < greatest(src, dst)),
      lab AS (SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS node,
                CAST(s_nationkey AS VARCHAR) AS community FROM supplier),
      tagged AS (SELECT la.community AS ca, lb.community AS cb
                 FROM canon c
                 JOIN lab la ON c.a = la.node
                 JOIN lab lb ON c.b = lb.node),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM tagged),
      win AS (SELECT ca AS community, CAST(count(*) AS BIGINT) AS e_in
              FROM tagged WHERE ca = cb GROUP BY 1),
      ds AS (SELECT community, CAST(count(*) AS BIGINT) AS d_tot
             FROM (SELECT ca AS community FROM tagged
                   UNION ALL SELECT cb FROM tagged) t GROUP BY 1),
      per AS (SELECT d.community,
                CAST(coalesce(w.e_in, 0) AS BIGINT) AS e_in, d.d_tot,
                CAST(coalesce(w.e_in, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
                  - (CAST(d.d_tot AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
                  * (CAST(d.d_tot AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
                  AS term
              FROM ds d LEFT JOIN win w ON d.community = w.community, m),
      tl AS (SELECT *, CAST(round(term * 1.0e12, 0) AS BIGINT) AS t12
             FROM per),
      q AS (SELECT CAST(sum(t12) AS BIGINT) AS ql FROM tl)
      SELECT community, e_in, d_tot, round(term, 6) AS term,
             round(CAST(ql AS DOUBLE) / 1.0e12, 6) AS modularity
      FROM tl, q ORDER BY community""",


    // uplift/Qini: user fold -> rounded quantile-cut bands (band 1 =
    // top scores) -> integer-count arms; qini = cumCT - cumCC*(cumNT/cumNC)
    "q_uplift_qini" -> s"""
      WITH u AS (SELECT user_id,
              max(CASE WHEN event_type = 'purchase' AND value > 95.0
                       THEN 1 ELSE 0 END) AS conv,
              round(CAST(count(*) AS DOUBLE), 6) AS score
            FROM events GROUP BY user_id),
      a AS (SELECT conv, score, ${uk("user_id", 59)} > 0.5 AS t FROM u),
      c AS (SELECT round(quantile_cont(score, 1.0/5), 6) AS c1,
                   round(quantile_cont(score, 2.0/5), 6) AS c2,
                   round(quantile_cont(score, 3.0/5), 6) AS c3,
                   round(quantile_cont(score, 4.0/5), 6) AS c4
            FROM a),
      b AS (SELECT a.*,
              5 - ((CASE WHEN score > c.c1 THEN 1 ELSE 0 END)
                 + (CASE WHEN score > c.c2 THEN 1 ELSE 0 END)
                 + (CASE WHEN score > c.c3 THEN 1 ELSE 0 END)
                 + (CASE WHEN score > c.c4 THEN 1 ELSE 0 END)) AS band
            FROM a, c),
      per AS (SELECT band,
              CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n_treat,
              CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT) AS n_ctrl,
              CAST(coalesce(sum(CASE WHEN t THEN conv END), 0) AS BIGINT)
                AS conv_treat,
              CAST(coalesce(sum(CASE WHEN NOT t THEN conv END), 0)
                AS BIGINT) AS conv_ctrl
            FROM b GROUP BY band),
      cum AS (SELECT *,
              CAST(sum(n_treat) OVER w AS BIGINT) AS cnt,
              CAST(sum(n_ctrl) OVER w AS BIGINT) AS cnc,
              CAST(sum(conv_treat) OVER w AS BIGINT) AS cct,
              CAST(sum(conv_ctrl) OVER w AS BIGINT) AS ccc
            FROM per WINDOW w AS (ORDER BY band
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT band, n_treat, n_ctrl, conv_treat, conv_ctrl,
             CASE WHEN n_treat > 0 THEN
               round(conv_treat / CAST(n_treat AS DOUBLE), 6) END
               AS rate_treat,
             CASE WHEN n_ctrl > 0 THEN
               round(conv_ctrl / CAST(n_ctrl AS DOUBLE), 6) END AS rate_ctrl,
             CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
               round(conv_treat / CAST(n_treat AS DOUBLE)
                 - conv_ctrl / CAST(n_ctrl AS DOUBLE), 6) END AS uplift,
             CASE WHEN cnc > 0 THEN
               round(cct - ccc * (CAST(cnt AS DOUBLE) / cnc), 6) END AS qini
      FROM cum ORDER BY band""",


    // off-policy evaluation: empirical-frequency propensities,
    // per-action-mean reward model, every per-row estimator term
    // committed to the 1e-6 lattice before the fold (exact long sums)
    "q_offpolicy_eval" -> """
      WITH base AS (SELECT event_type AS a,
              CASE WHEN user_id % 2 = 0 THEN 'purchase' ELSE 'click' END
                AS pi,
              CAST(round(value * 100, 0) AS BIGINT) AS rc
            FROM events),
      freq AS (SELECT a, CAST(count(*) AS BIGINT) AS na,
                      CAST(sum(rc) AS BIGINT) AS sc
               FROM base GROUP BY a),
      rhat AS (SELECT a, na, sc / (100.0 * na) AS rhat FROM freq),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
      scored AS (SELECT b.a, b.pi,
              CASE WHEN b.a = b.pi
                THEN CAST(t.n AS DOUBLE) / CAST(f.na AS DOUBLE)
                ELSE 0.0 END AS w,
              CAST(b.rc AS DOUBLE) / 100.0 AS r,
              f.rhat AS rhat_a, coalesce(p.rhat, 0.0) AS rp
            FROM base b JOIN rhat f ON b.a = f.a
            LEFT JOIN rhat p ON b.pi = p.a CROSS JOIN tot t),
      folded AS (SELECT CAST(count(*) AS BIGINT) AS n_logged,
              CAST(sum(CASE WHEN a = pi THEN 1 ELSE 0 END) AS BIGINT)
                AS matched,
              CAST(sum(CAST(round(w * 1000000.0, 0) AS BIGINT)) AS BIGINT)
                AS wm,
              CAST(sum(CAST(round(w * r * 1000000.0, 0) AS BIGINT))
                AS BIGINT) AS im,
              CAST(sum(CAST(round(rp * 1000000.0, 0) AS BIGINT)) AS BIGINT)
                AS dm0,
              CAST(sum(CAST(round((rp + w * (r - rhat_a)) * 1000000.0, 0)
                AS BIGINT)) AS BIGINT) AS drm
            FROM scored)
      SELECT n_logged,
             round(CAST(matched AS DOUBLE) / n_logged, 6) AS match_rate,
             round(dm0 / 1000000.0 / n_logged, 6) AS dm,
             round(im / 1000000.0 / n_logged, 6) AS ips,
             CASE WHEN wm > 0
               THEN round(CAST(im AS DOUBLE) / wm, 6) END AS snips,
             round(drm / 1000000.0 / n_logged, 6) AS dr
      FROM folded""",


    // caliper matching with replacement: bin-banded candidate join
    // (probe own + adjacent caliper buckets), nearest pick by
    // (rounded distance, control id), centi-lattice ATT fold
    "q_psm_att" -> s"""
      WITH u AS (SELECT user_id AS uid,
              round(least(avg(value) / 600.0, 1.0), 6) AS score,
              CAST(round(sum(CASE WHEN event_type = 'purchase' THEN value
                ELSE 0.0 END) * 100, 0) AS BIGINT) AS yc
            FROM events GROUP BY user_id),
      a AS (SELECT uid, score, yc, ${uk("uid", 59)} > 0.5 AS t,
              CAST(floor(score / 0.02) AS BIGINT) AS bin FROM u),
      tr AS (SELECT uid AS tid, score AS ts, yc AS ty, bin FROM a WHERE t),
      co AS (SELECT uid AS cid, score AS cs, yc AS cy, bin AS jb
             FROM a WHERE NOT t),
      cand AS (SELECT tr.tid, co.cid, co.cy, tr.ty,
                 round(abs(tr.ts - co.cs), 6) AS d
               FROM tr CROSS JOIN (SELECT unnest([-1, 0, 1]) AS nb) n
               JOIN co ON co.jb = tr.bin + n.nb
               WHERE round(abs(tr.ts - co.cs), 6) <= 0.02),
      m0 AS (SELECT *, row_number() OVER (PARTITION BY tid
               ORDER BY d, cid) AS rn FROM cand),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n_matched,
                   CAST(sum(ty - cy) AS BIGINT) AS dsum
            FROM m0 WHERE rn = 1),
      arms AS (SELECT
              CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
                AS n_treated,
              CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
                AS n_control,
              CAST(sum(CASE WHEN t THEN yc END) AS BIGINT) AS st,
              CAST(sum(CASE WHEN NOT t THEN yc END) AS BIGINT) AS sc
            FROM a)
      SELECT n_treated, n_control, n_matched,
             round(CAST(n_matched AS DOUBLE) / n_treated, 6)
               AS match_rate,
             round(st / (100.0 * n_treated) - sc / (100.0 * n_control), 6)
               AS naive_diff,
             CASE WHEN n_matched > 0 THEN
               round(dsum / (100.0 * n_matched), 6) END AS att
      FROM arms, m""",


    // diff-in-differences: 8 conditional counters in one pass, outcomes
    // on the centi lattice, each mean one engine-identical division
    // SRM: exact user-grain arm counts, chi2(1) vs the declared ratio,
    // 0.001 alarm literal
    "q_srm_check" -> s"""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      a AS (SELECT ${uk("user_id", 59)} > 0.5 AS t FROM u),
      f AS (SELECT CAST(count(CASE WHEN t THEN 1 END) AS BIGINT)
              AS n_treat,
              CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT) AS n_ctrl
            FROM a),
      g AS (SELECT n_treat, n_ctrl,
              CAST(n_treat + n_ctrl AS DOUBLE) AS nd,
              CAST(n_treat AS DOUBLE) AS td,
              CAST(n_ctrl AS DOUBLE) AS cd
            FROM f),
      h AS (SELECT *,
              (td - nd * 0.5) * (td - nd * 0.5) / (nd * 0.5)
              + (cd - nd * 0.5) * (cd - nd * 0.5) / (nd * 0.5) AS chi2
            FROM g)
      SELECT n_treat, n_ctrl,
        round(CASE WHEN n_treat + n_ctrl > 0 THEN td / nd END, 6)
          AS treat_share,
        0.5 AS expected_share,
        round(CASE WHEN n_treat + n_ctrl > 0 THEN chi2 END, 6) AS chi2,
        CASE WHEN n_treat + n_ctrl > 0
          THEN chi2 > 10.827566170662733 END AS srm_alarm
      FROM h""",


    // TOST: user-grain centi revenue, explicit sample-variance trees,
    // one-sided 5% literal, equivalent iff both sides reject
    "q_tost_equivalence" -> s"""
      WITH users AS (
        SELECT user_id,
               CAST(sum(CAST(round(coalesce(value, 0) * 100, 0)
                 AS BIGINT)) AS BIGINT) AS rev,
               max(${uk("user_id", 59)}) > 0.5 AS t
        FROM events GROUP BY 1),
      f AS (SELECT
              CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n_treat,
              CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT)
                AS n_ctrl,
              CAST(coalesce(sum(CASE WHEN t THEN rev END), 0) AS BIGINT)
                AS st,
              CAST(coalesce(sum(CASE WHEN NOT t THEN rev END), 0)
                AS BIGINT) AS sc,
              coalesce(sum(CASE WHEN t THEN CAST(rev AS HUGEINT) * rev
                END), 0) AS st2,
              coalesce(sum(CASE WHEN NOT t THEN CAST(rev AS HUGEINT)
                * rev END), 0) AS sc2
            FROM users),
      g AS (SELECT n_treat, n_ctrl,
              CAST(n_treat AS DOUBLE) AS nt, CAST(n_ctrl AS DOUBLE) AS nc,
              CAST(st AS DOUBLE) / CAST(n_treat AS DOUBLE) / 100.0 AS mt,
              CAST(sc AS DOUBLE) / CAST(n_ctrl AS DOUBLE) / 100.0 AS mc,
              (CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE)
                * CAST(st AS DOUBLE) / CAST(n_treat AS DOUBLE))
                / (CAST(n_treat AS DOUBLE) - 1.0) / 10000.0 AS vt,
              (CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE)
                * CAST(sc AS DOUBLE) / CAST(n_ctrl AS DOUBLE))
                / (CAST(n_ctrl AS DOUBLE) - 1.0) / 10000.0 AS vc
            FROM f),
      h AS (SELECT *, mt - mc AS diff,
              sqrt(vt / nt + vc / nc) AS se FROM g)
      SELECT n_treat, n_ctrl,
        round(CASE WHEN n_treat >= 2 AND n_ctrl >= 2 AND vt + vc > 0
          THEN diff END, 6) AS mean_diff,
        5.0 AS margin,
        round(CASE WHEN n_treat >= 2 AND n_ctrl >= 2 AND vt + vc > 0
          THEN (diff + 5.0) / se END, 6) AS z_lower,
        round(CASE WHEN n_treat >= 2 AND n_ctrl >= 2 AND vt + vc > 0
          THEN (5.0 - diff) / se END, 6) AS z_upper,
        CASE WHEN n_treat >= 2 AND n_ctrl >= 2 AND vt + vc > 0 THEN
          (diff + 5.0) / se > 1.6448536269514722
          AND (5.0 - diff) / se > 1.6448536269514722 END AS equivalent
      FROM h""",


    // Permutation test: user-grain centi revenue, observed u01 arm +
    // 64 multiplier-map permutations (the channel family is affine —
    // rotations, not permutations) in one fold, add-one p
    "q_permutation_test" -> {
      val perms = 64
      def aggsFor(cond: String, t: String) =
        s"""CAST(count(CASE WHEN $cond THEN 1 END) AS BIGINT) AS nt$t,
              CAST(count(CASE WHEN NOT ($cond) THEN 1 END) AS BIGINT)
                AS nc$t,
              CAST(coalesce(sum(CASE WHEN $cond THEN rev END), 0)
                AS BIGINT) AS st$t,
              CAST(coalesce(sum(CASE WHEN NOT ($cond) THEN rev END), 0)
                AS BIGINT) AS sc$t"""
      // id reduced mod M FIRST (mirrors Eval.permutationTest): the
      // product then stays within 63 bits for any BIGINT id on both
      // engines — identical arms for id < M, no overflow divergence above
      def permCond(b: Int) =
        s"((user_id % 2147483647) * ${48271L + 1000003L * b}" +
          " % 2147483647 * 48271) % 2147483647 > 1073741823"
      val allAggs = (aggsFor(s"${uk("user_id", 59)} > 0.5", "o") +:
        (1 to perms).map(b => aggsFor(permCond(b), s"$b"))).mkString(",\n")
      def d(t: String) =
        s"(CAST(st$t AS DOUBLE) / (100.0 * nt$t)" +
          s" - CAST(sc$t AS DOUBLE) / (100.0 * nc$t))"
      val nGeq = (1 to perms)
        .map(b => s"(CASE WHEN nt$b = 0 OR nc$b = 0 THEN 1 " +
          s"WHEN abs(${d(s"$b")}) >= abs(${d("o")})" +
          " THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""
      WITH users AS (
        SELECT user_id,
               CAST(sum(CAST(round(coalesce(value, 0) * 100, 0)
                 AS BIGINT)) AS BIGINT) AS rev
        FROM events GROUP BY 1),
      f AS (SELECT
              $allAggs
            FROM users)
      SELECT CAST(nto + nco AS BIGINT) AS n_users,
             round(CASE WHEN nto > 0 AND nco > 0 THEN ${d("o")} END, 6)
               AS obs_diff,
             64 AS n_perms,
             CAST(CASE WHEN nto > 0 AND nco > 0 THEN ($nGeq) END
               AS BIGINT) AS n_geq,
             round(CASE WHEN nto > 0 AND nco > 0 THEN
               (1.0 + CAST(($nGeq) AS DOUBLE)) / 65.0 END, 6) AS perm_p
      FROM f"""
    },


    // QTE: quantile_cont ≡ Spark percentile (linear interpolation),
    // per-arm arrays from one pass, fixed gap trees
    "q_qte" -> {
      val probs = (1 to 9).map(i => s"0.$i").mkString(", ")
      s"""
      WITH b AS (SELECT ${uk("user_id", 59)} > 0.5 AS t, value AS v
            FROM events
            WHERE value IS NOT NULL AND NOT isnan(value)),
      f AS (SELECT
              CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n_treat,
              CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT)
                AS n_ctrl,
              quantile_cont(v, [$probs]) FILTER (WHERE t) AS qt,
              quantile_cont(v, [$probs]) FILTER (WHERE NOT t) AS qc
            FROM b)
      SELECT CAST(i AS INTEGER) AS decile, n_treat, n_ctrl,
             round(qt[i], 6) AS q_treat,
             round(qc[i], 6) AS q_ctrl,
             round(qt[i] - qc[i], 6) AS qte
      FROM f, (SELECT unnest(range(1, 10)) AS i)
      ORDER BY decile"""
    },


    // Event-study: per-rel-day arm cells on the centi lattice, pooled
    // pre-period gap broadcast back, null att when an arm is absent
    "q_event_study" -> s"""
      WITH b AS (SELECT ${uk("user_id", 59)} > 0.5 AS t,
              CAST(datediff('day', DATE '2024-01-15', CAST(ts AS DATE))
                AS INTEGER) AS rel_day,
              CAST(round(value * 100, 0) AS BIGINT) AS vc
            FROM events),
      daily AS (SELECT rel_day,
              CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n_treat,
              CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT) AS n_ctrl,
              CAST(coalesce(sum(CASE WHEN t THEN vc END), 0) AS BIGINT)
                AS st,
              CAST(coalesce(sum(CASE WHEN NOT t THEN vc END), 0)
                AS BIGINT) AS sc
            FROM b GROUP BY 1),
      pre AS (SELECT CASE WHEN sum(n_treat) > 0 AND sum(n_ctrl) > 0 THEN
                sum(st) / (100.0 * sum(n_treat))
                  - sum(sc) / (100.0 * sum(n_ctrl)) END AS gap_pre
              FROM daily WHERE rel_day < 0)
      SELECT rel_day, n_treat, n_ctrl,
             round(CASE WHEN n_treat > 0
               THEN st / (100.0 * n_treat) END, 6) AS mean_treat,
             round(CASE WHEN n_ctrl > 0
               THEN sc / (100.0 * n_ctrl) END, 6) AS mean_ctrl,
             round(CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
               st / (100.0 * n_treat) - sc / (100.0 * n_ctrl) END, 6)
               AS gap,
             round(CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
               (st / (100.0 * n_treat) - sc / (100.0 * n_ctrl))
                 - gap_pre END, 6) AS att
      FROM daily, pre ORDER BY rel_day""",


    "q_diff_in_diff" -> s"""
      WITH b AS (SELECT ${uk("user_id", 59)} > 0.5 AS t,
              ts >= TIMESTAMP '2024-01-15' AS post,
              CAST(round(value * 100, 0) AS BIGINT) AS vc
            FROM events),
      f AS (SELECT
              CAST(count(CASE WHEN NOT t AND NOT post THEN 1 END)
                AS BIGINT) AS n_ctrl_pre,
              CAST(count(CASE WHEN NOT t AND post THEN 1 END) AS BIGINT)
                AS n_ctrl_post,
              CAST(count(CASE WHEN t AND NOT post THEN 1 END) AS BIGINT)
                AS n_treat_pre,
              CAST(count(CASE WHEN t AND post THEN 1 END) AS BIGINT)
                AS n_treat_post,
              CAST(sum(CASE WHEN NOT t AND NOT post THEN vc END)
                AS BIGINT) AS s00,
              CAST(sum(CASE WHEN NOT t AND post THEN vc END) AS BIGINT)
                AS s01,
              CAST(sum(CASE WHEN t AND NOT post THEN vc END) AS BIGINT)
                AS s10,
              CAST(sum(CASE WHEN t AND post THEN vc END) AS BIGINT)
                AS s11
            FROM b)
      SELECT n_ctrl_pre, n_ctrl_post, n_treat_pre, n_treat_post,
             round(s00 / (100.0 * n_ctrl_pre), 6) AS mean_ctrl_pre,
             round(s01 / (100.0 * n_ctrl_post), 6) AS mean_ctrl_post,
             round(s10 / (100.0 * n_treat_pre), 6) AS mean_treat_pre,
             round(s11 / (100.0 * n_treat_post), 6) AS mean_treat_post,
             round((s11 / (100.0 * n_treat_post)
                 - s10 / (100.0 * n_treat_pre))
               - (s01 / (100.0 * n_ctrl_post)
                 - s00 / (100.0 * n_ctrl_pre)), 6) AS did
      FROM f""",

    // IV/Wald encouragement design: user grain (behavior + centi
    // revenue), hash arm channel 61 as instrument, LATE = ITT_y/ITT_d
    // with the first-stage-F weak-IV alarm; every double division
    // mirrors the Spark fixed tree term-for-term
    "q_iv_wald" -> s"""
      WITH u AS (SELECT user_id, count(*) >= 30 AS d,
              CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100, 0) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS yc
            FROM events GROUP BY user_id),
      b AS (SELECT ${uk("user_id", 61)} > 0.5 AS z, d, yc FROM u),
      f AS (SELECT
              CAST(count(CASE WHEN z THEN 1 END) AS BIGINT) AS n_z1,
              CAST(count(CASE WHEN NOT z THEN 1 END) AS BIGINT) AS n_z0,
              CAST(count(CASE WHEN z AND d THEN 1 END) AS BIGINT) AS d1,
              CAST(count(CASE WHEN NOT z AND d THEN 1 END) AS BIGINT)
                AS d0,
              CAST(coalesce(sum(CASE WHEN z THEN yc END), 0) AS BIGINT)
                AS s1,
              CAST(coalesce(sum(CASE WHEN NOT z THEN yc END), 0)
                AS BIGINT) AS s0,
              CAST(coalesce(sum(CASE WHEN d THEN yc END), 0) AS BIGINT)
                AS sd1,
              CAST(count(CASE WHEN d THEN 1 END) AS BIGINT) AS nd1
            FROM b),
      t AS (SELECT *,
              CAST(d1 AS DOUBLE) / CAST(n_z1 AS DOUBLE) AS p1,
              CAST(d0 AS DOUBLE) / CAST(n_z0 AS DOUBLE) AS p0,
              CAST(s1 AS DOUBLE) / (100.0 * CAST(n_z1 AS DOUBLE)) AS m1,
              CAST(s0 AS DOUBLE) / (100.0 * CAST(n_z0 AS DOUBLE)) AS m0,
              n_z1 > 0 AND n_z0 > 0 AS ok
            FROM f),
      t2 AS (SELECT *,
              p1 - p0 AS fs, m1 - m0 AS itt,
              p1 * (1.0 - p1) / CAST(n_z1 AS DOUBLE)
                + p0 * (1.0 - p0) / CAST(n_z0 AS DOUBLE) AS se2
            FROM t)
      SELECT n_z1, n_z0,
             round(CASE WHEN ok THEN p1 END, 6) AS treat_rate_z1,
             round(CASE WHEN ok THEN p0 END, 6) AS treat_rate_z0,
             round(CASE WHEN ok THEN fs END, 6) AS first_stage,
             round(CASE WHEN ok THEN
               CASE WHEN se2 > 0 THEN fs * fs / se2 END END, 6)
               AS first_stage_f,
             round(CASE WHEN ok THEN m1 END, 6) AS mean_y_z1,
             round(CASE WHEN ok THEN m0 END, 6) AS mean_y_z0,
             round(CASE WHEN ok THEN itt END, 6) AS itt,
             round(CASE WHEN ok AND nd1 > 0 AND n_z1 + n_z0 > nd1 THEN
                 CAST(sd1 AS DOUBLE) / (100.0 * CAST(nd1 AS DOUBLE))
                 - CAST(s1 + s0 - sd1 AS DOUBLE)
                   / (100.0 * CAST(n_z1 + n_z0 - nd1 AS DOUBLE)) END, 6)
               AS naive_contrast,
             round(CASE WHEN ok AND fs <> 0.0 THEN itt / fs END, 6)
               AS late,
             CASE WHEN ok THEN NOT (coalesce(
                 CASE WHEN se2 > 0 THEN fs * fs / se2 END >= 10.0, FALSE)
               OR (se2 = 0.0 AND fs <> 0.0)) END AS weak_instrument
      FROM t2""",

    // sharp RDD at the $300k order-value cutoff, +-$100k bandwidth:
    // per-side exact centi OLS sums, intercept jump at the threshold
    "q_reg_discontinuity" -> """
      WITH b AS (SELECT
              CAST(round(o_totalprice * 100, 0) AS BIGINT) - 30000000
                AS x,
              CAST(round(CASE WHEN o_orderpriority = '1-URGENT'
                THEN 1.0 ELSE 0.0 END * 100, 0) AS BIGINT) AS y
            FROM orders
            WHERE o_totalprice >= 200000.0 AND o_totalprice < 400000.0),
      f AS (SELECT
              CAST(count(CASE WHEN x < 0 THEN 1 END) AS BIGINT) AS nl,
              CAST(coalesce(sum(CASE WHEN x < 0 THEN x END), 0)
                AS BIGINT) AS sxl,
              CAST(coalesce(sum(CASE WHEN x < 0 THEN y END), 0)
                AS BIGINT) AS syl,
              CAST(coalesce(sum(CASE WHEN x < 0 THEN x * y END), 0)
                AS BIGINT) AS sxyl,
              CAST(coalesce(sum(CASE WHEN x < 0 THEN x * x END), 0)
                AS BIGINT) AS sxxl,
              CAST(count(CASE WHEN x >= 0 THEN 1 END) AS BIGINT) AS nr,
              CAST(coalesce(sum(CASE WHEN x >= 0 THEN x END), 0)
                AS BIGINT) AS sxr,
              CAST(coalesce(sum(CASE WHEN x >= 0 THEN y END), 0)
                AS BIGINT) AS syr,
              CAST(coalesce(sum(CASE WHEN x >= 0 THEN x * y END), 0)
                AS BIGINT) AS sxyr,
              CAST(coalesce(sum(CASE WHEN x >= 0 THEN x * x END), 0)
                AS BIGINT) AS sxxr
            FROM b),
      t AS (SELECT *,
              CAST(sxyl AS DOUBLE) - CAST(sxl AS DOUBLE)
                * CAST(syl AS DOUBLE) / CAST(nl AS DOUBLE) AS cxyl,
              CAST(sxxl AS DOUBLE) - CAST(sxl AS DOUBLE)
                * CAST(sxl AS DOUBLE) / CAST(nl AS DOUBLE) AS cxxl,
              CAST(sxyr AS DOUBLE) - CAST(sxr AS DOUBLE)
                * CAST(syr AS DOUBLE) / CAST(nr AS DOUBLE) AS cxyr,
              CAST(sxxr AS DOUBLE) - CAST(sxr AS DOUBLE)
                * CAST(sxr AS DOUBLE) / CAST(nr AS DOUBLE) AS cxxr
            FROM f),
      t2 AS (SELECT *,
              cxyl / cxxl AS bl, cxyr / cxxr AS br,
              nl >= 3 AND cxxl > 0 AS okl,
              nr >= 3 AND cxxr > 0 AS okr
            FROM t),
      t3 AS (SELECT *,
              CAST(syl AS DOUBLE) / CAST(nl AS DOUBLE)
                - bl * (CAST(sxl AS DOUBLE) / CAST(nl AS DOUBLE)) AS al,
              CAST(syr AS DOUBLE) / CAST(nr AS DOUBLE)
                - br * (CAST(sxr AS DOUBLE) / CAST(nr AS DOUBLE)) AS ar
            FROM t2)
      SELECT nl AS n_left, nr AS n_right,
             round(CASE WHEN okl THEN al / 100.0 END, 6)
               AS intercept_left,
             round(CASE WHEN okr THEN ar / 100.0 END, 6)
               AS intercept_right,
             round(CASE WHEN okl THEN bl END, 6) AS slope_left,
             round(CASE WHEN okr THEN br END, 6) AS slope_right,
             round(CASE WHEN okl AND okr
               THEN ar / 100.0 - al / 100.0 END, 6) AS rdd_tau
      FROM t3""",


    // weekly growth accounting: per-user lag/lead classification, churn
    // attributed one week forward, full-outer merged (trailing churn
    // week included); Deltaactive = new + resurrected - churned
    "q_growth_accounting" -> """
      WITH act AS (SELECT DISTINCT user_id AS u,
              CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
            FROM events),
      l AS (SELECT u, wk,
              lag(wk) OVER (PARTITION BY u ORDER BY wk) AS prev,
              lead(wk) OVER (PARTITION BY u ORDER BY wk) AS nxt
            FROM act),
      a AS (SELECT wk AS week, CAST(count(*) AS BIGINT) AS n_active,
              CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
              CAST(sum(CASE WHEN prev IS NOT NULL
                AND date_diff('day', prev, wk) = 7 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
              CAST(sum(CASE WHEN prev IS NOT NULL
                AND date_diff('day', prev, wk) > 7 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected
            FROM l GROUP BY wk),
      c AS (SELECT wk + 7 AS week, CAST(count(*) AS BIGINT) AS n_churned
            FROM l WHERE nxt IS NULL OR date_diff('day', wk, nxt) > 7
            GROUP BY wk + 7)
      SELECT coalesce(a.week, c.week) AS week,
             CAST(coalesce(n_active, 0) AS BIGINT) AS n_active,
             CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
             CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
             CAST(coalesce(n_resurrected, 0) AS BIGINT) AS n_resurrected,
             CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned,
             CAST(coalesce(n_new, 0) + coalesce(n_resurrected, 0)
               - coalesce(n_churned, 0) AS BIGINT) AS net_growth
      FROM a FULL JOIN c ON a.week = c.week ORDER BY week""",


    // lagged cross-correlation: daily (avg value, purchase count), one
    // window pass shifting y, every lag's corr in one fold
    "q_cross_correlation" -> {
      val shifts = (-7 to 7).filter(_ != 0).map { k =>
        val f = if (k < 0) s"lead(y, ${-k})" else s"lag(y, $k)"
        s"$f OVER (ORDER BY bucket) AS s${k + 7}"
      }.mkString(",\n               ")
      val arms = (-7 to 7).map { k =>
        val cn = if (k == 0) "y" else s"s${k + 7}"
        s"SELECT $k AS lag, corr(x, $cn) AS c, " +
          s"CAST(count($cn) AS BIGINT) AS n_pairs FROM l"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH s AS (SELECT CAST(ts AS DATE) AS bucket,
              avg(value) AS x,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS DOUBLE) AS y
            FROM events GROUP BY 1),
      l AS (SELECT bucket, x, y,
               $shifts
            FROM s)
      SELECT lag, round(c, 6) AS ccf, n_pairs
      FROM ($arms)
      ORDER BY lag"""
    },


    // Kruskal-Wallis: exact 2x-midranks, per-group rank sums CASE-folded
    // into one row, fixed left-to-right H combine, exact tie sums
    // Durbin-Watson: OLS from exact HUGEINT sufficient sums, residuals
    // on the micro lattice, both quadratic forms exact
    // Tail dependence: quantile_cont thresholds (percentile parity,
    // lower probs generated from the SAME 1-q doubles Spark uses),
    // exact strict-exceedance counts, fixed ratio trees
    "q_tail_dependence" -> {
      val qs = Seq(0.9, 0.95, 0.99)
      val up = qs.mkString(", ")
      val lo = qs.map(q => (1.0 - q).toString).mkString(", ")
      val aggs = qs.indices.map { i =>
        s"""CAST(sum(CASE WHEN x > xu[${i + 1}] THEN 1 ELSE 0 END)
                AS BIGINT) AS nxu$i,
              CAST(sum(CASE WHEN x > xu[${i + 1}] AND y > yu[${i + 1}]
                THEN 1 ELSE 0 END) AS BIGINT) AS nju$i,
              CAST(sum(CASE WHEN x < xl[${i + 1}] THEN 1 ELSE 0 END)
                AS BIGINT) AS nxl$i,
              CAST(sum(CASE WHEN x < xl[${i + 1}] AND y < yl[${i + 1}]
                THEN 1 ELSE 0 END) AS BIGINT) AS njl$i"""
      }.mkString(",\n")
      val arms = qs.zipWithIndex.map { case (q, i) =>
        s"""SELECT $q AS q, n AS n_rows, nxu$i AS n_exceed_x,
               nju$i AS n_joint,
               round(CASE WHEN nxu$i > 0 THEN CAST(nju$i AS DOUBLE)
                 / CAST(nxu$i AS DOUBLE) END, 6) AS lambda_upper,
               round(CASE WHEN nxl$i > 0 THEN CAST(njl$i AS DOUBLE)
                 / CAST(nxl$i AS DOUBLE) END, 6) AS lambda_lower
             FROM f"""
      }.mkString("\n        UNION ALL ")
      s"""
      WITH b AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS x,
               CAST(l_quantity AS DOUBLE) AS y
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
          AND l_quantity IS NOT NULL AND NOT isnan(l_quantity)),
      th AS (SELECT quantile_cont(x, [$up]) AS xu,
               quantile_cont(y, [$up]) AS yu,
               quantile_cont(x, [$lo]) AS xl,
               quantile_cont(y, [$lo]) AS yl
             FROM b),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              $aggs
            FROM b, th)
      SELECT * FROM ($arms) ORDER BY q"""
    },


    // Partial correlation: three lattice columns, ten exact sums, one
    // fixed tree
    "q_partial_corr" -> {
      def dd(c: String) = s"CAST($c AS DOUBLE)"
      def r(ab: String, a: String, b: String, aa: String, bb: String) =
        s"""(CASE WHEN sqrt((${dd("n")} * ${dd(aa)} - ${dd(a)} * ${dd(a)})
              * (${dd("n")} * ${dd(bb)} - ${dd(b)} * ${dd(b)})) > 0
            THEN (${dd("n")} * ${dd(ab)} - ${dd(a)} * ${dd(b)})
              / sqrt((${dd("n")} * ${dd(aa)} - ${dd(a)} * ${dd(a)})
              * (${dd("n")} * ${dd(bb)} - ${dd(b)} * ${dd(b)})) END)"""
      val rxy = r("sxy", "sx", "sy", "sxx", "syy")
      val rxz = r("sxz", "sx", "sz", "sxx", "szz")
      val ryz = r("syz", "sy", "sz", "syy", "szz")
      s"""
      WITH b AS (SELECT
              CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS x,
              CAST(round(l_quantity * 100, 0) AS BIGINT) AS y,
              CAST(round(l_discount * 100, 0) AS BIGINT) AS z
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
              AND l_discount IS NOT NULL),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(z) AS BIGINT) AS sz,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(y AS HUGEINT) * y) AS syy,
              sum(CAST(z AS HUGEINT) * z) AS szz,
              sum(CAST(x AS HUGEINT) * y) AS sxy,
              sum(CAST(x AS HUGEINT) * z) AS sxz,
              sum(CAST(y AS HUGEINT) * z) AS syz
            FROM b)
      SELECT n, round($rxy, 6) AS r_xy, round($rxz, 6) AS r_xz,
             round($ryz, 6) AS r_yz,
             round(CASE WHEN sqrt((1.0 - $rxz * $rxz)
                 * (1.0 - $ryz * $ryz)) > 0 THEN
               ($rxy - $rxz * $ryz) / sqrt((1.0 - $rxz * $rxz)
                 * (1.0 - $ryz * $ryz)) END, 6) AS partial_r_xy_z
      FROM f"""
    },


    // Seasonal MK: slot-constrained pairs, integer variance numerators,
    // one /18 division, combined row slot -1
    "q_seasonal_mk" -> """
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS vc
            FROM orders GROUP BY 1),
      sl AS (SELECT d, vc,
              CAST((d - DATE '1970-01-01') % 7 AS INTEGER) AS slot
            FROM daily),
      sp AS (SELECT a.slot,
              CAST(sum(CASE WHEN b.vc > a.vc THEN 1
                WHEN b.vc < a.vc THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
            FROM sl a JOIN sl b ON a.slot = b.slot AND a.d < b.d
            GROUP BY 1),
      np AS (SELECT slot, CAST(count(*) AS BIGINT) AS n_days
             FROM sl GROUP BY 1),
      tp AS (SELECT slot,
              CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                AS tsum
            FROM (SELECT slot, vc, CAST(count(*) AS BIGINT) AS t
                  FROM sl GROUP BY 1, 2)
            GROUP BY 1),
      slots AS (SELECT np.slot, np.n_days,
              CAST(coalesce(sp.s_stat, 0) AS BIGINT) AS s_stat,
              np.n_days * (np.n_days - 1) * (2 * np.n_days + 5)
                - tp.tsum AS num
            FROM np LEFT JOIN sp ON np.slot = sp.slot
                    JOIN tp ON np.slot = tp.slot),
      total AS (SELECT CAST(-1 AS INTEGER) AS slot,
              CAST(sum(n_days) AS BIGINT) AS n_days,
              CAST(sum(s_stat) AS BIGINT) AS s_stat,
              CAST(sum(num) AS BIGINT) AS num
            FROM slots),
      allr AS (SELECT slot, n_days, s_stat, num FROM slots
               UNION ALL SELECT slot, n_days, s_stat, num FROM total)
      SELECT slot, n_days, s_stat,
        round(CAST(num AS DOUBLE) / 18.0, 6) AS var_s,
        CASE WHEN CAST(num AS DOUBLE) / 18.0 > 0 THEN round(
          (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
            WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
            ELSE 0.0 END) / sqrt(CAST(num AS DOUBLE) / 18.0), 6) END AS z
      FROM allr ORDER BY slot""",


    // Cp/Cpk: exact centi sums, explicit sample-variance tree, 1.33 bar
    "q_process_capability" -> """
      WITH f AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS s,
               sum(CAST(CAST(round(value * 100, 0) AS BIGINT) AS HUGEINT)
                 * CAST(round(value * 100, 0) AS BIGINT)) AS s2
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
      t AS (SELECT n,
              CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mu,
              (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
                / 10000.0 AS v
            FROM f)
      SELECT n, round(mu, 6) AS mean,
        round(CASE WHEN n >= 2 AND v > 0 THEN sqrt(v) END, 6) AS sigma,
        round(CASE WHEN n >= 2 AND v > 0 THEN
          (500.0 - 0.0) / (6.0 * sqrt(v)) END, 6) AS cp,
        round(CASE WHEN n >= 2 AND v > 0 THEN
          least(500.0 - mu, mu - 0.0) / (3.0 * sqrt(v)) END, 6) AS cpk,
        CASE WHEN n >= 2 AND v > 0 THEN
          least(500.0 - mu, mu - 0.0) / (3.0 * sqrt(v)) >= 1.33 END
          AS capable,
        round(CASE WHEN n >= 2 AND v > 0 THEN
          (500.0 - 0.0) / (6.0 * sqrt(v))
          - least(500.0 - mu, mu - 0.0) / (3.0 * sqrt(v)) END, 6)
          AS centering_loss
      FROM t""",


    // Turning points: strict lattice extrema, Kendall E/Var literals
    "q_turning_points" -> """
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders GROUP BY 1),
      l AS (SELECT y, lag(y, 1) OVER (ORDER BY d) AS p,
              lead(y, 1) OVER (ORDER BY d) AS x
            FROM daily),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(CASE WHEN p IS NOT NULL AND x IS NOT NULL
                AND ((p < y AND y > x) OR (p > y AND y < x))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
            FROM l)
      SELECT n_days, n_turning,
        round(CASE WHEN n_days >= 4 THEN
          2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0 END, 6) AS expected,
        round(CASE WHEN n_days >= 4
            AND (16.0 * CAST(n_days AS DOUBLE) - 29.0) / 90.0 > 0 THEN
          (CAST(n_turning AS DOUBLE)
            - 2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0)
          / sqrt((16.0 * CAST(n_days AS DOUBLE) - 29.0) / 90.0) END, 6)
          AS z_stat
      FROM f""",


    // Chow test: exact per-segment OLS sums via conditional folds,
    // fixed RSS/F tree; declared break 1995-06-30
    "q_chow_test" -> {
      def dd(c: String) = s"CAST($c AS DOUBLE)"
      def rss(t: String) =
        s"((${dd(s"syy$t")} - ${dd(s"sy$t")} * ${dd(s"sy$t")} / ${dd(s"n$t")})" +
          s" - (${dd(s"sty$t")} - ${dd(s"st$t")} * ${dd(s"sy$t")} / ${dd(s"n$t")})" +
          s" * (${dd(s"sty$t")} - ${dd(s"st$t")} * ${dd(s"sy$t")} / ${dd(s"n$t")})" +
          s" / (${dd(s"stt$t")} - ${dd(s"st$t")} * ${dd(s"st$t")} / ${dd(s"n$t")}))"
      def slope(t: String) =
        s"((${dd(s"sty$t")} - ${dd(s"st$t")} * ${dd(s"sy$t")} / ${dd(s"n$t")})" +
          s" / (${dd(s"stt$t")} - ${dd(s"st$t")} * ${dd(s"st$t")} / ${dd(s"n$t")}))"
      def sums(flag: String, t: String) =
        s"""CAST(count(CASE WHEN $flag THEN 1 END) AS BIGINT) AS n$t,
              CAST(coalesce(sum(CASE WHEN $flag THEN tt END), 0) AS BIGINT)
                AS st$t,
              CAST(coalesce(sum(CASE WHEN $flag THEN y END), 0) AS BIGINT)
                AS sy$t,
              coalesce(sum(CASE WHEN $flag THEN CAST(tt AS HUGEINT) * y
                END), 0) AS sty$t,
              CAST(coalesce(sum(CASE WHEN $flag THEN tt * tt END), 0)
                AS BIGINT) AS stt$t,
              coalesce(sum(CASE WHEN $flag THEN CAST(y AS HUGEINT) * y
                END), 0) AS syy$t"""
      val fStat = s"(((${rss("p")} - ${rss("1")} - ${rss("2")}) / 2.0)" +
        s" / ((${rss("1")} + ${rss("2")}) / (${dd("np")} - 4.0)))"
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders GROUP BY 1),
      r AS (SELECT y,
              CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS tt,
              d < DATE '1995-06-30' AS pre
            FROM daily),
      f AS (SELECT ${sums("pre", "1")},
              ${sums("NOT pre", "2")},
              ${sums("TRUE", "p")}
            FROM r)
      SELECT n1 AS n_pre, n2 AS n_post,
             round(CASE WHEN n1 >= 3 THEN ${slope("1")} / 100.0 END, 6)
               AS slope_pre,
             round(CASE WHEN n2 >= 3 THEN ${slope("2")} / 100.0 END, 6)
               AS slope_post,
             round(CASE WHEN n1 >= 3 AND n2 >= 3
               AND (${rss("1")} + ${rss("2")}) > 0 THEN $fStat END, 6)
               AS f_stat,
             CAST(np - 4 AS BIGINT) AS df2
      FROM f"""
    },


    // NB moment fit: exact count sums, one fixed ddof-0 tree
    "q_negbin_fit" -> """
      WITH k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS k
                 FROM events GROUP BY 1),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(k) AS BIGINT) AS s,
              sum(CAST(k AS HUGEINT) * k) AS s2
            FROM k),
      t AS (SELECT n_keys,
              CAST(s AS DOUBLE) / CAST(n_keys AS DOUBLE) AS m,
              CAST(s2 AS DOUBLE) / CAST(n_keys AS DOUBLE)
                - (CAST(s AS DOUBLE) / CAST(n_keys AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n_keys AS DOUBLE)) AS v
            FROM f)
      SELECT n_keys,
             round(m, 6) AS mean_count,
             round(v, 6) AS var_count,
             round(CASE WHEN m > 0 THEN v / m END, 6) AS dispersion,
             CASE WHEN m > 0 THEN v > m END AS overdispersed,
             round(CASE WHEN v > m THEN m * m / (v - m) END, 6) AS nb_r,
             round(CASE WHEN v > m THEN m / v END, 6) AS nb_p
      FROM t""",


    // Control chart: 1e-6 lattice weekly means by exact half-up
    // division, exact integer grand sums, Shewhart n=7 constants
    "q_control_chart" -> """
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders GROUP BY 1),
      weekly AS (SELECT wk, n, s, r,
              (CAST(s AS HUGEINT) * 20000 + n)
                // (CAST(n AS HUGEINT) * 2) AS m6
            FROM (SELECT (d - DATE '1970-01-01') // 7 AS wk,
                    CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(y) AS BIGINT) AS s,
                    CAST(max(y) - min(y) AS BIGINT) AS r
                  FROM daily GROUP BY 1)
            WHERE n = 7),
      grand AS (SELECT CAST(count(*) AS BIGINT) AS w,
              CAST(sum(m6) AS BIGINT) AS sm,
              CAST(sum(r) AS BIGINT) AS sr
            FROM weekly),
      lim AS (SELECT w,
              CAST(sm AS DOUBLE) / CAST(w AS DOUBLE) / 1e6 AS xbb,
              CAST(sr AS DOUBLE) / CAST(w AS DOUBLE) / 100.0 AS rbar
            FROM grand),
      lim2 AS (SELECT w, xbb, rbar,
              xbb + 0.419 * rbar AS ucl, xbb - 0.419 * rbar AS lcl,
              1.924 * rbar AS uclr, 0.076 * rbar AS lclr
            FROM lim)
      SELECT wk AS week,
             round(CAST(m6 AS DOUBLE) / 1e6, 6) AS week_mean,
             round(CAST(r AS DOUBLE) / 100.0, 6) AS week_range,
             round(xbb, 6) AS grand_mean,
             round(ucl, 6) AS ucl_mean, round(lcl, 6) AS lcl_mean,
             round(uclr, 6) AS ucl_range,
             (CAST(m6 AS DOUBLE) / 1e6 > ucl
               OR CAST(m6 AS DOUBLE) / 1e6 < lcl) AS mean_out,
             (CAST(r AS DOUBLE) / 100.0 > uclr
               OR CAST(r AS DOUBLE) / 100.0 < lclr) AS range_out
      FROM weekly, lim2 WHERE w >= 2 ORDER BY week""",


    // Gumbel L-moments: exact centi block maxima, integer rank sums,
    // one fixed tree with ln2 / Euler-gamma / T-quantile literals
    "q_gumbel_maxima" -> {
      val ln2 = 0.6931471805599453
      val gamma = 0.5772156649015329
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders GROUP BY 1),
      weekly AS (SELECT (d - DATE '1970-01-01') // 7 AS wk,
              CAST(max(y) AS BIGINT) AS m
            FROM daily GROUP BY 1),
      ranked AS (SELECT m,
              CAST(row_number() OVER (ORDER BY m, wk) AS BIGINT) AS r
            FROM weekly),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
              CAST(sum(m) AS BIGINT) AS sm,
              sum(CAST(r - 1 AS HUGEINT) * m) AS srm
            FROM ranked),
      t AS (SELECT n_blocks,
              CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS b0,
              CAST(srm AS DOUBLE) / (CAST(n_blocks AS DOUBLE)
                * (CAST(n_blocks AS DOUBLE) - 1.0)) AS b1
            FROM f),
      g AS (SELECT n_blocks, b0,
              (2.0 * b1 - b0) / $ln2 AS scale FROM t),
      h AS (SELECT n_blocks, b0, scale,
              b0 - $gamma * scale AS loc FROM g)
      SELECT n_blocks,
             round(b0 / 100.0, 6) AS block_mean,
             round(CASE WHEN n_blocks >= 2 THEN loc / 100.0 END, 6)
               AS gumbel_loc,
             round(CASE WHEN n_blocks >= 2 THEN scale / 100.0 END, 6)
               AS gumbel_scale,
             round(CASE WHEN n_blocks >= 2 THEN
               (loc - scale * ln(-ln(1.0 - 1.0 / 52.0))) / 100.0 END, 6)
               AS ret_level_52w
      FROM h"""
    },


    // Haar bands: integer details from centi sums, exact HUGEINT
    // energies, common-denominator share — doubles only at display
    "q_haar_energy" -> """
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders GROUP BY 1),
      t AS (SELECT y,
              CAST(row_number() OVER (ORDER BY d) AS BIGINT) - 1 AS t
            FROM daily),
      arms AS (
        SELECT 1 AS level, t // 2 AS blk,
          CASE WHEN (t // 1) % 2 = 0 THEN y ELSE -y END AS s, 2 AS sz
        FROM t
        UNION ALL
        SELECT 2, t // 4,
          CASE WHEN (t // 2) % 2 = 0 THEN y ELSE -y END, 4 FROM t
        UNION ALL
        SELECT 3, t // 8,
          CASE WHEN (t // 4) % 2 = 0 THEN y ELSE -y END, 8 FROM t),
      blocks AS (
        SELECT level, blk, CAST(sum(s) AS BIGINT) AS dtl
        FROM arms GROUP BY 1, 2 HAVING count(*) = max(sz)),
      per AS (
        SELECT level, CAST(count(*) AS BIGINT) AS n_blocks,
          sum(CAST(dtl AS HUGEINT) * dtl) AS e,
          sum(CAST(dtl AS HUGEINT) * dtl) *
            CAST(pow(4.0, 3 - level) AS HUGEINT) AS sc
        FROM blocks GROUP BY 1)
      SELECT level, n_blocks,
        round(CAST(e AS DOUBLE) / pow(4.0, CAST(level AS DOUBLE)), 6)
          AS band_energy,
        round(CAST(sc AS DOUBLE) / CAST(sum(sc) OVER () AS DOUBLE), 6)
          AS band_share
      FROM per ORDER BY level""",


    // Sign test: centi-lattice daily comparisons, exact binomial tail
    // replayed as an index-ordered recursive-CTE recurrence from the
    // dyadic 0.5^n seed — the same IEEE chain Spark folds in-sequence
    "q_sign_test" -> """
      WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS d,
          CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1),
      l AS (SELECT y, lag(y, 7) OVER (ORDER BY d) AS y0 FROM daily),
      f AS (SELECT
         CAST(count(CASE WHEN y0 IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_obs,
         CAST(sum(CASE WHEN y0 IS NOT NULL AND y > y0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN y0 IS NOT NULL AND y < y0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_neg,
         CAST(sum(CASE WHEN y0 IS NOT NULL AND y = y0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_ties
       FROM l),
      g AS (SELECT *, n_pos + n_neg AS n, least(n_pos, n_neg) AS m,
              CAST(n_pos + n_neg AS DOUBLE) AS nd FROM f),
      r(i, pmf, cum) AS (
        SELECT 0, pow(0.5, (SELECT nd FROM g)),
               pow(0.5, (SELECT nd FROM g))
        UNION ALL
        SELECT i + 1,
          (pmf * ((SELECT nd FROM g) - (i + 1) + 1.0)) / (i + 1),
          cum + CASE WHEN (i + 1) <= (SELECT m FROM g)
            THEN (pmf * ((SELECT nd FROM g) - (i + 1) + 1.0)) / (i + 1)
            ELSE 0.0 END
        FROM r WHERE i < (SELECT n FROM g))
      SELECT n_obs, n_pos, n_neg, n_ties,
        round(CASE WHEN n >= 1 THEN least(1.0,
          2.0 * (SELECT cum FROM r WHERE i = (SELECT n FROM g)))
        END, 6) AS sign_p
      FROM g""",


    // White test: whole-dollar residual lattice (the fourth power must fit),
    // exact HUGEINT auxiliary sums, quadratic Cramer solve, chi2(2) 5%
    "q_white_test" -> {
      val num = "CAST(CAST(n AS HUGEINT) * sxy" +
        " - CAST(sx AS HUGEINT) * sy AS DOUBLE)"
      val den = "CAST(CAST(n AS HUGEINT) * sxx" +
        " - CAST(sx AS HUGEINT) * sx AS DOUBLE)"
      def dd(c: String) = s"CAST($c AS DOUBLE)"
      val nD = "CAST(n_days AS DOUBLE)"
      val czz = s"(${dd("azz")} - ${dd("az")} * ${dd("az")} / $nD)"
      val cz1 = s"(${dd("az1")} - ${dd("az")} * ${dd("ax")} / $nD)"
      val cz2 = s"(${dd("az2")} - ${dd("az")} * ${dd("ax2")} / $nD)"
      val c11 = s"(${dd("ax2")} - ${dd("ax")} * ${dd("ax")} / $nD)"
      val c12 = s"(${dd("ax3")} - ${dd("ax")} * ${dd("ax2")} / $nD)"
      val c22 = s"(${dd("ax4")} - ${dd("ax2")} * ${dd("ax2")} / $nD)"
      val det = s"($c11 * $c22 - $c12 * $c12)"
      val b1 = s"(($cz1 * $c22 - $cz2 * $c12) / $det)"
      val b2 = s"(($cz2 * $c11 - $cz1 * $c12) / $det)"
      val r2 = s"(($b1 * $cz1 + $b2 * $cz2) / $czz)"
      val okc = s"n_days >= 4 AND $det > 0 AND $czz > 0"
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y,
              CAST(count(*) AS BIGINT) AS x
            FROM orders GROUP BY 1),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(y) AS BIGINT) AS sy,
              sum(CAST(x AS HUGEINT) * y) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx
            FROM daily),
      sc AS (SELECT $num / $den AS b,
               (CAST(sy AS DOUBLE) - $num / $den * sx) / n AS a
             FROM f),
      e AS (SELECT daily.x,
              CAST(round((CAST(daily.y AS DOUBLE) - sc.a - sc.b * daily.x)
                / 100.0, 0) AS BIGINT) AS e2
            FROM daily, sc),
      z AS (SELECT x, CAST(e2 AS HUGEINT) * e2 AS z FROM e),
      aux AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(x) AS BIGINT) AS ax,
              CAST(sum(x * x) AS BIGINT) AS ax2,
              sum(CAST(x AS HUGEINT) * x * x) AS ax3,
              sum(CAST(x AS HUGEINT) * x * x * x) AS ax4,
              sum(z) AS az,
              sum(z * x) AS az1,
              sum(z * x * x) AS az2,
              sum(z * z) AS azz
            FROM z)
      SELECT n_days,
             round(CASE WHEN $okc THEN $r2 END, 6) AS r2_aux,
             round(CASE WHEN $okc THEN $nD * $r2 END, 6) AS lm_stat,
             CASE WHEN $okc THEN $nD * $r2 > 5.991464547107979 END
               AS heteroskedastic
      FROM aux"""
    },


    // Engle-Granger: lattice OLS of revenue on volume, residuals on the
    // 1e-6 lattice (the DW trick), exact HUGEINT ADF(0) folds, MacKinnon
    // 5% critical literal -3.37
    "q_cointegration" -> {
      val num = "CAST(CAST(n AS HUGEINT) * sxy" +
        " - CAST(sx AS HUGEINT) * sy AS DOUBLE)"
      val den = "CAST(CAST(n AS HUGEINT) * sxx" +
        " - CAST(sx AS HUGEINT) * sx AS DOUBLE)"
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y,
              CAST(count(*) AS BIGINT) AS x
            FROM orders GROUP BY 1),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(y) AS BIGINT) AS sy,
              sum(CAST(x AS HUGEINT) * y) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx
            FROM daily),
      sc AS (SELECT n, $num / $den AS b,
               (CAST(sy AS DOUBLE) - $num / $den * sx) / n AS a
             FROM f),
      e AS (SELECT daily.d,
              CAST(round((CAST(daily.y AS DOUBLE) - sc.a - sc.b * daily.x)
                * 1e6, 0) AS BIGINT) AS eu
            FROM daily, sc),
      g AS (SELECT eu, lag(eu, 1) OVER (ORDER BY d) AS e1 FROM e),
      h AS (SELECT count(e1) AS np,
              sum(CASE WHEN e1 IS NOT NULL
                THEN CAST(e1 AS HUGEINT) * e1
                ELSE CAST(0 AS HUGEINT) END) AS s1,
              sum(CASE WHEN e1 IS NOT NULL
                THEN CAST(e1 AS HUGEINT) * (eu - e1)
                ELSE CAST(0 AS HUGEINT) END) AS s2,
              sum(CASE WHEN e1 IS NOT NULL
                THEN CAST(eu - e1 AS HUGEINT) * (eu - e1)
                ELSE CAST(0 AS HUGEINT) END) AS s3
            FROM g),
      t AS (SELECT np, s1, s2, s3,
              CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE) AS gamma,
              CAST(s3 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                / CAST(s1 AS DOUBLE) AS rss
            FROM h)
      SELECT (SELECT n FROM f) AS n_days,
             CAST(np AS BIGINT) AS n_pairs,
             round((SELECT b FROM sc), 6) AS beta,
             round(CASE WHEN s1 > 0 AND np >= 3 THEN gamma END, 6)
               AS gamma,
             round(CASE WHEN s1 > 0 AND np >= 3 AND rss > 0 THEN
               gamma / sqrt((rss / (CAST(np AS DOUBLE) - 1.0))
                 / CAST(s1 AS DOUBLE)) END, 6) AS adf_t,
             CASE WHEN s1 > 0 AND np >= 3 AND rss > 0 THEN
               gamma / sqrt((rss / (CAST(np AS DOUBLE) - 1.0))
                 / CAST(s1 AS DOUBLE)) < -3.37 END AS cointegrated
      FROM t"""
    },


    "q_durbin_watson" -> {
      val num = "CAST(CAST(n AS HUGEINT) * sty" +
        " - CAST(st AS HUGEINT) * sy AS DOUBLE)"
      val den = "CAST(CAST(n AS HUGEINT) * stt" +
        " - CAST(st AS HUGEINT) * st AS DOUBLE)"
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders GROUP BY 1),
      r AS (SELECT y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
            FROM daily),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(t) AS BIGINT) AS st,
              CAST(sum(y) AS BIGINT) AS sy,
              sum(CAST(t AS HUGEINT) * y) AS sty,
              CAST(sum(t * t) AS BIGINT) AS stt
            FROM r),
      sc AS (SELECT n, $num / $den AS b,
               (CAST(sy AS DOUBLE) - $num / $den * st) / n AS a
             FROM f),
      e AS (SELECT r.t,
              CAST(round((CAST(r.y AS DOUBLE) - sc.a - sc.b * r.t)
                * 1e6, 0) AS BIGINT) AS eu
            FROM r, sc),
      g AS (SELECT eu, eu - lag(eu, 1) OVER (ORDER BY t) AS de FROM e),
      h AS (SELECT sum(CAST(eu AS HUGEINT) * eu) AS see,
              sum(CASE WHEN de IS NOT NULL
                THEN CAST(de AS HUGEINT) * de
                ELSE CAST(0 AS HUGEINT) END) AS sdd
            FROM g)
      SELECT (SELECT n FROM f) AS n_days,
             CASE WHEN see > 0 THEN
               round(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE), 6)
             END AS dw_stat,
             CASE WHEN see > 0 THEN
               round(1.0 - CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
                 / 2.0, 6)
             END AS rho_approx
      FROM h"""
    },


    // runs test: exact sign moves on the centi lattice, ties dropped,
    // R / n+ / n- exact, one fixed z tree
    "q_runs_test" -> """
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS x
            FROM orders GROUP BY 1),
      mv AS (SELECT d,
               sign(CAST(x - lag(x, 1) OVER (ORDER BY d) AS DOUBLE)) AS s
             FROM daily),
      f AS (SELECT d, s, lag(s, 1) OVER (ORDER BY d) AS prev
            FROM mv WHERE s IS NOT NULL AND s <> 0.0),
      g AS (SELECT
              CAST(sum(CASE WHEN s = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_up,
              CAST(sum(CASE WHEN s = -1.0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_down,
              CAST(sum(CASE WHEN prev IS NULL OR s <> prev
                THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
            FROM f)
      SELECT n_up, n_down, n_runs,
        round(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
          / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) + 1.0, 6)
          AS expected_runs,
        CASE WHEN n_up > 0 AND n_down > 0 AND
          2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
            * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
              - CAST(n_up AS DOUBLE) - CAST(n_down AS DOUBLE))
            / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
              * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
              * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE) - 1.0))
            > 0
        THEN round((CAST(n_runs AS DOUBLE)
          - (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
            / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) + 1.0))
          / sqrt(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
            * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
              - CAST(n_up AS DOUBLE) - CAST(n_down AS DOUBLE))
            / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
              * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
              * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE) - 1.0))),
          6)
        END AS z_stat
      FROM g""",


    // Jarque-Bera: exact HUGEINT raw moments on the centi lattice,
    // central moments by the raw-moment identities in fixed trees
    "q_jarque_bera" -> """
      WITH b AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS x
                 FROM events),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS s1,
              sum(CAST(x AS HUGEINT) * x) AS s2,
              sum(CAST(x AS HUGEINT) * x * x) AS s3,
              sum(CAST(x AS HUGEINT) * x * x * x) AS s4
            FROM b),
      g AS (SELECT n, CAST(n AS DOUBLE) AS nd,
              CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
              CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
              CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
              CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
            FROM f),
      h AS (SELECT n, nd, m,
              r2 - m * m AS m2,
              r3 - 3.0 * m * r2 + 2.0 * m * m * m AS m3,
              r4 - 4.0 * m * r3 + 6.0 * (m * m) * r2
                - 3.0 * (m * m * m * m) AS m4
            FROM g),
      k AS (SELECT n, nd, m, m2,
              m3 / (m2 * sqrt(m2)) AS skew,
              m4 / (m2 * m2) - 3.0 AS kurt
            FROM h)
      SELECT n, round(m / 100.0, 6) AS mean,
             CASE WHEN m2 > 0 THEN round(skew, 6) END AS skewness,
             CASE WHEN m2 > 0 THEN round(kurt, 6) END
               AS excess_kurtosis,
             CASE WHEN m2 > 0 THEN
               round(nd / 6.0 * (skew * skew + kurt * kurt / 4.0), 6)
             END AS jb_stat
      FROM k""",


    // Hill tail exponent: centi-lattice top-(k+1) order stats, log-ratio
    // terms on the 1e-12 lattice, sqrt(k) as the shared literal
    "q_hill_tail" -> {
      val sqrtK = java.lang.Double.toString(math.sqrt(100.0))
      s"""
      WITH per AS (SELECT * FROM (
              SELECT o_custkey AS e,
                CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS c
              FROM orders GROUP BY 1) WHERE c > 0),
      r AS (SELECT e, c,
              CAST(row_number() OVER (ORDER BY c DESC, e) AS BIGINT) AS rn
            FROM per),
      xm AS (SELECT c AS xmin FROM r WHERE rn = 101),
      f AS (SELECT CAST(sum(CAST(round(
                ln(CAST(c AS DOUBLE) / xmin) * 1e12, 0) AS BIGINT))
                AS BIGINT) AS ts,
              CAST(max(xmin) AS BIGINT) AS xmin
            FROM r, xm WHERE rn <= 100),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_entities FROM per)
      SELECT n_entities, CAST(100 AS INTEGER) AS k,
             round(CAST(xmin AS DOUBLE) / 100.0, 2) AS xmin,
             round(100.0 / (CAST(ts AS DOUBLE) / 1e12), 6) AS alpha,
             round(100.0 / (CAST(ts AS DOUBLE) / 1e12) / $sqrtK, 6)
               AS alpha_se
      FROM f, n"""
    },


    // ABC classification: centi-lattice revenue, rank desc with key
    // tiebreak, exact cross-multiplied class boundaries at 80/95
    "q_abc_parts" -> """
      WITH per AS (SELECT l_partkey AS k,
              CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS c
            FROM lineitem GROUP BY 1),
      r AS (SELECT k, c,
              CAST(sum(c) OVER (ORDER BY c DESC, k
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
              CAST(sum(c) OVER () AS BIGINT) AS tot,
              CAST(count(*) OVER () AS BIGINT) AS nk
            FROM per),
      cl AS (SELECT *,
               CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                    WHEN cum * 100 <= tot * 95 THEN 'B'
                    ELSE 'C' END AS abc_class
             FROM r),
      g AS (SELECT abc_class, CAST(count(*) AS BIGINT) AS n_keys,
              CAST(sum(c) AS BIGINT) AS cc,
              CAST(max(tot) AS BIGINT) AS t,
              CAST(max(nk) AS BIGINT) AS nk
            FROM cl GROUP BY 1)
      SELECT abc_class, n_keys,
             round(CAST(n_keys AS DOUBLE) / nk, 6) AS key_share,
             round(CAST(cc AS DOUBLE) / 100.0, 2) AS class_revenue,
             round(CAST(cc AS DOUBLE) / t, 6) AS revenue_share
      FROM g ORDER BY abc_class""",


    // Kendall tau-b: exact integer pair kernel over the bounded day
    // table, tie-corrected denominator, one double tree
    "q_kendall_tau" -> """
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS b,
              CAST(count(*) AS BIGINT) AS x,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders GROUP BY 1),
      p AS (SELECT sign(CAST(r.x - l.x AS DOUBLE)) AS sx,
              sign(CAST(r.y - l.y AS DOUBLE)) AS sy
            FROM daily l JOIN daily r ON l.b < r.b),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(CASE WHEN sx * sy = 1.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS concordant,
              CAST(sum(CASE WHEN sx * sy = -1.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS discordant,
              CAST(sum(CASE WHEN sx = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                AS ties_x,
              CAST(sum(CASE WHEN sy = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                AS ties_y
            FROM p)
      SELECT n_pairs, concordant, discordant, ties_x, ties_y,
             CASE WHEN n_pairs > ties_x AND n_pairs > ties_y THEN
               round(CAST(concordant - discordant AS DOUBLE)
                 / sqrt(CAST(n_pairs - ties_x AS DOUBLE)
                   * CAST(n_pairs - ties_y AS DOUBLE)), 6)
             END AS tau_b
      FROM f""",


    // Cramér's V: joint counts exact, each OBSERVED cell's n·nxy²/(nx·ny)
    // term from one fixed double tree on the 1e-9 lattice; chi2 = Σ − n
    // (empty cells absorbed by the identity, never densified)
    "q_cramers_v" -> """
      WITH base AS (SELECT lang AS x, source AS y FROM documents
                    WHERE lang IS NOT NULL AND source IS NOT NULL),
      j AS (SELECT x, y, CAST(count(*) AS BIGINT) AS nxy
            FROM base GROUP BY x, y),
      m AS (SELECT x, y, nxy,
              CAST(sum(nxy) OVER () AS BIGINT) AS n,
              CAST(sum(nxy) OVER (PARTITION BY x) AS BIGINT) AS nx,
              CAST(sum(nxy) OVER (PARTITION BY y) AS BIGINT) AS ny
            FROM j),
      f AS (SELECT CAST(max(n) AS BIGINT) AS n,
              CAST(count(DISTINCT x) AS BIGINT) AS r,
              CAST(count(DISTINCT y) AS BIGINT) AS c,
              CAST(sum(CAST(round(
                  CAST(n AS DOUBLE) * CAST(nxy AS DOUBLE)
                    * CAST(nxy AS DOUBLE)
                    / (CAST(nx AS DOUBLE) * ny) * 1e9, 0)
                AS BIGINT)) AS BIGINT) / 1e9 AS traw
            FROM m),
      g AS (SELECT n, r, c,
              traw - CAST(n AS DOUBLE) AS chi2raw
            FROM f)
      SELECT n, r, c,
             CAST((r - 1) * (c - 1) AS INTEGER) AS dof,
             round(chi2raw, 6) AS chi2,
             round(sqrt(chi2raw / CAST(n AS DOUBLE)
               / least(CAST(r AS DOUBLE) - 1.0, CAST(c AS DOUBLE) - 1.0)),
               6) AS cramers_v,
             round(sqrt(greatest(0.0, chi2raw / CAST(n AS DOUBLE)
                 - (CAST(r AS DOUBLE) - 1.0) * (CAST(c AS DOUBLE) - 1.0)
                   / (CAST(n AS DOUBLE) - 1.0))
               / least(CAST(r AS DOUBLE) - (CAST(r AS DOUBLE) - 1.0)
                   * (CAST(r AS DOUBLE) - 1.0) / (CAST(n AS DOUBLE) - 1.0)
                   - 1.0,
                 CAST(c AS DOUBLE) - (CAST(c AS DOUBLE) - 1.0)
                   * (CAST(c AS DOUBLE) - 1.0) / (CAST(n AS DOUBLE) - 1.0)
                   - 1.0)), 6) AS cramers_v_corrected
      FROM g""",


    // Brown-Forsythe: exact interpolated group medians (quantile_cont ==
    // Spark percentile), |v-med| on the micro lattice, CASE-folded exact
    // sums, fixed left-to-right W combine (scale cancels in the ratio)
    "q_brown_forsythe" -> {
      val gs = Seq("click", "error", "purchase", "signup", "view")
      val caseCols = gs.zipWithIndex.map { case (g, i) =>
        s"""CAST(sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END) AS BIGINT)
               AS n$i,
             CAST(sum(CASE WHEN g = '$g' THEN zu ELSE 0 END) AS BIGINT)
               AS s$i,
             sum(CASE WHEN g = '$g'
                 THEN CAST(zu AS HUGEINT) * zu
                 ELSE CAST(0 AS HUGEINT) END) AS q$i""" }.mkString(",\n             ")
      val k = gs.size
      val grand = s"CAST(${gs.indices.map(i => s"s$i").mkString(" + ")}"
        .concat(s" AS DOUBLE) / CAST(n AS DOUBLE)")
      def mj(i: Int) = s"CAST(s$i AS DOUBLE) / CAST(n$i AS DOUBLE)"
      val num = gs.indices.map(i =>
        s"CAST(n$i AS DOUBLE) * (${mj(i)} - ($grand))"
          + s" * (${mj(i)} - ($grand))").mkString(" + ")
      val den = gs.indices.map(i => s"(CAST(q$i AS DOUBLE)"
        + s" - CAST(s$i AS DOUBLE) * s$i / CAST(n$i AS DOUBLE))")
        .mkString(" + ")
      val w = s"(CAST(n AS DOUBLE) - $k.0) / ${k - 1}.0 * ($num) / ($den)"
      val nCols = gs.zipWithIndex
        .map { case (g, i) => s"n$i AS n_$g" }.mkString(", ")
      s"""
      WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND value IS NOT NULL),
      med AS (SELECT g, quantile_cont(v, 0.5) AS med FROM base GROUP BY g),
      z AS (SELECT b.g,
              CAST(round(abs(b.v - m.med) * 1e6, 0) AS BIGINT) AS zu
            FROM base b JOIN med m ON b.g = m.g),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
             $caseCols
            FROM z)
      SELECT n, $nCols,
             round($w, 6) AS w_stat,
             CAST(${k - 1} AS INTEGER) AS df1,
             n - $k AS df2
      FROM f"""
    },


    // Kitagawa/Bennet decomposition: exact shares/rates, fixed trees,
    // totals folded on the 1e-12 lattice
    "q_rate_decomposition" -> {
      val sh1 = "CAST(n1 AS DOUBLE) / t1"
      val sh2 = "CAST(n2 AS DOUBLE) / t2"
      val r1 = "CASE WHEN n1 > 0 THEN CAST(p1 AS DOUBLE) / n1 ELSE 0.0 END"
      val r2 = "CASE WHEN n2 > 0 THEN CAST(p2 AS DOUBLE) / n2 ELSE 0.0 END"
      val mix = s"($sh2 - $sh1) * (($r1 + $r2) / 2.0)"
      val rate = s"(($sh1 + $sh2) / 2.0) * ($r2 - $r1)"
      val chg = s"$sh2 * ($r2) - $sh1 * ($r1)"
      s"""
      WITH seg AS (SELECT event_type AS segment,
              CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                AND value > 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS p1,
              CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                THEN 1 ELSE 0 END) AS BIGINT) AS n2,
              CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                AND value > 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS p2
            FROM events WHERE event_type IS NOT NULL
            GROUP BY 1),
      w AS (SELECT *, CAST(sum(n1) OVER () AS BIGINT) AS t1,
              CAST(sum(n2) OVER () AS BIGINT) AS t2
            FROM seg)
      SELECT segment,
             round($sh1, 6) AS share_pre,
             round($sh2, 6) AS share_post,
             round($r1, 6) AS rate_pre,
             round($r2, 6) AS rate_post,
             round($mix, 6) AS mix_effect,
             round($rate, 6) AS rate_effect,
             round(CAST(sum(CAST(round(($mix) * 1e12, 0) AS BIGINT))
               OVER () AS BIGINT) / 1e12, 6) AS total_mix_effect,
             round(CAST(sum(CAST(round(($rate) * 1e12, 0) AS BIGINT))
               OVER () AS BIGINT) / 1e12, 6) AS total_rate_effect,
             round(CAST(sum(CAST(round(($chg) * 1e12, 0) AS BIGINT))
               OVER () AS BIGINT) / 1e12, 6) AS total_change
      FROM w ORDER BY segment"""
    },


    // CUPED: centi-lattice pre/post user totals, theta from exact
    // HUGEINT sufficient sums (one double division), per-user adjusted
    // outcome on the 1e-6 lattice, arm folds + pooled variances exact
    "q_cuped" -> s"""
      WITH u AS (SELECT user_id,
               CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN
                 CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
                 AS BIGINT) AS x,
               CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN
                 CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END)
                 AS BIGINT) AS y
             FROM events GROUP BY user_id),
      a AS (SELECT x, y, ${uk("user_id", 59)} > 0.5 AS t FROM u),
      tf AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx
             FROM a),
      th AS (SELECT n, sx,
               CASE WHEN CAST(CAST(n AS HUGEINT) * sxx
                   - CAST(sx AS HUGEINT) * sx AS DOUBLE) > 0 THEN
                 CAST(CAST(n AS HUGEINT) * sxy
                   - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * sxx
                   - CAST(sx AS HUGEINT) * sx AS DOUBLE)
               ELSE 0.0 END AS theta,
               CAST(sx AS DOUBLE) / n AS xbar
             FROM tf),
      adj AS (SELECT a.t, a.y,
                CAST(round((CAST(a.y AS DOUBLE) - th.theta
                  * (CAST(a.x AS DOUBLE) - th.xbar)) * 1e6, 0)
                  AS BIGINT) AS yadj,
                th.theta
              FROM a, th),
      f AS (SELECT max(theta) AS th,
              CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT)
                AS n_control,
              CAST(count(CASE WHEN t THEN 1 END) AS BIGINT)
                AS n_treatment,
              CAST(sum(CASE WHEN NOT t THEN y END) AS BIGINT) AS yc,
              CAST(sum(CASE WHEN t THEN y END) AS BIGINT) AS yt,
              CAST(sum(CASE WHEN NOT t THEN yadj END) AS BIGINT) AS ac,
              CAST(sum(CASE WHEN t THEN yadj END) AS BIGINT) AS att,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(y) AS BIGINT) AS sy,
              sum(CAST(y AS HUGEINT) * y) AS syy,
              CAST(sum(yadj) AS BIGINT) AS sa,
              sum(CAST(yadj AS HUGEINT) * yadj) AS saa
            FROM adj)
      SELECT n_control, n_treatment,
             round(th, 6) AS theta,
             round(CAST(yc AS DOUBLE) / n_control / 100.0, 6)
               AS mean_raw_control,
             round(CAST(yt AS DOUBLE) / n_treatment / 100.0, 6)
               AS mean_raw_treatment,
             round(CAST(yt AS DOUBLE) / n_treatment / 100.0
               - CAST(yc AS DOUBLE) / n_control / 100.0, 6) AS raw_lift,
             round(CAST(ac AS DOUBLE) / n_control / 1e8, 6)
               AS mean_adj_control,
             round(CAST(att AS DOUBLE) / n_treatment / 1e8, 6)
               AS mean_adj_treatment,
             round(CAST(att AS DOUBLE) / n_treatment / 1e8
               - CAST(ac AS DOUBLE) / n_control / 1e8, 6) AS adj_lift,
             CASE WHEN CAST(CAST(n AS HUGEINT) * syy
                 - CAST(sy AS HUGEINT) * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n) > 0 THEN
               round(1.0 - CAST(CAST(n AS HUGEINT) * saa
                   - CAST(sa AS HUGEINT) * sa AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n) / 1e12
                 / (CAST(CAST(n AS HUGEINT) * syy
                   - CAST(sy AS HUGEINT) * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n)), 6)
             END AS var_reduction
      FROM f""",


    // Odds ratio / relative risk: exact 2x2 cells, fixed double trees,
    // z = 1.959964 shared verbatim, ln/exp/sqrt on the parity precedent
    // Decision stump: ntile bins, exact cumulative class counts, Gini
    // trees on exact longs, winner elected on the 1e-12 gain lattice
    "q_decision_stump" -> {
      def g(p: String, n: String) =
        s"2.0 * CAST($p AS DOUBLE) / CAST($n AS DOUBLE)" +
          s" * (1.0 - CAST($p AS DOUBLE) / CAST($n AS DOUBLE))"
      val gp = g("pt", "nt")
      val gl = g("pl", "nl")
      val gr = g("pr", "nr")
      val a = "CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE)"
      val b2 = "CAST(nr AS DOUBLE) / CAST(nt AS DOUBLE)"
      s"""
      WITH buyers AS (SELECT DISTINCT o_custkey FROM orders),
      base AS (SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS f,
                 (b.o_custkey IS NOT NULL) AS y
               FROM customer LEFT JOIN buyers b ON c_custkey = b.o_custkey),
      binned AS (SELECT ntile(10) OVER (ORDER BY f, k) AS b, f, y
                 FROM base),
      per AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
                max(f) AS thr
              FROM binned GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                CAST(sum(p) AS BIGINT) AS pt
              FROM per),
      cum AS (SELECT b, thr,
                CAST(sum(n) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
                CAST(sum(p) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS pl
              FROM per),
      cand AS (SELECT c.b, c.thr, c.nl, c.pl,
                 t.nt - c.nl AS nr, t.pt - c.pl AS pr, t.nt, t.pt
               FROM cum c, tot t WHERE c.b < 10),
      gains AS (SELECT b, thr, nl, pl, nr, pr,
                  $gp - ($a * ($gl) + $b2 * ($gr)) AS gn,
                  $gl AS gleft, $gr AS gright
                FROM cand),
      glat AS (SELECT *, CAST(round(gn * 1e12, 0) AS BIGINT) AS gz
               FROM gains),
      best AS (SELECT b AS bb FROM glat ORDER BY gz DESC, b LIMIT 1)
      SELECT b AS split_bin, round(thr, 6) AS threshold,
             nl AS n_left, pl AS pos_left, nr AS n_right, pr AS pos_right,
             round(gleft, 6) AS gini_left, round(gright, 6) AS gini_right,
             round(gn, 6) AS gini_gain,
             (b = (SELECT bb FROM best)) AS is_best
      FROM glat ORDER BY split_bin"""
    },

    // Binned stump: fixed-width lattice bins (OracleShared.binExpr)
    // replace the ntile global sort; split candidates = every present
    // bin but the last
    "q_decision_stump_binned" -> {
      def g(p: String, n: String) =
        s"2.0 * CAST($p AS DOUBLE) / CAST($n AS DOUBLE)" +
          s" * (1.0 - CAST($p AS DOUBLE) / CAST($n AS DOUBLE))"
      val gp = g("pt", "nt")
      val gl = g("pl", "nl")
      val gr = g("pr", "nr")
      val a = "CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE)"
      val b2 = "CAST(nr AS DOUBLE) / CAST(nt AS DOUBLE)"
      s"""
      WITH buyers AS (SELECT DISTINCT o_custkey FROM orders),
      base AS (SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS f,
                 (b.o_custkey IS NOT NULL) AS y
               FROM customer LEFT JOIN buyers b ON c_custkey = b.o_custkey),
      lat AS (SELECT y, f, CAST(round(f * 100, 0) AS BIGINT) AS vl
              FROM base WHERE f IS NOT NULL AND NOT isnan(f)),
      bnd AS (SELECT min(vl) AS lo, max(vl) AS hi FROM lat),
      binned AS (SELECT y, f, ${binExpr("vl", "lo", "hi", 256)} AS b
                 FROM lat, bnd),
      per AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
                max(f) AS thr
              FROM binned GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                CAST(sum(p) AS BIGINT) AS pt
              FROM per),
      bm AS (SELECT max(b) AS mb FROM per),
      cum AS (SELECT b, thr,
                CAST(sum(n) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS nl,
                CAST(sum(p) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS pl
              FROM per),
      cand AS (SELECT c.b, c.thr, c.nl, c.pl,
                 t.nt - c.nl AS nr, t.pt - c.pl AS pr, t.nt, t.pt
               FROM cum c, tot t WHERE c.b < (SELECT mb FROM bm)),
      gains AS (SELECT b, thr, nl, pl, nr, pr,
                  $gp - ($a * ($gl) + $b2 * ($gr)) AS gn,
                  $gl AS gleft, $gr AS gright
                FROM cand),
      glat AS (SELECT *, CAST(round(gn * 1e12, 0) AS BIGINT) AS gz
               FROM gains),
      best AS (SELECT b AS bb FROM glat ORDER BY gz DESC, b LIMIT 1)
      SELECT b AS split_bin, round(thr, 6) AS threshold,
             nl AS n_left, pl AS pos_left, nr AS n_right, pr AS pos_right,
             round(gleft, 6) AS gini_left, round(gright, 6) AS gini_right,
             round(gn, 6) AS gini_gain,
             (b = (SELECT bb FROM best)) AS is_best
      FROM glat ORDER BY split_bin"""
    },


    // Cochran-Armitage trend: exact integer sufficient statistics over
    // acctbal deciles (same ntile fill rule both engines), one fixed
    // double tree per test column
    "q_cochran_armitage" -> {
      val nD = "CAST(n AS DOUBLE)"
      val p = s"CAST(successes AS DOUBLE) / $nD"
      val tD = "CAST(t AS DOUBLE)"
      val e = s"($p) * CAST(sn1 AS DOUBLE)"
      val sxx = s"(CAST(sn2 AS DOUBLE) - CAST(sn1 AS DOUBLE) * sn1 / $nD)"
      val varT = s"(($p) * (1.0 - ($p)) * $sxx)"
      s"""
      WITH scored AS (SELECT c_custkey,
               ntile(10) OVER (ORDER BY c_acctbal, c_custkey) - 1 AS s
            FROM customer),
      buyers AS (SELECT DISTINCT o_custkey FROM orders),
      base AS (SELECT CAST(s AS BIGINT) AS s,
                 (b.o_custkey IS NOT NULL) AS y
               FROM scored LEFT JOIN buyers b ON c_custkey = b.o_custkey),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                AS successes,
              CAST(count(DISTINCT s) AS BIGINT) AS n_groups,
              CAST(sum(CASE WHEN y THEN s ELSE 0 END) AS BIGINT) AS t,
              CAST(sum(s) AS BIGINT) AS sn1,
              CAST(sum(s * s) AS BIGINT) AS sn2
            FROM base)
      SELECT n, successes, n_groups, t AS t_stat,
             round(CASE WHEN $varT > 0
               THEN ($tD - $e) / sqrt($varT) END, 6) AS z,
             round(CASE WHEN $varT > 0
               THEN ($tD - $e) * ($tD - $e) / $varT END, 6) AS chi2_trend,
             round(CASE WHEN $sxx > 0
               THEN ($tD - $e) / $sxx END, 6) AS prop_slope
      FROM f"""
    },


    // Fisher exact: bounded hypergeometric support, consecutive-term
    // log-ratio recurrence in ONE ordered window, max-shifted
    // normalization — no factorials, every float chain order-fixed
    "q_fisher_exact" -> {
      val kD = "CAST(k AS DOUBLE)"
      val r1D = "CAST(r1 AS DOUBLE)"; val r2D = "CAST(r2 AS DOUBLE)"
      val c1D = "CAST(c1 AS DOUBLE)"
      val lr = s"(CASE WHEN k > kmin THEN ln(($r1D - $kD + 1.0)" +
        s" * ($c1D - $kD + 1.0) / ($kD * ($r2D - $c1D + $kD)))" +
        s" ELSE 0.0 END)"
      val cum = "ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING" +
        " AND CURRENT ROW"
      s"""
      WITH u AS (SELECT o_orderkey,
              max(CAST(o_orderpriority = '1-URGENT' AS INT)) AS e,
              max(CAST(o_orderstatus = 'F' AS INT)) AS o
            FROM orders WHERE o_totalprice > 400000.0
            GROUP BY o_orderkey),
      cells AS (SELECT
              CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
              CAST(sum(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS b,
              CAST(sum(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS c,
              CAST(sum(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS d
            FROM u),
      m AS (SELECT *, a + b AS r1, c + d AS r2, a + c AS c1,
              greatest(CAST(0 AS BIGINT), (a + c) - (c + d)) AS kmin,
              least(a + b, a + c) AS kmax
            FROM cells),
      series AS (SELECT m.*, unnest(range(kmin, kmax + 1)) AS k FROM m),
      sc AS (SELECT *,
              sum($lr) OVER ($cum) AS L
            FROM series),
      sc2 AS (SELECT *, exp(L - max(L) OVER ()) AS w FROM sc),
      sc3 AS (SELECT *,
              max(CASE WHEN k = a THEN w END) OVER () AS wa,
              sum(w) OVER ($cum) AS cumw
            FROM sc2),
      sc4 AS (SELECT *,
              sum(CASE WHEN w <= wa * (1.0 + 1e-7) THEN w ELSE 0.0 END)
                OVER ($cum) AS cumt
            FROM sc3),
      f AS (SELECT CAST(max(a) AS BIGINT) AS n_exposed_pos,
              CAST(max(b) AS BIGINT) AS n_exposed_neg,
              CAST(max(c) AS BIGINT) AS n_unexposed_pos,
              CAST(max(d) AS BIGINT) AS n_unexposed_neg,
              max(cumw) AS tot, max(cumt) AS tott,
              max(CASE WHEN k = a THEN cumw END) AS cwa,
              max(CASE WHEN k = a THEN w END) AS wobs
            FROM sc4)
      SELECT n_exposed_pos, n_exposed_neg, n_unexposed_pos,
             n_unexposed_neg,
             round(least(tott / tot, 1.0), 6) AS p_two_sided,
             round(cwa / tot, 6) AS p_left,
             round(1.0 - cwa / tot + wobs / tot, 6) AS p_right,
             round(CASE WHEN n_exposed_neg > 0 AND n_unexposed_pos > 0
               THEN CAST(n_exposed_pos AS DOUBLE)
                 * CAST(n_unexposed_neg AS DOUBLE)
                 / (CAST(n_exposed_neg AS DOUBLE)
                   * CAST(n_unexposed_pos AS DOUBLE)) END, 6)
               AS odds_ratio
      FROM f"""
    },

    // CMH: per-stratum 2x2 cells, rational terms committed to the 1e-6
    // lattice per stratum (exact HUGEINT fold across strata), RBG CI
    "q_mantel_haenszel" -> {
      val aD = "CAST(a AS DOUBLE)"; val bD = "CAST(b AS DOUBLE)"
      val cD = "CAST(c AS DOUBLE)"; val dD = "CAST(d AS DOUBLE)"
      val nD = s"($aD + $bD + $cD + $dD)"
      val eI = s"(($aD + $bD) * ($aD + $cD) / $nD)"
      val vI = s"(CASE WHEN $nD > 1.0 THEN ($aD + $bD) * ($cD + $dD)" +
        s" * ($aD + $cD) * ($bD + $dD) / ($nD * $nD * ($nD - 1.0))" +
        s" ELSE 0.0 END)"
      val rI = s"($aD * $dD / $nD)"
      val sI = s"($bD * $cD / $nD)"
      val pI = s"(($aD + $dD) / $nD)"
      val qI = s"(($bD + $cD) / $nD)"
      def lat(t: String) = s"CAST(round($t * 1e6, 0) AS BIGINT)"
      val sumA = "CAST(n_exposed_pos AS DOUBLE)"
      val sE = "(CAST(se AS DOUBLE) / 1e6)"
      val sV = "(CAST(sv AS DOUBLE) / 1e6)"
      val sR = "(CAST(sr AS DOUBLE) / 1e6)"
      val sS = "(CAST(ss AS DOUBLE) / 1e6)"
      val sPR = "(CAST(spr AS DOUBLE) / 1e6)"
      val sPSQR = "(CAST(spsqr AS DOUBLE) / 1e6)"
      val sQS = "(CAST(sqs AS DOUBLE) / 1e6)"
      val gap = s"(abs($sumA - $sE) - 0.5)"
      val chi2 = s"(greatest($gap, 0.0) * greatest($gap, 0.0) / $sV)"
      val mhOr = s"($sR / $sS)"
      val seLn = s"sqrt($sPR / (2.0 * $sR * $sR)" +
        s" + $sPSQR / (2.0 * $sR * $sS) + $sQS / (2.0 * $sS * $sS))"
      val crude = s"($sumA * CAST(n_unexposed_neg AS DOUBLE)" +
        s" / (CASE WHEN n_exposed_neg > 0 AND n_unexposed_pos > 0" +
        s" THEN CAST(n_exposed_neg AS DOUBLE) * n_unexposed_pos END))"
      val ok = s"$sV > 0 AND $sR > 0 AND $sS > 0"
      val z = "1.959964"
      s"""
      WITH b0 AS (SELECT o_orderpriority AS s,
              CAST(o_totalprice > 150000.0 AS INT) AS e,
              CAST(o_orderstatus = 'F' AS INT) AS o
            FROM orders WHERE o_orderpriority IS NOT NULL),
      cells AS (SELECT s,
              CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
              CAST(sum(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS b,
              CAST(sum(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS c,
              CAST(sum(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS d
            FROM b0 GROUP BY 1),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
              CAST(sum(a) AS BIGINT) AS n_exposed_pos,
              CAST(sum(b) AS BIGINT) AS n_exposed_neg,
              CAST(sum(c) AS BIGINT) AS n_unexposed_pos,
              CAST(sum(d) AS BIGINT) AS n_unexposed_neg,
              sum(CAST(${lat(eI)} AS HUGEINT)) AS se,
              sum(CAST(${lat(vI)} AS HUGEINT)) AS sv,
              sum(CAST(${lat(rI)} AS HUGEINT)) AS sr,
              sum(CAST(${lat(sI)} AS HUGEINT)) AS ss,
              sum(CAST(${lat(s"($pI * $rI)")} AS HUGEINT)) AS spr,
              sum(CAST(${lat(s"($pI * $sI + $qI * $rI)")} AS HUGEINT))
                AS spsqr,
              sum(CAST(${lat(s"($qI * $sI)")} AS HUGEINT)) AS sqs
            FROM cells)
      SELECT n_strata, n_exposed_pos, n_exposed_neg, n_unexposed_pos,
             n_unexposed_neg,
             round(CASE WHEN $ok THEN $chi2 END, 6) AS cmh_chi2,
             round(CASE WHEN $ok THEN $mhOr END, 6) AS mh_odds_ratio,
             round(CASE WHEN $ok
               THEN exp(ln($mhOr) - $z * $seLn) END, 6) AS or_ci_lo,
             round(CASE WHEN $ok
               THEN exp(ln($mhOr) + $z * $seLn) END, 6) AS or_ci_hi,
             round($crude, 6) AS crude_odds_ratio
      FROM f"""
    },

    // Poisson rate test: four exact counts from one fold, Wald z on the
    // log rate ratio + the conditional binomial z, shared z literal
    "q_poisson_rate" -> {
      val xa = "CAST(n_events_a AS DOUBLE)"
      val ta = "CAST(n_exposure_a AS DOUBLE)"
      val xb = "CAST(n_events_b AS DOUBLE)"
      val tb = "CAST(n_exposure_b AS DOUBLE)"
      val rr = s"(($xa / $ta) / ($xb / $tb))"
      val seLn = s"sqrt(1.0 / $xa + 1.0 / $xb)"
      val p = s"($ta / ($ta + $tb))"
      val zCond = s"(($xa - ($xa + $xb) * $p)" +
        s" / sqrt(($xa + $xb) * $p * (1.0 - $p)))"
      val ok = "n_events_a > 0 AND n_events_b > 0" +
        " AND n_exposure_a > 0 AND n_exposure_b > 0"
      val z = "1.959964"
      s"""
      WITH base AS (SELECT CASE WHEN ts < TIMESTAMP '2024-01-16'
               THEN 'pre' ELSE 'post' END AS g,
              CAST(event_type = 'error' AS INT) AS x
            FROM events),
      f AS (SELECT
              CAST(sum(CASE WHEN g = 'pre' THEN CAST(x AS BIGINT)
                ELSE 0 END) AS BIGINT) AS n_events_a,
              CAST(sum(CASE WHEN g = 'pre' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_exposure_a,
              CAST(sum(CASE WHEN g = 'post' THEN CAST(x AS BIGINT)
                ELSE 0 END) AS BIGINT) AS n_events_b,
              CAST(sum(CASE WHEN g = 'post' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_exposure_b
            FROM base)
      SELECT n_events_a, n_exposure_a, n_events_b, n_exposure_b,
             round(CASE WHEN $ok THEN $xa / $ta END, 6) AS rate_a,
             round(CASE WHEN $ok THEN $xb / $tb END, 6) AS rate_b,
             round(CASE WHEN $ok THEN $rr END, 6) AS rate_ratio,
             round(CASE WHEN $ok
               THEN exp(ln($rr) - $z * $seLn) END, 6) AS rr_ci_lo,
             round(CASE WHEN $ok
               THEN exp(ln($rr) + $z * $seLn) END, 6) AS rr_ci_hi,
             round(CASE WHEN $ok THEN ln($rr) / $seLn END, 6) AS z_wald,
             round(CASE WHEN $ok THEN $zCond END, 6) AS z_conditional
      FROM f"""
    },

    "q_odds_ratio" -> {
      val a = "CAST(n_exposed_pos AS DOUBLE)"
      val b = "CAST(n_exposed_neg AS DOUBLE)"
      val c = "CAST(n_unexposed_pos AS DOUBLE)"
      val d = "CAST(n_unexposed_neg AS DOUBLE)"
      val or = s"$a * $d / ($b * $c)"
      val seOr = s"sqrt(1.0 / $a + 1.0 / $b + 1.0 / $c + 1.0 / $d)"
      val rr = s"($a / ($a + $b)) / ($c / ($c + $d))"
      val seRr = s"sqrt(1.0 / $a - 1.0 / ($a + $b) + 1.0 / $c" +
        s" - 1.0 / ($c + $d))"
      val ok = "n_exposed_pos > 0 AND n_exposed_neg > 0 AND " +
        "n_unexposed_pos > 0 AND n_unexposed_neg > 0"
      s"""
      WITH u AS (SELECT user_id,
               max(CASE WHEN event_type = 'error' AND value > 160.0
                 THEN 1 ELSE 0 END) AS e,
               max(CASE WHEN event_type = 'purchase' AND value > 175.0
                 THEN 1 ELSE 0 END) AS o
             FROM events GROUP BY user_id),
      f AS (SELECT
              CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exposed_pos,
              CAST(sum(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exposed_neg,
              CAST(sum(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unexposed_pos,
              CAST(sum(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unexposed_neg
            FROM u)
      SELECT n_exposed_pos, n_exposed_neg, n_unexposed_pos,
             n_unexposed_neg,
             CASE WHEN $ok THEN round($or, 6) END AS odds_ratio,
             CASE WHEN $ok THEN
               round(exp(ln($or) - 1.959964 * $seOr), 6) END AS or_ci_lo,
             CASE WHEN $ok THEN
               round(exp(ln($or) + 1.959964 * $seOr), 6) END AS or_ci_hi,
             CASE WHEN $ok THEN round($rr, 6) END AS relative_risk,
             CASE WHEN $ok THEN
               round(exp(ln($rr) - 1.959964 * $seRr), 6) END AS rr_ci_lo,
             CASE WHEN $ok THEN
               round(exp(ln($rr) + 1.959964 * $seRr), 6) END AS rr_ci_hi
      FROM f"""
    },


    // tier migration: centi-lattice weekly spend, declared tier CASE in
    // the same descending order as the Spark when-chain, week+7 join,
    // churned via left join
    "q_tier_migration" -> """
      WITH weekly AS (SELECT user_id AS k,
              CAST(date_trunc('week', ts) AS DATE) AS w,
              CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                AS cents
            FROM events GROUP BY 1, 2),
      t AS (SELECT k, w,
              CASE WHEN cents >= 120000 THEN 'high'
                   WHEN cents >= 50000 THEN 'mid'
                   WHEN cents >= 0 THEN 'low'
                   ELSE 'low' END AS tier
            FROM weekly),
      cur AS (SELECT c.k, c.w, c.tier
              FROM t c, (SELECT max(w) AS maxw FROM t) mx
              WHERE c.w < mx.maxw),
      mv AS (SELECT cur.w AS week_from, cur.tier AS tier_from,
               coalesce(n.tier, 'churned') AS tier_to
             FROM cur LEFT JOIN t n
               ON cur.k = n.k AND cur.w + 7 = n.w),
      g AS (SELECT week_from, tier_from, tier_to,
              CAST(count(*) AS BIGINT) AS n_entities
            FROM mv GROUP BY 1, 2, 3)
      SELECT week_from, tier_from, tier_to, n_entities,
             round(CAST(n_entities AS DOUBLE)
               / CAST(sum(n_entities) OVER (PARTITION BY week_from,
                   tier_from) AS DOUBLE), 6) AS cohort_share
      FROM g ORDER BY 1, 2, 3""",


    // McNemar: user-grain paired binary table — pure long ratios, no
    // float sum anywhere
    "q_mcnemar" -> """
      WITH u AS (SELECT user_id,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
             FROM events GROUP BY user_id),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
              CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_both,
              CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a_only,
              CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b_only,
              CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_neither
            FROM u)
      SELECT n_users, n_both, n_a_only, n_b_only, n_neither,
        CASE WHEN n_a_only + n_b_only > 0 THEN
          round((CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))
            * (CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))
            / (CAST(n_a_only AS DOUBLE) + CAST(n_b_only AS DOUBLE)), 6)
        END AS chi2,
        CASE WHEN n_a_only + n_b_only > 0 THEN
          round((abs(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))
              - 1.0)
            * (abs(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))
              - 1.0)
            / (CAST(n_a_only AS DOUBLE) + CAST(n_b_only AS DOUBLE)), 6)
        END AS chi2_corrected,
        CASE WHEN n_b_only > 0 THEN
          round(CAST(n_a_only AS DOUBLE) / CAST(n_b_only AS DOUBLE), 6)
        END AS discordant_odds
      FROM f""",


    // weighted lower median: integral weights, exact 2*cumw >= total
    // election at the distinct-value grain
    "q_weighted_median" -> """
      WITH pv AS (SELECT l_returnflag AS g,
              CAST(l_extendedprice AS DOUBLE) AS v,
              CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
                AS w
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
            GROUP BY 1, 2),
      p2 AS (SELECT * FROM pv WHERE w > 0),
      c AS (SELECT g, v,
              CAST(sum(w) OVER (PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cw,
              CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS tot
            FROM p2)
      SELECT g AS l_returnflag,
             CAST(max(tot) AS BIGINT) AS total_weight,
             round(min(v), 6) AS weighted_median
      FROM c WHERE cw * 2 >= tot
      GROUP BY g ORDER BY l_returnflag""",


    // Cliff's delta: dominance counts from the distinct-value table
    // (per-value counts x other side's strict cumulative), exact longs
    "q_cliffs_delta" -> """
      WITH pv AS (SELECT CAST(value AS DOUBLE) AS v,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS ca,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS cb
            FROM events
            WHERE event_type IN ('purchase', 'view')
              AND value IS NOT NULL
            GROUP BY 1),
      w AS (SELECT ca, cb,
              CAST(coalesce(sum(cb) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS b_below,
              CAST(sum(cb) OVER () AS BIGINT) AS b_tot
            FROM pv),
      f AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
              CAST(max(b_tot) AS BIGINT) AS n_b,
              CAST(sum(ca * b_below) AS BIGINT) AS gt,
              CAST(sum(ca * (b_tot - b_below - cb)) AS BIGINT) AS lt,
              CAST(sum(ca * cb) AS BIGINT) AS eq
            FROM w)
      SELECT n_a, n_b, gt AS n_greater, lt AS n_less, eq AS n_ties,
             round(CAST(gt - lt AS DOUBLE)
               / CAST(n_a * n_b AS DOUBLE), 6) AS cliffs_delta,
             round((CAST(gt AS DOUBLE) + 0.5 * eq)
               / CAST(n_a * n_b AS DOUBLE), 6) AS p_superior
      FROM f""",


    // Friedman: complete day-blocks only, exact within-day 2x-midranks
    // (rank + tie count), CASE-folded rank sums, fixed chi2 chain
    "q_friedman" -> {
      val gs = Seq("click", "error", "purchase", "signup", "view")
      val k = gs.size
      val caseCols = gs.zipWithIndex.map { case (g, i) =>
        s"""CAST(sum(CASE WHEN g = '$g' THEN r2 ELSE 0 END) AS BIGINT)
               AS s$i""" }.mkString(",\n             ")
      val s2 = gs.indices.map(i => s"CAST(s$i AS DOUBLE) * s$i")
        .mkString(" + ")
      val nd = "CAST(n_days AS DOUBLE)"
      val chi2 = s"3.0 / ($nd * $k.0 * ${k + 1}.0) * ($s2)" +
        s" - 3.0 * $nd * ${k + 1}.0"
      val sCols = gs.zipWithIndex
        .map { case (g, i) => s"s$i AS ranksum2_$g" }.mkString(", ")
      s"""
      WITH base AS (SELECT CAST(ts AS DATE) AS d, event_type AS g,
              CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                AS x
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
            GROUP BY 1, 2),
      c AS (SELECT d, g, x, count(*) OVER (PARTITION BY d) AS cnt
            FROM base),
      r AS (SELECT d, g,
              CAST(2 * (rank() OVER (PARTITION BY d ORDER BY x) - 1)
                + count(*) OVER (PARTITION BY d, x) + 1 AS BIGINT) AS r2
            FROM c WHERE cnt = $k),
      f AS (SELECT
             $caseCols,
             CAST(count(*) / $k AS BIGINT) AS n_days
            FROM r)
      SELECT n_days, $sCols,
             round($chi2, 6) AS chi2_f,
             CAST(${k - 1} AS INTEGER) AS df,
             round(($chi2) / ($nd * ${k - 1}.0), 6) AS kendalls_w
      FROM f"""
    },


    "q_kruskal_wallis" -> {
      val gs = Seq("click", "error", "purchase", "signup", "view")
      val caseCols = gs.zipWithIndex.map { case (g, i) =>
        s"""CAST(sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END) AS BIGINT)
               AS n$i,
             CAST(sum(CASE WHEN g = '$g' THEN r2 ELSE 0 END) AS BIGINT)
               AS s$i""" }.mkString(",\n             ")
      val hTerms = gs.indices
        .map(i => s"CAST(s$i AS DOUBLE) * s$i / n$i").mkString(" + ")
      val nn = "CAST(n AS DOUBLE)"
      val tie = s"1.0 - CAST(tsum AS DOUBLE) / ($nn * $nn * $nn - $nn)"
      val h = s"3.0 / ($nn * ($nn + 1.0)) * ($hTerms) - 3.0 * ($nn + 1.0)"
      val nCols = gs.zipWithIndex
        .map { case (g, i) => s"n$i AS n_$g" }.mkString(", ")
      s"""
      WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND value IS NOT NULL),
      pv AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY v),
      r AS (SELECT v, CAST(2 * coalesce(sum(n) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + n + 1 AS BIGINT) AS r2 FROM pv),
      j AS (SELECT b.g, r.r2 FROM base b JOIN r ON b.v = r.v),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
             $caseCols
            FROM j),
      t AS (SELECT CAST(coalesce(sum(n * n * n - n), 0) AS BIGINT) AS tsum
            FROM pv)
      SELECT n, $nCols,
             round($h, 6) AS h,
             round($tie, 6) AS tie_correction,
             round(($h) / ($tie), 6) AS h_adjusted,
             CAST(${gs.size - 1} AS INTEGER) AS df
      FROM f, t"""
    },


    // One-way ANOVA: lattice-exact sufficient statistics, then F /
    // eta2 / omega2 / Welch as the SAME fixed double trees the Spark
    // side folds (scale cancels in every ratio)
    "q_anova" -> {
      val gs = Seq("click", "error", "purchase", "signup", "view")
      val k = gs.size
      val caseCols = gs.zipWithIndex.map { case (g, i) =>
        s"""CAST(sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END) AS BIGINT)
               AS n$i,
             CAST(sum(CASE WHEN g = '$g' THEN vu ELSE 0 END) AS BIGINT)
               AS s$i,
             sum(CASE WHEN g = '$g'
                 THEN CAST(vu AS HUGEINT) * vu
                 ELSE CAST(0 AS HUGEINT) END) AS q$i""" }
        .mkString(",\n             ")
      val nD = "CAST(n AS DOUBLE)"
      def njD(i: Int) = s"CAST(n$i AS DOUBLE)"
      def mj(i: Int) = s"CAST(s$i AS DOUBLE) / CAST(n$i AS DOUBLE)"
      def ssw(i: Int) = s"(CAST(q$i AS DOUBLE)"
        .concat(s" - CAST(s$i AS DOUBLE) * s$i / CAST(n$i AS DOUBLE))")
      val grand = s"CAST(${gs.indices.map(i => s"s$i").mkString(" + ")}"
        .concat(s" AS DOUBLE) / $nD")
      val ssb = gs.indices.map(i =>
        s"${njD(i)} * (${mj(i)} - ($grand)) * (${mj(i)} - ($grand))")
        .mkString(" + ")
      val sswAll = gs.indices.map(ssw).mkString(" + ")
      val msw = s"(($sswAll) / ($nD - $k))"
      val fStat = s"($ssb) / ${k - 1}.0 / $msw"
      def wjS(i: Int) = s"(CASE WHEN ${ssw(i)} > 0 THEN ${njD(i)}"
        .concat(s" / (${ssw(i)} / (${njD(i)} - 1.0)) END)")
      val wSum = s"(${gs.indices.map(wjS).mkString(" + ")})"
      val mW = s"((${gs.indices.map(i => s"${wjS(i)} * (${mj(i)})")
        .mkString(" + ")}) / $wSum)"
      val aW = s"((${gs.indices.map(i =>
          s"${wjS(i)} * ((${mj(i)}) - $mW) * ((${mj(i)}) - $mW)")
        .mkString(" + ")}) / ${k - 1}.0)"
      val lam = s"(${gs.indices.map(i =>
          s"(1.0 - ${wjS(i)} / $wSum) * (1.0 - ${wjS(i)} / $wSum)"
            + s" / (${njD(i)} - 1.0)").mkString(" + ")})"
      val bLit = java.lang.Double.toString(2.0 * (k - 2) / (k * k - 1))
      val dfLit = java.lang.Double.toString((k * k - 1).toDouble)
      val bW = s"(1.0 + $bLit * $lam)"
      val nCols = gs.zipWithIndex
        .map { case (g, i) => s"n$i AS n_$g" }.mkString(", ")
      s"""
      WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND value IS NOT NULL),
      lat AS (SELECT g, CAST(round(v * 1e6, 0) AS BIGINT) AS vu
              FROM base),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
             $caseCols
            FROM lat)
      SELECT n, $nCols,
             round($fStat, 6) AS f_stat,
             CAST(${k - 1} AS INTEGER) AS df1,
             n - $k AS df2,
             round(($ssb) / (($ssb) + ($sswAll)), 6) AS eta2,
             round(greatest(0.0, (($ssb) - ${k - 1}.0 * $msw)
               / (($ssb) + ($sswAll) + $msw)), 6) AS omega2,
             round($aW / $bW, 6) AS welch_f,
             round($dfLit / (3.0 * $lam), 6) AS welch_df2
      FROM f"""
    },


    // Mann-Whitney: the kruskal 2x-midrank machinery restricted to two
    // groups; 2U exact, tie-corrected z, one fixed tree per output
    "q_mann_whitney" -> {
      val naD = "CAST(n_a AS DOUBLE)"
      val nbD = "CAST(n_b AS DOUBLE)"
      val nD = s"($naD + $nbD)"
      val u2a = "(ra2 - n_a * (n_a + 1))"
      val varU = s"($naD * $nbD / 12.0 * (($nD + 1.0)"
        .concat(s" - CAST(tsum AS DOUBLE) / ($nD * ($nD - 1.0))))")
      val z = s"((CAST($u2a AS DOUBLE) - $naD * $nbD)"
        .concat(s" / (2.0 * sqrt($varU)))")
      val ok = "n_a >= 1 AND n_b >= 1"
      s"""
      WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IN ('purchase', 'view')
                      AND value IS NOT NULL),
      pv AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY v),
      r AS (SELECT v, CAST(2 * coalesce(sum(n) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + n + 1 AS BIGINT) AS r2 FROM pv),
      t AS (SELECT CAST(coalesce(sum(n * n * n - n), 0) AS BIGINT) AS tsum
            FROM pv),
      f AS (SELECT
              CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN g = 'purchase' THEN r2 ELSE 0 END)
                AS BIGINT) AS ra2
            FROM base b JOIN r ON b.v = r.v)
      SELECT n_a, n_b,
             round(CASE WHEN $ok
               THEN CAST($u2a AS DOUBLE) / 2.0 END, 6) AS u_a,
             round(CASE WHEN $ok
               THEN ($naD * $nbD) - CAST($u2a AS DOUBLE) / 2.0 END, 6)
               AS u_b,
             round(CASE WHEN $ok AND $varU > 0 THEN $z END, 6) AS z,
             round(CASE WHEN $ok AND $varU > 0
               THEN $z / sqrt($nD) END, 6) AS effect_size_r
      FROM f, t"""
    },


    // Welch t-test: the effect-sizes lattice fold, Welch-Satterthwaite
    // df, z-critical CI literal shared verbatim
    "q_welch_ttest" -> {
      def nD(s: String) = s"CAST(n$s AS DOUBLE)"
      def m(s: String) = s"(CAST(s$s AS DOUBLE) / ${nD(s)})"
      def ssd(s: String) = s"(CAST(q$s AS DOUBLE)"
        .concat(s" - CAST(s$s AS DOUBLE) * s$s / ${nD(s)})")
      def va(s: String) = s"(${ssd(s)} / (${nD(s)} - 1.0) / ${nD(s)})"
      val se = s"sqrt(${va("a")} + ${va("b")})"
      val t = s"((${m("a")} - ${m("b")}) / $se)"
      val dfW = s"((${va("a")} + ${va("b")}) * (${va("a")} + ${va("b")})"
        .concat(s" / (${va("a")} * ${va("a")} / (${nD("a")} - 1.0)")
        .concat(s" + ${va("b")} * ${va("b")} / (${nD("b")} - 1.0)))")
      val ok = s"na >= 2 AND nb >= 2 AND ${ssd("a")} + ${ssd("b")} > 0"
      s"""
      WITH base AS (SELECT event_type AS g,
               CAST(round(CAST(value AS DOUBLE) * 1e6, 0) AS BIGINT) AS vu
            FROM events
            WHERE event_type IN ('purchase', 'view')
              AND value IS NOT NULL),
      f AS (SELECT
              CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS na,
              CAST(sum(CASE WHEN g = 'purchase' THEN vu ELSE 0 END)
                AS BIGINT) AS sa,
              sum(CASE WHEN g = 'purchase' THEN CAST(vu AS HUGEINT) * vu
                  ELSE CAST(0 AS HUGEINT) END) AS qa,
              CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS nb,
              CAST(sum(CASE WHEN g = 'view' THEN vu ELSE 0 END)
                AS BIGINT) AS sb,
              sum(CASE WHEN g = 'view' THEN CAST(vu AS HUGEINT) * vu
                  ELSE CAST(0 AS HUGEINT) END) AS qb
            FROM base)
      SELECT na AS n_a, nb AS n_b,
             round((${m("a")} - ${m("b")}) / 1e6, 6) AS mean_diff,
             round(CASE WHEN $ok THEN $se / 1e6 END, 6) AS se_diff,
             round(CASE WHEN $ok THEN $t END, 6) AS t_stat,
             round(CASE WHEN $ok THEN $dfW END, 6) AS welch_df,
             round(CASE WHEN $ok THEN (${m("a")} - ${m("b")}
               - 1.959963984540054 * $se) / 1e6 END, 6) AS diff_lo,
             round(CASE WHEN $ok THEN (${m("a")} - ${m("b")}
               + 1.959963984540054 * $se) / 1e6 END, 6) AS diff_hi
      FROM f"""
    },


    // Daily OHLC bars: open/close via the exact (ts, id) row_number
    // election (the Spark side's struct min/max), lattice VWAP
    "q_daily_bars" -> """
      WITH base AS (SELECT ts, event_id AS id, CAST(value AS DOUBLE) AS v
                    FROM events WHERE value IS NOT NULL),
      o AS (SELECT CAST(ts AS DATE) AS day, v,
              row_number() OVER (PARTITION BY CAST(ts AS DATE)
                ORDER BY ts, id) AS rn_a,
              row_number() OVER (PARTITION BY CAST(ts AS DATE)
                ORDER BY ts DESC, id DESC) AS rn_d
            FROM base),
      agg AS (SELECT day, max(v) AS hi, min(v) AS lo,
                CAST(count(*) AS BIGINT) AS n_trades,
                CAST(sum(CAST(round(v * 1e6, 0) AS BIGINT)) AS BIGINT)
                  AS vs
              FROM o GROUP BY 1),
      op AS (SELECT day, v AS open FROM o WHERE rn_a = 1),
      cl AS (SELECT day, v AS close FROM o WHERE rn_d = 1),
      j AS (SELECT a.day, op.open, a.hi, a.lo, cl.close, a.n_trades,
              a.vs, lag(cl.close) OVER (ORDER BY a.day) AS prev
            FROM agg a JOIN op USING (day) JOIN cl USING (day))
      SELECT day, round(open, 6) AS open, round(hi, 6) AS high,
             round(lo, 6) AS low, round(close, 6) AS close, n_trades,
             round(CAST(vs AS DOUBLE) / 1e6 / CAST(n_trades AS DOUBLE), 6)
               AS vwap,
             round(CASE WHEN prev > 0 THEN close / prev - 1.0 END, 6)
               AS day_return
      FROM j ORDER BY day""",


    // Price indexes: centi-lattice period sums per part, p*q cross
    // terms on the 1e-6-scaled lattice before the basket folds
    "q_price_index" -> {
      def term(e: String, q: String, qw: String) =
        s"CAST(round(CAST($e AS DOUBLE) / CAST($q AS DOUBLE)" +
          s" * CAST($qw AS DOUBLE) * 1e6, 0) AS BIGINT)"
      val lasp = "CAST(l1 AS DOUBLE) / CAST(l0 AS DOUBLE)"
      val paas = "CAST(p1 AS DOUBLE) / CAST(p0 AS DOUBLE)"
      val ok = "n_items >= 1 AND l0 > 0 AND p0 > 0"
      s"""
      WITH base AS (SELECT l_partkey AS i,
               CAST(round(l_quantity * 100, 0) AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS e,
               (year(o_orderdate) = 1994) AS b,
               (year(o_orderdate) = 1995) AS c
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE (year(o_orderdate) = 1994) OR (year(o_orderdate) = 1995)),
      per0 AS (SELECT i,
                CAST(sum(CASE WHEN b THEN q ELSE 0 END) AS BIGINT) AS q0,
                CAST(sum(CASE WHEN b THEN e ELSE 0 END) AS BIGINT) AS e0,
                CAST(sum(CASE WHEN c THEN q ELSE 0 END) AS BIGINT) AS q1,
                CAST(sum(CASE WHEN c THEN e ELSE 0 END) AS BIGINT) AS e1
               FROM base GROUP BY 1),
      per AS (SELECT * FROM per0 WHERE q0 > 0 AND q1 > 0),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
              CAST(sum(${term("e1", "q1", "q0")}) AS BIGINT) AS l1,
              CAST(sum(${term("e0", "q0", "q0")}) AS BIGINT) AS l0,
              CAST(sum(${term("e1", "q1", "q1")}) AS BIGINT) AS p1,
              CAST(sum(${term("e0", "q0", "q1")}) AS BIGINT) AS p0
            FROM per)
      SELECT n_items,
             round(CASE WHEN $ok THEN $lasp END, 6) AS laspeyres,
             round(CASE WHEN $ok THEN $paas END, 6) AS paasche,
             round(CASE WHEN $ok
               THEN sqrt(($lasp) * ($paas)) END, 6) AS fisher
      FROM f"""
    },


    // Regression influence: exact daily sums, slope/intercept/RSS from
    // the standard identities, one fixed tree per diagnostic
    "q_regression_influence" -> {
      val nD = "CAST(n AS DOUBLE)"
      def dd(c: String) = s"CAST($c AS DOUBLE)"
      val b = s"(($nD * ${dd("sxy")} - ${dd("sx")} * ${dd("sy")})"
        .concat(s" / ($nD * ${dd("sxx")} - ${dd("sx")} * ${dd("sx")}))")
      val a = s"((${dd("sy")} - $b * ${dd("sx")}) / $nD)"
      val sxxC = s"(${dd("sxx")} - ${dd("sx")} * ${dd("sx")} / $nD)"
      val xbar = s"(${dd("sx")} / $nD)"
      val rss = s"(${dd("syy")} - $a * ${dd("sy")} - $b * ${dd("sxy")})"
      val s2 = s"($rss / ($nD - 2.0))"
      val xD = "CAST(x AS DOUBLE)"
      val e = s"(CAST(y AS DOUBLE) - ($a + $b * $xD))"
      val h = s"(1.0 / $nD + ($xD - $xbar) * ($xD - $xbar) / $sxxC)"
      val rr = s"($e / sqrt($s2 * (1.0 - $h)))"
      val cooks = s"($rr * $rr / 2.0 * ($h / (1.0 - $h)))"
      val okH = s"n >= 4 AND $sxxC > 0"
      val ok = s"$okH AND $s2 > 0"
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS y
            FROM orders GROUP BY 1),
      r AS (SELECT day, y,
              CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS x
            FROM daily),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * y) AS BIGINT) AS sxy,
              sum(CAST(y AS HUGEINT) * y) AS syy
            FROM r)
      SELECT day, x AS day_index,
             round(CAST(y AS DOUBLE) / 100.0, 2) AS value,
             round(CASE WHEN $okH THEN $h END, 6) AS leverage,
             round(CASE WHEN $ok THEN $e / 100.0 END, 2) AS residual,
             round(CASE WHEN $ok AND $h < 1 THEN $rr END, 6) AS std_resid,
             round(CASE WHEN $ok AND $h < 1 THEN $cooks END, 6)
               AS cooks_d,
             CASE WHEN $ok AND $h < 1
               THEN ($cooks > 4.0 / $nD) END AS influential
      FROM r, f ORDER BY day"""
    },


    // Crosstab residuals: bounded contingency windows, one fixed tree
    // per observed cell (absent cells are absent by documentation)
    "q_crosstab_residuals" -> {
      val nD = "CAST(n AS DOUBLE)"
      val e = s"(CAST(nx AS DOUBLE) * ny / $nD)"
      val diff = s"(CAST(n_obs AS DOUBLE) - $e)"
      val adjDen = s"sqrt($e * (1.0 - CAST(nx AS DOUBLE) / $nD)"
        .concat(s" * (1.0 - CAST(ny AS DOUBLE) / $nD))")
      s"""
      WITH joint AS (SELECT lang AS x, source AS y,
               CAST(count(*) AS BIGINT) AS n_obs
            FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
            GROUP BY 1, 2),
      t AS (SELECT x, y, n_obs,
              CAST(sum(n_obs) OVER () AS BIGINT) AS n,
              CAST(sum(n_obs) OVER (PARTITION BY x) AS BIGINT) AS nx,
              CAST(sum(n_obs) OVER (PARTITION BY y) AS BIGINT) AS ny
            FROM joint)
      SELECT x, y, n_obs,
             round($e, 6) AS expected,
             round(CASE WHEN $e > 0 THEN $diff / sqrt($e) END, 6)
               AS std_residual,
             round(CASE WHEN $adjDen > 0 THEN $diff / $adjDen END, 6)
               AS adj_residual
      FROM t ORDER BY x, y"""
    },


    // Cochran's Q: exact slot/row folds with full-roster semantics, one
    // fixed double tree
    "q_cochran_q" -> {
      val slots = Seq(0, 1, 2, 3)
      val k = slots.size
      val cCols = slots.zipWithIndex.map { case (sl, i) =>
        s"CAST(coalesce(sum(CASE WHEN slot = $sl THEN 1 ELSE 0 END), 0)"
          .concat(s" AS BIGINT) AS c$i") }.mkString(",\n              ")
      val cSq = slots.indices
        .map(i => s"CAST(c$i AS DOUBLE) * c$i").mkString(" + ")
      val tD = "CAST(t AS DOUBLE)"
      val den = s"($k.0 * $tD - CAST(r2 AS DOUBLE))"
      val q = s"${k - 1}.0 * ($k.0 * ($cSq) - $tD * $tD) / $den"
      val cOut = slots.zipWithIndex
        .map { case (sl, i) => s"c$i AS c_$sl" }.mkString(", ")
      s"""
      WITH base AS (SELECT user_id AS k,
               CAST(floor((day(ts) - 1) / 7) AS INTEGER) AS slot,
               (event_type = 'purchase') AS y
            FROM events WHERE user_id IS NOT NULL),
      users AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS n_entities
                FROM base),
      hits AS (SELECT DISTINCT k, slot FROM base
               WHERE y AND slot IN (${slots.mkString(", ")})),
      cc AS (SELECT $cCols
             FROM hits),
      rr AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS t,
               CAST(coalesce(sum(r * r), 0) AS BIGINT) AS r2
             FROM (SELECT k, CAST(count(*) AS BIGINT) AS r
                   FROM hits GROUP BY k))
      SELECT n_entities, CAST($k AS INTEGER) AS k_slots,
             t AS t_successes, $cOut,
             round(CASE WHEN $den > 0 THEN $q END, 6) AS q_stat,
             CAST(${k - 1} AS INTEGER) AS df
      FROM users, cc, rr"""
    },


    // 2-D skyline: exact RANGE window on the centi-lattice minimize
    // axis, same-x partition max, frontier only
    "q_skyline_parts" -> """
      WITH base AS (SELECT p_partkey,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS x,
               CAST(p_size AS DOUBLE) AS y
            FROM part
            WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL),
      f AS (SELECT p_partkey, x, y,
              max(y) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING) AS pm,
              max(y) OVER (PARTITION BY x) AS sm
            FROM base)
      SELECT p_partkey,
             round(CAST(x AS DOUBLE) / 100.0, 2) AS p_retailprice,
             round(y, 6) AS p_size
      FROM f WHERE NOT ((pm IS NOT NULL AND pm >= y) OR sm > y)
      ORDER BY p_retailprice, p_partkey""",


    // Tukey HSD: the q_anova lattice fold, then one fixed tree per pair
    // (scale cancels in q and d, one division unwinds the reported diff)
    "q_tukey_hsd" -> {
      val gs = Seq("click", "error", "purchase", "signup", "view")
      val k = gs.size
      val caseCols = gs.zipWithIndex.map { case (g, i) =>
        s"""CAST(sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END) AS BIGINT)
               AS n$i,
             CAST(sum(CASE WHEN g = '$g' THEN vu ELSE 0 END) AS BIGINT)
               AS s$i,
             sum(CASE WHEN g = '$g'
                 THEN CAST(vu AS HUGEINT) * vu
                 ELSE CAST(0 AS HUGEINT) END) AS q$i""" }
        .mkString(",\n             ")
      def njD(i: Int) = s"CAST(n$i AS DOUBLE)"
      def mj(i: Int) = s"CAST(s$i AS DOUBLE) / CAST(n$i AS DOUBLE)"
      def ssw(i: Int) = s"(CAST(q$i AS DOUBLE)"
        .concat(s" - CAST(s$i AS DOUBLE) * s$i / CAST(n$i AS DOUBLE))")
      val msw = s"((${gs.indices.map(ssw).mkString(" + ")})"
        .concat(s" / (CAST(nt AS DOUBLE) - $k))")
      val pairRows = (for (i <- 0 until k; j <- (i + 1) until k) yield {
        val diff = s"(${mj(i)} - ${mj(j)})"
        val se = s"sqrt($msw / 2.0 * (1.0 / ${njD(i)} + 1.0 / ${njD(j)}))"
        s"""SELECT '${gs(i)}' AS group_a, '${gs(j)}' AS group_b,
             n$i AS n_a, n$j AS n_b,
             round($diff / 1e6, 6) AS mean_diff,
             round(CASE WHEN $msw > 0 THEN $se / 1e6 END, 6) AS se_pooled,
             round(CASE WHEN $msw > 0 THEN abs($diff) / $se END, 6)
               AS q_stat,
             round(CASE WHEN $msw > 0 THEN $diff / sqrt($msw) END, 6)
               AS cohens_d
           FROM f"""
      }).mkString("\n        UNION ALL ")
      s"""
      WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND value IS NOT NULL),
      lat AS (SELECT g, CAST(round(v * 1e6, 0) AS BIGINT) AS vu
              FROM base),
      f AS (SELECT CAST(count(*) AS BIGINT) AS nt,
             $caseCols
            FROM lat)
      SELECT * FROM ($pairRows) ORDER BY group_a, group_b"""
    },


    // ICC(1): exact per-group folds over the unbounded user grouping,
    // per-group terms committed to integers before the global fold
    "q_icc" -> {
      val jD = "CAST(n_groups AS DOUBLE)"
      val nT = "CAST(n AS DOUBLE)"
      val ssb = s"(CAST(sb AS DOUBLE) - CAST(st AS DOUBLE) * st / $nT)"
      val msb = s"($ssb / ($jD - 1.0))"
      val msw = s"(CAST(sw AS DOUBLE) / ($nT - $jD))"
      val kbar = s"(($nT - CAST(n2 AS DOUBLE) / $nT) / ($jD - 1.0))"
      val den = s"($msb + ($kbar - 1.0) * $msw)"
      val ok = "n_groups >= 2 AND n > n_groups"
      s"""
      WITH lat AS (SELECT user_id AS g,
               CAST(round(CAST(value AS DOUBLE) * 1e2, 0) AS BIGINT) AS vu
            FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      per AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(vu) AS BIGINT) AS s,
                sum(CAST(vu AS HUGEINT) * vu) AS q
              FROM lat GROUP BY 1),
      terms AS (SELECT n,
                 CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE), 0) AS BIGINT) AS bn,
                 CAST(round(CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
                   * CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 0) AS BIGINT)
                   AS ww
               FROM per),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
              CAST(sum(n) AS BIGINT) AS n,
              CAST(sum(n * n) AS BIGINT) AS n2,
              sum(CAST(bn AS HUGEINT)) AS sb,
              sum(CAST(ww AS HUGEINT)) AS sw
            FROM terms),
      grand AS (SELECT CAST(sum(vu) AS BIGINT) AS st FROM lat)
      SELECT n, n_groups,
             round(CASE WHEN $ok THEN $kbar END, 6) AS kbar,
             round(CASE WHEN $ok THEN $msb / 1e4 END, 6) AS ms_between,
             round(CASE WHEN $ok THEN $msw / 1e4 END, 6) AS ms_within,
             round(CASE WHEN $ok AND $den > 0
               THEN ($msb - $msw) / $den END, 6) AS icc
      FROM f, grand"""
    },


    // Retention half-life: the q_cohort_retention chain rated against
    // week 0, ln(rate) on the 1e-9 lattice, per-cohort exact OLS sums
    "q_retention_halflife" -> {
      val nD = "CAST(n_points AS DOUBLE)"
      def dd(c: String) = s"CAST($c AS DOUBLE)"
      val num = s"($nD * ${dd("sxy")} - ${dd("sx")} * ${dd("sy")})"
      val denX = s"($nD * ${dd("sxx")} - ${dd("sx")} * ${dd("sx")})"
      val denY = s"($nD * ${dd("syy")} - ${dd("sy")} * ${dd("sy")})"
      val slope = s"($num / $denX / 1e9)"
      val ok = s"n_points >= 3 AND $denX > 0"
      s"""
      WITH f0 AS (SELECT user_id,
                   CAST(date_trunc('week', min(CAST(ts AS DATE)))
                     AS DATE) AS cohort_week
                  FROM events GROUP BY user_id),
      a0 AS (SELECT DISTINCT user_id,
               CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE)
                 AS act_week
             FROM events),
      ret AS (SELECT cohort_week,
                CAST(date_diff('day', cohort_week, act_week) / 7
                  AS INTEGER) AS w,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
              FROM a0 JOIN f0 USING (user_id) GROUP BY 1, 2),
      base0 AS (SELECT cohort_week, n_users AS base FROM ret WHERE w = 0),
      rates AS (SELECT r.cohort_week, r.w,
                  CAST(r.n_users AS DOUBLE) / CAST(b.base AS DOUBLE)
                    AS rate
                FROM ret r JOIN base0 b USING (cohort_week)
                WHERE r.w >= 1),
      lat AS (SELECT cohort_week, CAST(w AS BIGINT) AS x,
                CAST(round(ln(rate) * 1e9, 0) AS BIGINT) AS yl
              FROM rates WHERE rate > 0),
      per AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_points,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(yl) AS BIGINT) AS sy,
                CAST(sum(x * yl) AS BIGINT) AS sxy,
                sum(CAST(yl AS HUGEINT) * yl) AS syy
              FROM lat GROUP BY 1)
      SELECT cohort_week, n_points,
             round(CASE WHEN $ok THEN $slope END, 6) AS decay_rate,
             round(CASE WHEN $ok AND $slope < 0
               THEN 0.6931471805599453 / (0.0 - $slope) END, 6)
               AS half_life,
             round(CASE WHEN $ok AND $denY > 0
               THEN $num * $num / ($denX * $denY) END, 6) AS r2
      FROM per ORDER BY cohort_week"""
    },


    // Entropy profile: per-value p ln p terms on the 1e-12 lattice,
    // ln 2 literal shared verbatim; grouping identity is all the string
    // cast must preserve
    "q_entropy_profile" -> {
      val hNat = "(0.0 - CAST(st AS DOUBLE) / 1e12)"
      s"""
      WITH m AS (
        SELECT 'event_type' AS col_name, CAST(event_type AS VARCHAR)
          AS value FROM events
        UNION ALL SELECT 'event_day', CAST(CAST(ts AS DATE) AS VARCHAR)
          FROM events
        UNION ALL SELECT 'event_hour', CAST(hour(ts) AS VARCHAR)
          FROM events),
      nulls AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(count(value) AS BIGINT) AS nn
                FROM m GROUP BY 1),
      counts AS (SELECT col_name, value, CAST(count(*) AS BIGINT) AS c
                 FROM m WHERE value IS NOT NULL GROUP BY 1, 2),
      terms AS (SELECT c.col_name,
                 CAST(round(CAST(c.c AS DOUBLE) / CAST(u.nn AS DOUBLE)
                   * ln(CAST(c.c AS DOUBLE) / CAST(u.nn AS DOUBLE))
                   * 1e12, 0) AS BIGINT) AS t,
                 c.c
                FROM counts c JOIN nulls u USING (col_name)),
      percol AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(t) AS BIGINT) AS st,
                   CAST(max(c) AS BIGINT) AS top
                 FROM terms GROUP BY 1)
      SELECT u.col_name, u.n_rows, u.n_rows - u.nn AS n_nulls,
             CAST(coalesce(p.n_distinct, 0) AS BIGINT) AS n_distinct,
             round($hNat / 0.6931471805599453, 6) AS entropy_bits,
             round(CASE WHEN p.n_distinct > 1
               THEN $hNat / ln(CAST(p.n_distinct AS DOUBLE)) END, 6)
               AS norm_entropy,
             round(CAST(p.top AS DOUBLE) / CAST(u.nn AS DOUBLE), 6)
               AS top_share
      FROM nulls u LEFT JOIN percol p USING (col_name)
      ORDER BY col_name"""
    },


    // Ljung-Box: the q_autocorr chain folded to Q = n(n+2) Sum rho_k^2/(n-k),
    // each lag's term on the 1e-12 lattice before the bounded sum
    "q_ljung_box" -> {
      val lags = (1 to 14)
        .map(k => s"lag(x, $k) OVER (ORDER BY bucket) AS l$k")
        .mkString(",\n               ")
      val arms = (1 to 14)
        .map(k => s"SELECT $k AS lag, corr(x, l$k) AS c FROM l")
        .mkString("\n        UNION ALL ")
      s"""
      WITH s AS (SELECT CAST(o_orderdate AS DATE) AS bucket,
                        avg(o_totalprice) AS x
                 FROM orders GROUP BY 1),
      l AS (SELECT bucket, x,
               $lags
            FROM s),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
      a AS (SELECT lag, round(c, 6) AS rho FROM ($arms)),
      f AS (SELECT CAST(count(*) AS BIGINT) AS lags_used,
              CAST(sum(CAST(round(rho * rho
                / ((SELECT n FROM nn) - lag) * 1e12, 0) AS BIGINT))
                AS BIGINT) AS qm
            FROM a WHERE rho IS NOT NULL)
      SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_buckets, lags_used,
             round(CAST((SELECT n FROM nn) * ((SELECT n FROM nn) + 2)
               AS DOUBLE) * (qm / 1e12), 6) AS q_stat
      FROM f"""
    },


    // Hurst R/S: m-scaled integer block arithmetic (centi-lattice daily
    // revenue), per-block R/S on the micro lattice, ln(m) regressor
    // literals injected from the SAME Scala doubles the Spark side folds
    "q_hurst" -> {
      val ms = Seq(8, 16, 32, 64, 128)
      val xs = ms.map(m => math.log(m.toDouble))
      def d2s(v: Double) = java.lang.Double.toString(v)
      val k = ms.size
      val sx = d2s(xs.reduce(_ + _))
      val sxx = d2s(xs.map(x => x * x).reduce(_ + _))
      val ys = ms.zipWithIndex.map { case (m, i) =>
        s"sum(CASE WHEN m = $m THEN log_rs END) AS y$i" }.mkString(",\n          ")
      val sxy = ms.indices.map(i => s"${d2s(xs(i))} * y$i").mkString(" + ")
      val sy = ms.indices.map(i => s"y$i").mkString(" + ")
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS x
            FROM orders GROUP BY 1),
      r AS (SELECT x, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
            FROM daily),
      e AS (SELECT CAST(m AS BIGINT) AS m, rn, x
            FROM r CROSS JOIN
              (SELECT unnest([${ms.mkString(",")}]) AS m)),
      b AS (SELECT m, x, (rn - 1) // m AS blk,
              (rn - 1) - ((rn - 1) // m) * m AS pos
            FROM e),
      f AS (SELECT m, blk, pos, x,
              count(*) OVER (PARTITION BY m, blk) AS cnt,
              CAST(sum(x) OVER (PARTITION BY m, blk) AS BIGINT) AS s,
              CAST(sum(x) OVER (PARTITION BY m, blk ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS csum
            FROM b),
      g AS (SELECT m, blk,
              CAST(max(m * csum - (pos + 1) * s)
                - min(m * csum - (pos + 1) * s) AS BIGINT) AS rng,
              sum(CAST(m * x - s AS HUGEINT) * (m * x - s)) AS ss
            FROM f WHERE cnt = m GROUP BY m, blk),
      h AS (SELECT m,
              CAST(round((CAST(rng AS DOUBLE) / CAST(m AS DOUBLE))
                / sqrt(CAST(ss AS DOUBLE) / (CAST(m AS DOUBLE)
                  * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))) * 1e6, 0)
                AS BIGINT) AS rsu
            FROM g WHERE ss > 0),
      p AS (SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
              CAST(sum(rsu) AS BIGINT) AS rst FROM h GROUP BY m),
      q AS (SELECT m, n_blocks,
              CAST(rst AS DOUBLE) / n_blocks / 1e6 AS rs_mean_raw,
              round(ln(CAST(rst AS DOUBLE) / n_blocks / 1e6), 6) AS log_rs
            FROM p),
      yf AS (SELECT $ys
             FROM q),
      sc AS (SELECT round(($k.0 * ($sxy) - $sx * ($sy))
               / ($k.0 * $sxx - $sx * $sx), 6) AS hurst
             FROM yf)
      SELECT m AS block_m, n_blocks, round(rs_mean_raw, 6) AS rs_mean,
             log_rs, hurst
      FROM q, sc
      ORDER BY block_m"""
    },


    // seasonal strength: the q_seasonality decomposition replayed, then
    // both variances from exact whole-unit-lattice long sums
    "q_seasonal_strength" -> """
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum(o_totalprice) AS x,
               date_diff('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) % 7 AS dow
        FROM orders GROUP BY 1, 3),
      tr AS (SELECT *,
               CASE WHEN count(*) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
                 THEN avg(x) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) END AS trend
            FROM daily),
      sl AS (SELECT dow, avg(x - trend) AS raw FROM tr GROUP BY dow),
      ce AS (SELECT dow, raw - avg(raw) OVER () AS seas FROM sl),
      dec AS (SELECT * FROM (
          SELECT round(tr.x - tr.trend - ce.seas, 6) AS residual,
                 round(ce.seas, 6) AS seasonal
          FROM tr LEFT JOIN ce ON tr.dow = ce.dow)
        WHERE residual IS NOT NULL),
      l AS (SELECT CAST(round(residual, 0) AS BIGINT) AS r,
                   CAST(round(seasonal + residual, 0) AS BIGINT) AS sr
            FROM dec),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(r) AS BIGINT) AS s1,
              CAST(sum(r * r) AS BIGINT) AS q1,
              CAST(sum(sr) AS BIGINT) AS s2,
              CAST(sum(sr * sr) AS BIGINT) AS q2
            FROM l)
      SELECT n AS n_days,
             round(CAST(q1 AS DOUBLE) / n
               - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 6)
               AS var_residual,
             round(CAST(q2 AS DOUBLE) / n
               - (CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n), 6)
               AS var_detrended,
             CASE WHEN (CAST(q2 AS DOUBLE) / n
                 - (CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n))
                 > 0.0 THEN
               round(greatest(0.0, 1.0
                 - (CAST(q1 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / (CAST(q2 AS DOUBLE) / n
                   - (CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n))),
                 6) END AS seasonal_strength
      FROM f""",


    // Fano factor of daily counts per user: exact integer moments
    "q_burstiness" -> """
      WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
      p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(c) AS BIGINT) AS n_events,
              CAST(sum(c * c) AS BIGINT) AS ss
            FROM d GROUP BY user_id)
      SELECT user_id, n_days, n_events,
             round(CAST(n_events AS DOUBLE) / n_days, 6) AS mean_daily,
             round(CAST(ss AS DOUBLE) / n_days
               - (CAST(n_events AS DOUBLE) / n_days)
                 * (CAST(n_events AS DOUBLE) / n_days), 6) AS var_daily,
             round((CAST(ss AS DOUBLE) / n_days
               - (CAST(n_events AS DOUBLE) / n_days)
                 * (CAST(n_events AS DOUBLE) / n_days))
               / (CAST(n_events AS DOUBLE) / n_days), 6) AS fano
      FROM p ORDER BY user_id""",


    // Mann-Kendall: pair signs over the bounded day table (exact centi
    // comparisons), tie-corrected variance, continuity-corrected z
    "q_mann_kendall" -> """
      WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS vc
            FROM orders GROUP BY 1),
      p AS (SELECT CAST(coalesce(sum(CASE WHEN b.vc > a.vc THEN 1
              WHEN b.vc < a.vc THEN -1 ELSE 0 END), 0) AS BIGINT)
              AS s_stat
            FROM d a JOIN d b ON a.day < b.day),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM d),
      t AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
              AS BIGINT) AS tsum
            FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d
                  GROUP BY vc)),
      f AS (SELECT n_days, s_stat,
              round(CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tsum
                AS DOUBLE) / 18.0, 6) AS var_s
            FROM n, p, t)
      SELECT n_days, s_stat, var_s,
             CASE WHEN var_s > 0.0 THEN round(
               (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                     WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                     ELSE 0.0 END) / sqrt(var_s), 6) END AS z,
             CASE WHEN s_stat > 0 THEN 'increasing'
                  WHEN s_stat < 0 THEN 'decreasing'
                  ELSE 'none' END AS trend
      FROM f""",


    // single-changepoint locator: argmax of exact |n*S_k - k*S_n| over
    // the day table, earliest-day tie-break, means in value units
    "q_changepoint" -> """
      WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS vc
            FROM orders GROUP BY 1),
      s AS (SELECT day, vc,
              CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
              CAST(sum(vc) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
              CAST(count(*) OVER () AS BIGINT) AS n,
              CAST(sum(vc) OVER () AS BIGINT) AS tot
            FROM d),
      f AS (SELECT *, abs(n * cum - rn * tot) AS t FROM s WHERE rn < n),
      pick AS (SELECT * FROM f ORDER BY t DESC, day LIMIT 1)
      SELECT n AS n_days, day AS change_day, rn AS days_before,
             round(CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0), 6)
               AS t_stat,
             round(cum / (100.0 * rn), 6) AS mean_before,
             round((tot - cum) / (100.0 * (n - rn)), 6) AS mean_after,
             round(round((tot - cum) / (100.0 * (n - rn)), 6)
               - round(cum / (100.0 * rn), 6), 6) AS shift
      FROM pick""",


    // pinball loss of the lag-7 seasonal naive at q=0.1/0.5/0.9: daily
    // centi totals, per-day losses on the milli-centi lattice; the
    // (1-q) factors are the Scala-computed doubles interpolated
    // verbatim (0.1's complement is NOT the literal 0.9)
    "q_pinball_loss" -> pinballSql(Seq(0.1, 0.5, 0.9), 7),


    "q_forecast_baseline" -> """
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
               sum(o_totalprice) AS x FROM orders GROUP BY 1),
      l AS (SELECT day, x, lag(x, 1) OVER (ORDER BY day) AS naive,
               lag(x, 7) OVER (ORDER BY day) AS snaive FROM daily),
      e AS (SELECT *, abs(x - naive) AS e1, abs(x - snaive) AS e7 FROM l),
      m AS (SELECT *, avg(e1) OVER () AS m1, avg(e7) OVER () AS m7 FROM e)
      SELECT day, round(x, 2) AS actual, round(naive, 2) AS naive,
             round(snaive, 2) AS snaive, round(e1, 2) AS abs_err_naive,
             round(e7, 2) AS abs_err_snaive, round(m1, 6) AS mae_naive,
             round(m7, 6) AS mae_snaive,
             CASE WHEN m1 > 0 THEN round(m7 / m1, 6) END AS mase
      FROM m ORDER BY day""",

    // Holt-Winters additive (alpha 1/4, beta 1/8, gamma 1/4 — dyadic,
    // complements exact): the recursive CTE steps the SAME fixed double
    // trees the Spark fold evaluates, one day per iteration, so every
    // level/trend/season double is bit-identical by induction
    "q_holt_winters" -> (hwCtes + """
      SELECT d AS day, round(y, 6) AS actual, round(fitted, 6) AS fitted,
             round(y - fitted, 6) AS resid
      FROM hw ORDER BY day"""),

    // h-step forecast off the recursion's final row: the same
    // lvl + h*trd + s[slot] projection tree the Spark side evaluates
    "q_holt_winters_forecast" -> (hwCtes + """,
      fin AS (SELECT * FROM hw WHERE t = (SELECT max(t) FROM hw))
      SELECT CAST(g.h AS INTEGER) AS h,
             fin.d + CAST(g.h AS INTEGER) AS day,
             round(fin.lvl + CAST(g.h AS DOUBLE) * fin.trd +
               CASE CAST(((fin.d + CAST(g.h AS INTEGER))
                   - DATE '1970-01-01') % 7 AS INTEGER)
                 WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2
                 WHEN 3 THEN s3 WHEN 4 THEN s4 WHEN 5 THEN s5
                 ELSE s6 END, 6) AS forecast
      FROM fin, (SELECT unnest(range(1, 8)) AS h) g ORDER BY h"""),

    // max drawdown per priority lane: exact centi running max over the
    // calendar-bounded day grain, trough by (dd DESC, date ASC)
    "q_max_drawdown" -> """
      WITH daily AS (SELECT o_orderpriority,
              CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders GROUP BY 1, 2),
      s AS (SELECT o_orderpriority, d, y,
              max(y) OVER (PARTITION BY o_orderpriority ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS peak,
              CAST(count(*) OVER (PARTITION BY o_orderpriority)
                AS BIGINT) AS nd
            FROM daily),
      s2 AS (SELECT *, peak - y AS dd,
              row_number() OVER (PARTITION BY o_orderpriority
                ORDER BY peak - y DESC, d) AS rn
            FROM s)
      SELECT o_orderpriority, nd AS n_days,
             round(peak / 100.0, 2) AS peak_daily,
             round(y / 100.0, 2) AS trough_daily,
             round(dd / 100.0, 2) AS max_drawdown,
             round(CASE WHEN peak > 0 THEN
               CAST(dd AS DOUBLE) / CAST(peak AS DOUBLE) END, 6)
               AS drawdown_pct,
             d AS trough_date
      FROM s2 WHERE rn = 1 ORDER BY o_orderpriority""",

    // TWFE on the balanced nation x month grid: within-transform with
    // cleared denominators (exact 128-bit integers), one division;
    // cell-mean DiD beside it (must coincide: one group, common timing)
    "q_twfe" -> """
      WITH m AS (SELECT n.n_name AS u,
              CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                AS DATE) AS mo,
              CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2),
      grid AS (SELECT mm.mo, uu.u, coalesce(m.y, 0) AS y
            FROM (SELECT DISTINCT mo FROM m) mm
            CROSS JOIN (SELECT DISTINCT u FROM m) uu
            LEFT JOIN m ON m.mo = mm.mo AND m.u = uu.u),
      g AS (SELECT mo, u, y,
              u IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3',
                'NATION_4') AS t,
              mo >= DATE '1999-01-01' AS p,
              CAST(CASE WHEN u IN ('NATION_0', 'NATION_1', 'NATION_2',
                'NATION_3', 'NATION_4') AND mo >= DATE '1999-01-01'
                THEN 1 ELSE 0 END AS BIGINT) AS dd
            FROM grid),
      pu AS (SELECT u, CAST(sum(y) AS HUGEINT) AS si,
              CAST(sum(dd) AS BIGINT) AS di FROM g GROUP BY 1),
      pm AS (SELECT mo, CAST(sum(y) AS HUGEINT) AS st,
              CAST(sum(dd) AS BIGINT) AS dt FROM g GROUP BY 1),
      tt AS (SELECT CAST(sum(y) AS HUGEINT) AS s,
              CAST(sum(dd) AS BIGINT) AS dg,
              CAST(count(DISTINCT u) AS BIGINT) AS nu,
              CAST(count(DISTINCT mo) AS BIGINT) AS nt FROM g),
      cl AS (SELECT g.t, g.p, g.y, g.dd,
              CAST(g.y AS HUGEINT) * tt.nu * tt.nt - pu.si * tt.nu
                - pm.st * tt.nt + tt.s AS yt,
              CAST(g.dd AS HUGEINT) * tt.nu * tt.nt
                - CAST(pu.di AS HUGEINT) * tt.nu
                - CAST(pm.dt AS HUGEINT) * tt.nt + tt.dg AS dtil
            FROM g JOIN pu ON g.u = pu.u JOIN pm ON g.mo = pm.mo, tt),
      f AS (SELECT sum(dtil * yt) AS num, sum(dtil * dtil) AS den,
              CAST(sum(dd) AS BIGINT) AS n_treated_cells,
              CAST(count(CASE WHEN t AND p THEN 1 END) AS BIGINT)
                AS n11,
              CAST(count(CASE WHEN t AND NOT p THEN 1 END) AS BIGINT)
                AS n10,
              CAST(count(CASE WHEN NOT t AND p THEN 1 END) AS BIGINT)
                AS n01,
              CAST(count(CASE WHEN NOT t AND NOT p THEN 1 END)
                AS BIGINT) AS n00,
              CAST(coalesce(sum(CASE WHEN t AND p THEN y END), 0)
                AS BIGINT) AS s11,
              CAST(coalesce(sum(CASE WHEN t AND NOT p THEN y END), 0)
                AS BIGINT) AS s10,
              CAST(coalesce(sum(CASE WHEN NOT t AND p THEN y END), 0)
                AS BIGINT) AS s01,
              CAST(coalesce(sum(CASE WHEN NOT t AND NOT p THEN y END),
                0) AS BIGINT) AS s00
            FROM cl)
      SELECT tt.nu AS n_units, tt.nt AS n_months, f.n_treated_cells,
             round(CASE WHEN den > 0 THEN (CAST(num AS DOUBLE)
               / CAST(den AS DOUBLE)) / 100.0 END, 6) AS att_twfe,
             round(CASE WHEN n11 > 0 AND n10 > 0 AND n01 > 0
                 AND n00 > 0 THEN
               (CAST(s11 AS DOUBLE) / (100.0 * CAST(n11 AS DOUBLE))
                 - CAST(s10 AS DOUBLE) / (100.0 * CAST(n10 AS DOUBLE)))
               - (CAST(s01 AS DOUBLE) / (100.0 * CAST(n01 AS DOUBLE))
                 - CAST(s00 AS DOUBLE) / (100.0 * CAST(n00 AS DOUBLE)))
               END, 6) AS did_check
      FROM f, tt""",

    // synthetic control: NATION_0 vs the harmonic-weighted mean of its
    // 5 closest donors by pre-period exact squared distance on the
    // completed unit x month grid; gaps commit to the 1e-6 lattice
    // before the ATT fold
    "q_synthetic_control" -> """
      WITH m AS (SELECT n.n_name AS u,
              CAST(date_trunc('month', CAST(o.o_orderdate AS DATE))
                AS DATE) AS mo,
              CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2),
      grid AS (SELECT mm.mo, uu.u, coalesce(m.y, 0) AS y
            FROM (SELECT DISTINCT mo FROM m) mm
            CROSS JOIN (SELECT DISTINCT u FROM m) uu
            LEFT JOIN m ON m.mo = mm.mo AND m.u = uu.u),
      tr AS (SELECT mo, y AS yt FROM grid WHERE u = 'NATION_0'),
      dn AS (SELECT * FROM grid WHERE u <> 'NATION_0'),
      dist AS (SELECT dn.u,
              sum(CAST(dn.y - tr.yt AS HUGEINT) * (dn.y - tr.yt)) AS d2
            FROM dn JOIN tr ON dn.mo = tr.mo
            WHERE dn.mo < DATE '1999-01-01' GROUP BY 1),
      rk AS (SELECT u, CAST(60 // r AS BIGINT) AS w FROM (
              SELECT u, row_number() OVER (ORDER BY d2, u) AS r
              FROM dist) WHERE r <= 5),
      den AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM rk),
      sy AS (SELECT dn.mo, sum(CAST(dn.y AS HUGEINT) * rk.w) AS num
            FROM dn JOIN rk ON dn.u = rk.u GROUP BY 1),
      se AS (SELECT tr.mo, tr.yt,
              (CAST(sy.num AS DOUBLE) / CAST(den.wsum AS DOUBLE))
                / 100.0 AS synd,
              CAST(tr.yt AS DOUBLE) / 100.0 AS td,
              tr.mo >= DATE '1999-01-01' AS post
            FROM tr JOIN sy ON tr.mo = sy.mo, den),
      se2 AS (SELECT *, CAST(round((td - synd) * 1000000.0, 0)
                AS BIGINT) AS gl FROM se),
      a AS (SELECT
              CAST(count(CASE WHEN post THEN 1 END) AS BIGINT) AS np,
              CAST(count(CASE WHEN NOT post THEN 1 END) AS BIGINT)
                AS nb,
              CAST(coalesce(sum(CASE WHEN post THEN gl END), 0)
                AS BIGINT) AS sp,
              CAST(coalesce(sum(CASE WHEN NOT post THEN gl END), 0)
                AS BIGINT) AS sb
            FROM se2)
      SELECT se2.mo AS month, round(td, 2) AS treated,
             round(synd, 6) AS synthetic,
             round(CAST(gl AS DOUBLE) / 1000000.0, 6) AS gap,
             post AS is_post,
             round(CASE WHEN np > 0 AND nb > 0 THEN
               CAST(sp AS DOUBLE) / (1000000.0 * CAST(np AS DOUBLE))
               - CAST(sb AS DOUBLE) / (1000000.0 * CAST(nb AS DOUBLE))
               END, 6) AS att
      FROM se2, a ORDER BY month""",

    // GPD peaks-over-threshold: exact centi excess sums (variance is
    // shift-invariant), MoM xi/sigma, fitted-vs-empirical p99.9
    "q_gpd_tail" -> """
      WITH t AS (SELECT quantile_cont(o_totalprice, 0.95) AS u,
              quantile_cont(o_totalprice, 0.999) AS q999e,
              CAST(count(*) AS BIGINT) AS n
            FROM orders WHERE o_totalprice IS NOT NULL),
      -- conditional fold (not filter->agg): when nothing strictly exceeds
      -- u the query still emits ONE row with n_exc = 0 and NULL params —
      -- the engine's 1-row readout contract
      e AS (SELECT t.u, t.q999e, t.n,
              CAST(count(CASE WHEN o_totalprice > t.u THEN 1 END)
                AS BIGINT) AS n_exc,
              CAST(sum(CASE WHEN o_totalprice > t.u THEN
                  CAST(round(o_totalprice * 100, 0) AS BIGINT) END)
                AS BIGINT) AS s,
              sum(CASE WHEN o_totalprice > t.u THEN
                  CAST(round(o_totalprice * 100, 0) AS HUGEINT)
                  * CAST(round(o_totalprice * 100, 0) AS BIGINT) END) AS q
            FROM orders, t
            GROUP BY 1, 2, 3),
      c AS (SELECT *,
              CAST(s AS DOUBLE) / (100.0 * CAST(n_exc AS DOUBLE)) - u
                AS m,
              (CAST(q AS DOUBLE) / 10000.0
                - (CAST(s AS DOUBLE) / 100.0) * (CAST(s AS DOUBLE) / 100.0)
                  / CAST(n_exc AS DOUBLE))
                / (CAST(n_exc AS DOUBLE) - 1.0) AS s2
            FROM e),
      d AS (SELECT *, m * m / s2 AS ratio FROM c),
      f AS (SELECT *, 0.5 * (1.0 - ratio) AS xi,
              0.5 * m * (1.0 + ratio) AS sigma,
              CAST(n_exc AS DOUBLE) / CAST(n AS DOUBLE) AS zeta
            FROM d)
      SELECT n, n_exc, round(u, 6) AS threshold_p95,
             round(CASE WHEN n_exc >= 1 THEN m END, 6) AS mean_excess,
             round(CASE WHEN n_exc >= 2 AND s2 > 0 THEN xi END, 6) AS xi,
             round(CASE WHEN n_exc >= 2 AND s2 > 0 THEN sigma END, 6)
               AS sigma,
             round(CASE WHEN n_exc >= 2 AND s2 > 0 AND xi <> 0.0
               THEN u + sigma / xi * (power(zeta / 0.001, xi) - 1.0)
               END, 6) AS q999_fitted,
             round(q999e, 6) AS q999_empirical
      FROM f""",

    // RANSAC: 32 hash-seeded 2-point samples (per arm: corpus
    // argmin/argmax of the channel-(301+arm) u01 — replayed exactly),
    // consensus by inlier count at eps centi 2e6, exact-lattice OLS
    // refit on the winning inliers; every double tree mirrored
    "q_ransac_fit" -> """
      WITH b AS (SELECT l_orderkey * 8 + l_linenumber AS id,
              CAST(round(l_quantity * 100, 0) AS BIGINT) AS x,
              CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
            FROM lineitem),
      fan AS (SELECT b.id, b.x, b.y, g.arm,
              CAST(((((b.id + (301 + g.arm) * 1000003) % 2147483647)
                * 48271 % 2147483647) * 48271 % 2147483647) + 1
                AS DOUBLE) / 2147483647.0 AS h
            FROM b, (SELECT unnest(range(0, 32)) AS arm) g),
      p1 AS (SELECT arm, x AS x1, y AS y1 FROM (
              SELECT arm, x, y, row_number() OVER (PARTITION BY arm
                ORDER BY h, id, x, y) AS rn FROM fan) WHERE rn = 1),
      p2 AS (SELECT arm, x AS x2, y AS y2 FROM (
              SELECT arm, x, y, row_number() OVER (PARTITION BY arm
                ORDER BY h DESC, id DESC, x DESC, y DESC) AS rn
              FROM fan) WHERE rn = 1),
      ln AS (SELECT p1.arm, x1, y1, x2, y2, x2 <> x1 AS ok,
              CASE WHEN x2 <> x1 THEN CAST(y2 - y1 AS DOUBLE)
                / CAST(x2 - x1 AS DOUBLE) END AS m
            FROM p1 JOIN p2 ON p1.arm = p2.arm),
      sc AS (SELECT l.arm, l.m, l.x1, l.y1,
              -- degenerate arms (x1 = x2) score the Spark -1 sentinel,
              -- not 0: if every valid arm has zero inliers the two
              -- engines must still elect the same smallest OK arm
              CASE WHEN NOT l.ok THEN CAST(-1 AS BIGINT)
                ELSE CAST(count(CASE WHEN abs(CAST(b.y AS DOUBLE)
                  - (CAST(l.y1 AS DOUBLE)
                     + l.m * CAST(b.x - l.x1 AS DOUBLE))) <= 2000000.0
                  THEN 1 END) AS BIGINT) END AS inl
            FROM b CROSS JOIN ln l GROUP BY 1, 2, 3, 4, l.ok),
      bst AS (SELECT * FROM (SELECT *, row_number() OVER (
              ORDER BY inl DESC, arm) AS rn FROM sc) WHERE rn = 1),
      tg AS (SELECT b.x, b.y, t.arm,
              abs(CAST(b.y AS DOUBLE) - (CAST(t.y1 AS DOUBLE)
                + t.m * CAST(b.x - t.x1 AS DOUBLE))) <= 2000000.0
                AS isin
            FROM b CROSS JOIN bst t),
      f AS (SELECT CAST(min(arm) AS INTEGER) AS best_arm,
              CAST(count(*) AS BIGINT) AS na,
              CAST(coalesce(sum(x), 0) AS BIGINT) AS sxa,
              CAST(coalesce(sum(y), 0) AS BIGINT) AS sya,
              CAST(coalesce(sum(x * y), 0) AS BIGINT) AS sxya,
              CAST(coalesce(sum(x * x), 0) AS BIGINT) AS sxxa,
              CAST(count(CASE WHEN isin THEN 1 END) AS BIGINT) AS ni,
              CAST(coalesce(sum(CASE WHEN isin THEN x END), 0)
                AS BIGINT) AS sxi,
              CAST(coalesce(sum(CASE WHEN isin THEN y END), 0)
                AS BIGINT) AS syi,
              CAST(coalesce(sum(CASE WHEN isin THEN x * y END), 0)
                AS BIGINT) AS sxyi,
              CAST(coalesce(sum(CASE WHEN isin THEN x * x END), 0)
                AS BIGINT) AS sxxi
            FROM tg),
      t2 AS (SELECT *,
              CAST(sxyi AS DOUBLE) - CAST(sxi AS DOUBLE)
                * CAST(syi AS DOUBLE) / CAST(ni AS DOUBLE) AS cxyi,
              CAST(sxxi AS DOUBLE) - CAST(sxi AS DOUBLE)
                * CAST(sxi AS DOUBLE) / CAST(ni AS DOUBLE) AS cxxi,
              CAST(sxya AS DOUBLE) - CAST(sxa AS DOUBLE)
                * CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) AS cxya,
              CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE)
                * CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) AS cxxa
            FROM f),
      t3 AS (SELECT *,
              ni >= 2 AND cxxi > 0 AS oki, na >= 2 AND cxxa > 0 AS oka,
              cxyi / cxxi AS mi, cxya / cxxa AS ma
            FROM t2)
      SELECT best_arm, na AS n, ni AS n_inliers,
             round(CAST(ni AS DOUBLE) / CAST(na AS DOUBLE), 6)
               AS inlier_share,
             round(CASE WHEN oki THEN mi END, 6) AS ransac_slope,
             round(CASE WHEN oki THEN (CAST(syi AS DOUBLE)
                 / CAST(ni AS DOUBLE) - mi * (CAST(sxi AS DOUBLE)
                 / CAST(ni AS DOUBLE))) / 100.0 END, 6)
               AS ransac_intercept,
             round(CASE WHEN oka THEN ma END, 6) AS ols_slope,
             round(CASE WHEN oka THEN (CAST(sya AS DOUBLE)
                 / CAST(na AS DOUBLE) - ma * (CAST(sxa AS DOUBLE)
                 / CAST(na AS DOUBLE))) / 100.0 END, 6)
               AS ols_intercept
      FROM t3""",

    // half-life decayed per-user revenue at the declared as-of: age
    // bucket k = floor(days/7), weight 2^-k applied as a half-up
    // INTEGER shift before the fold — order-free, pow()-free
    "q_decayed_features" -> """
      WITH b AS (SELECT user_id,
              CAST(round(value * 100, 0) AS BIGINT) AS vc,
              CAST(floor(CAST((DATE '2024-01-31' - CAST(ts AS DATE))
                AS DOUBLE) / 7.0) AS INTEGER) AS k
            FROM events
            WHERE CAST(ts AS DATE) <= DATE '2024-01-31'
              AND value IS NOT NULL),
      t AS (SELECT user_id, vc,
              CASE WHEN k >= 48 THEN 0
                   WHEN k = 0 THEN vc
                   ELSE (vc + (CAST(1 AS BIGINT) << (k - 1)))
                     // (CAST(1 AS BIGINT) << k) END AS tv
            FROM b),
      g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(vc) AS BIGINT) AS raw,
              CAST(sum(tv) AS BIGINT) AS dsum
            FROM t GROUP BY 1)
      SELECT user_id, n_events,
             round(raw / 100.0, 2) AS raw_sum,
             round(dsum / 100.0, 2) AS decayed_sum,
             round(CASE WHEN raw > 0 THEN
               CAST(dsum AS DOUBLE) / CAST(raw AS DOUBLE) END, 6)
               AS decay_ratio
      FROM g ORDER BY user_id""",

    // grid-bucketed nearest site: the oracle replays the SEMANTICS
    // (nearest supplier with exact integer dist^2 <= r^2, ties by site
    // id, unmatched kept as NULL) by brute force — the Spark side's
    // 9-cell bucketing is a plan choice that is provably invisible in
    // the result (cell size = radius => 3x3 covers the radius ball)
    "q_geo_nearest" -> s"""
      WITH p AS (SELECT c_custkey,
              CAST(floor(${uk("c_custkey", 171)} * 10000000.0)
                AS BIGINT) AS x,
              CAST(floor(${uk("((c_custkey % 2147483647) * (c_custkey % 2147483647)) % 2147483647", 172)} * 10000000.0)
                AS BIGINT) AS y
            FROM customer),
      st AS (SELECT s_suppkey,
              CAST(floor(${uk("s_suppkey", 173)} * 10000000.0)
                AS BIGINT) AS x,
              CAST(floor(${uk("((s_suppkey % 2147483647) * (s_suppkey % 2147483647)) % 2147483647", 174)} * 10000000.0)
                AS BIGINT) AS y
            FROM supplier),
      cand AS (SELECT p.c_custkey, st.s_suppkey,
              (p.x - st.x) * (p.x - st.x) + (p.y - st.y) * (p.y - st.y)
                AS d2
            FROM p CROSS JOIN st
            WHERE (p.x - st.x) * (p.x - st.x)
              + (p.y - st.y) * (p.y - st.y) <= 640000000000),
      best AS (SELECT c_custkey, s_suppkey, d2, row_number() OVER (
              PARTITION BY c_custkey ORDER BY d2, s_suppkey) AS rn
            FROM cand)
      SELECT p.c_custkey, b.s_suppkey AS nearest_site,
             round(sqrt(CAST(b.d2 AS DOUBLE)) / 10000000.0, 6) AS dist
      FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        USING (c_custkey)
      ORDER BY c_custkey""",

    // variable-n p chart: exact daily counts, binomial 3-sigma limits
    // around the pooled share (sqrt only — IEEE-exact, no lattice)
    "q_p_chart" -> """
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                THEN 1 ELSE 0 END) AS BIGINT) AS x
            FROM orders GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
              CAST(sum(x) AS BIGINT) AS tx FROM daily),
      b AS (SELECT d.day, d.n, d.x,
              CAST(d.x AS DOUBLE) / CAST(d.n AS DOUBLE) AS phat,
              CAST(t.tx AS DOUBLE) / CAST(t.tn AS DOUBLE) AS pbar,
              sqrt((CAST(t.tx AS DOUBLE) / CAST(t.tn AS DOUBLE))
                * (1.0 - CAST(t.tx AS DOUBLE) / CAST(t.tn AS DOUBLE))
                / CAST(d.n AS DOUBLE)) AS se
            FROM daily d, tot t)
      SELECT day, n, x, round(phat, 6) AS p_hat, round(pbar, 6) AS p_bar,
             round(greatest(0.0, pbar - 3.0 * se), 6) AS lcl,
             round(pbar + 3.0 * se, 6) AS ucl,
             (phat >= greatest(0.0, pbar - 3.0 * se)
               AND phat <= pbar + 3.0 * se) AS in_control
      FROM b ORDER BY day""",

    // Oaxaca-Blinder: both groups' exact centi OLS sufficient stats in
    // one pass, twofold split with group N's slope as reference
    "q_oaxaca_blinder" -> """
      WITH f AS (SELECT
              CAST(count(CASE WHEN l_returnflag = 'R' THEN 1 END)
                AS BIGINT) AS na,
              CAST(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN
                CAST(round(l_quantity * 100, 0) AS BIGINT) END), 0)
                AS BIGINT) AS sxa,
              CAST(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN
                CAST(round(l_extendedprice * 100, 0) AS BIGINT) END), 0)
                AS BIGINT) AS sya,
              CAST(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN
                CAST(round(l_quantity * 100, 0) AS HUGEINT)
                * CAST(round(l_extendedprice * 100, 0) AS BIGINT) END),
                0) AS HUGEINT) AS sxya,
              CAST(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN
                CAST(round(l_quantity * 100, 0) AS HUGEINT)
                * CAST(round(l_quantity * 100, 0) AS BIGINT) END), 0)
                AS HUGEINT) AS sxxa,
              CAST(count(CASE WHEN l_returnflag = 'N' THEN 1 END)
                AS BIGINT) AS nb,
              CAST(coalesce(sum(CASE WHEN l_returnflag = 'N' THEN
                CAST(round(l_quantity * 100, 0) AS BIGINT) END), 0)
                AS BIGINT) AS sxb,
              CAST(coalesce(sum(CASE WHEN l_returnflag = 'N' THEN
                CAST(round(l_extendedprice * 100, 0) AS BIGINT) END), 0)
                AS BIGINT) AS syb,
              CAST(coalesce(sum(CASE WHEN l_returnflag = 'N' THEN
                CAST(round(l_quantity * 100, 0) AS HUGEINT)
                * CAST(round(l_extendedprice * 100, 0) AS BIGINT) END),
                0) AS HUGEINT) AS sxyb,
              CAST(coalesce(sum(CASE WHEN l_returnflag = 'N' THEN
                CAST(round(l_quantity * 100, 0) AS HUGEINT)
                * CAST(round(l_quantity * 100, 0) AS BIGINT) END), 0)
                AS HUGEINT) AS sxxb
            FROM lineitem
            WHERE l_returnflag IN ('R', 'N')
              AND l_quantity IS NOT NULL
              AND l_extendedprice IS NOT NULL),
      t AS (SELECT *,
              CAST(sxa AS DOUBLE) / (100.0 * CAST(na AS DOUBLE)) AS mxa,
              CAST(sya AS DOUBLE) / (100.0 * CAST(na AS DOUBLE)) AS mya,
              CAST(sxya AS DOUBLE) - CAST(sxa AS DOUBLE)
                * CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) AS cxya,
              CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE)
                * CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) AS cxxa,
              CAST(sxb AS DOUBLE) / (100.0 * CAST(nb AS DOUBLE)) AS mxb,
              CAST(syb AS DOUBLE) / (100.0 * CAST(nb AS DOUBLE)) AS myb,
              CAST(sxyb AS DOUBLE) - CAST(sxb AS DOUBLE)
                * CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) AS cxyb,
              CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE)
                * CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) AS cxxb
            FROM f),
      u AS (SELECT *,
              na >= 2 AND cxxa > 0 AS oka, nb >= 2 AND cxxb > 0 AS okb,
              cxya / cxxa AS ba, cxyb / cxxb AS bb,
              mya - myb AS gap
            FROM t)
      SELECT na AS n_a, nb AS n_b,
             round(CASE WHEN na >= 1 THEN mya END, 6) AS mean_y_a,
             round(CASE WHEN nb >= 1 THEN myb END, 6) AS mean_y_b,
             round(CASE WHEN na >= 1 AND nb >= 1 THEN gap END, 6)
               AS gap,
             round(CASE WHEN oka THEN ba END, 6) AS beta_a,
             round(CASE WHEN okb THEN bb END, 6) AS beta_b,
             round(CASE WHEN oka AND okb THEN bb * (mxa - mxb) END, 6)
               AS endowment_part,
             round(CASE WHEN oka AND okb
               THEN gap - bb * (mxa - mxb) END, 6) AS coefficient_part,
             round(CASE WHEN oka AND okb AND gap <> 0.0
               THEN bb * (mxa - mxb) / gap END, 6) AS endowment_share
      FROM u""",

    // periodogram: n-scaled centering (no division), per-(day, period)
    // trig on the 1e-9 lattice, exact HUGEINT projections, power shares
    "q_periodogram" -> """
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS yc
            FROM orders GROUP BY 1),
      sq AS (SELECT yc, CAST(row_number() OVER (ORDER BY d) AS BIGINT)
              AS t FROM daily),
      tt AS (SELECT CAST(sum(yc) AS BIGINT) AS s,
              CAST(count(*) AS BIGINT) AS n FROM daily),
      cells AS (SELECT sq.yc * tt.n - tt.s AS yt, sq.t, p.p,
              CAST(round(cos(6.283185307179586 * CAST(sq.t AS DOUBLE)
                / CAST(p.p AS DOUBLE)) * 1e9, 0) AS BIGINT) AS c9,
              CAST(round(sin(6.283185307179586 * CAST(sq.t AS DOUBLE)
                / CAST(p.p AS DOUBLE)) * 1e9, 0) AS BIGINT) AS s9
            FROM sq, tt, (SELECT CAST(unnest(range(2, 31)) AS BIGINT)
              AS p) p),
      proj AS (SELECT p,
              sum(CAST(yt AS HUGEINT) * c9) AS cp,
              sum(CAST(yt AS HUGEINT) * s9) AS sp
            FROM cells GROUP BY p),
      pw AS (SELECT p, CAST(cp AS DOUBLE) * CAST(cp AS DOUBLE)
              + CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) AS pow
            FROM proj),
      r AS (SELECT p, round(pow / sum(pow) OVER (), 6) AS power_share,
              CAST(row_number() OVER (ORDER BY pow DESC, p ASC)
                AS BIGINT) AS rank
            FROM pw)
      SELECT p AS period, power_share, rank, rank = 1 AS dominant
      FROM r ORDER BY period""",

    // 2-component Gaussian EM on the 256-bin lattice histogram:
    // responsibilities commit to 1e-6 per (bin, round) before the exact
    // integer moment folds; component ln-constants commit to 1e-9; three
    // unrolled rounds mirror Learn.gmmEm's trees term for term
    "q_gmm_em" -> gmmSql("""
      gll AS (SELECT
            sum(CAST(h.c AS HUGEINT) * CAST(round(ln(
              pf.w1 * exp(0.0 - (h.mb - pf.mu1) * (h.mb - pf.mu1)
                / (2.0 * pf.v1)) / sqrt(6.283185307179586 * pf.v1)
              + (1.0 - pf.w1) * exp(0.0 - (h.mb - pf.mu2)
                * (h.mb - pf.mu2) / (2.0 * pf.v2))
                / sqrt(6.283185307179586 * pf.v2)) * 1e9, 0)
              AS BIGINT)) AS tll
          FROM hm h, gp3 pf)
      SELECT p.n, round(p.w1, 6) AS w1, round(p.mu1, 6) AS mu1,
             round(sqrt(p.v1), 6) AS sigma1,
             round(1.0 - p.w1, 6) AS w2, round(p.mu2, 6) AS mu2,
             round(sqrt(p.v2), 6) AS sigma2,
             round(CAST(gll.tll AS DOUBLE)
               / (1e9 * CAST(p.n AS DOUBLE)), 6) AS avg_loglik
      FROM gp3 p, gll"""),

    // BIC model selection over the same fit: 2-component vs the single
    // Gaussian with the exact-moment MLE, analytic log-density on the
    // 1e-9 lattice per bin
    "q_gmm_bic" -> gmmSql("""
      mom AS (SELECT n,
              CAST(s AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)) AS mu0,
              (CAST(q AS DOUBLE) / 1e4 - (CAST(s AS DOUBLE) / 1e2)
                * (CAST(s AS DOUBLE) / 1e2) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE) AS v0
            FROM gg0),
      fold AS (SELECT
            sum(CAST(h.c AS HUGEINT) * CAST(round((0.0
              - (h.mb - m.mu0) * (h.mb - m.mu0) / (2.0 * m.v0)
              - 0.5 * ln(6.283185307179586 * m.v0)) * 1e9, 0)
              AS BIGINT)) AS t1,
            sum(CAST(h.c AS HUGEINT) * CAST(round(ln(
              pf.w1 * exp(0.0 - (h.mb - pf.mu1) * (h.mb - pf.mu1)
                / (2.0 * pf.v1)) / sqrt(6.283185307179586 * pf.v1)
              + (1.0 - pf.w1) * exp(0.0 - (h.mb - pf.mu2)
                * (h.mb - pf.mu2) / (2.0 * pf.v2))
                / sqrt(6.283185307179586 * pf.v2)) * 1e9, 0)
              AS BIGINT)) AS t2
          FROM hm h, gp3 pf, mom m)
      SELECT m.n,
             round(CAST(f.t1 AS DOUBLE) / 1e9, 6) AS loglik_1,
             round(CAST(f.t2 AS DOUBLE) / 1e9, 6) AS loglik_2,
             round(2.0 * ln(CAST(m.n AS DOUBLE))
               - 2.0 * (CAST(f.t1 AS DOUBLE) / 1e9), 6) AS bic_1,
             round(5.0 * ln(CAST(m.n AS DOUBLE))
               - 2.0 * (CAST(f.t2 AS DOUBLE) / 1e9), 6) AS bic_2,
             round((2.0 * ln(CAST(m.n AS DOUBLE))
               - 2.0 * (CAST(f.t1 AS DOUBLE) / 1e9))
               - (5.0 * ln(CAST(m.n AS DOUBLE))
               - 2.0 * (CAST(f.t2 AS DOUBLE) / 1e9)), 6) AS delta_bic,
             (5.0 * ln(CAST(m.n AS DOUBLE))
               - 2.0 * (CAST(f.t2 AS DOUBLE) / 1e9))
               < (2.0 * ln(CAST(m.n AS DOUBLE))
               - 2.0 * (CAST(f.t1 AS DOUBLE) / 1e9)) AS prefer_two
      FROM mom m, fold f"""),


    // Kleinberg bursts: all-integer Viterbi (lattice A_q - c*B_q day
    // costs, gamma*ln(n) entry toll) replayed day per day; ties prefer
    // the lower state
    "q_burst_detection" -> """
      WITH RECURSIVE daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(count(*) AS BIGINT) AS c
            FROM orders GROUP BY 1),
      seq AS (SELECT d, c, row_number() OVER (ORDER BY d) AS t
            FROM daily),
      g AS (SELECT CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
              AS lam0, CAST(count(*) AS BIGINT) AS nd FROM daily),
      kk AS (SELECT
              CAST(round(lam0 * 1000000000.0, 0) AS BIGINT) AS a0,
              CAST(round(ln(lam0) * 1000000000.0, 0) AS BIGINT) AS b0,
              CAST(round(lam0 * 2.0 * 1000000000.0, 0) AS BIGINT) AS a1,
              CAST(round(ln(lam0 * 2.0) * 1000000000.0, 0) AS BIGINT)
                AS b1,
              CAST(round(ln(CAST(nd AS DOUBLE)) * 0.5 * 1000000000.0, 0)
                AS BIGINT) AS tc,
              lam0, nd FROM g),
      v AS (
        SELECT 0 AS t, CAST(0 AS BIGINT) AS d0,
               CAST(2305843009213693951 AS BIGINT) AS d1,
               CAST([] AS INTEGER[]) AS p0, CAST([] AS INTEGER[]) AS p1
        UNION ALL
        SELECT q.t,
               (kk.a0 - q.c * kk.b0) + least(v.d0, v.d1),
               (kk.a1 - q.c * kk.b1) + least(v.d0 + kk.tc, v.d1),
               list_append(CASE WHEN v.d0 <= v.d1 THEN v.p0 ELSE v.p1
                 END, 0),
               list_append(CASE WHEN v.d0 + kk.tc <= v.d1 THEN v.p0
                 ELSE v.p1 END, 1)
        FROM v JOIN seq q ON q.t = v.t + 1, kk),
      f AS (SELECT * FROM v WHERE t = (SELECT nd FROM kk)),
      pth AS (SELECT CASE WHEN d0 <= d1 THEN p0 ELSE p1 END AS p FROM f)
      SELECT q.d AS day, q.c AS n_orders,
             CAST(p[q.t] AS INTEGER) AS state,
             round((SELECT lam0 FROM kk), 6) AS lambda_base,
             round((SELECT lam0 * 2.0 FROM kk), 6) AS lambda_burst
      FROM seq q, pth ORDER BY q.d""",

    // Wilcoxon signed-rank: exact centi per-user pre/post totals, zero
    // diffs dropped, doubled midranks over the distinct-|d| grain,
    // tie-corrected normal z
    "q_wilcoxon_signed" -> """
      WITH per AS (SELECT user_id,
              CAST(coalesce(sum(CASE WHEN CAST(ts AS DATE)
                  < DATE '2024-01-15'
                THEN CAST(round(value * 100, 0) AS BIGINT) END), 0)
                AS BIGINT) AS pre,
              CAST(coalesce(sum(CASE WHEN CAST(ts AS DATE)
                  >= DATE '2024-01-15'
                THEN CAST(round(value * 100, 0) AS BIGINT) END), 0)
                AS BIGINT) AS post
            FROM events GROUP BY user_id),
      d AS (SELECT post - pre AS d FROM per WHERE post <> pre),
      pa AS (SELECT abs(d) AS a,
              CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS cp,
              CAST(count(*) AS BIGINT) AS n
            FROM d GROUP BY 1),
      r AS (SELECT *, 2 * coalesce(sum(n) OVER (ORDER BY a
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + n + 1 AS r2
            FROM pa),
      f AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_pairs,
              CAST(coalesce(sum(cp), 0) AS BIGINT) AS n_pos,
              CAST(coalesce(sum(CAST(cp AS HUGEINT) * r2), 0)
                AS HUGEINT) AS w2p,
              CAST(coalesce(sum(CAST(n AS HUGEINT) * n * n - n), 0)
                AS HUGEINT) AS tsum
            FROM r),
      t AS (SELECT *, CAST(n_pairs AS DOUBLE) AS nd,
              CAST(w2p AS DOUBLE) / 2.0 AS wp FROM f),
      v AS (SELECT *, nd * (nd + 1.0) * (2.0 * nd + 1.0) / 24.0
              - CAST(tsum AS DOUBLE) / 48.0 AS varw FROM t)
      SELECT n_pairs, n_pos, n_pairs - n_pos AS n_neg,
             round(CASE WHEN n_pairs >= 1 THEN wp END, 6) AS w_plus,
             round(CASE WHEN n_pairs >= 1
               THEN nd * (nd + 1.0) / 2.0 - wp END, 6) AS w_minus,
             round(CASE WHEN n_pairs >= 1 AND varw > 0
               THEN (wp - nd * (nd + 1.0) / 4.0) / sqrt(varw) END, 6)
               AS z
      FROM v""",

    // radius-bounded LOF brute-forced: same kdist -> reach -> lrd -> lof
    // chain with reach on the 1e-9 lattice and lrd on 1e-6 before each
    // fold; NULL wherever the point or any of its 3 neighbors lacks a
    // full in-radius neighborhood
    "q_lof" -> s"""
      WITH p AS (SELECT c_custkey,
              CAST(floor(${uk("c_custkey", 171)} * 10000000.0)
                AS BIGINT) AS x,
              CAST(floor(${uk("((c_custkey % 2147483647) * (c_custkey % 2147483647)) % 2147483647", 172)} * 10000000.0)
                AS BIGINT) AS y
            FROM customer),
      cand AS (SELECT a.c_custkey AS id, b.c_custkey AS oid,
              (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
            FROM p a CROSS JOIN p b
            WHERE a.c_custkey <> b.c_custkey
              AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= 160000000000),
      counts AS (SELECT id, CAST(count(*) AS BIGINT) AS n_in_radius
            FROM cand GROUP BY id),
      rk AS (SELECT *, row_number() OVER (PARTITION BY id
              ORDER BY d2, oid) AS rn FROM cand),
      knn AS (SELECT * FROM rk WHERE rn <= 3),
      kd AS (SELECT id AS kid, max(d2) AS kd2 FROM knn GROUP BY id
             HAVING count(*) = 3),
      reach AS (SELECT knn.id, knn.oid,
              CAST(round(sqrt(CAST(greatest(knn.d2, kd.kd2) AS DOUBLE))
                / 10000000.0 * 1000000000.0, 0) AS BIGINT) AS r9
            FROM knn JOIN kd ON knn.oid = kd.kid),
      lrd AS (SELECT id AS lid,
              CAST(round(3 * 1000000000.0 / CAST(sum(r9) AS DOUBLE)
                * 1000000.0, 0) AS BIGINT) AS lrd6
            FROM reach GROUP BY id
            HAVING count(*) = 3 AND sum(r9) > 0),
      num AS (SELECT knn.id, CAST(sum(l.lrd6) AS BIGINT) AS slrd
            FROM knn JOIN lrd l ON knn.oid = l.lid
            GROUP BY knn.id HAVING count(*) = 3),
      sc AS (SELECT num.id,
              round(CAST(l.lrd6 AS DOUBLE) / 1000000.0, 6) AS lrd,
              round(CAST(num.slrd AS DOUBLE)
                / (3 * CAST(l.lrd6 AS DOUBLE)), 6) AS lof
            FROM num JOIN lrd l ON num.id = l.lid)
      SELECT p.c_custkey, coalesce(c.n_in_radius, 0) AS n_in_radius,
             sc.lrd, sc.lof
      FROM p LEFT JOIN counts c ON p.c_custkey = c.id
             LEFT JOIN sc ON p.c_custkey = sc.id
      ORDER BY p.c_custkey""",

    // catchment per site: brute-force radius semantics again — count
    // of in-range probes (zero-kept) + nearest probe by (d2, id)
    "q_geo_catchment" -> s"""
      WITH p AS (SELECT c_custkey,
              CAST(floor(${uk("c_custkey", 171)} * 10000000.0)
                AS BIGINT) AS x,
              CAST(floor(${uk("((c_custkey % 2147483647) * (c_custkey % 2147483647)) % 2147483647", 172)} * 10000000.0)
                AS BIGINT) AS y
            FROM customer),
      st AS (SELECT s_suppkey,
              CAST(floor(${uk("s_suppkey", 173)} * 10000000.0)
                AS BIGINT) AS x,
              CAST(floor(${uk("((s_suppkey % 2147483647) * (s_suppkey % 2147483647)) % 2147483647", 174)} * 10000000.0)
                AS BIGINT) AS y
            FROM supplier),
      cand AS (SELECT st.s_suppkey, p.c_custkey,
              (p.x - st.x) * (p.x - st.x) + (p.y - st.y) * (p.y - st.y)
                AS d2
            FROM p CROSS JOIN st
            WHERE (p.x - st.x) * (p.x - st.x)
              + (p.y - st.y) * (p.y - st.y) <= 640000000000),
      agg AS (SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_in_range
            FROM cand GROUP BY 1),
      best AS (SELECT s_suppkey, c_custkey, d2, row_number() OVER (
              PARTITION BY s_suppkey ORDER BY d2, c_custkey) AS rn
            FROM cand)
      SELECT st.s_suppkey,
             coalesce(a.n_in_range, 0) AS n_in_range,
             b.c_custkey AS nearest_probe,
             round(sqrt(CAST(b.d2 AS DOUBLE)) / 10000000.0, 6)
               AS nearest_dist
      FROM st LEFT JOIN agg a ON st.s_suppkey = a.s_suppkey
      LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        ON st.s_suppkey = b.s_suppkey
      ORDER BY st.s_suppkey""",

    "q_geo_coverage" -> s"""
      WITH p AS (SELECT c_custkey,
              CAST(floor(${uk("c_custkey", 171)} * 10000000.0)
                AS BIGINT) AS x,
              CAST(floor(${uk("((c_custkey % 2147483647) * (c_custkey % 2147483647)) % 2147483647", 172)} * 10000000.0)
                AS BIGINT) AS y
            FROM customer),
      st AS (SELECT s_suppkey,
              CAST(floor(${uk("s_suppkey", 173)} * 10000000.0)
                AS BIGINT) AS x,
              CAST(floor(${uk("((s_suppkey % 2147483647) * (s_suppkey % 2147483647)) % 2147483647", 174)} * 10000000.0)
                AS BIGINT) AS y
            FROM supplier),
      cand AS (SELECT p.c_custkey, st.s_suppkey,
              (p.x - st.x) * (p.x - st.x) + (p.y - st.y) * (p.y - st.y)
                AS d2
            FROM p CROSS JOIN st
            WHERE (p.x - st.x) * (p.x - st.x)
              + (p.y - st.y) * (p.y - st.y) <= 640000000000),
      best AS (SELECT c_custkey, s_suppkey, d2, row_number() OVER (
              PARTITION BY c_custkey ORDER BY d2, s_suppkey) AS rn
            FROM cand),
      nr AS (SELECT p.c_custkey, b.s_suppkey AS nearest_site,
              round(sqrt(CAST(b.d2 AS DOUBLE)) / 10000000.0, 6) AS dist
            FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
              USING (c_custkey))
      SELECT CAST(count(*) AS BIGINT) AS n_probes,
             CAST(count(nearest_site) AS BIGINT) AS n_matched,
             round(CAST(count(nearest_site) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS coverage,
             round(CASE WHEN count(nearest_site) > 0 THEN
               CAST(sum(CAST(round(dist * 1000000.0, 0) AS BIGINT))
                 AS DOUBLE)
               / (1000000.0 * CAST(count(nearest_site) AS DOUBLE)) END, 6)
               AS mean_dist
      FROM nr""",


    // leading digit via floor(x / 10^floor(log10 x)); expectation
    // ln(1+1/d)/ln(10) mirrors the Spark operation order exactly
    "q_benford" -> """
      WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
                 WHERE o_totalprice > 0.0),
      d AS (SELECT CAST(floor(x / power(10.0, floor(log10(x))))
                     AS INTEGER) AS digit FROM v),
      g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
      t AS (SELECT digit, n, sum(n) OVER () AS total FROM g),
      c AS (SELECT digit, CAST(n AS BIGINT) AS n,
               round(n / CAST(total AS DOUBLE), 6) AS share,
               round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS expected,
               total * (ln(1.0 + 1.0 / digit) / ln(10.0)) AS expn,
               n AS rawn
            FROM t)
      SELECT digit, n, share, expected,
             round((rawn - expn) * (rawn - expn) / expn, 6) AS chi2_term,
             round(sum((rawn - expn) * (rawn - expn) / expn) OVER (), 6)
               AS chi2_total
      FROM c ORDER BY digit""",


    // centroid silhouette: same cosine shape as x_sql_cosine
    // (list_inner_product over CAST DOUBLE[] mirrors the native
    // single-pass expression bit-for-bit)
    "x_silhouette" -> """
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      x AS (SELECT label, CAST(generate_subscripts(v, 1) AS INTEGER) AS dim,
                   unnest(v) AS comp FROM e),
      cm AS (SELECT label AS cl, dim, avg(comp) AS m FROM x GROUP BY 1, 2),
      cv AS (SELECT cl, list(m ORDER BY dim) AS c FROM cm GROUP BY cl),
      dst AS (SELECT e.vec_id, e.label, cv.cl,
               1.0 - list_inner_product(e.v, cv.c)
                 / (sqrt(list_inner_product(e.v, e.v))
                    * sqrt(list_inner_product(cv.c, cv.c))) AS dist
             FROM e, cv),
      p AS (SELECT vec_id, label,
               min(CASE WHEN cl = label THEN dist END) AS a,
               min(CASE WHEN cl <> label THEN dist END) AS b
            FROM dst GROUP BY 1, 2),
      s AS (SELECT label, a, b,
               CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
                    WHEN b IS NOT NULL THEN 0.0 END AS sil
            FROM p)
      SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
             round(avg(a), 6) AS mean_intra,
             round(avg(b), 6) AS mean_nearest_other,
             round(avg(sil), 6) AS mean_silhouette
      FROM s GROUP BY label ORDER BY label""",


    // 3 unrolled Lloyd supersteps: id-ordered seeds, argmin by
    // (d2, cluster) row_number, ‖v−c‖² expanded as v·v − 2·v·c + c·c in
    // the exact Spark operation order
    // external validation of the same Lloyd run: purity from exact
    // majority counts; MI/NMI folds spelled exactly as q_mutual_info
    "x_cluster_purity" -> (kmeansCtes + """,
      lab AS (SELECT vec_id AS id, CAST(label AS VARCHAR) AS y
              FROM embeddings),
      rows_ AS (SELECT a.cl AS x, l.y FROM a3 a JOIN lab l ON a.id = l.id),
      joint AS (SELECT x, y, CAST(count(*) AS DOUBLE) AS nxy
                FROM rows_ GROUP BY 1, 2),
      pc AS (SELECT x, CAST(max(nxy) AS BIGINT) AS mx,
               CAST(sum(nxy) AS BIGINT) AS sz
             FROM joint GROUP BY x),
      pf AS (SELECT CAST(sum(sz) AS BIGINT) AS n,
               CAST(count(*) AS INTEGER) AS n_clusters,
               round(CAST(sum(mx) AS DOUBLE) / CAST(sum(sz) AS DOUBLE), 6)
                 AS purity
             FROM pc),
      t AS (SELECT nxy / sum(nxy) OVER () AS pxy,
               sum(nxy) OVER (PARTITION BY x) / sum(nxy) OVER () AS px,
               sum(nxy) OVER (PARTITION BY y) / sum(nxy) OVER () AS py
            FROM joint),
      mi AS (SELECT round(sum(pxy * ln(pxy / (px * py))), 6) AS mi_nats,
               round(sum(pxy * ln(pxy / (px * py))) /
                 least(-sum(pxy * ln(px)), -sum(pxy * ln(py))), 6) AS nmi
             FROM t)
      SELECT n, n_clusters, purity, mi_nats, nmi FROM pf, mi"""),


    // Grid-density clusters: floor(coord/eps) cells from the same
    // stored floats, dense >= 3, 8-adjacency recursive closure, integer
    // counts only; sparse remainder as cluster -1
    "x_grid_density_clusters" -> """
      WITH RECURSIVE pts AS (
        SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.02) AS BIGINT)
                 AS cx,
               CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.02) AS BIGINT)
                 AS cy
        FROM embeddings),
      cells AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n
                FROM pts GROUP BY 1, 2),
      dense AS (SELECT (cx + 500000) * 2000000 + (cy + 500000) AS cell,
                       cx, cy, n
                FROM cells WHERE n >= 3),
      edges AS (SELECT a.cell AS src, b.cell AS dst
                FROM dense a JOIN dense b
                  ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
                 AND b.cy BETWEEN a.cy - 1 AND a.cy + 1),
      reach(id, r) AS (
        SELECT cell, cell FROM dense
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id),
      comp AS (SELECT id, CAST(min(r) AS BIGINT) AS component
               FROM reach GROUP BY id),
      clusters AS (
        SELECT c.component AS cluster_id,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(d.n) AS BIGINT) AS n_points
        FROM dense d JOIN comp c ON d.cell = c.id GROUP BY 1),
      noise AS (
        SELECT CAST(-1 AS BIGINT) AS cluster_id,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(coalesce(sum(n), 0) AS BIGINT) AS n_points
        FROM cells WHERE n < 3)
      SELECT * FROM clusters
      UNION ALL SELECT * FROM noise
      ORDER BY cluster_id""",


    "x_kmeans" -> (kmeansCtes + """
      SELECT id AS vec_id, cl AS cluster, round(d2, 6) AS dist2
      FROM a3 ORDER BY vec_id"""),


    // DCG discounts via ln(pos+1)/ln(2) — spelled identically in Spark;
    // IDCG folds the 1..min(rel,k) sequence; no-relevant groups NULL
    "q_ndcg" -> """
      WITH t AS (SELECT user_id, event_id, value,
               CAST(event_type = 'purchase' AND value > 90.0 AS INT)
                 AS rel
            FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY value DESC, event_id) AS pos FROM t),
      g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(rel) AS BIGINT) AS n_relevant,
               sum(CASE WHEN pos <= 10 THEN
                     rel / (ln(CAST(pos AS DOUBLE) + 1.0) / ln(2.0))
                   ELSE 0.0 END) AS dcg_raw
            FROM r GROUP BY user_id),
      disc AS (SELECT i,
               sum(1.0 / (ln(CAST(i AS DOUBLE) + 1.0) / ln(2.0)))
                 OVER (ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
            FROM generate_series(1, 10) AS t(i)),
      i AS (SELECT g.*, CASE WHEN n_relevant > 0 THEN d.cum END
               AS idcg_raw
            FROM g LEFT JOIN disc d ON d.i = least(g.n_relevant, 10))
      SELECT user_id, n_items, n_relevant,
             round(dcg_raw, 6) AS dcg, round(idcg_raw, 6) AS idcg,
             CASE WHEN idcg_raw > 0
               THEN round(dcg_raw / idcg_raw, 6) END AS ndcg
      FROM i ORDER BY user_id""",


    // rank-formula Gini over the ascending (value, entity) order plus
    // Lorenz top-1%/top-10% tail shares
    "q_revenue_gini" -> """
      WITH per AS (SELECT o_custkey AS e, sum(o_totalprice) AS x
                   FROM orders GROUP BY 1),
      r AS (SELECT x,
               CAST(row_number() OVER (ORDER BY x, e) AS BIGINT) AS i,
               count(*) OVER () AS n,
               sum(x) OVER () AS t
            FROM per)
      SELECT CAST(max(n) AS BIGINT) AS n_entities,
             round(max(t), 2) AS total_value,
             round(2.0 * sum(i * x) / (max(n) * max(t))
               - (max(n) + 1) / CAST(max(n) AS DOUBLE), 6) AS gini,
             round(sum(CASE WHEN i > n
                 - CAST(greatest(ceil(n / 100.0), 1.0) AS BIGINT)
               THEN x ELSE 0.0 END) / max(t), 6) AS top1_pct_share,
             round(sum(CASE WHEN i > n
                 - CAST(greatest(ceil(n / 10.0), 1.0) AS BIGINT)
               THEN x ELSE 0.0 END) / max(t), 6) AS top10_pct_share
      FROM r""",


    // Theil T decomposition: centi-lattice entity sums, per-entity and
    // per-group terms on the 1e-12 lattice before every fold, totals
    // additive by construction
    "q_theil" -> """
      WITH lat AS (SELECT n_name AS g, o_custkey AS e,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS vu
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey),
      per AS (SELECT g, e, CAST(sum(vu) AS BIGINT) AS x
              FROM lat GROUP BY 1, 2),
      pos AS (SELECT g, e, x FROM per WHERE x > 0),
      gs AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(x) AS BIGINT) AS sg
             FROM pos GROUP BY 1),
      wi AS (SELECT p.g,
               CAST(sum(CAST(round(
                 CAST(p.x AS DOUBLE)
                   / (CAST(s.sg AS DOUBLE) / CAST(s.ng AS DOUBLE))
                 * ln(CAST(p.x AS DOUBLE)
                   / (CAST(s.sg AS DOUBLE) / CAST(s.ng AS DOUBLE)))
                 * 1e12, 0) AS BIGINT)) AS BIGINT) AS tw
             FROM pos p JOIN gs s ON p.g = s.g GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x) AS BIGINT) AS t
              FROM pos),
      terms AS (SELECT s.g, s.ng, s.sg, w.tw, tot.n, tot.t,
               CAST(round(CAST(s.ng AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * ((CAST(s.sg AS DOUBLE) / CAST(s.ng AS DOUBLE))
                   / (CAST(tot.t AS DOUBLE) / CAST(tot.n AS DOUBLE)))
                 * ln((CAST(s.sg AS DOUBLE) / CAST(s.ng AS DOUBLE))
                   / (CAST(tot.t AS DOUBLE) / CAST(tot.n AS DOUBLE)))
                 * 1e12, 0) AS BIGINT) AS bt,
               CAST(round(CAST(s.ng AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * ((CAST(s.sg AS DOUBLE) / CAST(s.ng AS DOUBLE))
                   / (CAST(tot.t AS DOUBLE) / CAST(tot.n AS DOUBLE)))
                 * (CAST(w.tw AS DOUBLE) / 1e12 / CAST(s.ng AS DOUBLE))
                 * 1e12, 0) AS BIGINT) AS wt
             FROM gs s JOIN wi w ON s.g = w.g, tot),
      tt AS (SELECT CAST(sum(bt) AS BIGINT) AS b,
               CAST(sum(wt) AS BIGINT) AS w
             FROM terms)
      SELECT g AS "group", ng AS n_entities,
             round(CAST(sg AS DOUBLE) / CAST(t AS DOUBLE), 6)
               AS value_share,
             round((CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
               / (CAST(t AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS mean_ratio,
             round(CAST(tw AS DOUBLE) / 1e12 / CAST(ng AS DOUBLE), 6)
               AS theil_within_group,
             round(CAST(bt AS DOUBLE) / 1e12, 6) AS between_term,
             round(CAST(wt AS DOUBLE) / 1e12, 6) AS within_term,
             round(CAST(tt.b AS DOUBLE) / 1e12, 6) AS theil_between,
             round(CAST(tt.w AS DOUBLE) / 1e12, 6) AS theil_within,
             round(CAST(tt.b + tt.w AS DOUBLE) / 1e12, 6) AS theil_total
      FROM terms, tt ORDER BY g""",


    // Lorenz deciles: centi-lattice entity sums, ntile over the exact
    // (value, entity) order, bounded cumulative windows
    "q_lorenz" -> """
      WITH per AS (SELECT o_custkey AS e,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS x
            FROM orders GROUP BY 1),
      b AS (SELECT ntile(10) OVER (ORDER BY x, e) AS d, x FROM per),
      a AS (SELECT d, CAST(count(*) AS BIGINT) AS n_entities,
              CAST(sum(x) AS BIGINT) AS v
            FROM b GROUP BY 1),
      c AS (SELECT d, n_entities, v,
              CAST(sum(n_entities) OVER (ORDER BY d ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
              CAST(sum(v) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cv,
              CAST(sum(n_entities) OVER () AS DOUBLE) AS nd,
              CAST(sum(v) OVER () AS DOUBLE) AS td
            FROM a)
      SELECT d AS decile, n_entities,
             round(CAST(v AS DOUBLE) / 100.0, 2) AS decile_value,
             round(CAST(cn AS DOUBLE) / nd, 6) AS cum_entity_share,
             round(CAST(cv AS DOUBLE) / td, 6) AS cum_value_share,
             round(CAST(cn AS DOUBLE) / nd - CAST(cv AS DOUBLE) / td, 6)
               AS equality_gap
      FROM c ORDER BY decile""",


    // Bradley-Terry: matchups from shared orders, 4 MM supersteps on
    // the exact 1e-9 lattice — every division the half-up
    // (2A+B)//(2B) in HUGEINT, mirroring the Spark decimal chain
    "q_bradley_terry" -> {
      val steps = (1 to 4).map { k =>
        val p = k - 1
        s"""
      t$k AS MATERIALIZED (SELECT pr.i AS node,
              (CAST(pr.nij AS HUGEINT) * 2000000000000000000
                + greatest(wa.wm + wb.wm, 1))
               // (greatest(wa.wm + wb.wm, 1) * 2) AS term
            FROM pairs pr
            JOIN w$p wa ON pr.i = wa.node
            JOIN w$p wb ON pr.j = wb.node),
      d$k AS MATERIALIZED (SELECT node, greatest(sum(term), 1) AS den
              FROM t$k GROUP BY 1),
      r$k AS MATERIALIZED (SELECT nw.node,
              (CAST(nw.n_wins AS HUGEINT) * 2000000000000000000
                + coalesce(d.den, 1)) // (coalesce(d.den, 1) * 2) AS raw
            FROM nw LEFT JOIN d$k d ON nw.node = d.node),
      s$k AS MATERIALIZED (SELECT greatest(sum(raw), 1) AS tot FROM r$k),
      w$k AS MATERIALIZED (SELECT node,
              (CAST(raw AS HUGEINT) * (SELECT np FROM np) * 2000000000
                + (SELECT tot FROM s$k))
               // ((SELECT tot FROM s$k) * 2) AS wm
            FROM r$k)"""
      }.mkString(",")
      s"""
      WITH rev AS MATERIALIZED (SELECT l_orderkey AS ok, l_suppkey AS sk,
              CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                * 100, 0) AS BIGINT)) AS BIGINT) AS rev
            FROM lineitem GROUP BY 1, 2),
      comps AS MATERIALIZED (SELECT
              CASE WHEN a.rev > b.rev THEN a.sk ELSE b.sk END AS w,
              CASE WHEN a.rev > b.rev THEN b.sk ELSE a.sk END AS l
            FROM rev a JOIN rev b ON a.ok = b.ok AND a.sk < b.sk
            WHERE a.rev <> b.rev),
      pairs AS MATERIALIZED (SELECT i, j, CAST(count(*) AS BIGINT) AS nij FROM (
              SELECT w AS i, l AS j FROM comps
              UNION ALL SELECT l, w FROM comps)
            GROUP BY 1, 2),
      wins AS (SELECT w AS node, CAST(count(*) AS BIGINT) AS n_wins
               FROM comps GROUP BY 1),
      nodes AS (SELECT DISTINCT i AS node FROM pairs),
      nw AS MATERIALIZED (SELECT n.node, CAST(coalesce(wi.n_wins, 0) AS BIGINT)
               AS n_wins
             FROM nodes n LEFT JOIN wins wi ON n.node = wi.node),
      np AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS np FROM nodes),
      w0 AS MATERIALIZED (SELECT node, CAST(1000000000 AS HUGEINT) AS wm FROM nodes),
      $steps,
      ncmp AS (SELECT i AS node, CAST(sum(nij) AS BIGINT)
                 AS n_comparisons FROM pairs GROUP BY 1),
      fin AS (SELECT nw.node AS player, nw.n_wins,
              coalesce(nc.n_comparisons, 0) AS n_comparisons,
              CAST((w4.wm * 2 + 1000) // 2000 AS DOUBLE) / 1e6
                AS strength
            FROM nw LEFT JOIN ncmp nc ON nw.node = nc.node
            JOIN w4 ON nw.node = w4.node)
      SELECT player, n_wins, CAST(n_comparisons AS BIGINT)
               AS n_comparisons, strength,
             CAST(row_number() OVER (ORDER BY strength DESC, player)
               AS BIGINT) AS "rank"
      FROM fin ORDER BY "rank""""
    },


    // Inequality ratios: centi-lattice entity sums, exact integer
    // floor-division rank cutoffs, fixed share/ratio trees
    "q_inequality_ratios" -> """
      WITH per AS (SELECT o_custkey AS e,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS x
            FROM orders GROUP BY 1),
      r AS (SELECT x, row_number() OVER (ORDER BY x, e) AS rn,
              count(*) OVER () AS n FROM per),
      f AS (SELECT CAST(max(n) AS BIGINT) AS n_entities,
              CAST(sum(x) AS BIGINT) AS tot,
              CAST(coalesce(sum(CASE WHEN rn <= (5 * n) // 10
                THEN x END), 0) AS BIGINT) AS b50,
              CAST(coalesce(sum(CASE WHEN rn <= (4 * n) // 10
                THEN x END), 0) AS BIGINT) AS b40,
              CAST(coalesce(sum(CASE WHEN rn <= (2 * n) // 10
                THEN x END), 0) AS BIGINT) AS b20,
              CAST(coalesce(sum(CASE WHEN rn > (9 * n) // 10
                THEN x END), 0) AS BIGINT) AS t10,
              CAST(coalesce(sum(CASE WHEN rn > (8 * n) // 10
                THEN x END), 0) AS BIGINT) AS t20,
              CAST(coalesce(sum(CASE WHEN rn > (99 * n) // 100
                THEN x END), 0) AS BIGINT) AS t01
            FROM r)
      SELECT n_entities,
             round(CAST(tot AS DOUBLE) / 100.0, 2) AS total_value,
             round(CAST(b50 AS DOUBLE) / CAST(tot AS DOUBLE), 6)
               AS bottom50_share,
             round(CAST(t10 AS DOUBLE) / CAST(tot AS DOUBLE), 6)
               AS top10_share,
             round(CAST(t01 AS DOUBLE) / CAST(tot AS DOUBLE), 6)
               AS top1_share,
             round(CASE WHEN b40 > 0 THEN CAST(t10 AS DOUBLE) /
               CAST(b40 AS DOUBLE) END, 6) AS palma_ratio,
             round(CASE WHEN b20 > 0 THEN CAST(t20 AS DOUBLE) /
               CAST(b20 AS DOUBLE) END, 6) AS s80s20_ratio
      FROM f""",


    // CA over fixed-width lattice bins of acctbal (no ntile sort):
    // per-lattice-value counts -> integer bins -> same six sufficient
    // stats and the same close tree
    "q_cochran_armitage_binned" -> {
      val nD = "CAST(n AS DOUBLE)"
      val p = s"CAST(successes AS DOUBLE) / $nD"
      val tD = "CAST(t AS DOUBLE)"
      val e = s"($p) * CAST(sn1 AS DOUBLE)"
      val sxx = s"(CAST(sn2 AS DOUBLE) - CAST(sn1 AS DOUBLE) * sn1 / $nD)"
      val varT = s"(($p) * (1.0 - ($p)) * $sxx)"
      s"""
      WITH buyers AS (SELECT DISTINCT o_custkey FROM orders),
      base AS (SELECT CAST(c_acctbal AS DOUBLE) AS f,
                 (b.o_custkey IS NOT NULL) AS y
               FROM customer LEFT JOIN buyers b ON c_custkey = b.o_custkey
               WHERE c_acctbal IS NOT NULL
                 AND NOT isnan(CAST(c_acctbal AS DOUBLE))),
      pv AS (SELECT CAST(round(f * 100, 0) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS succ
             FROM base GROUP BY 1),
      bnd AS (SELECT min(v) AS lo, max(v) AS hi FROM pv),
      pb AS (SELECT ((v - lo) * 10) // (hi - lo + 1) AS s,
               CAST(sum(cnt) AS BIGINT) AS cnt,
               CAST(sum(succ) AS BIGINT) AS succ
             FROM pv, bnd GROUP BY 1),
      f AS (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n,
              CAST(coalesce(sum(succ), 0) AS BIGINT) AS successes,
              CAST(count(*) AS BIGINT) AS n_groups,
              CAST(coalesce(sum(succ * s), 0) AS BIGINT) AS t,
              CAST(coalesce(sum(cnt * s), 0) AS BIGINT) AS sn1,
              CAST(coalesce(sum(cnt * s * s), 0) AS BIGINT) AS sn2
            FROM pb)
      SELECT n, successes, n_groups, t AS t_stat,
             round(CASE WHEN $varT > 0
               THEN ($tD - $e) / sqrt($varT) END, 6) AS z,
             round(CASE WHEN $varT > 0
               THEN ($tD - $e) * ($tD - $e) / $varT END, 6) AS chi2_trend,
             round(CASE WHEN $sxx > 0
               THEN ($tD - $e) / $sxx END, 6) AS prop_slope
      FROM f"""
    },

    // Binned Lorenz shares: per-customer totals -> lattice bins ->
    // cumulative over <=1000 rows, whole-bin quantile shares (top
    // shares as total minus the below-cumulative, mirroring the Scala)
    "q_inequality_binned" -> """
      WITH per AS (SELECT o_custkey AS e,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS x
            FROM orders GROUP BY 1),
      bnd AS (SELECT min(x) AS lo, max(x) AS hi FROM per),
      pb AS (SELECT ((x - lo) * 1000) // (hi - lo + 1) AS b,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(x) AS BIGINT) AS v
             FROM per, bnd GROUP BY 1),
      c AS (SELECT b, v,
              CAST(sum(cnt) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS ccnt,
              CAST(sum(v) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cval,
              CAST(sum(cnt) OVER () AS BIGINT) AS n
            FROM pb),
      f AS (SELECT CAST(max(n) AS BIGINT) AS n_entities,
              CAST(sum(v) AS BIGINT) AS tot,
              CAST(coalesce(max(CASE WHEN ccnt <= (5 * n) // 10
                THEN cval END), 0) AS BIGINT) AS b50,
              CAST(coalesce(max(CASE WHEN ccnt <= (4 * n) // 10
                THEN cval END), 0) AS BIGINT) AS b40,
              CAST(coalesce(max(CASE WHEN ccnt <= (2 * n) // 10
                THEN cval END), 0) AS BIGINT) AS b20,
              CAST(coalesce(max(CASE WHEN ccnt <= (9 * n) // 10
                THEN cval END), 0) AS BIGINT) AS b90,
              CAST(coalesce(max(CASE WHEN ccnt <= (8 * n) // 10
                THEN cval END), 0) AS BIGINT) AS b80,
              CAST(coalesce(max(CASE WHEN ccnt <= (99 * n) // 100
                THEN cval END), 0) AS BIGINT) AS b99
            FROM c)
      SELECT n_entities,
             round(CAST(tot AS DOUBLE) / 100.0, 2) AS total_value,
             round(CAST(b50 AS DOUBLE) / CAST(tot AS DOUBLE), 6)
               AS bottom50_share,
             round((CAST(tot AS DOUBLE) - CAST(b90 AS DOUBLE))
               / CAST(tot AS DOUBLE), 6) AS top10_share,
             round((CAST(tot AS DOUBLE) - CAST(b99 AS DOUBLE))
               / CAST(tot AS DOUBLE), 6) AS top1_share,
             round(CASE WHEN b40 > 0
               THEN (CAST(tot AS DOUBLE) - CAST(b90 AS DOUBLE))
                 / CAST(b40 AS DOUBLE) END, 6) AS palma_ratio,
             round(CASE WHEN b20 > 0
               THEN (CAST(tot AS DOUBLE) - CAST(b80 AS DOUBLE))
                 / CAST(b20 AS DOUBLE) END, 6) AS s80s20_ratio
      FROM f""",

    // Wilson interval: exact user-grain (n, k) longs, one fixed double
    // tree with z and z^2 interpolated verbatim (the tau^2 lesson)
    "q_wilson_ci" -> {
      val z = 1.959963984540054
      val z2 = z * z
      s"""
      WITH users AS (SELECT user_id % 8 AS segment, user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS conv
            FROM events GROUP BY 1, 2),
      per AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(conv) AS BIGINT) AS n_converted
              FROM users GROUP BY 1),
      t AS (SELECT segment, n_users, n_converted,
              CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS p,
              CAST(n_users AS DOUBLE) AS nd
            FROM per),
      w AS (SELECT segment, n_users, n_converted, p,
              (p + $z2 / (2.0 * nd)) / (1.0 + $z2 / nd) AS center,
              $z * sqrt((p * (1.0 - p) + $z2 / (4.0 * nd)) / nd) /
                (1.0 + $z2 / nd) AS half
            FROM t)
      SELECT segment, n_users, n_converted,
             round(p, 6) AS rate,
             round(center - half, 6) AS wilson_lo,
             round(center + half, 6) AS wilson_hi,
             round((center + half) - (center - half), 6) AS wilson_width
      FROM w ORDER BY segment"""
    },


    // TOPSIS: lattice criteria, exact HUGEINT norm sums, fixed distance
    // trees, rank over the ROUNDED closeness with id tiebreak
    "q_topsis_suppliers" -> {
      def sq(a: String, b: String) = s"($a - $b) * ($a - $b)"
      val dp = s"sqrt(${sq("r0", "p0")} + ${sq("r1", "p1")}"
        .concat(s" + ${sq("r2", "p2")})")
      val dm = s"sqrt(${sq("r0", "q0")} + ${sq("r1", "q1")}"
        .concat(s" + ${sq("r2", "q2")})")
      s"""
      WITH per AS (SELECT l_suppkey AS s_suppkey,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                 * 100, 0) AS BIGINT)) AS BIGINT) AS x0,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS x1,
               CAST(sum(CAST(round(l_discount * 10000, 0) AS BIGINT))
                 AS BIGINT) AS x2
            FROM lineitem GROUP BY 1),
      s AS (SELECT sum(CAST(x0 AS HUGEINT) * x0) AS s0,
              sum(CAST(x1 AS HUGEINT) * x1) AS s1,
              sum(CAST(x2 AS HUGEINT) * x2) AS s2
            FROM per),
      r AS MATERIALIZED (SELECT s_suppkey,
              CAST(x0 AS DOUBLE) / sqrt(CAST(s0 AS DOUBLE)) AS r0,
              CAST(x1 AS DOUBLE) / sqrt(CAST(s1 AS DOUBLE)) AS r1,
              CAST(x2 AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) AS r2
            FROM per, s),
      i AS (SELECT max(r0) AS p0, max(r1) AS p1, min(r2) AS p2,
              min(r0) AS q0, min(r1) AS q1, max(r2) AS q2
            FROM r),
      sc AS (SELECT s_suppkey, r0, r1, r2,
               CASE WHEN $dp + $dm > 0
                 THEN $dm / ($dp + $dm) ELSE 0.0 END AS cls
             FROM r, i)
      SELECT s_suppkey,
             round(r0, 6) AS norm_revenue,
             round(r1, 6) AS norm_n_orders,
             round(r2, 6) AS norm_discount_bp,
             round(cls, 6) AS closeness,
             CAST(row_number() OVER (ORDER BY round(cls, 6) DESC,
               s_suppkey) AS BIGINT) AS "rank"
      FROM sc ORDER BY "rank""""
    },


    // HHI per nation market: centi-lattice row revenue, exact entity and
    // market sums, share-squared terms on the 1e-12 lattice before the
    // per-market fold
    "q_hhi" -> """
      WITH lat AS (SELECT n_name AS m, s_suppkey AS e,
               CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0)
                 AS BIGINT) AS vu
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey),
      per AS (SELECT m, e, CAST(sum(vu) AS BIGINT) AS x
              FROM lat GROUP BY 1, 2),
      pos AS (SELECT m, e, x FROM per WHERE x > 0),
      terms AS (SELECT m, x,
               CAST(sum(x) OVER (PARTITION BY m) AS BIGINT) AS t,
               CAST(x AS DOUBLE)
                 / CAST(sum(x) OVER (PARTITION BY m) AS DOUBLE) AS sh
            FROM pos),
      h AS (SELECT m, t, sh,
               CAST(round(sh * sh * 1e12, 0) AS BIGINT) AS hterm
            FROM terms)
      SELECT m AS market,
             CAST(count(*) AS BIGINT) AS n_entities,
             round(CAST(max(t) AS DOUBLE) / 100.0, 2) AS market_value,
             round(CAST(sum(hterm) AS DOUBLE) / 1e12, 6) AS hhi,
             round(1e12 / CAST(sum(hterm) AS DOUBLE), 6) AS effective_n,
             round(max(sh), 6) AS top_share
      FROM h GROUP BY m ORDER BY market""",


    // WOE over smoothed class shares (s=0.5 spread across K observed
    // categories — the dsirWeights smoothing convention), IV fold over
    // the K-row frame
    "q_woe_encoding" -> """
      WITH per AS (SELECT event_type AS category,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN value > 90.0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_pos
            FROM events GROUP BY 1),
      t AS (SELECT category, n, n_pos, n - n_pos AS n_neg,
               (n_pos + 0.5)
                 / (sum(n_pos) OVER () + 0.5 * count(*) OVER ()) AS ps,
               (n - n_pos + 0.5)
                 / (sum(n - n_pos) OVER () + 0.5 * count(*) OVER ()) AS ns
            FROM per),
      w AS (SELECT category, n, n_pos, n_neg,
               ln(ps) - ln(ns) AS woe_raw,
               (ps - ns) * (ln(ps) - ln(ns)) AS iv_raw
            FROM t)
      SELECT category, n, n_pos, n_neg, round(woe_raw, 6) AS woe,
             round(iv_raw, 6) AS iv_term,
             round(sum(iv_raw) OVER (), 6) AS iv_total
      FROM w ORDER BY category""",


    // ordered wedge join (a<b<c) + closure semi-join — each triangle
    // found once, credited to all three corners
    "q_triangles" -> """
      WITH base AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS sk
                    FROM lineitem),
      e AS (SELECT a.sk AS a, b.sk AS b FROM base a JOIN base b
            ON a.bk = b.bk AND a.sk < b.sk
            GROUP BY 1, 2 HAVING count(*) >= 10),
      deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
              (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
              GROUP BY node),
      w AS (SELECT e1.a, e1.b, e2.b AS c
            FROM e e1 JOIN e e2 ON e1.b = e2.a),
      t AS (SELECT w.a, w.b, w.c FROM w WHERE EXISTS
            (SELECT 1 FROM e WHERE e.a = w.a AND e.b = w.c)),
      pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM
             (SELECT a AS node FROM t UNION ALL SELECT b FROM t
              UNION ALL SELECT c FROM t) GROUP BY node)
      SELECT d.node AS s_suppkey, d.degree,
             CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
             round(CASE WHEN d.degree >= 2 THEN
                 2.0 * coalesce(p.triangles, 0)
                   / CAST(d.degree * (d.degree - 1) AS DOUBLE)
               ELSE 0.0 END, 6) AS clustering_coeff
      FROM deg d LEFT JOIN pn p ON d.node = p.node
      ORDER BY s_suppkey""",


    // link prediction over non-edges of the 1995 part co-order graph:
    // the same ordered wedge join as q_triangles, with each wedge's
    // Adamic-Adar term committed to the 1e-6 integer lattice BEFORE the
    // sum so the fold is exact long addition on both engines; global
    // top-500 elected on the exact lattice score with (u, v) tie-break
    "q_link_prediction" -> """
      WITH base AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS sk
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                      AND o_orderdate < TIMESTAMP '1996-01-01'),
      e AS (SELECT a.sk AS a, b.sk AS b FROM base a JOIN base b
            ON a.bk = b.bk AND a.sk < b.sk GROUP BY 1, 2),
      deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
              (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
              GROUP BY node),
      adj AS (SELECT adj0.w, adj0.n,
                     CAST(CASE WHEN d.deg >= 2 THEN
                       round(1000000.0 / ln(CAST(d.deg AS DOUBLE)), 0)
                       ELSE 0.0 END AS BIGINT) AS aa_m
              FROM (SELECT a AS w, b AS n FROM e
                    UNION ALL SELECT b, a FROM e) adj0
              JOIN deg d ON adj0.w = d.node),
      pairs AS (SELECT l.n AS u, r.n AS v,
                       CAST(count(*) AS BIGINT) AS common_neighbors,
                       CAST(sum(l.aa_m) AS BIGINT) AS aa_m
                FROM adj l JOIN adj r ON l.w = r.w AND l.n < r.n
                GROUP BY 1, 2 HAVING count(*) >= 2),
      cand AS (SELECT p.* FROM pairs p WHERE NOT EXISTS
               (SELECT 1 FROM e WHERE e.a = p.u AND e.b = p.v)),
      top AS (SELECT c.u, c.v, c.common_neighbors, c.aa_m,
                     du.deg AS du, dv.deg AS dv
              FROM cand c JOIN deg du ON c.u = du.node
                          JOIN deg dv ON c.v = dv.node
              ORDER BY c.aa_m DESC, c.u, c.v LIMIT 500)
      SELECT u, v, common_neighbors,
             round(aa_m / 1000000.0, 6) AS adamic_adar,
             round(CAST(common_neighbors AS DOUBLE)
               / CAST(du + dv - common_neighbors AS DOUBLE), 6) AS jaccard
      FROM top ORDER BY u, v""",


    // k-anonymity audit over QI (mktsegment, nationkey), threshold 10
    "q_k_anonymity" -> """
      WITH c AS (SELECT c_mktsegment, c_nationkey, count(*) AS class_size
                 FROM customer GROUP BY 1, 2)
      SELECT CAST(count(*) AS BIGINT) AS n_classes,
             CAST(sum(class_size) AS BIGINT) AS n_rows,
             CAST(min(class_size) AS BIGINT) AS k_anonymity,
             CAST(sum(CASE WHEN class_size < 10 THEN 1 ELSE 0 END)
               AS BIGINT) AS classes_below_k,
             CAST(sum(CASE WHEN class_size < 10 THEN class_size ELSE 0 END)
               AS BIGINT) AS rows_below_k
      FROM c""",


    // the suppression worklist: QI combos below k=8, most identifying first
    "q_k_offenders" -> """
      SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS class_size
      FROM customer GROUP BY 1, 2 HAVING count(*) < 8
      ORDER BY class_size, c_mktsegment, c_nationkey""",


    // l-diversity of banded acctbal (width 2000) within each QI class
    "q_l_diversity" -> """
      WITH cs AS (SELECT c_mktsegment, c_nationkey,
                    count(DISTINCT floor(c_acctbal / 2000.0) * 2000.0)
                      AS l_div,
                    count(*) AS class_size
                  FROM customer GROUP BY 1, 2)
      SELECT CAST(count(*) AS BIGINT) AS n_classes,
             CAST(min(l_div) AS BIGINT) AS l_diversity,
             CAST(sum(CASE WHEN l_div < 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_l,
             CAST(sum(CASE WHEN l_div < 4 THEN class_size ELSE 0 END)
               AS BIGINT) AS rows_below_l
      FROM cs""",


    // t-closeness: per-class TVD to the global sensitive distribution via
    // the positive-part identity (sum of greatest(p_c - p_g, 0) over
    // OBSERVED pairs only — exact, no outer join against the domain)
    "q_t_closeness" -> """
      WITH j AS (SELECT c_mktsegment, c_nationkey,
                   floor(c_acctbal / 2000.0) * 2000.0 AS sens,
                   CAST(count(*) AS DOUBLE) AS nqs
                 FROM customer GROUP BY 1, 2, 3),
      g AS (SELECT floor(c_acctbal / 2000.0) * 2000.0 AS sens,
                   CAST(count(*) AS DOUBLE) AS ns
            FROM customer GROUP BY 1),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM customer),
      jw AS (SELECT j.*, sum(nqs) OVER
               (PARTITION BY c_mktsegment, c_nationkey) AS cls_n
             FROM j),
      cls AS (SELECT c_mktsegment, c_nationkey,
                sum(greatest(nqs / cls_n - ns / n.n, 0.0)) AS tvd,
                CAST(min(cls_n) AS BIGINT) AS class_size
              FROM jw JOIN g USING (sens) CROSS JOIN n
              GROUP BY 1, 2)
      SELECT CAST(count(*) AS BIGINT) AS n_classes,
             round(max(tvd), 6) AS t_closeness,
             CAST(sum(CASE WHEN tvd > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_above_t,
             CAST(sum(CASE WHEN tvd > 0.2 THEN class_size ELSE 0 END)
               AS BIGINT) AS rows_above_t
      FROM cls""",


    // per-source boilerplate bigrams: distinct (doc, bigram) first (the
    // Spark side dedups shingles within a doc), then doc-frequency >= 3
    "x_boilerplate_ngrams" -> """
      WITH arr AS (SELECT doc_id, source,
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 t -> t <> '') AS w
             FROM documents),
      pos AS (SELECT doc_id, source, generate_subscripts(w, 1) AS idx,
                     unnest(w) AS term FROM arr),
      bgrams AS (SELECT DISTINCT doc_id, source, shingle FROM (
          SELECT doc_id, source,
                 term || ' ' || lead(term)
                   OVER (PARTITION BY doc_id ORDER BY idx) AS shingle
          FROM pos) WHERE shingle IS NOT NULL)
      SELECT source, shingle, CAST(count(*) AS BIGINT) AS doc_freq
      FROM bgrams GROUP BY 1, 2 HAVING count(*) >= 3
      ORDER BY source, doc_freq DESC, shingle""",


    // per-doc share of distinct bigrams that are source-boilerplate
    "x_boilerplate_ratio" -> """
      WITH arr AS (SELECT doc_id, source,
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 t -> t <> '') AS w
             FROM documents),
      pos AS (SELECT doc_id, source, generate_subscripts(w, 1) AS idx,
                     unnest(w) AS term FROM arr),
      bgrams AS (SELECT DISTINCT doc_id, source, shingle FROM (
          SELECT doc_id, source,
                 term || ' ' || lead(term)
                   OVER (PARTITION BY doc_id ORDER BY idx) AS shingle
          FROM pos) WHERE shingle IS NOT NULL),
      boiler AS (SELECT source, shingle FROM bgrams
                 GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT b.doc_id, b.source, CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN bo.shingle IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_boiler,
             round(sum(CASE WHEN bo.shingle IS NOT NULL THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 6) AS boiler_ratio
      FROM bgrams b
      LEFT JOIN boiler bo ON b.source = bo.source AND b.shingle = bo.shingle
      GROUP BY b.doc_id, b.source ORDER BY b.doc_id""",


    // sketch-store rollup: exact weekly distinct replayed; the HLL-union
    // estimate-within-max(5, 3%) boolean is deterministically TRUE
    // (register merges are commutative maxes; these cardinalities sit in
    // the sketch's near-exact range)
    "q_sketch_weekly" -> """
      SELECT date_trunc('week', CAST(ts AS DATE)) AS bucket,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
             TRUE AS approx_ok
      FROM events GROUP BY 1 ORDER BY bucket""",


    // histogram-store quantile readout: same bins, cumulative counts and
    // first-candidate interpolation as Sketches.rollupQuantiles (arg_min
    // on bin = the min(struct(bin, est)) election)
    "q_histogram_weekly" -> """
      WITH h AS (
        SELECT date_trunc('week', CAST(ts AS DATE)) AS bucket,
               least(599, greatest(0, CAST(floor(value) AS INTEGER))) AS bin,
               count(*) AS cnt
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2),
      c AS (
        SELECT bucket, bin, cnt,
               sum(cnt) OVER (PARTITION BY bucket ORDER BY bin) AS cum,
               sum(cnt) OVER (PARTITION BY bucket) AS total
        FROM h)
      SELECT bucket,
             round(arg_min(bin + (ceil(total * 0.5) - (cum - cnt))
                 / CAST(cnt AS DOUBLE), bin)
               FILTER (cum >= ceil(total * 0.5)), 6) AS p50,
             round(arg_min(bin + (ceil(total * 0.95) - (cum - cnt))
                 / CAST(cnt AS DOUBLE), bin)
               FILTER (cum >= ceil(total * 0.95)), 6) AS p95
      FROM c GROUP BY bucket ORDER BY bucket""",


    // time-to-convert: first view -> first purchase at-or-after it
    "q_time_to_convert" -> """
      WITH f AS (SELECT user_id, min(ts) AS t0 FROM events
                 WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.ts) AS t1
            FROM events e JOIN f ON e.user_id = f.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= f.t0
            GROUP BY 1),
      l AS (SELECT f.user_id,
              date_diff('microsecond', f.t0, c.t1) / 1000000.0 AS lat
            FROM f LEFT JOIN c ON f.user_id = c.user_id)
      SELECT CAST(count(*) AS BIGINT) AS n_from,
             CAST(count(lat) AS BIGINT) AS n_converted,
             round(count(lat) / CAST(count(*) AS DOUBLE), 6)
               AS conversion_rate,
             round(avg(lat), 6) AS avg_latency_s,
             round(quantile_cont(lat, 0.5), 6) AS p50_latency_s,
             round(quantile_cont(lat, 0.9), 6) AS p90_latency_s
      FROM l""",


    // Freedman-Diaconis histogram sizing (same expression tree)
    "q_histogram_config" -> """
      WITH s AS (SELECT CAST(count(value) AS BIGINT) AS n,
               min(value) AS lo, max(value) AS hi,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
             FROM events WHERE value IS NOT NULL)
      SELECT n AS n_values, round(lo, 6) AS lo, round(hi, 6) AS hi,
             round(q3 - q1, 6) AS iqr,
             round(2.0 * (q3 - q1) / cbrt(n), 6) AS fd_width,
             CAST(CASE WHEN q3 - q1 > 0 AND hi > lo
               THEN least(10000, greatest(2, CAST(ceil((hi - lo)
                 / (2.0 * (q3 - q1) / cbrt(n))) AS BIGINT)))
               ELSE 2 END AS BIGINT) AS n_bins
      FROM s""",


    // backfill grid: latest order per customer as of each cutoff
    "q_snapshot_series" -> """
      WITH cuts AS (SELECT unnest([TIMESTAMP '1996-12-31 23:59:59',
               TIMESTAMP '1998-12-31 23:59:59',
               TIMESTAMP '2000-12-31 23:59:59']) AS cutoff),
      r AS (SELECT c.cutoff, o.o_custkey, o.o_orderdate, o.o_orderkey,
               o.o_totalprice, o.o_orderstatus,
               row_number() OVER (PARTITION BY c.cutoff, o.o_custkey
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
            FROM orders o CROSS JOIN cuts c
            WHERE o.o_orderdate <= c.cutoff)
      SELECT cutoff, o_custkey, o_orderdate, o_orderkey, o_totalprice,
             o_orderstatus
      FROM r WHERE rn = 1 ORDER BY cutoff, o_custkey""",


    // store-side PSI: same 600-bin day grid, Laplace smoothing and
    // (p-q)·ln(p/q) fold as Sketches.psiFromStore
    "q_psi_from_store" -> """
      WITH h AS (SELECT CAST(ts AS DATE) AS day,
               least(599, greatest(0, CAST(floor(value) AS INTEGER)))
                 AS bin, count(*) AS cnt
             FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      ref AS (SELECT bin, sum(cnt) AS ref_cnt FROM h
              WHERE day BETWEEN DATE '2024-01-01' AND DATE '2024-01-07'
              GROUP BY 1),
      rt AS (SELECT CAST(sum(ref_cnt) AS DOUBLE) AS ref_tot FROM ref),
      dt AS (SELECT day, sum(cnt) AS day_total FROM h GROUP BY 1),
      grid AS (SELECT d.day, gs.b AS bin
               FROM (SELECT DISTINCT day FROM h) d
               CROSS JOIN generate_series(0, 599) gs(b)),
      j AS (SELECT g.day,
               (coalesce(h.cnt, 0) + 1.0)
                 / (CAST(dt.day_total AS DOUBLE) + 600) AS p,
               (coalesce(ref.ref_cnt, 0) + 1.0) / (rt.ref_tot + 600) AS q
            FROM grid g
            LEFT JOIN h ON g.day = h.day AND g.bin = h.bin
            LEFT JOIN ref ON g.bin = ref.bin
            JOIN dt ON g.day = dt.day, rt)
      SELECT day, round(sum((p - q) * ln(p / q)), 6) AS psi
      FROM j GROUP BY day ORDER BY day""",


    // sketch-store retention: exact week-over-week retained users
    // replayed; the inclusion-exclusion tolerance boolean is
    // deterministically TRUE (coupon-list-exact sketches at these
    // cardinalities)
    "q_sketch_retention" -> """
      WITH wk AS (
        SELECT DISTINCT date_trunc('week', CAST(ts AS DATE)) AS week,
               user_id AS k
        FROM events)
      SELECT a.week AS week_a, a.week + 7 AS week_b,
             CAST(count(*) AS BIGINT) AS exact_retained,
             TRUE AS retained_ok
      FROM wk a JOIN wk b ON a.k = b.k AND b.week = a.week + 7
      GROUP BY a.week ORDER BY week_a""",


    // grouped histogram-store quantiles: q_histogram_weekly with the
    // event_type dimension in every partition/group
    "q_histogram_by_type" -> """
      WITH h AS (
        SELECT date_trunc('week', CAST(ts AS DATE)) AS bucket,
               event_type AS grp,
               least(599, greatest(0, CAST(floor(value) AS INTEGER))) AS bin,
               count(*) AS cnt
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2, 3),
      c AS (
        SELECT bucket, grp, bin, cnt,
               sum(cnt) OVER (PARTITION BY bucket, grp ORDER BY bin) AS cum,
               sum(cnt) OVER (PARTITION BY bucket, grp) AS total
        FROM h)
      SELECT bucket, grp,
             round(arg_min(bin + (ceil(total * 0.5) - (cum - cnt))
                 / CAST(cnt AS DOUBLE), bin)
               FILTER (cum >= ceil(total * 0.5)), 6) AS p50,
             round(arg_min(bin + (ceil(total * 0.95) - (cum - cnt))
                 / CAST(cnt AS DOUBLE), bin)
               FILTER (cum >= ceil(total * 0.95)), 6) AS p95
      FROM c GROUP BY bucket, grp ORDER BY bucket, grp""",


    // CDC apply: last change per key wins; keys whose last change is a
    // tombstone ('error') vanish from the snapshot
    "q_cdc_apply" -> """
      WITH r AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN event_type = 'error' THEN 'delete'
                    ELSE 'upsert' END AS op,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, ts, event_id, event_type, value
      FROM r WHERE rn = 1 AND op <> 'delete'
      ORDER BY user_id""",


    // missingness patterns over the flagship feature table (presence mask
    // order: primary_k, avg_view_value, click_through_rate, conversion_rate)
    "q_null_patterns" -> s"""
      WITH h AS (
        SELECT user_id, $clickAggs
        FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id, time_bucket(INTERVAL '1 hour', ts)),
      m AS (SELECT
        (CASE WHEN primary_k IS NULL THEN '0' ELSE '1' END ||
         CASE WHEN avg_view_value IS NULL THEN '0' ELSE '1' END ||
         CASE WHEN click_through_rate IS NULL THEN '0' ELSE '1' END ||
         CASE WHEN conversion_rate IS NULL THEN '0' ELSE '1' END) AS pattern
        FROM h)
      SELECT pattern, CAST(count(*) AS BIGINT) AS n_rows,
             round(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 6)
               AS share
      FROM m GROUP BY pattern ORDER BY n_rows DESC, pattern""",


    // partition-continuity audit over the distinct-day table
    "q_partition_gaps" -> """
      WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day
                 FROM orders),
      g AS (SELECT day,
              date_diff('day', lag(day) OVER (ORDER BY day), day) AS gap
            FROM d)
      SELECT min(day) AS first_day, max(day) AS last_day,
             CAST(count(*) AS BIGINT) AS days_present,
             CAST(date_diff('day', min(day), max(day)) + 1 - count(*)
               AS BIGINT) AS days_missing,
             CAST(coalesce(max(gap) - 1, 0) AS BIGINT) AS largest_gap_days
      FROM g""",


    // backfill work-list: calendar spine minus present days
    "q_backfill_plan" -> """
      WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day
                 FROM orders),
      spine AS (SELECT unnest(generate_series(
                  (SELECT min(day) FROM d), (SELECT max(day) FROM d),
                  INTERVAL 1 DAY))::DATE AS day)
      SELECT day FROM spine
      WHERE day NOT IN (SELECT day FROM d)
      ORDER BY day""",


    // export manifest: the same per-partition XOR-of-row-hashes replayed
    // straight from events (write/read round trip must be content-neutral)
    "s_export_manifest" -> """
      SELECT CAST(ts AS DATE) AS event_date,
             bit_xor(CAST(CAST(concat('0x', substr(md5(
               concat_ws(chr(1),
                 coalesce(CAST(event_id AS VARCHAR), chr(2)),
                 coalesce(CAST(user_id AS VARCHAR), chr(2)),
                 coalesce(event_type, chr(2)),
                 coalesce(props, chr(2)))), 1, 15)) AS BIGINT) AS BIGINT))
               AS fingerprint,
             count(*) AS n_rows
      FROM events GROUP BY 1 ORDER BY event_date""",


    // rendezvous re-sharding 8 -> 10: per-doc argmax of md5(doc:shard)
    // weights on both shard counts; movement must target NEW shards only
    "q_shard_movement" -> """
      WITH docs AS (SELECT doc_id FROM documents),
      w8 AS (SELECT doc_id, arg_max(gs.s, CAST(concat('0x',
               substr(md5(doc_id || ':' || gs.s), 1, 15)) AS BIGINT))
               AS shard_from
             FROM docs CROSS JOIN generate_series(0, 7) gs(s)
             GROUP BY doc_id),
      w10 AS (SELECT doc_id, arg_max(gs.s, CAST(concat('0x',
               substr(md5(doc_id || ':' || gs.s), 1, 15)) AS BIGINT))
               AS shard_to
             FROM docs CROSS JOIN generate_series(0, 9) gs(s)
             GROUP BY doc_id)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN shard_from <> shard_to THEN 1 ELSE 0 END)
               AS BIGINT) AS n_moved,
             round(sum(CASE WHEN shard_from <> shard_to THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 6) AS moved_share,
             min(CASE WHEN shard_from <> shard_to
                 THEN shard_to >= 8 END) AS moved_only_to_new
      FROM w8 JOIN w10 USING (doc_id)""",


    // histogram-rank normalization: same bins/cumulative/within-bin
    // fraction as Sketches.rankNormalize
    "q_rank_normalize" -> """
      WITH h AS (
        SELECT least(599, greatest(0, CAST(floor(value) AS INTEGER)))
                 AS bin, count(*) AS cnt
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum,
                   sum(cnt) OVER () AS total FROM h)
      SELECT e.event_id, e.value,
             -- scale-0 round of the 1e6-scaled estimate (engine parity:
             -- the raw rank is a rational over 100*total, so round(x, 6)
             -- sits on exact boundaries)
             round((((c.cum - c.cnt) + least(1.0, greatest(0.0,
               e.value - c.bin)) * c.cnt) / c.total) * 1e6, 0) / 1e6
               AS rank_est
      FROM events e
      JOIN c ON least(599, greatest(0, CAST(floor(e.value) AS INTEGER)))
                = c.bin
      ORDER BY e.event_id""",


    // per-user OLS trend over daily purchase revenue: the SAME plain
    // sufficient-sum closed form as Stats.trendPerKey (NOT regr_* —
    // engine-internal co-moment algorithms differ at ~1e-8 and flake the
    // 6-decimal hash; n·Σx²−(Σx)² is integer-exact on both engines)
    // deterministic Poisson bootstrap: identical resamples from the
    // shared u01 hash (replicate index as channel), exact Poisson(1)
    // CDF inversion, percentile CI over the 200 replicate means
    "q_bootstrap_ci" -> """
      WITH p AS (SELECT event_id, value FROM events
                 WHERE event_type = 'purchase'),
      pt AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                    round(sum(value) / count(*), 6) AS point_mean FROM p),
      r AS (SELECT b, value,
              CAST((h3 * h3) % 2147483647 + 1 AS DOUBLE)
                / 2147483647.0 AS u
            FROM (SELECT b, value,
                    (((h1 * h1 % 2147483647) + 12345) % 2147483647)
                      * 48271 % 2147483647 AS h3
                  FROM (SELECT t.b AS b, p.value AS value,
                          (p.event_id + t.b * 1000003) % 2147483647 AS h1
                        FROM p CROSS JOIN range(0, 200) t(b)))),
      w AS (SELECT b, value,
              CASE WHEN u <= 0.36787944117144233 THEN 0
                   WHEN u <= 0.7357588823428847 THEN 1
                   WHEN u <= 0.9196986029286058 THEN 2
                   WHEN u <= 0.9810118431238462 THEN 3
                   WHEN u <= 0.9963401531726563 THEN 4
                   WHEN u <= 0.9994058151824183 THEN 5
                   WHEN u <= 0.9999167588507642 THEN 6
                   ELSE 7 END AS w
            FROM r),
      m AS (SELECT b, sum(w * value) / nullif(sum(w), 0) AS mu
            FROM w GROUP BY b),
      ci AS (SELECT round(quantile_cont(mu, 0.025), 6) AS ci_lo,
                    round(quantile_cont(mu, 0.975), 6) AS ci_hi,
                    round(stddev(mu), 6) AS boot_se,
                    CAST(count(mu) AS BIGINT) AS n_reps
             FROM m)
      SELECT pt.n_rows, pt.point_mean, ci.n_reps, ci.ci_lo, ci.ci_hi,
             ci.boot_se
      FROM pt, ci""",


    // Theil-Sen robust trend: median pairwise slope (9-rounded before
    // the median so both engines interpolate identical values), median
    // residual intercept; keys without an x-distinct pair keep NULLs
    "q_theilsen_trend" -> """
      WITH d AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 AS DOUBLE) AS x,
               CAST(round(sum(value), 2) AS DOUBLE) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))),
      sl AS (SELECT a.user_id,
                    round((b.y - a.y) / (b.x - a.x), 9) AS slope
             FROM d a JOIN d b
               ON a.user_id = b.user_id AND a.x < b.x),
      sm AS (SELECT user_id, quantile_cont(slope, 0.5) AS m,
                    CAST(count(*) AS BIGINT) AS n_pairs
             FROM sl GROUP BY user_id)
      SELECT d.user_id, CAST(count(*) AS BIGINT) AS n_points,
             coalesce(CAST(min(sm.n_pairs) AS BIGINT), 0) AS n_pairs,
             round(min(sm.m), 6) AS slope,
             round(quantile_cont(d.y - sm.m * d.x, 0.5), 6) AS intercept
      FROM d LEFT JOIN sm ON d.user_id = sm.user_id
      GROUP BY d.user_id ORDER BY d.user_id""",


    // per-brand discount elasticity: BOTH axes integer (x = percent bin,
    // y = centi-quantity mean) so every OLS sum is exact in any order
    "q_price_elasticity" -> """
      WITH d AS (
        SELECT p.p_brand,
               CAST(round(l.l_discount * 100) AS INTEGER) AS x,
               CAST(round(avg(l.l_quantity) * 100) AS BIGINT) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2),
      s AS (
        SELECT p_brand, CAST(count(x) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM d GROUP BY p_brand)
      SELECT p_brand, n AS n_points,
             round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
               THEN (n * sxy - sx * sy)
                    / CAST(n * sxx - sx * sx AS DOUBLE) END, 6) AS slope,
             round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
               THEN (sy * sxx - sx * sxy)
                    / CAST(n * sxx - sx * sx AS DOUBLE) END, 6)
               AS intercept,
             round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
                         AND n * syy - sy * sy > 0
               THEN (CAST(n * sxy - sx * sy AS DOUBLE)
                     * CAST(n * sxy - sx * sy AS DOUBLE))
                    / (CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE)) END, 6) AS r2
      FROM s ORDER BY p_brand""",


    "q_trend_per_key" -> """
      WITH d AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               sum(CAST(round(value * 100) AS BIGINT)) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2),
      s AS (
        SELECT user_id, CAST(count(x) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM d GROUP BY user_id)
      SELECT user_id, n AS n_points,
             round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
               THEN (n * sxy - sx * sy)
                    / CAST(n * sxx - sx * sx AS DOUBLE) END, 6) AS slope,
             round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
               THEN (sy * sxx - sx * sxy)
                    / CAST(n * sxx - sx * sx AS DOUBLE) END, 6)
               AS intercept,
             round(CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
                         AND n * syy - sy * sy > 0
               THEN (CAST(n * sxy - sx * sy AS DOUBLE)
                     * CAST(n * sxy - sx * sy AS DOUBLE))
                    / (CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE)) END, 6) AS r2
      FROM s ORDER BY user_id""",


    // uniform k-frame sampling offsets (same left-to-right double
    // arithmetic as the Spark expression -> bit-identical floors)
    "x_frame_sample" -> """
      SELECT doc_id, CAST(gs.f AS INTEGER) AS frame_no,
             CAST(floor((gs.f + 0.5) / 4.0 * round(n_chars / 50.0, 2)
               * 30.0) AS BIGINT) AS frame_idx,
             round(floor((gs.f + 0.5) / 4.0 * round(n_chars / 50.0, 2)
               * 30.0) / 30.0, 6) AS t_offset_s
      FROM documents CROSS JOIN generate_series(0, 3) gs(f)
      ORDER BY doc_id, frame_no""",


    // schema evolution: gen1 (even keys) lacks the eur column, gen2 (odd
    // keys) carries it — the merged read must NULL-fill gen1
    "s_schema_evolution" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_eur,
             round(sum(o_totalprice), 2) AS usd_total,
             round(sum(CASE WHEN o_orderkey % 2 = 1
               THEN round(o_totalprice * 0.92, 2) END), 2) AS eur_total
      FROM orders""",


    // cascading erasure: lineitem is hit THROUGH the purged orders
    "q_forget_cascade" -> """
      WITH reqs AS (
        SELECT DISTINCT c_custkey AS uid FROM customer
        WHERE c_custkey % 100 = 0
        UNION SELECT 1000000 AS uid),
      po AS (SELECT DISTINCT o_orderkey FROM orders
             WHERE o_custkey IN (SELECT uid FROM reqs)),
      m AS (
        SELECT 'customer' AS table_name, count(*) AS n_total,
               count(r.uid) AS n_purged
        FROM customer c LEFT JOIN reqs r ON c.c_custkey = r.uid
        UNION ALL
        SELECT 'orders', count(*), count(r.uid)
        FROM orders o LEFT JOIN reqs r ON o.o_custkey = r.uid
        UNION ALL
        SELECT 'lineitem', count(*), count(p.o_orderkey)
        FROM lineitem l LEFT JOIN po p ON l.l_orderkey = p.o_orderkey
        UNION ALL
        SELECT 'events', count(*), count(r.uid)
        FROM events e LEFT JOIN reqs r ON e.user_id = r.uid)
      SELECT table_name, CAST(n_total AS BIGINT) AS n_total,
             CAST(n_purged AS BIGINT) AS n_purged,
             CAST(n_total - n_purged AS BIGINT) AS n_retained,
             round(n_purged / CAST(n_total AS DOUBLE), 6) AS purge_share
      FROM m ORDER BY table_name""",


    // 3 unrolled peel rounds at k=3 over the w>=5 co-order graph
    "q_supplier_kcore" -> """
      WITH base AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS sk
                    FROM lineitem),
      canon AS (SELECT a.sk AS a, b.sk AS b FROM base a JOIN base b
                ON a.bk = b.bk AND a.sk < b.sk
                GROUP BY 1, 2 HAVING count(*) >= 5),
      s0 AS (SELECT a AS u, b AS v FROM canon
             UNION ALL SELECT b, a FROM canon),
      k1 AS (SELECT u FROM s0 GROUP BY u HAVING count(*) >= 3),
      s1 AS (SELECT s.u, s.v FROM s0 s
             JOIN k1 x ON s.u = x.u JOIN k1 y ON s.v = y.u),
      k2 AS (SELECT u FROM s1 GROUP BY u HAVING count(*) >= 3),
      s2 AS (SELECT s.u, s.v FROM s1 s
             JOIN k2 x ON s.u = x.u JOIN k2 y ON s.v = y.u),
      k3 AS (SELECT u FROM s2 GROUP BY u HAVING count(*) >= 3),
      s3 AS (SELECT s.u, s.v FROM s2 s
             JOIN k3 x ON s.u = x.u JOIN k3 y ON s.v = y.u)
      SELECT u AS s_suppkey, CAST(count(*) AS BIGINT) AS degree
      FROM s3 GROUP BY u ORDER BY s_suppkey""",


    // 4-round multi-source BFS over the same co-order graph, min-plus
    // supersteps unrolled: d{t} = min(d{t-1}, 1 + d{t-1} ∘ edges)
    // seed-sampled harmonic centrality: the BFS unroll keyed by
    // (node, seed); each 1/d term on the 1e-6 lattice before the fold
    "q_harmonic_centrality" -> """
      WITH base AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS sk
                    FROM lineitem),
      e AS (SELECT DISTINCT a.sk AS src, b.sk AS dst FROM base a
            JOIN base b ON a.bk = b.bk AND a.sk <> b.sk),
      d0 AS (SELECT s_suppkey AS node, s_suppkey AS seed,
                    CAST(0 AS BIGINT) AS d
             FROM supplier WHERE s_suppkey % 17 = 0),
      d1 AS (SELECT node, seed, min(d) AS d FROM (
               SELECT node, seed, d FROM d0
               UNION ALL
               SELECT e.dst, x.seed, x.d + 1 FROM e JOIN d0 x
               ON e.src = x.node)
             GROUP BY node, seed),
      d2 AS (SELECT node, seed, min(d) AS d FROM (
               SELECT node, seed, d FROM d1
               UNION ALL
               SELECT e.dst, x.seed, x.d + 1 FROM e JOIN d1 x
               ON e.src = x.node)
             GROUP BY node, seed),
      d3 AS (SELECT node, seed, min(d) AS d FROM (
               SELECT node, seed, d FROM d2
               UNION ALL
               SELECT e.dst, x.seed, x.d + 1 FROM e JOIN d2 x
               ON e.src = x.node)
             GROUP BY node, seed)
      SELECT node AS s_suppkey, CAST(count(*) AS BIGINT) AS n_seeds_reached,
             round(CAST(sum(CAST(round(1000000.0 / d, 0) AS BIGINT))
               AS BIGINT) / 1000000.0, 6) AS harmonic
      FROM d3 WHERE d > 0 GROUP BY node ORDER BY s_suppkey""",


    "q_supplier_bfs" -> """
      WITH base AS (SELECT DISTINCT l_orderkey AS bk, l_suppkey AS sk
                    FROM lineitem),
      e AS (SELECT DISTINCT a.sk AS src, b.sk AS dst FROM base a
            JOIN base b ON a.bk = b.bk AND a.sk <> b.sk),
      d0 AS (SELECT s_suppkey AS node, CAST(0 AS BIGINT) AS hops
             FROM supplier WHERE s_suppkey % 17 = 0),
      d1 AS (SELECT node, min(hops) AS hops FROM (
               SELECT node, hops FROM d0
               UNION ALL
               SELECT e.dst, d.hops + 1 FROM e JOIN d0 d ON e.src = d.node)
             GROUP BY node),
      d2 AS (SELECT node, min(hops) AS hops FROM (
               SELECT node, hops FROM d1
               UNION ALL
               SELECT e.dst, d.hops + 1 FROM e JOIN d1 d ON e.src = d.node)
             GROUP BY node),
      d3 AS (SELECT node, min(hops) AS hops FROM (
               SELECT node, hops FROM d2
               UNION ALL
               SELECT e.dst, d.hops + 1 FROM e JOIN d2 d ON e.src = d.node)
             GROUP BY node),
      d4 AS (SELECT node, min(hops) AS hops FROM (
               SELECT node, hops FROM d3
               UNION ALL
               SELECT e.dst, d.hops + 1 FROM e JOIN d3 d ON e.src = d.node)
             GROUP BY node)
      SELECT node AS s_suppkey, CAST(hops AS BIGINT) AS hops
      FROM d4 ORDER BY s_suppkey""",


    "x_bpe_merges" -> bpeSql(
      (1 to graft.ops.Bpe.OracleK).map(i =>
        s"SELECT $i AS rank, l AS left_sym, r AS right_sym, l||r AS merged" +
          s" FROM m$i").mkString(" UNION ALL ") + " ORDER BY rank"),


    "x_bpe_tokens" -> bpeSql(s"""
      SELECT doc_id, n_words,
             CAST(len(string_split(trim(s), ' ')) - (n_words - 1)
               AS BIGINT) AS n_tokens,
             round((len(string_split(trim(s), ' ')) - (n_words - 1))
               / CAST(n_words AS DOUBLE), 6) AS fertility,
             replace(replace(s, ' ', ''), chr(1), '') = norm AS roundtrip_ok
      FROM d${graft.ops.Bpe.OracleK} ORDER BY doc_id"""),


    // 3 unrolled full-batch logistic-GD supersteps (zero init, η=0.5,
    // intercept prepended): gradient = sum(resid·x)/count with the
    // division spelled explicitly, weight update via list_transform —
    // the exact Learn.logisticGD expression tree
    // split-conformal audit: groupwise-mean model on split 0, exact
    // k-th-smallest calibration residual on split 1 (rank election —
    // ties share the value, so the elected q-hat is unique), coverage
    // of pred ± q-hat on split 2
    "x_conformal" -> """
      WITH m AS (SELECT event_type, sum(value) / count(*) AS pred
                 FROM events WHERE event_id % 3 = 0 GROUP BY 1),
      sc AS (SELECT e.event_id, e.event_id % 3 AS split,
                    round(abs(e.value - m.pred), 6) AS resid
             FROM events e JOIN m USING (event_type)
             WHERE e.event_id % 3 <> 0),
      cal AS (SELECT resid FROM sc WHERE split = 1),
      st AS (SELECT count(*) AS n,
                    least(CAST(ceil((count(*) + 1) * 0.9) AS BIGINT),
                          count(*)) AS k
             FROM cal),
      rk AS (SELECT resid, row_number() OVER (ORDER BY resid) AS rnk
             FROM cal),
      q AS (SELECT round(rk.resid, 6) AS qhat, st.n AS n_cal
            FROM rk, st WHERE rk.rnk = st.k),
      t AS (SELECT resid FROM sc WHERE split = 2)
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(q.n_cal AS BIGINT) AS n_cal,
             q.qhat AS q_hat,
             0.9 AS target_coverage,
             round(sum(CASE WHEN t.resid <= q.qhat THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 6) AS coverage,
             round(sum(CASE WHEN t.resid <= q.qhat THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE), 6) >= 0.9 AS covered
      FROM t, q GROUP BY q.n_cal, q.qhat""",


    "x_lr_importance" -> {
      val std = "sqrt(CAST(CAST(n AS HUGEINT) * svv" +
        " - CAST(sv AS HUGEINT) * sv AS DOUBLE)" +
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / 1e6"
      lrCtes + s""",
      wd AS (SELECT CAST(generate_subscripts(w, 1) AS INTEGER) - 1 AS dim,
               unnest(w) AS wv FROM w3),
      st AS (SELECT CAST(generate_subscripts(x, 1) AS INTEGER) - 1 AS dim,
               CAST(round(unnest(x) * 1e6, 0) AS BIGINT) AS vu FROM e),
      sg AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(vu) AS BIGINT) AS sv,
               sum(CAST(vu AS HUGEINT) * vu) AS svv
             FROM st GROUP BY dim),
      im AS (SELECT s.dim, round(wd.wv, 6) AS weight,
               round($std, 6) AS feature_std,
               round(abs(wd.wv) * ($std), 6) AS importance
             FROM sg s JOIN wd ON s.dim = wd.dim)
      SELECT dim, weight, feature_std, importance,
             CAST(row_number() OVER (ORDER BY importance DESC, dim)
               AS INTEGER) AS rank
      FROM im ORDER BY dim"""
    },


    "x_lr_scores" -> (lrCtes + """
      SELECT e.id AS vec_id, e.y,
             round(list_inner_product(w.w, e.x), 6) AS margin,
             round(1.0 / (1.0 + exp(-list_inner_product(w.w, e.x))), 6)
               AS prob,
             CAST(1.0 / (1.0 + exp(-list_inner_product(w.w, e.x))) >= 0.5
               AS INT) AS pred
      FROM e, w3 w ORDER BY vec_id"""),


    // confident-learning label-noise screen: class-conditional mean-prob
    // thresholds over the same lr pipeline, comparisons on rounded probs
    "x_label_noise" -> (lrCtes + """
      , scored AS (
        SELECT e.id AS vec_id, e.y,
               round(1.0 / (1.0 + exp(-list_inner_product(w.w, e.x))), 6)
                 AS prob
        FROM e, w3 w),
      th AS (
        SELECT round(avg(CASE WHEN y = 1 THEN prob END), 6) AS t1,
               round(avg(CASE WHEN y = 0 THEN prob END), 6) AS t0
        FROM scored),
      flagged AS (
        SELECT s.vec_id, s.y, s.prob,
               CASE WHEN s.y = 0 AND s.prob >= th.t1 THEN 1
                    WHEN s.y = 1 AND s.prob <= th.t0 THEN 0 END
                 AS suspected_label
        FROM scored s, th)
      SELECT vec_id, y, prob, suspected_label,
             round(CASE WHEN y = 1 THEN 1.0 - prob ELSE prob END, 6)
               AS noise_score
      FROM flagged WHERE suspected_label IS NOT NULL
      ORDER BY noise_score DESC, vec_id"""),


    // exact water-filling replay: price-ordered prefix sums, the unique
    // valid capped-prefix candidate (p_j <= c_j < p_{j+1}), the j=0 and
    // all-capped edges split out exactly as Sampling.mixtureWaterfill
    // computes them; weights are integer-valued doubles so every sum is
    // FP-exact in any accumulation order
    "x_mixture_waterfill" -> """
      WITH per AS (SELECT source AS domain,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split_regex(trim(text), '\s+')))
                 AS BIGINT) AS supply_tokens
             FROM documents GROUP BY source),
      per2 AS (SELECT *, CAST(CAST(substr(domain, 4) AS INTEGER) + 1
                 AS DOUBLE) AS weight FROM per),
      tot AS (SELECT CAST(sum(supply_tokens) AS DOUBLE) AS stot,
                sum(weight) AS wtot FROM per2),
      pr AS (SELECT p.*, t.stot, t.wtot, 1.2 * t.stot AS budget,
               2.0 * supply_tokens / weight AS price FROM per2 p, tot t),
      rk AS (SELECT *,
               row_number() OVER (ORDER BY price, domain) AS rnk,
               sum(CAST(supply_tokens AS DOUBLE)) OVER (
                 ORDER BY price, domain
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_pfx,
               sum(weight) OVER (ORDER BY price, domain
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w_pfx,
               lead(price, 1) OVER (ORDER BY price, domain) AS p_next
             FROM pr),
      cand AS (SELECT *, (budget - 2.0 * s_pfx) / (wtot - w_pfx) AS c,
                 budget / wtot AS c0 FROM rk),
      lv AS (SELECT coalesce(
               min(CASE WHEN rnk = 1 AND c0 < price THEN c0 END),
               min(CASE WHEN price <= c AND (p_next IS NULL OR c < p_next)
                     AND wtot > w_pfx THEN c END),
               max(CASE WHEN p_next IS NULL AND budget >= 2.0 * s_pfx
                     THEN price END)) AS level FROM cand)
      SELECT domain, n_docs, supply_tokens, weight,
             round(price, 6) AS price,
             round(level, 6) AS water_level,
             round(least(2.0 * supply_tokens, level * weight), 2)
               AS alloc_tokens,
             round(least(2.0 * supply_tokens, level * weight)
               / CAST(supply_tokens AS DOUBLE), 6) AS epochs,
             price <= level AS capped
      FROM pr, lv ORDER BY domain""",


    // NFC + U+FFFD strip + C0/DEL strip + space/tab collapse, byte
    // counts throughout (code-unit conventions differ across engines;
    // octet_length does not) — mirrors TextAnalysis.normalizeText
    "x_text_normalize" -> """
      WITH n AS (SELECT doc_id, text, nfc_normalize(text) AS nfc
                 FROM documents),
      r AS (SELECT *, replace(nfc, chr(65533), '') AS norepl FROM n),
      c AS (SELECT *, regexp_replace(norepl,
              '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS noctrl
            FROM r),
      f AS (SELECT *, trim(regexp_replace(noctrl, '[ \t]+', ' ', 'g'))
              AS clean FROM c)
      SELECT doc_id,
             CAST(strlen(text) AS INTEGER) AS bytes_raw,
             CAST(strlen(clean) AS INTEGER) AS bytes_clean,
             text <> nfc AS nfc_changed,
             CAST((strlen(nfc) - strlen(norepl)) / 3 AS INTEGER)
               AS n_replacement,
             CAST(strlen(norepl) - strlen(noctrl) AS INTEGER) AS n_control,
             md5(clean) AS clean_md5
      FROM f ORDER BY doc_id""",


    // reliability bins over the ROUNDED probabilities; gap/ECE chain
    // from the rounded bin aggregates (kappa/gini precedent)
    "x_lr_calibration" -> (lrCtes + """,
      sc AS (SELECT e.y,
               round(1.0 / (1.0 + exp(-list_inner_product(w.w, e.x))), 6)
                 AS prob
             FROM e, w3 w),
      b AS (SELECT CAST(least(floor(prob * 10), 9) AS INTEGER) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(prob) / CAST(count(*) AS DOUBLE), 6) AS mean_prob,
               round(sum(CAST(y AS DOUBLE)) / CAST(count(*) AS DOUBLE), 6)
                 AS frac_pos
            FROM sc GROUP BY 1),
      g AS (SELECT *, round(abs(mean_prob - frac_pos), 6) AS gap,
               CAST(sum(n) OVER () AS DOUBLE) AS t FROM b),
      e2 AS (SELECT round(sum(n / t * gap), 6) AS ece FROM g)
      SELECT bin, n, mean_prob, frac_pos, gap,
             round(n / t, 6) AS share, e2.ece
      FROM g, e2 ORDER BY bin"""),


    // metrics chained from the ROUNDED margin (the cross-engine-stable
    // quantity; see Learn.logisticMetrics scaladoc) — pred from the
    // unrounded sigmoid exactly as the scores query computes it
    "x_lr_metrics" -> (lrCtes + """,
      sc AS (SELECT e.y,
               round(list_inner_product(w.w, e.x), 6) AS m,
               CAST(1.0 / (1.0 + exp(-list_inner_product(w.w, e.x)))
                 >= 0.5 AS INT) AS pred
             FROM e, w3 w)
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             round(sum(CAST(pred = y AS DOUBLE))
               / CAST(count(*) AS DOUBLE), 6) AS accuracy,
             round(sum(CASE WHEN y = 1 THEN ln(1.0 + exp(-m))
               ELSE ln(1.0 + exp(m)) END)
               / CAST(count(*) AS DOUBLE), 6) AS log_loss
      FROM sc"""),

    // ---- round-9 binned rank/ECDF twins (the latticeBin chain) ------------
    // Each replays the Scala delegation exactly: latticeBin first, then
    // the SAME midrank/dominance fold as the exact sibling over the bin
    // grain (v = bin id for order-only stats, repr/100 where magnitudes
    // matter).

    // Jonckheere-Terpstra: 2U from count-grain pair folds, HW 6.19
    // tie-corrected variance, fixed double tree mirroring the Scala
    "q_jonckheere" -> {
      val gs = Seq("view", "click", "signup", "purchase")
      val k = gs.size
      val inList = gs.map(g => s"'$g'").mkString(", ")
      val caseCols = gs.zipWithIndex.map { case (g, i) =>
        s"CAST(sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END) AS BIGINT) AS c$i"
      }.mkString(",\n               ")
      val cumCols = gs.indices.map(i =>
        s"coalesce(sum(c$i) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED " +
          s"PRECEDING AND 1 PRECEDING), 0) AS b$i").mkString(",\n               ")
      val nv = gs.indices.map(i => s"c$i").mkString(" + ")
      val pairTerm = (for { i <- 0 until k; j <- (i + 1) until k } yield
        s"CAST(c$j AS HUGEINT) * b$i * 2 + CAST(c$i AS HUGEINT) * c$j")
        .mkString(" + ")
      val nSums = gs.indices.map(i =>
        s"CAST(sum(c$i) AS BIGINT) AS n$i").mkString(", ")
      val nTot = gs.indices.map(i => s"n$i").mkString(" + ")
      val nD = s"CAST($nTot AS DOUBLE)"
      val g1 = gs.indices.map(i =>
        s"CAST(n$i AS HUGEINT) * (n$i - 1) * (2 * n$i + 5)").mkString(" + ")
      val g2 = gs.indices.map(i =>
        s"CAST(n$i AS HUGEINT) * (n$i - 1) * (n$i - 2)").mkString(" + ")
      val g3 = gs.indices.map(i =>
        s"CAST(n$i AS HUGEINT) * (n$i - 1)").mkString(" + ")
      val ssq = gs.indices.map(i =>
        s"CAST(n$i AS HUGEINT) * n$i").mkString(" + ")
      val eJt = s"($nD * $nD - CAST($ssq AS DOUBLE)) / 4.0"
      val varJt =
        s"(($nD * ($nD - 1.0) * ($nD * 2.0 + 5.0) - CAST(t1 AS DOUBLE)" +
        s" - CAST($g1 AS DOUBLE)) / 72.0" +
        s" + CAST(t2 AS DOUBLE) * CAST($g2 AS DOUBLE)" +
        s" / (36.0 * $nD * ($nD - 1.0) * ($nD - 2.0))" +
        s" + CAST(t3 AS DOUBLE) * CAST($g3 AS DOUBLE)" +
        s" / (8.0 * $nD * ($nD - 1.0)))"
      val jt = "CAST(u2 AS DOUBLE) / 2.0"
      val nGCols = gs.zipWithIndex.map { case (g, i) => s"n$i AS n_$g" }
        .mkString(", ")
      s"""
      WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IN ($inList) AND value IS NOT NULL),
      pv AS (SELECT v,
               $caseCols
             FROM base GROUP BY v),
      cumc AS (SELECT *,
               $cumCols
             FROM pv),
      f AS (SELECT $nSums,
              sum($pairTerm) AS u2,
              sum(CAST($nv AS HUGEINT) * (($nv) - 1) * (2 * ($nv) + 5))
                AS t1,
              sum(CAST($nv AS HUGEINT) * (($nv) - 1) * (($nv) - 2)) AS t2,
              sum(CAST($nv AS HUGEINT) * (($nv) - 1)) AS t3
            FROM cumc)
      SELECT CAST($nTot AS BIGINT) AS n, $nGCols,
             round($jt, 6) AS jt_stat,
             round($eJt, 6) AS e_jt,
             round(CASE WHEN $varJt > 0 THEN $varJt END, 6) AS var_jt,
             round(CASE WHEN $varJt > 0
               THEN ($jt - $eJt) / sqrt($varJt) END, 6) AS z
      FROM f"""
    },

    // Page's trend: friedman's complete-block 2x-midranks, L = sum of
    // declared-position-weighted rank sums, classic E/Var
    "q_page_trend" -> {
      val gs = Seq("view", "click", "signup", "purchase")
      val k = gs.size
      val inList = gs.map(g => s"'$g'").mkString(", ")
      val caseCols = gs.zipWithIndex.map { case (g, i) =>
        s"""CAST(sum(CASE WHEN g = '$g' THEN r2 ELSE 0 END) AS BIGINT)
               AS s$i""" }.mkString(",\n             ")
      val l2 = gs.indices.map(i => s"s$i * ${i + 1}").mkString(" + ")
      val nd = "CAST(n_days AS DOUBLE)"
      val kD = s"$k.0"
      val l = s"CAST($l2 AS DOUBLE) / 2.0"
      val eL = s"($nd * $kD * ($kD + 1.0) * ($kD + 1.0) / 4.0)"
      val varL = s"($nd * $kD * $kD * ($kD + 1.0)" +
        s" * ($kD * $kD - 1.0) / 144.0)"
      val sCols = gs.zipWithIndex
        .map { case (g, i) => s"s$i AS ranksum2_$g" }.mkString(", ")
      s"""
      WITH base AS (SELECT CAST(ts AS DATE) AS d, event_type AS g,
              CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                AS x
            FROM events
            WHERE event_type IN ($inList) AND value IS NOT NULL
            GROUP BY 1, 2),
      c AS (SELECT d, g, x, count(*) OVER (PARTITION BY d) AS cnt
            FROM base),
      r AS (SELECT d, g,
              CAST(2 * (rank() OVER (PARTITION BY d ORDER BY x) - 1)
                + count(*) OVER (PARTITION BY d, x) + 1 AS BIGINT) AS r2
            FROM c WHERE cnt = $k),
      f AS (SELECT
             $caseCols,
             CAST(count(*) / $k AS BIGINT) AS n_days
            FROM r)
      SELECT n_days, $sCols,
             round(CASE WHEN n_days > 0 THEN $l END, 6) AS page_l,
             round(CASE WHEN n_days > 0 THEN $eL END, 6) AS e_l,
             round(CASE WHEN n_days > 0 AND $varL > 0
               THEN ($l - $eL) / sqrt($varL) END, 6) AS z
      FROM f"""
    },

    "q_mann_whitney_binned" -> {
      val naD = "CAST(n_a AS DOUBLE)"
      val nbD = "CAST(n_b AS DOUBLE)"
      val nD = s"($naD + $nbD)"
      val u2a = "(ra2 - n_a * (n_a + 1))"
      val varU = s"($naD * $nbD / 12.0 * (($nD + 1.0)"
        .concat(s" - CAST(tsum AS DOUBLE) / ($nD * ($nD - 1.0))))")
      val z = s"((CAST($u2a AS DOUBLE) - $naD * $nbD)"
        .concat(s" / (2.0 * sqrt($varU)))")
      val ok = "n_a >= 1 AND n_b >= 1"
      s"""
      WITH ${latticeBinCtes("events", "value",
        "event_type IN ('purchase', 'view') AND value IS NOT NULL " +
          "AND NOT isnan(value)", "event_type")},
      base AS (SELECT event_type AS g, CAST(bin AS DOUBLE) AS v
               FROM binned),
      pv AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY v),
      r AS (SELECT v, CAST(2 * coalesce(sum(n) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + n + 1 AS BIGINT) AS r2 FROM pv),
      t AS (SELECT CAST(coalesce(sum(n * n * n - n), 0) AS BIGINT) AS tsum
            FROM pv),
      f AS (SELECT
              CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN g = 'purchase' THEN r2 ELSE 0 END)
                AS BIGINT) AS ra2
            FROM base b JOIN r ON b.v = r.v)
      SELECT n_a, n_b,
             round(CASE WHEN $ok
               THEN CAST($u2a AS DOUBLE) / 2.0 END, 6) AS u_a,
             round(CASE WHEN $ok
               THEN ($naD * $nbD) - CAST($u2a AS DOUBLE) / 2.0 END, 6)
               AS u_b,
             round(CASE WHEN $ok AND $varU > 0 THEN $z END, 6) AS z,
             round(CASE WHEN $ok AND $varU > 0
               THEN $z / sqrt($nD) END, 6) AS effect_size_r
      FROM f, t"""
    },

    // Ansari-Bradley: center-folded 2x scores from pooled midranks,
    // tie-conditional moments, one fixed double tree
    "q_ansari_bradley" -> {
      val naD = "CAST(n_a AS DOUBLE)"
      val nbD = "CAST(n_b AS DOUBLE)"
      val nD = s"($naD + $nbD)"
      val e2 = s"($naD * CAST(s1 AS DOUBLE) / $nD)"
      val var2 = s"($naD * $nbD * ($nD * CAST(s2 AS DOUBLE)" +
        s" - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))" +
        s" / ($nD * $nD * ($nD - 1.0)))"
      val ok = "n_a > 0 AND n_b > 0"
      s"""
      WITH pv AS (SELECT CAST(value AS DOUBLE) AS v,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS ca,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS cb
            FROM events
            WHERE event_type IN ('purchase', 'view')
              AND value IS NOT NULL
            GROUP BY 1),
      r AS (SELECT ca, cb,
              2 * coalesce(sum(ca + cb) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + ca + cb + 1 AS r2,
              sum(ca + cb) OVER () AS N
            FROM pv),
      a AS (SELECT ca, cb, ca + cb AS l,
              least(r2, (N + 1) * 2 - r2) AS a2
            FROM r),
      f AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS n_a,
              CAST(coalesce(sum(cb), 0) AS BIGINT) AS n_b,
              coalesce(sum(CAST(ca AS HUGEINT) * a2), 0) AS ab2,
              coalesce(sum(CAST(l AS HUGEINT) * a2), 0) AS s1,
              coalesce(sum(CAST(l AS HUGEINT) * a2 * a2), 0) AS s2
            FROM a)
      SELECT n_a, n_b,
             round(CASE WHEN $ok
               THEN CAST(ab2 AS DOUBLE) / 2.0 END, 6) AS ab_stat,
             round(CASE WHEN $ok THEN $e2 / 2.0 END, 6) AS e_ab,
             round(CASE WHEN $ok AND $var2 > 0
               THEN (CAST(ab2 AS DOUBLE) - $e2) / sqrt($var2) END, 6)
               AS z
      FROM f"""
    },

    // Mood's median: exact lower-median election, <=median counts
    // "below", 2xk chi-square from exact integer margins
    "q_mood_median" -> {
      val gs = Seq("click", "error", "purchase", "signup", "view")
      val caseCols = gs.zipWithIndex.map { case (g, i) =>
        s"CAST(sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END) AS BIGINT) AS c$i"
      }.mkString(",\n               ")
      val nv = gs.indices.map(i => s"c$i").mkString(" + ")
      val abCols = gs.indices.map(i =>
        s"""CAST(coalesce(sum(CASE WHEN v > med THEN c$i END), 0)
               AS BIGINT) AS a$i,
             CAST(coalesce(sum(CASE WHEN v <= med THEN c$i END), 0)
               AS BIGINT) AS b$i""").mkString(",\n             ")
      val aTot = gs.indices.map(i => s"a$i").mkString(" + ")
      val bTot = gs.indices.map(i => s"b$i").mkString(" + ")
      val nTot = s"($aTot + $bTot)"
      val nD = s"CAST($nTot AS DOUBLE)"
      val chi2 = gs.indices.map { i =>
        val ngD = s"CAST(a$i + b$i AS DOUBLE)"
        val ea = s"($ngD * CAST($aTot AS DOUBLE) / $nD)"
        val eb = s"($ngD * CAST($bTot AS DOUBLE) / $nD)"
        s"(CAST(a$i AS DOUBLE) - $ea) * (CAST(a$i AS DOUBLE) - $ea) / $ea" +
          s" + (CAST(b$i AS DOUBLE) - $eb) * (CAST(b$i AS DOUBLE) - $eb)" +
          s" / $eb"
      }.mkString(" + ")
      val nGCols = gs.zipWithIndex
        .map { case (g, i) => s"CAST(a$i + b$i AS BIGINT) AS n_$g" }
        .mkString(", ")
      s"""
      WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND value IS NOT NULL),
      pv AS (SELECT v,
               $caseCols
             FROM base GROUP BY v),
      cumt AS (SELECT v, $nv AS l,
               sum($nv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS cum,
               sum($nv) OVER () AS N
             FROM pv),
      m AS (SELECT min(v) AS med FROM cumt WHERE cum * 2 >= N),
      f AS (SELECT
             $abCols
            FROM pv, m)
      SELECT CAST($nTot AS BIGINT) AS n,
             round((SELECT med FROM m), 6) AS grand_median,
             CAST($aTot AS BIGINT) AS n_above, $nGCols,
             round(CASE WHEN ($aTot) > 0 AND ($bTot) > 0
               THEN $chi2 END, 6) AS chi2,
             CAST(${gs.size - 1} AS INTEGER) AS df
      FROM f"""
    },

    // KPSS: n-scaled exact deviations, decimal partial sums, Bartlett
    // q=7 long-run variance; eta's n-scaling cancels in one fixed tree
    "q_kpss" -> {
      val nD = "CAST(n_days AS DOUBLE)"
      val lrv = s"(CAST(g0 AS DOUBLE) + 2.0 * (${(1 to 7).map(l =>
        s"${1.0 - l / 8.0} * CAST(g$l AS DOUBLE)").mkString(" + ")}))"
      val eta = s"(CAST(ss2 AS DOUBLE) / ($nD * $lrv))"
      val ok = s"n_days >= 16 AND $lrv > 0"
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0)
                AS BIGINT)) AS BIGINT) AS y
            FROM orders GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(y) AS BIGINT) AS sy FROM daily),
      dev AS (SELECT d, CAST(n AS HUGEINT) * y - sy AS e, n
              FROM daily, tot),
      ps AS (SELECT *, sum(e) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
             ${(1 to 7).map(l =>
               s"lag(e, $l) OVER (ORDER BY d) AS e$l").mkString(", ")}
            FROM dev),
      f AS (SELECT CAST(max(n) AS BIGINT) AS n_days,
              sum(s * s) AS ss2,
              sum(e * e) AS g0,
              ${(1 to 7).map(l =>
                s"coalesce(sum(e * e$l), 0) AS g$l").mkString(", ")}
            FROM ps)
      SELECT n_days,
             round(CASE WHEN $ok THEN $eta END, 6) AS kpss_stat,
             round(CASE WHEN $ok
               THEN $lrv / ($nD * $nD * $nD) / 1e4 END, 6)
               AS long_run_var,
             CASE WHEN $ok THEN $eta < 0.463 END AS stationary_at_05,
             0.463 AS crit_05
      FROM f"""
    },

    // ADF (constant + 1 aug lag): exact decimal moment folds, centered
    // 2x2 Cramer solve, t in one fixed tree (lattice scale cancels)
    "q_adf" -> {
      val nD = "CAST(n_obs AS DOUBLE)"
      def d(c: String) = s"CAST($c AS DOUBLE)"
      val c11 = s"(${d("s11")} - ${d("s1")} * ${d("s1")} / $nD)"
      val c12 = s"(${d("s12")} - ${d("s1")} * ${d("s2")} / $nD)"
      val c22 = s"(${d("s22")} - ${d("s2")} * ${d("s2")} / $nD)"
      val c1y = s"(${d("s1y")} - ${d("s1")} * ${d("sy")} / $nD)"
      val c2y = s"(${d("s2y")} - ${d("s2")} * ${d("sy")} / $nD)"
      val cyy = s"(${d("syy")} - ${d("sy")} * ${d("sy")} / $nD)"
      val det = s"($c11 * $c22 - $c12 * $c12)"
      val rho = s"(($c1y * $c22 - $c2y * $c12) / $det)"
      val phi = s"(($c2y * $c11 - $c1y * $c12) / $det)"
      val rss = s"($cyy - $rho * $c1y - $phi * $c2y)"
      val seRho = s"sqrt($rss / ($nD - 3.0) * $c22 / $det)"
      val ok = s"n_obs >= 8 AND $det > 0 AND $rss > 0"
      s"""
      WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
              CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100, 0)
                AS BIGINT)) AS BIGINT) AS y
            FROM orders GROUP BY 1),
      lagd AS (SELECT y,
              lag(y, 1) OVER (ORDER BY d) AS y1,
              lag(y, 2) OVER (ORDER BY d) AS y2
            FROM daily),
      rows_ AS (SELECT y1 AS x1, y1 - y2 AS x2, y - y1 AS dy
            FROM lagd WHERE y2 IS NOT NULL),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_obs,
              sum(CAST(x1 AS HUGEINT)) AS s1,
              sum(CAST(x2 AS HUGEINT)) AS s2,
              sum(CAST(dy AS HUGEINT)) AS sy,
              sum(CAST(x1 AS HUGEINT) * x1) AS s11,
              sum(CAST(x1 AS HUGEINT) * x2) AS s12,
              sum(CAST(x2 AS HUGEINT) * x2) AS s22,
              sum(CAST(x1 AS HUGEINT) * dy) AS s1y,
              sum(CAST(x2 AS HUGEINT) * dy) AS s2y,
              sum(CAST(dy AS HUGEINT) * dy) AS syy
            FROM rows_)
      SELECT n_obs,
             round(CASE WHEN $ok THEN $rho END, 6) AS rho,
             round(CASE WHEN $ok THEN $phi END, 6) AS phi_lag1,
             round(CASE WHEN $ok THEN $rho / $seRho END, 6) AS adf_t,
             CASE WHEN $ok THEN $rho / $seRho < -2.863 END
               AS rejects_unit_root_05,
             -2.863 AS crit_05
      FROM f"""
    },

    // Van der Waerden (exact + binned): probit midrank normal scores
    // on the shared fixed tree, 1e-6 lattice commit, exact folds
    "q_van_der_waerden" -> vdwSql(
      """base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND value IS NOT NULL)"""),

    "q_van_der_waerden_binned" -> vdwSql(
      latticeBinCtes("events", "value",
        "event_type IS NOT NULL AND value IS NOT NULL " +
          "AND NOT isnan(value)", "event_type") +
        """,
      base AS (SELECT event_type AS g, CAST(bin AS DOUBLE) AS v
               FROM binned)"""),

    // Fligner-Killeen (exact + binned): per-group exact median
    // elections, centi-lattice |dev|, half-normal probit scores
    "q_fligner_killeen" -> fkSql(
      """base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND value IS NOT NULL)"""),

    "q_fligner_killeen_binned" -> fkSql(
      latticeBinCtes("events", "value",
        "event_type IS NOT NULL AND value IS NOT NULL " +
          "AND NOT isnan(value)", "event_type") +
        """,
      base AS (SELECT event_type AS g, CAST(repr AS DOUBLE) / 100.0 AS v
               FROM binned)"""),

    // Dunn post-hoc (exact + binned twins): shared-pool 2x-midranks,
    // pooled tie-corrected variance, one z per pair, |z| rank appended
    "q_dunn_test" -> dunnSql(
      """base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND value IS NOT NULL)"""),

    "q_dunn_test_binned" -> dunnSql(
      latticeBinCtes("events", "value",
        "event_type IS NOT NULL AND value IS NOT NULL " +
          "AND NOT isnan(value)", "event_type") +
        """,
      base AS (SELECT event_type AS g, CAST(bin AS DOUBLE) AS v
               FROM binned)"""),

    // Bartlett: the q_anova lattice fold, then the ln-variance tree —
    // lattice scale offsets cancel exactly because sum(nj-1) = N-k
    "q_bartlett" -> {
      val gs = Seq("click", "error", "purchase", "signup", "view")
      val k = gs.size
      val caseCols = gs.zipWithIndex.map { case (g, i) =>
        s"""CAST(sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END) AS BIGINT)
               AS n$i,
             CAST(sum(CASE WHEN g = '$g' THEN vu ELSE 0 END) AS BIGINT)
               AS s$i,
             sum(CASE WHEN g = '$g'
                 THEN CAST(vu AS HUGEINT) * vu
                 ELSE CAST(0 AS HUGEINT) END) AS q$i""" }
        .mkString(",\n             ")
      val nD = "CAST(n AS DOUBLE)"
      def njD(i: Int) = s"CAST(n$i AS DOUBLE)"
      def ssw(i: Int) = s"(CAST(q$i AS DOUBLE)"
        .concat(s" - CAST(s$i AS DOUBLE) * s$i / CAST(n$i AS DOUBLE))")
      def s2(i: Int) = s"(${ssw(i)} / (${njD(i)} - 1.0))"
      val sswAll = gs.indices.map(ssw).mkString(" + ")
      val sp2 = s"(($sswAll) / ($nD - $k))"
      val lnTerm = s"(($nD - $k) * ln($sp2) - (${gs.indices.map(i =>
        s"(${njD(i)} - 1.0) * ln(${s2(i)})").mkString(" + ")}))"
      val cFac = s"(1.0 + ((${gs.indices.map(i =>
        s"1.0 / (${njD(i)} - 1.0)").mkString(" + ")})"
        .concat(s" - 1.0 / ($nD - $k)) / ${3.0 * (k - 1)})")
      val ok = gs.indices.map(i => s"n$i >= 2 AND ${ssw(i)} > 0")
        .mkString(" AND ")
      val nCols = gs.zipWithIndex
        .map { case (g, i) => s"n$i AS n_$g" }.mkString(", ")
      s"""
      WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
                    FROM events
                    WHERE event_type IS NOT NULL AND value IS NOT NULL),
      lat AS (SELECT g, CAST(round(v * 1e6, 0) AS BIGINT) AS vu
              FROM base),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
             $caseCols
            FROM lat)
      SELECT n, $nCols,
             round(CASE WHEN $ok THEN $lnTerm / $cFac END, 6)
               AS bartlett_t,
             CAST(${k - 1} AS INTEGER) AS df,
             round(CASE WHEN $ok THEN $cFac END, 6) AS c_factor,
             round(CASE WHEN $ok THEN $sp2 / 1e12 END, 6) AS pooled_var
      FROM f"""
    },

    // D'Agostino-Pearson K2: centi-lattice power sums S1..S4, central
    // moments, the 1970 skew + 1983 kurtosis transforms, one fixed tree
    "q_dagostino_k2" -> {
      val nD = "CAST(n AS DOUBLE)"
      val m = s"(CAST(s1 AS DOUBLE) / $nD)"
      val r2 = s"(CAST(s2 AS DOUBLE) / $nD)"
      val r3 = s"(CAST(s3 AS DOUBLE) / $nD)"
      val r4 = s"(CAST(s4 AS DOUBLE) / $nD)"
      val m2 = s"($r2 - $m * $m)"
      val m3 = s"($r3 - 3.0 * $m * $r2 + 2.0 * $m * $m * $m)"
      val m4 = s"($r4 - 4.0 * $m * $r3 + 6.0 * $m * $m * $r2" +
        s" - 3.0 * $m * $m * $m * $m)"
      val g1 = s"($m3 / pow($m2, 1.5))"
      val b2 = s"($m4 / ($m2 * $m2))"
      val y = s"($g1 * sqrt(($nD + 1.0) * ($nD + 3.0)" +
        s" / (6.0 * ($nD - 2.0))))"
      val beta2 = s"(3.0 * ($nD * $nD + 27.0 * $nD - 70.0)" +
        s" * ($nD + 1.0) * ($nD + 3.0) / (($nD - 2.0) * ($nD + 5.0)" +
        s" * ($nD + 7.0) * ($nD + 9.0)))"
      val w2 = s"(sqrt(2.0 * ($beta2 - 1.0)) - 1.0)"
      val delta = s"(1.0 / sqrt(ln(sqrt($w2))))"
      val alpha = s"(sqrt(2.0 / ($w2 - 1.0)))"
      val zSkew = s"($delta * ln($y / $alpha + sqrt($y / $alpha" +
        s" * ($y / $alpha) + 1.0)))"
      val eb2 = s"(3.0 * ($nD - 1.0) / ($nD + 1.0))"
      val vb2 = s"(24.0 * $nD * ($nD - 2.0) * ($nD - 3.0)" +
        s" / (($nD + 1.0) * ($nD + 1.0) * ($nD + 3.0) * ($nD + 5.0)))"
      val x = s"(($b2 - $eb2) / sqrt($vb2))"
      val sb1 = s"(6.0 * ($nD * $nD - 5.0 * $nD + 2.0)" +
        s" / (($nD + 7.0) * ($nD + 9.0)) * sqrt(6.0 * ($nD + 3.0)" +
        s" * ($nD + 5.0) / ($nD * ($nD - 2.0) * ($nD - 3.0))))"
      val aA = s"(6.0 + 8.0 / $sb1 * (2.0 / $sb1" +
        s" + sqrt(1.0 + 4.0 / ($sb1 * $sb1))))"
      val zKurt = s"(((1.0 - 2.0 / (9.0 * $aA)) - cbrt((1.0 - 2.0 / $aA)" +
        s" / (1.0 + $x * sqrt(2.0 / ($aA - 2.0)))))" +
        s" / sqrt(2.0 / (9.0 * $aA)))"
      val ok = s"n >= 20 AND $m2 > 0"
      s"""
      WITH base AS (SELECT CAST(round(CAST(value AS DOUBLE) * 100, 0)
                 AS BIGINT) AS vu
            FROM events
            WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(vu AS HUGEINT)) AS s1,
             sum(CAST(vu AS HUGEINT) * vu) AS s2,
             sum(CAST(vu AS HUGEINT) * vu * vu) AS s3,
             sum(CAST(vu AS HUGEINT) * vu * vu * vu) AS s4
            FROM base)
      SELECT n,
             round($m / 100.0, 6) AS mean,
             round(CASE WHEN $ok THEN $g1 END, 6) AS skewness,
             round(CASE WHEN $ok THEN $b2 END, 6) AS kurtosis,
             round(CASE WHEN $ok THEN $zSkew END, 6) AS z_skew,
             round(CASE WHEN $ok THEN $zKurt END, 6) AS z_kurt,
             round(CASE WHEN $ok THEN $zSkew * $zSkew
               + $zKurt * $zKurt END, 6) AS k2_stat
      FROM f"""
    },

    // Cronbach alpha: shared 1e-6 lattice item/total/cross-product
    // folds (HUGEINT), listwise deletion, one fixed tree per output
    "q_cronbach_alpha" -> {
      val items = Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax")
      val k = items.size
      val pairs = for { i <- 0 until k; j <- (i + 1) until k } yield (i, j)
      val latCols = items.zipWithIndex.map { case (c, i) =>
        s"CAST(round(CAST($c AS DOUBLE) * 1e6, 0) AS BIGINT) AS v$i" }
        .mkString(",\n             ")
      val tot = items.indices.map(i => s"v$i").mkString(" + ")
      val aggCols = (items.indices.flatMap { i =>
        Seq(s"sum(CAST(v$i AS HUGEINT)) AS s$i",
          s"sum(CAST(v$i AS HUGEINT) * v$i) AS q$i")
      } ++ pairs.map { case (i, j) =>
        s"sum(CAST(v$i AS HUGEINT) * v$j) AS c${i}_$j"
      } ++ Seq("CAST(count(*) AS BIGINT) AS n",
        "sum(CAST(t AS HUGEINT)) AS st",
        "sum(CAST(t AS HUGEINT) * t) AS qt")).mkString(",\n             ")
      val nD = "CAST(n AS DOUBLE)"
      def sxx(i: Int) = s"(CAST(q$i AS DOUBLE)" +
        s" - CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE) / $nD)"
      def vItem(i: Int) = s"(${sxx(i)} / ($nD - 1.0))"
      val vTot = s"((CAST(qt AS DOUBLE)" +
        s" - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / $nD) / ($nD - 1.0))"
      val alpha = s"(${k / (k - 1).toDouble} * (1.0 - (${items.indices
        .map(vItem).mkString(" + ")}) / $vTot))"
      def corr(i: Int, j: Int) = s"((CAST(c${i}_$j AS DOUBLE)" +
        s" - CAST(s$i AS DOUBLE) * CAST(s$j AS DOUBLE) / $nD)" +
        s" / sqrt(${sxx(i)} * ${sxx(j)}))"
      val rbar = s"((${pairs.map { case (i, j) => corr(i, j) }
        .mkString(" + ")}) / ${pairs.size.toDouble})"
      val alphaStd = s"(${k.toDouble} * $rbar" +
        s" / nullif(1.0 + ${(k - 1).toDouble} * $rbar, 0.0))"
      val ok = (s"n >= 3 AND $vTot > 0 AND " +
        items.indices.map(i => s"${sxx(i)} > 0").mkString(" AND "))
      val notNull = items.map(c =>
        s"$c IS NOT NULL AND NOT isnan(CAST($c AS DOUBLE))")
        .mkString(" AND ")
      s"""
      WITH lat0 AS (SELECT
             $latCols
            FROM lineitem
            WHERE $notNull),
      lat AS (SELECT *, $tot AS t FROM lat0),
      f AS (SELECT
             $aggCols
            FROM lat)
      SELECT n, CAST($k AS INTEGER) AS k_items,
             round(CASE WHEN $ok THEN $alpha END, 6) AS alpha,
             round(CASE WHEN $ok THEN $rbar END, 6)
               AS mean_inter_item_corr,
             round(CASE WHEN $ok THEN $alphaStd END, 6)
               AS alpha_standardized,
             round(CASE WHEN $ok THEN $vTot / 1e12 END, 6) AS var_total
      FROM f"""
    },

    // Brunner-Munzel: pooled + within-group 2x-midranks from per-value
    // counts, 1-row rank-sum totals, exact E_g variance folds, one
    // fixed double tree per output (mirrors Stats.brunnerMunzel)
    "q_brunner_munzel" -> {
      val naD = "CAST(n_a AS DOUBLE)"
      val nbD = "CAST(n_b AS DOUBLE)"
      val nD = s"($naD + $nbD)"
      val nxSx = s"(CAST(ea AS DOUBLE) / (4.0 * $naD * ($naD - 1.0)))"
      val nySy = s"(CAST(eb AS DOUBLE) / (4.0 * $nbD * ($nbD - 1.0)))"
      val varSum = s"($nxSx + $nySy)"
      val pHat = s"((CAST(sb AS DOUBLE) / (2.0 * $nbD)" +
        s" - ($nbD + 1.0) / 2.0) / $naD)"
      val num = s"($naD * $nbD * (CAST(sb AS DOUBLE) / (2.0 * $nbD)" +
        s" - CAST(sa AS DOUBLE) / (2.0 * $naD)) / $nD)"
      val dfW = s"($varSum * $varSum / ($nxSx * $nxSx / ($naD - 1.0)" +
        s" + $nySy * $nySy / ($nbD - 1.0)))"
      val ok = "n_a > 1 AND n_b > 1"
      s"""
      WITH pv AS (SELECT CAST(value AS DOUBLE) AS v,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS ca,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS cb
            FROM events
            WHERE event_type IN ('purchase', 'view')
              AND value IS NOT NULL
            GROUP BY 1),
      r AS (SELECT *,
              2 * (coalesce(sum(ca) OVER w0, 0)
                 + coalesce(sum(cb) OVER w0, 0)) + ca + cb + 1 AS r2p,
              2 * coalesce(sum(ca) OVER w0, 0) + ca + 1 AS r2a,
              2 * coalesce(sum(cb) OVER w0, 0) + cb + 1 AS r2b
            FROM pv
            WINDOW w0 AS (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      tot AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS na,
                CAST(coalesce(sum(cb), 0) AS BIGINT) AS nb,
                coalesce(sum(CAST(ca AS HUGEINT) * r2p), 0) AS s2a,
                coalesce(sum(CAST(cb AS HUGEINT) * r2p), 0) AS s2b
              FROM r),
      f AS (SELECT max(na) AS n_a, max(nb) AS n_b,
              max(s2a) AS sa, max(s2b) AS sb,
              sum(CAST(ca AS HUGEINT)
                * (CAST(na AS HUGEINT) * (r2p - r2a + na + 1) - s2a)
                * (CAST(na AS HUGEINT) * (r2p - r2a + na + 1) - s2a))
                AS ea,
              sum(CAST(cb AS HUGEINT)
                * (CAST(nb AS HUGEINT) * (r2p - r2b + nb + 1) - s2b)
                * (CAST(nb AS HUGEINT) * (r2p - r2b + nb + 1) - s2b))
                AS eb
            FROM r, tot)
      SELECT n_a, n_b,
             round(CASE WHEN $ok THEN $pHat END, 6) AS p_hat,
             round(CASE WHEN $ok AND $varSum > 0
               THEN $num / sqrt($varSum) END, 6) AS w_stat,
             round(CASE WHEN $ok AND $varSum > 0 THEN $dfW END, 6) AS df
      FROM f"""
    },

    "q_kruskal_wallis_binned" -> {
      val gs = Seq("click", "error", "purchase", "signup", "view")
      val caseCols = gs.zipWithIndex.map { case (g, i) =>
        s"""CAST(sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END) AS BIGINT)
               AS n$i,
             CAST(sum(CASE WHEN g = '$g' THEN r2 ELSE 0 END) AS BIGINT)
               AS s$i""" }.mkString(",\n             ")
      val hTerms = gs.indices
        .map(i => s"CAST(s$i AS DOUBLE) * s$i / n$i").mkString(" + ")
      val nn = "CAST(n AS DOUBLE)"
      val tie = s"1.0 - CAST(tsum AS DOUBLE) / ($nn * $nn * $nn - $nn)"
      val h = s"3.0 / ($nn * ($nn + 1.0)) * ($hTerms) - 3.0 * ($nn + 1.0)"
      val nCols = gs.zipWithIndex
        .map { case (g, i) => s"n$i AS n_$g" }.mkString(", ")
      s"""
      WITH ${latticeBinCtes("events", "value",
        "event_type IS NOT NULL AND value IS NOT NULL " +
          "AND NOT isnan(value)", "event_type")},
      base AS (SELECT event_type AS g, CAST(bin AS DOUBLE) AS v
               FROM binned),
      pv AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY v),
      r AS (SELECT v, CAST(2 * coalesce(sum(n) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + n + 1 AS BIGINT) AS r2 FROM pv),
      j AS (SELECT b.g, r.r2 FROM base b JOIN r ON b.v = r.v),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
             $caseCols
            FROM j),
      t AS (SELECT CAST(coalesce(sum(n * n * n - n), 0) AS BIGINT) AS tsum
            FROM pv)
      SELECT n, $nCols,
             round($h, 6) AS h,
             round($tie, 6) AS tie_correction,
             round(($h) / ($tie), 6) AS h_adjusted,
             CAST(${gs.size - 1} AS INTEGER) AS df
      FROM f, t"""
    },

    "q_cliffs_delta_binned" -> s"""
      WITH ${latticeBinCtes("events", "value",
        "event_type IN ('purchase', 'view') AND value IS NOT NULL " +
          "AND NOT isnan(value)", "event_type")},
      pv AS (SELECT bin AS v,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS ca,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS cb
            FROM binned GROUP BY 1),
      w AS (SELECT ca, cb,
              CAST(coalesce(sum(cb) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS b_below,
              CAST(sum(cb) OVER () AS BIGINT) AS b_tot
            FROM pv),
      f AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
              CAST(max(b_tot) AS BIGINT) AS n_b,
              CAST(sum(ca * b_below) AS BIGINT) AS gt,
              CAST(sum(ca * (b_tot - b_below - cb)) AS BIGINT) AS lt,
              CAST(sum(ca * cb) AS BIGINT) AS eq
            FROM w)
      SELECT n_a, n_b, gt AS n_greater, lt AS n_less, eq AS n_ties,
             round(CAST(gt - lt AS DOUBLE)
               / CAST(n_a * n_b AS DOUBLE), 6) AS cliffs_delta,
             round((CAST(gt AS DOUBLE) + 0.5 * eq)
               / CAST(n_a * n_b AS DOUBLE), 6) AS p_superior
      FROM f""",

    // Weighted median over the shared (all-groups) bin grid: elected
    // value is the bin representative in value units (repr/100)
    "q_weighted_median_binned" -> s"""
      WITH lat AS (SELECT l_returnflag AS g,
              CAST(round(l_quantity, 0) AS BIGINT) AS wq,
              CAST(round(CAST(l_extendedprice AS DOUBLE) * 100, 0)
                AS BIGINT) AS vl
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
      bnd AS (SELECT min(vl) AS lo, max(vl) AS hi FROM lat),
      binned AS (SELECT g, wq,
              ${reprExpr("vl", "lo", "hi", 1000)} AS repr
            FROM lat, bnd),
      pv AS (SELECT g, CAST(repr AS DOUBLE) / 100.0 AS v,
              CAST(sum(wq) AS BIGINT) AS w
            FROM binned GROUP BY 1, 2),
      p2 AS (SELECT * FROM pv WHERE w > 0),
      c AS (SELECT g, v,
              CAST(sum(w) OVER (PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cw,
              CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS tot
            FROM p2)
      SELECT g AS l_returnflag,
             CAST(max(tot) AS BIGINT) AS total_weight,
             round(min(v), 6) AS weighted_median
      FROM c WHERE cw * 2 >= tot
      GROUP BY g ORDER BY l_returnflag""",

    // Spearman over per-axis bin grids: one bounds CTE for both axes,
    // pair-count grain (<= bins^2), midranks from pair-count marginals,
    // pearson from exact integer lattice moments (mirrors the Spark
    // fold's fixed double trees term for term)
    "q_spearman_binned" -> {
      def reprS(v: String, lo: String, hi: String) =
        s"($lo + (((($v - $lo) * 1000) // ($hi - $lo + 1))" +
          s" * ($hi - $lo + 1)) // 1000)"
      def assoc(sx: String, sy: String, sxx: String, syy: String,
                sxy: String) =
        s"""((CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE)
            - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)
              - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)
              - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE))))"""
      s"""
      WITH lat AS (SELECT
              CAST(round(CAST(l_quantity AS DOUBLE) * 100, 0) AS BIGINT)
                AS xl,
              CAST(round(CAST(l_extendedprice AS DOUBLE) * 100, 0)
                AS BIGINT) AS yl
            FROM lineitem
            WHERE l_quantity IS NOT NULL
              AND NOT isnan(CAST(l_quantity AS DOUBLE))
              AND l_extendedprice IS NOT NULL
              AND NOT isnan(CAST(l_extendedprice AS DOUBLE))),
      bnd AS (SELECT min(xl) AS lox, max(xl) AS hix,
                min(yl) AS loy, max(yl) AS hiy FROM lat),
      pairs AS (SELECT ${reprS("xl", "lox", "hix")} AS bx,
                  ${reprS("yl", "loy", "hiy")} AS by_,
                  CAST(count(*) AS BIGINT) AS c
                FROM lat, bnd GROUP BY 1, 2),
      px AS (SELECT bx, CAST(sum(c) AS BIGINT) AS n FROM pairs
             GROUP BY bx),
      rx AS (SELECT bx, CAST(2 * coalesce(sum(n) OVER (ORDER BY bx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + n + 1 AS BIGINT) AS rx2 FROM px),
      py AS (SELECT by_, CAST(sum(c) AS BIGINT) AS n FROM pairs
             GROUP BY by_),
      ry AS (SELECT by_, CAST(2 * coalesce(sum(n) OVER (ORDER BY by_
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + n + 1 AS BIGINT) AS ry2 FROM py),
      agg AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                sum(CAST(c AS HUGEINT) * rx2) AS sx,
                sum(CAST(c AS HUGEINT) * ry2) AS sy,
                sum(CAST(c AS HUGEINT) * rx2 * rx2) AS sxx,
                sum(CAST(c AS HUGEINT) * ry2 * ry2) AS syy,
                sum(CAST(c AS HUGEINT) * rx2 * ry2) AS sxy,
                sum(CAST(c AS HUGEINT) * p.bx) AS px_,
                sum(CAST(c AS HUGEINT) * p.by_) AS py_,
                sum(CAST(c AS HUGEINT) * p.bx * p.bx) AS pxx,
                sum(CAST(c AS HUGEINT) * p.by_ * p.by_) AS pyy,
                sum(CAST(c AS HUGEINT) * p.bx * p.by_) AS pxy
              FROM pairs p
              JOIN rx ON p.bx = rx.bx JOIN ry ON p.by_ = ry.by_)
      SELECT n,
             round(${assoc("sx", "sy", "sxx", "syy", "sxy")}, 6)
               AS spearman_rho,
             round(${assoc("px_", "py_", "pxx", "pyy", "pxy")}, 6)
               AS pearson
      FROM agg"""
    })
}
