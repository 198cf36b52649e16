package graft
package oracle

/** DuckDB oracle SQL — training-data curation: dedup, sampling, leakage (CurationRegistry). One domain slice of the former
  * monolithic OracleSql map; entries are verbatim, parity rules on
  * [[graft.OracleSql]].
  */
private[graft] object CurationOracleSql {
  import OracleShared._

  val sql: Map[String, String] = Map(

    "x_dedup_exact" -> """
      SELECT min(doc_id) AS doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
             count(*) AS copies
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
      ORDER BY doc_id""",


    "x_dedup_incremental" -> """
      WITH f AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        FROM documents),
      seen AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250),
      batch AS (SELECT * FROM f WHERE doc_id >= 250)
      SELECT min(doc_id) AS doc_id, fp,
             CAST(count(*) AS BIGINT) AS batch_copies
      FROM batch b
      -- NOT EXISTS with '=' mirrors Spark's null-ignoring LEFT ANTI join
      -- (NOT IN would return zero rows if any seen fingerprint were NULL)
      WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.fp = b.fp)
      GROUP BY fp ORDER BY doc_id""",


    "x_dedup_stats" -> """
      SELECT count(*) AS total_docs,
             CAST(count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
               AS BIGINT) AS distinct_docs,
             count(*) - CAST(count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
               AS BIGINT) AS duplicate_docs
      FROM documents""",


    // BLEU-2 over the jaccard near-dup pairs: exact clipped counts,
    // fixed precision/brevity/geometric-mean tree
    "x_bleu_pairs" -> """
      WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE doc_id < 60),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS kk
                FROM d))),
      sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      kept AS (
        SELECT sh.* FROM sh JOIN (
          SELECT s FROM sh GROUP BY s HAVING count(*) <= 30) ok
          ON sh.s = ok.s),
      inter AS (
        SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS i
        FROM kept l JOIN kept r ON l.s = r.s AND l.doc_id < r.doc_id
        GROUP BY l.doc_id, r.doc_id),
      p AS (
        SELECT id_a, id_b FROM inter
        JOIN sz sa ON id_a = sa.doc_id
        JOIN sz sb ON id_b = sb.doc_id
        WHERE round(CAST(i AS DOUBLE)/(sa.sz + sb.sz - i), 6) >= 0.02),
      tw AS (SELECT doc_id, list_filter(string_split_regex(
               trim(lower(text)), '\s+'), x -> x <> '') AS w
             FROM documents WHERE doc_id < 60),
      lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS len FROM tw),
      uni AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT doc_id, unnest(w) AS g FROM tw) GROUP BY 1, 2),
      bi AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
               SELECT doc_id, w[i] || ' ' || w[i+1] AS g
               FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                     FROM tw WHERE len(w) >= 2)) GROUP BY 1, 2),
      c1 AS (SELECT p.id_a, p.id_b,
               CAST(sum(least(a.c, b.c)) AS BIGINT) AS cl
             FROM p JOIN uni b ON b.doc_id = p.id_b
                    JOIN uni a ON a.doc_id = p.id_a AND a.g = b.g
             GROUP BY 1, 2),
      c2 AS (SELECT p.id_a, p.id_b,
               CAST(sum(least(a.c, b.c)) AS BIGINT) AS cl
             FROM p JOIN bi b ON b.doc_id = p.id_b
                    JOIN bi a ON a.doc_id = p.id_a AND a.g = b.g
             GROUP BY 1, 2),
      j AS (SELECT p.id_a, p.id_b, la.len AS la, lb.len AS lb,
              CAST(coalesce(c1.cl, 0) AS BIGINT) AS cl1,
              CAST(coalesce(c2.cl, 0) AS BIGINT) AS cl2
            FROM p JOIN lens la ON la.doc_id = p.id_a
                   JOIN lens lb ON lb.doc_id = p.id_b
                   LEFT JOIN c1 ON c1.id_a = p.id_a AND c1.id_b = p.id_b
                   LEFT JOIN c2 ON c2.id_a = p.id_a AND c2.id_b = p.id_b)
      SELECT id_a, id_b, la AS len_ref, lb AS len_cand,
        round(CASE WHEN lb > 0
          THEN CAST(cl1 AS DOUBLE) / CAST(lb AS DOUBLE) END, 6) AS p1,
        round(CASE WHEN lb >= 2
          THEN CAST(cl2 AS DOUBLE) / CAST(lb - 1 AS DOUBLE) END, 6) AS p2,
        round(CASE WHEN lb >= la THEN 1.0
          ELSE exp(1.0 - CAST(la AS DOUBLE) / CAST(lb AS DOUBLE)) END, 6)
          AS brevity_penalty,
        round(CASE WHEN lb >= 2 AND cl1 > 0 AND cl2 > 0 THEN
          (CASE WHEN lb >= la THEN 1.0
             ELSE exp(1.0 - CAST(la AS DOUBLE) / CAST(lb AS DOUBLE)) END)
          * exp((ln(CAST(cl1 AS DOUBLE) / CAST(lb AS DOUBLE))
               + ln(CAST(cl2 AS DOUBLE) / CAST(lb - 1 AS DOUBLE))) / 2.0)
        ELSE 0.0 END, 6) AS bleu2
      FROM j ORDER BY id_a, id_b""",


    // ROUGE-L over the jaccard pair table: the LCS DP replayed
    // cell-per-step in one lockstep recursive CTE (i = s//nb + 1,
    // j = s%nb + 1; `prev` holds row i-1, `cur` grows cell by cell and
    // promotes to `prev` at each row wrap) — all-integer state, the
    // q_dtw_distance replay pattern applied to a per-pair grid
    "x_rouge_pairs" -> """
      WITH RECURSIVE d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE doc_id < 60),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS kk
                FROM d))),
      sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      kept AS (
        SELECT sh.* FROM sh JOIN (
          SELECT s FROM sh GROUP BY s HAVING count(*) <= 30) ok
          ON sh.s = ok.s),
      inter AS (
        SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS i
        FROM kept l JOIN kept r ON l.s = r.s AND l.doc_id < r.doc_id
        GROUP BY l.doc_id, r.doc_id),
      p AS (
        SELECT id_a, id_b FROM inter
        JOIN sz sa ON id_a = sa.doc_id
        JOIN sz sb ON id_b = sb.doc_id
        WHERE round(CAST(i AS DOUBLE)/(sa.sz + sb.sz - i), 6) >= 0.02),
      tw AS (SELECT doc_id, list_filter(string_split_regex(
               trim(lower(text)), '\s+'), x -> x <> '') AS w
             FROM documents WHERE doc_id < 60),
      base AS (SELECT p.id_a, p.id_b, ta.w AS wa, tb.w AS wb,
               CAST(len(ta.w) AS INTEGER) AS na,
               CAST(len(tb.w) AS INTEGER) AS nb
             FROM p JOIN tw ta ON ta.doc_id = p.id_a
                    JOIN tw tb ON tb.doc_id = p.id_b),
      lcs AS (
        SELECT id_a, id_b, wa, wb, na, nb, 0 AS s,
               list_transform(range(nb + 1), x -> 0) AS prev,
               [0] AS cur
        FROM base
        UNION ALL
        SELECT id_a, id_b, wa, wb, na, nb, s + 1,
               CASE WHEN (s % nb) = nb - 1
                 THEN list_append(cur, nc) ELSE prev END,
               CASE WHEN (s % nb) = nb - 1
                 THEN [0] ELSE list_append(cur, nc) END
        FROM (
          SELECT *, greatest(cur[len(cur)], prev[j + 1],
                   CASE WHEN wa[i] = wb[j] THEN prev[j] + 1 ELSE 0 END)
                 AS nc
          FROM (SELECT *, s // nb + 1 AS i, s % nb + 1 AS j
                FROM lcs WHERE s < na * nb))),
      res AS (SELECT id_a, id_b, CAST(na AS BIGINT) AS len_ref,
               CAST(nb AS BIGINT) AS len_cand,
               CAST(prev[nb + 1] AS BIGINT) AS lcs_len
             FROM lcs WHERE s = na * nb)
      SELECT id_a, id_b, len_ref, len_cand, lcs_len,
             round(CAST(lcs_len AS DOUBLE) / len_ref, 6) AS rouge_recall,
             round(CAST(lcs_len AS DOUBLE) / len_cand, 6)
               AS rouge_precision,
             CASE WHEN lcs_len > 0 THEN
               round(2.0 * (CAST(lcs_len AS DOUBLE) / len_cand)
                 * (CAST(lcs_len AS DOUBLE) / len_ref)
                 / (CAST(lcs_len AS DOUBLE) / len_cand
                    + CAST(lcs_len AS DOUBLE) / len_ref), 6)
             ELSE 0.0 END AS rouge_f1
      FROM res ORDER BY id_a, id_b""",

    "x_jaccard_pairs" -> """
      WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE doc_id < 60),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS kk FROM d))),
      sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      kept AS (
        SELECT sh.* FROM sh JOIN (
          SELECT s FROM sh GROUP BY s HAVING count(*) <= 30) ok
          ON sh.s = ok.s),
      inter AS (
        SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS i
        FROM kept l JOIN kept r ON l.s = r.s AND l.doc_id < r.doc_id
        GROUP BY l.doc_id, r.doc_id)
      SELECT id_a, id_b, CAST(i AS BIGINT) AS inter,
             CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
             round(CAST(i AS DOUBLE)/(sa.sz + sb.sz - i), 6) AS jaccard
      FROM inter
      JOIN sz sa ON id_a = sa.doc_id
      JOIN sz sb ON id_b = sb.doc_id
      WHERE round(CAST(i AS DOUBLE)/(sa.sz + sb.sz - i), 6) >= 0.02
      ORDER BY id_a, id_b""",


    // asymmetric containment twin: same shingle/df-cap pipeline, metric
    // i / least(sz_a, sz_b)
    "x_containment_pairs" -> """
      WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE doc_id < 60),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS kk FROM d))),
      sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      kept AS (
        SELECT sh.* FROM sh JOIN (
          SELECT s FROM sh GROUP BY s HAVING count(*) <= 30) ok
          ON sh.s = ok.s),
      inter AS (
        SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS i
        FROM kept l JOIN kept r ON l.s = r.s AND l.doc_id < r.doc_id
        GROUP BY l.doc_id, r.doc_id)
      SELECT id_a, id_b, CAST(i AS BIGINT) AS inter,
             CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
             round(CAST(i AS DOUBLE)/least(sa.sz, sb.sz), 6) AS containment
      FROM inter
      JOIN sz sa ON id_a = sa.doc_id
      JOIN sz sb ON id_b = sb.doc_id
      WHERE round(CAST(i AS DOUBLE)/least(sa.sz, sb.sz), 6) >= 0.05
      ORDER BY id_a, id_b""",


    // recall oracle for the LSH propose + exact-verify pipeline: in the
    // rows-per-band = 1 config a true pair escapes candidacy only if NONE
    // of its 64 MinHash components collide ((1-j)^64 ≤ 5e-20 at j ≥ 0.5),
    // so the pipeline's output is exactly the full shingle-Jaccard pair
    // scan at threshold 0.5 — replayed here with no stop-shingle cap
    "x_neardups_verified" -> """
      WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS kk FROM d))),
      sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      inter AS (
        SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS i
        FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
        GROUP BY l.doc_id, r.doc_id)
      SELECT id_a, id_b,
             round(CAST(i AS DOUBLE)/(sa.sz + sb.sz - i), 6) AS jaccard
      FROM inter
      JOIN sz sa ON id_a = sa.doc_id
      JOIN sz sb ON id_b = sb.doc_id
      WHERE round(CAST(i AS DOUBLE)/(sa.sz + sb.sz - i), 6) >= 0.5
      ORDER BY id_a, id_b""",


    // incremental-rule oracle: in the rows-per-band = 1 + exact-verify
    // config, a batch doc (>= 250) is a dup iff SOME smaller id (seen
    // corpus or earlier batch doc) reaches exact Jaccard 0.5, dup_of the
    // smallest such partner — replayed as a pair scan over the whole
    // table keeping only batch-id larger sides
    "x_incremental_verified" -> """
      WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS kk FROM d))),
      sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      inter AS (
        SELECT r.doc_id AS bid, l.doc_id AS cand, count(*) AS i
        FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
        WHERE r.doc_id >= 250
        GROUP BY r.doc_id, l.doc_id),
      dup AS (
        SELECT bid, min(cand) AS dup_of
        FROM inter
        JOIN sz sa ON cand = sa.doc_id
        JOIN sz sb ON bid = sb.doc_id
        WHERE round(CAST(i AS DOUBLE)/(sa.sz + sb.sz - i), 6) >= 0.5
        GROUP BY bid)
      SELECT b.doc_id, dup.dup_of IS NOT NULL AS is_dup, dup.dup_of
      FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) b
      LEFT JOIN dup ON b.doc_id = dup.bid
      ORDER BY b.doc_id""",


    // simhash recall: every doc's identical-text twin has an identical
    // fingerprint (hamming 0 < bands ⇒ pigeonhole must-find), so the
    // injected-pair slice of the band search is one deterministic row per
    // document
    "x_simhash_recall" -> """
      SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
             CAST(0 AS INTEGER) AS hamming
      FROM documents ORDER BY id_a""",


    // FULL hash oracle for the MinHash+LSH banding search (numHashes=16,
    // bands=4, threshold 0.5): signatures, value-tuple band buckets and
    // the component-agreement estimate are all exact BIGINT arithmetic
    // replayed verbatim (md5 60-bit fold → Carter–Wegman permutations →
    // min) — see OracleShared.minhashCtes
    "x_minhash_neardups" -> s"""
      WITH ${OracleShared.minhashCtes(16, 4)},
      cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
               FROM bkt l JOIN bkt r ON l.band = r.band
                    AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
      est AS (SELECT c.id_a, c.id_b,
                round(sum(CASE WHEN a.mh = b.mh THEN 1.0 ELSE 0.0 END) / 16.0,
                      6) AS est_jaccard
              FROM cand c
              JOIN sig a ON a.doc_id = c.id_a
              JOIN sig b ON b.doc_id = c.id_b AND b.p = a.p
              GROUP BY c.id_a, c.id_b)
      SELECT id_a, id_b, est_jaccard FROM est
      WHERE est_jaccard >= 0.5
      ORDER BY id_a, id_b""",


    // FULL hash oracle for the incremental LSH ingest rule: the batch
    // (doc_id >= 250) probes seen + earlier-batch band buckets, dup_of =
    // smallest banded candidate whose signature agreement reaches 0.5 —
    // the same signature/banding replay as x_minhash_neardups
    "x_dedup_incremental_lsh" -> s"""
      WITH ${OracleShared.minhashCtes(16, 4)},
      cand AS (SELECT DISTINCT l.doc_id AS bid, r.doc_id AS cand
               FROM bkt l JOIN bkt r ON l.band = r.band
                    AND l.bucket = r.bucket AND r.doc_id < l.doc_id
               WHERE l.doc_id >= 250),
      est AS (SELECT c.bid, c.cand,
                sum(CASE WHEN a.mh = b.mh THEN 1.0 ELSE 0.0 END) / 16.0 AS est
              FROM cand c
              JOIN sig a ON a.doc_id = c.bid
              JOIN sig b ON b.doc_id = c.cand AND b.p = a.p
              GROUP BY c.bid, c.cand),
      dup AS (SELECT bid, min(cand) AS dup_of FROM est
              WHERE est >= 0.5 GROUP BY bid)
      SELECT b.doc_id AS id, dup.dup_of IS NOT NULL AS is_dup, dup.dup_of
      FROM (SELECT doc_id FROM documents WHERE doc_id >= 250) b
      LEFT JOIN dup ON b.doc_id = dup.bid
      ORDER BY id""",


    // FULL hash oracle for the SimHash fingerprints: md5-top-64-bit token
    // votes reassembled into the signed 64-bit pattern — see
    // OracleShared.simhashCtes
    "x_simhash" -> s"""
      WITH ${OracleShared.simhashCtes("WHERE doc_id < 50")}
      SELECT doc_id AS id, simhash FROM fp ORDER BY id""",


    // FULL hash oracle for the SimHash band search: with maxHamming 3 <
    // bands 4 the pigeonhole guarantee makes the output exactly "all pairs
    // within hamming 3", so the oracle replays the fingerprints plus the
    // criterion as a pair scan (the banding only prunes, never decides)
    "x_simhash_neardups" -> s"""
      WITH ${OracleShared.simhashCtes("")}
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY id_a, id_b""",


    // contamination: DISTINCT 3-gram shingles per test doc vs the train
    // shingle set; short docs (zero shingles) kept at contamination 0
    "x_contamination" -> """
      WITH te_docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE doc_id >= 250),
      tr AS (
        SELECT DISTINCT s FROM (
          SELECT w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
          FROM (SELECT string_split_regex(trim(text), '\s+') AS w,
                       unnest(range(1, len(w) - 1)) AS kk
                FROM documents WHERE doc_id < 250))),
      te AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS kk
                FROM te_docs))),
      sz AS (SELECT doc_id, count(*) AS n_shingles FROM te GROUP BY doc_id),
      hit AS (SELECT te.doc_id, count(*) AS n_contaminated
              FROM te JOIN tr ON te.s = tr.s GROUP BY te.doc_id)
      SELECT d.doc_id,
             CAST(coalesce(sz.n_shingles, 0) AS BIGINT) AS n_shingles,
             CAST(coalesce(hit.n_contaminated, 0) AS BIGINT) AS n_contaminated,
             CASE WHEN coalesce(sz.n_shingles, 0) > 0
               THEN round(CAST(coalesce(hit.n_contaminated, 0) AS DOUBLE)
                 / sz.n_shingles, 6) ELSE 0.0 END AS contamination,
             (CASE WHEN coalesce(sz.n_shingles, 0) > 0
               THEN round(CAST(coalesce(hit.n_contaminated, 0) AS DOUBLE)
                 / sz.n_shingles, 6) ELSE 0.0 END) >= 0.2 AS is_contaminated
      FROM te_docs d
      LEFT JOIN sz ON d.doc_id = sz.doc_id
      LEFT JOIN hit ON d.doc_id = hit.doc_id
      ORDER BY d.doc_id""",


    // DL vs plain levenshtein on the blocked typo corpus — DuckDB's
    // damerau_levenshtein is an independent implementation of the
    // native expression's Lowrance-Wagner DP
    "x_fuzzy_match_dl" -> """
      WITH c AS (
        SELECT c_custkey AS id, c_name AS name FROM customer
        WHERE c_custkey < 200),
      v AS (
        SELECT id + 100000 AS id,
               substr(name, 1, length(name)-2)
                 || substr(name, length(name), 1)
                 || substr(name, length(name)-1, 1) AS name
        FROM c),
      u AS (SELECT * FROM c UNION ALL SELECT * FROM v),
      n AS (SELECT id, name,
                   substr(lower(trim(name)), 1, length(lower(trim(name))) - 2)
                     || least(substr(lower(trim(name)), length(lower(trim(name))) - 1, 1),
                              substr(lower(trim(name)), length(lower(trim(name))), 1))
                     || greatest(substr(lower(trim(name)), length(lower(trim(name))) - 1, 1),
                                 substr(lower(trim(name)), length(lower(trim(name))), 1))
                     AS blk
            FROM u)
      SELECT l.id AS id_a, r.id AS id_b,
             CAST(levenshtein(l.name, r.name) AS INTEGER) AS lev,
             CAST(damerau_levenshtein(l.name, r.name) AS INTEGER) AS dl,
             (damerau_levenshtein(l.name, r.name) = 1
               AND levenshtein(l.name, r.name) = 2) AS transposition_only
      FROM n l JOIN n r ON l.blk = r.blk AND l.id < r.id
      ORDER BY id_a, id_b""",


    "x_entity_resolution" -> """
      WITH c AS (
        SELECT c_custkey AS id, c_name AS name FROM customer
        WHERE c_custkey < 200),
      v AS (
        SELECT id + 100000 AS id,
               substr(name, 1, length(name)-2)
                 || substr(name, length(name), 1)
                 || substr(name, length(name)-1, 1) AS name
        FROM c),
      u AS (SELECT * FROM c UNION ALL SELECT * FROM v),
      -- transposition-canonical block key: string with last two chars sorted
      n AS (SELECT id, name,
                   substr(lower(trim(name)), 1, length(lower(trim(name))) - 2)
                     || least(substr(lower(trim(name)), length(lower(trim(name))) - 1, 1),
                              substr(lower(trim(name)), length(lower(trim(name))), 1))
                     || greatest(substr(lower(trim(name)), length(lower(trim(name))) - 1, 1),
                                 substr(lower(trim(name)), length(lower(trim(name))), 1))
                     AS blk,
                   length(name) AS len
            FROM u)
      SELECT l.id AS id_a, r.id AS id_b, l.name AS name_a, r.name AS name_b,
             CAST(levenshtein(l.name, r.name) AS INTEGER) AS dist
      FROM n l JOIN n r
        ON l.blk = r.blk AND abs(l.len - r.len) <= 2 AND l.id < r.id
      WHERE levenshtein(l.name, r.name) <= 2
      ORDER BY id_a, id_b""",


    // survivorship on top of the entity-resolution pairs: recursive
    // closure, then most-frequent (ties to smallest) name/nationkey and
    // max balance per entity
    "x_golden_record" -> """
      WITH RECURSIVE c AS (
        SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
               c_nationkey AS nationkey
        FROM customer WHERE c_custkey < 200),
      v AS (
        SELECT id + 100000 AS id,
               substr(name, 1, length(name)-2)
                 || substr(name, length(name), 1)
                 || substr(name, length(name)-1, 1) AS name,
               acctbal + 0.005 AS acctbal, nationkey
        FROM c),
      u AS (SELECT * FROM c UNION ALL SELECT * FROM v),
      n AS (SELECT id, name,
                   substr(lower(trim(name)), 1, length(lower(trim(name))) - 2)
                     || least(substr(lower(trim(name)),
                                length(lower(trim(name))) - 1, 1),
                              substr(lower(trim(name)),
                                length(lower(trim(name))), 1))
                     || greatest(substr(lower(trim(name)),
                                   length(lower(trim(name))) - 1, 1),
                                 substr(lower(trim(name)),
                                   length(lower(trim(name))), 1)) AS blk,
                   length(name) AS len
            FROM u),
      p AS (SELECT l.id AS id_a, r.id AS id_b
            FROM n l JOIN n r
              ON l.blk = r.blk AND abs(l.len - r.len) <= 2 AND l.id < r.id
            WHERE levenshtein(l.name, r.name) <= 2),
      nodes AS (SELECT id_a AS id FROM p UNION SELECT id_b FROM p),
      edges AS (SELECT id_a AS src, id_b AS dst FROM p
                UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id),
      comp AS (SELECT id, CAST(min(r) AS BIGINT) AS component
               FROM reach GROUP BY id),
      lab AS (SELECT u.*, COALESCE(comp.component, u.id) AS entity_id
              FROM u LEFT JOIN comp ON u.id = comp.id),
      ne AS (SELECT entity_id, name, count(*) AS cnt
             FROM lab GROUP BY 1, 2),
      nw AS (SELECT entity_id, name AS canonical_name FROM (
               SELECT *, row_number() OVER (PARTITION BY entity_id
                 ORDER BY cnt DESC, name ASC) AS rn FROM ne)
             WHERE rn = 1),
      ke AS (SELECT entity_id, nationkey, count(*) AS cnt
             FROM lab GROUP BY 1, 2),
      kw AS (SELECT entity_id, nationkey AS canonical_nationkey FROM (
               SELECT *, row_number() OVER (PARTITION BY entity_id
                 ORDER BY cnt DESC, nationkey ASC) AS rn FROM ke)
             WHERE rn = 1),
      agg AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n_records,
                     round(max(acctbal), 6) AS max_acctbal
              FROM lab GROUP BY 1)
      SELECT a.entity_id, a.n_records, a.max_acctbal,
             nw.canonical_name, kw.canonical_nationkey
      FROM agg a JOIN nw USING (entity_id) JOIN kw USING (entity_id)
      ORDER BY a.entity_id""",


    // cluster resolution: Spark's iterative min-label propagation vs a
    // DuckDB recursive-CTE transitive closure over the SAME pair list
    // cluster-aware split: same closure, split hashed on the component
    // (singletons key on their own id), splitAssign thresholds
    "x_cluster_split" -> (clusterReachCte + s"""
      , comp AS (
        SELECT id, CAST(min(r) AS BIGINT) AS component
        FROM reach GROUP BY id),
      lab AS (
        SELECT dd.doc_id,
               COALESCE(comp.component, dd.doc_id) AS component
        FROM documents dd LEFT JOIN comp ON dd.doc_id = comp.id)
      SELECT doc_id, component,
             CASE WHEN ${uk("component", 83)} <= 0.8 THEN 'train'
                  WHEN ${uk("component", 83)} <= 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM lab ORDER BY doc_id"""),


    "x_dedup_clusters" -> dedupClustersOracle,

    // same recursive-CTE transitive closure checks BOTH distributed CC
    // algorithms (min-label propagation and large-star/small-star)
    "x_dedup_clusters_star" -> dedupClustersOracle,

    // FULL-corpus clusters: no probe cap; the closure stays tractable
    // because threshold 0.5 / maxDf 50 keep the pair list near-dup-sized
    "x_dedup_clusters_full" -> dedupClustersFullOracle,

    // retention over the full corpus: same closure, keep-best per cluster
    "x_dedup_retain" -> dedupRetainOracle,

    // survivor weights: same closure + keep-best, weight = cluster size
    "x_dedup_weights" -> (clusterReachCte + """
      , comp AS (
        SELECT id, CAST(min(r) AS BIGINT) AS component
        FROM reach GROUP BY id),
      lab AS (
        SELECT dd.doc_id, dd.n_chars AS quality,
               COALESCE(comp.component, dd.doc_id) AS component
        FROM documents dd LEFT JOIN comp ON dd.doc_id = comp.id),
      rk AS (
        SELECT *, row_number() OVER (PARTITION BY component
                 ORDER BY quality DESC, doc_id ASC) AS rn
        FROM lab),
      wsz AS (SELECT component, CAST(count(*) AS BIGINT) AS weight
              FROM lab GROUP BY component)
      SELECT rk.doc_id, rk.component, rk.quality, wsz.weight
      FROM rk JOIN wsz ON rk.component = wsz.component
      WHERE rk.rn = 1 ORDER BY rk.doc_id"""),


    // cross-modal clusters: the jaccard and cosine pair CTEs above,
    // unioned, through the same recursive-CTE transitive closure
    "x_multimodal_neardups" -> """
      WITH RECURSIVE d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE doc_id < 60),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS kk FROM d))),
      sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      kept AS (
        SELECT sh.* FROM sh JOIN (
          SELECT s FROM sh GROUP BY s HAVING count(*) <= 30) ok
          ON sh.s = ok.s),
      inter AS (
        SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS i
        FROM kept l JOIN kept r ON l.s = r.s AND l.doc_id < r.doc_id
        GROUP BY l.doc_id, r.doc_id),
      tpairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sz sa ON id_a = sa.doc_id
        JOIN sz sb ON id_b = sb.doc_id
        WHERE round(CAST(i AS DOUBLE)/(sa.sz + sb.sz - i), 6) >= 0.02),
      e AS (SELECT vec_id, label AS cell,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < 60),
      vpairs AS (
        SELECT l.vec_id AS id_a, r.vec_id AS id_b
        FROM e l JOIN e r ON l.cell = r.cell AND l.vec_id < r.vec_id
        WHERE round(list_inner_product(l.v, r.v)
                 / (sqrt(list_inner_product(l.v, l.v))
                    * sqrt(list_inner_product(r.v, r.v))), 6) >= 0.4),
      pairs AS (SELECT * FROM tpairs UNION SELECT * FROM vpairs),
      nodes AS (SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e2.dst, reach.r FROM edges e2 JOIN reach ON e2.src = reach.id)
      SELECT id, CAST(min(r) AS BIGINT) AS component,
             (id = min(r)) AS is_canonical
      FROM reach GROUP BY id ORDER BY id""",


    // deterministic splits / sampling: randomness is the shared minstd hash
    "q_split_assign" -> s"""
      SELECT c_custkey,
             CASE WHEN u <= 0.8 THEN 'train'
                  WHEN u <= 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT c_custkey, ${uk("c_custkey", 31)} AS u FROM customer)
      ORDER BY c_custkey""",


    "q_stratified_sample" -> s"""
      WITH r AS (
        SELECT event_id, event_type,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY ${uk("event_id", 33)}, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events)
      SELECT event_id, event_type FROM r
      WHERE rn <= ceil(n * 0.1) ORDER BY event_id""",


    "q_pack_report" -> """
      WITH t AS (
        SELECT lang, doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
                 AS n_tokens
        FROM documents),
      packed AS (
        SELECT lang, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                 / 2048) AS INTEGER) AS pack_id
        FROM t)
      SELECT lang, pack_id, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
             round(CAST(sum(n_tokens) AS DOUBLE) / 2048, 6) AS utilization
      FROM packed GROUP BY lang, pack_id ORDER BY lang, pack_id""",


    "q_mixture_report" -> """
      WITH targets(stratum, quota) AS (
        VALUES ('en', CAST(1000 AS BIGINT)), ('de', 400), ('fr', 400),
               ('xx', 200)),
      counts AS (
        SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS available
        FROM documents GROUP BY lang)
      SELECT t.stratum, t.quota,
             coalesce(c.available, 0) AS available,
             least(t.quota, coalesce(c.available, 0)) AS drawn,
             t.quota - least(t.quota, coalesce(c.available, 0)) AS shortfall
      FROM targets t LEFT JOIN counts c ON t.stratum = c.stratum
      ORDER BY t.stratum""",


    "q_quota_cap" -> quotaCapOracle,

    // identical semantics, ONE shared oracle — the Spark side runs the
    // priority-histogram selection instead of a per-group rank window
    "q_quota_cap_scalable" -> quotaCapOracle,


    "q_quota_cap_hashed" -> s"""
      WITH r AS (
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ${uk("event_id", 39)}, event_id) AS rn
        FROM events)
      SELECT event_id, user_id FROM r WHERE rn <= 3 ORDER BY event_id""",


    // budget-capped quota: the sliced prefix sum replayed as a plain
    // hash-ordered window cumsum per language, filtered to the budget
    "x_budget_sample" -> s"""
      WITH t AS (
        SELECT lang, doc_id, n_chars,
               CAST(sum(n_chars) OVER (PARTITION BY lang
                 ORDER BY ${uk("doc_id", 47)}, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_cost
        FROM documents WHERE lang IN ('en', 'de', 'zh'))
      SELECT lang, doc_id, n_chars, cum_cost FROM t
      WHERE cum_cost <= CASE lang WHEN 'en' THEN 20000
                                  WHEN 'de' THEN 8000
                                  ELSE 10000 END
      ORDER BY lang, cum_cost, doc_id""",


    "q_uniform_sample" -> uniformSampleOracle,

    // same selection, ONE shared oracle — histogram machinery vs TakeOrdered
    "q_uniform_sample_scalable" -> uniformSampleOracle,


    "q_mixture_sample" -> s"""
      WITH r AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                 ORDER BY ${uk("doc_id", 37)}, doc_id) AS rn
        FROM documents)
      SELECT doc_id, lang FROM r
      WHERE rn <= (CASE WHEN lang = 'en' THEN 120
                        WHEN lang = 'de' THEN 40
                        WHEN lang = 'fr' THEN 40
                        ELSE 0 END)
      ORDER BY doc_id""",


    // α=0.5 temperature mixture: quotas from the corpus itself via the
    // IEEE-exact sqrt weight; selection replays the u01 hash rank
    "x_temperature_mixture" -> s"""
      WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      q AS (SELECT lang,
              CAST(floor(300.0 * sqrt(CAST(n AS DOUBLE)) /
                   (SELECT sum(sqrt(CAST(n AS DOUBLE))) FROM counts))
                AS BIGINT) AS quota
            FROM counts),
      r AS (SELECT doc_id, lang,
              row_number() OVER (PARTITION BY lang
                ORDER BY ${uk("doc_id", 53)}, doc_id) AS rn
            FROM documents)
      SELECT r.doc_id, r.lang FROM r JOIN q ON r.lang = q.lang
      WHERE r.rn <= q.quota ORDER BY r.doc_id""",


    "x_temperature_report" -> """
      WITH counts AS (SELECT lang AS stratum, count(*) AS available
                      FROM documents GROUP BY lang),
      t AS (SELECT stratum, available,
              round(sqrt(CAST(available AS DOUBLE)), 6) AS weight,
              CAST(floor(300.0 * sqrt(CAST(available AS DOUBLE)) /
                   (SELECT sum(sqrt(CAST(available AS DOUBLE))) FROM counts))
                AS BIGINT) AS quota
            FROM counts)
      SELECT stratum, available, weight, quota,
             least(quota, available) AS drawn,
             quota - least(quota, available) AS shortfall
      FROM t ORDER BY stratum""",


    // per-dimension centroid drift between the even/odd vec_id slices;
    // both slice means come from ONE conditional-avg aggregation
    "x_embedding_drift" -> """
      WITH e AS (SELECT vec_id % 2 = 0 AS is_ref,
                        CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      x AS (SELECT is_ref,
                   CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS dim,
                   unnest(v) AS comp
            FROM e),
      d AS (SELECT dim,
              avg(CASE WHEN is_ref THEN comp END) AS ref_mean,
              avg(CASE WHEN NOT is_ref THEN comp END) AS cur_mean
            FROM x GROUP BY dim),
      s AS (SELECT dim, ref_mean, cur_mean,
                   cur_mean - ref_mean AS shift FROM d)
      SELECT dim, round(ref_mean, 6) AS ref_mean,
             round(cur_mean, 6) AS cur_mean, round(shift, 6) AS shift,
             round(sum(ref_mean * cur_mean) OVER () /
                   (sqrt(sum(ref_mean * ref_mean) OVER ()) *
                    sqrt(sum(cur_mean * cur_mean) OVER ())), 6)
               AS centroid_cosine,
             round(sqrt(sum(shift * shift) OVER ()), 6) AS l2_shift
      FROM s ORDER BY dim""",


    "q_pack_sequences" -> """
      WITH t AS (
        SELECT lang, doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
                 AS n_tokens
        FROM documents)
      SELECT lang, doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
               / 2048) AS INTEGER) AS pack_id
      FROM t ORDER BY lang, doc_id""",


    "x_heavy_hitters" -> """
      WITH t AS (SELECT event_type FROM events WHERE event_type IS NOT NULL),
      tot AS (SELECT count(*) AS n FROM t)
      SELECT event_type, count(*) AS cnt,
             round(count(*) / (SELECT CAST(n AS DOUBLE) FROM tot), 6) AS share
      FROM t GROUP BY event_type
      HAVING count(*) >= 0.1 * (SELECT CAST(n AS DOUBLE) FROM tot)
      ORDER BY cnt DESC, event_type""")
}
