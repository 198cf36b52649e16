package graft
package oracle

/** DuckDB oracle SQL — embedding similarity / ANN families (SimilarityRegistry). One domain slice of the former
  * monolithic OracleSql map; entries are verbatim, parity rules on
  * [[graft.OracleSql]].
  */
private[graft] object SimilarityOracleSql {
  import OracleShared._

  /** Shared item-item CF CTE chain (ui -> ... -> r); the three CF
    * queries append their own projection. */
  private val itemCfCtes: String = """
      WITH ui AS (SELECT DISTINCT o_custkey AS u, l_partkey AS i
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL),
      bs AS (SELECT u, i, count(*) OVER (PARTITION BY u) AS bsz FROM ui),
      capped AS (SELECT u, i FROM bs WHERE bsz <= 256),
      dfs AS (SELECT i, CAST(count(*) AS BIGINT) AS df
              FROM capped GROUP BY i
              HAVING count(*) >= 2 AND count(*) <= 1000),
      kept AS (SELECT c.u, c.i FROM capped c JOIN dfs d ON c.i = d.i),
      pairs AS (SELECT a.i AS ia, b.i AS ib,
              CAST(count(*) AS BIGINT) AS n_co
            FROM kept a JOIN kept b ON a.u = b.u AND a.i < b.i
            GROUP BY 1, 2),
      sym AS (SELECT ia AS item, ib AS neighbor, n_co FROM pairs
              UNION ALL
              SELECT ib AS item, ia AS neighbor, n_co FROM pairs),
      scored AS (SELECT s.item, s.neighbor, s.n_co,
              di.df AS df_item, dn.df AS df_neighbor,
              round(CAST(s.n_co AS DOUBLE)
                / sqrt(CAST(di.df AS DOUBLE) * dn.df), 6) AS cosine
            FROM sym s JOIN dfs di ON s.item = di.i
                       JOIN dfs dn ON s.neighbor = dn.i),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY item
              ORDER BY cosine DESC, n_co DESC, neighbor ASC)
              AS INTEGER) AS rank
            FROM scored)"""

  /** Learned-IVF oracle (nProbe parameterizes the multi-probe twin):
    * integer-exact codebook replay + decomposition argmin assignment +
    * cell-joined raw-vector cosine top-3. Output columns match
    * `Similarity.topKIvf` (query_id, cell, cand_id, cosine, rank).
    */
  private def learnedIvfSql(nProbe: Int): String = s"""
      WITH ${OracleShared.lloydsCtes("ivf", 1, 64, 8, 20, 4096)},
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
      asgc AS MATERIALIZED (SELECT vec_id, cell FROM (
          SELECT e.vec_id, CAST(cb.c AS INTEGER) AS cell,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_inner_product(e.v, e.v)
                     - 2 * list_inner_product(e.v, cb.cd)
                     + list_inner_product(cb.cd, cb.cd) ASC, cb.c ASC)
                   AS rnk
          FROM e CROSS JOIN cb_ivf cb) WHERE rnk = 1),
      qp AS (SELECT vec_id AS query_id, v AS qv, cell FROM (
          SELECT e.vec_id, e.v, CAST(cb.c AS INTEGER) AS cell,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_inner_product(e.v, e.v)
                     - 2 * list_inner_product(e.v, cb.cd)
                     + list_inner_product(cb.cd, cb.cd) ASC, cb.c ASC)
                   AS rnk
          FROM e CROSS JOIN cb_ivf cb WHERE e.vec_id < 5)
        WHERE rnk <= $nProbe),
      scored AS (
        SELECT q.query_id, q.cell, e.vec_id AS cand_id,
               list_inner_product(q.qv, e.v)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(e.v, e.v))) AS cos
        FROM e JOIN asgc a ON e.vec_id = a.vec_id
             JOIN qp q ON a.cell = q.cell
        WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, cell, cand_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id ASC) AS INTEGER) AS rank
        FROM scored)
      SELECT query_id, cell, cand_id, round(cos, 6) AS cosine, rank
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank"""

  val sql: Map[String, String] = Map(

    "x_vector_stats" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT vec_id, CAST(len(v) AS INTEGER) AS dim,
             round(sqrt(list_inner_product(v, v)), 6) AS l2_norm,
             round(CAST(list_aggregate(v, 'sum') AS DOUBLE) / len(v), 6)
               AS mean_component
      FROM e ORDER BY vec_id""",


    // hard negatives: the knn kernel with a label-mismatch filter
    // BEFORE ranking — every row a usable contrastive negative
    "x_hard_negatives" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
                 FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv, label AS ql
            FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, q.ql AS query_label,
               e.vec_id AS cand_id, e.label AS cand_label,
               list_inner_product(q.qv, e.v)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(e.v, e.v))) AS cos
        FROM e CROSS JOIN q
        WHERE e.vec_id <> q.query_id AND e.label <> q.ql),
      ranked AS (
        SELECT query_id, query_label, cand_id, cand_label, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id ASC) AS INTEGER) AS rank
        FROM scored)
      SELECT query_id, query_label, cand_id, cand_label,
             round(cos, 6) AS cosine, rank
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""",


    "x_knn_bruteforce" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id AS cand_id,
               list_inner_product(q.qv, e.v)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(e.v, e.v))) AS cos
        FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, cand_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id ASC) AS INTEGER) AS rank
        FROM scored)
      SELECT query_id, cand_id, round(cos, 6) AS cosine, rank
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""",


    // recall audit of the learned-IVF pipeline at full probe width: DuckDB
    // independently replays BRUTE FORCE top-3; nProbe = nCells means cell
    // pruning drops nothing, so every brute row must also be in the
    // learned-IVF output — n_hits 3, recall 1.0 per query, or the learned
    // path has a defect and the hash mismatches
    // Matryoshka truncation audit: prefix-dim top-10 vs full-dim truth,
    // every level from the same scored pairs
    "x_matryoshka_recall" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      scored AS (SELECT q.query_id, e.vec_id AS cand_id, q.qv, e.v
                 FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      truth AS (SELECT query_id, cand_id FROM (
          SELECT query_id, cand_id, row_number() OVER (
              PARTITION BY query_id
              ORDER BY list_inner_product(qv, v)
                / (sqrt(list_inner_product(qv, qv))
                   * sqrt(list_inner_product(v, v))) DESC,
              cand_id ASC) AS rank
          FROM scored) WHERE rank <= 10),
      lv AS (SELECT query_id, cand_id, dims,
               list_inner_product(list_slice(qv, 1, dims),
                                  list_slice(v, 1, dims))
                 / (sqrt(list_inner_product(list_slice(qv, 1, dims),
                                            list_slice(qv, 1, dims)))
                    * sqrt(list_inner_product(list_slice(v, 1, dims),
                                              list_slice(v, 1, dims))))
                 AS cos
             FROM scored
             CROSS JOIN (SELECT unnest([4, 8, 16, 32]) AS dims)),
      topt AS (SELECT dims, query_id, cand_id FROM (
          SELECT dims, query_id, cand_id, row_number() OVER (
              PARTITION BY dims, query_id
              ORDER BY cos DESC, cand_id ASC) AS rank
          FROM lv) WHERE rank <= 10),
      hits AS (SELECT t.dims, t.query_id,
                 sum(CASE WHEN u.cand_id IS NULL THEN 0 ELSE 1 END)
                   AS n_hits
               FROM topt t LEFT JOIN truth u
                 ON t.query_id = u.query_id AND t.cand_id = u.cand_id
               GROUP BY 1, 2)
      SELECT dims, query_id, CAST(n_hits AS BIGINT) AS n_hits,
             round(CAST(n_hits AS DOUBLE) / 10, 6) AS recall
      FROM hits ORDER BY dims, query_id""",


    "x_jl_projection_recall" -> jlRecallSql(64, 16, 10),


    "x_ann_recall" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id AS cand_id,
               list_inner_product(q.qv, e.v)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(e.v, e.v))) AS cos
        FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits,
             CAST(3 AS INTEGER) AS k,
             round(CAST(count(*) AS DOUBLE) / 3, 6) AS recall
      FROM ranked WHERE rank <= 3
      GROUP BY query_id ORDER BY query_id""",


    // PQ / IVF-PQ exactness audits: the degenerate kCodes ≥ corpus
    // codebook makes reconstruction lossless (and nProbe = nCells disarms
    // cell pruning for IVF-PQ), so both must reproduce brute-force top-3
    // over the vec_id < 500 corpus — DuckDB replays brute force
    "x_pq_recall" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE vec_id < 500),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id AS cand_id,
               list_inner_product(q.qv, e.v)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(e.v, e.v))) AS cos
        FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits,
             CAST(3 AS INTEGER) AS k,
             round(CAST(count(*) AS DOUBLE) / 3, 6) AS recall
      FROM ranked WHERE rank <= 3
      GROUP BY query_id ORDER BY query_id""",


    "x_ivfpq_recall" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE vec_id < 500),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id AS cand_id,
               list_inner_product(q.qv, e.v)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(e.v, e.v))) AS cos
        FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id ASC) AS rank
        FROM scored)
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits,
             CAST(3 AS INTEGER) AS k,
             round(CAST(count(*) AS DOUBLE) / 3, 6) AS recall
      FROM ranked WHERE rank <= 3
      GROUP BY query_id ORDER BY query_id""",


    "x_knn_ivf" -> """
      WITH e AS (SELECT vec_id, label AS cell,
                        CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, cell, v AS qv FROM e WHERE vec_id < 10),
      scored AS (
        SELECT q.query_id, q.cell, e.vec_id AS cand_id,
               list_inner_product(q.qv, e.v)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(e.v, e.v))) AS cos
        FROM e JOIN q ON e.cell = q.cell WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, cell, cand_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id ASC) AS INTEGER) AS rank
        FROM scored)
      SELECT query_id, cell, cand_id, round(cos, 6) AS cosine, rank
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""",


    // FULL hash oracle for the learned-IVF family: the integer-exact
    // Lloyd's codebook (md5-ordered lattice sample, greedy maximin init,
    // trunc-div half-away rounding) replays verbatim via
    // OracleShared.lloydsCtes; corpus/query cell assignment replays the
    // squared-L2 argmin through the |v|²−2v·c+|c|² decomposition (the
    // x_semdedup margin discipline), and scoring/ranking is the
    // list_inner_product cosine of x_knn_bruteforce
    "x_knn_learned_ivf" -> learnedIvfSql(nProbe = 1),
    "x_knn_ivf_multiprobe" -> learnedIvfSql(nProbe = 2),

    // FULL hash oracle for PQ/ADC: both the 8 per-subspace codebooks and
    // the encode→reconstruct→score chain replay exactly
    "x_knn_pq" -> s"""
      WITH ${OracleShared.lloydsCtes("pq", 8, 8, 16, 20, 4096)},
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
      sub AS (SELECT e.vec_id, ss.s AS s,
                list_transform(range(1 + ss.s * 8, 1 + (ss.s + 1) * 8),
                  i -> e.v[i]) AS sv
              FROM e, (SELECT unnest(range(0, 8)) AS s) ss),
      enc AS MATERIALIZED (SELECT vec_id, s, c FROM (
          SELECT sub.vec_id, sub.s, cb.c,
                 row_number() OVER (PARTITION BY sub.vec_id, sub.s
                   ORDER BY list_inner_product(sub.sv, sub.sv)
                     - 2 * list_inner_product(sub.sv, cb.cd)
                     + list_inner_product(cb.cd, cb.cd) ASC, cb.c ASC)
                   AS rnk
          FROM sub JOIN cb_pq cb ON sub.s = cb.s) WHERE rnk = 1),
      rv AS MATERIALIZED (
        SELECT enc.vec_id, flatten(list(cb.cd ORDER BY enc.s)) AS rv
        FROM enc JOIN cb_pq cb ON enc.s = cb.s AND enc.c = cb.c
        GROUP BY enc.vec_id),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, r.vec_id AS cand_id,
               list_inner_product(q.qv, r.rv)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(r.rv, r.rv))) AS cos
        FROM rv r CROSS JOIN q WHERE r.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, cand_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id ASC) AS INTEGER) AS rank
        FROM scored)
      SELECT query_id, cand_id, round(cos, 6) AS qcos, rank
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""",

    // FULL hash oracle for IVF-PQ: coarse cells bound WHICH candidates
    // score (nProbe = 2), PQ reconstruction bounds the bandwidth — both
    // codebooks replay from the same lattice sample
    "x_knn_ivfpq" -> s"""
      WITH ${OracleShared.lloydsCtes("ivf", 1, 64, 8, 20, 4096)},
      ${OracleShared.lloydsCtes("pq", 8, 8, 16, 20, 4096)},
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
      asgc AS MATERIALIZED (SELECT vec_id, cell FROM (
          SELECT e.vec_id, CAST(cb.c AS INTEGER) AS cell,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_inner_product(e.v, e.v)
                     - 2 * list_inner_product(e.v, cb.cd)
                     + list_inner_product(cb.cd, cb.cd) ASC, cb.c ASC)
                   AS rnk
          FROM e CROSS JOIN cb_ivf cb) WHERE rnk = 1),
      sub AS (SELECT e.vec_id, ss.s AS s,
                list_transform(range(1 + ss.s * 8, 1 + (ss.s + 1) * 8),
                  i -> e.v[i]) AS sv
              FROM e, (SELECT unnest(range(0, 8)) AS s) ss),
      enc AS MATERIALIZED (SELECT vec_id, s, c FROM (
          SELECT sub.vec_id, sub.s, cb.c,
                 row_number() OVER (PARTITION BY sub.vec_id, sub.s
                   ORDER BY list_inner_product(sub.sv, sub.sv)
                     - 2 * list_inner_product(sub.sv, cb.cd)
                     + list_inner_product(cb.cd, cb.cd) ASC, cb.c ASC)
                   AS rnk
          FROM sub JOIN cb_pq cb ON sub.s = cb.s) WHERE rnk = 1),
      rv AS MATERIALIZED (
        SELECT enc.vec_id, flatten(list(cb.cd ORDER BY enc.s)) AS rv
        FROM enc JOIN cb_pq cb ON enc.s = cb.s AND enc.c = cb.c
        GROUP BY enc.vec_id),
      qp AS (SELECT vec_id AS query_id, v AS qv, cell FROM (
          SELECT e.vec_id, e.v, CAST(cb.c AS INTEGER) AS cell,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_inner_product(e.v, e.v)
                     - 2 * list_inner_product(e.v, cb.cd)
                     + list_inner_product(cb.cd, cb.cd) ASC, cb.c ASC)
                   AS rnk
          FROM e CROSS JOIN cb_ivf cb WHERE e.vec_id < 5)
        WHERE rnk <= 2),
      scored AS (
        SELECT q.query_id, r.vec_id AS cand_id,
               list_inner_product(q.qv, r.rv)
                 / (sqrt(list_inner_product(q.qv, q.qv))
                    * sqrt(list_inner_product(r.rv, r.rv))) AS cos
        FROM rv r JOIN asgc a ON r.vec_id = a.vec_id
             JOIN qp q ON a.cell = q.cell
        WHERE r.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, cand_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, cand_id ASC) AS INTEGER) AS rank
        FROM scored)
      SELECT query_id, cand_id, round(cos, 6) AS qcos, rank
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""",

    // MUST-FIND anchor for the MLlib MinHashLSH bridge: identical-text
    // twins (doc_id + 1e6) have identical hashed-shingle vectors, so
    // their MinHash signatures collide in every hash table at any seed —
    // approxSimilarityJoin is CERTAIN to emit the pair at distance 0.
    // The oracle replays only the eligibility condition (>= 3 whitespace
    // words after trim, the 3-shingle precondition the bridge filters
    // on) and asserts the certain answer; the seeded hash family itself
    // never needs replaying because banding recall is 1.0 by identity.
    "x_minhash_mllib_twins" -> """
      SELECT CAST(doc_id AS BIGINT) AS id_a,
             CAST(doc_id + 1000000 AS BIGINT) AS id_b,
             CAST(1.0 AS DOUBLE) AS est_jaccard
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents WHERE doc_id < 60)
      WHERE len(w) >= 3
      ORDER BY id_a""",

    "x_cosine_neardups" -> """
      WITH e AS (SELECT vec_id, label AS cell,
                        CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT l.cell, l.vec_id AS id_a, r.vec_id AS id_b,
             round(list_inner_product(l.v, r.v)
               / (sqrt(list_inner_product(l.v, l.v))
                  * sqrt(list_inner_product(r.v, r.v))), 6) AS cos
      FROM e l JOIN e r ON l.cell = r.cell AND l.vec_id < r.vec_id
      WHERE round(list_inner_product(l.v, r.v)
               / (sqrt(list_inner_product(l.v, l.v))
                  * sqrt(list_inner_product(r.v, r.v))), 6) >= 0.4
      ORDER BY id_a, id_b""",


    // SemDeDup with seed centroids: DuckDB replays the nearest-centroid
    // assignment (squared-L2 argmin, lowest-index tiebreak — margins are
    // >=1e-4 at every SF so cross-engine float noise cannot flip it), the
    // within-cell rounded-cosine pair scan, and the lower-id drop rule
    "x_semdedup" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id AS cidx, v AS cv FROM e WHERE vec_id < 8),
      asg AS (
        SELECT vec_id, cell FROM (
          SELECT e.vec_id, CAST(c.cidx AS INTEGER) AS cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_inner_product(e.v, e.v)
                     - 2 * list_inner_product(e.v, c.cv)
                     + list_inner_product(c.cv, c.cv) ASC,
                   c.cidx ASC) AS rn
          FROM e CROSS JOIN c) WHERE rn = 1),
      dropped AS (
        SELECT DISTINCT b.vec_id AS id_b
        FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
             JOIN e ea ON a.vec_id = ea.vec_id
             JOIN e eb ON b.vec_id = eb.vec_id
        WHERE round(list_inner_product(ea.v, eb.v)
                / (sqrt(list_inner_product(ea.v, ea.v))
                   * sqrt(list_inner_product(eb.v, eb.v))), 6) >= 0.4)
      SELECT asg.vec_id, asg.cell, (d.id_b IS NULL) AS kept
      FROM asg LEFT JOIN dropped d ON asg.vec_id = d.id_b
      ORDER BY asg.vec_id""",


    // vector transforms: components exploded so the oracle checks every
    // element, not a summary
    "x_vector_normalize" -> """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM v),
      e AS (SELECT vec_id, nrm, unnest(range(1, len(v)+1)) AS kk, v FROM n)
      SELECT vec_id, CAST(kk - 1 AS INTEGER) AS idx,
             round(CASE WHEN nrm <> 0 THEN v[kk] / nrm ELSE v[kk] END, 6) AS nval
      FROM e ORDER BY vec_id, idx""",


    "x_quantize_int8" -> """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS sc FROM v),
      e AS (SELECT vec_id, sc, unnest(range(1, len(v)+1)) AS kk, v FROM s)
      SELECT vec_id, CAST(kk - 1 AS INTEGER) AS idx,
             CAST(round(CASE WHEN sc <> 0 THEN v[kk] * 127.0 / sc ELSE 0.0 END)
               AS INTEGER) AS q,
             round(sc, 6) AS scale
      FROM e ORDER BY vec_id, idx""",


    "x_quantized_ann" -> """
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS sc FROM v),
      q AS (SELECT vec_id, sc,
              list_transform(range(1, len(v)+1),
                kk -> CAST(round(CASE WHEN sc <> 0 THEN v[kk] * 127.0 / sc
                                      ELSE 0.0 END) AS INTEGER)) AS qv
            FROM s),
      p AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
              round(list_inner_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[]))
                    * a.sc * b.sc / 16129.0, 6) AS qcos
            FROM q a JOIN q b ON b.vec_id <> a.vec_id
            WHERE a.vec_id < 5),
      r AS (SELECT query_id, cand_id, qcos,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY qcos DESC, cand_id) AS INTEGER) AS rank
            FROM p)
      SELECT query_id, cand_id, qcos, rank FROM r WHERE rank <= 3
      ORDER BY query_id, rank""",


    "x_binary_features" -> """
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             md5(text) AS content_md5,
             substr(hex(encode(text)), 1, 2) AS first_byte_hex
      FROM documents ORDER BY doc_id""",


    // real mapPartitions codec (Base64 → UTF-8): every feature is a
    // function of the DECODED bytes, so computing the same features from
    // the original text pins the round trip — content_md5 makes the check
    // byte-exact (a single corrupted byte anywhere in the decode flips it)
    "x_decode_base64" -> """
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             CAST(length(text) AS INTEGER) AS n_chars,
             CAST(length(text) - length(replace(text, chr(10), '')) + 1
               AS INTEGER) AS n_lines,
             md5(text) AS content_md5
      FROM documents ORDER BY doc_id""",


    // multi-touch attribution: last-touch (latest in window, id
    // tie-break) + linear (1/n) credit; windowless conversions under
    // "(none)" so credit totals reconcile
    "q_attribution" -> """
      WITH t AS (SELECT user_id, event_type AS channel, ts AS t_ts,
                        event_id AS t_id
                 FROM events
                 WHERE event_type IN ('view', 'click', 'signup')),
      c AS (SELECT user_id, ts AS c_ts, event_id AS c_id FROM events
            WHERE event_type = 'purchase'),
      m AS (SELECT c.c_id, t.channel, t.t_ts, t.t_id
            FROM c JOIN t ON c.user_id = t.user_id
              AND t.t_ts >= c.c_ts - INTERVAL 7 DAY AND t.t_ts < c.c_ts),
      w AS (SELECT *, count(*) OVER (PARTITION BY c_id) AS n,
              row_number() OVER (PARTITION BY c_id
                ORDER BY t_ts DESC, t_id DESC) AS rn
            FROM m),
      per AS (SELECT channel,
                CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS last_touch_convs,
                round(sum(1.0 / n), 6) AS linear_credit,
                CAST(count(*) AS BIGINT) AS touches
              FROM w GROUP BY channel),
      none AS (SELECT '(none)' AS channel,
                 CAST(count(*) AS BIGINT) AS last_touch_convs,
                 0.0 AS linear_credit, CAST(0 AS BIGINT) AS touches
               FROM c WHERE c_id NOT IN (SELECT DISTINCT c_id FROM m))
      SELECT * FROM per UNION ALL SELECT * FROM none ORDER BY channel""",


    "q_funnel" -> """
      WITH fv AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      fc AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
             JOIN fv ON e.user_id = fv.user_id AND e.ts >= fv.t_view
             WHERE e.event_type = 'click' GROUP BY e.user_id),
      fp AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
             JOIN fc ON e.user_id = fc.user_id AND e.ts >= fc.t_click
             WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      SELECT (SELECT count(*) FROM fv) AS n_view,
             (SELECT count(*) FROM fc) AS n_click,
             (SELECT count(*) FROM fp) AS n_purchase,
             round((SELECT count(*) FROM fc)
               / CAST((SELECT count(*) FROM fv) AS DOUBLE), 6) AS click_rate,
             round((SELECT count(*) FROM fp)
               / CAST((SELECT count(*) FROM fc) AS DOUBLE), 6)
               AS purchase_rate""",


    // deadline funnel: 24h view->click, 72h click->purchase windows,
    // median stage latencies in seconds
    "q_funnel_windowed" -> """
      WITH fv AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      fc AS (SELECT e.user_id, min(e.ts) AS t_click,
                    min(fv.t_view) AS t_view
             FROM events e
             JOIN fv ON e.user_id = fv.user_id AND e.ts >= fv.t_view
               AND e.ts < fv.t_view + INTERVAL 24 HOUR
             WHERE e.event_type = 'click' GROUP BY e.user_id),
      fp AS (SELECT e.user_id, min(e.ts) AS t_purchase,
                    min(fc.t_click) AS t_click2
             FROM events e
             JOIN fc ON e.user_id = fc.user_id AND e.ts >= fc.t_click
               AND e.ts < fc.t_click + INTERVAL 72 HOUR
             WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      SELECT (SELECT count(*) FROM fv) AS n_view,
             (SELECT count(*) FROM fc) AS n_click,
             (SELECT round(quantile_cont(
                 (epoch_us(t_click) - epoch_us(t_view)) / 1000000, 0.5), 6)
              FROM fc) AS median_view_to_click_s,
             (SELECT count(*) FROM fp) AS n_purchase,
             (SELECT round(quantile_cont(
                 (epoch_us(t_purchase) - epoch_us(t_click2)) / 1000000,
                 0.5), 6)
              FROM fp) AS median_click_to_purchase_s,
             round((SELECT count(*) FROM fc)
               / CAST((SELECT count(*) FROM fv) AS DOUBLE), 6)
               AS click_rate,
             round((SELECT count(*) FROM fp)
               / CAST((SELECT count(*) FROM fc) AS DOUBLE), 6)
               AS purchase_rate""",


    // cohort LTV: purchase revenue per (cohort, age week), cumulative
    // and per-member, over the bounded cohort grid
    "q_cohort_ltv" -> """
      WITH f AS (SELECT user_id,
                        CAST(date_trunc('week', min(CAST(ts AS DATE)))
                          AS DATE) AS cohort_week
                 FROM events GROUP BY user_id),
      sizes AS (SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
                FROM f GROUP BY cohort_week),
      rev AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                 CAST(date_trunc('week', CAST(e.ts AS DATE)) AS DATE)) / 7
                 AS INTEGER) AS week_offset,
               sum(e.value) AS r
        FROM events e JOIN f USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2)
      SELECT rev.cohort_week, rev.week_offset, sizes.cohort_size,
             round(rev.r, 6) AS week_revenue,
             round(sum(rev.r) OVER w, 6) AS cum_revenue,
             round(sum(rev.r) OVER w
               / CAST(sizes.cohort_size AS DOUBLE), 6) AS cum_ltv_per_user
      FROM rev JOIN sizes USING (cohort_week)
      WINDOW w AS (PARTITION BY rev.cohort_week ORDER BY rev.week_offset
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY rev.cohort_week, rev.week_offset""",


    "q_cohort_retention" -> """
      WITH f AS (SELECT user_id,
                        CAST(date_trunc('week', min(CAST(ts AS DATE)))
                          AS DATE) AS cohort_week
                 FROM events GROUP BY user_id),
      a AS (SELECT DISTINCT user_id,
                   CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE)
                     AS act_week
            FROM events)
      SELECT cohort_week,
             CAST(date_diff('day', cohort_week, act_week) / 7 AS INTEGER)
               AS week_offset,
             count(DISTINCT user_id) AS n_users
      FROM a JOIN f USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2""",


    // cluster-balanced diverse sample: the same Lloyd assignment, then
    // a seeded per-cell quota in rounded-u01 order with id tiebreak
    "x_diverse_sample" -> (kmeansCtes + s""",
      u AS (SELECT id, cl, round(${uk("id", 131)}, 6) AS uu FROM a3),
      r AS (SELECT id, cl,
              CAST(row_number() OVER (PARTITION BY cl
                ORDER BY uu, id) AS INTEGER) AS pick_rank
            FROM u)
      SELECT id AS vec_id, cl AS cluster, pick_rank
      FROM r WHERE pick_rank <= 5 ORDER BY cluster, pick_rank"""),

    // item-item CF: distinct baskets, maxBasket power-user cut, df-cut
    // items, user-keyed pair join, cosine rounded BEFORE the top-k
    // window so tie order is engine-stable
    "x_item_cf" -> (itemCfCtes + """
      SELECT item, rank, neighbor, n_co, df_item, df_neighbor, cosine
      FROM r WHERE rank <= 10 ORDER BY item, rank"""),

    // the bucketed CF path REPLAYED IN FULL: quadratic-key minstd
    // permutations, per-(item, j) min-hash, value-pair band keys,
    // exact verify, cosine >= 0.1, top-10 — a fully oracle-checked LSH
    // build (the xxhash64 doc-dedup banding cannot do this)
    "x_item_cf_lsh" -> s"""
      WITH ui AS (SELECT DISTINCT o_custkey AS u, l_partkey AS i
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL),
      bs AS (SELECT u, i, count(*) OVER (PARTITION BY u) AS bsz FROM ui),
      capped AS (SELECT u, i FROM bs WHERE bsz <= 256),
      dfs AS (SELECT i, CAST(count(*) AS BIGINT) AS df
              FROM capped GROUP BY i
              HAVING count(*) >= 2 AND count(*) <= 1000),
      kept AS (SELECT c.u, c.i FROM capped c JOIN dfs d ON c.i = d.i),
      sig AS (SELECT k.i AS id, j.j,
              min(CAST(floor(${uk(
                "((((k.u + j.j * 1000003) % 2147483647)" +
                  " * ((k.u + j.j * 1000003) % 2147483647))" +
                  " % 2147483647)", 500)} * 2147483647.0) AS BIGINT))
                AS mh
            FROM kept k, (SELECT unnest(range(0, 32)) AS j) j
            GROUP BY 1, 2),
      bnd AS (SELECT id, j // 2 AS band,
              max(CASE WHEN j % 2 = 0 THEN mh END) AS v1,
              max(CASE WHEN j % 2 = 1 THEN mh END) AS v2
            FROM sig GROUP BY 1, 2),
      cand AS (SELECT DISTINCT l.id AS ia, r.id AS ib
            FROM bnd l JOIN bnd r ON l.band = r.band AND l.v1 = r.v1
              AND l.v2 = r.v2 AND l.id < r.id),
      co AS (SELECT c.ia, c.ib, CAST(count(*) AS BIGINT) AS n_co
            FROM cand c JOIN kept a ON a.i = c.ia
                        JOIN kept b ON b.i = c.ib AND b.u = a.u
            GROUP BY 1, 2),
      sym AS (SELECT ia AS item, ib AS neighbor, n_co FROM co
              UNION ALL
              SELECT ib AS item, ia AS neighbor, n_co FROM co),
      sc AS (SELECT s.item, s.neighbor, s.n_co,
              di.df AS df_item, dn.df AS df_neighbor,
              CAST(s.n_co AS DOUBLE)
                / sqrt(CAST(di.df AS DOUBLE) * dn.df) AS rawcos
            FROM sym s JOIN dfs di ON s.item = di.i
                       JOIN dfs dn ON s.neighbor = dn.i),
      rk AS (SELECT item, neighbor, n_co, df_item, df_neighbor,
              round(rawcos, 6) AS cosine,
              CAST(row_number() OVER (PARTITION BY item
                ORDER BY round(rawcos, 6) DESC, n_co DESC, neighbor ASC)
                AS INTEGER) AS rank
            FROM sc WHERE rawcos >= 0.1)
      SELECT item, rank, neighbor, n_co, df_item, df_neighbor, cosine
      FROM rk WHERE rank <= 10 ORDER BY item, rank""",

    // MUST-FIND twin anchor for the LSH-bucketed CF: identical user
    // sets are proposed in every band, so the output is exactly one row
    // per kept original item — its twin pair at n_co = df, cosine 1.0.
    // The caps replay on the TWINNED corpus (baskets double: 512 cap
    // keeps the same users as the exact build's 256).
    "x_item_cf_lsh_twins" -> """
      WITH ui AS (SELECT DISTINCT o_custkey AS u, l_partkey AS i
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL),
      tw AS (SELECT u, i FROM ui
             UNION ALL SELECT u, i + 1000000 FROM ui),
      bs AS (SELECT u, i, count(*) OVER (PARTITION BY u) AS bsz FROM tw),
      capped AS (SELECT u, i FROM bs WHERE bsz <= 512),
      dfs AS (SELECT i, CAST(count(*) AS BIGINT) AS df
              FROM capped GROUP BY i
              HAVING count(*) >= 2 AND count(*) <= 1000)
      SELECT i AS item, i + 1000000 AS neighbor, df AS n_co,
             df AS df_item, df AS df_neighbor, 1.0 AS cosine
      FROM dfs WHERE i < 1000000 ORDER BY item""",

    // serving pass: per-user candidate scores = lattice-summed neighbor
    // cosines over basket items, owned items anti-joined out, top-5 by
    // (score DESC, item ASC)
    "x_rec_topk" -> (itemCfCtes + """,
      nb AS (SELECT item AS i, neighbor AS cand,
              CAST(round(cosine * 1000000.0, 0) AS BIGINT) AS cl
            FROM r WHERE rank <= 10),
      cands AS (SELECT ui.u, nb.cand, CAST(sum(nb.cl) AS BIGINT)
                AS score, CAST(count(*) AS BIGINT) AS n_sources
            FROM ui JOIN nb ON ui.i = nb.i GROUP BY 1, 2),
      fresh AS (SELECT c.* FROM cands c
            LEFT JOIN ui o ON c.u = o.u AND c.cand = o.i
            WHERE o.u IS NULL),
      rr AS (SELECT *, CAST(row_number() OVER (PARTITION BY u
              ORDER BY score DESC, cand ASC) AS INTEGER) AS rec_rank
            FROM fresh)
      SELECT u AS o_custkey, rec_rank, cand AS rec_item, n_sources,
             round(CAST(score AS DOUBLE) / 1000000.0, 6) AS score
      FROM rr WHERE rec_rank <= 5 ORDER BY o_custkey, rec_rank"""),

    // quality scorecard: catalog coverage + mean -log2(df/users)
    // novelty of the recommended items (1e-9 lattice before the fold)
    "x_rec_metrics" -> (itemCfCtes + """,
      nb AS (SELECT item AS i, neighbor AS cand,
              CAST(round(cosine * 1000000.0, 0) AS BIGINT) AS cl
            FROM r WHERE rank <= 10),
      cands AS (SELECT ui.u, nb.cand, CAST(sum(nb.cl) AS BIGINT)
                AS score FROM ui JOIN nb ON ui.i = nb.i GROUP BY 1, 2),
      fresh AS (SELECT c.* FROM cands c
            LEFT JOIN ui o ON c.u = o.u AND c.cand = o.i
            WHERE o.u IS NULL),
      rr AS (SELECT *, row_number() OVER (PARTITION BY u
              ORDER BY score DESC, cand ASC) AS rec_rank FROM fresh),
      pop AS (SELECT i, CAST(count(*) AS BIGINT) AS df
            FROM ui GROUP BY i),
      tot AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS nu,
              CAST(count(DISTINCT i) AS BIGINT) AS cat FROM ui),
      sc AS (SELECT rr.cand AS i,
              CAST(round((0.0 - ln(CAST(p.df AS DOUBLE)
                / CAST(t.nu AS DOUBLE)) / ln(2.0)) * 1000000000.0, 0)
                AS BIGINT) AS nov
            FROM rr JOIN pop p ON rr.cand = p.i, tot t
            WHERE rr.rec_rank <= 5),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_recs,
              CAST(count(DISTINCT i) AS BIGINT) AS n_rec_items,
              CAST(coalesce(sum(nov), 0) AS BIGINT) AS ns FROM sc)
      SELECT t.nu AS n_users, t.cat AS catalog_size, f.n_recs,
             f.n_rec_items,
             round(CAST(f.n_rec_items AS DOUBLE)
               / CAST(t.cat AS DOUBLE), 6) AS catalog_coverage,
             round(CASE WHEN f.n_recs > 0 THEN CAST(f.ns AS DOUBLE)
               / (1000000000.0 * CAST(f.n_recs AS DOUBLE)) END, 6)
               AS mean_novelty
      FROM f, tot t"""))
}
