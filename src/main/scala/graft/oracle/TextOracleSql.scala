package graft
package oracle

/** DuckDB oracle SQL — text analysis, BPE/unigram tokenization (TextRegistry). One domain slice of the former
  * monolithic OracleSql map; entries are verbatim, parity rules on
  * [[graft.OracleSql]].
  */
private[graft] object TextOracleSql {
  import OracleShared._

  val sql: Map[String, String] = Map(

    // char-histogram entropy: ln/ln(2) on BOTH sides (log2() directly can
    // differ in the last ulp); unordered Σ c·log2(c) matches the native
    // expression's codepoint-ordered sum at round-6
    "x_char_entropy" -> """
      WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
      hist AS (
        SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
        FROM ch GROUP BY doc_id, c),
      ent AS (
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
               sum(cnt * (ln(CAST(cnt AS DOUBLE)) / ln(2.0))) AS acc
        FROM hist GROUP BY doc_id),
      rounded AS (
        SELECT d.doc_id,
               round(CASE WHEN e.n IS NULL OR e.n = 0 THEN 0.0
                 ELSE ln(CAST(e.n AS DOUBLE))/ln(2.0) - e.acc/e.n END, 6)
                 AS char_entropy
        FROM documents d LEFT JOIN ent e ON d.doc_id = e.doc_id)
      SELECT doc_id, char_entropy,
             -- band from the ROUNDED value, same as the Spark projection
             CASE WHEN char_entropy < 2.0 THEN 'low'
                  WHEN char_entropy > 6.0 THEN 'high'
                  ELSE 'normal' END AS entropy_band
      FROM rounded ORDER BY doc_id""",


    // overlapping 32-token windows every 16 tokens; chunk count =
    // max(ceil((n-32)/16), 0) + 1, token slices clamp at document end
    "x_chunk_windows" -> """
      WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                 FROM documents WHERE trim(text) <> ''),
      chunks AS (
        SELECT doc_id, CAST(kk AS INTEGER) AS chunk_idx,
               array_to_string(w[kk*16+1 : kk*16+32], ' ') AS chunk_text,
               CAST(len(w[kk*16+1 : kk*16+32]) AS INTEGER) AS n_tokens
        FROM (SELECT doc_id, w,
                     unnest(range(0, CAST(greatest(ceil((len(w)-32)/16.0), 0)
                       AS BIGINT) + 1)) AS kk
              FROM d))
      SELECT doc_id, chunk_idx, chunk_text, n_tokens
      FROM chunks ORDER BY doc_id, chunk_idx""",


    // cross-document first-occurrence line dedup over the injected 8-word
    // line structure: winner per line fingerprint = smallest
    // doc·10⁶+idx position; blank lines (none here) always kept. The
    // WHERE trim(text) <> '' mirrors the registered query's filter —
    // empty docs are excluded on BOTH sides (the operator itself keeps
    // them as one blank line, which this line-derivation CTE cannot
    // express)
    // Flesch reading ease: vowel-group syllables (floored at one per
    // word), terminal-punctuation sentences (floored at 1), banding on
    // the rounded score so both engines band identical values
    "x_readability" -> """
      WITH b AS (SELECT doc_id,
              CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                AS n_words,
              CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                AS BIGINT) AS n_sentences,
              CAST(greatest(len(regexp_extract_all(lower(text),
                  '[aeiouy]+')),
                len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
                AS n_syllables
            FROM documents WHERE trim(text) <> ''),
      f AS (SELECT *,
              round(206.835
                - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
                AS flesch
            FROM b)
      SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
             CASE WHEN flesch >= 60.0 THEN 'easy'
                  WHEN flesch >= 30.0 THEN 'standard'
                  ELSE 'difficult' END AS band
      FROM f ORDER BY doc_id""",


    // ExactSubstr replay: corpus k-gram table -> count + packed-long
    // first occurrence -> per-doc island merge (all integer logic)
    "x_dup_substrings" -> s"""
      WITH $dupSpanCtes
      SELECT doc_id, span_start, span_end,
             span_end - span_start AS span_len
      FROM sp ORDER BY doc_id, span_start""",


    "x_dup_substring_stats" -> s"""
      WITH $dupSpanCtes,
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                     CAST(sum(span_end - span_start) AS BIGINT) AS dup
              FROM sp GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS doc_chars,
             CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
             CAST(coalesce(a.dup, 0) AS BIGINT) AS dup_chars,
             CASE WHEN len(d.text) > 0 THEN
               round(coalesce(a.dup, 0) / CAST(len(d.text) AS DOUBLE), 6)
               ELSE 0.0 END AS dup_ratio
      FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id""",


    "x_dedup_lines" -> """
      WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                 FROM documents WHERE trim(text) <> ''),
      lines AS (
        SELECT doc_id, CAST(kk AS INTEGER) AS idx,
               array_to_string(w[kk*8+1 : kk*8+8], ' ') AS line
        FROM (SELECT doc_id, w,
                     unnest(range(0, CAST(greatest(ceil((len(w)-8)/8.0), 0)
                       AS BIGINT) + 1)) AS kk
              FROM d)),
      content AS (
        SELECT doc_id, idx, line,
               md5(trim(regexp_replace(lower(line), '\s+', ' ', 'g'))) AS fp
        FROM lines WHERE trim(line) <> ''),
      winners AS (
        SELECT fp, doc_id, idx FROM (
          SELECT fp, doc_id, idx,
                 row_number() OVER (PARTITION BY fp ORDER BY doc_id, idx) AS rn
          FROM content) WHERE rn = 1),
      kept AS (
        SELECT c.doc_id, c.idx, c.line
        FROM content c
        JOIN winners w ON c.fp = w.fp AND c.doc_id = w.doc_id
                      AND c.idx = w.idx),
      nl AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
      SELECT nl.doc_id,
             coalesce(string_agg(kept.line, chr(10) ORDER BY kept.idx), '')
               AS clean_text,
             CAST(count(kept.line) AS BIGINT) AS n_lines_kept,
             CAST(nl.n_lines - count(kept.line) AS BIGINT) AS n_lines_removed
      FROM nl LEFT JOIN kept ON nl.doc_id = kept.doc_id
      GROUP BY nl.doc_id, nl.n_lines
      ORDER BY nl.doc_id""",


    // chunk-level pipeline composite: the x_dedup_lines CTEs (8-word line
    // injection + first-occurrence dedup), a ≥2-surviving-lines doc
    // floor, 16-token windows, hash shard, per-shard summary
    "x_llm_pipeline_v2" -> s"""
      WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                 FROM documents WHERE trim(text) <> ''),
      lines AS (
        SELECT doc_id, CAST(kk AS INTEGER) AS idx,
               array_to_string(w[kk*8+1 : kk*8+8], ' ') AS line
        FROM (SELECT doc_id, w,
                     unnest(range(0, CAST(greatest(ceil((len(w)-8)/8.0), 0)
                       AS BIGINT) + 1)) AS kk
              FROM d)),
      content AS (
        SELECT doc_id, idx, line,
               md5(trim(regexp_replace(lower(line), '\\s+', ' ', 'g'))) AS fp
        FROM lines WHERE trim(line) <> ''),
      winners AS (
        SELECT fp, doc_id, idx FROM (
          SELECT fp, doc_id, idx,
                 row_number() OVER (PARTITION BY fp ORDER BY doc_id, idx) AS rn
          FROM content) WHERE rn = 1),
      kept AS (
        SELECT c.doc_id, c.idx, c.line
        FROM content c
        JOIN winners wi ON c.fp = wi.fp AND c.doc_id = wi.doc_id
                       AND c.idx = wi.idx),
      clean AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text
        FROM kept GROUP BY doc_id HAVING count(*) >= 2),
      cw AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
             FROM clean),
      chunks AS (
        SELECT doc_id, CAST(kk AS INTEGER) AS chunk_idx,
               CAST(len(w[kk*16+1 : kk*16+16]) AS BIGINT) AS n_tokens,
               doc_id*1000000 + kk AS chunk_key
        FROM (SELECT doc_id, w,
                     unnest(range(0, CAST(greatest(ceil((len(w)-16)/16.0), 0)
                       AS BIGINT) + 1)) AS kk
              FROM cw)),
      sharded AS (
        SELECT chunk_key, n_tokens,
               least(CAST(floor(${uk("chunk_key", 71)} * 8) AS INTEGER), 7)
                 AS shard
        FROM chunks)
      SELECT shard, count(*) AS n_chunks,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM sharded GROUP BY shard ORDER BY shard""",


    // DSIR: both hashed-unigram LMs from one token stream; Gumbel key
    // replayed from the shared u01 hash and rounded at 6 before top-k
    // raking: unrolled IPF half-steps, weights committed to the 1e-6
    // lattice each half-step so marginal sums are exact longs
    "x_rake_weights" -> {
      val steps = (1 to 3).flatMap { i =>
        val p = if (i == 1) "base" else s"s${2 * (i - 1)}"
        Seq(
          s"""s${2 * i - 1} AS (SELECT r, c, n, tot,
             CAST(round(wu * ((CAST(tot AS DOUBLE) / (SELECT v FROM nr))
               / (CAST(sum(wu) OVER (PARTITION BY r) AS DOUBLE) / 1e6)),
               0) AS BIGINT) AS wu
           FROM $p)""",
          s"""s${2 * i} AS (SELECT r, c, n, tot,
             CAST(round(wu * ((CAST(tot AS DOUBLE) / (SELECT v FROM nc))
               / (CAST(sum(wu) OVER (PARTITION BY c) AS DOUBLE) / 1e6)),
               0) AS BIGINT) AS wu
           FROM s${2 * i - 1})""")
      }.mkString(",\n      ")
      s"""
      WITH cells AS (SELECT lang AS r, source AS c,
              CAST(count(*) AS BIGINT) AS n
            FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
            GROUP BY 1, 2),
      nr AS (SELECT CAST(count(DISTINCT r) AS BIGINT) AS v FROM cells),
      nc AS (SELECT CAST(count(DISTINCT c) AS BIGINT) AS v FROM cells),
      base AS (SELECT r, c, n, CAST(sum(n) OVER () AS BIGINT) AS tot,
              CAST(n * 1000000 AS BIGINT) AS wu
            FROM cells),
      $steps
      SELECT r AS lang, c AS source, n AS n_docs,
             round(wu / 1e6, 6) AS raked_weight,
             round(wu / 1e6 / n, 6) AS weight_ratio
      FROM s6 ORDER BY lang, source"""
    },


    // dataset card: exact counts + single divisions, the x_dedup_exact
    // normalized-md5 dup key, metric/value rows
    "x_dataset_card" -> """
      WITH f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(count(DISTINCT lang) AS BIGINT) AS nl,
              CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                AS BIGINT) AS en,
              CAST(sum(len(string_split_regex(trim(text), '\s+')))
                AS BIGINT) AS toks,
              CAST(sum(length(text)) AS BIGINT) AS chars,
              CAST(count(DISTINCT md5(trim(regexp_replace(lower(text),
                '\s+', ' ', 'g')))) AS BIGINT) AS uniq
            FROM documents)
      SELECT metric, value FROM (
        SELECT 'n_docs' AS metric, CAST(n AS DOUBLE) AS value FROM f
        UNION ALL SELECT 'n_langs', CAST(nl AS DOUBLE) FROM f
        UNION ALL SELECT 'pct_english',
          round(CAST(en AS DOUBLE) / CAST(n AS DOUBLE), 6) FROM f
        UNION ALL SELECT 'total_tokens', CAST(toks AS DOUBLE) FROM f
        UNION ALL SELECT 'mean_doc_chars',
          round(CAST(chars AS DOUBLE) / CAST(n AS DOUBLE), 6) FROM f
        UNION ALL SELECT 'mean_doc_tokens',
          round(CAST(toks AS DOUBLE) / CAST(n AS DOUBLE), 6) FROM f
        UNION ALL SELECT 'exact_dup_rate',
          round(CAST(n - uniq AS DOUBLE) / CAST(n AS DOUBLE), 6) FROM f)
      ORDER BY metric""",


    // Kish ESS over the DSIR per-token-normalized weights: the dsir
    // chain replayed, weight from the ROUNDED log_w, moments exact on
    // the 1e-6 lattice (scale cancels in the ratio)
    "x_dsir_ess" -> """
      WITH toks AS (
        SELECT doc_id, (lang = 'en') AS t,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents),
      tok2 AS (
        SELECT doc_id, t,
               CAST(CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT)
                 % 1024 AS BIGINT) AS bucket
        FROM toks WHERE term <> ''),
      bc AS (SELECT bucket, count(*) FILTER (t) AS ct, count(*) AS cs
             FROM tok2 GROUP BY bucket),
      tot AS (SELECT sum(ct) AS nt, sum(cs) AS ns FROM bc),
      sc AS (SELECT bucket,
                    ln(CAST(ct + 1 AS DOUBLE) / (nt + 1024)) -
                    ln(CAST(cs + 1 AS DOUBLE) / (ns + 1024)) AS dlog
             FROM bc, tot),
      tf AS (SELECT doc_id, bucket, count(*) AS tf
             FROM tok2 GROUP BY doc_id, bucket),
      w AS (SELECT d.doc_id,
                   coalesce(sum(tf.tf), 0) AS n_tokens,
                   coalesce(sum(tf.tf * sc.dlog), 0.0) AS log_w
            FROM documents d
            LEFT JOIN tf ON d.doc_id = tf.doc_id
            LEFT JOIN sc ON tf.bucket = sc.bucket
            GROUP BY d.doc_id),
      wu AS (SELECT CAST(round(exp(round(log_w, 6)
               / CAST(greatest(n_tokens, 1) AS DOUBLE)) * 1e6, 0)
               AS BIGINT) AS wq
             FROM w),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(wq) AS BIGINT) AS sw,
              sum(CAST(wq AS HUGEINT) * wq) AS sww,
              CAST(min(wq) AS BIGINT) AS mn
            FROM wu)
      SELECT n, round(CAST(sw AS DOUBLE) / 1e6, 6) AS sum_weight,
             CASE WHEN mn >= 0 AND sww > 0 THEN
               round(CAST(CAST(sw AS HUGEINT) * sw AS DOUBLE)
                 / CAST(sww AS DOUBLE), 6) END AS ess,
             CASE WHEN mn >= 0 AND sww > 0 THEN
               round(CAST(CAST(sw AS HUGEINT) * sw AS DOUBLE)
                 / CAST(sww AS DOUBLE) / CAST(n AS DOUBLE), 6)
             END AS ess_ratio
      FROM f""",


    "x_dsir_sample" -> s"""
      WITH toks AS (
        SELECT doc_id, (lang = 'en') AS t,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents),
      tok2 AS (
        SELECT doc_id, t,
               CAST(CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT)
                 % 1024 AS BIGINT) AS bucket
        FROM toks WHERE term <> ''),
      bc AS (SELECT bucket, count(*) FILTER (t) AS ct, count(*) AS cs
             FROM tok2 GROUP BY bucket),
      tot AS (SELECT sum(ct) AS nt, sum(cs) AS ns FROM bc),
      sc AS (SELECT bucket,
                    ln(CAST(ct + 1 AS DOUBLE) / (nt + 1024)) -
                    ln(CAST(cs + 1 AS DOUBLE) / (ns + 1024)) AS dlog
             FROM bc, tot),
      tf AS (SELECT doc_id, bucket, count(*) AS tf
             FROM tok2 GROUP BY doc_id, bucket),
      w AS (SELECT d.doc_id,
                   coalesce(sum(tf.tf), 0) AS n_tokens,
                   coalesce(sum(tf.tf * sc.dlog), 0.0) AS log_w
            FROM documents d
            LEFT JOIN tf ON d.doc_id = tf.doc_id
            LEFT JOIN sc ON tf.bucket = sc.bucket
            GROUP BY d.doc_id),
      k AS (SELECT doc_id, n_tokens, log_w,
                   round(log_w - ln(-ln(least(${uk("doc_id", 97)},
                     1.0 - 1e-12))), 6) AS key
            FROM w)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             round(log_w, 6) AS log_w
      FROM (SELECT * FROM k ORDER BY key DESC, doc_id LIMIT 100)
      ORDER BY doc_id""",


    // RAKE: cumulative break segmentation, exact freq/degree, word
    // scores on the 1e-9 lattice before the phrase fold, total-order
    // top-20
    "x_rake_keywords" -> {
      val stop = Seq("the", "a", "an", "of", "and", "in", "to", "is")
        .map(w => s"'$w'").mkString(", ")
      s"""
      WITH tw AS (
        SELECT doc_id, list_filter(string_split_regex(trim(lower(text)),
          '\\s+'), x -> x <> '') AS w
        FROM documents),
      toks AS (
        SELECT doc_id, kk AS p,
               regexp_replace(w[kk], '[^a-z0-9]+', '', 'g') AS t
        FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS kk
              FROM tw)),
      brk AS (SELECT doc_id, p, t,
               (t = '' OR t IN ($stop)) AS brk FROM toks),
      ph AS (SELECT *, sum(CASE WHEN brk THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN
                 UNBOUNDED PRECEDING AND CURRENT ROW) AS phid
             FROM brk),
      wr AS MATERIALIZED (
        SELECT doc_id, phid, p, t,
               count(*) OVER (PARTITION BY doc_id, phid) AS len
        FROM ph WHERE NOT brk),
      ws AS (SELECT t, CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(len) AS BIGINT) AS deg FROM wr GROUP BY 1),
      s9 AS (SELECT t, CAST(round(CAST(deg AS DOUBLE)
               / CAST(freq AS DOUBLE) * 1e9, 0) AS BIGINT) AS s9
             FROM ws),
      ps AS (SELECT wr.doc_id, wr.phid,
               CAST(sum(s9.s9) AS BIGINT) AS ps9
             FROM wr JOIN s9 ON wr.t = s9.t GROUP BY 1, 2),
      pstr AS (SELECT doc_id, phid, string_agg(t, ' ' ORDER BY p)
                 AS phrase
               FROM wr GROUP BY 1, 2),
      agg AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
                max(ps9) AS s
              FROM pstr JOIN ps USING (doc_id, phid) GROUP BY 1)
      SELECT phrase, n_occurrences,
             round(CAST(s AS DOUBLE) / 1e9, 6) AS rake_score
      FROM agg ORDER BY rake_score DESC, phrase LIMIT 20"""
    },


    // KN bigram entropy: exact count tables off one (v,t) grain, the
    // fixed -log2 tree committed to the 1e-9 lattice pre-fold
    "x_kn_bigram" -> {
      val d = 0.75
      s"""
      WITH tw AS (
        SELECT doc_id, list_filter(string_split_regex(trim(lower(text)),
          '\\s+'), x -> x <> '') AS w
        FROM documents),
      bi AS (
        SELECT doc_id, w[i] AS v, w[i + 1] AS t
        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
              FROM tw WHERE len(w) >= 2)),
      cvw AS MATERIALIZED (
        SELECT v, t, CAST(count(*) AS BIGINT) AS cvw
        FROM bi GROUP BY 1, 2),
      cv AS (SELECT v, CAST(sum(cvw) AS BIGINT) AS cv,
               CAST(count(*) AS BIGINT) AS n1v FROM cvw GROUP BY 1),
      cw AS (SELECT t, CAST(count(*) AS BIGINT) AS n1w
             FROM cvw GROUP BY 1),
      nbb AS (SELECT CAST(count(*) AS BIGINT) AS nbb FROM cvw),
      model AS (
        SELECT cvw.v, cvw.t,
          CAST(round(-log2((greatest(CAST(cvw AS DOUBLE) - $d, 0.0)
            + $d * CAST(n1v AS DOUBLE)
              * (CAST(n1w AS DOUBLE) / CAST(nbb AS DOUBLE)))
            / CAST(cv AS DOUBLE)) * 1e9, 0) AS BIGINT) AS s9
        FROM cvw JOIN cv USING (v) JOIN cw USING (t), nbb),
      per AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(s9) AS BIGINT) AS ss
        FROM bi JOIN model USING (v, t) GROUP BY 1)
      SELECT d.doc_id,
             CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             coalesce(round(CAST(per.ss AS DOUBLE) / 1e9
               / CAST(per.n_bigrams AS DOUBLE), 6), 0.0) AS kn_entropy
      FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
      ORDER BY d.doc_id"""
    },


    "x_lm_surprisal" -> """
      WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM toks WHERE term <> '' GROUP BY doc_id, term),
      tc AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
      tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM tc),
      vocab AS (SELECT term, cnt FROM tc ORDER BY cnt DESC, term LIMIT 100),
      ts AS (SELECT term,
                    -log2(cnt / (SELECT total FROM tot)) AS s FROM vocab),
      per AS (
        SELECT tf.doc_id,
               sum(tf.tf) AS n_tokens,
               sum(CASE WHEN ts.s IS NULL THEN tf.tf ELSE 0 END) AS n_oov,
               round(sum(tf.tf * COALESCE(ts.s,
                     log2((SELECT total FROM tot)))) / sum(tf.tf), 6)
                 AS surprisal
        FROM tf LEFT JOIN ts USING (term) GROUP BY tf.doc_id)
      SELECT d.doc_id,
             CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
             CAST(COALESCE(per.n_oov, 0) AS BIGINT) AS n_oov,
             COALESCE(per.surprisal, 0.0) AS surprisal
      FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
      ORDER BY d.doc_id""",


    "x_token_stats" -> """
      SELECT doc_id,
             CAST(length(text) AS INTEGER) AS n_chars,
             CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
             CAST(len(string_split_regex(text, '[a-zA-Z]+')) - 1 AS INTEGER)
               AS n_alpha_runs,
             round(CAST(length(text) AS DOUBLE)
               / len(string_split_regex(trim(text), '\s+')), 6) AS chars_per_token
      FROM documents ORDER BY doc_id""",


    "x_quality_scores" -> """
      WITH d AS (
        SELECT doc_id, text,
               string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents)
      SELECT doc_id,
             CAST(length(text) AS INTEGER) AS n_chars,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             round(CAST(length(text)
               - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))
               AS DOUBLE) / length(text), 6) AS punct_ratio,
             round(CAST(len(list_filter(toks, t -> list_contains(
               ['the','a','an','and','or','of','to','in','is','on','for'], t)))
               AS DOUBLE) / len(toks), 6) AS stopword_ratio,
             round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
               AS distinct_token_ratio
      FROM d ORDER BY doc_id""",


    "x_lang_stats" -> """
      SELECT lang, count(*) AS n_docs,
             round(avg(len(string_split_regex(trim(text), '\s+'))), 6) AS avg_tokens,
             round(avg(length(text)), 6) AS avg_chars
      FROM documents GROUP BY lang ORDER BY lang""",


    "x_lang_id" -> """
      WITH d AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id,
          CAST(len(list_filter(toks, t -> list_contains(['der','die','und','das','ist'], t))) AS INTEGER) AS score_de,
          CAST(len(list_filter(toks, t -> list_contains(['the','and','of','to','is'], t))) AS INTEGER) AS score_en,
          CAST(len(list_filter(toks, t -> list_contains(['el','la','de','que','y'], t))) AS INTEGER) AS score_es,
          CAST(len(list_filter(toks, t -> list_contains(['le','la','de','et','les'], t))) AS INTEGER) AS score_fr,
          CAST(len(list_filter(toks, t -> list_contains(['de','le','shi','wo','ni'], t))) AS INTEGER) AS score_zh
        FROM d)
      SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
             CASE
               WHEN score_de >= score_en AND score_de >= score_es
                AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
               WHEN score_en >= score_de AND score_en >= score_es
                AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
               WHEN score_es >= score_de AND score_es >= score_en
                AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
               WHEN score_fr >= score_de AND score_fr >= score_en
                AND score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
               ELSE 'zh' END AS predicted_lang
      FROM s ORDER BY doc_id""",


    "x_fingerprints" -> """
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
      FROM documents ORDER BY doc_id""",


    // PSI over reference-decile bins; DuckDB mirrors the CASE bin counter,
    // window-total proportions, and the (p-q)*ln(p/q) contribution exactly
    // training-set pipeline: label window → split CASE → fold hash →
    // grouped class audit, each stage the verified oracle form chained
    "x_training_set_pipeline" -> s"""
      WITH lab AS (
        SELECT event_id, user_id, ts,
               (min(CASE WHEN event_type = 'purchase' THEN ts END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                <= ts + INTERVAL 24 HOURS) AS label
        FROM events),
      sp AS (
        SELECT *,
               CASE WHEN ts <= TIMESTAMP '2024-01-15 00:00:00' THEN 'train'
                    WHEN ts <= TIMESTAMP '2024-01-16 00:00:00' THEN 'embargo'
                    ELSE 'test' END AS split,
               CAST(least(floor(${uk("user_id", 83)} * 5), 4) AS INT) AS fold
        FROM lab)
      SELECT split, fold, count(*) AS n,
             count(*) FILTER (label) AS n_pos,
             count(DISTINCT user_id) AS n_users
      FROM sp GROUP BY split, fold ORDER BY split, fold""",


    // PII scrub over deterministically injected emails/phones/id runs;
    // DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all
    "x_pii_scrub" -> """
      WITH t AS (
        SELECT doc_id,
               text || ' contact user' || doc_id
                    || '@mail.example.com or +1 (555) 010-' || doc_id
                    || ' ref 123456789' AS x
        FROM documents)
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(x,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+?[0-9][0-9() .-]{6,}[0-9]', '<PHONE>', 'g'),
               '[0-9]{6,}', '<ID>', 'g') AS clean_text,
             CAST(len(regexp_extract_all(x,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
               AS n_emails,
             CAST(len(regexp_extract_all(regexp_replace(x,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+?[0-9][0-9() .-]{6,}[0-9]')) AS INTEGER) AS n_phones
      FROM t ORDER BY doc_id""",


    // shuffled-shard layout: uniform hash shard (u=1.0 edge clamped) +
    // independent-channel rank within the shard, id tiebreak
    "x_corpus_shuffle" -> s"""
      WITH s AS (
        SELECT doc_id,
               least(CAST(floor(${uk("doc_id", 71)} * 8) AS INTEGER), 7)
                 AS shard,
               ${uk("doc_id", 72)} AS u
        FROM documents)
      SELECT doc_id, shard,
             CAST(row_number() OVER (PARTITION BY shard ORDER BY u, doc_id)
               AS BIGINT) AS shard_pos
      FROM s ORDER BY shard, shard_pos""",


    // the LLM pipeline composition: same building blocks as x_repetition
    // (dup-2gram CTE), x_fingerprints (md5 fingerprint), and
    // q_quota_cap_hashed (minstd hash rank), chained
    "x_llm_pipeline" -> s"""
      WITH d0 AS (
        SELECT doc_id, lang, text,
               string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents),
      g2 AS (SELECT doc_id, count(DISTINCT s) AS d2 FROM (
        SELECT doc_id, w[kk] || ' ' || w[kk+1] AS s
        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS kk FROM d0))
        GROUP BY doc_id),
      scored AS (
        SELECT d0.doc_id, lang, text, len(w) AS n_tokens,
               CASE WHEN len(w) - 1 > 0 THEN round(1.0 -
                 coalesce(g2.d2, 0) / (CAST(len(w) AS DOUBLE) - 1), 6)
                 ELSE 0.0 END AS dup2
        FROM d0 LEFT JOIN g2 ON d0.doc_id = g2.doc_id),
      filtered AS (
        SELECT * FROM scored WHERE n_tokens >= 20 AND dup2 <= 0.2),
      fp AS (
        SELECT *, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
          AS fp FROM filtered),
      dedup AS (
        SELECT doc_id, lang, n_tokens FROM (
          SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
            AS rn FROM fp) WHERE rn = 1),
      capped AS (
        SELECT lang, n_tokens FROM (
          SELECT lang, n_tokens, row_number() OVER (PARTITION BY lang
            ORDER BY ${uk("doc_id", 41)}, doc_id) AS rn2 FROM dedup)
        WHERE rn2 <= 150)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM capped GROUP BY lang ORDER BY lang""",


    // duplicate n-gram ratios; distinct n-grams via the same unnest
    // construction as the jaccard/contamination oracles
    // the C4/Gopher rule battery: token/word-length/stopword signals from
    // the split-token list, dup-2-gram via the distinct-shingle count,
    // entropy via the codepoint histogram — all rounded before their
    // threshold compares, exactly as the Spark projection does
    "x_quality_filter" -> qualityFilterSql,


    // stage-level rollup of the same chain: prefix-AND counts, one fold
    "x_curation_funnel" -> {
      val pf = Seq("r_len", "r_word_len", "r_stopwords", "r_repetition",
        "r_entropy")
      val cs = pf.indices.map(i =>
        s"CAST(sum(CASE WHEN ${pf.take(i + 1).mkString(" AND ")}"
          + s" THEN 1 ELSE 0 END) AS BIGINT) AS c$i").mkString(",\n        ")
      val stageRows = pf.zipWithIndex.map { case (r, i) =>
        val nIn = if (i == 0) "n" else s"c${i - 1}"
        if (i == 0)
          s"SELECT 1 AS stage, 'r_len' AS rule, n AS n_in, c0 AS n_out, n AS n_total FROM f"
        else s"SELECT ${i + 1}, '$r', $nIn, c$i, n FROM f"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH qf AS ($qualityFilterSql),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n,
        $cs
        FROM qf),
      stages AS ($stageRows)
      SELECT stage, rule, n_in, n_out, n_in - n_out AS n_dropped,
             round(CASE WHEN n_in > 0
               THEN (n_in - n_out) / CAST(n_in AS DOUBLE) END, 6)
               AS drop_share,
             round(n_out / CAST(n_total AS DOUBLE), 6) AS kept_share
      FROM stages ORDER BY stage"""
    },


    "x_repetition" -> """
      WITH d AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents),
      g2 AS (SELECT doc_id, count(DISTINCT s) AS d2 FROM (
        SELECT doc_id, w[kk] || ' ' || w[kk+1] AS s
        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS kk FROM d))
        GROUP BY doc_id),
      g3 AS (SELECT doc_id, count(DISTINCT s) AS d3 FROM (
        SELECT doc_id, w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS kk FROM d))
        GROUP BY doc_id),
      r AS (
        SELECT d.doc_id, CAST(len(w) AS INTEGER) AS n_tokens,
               CASE WHEN len(w) - 1 > 0 THEN round(1.0 -
                 coalesce(g2.d2, 0) / (CAST(len(w) AS DOUBLE) - 1), 6)
                 ELSE 0.0 END AS dup_2gram_ratio,
               CASE WHEN len(w) - 2 > 0 THEN round(1.0 -
                 coalesce(g3.d3, 0) / (CAST(len(w) AS DOUBLE) - 2), 6)
                 ELSE 0.0 END AS dup_3gram_ratio
        FROM d LEFT JOIN g2 ON d.doc_id = g2.doc_id
               LEFT JOIN g3 ON d.doc_id = g3.doc_id)
      SELECT *, dup_2gram_ratio > 0.2 OR dup_3gram_ratio > 0.18
               AS is_repetitive
      FROM r ORDER BY doc_id""",


    // TF-IDF: rank by the ROUNDED score in both engines so the top-k
    // selection can't diverge on sub-round ulps; ties break by term
    "x_tfidf_terms" -> """
      WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM toks WHERE term <> '' GROUP BY doc_id, term),
      dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dft.df_t,
               round(tf.tf * (ln(((SELECT n_docs FROM n) + 1.0)
                 / (dft.df_t + 1.0)) + 1.0), 6) AS tfidf
        FROM tf JOIN dft USING (term)),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, term ASC) AS rn
        FROM scored)
      SELECT doc_id, term, tf, df_t, tfidf FROM ranked WHERE rn <= 3
      ORDER BY doc_id, tfidf DESC, term""",


    // Heaps curve: first-occurrence reduce + two window cumsums over the
    // doc-id order (the Spark side runs the sliced prefix scan; CAST AS
    // BIGINT so DuckDB's HUGEINT window sums hash like Spark longs)
    "x_heaps_law" -> """
      WITH tok AS (SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
            FROM documents),
      tnz AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      per AS (SELECT doc_id, count(*) AS n_tokens FROM tnz GROUP BY 1),
      nw AS (SELECT first_doc AS doc_id, count(*) AS new_words FROM
               (SELECT token, min(doc_id) AS first_doc FROM tnz GROUP BY 1)
             GROUP BY 1),
      b AS (SELECT d.doc_id,
               coalesce(per.n_tokens, 0) AS n_tokens,
               coalesce(nw.new_words, 0) AS new_words
            FROM documents d
            LEFT JOIN per ON d.doc_id = per.doc_id
            LEFT JOIN nw ON d.doc_id = nw.doc_id)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(sum(n_tokens) OVER w AS BIGINT) AS tokens_so_far,
             CAST(new_words AS BIGINT) AS new_words,
             CAST(sum(new_words) OVER w AS BIGINT) AS vocab_size
      FROM b
      WINDOW w AS (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY doc_id""",


    // n-gram novelty: the x_jaccard_pairs shingle construction (3-gram,
    // within-doc DISTINCT) + per-gram first-doc, one gram-keyed join
    "x_ngram_novelty" -> """
      WITH d AS (SELECT doc_id,
               string_split_regex(trim(text), '\s+') AS w FROM documents),
      sh AS (SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, w[kk] || ' ' || w[kk+1] || ' ' || w[kk+2] AS s
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS kk
                FROM d))),
      fo AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1),
      per AS (SELECT sh.doc_id, count(*) AS n_grams,
               sum(CASE WHEN fo.first_doc < sh.doc_id THEN 1 ELSE 0 END)
                 AS dup_grams
              FROM sh JOIN fo ON sh.s = fo.s GROUP BY 1)
      SELECT doc.doc_id,
             CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
             CAST(coalesce(per.dup_grams, 0) AS BIGINT) AS dup_grams,
             round(CASE WHEN per.n_grams > 0
               THEN per.dup_grams / CAST(per.n_grams AS DOUBLE) END, 6)
               AS dup_share
      FROM documents doc LEFT JOIN per ON doc.doc_id = per.doc_id
      ORDER BY doc.doc_id""",


    // Span corruption: the shared minstd u01 hash on the pos-key
    // encoding picks spans; island grouping and ordered string_agg
    // replay the Spark sort-struct reassembly exactly
    "x_span_corruption" -> {
      val u = uk("(doc_id * 1000000 + pos)", 7)
      s"""
      WITH arr AS (SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS w
            FROM documents),
      pos0 AS (SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos,
                 unnest(w) AS tok
               FROM arr),
      tok AS (SELECT doc_id, pos, tok FROM pos0 WHERE tok <> ''),
      masked AS (SELECT doc_id, pos, tok FROM tok WHERE $u < 0.15),
      grp AS (SELECT doc_id, pos, tok,
                pos - row_number() OVER (PARTITION BY doc_id
                  ORDER BY pos) AS g
              FROM masked),
      spans AS (SELECT doc_id, g, CAST(min(pos) AS INTEGER) AS start_pos,
                  CAST(count(*) AS BIGINT) AS span_len,
                  string_agg(tok, ' ' ORDER BY pos) AS span_text
                FROM grp GROUP BY 1, 2)
      SELECT doc_id,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY start_pos) AS BIGINT) AS span_id,
             start_pos, span_len, span_text
      FROM spans ORDER BY doc_id, span_id"""
    },


    // Naive Bayes: lattice log-likelihoods, exact-long document scores,
    // argmax = ORDER BY score DESC, label (the min-struct election)
    "x_naive_bayes" -> (nbBestCte + """
      SELECT id AS doc_id, label, predicted,
             round(CAST(score AS DOUBLE) / 1e9, 6) AS log_score,
             (label = predicted) AS correct
      FROM best WHERE rn = 1 ORDER BY doc_id"""),


    // confusion matrix over the same chain, shares within the true label
    "x_nb_confusion" -> (nbBestCte + """,
      conf AS (SELECT label, predicted, CAST(count(*) AS BIGINT) AS n
               FROM best WHERE rn = 1 GROUP BY 1, 2)
      SELECT label, predicted, n,
             round(n / CAST(sum(n) OVER (PARTITION BY label) AS DOUBLE), 6)
               AS share
      FROM conf ORDER BY label, predicted"""),


    // Zipf fit: ln-terms on integer lattices before the OLS folds, one
    // fixed tree per output column (shares the x_vocabulary CTE shape)
    "x_zipf_law" -> {
      val nD = "CAST(n_terms AS DOUBLE)"
      val sx = "(CAST(sx AS DOUBLE) / 1e9)"
      val sy = "(CAST(sy AS DOUBLE) / 1e9)"
      val sxy = "(CAST(sxy AS DOUBLE) / 1e12)"
      val sxx = "(CAST(sxx AS DOUBLE) / 1e12)"
      val syy = "(CAST(syy AS DOUBLE) / 1e12)"
      val num = s"($nD * $sxy - $sx * $sy)"
      val denX = s"($nD * $sxx - $sx * $sx)"
      val denY = s"($nD * $syy - $sy * $sy)"
      s"""
      WITH tok AS (SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+'))
                 AS token
            FROM documents),
      dt AS (SELECT doc_id, token, count(*) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
      v AS (SELECT token, CAST(sum(tf) AS BIGINT) AS term_count
            FROM dt GROUP BY token HAVING sum(tf) >= 5),
      r AS (SELECT CAST(row_number() OVER (ORDER BY term_count DESC,
               token) - 1 AS BIGINT) AS idx, term_count
            FROM v),
      top AS (SELECT CAST(idx + 1 AS DOUBLE) AS rk,
                CAST(term_count AS DOUBLE) AS c
              FROM r WHERE idx < 300),
      t AS (SELECT CAST(round(ln(rk) * 1e9, 0) AS BIGINT) AS x,
               CAST(round(ln(c) * 1e9, 0) AS BIGINT) AS y,
               CAST(round(ln(rk) * ln(c) * 1e12, 0) AS BIGINT) AS xy,
               CAST(round(ln(rk) * ln(rk) * 1e12, 0) AS BIGINT) AS xx,
               CAST(round(ln(c) * ln(c) * 1e12, 0) AS BIGINT) AS yy
            FROM top),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(xy) AS BIGINT) AS sxy,
              CAST(sum(xx) AS BIGINT) AS sxx,
              CAST(sum(yy) AS BIGINT) AS syy
            FROM t)
      SELECT n_terms,
             round(CASE WHEN n_terms >= 3 AND $denX > 0
               THEN $num / $denX END, 6) AS slope,
             round(CASE WHEN n_terms >= 3 AND $denX > 0
               THEN ($sy - $num / $denX * $sx) / $nD END, 6) AS intercept,
             round(CASE WHEN n_terms >= 3 AND $denX > 0 AND $denY > 0
               THEN $num * $num / ($denX * $denY) END, 6) AS r2
      FROM f"""
    },


    // interpolated bigram LM (λ=0.5 — exactly complementable in binary):
    // vocab/counts from the English slice, every doc scored; <unk> fold,
    // add-one unigram, first token unigram-only — mirrors
    // TextAnalysis.bigramPerplexity line by line
    "x_lm_perplexity" -> lmSql("""
      SELECT doc_id, n_tokens, n_oov, ce_bits
      FROM perdoc ORDER BY doc_id"""),


    // curriculum staging: perplexity quartiles over the scored corpus →
    // clean→noisy training stages with per-stage token budgets
    "x_curriculum" -> lmSql("""
      , cuts AS (SELECT
          round(quantile_cont(ce_bits, 0.25), 6) AS q1,
          round(quantile_cont(ce_bits, 0.5), 6) AS q2,
          round(quantile_cont(ce_bits, 0.75), 6) AS q3 FROM perdoc)
      SELECT CASE WHEN ce_bits <= (SELECT q1 FROM cuts) THEN 0
                  WHEN ce_bits <= (SELECT q2 FROM cuts) THEN 1
                  WHEN ce_bits <= (SELECT q3 FROM cuts) THEN 2
                  ELSE 3 END AS stage,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             round(avg(ce_bits), 6) AS avg_ce_bits,
             round(min(ce_bits), 6) AS min_ce_bits,
             round(max(ce_bits), 6) AS max_ce_bits
      FROM perdoc GROUP BY 1 ORDER BY stage"""),


    // winnowing (k=32, w=16): per-gram base-257 polynomial hash mod
    // 2^31-1 (list_reduce — the engine computes the same polynomial
    // rolling), min-per-window election with the identical
    // h*10^4 + (9999-pos) arithmetic; rightmost tie wins
    "x_shared_spans" -> spanSql("""
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared,
             min(a.gram) AS sample_gram
      FROM sel a JOIN sel b
        ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2 ORDER BY doc_a, doc_b"""),


    // span-level benchmark contamination: cross-role pairs from the
    // winnow fingerprint table, folded per training doc
    "x_contamination_spans" -> spanSql("""
      , pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS n_shared
               FROM sel a JOIN sel b
                 ON a.gram = b.gram AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      hits AS (SELECT CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END
                 AS train_doc,
               CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END
                 AS bench_doc,
               n_shared
               FROM pr WHERE (doc_a % 10 = 0) <> (doc_b % 10 = 0))
      SELECT train_doc, CAST(count(*) AS BIGINT) AS n_bench_docs,
             CAST(sum(n_shared) AS BIGINT) AS n_shared_grams,
             min(bench_doc) AS first_bench_doc
      FROM hits GROUP BY train_doc ORDER BY train_doc"""),


    // Fleiss kappa over the 5-rater synthetic panel (u01 channels
    // 100+r accurate / 300+r confused, replayed via uk); exact S2 fold
    "x_fleiss_kappa" -> {
      def rater(r: Int) =
        s"""SELECT doc_id,
             CASE WHEN ${uk("doc_id", 100 + r)} < 0.7 THEN lang
               ELSE CASE CAST(ceil(${uk("doc_id", 300 + r)} * 5)
                 AS INT) - 1
                 WHEN 0 THEN 'de' WHEN 1 THEN 'en' WHEN 2 THEN 'es'
                 WHEN 3 THEN 'fr' ELSE 'zh' END
             END AS cat
           FROM docs"""
      val langs = Seq("de", "en", "es", "fr", "zh")
      val totR = "CAST(totr AS DOUBLE)"
      val pBar = s"((CAST(ssq AS DOUBLE) - $totR) / ($totR * 4.0))"
      val pE = s"(${langs.indices.map(i =>
        s"(CAST(t$i AS DOUBLE) / $totR)" +
          s" * (CAST(t$i AS DOUBLE) / $totR)").mkString(" + ")})"
      val ok = s"n_units >= 2 AND $pE < 1.0"
      s"""
      WITH docs AS (SELECT doc_id, lang FROM documents
                    WHERE lang IS NOT NULL),
      ratings AS (${(1 to 5).map(rater).mkString("\n      UNION ALL ")}),
      uc AS (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS n
             FROM ratings GROUP BY 1, 2),
      pu AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS nu,
               CAST(sum(n * n) AS BIGINT) AS sq
             FROM uc GROUP BY 1),
      ct AS (SELECT ${langs.zipWithIndex.map { case (l, i) =>
               s"CAST(sum(CASE WHEN cat = '$l' THEN n ELSE 0 END)" +
                 s" AS BIGINT) AS t$i" }.mkString(", ")}
             FROM uc),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
              CAST(sum(nu) AS BIGINT) AS totr,
              CAST(sum(sq) AS BIGINT) AS ssq FROM pu)
      SELECT n_units, CAST(5 AS INTEGER) AS n_raters,
             round($pBar, 6) AS p_bar,
             round($pE, 6) AS p_e,
             round(CASE WHEN $ok
               THEN ($pBar - $pE) / (1.0 - $pE) END, 6) AS fleiss_kappa
      FROM f, ct"""
    },

    // Krippendorff alpha: same panel + 15% abstention (channel 200+r);
    // per-unit disagreement scaled by lcm(1..7)=420 -> exact long fold
    "x_kripp_alpha" -> {
      def rater(r: Int) =
        s"""SELECT doc_id,
             CASE WHEN ${uk("doc_id", 100 + r)} < 0.7 THEN lang
               ELSE CASE CAST(ceil(${uk("doc_id", 300 + r)} * 5)
                 AS INT) - 1
                 WHEN 0 THEN 'de' WHEN 1 THEN 'en' WHEN 2 THEN 'es'
                 WHEN 3 THEN 'fr' ELSE 'zh' END
             END AS cat
           FROM docs WHERE ${uk("doc_id", 200 + r)} >= 0.15"""
      val langs = Seq("de", "en", "es", "fr", "zh")
      val nT = "CAST(n_ratings AS DOUBLE)"
      val dO = s"(CAST(sw AS DOUBLE) / (420.0 * $nT))"
      val sumT2 = s"(${langs.indices.map(i =>
        s"CAST(t$i AS DOUBLE) * t$i").mkString(" + ")})"
      val dE = s"(($nT * $nT - $sumT2) / ($nT * ($nT - 1.0)))"
      val ok = s"n_units >= 2 AND $dE > 0"
      s"""
      WITH docs AS (SELECT doc_id, lang FROM documents
                    WHERE lang IS NOT NULL),
      ratings AS (${(1 to 5).map(rater).mkString("\n      UNION ALL ")}),
      uc AS (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS n
             FROM ratings GROUP BY 1, 2),
      pu AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS nu,
               CAST(sum(n * n) AS BIGINT) AS sq,
               ${langs.zipWithIndex.map { case (l, i) =>
                 s"CAST(sum(CASE WHEN cat = '$l' THEN n ELSE 0 END)" +
                   s" AS BIGINT) AS c$i" }.mkString(", ")}
             FROM uc GROUP BY 1),
      kept AS (SELECT *,
               (nu * nu - sq) * CAST(420 / (nu - 1) AS BIGINT) AS w
             FROM pu WHERE nu >= 2),
      f AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
              CAST(sum(nu) AS BIGINT) AS n_ratings,
              CAST(sum(w) AS BIGINT) AS sw,
              ${langs.indices.map(i =>
                s"CAST(sum(c$i) AS BIGINT) AS t$i").mkString(", ")}
            FROM kept)
      SELECT n_units, n_ratings,
             round(CASE WHEN $ok THEN $dO END, 6) AS d_observed,
             round(CASE WHEN $ok THEN $dE END, 6) AS d_expected,
             round(CASE WHEN $ok THEN 1.0 - $dO / $dE END, 6)
               AS kripp_alpha
      FROM f"""
    },

    // kappa over the langId-vs-gold joint; po/pe rounded first, kappa
    // chained from the rounded values (q_auc→gini precedent)
    "x_langid_kappa" -> """
      WITH d AS (
        SELECT doc_id, lang,
               string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(toks, t -> list_contains(['der','die','und','das','ist'], t))) AS INTEGER) AS score_de,
          CAST(len(list_filter(toks, t -> list_contains(['the','and','of','to','is'], t))) AS INTEGER) AS score_en,
          CAST(len(list_filter(toks, t -> list_contains(['el','la','de','que','y'], t))) AS INTEGER) AS score_es,
          CAST(len(list_filter(toks, t -> list_contains(['le','la','de','et','les'], t))) AS INTEGER) AS score_fr,
          CAST(len(list_filter(toks, t -> list_contains(['de','le','shi','wo','ni'], t))) AS INTEGER) AS score_zh
        FROM d),
      p AS (
        SELECT lang AS b, CASE
          WHEN score_de >= score_en AND score_de >= score_es
           AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
          WHEN score_en >= score_de AND score_en >= score_es
           AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
          WHEN score_es >= score_de AND score_es >= score_en
           AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
          WHEN score_fr >= score_de AND score_fr >= score_en
           AND score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
          ELSE 'zh' END AS a
        FROM s WHERE lang IS NOT NULL),
      joint AS (SELECT a, b, count(*) AS n FROM p GROUP BY a, b),
      tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t,
                CAST(coalesce(sum(CASE WHEN a = b THEN n END), 0)
                  AS DOUBLE) AS agree FROM joint),
      na AS (SELECT a, sum(n) AS na FROM joint GROUP BY a),
      nb AS (SELECT b, sum(n) AS nb FROM joint GROUP BY b),
      pe AS (SELECT coalesce(sum(CAST(na.na AS DOUBLE) * nb.nb
                / ((SELECT t FROM tot) * (SELECT t FROM tot))), 0.0)
               AS pe
             FROM na JOIN nb ON na.a = nb.b),
      r AS (SELECT CAST(t AS BIGINT) AS n_items,
              round(agree / t, 6) AS po,
              round((SELECT pe FROM pe), 6) AS pe FROM tot)
      SELECT n_items, po, pe,
             CASE WHEN pe < 1.0
               THEN round((po - pe) / (1.0 - pe), 6) END AS kappa
      FROM r""",


    // token-level JS drift: integer-elected top-50 vocab + <other>,
    // add-alpha smoothing, ln-ratio JS in bits
    "x_vocab_drift" -> """
      WITH toks AS (
        SELECT lang AS side,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        FROM documents WHERE lang IN ('en', 'de')),
      counts AS (
        SELECT term,
               CAST(sum(CASE WHEN side = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                 AS cnt_a,
               CAST(sum(CASE WHEN side = 'de' THEN 1 ELSE 0 END) AS BIGINT)
                 AS cnt_b
        FROM toks WHERE term <> '' GROUP BY term),
      top AS (SELECT * FROM counts
              ORDER BY cnt_a + cnt_b DESC, term LIMIT 50),
      rest AS (SELECT '<other>' AS term,
                 CAST(coalesce(sum(cnt_a), 0) AS BIGINT) AS cnt_a,
                 CAST(coalesce(sum(cnt_b), 0) AS BIGINT) AS cnt_b
               FROM counts WHERE term NOT IN (SELECT term FROM top)),
      vocab AS (SELECT * FROM top UNION ALL SELECT * FROM rest),
      sized AS (SELECT *, sum(cnt_a) OVER () AS na,
                  sum(cnt_b) OVER () AS nb, count(*) OVER () AS v
                FROM vocab),
      f AS (SELECT *, (cnt_a + 0.5) / (na + 0.5 * v) AS p,
              (cnt_b + 0.5) / (nb + 0.5 * v) AS q
            FROM sized),
      g AS (SELECT *,
              (0.5 * p * ln(p / ((p + q) / 2.0))
                + 0.5 * q * ln(q / ((p + q) / 2.0))) / ln(2.0) AS contrib
            FROM f)
      SELECT term, cnt_a, cnt_b, round(p, 6) AS p_a, round(q, 6) AS p_b,
             round(contrib, 6) AS js_contrib,
             round(sum(contrib) OVER (), 6) AS js_total
      FROM g ORDER BY cnt_a + cnt_b DESC, term""",


    // per-language P/R/F1 over the same langid joint; gold roster via
    // left joins (never-predicted class: precision NULL, recall 0)
    "x_langid_prf" -> """
      WITH d AS (
        SELECT doc_id, lang,
               string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents),
      s AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(toks, t -> list_contains(['der','die','und','das','ist'], t))) AS INTEGER) AS score_de,
          CAST(len(list_filter(toks, t -> list_contains(['the','and','of','to','is'], t))) AS INTEGER) AS score_en,
          CAST(len(list_filter(toks, t -> list_contains(['el','la','de','que','y'], t))) AS INTEGER) AS score_es,
          CAST(len(list_filter(toks, t -> list_contains(['le','la','de','et','les'], t))) AS INTEGER) AS score_fr,
          CAST(len(list_filter(toks, t -> list_contains(['de','le','shi','wo','ni'], t))) AS INTEGER) AS score_zh
        FROM d),
      p AS (
        SELECT lang AS g, CASE
          WHEN score_de >= score_en AND score_de >= score_es
           AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
          WHEN score_en >= score_de AND score_en >= score_es
           AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
          WHEN score_es >= score_de AND score_es >= score_en
           AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
          WHEN score_fr >= score_de AND score_fr >= score_en
           AND score_fr >= score_es AND score_fr >= score_zh THEN 'fr'
          ELSE 'zh' END AS pr
        FROM s WHERE lang IS NOT NULL),
      joint AS (SELECT g, pr, count(*) AS n FROM p GROUP BY g, pr),
      goldn AS (SELECT g AS clazz, CAST(sum(n) AS BIGINT) AS support
                FROM joint GROUP BY g),
      predn AS (SELECT pr AS clazz, CAST(sum(n) AS BIGINT) AS pred_n
                FROM joint GROUP BY pr),
      tp AS (SELECT g AS clazz, CAST(n AS BIGINT) AS tp FROM joint
             WHERE g = pr)
      SELECT gn.clazz, gn.support, coalesce(tp.tp, 0) AS tp,
             coalesce(pn.pred_n, 0) AS pred_n,
             round(CASE WHEN pn.pred_n > 0
               THEN CAST(coalesce(tp.tp, 0) AS DOUBLE) / pn.pred_n END, 6)
               AS precision,
             round(CAST(coalesce(tp.tp, 0) AS DOUBLE) / gn.support, 6)
               AS recall,
             round(CASE WHEN pn.pred_n > 0 AND
                 CAST(coalesce(tp.tp, 0) AS DOUBLE) / pn.pred_n
                 + CAST(coalesce(tp.tp, 0) AS DOUBLE) / gn.support > 0
               THEN 2.0 * (CAST(coalesce(tp.tp, 0) AS DOUBLE) / pn.pred_n)
                 * (CAST(coalesce(tp.tp, 0) AS DOUBLE) / gn.support)
                 / (CAST(coalesce(tp.tp, 0) AS DOUBLE) / pn.pred_n
                    + CAST(coalesce(tp.tp, 0) AS DOUBLE) / gn.support)
               END, 6) AS f1
      FROM goldn gn
      LEFT JOIN tp ON gn.clazz = tp.clazz
      LEFT JOIN predn pn ON gn.clazz = pn.clazz
      ORDER BY gn.clazz""",


    // unigram degenerate anchor: single-char pieces => token count =
    // non-whitespace character count (ASCII corpus: chars = code points)
    // WordPiece vocabulary: top-64 per form + forced single chars —
    // trainer replayed verbatim (substr explode on the distinct-word
    // grain, freq DESC / piece ASC ranks)
    "x_wordpiece_vocab" -> wordPieceSql("""
      SELECT piece, is_continuation, freq FROM wpv
      ORDER BY is_continuation, piece"""),

    // per-doc greedy-maxmatch token stats: the unrolled 12-step replay
    // produces per-word token counts; docs re-explode to word
    // occurrences and fold
    "x_wordpiece_tokens" -> wordPieceSql(s"""
      SELECT doc_id, n_words, n_tokens,
             round(CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
               AS fertility
      FROM (SELECT d.doc_id, CAST(count(*) AS INTEGER) AS n_words,
              CAST(sum(t.ntok) AS INTEGER) AS n_tokens
            FROM (SELECT doc_id, unnest(list_filter(string_split_regex(
                    trim(lower(text)), '\\s+'), x -> x <> '')) AS w
                  FROM documents) d
            JOIN wps12 t ON d.w = t.w
            GROUP BY 1)
      ORDER BY doc_id"""),

    // unigram trainer + Viterbi replayed verbatim (seed prune, two
    // hard-EM rounds, final segmentation) — all-integer 1e-9-lattice
    // scores; per-doc stats fold the per-word token counts
    "x_unigram_tokens" -> unigramSql("""
      SELECT doc_id, n_words, n_tokens,
             round(CAST(n_tokens AS DOUBLE) / n_words, 6) AS fertility
      FROM uperdoc ORDER BY doc_id"""),

    // all three tokenizer trainers replayed in ONE statement (their CTE
    // namespaces are disjoint by construction); totals re-explode word
    // occurrences against each family's per-word token counts
    "x_tokenizer_shootout" -> s"""
      WITH $bpeCtes,
      $wordPieceCtes,
      $unigramCtes,
      tb AS (SELECT CAST(sum(n_words) AS BIGINT) AS w,
              CAST(sum(len(string_split(trim(s), ' ')) - (n_words - 1))
                AS BIGINT) AS t
            FROM d${graft.ops.Bpe.OracleK}),
      wocc AS (SELECT unnest(list_filter(string_split_regex(
              trim(lower(text)), '\\s+'), x -> x <> '')) AS w
            FROM documents),
      wpt AS (SELECT CAST(count(*) AS BIGINT) AS w,
              CAST(sum(t.ntok) AS BIGINT) AS t
            FROM wocc JOIN wps12 t ON wocc.w = t.w),
      unt AS (SELECT CAST(sum(n_words) AS BIGINT) AS w,
              CAST(sum(n_tokens) AS BIGINT) AS t FROM uperdoc)
      SELECT 'bpe' AS tokenizer,
             CAST(${graft.ops.Bpe.OracleK} AS BIGINT) AS vocab_entries,
             w AS total_words, t AS total_tokens,
             round(CAST(t AS DOUBLE) / w, 6) AS fertility FROM tb
      UNION ALL
      SELECT 'unigram', (SELECT CAST(count(*) AS BIGINT) FROM ut3),
             w, t, round(CAST(t AS DOUBLE) / w, 6) FROM unt
      UNION ALL
      SELECT 'wordpiece', (SELECT CAST(count(*) AS BIGINT) FROM wpv),
             w, t, round(CAST(t AS DOUBLE) / w, 6) FROM wpt
      ORDER BY tokenizer""",

    // skip-gram pairs: windowed positives via the (doc, pos+off)
    // equi-join; negatives replay the minstd draw per (doc, pos, off, j)
    // against the unigram^0.75 prefix-sum CDF on the 1e-6 lattice
    "x_skipgram_pairs" -> s"""
      WITH d AS (SELECT doc_id, list_filter(string_split_regex(
              trim(lower(text)), '\\s+'), x -> x <> '') AS w
            FROM documents),
      tk AS (SELECT doc_id, pos, w[pos + 1] AS tok
            FROM (SELECT doc_id, unnest(range(len(w))) AS pos, w FROM d)),
      offs AS (SELECT unnest([-2, -1, 1, 2]) AS off),
      p AS (SELECT a.doc_id, a.pos, o.off, a.tok AS center, b.tok AS ctx
            FROM tk a CROSS JOIN offs o
            JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + o.off),
      positives AS (SELECT center, ctx AS context, 1 AS label,
              CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY 1, 2),
      vw AS (SELECT tok, CAST(round(power(CAST(count(*) AS DOUBLE), 0.75)
                * 1000000.0, 0) AS BIGINT) AS wl
            FROM tk GROUP BY tok),
      cum AS (SELECT tok AS neg,
              coalesce(sum(wl) OVER (ORDER BY tok
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS lo,
              coalesce(sum(wl) OVER (ORDER BY tok
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + wl AS hi
            FROM vw),
      tot AS (SELECT CAST(sum(wl) AS BIGINT) AS tot FROM vw),
      nf AS (SELECT center,
              CAST(floor(${uk(
                "(doc_id * 131072 + pos * 64 + (off + 2) * 8 + j)", 401)}
                * CAST(tot.tot AS DOUBLE)) AS BIGINT) AS t
            FROM p CROSS JOIN (SELECT unnest([1, 2]) AS j) jj, tot),
      negs AS (SELECT nf.center, c.neg AS context, 0 AS label,
              CAST(count(*) AS BIGINT) AS n
            FROM nf JOIN cum c ON nf.t >= c.lo AND nf.t < c.hi
            GROUP BY 1, 2)
      SELECT center, context, label, n FROM positives
      UNION ALL
      SELECT center, context, label, n FROM negs
      ORDER BY center, context, label""",

    // lexical diversity: exact (doc, term) counts; TTR / hapax share /
    // Simpson's D as fixed double trees; single-token docs NULL Simpson
    "x_lexical_diversity" -> """
      WITH t AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT doc_id, unnest(string_split_regex(
                    trim(lower(text)), '\s+')) AS term FROM documents)
            WHERE term <> '' GROUP BY 1, 2),
      p AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS n_types,
              CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_hapax,
              CAST(sum(c * (c - 1)) AS BIGINT) AS rep2
            FROM t GROUP BY 1)
      SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
             coalesce(p.n_types, 0) AS n_types,
             coalesce(p.n_hapax, 0) AS n_hapax,
             round(CASE WHEN p.n_tokens > 0
               THEN CAST(p.n_types AS DOUBLE) / p.n_tokens END, 6) AS ttr,
             round(CASE WHEN p.n_types > 0
               THEN CAST(p.n_hapax AS DOUBLE) / p.n_types END, 6)
               AS hapax_share,
             round(CASE WHEN p.n_tokens > 1
               THEN 1.0 - CAST(p.rep2 AS DOUBLE)
                 / CAST(p.n_tokens * (p.n_tokens - 1) AS DOUBLE) END, 6)
               AS simpson_d
      FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
      ORDER BY d.doc_id""",

    // the trained piece table verbatim (two EM rounds deep)
    "x_unigram_vocab" -> unigramSql("""
      SELECT piece, llp FROM ut3 ORDER BY piece"""),

    // per-language fertility under the same replayed table
    "x_unigram_fertility" -> unigramSql("""
      SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(p.n_words) AS BIGINT) AS total_words,
             CAST(sum(p.n_tokens) AS BIGINT) AS total_tokens,
             round(CAST(sum(p.n_tokens) AS DOUBLE) / sum(p.n_words), 6)
               AS fertility
      FROM uperdoc p JOIN documents d ON p.doc_id = d.doc_id
      GROUP BY d.lang ORDER BY d.lang"""),

    "x_unigram_chars" -> """
      WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 t -> t <> '') AS words
        FROM documents)
      SELECT doc_id,
             CAST(len(words) AS INTEGER) AS n_words,
             CAST(length(array_to_string(words, '')) AS INTEGER)
               AS n_tokens,
             round(CASE WHEN len(words) > 0
               THEN CAST(length(array_to_string(words, '')) AS DOUBLE)
                 / len(words) END, 6) AS fertility
      FROM w ORDER BY doc_id""",


    "x_bpe_fertility" -> bpeSql(s"""
      SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(t.n_words) AS BIGINT) AS total_words,
             CAST(sum(t.n_tokens) AS BIGINT) AS total_tokens,
             round(sum(t.n_tokens) / CAST(sum(t.n_words) AS DOUBLE), 6)
               AS fertility
      FROM (SELECT doc_id, n_words,
              len(string_split(trim(s), ' ')) - (n_words - 1) AS n_tokens
            FROM d${graft.ops.Bpe.OracleK}) t
      JOIN documents d ON t.doc_id = d.doc_id
      GROUP BY d.lang ORDER BY d.lang"""),


    // packing by REAL tokenizer cost: q_pack_sequences' prefix-sum rule
    // with the BPE token counts from the unrolled-superstep replay
    "x_pack_bpe" -> bpeSql(s"""
      SELECT d.lang, t.doc_id, CAST(t.n_tokens AS INTEGER) AS n_tokens,
             CAST(sum(t.n_tokens) OVER (PARTITION BY d.lang ORDER BY t.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens,
             CAST(floor((sum(t.n_tokens) OVER (PARTITION BY d.lang
               ORDER BY t.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - t.n_tokens) / 4096) AS INTEGER) AS pack_id
      FROM (SELECT doc_id,
              len(string_split(trim(s), ' ')) - (n_words - 1) AS n_tokens
            FROM d${graft.ops.Bpe.OracleK}) t
      JOIN documents d ON t.doc_id = d.doc_id
      ORDER BY d.lang, t.doc_id"""),


    // the round-7 curation capstone, every stage individually
    // oracle-verified then chained: perplexity filter (≤ p75) → winnow
    // span dedup (keep first occurrence) → BPE-cost packing → manifest
    "x_llm_pipeline_v3" -> s"""
      WITH $lmCtes,
      $spanCtes,
      $bpeCtes,
      q3 AS (SELECT round(quantile_cont(ce_bits, 0.75), 6) AS v
             FROM perdoc),
      kept AS (SELECT doc_id FROM perdoc
               WHERE ce_bits <= (SELECT v FROM q3)),
      drops AS (SELECT DISTINCT b.doc_id FROM sel a JOIN sel b
                ON a.gram = b.gram AND a.doc_id < b.doc_id),
      surv AS (SELECT doc_id FROM kept
               WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
      counts AS (SELECT d.lang, t.doc_id,
                   len(string_split(trim(t.s), ' ')) - (t.n_words - 1)
                     AS n_tokens
                 FROM d${graft.ops.Bpe.OracleK} t
                 JOIN documents d ON t.doc_id = d.doc_id
                 WHERE t.doc_id IN (SELECT doc_id FROM surv)),
      packed AS (SELECT lang, doc_id, n_tokens,
                   CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / 4096) AS INTEGER) AS pack_id
                 FROM counts)
      SELECT lang, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      FROM packed GROUP BY 1, 2 ORDER BY lang, pack_id""",


    // vocabulary utilization over the replayed encoding: usage counts,
    // shares, cumulative coverage in (cnt desc, token) order
    "x_bpe_vocab_usage" -> bpeSql(s"""
      , tok AS (SELECT unnest(string_split(trim(s), ' ')) AS token
                FROM d${graft.ops.Bpe.OracleK}),
      t2 AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok
             WHERE token <> chr(1) AND token <> '' GROUP BY token),
      tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM t2),
      rk AS (SELECT token, cnt,
               row_number() OVER (ORDER BY cnt DESC, token) AS rank,
               sum(cnt) OVER (ORDER BY cnt DESC, token
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM t2)
      SELECT CAST(rank AS BIGINT) AS rank, token, cnt,
             round(cnt / (SELECT t FROM tot), 6) AS share,
             round(cum / (SELECT t FROM tot), 6) AS cum_share
      FROM rk ORDER BY rank"""))
}
