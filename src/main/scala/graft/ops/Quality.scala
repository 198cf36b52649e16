package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (SURVEY.md §2.6, Q1–Q5) — the
  * Great-Expectations surface of `scripts/data_quality_checks.py:18-147`
  * re-expressed as predicate-aggregates.
  *
  * Each expectation compiles to one `count_if(violation)` column; the whole
  * suite evaluates in a SINGLE aggregation pass over the table (one scan, one
  * partial+final agg, no shuffle of raw rows) and is then unpivoted to the
  * reference's one-row-per-expectation report shape
  * (`data_quality_checks.py:91-134`). Uniqueness is the one rule that needs
  * its own keyed aggregate (`count(*) vs count(distinct)`), still a single
  * shuffle on the checked column.
  *
  * 100 TB posture: suites of N rules cost one scan regardless of N; the
  * unpivot is a constant-size projection of the single aggregate row.
  */
object Quality {

  sealed trait Expectation { def name: String; def violation: Column }

  /** Q1: ExpectColumnValuesToNotBeNull (`data_quality_checks.py:52,64,70`). */
  final case class NotNull(column: String) extends Expectation {
    val name = s"not_null_$column"
    val violation: Column = col(column).isNull
  }

  /** Q2: ExpectColumnValuesToBeBetween (`data_quality_checks.py:55,73-75`).
    * Bounds inclusive; NULLs are not counted as range violations (they are
    * NotNull's job) — matches GE's `mostly`-free semantics.
    */
  final case class Between(column: String, lo: Double, hi: Double)
      extends Expectation {
    val name = s"between_$column"
    val violation: Column =
      col(column).isNotNull && !(col(column) >= lo && col(column) <= hi)
  }

  /** Q3: ExpectColumnValuesToBeInSet (`data_quality_checks.py:58-61`). */
  final case class InSet(column: String, values: Seq[String])
      extends Expectation {
    val name = s"in_set_$column"
    val violation: Column =
      col(column).isNotNull && !col(column).isin(values: _*)
  }

  /** Q5: the aggregated report — one row per expectation:
    * (rule, total, unexpected_count, unexpected_pct, passed).
    */
  def report(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    val aggCols = count(lit(1)).as("__total") +:
      expectations.map(e =>
        sum(when(e.violation, 1L).otherwise(0L)).as(s"__u_${e.name}"))
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val rows = expectations.map { e =>
      struct(
        lit(e.name).as("rule"),
        col("__total").as("total"),
        col(s"__u_${e.name}").as("unexpected_count")
      )
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(
        col("r.rule").as("rule"),
        col("r.total").as("total"),
        col("r.unexpected_count").as("unexpected_count"),
        round(when(col("r.total") === 0, 0.0)
          .otherwise(col("r.unexpected_count").cast("double") / col("r.total") * 100.0), 6)
          .as("unexpected_pct"),
        (col("r.unexpected_count") === 0).as("passed")
      )
      .orderBy("rule")
  }

  /** Q4: ExpectColumnValuesToBeUnique (`data_quality_checks.py:67`) — keyed
    * aggregate; returns (total, non_null, distinct_values, duplicate_keys,
    * passed). GE's uniqueness ignores NULLs, so `passed` compares the
    * NON-NULL count to the distinct count (a nullable-but-unique column
    * passes); NotNull is a separate rule.
    */
  def uniqueReport(df: DataFrame, column: String): DataFrame = {
    val dups = df.filter(col(column).isNotNull)
      .groupBy(col(column)).count().filter(col("count") > 1)
    df.agg(
      count(lit(1)).as("total"),
      count(col(column)).as("non_null"),
      countDistinct(col(column)).as("distinct_values")
    ).crossJoin(
      dups.agg(count(lit(1)).as("duplicate_keys"))
    ).withColumn("passed", col("non_null") === col("distinct_values"))
  }

  /** Sample offenders for a rule (`data_quality_checks.py:94-134`), bounded
    * and deterministically ordered.
    */
  def offenders(df: DataFrame, e: Expectation, orderCol: String,
                n: Int): DataFrame =
    df.filter(e.violation).orderBy(col(orderCol)).limit(n)

  /** The per-window aggregate list shared by the batch report below and
    * `streaming.Pipeline.streamingQualityMonitor` — ONE definition, so
    * batch backfill and the live stream cannot desynchronize.
    */
  def windowedAggs(expectations: Seq[Expectation]): Seq[Column] =
    count(lit(1)).as("total") +:
      expectations.map(e => sum(when(e.violation, 1L).otherwise(0L))
        .as(s"unexpected_${e.name}"))

  /** Output projection paired with [[windowedAggs]]. */
  def windowedSelect(expectations: Seq[Expectation]): Seq[Column] =
    col("window.start").as("window_start") +: col("total") +:
      expectations.map(e => col(s"unexpected_${e.name}"))

  /** Column profile — the data-catalog summary a feature registry shows
    * per table: for every requested column, row/null counts, null ratio,
    * distinct count, and min/max (stringified so one report row shape
    * covers every type). ONE aggregation pass for the whole profile
    * (per-column aggregates side by side in a single agg, melted from the
    * 1-row result by a constant-size `stack`), exactly like [[report]].
    *
    * `exactDistinct = true` uses `count(DISTINCT col)` per column — Spark
    * plans multi-distinct via expand (cost × #columns) — which keeps the
    * profile oracle-checkable. At 100 TB pass `false`: every distinct
    * becomes a mergeable HLL sketch (`approx_count_distinct`), single
    * pass, bounded memory, same report shape.
    */
  def profile(df: DataFrame, columns: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    val aggs = count(lit(1)).as("__rows") +: columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = columns.map(c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`").mkString(", ")
    one.select(col("__rows"), expr(
        s"stack(${columns.size}, $stackArgs) " +
          "AS (col_name, __nn, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("__rows").as("n_rows"),
        (col("__rows") - col("__nn")).as("n_nulls"),
        round((col("__rows") - col("__nn")) /
          col("__rows").cast("double"), 6).as("null_ratio"),
        col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy("col_name")
  }

  /** Shannon-entropy column profile: for each declared column, the
    * null count, distinct count, entropy in bits, entropy normalized
    * by log₂(distinct) (1 = uniform, →0 = one dominant value), and the
    * modal value's share — the information-content companion to
    * [[profile]]'s min/max/null report. Low normalized entropy on a
    * supposedly-informative column flags a broken upstream join or a
    * default-value flood before any model sees it.
    *
    * Determinism: value counts are exact longs; each value's p·ln p
    * term commits to the 1e-12 lattice before the per-column fold, and
    * the ln 2 / natural-log conversions are fixed double trees with the
    * literal injected verbatim into both engines. All-null columns
    * keep their row with NULL entropy columns.
    *
    * Plan: one stack projection (no shuffle), one (column, value)-grain
    * aggregation — bounded by the columns' combined distinct counts —
    * plus a ≤32-row broadcast join. Never a window over raw rows.
    */
  def entropyProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty && columns.size <= 32 &&
      columns.distinct == columns,
      s"entropyProfile: 1..32 distinct columns (got $columns)")
    val ln2 = 0.6931471805599453
    val melted = df.select(expr(
      columns.map(c => s"'$c', CAST(`$c` AS STRING)")
        .mkString(s"stack(${columns.size}, ", ", ", ")") +
        " AS (col_name, value)"))
    val nulls = melted.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"), count(col("value")).as("__n"))
    val counts = melted.filter(col("value").isNotNull)
      .groupBy(col("col_name"), col("value")).agg(count(lit(1)).as("__c"))
    val terms = counts.join(broadcast(nulls), Seq("col_name"))
      .withColumn("__p",
        col("__c").cast("double") / col("__n").cast("double"))
      .withColumn("__t",
        round(col("__p") * log(col("__p")) * 1e12, 0).cast("long"))
    val perCol = terms.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("__t")).as("__st"),
        max(col("__c")).as("__top"))
    val hNat = lit(0.0) - col("__st").cast("double") / 1e12
    nulls.join(perCol, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("__n")).as("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        round(hNat / ln2, 6).as("entropy_bits"),
        round(when(col("n_distinct") > 1,
          hNat / log(col("n_distinct").cast("double"))), 6)
          .as("norm_entropy"),
        round(col("__top").cast("double") / col("__n").cast("double"), 6)
          .as("top_share"))
      .orderBy("col_name")
  }

  /** Quality as a time series: per event-time window, total rows and the
    * violation count of every expectation — the batch twin of
    * `streaming.Pipeline.streamingQualityMonitor` (identical compiled
    * aggregates via [[windowedAggs]]). One windowed aggregation, state one
    * row per window.
    */
  def windowedReport(df: DataFrame, tsCol: String,
                     expectations: Seq[Expectation],
                     windowLen: String = "1 hour"): DataFrame = {
    val aggs = windowedAggs(expectations)
    df.groupBy(window(col(tsCol), windowLen))
      .agg(aggs.head, aggs.tail: _*)
      .select(windowedSelect(expectations): _*)
      .orderBy("window_start")
  }

  /** Order-invariant dataset fingerprint — one 64-bit content hash for a
    * table version: `bit_xor` of a per-row md5-prefix hash over the
    * declared columns (field boundaries fenced by a \\u0001 separator,
    * NULLs by a \\u0002 sentinel), plus the row count. The
    * reproducibility primitive behind "is this the EXACT dataset the
    * model trained on?" — cheap enough to stamp into the registry on
    * every materialization and compare across clusters/engines (the
    * DuckDB oracle computes the identical value).
    *
    * XOR is commutative/associative → partition-order- and
    * partitioning-invariant, mergeable (partial agg), constant memory,
    * and overflow-free — the properties a 100 TB checksum needs. Caveat
    * (documented, not hidden): XOR cancels duplicate row PAIRS; the row
    * count catches cardinality drift, and exact-dup auditing is
    * [[graft.ops.Dedup]]'s job, not the checksum's.
    */
  def datasetFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "datasetFingerprint: at least one column")
    val repr = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    // 15 hex chars = 60 bits: always positive, identical in DuckDB's
    // signed BIGINT parse (16 chars could overflow the signed cast)
    val h = conv(substring(md5(repr), 1, 15), 16, 10).cast("long")
    df.select(h.as("__h"))
      .agg(expr("bit_xor(__h)").as("fingerprint"),
        count(lit(1)).as("n_rows"))
  }

  /** Per-PARTITION [[datasetFingerprint]]: one (n_rows, fingerprint) row
    * per group — the export MANIFEST a data handoff ships next to the
    * files, so the consumer can verify each partition it ingests without
    * re-reading any other (and the producer can diff manifests across
    * re-exports to find exactly which partitions changed). Same
    * order-invariant XOR-of-row-hashes as the dataset form; ONE shuffled
    * aggregation on the partition key.
    */
  def groupFingerprints(df: DataFrame, groupCol: String,
                        cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "groupFingerprints: at least one column")
    val repr = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    val h = conv(substring(md5(repr), 1, 15), 16, 10).cast("long")
    df.select(col(groupCol), h.as("__h"))
      .groupBy(col(groupCol))
      .agg(expr("bit_xor(__h)").as("fingerprint"),
        count(lit(1)).as("n_rows"))
      .orderBy(groupCol)
  }

  /** Diff two export manifests ([[groupFingerprints]] outputs): the
    * partition-level action list — `added` / `removed` / `changed` — a
    * consumer resyncs from, with unchanged partitions excluded (they are
    * the whole point of manifests: nothing to re-ship). A full-outer join
    * over two calendar-bounded manifests; at 100 TB this compares KBs,
    * not data.
    */
  def manifestDiff(before: DataFrame, after: DataFrame,
                   groupCol: String): DataFrame = {
    val b = before.select(col(groupCol),
      col("fingerprint").as("fp_before"), col("n_rows").as("rows_before"))
    val a = after.select(col(groupCol),
      col("fingerprint").as("fp_after"), col("n_rows").as("rows_after"))
    b.join(a, Seq(groupCol), "full_outer")
      .withColumn("status",
        when(col("fp_before").isNull, "added")
          .when(col("fp_after").isNull, "removed")
          .when(col("fp_before") =!= col("fp_after"), "changed"))
      .filter(col("status").isNotNull)
      .select(col(groupCol), col("status"), col("rows_before"),
        col("rows_after"))
      .orderBy(groupCol)
  }

  /** Referential-integrity audit across table relationships — the
    * cross-TABLE expectation the single-table suite can't express: for each
    * declared (child, fk) → (parent, pk) edge, one report row with total
    * child rows, NULL foreign keys, orphans (non-NULL fk with no parent),
    * and the match rate over non-NULL keys. The warehouse FK health check
    * a feature platform runs before joining feeds.
    *
    * Per edge: the DISTINCT parent keys (bounded by the parent's key
    * cardinality, not its row count) left-join onto the child with a
    * match marker, then ONE predicate-aggregate — no orphan-row shuffle
    * back to the driver, counts only. Dimension-sized parents broadcast;
    * fact-sized parents fall back to a shuffled join on the key axis,
    * which is the minimum possible work for the question.
    */
  def referentialIntegrity(
      edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    val reports = edges.map { case (name, child, fk, parent, pk) =>
      val parents = parent.select(col(pk).as("__pk")).distinct()
        .withColumn("__hit", lit(1))
      child.select(col(fk).as("__fk"))
        .join(parents, col("__fk") === col("__pk"), "left")
        .agg(
          count(lit(1)).as("total"),
          sum(when(col("__fk").isNull, 1L).otherwise(0L)).as("null_fk"),
          sum(when(col("__fk").isNotNull && col("__hit").isNull, 1L)
            .otherwise(0L)).as("orphans"))
        .select(lit(name).as("relationship"), col("total"), col("null_fk"),
          col("orphans"),
          round((col("total") - col("null_fk") - col("orphans"))
            .cast("double") /
            nullif((col("total") - col("null_fk")).cast("double"), lit(0.0)),
            6).as("match_rate"))
    }
    reports.reduce(_.unionByName(_)).orderBy("relationship")
  }

  /** Benford first-digit audit — the fabricated-data smell test for any
    * naturally-spanning-magnitudes numeric column (amounts, populations,
    * trade sizes): observed leading-digit shares vs the Benford
    * expectation log₁₀(1 + 1/d), with each digit's χ² contribution and
    * the total over OBSERVED digits repeated per row (a corpus spanning
    * magnitudes populates all nine; absent digits contribute no term). Non-positive values are excluded
    * (Benford is defined on magnitudes).
    *
    * Plan: ONE aggregation from the corpus to the 9-digit grain (the
    * leading digit is a narrow codegen'd expression), then every share /
    * expectation / χ² column folds over the ≤9-row frame.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("int")
    val whole = Window.partitionBy()
    df.filter(v > 0.0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("__total", sum(col("n")).over(whole))
      .withColumn("share", round(col("n") / col("__total").cast("double"), 6))
      .withColumn("expected",
        round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)), 6))
      .withColumn("__exp_n",
        col("__total") * (log(lit(1.0) + lit(1.0) / col("digit")) /
          log(lit(10.0))))
      .withColumn("chi2_term", round(
        (col("n") - col("__exp_n")) * (col("n") - col("__exp_n")) /
          col("__exp_n"), 6))
      .withColumn("chi2_total", round(sum(
        (col("n") - col("__exp_n")) * (col("n") - col("__exp_n")) /
          col("__exp_n")).over(whole), 6))
      .select(col("digit"), col("n"), col("share"), col("expected"),
        col("chi2_term"), col("chi2_total"))
      .orderBy("digit")
  }

  /** Piggyback quality counters on ANY query via `Dataset.observe`: row
    * count and per-column null counts accumulate DURING the host query's
    * one pass — the 100 TB answer to "monitor quality without a second
    * scan". The caller runs any action on the returned frame, then reads
    * `observation.get` for the counters (the standard Spark `Observation`
    * contract: metrics are aggregate expressions folded by the executors
    * alongside the real work). Contrast with the Q5 report, which IS the
    * query; this instruments someone else's.
    */
  def withObservedQuality(df: DataFrame, cols: Seq[String],
                          obs: org.apache.spark.sql.Observation)
      : DataFrame = {
    require(cols.nonEmpty, "withObservedQuality: at least one column")
    val metrics = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))
        .as(s"${c}_null_count"))
    df.observe(obs, metrics.head, metrics.tail: _*)
  }

  /** Missingness-pattern profile: group rows by WHICH of the declared
    * columns are null (a '1'/'0' presence mask, leftmost = first column)
    * and count each pattern. Per-column null rates (the Q1 report) can't
    * distinguish "two columns each 10% null, independently" from "the
    * same 10% of rows missing both" — the pattern table can, and that
    * co-missingness structure decides whether imputation is safe or the
    * rows share a broken upstream join.
    *
    * ONE map-side-combined aggregation; output bounded by 2^|cols|
    * patterns (declare a handful of columns, not hundreds — enforced).
    */
  /** Deequ-style constraint SUGGESTION: profile the declared columns in
    * ONE aggregation pass and emit the expectations the data currently
    * satisfies — `not_null` (zero nulls), `unique` (distinct == rows),
    * `between` (numeric observed range), `in_set` (full domain when it is
    * at most `maxDomain` values). The bootstrap step of the quality loop:
    * run on a healthy snapshot, review, register the survivors as Q1–Q5
    * expectations.
    *
    * `enumCandidates` must be CALLER-DECLARED low-cardinality columns:
    * domain collection is a `collect_set` in the aggregation buffer,
    * which on an unbounded-cardinality column is an executor-memory
    * hazard at 100 TB — the declared list plus the `slice` cap bounds it;
    * the in_set row is withheld when the true distinct count exceeds
    * `maxDomain` anyway.
    *
    * Output: one row per (column, constraint) with typed evidence
    * columns (never numbers formatted into strings — engine float
    * formatting differs; the oracle compares typed values).
    */
  def suggestConstraints(df: DataFrame, numericCols: Seq[String],
                         enumCandidates: Seq[String],
                         maxDomain: Int = 20): DataFrame = {
    require(numericCols.nonEmpty || enumCandidates.nonEmpty,
      "suggestConstraints: declare at least one column")
    require(maxDomain >= 2 && maxDomain <= 10000,
      s"suggestConstraints: maxDomain in [2, 10000] (got $maxDomain)")
    val all = (numericCols ++ enumCandidates).distinct
    val aggs = Seq(count(lit(1)).as("__n")) ++
      all.flatMap { c =>
        Seq(count(col(c)).as(s"__nn_$c"),
          count_distinct(col(c)).as(s"__nd_$c"))
      } ++
      numericCols.flatMap { c =>
        Seq(min(col(c).cast("double")).as(s"__lo_$c"),
          max(col(c).cast("double")).as(s"__hi_$c"))
      } ++
      enumCandidates.map { c =>
        array_join(slice(array_sort(collect_set(col(c).cast("string"))),
          1, maxDomain + 1), "|").as(s"__dom_$c")
      }
    val prof = df.agg(aggs.head, aggs.tail: _*)
    def row(c: String, constraint: String, applicable: Column,
            lo: Column, hi: Column, dom: Column) =
      struct(lit(c).as("column"), lit(constraint).as("constraint"),
        applicable.as("applicable"),
        (col("__n") - col(s"__nn_$c")).cast("long").as("n_nulls"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        lo.as("lo"), hi.as("hi"), dom.as("domain"))
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val rows =
      all.map { c =>
        row(c, "not_null", col(s"__nn_$c") === col("__n"),
          nullD, nullD, nullS)
      } ++
      all.map { c =>
        row(c, "unique",
          col(s"__nd_$c") === col("__n") && col(s"__nn_$c") === col("__n"),
          nullD, nullD, nullS)
      } ++
      numericCols.map { c =>
        row(c, "between", lit(true),
          round(col(s"__lo_$c"), 6), round(col(s"__hi_$c"), 6), nullS)
      } ++
      enumCandidates.map { c =>
        row(c, "in_set",
          col(s"__nd_$c") <= maxDomain && col(s"__nd_$c") > 1,
          nullD, nullD, col(s"__dom_$c"))
      }
    prof.select(explode(array(rows: _*)).as("r"))
      .filter(col("r.applicable"))
      .select(col("r.column").as("column"),
        col("r.constraint").as("constraint"),
        col("r.n_nulls").as("n_nulls"),
        col("r.n_distinct").as("n_distinct"),
        col("r.lo").as("lo"), col("r.hi").as("hi"),
        col("r.domain").as("domain"))
      .orderBy("column", "constraint")
  }

  def nullPatterns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 16,
      s"nullPatterns: 1..16 columns (got ${cols.size})")
    val mask = concat(cols.map(c =>
      when(col(c).isNull, "0").otherwise("1")): _*)
    val whole = Window.partitionBy()
    df.groupBy(mask.as("pattern"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("share",
        round(col("n_rows") / sum(col("n_rows")).over(whole), 6))
      .orderBy(col("n_rows").desc, col("pattern"))
  }

  /** Approximate functional-dependency audit over DECLARED column pairs:
    * for each candidate `determinant → dependent`, the g3 error — the
    * minimum fraction of rows to delete before the FD holds exactly,
    * i.e. Σ_keys (rows(key) − maxcount(key, value)) / rows. `holds`
    * flags the exact dependencies; a small positive g3 is the "FD with
    * dirty exceptions" signal that drives constraint suggestion and
    * schema-inference tooling (Huhtala et al. 1999, TANE's g3 measure).
    * NULL determinants are excluded (they determine nothing); NULL
    * dependents count as a regular value (two NULLs agree).
    *
    * Plan per pair: one (det, value)-grain keyed count, one det-grain
    * fold, one 1-row total — all map-side-combined equi-aggregations;
    * the declared pair list is bounded so the union of 1-row results is
    * constant-sized. No row-pair joins anywhere (the naive "violating
    * pair" formulation is quadratic per key; the per-key max-count form
    * is linear and gives the identical g3).
    */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty && pairs.size <= 64,
      s"fdAudit: 1..64 declared pairs (got ${pairs.size})")
    val outs = pairs.map { case (a, b) =>
      val per = df.filter(col(a).isNotNull)
        .select(col(a).as("__d"), col(b).as("__v"))
        .groupBy("__d", "__v").agg(count(lit(1)).as("__c"))
        .groupBy("__d").agg(sum(col("__c")).as("__n"),
          max(col("__c")).as("__m"))
      per.agg(coalesce(sum(col("__n")), lit(0L)).cast("long").as("n_rows"),
          count(lit(1)).cast("long").as("n_keys"),
          coalesce(sum(col("__n")) - sum(col("__m")), lit(0L)).cast("long")
            .as("violations"))
        .select(lit(a).as("determinant"), lit(b).as("dependent"),
          col("n_rows"), col("n_keys"), col("violations"),
          when(col("n_rows") > 0,
            round(col("violations") / col("n_rows").cast("double"), 6))
            .as("error_g3"),
          (col("violations") === 0L).as("holds"))
    }
    outs.reduce(_ unionByName _).orderBy("determinant", "dependent")
  }
}
