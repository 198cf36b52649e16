package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and split operators for training-data pipelines
  * (SURVEY.md §7.4 extension set): hash splits, exact stratified sampling,
  * per-group quota caps, target-mixture draws, and sequence packing.
  *
  * All randomness is the shared cross-engine minstd hash ([[Gen.u01]]), so
  * every operator is reproducible run-to-run AND DuckDB-oracle checkable —
  * the property a training pipeline needs for leak-free, re-derivable
  * splits at any scale.
  *
  * Scale posture — NO full-stratum sorts anywhere:
  * - `splitAssign` is a narrow map (no shuffle): each key's split depends
  *   only on its own hash, so assignments are stable when the corpus grows
  *   — new data never reshuffles an existing key across the train/test
  *   boundary;
  * - `stratifiedSample` / `mixtureSample` select the exact quota-smallest
  *   rows per stratum WITHOUT ranking the stratum: a per-(stratum, u-bucket)
  *   histogram finds the single bucket where the quota boundary falls, rows
  *   in lower buckets are accepted outright, and only that one boundary
  *   bucket (≈ n / 2²⁰ rows) is ranked — see [[smallestPerStratum]];
  * - `quotaCap` ranks per group, but the cap `n` bounds useful output;
  *   dominant groups should be pre-trimmed with `smallestPerStratum`-style
  *   selection when the priority order is a hash (see scaladoc);
  * - `uniformSample` is a TakeOrdered — O(n) heap per partition, one
  *   driver merge of 32·n rows, NO global sort and no shuffle;
  * - `packSequences` computes its per-group running sum as a distributed
  *   prefix sum over range-partitioned slices — no single task ever sorts
  *   a whole group.
  */
object Sampling {

  /** Label every row with a split name from the u01 of its key.
    * `splits` = (name, cumulative upper bound ∈ (0,1]), e.g.
    * `Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0)`.
    */
  def splitAssign(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  channel: Long = 31L): DataFrame = {
    val u = Gen.u01(col(keyCol), channel)
    df.withColumn("split",
      splits.init.foldRight(lit(splits.last._1): Column) {
        case ((name, ub), acc) => when(u <= ub, name).otherwise(acc)
      })
  }

  /** Leakage-free near-dup-aware split: hash the CLUSTER id, not the
    * document id, so every member of a near-dup cluster lands in the SAME
    * split. The plain [[splitAssign]] on document ids leaks: two near-
    * identical documents split across train/test let the model score its
    * own training text — the contamination a held-out set exists to
    * prevent. Components come from the caller's near-dup pair list
    * ([[Dedup.connectedComponents]] — tiny next to the corpus); singletons
    * key on their own id, which IS their cluster id under min-id
    * canonicalization, so clustered and unclustered docs share one
    * unbiased hash stream.
    */
  def clusterAwareSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                        splits: Seq[(String, Double)],
                        channel: Long = 83L): DataFrame = {
    val comp = graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", idCol)
    val lab = docs.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("component",
        coalesce(col("component"), col(idCol)).cast("long"))
    splitAssign(lab, "component", splits, channel)
      .select(col(idCol), col("component"), col("split"))
      .orderBy(idCol)
  }

  /** Purged temporal split (the de Prado time-series protocol): rows at or
    * before `cutoff` train; rows inside the embargo window after it are
    * QUARANTINED rather than tested — features computed over trailing
    * windows (rolling means, EWMA, as-of joins) leak cutoff-adjacent
    * training information into them, so evaluating there inflates every
    * metric; rows after the embargo test. A narrow three-way projection —
    * the label is pure arithmetic on the row's own timestamp, no shuffle.
    */
  def temporalSplit(df: DataFrame, tsCol: String, cutoff: String,
                    embargoDays: Int): DataFrame = {
    require(embargoDays >= 0, s"temporalSplit: embargoDays >= 0")
    val cut = lit(cutoff).cast("timestamp_ntz")
    val embargoEnd = cut + expr(s"INTERVAL $embargoDays DAYS")
    df.withColumn("split",
      when(col(tsCol) <= cut, "train")
        .when(col(tsCol) <= embargoEnd, "embargo")
        .otherwise("test"))
  }

  /** Group-aware k-fold assignment (sklearn `GroupKFold` semantics, hashed):
    * every row of a group lands in the SAME fold — `fold =
    * min(floor(u01(group)·k), k−1)` — so cross-validation never trains on
    * one of a user's events and validates on another (the entity-leakage
    * sibling of [[temporalSplit]]'s time leakage; pair both for panel
    * data). A narrow map, no shuffle: the fold depends only on the group's
    * own hash, so assignments are STABLE under corpus growth — new events
    * from a known user join that user's existing fold, and an incremental
    * re-run never migrates a group across folds (the property
    * shuffle-based `GroupKFold` lacks).
    */
  def groupKFold(df: DataFrame, groupCol: String, k: Int,
                 channel: Long = 83L): DataFrame = {
    require(k >= 2, s"groupKFold: k >= 2 (got $k)")
    require(!df.columns.contains("fold"),
      "groupKFold: input already has a fold column")
    val u = Gen.u01(col(groupCol), channel)
    df.withColumn("fold",
      least(floor(u * k), lit(k - 1L)).cast("int"))
  }

  /** Class-rebalancing negative downsample with importance weights — the
    * CTR-training trick: positives are all kept, negatives survive at
    * `rate` via the key hash, and surviving negatives carry weight
    * `1/rate` (positives 1.0) so weighted losses/aggregates remain
    * unbiased estimates of the full-corpus values. Calibration note in
    * scaladoc: a model trained on these WEIGHTED rows is calibrated; one
    * trained unweighted must correct its logit by −ln(rate).
    *
    * Narrow filter+projection, no shuffle; deterministic and stable under
    * corpus growth (a key's survival never changes when data is appended).
    */
  def negativeDownsample(df: DataFrame, keyCol: String, positive: Column,
                         rate: Double, channel: Long = 89L): DataFrame = {
    require(rate > 0.0 && rate <= 1.0,
      s"negativeDownsample: rate in (0,1] (got $rate)")
    require(!df.columns.contains("label") && !df.columns.contains("weight"),
      "negativeDownsample: input already has a label/weight column")
    val u = Gen.u01(col(keyCol), channel)
    df.withColumn("label", positive)
      .filter(col("label") || u <= rate)
      .withColumn("weight",
        when(col("label"), 1.0).otherwise(lit(1.0 / rate)))
  }

  /** Exact-quota per-stratum selection at scale: returns, for each stratum,
    * the `quota` smallest rows by `(u01(key), key)` — the same rows a
    * `row_number() OVER (PARTITION BY stratum ORDER BY u, key)` rank would
    * pick — without ever sorting a whole stratum in one task.
    *
    * Three bounded phases:
    *   1. histogram: one shuffled count per (stratum, bucket) where
    *      bucket = floor(u·2²⁰) — map-side combined, fully parallel;
    *   2. boundary: a window over the histogram (≤ 2²⁰ rows per stratum,
    *      bounded regardless of corpus size) finds the one bucket where the
    *      running count crosses the quota; emits per stratum
    *      (boundary bucket, rows below it, quota) — one tiny row per
    *      stratum, broadcast back;
    *   3. select, in one pass: rows are ranked within their (stratum,
    *      bucket) — every window partition is bucket-sized (≈ n/2²⁰ rows,
    *      ~10⁶ even for a 10¹²-row stratum), never a stratum — and kept if
    *      their bucket is below the boundary (rank irrelevant) or they sit
    *      in the boundary bucket with an in-bucket rank that fits the
    *      remaining quota k − cumBefore.
    *
    * Deterministically exact for ANY u distribution — a degenerate u (all
    * rows in one bucket) just degrades the boundary bucket to the whole
    * stratum, i.e. the naive form; there is no probabilistic fallback to
    * get wrong. The broadcast plan holds one row per stratum (strata are
    * categorical — languages, event types — by construction).
    *
    * @param quota (stratumValue, n) => rows to keep, clamped to [0, n]
    */
  private def smallestPerStratum(df: DataFrame, stratumCol: String,
                                 keyCol: String, channel: Long,
                                 quota: (Column, Column) => Column,
                                 buckets: Int = 1 << 20,
                                 quotaTable: Option[DataFrame] = None): DataFrame = {
    val u = Gen.u01(col(keyCol), channel)
    // u ∈ (0, 1]: clamp u == 1 into the top bucket. NULL keys hash to
    // bucket −1 — ranked before every real bucket, mirroring the naive
    // window's ASC NULLS FIRST ordering, so they are counted AND
    // selectable instead of silently consuming quota
    val bucketOf = when(u.isNull, lit(-1L))
      .otherwise(least(floor(u * buckets), lit(buckets - 1L)).cast("long"))
    histogramSelect(
      df.withColumn("__p", u).withColumn("__b", bucketOf)
        .withColumn("__t", col(keyCol)),
      df.columns.toSeq, stratumCol, quota, quotaTable = quotaTable)
  }

  /** The shared selection core: `prepared` carries `__p` (ascending
    * priority, NULLs first), `__b` (its bucket, −1 for NULL `__p`,
    * monotone non-decreasing in `__p`), and `__t` (a tiebreak completing a
    * total order). Keeps, per stratum, the quota smallest rows by
    * (`__p`, `__t`) — exactly the naive full-stratum rank's selection —
    * with every window bounded by one bucket.
    */
  private def histogramSelect(prepared: DataFrame, outCols: Seq[String],
                              stratumCol: String,
                              quota: (Column, Column) => Column,
                              broadcastPlan: Boolean = true,
                              quotaTable: Option[DataFrame] = None): DataFrame = {
    val hist0 = prepared
      .groupBy(col(stratumCol).as("__s"), col("__b").as("__hb"))
      .agg(count(lit(1)).as("__c"))
    // quotaTable (stratum __qs → rows __qk) overrides the quota callback
    // with DATA-DERIVED quotas — bounded (one row per stratum), broadcast;
    // strata absent from the table get quota 0, like mixtureSample's
    // not-named-in-targets convention
    val hist = quotaTable.fold(hist0)(q =>
      hist0.join(broadcast(q), col("__s") <=> col("__qs"), "left")
        .drop("__qs"))
    val before = Window.partitionBy(col("__s")).orderBy(col("__hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col("__s"))
    // the one histogram row per stratum where the running count crosses k
    val boundary = hist
      .withColumn("__cumBefore", coalesce(sum(col("__c")).over(before), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(whole))
      .withColumn("__k",
        greatest(lit(0L), least(
          quotaTable.fold(quota(col("__s"), col("__n")).cast("long"))(_ =>
            coalesce(col("__qk"), lit(0L))),
          col("__n"))))
      .filter(col("__cumBefore") < col("__k") &&
        col("__k") <= col("__cumBefore") + col("__c"))
      .select(col("__s"), col("__hb").as("__bstar"),
        col("__cumBefore").as("__clo"), col("__k"))

    // strata with quota 0 have no boundary row: the inner join drops them
    // (null-safe <=> keeps a NULL stratum as its own stratum, like the
    // window's partitionBy did). One selection pass: rows above the
    // boundary bucket are discarded BEFORE the window (they can never be
    // picked), the rest rank within (stratum, BUCKET) — every window
    // partition is bucket-sized, never a stratum — and a row is kept if
    // its bucket is below the boundary, or it is in the boundary bucket
    // with an in-bucket rank that fits the remaining quota.
    val pick = Window.partitionBy(col(stratumCol), col("__b"))
      .orderBy(col("__p"), col("__t"))
    // broadcast only when the caller vouches for bounded stratum
    // cardinality (categorical strata); per-entity groups (one plan row
    // per user) must shuffle-join instead of collecting to the driver
    val planSide = if (broadcastPlan) broadcast(boundary) else boundary
    prepared
      .join(planSide, col(stratumCol) <=> col("__s"))
      .filter(col("__b") <= col("__bstar"))
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__b") < col("__bstar") ||
        col("__rn") <= col("__k") - col("__clo"))
      .select(outCols.map(col): _*)
  }

  /** Top-n per group by an ARBITRARY numeric priority, without sorting any
    * group in one task — the scale path for [[quotaCap]]'s common shape
    * ("keep the n newest / highest-score rows per key"). `priority` is
    * ascending (smallest first — negate for descending, e.g.
    * `-unix_micros(ts)` for newest-first); `tiebreak` completes the total
    * order; NULL priorities sort FIRST (pre-filter or coalesce to mimic a
    * desc NULLS LAST window).
    *
    * One extra phase vs the hash samplers: per-group (min, max) priority
    * bounds (a cheap partial-aggregated pass) define the bucket mapping
    * `floor((p − lo)/((hi − lo)/2²⁰))`; then the same histogram → boundary
    * bucket → bucket-bounded rank selection. Exact for any priority
    * distribution; heavy ties degrade the boundary bucket toward the
    * naive per-group sort (a constant priority is inherently unrankable
    * without one), never past it.
    */
  def quotaCapByPriority(df: DataFrame, groupCol: String, priority: Column,
                         tiebreak: Column, n: Long,
                         buckets: Int = 1 << 20): DataFrame = {
    // bucket from the DOUBLE view (long→double is monotone, which is all
    // bucketing needs); RANK by the ORIGINAL priority — a double cast
    // would collapse 64-bit priorities past 2⁵³ and change the selection
    val pd = priority.cast("double")
    val bounds = df
      .groupBy(col(groupCol).as("__bs"))
      .agg(min(pd).as("__lo"), max(pd).as("__hi"))
    val bucketOf =
      when(priority.isNull, lit(-1L))
        .otherwise(when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor((pd - col("__lo")) / ((col("__hi") - col("__lo")) / buckets))
              .cast("long"),
            lit(buckets - 1L))))
    // groups are per-entity (unbounded cardinality): bounds and the
    // boundary plan stay SHUFFLE joins — never driver-collected broadcasts
    histogramSelect(
      df.join(bounds, col(groupCol) <=> col("__bs"))
        .withColumn("__p", priority).withColumn("__b", bucketOf)
        .withColumn("__t", tiebreak)
        .drop("__bs", "__lo", "__hi"),
      df.columns.toSeq, groupCol, (_, _) => lit(n), broadcastPlan = false)
  }

  /** Exact stratified sample: ceil(fraction·|stratum|) rows from EVERY
    * stratum, picked by hash order within the stratum — rare strata never
    * vanish the way they can under global-uniform sampling. Selection via
    * [[smallestPerStratum]]: no task ever sorts a whole stratum.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       fraction: Double, channel: Long = 33L): DataFrame =
    smallestPerStratum(df, stratumCol, keyCol, channel,
      (_, n) => ceil(n * fraction))

  /** Per-group quota cap: at most `n` rows per group, highest-priority
    * first (`orderCols` must be a total order — tiebreak on a unique id).
    * The standard per-domain cap that stops one crawl domain from
    * dominating a training corpus.
    *
    * The rank is a per-group window over arbitrary priority columns — for
    * hash-priority caps at extreme group sizes, prefer
    * [[stratifiedSample]]/[[mixtureSample]], whose histogram selection
    * avoids the group sort entirely.
    */
  def quotaCap(df: DataFrame, groupCol: String, orderCols: Seq[Column],
               n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Hash-priority quota cap: keep at most `n` rows per group, selected by
    * deterministic hash order — the skew-proof form of [[quotaCap]] for the
    * common "cap every crawl domain at N documents, any N will do" case.
    * Runs through [[smallestPerStratum]]'s histogram selection, so a
    * dominant group (the exact situation a cap exists for!) never becomes
    * one giant sort task the way `quotaCap`'s priority window does.
    */
  def quotaCapHashed(df: DataFrame, groupCol: String, keyCol: String,
                     n: Long, channel: Long = 39L): DataFrame =
    smallestPerStratum(df, groupCol, keyCol, channel, (_, _) => lit(n))

  /** WEIGHTED sample without replacement (Efraimidis–Spirakis A-Res):
    * each row gets priority `u^(1/w)` with the shared deterministic u01
    * hash, and the `n` largest priorities win — inclusion probability ∝
    * weight, no replacement, no sequential pass. The quality-weighted
    * corpus subsampling primitive ([[Gen.weightedPick]] is the
    * with-replacement counterpart). Zero/negative weights are excluded
    * (their priority would be ill-defined), ties break by key. Executes
    * as TakeOrdered: per-partition top-n heaps, driver merges n·P rows —
    * no global sort at any size.
    */
  def weightedSampleNoReplacement(df: DataFrame, keyCol: String,
                                  weightCol: String, n: Int,
                                  channel: Long = 43L): DataFrame =
    df.filter(col(weightCol) > 0)
      .orderBy(
        // rank by the ROUNDED priority: JVM and libm pow agree only to
        // ulps, and an unrounded rank could select different boundary
        // rows per engine (same rule as the TF-IDF top-k); rounding ties
        // are broken deterministically by key
        round(pow(Gen.u01(col(keyCol), channel),
          lit(1.0) / col(weightCol)), 6).desc,
        col(keyCol))
      .limit(n)

  /** Budget-capped quota sample — the data-recipe mixing primitive ("20 K
    * chars of en, 8 K of de, 10 K of zh"): each group admits its
    * hash-ordered prefix of rows whose CUMULATIVE cost (tokens / chars /
    * bytes) stays within the group's declared budget. Where the
    * `quotaCap*` family counts ROWS, this integrates a per-row cost —
    * the unit an LLM data recipe is actually written in.
    *
    * Admission rule: inclusive cumulative cost ≤ budget, so the first
    * over-budget row and everything after it in hash order are excluded —
    * no partial documents. Groups absent from `budgets` are dropped
    * entirely; groups whose total cost fits are admitted whole. Rows with
    * NULL cost are excluded up front (they cannot be budgeted); negative
    * costs `raise_error` in-plan (a non-monotone prefix has no "within
    * budget" meaning — same fail-loud posture as [[corpusShuffle]]).
    *
    * The cumulative cost comes from [[Scan.prefixSum]]'s two-level sliced
    * scan, so no task ever sorts a whole group — a dominant source (the
    * very thing a budget exists to tame) cannot serialize the job the way
    * `sum() OVER (PARTITION BY group ORDER BY hash)` would. Output keeps
    * the running total as `cum_cost` for audit.
    */
  def budgetSample(df: DataFrame, groupCol: String, keyCol: String,
                   costCol: String, budgets: Map[String, Long],
                   channel: Long = 47L): DataFrame = {
    require(budgets.nonEmpty, "budgetSample: empty budget map")
    require(budgets.values.forall(_ >= 0),
      s"budgetSample: negative budget in $budgets")
    val spark = df.sparkSession
    import spark.implicits._
    val budgetDf = budgets.toSeq.toDF(groupCol, "__budget")
    val cost = when(col(costCol) < 0, raise_error(concat(
        lit(s"budgetSample: negative cost in `$costCol`: "),
        col(costCol).cast("string"))))
      .otherwise(col(costCol)).cast("long")
    val ordered = df
      .filter(col(costCol).isNotNull)
      .withColumn("__ord",
        struct(Gen.u01(col(keyCol), channel).as("h"), col(keyCol).as("k")))
    Scan.prefixSum(ordered, Seq(groupCol), col("__ord"), cost, "cum_cost")
      .join(broadcast(budgetDf), Seq(groupCol))
      .filter(col("cum_cost") <= col("__budget"))
      .drop("__ord", "__budget")
  }

  /** Uniform fixed-size sample without replacement: the `n` smallest rows
    * by keyed hash. Equivalent in distribution to a seeded reservoir, but
    * deterministic, mergeable, and executed as TakeOrdered.
    */
  /** Iterative proportional fitting (raking) of the (row, col) cell
    * counts toward UNIFORM marginals — the survey-weighting workhorse
    * applied to corpus balancing: after raking, every language carries
    * equal total weight AND every source does, while within-cell
    * proportions stay as observed (the maximum-entropy adjustment).
    * The per-doc sampling weight is `weight_ratio` of the doc's cell.
    *
    * Each half-step scales cells by (target / marginal-sum) and COMMITS
    * the weights to the 1e-6 lattice, so every marginal sum is an exact
    * long and the iteration replays engine-identically (the unrolled-
    * superstep oracle contract of markov/kmeans/BPE). Cell table is
    * |rows|·|cols| — bounded by construction.
    */
  def rakeWeights(df: DataFrame, rowCol: String, colCol: String,
                  iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"rakeWeights: iterations in [1, 10] (got $iterations)")
    val cells = df
      .filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).as("__n"))
    val nR = cells.select("__r").distinct().count()
    val nC = cells.select("__c").distinct().count()
    require(nR >= 1 && nC >= 1 && nR * nC <= 100000,
      s"rakeWeights: cell table must stay bounded (got $nR x $nC)")
    val wr = Window.partitionBy(col("__r"))
    val wc = Window.partitionBy(col("__c"))
    val all = Window.partitionBy()
    var cur = cells
      .withColumn("__tot", sum(col("__n")).over(all))
      .withColumn("__wu", col("__n") * 1000000L)
    for (_ <- 1 to iterations) {
      cur = cur.withColumn("__wu", round(col("__wu") *
        ((col("__tot").cast("double") / nR) /
          (sum(col("__wu")).over(wr).cast("double") / 1e6)), 0)
        .cast("long"))
      cur = cur.withColumn("__wu", round(col("__wu") *
        ((col("__tot").cast("double") / nC) /
          (sum(col("__wu")).over(wc).cast("double") / 1e6)), 0)
        .cast("long"))
    }
    cur.select(col("__r").as(rowCol), col("__c").as(colCol),
        col("__n").as("n_docs"),
        round(col("__wu") / 1e6, 6).as("raked_weight"),
        round(col("__wu") / 1e6 / col("__n"), 6).as("weight_ratio"))
      .orderBy(rowCol, colCol)
  }

  /** Effective sample size of a weighted dataset — Kish's
    * ESS = (Σw)²/Σw², the one-number diagnostic for every importance-
    * weighted corpus (DSIR, dedup survivor weights, mixture reweights):
    * "this 100 K-doc weighted set carries as much statistical mass as
    * ESS unweighted docs". ess_ratio ≪ 1 means a few heavy documents
    * dominate and downstream estimates will be noisy.
    *
    * Weights commit to the 1e-6 lattice, both moment sums are exact
    * (long / HUGEINT-class decimal), and the lattice scale cancels in
    * the ratio. A negative weight nulls the statistic (fail-visible)
    * rather than producing a nonsense ESS.
    */
  def effectiveSampleSize(df: DataFrame, weightCol: String): DataFrame = {
    val folded = df
      .select(round(col(weightCol) * 1e6, 0).cast("long").as("__w"))
      .agg(count(lit(1)).as("n"),
        sum(col("__w")).as("__sw"),
        sum(col("__w").cast("decimal(38,0)") * col("__w")).as("__sww"),
        min(col("__w")).as("__mn"))
    val ess = (col("__sw").cast("decimal(38,0)") * col("__sw"))
      .cast("double") / col("__sww").cast("double")
    folded.select(col("n"),
      round(col("__sw").cast("double") / 1e6, 6).as("sum_weight"),
      when(col("__mn") >= 0 && col("__sww") > 0, round(ess, 6)).as("ess"),
      when(col("__mn") >= 0 && col("__sww") > 0,
        round(ess / col("n").cast("double"), 6)).as("ess_ratio"))
  }

  def uniformSample(df: DataFrame, keyCol: String, n: Int,
                    channel: Long = 35L): DataFrame =
    df.orderBy(Gen.u01(col(keyCol), channel), col(keyCol)).limit(n)

  /** [[uniformSample]] at scale: the SAME n smallest-by-hash rows selected
    * through the histogram machinery instead of TakeOrdered — no driver
    * merge of #partitions·n heap heads, so n can be millions (a 1%
    * fixed-size sample of a 10¹¹-row corpus) without the driver becoming
    * the bottleneck. Single stratum ⇒ the boundary scan is one ≤2²⁰-row
    * window; selection windows stay bucket-bounded.
    */
  def uniformSampleScalable(df: DataFrame, keyCol: String, n: Long,
                            channel: Long = 35L): DataFrame =
    smallestPerStratum(df.withColumn("__all", lit(1)), "__all", keyCol,
      channel, (_, _) => lit(n)).drop("__all")

  /** Mixture sampling: draw a corpus whose stratum proportions match a
    * TARGET mixture (the data-mixing step of a training pipeline — e.g.
    * 70% english / 30% rest regardless of the raw crawl mix). Per-stratum
    * quota = floor(share·totalN); rows picked by hash order within the
    * stratum via [[smallestPerStratum]] — exact, deterministic, and free
    * of full-stratum sorts. Strata with fewer rows than their quota
    * contribute everything they have (the shortfall is reported by
    * comparing output counts to quotas downstream); strata not named in
    * `targetShares` are dropped.
    */
  def mixtureSample(df: DataFrame, stratumCol: String, keyCol: String,
                    targetShares: Seq[(String, Double)], totalN: Long,
                    channel: Long = 37L): DataFrame =
    smallestPerStratum(df, stratumCol, keyCol, channel,
      (s, _) => targetShares.foldRight(lit(0L): Column) {
        case ((name, share), acc) =>
          when(s === name, lit(math.floor(share * totalN).toLong))
            .otherwise(acc)
      })

  /** Mixture audit: per target stratum, the quota the mixture asks for,
    * the rows the corpus can supply, what a [[mixtureSample]] draw
    * actually takes, and the shortfall — the report a data-mixing run
    * publishes next to its sample so undersupplied sources are visible
    * instead of silently diluting the mix. One aggregate over the corpus
    * joined to the (tiny, literal) target table.
    */
  def mixtureReport(df: DataFrame, stratumCol: String,
                    targetShares: Seq[(String, Double)],
                    totalN: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val targets = targetShares.map { case (s, share) =>
      (s, math.floor(share * totalN).toLong)
    }.toDF("stratum", "quota")
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("available"))
    targets.join(counts, Seq("stratum"), "left")
      .withColumn("available", coalesce(col("available"), lit(0L)))
      .withColumn("drawn", least(col("quota"), col("available")))
      .withColumn("shortfall", col("quota") - col("drawn"))
      .orderBy("stratum")
  }

  /** Temperature-scaled mixture: per-stratum quotas DERIVED from the
    * corpus itself, `quotaᵢ = ⌊totalN · nᵢᵅ / Σⱼ nⱼᵅ⌋` — the multilingual
    * /multi-domain rebalancing rule (α < 1 upsamples the tail relative to
    * the head; α = 1 recovers proportional sampling; α → 0 approaches
    * uniform-over-strata). Unlike [[mixtureSample]], no target list is
    * needed: every observed stratum participates.
    *
    * The quota table is ONE bounded aggregation (a row per stratum) with
    * the normalizer folded over the stratum-bounded frame; selection then
    * runs the [[smallestPerStratum]] histogram machinery with the quotas
    * broadcast-joined in — same cost profile as [[mixtureSample]], no
    * full-stratum sorts, corpus scanned once for counting and once for
    * selection.
    *
    * α = 0.5 routes through `sqrt` (IEEE correctly-rounded in every
    * engine) rather than `pow` (libm-dependent ULP), keeping the quota
    * floor cross-engine reproducible for the common temperature.
    */
  def temperatureMixture(df: DataFrame, stratumCol: String, keyCol: String,
                         alpha: Double, totalN: Long,
                         channel: Long = 53L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperatureMixture: alpha in (0, 1] (got $alpha)")
    require(totalN >= 0, s"temperatureMixture: totalN >= 0 (got $totalN)")
    def weight(c: Column): Column =
      if (alpha == 0.5) sqrt(c) else pow(c, lit(alpha))
    val all = Window.partitionBy()
    val quotas = df
      .groupBy(col(stratumCol).as("__qs"))
      .agg(count(lit(1)).as("__qn"))
      .withColumn("__qk",
        floor(lit(totalN.toDouble) * weight(col("__qn").cast("double")) /
          sum(weight(col("__qn").cast("double"))).over(all)).cast("long"))
      .select(col("__qs"), col("__qk"))
    smallestPerStratum(df, stratumCol, keyCol, channel,
      (_, _) => lit(0L), quotaTable = Some(quotas))
  }

  /** The audit twin of [[temperatureMixture]]: per stratum, its raw
    * count, temperature weight, derived quota, actual draw and shortfall
    * — published next to the sample so the rebalancing is inspectable.
    */
  def temperatureMixtureReport(df: DataFrame, stratumCol: String,
                               alpha: Double, totalN: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperatureMixtureReport: alpha in (0, 1] (got $alpha)")
    def weight(c: Column): Column =
      if (alpha == 0.5) sqrt(c) else pow(c, lit(alpha))
    val all = Window.partitionBy()
    df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("available"))
      .withColumn("weight", round(weight(col("available").cast("double")), 6))
      .withColumn("quota",
        floor(lit(totalN.toDouble) * weight(col("available").cast("double")) /
          sum(weight(col("available").cast("double"))).over(all)).cast("long"))
      .withColumn("drawn", least(col("quota"), col("available")))
      .withColumn("shortfall", col("quota") - col("drawn"))
      .orderBy("stratum")
  }

  /** Pack audit for [[packSequences]] output: per (group, pack), document
    * count, token load, and utilization of the budget — packs may exceed
    * 1.0 by one document (the documented spill-at-boundary convention), so
    * utilization is the padding-waste signal a training run watches.
    */
  def packReport(packed: DataFrame, groupCol: String, tokenCol: String,
                 maxTokens: Long): DataFrame =
    packed.groupBy(col(groupCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol).cast("long")).as("pack_tokens"))
      .withColumn("utilization",
        round(col("pack_tokens").cast("double") / maxTokens, 6))
      .orderBy(groupCol, "pack_id")

  /** Sequence packing: assign documents to fixed-budget training packs —
    * per group (e.g. language), documents in deterministic id order, pack
    * id = floor(tokens-before-this-doc / maxTokens). The standard
    * streaming-concat packing approximation: every pack holds consecutive
    * docs and at least one doc, a doc straddling a boundary spills into
    * the next pack.
    *
    * The per-group running sum is [[Scan.prefixSum]] — a distributed
    * two-level prefix sum, not one group-wide window. No task ever sorts
    * more than one range slice, so a group 1000× the rest still packs at
    * slice parallelism, and the result is provably identical to the
    * sequential scan (integer sums are slicing-invariant).
    */
  def packSequences(docs: DataFrame, groupCol: String, idCol: String,
                    tokenCol: String, maxTokens: Long): DataFrame =
    Scan.prefixSum(docs, Seq(groupCol), col(idCol), col(tokenCol),
        "cum_tokens")
      .withColumn("pack_id",
        floor((col("cum_tokens") - col(tokenCol)) / maxTokens).cast("int"))
      .select(col(groupCol), col(idCol), col(tokenCol).cast("int").as(tokenCol),
        col("cum_tokens"), col("pack_id"))

  /** Compaction (small-file bin-packing) planner — the Delta
    * OPTIMIZE / Iceberg rewrite-data-files PLANNING step as a query:
    * within each partition, files fill target-size bins contiguously in
    * file-id order (bin = floor(startOffset / target) — the same
    * greedy-fill [[packSequences]] uses for token packing, applied to
    * bytes), and each file row carries its bin's totals so the rewrite
    * job can group-by (partition, bin) directly. The trailing
    * `undersized` bin per partition is flagged — the residue a planner
    * either merges across partitions or leaves for the next cycle.
    *
    * Plan: [[Scan.prefixSum]] (slice-parallel two-level scan — a
    * 100 M-file manifest plans at full parallelism; no group-wide
    * window sort) plus one bounded per-(partition, bin) window.
    * Integer end to end.
    */
  def compactionPlan(manifest: DataFrame, partCol: String, fileCol: String,
                     bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0,
      s"compactionPlan: targetBytes > 0 (got $targetBytes)")
    val base = manifest.select(col(partCol).as("partition"),
      col(fileCol).as("file_id"), col(bytesCol).cast("long").as("bytes"))
    val withBin = Scan.prefixSum(base, Seq("partition"), col("file_id"),
        col("bytes"), "cum_bytes")
      .withColumn("bin",
        floor((col("cum_bytes") - col("bytes"))
          / lit(targetBytes).cast("double")).cast("long"))
    val binW = Window.partitionBy("partition", "bin")
    withBin
      .withColumn("bin_bytes", sum(col("bytes")).over(binW))
      .withColumn("bin_files", count(lit(1)).over(binW))
      .withColumn("undersized", col("bin_bytes") < lit(targetBytes))
      .select(col("partition"), col("file_id"), col("bytes"),
        col("cum_bytes"), col("bin"), col("bin_bytes"), col("bin_files"),
        col("undersized"))
      .orderBy("partition", "file_id")
  }

  /** Uniform hash shard of a numeric key (the u = 1.0 edge clamps into the
    * last shard) — the assignment half of [[corpusShuffle]], exposed so
    * pipelines that only need the shard column skip the within-shard rank
    * entirely.
    */
  def shardOf(key: Column, nShards: Int, channel: Long = 71L): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    least(floor(Gen.u01(key, channel) * nShards).cast("int"),
      lit(nShards - 1))
  }

  /** Deterministic corpus shuffle into training shards, UNORDERED form:
    * every row gets a shard (uniform over `nShards` via the engine-parity
    * [[Gen.u01]] hash) and a position WITHIN its shard (rank by an
    * independent hash channel, id tiebreak) — the "globally shuffled,
    * sharded" layout a training job reads so consecutive examples are
    * decorrelated, stable under reruns and corpus append (hash-keyed,
    * like [[splitAssign]]). Compose this form mid-pipeline; the
    * (shard, shard_pos) order of [[corpusShuffle]] is only an export
    * contract.
    *
    * Scale shape and ITS INVARIANT: shard assignment is a narrow
    * projection; the only sort is the per-shard rank window, which ranks
    * each shard IN ONE TASK. That is only sound when nShards grows with
    * the corpus so a shard stays executor-sized (the same knob a writer
    * uses for output file sizing — corpus/nShards rows per task). The
    * invariant is enforced in-plan, [[Drift.sweepExact]]-style: a
    * per-shard row count (parallel partial agg, nShards rows, broadcast
    * back) `raise_error`s any shard above `maxShardRows` BEFORE its
    * single-task sort can run, so an under-sharded 100 TB run fails loud
    * instead of wedging one task on a corpus-sized sort.
    */
  def corpusShuffleRelation(docs: DataFrame, idCol: String, nShards: Int,
                            channel: Long = 71L,
                            maxShardRows: Long = 10000000L): DataFrame = {
    val assigned = docs.select(col(idCol),
      shardOf(col(idCol), nShards, channel).as("shard"),
      Gen.u01(col(idCol), channel + 1).as("__u"))
    val sizes = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("__shard_rows"))
    val guarded = assigned.join(broadcast(sizes), "shard")
      .withColumn("__u",
        when(col("__shard_rows") <= maxShardRows, col("__u"))
          .otherwise(raise_error(concat(
            lit("corpusShuffle: shard "), col("shard").cast("string"),
            lit(" has "), col("__shard_rows").cast("string"),
            lit(s" rows (> maxShardRows=$maxShardRows); raise nShards so " +
              "a shard fits one task, or raise maxShardRows")))))
      .drop("__shard_rows")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__u").asc, col(idCol).asc)
    guarded.withColumn("shard_pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("shard_pos"))
  }

  /** [[corpusShuffleRelation]] with the deterministic (shard, shard_pos)
    * output order — the registered-query / export form.
    */
  def corpusShuffle(docs: DataFrame, idCol: String, nShards: Int,
                    channel: Long = 71L): DataFrame =
    corpusShuffleRelation(docs, idCol, nShards, channel)
      .orderBy(col("shard"), col("shard_pos"))

  /** Rendezvous (highest-random-weight) shard assignment: each doc goes to
    * the shard with the largest md5(doc ‖ shard) weight. Unlike
    * `hash(doc) % n`, growing the shard count moves ONLY the docs won by
    * the NEW shard (expected share 1/(n+1)) — the minimal-movement
    * property that makes incremental re-sharding of a 100 TB layout an
    * append, not a full rewrite. Pure projection over a bounded
    * shard-candidate explode (rows × nShards); no shuffle.
    */
  def rendezvousAssign(docs: DataFrame, idCol: String,
                       nShards: Int): DataFrame = {
    require(nShards >= 1, s"rendezvousAssign: nShards >= 1 (got $nShards)")
    // 15 hex chars = 60 bits, positive in a signed BIGINT on both engines
    val w = conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
      col("cand").cast("string"))), 1, 15), 16, 10).cast("long")
    docs
      .select(col(idCol),
        explode(sequence(lit(0), lit(nShards - 1))).as("cand"))
      .select(col(idCol), struct(w.as("w"), col("cand").as("s")).as("ws"))
      .groupBy(col(idCol))
      .agg(max(col("ws")).getField("s").as("shard"))
  }

  /** The re-sharding audit: assignments at `nFrom` vs `nTo` shards
    * (nTo > nFrom), ONE row — how many docs moved, the moved share
    * (expect ≈ (nTo−nFrom)/nTo), and `moved_only_to_new` — TRUE iff every
    * moved doc landed on a NEW shard id (the rendezvous guarantee; FALSE
    * would mean the hash is not behaving and a modulo-style reshuffle is
    * happening).
    */
  def rendezvousMovementReport(docs: DataFrame, idCol: String,
                               nFrom: Int, nTo: Int): DataFrame = {
    require(nTo > nFrom, s"rendezvousMovementReport: nTo > nFrom ($nFrom, $nTo)")
    val a = rendezvousAssign(docs, idCol, nFrom)
      .withColumnRenamed("shard", "shard_from")
    val b = rendezvousAssign(docs, idCol, nTo)
      .withColumnRenamed("shard", "shard_to")
    a.join(b, idCol).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("shard_from") =!= col("shard_to"), 1).otherwise(0))
        .cast("long").as("n_moved"),
      round(sum(when(col("shard_from") =!= col("shard_to"), 1).otherwise(0)) /
        count(lit(1)), 6).as("moved_share"),
      min(when(col("shard_from") =!= col("shard_to"),
        col("shard_to") >= nFrom)).as("moved_only_to_new"))
  }

  /** Epoch-capped token-budget mixture solver — exact water-filling, the
    * planning step behind every "mix domains to target weights but never
    * repeat any domain more than E epochs" pretraining recipe (the
    * tension the LLaMA/Chinchilla data notes describe: target weights
    * are infeasible for small domains, and naive renormalization leaks
    * their shortfall to the wrong places).
    *
    * Given per-domain token supply s_d (whitespace tokens, the
    * [[TextAnalysis.tokens]] spelling), a target-weight expression w_d
    * (evaluated on the per-domain frame, where the domain column is
    * named `domain`),
    * a budget B = `budgetFraction`·Σs and an epoch cap E: solve
    * a_d = min(E·s_d, c·w_d) with Σ a_d = B for the water level c.
    *
    * CLOSED FORM, not iteration: a domain caps iff c ≥ p_d where
    * p_d = E·s_d/w_d (its "cap price"), so domains cap in ascending
    * price order, and for j capped domains c_j = (B − E·S_j)/(W − W_j)
    * (prefix sums in price order). The unique feasible j satisfies
    * p_j ≤ c_j < p_{j+1}. One corpus aggregation to the per-domain
    * grain, then window prefix sums over the BOUNDED domain frame
    * (tens of rows at any corpus size) — the standard bounded-global-
    * window posture (PLANS.md enumerates these).
    *
    * Infeasible budgets (B > E·Σs) fail loud in-plan via an ANSI
    * error; B = E·Σs degenerates to "every domain capped" and is
    * handled exactly (c = the max price). Requires w_d > 0 for every
    * domain (guarded in-plan the same way).
    */
  def mixtureWaterfill(docs: DataFrame, textCol: String, domainCol: String,
                       weight: Column, budgetFraction: Double,
                       epochCap: Double): DataFrame = {
    require(budgetFraction > 0, s"mixtureWaterfill: budgetFraction > 0")
    require(epochCap > 0, s"mixtureWaterfill: epochCap > 0")
    val per = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col(textCol))).cast("long"))
          .as("supply_tokens"))
      .withColumn("weight", weight.cast("double"))
      // fail loud on nonpositive weights (would put this domain's price
      // at ±∞ and silently corrupt the prefix order)
      .withColumn("weight",
        when(col("weight") > 0, col("weight"))
          .otherwise(raise_error(concat(lit("mixtureWaterfill: weight <= 0 for domain "),
            col("domain")))))
    val tot = per.agg(
      sum(col("supply_tokens")).cast("double").as("__stot"),
      sum(col("weight")).as("__wtot"))
    val priced = per.crossJoin(broadcast(tot))
      .withColumn("__budget", lit(budgetFraction) * col("__stot"))
      // infeasibility guard: B must be coverable at the epoch cap
      .withColumn("__budget",
        when(col("__budget") <= lit(epochCap) * col("__stot"), col("__budget"))
          .otherwise(raise_error(lit(
            "mixtureWaterfill: budget exceeds epochCap * total supply"))))
      .withColumn("price",
        lit(epochCap) * col("supply_tokens") / col("weight"))
    // bounded global window: one row per domain
    val byPrice = Window.orderBy(col("price"), col("domain"))
    val j = priced
      .withColumn("__rank", row_number().over(byPrice))
      .withColumn("__s_pfx", sum(col("supply_tokens").cast("double"))
        .over(byPrice.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__w_pfx", sum(col("weight"))
        .over(byPrice.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__p_next", lead(col("price"), 1).over(byPrice))
    // candidate water level with the first (rank) domains capped; rank 0
    // (nothing capped) is represented by a synthetic row via the j = 0
    // candidate c0 = B / W computed on every row and validated below
    val cand = j
      // ANSI guard: the last row has W − W_pfx = 0; NULL there (same
      // exclusion DuckDB's NULL-on-/0 gives the replay)
      .withColumn("__c", when(col("__wtot") > col("__w_pfx"),
        (col("__budget") - lit(epochCap) * col("__s_pfx"))
          / (col("__wtot") - col("__w_pfx"))))
      .withColumn("__c0", col("__budget") / col("__wtot"))
      .withColumn("__valid",
        // j = rank capped: price_rank <= c_rank < price_{rank+1}
        col("price") <= col("__c") &&
          (col("__p_next").isNull || col("__c") < col("__p_next")))
      .withColumn("__valid0",
        col("__rank") === 1 && col("__c0") < col("price"))
    // exactly-all-capped degeneracy: on the last row W − W_pfx = 0 makes
    // __c NaN (0/0) or −Inf, so __valid can never fire there; detect it
    // directly instead — feasibility already guarantees B ≤ E·Σs, so the
    // last row caps exactly when B ≥ E·S_n, and the level is the max
    // price (every domain capped)
    val level = cand
      .select(
        min(when(col("__valid0"), col("__c0"))).as("__lv0"),
        min(when(col("__valid") && col("__wtot") > col("__w_pfx"),
          col("__c"))).as("__lvj"),
        max(when(col("__p_next").isNull &&
          col("__budget") >= lit(epochCap) * col("__s_pfx"),
          col("price"))).as("__lvall"))
      .select(coalesce(col("__lv0"), col("__lvj"), col("__lvall"))
        .as("__level"))
    priced.crossJoin(broadcast(level))
      .select(
        col("domain"), col("n_docs"), col("supply_tokens"), col("weight"),
        round(col("price"), 6).as("price"),
        round(col("__level"), 6).as("water_level"),
        round(least(lit(epochCap) * col("supply_tokens"),
          col("__level") * col("weight")), 2).as("alloc_tokens"),
        round(least(lit(epochCap) * col("supply_tokens"),
          col("__level") * col("weight"))
          / col("supply_tokens").cast("double"), 6).as("epochs"),
        (col("price") <= col("__level")).as("capped"))
      .orderBy(col("domain"))
  }
}
