package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-level OLAP aggregation — ROLLUP / CUBE subtotal lattices and
  * declared-values PIVOT. The reference's dashboards recompute each
  * subtotal level as its own GROUP BY pass
  * (reference `spark/apps/batch_feature_engineering.py` runs one
  * aggregation per granularity); `rollup`/`cube` produce every level in
  * ONE shuffle — partial aggregation covers all grouping sets at once.
  *
  * Subtotal rows carry NULL in the rolled-up key columns; we coalesce
  * them to the `(all)` sentinel and keep `grouping_id()` alongside, so
  * consumers (and the DuckDB oracle) distinguish a subtotal from a
  * genuine NULL key without relying on engine NULL-ordering conventions.
  *
  * Scale notes: rollup/cube multiply output rows, not input rows — the
  * shuffle is still one pass over the fact table with map-side partials
  * per grouping set. PIVOT is only scale-safe with DECLARED values
  * (`pivotCounts` requires them): Spark otherwise runs an extra distinct
  * scan to discover the column set, and an unbounded pivot width is a
  * driver OOM at 100 TB.
  */
object Olap {

  private def sentinel(keys: Seq[String]): Seq[Column] =
    keys.map(k => coalesce(col(k).cast("string"), lit("(all)")).as(k))

  /** Hierarchical subtotals: (k1..kn), (k1..kn-1), …, grand total — one
    * shuffled aggregation for the whole lattice. `aggs` maps output name →
    * metric expression; `gid` is Spark's `grouping_id()` bitmask (0 = leaf
    * row, all-ones = grand total).
    */
  def rollupAgg(df: DataFrame, keys: Seq[String],
                aggs: Seq[(String, Column)]): DataFrame =
    finish(df.rollup(keys.map(col): _*), keys, aggs)

  /** Every grouping-set combination (2^n levels), same single-shuffle
    * shape as [[rollupAgg]].
    */
  def cubeAgg(df: DataFrame, keys: Seq[String],
              aggs: Seq[(String, Column)]): DataFrame =
    finish(df.cube(keys.map(col): _*), keys, aggs)

  /** EXPLICIT grouping sets — the lattice slices a dashboard actually
    * reads, without the 2^n levels CUBE materializes or the prefix-only
    * ones ROLLUP allows (e.g. Seq(Seq(a,b), Seq(a), Seq(b)) skips the
    * grand total; Seq(Seq(a), Seq(b)) never groups jointly). Same
    * single-shuffle shape and `(all)` sentinel / grouping_id conventions
    * as [[rollupAgg]]; every named set must draw from `keys`.
    */
  def groupingSetsAgg(df: DataFrame, keys: Seq[String],
                      sets: Seq[Seq[String]],
                      aggs: Seq[(String, Column)]): DataFrame = {
    require(sets.nonEmpty && sets.flatten.forall(keys.contains),
      s"groupingSetsAgg: every set column must be in $keys (got $sets)")
    finish(df.groupingSets(sets.map(_.map(col)), keys.map(col): _*),
      keys, aggs)
  }

  private def finish(grouped: org.apache.spark.sql.RelationalGroupedDataset,
                     keys: Seq[String],
                     aggs: Seq[(String, Column)]): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate required")
    val aliased = aggs.map { case (n, c) => c.as(n) }
    grouped
      .agg(grouping_id().as("gid"), aliased: _*)
      .select((sentinel(keys) :+ col("gid")) ++
        aggs.map { case (n, _) => col(n) }: _*)
      .orderBy(col("gid") +: keys.map(col): _*)
  }

  /** Wide-format counts: one row per `rowKey`, one column per declared
    * `values` entry of `pivotCol`. Declared values keep the plan a single
    * aggregation (no distinct-discovery job) and make the output schema
    * static — both required for the 100 TB posture and for the oracle.
    * Values outside the declared list are dropped (handle-unknown=ignore,
    * matching [[Encoding.oneHot]]).
    */
  def pivotCounts(df: DataFrame, rowKey: Column, rowKeyName: String,
                  pivotCol: String, values: Seq[String]): DataFrame = {
    require(values.nonEmpty && values.distinct == values,
      "pivot values must be declared, non-empty, and unique")
    val unsafe = values.filterNot(_.matches("[A-Za-z0-9_]+"))
    require(unsafe.isEmpty,
      s"pivot values must be identifier-safe column names, got: $unsafe")
    df.groupBy(rowKey.as(rowKeyName))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
      // pivot leaves NULL where a (row, value) cell has no rows — report 0
      .select(col(rowKeyName) +:
        values.map(v => coalesce(col(v), lit(0L)).as(v)): _*)
      .orderBy(col(rowKeyName))
  }

  /** Customer tier-migration matrix: per period (week), classify each
    * entity into a DECLARED spend tier, then count period-over-period
    * transitions — the retention/upsell flow dashboard ("how many `high`
    * users dropped to `mid` last week?"). Entities present in period t
    * but absent in t+1 land in the `churned` column; each row carries
    * the share of its (period, from-tier) cohort. The LAST period has no
    * successor and is excluded from the from-side by construction.
    *
    * Determinism: spend rides the centi lattice so tier thresholds
    * compare exact longs; counts are exact; shares are single rational
    * divisions rounded at 6.
    *
    * Plan: one keyed weekly aggregation (corpus-sized, map-side
    * combined), one self-join on (entity, week+7d) at the entity-week
    * grain, one keyed count; the share window runs over the bounded
    * (weeks × tiers²) matrix.
    */
  def tierMigration(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String,
                    tiers: Seq[(String, Double)]): DataFrame = {
    require(tiers.nonEmpty && tiers.size <= 16 &&
      tiers.map(_._2) == tiers.map(_._2).sorted &&
      tiers.head._2 == 0.0 &&
      tiers.map(_._1).distinct == tiers.map(_._1) &&
      !tiers.map(_._1).contains("churned"),
      s"tierMigration: ascending thresholds starting at 0.0, unique " +
        s"names, 'churned' reserved (got $tiers)")
    val centiCuts = tiers.map { case (n, t) => (n, math.round(t * 100)) }
    val weekly = df.groupBy(col(keyCol).as("__k"),
        date_trunc("week", col(tsCol)).cast("date").as("__w"))
      .agg(sum(round(col(valueCol) * 100, 0).cast("long")).as("__cents"))
    val tier = centiCuts.reverse.tail.foldLeft(
      when(col("__cents") >= centiCuts.last._2, centiCuts.last._1)) {
      case (acc, (n, cut)) => acc.when(col("__cents") >= cut, n)
    }.otherwise(tiers.head._1)
    val tiered = weekly.select(col("__k"), col("__w"), tier.as("__tier"))
    val lastWeek = tiered.agg(max(col("__w")).as("__maxW"))
    val next = tiered.select(col("__k").as("__kNext"),
      col("__w").as("__wNext"), col("__tier").as("__tierNext"))
    val moved = tiered
      .crossJoin(broadcast(lastWeek)).filter(col("__w") < col("__maxW"))
      .join(next, col("__k") === col("__kNext") &&
        date_add(col("__w"), 7) === col("__wNext"), "left")
      .select(col("__w").as("week_from"), col("__tier").as("tier_from"),
        coalesce(col("__tierNext"), lit("churned")).as("tier_to"))
    val cohort = Window.partitionBy(col("week_from"), col("tier_from"))
    moved.groupBy(col("week_from"), col("tier_from"), col("tier_to"))
      .agg(count(lit(1)).as("n_entities"))
      .withColumn("cohort_share", round(col("n_entities").cast("double") /
        sum(col("n_entities")).over(cohort).cast("double"), 6))
      .orderBy("week_from", "tier_from", "tier_to")
  }

  /** Daily OHLC bars with VWAP and day-over-day close return — the
    * market-data summary shape ("candlesticks") applied to any valued
    * event stream: open/close are the first/last value IN EVENT ORDER
    * (timestamp with id tiebreak — an exact struct election, never a
    * nondeterministic `first()`), high/low the extremes, VWAP the
    * lattice-exact mean.
    *
    * Determinism: open/close elected via min/max over the (ts, id,
    * value) struct — exact lexicographic comparison; VWAP folds 1e-6
    * lattice longs; the return column divides the two elected doubles
    * (one fixed tree). One row per day; the return lag runs over the
    * calendar-bounded frame (documented global-window class).
    *
    * Plan: one keyed aggregation (map-side combined: min/max/sum all
    * merge), one bounded lag window. No raw-row window.
    */
  def dailyBars(df: DataFrame, tsCol: String, idCol: String,
                valueCol: String): DataFrame = {
    val base = df.select(col(tsCol).as("__ts"), col(idCol).as("__id"),
        col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val per = base.groupBy(to_date(col("__ts")).as("day"))
      .agg(
        min(struct(col("__ts"), col("__id"), col("__v"))).as("__o"),
        max(struct(col("__ts"), col("__id"), col("__v"))).as("__c"),
        max(col("__v")).as("__hi"), min(col("__v")).as("__lo"),
        count(lit(1)).as("n_trades"),
        sum(round(col("__v") * 1e6, 0).cast("long")).as("__vs"))
    val w = Window.partitionBy().orderBy(col("day"))
    per
      .withColumn("__close", col("__c").getField("__v"))
      .withColumn("__prev", lag(col("__close"), 1).over(w))
      .select(col("day"),
        round(col("__o").getField("__v"), 6).as("open"),
        round(col("__hi"), 6).as("high"),
        round(col("__lo"), 6).as("low"),
        round(col("__close"), 6).as("close"),
        col("n_trades"),
        round(col("__vs").cast("double") / 1e6 /
          col("n_trades").cast("double"), 6).as("vwap"),
        round(when(col("__prev") > 0,
          col("__close") / col("__prev") - 1.0), 6).as("day_return"))
      .orderBy("day")
  }

  /** TOPSIS multi-criteria ranking over a bounded criteria set: each
    * entity's closeness to the ideal point (best value per criterion)
    * vs the anti-ideal — the classic MCDM answer to "rank suppliers by
    * revenue AND volume AND price discipline at once" that a
    * single-metric ORDER BY can't give. Criteria are declared with a
    * direction (benefit = higher better); equal weights (the declared
    * baseline — a weighted variant is a literal change).
    *
    * Determinism: each criterion commits to an integer lattice at the
    * entity grain BEFORE the vector normalization, so Σx² folds
    * exactly in decimal(38,0); the normalized values, ideal points
    * (exact max/min of identical doubles), distances, and closeness
    * are one fixed double tree each; the final rank orders by the
    * ROUNDED closeness with the entity id tiebreak (the basket-rules
    * rounded-ordering convention).
    *
    * Plan: one entity-grain aggregation, one 1-row Σx²/ideal
    * broadcast, one entity-grain rank window (the giniConcentration
    * global-sort class). Criteria count is bounded by declaration.
    */
  def topsis(df: DataFrame, entityCol: String,
             criteria: Seq[(String, Boolean)]): DataFrame = {
    require(criteria.size >= 2 && criteria.size <= 8 &&
      criteria.map(_._1).distinct.size == criteria.size,
      s"topsis: 2..8 distinct criteria (got $criteria)")
    val k = criteria.size
    // entity frame must carry one integer-lattice value per criterion
    val folded = criteria.zipWithIndex.foldLeft(df) { case (d, ((c, _), i)) =>
      d.withColumn(s"__x$i", col(c)) }
    def dec(c: Column) = c.cast("decimal(38,0)")
    val sumAggs = criteria.indices.map(i =>
      sum(dec(col(s"__x$i")) * col(s"__x$i")).as(s"__s$i"))
    val norms = folded.agg(sumAggs.head, sumAggs.tail: _*)
    val rCols = criteria.indices.map(i =>
      (col(s"__x$i").cast("double") /
        sqrt(col(s"__s$i").cast("double"))).as(s"__r$i"))
    val normed = folded.crossJoin(broadcast(norms))
      .select(col(entityCol) +: rCols: _*)
      .localCheckpoint(eager = false)
    val idealAggs = criteria.zipWithIndex.map { case ((_, benefit), i) =>
      (if (benefit) max(col(s"__r$i")) else min(col(s"__r$i")))
        .as(s"__p$i")
    } ++ criteria.zipWithIndex.map { case ((_, benefit), i) =>
      (if (benefit) min(col(s"__r$i")) else max(col(s"__r$i")))
        .as(s"__q$i")
    }
    val ideals = normed.agg(idealAggs.head, idealAggs.tail: _*)
    val withI = normed.crossJoin(broadcast(ideals))
    def dist(pfx: String) = sqrt(criteria.indices.map(i =>
      (col(s"__r$i") - col(s"__$pfx$i")) *
        (col(s"__r$i") - col(s"__$pfx$i"))).reduce(_ + _))
    val dPlus = dist("p")
    val dMinus = dist("q")
    val close = when(dPlus + dMinus > 0, dMinus / (dPlus + dMinus))
      .otherwise(lit(0.0))
    val scored = withI.select(
      (col(entityCol) +: criteria.indices.map(i =>
        round(col(s"__r$i"), 6).as(s"norm_${criteria(i)._1}"))) :+
      round(close, 6).as("closeness"): _*)
    scored.withColumn("rank", row_number().over(
        Window.orderBy(col("closeness").desc, col(entityCol))).cast("long"))
      .orderBy("rank")
  }

  /** 2-D skyline (Pareto frontier): the entities NOT dominated on a
    * (minimize, maximize) metric pair — "which parts are on the
    * price-vs-size efficiency frontier?" — the multi-objective query
    * SQL engines have no operator for. A point is dominated iff some
    * other point is no worse on both axes and strictly better on one;
    * duplicate (x, y) points are mutually non-dominating and all kept.
    *
    * Determinism: the minimize axis commits to the centi lattice, so
    * the strictly-smaller-x running max is an exact RANGE-frame window
    * on integers; dominance tests compare exact longs/doubles — no
    * tolerance anywhere.
    *
    * Plan: one entity-grain projection, one RANGE window ordered by
    * the lattice x over the ENTITY-grain frame (the giniConcentration
    * global-sort class — at billions of entities pre-prune with a
    * coarse grid, keeping per-cell minima, before the exact pass), one
    * same-x partition max. Output is the frontier only.
    */
  def skyline2D(df: DataFrame, idCol: String, minimizeCol: String,
                maximizeCol: String): DataFrame = {
    val base = df.select(col(idCol),
        round(col(minimizeCol) * 100, 0).cast("long").as("__x"),
        col(maximizeCol).cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val wStrict = Window.orderBy(col("__x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSameX = Window.partitionBy(col("__x"))
    val flagged = base
      .withColumn("__prevMax", max(col("__y")).over(wStrict))
      .withColumn("__sameMax", max(col("__y")).over(wSameX))
      .withColumn("__dominated",
        (col("__prevMax").isNotNull && col("__prevMax") >= col("__y")) ||
          col("__sameMax") > col("__y"))
    flagged.filter(!col("__dominated"))
      .select(col(idCol),
        round(col("__x").cast("double") / 100.0, 2).as(minimizeCol),
        round(col("__y"), 6).as(maximizeCol))
      .orderBy(col(minimizeCol), col(idCol))
  }

  /** Laspeyres / Paasche / Fisher price indexes between a declared BASE
    * and CURRENT period over a (item, quantity, extended-value) fact
    * table: "how much did like-for-like prices move, holding the basket
    * at base (Laspeyres) or current (Paasche) quantities?" — with
    * Fisher's geometric compromise. Only items traded in BOTH periods
    * enter (the matched-basket convention, reported as n_items).
    *
    * Determinism: per-(item, period) quantity and value sums ride the
    * centi lattice (exact longs); each item's p·q cross term commits to
    * the 1e-6-scaled integer lattice BEFORE the basket fold, so all
    * four basket sums are exact long addition and the three indexes are
    * one fixed double tree each (the lattice scales cancel in every
    * ratio).
    *
    * Plan: one (item)-grain CASE-folded aggregation (corpus-sized,
    * map-side combined) + one fold of the item frame to a single row.
    */
  def priceIndex(df: DataFrame, itemCol: String, qtyCol: String,
                 extCol: String, isBase: Column,
                 isCurrent: Column): DataFrame = {
    val base = df.select(col(itemCol).as("__i"),
        round(col(qtyCol) * 100, 0).cast("long").as("__q"),
        round(col(extCol) * 100, 0).cast("long").as("__e"),
        isBase.as("__b"), isCurrent.as("__c"))
      .filter(col("__b") || col("__c"))
    val per = base.groupBy(col("__i")).agg(
      sum(when(col("__b"), col("__q")).otherwise(0L)).as("__q0"),
      sum(when(col("__b"), col("__e")).otherwise(0L)).as("__e0"),
      sum(when(col("__c"), col("__q")).otherwise(0L)).as("__q1"),
      sum(when(col("__c"), col("__e")).otherwise(0L)).as("__e1"))
      .filter(col("__q0") > 0 && col("__q1") > 0)
    def p(e: String, q: String) =
      col(e).cast("double") / col(q).cast("double")
    def term(e: String, q: String, qw: String) =
      round(p(e, q) * col(qw).cast("double") * 1e6, 0).cast("long")
    val f = per.agg(count(lit(1)).as("n_items"),
      sum(term("__e1", "__q1", "__q0")).as("__l1"),
      sum(term("__e0", "__q0", "__q0")).as("__l0"),
      sum(term("__e1", "__q1", "__q1")).as("__p1"),
      sum(term("__e0", "__q0", "__q1")).as("__p0"))
    val lasp = col("__l1").cast("double") / col("__l0").cast("double")
    val paas = col("__p1").cast("double") / col("__p0").cast("double")
    val ok = col("n_items") >= 1 && col("__l0") > 0 && col("__p0") > 0
    f.select(col("n_items"),
      round(when(ok, lasp), 6).as("laspeyres"),
      round(when(ok, paas), 6).as("paasche"),
      round(when(ok, sqrt(lasp * paas)), 6).as("fisher"))
  }
}
