package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The mergeable-sketch store: pre-aggregate per-day Apache DataSketches
  * HLL sketches of a key column, persist them as a tiny binary-column
  * table, and answer arbitrary later rollups (weekly / monthly / lifetime
  * distinct counts) by UNIONING stored sketches — never re-reading the raw
  * corpus.
  *
  * This is the canonical 100 TB distinct-count architecture: the raw table
  * is scanned ONCE (one shuffled aggregation on the day key, map-side
  * combined — HLL register updates fold in the partial aggregate), and the
  * store is O(days × sketch_size) ≈ KB/day at lgK=14. Every rollup after
  * that is a fold over the bounded store. `approx_count_distinct` (HLL++)
  * cannot do this — its sketch never leaves the aggregation; the
  * DataSketches functions (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`, Spark 3.5+) exist precisely to externalize it.
  *
  * Determinism: HLL register updates are pure hashes and merges are
  * element-wise maxes — commutative and associative — so estimates are
  * identical for any partitioning/ordering of fixed data, which is what
  * lets the checked registry query emit a stable tolerance boolean.
  *
  * Reference anchor: `spark/apps/clickstream_aggregation.py:97-105` counts
  * distinct users per window from raw events every run; the sketch store
  * replaces that re-scan for all coarser grains.
  */
object Sketches {

  /** Build the daily sketch store: one row per day with the serialized HLL
    * sketch of `keyCol`. lgK=14 ⇒ ~10 KB/sketch, relative std error
    * 1.04/√2¹⁴ ≈ 0.81%.
    */
  def dailySketchStore(df: DataFrame, tsCol: String, keyCol: String,
                       lgK: Int = 14): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"dailySketchStore: 4 <= lgK <= 21 (got $lgK)")
    df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("key_sketch"))
  }

  /** Roll the store up to a coarser grain by sketch union: distinct-count
    * estimate per bucket. `grain(day)` maps the day to its bucket (e.g.
    * `date_trunc("week", _)`); the union runs over the bounded store, not
    * the raw table.
    */
  def rollupDistinct(store: DataFrame, grain: Column => Column): DataFrame =
    store
      .groupBy(grain(col("day")).cast("date").as("bucket"))
      .agg(hll_sketch_estimate(hll_union_agg(col("key_sketch"), lit(true)))
        .as("approx_distinct"))
      .orderBy("bucket")

  /** The checked form: weekly rollup from the daily store next to the
    * exact weekly distinct from raw data, emitting a tolerance boolean
    * (estimate within max(5, 3% ≈ 3.7σ at lgK=14) of exact). The boolean
    * is deterministically TRUE for fixed data (see object scaladoc), so a
    * SQL oracle replays the exact side and literal TRUE. This is the CHECK
    * query — the serving shape at scale is [[dailySketchStore]] +
    * [[rollupDistinct]] alone, which never touch the raw table twice.
    */
  def weeklyDistinctChecked(df: DataFrame, tsCol: String,
                            keyCol: String): DataFrame = {
    val approx = rollupDistinct(
      dailySketchStore(df, tsCol, keyCol), date_trunc("week", _))
    val exact = df
      .groupBy(date_trunc("week", to_date(col(tsCol))).cast("date").as("bucket"))
      .agg(countDistinct(col(keyCol)).as("exact_distinct"))
    exact.join(approx, "bucket")
      .select(col("bucket"), col("exact_distinct"),
        (abs(col("approx_distinct") - col("exact_distinct")) <=
          greatest(lit(5.0), col("exact_distinct") * 0.03)).as("approx_ok"))
      .orderBy("bucket")
  }

  /** The percentile twin of the sketch store: per-day EQUI-WIDTH HISTOGRAMS
    * over a declared [lo, hi) range. Bin counts are exact integers and sum
    * under any regrouping, so the store is perfectly mergeable — and unlike
    * an HLL/t-digest sketch the whole pipeline is deterministic integer
    * arithmetic, replayable bit-for-bit by a SQL oracle. Quantiles read
    * from the merged histogram land within one bin width ((hi−lo)/nBins)
    * of the DISCRETE quantile — the ceil(p·n)-th order statistic; an
    * interpolated-percentile consumer additionally sees the local gap
    * between adjacent order statistics, which no histogram can shrink.
    * Size nBins to the precision the consumer needs, not to the data
    * volume — the store stays O(days × nBins) forever. Out-of-range
    * values clamp into the edge bins (so totals are preserved and the
    * declared range is an accuracy knob, not a filter).
    */
  def dailyHistogramStore(df: DataFrame, tsCol: String, valCol: String,
                          lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo,
      s"dailyHistogramStore: need nBins >= 2 and hi > lo (got $nBins, [$lo,$hi))")
    val width = (hi - lo) / nBins
    val bin = least(lit(nBins - 1),
      greatest(lit(0), floor((col(valCol) - lo) / width).cast("int")))
    df.filter(col(valCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"), bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile readout at an arbitrary grain from the merged histogram:
    * for each requested p, the standard grouped-histogram interpolation
    * `lo + (bin + (target − cum_before)/cnt) · width` where `target =
    * p · total`. Runs entirely over the bounded store (merge = one sum
    * per (bucket, bin); the cumulative window spans ≤ nBins rows per
    * bucket) — the raw table is never re-read.
    */
  def rollupQuantiles(store: DataFrame, grain: Column => Column,
                      lo: Double, hi: Double, nBins: Int,
                      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"rollupQuantiles: percentiles in (0, 1], got ${ps.mkString(",")}")
    val width = (hi - lo) / nBins
    val merged = store
      .groupBy(grain(col("day")).cast("date").as("bucket"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("bin"))
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(whole))
    val qs = ps.map { p =>
      // FIRST bin whose cumulative count reaches ceil(p·total) wins —
      // elected as min(struct(bin, est)) so the bin index, not the
      // estimate value, decides (a later bin's negative within-bin
      // fraction could otherwise undercut the true first candidate)
      val target = ceil(col("total") * p)
      val est = lit(lo) + (col("bin") +
        (target - (col("cum") - col("cnt"))) / col("cnt")) * width
      round(min(when(col("cum") >= target,
        struct(col("bin"), est.as("est")))).getField("est")
        .cast("double"), 6).as(s"p${(p * 100).round}")
    }
    cum.groupBy(col("bucket"))
      .agg(qs.head, qs.tail: _*)
      .orderBy("bucket")
  }

  /** [[dailyHistogramStore]] with a grouping dimension: one histogram per
    * (day, group) — the per-feature / per-segment store a monitoring
    * stack actually keeps (every feature's quantiles, not one global
    * distribution). Store size O(days × groups × nBins); the group column
    * must be bounded-cardinality (a feature name / segment, not an id).
    */
  def dailyGroupedHistogramStore(df: DataFrame, tsCol: String,
                                 groupCol: String, valCol: String,
                                 lo: Double, hi: Double,
                                 nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo,
      s"dailyGroupedHistogramStore: need nBins >= 2 and hi > lo " +
        s"(got $nBins, [$lo,$hi))")
    val width = (hi - lo) / nBins
    val bin = least(lit(nBins - 1),
      greatest(lit(0), floor((col(valCol) - lo) / width).cast("int")))
    df.filter(col(valCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"), col(groupCol).as("grp"),
        bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile readout per (bucket, group) from the grouped store — same
    * first-candidate-bin election as [[rollupQuantiles]], windows
    * partitioned by (bucket, group) so every frame stays ≤ nBins rows.
    */
  def rollupGroupedQuantiles(store: DataFrame, grain: Column => Column,
                             lo: Double, hi: Double, nBins: Int,
                             ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"rollupGroupedQuantiles: percentiles in (0, 1], got ${ps.mkString(",")}")
    val width = (hi - lo) / nBins
    val merged = store
      .groupBy(grain(col("day")).cast("date").as("bucket"), col("grp"),
        col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
    val w = Window.partitionBy(col("bucket"), col("grp")).orderBy(col("bin"))
    val whole = Window.partitionBy(col("bucket"), col("grp"))
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(whole))
    val qs = ps.map { p =>
      val target = ceil(col("total") * p)
      val est = lit(lo) + (col("bin") +
        (target - (col("cum") - col("cnt"))) / col("cnt")) * width
      round(min(when(col("cum") >= target,
        struct(col("bin"), est.as("est")))).getField("est")
        .cast("double"), 6).as(s"p${(p * 100).round}")
    }
    cum.groupBy(col("bucket"), col("grp"))
      .agg(qs.head, qs.tail: _*)
      .orderBy("bucket", "grp")
  }

  /** Freedman–Diaconis sizing for [[dailyHistogramStore]]: recommend
    * (lo, hi, nBins) from the data — bin width 2·IQR/∛n, clamped to
    * [2, maxBins] — in ONE exact-percentile aggregation. Closes the
    * histogram-store loop: run this once on a bounded sample or the first
    * day, then declare the returned range for the store (the declared
    * range is the accuracy contract; this op is how you pick it instead
    * of guessing).
    */
  def histogramConfig(df: DataFrame, valCol: String,
                      maxBins: Int = 10000): DataFrame = {
    require(maxBins >= 2, s"histogramConfig: maxBins >= 2 (got $maxBins)")
    val s = df.filter(col(valCol).isNotNull).agg(
      count(col(valCol)).as("n"),
      min(col(valCol)).cast("double").as("lo"),
      max(col(valCol)).cast("double").as("hi"),
      expr(s"percentile($valCol, array(0.25D, 0.75D))").as("q"))
    val iqr = col("q")(1) - col("q")(0)
    val fd = lit(2.0) * iqr / cbrt(col("n"))
    s.select(
      col("n").as("n_values"),
      round(col("lo"), 6).as("lo"),
      round(col("hi"), 6).as("hi"),
      round(iqr, 6).as("iqr"),
      round(fd, 6).as("fd_width"),
      when(iqr > 0 && col("hi") > col("lo"),
        least(lit(maxBins.toLong),
          greatest(lit(2L), ceil((col("hi") - col("lo")) / fd))))
        .otherwise(lit(2L)).cast("long").as("n_bins"))
  }

  /** Drift monitoring FROM THE HISTOGRAM STORE: daily PSI against a
    * reference period's bin distribution, computed entirely over the
    * bounded (day, bin, cnt) store — the monitoring loop never re-reads
    * raw events. Laplace-smoothed shares ((cnt+1)/(total+nBins)) keep
    * empty bins finite exactly like the raw-data PSI operator
    * (`ops/Drift.psiDrift`); PSI = Σ (p−q)·ln(p/q) per day. Days INSIDE
    * the reference window monitor against their own pooled baseline —
    * reported, conventionally small, and a sanity check that the fold is
    * consistent.
    */
  def psiFromStore(store: DataFrame, refFrom: String, refTo: String,
                   nBins: Int): DataFrame = {
    val ref = store
      .filter(col("day") >= lit(refFrom).cast("date") &&
        col("day") <= lit(refTo).cast("date"))
      .groupBy(col("bin")).agg(sum(col("cnt")).as("ref_cnt"))
    val refTotRow = ref.agg(sum(col("ref_cnt"))).head()
    val refTot = if (refTotRow.isNullAt(0)) 0L else refTotRow.getLong(0)
    require(refTot > 0, s"psiFromStore: empty reference [$refFrom, $refTo]")
    val dayTotals = store.groupBy(col("day"))
      .agg(sum(col("cnt")).as("day_total"))
    // densify to the FULL day × bin grid (bounded: days · nBins rows) —
    // a day MISSING a heavy reference bin is precisely the drift signal,
    // so absent bins must enter the fold with cnt 0, not be skipped
    val grid = store.select(col("day")).distinct()
      .select(col("day"),
        explode(sequence(lit(0), lit(nBins - 1))).as("bin"))
    val q = (coalesce(col("ref_cnt"), lit(0L)) + 1.0) / (refTot + nBins)
    val p = (coalesce(col("cnt"), lit(0L)) + 1.0) /
      (col("day_total") + nBins)
    grid
      .join(store, Seq("day", "bin"), "left")
      .join(broadcast(ref), Seq("bin"), "left")
      .join(broadcast(dayTotals), "day")
      .groupBy(col("day"))
      .agg(round(sum((p - q) * log(p / q)), 6).as("psi"))
      .orderBy("day")
  }

  /** Week-over-week retention FROM THE SKETCH STORE: |A ∩ B| via
    * inclusion–exclusion — est(A) + est(B) − est(A ∪ B) — where A/B are
    * consecutive weeks' sketch unions and ∪ is the scalar `hll_union`.
    * This is the payoff of storing sketches rather than counts: set
    * OVERLAP between any two stored periods without re-reading raw data
    * (plain distinct counts cannot intersect). The checked form emits the
    * exact intersection (a distinct self-join, the one raw-data pass —
    * check-side only) plus a tolerance boolean: at these cardinalities the
    * lgK=14 sketch sits in its exact (coupon-list) range, so the boolean
    * is deterministically TRUE; at true 100 TB cardinalities
    * inclusion–exclusion compounds ~3 register errors — size the bound
    * accordingly.
    */
  def weeklyRetentionChecked(df: DataFrame, tsCol: String,
                             keyCol: String): DataFrame = {
    val weekly = dailySketchStore(df, tsCol, keyCol)
      .groupBy(date_trunc("week", col("day")).cast("date").as("week"))
      .agg(hll_union_agg(col("key_sketch"), lit(true)).as("wsk"))
    val est = weekly.as("a")
      .join(weekly.as("b"), col("b.week") === date_add(col("a.week"), 7))
      .select(col("a.week").as("week_a"), col("b.week").as("week_b"),
        (hll_sketch_estimate(col("a.wsk")) +
          hll_sketch_estimate(col("b.wsk")) -
          hll_sketch_estimate(hll_union(col("a.wsk"), col("b.wsk"),
            allowDifferentLgConfigK = true)))
          .as("est_retained"))
    val wk = df.select(
      date_trunc("week", to_date(col(tsCol))).cast("date").as("week"),
      col(keyCol).as("k")).distinct()
    val exact = wk.as("a")
      .join(wk.as("b"), col("a.k") === col("b.k") &&
        col("b.week") === date_add(col("a.week"), 7))
      .groupBy(col("a.week").as("week_a"))
      .agg(count(lit(1)).as("exact_retained"))
    exact.join(est, "week_a")
      .select(col("week_a"), col("week_b"), col("exact_retained"),
        (abs(col("est_retained") - col("exact_retained")) <=
          greatest(lit(10.0), col("exact_retained") * 0.05))
          .as("retained_ok"))
      .orderBy("week_a")
  }

  /** Percentile-rank normalization WITHOUT a global sort: estimate each
    * row's rank from the (bounded, broadcastable) global histogram —
    * `rank ≈ (cum_before + within-bin value fraction · cnt) / total` —
    * instead of `percent_rank()`, whose empty-partition window funnels
    * the whole column through one task. Error is bounded by the heaviest
    * bin's mass share (uniform-within-bin assumption); at 100 TB the
    * histogram aggregate is the only shuffle and the join is a broadcast
    * of ≤ nBins rows. Output appends `rank_est` ∈ [0, 1].
    */
  def rankNormalize(df: DataFrame, valCol: String,
                    lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo,
      s"rankNormalize: need nBins >= 2 and hi > lo (got $nBins, [$lo,$hi))")
    val width = (hi - lo) / nBins
    val bin = least(lit(nBins - 1),
      greatest(lit(0), floor((col(valCol) - lo) / width).cast("int")))
    val hist = df.filter(col(valCol).isNotNull)
      .groupBy(bin.as("__bin")).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy().orderBy(col("__bin"))
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__total",
        sum(col("__cnt")).over(Window.partitionBy()))
    val frac = least(lit(1.0), greatest(lit(0.0),
      (col(valCol) - (lit(lo) + col("__bin") * width)) / width))
    df.withColumn("__bin", bin)
      .join(broadcast(cum), Seq("__bin"), "left")
      // scale-0 rounding of the 1e6-scaled estimate: the raw rank is a
      // rational over 100·total, so round(x, 6) sits on EXACT 7th-digit-5
      // boundaries for ~1/10 of rows and splits engines (sf0.1 caught 99
      // of 100 K rows); the pre-scaled half-integer is exactly
      // representable and rounds identically everywhere
      .withColumn("rank_est",
        round((((col("__cum") - col("__cnt")) + frac * col("__cnt")) /
          col("__total")) * 1e6, 0) / 1e6)
      .drop("__bin", "__cnt", "__cum", "__total")
  }
}
