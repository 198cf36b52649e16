package graft

import org.apache.spark.sql.functions._

/** The sketch variants (the 100 TB path) stay within their documented
  * error bounds against the exact operators on real data.
  */
class SketchSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, "/root/testdata/sf0.01")

  test("approx_count_distinct (HLL) within 5% of exact") {
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("percentile_approx within 1% relative error of exact percentile") {
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.95D)").as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
        .as("approx")).head()
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.01,
      s"exact=$exact approx=$approx")
  }

  test("sketch store: daily HLL sketches union to the same estimate as a " +
      "direct sketch of the union, and rollups stay within tolerance") {
    import graft.ops.Sketches
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val store = Sketches.dailySketchStore(ev, "ts", "user_id")
    // store is bounded: one row per day, sketch column is binary
    assert(store.schema("key_sketch").dataType ==
      org.apache.spark.sql.types.BinaryType)

    // merged estimate over ALL days == sketching the raw column directly
    // (union of partials must lose nothing vs the single-pass sketch)
    val merged = store
      .agg(hll_sketch_estimate(hll_union_agg(col("key_sketch"), lit(true))))
      .head().getLong(0)
    val direct = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))))
      .head().getLong(0)
    assert(merged == direct, s"union-of-daily=$merged direct=$direct")

    // weekly rollup: every tolerance boolean true, exact side sane
    val checked = Sketches.weeklyDistinctChecked(ev, "ts", "user_id").collect()
    assert(checked.length >= 2)
    assert(checked.forall(_.getAs[Boolean]("approx_ok")))
    assert(checked.forall(_.getAs[Long]("exact_distinct") > 0))

    // determinism under re-partitioning (merge order must not matter)
    val merged2 = Sketches.dailySketchStore(ev.repartition(17), "ts", "user_id")
      .agg(hll_sketch_estimate(hll_union_agg(col("key_sketch"), lit(true))))
      .head().getLong(0)
    assert(merged2 == merged)
  }

  test("histogram store: weekly quantiles from merged daily bins are " +
      "within one bin width of exact, and merging is associative") {
    import graft.ops.Sketches
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val store = Sketches.dailyHistogramStore(ev, "ts", "value", 0.0, 600.0, 600)
    val weekly = Sketches.rollupQuantiles(store, date_trunc("week", _),
      0.0, 600.0, 600, Seq(0.5, 0.95)).collect()
    // reference: the DISCRETE quantile (ceil(p·n)-th order statistic) —
    // the definition the histogram targets; interpolated percentile can
    // additionally differ by the gap between adjacent order statistics
    import org.apache.spark.sql.expressions.Window
    val bucketed = ev.withColumn("bucket",
      date_trunc("week", to_date(col("ts"))).cast("date"))
    val rn = row_number().over(
      Window.partitionBy("bucket").orderBy("value"))
    val n = count(lit(1)).over(Window.partitionBy("bucket"))
    val ranked = bucketed.withColumn("rn", rn).withColumn("n", n)
    def disc(p: Double) = ranked
      .filter(col("rn") === ceil(col("n") * p))
      .select(col("bucket"), col("value"))
      .collect().map(r =>
        r.getAs[java.sql.Date]("bucket") -> r.getAs[Double]("value")).toMap
    val (d50, d95) = (disc(0.5), disc(0.95))
    assert(weekly.nonEmpty)
    weekly.foreach { r =>
      val b = r.getAs[java.sql.Date]("bucket")
      assert(math.abs(r.getAs[Double]("p50") - d50(b)) <= 1.0,
        s"p50 ${r.getAs[Double]("p50")} vs discrete ${d50(b)}")
      assert(math.abs(r.getAs[Double]("p95") - d95(b)) <= 1.0,
        s"p95 ${r.getAs[Double]("p95")} vs discrete ${d95(b)}")
    }
    // associativity: quantiles from the DAILY store rolled to one global
    // bucket == quantiles from a single direct histogram of everything
    val viaDaily = Sketches.rollupQuantiles(store,
      _ => lit("1970-01-01").cast("date"), 0.0, 600.0, 600, Seq(0.5))
      .collect().head.getAs[Double]("p50")
    val direct = Sketches.rollupQuantiles(
      Sketches.dailyHistogramStore(
        ev.withColumn("ts", lit("1970-01-01 00:00:00").cast("timestamp_ntz")),
        "ts", "value", 0.0, 600.0, 600),
      d => d, 0.0, 600.0, 600, Seq(0.5)).collect().head.getAs[Double]("p50")
    assert(viaDaily == direct, s"daily-merged=$viaDaily direct=$direct")
  }

  test("rankNormalize tracks exact percent_rank within the heaviest bin's " +
      "mass share, without a global sort in the row-transform path") {
    import graft.ops.Sketches
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select("event_id", "value")
    val out = Sketches.rankNormalize(ev, "value", 0.0, 600.0, 600)
    val exact = ev.withColumn("pr",
      percent_rank().over(Window.partitionBy().orderBy("value")))
    val joined = out.join(exact.select("event_id", "pr"), "event_id")
      .select(abs(col("rank_est") - col("pr")).as("err"))
      .agg(max(col("err"))).head().getDouble(0)
    // heaviest 1.0-wide bin holds well under 2% of 10 K values
    assert(joined < 0.02, s"max |rank_est - percent_rank| = $joined")
    // every estimate lands in [0, 1]
    val bounds = out.agg(min(col("rank_est")), max(col("rank_est"))).head()
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
  }

  test("grouped histogram store: per-(week, type) quantiles track the " +
      "discrete quantile of that slice within one bin") {
    import graft.ops.Sketches
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val out = Sketches.rollupGroupedQuantiles(
      Sketches.dailyGroupedHistogramStore(ev, "ts", "event_type", "value",
        0.0, 600.0, 600),
      date_trunc("week", _), 0.0, 600.0, 600, Seq(0.5)).collect()
    assert(out.length == 25) // 5 weeks x 5 event types
    // check one slice against its discrete p50
    val slice = ev
      .filter(col("event_type") === "purchase" &&
        date_trunc("week", to_date(col("ts"))).cast("date") ===
          lit("2024-01-08").cast("date"))
    val ranked = slice
      .withColumn("rn", row_number().over(Window.orderBy("value")))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(lit(1))))
    val disc = ranked.filter(col("rn") === ceil(col("n") * 0.5))
      .select("value").head().getDouble(0)
    val got = out.find(r =>
      r.getAs[java.sql.Date]("bucket").toString == "2024-01-08" &&
        r.getAs[String]("grp") == "purchase").get.getAs[Double]("p50")
    assert(math.abs(got - disc) <= 1.0, s"got=$got disc=$disc")
  }

  test("sketch-store retention: inclusion-exclusion overlap of stored " +
      "weekly sketches matches the exact intersection") {
    import graft.ops.Sketches
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    val rows = Sketches.weeklyRetentionChecked(ev, "ts", "user_id").collect()
    assert(rows.length >= 2)
    assert(rows.forall(_.getAs[Boolean]("retained_ok")))
    // independent exact check for one pair: users seen in both week 1 & 2
    val wk = ev.select(
      date_trunc("week", to_date(col("ts"))).cast("date").as("w"),
      col("user_id").as("u")).distinct()
    val w1 = wk.filter(col("w") === lit("2024-01-01").cast("date"))
      .select("u").collect().map(_.getLong(0)).toSet
    val w2 = wk.filter(col("w") === lit("2024-01-08").cast("date"))
      .select("u").collect().map(_.getLong(0)).toSet
    val first = rows.find(_.getAs[java.sql.Date]("week_a").toString ==
      "2024-01-01").get
    assert(first.getAs[Long]("exact_retained") == (w1 & w2).size.toLong)
  }

  test("psiFromStore: identical-to-reference day scores ~0, a shifted day " +
      "scores clearly higher, all PSI non-negative") {
    import graft.ops.Sketches
    import spark.implicits._
    // hand-built store: ref day d1 uniform over bins 0..9; d2 identical;
    // d3 shifted mass onto bins 10..19
    def day(s: String) = java.sql.Date.valueOf(s)
    val store = (
      (0 until 10).map(b => (day("2024-01-01"), b, 100L)) ++
      (0 until 10).map(b => (day("2024-01-02"), b, 100L)) ++
      (10 until 20).map(b => (day("2024-01-03"), b, 100L))
    ).toDF("day", "bin", "cnt")
    val psi = Sketches.psiFromStore(store, "2024-01-01", "2024-01-01", 20)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Double]("psi")).toMap
    assert(psi.values.forall(_ >= 0.0))
    assert(psi("2024-01-02") == psi("2024-01-01")) // identical histograms
    assert(psi("2024-01-02") < 0.01)
    assert(psi("2024-01-03") > 1.0,                // full mass displacement
      s"shifted-day PSI ${psi("2024-01-03")}")
    intercept[IllegalArgumentException] {
      Sketches.psiFromStore(store, "2030-01-01", "2030-01-02", 20)
    }
  }

  test("histogramConfig: Freedman-Diaconis width on a known set; " +
      "degenerate (constant) data falls back to 2 bins") {
    import graft.ops.Sketches
    import spark.implicits._
    // 0..999: IQR = 749.5 - 249.5 = 499.5? (type-7 interp) — just assert
    // the structural relations instead of brittle constants
    val df = (0 until 1000).map(_.toDouble).toDF("v")
    val r = Sketches.histogramConfig(df, "v").head()
    val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
    assert(lo == 0.0 && hi == 999.0)
    val fd = r.getAs[Double]("fd_width")
    assert(math.abs(fd - 2.0 * r.getAs[Double]("iqr") /
      math.cbrt(1000.0)) < 1e-6)
    assert(r.getAs[Long]("n_bins") ==
      math.ceil((hi - lo) / (2.0 * r.getAs[Double]("iqr") /
        math.cbrt(1000.0))).toLong)
    // constant column: zero IQR -> the 2-bin fallback, no div-by-zero
    val const = Seq.fill(50)(7.0).toDF("v")
    assert(Sketches.histogramConfig(const, "v").head()
      .getAs[Long]("n_bins") == 2L)
  }
}
