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
}
