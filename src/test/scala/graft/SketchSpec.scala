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
}
