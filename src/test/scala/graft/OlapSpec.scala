package graft

import graft.ops.Olap
import org.apache.spark.sql.functions._

/** ROLLUP/CUBE subtotal-lattice semantics and declared-values PIVOT. */
class OlapSpec extends SparkSpec {
  import spark.implicits._

  private val sales = Seq(
    ("east", "a", 10.0),
    ("east", "b", 20.0),
    ("west", "a", 5.0),
    ("west", "a", 1.0)
  ).toDF("region", "sku", "amt")

  test("rollupAgg: leaf, per-prefix, and grand-total levels from one pass") {
    val out = Olap.rollupAgg(sales, Seq("region", "sku"),
        Seq("total" -> sum($"amt"), "n" -> count(lit(1))))
      .as[(String, String, Long, Double, Long)].collect().toList
    assert(out == List(
      ("east", "a", 0L, 10.0, 1L),
      ("east", "b", 0L, 20.0, 1L),
      ("west", "a", 0L, 6.0, 2L),
      ("east", "(all)", 1L, 30.0, 2L),
      ("west", "(all)", 1L, 6.0, 2L),
      ("(all)", "(all)", 3L, 36.0, 4L)))
  }

  test("cubeAgg adds the per-sku slice rollup lacks") {
    val out = Olap.cubeAgg(sales, Seq("region", "sku"),
        Seq("total" -> sum($"amt")))
      .as[(String, String, Long, Double)].collect().toList
    val gidOf = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(gidOf == Map(0L -> 3, 1L -> 2, 2L -> 2, 3L -> 1))
    // the gid=2 rows are the per-sku marginals (region rolled up)
    assert(out.filter(_._3 == 2L).map(r => (r._1, r._2, r._4)).toSet ==
      Set(("(all)", "a", 16.0), ("(all)", "b", 20.0)))
  }

  test("grouping_id separates a genuine NULL key from a subtotal") {
    val withNull = Seq((Option.empty[String], 7.0), (Some("x"), 1.0))
      .toDF("k", "amt")
    val out = Olap.rollupAgg(withNull, Seq("k"), Seq("total" -> sum($"amt")))
      .as[(String, Long, Double)].collect().toList
    // NULL leaf coalesces to the sentinel but keeps gid=0; the rollup
    // total is the gid=1 row — same label, disjoint gid
    assert(out == List(
      ("(all)", 0L, 7.0), ("x", 0L, 1.0), ("(all)", 1L, 8.0)))
  }

  test("pivotCounts: declared values, zero-filled cells, unknowns dropped") {
    val ev = Seq(("d1", "view"), ("d1", "view"), ("d1", "click"),
        ("d2", "purchase"), ("d2", "mystery"))
      .toDF("day", "event_type")
    val out = Olap.pivotCounts(ev, $"day", "day", "event_type",
        Seq("view", "click", "purchase"))
      .as[(String, Long, Long, Long)].collect().toList
    assert(out == List(("d1", 2L, 1L, 0L), ("d2", 0L, 0L, 1L)))
  }

  test("pivotCounts rejects undeclared, duplicate, or unsafe value lists") {
    val ev = Seq(("d1", "view")).toDF("day", "event_type")
    intercept[IllegalArgumentException] {
      Olap.pivotCounts(ev, $"day", "day", "event_type", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Olap.pivotCounts(ev, $"day", "day", "event_type", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Olap.pivotCounts(ev, $"day", "day", "event_type", Seq("has space"))
    }
  }

  test("groupingSetsAgg: only the declared slices materialize, gid " +
      "bitmask and sentinels match rollup conventions, bad set refused") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0))
      .toDF("k1", "k2", "v")
    val out = Olap.groupingSetsAgg(df, Seq("k1", "k2"),
        Seq(Seq("k1", "k2"), Seq("k1"), Seq("k2")),
        Seq("n" -> count(lit(1)), "s" -> sum(col("v"))))
      .as[(String, String, Long, Long, Double)].collect()
    val byKey = out.map(r => (r._1, r._2) -> r).toMap
    // three leaf rows (gid 0), two k1 rows (gid 1), two k2 rows (gid 2),
    // NO grand total (gid 3 absent)
    assert(out.count(_._3 == 0) == 3 && out.count(_._3 == 1) == 2 &&
      out.count(_._3 == 2) == 2 && !out.exists(_._3 == 3))
    assert(byKey(("a", "(all)")) == (("a", "(all)", 1L, 2L, 30.0)))
    assert(byKey(("(all)", "1")) == (("(all)", "1", 2L, 2L, 40.0)))
    intercept[IllegalArgumentException] {
      Olap.groupingSetsAgg(df, Seq("k1"), Seq(Seq("nope")),
        Seq("n" -> count(lit(1))))
    }
  }

  test("tierMigration: weekly tiers follow the declared cuts, absence " +
      "becomes churned, the last week never appears on the from side, " +
      "and bad rosters fail loud") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, day).atTime(12, 0))
    // weeks start Mon 2024-01-01 / 01-08 / 01-15
    val rows = Seq(
      (1L, ts(2), 1300.0),  // u1 w1 high
      (1L, ts(9), 600.0),   // u1 w2 mid, absent w3 -> churned
      (2L, ts(3), 50.0),    // u2 w1 low
      (2L, ts(10), 30.0),   // u2 w2 low
      (2L, ts(16), 2000.0)) // u2 w3 high (to-side only)
    val df = rows.toDF("user_id", "ts", "value")
    val out = graft.ops.Olap.tierMigration(df, "user_id", "ts", "value",
      Seq(("low", 0.0), ("mid", 500.0), ("high", 1200.0)))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("week_from").toString,
        r.getAs[String]("tier_from"), r.getAs[String]("tier_to"),
        r.getAs[Long]("n_entities"), r.getAs[Double]("cohort_share")))
    assert(out.toSeq == Seq(
      ("2024-01-01", "high", "mid", 1L, 1.0),
      ("2024-01-01", "low", "low", 1L, 1.0),
      ("2024-01-08", "low", "high", 1L, 1.0),
      ("2024-01-08", "mid", "churned", 1L, 1.0)))
    intercept[IllegalArgumentException] {
      graft.ops.Olap.tierMigration(df, "user_id", "ts", "value",
        Seq(("mid", 500.0), ("low", 0.0)))
    }
    intercept[IllegalArgumentException] {
      graft.ops.Olap.tierMigration(df, "user_id", "ts", "value",
        Seq(("low", 0.0), ("churned", 500.0)))
    }
  }

  test("dailyBars: open/close elected in event order, VWAP exact, " +
      "day-over-day return from elected closes") {
    def t(d: Int, h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 6, 1 + d, h, 0, 0))
    val df = Seq(
      (t(0, 9), 1L, 10.0), (t(0, 12), 2L, 20.0), (t(0, 16), 3L, 15.0),
      (t(1, 10), 4L, 30.0)).toDF("ts", "event_id", "value")
    val r = graft.ops.Olap.dailyBars(df, "ts", "event_id", "value")
      .collect()
    val d1 = r.head
    assert(d1.getAs[Double]("open") == 10.0)
    assert(d1.getAs[Double]("high") == 20.0)
    assert(d1.getAs[Double]("low") == 10.0)
    assert(d1.getAs[Double]("close") == 15.0)
    assert(d1.getAs[Long]("n_trades") == 3L)
    assert(d1.getAs[Double]("vwap") == 15.0)
    assert(d1.isNullAt(d1.fieldIndex("day_return")))
    val d2 = r(1)
    assert(d2.getAs[Double]("open") == 30.0 &&
      d2.getAs[Double]("close") == 30.0)
    assert(d2.getAs[Double]("day_return") == 1.0) // 30/15 - 1
  }

  test("skyline2D: dominated points drop, weak dominance drops the " +
      "same-y-higher-x point, exact duplicates both survive") {
    val df = Seq((1L, 1.0, 5.0), (2L, 2.0, 4.0), (3L, 2.0, 7.0),
      (4L, 3.0, 7.0), (5L, 1.0, 5.0)).toDF("id", "price", "size")
    val r = graft.ops.Olap.skyline2D(df, "id", "price", "size")
      .collect()
    assert(r.map(_.getLong(0)).toSet == Set(1L, 5L, 3L))
    val p3 = r.find(_.getLong(0) == 3L).get
    assert(p3.getAs[Double]("price") == 2.0)
    assert(p3.getAs[Double]("size") == 7.0)
  }

  test("topsis: the entity matching the ideal point scores closeness 1, " +
      "the anti-ideal scores 0, cost direction respected") {
    val df = Seq((1L, 3L, 4L), (2L, 4L, 3L)).toDF("id", "a", "b")
    val r = graft.ops.Olap.topsis(df, "id",
      Seq(("a", true), ("b", false))).collect()
    val e2 = r.find(_.getLong(0) == 2L).get
    assert(e2.getAs[Double]("norm_a") == 0.8)
    assert(e2.getAs[Double]("norm_b") == 0.6)
    assert(e2.getAs[Double]("closeness") == 1.0)
    assert(e2.getAs[Long]("rank") == 1L)
    val e1 = r.find(_.getLong(0) == 1L).get
    assert(e1.getAs[Double]("closeness") == 0.0)
    assert(e1.getAs[Long]("rank") == 2L)
    intercept[IllegalArgumentException] {
      graft.ops.Olap.topsis(df, "id", Seq(("a", true)))
    }
  }

  test("priceIndex: matched two-item basket replays the closed-form " +
      "Laspeyres/Paasche/Fisher; unmatched items drop") {
    // item 1: p0=10 (q0=10,e0=100) -> p1=12 (q1=5,e1=60)
    // item 2: p0=2  (q0=4, e0=8)   -> p1=3  (q1=8,e1=24)
    // item 3: base only -> excluded from the matched basket
    val df = Seq(
      (1L, 10.0, 100.0, true, false), (1L, 5.0, 60.0, false, true),
      (2L, 4.0, 8.0, true, false), (2L, 8.0, 24.0, false, true),
      (3L, 9.0, 9.0, true, false))
      .toDF("item", "qty", "ext", "isb", "isc")
    val r = graft.ops.Olap.priceIndex(df, "item", "qty", "ext",
      col("isb"), col("isc")).collect().head
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Double]("laspeyres") == 1.222222)
    assert(r.getAs[Double]("paasche") == 1.272727)
    assert(r.getAs[Double]("fisher") == 1.247219)
  }
}
