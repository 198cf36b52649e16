package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Materialize, Skew}

/** Salted join produces exactly the plain join's rows; latestPerKey stays
  * a partial-aggregating reduce under extreme key skew.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals plain inner join (incl. a hot key)") {
    val fact = ((1 to 500).map(i => (1L, s"hot_$i")) ++
      (1 to 50).map(i => (i.toLong % 7 + 2, s"cold_$i")))
      .toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "three"), (9L, "unused"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "name")
      .collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8)
      .select("k", "payload", "name").collect().toSet
    assert(plain == salted)
    assert(plain.size == 500 + fact.filter($"k".isin(2L, 3L)).count())
  }

  test("latestPerKey under 100:1 key skew: exact result, no window, partial agg") {
    // one hot entity with 100× the history of everyone else
    val rows = (1 to 20000).map(i => (1L, 1700000000L + i, i.toLong, s"v$i")) ++
      (2L to 200L).flatMap(k =>
        (1 to 100).map(i => (k, 1700000000L + i * k, i.toLong, s"k${k}_$i")))
    val df = rows.toDF("k", "ts", "id", "payload").repartition(8)

    val out = Materialize.latestPerKey(df, "k", "ts", "id")
    // reference: the naive window formulation
    val w = Window.partitionBy($"k").orderBy($"ts".desc, $"id".desc)
    val ref = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .drop("rn")
    assert(out.collect().toSet == ref.collect().toSet)

    // plan shape: an aggregation pair (partial map-side combine collapses
    // the hot key before the exchange), and no WindowExec anywhere
    val plan = out.queryExecution.sparkPlan
    val windows = plan.collect {
      case x: org.apache.spark.sql.execution.window.WindowExec => x
    }
    assert(windows.isEmpty, "latestPerKey must not plan a skew-prone window")
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.size >= 2, s"expected partial+final aggregation:\n$plan")
    assert(aggs.exists(_.aggregateExpressions.exists(_.mode ==
      org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
      "expected a map-side partial aggregate")
  }

  test("salted left join preserves unmatched fact rows once") {
    val fact = Seq((1L, "a"), (99L, "b")).toDF("k", "payload")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val out = Skew.saltedJoin(fact, dim, "k", buckets = 4, joinType = "left")
    assert(out.count() == 2)
    assert(out.filter($"name".isNull).count() == 1)
  }

  test("saltedDistinctAgg equals the plain distinct aggregate under skew " +
      "and heavy cross-salt value overlap") {
    // hot key with 400 rows over only 37 distinct values (forces every
    // salt bucket to see repeats), cold keys with disjoint value sets
    val rows = (1 to 400).map(i => ("hot", i % 37)) ++
      (1 to 60).map(i => (s"cold_${i % 5}", 1000 + i))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedDistinctAgg(df, "k", "v", nSalts = 16)
      .as[(String, Long, Long)].collect().toSeq
    val plain = df.groupBy($"k")
      .agg(countDistinct($"v").as("d"), count(lit(1)).as("n"))
      .orderBy($"k").as[(String, Long, Long)].collect().toSeq
    assert(salted == plain)
    // degenerate salt counts still exact
    val two = Skew.saltedDistinctAgg(df, "k", "v", nSalts = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(two == plain)
  }

  test("saltedHotKeyJoin equals the plain inner join — hot keys present, " +
      "absent, and with null keys on both sides") {
    val probe = ((1 to 300).map(i => (java.lang.Long.valueOf(1L), s"hot_$i")) ++
      (1 to 60).map(i => (java.lang.Long.valueOf((i % 9 + 2).toLong), s"cold_$i")) ++
      Seq((null.asInstanceOf[java.lang.Long], "null_row")))
      .toDF("k", "payload")
    val build = (Seq((java.lang.Long.valueOf(1L), "one"),
      (java.lang.Long.valueOf(2L), "two"),
      (java.lang.Long.valueOf(3L), "three"),
      (java.lang.Long.valueOf(42L), "unmatched")) ++
      Seq((null.asInstanceOf[java.lang.Long], "null_dim")))
      .toDF("bk", "name")
    val plain = probe.join(build, $"k" === $"bk")
      .select("k", "payload", "name").collect().toSet
    val split = Skew.saltedHotKeyJoin(probe, build, "k", "bk",
        saltBy = "payload", nSalts = 8, minShare = 0.1)
      .select("k", "payload", "name").collect().toSet
    assert(split == plain)
    // hot share too high for any key -> everything takes the cold path,
    // result still identical
    val noHot = Skew.saltedHotKeyJoin(probe, build, "k", "bk",
        saltBy = "payload", nSalts = 8, minShare = 0.99)
      .select("k", "payload", "name").collect().toSet
    assert(noHot == plain)
  }
}
