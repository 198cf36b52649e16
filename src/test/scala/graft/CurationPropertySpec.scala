package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Materialize, Sampling, Sketches}

/** Randomized-equivalence properties for the round-7 curation/maintenance
  * operators, in the AsOfPropertySpec mold: each operator's optimized
  * plan must agree with a naive reference over many seeded-random inputs
  * (ties, deletes-at-the-end, reinserts, degenerate keys included by
  * construction).
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  test("applyChangelog ≡ naive last-writer-wins-then-drop-deletes over " +
      "random changelogs with ts ties") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val n = 30 + rnd.nextInt(120)
      val rows = (1 to n).map { i =>
        (rnd.nextInt(12).toLong,                 // key (collisions certain)
          (rnd.nextInt(8) * 10).toLong,          // ts with heavy ties
          i.toLong,                              // unique tiebreak
          if (rnd.nextInt(4) == 0) "delete" else "upsert",
          s"p$i")
      }
      val df = rows.toDF("k", "ts", "id", "op", "payload")
      val got = Materialize.applyChangelog(df, "k", "ts", "id", "op",
        "delete", Seq("payload"))
        .as[(Long, Long, Long, String)].collect().toSet
      // naive: per key, max by (ts, id); keep unless that row is a delete
      val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val last = rs.maxBy(r => (r._2, r._3))
        if (last._4 == "delete") None else Some((k, last._2, last._3, last._5))
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("snapshotSeries ≡ latestPerKey at every cutoff over random " +
      "histories") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val n = 40 + rnd.nextInt(80)
      val rows = (1 to n).map { i =>
        (rnd.nextInt(10).toLong,
          java.sql.Timestamp.valueOf(f"2024-01-${1 + rnd.nextInt(28)}%02d " +
            f"${rnd.nextInt(24)}%02d:00:00"),
          i.toLong, rnd.nextDouble() * 100)
      }
      val df = rows.toDF("k", "ts", "id", "v")
      val cutoffs = Seq("2024-01-07 23:59:59", "2024-01-15 12:00:00",
        "2024-01-28 23:59:59")
      val series = Materialize.snapshotSeries(df, "k", "ts", "id",
        cutoffs, Seq("v"))
        .as[(java.sql.Timestamp, Long, java.sql.Timestamp, Long, Double)]
        .collect()
      cutoffs.foreach { c =>
        val ref = Materialize.latestPerKey(
          df.filter(col("ts") <= lit(c).cast("timestamp_ntz")),
          "k", "ts", "id")
          .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
        val got = series.filter(_._1 == java.sql.Timestamp.valueOf(c))
          .map(r => (r._2, r._3, r._4, r._5)).toSet
        assert(got == ref, s"trial $trial cutoff $c")
      }
    }
  }

  test("rankNormalize is monotone in the value, bounded in [0,1], and " +
      "tops out at 1 for the maximum") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(500)(rnd.nextDouble() * 600)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val out = Sketches.rankNormalize(df, "v", 0.0, 600.0, 300)
      .select("v", "rank_est").as[(Double, Double)].collect()
      .sortBy(_._1)
    assert(out.forall(r => r._2 >= 0.0 && r._2 <= 1.0))
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 + 1e-9, s"non-monotone at ${a._1} -> ${b._1}")
    }
    // the max value interpolates WITHIN its bin (uniform-within-bin
    // assumption), so it approaches 1 without necessarily reaching it
    assert(out.last._2 > 1.0 - 2.0 / 300)
  }

  test("rendezvous minimal movement holds for random ring growths") {
    val rnd = new scala.util.Random(23)
    val docs = spark.range(800).toDF("id")
    for (_ <- 1 to 5) {
      val from = 2 + rnd.nextInt(10)
      val to = from + 1 + rnd.nextInt(6)
      val r = Sampling.rendezvousMovementReport(docs, "id", from, to)
        .collect().head
      assert(r.getAs[Boolean]("moved_only_to_new"),
        s"$from -> $to moved a doc between OLD shards")
      val share = r.getAs[Double]("moved_share")
      val expected = (to - from).toDouble / to
      assert(math.abs(share - expected) < 0.12,
        s"$from -> $to share=$share expected≈$expected")
    }
  }

  test("mergeHourlyPartials is split-invariant: any random 3-way split " +
      "merges to the single-pass partials on every additive/min column") {
    val parsed = graft.ops.Parse.parseEvents(
      Tables.events(spark, "/root/testdata/sf0.001"))
    val rnd = new scala.util.Random(5)
    val salt = rnd.nextInt(1000)
    val parts = (0 until 3).map(i =>
      graft.ops.WindowAgg.hourlyPartials(
        parsed.filter(pmod(col("event_id") + salt, lit(3)) === i)))
    val merged = graft.ops.WindowAgg.mergeHourlyPartials(parts: _*)
    val single = graft.ops.WindowAgg.mergeHourlyPartials(
      graft.ops.WindowAgg.hourlyPartials(parsed))
    val cols = Seq("user_id", "window_start", "window_end", "total_events",
      "click_count", "view_count", "purchase_count", "signup_count",
      "error_count", "view_value_cnt", "primary_k_min")
    assert(merged.select(cols.map(col): _*).collect().toSet ==
      single.select(cols.map(col): _*).collect().toSet)
  }

  test("saltedHotKeyJoin ≡ plain inner join over random skewed frames " +
      "(random key domains, null rates, salt counts, hot shares)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 8) {
      val nKeys = 1 + rnd.nextInt(20)
      val hotKey = rnd.nextInt(nKeys)
      val probe = (1 to 300 + rnd.nextInt(300)).map { i =>
        val kv: java.lang.Long =
          if (rnd.nextDouble() < 0.05) null
          else java.lang.Long.valueOf(
            (if (rnd.nextDouble() < 0.4) hotKey // manufactured skew
             else rnd.nextInt(nKeys)).toLong)
        (kv, s"p$i")
      }.toDF("k", "payload")
      val build = (0 until nKeys + 3).map { k =>
        (if (rnd.nextDouble() < 0.1) null.asInstanceOf[java.lang.Long]
         else java.lang.Long.valueOf(k.toLong), s"dim$k")
      }.toDF("bk", "name")
      val nSalts = 2 + rnd.nextInt(15)
      val minShare = 0.02 + rnd.nextDouble() * 0.5
      val plain = probe.join(build, $"k" === $"bk")
        .select("k", "payload", "name").collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val salted = graft.ops.Skew.saltedHotKeyJoin(probe, build, "k", "bk",
          "payload", nSalts, minShare)
        .select("k", "payload", "name").collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(salted == plain,
        s"trial $trial: nKeys=$nKeys nSalts=$nSalts minShare=$minShare")
    }
  }
}
