package graft

import graft.ops.Retrieval
import org.apache.spark.sql.functions._

/** Property: the union+window as-of join equals a brute-force per-probe
  * scan of the feature history, for randomized feature/probe sets — the
  * crown-jewel operator proven against an executable spec, not examples.
  * (Seeded java.util.Random generation: deterministic across runs.)
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private val ttlMicros = 1000L

  private def bruteForce(feats: Seq[(Long, Long, Double)],
                         probes: Seq[(Long, Long, Long)]): Map[Long, Option[Double]] =
    probes.map { case (pid, k, ts) =>
      val eligible = feats.filter(f =>
        f._1 == k && f._2 <= ts && f._2 >= ts - ttlMicros)
      val best =
        if (eligible.isEmpty) None
        else {
          val maxTs = eligible.map(_._2).max
          Some(eligible.filter(_._2 == maxTs).map(_._3).max)
        }
      pid -> best
    }.toMap

  test("intervalJoin equals brute-force containment for random intervals, " +
      "points, and bin widths (30 random datasets)") {
    val r = new java.util.Random(777)
    (1 to 30).foreach { round =>
      val np = 1 + r.nextInt(40)
      val ni = r.nextInt(15)
      val base = 1700000000000000L // µs epoch anchor
      val pts = Seq.fill(np)(
        (r.nextInt(100000).toLong, 1L + r.nextInt(3),
          base + r.nextInt(10000000).toLong))
      val ivs = Seq.fill(ni) {
        val s = base + r.nextInt(10000000).toLong
        (1L + r.nextInt(3), "iv" + r.nextInt(1000000),
          s, s + 1 + r.nextInt(5000000).toLong)
      }
      val expected = (for {
        (pid, pk, pt) <- pts; (ik, iv, s, e) <- ivs
        if ik == pk && pt >= s && pt < e
      } yield (pid, iv)).toSet
      val ptsDf = pts.toDF("id", "k", "ptu")
        .withColumn("pt", timestamp_micros($"ptu")).drop("ptu")
      val ivsDf = ivs.toDF("k", "iv", "su", "eu")
        .withColumn("start", timestamp_micros($"su"))
        .withColumn("end", timestamp_micros($"eu")).drop("su", "eu")
      // random bin width from sub-interval to super-interval scale
      val binMicros = math.pow(10, 3 + r.nextInt(5)).toLong
      val got = Retrieval.intervalJoin(ptsDf, ivsDf, Seq("k"), "pt",
          "start", "end", binMicros = binMicros,
          maxBinsPerInterval = Int.MaxValue)
        .select("id", "iv").as[(Long, String)].collect().toSet
      assert(got == expected,
        s"round $round binMicros=$binMicros np=$np ni=$ni")
    }
  }

  test("as-of join equals brute-force per-probe scan (40 random datasets)") {
    val r = new java.util.Random(4242)
    (1 to 40).foreach { round =>
      val nf = r.nextInt(25)
      val np = 1 + r.nextInt(25)
      // operator precondition: unique (key, ts) on the feature side —
      // generate then dedup keeping max value (the documented pre-agg)
      val rawFeats = Seq.fill(nf)(
        (1L + r.nextInt(4), r.nextInt(3000).toLong,
          math.rint((1 + 8 * r.nextDouble()) * 100) / 100))
      val feats = rawFeats.groupBy(f => (f._1, f._2))
        .map { case ((k, t), fs) => (k, t, fs.map(_._3).max) }.toSeq
      val probes = Seq.tabulate(np)(i =>
        (i.toLong, 1L + r.nextInt(4), r.nextInt(3000).toLong))

      val featDf = feats.toDF("user_id", "ftsl", "fval")
        .selectExpr("user_id", "timestamp_micros(ftsl) AS fts", "fval")
      val probeDf = probes.toDF("probe_id", "user_id", "tsl")
        .selectExpr("probe_id", "user_id", "timestamp_micros(tsl) AS ts")
      val got = Retrieval.asOfJoin(probeDf, featDf, "user_id", "ts", "fts",
          "INTERVAL '0.001' SECOND", Seq("fval"))
        .select("probe_id", "fval")
        .as[(Long, Option[Double])].collect().toMap
      assert(got == bruteForce(feats, probes), s"round $round: $feats $probes")
    }
  }

  /** Boundary-chaos triple agreement: timestamps are drawn ON and ±1–2 µs
    * AROUND the hazardous instants — the 1970 epoch itself, the epoch±TTL
    * window edges, a pre-epoch (negative-micros) instant, and a real DST
    * transition (2021-03-14 07:00 UTC, US spring-forward) — so microsecond
    * ties (probe==feature ts, probe==probe, window-edge exact hits) occur
    * constantly rather than by luck. All three production formulations of
    * J1 (union+window, native AsOfJoinExec, native over bucketed-sorted
    * tables) must agree with the brute-force executable spec on every
    * probe. TTL boundary is inclusive (fts >= ts - ttl), the fts == ts tie
    * includes the feature (Feast semantics) — exactly what an off-by-one
    * in any of the three implementations would break at these instants.
    */
  test("epoch/DST boundary chaos: window ≡ native ≡ bucketed ≡ brute force " +
       "(≥1000 probes)") {
    val r = new java.util.Random(20260813)
    val dstEdge = 1615705200000000L // 2021-03-14T07:00:00Z in micros
    val bases = Seq(0L, ttlMicros, -ttlMicros, -86400000000L, // 1969-12-31
      dstEdge, dstEdge - ttlMicros)
    def chaosTs(): Long = {
      val base = bases(r.nextInt(bases.length))
      // ±2 µs jitter, occasionally shifted by a whole TTL so probes straddle
      // the lookback window of features sitting on a neighboring base
      val jitter = r.nextInt(5) - 2
      val shift = if (r.nextInt(4) == 0) (r.nextInt(3) - 1) * ttlMicros else 0L
      base + jitter + shift
    }
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    var totalProbes = 0
    try {
      (1 to 10).foreach { round =>
        val nf = 20 + r.nextInt(20)
        val np = 110
        val rawFeats = Seq.fill(nf)(
          (1L + r.nextInt(3), chaosTs(), (r.nextInt(900) + 100).toDouble))
        // operator precondition: unique (key, fts) — dedup keeping max value
        val feats = rawFeats.groupBy(f => (f._1, f._2))
          .map { case ((k, t), fs) => (k, t, fs.map(_._3).max) }.toSeq
        val probes = Seq.tabulate(np)(i => (i.toLong, 1L + r.nextInt(3), chaosTs()))
        val want = bruteForce(feats, probes)

        val featDf = feats.toDF("user_id", "l", "fval")
          .selectExpr("user_id", "timestamp_micros(l) AS fts", "fval")
        val probeDf = probes.toDF("probe_id", "user_id", "l")
          .selectExpr("probe_id", "user_id", "timestamp_micros(l) AS ts")

        val window = Retrieval.asOfJoin(probeDf, featDf, "user_id", "ts",
            "fts", "INTERVAL '0.001' SECOND", Seq("fval"))
          .select("probe_id", "fval")
          .as[(Long, Option[Double])].collect().toMap
        assert(window == want, s"round $round window: $feats $probes")

        val native = Retrieval.asOfJoinNative(probeDf, featDf, "user_id",
            "ts", "fts", ttlMicros)
          .toDF("probe_id", "user_id", "ts", "f_user", "f_fts", "fval")
          .select("probe_id", "fval")
          .as[(Long, Option[Double])].collect().toMap
        assert(native == want, s"round $round native: $feats $probes")

        probeDf.repartition(4, col("user_id")).write.mode("overwrite")
          .bucketBy(4, "user_id").sortBy("user_id", "ts")
          .saveAsTable("asof_chaos_p")
        featDf.repartition(4, col("user_id")).write.mode("overwrite")
          .bucketBy(4, "user_id").sortBy("user_id", "fts")
          .saveAsTable("asof_chaos_f")
        val bucketed = Retrieval.asOfJoinNative(spark.table("asof_chaos_p"),
            spark.table("asof_chaos_f"), "user_id", "ts", "fts", ttlMicros)
          .toDF("probe_id", "user_id", "ts", "f_user", "f_fts", "fval")
          .select("probe_id", "fval")
          .as[(Long, Option[Double])].collect().toMap
        assert(bucketed == want, s"round $round bucketed: $feats $probes")

        totalProbes += np
      }
      assert(totalProbes >= 1000, s"only $totalProbes probes exercised")
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS asof_chaos_p")
      spark.sql("DROP TABLE IF EXISTS asof_chaos_f")
    }
  }
}
