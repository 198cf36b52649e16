package graft

import graft.ops.Retrieval

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
}
