package graft

import org.apache.spark.sql.functions._
import graft.ops.Privacy

/** K-anonymity / l-diversity audits: hand-checked goldens on a tiny
  * frame, the repair loop (banding raises k), and guard behavior.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI = (city, age): classes {(A,30):3, (A,40):1, (B,30):2}
  private def people = Seq(
    ("A", 30, "flu"), ("A", 30, "flu"), ("A", 30, "cold"),
    ("A", 40, "flu"),
    ("B", 30, "cold"), ("B", 30, "asthma")
  ).toDF("city", "age", "condition")

  test("kAnonymityReport: hand-checked class histogram fold") {
    val r = Privacy.kAnonymityReport(people, Seq("city", "age"), 3)
      .collect().head
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("k_anonymity") == 1L) // the (A,40) singleton
    assert(r.getAs[Long]("classes_below_k") == 2L) // sizes 1 and 2
    assert(r.getAs[Long]("rows_below_k") == 3L)
  }

  test("kAnonymityOffenders lists rare classes smallest-first") {
    val rows = Privacy.kAnonymityOffenders(people, Seq("city", "age"), 3)
      .collect()
    assert(rows.map(r => (r.getAs[String]("city"), r.getAs[Int]("age"),
      r.getAs[Long]("class_size"))).toSeq ==
      Seq(("A", 40, 1L), ("B", 30, 2L)))
  }

  test("lDiversityReport: homogeneous class detected despite k >= 2") {
    // (A,30) has 2 distinct conditions, (A,40) has 1, (B,30) has 2
    val r = Privacy.lDiversityReport(people, Seq("city", "age"),
      col("condition"), 2).collect().head
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("l_diversity") == 1L)
    assert(r.getAs[Long]("classes_below_l") == 1L)
    assert(r.getAs[Long]("rows_below_l") == 1L)
  }

  test("banding repair loop: coarser QI raises k") {
    val df = Seq.tabulate(100)(i => (i % 2, i * 37.0 % 997))
      .toDF("seg", "score")
    val fine = Privacy.kAnonymityReport(
      df.withColumn("b", Privacy.band(col("score"), 1.0)),
      Seq("seg", "b"), 5).collect().head.getAs[Long]("k_anonymity")
    val coarse = Privacy.kAnonymityReport(
      df.withColumn("b", Privacy.band(col("score"), 500.0)),
      Seq("seg", "b"), 5).collect().head.getAs[Long]("k_anonymity")
    assert(fine <= coarse, s"banding must not lower k ($fine -> $coarse)")
    assert(coarse >= 5L)
  }

  test("tClosenessReport: hand-checked TVDs, incl. a class missing " +
      "sensitive values entirely") {
    // classes A{x:3,y:1} B{x:1,y:3} C{x:2,y:2} D{z:2};
    // global x=6,y=6,z=2 over N=14 -> p_g = (3/7, 3/7, 1/7)
    val rows = Seq.fill(3)(("A", "x")) ++ Seq(("A", "y")) ++
      Seq(("B", "x")) ++ Seq.fill(3)(("B", "y")) ++
      Seq.fill(2)(("C", "x")) ++ Seq.fill(2)(("C", "y")) ++
      Seq.fill(2)(("D", "z"))
    val df = rows.toDF("grp", "cond")
    val r = Privacy.tClosenessReport(df, Seq("grp"), col("cond"), 0.2)
      .collect().head
    assert(r.getAs[Long]("n_classes") == 4L)
    // D's TVD: |1 - 1/7| positive part = 6/7 (x,y absent contribute only
    // via the halved-abs identity, which the positive-part sum equals)
    assert(r.getAs[Double]("t_closeness") == 0.857143)
    // A = B = 0.321429, C = 0.142857 -> A, B, D above t=0.2
    assert(r.getAs[Long]("classes_above_t") == 3L)
    assert(r.getAs[Long]("rows_above_t") == 10L)
    // a perfectly population-shaped dataset has t = 0
    val uniform = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("grp", "cond")
    val u = Privacy.tClosenessReport(uniform, Seq("grp"), col("cond"), 0.2)
      .collect().head
    assert(u.getAs[Double]("t_closeness") == 0.0)
    assert(u.getAs[Long]("classes_above_t") == 0L)
  }

  test("dpHistogram: noise replays the seeded two-sided geometric " +
      "exactly, counts reconcile, release is reproducible") {
    import spark.implicits._
    val df = (Seq.fill(7)("alpha") ++ Seq.fill(3)("beta")).toDF("c")
    val out = Privacy.dpHistogram(df, "c", epsilon = 0.5)
      .as[(String, Long, Long, Long, Double)].collect()
    // replicate: md5-prefix key -> two minstd u01 channels -> geometric
    def key(cat: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(cat.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(8), 16)
    }
    val M = 2147483647L
    def u01(k: Long, c: Long): Double = {
      val h1 = (k + c * 1000003L) % M
      (((h1 * 48271L % M) * 48271L % M) + 1).toDouble / M
    }
    def g(k: Long, c: Long): Long =
      math.floor(math.log(u01(k, c)) / -0.5).toLong
    val expected = Map("alpha" -> 7L, "beta" -> 3L).map { case (cat, n) =>
      val noise = g(key(cat), 97L) - g(key(cat), 98L)
      (cat, n, noise, n + noise, 0.5)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == expected)
    // reproducible: a second run releases the identical histogram
    val again = Privacy.dpHistogram(df, "c", epsilon = 0.5)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(again.toSeq == out.toSeq)
    intercept[IllegalArgumentException] {
      Privacy.dpHistogram(df, "c", epsilon = 0.0)
    }
  }

  test("randomizedResponse: reported answers replay the seeded coins, " +
      "estimator deconvolves the forced share exactly") {
    import spark.implicits._
    val M = 2147483647L
    def u01(k: Long, c: Long): Double = {
      val h1 = (k + c * 1000003L) % M
      (((h1 * 48271L % M) * 48271L % M) + 1).toDouble / M
    }
    // truth: users 1..10, sensitive for ids <= 4
    val df = (1L to 10L).map(u => (u, u <= 4)).toDF("u", "s")
    val out = Privacy.randomizedResponse(df, "u", col("s"), p = 0.75)
      .collect().head
    val reported = (1L to 10L).map { u =>
      if (u01(u, 101L) <= 0.75) (if (u <= 4) 1 else 0)
      else if (u01(u, 102L) > 0.5) 1 else 0
    }.sum
    assert(out.getAs[Long]("n") == 10L)
    assert(out.getAs[Long]("n_reported_yes") == reported.toLong)
    assert(out.getAs[Long]("n_true_yes") == 4L)
    val est = BigDecimal((reported / 10.0 - 0.125) / 0.75)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Double]("estimated_rate") == est)
    intercept[IllegalArgumentException] {
      Privacy.randomizedResponse(df, "u", col("s"), p = 1.0)
    }
  }

  test("guards fail loud") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(people, Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(people, Seq("city"), 1)
    }
    intercept[IllegalArgumentException] { Privacy.band(col("age"), 0.0) }
    intercept[IllegalArgumentException] {
      Privacy.tClosenessReport(people, Seq("city"), col("condition"), 0.0)
    }
  }

  test("dpMean: exact mean rides along, noisy release replays the " +
      "seeded inverse-CDF draw, clipping bounds the sensitivity") {
    import spark.implicits._
    val df = (1 to 100).map(i => i.toDouble % 50).toDF("v")
    val r = graft.ops.Privacy.dpMean(df, "v", lo = 0.0, hi = 500.0,
      epsilon = 1.0).collect().head
    assert(r.getAs[Long]("n") == 100L)
    // exact mean of 0..49 twice = 24.5
    assert(r.getAs[Double]("exact_mean") == 24.5)
    // replay the seeded geometric draws in scala
    val M = 2147483647L
    def u01(key: Long, c: Long): Double = {
      val h1 = (key + c * 1000003L) % M
      (((h1 * 48271L % M) * 48271L % M) + 1).toDouble / M
    }
    def geom(c: Long, eps: Double): Long =
      math.floor(math.log(u01(777L, c)) / -eps).toLong
    val sn = geom(201L, 0.5 / 50000.0) - geom(202L, 0.5 / 50000.0)
    val cn = geom(203L, 0.5) - geom(204L, 0.5)
    assert(r.getAs[Long]("noisy_n") == 100L + cn)
    val dm = (245000.0 + sn) / (100.0 * (100.0 + cn))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("dp_mean") == r6(dm))
    // values above hi clip: a 10000 outlier contributes only 500
    val c = graft.ops.Privacy.dpMean(Seq(10000.0).toDF("v"), "v",
      0.0, 500.0, 1.0).collect().head
    assert(c.getAs[Double]("exact_mean") == 500.0)
    intercept[IllegalArgumentException] {
      graft.ops.Privacy.dpMean(df, "v", 0.0, 500.0, epsilon = 0.0)
    }
  }
}
