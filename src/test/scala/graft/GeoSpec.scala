package graft

import graft.ops.Geo
import org.apache.spark.sql.functions._

/** Hand-grid goldens for the spatial family: the 9-cell bucketing must
  * be invisible (equal to brute-force radius semantics), ties must
  * break by site id, and out-of-range probes must surface as NULLs.
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def probes = Seq(
    (1L, 1500L, 500L),      // nearest crosses a cell boundary
    (2L, 5000L, 5000L),     // equidistant pair -> id tiebreak
    (3L, 500000L, 500000L), // isolated -> NULL
    (4L, 8001L, 7000L)      // site at dist 1001 -> outside r=1000
  ).toDF("p", "x", "y")

  private def sites = Seq(
    (1L, 900L, 500L),   // dist 600 to probe 1, in cell (0,0)
    (2L, 1600L, 500L),  // dist 100 to probe 1, in cell (1,0)
    (3L, 5100L, 5000L), // dist 100 to probe 2
    (4L, 4900L, 5000L), // dist 100 to probe 2 (tie, higher id loses)
    (5L, 7000L, 7000L)  // dist 1001 to probe 4 -> cut by r
  ).toDF("s", "x", "y")

  test("gridNearest: boundary-crossing neighbor found, tie breaks by " +
      "site id, radius cut and isolation produce NULL rows") {
    val out = Geo.gridNearest(probes, "p", sites, "s", 1000L)
      .collect().map(r => r.getAs[Long]("p") -> r).toMap
    assert(out.size == 4)
    assert(out(1L).getAs[Long]("nearest_site") == 2L)
    assert(out(1L).getAs[Double]("dist") == 0.00001)
    assert(out(2L).getAs[Long]("nearest_site") == 3L)
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2))
    assert(out(4L).isNullAt(1))
  }

  test("gridNearest: bucketing is invisible — equals the brute-force " +
      "radius scan on a hash cloud") {
    val p = Geo.hashPoints((1L to 300L).toDF("k"), "k", 171L, 172L)
    val s = Geo.hashPoints((1L to 40L).toDF("m"), "m", 173L, 174L)
    val r = 900000L
    val got = Geo.gridNearest(p, "k", s, "m", r)
      .collect().map(x => (x.getAs[Long]("k"),
        if (x.isNullAt(1)) -1L else x.getAs[Long]("nearest_site"))).toMap
    val pm = p.collect().map(x =>
      (x.getLong(0), (x.getLong(1), x.getLong(2))))
    val sm = s.collect().map(x =>
      (x.getLong(0), (x.getLong(1), x.getLong(2))))
    val expect = pm.map { case (k, (px, py)) =>
      val in = sm.map { case (m, (sx, sy)) =>
        ((px - sx) * (px - sx) + (py - sy) * (py - sy), m)
      }.filter(_._1 <= r * r)
      k -> (if (in.isEmpty) -1L else in.min._2)
    }.toMap
    assert(got == expect)
    // the NULL (unmatched) path is pinned by the hand-grid test above;
    // this cloud exercises the dense all-matched regime
    assert(expect.values.exists(_ >= 0))
  }

  test("gridCoverage: match rate and lattice mean distance replay the " +
      "hand fold") {
    val cov = Geo.gridCoverage(
      Geo.gridNearest(probes, "p", sites, "s", 1000L), "p")
      .collect().head
    assert(cov.getAs[Long]("n_probes") == 4L)
    assert(cov.getAs[Long]("n_matched") == 2L)
    assert(cov.getAs[Double]("coverage") == 0.5)
    // dists: 100/1e7 and 100/1e7 -> mean 0.00001
    assert(cov.getAs[Double]("mean_dist") == 0.00001)
  }

  test("hashPoints: coordinates replay the shared u01 recipe") {
    val M = 2147483647L
    def u01(key: Long, c: Long): Double = {
      val h1 = (key + c * 1000003L) % M
      (((h1 * 48271L % M) * 48271L % M) + 1).toDouble / M
    }
    val got = Geo.hashPoints(Seq(7L, 8L).toDF("k"), "k", 171L, 172L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    got.foreach { case (k, x, y) =>
      assert(x == math.floor(u01(k, 171L) * 1e7).toLong)
      // y hashes key^2 mod M (u01 is affine in its key, so hashing the
      // raw key would put every point on one diagonal line)
      assert(y == math.floor(u01(k * k % M, 172L) * 1e7).toLong)
    }
  }

  test("gridCatchment: in-range counts match brute force, empty " +
      "catchments kept at zero with NULL nearest") {
    val out = Geo.gridCatchment(probes, "p", sites, "s", 1000L)
      .collect().map(r => r.getAs[Long]("s") -> r).toMap
    assert(out.size == 5)
    assert(out(1L).getAs[Long]("n_in_range") == 1L &&
      out(1L).getAs[Long]("nearest_probe") == 1L)
    assert(out(2L).getAs[Long]("n_in_range") == 1L)
    assert(out(3L).getAs[Long]("n_in_range") == 1L &&
      out(3L).getAs[Long]("nearest_probe") == 2L)
    assert(out(4L).getAs[Long]("n_in_range") == 1L)
    assert(out(5L).getAs[Long]("n_in_range") == 0L &&
      out(5L).isNullAt(2) && out(5L).isNullAt(3))
    // brute-force parity on the hash cloud
    import spark.implicits._
    val p300 = Geo.hashPoints((1L to 300L).toDF("k"), "k", 171L, 172L)
    val s40 = Geo.hashPoints((1L to 40L).toDF("m"), "m", 173L, 174L)
    val r = 400000L
    val got = Geo.gridCatchment(p300, "k", s40, "m", r).collect()
      .map(x => x.getAs[Long]("m") -> x.getAs[Long]("n_in_range")).toMap
    val pm = p300.collect().map(x => (x.getLong(1), x.getLong(2)))
    val sm = s40.collect().map(x =>
      (x.getLong(0), (x.getLong(1), x.getLong(2))))
    sm.foreach { case (m, (sx, sy)) =>
      val n = pm.count { case (px, py) =>
        (px - sx) * (px - sx) + (py - sy) * (py - sy) <= r * r }
      assert(got(m) == n.toLong)
    }
  }
}
