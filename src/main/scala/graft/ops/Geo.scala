package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial join primitives on a planar integer lattice — the
  * store-to-customer / cell-tower-to-event "nearest site within radius"
  * join every geo-enriched feature pipeline needs. Coordinates live on
  * a micro-unit integer lattice (a [0,1]² map scaled by 10⁷), so every
  * squared distance is an exact long and the only doubles are the final
  * sqrt (IEEE-exact in any engine) and display scaling.
  *
  * Scale posture: [[gridNearest]] is the canonical bucketed spatial
  * join — probes explode to a BOUNDED 9-neighbor candidate set and
  * equi-join sites on the cell key. Never a cross join, never a
  * distance-inequality join: at 100 TB the join shuffles (or
  * broadcasts, when the site table fits) on the cell key exactly like
  * any keyed join, and AQE's skew split handles dense cells. The cell
  * size equals the radius, which makes the 9-cell neighborhood a
  * superset of the radius ball — candidates outside are cut by the
  * exact integer dist² filter, so the bucketing is invisible in the
  * result (the property [[GeoSpec]] pins).
  *
  * Reference: the platform under study has no geo operators
  * (ML-Feature-Store-Enterprise-Grade feature views are key/value) —
  * this family extends the engine to location features, the most
  * common enrichment absent there.
  */
object Geo {

  /** Deterministic synthetic planar points for a key column: two u01
    * hash channels scaled to the [0, 10⁷] micro-unit lattice —
    * replayable in any engine from the shared [[Gen.u01]] recipe.
    *
    * The y channel hashes key² mod M, NOT the key: u01 is affine in its
    * key (a two-step LCG), so y = u01(key + B) would equal
    * x + const (mod 1) and every map would collapse onto one wrapped
    * diagonal LINE — the round-10 q_lof profile caught exactly that
    * (≈800 in-radius neighbors per point at radius 0.04 where a uniform
    * map has ≈75). Squaring the key before the hash breaks the
    * affinity; both coordinates stay exact-integer replayable
    * (the key is reduced mod M BEFORE squaring —
    * pmod(k,M)·pmod(k,M) < 2⁶² — so the product never overflows a
    * signed 64-bit in EITHER engine at any key range; identical values
    * for k < M).
    */
  def hashPoints(df: DataFrame, keyCol: String, channelX: Long,
                 channelY: Long): DataFrame =
    df.select(col(keyCol),
      floor(Gen.u01(col(keyCol), channelX) * 1e7).cast("long").as("x"),
      floor(Gen.u01(pmod(pmod(col(keyCol), lit(2147483647L)) *
        pmod(col(keyCol), lit(2147483647L)), lit(2147483647L)),
        channelY) * 1e7).cast("long").as("y"))

  /** Nearest site within `radiusMicro` for every probe, or NULL when
    * none is in range: probes fan out to their own + 8 adjacent grid
    * cells (cell size = radius ⇒ the 3×3 block covers the radius
    * ball), equi-join sites on the cell key, keep candidates with
    * exact integer dist² ≤ r², and pick per probe by the
    * (dist², site id) total order. A left join back to the probe
    * frame carries the unmatched probes through with NULLs — the
    * coverage signal ("how many customers have NO site in range") is
    * part of the answer, not silently dropped.
    *
    * Inputs must carry (key, x, y) with x/y on the micro lattice
    * ([[hashPoints]] or any real geocode scaled the same way).
    *
    * Plan: one ×9 narrow fan-out on the probe side, one keyed join on
    * the cell id (broadcast when sites are small — the common case:
    * sites are stores/towers, probes are the corpus), one partial-agg
    * min(struct) per probe, one left join back. No cross join, no
    * sort; dist² in exact longs (coords ≤ 10⁷ ⇒ dist² ≤ 2·10¹⁴).
    */
  def gridNearest(probes: DataFrame, probeKey: String, sites: DataFrame,
                  siteKey: String, radiusMicro: Long): DataFrame = {
    require(radiusMicro > 0, s"gridNearest: radius > 0 (got $radiusMicro)")
    val cs = lit(radiusMicro.toDouble)
    def cellOf(c: Column) = floor(c.cast("double") / cs).cast("long")
    val s = sites.select(col(siteKey), col("x").as("__sx"),
      col("y").as("__sy"), cellOf(col("x")).as("__cx"),
      cellOf(col("y")).as("__cy"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val candidates = probes
      .select(col(probeKey), col("x").as("__px"), col("y").as("__py"),
        cellOf(col("x")).as("__pcx"), cellOf(col("y")).as("__pcy"))
      .withColumn("__o", explode(offsets))
      .withColumn("__jx", col("__pcx") + col("__o.dx"))
      .withColumn("__jy", col("__pcy") + col("__o.dy"))
      .join(s, col("__jx") === col("__cx") && col("__jy") === col("__cy"))
      .withColumn("__d2",
        (col("__px") - col("__sx")) * (col("__px") - col("__sx")) +
          (col("__py") - col("__sy")) * (col("__py") - col("__sy")))
      .filter(col("__d2") <= lit(radiusMicro * radiusMicro))
    val best = candidates.groupBy(col(probeKey))
      .agg(min(struct(col("__d2"), col(siteKey))).as("__b"))
      .select(col(probeKey), col("__b").getField(siteKey).as(siteKey),
        col("__b").getField("__d2").as("__d2"))
    probes.select(col(probeKey))
      .join(best, Seq(probeKey), "left")
      .select(col(probeKey), col(siteKey).as("nearest_site"),
        round(sqrt(col("__d2").cast("double")) / lit(1e7), 6).as("dist"))
      .orderBy(probeKey)
  }

  /** The range-join complement of [[gridNearest]]: per site, how many
    * probes fall within the radius (catchment size) and the nearest
    * one — the site-capacity view ("which stores are overloaded")
    * where gridNearest answers the probe view. Same bucketing, same
    * exactness: probes fan out to 9 cells, equi-join sites, exact
    * integer dist² cut; sites with an EMPTY catchment are kept with
    * zero (a store nobody can reach is the finding, not a dropped
    * row).
    *
    * Plan: identical to [[gridNearest]] up to the candidate set, then
    * one site-grain aggregation and a left join back to all sites.
    */
  def gridCatchment(probes: DataFrame, probeKey: String,
                    sites: DataFrame, siteKey: String,
                    radiusMicro: Long): DataFrame = {
    require(radiusMicro > 0,
      s"gridCatchment: radius > 0 (got $radiusMicro)")
    val cs = lit(radiusMicro.toDouble)
    def cellOf(c: Column) = floor(c.cast("double") / cs).cast("long")
    val s = sites.select(col(siteKey), col("x").as("__sx"),
      col("y").as("__sy"), cellOf(col("x")).as("__cx"),
      cellOf(col("y")).as("__cy"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val inRange = probes
      .select(col(probeKey), col("x").as("__px"), col("y").as("__py"),
        cellOf(col("x")).as("__pcx"), cellOf(col("y")).as("__pcy"))
      .withColumn("__o", explode(offsets))
      .withColumn("__jx", col("__pcx") + col("__o.dx"))
      .withColumn("__jy", col("__pcy") + col("__o.dy"))
      .join(s, col("__jx") === col("__cx") && col("__jy") === col("__cy"))
      .withColumn("__d2",
        (col("__px") - col("__sx")) * (col("__px") - col("__sx")) +
          (col("__py") - col("__sy")) * (col("__py") - col("__sy")))
      .filter(col("__d2") <= lit(radiusMicro * radiusMicro))
    val agg = inRange.groupBy(col(siteKey))
      .agg(count(lit(1)).as("n_in_range"),
        min(struct(col("__d2"), col(probeKey))).as("__n"))
    sites.select(col(siteKey))
      .join(agg, Seq(siteKey), "left")
      .select(col(siteKey),
        coalesce(col("n_in_range"), lit(0L)).as("n_in_range"),
        col("__n").getField(probeKey).as("nearest_probe"),
        round(sqrt(col("__n").getField("__d2").cast("double")) /
          lit(1e7), 6).as("nearest_dist"))
      .orderBy(siteKey)
  }

  /** Radius-bounded Local Outlier Factor (Breunig et al. 2000) over one
    * point set — the density-RELATIVE anomaly score the global distance
    * fences (q_mad_outliers, x_embedding_outliers) cannot express: a
    * point at the edge of a tight cluster is flagged even though its
    * absolute distances are small, and a point deep in a sparse region
    * is NOT flagged even though its neighbors are far.
    *
    * Bucketing: the [[gridNearest]] 9-cell discipline — candidates are
    * pairs sharing a 3×3 cell block (cell = radius), so the self-join is
    * a keyed equi-join, never corpus². The radius bounds the metric:
    * LOF here is EXACT classical LOF for every point whose k-th
    * neighbor lies within the radius, and NULL (with `n_in_radius`
    * exposed) where the neighborhood outruns the radius — the
    * documented trade that keeps the pair space bounded at 100 TB.
    *
    * Determinism: d² is an exact long; each reach-distance commits to
    * the 1e-9 map-unit lattice BEFORE the k-fold (integer sums — a
    * 3-double sum would be fold-order-dependent), lrd commits to 1e-6
    * before the neighbor fold, and LOF is one final division. kNN ties
    * break by (d², neighbor id).
    *
    * Plan: ×9 fan-out, one cell-keyed self-join, exact d² cut, one
    * per-point top-k window over the radius-bounded candidate list,
    * two keyed joins to chain kdist → reach → lrd → lof. No cross
    * join, no global sort.
    */
  def gridLof(points: DataFrame, keyCol: String, radiusMicro: Long,
              k: Int = 3): DataFrame = {
    require(radiusMicro > 0, s"gridLof: radius > 0 (got $radiusMicro)")
    require(k >= 1 && k <= 32, s"gridLof: k in [1, 32] (got $k)")
    val cs = lit(radiusMicro.toDouble)
    def cellOf(c: Column) = floor(c.cast("double") / cs).cast("long")
    val pts = points.select(col(keyCol).as("__id"), col("x"), col("y"))
    val s = pts.select(col("__id").as("__oid"), col("x").as("__sx"),
      col("y").as("__sy"), cellOf(col("x")).as("__cx"),
      cellOf(col("y")).as("__cy"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val cand = pts
      .select(col("__id"), col("x").as("__px"), col("y").as("__py"),
        cellOf(col("x")).as("__pcx"), cellOf(col("y")).as("__pcy"))
      .withColumn("__o", explode(offsets))
      .withColumn("__jx", col("__pcx") + col("__o.dx"))
      .withColumn("__jy", col("__pcy") + col("__o.dy"))
      .join(s, col("__jx") === col("__cx") && col("__jy") === col("__cy") &&
        col("__id") =!= col("__oid"))
      .withColumn("__d2",
        (col("__px") - col("__sx")) * (col("__px") - col("__sx")) +
          (col("__py") - col("__sy")) * (col("__py") - col("__sy")))
      .filter(col("__d2") <= lit(radiusMicro * radiusMicro))
      .select(col("__id"), col("__oid"), col("__d2"))
      // the candidate relation feeds counts + the kdist -> reach -> lrd
      // -> lof chain (4 consumers): pin it once instead of re-running
      // the 9-cell self-join per consumer (measured 37 s -> ~4 s at
      // sf0.1). At 100 TB this is the disk-persisted intermediate.
      .localCheckpoint()
    val ranked = cand.withColumn("__rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("__id"))
        .orderBy(col("__d2").asc, col("__oid").asc)))
    val counts = cand.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_in_radius"))
    val knn = ranked.filter(col("__rk") <= k).localCheckpoint()
    // k-distance per point (only meaningful when it has >= k in-radius
    // neighbors); points failing that emit NULL downstream
    val kdist = knn.groupBy(col("__id"))
      .agg(count(lit(1)).as("__nk"), max(col("__d2")).as("__kd2"))
      .filter(col("__nk") === k)
      .select(col("__id").as("__kid"), col("__kd2"))
    // reach-dist(p, o) = max(kdist(o), d(p, o)), committed to the 1e-9
    // map-unit lattice; inner join on o's kdist drops pairs whose
    // neighbor has no kdist (those points get NULL lof below)
    val reach = knn
      .join(kdist, col("__oid") === col("__kid"))
      .withColumn("__r9",
        round(sqrt(greatest(col("__d2"), col("__kd2")).cast("double")) /
          lit(1e7) * lit(1e9), 0).cast("long"))
    val lrd = reach.groupBy(col("__id"))
      .agg(count(lit(1)).as("__nr"), sum(col("__r9")).as("__sr"))
      .filter(col("__nr") === k && col("__sr") > 0)
      // lrd = k / mean reach; committed to 1e-6 before the neighbor fold
      .select(col("__id").as("__lid"),
        round(lit(k) * lit(1e9) / col("__sr").cast("double") * lit(1e6), 0)
          .cast("long").as("__lrd6"))
    val lofNum = knn
      .join(lrd.select(col("__lid").as("__oid"),
        col("__lrd6").as("__olrd6")), Seq("__oid"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__no"), sum(col("__olrd6")).as("__slrd"))
      .filter(col("__no") === k)
    val scored = lofNum
      .join(lrd, col("__id") === col("__lid"))
      .select(col("__id"),
        round(col("__slrd").cast("double") /
          (lit(k) * col("__lrd6").cast("double")), 6).as("lof"),
        round(col("__lrd6").cast("double") / lit(1e6), 6).as("lrd"))
    pts.select(col("__id"))
      .join(counts, Seq("__id"), "left")
      .join(scored, Seq("__id"), "left")
      .select(col("__id").as(keyCol),
        coalesce(col("n_in_radius"), lit(0L)).as("n_in_radius"),
        col("lrd"), col("lof"))
      .orderBy(keyCol)
  }

  /** Radius coverage summary — the aggregate readout over
    * [[gridNearest]]: how many probes found a site in range, and the
    * distance distribution of those that did (mean via exact micro
    * integer d² is NOT possible for sqrt, so the mean folds the
    * rounded per-probe distances on the 1e-6 lattice — exact in both
    * engines by construction).
    */
  def gridCoverage(nearest: DataFrame, probeKey: String): DataFrame = {
    val lat = round(col("dist") * 1e6, 0).cast("long")
    nearest.agg(count(lit(1)).as("n_probes"),
      count(col("nearest_site")).as("n_matched"),
      coalesce(sum(lat), lit(0L)).as("__sd"))
      .select(col("n_probes"), col("n_matched"),
        round(col("n_matched").cast("double") /
          col("n_probes").cast("double"), 6).as("coverage"),
        round(when(col("n_matched") > 0,
          col("__sd").cast("double") /
            (lit(1e6) * col("n_matched").cast("double"))), 6)
          .as("mean_dist"))
  }
}
