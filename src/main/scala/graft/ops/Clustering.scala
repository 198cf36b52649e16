package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch clustering over embedding columns — deterministic Lloyd k-means
  * expressed as declarative DataFrame supersteps (assignment = a
  * broadcast-join argmin, update = one keyed aggregation), the same
  * iterate-with-checkpoint pattern as [[Graph.pageRank]] and the
  * [[Dedup]] label propagation.
  *
  * Determinism contract (what makes the result engine-replayable, unlike
  * MLlib's sampled init): seeds are the `k` LOWEST-id vectors, distance
  * ties assign to the lowest cluster id, a fixed superstep count replaces
  * a float-tolerance convergence test, and every arithmetic expression
  * mirrors the oracle's operation order bit for bit.
  */
object Clustering {

  /** Σ aᵢ·bᵢ with strict left-to-right accumulation — the HOF twin of
    * DuckDB's `list_inner_product`, shared by the distance expansion
    * ‖v−c‖² = v·v − 2·v·c + c·c.
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Lloyd k-means: returns one row per vector with its final cluster id
    * (the SEED VECTOR's id — stable across supersteps, no relabeling
    * pass) and the squared-L2 distance to that centroid. Clusters that
    * lose every member simply drop out of later supersteps (the standard
    * batch-Lloyd degeneracy; with id-ordered seeds on real corpora this
    * is a corner, and determinism is what the contract guarantees).
    *
    * Plan per superstep: vectors × broadcast k-row centroid table →
    * argmin via `min(struct(dist², cluster))` (one narrow projection +
    * one keyed min, no sort), then centroid update = explode to
    * (cluster, dim) grain and ONE aggregation (bounded: k·dim rows).
    * Lineage truncates per superstep via `localCheckpoint` (swap
    * `checkpoint` on a cluster). The corpus is never globally sorted;
    * seed selection is TakeOrdered(k).
    */
  def kmeans(emb: DataFrame, idCol: String, vecCol: String, k: Int,
             iterations: Int,
             checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1 && k <= 1024, s"kmeans: k in [1, 1024] (got $k)")
    require(iterations >= 1 && iterations <= 20,
      s"kmeans: iterations in [1, 20] (got $iterations)")
    // vecs is CORPUS-sized — localCheckpoint pins it in block memory
    // for the whole run; checkpointDir = the reliable posture
    val vecs = Ckpt.cut(emb.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v")),
      checkpointDir, eager = true)
    var cent = Ckpt.cut(vecs.orderBy(col("__id")).limit(k)
      .select(col("__id").as("__cl"), col("__v").as("__c")),
      checkpointDir, eager = true)
    def assign(c: DataFrame): DataFrame = vecs
      .crossJoin(broadcast(c))
      .withColumn("__d2",
        dot(col("__v"), col("__v")) - lit(2.0) * dot(col("__v"), col("__c"))
          + dot(col("__c"), col("__c")))
      .groupBy(col("__id"))
      .agg(min(struct(col("__d2"), col("__cl"))).as("__best"))
      .select(col("__id"), col("__best.__cl").as("cluster"),
        col("__best.__d2").as("dist2"))
    for (_ <- 1 until iterations) {
      val assigned = assign(cent)
      cent = assigned
        .join(vecs, Seq("__id"))
        .select(col("cluster").as("__cl"),
          posexplode(col("__v")).as(Seq("__dim", "__comp")))
        .groupBy(col("__cl"), col("__dim"))
        .agg(avg(col("__comp")).as("__m"))
        .groupBy(col("__cl"))
        .agg(array_sort(collect_list(struct(col("__dim"), col("__m"))))
          .as("__sm"))
        .select(col("__cl"),
          transform(col("__sm"), s => s.getField("__m")).as("__c"))
      cent = Ckpt.cut(cent, checkpointDir)
    }
    assign(cent)
      .select(col("__id").as(idCol), col("cluster"),
        round(col("dist2"), 6).as("dist2"))
      .orderBy(idCol)
  }

  /** External cluster validation of [[kmeans]] against a ground-truth
    * label column: purity (Σ per-cluster majority-label counts / n —
    * "how homogeneous is each cluster") and MI/NMI between assignment
    * and label (the symmetric view purity can't give: a clustering that
    * shatters one label across many pure clusters scores purity 1 but
    * low NMI). The "did unsupervised structure find the labels" gate
    * before trusting clusters for curation or stratification.
    *
    * Purity is exact integers + one division; MI/NMI reuse
    * [[Stats.mutualInfo]]'s fold verbatim over the (cluster, label)
    * contingency. One wide row.
    */
  def clusterPurity(emb: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, k: Int,
                    iterations: Int): DataFrame = {
    val asg = kmeans(emb, idCol, vecCol, k, iterations)
      .select(col(idCol), col("cluster"))
    val lab = emb.select(col(idCol),
      col(labelCol).cast("string").as("__label"))
    val rows = asg.join(lab, Seq(idCol))
    val perCluster = rows
      .groupBy(col("cluster"), col("__label"))
      .agg(count(lit(1)).as("__nxy"))
      .groupBy(col("cluster"))
      .agg(max(col("__nxy")).as("__mx"), sum(col("__nxy")).as("__sz"))
    val purity = perCluster.agg(
      sum(col("__sz")).cast("long").as("n"),
      count(lit(1)).cast("int").as("n_clusters"),
      round(sum(col("__mx")).cast("double") /
        sum(col("__sz")).cast("double"), 6).as("purity"))
    purity.crossJoin(broadcast(
      Stats.mutualInfo(rows, "cluster", "__label")))
  }

  /** Cluster-balanced diverse sampling: run [[kmeans]], then take a
    * seeded per-cell quota — the structure-aware downsample that keeps
    * every region of embedding space represented where a uniform
    * sample follows the density (SemDeDup's complement: that removes
    * redundancy pairwise, this enforces coverage globally). The pick
    * inside each cell is the channel-keyed [[Gen.u01]] hash order with
    * id tiebreak — reproducible, engine-replayable, and independent of
    * the corpus partitioning.
    */
  def diverseSample(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int, iterations: Int, perCell: Int,
                    channel: Long = 131L): DataFrame = {
    require(perCell >= 1, s"diverseSample: perCell >= 1 (got $perCell)")
    val asg = kmeans(emb, idCol, vecCol, k, iterations)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("__u"), col(idCol))
    asg
      .withColumn("__u", round(Gen.u01(col(idCol), channel), 6))
      .withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= perCell)
      .select(col(idCol), col("cluster"), col("pick_rank"))
      .orderBy("cluster", "pick_rank")
  }

  /** Grid-density clustering (the cell-grid relaxation of DBSCAN) over
    * the first two embedding dimensions: hash points to eps-cells, call
    * a cell DENSE when it holds ≥ minPts points, union 8-adjacent dense
    * cells into clusters via distributed connected components, and
    * report each cluster — plus the sparse-cell noise remainder as
    * cluster_id −1 — as one (n_cells, n_points) summary row. Unlike
    * pairwise DBSCAN there is NO distance join anywhere: the only
    * corpus-sized stages are one cell aggregation and the groupings
    * that feed it — work scales with OCCUPIED CELLS (∝ data spread),
    * never points², the shape that survives 100 TB.
    *
    * Determinism: cell coords are floor(coord/eps) over doubles both
    * engines derive identically from the same stored floats; cell ids
    * are exact integer encodings (fail-loud when a coordinate leaves
    * the ±500 000-cell envelope); components are min-reachable-id via
    * [[Dedup.connectedComponents]]; every output is an integer count.
    *
    * Plan: one corpus aggregation to cells, a 9-offset explode +
    * EQUI-join for adjacency (bounded: dense cells only), log-bounded
    * CC supersteps over the tiny cell graph, two bounded folds.
    */
  def gridDensityClusters(emb: DataFrame, vecCol: String,
                          eps: Double, minPts: Int): DataFrame = {
    require(eps > 0.0, s"gridDensityClusters: eps > 0 (got $eps)")
    require(minPts >= 1 && minPts <= 1000000,
      s"gridDensityClusters: minPts in [1, 1e6] (got $minPts)")
    val half = 500000L
    val pts = emb.select(
      floor(element_at(col(vecCol), 1).cast("double") / eps).as("__cx"),
      floor(element_at(col(vecCol), 2).cast("double") / eps).as("__cy"))
    val cells = pts.groupBy(col("__cx"), col("__cy"))
      .agg(count(lit(1)).as("__n"))
    def cid(cx: Column, cy: Column): Column =
      when(abs(cx) >= half || abs(cy) >= half,
        raise_error(lit("gridDensityClusters: cell coordinate beyond " +
          "±500000 — eps too small for this coordinate range")))
        .otherwise((cx + lit(half)) * lit(2 * half * 2) + (cy + lit(half)))
    val dense = cells.filter(col("__n") >= minPts)
      .withColumn("__cell", cid(col("__cx"), col("__cy")))
      .localCheckpoint()
    val nbr = dense
      .select(col("__cell").as("__src"), col("__cx"), col("__cy"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("__dx"))
      .select(col("__src"), (col("__cx") + col("__dx")).as("__nx"),
        col("__cy"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("__dy"))
      .select(col("__src"), col("__nx"),
        (col("__cy") + col("__dy")).as("__ny"))
    val edges = nbr.join(
      dense.select(col("__cell").as("__dst"), col("__cx").as("__nx"),
        col("__cy").as("__ny")),
      Seq("__nx", "__ny"))
      .select(col("__src"), col("__dst"))
    val comp = Dedup.connectedComponents(edges, "__src", "__dst")
    val clusters = dense.join(comp, dense("__cell") === comp("id"))
      .groupBy(col("component").as("cluster_id"))
      .agg(count(lit(1)).as("n_cells"), sum(col("__n")).as("n_points"))
    val noise = cells.filter(col("__n") < minPts)
      .groupBy().agg(count(lit(1)).as("n_cells"),
        coalesce(sum(col("__n")), lit(0L)).as("n_points"))
      .select(lit(-1L).as("cluster_id"), col("n_cells"), col("n_points"))
    clusters.select(col("cluster_id"), col("n_cells"), col("n_points"))
      .unionByName(noise)
      .orderBy("cluster_id")
  }
}
