package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on DataFrames — PageRank as the reference
  * shape (connected components live in [[Dedup]]). One superstep = one
  * equi-join of the edge list against the current rank vector plus one
  * keyed aggregation — the Pregel pattern expressed declaratively, with
  * Catalyst free to pick shuffle-hash vs broadcast per superstep.
  *
  * Scale posture: the rank vector is one row per NODE (orders of
  * magnitude below the edge list); each superstep shuffles contributions
  * on the destination key with map-side partial sums. Lineage is
  * truncated per superstep with `localCheckpoint` exactly like the
  * [[Dedup]] label-propagation loop (swap `checkpoint` on a cluster).
  */
object Graph {

  /** Damped PageRank over a DIRECTED edge list for a fixed number of
    * supersteps (fixed iteration count keeps the result deterministic and
    * engine-replayable — no float-tolerance convergence test). Dangling
    * nodes (out-degree 0) redistribute their mass uniformly each step,
    * the standard stochastic-matrix completion, so total rank stays 1.
    *
    * For an undirected graph, pass both edge directions.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"pageRank: iterations in [1, 50] (got $iterations)")
    require(damping > 0.0 && damping < 1.0,
      s"pageRank: damping in (0, 1) (got $damping)")
    // lazy checkpoints: both materialize during the single deg.count()
    // action below instead of paying one eager pass each
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val deg = nodes.join(
        e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("out_deg"), lit(0L)).as("out_deg"))
      .localCheckpoint(eager = false)
    val nN = deg.count() // bounded: one long, drives the 1/N literals
    var pr = deg.withColumn("rank", lit(1.0 / nN))
    for (_ <- 1 to iterations) {
      val dangling = pr.filter(col("out_deg") === 0)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val contribs = e
        .join(pr.select(col("node").as("src"), col("rank"), col("out_deg")),
          Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("out_deg")).as("__in"))
      pr = deg
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .withColumn("rank",
          lit((1.0 - damping) / nN) + lit(damping) *
            (coalesce(col("__in"), lit(0.0)) + col("__dm") / lit(nN.toDouble)))
        .select(col("node"), col("out_deg"), col("rank"))
        .localCheckpoint(eager = false)
    }
    pr.select(col("node"), col("out_deg"), round(col("rank"), 6).as("pagerank"))
      .orderBy("node")
  }
}
