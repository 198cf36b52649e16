package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Materialize, Retrieval, WindowAgg}

/** Shuffle-count regression guard for flagship operator shapes: the
  * documented "one keyed shuffle per aggregation/join" posture, asserted
  * against the POST-EnsureRequirements plan so a future refactor that
  * quietly adds an exchange (or degrades a broadcast join to a shuffled
  * one) fails HERE, not in a 100 TB run. AQE is disabled per-count so the
  * plan is a plain walkable tree (same discipline as AsOfNativeSpec /
  * PlanAudit).
  */
class PlanRegressionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def countNodes(df: DataFrame): (Int, Int) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var shuffles = 0; var sorts = 0
    try df.queryExecution.executedPlan.foreach {
      case _: ShuffleExchangeExec => shuffles += 1
      case _: SortExec => sorts += 1
      case _ =>
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    (shuffles, sorts)
  }

  test("latestPerKey: exactly ONE hash shuffle (max-struct partial agg, " +
      "never a window's single global sort)") {
    val (shuffles, sorts) = countNodes(
      Materialize.latestPerKey(Tables.orders(spark, dir), "o_custkey",
        "o_orderdate", "o_orderkey"))
    assert(shuffles == 1, s"latestPerKey shuffles=$shuffles")
    // max(struct) plans as SortAggregate: its two Sorts (partial + final)
    // are PARTITION-LOCAL pre-agg sorts, not a global single-task sort —
    // the thing this guard exists to forbid is a range exchange (window
    // formulation), which would show as a second shuffle above
    assert(sorts <= 2, s"latestPerKey sorts=$sorts")
  }

  test("enrichment join: ZERO shuffles — every dimension broadcasts") {
    val e = graft.ops.Parse.parseEvents(Tables.events(spark, dir))
      .withColumn("c_custkey", col("user_id") % 150 + 1)
    val (shuffles, _) = countNodes(
      Retrieval.enrich(e, Tables.customer(spark, dir), "c_custkey"))
    assert(shuffles == 0, s"enrich shuffles=$shuffles (dim stopped " +
      "broadcasting?)")
  }

  test("exact dedup: one fingerprint shuffle (plus only the export sort)") {
    val (shuffles, _) = countNodes(
      Dedup.exact(Tables.documents(spark, dir), "doc_id", "text"))
    // one hash exchange for the fingerprint group; orderBy may add one
    // range exchange for the deterministic export — nothing else
    assert(shuffles <= 2, s"exactDedup shuffles=$shuffles")
    assert(shuffles >= 1, "exactDedup must still group by fingerprint")
  }

  test("flagship hourly features: one keyed shuffle + the export sort, " +
      "no Expand explosion beyond the distinct") {
    val (shuffles, _) = countNodes(
      WindowAgg.hourlyFeatures(
        graft.ops.Parse.parseEvents(Tables.events(spark, dir))))
    // hash exchange for the keyed agg (countDistinct may add its own
    // expand/exchange stage) + range exchange for the final orderBy
    assert(shuffles <= 3, s"hourlyFeatures shuffles=$shuffles")
  }

  test("BPE encode path: ZERO shuffles — merges ride in the expression") {
    val merges = Seq(("e", "r"), ("o", "r"), ("er", "s"))
    val (shuffles, sorts) = countNodes(
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          graft.ops.Bpe.encode(col("text"), merges).as("toks")))
    assert(shuffles == 0, s"bpeEncode shuffles=$shuffles (merge table " +
      "stopped riding in the expression?)")
    assert(sorts == 0, s"bpeEncode sorts=$sorts")
  }

  test("sharedSpans: bounded exchanges — native winnow keeps the " +
      "corpus-sized stage narrow") {
    val (shuffles, _) = countNodes(
      graft.ops.TextAnalysis.sharedSpans(Tables.documents(spark, dir),
        "doc_id", "text", k = 32, w = 16, maxDf = 5))
    // fingerprint distinct + df window + pair agg + export sort, plus
    // the winner→text join's two sides; the thing to forbid is the old
    // per-gram window formulation (per-doc exchange of the corpus-sized
    // gram table) creeping back in on TOP of these
    assert(shuffles <= 7, s"sharedSpans shuffles=$shuffles")
  }

  test("normalizeText: ZERO shuffles before the export sort — a pure " +
      "narrow projection (native NFC + regex strips)") {
    val (shuffles, _) = countNodes(
      graft.ops.TextAnalysis.normalizeText(Tables.documents(spark, dir),
        "doc_id", "text"))
    // only the deterministic-export range exchange is allowed
    assert(shuffles <= 1, s"normalizeText shuffles=$shuffles")
  }

  test("logisticGD: corpus-sized stages shuffle only at (dim) grain — " +
      "weight/gradient frames stay broadcast (no shuffled join of the " +
      "corpus against the model)") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try graft.ops.Learn.logisticGD(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        col("label") >= 5, eta = 0.5, iterations = 2)
      .queryExecution.executedPlan
    finally spark.conf.unset("spark.sql.adaptive.enabled")
    var smj = 0
    plan.foreach { case _: SortMergeJoinExec => smj += 1; case _ => }
    assert(smj == 0, s"logisticGD sort-merge joins=$smj (model frame " +
      "stopped broadcasting?)")
  }

  test("mixtureWaterfill: one corpus aggregation shuffle; everything " +
      "after runs on the bounded per-domain frame") {
    val (shuffles, _) = countNodes(
      graft.ops.Sampling.mixtureWaterfill(
        Tables.documents(spark, dir), "text", "source",
        expr("CAST(substring(domain, 4) AS INT) + 1"),
        budgetFraction = 1.2, epochCap = 2.0))
    // corpus groupBy(domain) partial+final = 1 exchange; the bounded
    // domain frame then passes through the single-partition window and
    // 1-row level aggregates (their exchanges move tens of rows) and
    // the export sort. The corpus itself must shuffle exactly once.
    assert(shuffles <= 6, s"mixtureWaterfill shuffles=$shuffles")
    assert(shuffles >= 1, "mixtureWaterfill must aggregate per domain")
  }
}
