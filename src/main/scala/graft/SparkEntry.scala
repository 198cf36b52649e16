package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.registry._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator row of SURVEY.md §2 (S/P/A/J/T/Q/D/G groups) and the
  * §7.4 LLM-pipeline extensions is registered as a pure batch query over
  * the driver corpus, with an ANSI-SQL DuckDB oracle where the semantics
  * are SQL-expressible. Determinism rules (SURVEY.md §5.3): every output
  * is fully ordered, every double is `round`ed, every aggregate is
  * aliased identically in Spark and SQL, `first` is replaced by `min`,
  * and randomness is a multiplicative hash both engines compute.
  *
  * The registry itself lives in six domain slices under
  * `graft.registry` (Core / Sources / Curation / Text / Similarity /
  * Analytics — split in round 8, wiring only); this object assembles
  * them and fails loud on a duplicate query name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.ops.WindowAgg.hourlyFeatures(
      Shared.ev(spark, "/root/testdata/sf0.001"))

  private val slices: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(CoreRegistry.queries, SourcesRegistry.queries,
      CurationRegistry.queries, TextRegistry.queries,
      SimilarityRegistry.queries, AnalyticsRegistry.queries)

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.4). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = slices.reduce(_ ++ _)
    require(merged.size == slices.map(_.size).sum,
      "SparkEntry: duplicate query name across registry slices")
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops → driver
    * records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = OracleSql.all
}
