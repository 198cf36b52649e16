package graft

import graft.oracle._

/** DuckDB oracle SQL for every SQL-expressible query in SparkEntry.queries.
  *
  * Authoring rules (SURVEY.md §5.3 + empirically verified parity):
  * - column names/aliases identical to the Spark output (driver sorts
  *   columns by name before hashing);
  * - every output fully ORDER BY'd; every double `round`ed (Spark's double
  *   round and DuckDB's both round the shortest-decimal representation
  *   half-away-from-zero — verified identical);
  * - DuckDB `sum(BIGINT)` returns HUGEINT and `len()` returns BIGINT —
  *   always cast back to BIGINT / INTEGER to match Spark's long / int;
  * - ratios guarded with CASE (Spark 4 ANSI mode ⇒ the Spark side guards
  *   with `when`, producing NULL, same as DuckDB NULL division);
  * - `time_bucket` is epoch-aligned exactly like Spark's `window()`;
  * - sliding windows expand via CROSS JOIN generate_series(0,5): each event
  *   belongs to precisely the 6 10-min-aligned windows covering it.
  */
object OracleSql {
  /** Union of the six domain oracle maps (split mirrors registry/). The
    * require proves no key is defined twice across files — a duplicate
    * would silently shadow a query's oracle.
    */
  val all: Map[String, String] = {
    val parts = Seq(CoreOracleSql.sql, SourcesOracleSql.sql,
      CurationOracleSql.sql, TextOracleSql.sql, SimilarityOracleSql.sql,
      AnalyticsOracleSql.sql)
    val merged = parts.reduce(_ ++ _)
    require(merged.size == parts.map(_.size).sum,
      "duplicate oracle keys across domain files")
    merged
  }
}
