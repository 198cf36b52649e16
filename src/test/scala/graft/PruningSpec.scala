package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.Sources

/** The offline-store read path actually PRUNES: the date predicate lands in
  * the scan's PartitionFilters, not a post-scan Filter.
  */
class PruningSpec extends SparkSpec {

  test("single-date read prunes to one partition directory") {
    val withDate = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
    val root = Sources.writeOfflineStore(withDate, "event_date")
    val df = Sources.readPartition(spark, root, "event_date", "2024-01-15")
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "date predicate must be a partition filter")
    // pruned listing touches strictly fewer files than the full store
    val pruned = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).map(_.files.size).sum
    val total = scan.relation.location
      .listFiles(Nil, Nil).map(_.files.size).sum
    assert(pruned < total && pruned > 0, s"pruned=$pruned total=$total")
  }
}
