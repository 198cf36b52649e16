package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ordered-scan primitives.
  *
  * `prefixSum` is the classic two-level parallel prefix sum, expressed in
  * DataFrame operators: rows are range-partitioned into ordered slices,
  * every slice computes its local running sum in parallel, the per-slice
  * totals (one tiny row per (group, slice) — at most #shuffle-partitions
  * rows in all) are offset-scanned, and the offsets are broadcast back.
  * No single task ever sorts a whole group — the operation a naive
  * `sum() OVER (PARTITION BY group ORDER BY ...)` turns into one giant
  * sorted partition when a group dominates.
  *
  * Slicing cannot change the result: a prefix sum is slicing-invariant as
  * long as slices are in key order, which range partitioning on
  * (groups, order) guarantees (equal keys land in one slice). The slice id
  * is `spark_partition_id()` evaluated directly on the range-exchange
  * output — nondeterministic expressions are not pushed past exchanges, so
  * it is precisely the range-slice index.
  *
  * The sliced frame is MATERIALIZED (eager localCheckpoint) before its
  * two consumers read it, and this is a correctness requirement, not a
  * cache: the slice-totals aggregate and the final offset join both
  * consume the sliced assignment, and without materialization each
  * consumer re-executes the range exchange INDEPENDENTLY —
  * `spark_partition_id` is nondeterministic, which blocks exchange/stage
  * reuse, and `repartitionByRange` re-SAMPLES its bounds per execution
  * with a lineage-dependent seed, so the two executions can disagree
  * about where slices start. Local cums computed under one slicing and
  * offsets under another silently corrupt the scan (observed at sf0.1 in
  * round 8: x_heaps_law drifted mid-corpus). Checkpointing pins ONE
  * slicing for both reads; the storage cost is one pass of the scanned
  * frame, which the two-phase algorithm reads twice anyway.
  */
object Scan {

  /** Append `outCol` = running inclusive sum of `valueCol` over rows
    * ordered by `orderCol` within each group (no groups ⇒ one global
    * scan). `orderCol` must be a total order within each group (dedupe or
    * tiebreak first); `valueCol` must be integral (long) — integer sums
    * are associative bit-for-bit, so the sliced scan is exactly the
    * sequential one.
    */
  def prefixSum(df: DataFrame, groupCols: Seq[String], orderCol: Column,
                valueCol: Column, outCol: String): DataFrame = {
    val groups = groupCols.map(col)
    val nSlices = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val sliced = df
      .repartitionByRange(nSlices, groups :+ orderCol: _*)
      .withColumn("__slice", spark_partition_id())
      .localCheckpoint() // pin ONE slicing for both consumers (see above)
    val local = Window.partitionBy(groups :+ col("__slice"): _*)
      .orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = sliced
      .withColumn("__lcum", sum(valueCol.cast("long")).over(local))
    val sliceTotals = withLocal
      .groupBy(groups :+ col("__slice"): _*)
      .agg(sum(valueCol.cast("long")).as("__stot")) // not max(__lcum):
      // with negative values the running sum is not monotone, so the
      // slice TOTAL (its last running value) can be below the max
    val prior = Window.partitionBy(groups: _*).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliceTotals
      .withColumn("__off", coalesce(sum(col("__stot")).over(prior), lit(0L)))
      .drop("__stot")
    withLocal
      .join(broadcast(offsets), groupCols :+ "__slice")
      .withColumn(outCol, col("__lcum") + col("__off"))
      .drop("__slice", "__lcum", "__off")
  }
}
