package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and split operators for training-data pipelines
  * (SURVEY.md §7.4 extension set): hash splits, exact stratified sampling,
  * per-group quota caps, and a uniform fixed-size sample.
  *
  * All randomness is the shared cross-engine minstd hash ([[Gen.u01]]), so
  * every operator is reproducible run-to-run AND DuckDB-oracle checkable —
  * the property a training pipeline needs for leak-free, re-derivable
  * splits at any scale.
  *
  * Scale posture:
  * - `splitAssign` is a narrow map (no shuffle): each key's split depends
  *   only on its own hash, so assignments are stable when the corpus grows
  *   — new data never reshuffles an existing key across the train/test
  *   boundary;
  * - `stratifiedSample` shuffles once on the stratum key; the per-stratum
  *   rank is a window, partition-local after that shuffle;
  * - `quotaCap` is the same single-shuffle shape keyed by group;
  * - `uniformSample` is a TakeOrdered — O(n) heap per partition, one
  *   driver merge of 32·n rows, NO global sort and no shuffle.
  */
object Sampling {

  /** Label every row with a split name from the u01 of its key.
    * `splits` = (name, cumulative upper bound ∈ (0,1]), e.g.
    * `Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0)`.
    */
  def splitAssign(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  channel: Long = 31L): DataFrame = {
    val u = Gen.u01(col(keyCol), channel)
    df.withColumn("split",
      splits.init.foldRight(lit(splits.last._1): Column) {
        case ((name, ub), acc) => when(u <= ub, name).otherwise(acc)
      })
  }

  /** Exact stratified sample: ceil(fraction·|stratum|) rows from EVERY
    * stratum, picked by hash order within the stratum — rare strata never
    * vanish the way they can under global-uniform sampling.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       fraction: Double, channel: Long = 33L): DataFrame = {
    val pick = Window.partitionBy(col(stratumCol))
      .orderBy(Gen.u01(col(keyCol), channel), col(keyCol))
    val whole = Window.partitionBy(col(stratumCol))
    df.withColumn("__rn", row_number().over(pick))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rn") <= ceil(col("__n") * fraction))
      .drop("__rn", "__n")
  }

  /** Per-group quota cap: at most `n` rows per group, highest-priority
    * first (`orderCols` must be a total order — tiebreak on a unique id).
    * The standard per-domain cap that stops one crawl domain from
    * dominating a training corpus.
    */
  def quotaCap(df: DataFrame, groupCol: String, orderCols: Seq[Column],
               n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Uniform fixed-size sample without replacement: the `n` smallest rows
    * by keyed hash. Equivalent in distribution to a seeded reservoir, but
    * deterministic, mergeable, and executed as TakeOrdered.
    */
  def uniformSample(df: DataFrame, keyCol: String, n: Int,
                    channel: Long = 35L): DataFrame =
    df.orderBy(Gen.u01(col(keyCol), channel), col(keyCol)).limit(n)

  /** Mixture sampling: draw a corpus whose stratum proportions match a
    * TARGET mixture (the data-mixing step of a training pipeline — e.g.
    * 70% english / 30% rest regardless of the raw crawl mix). Per-stratum
    * quota = floor(share·totalN); rows picked by hash order within the
    * stratum, so the draw is deterministic and stable. Strata with fewer
    * rows than their quota contribute everything they have (the shortfall
    * is reported by comparing output counts to quotas downstream).
    */
  def mixtureSample(df: DataFrame, stratumCol: String, keyCol: String,
                    targetShares: Seq[(String, Double)], totalN: Long,
                    channel: Long = 37L): DataFrame = {
    val quota = targetShares.foldRight(lit(0L): Column) {
      case ((s, share), acc) =>
        when(col(stratumCol) === s,
          lit(math.floor(share * totalN).toLong)).otherwise(acc)
    }
    val pick = Window.partitionBy(col(stratumCol))
      .orderBy(Gen.u01(col(keyCol), channel), col(keyCol))
    df.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Sequence packing: assign documents to fixed-budget training packs —
    * per group (e.g. language), documents in deterministic id order, pack
    * id = floor(tokens-before-this-doc / maxTokens). The standard
    * streaming-concat packing approximation: every pack holds consecutive
    * docs and at least one doc, a doc straddling a boundary spills into
    * the next pack. One shuffle on the group key; the running sum is a
    * bounded ROWS window.
    */
  def packSequences(docs: DataFrame, groupCol: String, idCol: String,
                    tokenCol: String, maxTokens: Long): DataFrame = {
    val order = Window.partitionBy(col(groupCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum_tokens", sum(col(tokenCol).cast("long")).over(order))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col(tokenCol)) / maxTokens).cast("int"))
      .select(col(groupCol), col(idCol), col(tokenCol).cast("int").as(tokenCol),
        col("cum_tokens"), col("pack_id"))
  }
}
