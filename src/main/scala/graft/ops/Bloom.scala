package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi/anti-join pruning — the explicit runtime-filter
  * pattern for fact⋈dim joins where the dim side is selective but too big
  * (or too late in the plan) for Catalyst's automatic broadcast pruning.
  *
  * Shape: one tiny aggregate over the dim side builds a fixed-size bloom
  * filter (~1.2 MB for 10⁶ keys at 1% fpp — bounded by the FILTER size,
  * never by data volume), the filter rides broadcast inside a native
  * expression applied at the fact scan, and only the surviving rows reach
  * the join shuffle. At 100 TB this is the difference between shuffling
  * the whole fact table and shuffling ~the matching rows (+fpp). Spark's
  * AQE can inject the same thing opportunistically
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator
  * makes it explicit, deterministic, and available to DataFrame pipelines
  * that compute the dim side dynamically.
  *
  * Correctness: a bloom filter has false POSITIVES only, so the pruned
  * fact is a superset of the true matches ([[bloomPrune]] alone is the
  * "maybe" set). [[bloomSemiJoin]]/[[bloomAntiJoin]] follow the prune with
  * the exact join on the survivors, so their results equal the plain
  * semi/anti join bit for bit at ANY fpp (BloomSpec asserts both).
  */
object Bloom {

  /** Membership probe against the bloom filter carried inside the
    * expression (broadcast with the serialized expression, like
    * [[graft.functions.Native.NearestCentroid]]'s codebook). Integral
    * keys only — the operators cast to long first. NULL in ⇒ NULL out,
    * matching `IN (subquery)` three-valued logic.
    */
  case class BloomMightContain(child: Expression, bloom: BloomFilter)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any = input match {
      case l: Long  => bloom.mightContainLong(l)
      case i: Int   => bloom.mightContainLong(i.toLong)
      case s: Short => bloom.mightContainLong(s.toLong)
      case b: Byte  => bloom.mightContainLong(b.toLong)
      case other => throw new IllegalArgumentException(
        s"bloom probe needs an integral key, got ${other.getClass}")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "bloom_might_contain"
  }

  private def toExpr(c: Column): Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)
  private def toCol(e: Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  def mightContain(key: Column, bloom: BloomFilter): Column =
    toCol(BloomMightContain(toExpr(key.cast("long")), bloom))

  /** Build the key filter from the dim side. One aggregate job; the
    * result is O(expectedItems·log(1/fpp)) BITS regardless of dim row
    * count — size the capacity at the dim's distinct-key estimate (an
    * undersized filter stays correct, just prunes less).
    */
  def keyFilter(dim: DataFrame, dimKey: String, expectedItems: Long,
                fpp: Double): BloomFilter =
    dim.stat.bloomFilter(col(dimKey).cast("long"), expectedItems, fpp)

  /** The "maybe" set: every fact row whose key might be in `bloom`.
    * Superset of the true matches (false positives pass, NULL keys drop —
    * same as a semi join). Narrow filter, no shuffle.
    */
  def bloomPrune(fact: DataFrame, factKey: String,
                 bloom: BloomFilter): DataFrame =
    fact.filter(mightContain(col(factKey), bloom))

  /** Exact semi join with bloom pre-pruning: prune the fact scan, then
    * semi-join the survivors. Result ≡ `fact ⋉ dim` at any fpp; only the
    * maybe-set (true matches + fpp·|fact|) reaches the join shuffle.
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                    dimKey: String, expectedItems: Long = 1L << 20,
                    fpp: Double = 0.01): DataFrame = {
    val bf = keyFilter(dim, dimKey, expectedItems, fpp)
    bloomPrune(fact, factKey, bf)
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }

  /** Exact anti join with bloom short-circuit: a key the filter does NOT
    * contain is definitely absent from dim (no false negatives), so those
    * rows — the bulk of an anti join's output under a selective dim —
    * skip the join entirely; only the maybe-set is anti-joined for real.
    * NULL fact keys are definite non-matches (kept), as in `left_anti`.
    */
  def bloomAntiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                    dimKey: String, expectedItems: Long = 1L << 20,
                    fpp: Double = 0.01): DataFrame = {
    val bf = keyFilter(dim, dimKey, expectedItems, fpp)
    val maybe = mightContain(col(factKey), bf)
    val definiteMiss = fact.filter(!maybe || col(factKey).isNull)
    val checked = fact.filter(maybe)
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_anti")
    definiteMiss.unionByName(checked)
  }
}
