package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe join — explicit key salting for the hot-key case AQE's
  * skew-join split can't fix (a single key too large for ONE task even
  * after partition splitting, e.g. a null-like sentinel user or a
  * celebrity entity at 100 TB).
  *
  * The fact side gets a uniform salt in [0, buckets); the dimension side is
  * replicated `buckets` times; the join key becomes (key, salt). Each hot
  * key's rows now spread over `buckets` tasks. Result is identical to the
  * plain join (verified in SkewSpec) — replication is on the smaller side
  * only, so the cost is buckets × |dim|.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched dim row once per salt
    // replica — only fact-preserving join types are equivalent to the
    // plain join under replication
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(jt),
      s"saltedJoin supports fact-preserving join types only, got $joinType")
    // deterministic salt: spread rows without an RNG (partition-stable)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(buckets))
        .cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    val out = salted.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
    out
  }
}
