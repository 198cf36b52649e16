package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation rewrites — the classic salting moves a
  * 100 TB pipeline reaches for when AQE's runtime splitting is not
  * available (streaming state, disabled AQE) or not sufficient (one key
  * holding more than an executor's memory of rows):
  *
  *   0. [[saltedJoin]] — shared-key salting of the WHOLE fact side
  *      against a small replicated dimension (the simple form: no hot-key
  *      detection, dimension cost = buckets × |dim|).
  *   1. [[saltedDistinctAgg]] — exact `count(DISTINCT x)` per hot key as
  *      two shuffles of bounded width instead of one shuffle that lands
  *      every row of a hot key on one reducer. Spark's partial aggregation
  *      already spreads algebraic aggregates (sum/count/min/max) across
  *      mappers, but exact distinct is NOT algebraic: the dedup itself
  *      must shuffle, and salting by `hash(value) % n` keeps the dedup
  *      shuffle `n`-way parallel per key. Phase 1 groups by `(key, salt)`
  *      where the salt partitions the DISTINCT-VALUE space (per-salt
  *      distinct sets are disjoint, so their counts sum exactly); phase 2
  *      folds the bounded `(key, salt)` table.
  *   2. [[saltedHotKeyJoin]] — a shuffle join where the big probe side has hot
  *      keys: hot keys (found by the bounded Misra–Gries propose/verify
  *      pass in [[Frequency.heavyHitters]]) take a replicated path — the
  *      build side is exploded `nSalts` ways, the probe side tags a
  *      deterministic salt from its own bytes, and the join key becomes
  *      `(key, salt)` so one hot key spreads over `nSalts` reducers; cold
  *      keys take the plain join. The union is row-for-row the plain
  *      inner join (the DuckDB oracle replays the plain join).
  *
  * Both rewrites are pure plan transformations — no sampling, no loss;
  * results are exactly the un-salted answer.
  *
  * Reference anchor: the reference aggregates per event-type/user in
  * single-node pandas (`spark/apps/batch_generator.py:118-167`) where skew
  * cannot arise; on a cluster these are the rewrites that keep the same
  * queries alive when one key holds 1% of 100 TB.
  */
object Skew {

  /** Whole-side salting against a replicated dimension: the fact side
    * gets a deterministic salt in [0, buckets); the dimension side is
    * replicated `buckets` times; the join key becomes (key, salt). Each
    * hot key's rows spread over `buckets` tasks. Result is identical to
    * the plain join (SkewSpec) — replication is on the smaller side only,
    * so the cost is buckets × |dim|. For a dimension too big to replicate
    * wholesale, use [[saltedHotKeyJoin]] (replicates hot keys only).
    */
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
    salted.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Exact per-key `count(DISTINCT distinctCol)` via value-space salting.
    *
    * `salt = pmod(xxhash64(x), nSalts)` partitions distinct VALUES, never
    * rows: all copies of one value land in one salt bucket, different
    * values spread, so the sum of per-salt exact distincts is the exact
    * global distinct. Also carries `row_cnt` (algebraic, free in the same
    * pass) so the caller sees the skewed metric and the safe one together.
    */
  def saltedDistinctAgg(df: DataFrame, keyCol: String, distinctCol: String,
                        nSalts: Int): DataFrame = {
    require(nSalts >= 2 && nSalts <= 4096,
      s"saltedDistinctAgg: nSalts in [2, 4096] (got $nSalts)")
    df
      .withColumn("__salt", pmod(xxhash64(col(distinctCol)), lit(nSalts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count_distinct(col(distinctCol)).as("__part_distinct"),
        count(lit(1)).as("__part_rows"))
      .groupBy(col(keyCol))
      .agg(sum(col("__part_distinct")).cast("long").as("distinct_cnt"),
        sum(col("__part_rows")).cast("long").as("row_cnt"))
      .orderBy(keyCol)
  }

  /** Skew-split INNER equi-join: `probe` (big, possibly skewed on
    * `probeKey`) ⋈ `build` (replicable per hot key, not necessarily
    * broadcastable as a whole). Hot keys = keys holding ≥ `minShare` of
    * probe rows, proposed/verified by the bounded Misra–Gries pass — the
    * hot set is ≤ 1/minShare keys, so both membership tags broadcast.
    *
    * Hot path: build rows for hot keys are exploded `nSalts` ways; probe
    * rows tag `salt = pmod(xxhash64(saltBy), nSalts)`. The salt must be
    * DETERMINISTIC under task retries (a random or monotonic tag would
    * re-deal rows across salts on retry and break exactly-once shuffle
    * bookkeeping), so it hashes a caller-declared probe column — any
    * column with per-row variety; uniformity affects balance, never
    * correctness. Cold path: plain shuffle join, AQE free to broadcast.
    *
    * Both join keys are compared as strings (the [[Frequency]] key
    * domain), keeping the hot-set membership join type-exact.
    */
  def saltedHotKeyJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                       buildKey: String, saltBy: String, nSalts: Int,
                       minShare: Double): DataFrame = {
    require(nSalts >= 2 && nSalts <= 1024,
      s"saltedHotKeyJoin: nSalts in [2, 1024] (got $nSalts)")
    val hot = Frequency.heavyHitters(probe, probeKey, minShare)
      .select(col(probeKey).as("__hot_key"), lit(true).as("__hot"))
    val probeTagged = probe
      .join(broadcast(hot),
        probe(probeKey).cast("string") === col("__hot_key"), "left")
      .drop("__hot_key")
    val buildTagged = build
      .join(broadcast(hot),
        build(buildKey).cast("string") === col("__hot_key"), "left")
      .drop("__hot_key")
    val cold = probeTagged.filter(col("__hot").isNull).drop("__hot")
      .join(buildTagged.filter(col("__hot").isNull).drop("__hot"),
        col(probeKey) === col(buildKey))
    val buildHot = buildTagged.filter(col("__hot") === true).drop("__hot")
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    val probeHot = probeTagged.filter(col("__hot") === true).drop("__hot")
      .withColumn("__salt",
        pmod(xxhash64(col(saltBy)), lit(nSalts)).cast("int"))
    val hotJoined = probeHot
      .join(buildHot,
        probeHot(probeKey) === buildHot(buildKey) &&
          probeHot("__salt") === buildHot("__salt"))
      .drop("__salt")
    cold.unionByName(hotJoined)
  }
}
