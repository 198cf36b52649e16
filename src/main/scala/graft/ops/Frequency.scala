package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Heavy-hitter detection at corpus scale — the propose/verify shape
  * (like `Dedup.nearDupsVerified`): per-partition Misra-Gries summaries
  * propose a BOUNDED candidate set without ever shuffling the key space,
  * then one exact count over just the candidates verifies.
  *
  * Why not `groupBy(key).count` directly: at 100 TB with a high-cardinality
  * key (URLs, doc domains, user agents) the full groupBy shuffles every
  * distinct key; heavy hitters only need the few keys above a frequency
  * floor. Misra-Gries with k counters per partition guarantees any key
  * with GLOBAL count > N/(k+1) survives in at least one partition summary
  * (each MG decrement consumes k+1 stream items, so a key missing from
  * every summary has total count ≤ Σₚ nₚ/(k+1) = N/(k+1)). With
  * k = ceil(1/minShare), k+1 > 1/minShare, so every key at or above
  * `minShare·N` is proposed — the verify step then makes the output EXACT:
  * identical to the full groupBy + HAVING, at the cost of one narrow scan
  * + one aggregate over ≤ k·partitions candidate keys.
  *
  * The candidate set is ≤ k·numPartitions rows (a few thousand at any
  * scale) — broadcast to filter the counting scan, so the only shuffle
  * carries candidate-key rows.
  */
object Frequency {

  /** One Misra-Gries pass: candidate keys PLUS each partition's row count
    * (so the non-null total needs no second corpus scan). Output is tiny —
    * ≤ (k+1)·numPartitions rows — and cached for its two consumers.
    */
  private def mgSummary(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val keys = df.select(col(keyCol).cast("string").as(keyCol)).na.drop
    val enc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
      Encoders.scalaBoolean)
    keys.as(Encoders.STRING).mapPartitions { it =>
      // value type must be java.lang.Long: with scala Long the map's
      // get(absent) null would silently unbox to 0L and defeat the
      // null check (every key would look already-counted)
      val counters = new java.util.HashMap[String, java.lang.Long]()
      var n = 0L
      it.foreach { x =>
        n += 1
        val c = counters.get(x)
        if (c != null) counters.put(x, c + 1L)
        else if (counters.size < k) counters.put(x, 1L)
        else {
          // decrement-all: each pass consumes k+1 items of stream weight
          val iter = counters.entrySet().iterator()
          while (iter.hasNext) {
            val e = iter.next()
            if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      scala.jdk.CollectionConverters.SetHasAsScala(counters.keySet())
        .asScala.iterator.map(key => (key, 0L, false)) ++
        Iterator(("", n, true)) // per-partition total, key unused
    }(enc).toDF(keyCol, "cnt", "is_total").cache()
  }

  /** Per-partition Misra-Gries candidate keys for frequency floor `1/k`.
    * Exposed for the spec's bound assertion; use [[heavyHitters]].
    */
  def mgCandidates(df: DataFrame, keyCol: String, k: Int): DataFrame =
    mgSummary(df, keyCol, k).filter(!col("is_total"))
      .select(col(keyCol)).distinct()

  /** All keys with frequency ≥ `minShare` of the non-null total, with
    * exact counts and shares — result identical to
    * `GROUP BY key HAVING count >= minShare·N` (FrequencySpec asserts
    * equality under skew), ordered by count desc then key. Exactly two
    * corpus scans: the MG pass (which also accumulates the total) and
    * the candidate-count verify.
    */
  def heavyHitters(df: DataFrame, keyCol: String,
                   minShare: Double): DataFrame = {
    require(minShare > 0.0 && minShare <= 1.0,
      s"minShare must be in (0,1], got $minShare")
    val k = math.ceil(1.0 / minShare).toInt
    val keys = df.select(col(keyCol).cast("string").as(keyCol)).na.drop
    val summary = mgSummary(df, keyCol, k)
    val total = summary.filter(col("is_total"))
      .agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
    val cand = summary.filter(!col("is_total")).select(col(keyCol)).distinct()
    keys.join(broadcast(cand), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(minShare) * lit(total.toDouble))
      .withColumn("share", round(col("cnt") / lit(total.toDouble), 6))
      .orderBy(col("cnt").desc, col(keyCol))
  }

  /** Market-basket association rules: for item pairs co-occurring in at
    * least `minPairSupport` baskets, both directed rules A→B and B→A with
    * support, confidence = supp(A∪B)/supp(A), and lift =
    * conf / (supp(B)/N) — the co-purchase / co-click mining primitive.
    * Top-`k` rules by (lift desc, antecedent, consequent) — deterministic.
    *
    * Plan: distinct (basket, item) first (dedups repeated lines), then
    * pair generation is a SELF-EQUI-JOIN on the basket key with `a < b` —
    * per-basket bounded (a basket of m items yields m(m−1)/2 pairs, never
    * corpus²), the same bounded-pairs posture as the shingle dedup. Item
    * supports are one keyed agg; the basket total is a broadcast 1-row
    * fold; final top-k is TakeOrdered, not a global sort.
    */
  def basketRules(items: DataFrame, basketCol: String, itemCol: String,
                  minPairSupport: Long, k: Int,
                  maxBasketSize: Int = 10000): DataFrame = {
    require(minPairSupport >= 1 && k >= 1,
      s"basketRules: minPairSupport/k >= 1 (got $minPairSupport, $k)")
    // fail-loud pathological-basket guard (the dedupLines/sweepExact
    // posture): one 10⁶-item basket would silently cost 10¹² pairs. The
    // guard lives INSIDE the item column every downstream stage reads, so
    // column pruning can never elide it; its window shuffles on the same
    // basket key the pair join needs anyway.
    // one-exchange prep + pin (the cfKept pattern): clustering by the
    // basket key alone satisfies the (basket, item) dedup AND the guard
    // window, and the cleaned frame is referenced 4x (basket count,
    // item support, both pair-join sides) — pinned so the chain runs
    // once instead of per consumer
    val b = items.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .repartition(col("__bk"))
      .dropDuplicates("__bk", "__it")
      .withColumn("__sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__bk"))))
      .withColumn("__it",
        when(col("__sz") <= maxBasketSize, col("__it"))
          .otherwise(raise_error(concat(
            lit(s"basketRules: basket over $maxBasketSize items " +
              "(pair space is quadratic per basket): "),
            col("__bk").cast("string")))))
      .drop("__sz")
      .localCheckpoint(eager = false)
    val nBaskets = b.agg(countDistinct(col("__bk")).as("__nb"))
    val supp = b.groupBy(col("__it")).agg(count(lit(1)).as("__supp"))
    val pairs = b.as("l").join(b.as("r"),
        col("l.__bk") === col("r.__bk") && col("l.__it") < col("r.__it"))
      .groupBy(col("l.__it").as("__a"), col("r.__it").as("__b"))
      .agg(count(lit(1)).as("pair_support"))
      .filter(col("pair_support") >= minPairSupport)
    // both rule directions from the one unordered pair table
    val directed = pairs
      .select(col("__a").as("antecedent"), col("__b").as("consequent"),
        col("pair_support"))
      .unionByName(pairs.select(col("__b").as("antecedent"),
        col("__a").as("consequent"), col("pair_support")))
    directed
      .join(supp.select(col("__it").as("antecedent"),
        col("__supp").as("ante_support")), Seq("antecedent"))
      .join(supp.select(col("__it").as("consequent"),
        col("__supp").as("cons_support")), Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .withColumn("confidence",
        round(col("pair_support") / col("ante_support"), 6))
      .withColumn("lift", round(
        (col("pair_support") / col("ante_support")) /
          (col("cons_support") / col("__nb").cast("double")), 6))
      .select(col("antecedent"), col("consequent"), col("pair_support"),
        col("ante_support"), col("cons_support"), col("confidence"),
        col("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(k)
  }
}
