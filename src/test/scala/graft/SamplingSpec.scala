package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Gen, Sampling}

/** Deterministic split / sampling semantics. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0)

  /** The round-2 naive forms (full-stratum window rank) — kept here as the
    * semantic reference the scale-safe implementations must match exactly.
    */
  private def naiveStratified(df: DataFrame, stratum: String, key: String,
                              fraction: Double): DataFrame = {
    val pick = Window.partitionBy(col(stratum))
      .orderBy(Gen.u01(col(key), 33), col(key))
    val whole = Window.partitionBy(col(stratum))
    df.withColumn("__rn", row_number().over(pick))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rn") <= ceil(col("__n") * fraction))
      .drop("__rn", "__n")
  }

  private def naiveMixture(df: DataFrame, stratum: String, key: String,
                           shares: Seq[(String, Double)], totalN: Long): DataFrame = {
    val quota = shares.foldRight(lit(0L): org.apache.spark.sql.Column) {
      case ((s, share), acc) =>
        when(col(stratum) === s, lit(math.floor(share * totalN).toLong))
          .otherwise(acc)
    }
    val pick = Window.partitionBy(col(stratum))
      .orderBy(Gen.u01(col(key), 37), col(key))
    df.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  private def naivePack(df: DataFrame, grp: String, id: String, tok: String,
                        maxTokens: Long): DataFrame = {
    val order = Window.partitionBy(col(grp)).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tok).cast("long")).over(order))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col(tok)) / maxTokens).cast("int"))
      .select(col(grp), col(id), col(tok).cast("int").as(tok),
        col("cum_tokens"), col("pack_id"))
  }

  /** Scale assertion: every logical Window in the plan is bounded — either
    * partitioned on more than the stratum (packing slices), computed over an
    * Aggregate (histogram / slice totals: ≤ #buckets / #slices rows per
    * stratum), or computed over the boundary-bucket filter (≈ n/2²⁰ rows).
    * A window partitioned solely by the raw stratum over unfiltered input —
    * the round-2 scale killer — fails this.
    */
  private def assertNoFullStratumWindow(df: DataFrame): Unit = {
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected windows in the sampler plan")
    wins.foreach { w =>
      val overAggregate = w.child.collectFirst { case a: Aggregate => a }.isDefined
      val overBoundaryBucket = w.child.collectFirst {
        case f: Filter if f.condition.references.exists(_.name == "__bstar") => f
      }.isDefined
      assert(w.partitionSpec.size >= 2 || overAggregate || overBoundaryBucket,
        s"unbounded full-stratum window in plan:\n$w")
    }
  }

  test("splitAssign is exhaustive, disjoint, and roughly proportional") {
    val keys = spark.range(0, 10000).toDF("id")
    val out = Sampling.splitAssign(keys, "id", splits)
    assert(out.count() == 10000)
    val sizes = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    assert(math.abs(sizes("train") - 8000) < 300)
    assert(math.abs(sizes("val") - 1000) < 150)
    assert(math.abs(sizes("test") - 1000) < 150)
  }

  test("splitAssign is stable under corpus growth (no leakage on append)") {
    val before = Sampling.splitAssign(spark.range(0, 1000).toDF("id"), "id", splits)
      .as[(Long, String)].collect().toMap
    val after = Sampling.splitAssign(spark.range(0, 5000).toDF("id"), "id", splits)
      .as[(Long, String)].collect().toMap
    before.foreach { case (k, s) => assert(after(k) == s) }
  }

  test("stratified sample takes ceil(f*n) from EVERY stratum") {
    val df = Seq.tabulate(100)(i => (i.toLong, if (i < 90) "big" else "rare"))
      .toDF("id", "stratum")
    val out = Sampling.stratifiedSample(df, "stratum", "id", 0.1)
    val sizes = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(sizes("big") == 9)
    assert(sizes("rare") == 1) // the rare stratum survives
  }

  test("quota cap keeps at most n per group, highest priority first") {
    val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "a", 30), (4L, "b", 5))
      .toDF("id", "grp", "score")
    val out = Sampling.quotaCap(df, "grp",
        Seq(col("score").desc, col("id").asc), 2)
      .select("id").as[Long].collect().toSet
    assert(out == Set(3L, 2L, 4L)) // a keeps its top-2 scores, b keeps its 1
  }

  test("mixture sample hits the target proportions exactly when supply allows") {
    val df = (Seq.tabulate(500)(i => (i.toLong, "en")) ++
      Seq.tabulate(500)(i => ((i + 1000).toLong, "de")) ++
      Seq.tabulate(10)(i => ((i + 5000).toLong, "rare")))
      .toDF("id", "src")
    val out = Sampling.mixtureSample(df, "src", "id",
      Seq("en" -> 0.7, "de" -> 0.2, "rare" -> 0.1), totalN = 100)
    val sizes = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(sizes("en") == 70 && sizes("de") == 20)
    assert(sizes("rare") == 10) // supply exactly meets quota
    // undersupplied stratum contributes everything it has
    val short = Sampling.mixtureSample(df, "src", "id",
      Seq("rare" -> 1.0), totalN = 100)
    assert(short.count() == 10)
  }

  test("sequence packing: consecutive docs per pack, budget respected at boundaries") {
    val df = Seq(
      ("en", 1L, 1000), ("en", 2L, 800), ("en", 3L, 500), ("en", 4L, 2000),
      ("de", 10L, 3000)
    ).toDF("lang", "doc_id", "n_tokens")
    val out = Sampling.packSequences(df, "lang", "doc_id", "n_tokens", 2048L)
      .select("doc_id", "pack_id").as[(Long, Int)].collect().toMap
    assert(out(1L) == 0 && out(2L) == 0)  // 1000 + 800 fit pack 0
    assert(out(3L) == 0)                  // starts at 1800 < 2048 (spills)
    assert(out(4L) == 1)                  // starts at 2300 -> pack 1
    assert(out(10L) == 0)                 // other group packs independently
  }

  test("scale-safe stratified sample ≡ naive full-window rank (skewed strata)") {
    // one dominant stratum (the 100 TB failure mode) + a rare one
    val df = (Seq.tabulate(5000)(i => (i * 17L % 100003L, "dominant")) ++
      Seq.tabulate(40)(i => ((i + 900000).toLong, "rare")))
      .toDF("id", "stratum")
    for (f <- Seq(0.07, 0.5, 1.0)) {
      val fast = Sampling.stratifiedSample(df, "stratum", "id", f)
        .as[(Long, String)].collect().toSet
      val slow = naiveStratified(df, "stratum", "id", f)
        .as[(Long, String)].collect().toSet
      assert(fast == slow, s"mismatch at fraction $f")
    }
  }

  test("scale-safe mixture sample ≡ naive quota rank, unlisted strata dropped") {
    val df = (Seq.tabulate(3000)(i => (i.toLong * 31 % 999983, "en")) ++
      Seq.tabulate(300)(i => ((i + 700000).toLong, "de")) ++
      Seq.tabulate(50)(i => ((i + 800000).toLong, "zz")))
      .toDF("id", "src")
    val shares = Seq("en" -> 0.8, "de" -> 0.2)
    val fast = Sampling.mixtureSample(df, "src", "id", shares, 500)
      .as[(Long, String)].collect().toSet
    val slow = naiveMixture(df, "src", "id", shares, 500)
      .as[(Long, String)].collect().toSet
    assert(fast == slow)
    assert(!fast.exists(_._2 == "zz"))
  }

  test("distributed-prefix-sum packing ≡ naive group-wide running sum") {
    // enough rows that every test slice (4 shuffle partitions) holds a chunk
    // of the dominant group, so the offset path is genuinely exercised
    val df = (Seq.tabulate(2000)(i => ("en", i.toLong, 100 + i % 700)) ++
      Seq.tabulate(60)(i => ("de", i.toLong, 500 + i)))
      .toDF("lang", "doc_id", "n_tokens")
    val fast = Sampling.packSequences(df, "lang", "doc_id", "n_tokens", 4096L)
      .as[(String, Long, Int, Long, Int)].collect().toSet
    val slow = naivePack(df, "lang", "doc_id", "n_tokens", 4096L)
      .as[(String, Long, Int, Long, Int)].collect().toSet
    assert(fast == slow)
  }

  test("NULL strata and NULL keys survive the histogram selection like the naive rank") {
    val df = (Seq.tabulate(200)(i => (Some(i.toLong), Some("a"))) ++
      Seq.tabulate(60)(i => (Some((i + 1000).toLong), None: Option[String])) ++
      Seq.tabulate(8)(_ => (None: Option[Long], Some("a"))))
      .toDF("id", "stratum")
    for (f <- Seq(0.25, 1.0)) {
      val fast = Sampling.stratifiedSample(df, "stratum", "id", f)
        .as[(Option[Long], Option[String])].collect()
      val slow = naiveStratified(df, "stratum", "id", f)
        .as[(Option[Long], Option[String])].collect()
      // null-key rows are interchangeable under the rank (their sort keys
      // tie), so compare per-stratum sizes plus the exact non-null-key set
      assert(fast.length == slow.length, s"row count at fraction $f")
      assert(fast.groupBy(_._2).view.mapValues(_.length).toMap ==
        slow.groupBy(_._2).view.mapValues(_.length).toMap)
      assert(fast.filter(_._1.isDefined).toSet ==
        slow.filter(_._1.isDefined).toSet)
    }
  }

  test("hashed quota cap: at most n per group, skew-proof, deterministic") {
    val df = (Seq.tabulate(3000)(i => (i.toLong, "hot")) ++
      Seq.tabulate(10)(i => ((i + 50000).toLong, "cold")) ++
      Seq.tabulate(2)(i => ((i + 90000).toLong, "tiny")))
      .toDF("id", "grp")
    val out = Sampling.quotaCapHashed(df, "grp", "id", 5)
    val sizes = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(sizes("hot") == 5 && sizes("cold") == 5 && sizes("tiny") == 2)
    // deterministic and a subset of the input
    val again = Sampling.quotaCapHashed(df, "grp", "id", 5)
      .as[(Long, String)].collect().toSet
    assert(again == out.as[(Long, String)].collect().toSet)
    assertNoFullStratumWindow(out)
  }

  test("sampler plans contain no unbounded full-stratum window") {
    val df = Seq.tabulate(500)(i => (i.toLong, if (i % 9 == 0) "a" else "b"))
      .toDF("id", "stratum")
    assertNoFullStratumWindow(
      Sampling.stratifiedSample(df, "stratum", "id", 0.2))
    assertNoFullStratumWindow(
      Sampling.mixtureSample(df, "stratum", "id", Seq("a" -> 0.5, "b" -> 0.5), 100))
    val docs = Seq.tabulate(500)(i => ("en", i.toLong, 100)).toDF("lang", "doc_id", "n_tokens")
    assertNoFullStratumWindow(
      Sampling.packSequences(docs, "lang", "doc_id", "n_tokens", 2048L))
  }

  test("prefix sum is exact with negative values (slice totals are sums, not maxes)") {
    val df = Seq.tabulate(500)(i =>
      ("g", i.toLong, if (i % 3 == 0) -7 else 5)).toDF("grp", "id", "v")
    val got = graft.ops.Scan.prefixSum(df, Seq("grp"), col("id"), col("v"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    var run = 0L
    (0 until 500).foreach { i =>
      run += (if (i % 3 == 0) -7 else 5)
      assert(got(i.toLong) == run, s"prefix sum wrong at $i")
    }
  }

  test("priority quota cap ≡ rank window on skewed groups, ties and all") {
    // hot group with heavy timestamp ties + cold groups
    val rows = (1 to 4000).map(i =>
      (i.toLong, 1L, 1700000000L + (i % 97))) ++           // hot, many ties
      (1 to 60).map(i => (10000L + i, (i % 5 + 2).toLong, 1700000000L + i))
    val df = rows.toDF("event_id", "user_id", "ts_s")
    val fast = Sampling.quotaCapByPriority(df, "user_id",
        priority = -col("ts_s"), tiebreak = -col("event_id"), n = 7)
      .as[(Long, Long, Long)].collect().toSet
    val slow = Sampling.quotaCap(df, "user_id",
        Seq(col("ts_s").desc, col("event_id").desc), 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(fast == slow)
    assertNoFullStratumWindow(Sampling.quotaCapByPriority(df, "user_id",
      -col("ts_s"), -col("event_id"), 7))
  }

  test("priority quota cap is exact for 64-bit priorities beyond 2^53") {
    // consecutive longs near 1.7e18 collapse to one double (ulp = 256):
    // bucketing may merge them, but the RANK must still use the original
    // long — with a double-cast __p the adversarial tiebreak would win
    val base = 1700000000000000000L
    val df = (0 until 100).map(i => (i.toLong, 1L, base + i))
      .toDF("id", "grp", "prio")
    val out = Sampling.quotaCapByPriority(df, "grp",
        priority = $"prio", tiebreak = -$"id", n = 5)
      .select("id").as[Long].collect().toSet
    assert(out == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("prefix-sum operators are invariant to the shuffle-partition count") {
    // Scan.prefixSum slices by spark.sql.shuffle.partitions — the OUTPUT
    // must not depend on how many slices the scan used
    val docs = (Seq.tabulate(900)(i => ("en", i.toLong, 50 + i % 311)) ++
      Seq.tabulate(70)(i => ("de", i.toLong, 40 + i)))
      .toDF("lang", "doc_id", "n_tokens")
    val w = Seq.tabulate(40)(i => (i.toLong, 0.5 + (i % 7) * 0.3))
      .toDF("k", "wt")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def at[T](n: Int)(f: => T): T =
      try { spark.conf.set("spark.sql.shuffle.partitions", n.toString); f }
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val pack3 = at(3)(Sampling.packSequences(docs, "lang", "doc_id",
      "n_tokens", 2048L).collect().toSet)
    val pack13 = at(13)(Sampling.packSequences(docs, "lang", "doc_id",
      "n_tokens", 2048L).collect().toSet)
    assert(pack3 == pack13)
    val pick3 = at(3)(graft.ops.Gen.weightedPick(w, "k", "wt", 3000)
      .as[(Long, Long)].collect().toSet)
    val pick13 = at(13)(graft.ops.Gen.weightedPick(w, "k", "wt", 3000)
      .as[(Long, Long)].collect().toSet)
    assert(pick3 == pick13)
  }

  test("uniform sample: exact size, deterministic across runs") {
    val df = spark.range(0, 1000).toDF("id")
    val a = Sampling.uniformSample(df, "id", 50).as[Long].collect().toList
    val b = Sampling.uniformSample(df, "id", 50).as[Long].collect().toList
    assert(a == b && a.size == 50 && a.distinct.size == 50)
  }

  test("scalable uniform sample selects exactly the TakeOrdered rows") {
    val df = spark.range(0, 5000).toDF("id")
    val takeOrdered = Sampling.uniformSample(df, "id", 400)
      .as[Long].collect().toSet
    val histogram = Sampling.uniformSampleScalable(df, "id", 400)
      .as[Long].collect().toSet
    assert(histogram == takeOrdered)
  }

  test("incremental exact dedup drops seen fingerprints, keeps batch-lowest id") {
    import graft.ops.Dedup
    val seen = Seq((1L, "alpha  beta"), (2L, "gamma")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALPHA BETA"),   // normalized dup of seen 1 -> dropped
      (11L, "delta"), (12L, "delta"), // intra-batch dup -> min id kept
      (13L, "epsilon")
    ).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(seen, batch, "doc_id", "text")
      .select("doc_id", "batch_copies").as[(Long, Long)].collect().toMap
    assert(out == Map(11L -> 2L, 13L -> 1L))
  }

  test("weightedSampleNoReplacement: exact n, weight-proportional, no zero picks") {
    val rows = (1L to 100L).map(k => (k, 5.0)) ++
      (101L to 200L).map(k => (k, 0.05)) ++
      (201L to 210L).map(k => (k, 0.0))      // excluded outright
    val df = rows.toDF("k", "w").repartition(4)
    val sel = Sampling.weightedSampleNoReplacement(df, "k", "w", 50)
      .collect().map(_.getLong(0))
    assert(sel.length == 50 && sel.distinct.length == 50)
    assert(sel.forall(_ <= 200), "zero-weight key selected")
    // 100:1 weight ratio: the heavy half must dominate the selection
    val heavy = sel.count(_ <= 100)
    assert(heavy >= 40, s"only $heavy/50 heavy picks")
    // deterministic for a fixed channel
    val again = Sampling.weightedSampleNoReplacement(df, "k", "w", 50)
      .collect().map(_.getLong(0))
    assert(sel.sorted.toSeq == again.sorted.toSeq)
  }

  test("corpusShuffle: complete, contiguous per-shard positions, " +
       "append-stable shard assignment") {
    val docs = (0L until 400L).toDF("doc_id")
    val out = Sampling.corpusShuffle(docs, "doc_id", nShards = 8)
      .as[(Long, Int, Long)].collect()
    // every doc exactly once, shards in range
    assert(out.length == 400 && out.map(_._1).distinct.length == 400)
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    // positions within each shard are exactly 1..|shard|
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // hash shards are roughly balanced (uniform over 8 shards, 400 docs)
    assert(out.groupBy(_._2).values.map(_.size).min > 20)
    // the shuffle actually decorrelates: within-shard order is not id order
    val firstShard = out.filter(_._2 == out.head._2).sortBy(_._3).map(_._1)
    assert(firstShard.toSeq != firstShard.sorted.toSeq)
    // append-stability: growing the corpus never reassigns an existing doc
    val grown = Sampling.corpusShuffle((0L until 800L).toDF("doc_id"),
        "doc_id", nShards = 8)
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(out.forall(r => grown(r._1) == r._2))
  }

  test("corpusShuffle ≡ naive scalar replay of the hash + rank") {
    def u01(key: Long, c: Long): Double = {
      val M = 2147483647L
      val h3 = ((key + c * 1000003L) % M) * 48271L % M * 48271L % M
      (h3 + 1).toDouble / M
    }
    val ids = 0L until 300L
    val expected = ids
      .map(id => (id, math.min(math.floor(u01(id, 71L) * 8).toInt, 7),
        u01(id, 72L)))
      .groupBy(_._2).toSeq.flatMap { case (shard, rows) =>
        rows.sortBy(r => (r._3, r._1)).zipWithIndex
          .map { case ((id, s, _), i) => (id, s, (i + 1).toLong) }
      }.sortBy(r => (r._2, r._3)).toList
    val got = Sampling.corpusShuffle(ids.toDF("doc_id"), "doc_id", 8)
      .as[(Long, Int, Long)].collect().toList
    assert(got == expected)
  }

  test("corpusShuffleRelation ≡ corpusShuffle modulo the export sort") {
    val docs = (0L until 500L).toDF("doc_id")
    val rel = Sampling.corpusShuffleRelation(docs, "doc_id", 8)
      .as[(Long, Int, Long)].collect().toSet
    val ordered = Sampling.corpusShuffle(docs, "doc_id", 8)
      .as[(Long, Int, Long)].collect()
    assert(rel == ordered.toSet)
    // and the ordered form really is sorted by (shard, shard_pos)
    assert(ordered.map(r => (r._2, r._3)).sameElements(
      ordered.map(r => (r._2, r._3)).sortBy(identity)))
  }

  test("corpusShuffle fails loud when a shard exceeds maxShardRows") {
    val docs = (0L until 100L).toDF("doc_id")
    // materialize shard_pos: under a bare count() Catalyst prunes the rank
    // window AND the guard together — consistent, since the guard protects
    // exactly that window's single-task sort
    val e = intercept[Exception] {
      Sampling.corpusShuffleRelation(docs, "doc_id", nShards = 2,
        maxShardRows = 10L).agg(max("shard_pos")).head()
    }
    assert(e.getMessage.contains("corpusShuffle") ||
      Option(e.getCause).exists(_.getMessage.contains("corpusShuffle")))
    // generous bound → identical rows, guard invisible
    val ok = Sampling.corpusShuffleRelation(docs, "doc_id", nShards = 2,
      maxShardRows = 100L).agg(max("shard_pos")).head().getLong(0)
    assert(ok > 0L)
  }

  test("temporalSplit: inclusive cutoff trains, embargo quarantines, " +
      "after-embargo tests") {
    val df = Seq(
      (1L, "2024-01-14 23:59:59"), (2L, "2024-01-15 00:00:00"),
      (3L, "2024-01-15 00:00:01"), (4L, "2024-01-18 00:00:00"),
      (5L, "2024-01-18 00:00:01")
    ).toDF("id", "s").withColumn("ts", $"s".cast("timestamp_ntz"))
    val out = Sampling.temporalSplit(df, "ts", "2024-01-15 00:00:00", 3)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "train", 2L -> "train", 3L -> "embargo",
      4L -> "embargo", 5L -> "test"))
    // zero embargo degenerates to a plain two-way temporal split
    val none = Sampling.temporalSplit(df, "ts", "2024-01-15 00:00:00", 0)
      .filter($"split" === "embargo").count()
    assert(none == 0)
    intercept[IllegalArgumentException] {
      Sampling.temporalSplit(df, "ts", "2024-01-15 00:00:00", -1)
    }
  }

  test("groupKFold: one fold per group, all folds in range and populated, " +
      "stable under corpus growth") {
    val df = (1L to 2000L).map(i => (i, i % 200)).toDF("id", "grp")
    val out = Sampling.groupKFold(df, "grp", 5)
    // every group maps to exactly one fold
    assert(out.groupBy("grp").agg(countDistinct("fold").as("nf"))
      .filter($"nf" =!= 1).count() == 0)
    val folds = out.select("fold").distinct().as[Int].collect().toSet
    assert(folds.subsetOf((0 until 5).toSet) && folds.size == 5)
    // appending rows never migrates an existing group's fold
    val grown = Sampling.groupKFold(
      df.union((2001L to 3000L).map(i => (i, i % 400)).toDF("id", "grp")),
      "grp", 5)
    val before = out.select("grp", "fold").distinct().as[(Long, Int)]
      .collect().toMap
    val after = grown.select("grp", "fold").distinct().as[(Long, Int)]
      .collect().toMap
    assert(before.forall { case (g, f) => after(g) == f })
    intercept[IllegalArgumentException] { Sampling.groupKFold(df, "grp", 1) }
  }

  test("negativeDownsample: positives all kept, negative survival matches " +
      "the hash, weights unbias the class counts") {
    val df = (1L to 4000L).map(i => (i, i % 10 == 0)).toDF("id", "pos")
    val out = Sampling.negativeDownsample(df, "id", $"pos", 0.25)
    assert(out.filter($"label").count() == 400) // every positive survives
    // survivors are exactly the hash-selected negatives
    val expectNeg = df.filter(!$"pos")
      .filter(graft.ops.Gen.u01($"id", 89) <= 0.25).count()
    assert(out.filter(!$"label").count() == expectNeg)
    assert(out.filter($"label" && $"weight" =!= 1.0).count() == 0)
    assert(out.filter(!$"label" && $"weight" =!= 4.0).count() == 0)
    // weighted negative count estimates the true 3600 (within hash noise)
    val est = out.filter(!$"label").agg(sum("weight")).as[Double].head()
    assert(math.abs(est - 3600.0) / 3600.0 < 0.1)
    intercept[IllegalArgumentException] {
      Sampling.negativeDownsample(df, "id", $"pos", 0.0)
    }
  }

  test("budgetSample ≡ naive window cumsum; unbudgeted groups dropped") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"n_chars")
    val budgets = Map("en" -> 5000L, "de" -> 2000L)
    val out = Sampling.budgetSample(docs, "lang", "doc_id", "n_chars",
        budgets)
      .select("lang", "doc_id", "cum_cost")
      .as[(String, Long, Long)].collect().toSet
    val w = Window.partitionBy($"lang")
      .orderBy(graft.ops.Gen.u01($"doc_id", 47L), $"doc_id")
    val naive = docs.filter($"lang".isin("en", "de"))
      .withColumn("cum_cost", sum($"n_chars".cast("long")).over(w))
      .filter($"cum_cost" <= when($"lang" === "en", 5000L).otherwise(2000L))
      .select("lang", "doc_id", "cum_cost")
      .as[(String, Long, Long)].collect().toSet
    assert(out == naive)
    assert(out.nonEmpty && !out.exists(_._1 == "es")) // no budget, no rows
    // inclusive-prefix contract: within budget, nothing partial
    assert(out.groupBy(_._1).forall { case (lang, rows) =>
      rows.map(_._3).max <= budgets(lang)
    })
  }

  test("budgetSample: whole group fits a big budget; NULL cost excluded; " +
      "negative cost fails loud") {
    val df = Seq(
      (1L, "a", Some(10L)), (2L, "a", Some(20L)), (3L, "a", None)
    ).toDF("id", "g", "cost")
    val out = Sampling.budgetSample(df, "g", "id", "cost",
        Map("a" -> 1000000L))
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L)) // NULL-cost row unbudgetable, excluded
    val neg = Seq((1L, "a", -5L)).toDF("id", "g", "cost")
    val e = intercept[Exception] {
      Sampling.budgetSample(neg, "g", "id", "cost", Map("a" -> 10L))
        .collect()
    }
    assert(e.getMessage.contains("budgetSample") ||
      Option(e.getCause).exists(_.getMessage.contains("budgetSample")))
    intercept[IllegalArgumentException] {
      Sampling.budgetSample(df, "g", "id", "cost", Map.empty)
    }
  }

  test("rendezvous sharding: deterministic in-range assignment, balanced-" +
      "ish, and growing the ring moves docs ONLY to new shards") {
    val docs = spark.range(2000).toDF("id")
    val a = Sampling.rendezvousAssign(docs, "id", 8)
    val shards = a.groupBy("shard").count().collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("count")).toMap
    assert(shards.keySet.subsetOf((0 until 8).toSet))
    // 2000 docs over 8 shards: every shard used, no shard > 2x fair share
    assert(shards.size == 8 && shards.values.forall(c => c > 0 && c < 500))
    // determinism
    assert(Sampling.rendezvousAssign(docs, "id", 8).collect().toSet ==
      a.collect().toSet)

    val r = Sampling.rendezvousMovementReport(docs, "id", 8, 10)
      .collect().head
    assert(r.getAs[Long]("n_docs") == 2000L)
    val share = r.getAs[Double]("moved_share")
    // expected 2/10 = 0.2; allow generous sampling noise
    assert(share > 0.1 && share < 0.3, s"moved_share=$share")
    assert(r.getAs[Boolean]("moved_only_to_new"))
    intercept[IllegalArgumentException] {
      Sampling.rendezvousMovementReport(docs, "id", 8, 8)
    }
  }

  test("mixtureWaterfill: hand-computed level, cap set, and exact budget " +
      "conservation; all-capped edge; in-plan guards fail loud") {
    // supplies A=100 (across two docs), B=100, C=100 tokens; weights
    // 1/1/2; E=1; B=0.75*300=225. Prices: A=100, B=100, C=50 -> C caps
    // first; j=1 gives level (225-100)/(4-2)=62.5 with 50<=62.5<100.
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      ("A", doc(60)), ("A", doc(40)), ("B", doc(100)), ("C", doc(100))
    ).toDF("src", "text")
    val w = when(col("domain") === "C", 2.0).otherwise(1.0)
    val out = Sampling.mixtureWaterfill(docs, "text", "src", w,
        budgetFraction = 0.75, epochCap = 1.0)
      .select("domain", "supply_tokens", "water_level", "alloc_tokens",
        "epochs", "capped")
      .as[(String, Long, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 100L, 62.5, 62.5, 0.625, false)))
    assert(out("B") == (("B", 100L, 62.5, 62.5, 0.625, false)))
    assert(out("C") == (("C", 100L, 62.5, 100.0, 1.0, true)))
    assert(out.values.map(_._4).sum == 225.0) // allocations exhaust B

    // B = E*total exactly: every domain capped, level = max price
    val all = Sampling.mixtureWaterfill(docs, "text", "src", w,
        budgetFraction = 1.0, epochCap = 1.0)
      .select("water_level", "epochs", "capped")
      .as[(Double, Double, Boolean)].collect()
    assert(all.forall(r => r._1 == 100.0 && r._2 == 1.0 && r._3))

    // infeasible budget and nonpositive weight raise in-plan
    intercept[Exception] {
      Sampling.mixtureWaterfill(docs, "text", "src", w,
        budgetFraction = 1.5, epochCap = 1.0).collect()
    }
    intercept[Exception] {
      Sampling.mixtureWaterfill(docs, "text", "src",
        when(col("domain") === "C", -1.0).otherwise(1.0),
        budgetFraction = 0.5, epochCap = 1.0).collect()
    }
  }

  test("clusterAwareSplit: every near-dup cluster lands in ONE split; " +
      "singletons still hash independently; id-hash split straddles") {
    val docs = (1L to 200L).toDF("doc_id")
    // clusters {1..40} chained pairwise, plus {100, 101}
    val pairs = (1L until 40L).map(i => (i, i + 1)) :+ ((100L, 101L))
    val pairsDf = pairs.toDF("id_a", "id_b")
    val splits = Seq(("train", 0.8), ("val", 0.9), ("test", 1.0))
    val out = Sampling.clusterAwareSplit(docs, "doc_id", pairsDf, splits)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[String]("split")))
    assert(out.length == 200)
    // co-location: one split per component
    val perComp = out.groupBy(_._2).values
    assert(perComp.forall(_.map(_._3).distinct.length == 1))
    // the 40-doc chain is one component rooted at min id 1
    assert(out.filter(_._1 <= 40).forall(_._2 == 1L))
    // singletons use their own id as component
    assert(out.find(_._1 == 150L).get._2 == 150L)
    // all three splits occur over 161 surviving hash keys
    assert(out.map(_._3).distinct.toSet == Set("train", "val", "test"))
    // contrast: the naive id-keyed split DOES straddle the big cluster
    val naive = Sampling.splitAssign(docs.filter($"doc_id" <= 40),
        "doc_id", splits)
      .select("split").distinct().count()
    assert(naive > 1)
  }

  test("compactionPlan: contiguous fill by file id, bins never straddle " +
      "partitions, trailing residue flagged undersized") {
    val manifest = ((1L to 5L).map(f => ("p1", f, 3000L)) :+
      (("p2", 1L, 100L))).toDF("pt", "f", "b")
    val out = Sampling.compactionPlan(manifest, "pt", "f", "b", 4096L)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)].collect()
    val p1 = out.filter(_._1 == "p1").map(r => r._2 -> r).toMap
    // starts 0/3000/6000/9000/12000 -> bins 0,0,1,2,2
    assert(p1(1L)._5 == 0L && p1(2L)._5 == 0L)
    assert(p1(3L)._5 == 1L)
    assert(p1(4L)._5 == 2L && p1(5L)._5 == 2L)
    assert(p1(1L)._6 == 6000L && p1(1L)._7 == 2L && !p1(1L)._8)
    assert(p1(3L)._6 == 3000L && p1(3L)._8) // residue bin undersized
    // p2's lone tiny file is its own bin 0 — never merged across
    // partitions by this planner
    val p2 = out.filter(_._1 == "p2")
    assert(p2.toSeq == Seq(("p2", 1L, 100L, 100L, 0L, 100L, 1L, true)))
  }

  test("rakeWeights: a uniform table is an exact fixed point; a skewed " +
      "table converges to the uniform marginals") {
    val uniform = (for { r <- Seq("a", "b"); c <- Seq("x", "y") }
      yield (r, c)).toDF("r", "c")
    val u = Sampling.rakeWeights(uniform, "r", "c").collect()
    assert(u.forall(_.getAs[Double]("raked_weight") == 1.0))
    assert(u.forall(_.getAs[Double]("weight_ratio") == 1.0))
    // skewed: a-row holds 6 of 8 docs; raking must pull rows to 4 each
    val skew = (Seq.fill(5)(("a", "x")) ++ Seq(("a", "y")) ++
      Seq(("b", "x")) ++ Seq(("b", "y"))).toDF("r", "c")
    val s = Sampling.rakeWeights(skew, "r", "c").collect()
    val rowSums = s.groupBy(_.getAs[String]("r"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Double]("raked_weight")).sum }
    rowSums.values.foreach(v => assert(math.abs(v - 4.0) < 0.05, s"$rowSums"))
    intercept[IllegalArgumentException] {
      Sampling.rakeWeights(skew, "r", "c", iterations = 0)
    }
  }

  test("effectiveSampleSize: uniform weights score ESS = n, one heavy " +
      "weight collapses it, a negative weight nulls the statistic") {
    val uniform = Seq(1.0, 1.0, 1.0, 1.0).toDF("w")
    val u = Sampling.effectiveSampleSize(uniform, "w").collect().head
    assert(u.getAs[Long]("n") == 4L && u.getAs[Double]("ess") == 4.0)
    assert(u.getAs[Double]("ess_ratio") == 1.0)
    val heavy = Seq(4.0, 0.0, 0.0, 0.0).toDF("w")
    val h = Sampling.effectiveSampleSize(heavy, "w").collect().head
    assert(h.getAs[Double]("ess") == 1.0 &&
      h.getAs[Double]("ess_ratio") == 0.25)
    val neg = Seq(1.0, -1.0).toDF("w")
    val x = Sampling.effectiveSampleSize(neg, "w").collect().head
    assert(x.isNullAt(x.fieldIndex("ess")))
  }
}
