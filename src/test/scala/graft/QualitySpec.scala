package graft

import graft.ops.Quality
import org.apache.spark.sql.functions.{col, count, lit, when}

/** Q1–Q5 against the reference's dirty-fixture catalogue (FIXTURES.md §A5):
  * null age, out-of-range age, unknown tier, duplicate/missing ids.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  // (user_id, age, tier) with one violation each + clean rows
  private val dirty = Seq(
    (Some("u1"), Some(30), Some("free")),       // clean
    (Some("u2"), None, Some("basic")),          // null age
    (Some("u3"), Some(17), Some("premium")),    // age below range
    (Some("u4"), Some(121), Some("enterprise")),// age above range
    (Some("u5"), Some(40), Some("gold")),       // tier not in set
    (None, Some(50), Some("free")),             // null user_id
    (Some("u1"), Some(60), Some("free"))        // duplicate user_id
  ).toDF("user_id", "age", "tier")

  private val rules = Seq(
    Quality.NotNull("user_id"),
    Quality.NotNull("age"),
    Quality.Between("age", 18, 120),
    Quality.InSet("tier", Seq("free", "basic", "premium", "enterprise")))

  test("report tallies one violation per dirty row, single pass") {
    val rep = Quality.report(dirty, rules)
      .select("rule", "unexpected_count", "passed")
      .as[(String, Long, Boolean)].collect()
      .map { case (k, v, p) => k -> ((v, p)) }.toMap
    assert(rep("not_null_user_id") == ((1L, false)))
    assert(rep("not_null_age") == ((1L, false)))
    assert(rep("between_age") == ((2L, false)))
    assert(rep("in_set_tier") == ((1L, false)))
  }

  test("clean table passes every rule") {
    val clean = Seq(("u1", 30, "free"), ("u2", 40, "basic"))
      .toDF("user_id", "age", "tier")
    val rep = Quality.report(clean, rules)
    assert(rep.filter(!rep("passed")).count() == 0)
  }

  test("uniqueness report finds the duplicated key") {
    val row = Quality.uniqueReport(dirty.filter("user_id IS NOT NULL"), "user_id")
      .select("total", "distinct_values", "duplicate_keys", "passed").head()
    assert(row.getLong(0) == 6 && row.getLong(1) == 5)
    assert(row.getLong(2) == 1 && !row.getBoolean(3))
  }

  test("uniqueness ignores NULLs (GE semantics): nullable-but-unique passes") {
    val df = Seq(Some("a"), Some("b"), None).toDF("user_id")
    val row = Quality.uniqueReport(df, "user_id")
      .select("total", "non_null", "distinct_values", "passed").head()
    assert(row.getLong(0) == 3 && row.getLong(1) == 2 && row.getLong(2) == 2)
    assert(row.getBoolean(3)) // NULL is NotNull's job, not uniqueness's
  }

  test("report quality tallies are additive under union (property)") {
    val doubled = Quality.report(dirty.unionAll(dirty), rules)
      .select("rule", "unexpected_count")
      .as[(String, Long)].collect().toMap
    val single = Quality.report(dirty, rules)
      .select("rule", "unexpected_count")
      .as[(String, Long)].collect().toMap
    assert(doubled == single.map { case (k, v) => k -> v * 2 })
  }

  test("offenders are bounded and deterministic") {
    val off = Quality.offenders(dirty, Quality.Between("age", 18, 120),
      "user_id", 1)
    assert(off.count() == 1)
  }

  test("datasetFingerprint: order/partitioning-invariant, content- and " +
      "NULL-sensitive, count catches xor-cancelling dups") {
    val a = Seq((1L, Some("x")), (2L, Some("y")), (3L, None))
      .toDF("id", "s")
    val fp = Materializer(a)
    // any row order / partitioning gives the identical fingerprint
    assert(Materializer(a.orderBy($"id".desc).repartition(7)) == fp)
    // changing one value changes it; NULL vs the string "null" differ
    assert(Materializer(Seq((1L, Some("x")), (2L, Some("z")),
      (3L, None)).toDF("id", "s")) != fp)
    assert(Materializer(Seq((1L, Some("x")), (2L, Some("y")),
      (3L, Some("null"))).toDF("id", "s")) != fp)
    // a duplicated row pair xor-cancels, but n_rows exposes it
    val dup = a.union(Seq((1L, Option("x"))).toDF("id", "s"))
      .union(Seq((1L, Option("x"))).toDF("id", "s"))
    val (f1, n1) = MaterializerN(a); val (f2, n2) = MaterializerN(dup)
    assert(f1 == f2 && n1 == 3L && n2 == 5L)
  }
  private def MaterializerN(df: org.apache.spark.sql.DataFrame) = {
    val r = Quality.datasetFingerprint(df, Seq("id", "s")).head()
    (r.getLong(0), r.getLong(1))
  }
  private def Materializer(df: org.apache.spark.sql.DataFrame): Long =
    MaterializerN(df)._1

  test("referentialIntegrity: orphans, NULL fks, match rate, " +
      "all-NULL edge yields NULL rate") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val out = Quality.referentialIntegrity(Seq(
        ("c->p", child, "fk", parent, "pk"),
        ("allnull", Seq(Option.empty[Long]).toDF("fk"), "fk", parent, "pk")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(out == Seq(
      ("allnull", 1L, 1L, 0L, None), // no non-NULL keys → rate undefined
      ("c->p", 4L, 1L, 1L, Some(0.666667))))
    // duplicate parent keys must not double-count child matches
    val dupParent = Seq(1L, 1L, 2L).toDF("pk")
    val dup = Quality.referentialIntegrity(Seq(
      ("d", child, "fk", dupParent, "pk"))).collect()(0)
    assert(dup.getLong(1) == 4L && dup.getLong(3) == 1L)
  }

  test("entropyProfile: uniform column scores log2(k) bits with norm 1, " +
      "constant column 0 bits with NULL norm, nulls counted") {
    val df = Seq(("a", "x", Some(1)), ("b", "x", Some(1)),
      ("c", "x", None), ("d", "x", Some(2)))
      .toDF("u", "k", "m")
    val r = graft.ops.Quality.entropyProfile(df, Seq("u", "k", "m"))
      .collect()
    val u = r.find(_.getString(0) == "u").get
    assert(u.getAs[Long]("n_rows") == 4L && u.getAs[Long]("n_nulls") == 0L)
    assert(u.getAs[Long]("n_distinct") == 4L)
    assert(u.getAs[Double]("entropy_bits") == 2.0)
    assert(u.getAs[Double]("norm_entropy") == 1.0)
    assert(u.getAs[Double]("top_share") == 0.25)
    val k = r.find(_.getString(0) == "k").get
    assert(k.getAs[Double]("entropy_bits") == 0.0)
    assert(k.isNullAt(k.fieldIndex("norm_entropy")))
    assert(k.getAs[Double]("top_share") == 1.0)
    val m = r.find(_.getString(0) == "m").get
    assert(m.getAs[Long]("n_nulls") == 1L)
    assert(m.getAs[Long]("n_distinct") == 2L)
  }

  test("profile: one-pass column catalog with nulls and distincts") {
    val df = Seq(
      (Some(1L), Some("a"), Some(2.5)),
      (Some(2L), None, Some(2.5)),
      (Some(2L), Some("b"), None)
    ).toDF("k", "s", "v")
    val out = Quality.profile(df, Seq("k", "s", "v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getString(5), r.getString(6)))
    assert(out.toSeq == Seq(
      ("k", 3L, 0L, 0.0, 2L, "1", "2"),
      ("s", 3L, 1L, 0.333333, 2L, "a", "b"),
      ("v", 3L, 1L, 0.333333, 1L, "2.5", "2.5")))
    // sketch variant: same shape, distinct within HLL tolerance
    val approx = Quality.profile(df, Seq("k"), exactDistinct = false)
      .head()
    assert(approx.getLong(4) == 2L)
  }
  test("benford: digit extraction, shares, expectation and chi2 match " +
      "hand values; non-positives excluded") {
    val df = Seq(1.0, 19.0, 2.5, 300.0, 0.0, -5.0).toDF("v")
    val out = Quality.benford(df, "v")
      .as[(Int, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // digits 1,1,2,3 from the four positives
    assert(out.keySet == Set(1, 2, 3))
    assert(out(1)._2 == 2L && out(1)._3 == 0.5)
    assert(out(1)._4 == 0.30103)                     // log10(2)
    assert(out(1)._5 == 0.526048)
    assert(out(2)._5 == 0.124083 && out(3)._5 == 0.500736)
    assert(out.values.forall(_._6 == 1.150867))      // observed-digit total
  }

  test("nullPatterns: co-missingness patterns counted, not just marginals") {
    val df = Seq[(Option[Int], Option[String], Option[Double])](
      (Some(1), Some("a"), Some(1.0)),   // 111
      (Some(2), Some("b"), Some(2.0)),   // 111
      (None, None, Some(3.0)),           // 001 — x and y missing TOGETHER
      (None, None, Some(4.0)),           // 001
      (Some(5), Some("c"), None)         // 110
    ).toDF("x", "y", "z")
    val out = Quality.nullPatterns(df, Seq("x", "y", "z"))
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("001", 2L, 0.4), ("111", 2L, 0.4), ("110", 1L, 0.2)))
    intercept[IllegalArgumentException] {
      Quality.nullPatterns(df, Seq.empty)
    }
  }

  test("withObservedQuality: counters accumulate during the HOST query's " +
      "single pass and match direct computation") {
    val df = Seq[(Option[Int], Option[String])](
      (Some(1), Some("a")), (None, Some("b")), (Some(3), None),
      (None, None), (Some(5), Some("e"))
    ).toDF("x", "y")
    val obs = org.apache.spark.sql.Observation()
    val instrumented = Quality.withObservedQuality(df, Seq("x", "y"), obs)
    // the host query is someone else's aggregate — one action, one scan
    val hostResult = instrumented.agg(count(lit(1))).head().getLong(0)
    assert(hostResult == 5L)
    val m = obs.get
    assert(m("n_rows") == 5L)
    assert(m("x_null_count") == 2L)
    assert(m("y_null_count") == 2L)
  }

  test("groupFingerprints: partition-order invariant, agrees with the " +
      "dataset fingerprint of each group, detects a 1-row change") {
    val df = Seq((1, "a", 10.0), (1, "b", 20.0), (2, "c", 30.0),
      (2, "d", 40.0), (2, "e", 50.0)).toDF("g", "s", "v")
    val manifest = Quality.groupFingerprints(df, "g", Seq("s", "v"))
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("fingerprint"), r.getAs[Long]("n_rows"))).toMap
    assert(manifest(1)._2 == 2L && manifest(2)._2 == 3L)
    // repartitioned input -> identical manifest (XOR is order-free)
    val shuffled = Quality.groupFingerprints(df.repartition(7), "g",
      Seq("s", "v")).collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("fingerprint"), r.getAs[Long]("n_rows"))).toMap
    assert(shuffled == manifest)
    // per-group rows equal the whole-dataset fingerprint of that slice
    val g2 = Quality.datasetFingerprint(df.filter(col("g") === 2),
      Seq("s", "v")).head()
    assert(g2.getAs[Long]("fingerprint") == manifest(2)._1)
    // a single changed row flips that group's fingerprint only
    val changed = Quality.groupFingerprints(
      df.withColumn("v", when(col("s") === "e", 51.0).otherwise(col("v"))),
      "g", Seq("s", "v")).collect().map(r => r.getInt(0) ->
        r.getAs[Long]("fingerprint")).toMap
    assert(changed(1) == manifest(1)._1 && changed(2) != manifest(2)._1)
  }

  test("manifestDiff: added / removed / changed classified, unchanged " +
      "partitions excluded from the resync list") {
    val v1 = Seq((1, "a", 1.0), (1, "b", 2.0), (2, "c", 3.0)).toDF("g", "s", "v")
    val v2 = Seq((1, "a", 1.0), (1, "b", 2.0),          // g=1 unchanged
      (2, "c", 99.0),                                   // g=2 changed
      (3, "d", 4.0)).toDF("g", "s", "v")                // g=3 added
    def m(df: org.apache.spark.sql.DataFrame) =
      Quality.groupFingerprints(df, "g", Seq("s", "v"))
    val diff = Quality.manifestDiff(m(v1), m(v2), "g")
      .collect().map(r => r.getInt(0) -> r.getAs[String]("status")).toMap
    assert(diff == Map(2 -> "changed", 3 -> "added"))
    val back = Quality.manifestDiff(m(v2), m(v1), "g")
      .collect().map(r => r.getInt(0) -> r.getAs[String]("status")).toMap
    assert(back == Map(2 -> "changed", 3 -> "removed"))
  }

  test("suggestConstraints: nullable col loses not_null, unique id keeps " +
      "unique, enum domain sorted, wide domain withheld") {
    val df = Seq(
      (1L, Some(10.0), "b", "x1"),
      (2L, Some(20.0), "a", "x2"),
      (3L, None, "b", "x3"),
      (4L, Some(20.0), "c", "x4")
    ).toDF("id", "v", "cat", "wide")
    val out = Quality.suggestConstraints(df,
        numericCols = Seq("id", "v"), enumCandidates = Seq("cat", "wide"),
        maxDomain = 3)
      .collect()
      .map(r => (r.getAs[String]("column"), r.getAs[String]("constraint"))
        -> r).toMap
    // id: not_null + unique + between [1, 4]
    assert(out.contains(("id", "not_null")) && out.contains(("id", "unique")))
    assert(out(("id", "between")).getAs[Double]("lo") == 1.0 &&
      out(("id", "between")).getAs[Double]("hi") == 4.0)
    // v has a null -> no not_null, no unique; between over observed range
    assert(!out.contains(("v", "not_null")) && !out.contains(("v", "unique")))
    assert(out(("v", "between")).getAs[Long]("n_nulls") == 1L)
    // cat: in_set with the SORTED domain
    assert(out(("cat", "in_set")).getAs[String]("domain") == "a|b|c")
    // wide: 4 distinct > maxDomain=3 -> in_set withheld (unique kept)
    assert(!out.contains(("wide", "in_set")))
    assert(out.contains(("wide", "unique")))
    intercept[IllegalArgumentException] {
      Quality.suggestConstraints(df, Seq.empty, Seq.empty)
    }
  }

  test("fdAudit: g3 counts minimal row deletions, NULL determinants " +
      "excluded, NULL dependents agree, exact FDs flagged") {
    val df = Seq((Option(1L), "a", 10), (Option(1L), "a", 20),
      (Option(2L), "b", 10), (Option(2L), "c", 10), (None, "d", 1))
      .toDF("k", "v1", "v2")
    val out = Quality.fdAudit(df,
        Seq(("k", "v1"), ("v2", "k"), ("v1", "v1")))
      .as[(String, String, Long, Long, Long, Option[Double], Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // k=1 -> {a,a}; k=2 -> {b,c}: delete 1 of 4 rows; null k excluded
    assert(out(("k", "v1")) == (("k", "v1", 4L, 2L, 1L, Some(0.25), false)))
    // v2=10 -> k {1,2,2} (NULL k is a value here): 1 deletion of 5 rows
    assert(out(("v2", "k")) == (("v2", "k", 5L, 3L, 1L, Some(0.2), false)))
    assert(out(("v1", "v1"))._7) // reflexive FD holds exactly
  }
}
