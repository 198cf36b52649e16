package graft

import graft.functions.{GraftExtensions, Native}
import org.apache.spark.sql.functions._

/** The native expressions are reachable from SQL after registration. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_similarity and minhash_signature callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c1,
        |  cosine_similarity(array(1.0D, 0.0D), array(0.0D, 2.0D)) AS c0,
        |  minhash_signature('a b c d', 3, 4) AS mh""".stripMargin).head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 0.0)
    assert(row.getSeq[Long](2).length == 4)
  }

  test("word_shingles and simhash64 callable from SQL, match column API") {
    GraftExtensions.register(spark)
    val docs = Seq((1L, "the quick brown fox jumps")).toDF("id", "text")
    docs.createOrReplaceTempView("ext_docs2")
    val viaSql = spark.sql(
      "SELECT word_shingles(text, 3) AS sh, simhash64(text) AS fp FROM ext_docs2")
      .head()
    val viaCol = docs.select(
      Native.word_shingles(col("text"), 3).as("sh"),
      Native.simhash64(col("text")).as("fp")).head()
    assert(viaSql.getSeq[String](0) == viaCol.getSeq[String](0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
    assert(viaSql.getSeq[String](0) ==
      Seq("the quick brown", "quick brown fox", "brown fox jumps"))
  }

  test("SQL result matches the column-API native expression") {
    GraftExtensions.register(spark)
    val docs = Seq((1L, "the quick brown fox")).toDF("id", "text")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT minhash_signature(text, 3, 8) AS mh FROM ext_docs")
      .head().getSeq[Long](0)
    val viaCol = docs.select(
      Native.minhash_signature(col("text"), 3, 8).as("mh"))
      .head().getSeq[Long](0)
    assert(viaSql == viaCol)
  }

  test("winnow_fingerprints callable from SQL, matches column API") {
    GraftExtensions.register(spark)
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog " +
      "and keeps on running far away")).toDF("id", "text")
    docs.createOrReplaceTempView("ext_docs3")
    val viaSql = spark.sql(
      "SELECT winnow_fingerprints(text, 8, 4) AS fp FROM ext_docs3")
      .head().getSeq[Int](0)
    val viaCol = docs.select(
      Native.winnow_fingerprints(col("text"), 8, 4).as("fp"))
      .head().getSeq[Int](0)
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // non-literal k rejected with the house message
    val ex = intercept[Exception] {
      spark.sql("SELECT winnow_fingerprints(text, id + 1, 4) FROM ext_docs3")
        .head()
    }
    assert(ex.getMessage.contains("integer literal"))
  }

  test("levenshtein_within ≡ builtin-filtered levenshtein over random " +
      "pairs; early exit returns NULL; code-point (astral) parity") {
    import org.apache.spark.sql.functions.{expr => sexpr}
    val rnd = new scala.util.Random(7)
    def word(): String =
      (0 until 3 + rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString // tiny alphabet -> plenty of near-misses
    val pairs = (1 to 400).map(_ => (word(), word())).toDF("a", "b")
    for (k <- Seq(0, 1, 2, 4)) {
      val got = pairs.select(
          Native.levenshtein_within(col("a"), col("b"), k).as("d"),
          sexpr("levenshtein(a, b)").as("ref"))
        .collect()
      got.foreach { r =>
        val ref = r.getInt(1)
        if (ref <= k) assert(!r.isNullAt(0) && r.getInt(0) == ref,
          s"k=$k: got ${r.get(0)} want $ref")
        else assert(r.isNullAt(0), s"k=$k: want NULL for ref=$ref")
      }
    }
    // astral-plane: each emoji is ONE code point (two UTF-16 units)
    val astral = Seq(("a😀b", "a😁b")).toDF("a", "b")
    val d = astral.select(
      Native.levenshtein_within(col("a"), col("b"), 2).as("d")).head()
    assert(d.getInt(0) == 1)
  }

  test("damerau_levenshtein: TRUE (unrestricted) DL cases incl. the " +
      "OSA-separating CA->ABC, never exceeds levenshtein, astral parity") {
    import org.apache.spark.sql.functions.{expr => sexpr}
    val cases = Seq(
      ("CA", "ABC", 2),      // unrestricted DL; OSA would say 3
      ("ab", "ba", 1),       // plain transposition
      ("abcd", "acbd", 1),   // interior transposition
      ("xy", "yxz", 2),
      ("kitten", "sitting", 3),
      ("abc", "ca", 2),
      ("", "", 0), ("a", "", 1), ("", "abc", 3),
      ("same", "same", 0))
    val df = cases.map(c => (c._1, c._2, c._3)).toDF("a", "b", "want")
    df.select(Native.damerau_levenshtein(col("a"), col("b")).as("d"),
        col("want")).collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // DL <= levenshtein everywhere (transposition only ever helps)
    val rnd = new scala.util.Random(11)
    def word(): String =
      (0 until 2 + rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString
    val pairs = (1 to 300).map(_ => (word(), word())).toDF("a", "b")
    pairs.select(Native.damerau_levenshtein(col("a"), col("b")).as("d"),
        sexpr("levenshtein(a, b)").as("lev")).collect()
      .foreach(r => assert(r.getInt(0) <= r.getInt(1) && r.getInt(0) >= 0))
    // swapped astral code points: one transposition
    val astral = Seq(("a😀😁", "a😁😀")).toDF("a", "b")
    assert(astral.select(Native.damerau_levenshtein(col("a"), col("b")))
      .head().getInt(0) == 1)
  }
}
