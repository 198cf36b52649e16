package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Deterministic split / sampling semantics. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0)

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

  test("uniform sample: exact size, deterministic across runs") {
    val df = spark.range(0, 1000).toDF("id")
    val a = Sampling.uniformSample(df, "id", 50).as[Long].collect().toList
    val b = Sampling.uniformSample(df, "id", 50).as[Long].collect().toList
    assert(a == b && a.size == 50 && a.distinct.size == 50)
  }
}
