package graft

import org.apache.spark.sql.functions._
import graft.ops.Privacy

/** K-anonymity / l-diversity audits: hand-checked goldens on a tiny
  * frame, the repair loop (banding raises k), and guard behavior.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI = (city, age): classes {(A,30):3, (A,40):1, (B,30):2}
  private def people = Seq(
    ("A", 30, "flu"), ("A", 30, "flu"), ("A", 30, "cold"),
    ("A", 40, "flu"),
    ("B", 30, "cold"), ("B", 30, "asthma")
  ).toDF("city", "age", "condition")

  test("kAnonymityReport: hand-checked class histogram fold") {
    val r = Privacy.kAnonymityReport(people, Seq("city", "age"), 3)
      .collect().head
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("k_anonymity") == 1L) // the (A,40) singleton
    assert(r.getAs[Long]("classes_below_k") == 2L) // sizes 1 and 2
    assert(r.getAs[Long]("rows_below_k") == 3L)
  }

  test("kAnonymityOffenders lists rare classes smallest-first") {
    val rows = Privacy.kAnonymityOffenders(people, Seq("city", "age"), 3)
      .collect()
    assert(rows.map(r => (r.getAs[String]("city"), r.getAs[Int]("age"),
      r.getAs[Long]("class_size"))).toSeq ==
      Seq(("A", 40, 1L), ("B", 30, 2L)))
  }

  test("lDiversityReport: homogeneous class detected despite k >= 2") {
    // (A,30) has 2 distinct conditions, (A,40) has 1, (B,30) has 2
    val r = Privacy.lDiversityReport(people, Seq("city", "age"),
      col("condition"), 2).collect().head
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("l_diversity") == 1L)
    assert(r.getAs[Long]("classes_below_l") == 1L)
    assert(r.getAs[Long]("rows_below_l") == 1L)
  }

  test("banding repair loop: coarser QI raises k") {
    val df = Seq.tabulate(100)(i => (i % 2, i * 37.0 % 997))
      .toDF("seg", "score")
    val fine = Privacy.kAnonymityReport(
      df.withColumn("b", Privacy.band(col("score"), 1.0)),
      Seq("seg", "b"), 5).collect().head.getAs[Long]("k_anonymity")
    val coarse = Privacy.kAnonymityReport(
      df.withColumn("b", Privacy.band(col("score"), 500.0)),
      Seq("seg", "b"), 5).collect().head.getAs[Long]("k_anonymity")
    assert(fine <= coarse, s"banding must not lower k ($fine -> $coarse)")
    assert(coarse >= 5L)
  }

  test("guards fail loud") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(people, Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(people, Seq("city"), 1)
    }
    intercept[IllegalArgumentException] { Privacy.band(col("age"), 0.0) }
  }
}
