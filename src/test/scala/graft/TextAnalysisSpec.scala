package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** PII-scrub golden cases. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.scrubPii($"t")).head().getString(0)

  test("scrubPii redacts emails, phones and long digit runs") {
    assert(scrub("mail me at jane.doe+x@corp.example.org please") ==
      "mail me at <EMAIL> please")
    assert(scrub("call +1 (555) 010-9999 now") == "call <PHONE> now")
    assert(scrub("account 123456 ok") == "account <ID> ok")
    assert(scrub("short 12345 stays") == "short 12345 stays")
    assert(scrub("no pii here") == "no pii here")
  }

  test("scrubPii handles multiple hits per document (replace-all)") {
    assert(scrub("a@b.com and c@d.org") == "<EMAIL> and <EMAIL>")
  }

  test("piiCounts agree with the number of redactions") {
    val (ne, np) = TextAnalysis.piiCounts(lit("a@b.com x 555-010-2222 c@d.org"))
    val row = Seq(1).toDF("i").select(ne.as("e"), np.as("p")).head()
    assert(row.getInt(0) == 2 && row.getInt(1) == 1)
  }

  test("char entropy: goldens, bands, and explode-formulation agreement") {
    val docs = Seq(
      (1L, "aaaa"),              // one symbol: 0 bits -> low
      (2L, "abab"),              // two equiprobable symbols: 1 bit -> low
      (3L, "abcd"),              // four equiprobable: 2 bits -> normal
      (4L, ""),                  // empty: 0 by convention
      (5L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .as[(Long, Double, String)].collect()
      .map { case (k, e, b) => k -> ((e, b)) }.toMap
    assert(out(1L) == ((0.0, "low")))
    assert(out(2L) == ((1.0, "low")))
    assert(out(3L) == ((2.0, "normal")))
    assert(out(4L) == ((0.0, "low")))
    assert(out(5L)._1 > 3.0 && out(5L)._2 == "normal") // natural-text band

    // native one-loop expression ≡ explode-chars aggregation at round-6
    val exploded = docs.filter(length($"text") > 0)
      .select($"doc_id", explode(split($"text", "")).as("c"))
      .groupBy("doc_id", "c").count()
      .groupBy("doc_id")
      .agg((log2(sum("count")) -
        sum($"count" * log2($"count")) / sum("count")).as("h"))
      .select($"doc_id", round($"h", 6).as("h"))
      .as[(Long, Double)].collect().toMap
    exploded.foreach { case (id, h) => assert(out(id)._1 == h, s"doc $id") }
  }
}
