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
}
