package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.sources.Sources

/** Bucketed tables join without a shuffle exchange — the write-time
  * amortization of repeated join shuffles (100 TB posture).
  */
class BucketingSpec extends SparkSpec {

  test("co-located bucketed join plans no ShuffleExchange") {
    val o = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val joined = Sources.bucketedCoLocatedJoin(spark, o, li,
      "o_orderkey", 8, "bkt_orders", "bkt_lineitem")
    try {
      var shuffles = 0
      joined.queryExecution.sparkPlan.foreach {
        case _: ShuffleExchangeExec => shuffles += 1
        case _ =>
      }
      assert(shuffles == 0, "bucketed join must not shuffle")
      // and it still computes the right thing
      val plain = o.join(li, Seq("o_orderkey")).count()
      assert(joined.count() == plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
