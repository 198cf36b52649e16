package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

// THROWAWAY: old (one-task window) exactQuantiles cum-sum shape on the
// quant13 100x corpus, for the before/after scale contrast. Not committed.
object ProfTmp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li13 = Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_orderkey"), col("l_extendedprice"))
    for (k <- Seq(10, 100)) {
      val corpus = (0 until k).map(i =>
        li13.select((col("l_extendedprice") + lit(i * 120000.0) +
          (col("l_orderkey") % 100000).cast("double") * 0.01)
          .as("v")))
        .reduce(_ unionByName _)
      val counts = corpus.select(col("v").cast("double").as("__v"))
        .filter(col("__v").isNotNull)
        .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      val cum = counts
        .withColumn("__end", sum(col("__c")).over(
          Window.orderBy(col("__v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__start", col("__end") - col("__c"))
      val t0 = System.nanoTime()
      cum.write.format("noop").mode("overwrite").save()
      println(f"PROF old_global_window_cum k=$k " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
