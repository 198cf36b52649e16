package graft

import org.apache.spark.sql.functions._

/** Throwaway stage profiler — not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.queries("x_dedup_exact")(spark, dir).count() // warmup
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val keys = Tables.customer(spark, dir).select("c_custkey")
    for (pass <- 1 to 2) {
      time(s"p$pass full q_reference_pipeline") {
        SparkEntry.queries("q_reference_pipeline")(spark, dir)
          .queryExecution.toRdd.count()
      }
      time(s"p$pass gen clickstream") {
        noop(ops.Gen.clickstream(keys, "c_custkey", 8))
      }
      val evs = ops.Gen.clickstream(keys, "c_custkey", 8)
        .withColumnRenamed("c_custkey", "user_id")
      val prof = ops.Gen.profiles(keys, "c_custkey")
        .select(col("c_custkey").as("user_id"),
          col("country").as("user_country"),
          col("subscription_tier").as("user_tier"))
      val enr = ops.Retrieval.enrich(evs, prof, "user_id")
      time(s"p$pass enrich") { noop(enr) }
      time(s"p$pass referenceFeatures") {
        noop(ops.WindowAgg.referenceFeatures(enr))
      }
      time(s"p$pass events-only") {
        noop(ops.Gen.events(keys, "c_custkey", 8))
      }
    }
    spark.stop()
  }
}
