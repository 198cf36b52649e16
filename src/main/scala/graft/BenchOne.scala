package graft

/** Single-query timing harness: `runMain graft.BenchOne <query> ...` times
  * each named `SparkEntry.queries` entry in isolation (after one warmup
  * query) under the SAME settings as `graft.Bench` — `SPARK_GRAFT_CPUS`
  * cores/shuffle partitions (default 32) and `count()` as the timed
  * action — so its numbers are comparable to a Bench sweep's.
  */
object BenchOne {
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
    for (q <- args) {
      val t0 = System.nanoTime()
      // same action as Bench: the query's OWN plan, not count()-pruned
      val n = SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count()
      println(s"TIMING $q ${(System.nanoTime() - t0) / 1e9} rows=$n")
    }
    spark.stop()
  }
}
