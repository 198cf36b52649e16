package graft

/** Single-query timing harness: `runMain graft.BenchOne <query> ...` times
  * each named `SparkEntry.queries` entry in isolation (after one warmup
  * query) at bench settings — for chasing per-query regressions without a
  * full `graft.Bench` sweep.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.queries("x_dedup_exact")(spark, dir).collect() // warmup
    for (q <- args) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).collect().length
      println(s"TIMING $q ${(System.nanoTime() - t0) / 1e9} rows=$n")
    }
    spark.stop()
  }
}
