package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same conf the Verify harness sets: bucket sort order exposed to
      // planning regardless of registry iteration order
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup on the SMALLEST corpus (not sfDir, so the bench data
    // itself stays cold): pays JVM/JIT, codegen-compiler, parquet reader and
    // shuffle-machinery startup once, so the measured loop times query work.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // TWO FULL SWEEP PASSES, per-query min ACROSS passes (not back-to-back
    // min-of-2): back-to-back reruns share their sweep neighbors' page-cache
    // and GC weather, which round 6 showed still manufactures ~0.5 s
    // position-dependent swings that warm single-query reruns refute.
    // Separating the two samples by a whole sweep decorrelates that ambient
    // pressure. A throwing query is recorded in `errors` (and its wall time
    // NEVER reported as a timing) so a fast failure can't pose as a fast
    // success.
    // The timed action is queryExecution.toRdd.count(), NOT df.count():
    // count() re-optimizes with the count on top, which PRUNES the query's
    // own work — unused aggregate expressions (exact percentiles!), all
    // projections, and every sort are eliminated, so a 1-row-agg or
    // narrow-transform query was being timed doing ~none of its work
    // (q_percentiles: 0.14 s under count() vs 3.8 s real). toRdd executes
    // the query's OWN optimized plan — every column computed, sorts kept —
    // without paying driver-side result serialization.
    def sweep(): Map[String, Either[String, Double]] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val outcome =
          try { fn(spark, sfDir).queryExecution.toRdd.count()
                Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable => Left(e.getClass.getSimpleName) }
        name -> outcome
      }
    val p1 = sweep()
    val p2 = sweep()
    val merged = SparkEntry.queries.keys.map { name =>
      name -> ((p1(name), p2(name)) match {
        case (Right(a), Right(b)) => Right(math.min(a, b))
        case (Right(a), Left(_))  => Right(a)
        case (Left(_), Right(b))  => Right(b)
        case (Left(m), Left(_))   => Left(m)
      })
    }.toSeq
    val timings = merged.collect { case (k, Right(v)) => k -> v }
    val errors = merged.collect { case (k, Left(m)) => k -> m }
    val qs = timings.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, m) => s"\"" + k + "\":\"" + m + "\"" }
      .mkString("{", ",", "}")
    val total = timings.map(_._2).sum
    // Pin-cold artifact-build instrumentation (round 13, ADDITIVE — the
    // timed contract above is untouched): every Shared pin survives
    // between the two sweep passes, so the per-query min is pin-warm and
    // one-time artifact builds are charged to no query. Rebuild each
    // artifact in a FRESH session (session-keyed caches rebuild there)
    // and report its build seconds as a separate field. NOT added to
    // "value" — these seconds are the hidden build cost the sweep total
    // already excluded, now visible instead of invisible.
    val s2 = spark.newSession()
    val artifactBuilds = registry.Shared.artifactBuilders.flatMap {
      case (name, build) =>
        val t0 = System.nanoTime()
        try { build(s2, sfDir)
              Some(name -> (System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
    }
    val ab = artifactBuilds.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"artifact_builds":$ab,"sf":"$sfDir"}"""
    println(line)
    // ALSO persist the full per-query map to a repo file: the driver's
    // BENCH_rN.json captures only a truncated stdout tail (~63 queries of
    // ~500), which made cross-round per-query diffs impossible (round-10
    // verdict #4). BENCH_FULL.json is committed after each sweep so any
    // round can be diffed against any other query-by-query.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), line + "\n")
    catch { case _: Throwable => () } // bench must never fail on a write
    spark.stop()
  }
}
