package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// throwaway profiling harness (deleted before close)
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val k = 20

    def time(tag: String)(f: => Long): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime(); val n = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"  $tag once: $dt%.2f s rows=$n"); dt
      }
      val a = once(); val b = once()
      println(f"SCRATCH $tag best=${math.min(a, b)}%.2f")
    }

    time("spans_window") {
      graft.ops.Dedup.duplicatedSpans(docs, "doc_id", "text", k)
        .queryExecution.toRdd.count()
    }

    // count-grain variant: hash-agg the gram stats (partial agg, no
    // sort), keep only duplicated grams, join back
    time("spans_groupby") {
      val base = docs
        .select(col("doc_id").cast("long").as("doc_id"),
          col("text").as("__t"))
        .filter(length(col("__t")) >= k)
      val grams = base
        .select(col("doc_id"),
          explode(sequence(lit(1), length(col("__t")) - lit(k - 1)))
            .as("pos"), col("__t"))
        .select(col("doc_id"), col("pos"),
          col("__t").substr(col("pos"), lit(k)).as("__gram"))
      val stats = grams
        .groupBy("__gram")
        .agg(count(lit(1)).as("__c"),
          min(col("doc_id") * 1000000L + col("pos")).as("__f"))
        .filter(col("__c") >= 2)
      val dup = grams.join(stats, Seq("__gram"))
        .filter(col("doc_id") * 1000000L + col("pos") =!= col("__f"))
        .select(col("doc_id"), col("pos"))
      val before = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val upToHere = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dup
        .withColumn("__nf",
          when(col("pos") >
            coalesce(max(col("pos") + lit(k)).over(before), lit(-1)), 1)
            .otherwise(0))
        .withColumn("__isle", sum(col("__nf")).over(upToHere))
        .groupBy(col("doc_id"), col("__isle"))
        .agg(min(col("pos")).cast("long").as("span_start"),
          (max(col("pos")) + lit(k)).cast("long").as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start")).as("span_len"))
        .queryExecution.toRdd.count()
    }

    time("lines_current") {
      graft.ops.TextAnalysis.dedupLines(docs, "doc_id", "text")
        .queryExecution.toRdd.count()
    }

    // window variant for lines: one shuffle of full content rows
    time("lines_window") {
      val lines = docs.select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("idx", "line")))
      val content = lines.filter(trim(col("line")) =!= "")
        .withColumn("fp", graft.ops.Dedup.fingerprint(col("line")))
      val w = Window.partitionBy("fp")
      val kept2 = content
        .withColumn("__keep",
          min(struct(col("doc_id").as("w_id"), col("idx").as("w_idx")))
            .over(w))
        .filter(col("doc_id") === col("__keep.w_id") &&
          col("idx") === col("__keep.w_idx"))
        .select(col("doc_id"), col("idx"), col("line"))
        .unionByName(lines.filter(trim(col("line")) === ""))
      val rebuilt = kept2.groupBy(col("doc_id")).agg(
        array_join(
          transform(array_sort(collect_list(struct(col("idx"), col("line")))),
            x => x("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_lines_kept"))
      docs.select(col("doc_id"),
          size(split(col("text"), "\n")).cast("long").as("n_lines"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
          (col("n_lines") - coalesce(col("n_lines_kept"), lit(0L)))
            .as("n_lines_removed"))
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
