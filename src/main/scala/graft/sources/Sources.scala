package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.Files

/** Source/sink operators (SURVEY.md §2.1): CSV read with declared schema
  * (S2, `data_quality_checks.py:164-166`), CSV write (S3,
  * `batch_generator.py:140-152`), date-partitioned parquet offline store
  * (S5, `clickstream_aggregation.py:204-218`) and the partition-existence
  * probe with last-N fallback (S11,
  * `feature_store_materialization.py:128-160`).
  *
  * Scale posture: the partitioned write is the offline-store layout that
  * makes downstream date predicates partition-pruning hits (zero data read
  * outside the date); the probe reads partition VALUES from the directory
  * listing only — no file contents.
  */
object Sources {

  /** S3 + S2: write a frame as header CSV, read it back with an explicit
    * declared schema (never inference — SURVEY.md §1.3).
    */
  def csvRoundTrip(spark: SparkSession, df: DataFrame,
                   schema: StructType): DataFrame = {
    val dir = Files.createTempDirectory("graft_csv_").toString
    df.write.mode("overwrite").option("header", "true").csv(dir)
    spark.read.option("header", "true").schema(schema).csv(dir)
  }

  /** JSON-lines round trip with a DECLARED schema on the read side (same
    * no-inference rule as [[csvRoundTrip]] — schema inference over JSON is
    * a full extra pass at 100 TB and type-unstable across batches).
    */
  def jsonRoundTrip(spark: SparkSession, df: DataFrame,
                    schema: StructType): DataFrame = {
    val dir = Files.createTempDirectory("graft_json_").toString
    df.write.mode("overwrite").json(dir)
    spark.read.schema(schema).json(dir)
  }

  /** ORC round trip — the third columnar interchange format next to the
    * parquet store and the CSV/JSON text paths. ORC carries its own schema
    * (no inference pass, unlike CSV/JSON), has parquet-grade min/max
    * stripe statistics for predicate pushdown, and is the incumbent format
    * in Hive-lineage warehouses — the realistic "switch a 100 TB source
    * from a Hive warehouse" migration path. The declared schema is still
    * ENFORCED on the read side (applied over the file schema) so a drifted
    * producer fails loud instead of silently widening types.
    */
  def orcRoundTrip(spark: SparkSession, df: DataFrame,
                   schema: StructType): DataFrame = {
    val dir = Files.createTempDirectory("graft_orc_").toString
    df.write.mode("overwrite").orc(dir)
    spark.read.schema(schema).orc(dir)
  }

  /** Malformed-input ingestion report: write raw CSV LINES (some
    * deliberately unparseable), read back PERMISSIVE with a declared
    * schema + corrupt-record column, and report clean/corrupt counts
    * plus an aggregate over the clean rows — the robustness posture a
    * 100 TB text-ingest needs (a single bad row must neither kill the
    * job (FAILFAST) nor silently vanish (DROPMALFORMED); PERMISSIVE +
    * audit is the production setting). The parsed frame is cached
    * before the fold: Spark refuses to filter on the corrupt-record
    * column of a streaming-parsed CSV otherwise (the documented
    * interaction), and the cache also keeps the report a single read.
    */
  def csvPermissiveRead(spark: SparkSession, lines: DataFrame,
                        schema: StructType,
                        corruptCol: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_csvbad_").toString
    lines.write.mode("overwrite").text(dir)
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(dir)
      .cache()
  }

  /** S5: date-partitioned parquet offline store write; returns the root.
    * Repartitioned by the date key first so each partition directory gets
    * one file instead of (shuffle partitions × dates) shards — at scale
    * this is the difference between O(dates) and O(tasks·dates) files for
    * the downstream lister.
    */
  def writeOfflineStore(df: DataFrame, dateCol: String): String = {
    val dir = Files.createTempDirectory("graft_offline_").toString
    df.repartition(col(dateCol))
      .write.mode("overwrite").partitionBy(dateCol).parquet(dir)
    dir
  }

  /** S11 read side: single-date read — the date predicate prunes to one
    * partition directory (check: PartitionFilters in the scan, zero rows
    * read elsewhere).
    */
  def readPartition(spark: SparkSession, root: String, dateCol: String,
                    date: String): DataFrame =
    spark.read.parquet(root).where(col(dateCol) === lit(date).cast("date"))

  /** Bucketed co-located join: write both sides bucketed (+sorted) on the
    * join key, then join the catalog tables — the plan carries NO shuffle
    * exchange (verified in BucketingSpec). At 100 TB this is how repeated
    * fact⋈fact joins on a stable key amortize their shuffle to write time:
    * every subsequent join on the bucket key is exchange-free.
    */
  def bucketedCoLocatedJoin(spark: SparkSession, left: DataFrame,
                            right: DataFrame, key: String, buckets: Int,
                            leftName: String, rightName: String): DataFrame = {
    left.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(leftName)
    right.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(rightName)
    spark.table(leftName).join(spark.table(rightName), Seq(key))
  }

  /** Range-clustered sorted parquet layout: `repartitionByRange` on the
    * clustering key (one range per output file, so per-file min/max spans
    * are disjoint) + `sortWithinPartitions` (so row groups inside each
    * file are ordered too). The write costs one range shuffle; every
    * subsequent range predicate on the key then skips whole files/row
    * groups via parquet min/max stats instead of scanning the corpus —
    * the batch analogue of a zone map, and the layout step a 100 TB
    * offline store runs after compaction. LayoutSpec asserts the
    * disjoint-span property from the written footers.
    */
  /** Disk-layout IVF index: the embedding corpus written PARTITIONED BY
    * its coarse cell, so an ANN probe's `cell IN (...)` predicate prunes
    * at the STORAGE layer — hive partition pruning does on disk what
    * `Similarity.topKIvf`'s equi-join does in memory. This is the
    * serving-side ANN layout at 100 TB: a probe with nProbe cells reads
    * nProbe/nCells of the corpus bytes and nothing else (the plan's
    * PartitionFilters shows the pruned read — PLANS.md `s_ann_index`).
    * Cell assignment is the broadcast-codebook `NearestCentroid`
    * expression; rewrite cost is one narrow projection + one partitioned
    * write, re-run per compaction cycle like the Z-order layout.
    */
  def annIndexWrite(emb: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[Array[Double]]): String = {
    val dir = Files.createTempDirectory("graft_annidx_").toString
    emb.select(col(idCol), col(vecCol),
        graft.functions.Native.nearest_centroid(
          col(vecCol).cast("array<double>"), centroids).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    dir
  }

  def sortedLayoutWrite(df: DataFrame, sortCol: String, nFiles: Int): String = {
    val dir = Files.createTempDirectory("graft_sorted_").toString
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** Z-order (Morton-curve) clustered layout over TWO columns: each value
    * is min/max-scaled to a `bits`-bit bucket index, the two indices are
    * bit-interleaved into one Z value (native expression — one loop per
    * row), and the write is range-partitioned + sorted by Z. Because the
    * Z curve preserves locality in both dimensions, EVERY output file gets
    * a bounded min/max span on BOTH columns — so parquet zone maps skip
    * files for predicates on either column or both, where a single-column
    * sort ([[sortedLayoutWrite]]) leaves the second column's per-file span
    * at ~the full range. This is the layout `OPTIMIZE ZORDER BY` builds in
    * lakehouse engines; at 100 TB it runs per date-partition after
    * compaction. Cost: one tiny min/max aggregate + one range shuffle.
    * Caveat: min/max scaling keys the curve to the value RANGE — under
    * heavy value skew, swap the scaling for quantile buckets (the
    * clustering stays correct either way; only file-skipping balance
    * changes). LayoutSpec asserts the two-dimensional span bound against
    * the single-column layout.
    */
  def zorderLayoutWrite(df: DataFrame, colA: String, colB: String,
                        nFiles: Int, bits: Int = 16): String = {
    // 30 keeps (1 << bits) inside positive Int range; at 31 the scale
    // factor would overflow negative and clamp every row to bucket 0
    require(bits >= 1 && bits <= 30, s"bits must be in [1,30], got $bits")
    val s = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    def bucket(c: String, lo: Double, hi: Double): org.apache.spark.sql.Column =
      if (hi <= lo) lit(0)
      else least(lit((1 << bits) - 1), greatest(lit(0),
        floor((col(c).cast("double") - lit(lo)) / lit(hi - lo)
          * lit((1 << bits).toDouble)).cast("int")))
    val z = graft.functions.Native.interleave_bits(
      bucket(colA, s.getDouble(0), s.getDouble(1)),
      bucket(colB, s.getDouble(2), s.getDouble(3)), bits)
    val dir = Files.createTempDirectory("graft_zorder_").toString
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** The skew-proof [[zorderLayoutWrite]] variant: bucket boundaries come
    * from APPROXIMATE QUANTILES (a bounded mergeable-sketch pass +
    * `Bucketizer` binary search per row) instead of min/max scaling, so a
    * heavy-tailed column still spreads across the full bucket range — with
    * min/max scaling one outlier collapses the bulk of a skewed column
    * into bucket 0 and the curve loses that dimension's resolution.
    * Same write shape (range partition + sort by the interleaved value);
    * LayoutSpec asserts the rank-coverage win on skewed data.
    */
  def zorderLayoutWriteQuantile(df: DataFrame, colA: String, colB: String,
                                nFiles: Int, bits: Int = 8): String = {
    import org.apache.spark.ml.feature.Bucketizer
    // 2^bits − 1 quantile probes must stay a sane sketch size
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val quants = df.stat.approxQuantile(Array(colA, colB), probs, 0.001)
    def splits(q: Array[Double]): Array[Double] =
      Double.NegativeInfinity +: q.distinct.sorted :+ Double.PositiveInfinity
    val withD = df
      .withColumn("__da", col(colA).cast("double"))
      .withColumn("__db", col(colB).cast("double"))
    val bucketed = new Bucketizer()
      .setInputCols(Array("__da", "__db"))
      .setOutputCols(Array("__ba", "__bb"))
      .setSplitsArray(Array(splits(quants(0)), splits(quants(1))))
      .setHandleInvalid("keep") // NULLs land in the overflow bucket
      .transform(withD)
    // clamp the overflow bucket into range so the interleave stays in
    // `bits` bits per dimension
    def clamped(c: String) =
      least(col(c).cast("int"), lit(nb - 1))
    val z = graft.functions.Native.interleave_bits(
      clamped("__ba"), clamped("__bb"), bits)
    val dir = Files.createTempDirectory("graft_zorderq_").toString
    bucketed.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__da", "__db", "__ba", "__bb")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** Small-file compaction: rewrite a parquet root into ~`targetFiles`
    * files via `coalesce` — NO shuffle (partitions are concatenated, not
    * redistributed), so the cost is one read + one write. The maintenance
    * job that keeps an offline store's file count bounded after many
    * incremental appends; at 100 TB it runs per date-partition. Pair with
    * [[sortedLayoutWrite]] when range predicates matter (coalesce
    * preserves no ordering guarantee).
    */
  def compact(spark: SparkSession, root: String, targetFiles: Int): String = {
    val out = Files.createTempDirectory("graft_compact_").toString
    spark.read.parquet(root)
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(out)
    out
  }

  /** S11 probe: the newest N partition values, from partition metadata only
    * (`sorted(partitions)[-7:]` in the reference). Delegates to the shared
    * tail operator — over a partitioned root the distinct comes from the
    * partition listing, no file contents are read.
    */
  def recentPartitions(spark: SparkSession, root: String, dateCol: String,
                       n: Int): DataFrame =
    graft.ops.Stats.recentPartitions(spark.read.parquet(root), dateCol, n)

  /** Parquet footer profile: per column chunk, the value count and
    * compressed/uncompressed byte sizes read from FILE METADATA only —
    * no data pages touched. The storage-engineering readout that drives
    * encoding and compaction decisions ("which column carries the
    * bytes, how well does it compress, how many row groups"), the same
    * numbers `parquet-tools meta` / DuckDB's `parquet_metadata()` show.
    *
    * Footers are read driver-side, capped at 1 000 files (a footer is a
    * few KB; this audit is for a table or partition, not a lake — for a
    * 100 TB sweep, map a file-path manifest through this per partition
    * instead).
    */
  def parquetFooter(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      else Seq(p)
    require(files.nonEmpty, s"parquetFooter: no parquet files under $path")
    require(files.size <= 1000,
      s"parquetFooter: ${files.size} files — cap is 1000; profile per " +
      "partition via a manifest for larger sweeps")
    val rows = files.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        r.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
          case (b, gi) =>
            b.getColumns.asScala.toSeq.map { c =>
              (f.getName, gi.toLong, c.getPath.toDotString,
                c.getValueCount, c.getTotalSize,
                c.getTotalUncompressedSize)
            }
        }
      } finally r.close()
    }
    import spark.implicits._
    rows.toDF("file_name", "row_group", "column_name", "num_values",
      "compressed_bytes", "uncompressed_bytes")
      .orderBy("file_name", "row_group", "column_name")
  }
}
