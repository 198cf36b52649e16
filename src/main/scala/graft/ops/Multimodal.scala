package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.4): image/audio/video treated as
  * opaque `binary` columns + typed metadata. The decode step is STUBBED
  * (this container has no image/audio codecs) with a deterministic fake;
  * everything Spark-side — schema, batching, partition-level processing
  * signature — is real.
  *
  * Scale posture: binary payloads never shuffle for metadata-only queries
  * (column pruning drops them at the scan); the decode pass is
  * `mapPartitions` so a real codec would amortize model/codec init once per
  * partition (the Scala analogue of `mapInPandas` batch semantics).
  */
object Multimodal {

  /** Wrap a text corpus as a binary-payload table: (id, payload binary,
    * media_type, n_bytes). Stands in for an image/audio ingest.
    */
  def asBinaryTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      to_binary(col(textCol), lit("utf-8")).as("payload"),
      lit("application/octet-stream").as("media_type"),
      octet_length(col(textCol)).as("n_bytes"))

  /** Metadata-only projection — proves the payload is pruned from the scan
    * (check `.explain`: ReadSchema excludes `payload`).
    */
  def metadata(bin: DataFrame, idCol: String): DataFrame =
    bin.select(col(idCol), col("media_type"), col("n_bytes"))
      .orderBy(col(idCol))

  /** Deterministic content features over the binary payload, computed with
    * built-in expressions (md5 of bytes, length, first byte) — the
    * "feature-extract" stage a real pipeline would run post-decode.
    */
  def binaryFeatures(bin: DataFrame, idCol: String): DataFrame =
    bin.select(
        col(idCol),
        col("n_bytes"),
        md5(col("payload")).as("content_md5"),
        // first BYTE as hex — not a code point, so multi-byte UTF-8 content
        // hashes/compares identically in any engine
        substring(hex(col("payload")), 1, 2).as("first_byte_hex"))
      .orderBy(col(idCol))

  /** The decode stage: `mapPartitions` over binary payloads. A real codec
    * (JPEG decode, audio resample, frame sample) plugs in at `decodeStub`;
    * here it is a clearly-marked deterministic fake (SURVEY.md §7.4).
    * Output schema is the typed feature frame a downstream trainer reads.
    */
  def decodeFeatures(spark: org.apache.spark.sql.SparkSession,
                     bin: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val input = bin
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
    input.mapPartitions { iter =>
      // STUB: a real codec (JPEG decode / audio resample / frame sample)
      // initializes ONCE here per partition, then maps the batch.
      iter.map { case (id, bytes) =>
        val mean =
          if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
        (id, bytes.length, (bytes.length % 640) + 1, (bytes.length % 480) + 1,
          mean)
      }
    }.toDF("id", "n_bytes", "fake_width", "fake_height", "fake_mean_intensity")
      // round with the SQL round (not math.round) for oracle parity
      .withColumn("fake_mean_intensity", round(col("fake_mean_intensity"), 6))
      .orderBy(col("id"))
  }
}
