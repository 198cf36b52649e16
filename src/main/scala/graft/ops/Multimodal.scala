package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.4): image/audio/video treated as
  * opaque `binary` columns + typed metadata, with a REAL decode stage — a
  * Base64+UTF-8 codec (the container has no image/audio libraries, so the
  * demonstrable codec is textual; a JPEG/PCM decoder drops into the same
  * partition-level slot).
  *
  * Scale posture: binary payloads never shuffle for metadata-only queries
  * (column pruning drops them at the scan); the decode pass is
  * `mapPartitions` so codec state (here the Base64 and charset decoders, in
  * production a model or codec context) initializes once per partition —
  * the Scala analogue of `mapInPandas` batch semantics.
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

  /** Base64-ENCODED binary table: the payload is the ASCII bytes of the
    * Base64 encoding of the document's UTF-8 text — a genuinely encoded
    * format the decode stage must actually decode (two real codec layers:
    * Base64 transfer encoding over UTF-8 character encoding).
    */
  def asBase64Table(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      to_binary(base64(to_binary(col(textCol), lit("utf-8"))), lit("utf-8"))
        .as("payload"),
      lit("text/plain; transfer=base64").as("media_type"),
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

  /** The decode stage: `mapPartitions` over Base64 payloads (from
    * [[asBase64Table]]). Each partition initializes its codec state ONCE —
    * a CRLF-stripping strict RFC 4648 Base64 decoder (any other
    * non-alphabet byte fails loud) and a strict (malformed-input =
    * fail-loud) UTF-8 charset decoder — then streams the partition's rows
    * through it: payload ASCII bytes → Base64 decode → UTF-8 decode →
    * typed features of the decoded content. A JPEG or audio codec plugs
    * into the same slot with the same init-once/stream-rows shape. Every
    * emitted feature is a function of the DECODED bytes, so the DuckDB
    * oracle (computing the same features from the original text) verifies
    * the round trip byte-exactly via `content_md5`.
    */
  def decodeBase64Features(spark: org.apache.spark.sql.SparkSession,
                           bin: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val input = bin
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
    input.mapPartitions { iter =>
      // codec init, once per partition (amortized like a real decoder's
      // model/context setup). Spark's base64() chunks output ≥ 76 chars
      // with CRLF line breaks (RFC 2045, conf-dependent across versions),
      // so ONLY those two bytes are stripped explicitly; decoding then
      // uses the strict RFC 4648 decoder, which rejects any other
      // non-alphabet byte — a corrupted payload fails loud here instead of
      // surfacing only as an md5 mismatch downstream (a MIME decoder would
      // silently skip it).
      val b64 = java.util.Base64.getDecoder
      val utf8 = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val md = java.security.MessageDigest.getInstance("MD5")
      iter.map { case (id, payload) =>
        // drop CR/LF (the sanctioned chunking bytes), nothing else
        var n = 0; var p = 0
        while (p < payload.length) {
          if (payload(p) != 10 && payload(p) != 13) n += 1; p += 1
        }
        val cleaned =
          if (n == payload.length) payload
          else {
            val out = new Array[Byte](n); var j = 0; p = 0
            while (p < payload.length) {
              val b = payload(p)
              if (b != 10 && b != 13) { out(j) = b; j += 1 }
              p += 1
            }
            out
          }
        val decoded = b64.decode(cleaned)
        val text = utf8
          .decode(java.nio.ByteBuffer.wrap(decoded)).toString
        md.reset()
        val digest = md.digest(decoded).map("%02x".format(_)).mkString
        var nl = 0
        var i = 0
        while (i < text.length) { if (text.charAt(i) == '\n') nl += 1; i += 1 }
        (id, decoded.length, text.codePointCount(0, text.length), nl + 1,
          digest)
      }
    }.toDF(idCol, "n_bytes", "n_chars", "n_lines", "content_md5")
      .orderBy(col(idCol))
  }

  /** Deterministic uniform frame sampling for video-shaped media: from each
    * asset's (duration, fps) metadata, emit `k` frame indices at the
    * centers of k equal time slices — `floor((i + 0.5)/k · duration ·
    * fps)` — the standard decode-k-frames plan a vision pipeline feeds to
    * the (partition-initialized) decoder. Pure metadata projection +
    * bounded explode: the binary payload column is never touched, so
    * column pruning keeps it out of the scan entirely; the decode stage
    * dropping into [[decodeBase64]]'s mapPartitions slot consumes
    * (id, frame_idx) pairs.
    */
  def frameSampleOffsets(media: DataFrame, idCol: String,
                         durationCol: Column, fps: Double,
                         k: Int): DataFrame = {
    require(fps > 0 && k >= 1,
      s"frameSampleOffsets: fps > 0 and k >= 1 (got $fps, $k)")
    media
      .select(col(idCol), durationCol.as("duration_s"))
      .select(col(idCol), col("duration_s"),
        explode(sequence(lit(0), lit(k - 1))).as("frame_no"))
      .select(
        col(idCol),
        col("frame_no"),
        floor((col("frame_no") + 0.5) / k * col("duration_s") * fps)
          .as("frame_idx"),
        round(floor((col("frame_no") + 0.5) / k * col("duration_s") * fps)
          / fps, 6).as("t_offset_s"))
      .orderBy(col(idCol), col("frame_no"))
  }
}
