package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat media as opaque `binary` columns
  * with typed metadata, and run decode / feature-extract / thumbnail
  * steps as distributed per-partition batch transforms.
  *
  * No image/audio codecs ship in this container, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`decodeStub`) — the Spark-side
  * contract (schema, binary column handling, partition-wise batch
  * processing via mapPartitions, metadata struct shape) is real and
  * tested; swapping the stub for a JNI/codec call changes no plan shape.
  *
  * The `documents` table stands in for a media table: its UTF-8 bytes
  * play the role of an encoded image payload.
  */
object Multimodal {

  /** "media" view of documents: payload as binary + source metadata. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      col("source"),
      col("lang").as("meta_lang"))

  /** Metadata extraction over opaque binary payloads — byte length,
    * content digest, magic-byte sniff. Pure built-ins, oracle-checkable.
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
        col("media_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("content_sha256"),
        substring(col("payload"), 1, 4).cast("string").as("magic4"))
      .orderBy(col("media_id"))

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | sha256(text) AS content_sha256,
      | substr(text, 1, 4) AS magic4
      |FROM documents ORDER BY media_id""".stripMargin

  /** Decoded-frame schema a real decoder would produce. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_frames", IntegerType),
    StructField("feature_norm", DoubleType)))

  /** STUB: deterministic fake decode of an "image" payload.
    * A real implementation would hand `payload` to a codec; everything
    * else in this file stays as-is.
    */
  private[llm] def decodeStub(mediaId: Long, payload: Array[Byte]): Row = {
    // deterministic pseudo-properties derived from content bytes
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val width = 64 + (math.abs(h % 1856)).toInt
    val height = 64 + (math.abs((h >> 16) % 1016)).toInt
    val nFrames = 1 + (math.abs((h >> 32) % 16)).toInt
    val featureNorm = (math.abs(h % 100000) / 100000.0)
    Row(mediaId, width, height, "stub/rgb8", nFrames, featureNorm)
  }

  /** Partition-wise batch decode: the Scala analogue of `mapInPandas` —
    * one iterator pass per partition, no per-row task overhead, no
    * driver-side collect. Output schema is fixed ([[decodedSchema]]).
    */
  def decodeFrames(s: SparkSession, dir: String): DataFrame = {
    val enc = ExpressionEncoder(decodedSchema)
    mediaTable(s, dir)
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)) }
      }(enc)
      .orderBy(col("media_id"))
  }

  /** One row per sampled frame per media. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_sha256_8", StringType),
    StructField("frame_bytes", IntegerType)))

  /** Frame sampling as a one-to-many partition-wise transform (the
    * video-frame-extraction shape): every k-th fixed-size byte slice of
    * the payload becomes a frame row. The slicing stands in for a codec
    * seek — schema, fan-out, and partition-wise batching are the real
    * contract; a decoder swap changes only the slice step.
    */
  def sampleFrames(s: SparkSession, dir: String,
                   frameBytes: Int = 256, every: Int = 4): DataFrame = {
    val enc = ExpressionEncoder(frameSchema)
    mediaTable(s, dir)
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val nFrames = math.max(payload.length / frameBytes, 1)
          (0 until nFrames by every).map { f =>
            val from = math.min(f * frameBytes, payload.length)
            val until = math.min(from + frameBytes, payload.length)
            val slice = java.util.Arrays.copyOfRange(payload, from, until)
            val sha = digest.digest(slice).take(4).map("%02x".format(_)).mkString
            Row(id, f, sha, until - from)
          }
        }
      }(enc)
      .orderBy(col("media_id"), col("frame_idx"))
  }
}
