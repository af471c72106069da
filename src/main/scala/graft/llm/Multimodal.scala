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
  * Decode has two legs:
  *   - [[decodeImages]] — REAL decode + mean-luma feature extraction
  *     for the formats the JDK reads natively (PNG/JPEG/BMP/GIF via
  *     `javax.imageio`, headless, zero external codecs), spec-driven
  *     on real encoded fixtures;
  *   - [[decodeStub]] — a clearly-marked DETERMINISTIC STUB standing in
  *     for beyond-JDK codecs (video/audio), which don't ship in this
  *     container. The Spark-side contract (schema, binary columns,
  *     partition-wise mapPartitions batching) is identical for both, so
  *     swapping the stub for a JNI/codec call changes no plan shape.
  *
  * The `documents` table stands in for a media table in the registered
  * queries: its UTF-8 bytes play the role of an encoded payload.
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
    * The magic sniff is reported as HEX of the first 4 BYTES (how magic
    * numbers are actually compared) — a string-decode of those bytes
    * would be char-based in the oracle and diverge on any multi-byte
    * content.
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
        col("media_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("content_sha256"),
        hex(substring(col("payload"), 1, 4)).as("magic4_hex"))
      .orderBy(col("media_id"))

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | sha256(text) AS content_sha256,
      | substr(hex(encode(text)), 1, 8) AS magic4_hex
      |FROM documents ORDER BY media_id""".stripMargin

  /** Exact dedup over the BINARY payload — the media leg of the dedup
    * family (text dedup keys on normalized content; media dedup keys on
    * raw bytes, the only equality that exists for opaque blobs). One
    * shuffle on the 32-byte digest — payload bytes never move, which at
    * 100 TB of media is the entire point: the shuffle carries ~0.03 %
    * of the scanned volume. Emits duplicate groups (keep = min id).
    */
  def mediaDedup(s: SparkSession, dir: String): DataFrame =
    mediaDedupOf(mediaTable(s, dir))

  /** Core of [[mediaDedup]] over any (media_id, payload) frame — split
    * out so the spec can plant exact-duplicate payloads and assert a
    * NON-EMPTY group (the registered query's corpus has no exact dup
    * payloads, so its oracle row alone would be vacuously green). */
  def mediaDedupOf(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), sha2(col("payload"), 256).as("digest"))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("keep_media_id"))
      .filter(col("n_copies") >= 2)
      .orderBy(col("digest"))

  val mediaDedupSql: String =
    """SELECT sha256(text) AS digest, COUNT(*) AS n_copies,
      | MIN(doc_id) AS keep_media_id
      |FROM documents GROUP BY 1 HAVING COUNT(*) >= 2
      |ORDER BY digest""".stripMargin

  /** Chunk-level dedup over BINARY payloads via content-defined chunking
    * ([[graft.functions.CdcChunks]], FastCDC-style gear hash): where
    * [[mediaDedup]] only finds byte-identical whole payloads, CDC finds
    * the SHARED BYTES between near-copies (same media re-containered,
    * headers prepended, segments appended) because chunk boundaries
    * re-sync on content after any local edit. Reports, per source: chunk
    * count, distinct chunks, byte volumes, and the dedup ratio a
    * chunk-store would achieve.
    *
    * Shape at scale: chunking is a narrow codegen'd map (payload bytes
    * never shuffle); the exchange carries (source, digest, len) chunk
    * records — metadata, ~1% of payload volume at real chunk sizes —
    * and the per-source rollup is a standard two-level aggregation.
    * No DuckDB oracle (the rolling hash is engine-side); MultimodalSpec
    * pins exact tiling, determinism, and boundary re-sync after a
    * prepended edit.
    */
  def cdcChunkStats(s: SparkSession, dir: String): DataFrame = {
    val chunks = mediaTable(s, dir)
      .select(col("source"),
        explode(graft.functions.CdcChunks(col("payload"))).as("c"))
      .select(col("source"), col("c.digest").as("digest"),
        col("c.len").as("len"))
    chunks
      .groupBy(col("source"), col("digest"))
      .agg(count(lit(1)).as("n_copies"), first(col("len")).as("len"))
      .groupBy(col("source"))
      .agg(
        sum(col("n_copies")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("n_copies") * col("len")).as("bytes_total"),
        sum(col("len")).as("bytes_unique"))
      .withColumn("dedup_ratio",
        col("bytes_unique").cast("double") / col("bytes_total").cast("double"))
      .orderBy(col("source"))
  }

  /** Chunk-sharing containment pairs over [[cdcChunkStats]]'s chunks:
    * media pairs that share ≥ `minShared` content-defined chunk digests
    * are byte-level near-copies (one re-containered / header-edited
    * copy of the other) even when whole-payload digests differ. The
    * inverted (digest → holders) index is capped at `maxHolders` before
    * pairing — a ubiquitous boilerplate chunk would otherwise explode
    * the candidate count quadratically (the same posting-cap discipline
    * as the text inverted index / LSH buckets). Payload bytes never
    * shuffle: pairing happens on (digest, media_id) records only.
    */
  def cdcSharedPairs(s: SparkSession, dir: String,
                     minShared: Int = 2, maxHolders: Int = 10): DataFrame =
    cdcSharedPairsOf(mediaTable(s, dir), minShared, maxHolders)

  /** Core of [[cdcSharedPairs]] over any (media_id, payload) frame —
    * split out so the spec can plant a shifted near-copy and assert the
    * pair is FOUND (the registered corpus has no byte-level near-dups,
    * so its output alone would be vacuously green).
    */
  def cdcSharedPairsOf(media: DataFrame, minShared: Int,
                       maxHolders: Int): DataFrame = {
    val chunks = media
      .select(col("media_id"),
        explode(graft.functions.CdcChunks(col("payload"))).as("c"))
      .select(col("media_id"), col("c.digest").as("digest"))
      .distinct()
    val rare = chunks.groupBy(col("digest"))
      .agg(count(lit(1)).as("n_holders"))
      .filter(col("n_holders") >= 2 && col("n_holders") <= maxHolders)
      .select(col("digest"))
    val held = chunks.join(rare, "digest")
    held.as("a").join(held.as("b"),
        col("a.digest") === col("b.digest") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("media_a"),
        col("b.media_id").as("media_b"))
      .agg(count(lit(1)).as("n_shared_chunks"))
      .filter(col("n_shared_chunks") >= minShared)
      .orderBy(col("n_shared_chunks").desc, col("media_a"), col("media_b"))
  }

  /** Structural oracle for the gear-hash chunker (the r12 graduation
    * pattern: deterministic exact columns beside a contract constant,
    * computed FROM the real sketch — here from the real chunk arrays).
    * Per source: media count and payload byte volume (both
    * DuckDB-recomputable from the documents fixture) plus three
    * violation counters the oracle pins at 0:
    *   - conservation: Σ chunk len == octet_length(payload);
    *   - tiling: chunks are contiguous from offset 0 (fold over the
    *     chunk array comparing each offset to the running length sum —
    *     catches overlaps and gaps that length conservation alone
    *     would cancel out);
    *   - bounds: every chunk ≤ maxLen and every NON-FINAL chunk ≥
    *     minLen (the final chunk may be a short tail).
    * A broken chunker (dropped chunk, wrong boundary, overlap,
    * unforced cut) now hash-fails the driver gate instead of only
    * failing MultimodalSpec. All checks are codegen'd array folds
    * (`aggregate`/`forall`) riding the same narrow map as the chunker
    * — payload bytes still never shuffle; the exchange carries one
    * 5-column row per media.
    */
  def cdcChunkAudit(s: SparkSession, dir: String, maskBits: Int = 6,
                    minLen: Int = 16, maxLen: Int = 256): DataFrame = {
    val perMedia = mediaTable(s, dir).select(
      col("source"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      graft.functions.CdcChunks(col("payload"), maskBits, minLen, maxLen)
        .as("chunks"))
    val lenSum = aggregate(col("chunks"), lit(0L),
      (acc, x) => acc + x.getField("len").cast("long"))
    val contig = aggregate(col("chunks"),
      struct(lit(0L).as("off"), lit(true).as("ok")),
      (acc, x) => struct(
        (acc.getField("off") + x.getField("len").cast("long")).as("off"),
        (acc.getField("ok") &&
          x.getField("offset").cast("long") === acc.getField("off")).as("ok")))
      .getField("ok")
    val bounds =
      forall(col("chunks"),
        x => x.getField("len") >= lit(1) && x.getField("len") <= lit(maxLen)) &&
      forall(slice(col("chunks"), lit(1), greatest(size(col("chunks")) - 1, lit(0))),
        x => x.getField("len") >= lit(minLen))
    perMedia
      .select(col("source"), col("n_bytes"),
        (lenSum === col("n_bytes")).as("conserved"),
        contig.as("contig"), bounds.as("bounds"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("bytes_payload"),
        sum(when(!col("conserved"), 1L).otherwise(0L))
          .as("conservation_violations"),
        sum(when(!col("contig"), 1L).otherwise(0L)).as("tiling_violations"),
        sum(when(!col("bounds"), 1L).otherwise(0L)).as("bounds_violations"))
      .orderBy(col("source"))
  }

  val cdcChunkAuditSql: String =
    """SELECT source, COUNT(*) AS n_media,
      | CAST(SUM(octet_length(encode(text))) AS BIGINT) AS bytes_payload,
      | CAST(0 AS BIGINT) AS conservation_violations,
      | CAST(0 AS BIGINT) AS tiling_violations,
      | CAST(0 AS BIGINT) AS bounds_violations
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Structural oracle for the chunk-sharing pair finder: plant an
    * exact byte-twin (media_id + 1 000 000) for every document below
    * `plantBelow`, run [[cdcSharedPairsOf]] over ONLY those docs and
    * their twins, and assert every planted pair is FOUND (identical
    * payloads share their entire chunk set, so `found` = 1 is
    * deterministic whatever boundaries the gear hash picks — this is
    * the completeness half of the contract, the same one-sided shape
    * as the bloom no-false-negative audit). The expected pair list is
    * DuckDB-recomputable from doc_ids alone; extra same-text fixture
    * pairs the finder may also report are out of contract (LEFT join).
    * Determinism of the chunker across rows + the inverted-index /
    * holder-cap / pairing plumbing are what this pins; boundary
    * CORRECTNESS is [[cdcChunkAudit]]'s job.
    */
  def cdcPairsAudit(s: SparkSession, dir: String,
                    plantBelow: Long = 100L): DataFrame = {
    val base = mediaTable(s, dir)
      .filter(col("media_id") < plantBelow)
      .select(col("media_id"), col("payload"))
    val twins = base.select((col("media_id") + lit(1000000L)).as("media_id"),
      col("payload"))
    val found = cdcSharedPairsOf(base.unionByName(twins),
      minShared = 1, maxHolders = 10)
    val expected = base.select(col("media_id").as("media_a"),
      (col("media_id") + lit(1000000L)).as("media_b"))
    expected.join(found, Seq("media_a", "media_b"), "left")
      .select(col("media_a"), col("media_b"),
        when(col("n_shared_chunks").isNotNull, 1L).otherwise(0L).as("found"))
      .orderBy(col("media_a"))
  }

  def cdcPairsAuditSql(plantBelow: Long = 100L): String =
    s"""SELECT doc_id AS media_a, doc_id + 1000000 AS media_b,
       | CAST(1 AS BIGINT) AS found
       |FROM documents WHERE doc_id < $plantBelow ORDER BY media_a""".stripMargin

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

  /** Real-decode output: null width/height/format marks an undecodable
    * payload (kept, not dropped — at pipeline scale you audit decode
    * failures, you don't silently lose them).
    */
  val imageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("mean_luma", DoubleType)))

  /** REAL image decode + feature extraction for the formats the JDK
    * itself can read (PNG/JPEG/BMP/GIF via `javax.imageio` — part of
    * every JDK, headless-safe, no external codec libraries): dimensions,
    * container format, and a mean-luminance feature (Rec.601 luma
    * averaged over all pixels). Runs partition-wise exactly like
    * [[decodeFrames]]; payloads outside the JDK's format set yield a
    * null-metadata row — for those, [[decodeStub]] remains the declared
    * seam where a JNI/codec dependency would slot in.
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(imageSchema)
    media
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        System.setProperty("java.awt.headless", "true")
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          decodeImage(payload) match {
            case Some((w, h, fmt, luma)) => Row(id, w, h, fmt, luma)
            case None => Row(id, null, null, null, null)
          }
        }
      }(enc)
      .orderBy(col("media_id"))
  }

  private[llm] def decodeImage(payload: Array[Byte])
      : Option[(Int, Int, String, Double)] = {
    import javax.imageio.ImageIO
    val in = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(in)
        val fmt = reader.getFormatName.toLowerCase
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((w, h, fmt, sum / (255.0 * w * h)))
      } finally reader.dispose()
    } catch {
      case _: Exception => None
    } finally in.close()
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
