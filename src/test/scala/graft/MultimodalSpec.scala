package graft

import graft.llm.Multimodal

/** Multimodal plumbing: binary payload handling, metadata extraction,
  * and the partition-wise decode contract (deterministic stub).
  */
class MultimodalSpec extends SparkSpec {

  test("mediaMeta: byte length and sha256 over binary payloads") {
    val rows = Multimodal.mediaMeta(spark, sf).limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getString(2).length == 64) // hex sha256
    }
  }

  test("decodeFrames: fixed schema, one row per media, deterministic") {
    val df = Multimodal.decodeFrames(spark, sf)
    assert(df.schema == Multimodal.decodedSchema)
    val n = graft.Tables.load(spark, sf, "documents").count()
    val a = df.collect()
    assert(a.length == n)
    a.foreach { r =>
      assert(r.getInt(1) >= 64 && r.getInt(2) >= 64)
      assert(r.getInt(4) >= 1)
    }
    // determinism: second run bit-identical
    val b = Multimodal.decodeFrames(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("sampleFrames: one-to-many fan-out, deterministic, bounded slices") {
    val df = Multimodal.sampleFrames(spark, sf)
    assert(df.schema == Multimodal.frameSchema)
    val rows = df.collect()
    val nMedia = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.length >= nMedia) // at least frame 0 per media
    rows.foreach { r =>
      assert(r.getInt(1) % 4 == 0)       // every-4th sampling
      assert(r.getInt(3) > 0 && r.getInt(3) <= 256)
      assert(r.getString(2).length == 8) // truncated hex digest
    }
    val again = Multimodal.sampleFrames(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("decodeImages: REAL JDK decode of PNG and BMP payloads, null for garbage") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0x000000)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, encode(8, 5, "png")),
      (2L, encode(16, 9, "bmp")),
      (3L, "definitely not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val rows = Multimodal.decodeImages(media).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(1) == 8 && byId(1L).getInt(2) == 5)
    assert(byId(1L).getString(3) == "png")
    assert(byId(2L).getInt(1) == 16 && byId(2L).getInt(2) == 9)
    assert(byId(2L).getString(3) == "bmp")
    // checkerboard: mean luma ~ 0.5 (within integer-rounding slack)
    assert(math.abs(byId(1L).getDouble(4) - 0.5) < 0.1)
    assert(byId(3L).isNullAt(1) && byId(3L).isNullAt(3))
  }

  test("mediaDedup: planted exact-duplicate payloads form a group; near-identical do not") {
    import spark.implicits._
    val blob = Array.tabulate[Byte](257)(i => (i * 7).toByte)
    val nearBlob = blob.clone(); nearBlob(200) = (nearBlob(200) ^ 1).toByte
    val media = Seq(
      (10L, blob),                          // dup group member
      (11L, blob.clone()),                  // exact copy, distinct array
      (12L, nearBlob),                      // 1-bit-different: must NOT collide
      (13L, "unique payload".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val groups = Multimodal.mediaDedupOf(media).collect()
    assert(groups.length == 1, s"expected exactly the planted dup group, got ${groups.toSeq}")
    val g = groups.head
    assert(g.getLong(1) == 2L)        // n_copies
    assert(g.getLong(2) == 10L)       // keep = min media_id
    // the registered-query path stays wired to the same core
    assert(Multimodal.mediaDedup(spark, sf).columns.toSeq ==
      Seq("digest", "n_copies", "keep_media_id"))
  }

  test("decode runs partition-wise (no driver-side loop)") {
    val plan = planOf(Multimodal.decodeFrames(spark, sf))
    assert(plan.contains("MapPartitions") || plan.contains("SerializeFromObject"),
      s"decode should be a distributed mapPartitions:\n$plan")
  }
}
