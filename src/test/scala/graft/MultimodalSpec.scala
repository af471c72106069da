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

  test("CDC chunks: exact tiling, deterministic, boundaries re-sync after edits") {
    import org.apache.spark.sql.functions.{col, explode}
    import spark.implicits._
    // deterministic pseudo-random 8 KiB payload (splitmix-ish LCG)
    def noise(seed: Long, n: Int): Array[Byte] = {
      var x = seed; Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte
      }
    }
    val base = noise(7L, 8192)
    val shifted = Array.fill[Byte](37)(0x55.toByte) ++ base // 37-byte prepend
    val df = Seq((1L, base), (2L, shifted), (3L, base)).toDF("media_id", "payload")
    val rows = df.select(col("media_id"),
        explode(graft.functions.CdcChunks(col("payload"), 6, 16, 256)).as("c"))
      .select(col("media_id"), col("c.offset"), col("c.len"), col("c.digest"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val byId = rows.groupBy(_._1)
    // exact tiling: contiguous offsets, lens sum to payload size, caps hold
    for ((id, cs0) <- byId) {
      val cs = cs0.sortBy(_._2)
      val size = if (id == 2L) 8192 + 37 else 8192
      assert(cs.head._2 == 0 && cs.map(_._3).sum == size, s"media $id tiling")
      cs.sliding(2).foreach {
        case Array(a, b) => assert(a._2 + a._3 == b._2, s"media $id gap")
        case _ =>
      }
      cs.init.foreach { c => assert(c._3 >= 16 && c._3 <= 256, s"media $id len") }
    }
    // determinism: identical payloads chunk identically
    assert(byId(1L).map(t => (t._2, t._3, t._4)).toSeq ==
      byId(3L).map(t => (t._2, t._3, t._4)).toSeq)
    // re-sync: after the 37-byte prepend, most of the original chunk
    // digests reappear — the content-defined property fixed-size
    // chunking lacks (there, EVERY boundary would move)
    val origDigests = byId(1L).map(_._4).toSet
    val shiftDigests = byId(2L).map(_._4).toSet
    val common = origDigests.intersect(shiftDigests).size.toDouble
    assert(common / origDigests.size >= 0.8,
      s"only ${common}/${origDigests.size} chunks survived the shift")
    // the registered rollup is consistent on the corpus
    val stats = Multimodal.cdcChunkStats(spark, sf).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), "n_chunks >= n_distinct_chunks")
      assert(r.getLong(3) >= r.getLong(4), "bytes_total >= bytes_unique")
      val ratio = r.getDouble(5)
      assert(ratio > 0 && ratio <= 1.0 + 1e-12)
    }
    // chunk-sharing pairs: the planted shifted near-copy (2) and exact
    // copy (3) must both pair with the base (1); negative control: a
    // fresh unrelated payload pairs with nothing
    val df4 = Seq((1L, base), (2L, shifted), (3L, base),
        (4L, noise(99L, 8192))).toDF("media_id", "payload")
    val pairs = Multimodal.cdcSharedPairsOf(df4, minShared = 2, maxHolders = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)), s"shifted near-copy not found: ${keys.toSeq}")
    assert(keys.contains((1L, 3L)) && keys.contains((2L, 3L)))
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated payload must not pair")
    // the exact-copy pair shares every chunk the shifted pair shares or more
    val full = pairs.find(p => (p._1, p._2) == (1L, 3L)).get._3
    val shift = pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3
    assert(full >= shift)
  }
}
