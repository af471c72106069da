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

  test("decode runs partition-wise (no driver-side loop)") {
    val plan = planOf(Multimodal.decodeFrames(spark, sf))
    assert(plan.contains("MapPartitions") || plan.contains("SerializeFromObject"),
      s"decode should be a distributed mapPartitions:\n$plan")
  }
}
