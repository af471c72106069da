package graft

import graft.functions.DeflateSize
import org.apache.spark.sql.functions._

/** DeflateSize has no SQL oracle (DuckDB exposes no DEFLATE), so its
  * behavior is pinned here: byte-exact fixtures against java.util.zip
  * run driver-side, the compressibility ordering the quality filter
  * relies on, and stability across repeated evaluation.
  */
class CompressionSpec extends SparkSpec {

  import spark.implicits._

  private def sizes(ss: String*): Seq[Long] =
    ss.toDF("s").select(DeflateSize(col("s")).as("n"))
      .collect().map(_.getLong(0)).toSeq

  private def referenceSize(s: String): Long = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 16)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  test("matches a driver-side Deflater byte-for-byte") {
    val cases = Seq("", "a", "hello world", "ab" * 500,
      (1 to 200).map(i => s"tok$i").mkString(" "))
    assert(sizes(cases: _*) == cases.map(referenceSize))
  }

  test("repetitive < prose < random, and measurement is stable") {
    val repetitive = "spark " * 200
    val prose = (1 to 200).map(i => s"word${i % 40} item$i").mkString(" ")
    val rnd = new scala.util.Random(3)
    val random = Seq.fill(1200)(rnd.nextPrintableChar()).mkString
    val Seq(r1, p1, x1) = sizes(repetitive, prose, random)
    assert(r1 < p1 && p1 < x1)
    assert(sizes(repetitive, prose, random) == Seq(r1, p1, x1)) // stable
  }

  test("compressionRatio query: ratios positive and repetition-sensitive") {
    val out = graft.queries.TextQueries.compressionRatio(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, nChars, dBytes, ratio) =>
      assert(dBytes > 0 && ratio > 0)
      // raw-deflate framing overhead dominates on tiny texts (a few
      // chars can deflate to > 2x n_chars), so the <2.0 upper bound is
      // only meaningful for documents long enough to amortize it.
      if (nChars >= 64) assert(ratio < 2.0, s"ratio $ratio at nChars=$nChars")
      assert(math.abs(ratio - dBytes.toDouble / nChars) < 1e-15)
    }
  }

  test("compressionAudit: counters clean + char totals tie to the per-doc surface") {
    val audit = graft.queries.TextQueries.compressionAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(audit.nonEmpty)
    audit.foreach { case (src, nDocs, _, lv, bv, sv) =>
      assert(nDocs > 0L, src)
      assert(lv == 0L && bv == 0L && sv == 0L,
        s"$src violations: len=$lv bound=$bv subadd=$sv")
    }
    // conservation cross-check against the independent per-doc query
    val perDocChars = graft.queries.TextQueries.compressionRatio(spark, sf)
      .collect().map(_.getLong(1)).sum
    assert(audit.map(_._3).sum == perDocChars,
      "audit total_chars != per-doc n_chars sum")
  }
}
