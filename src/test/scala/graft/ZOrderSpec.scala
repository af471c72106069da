package graft

import java.nio.file.Files

import graft.plans.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout: key correctness against a bit-by-bit reference, the
  * out-of-range guard, and the property that justifies the layout at
  * scale — every written partition is narrow in BOTH clustered
  * dimensions, so min/max stats prune scans on either predicate.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** naive bit-by-bit interleave, the definition the fast dilation in
    * ZOrderKey.spread must match
    */
  private def refInterleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("ZOrderKey matches the bit-by-bit reference on boundary and random pairs") {
    val rnd = new scala.util.Random(7)
    val max = graft.functions.ZOrderKey.MaxDim
    val pairs = Seq((0L, 0L), (max - 1, max - 1), (0L, max - 1), (max - 1, 0L),
      (1L, 2L)) ++ Seq.fill(200)((rnd.nextLong(max), rnd.nextLong(max)))
    val got = pairs.toDF("x", "y")
      .select(graft.functions.ZOrderKey(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    pairs.zip(got).foreach { case ((x, y), z) =>
      assert(z == refInterleave(x, y), s"interleave($x, $y)")
    }
  }

  test("ZOrderKey rejects out-of-range dimensions descriptively") {
    val e = intercept[Exception] {
      Seq((graft.functions.ZOrderKey.MaxDim, 0L)).toDF("x", "y")
        .select(graft.functions.ZOrderKey(col("x"), col("y"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      String.valueOf(c.getMessage).contains("zorder_key dimensions")))
  }

  test("z-ordered write bounds BOTH dimensions per partition") {
    val tmp = Files.createTempDirectory("graft_zorder").toString
    // a uniform 256x256 grid (one row per cell): tile geometry is then a
    // property of the curve alone, not of data density quirks
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).as("x"), expr("id div 256").as("y"))
    ZOrder.writeZOrdered(grid, "x", "y", 16, s"$tmp/grid_z")
    // each written FILE is one range partition; measure per-file spans
    val spans = spark.read.parquet(s"$tmp/grid_z")
      .select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy(col("f"))
      .agg((max(col("x")) - min(col("x"))).as("x_span"),
        (max(col("y")) - min(col("y"))).as("y_span"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.length > 8, "range partitioning must actually fan out")
    // a single-column sort would leave the OTHER dimension's span at
    // 255 (100%) in EVERY partition; a 1/16 z-curve segment is a
    // bounded rectangle union — most tiles sit inside one depth-2
    // quadrant (span <= 50%), and even seam-straddling tiles can't
    // approach full area. Pin both: the typical tile and the average.
    val tight = spans.count(r => r.getAs[Long]("x_span") <= 128 &&
      r.getAs[Long]("y_span") <= 128)
    assert(tight * 2 >= spans.length,
      s"at least half the tiles must be quadrant-tight, got $tight/${spans.length}: " +
        spans.map(r => (r.getAs[Long]("x_span"), r.getAs[Long]("y_span"))).mkString(", "))
    val avgArea = spans.map(r => (r.getAs[Long]("x_span") + 1.0) *
      (r.getAs[Long]("y_span") + 1.0)).sum / spans.length
    assert(avgArea <= 256.0 * 256.0 * 0.3,
      s"average tile bounding area $avgArea must be well under the global area")
  }
}
