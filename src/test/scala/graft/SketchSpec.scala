package graft

import graft.functions.{CmsEstimate, CmsSketchAgg}
import org.apache.spark.sql.functions._

/** Count-Min sketch aggregate invariants: estimates never underestimate
  * the exact count, overestimate within the eps*N bound, and the merge
  * is partitioning-independent (counter addition is commutative and
  * associative, so any partial-aggregation layout yields the same
  * sketch).
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  private def estimates(numParts: Int): Map[(String, String), Long] = {
    val probes = Seq("the", "data", "spark", "query", "value")
    Tables.load(spark, sf, "documents")
      .repartition(numParts)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("lang"))
      .agg(CmsSketchAgg(xxhash64(col("w"))).as("sketch"))
      .select(col("lang"), col("sketch"), explode(typedLit(probes)).as("word"))
      .select(col("lang"), col("word"),
        CmsEstimate(col("sketch"), xxhash64(col("word"))).as("est"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("CMS estimates bound the exact counts: exact <= est <= exact + eps*N") {
    val w = Tables.load(spark, sf, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
    val exact = w.groupBy(col("lang"), col("w")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = w.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estimates(numParts = 4)
    assert(est.nonEmpty)
    est.foreach { case ((lang, word), e) =>
      val t = exact.getOrElse((lang, word), 0L)
      assert(e >= t, s"CMS underestimated ($lang,$word): $e < $t")
      // D=4, W=512 => overestimate ~ eps*N with eps ~ e/512; 5% of the
      // language's token count is a > 3-sigma slack at spec scale
      assert(e <= t + math.max(totals(lang) / 20, 2),
        s"CMS overestimate out of bound ($lang,$word): $e vs exact $t, N=${totals(lang)}")
    }
  }

  test("CMS merge is partitioning-independent") {
    assert(estimates(numParts = 1) == estimates(numParts = 7))
  }
}
