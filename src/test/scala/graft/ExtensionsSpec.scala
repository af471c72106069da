package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions registers the custom expressions as SQL functions on
  * a session built with .withExtensions (the standard deployment path
  * via spark.sql.extensions).
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate reuses any existing session and silently drops
    // withExtensions — detach the shared test session first so this
    // builder really constructs a new session (same SparkContext).
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    prior.foreach(SparkSession.setDefaultSession)
    prior.foreach(SparkSession.setActiveSession)
    s
  }

  test("simhash64 callable from SQL, deterministic, text-sensitive") {
    val r = spark.sql(
      """SELECT simhash64('the quick brown fox') AS a,
        |       simhash64('the quick brown fox') AS b,
        |       simhash64('totally different words entirely') AS c""".stripMargin)
      .collect().head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("sorted_intersect_size callable from SQL") {
    val r = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS n")
      .collect().head
    assert(r.getInt(0) == 2)
  }

  test("bloom_agg + bloom_might_contain callable from SQL") {
    val r = spark.sql(
      """WITH items AS (SELECT explode(array(10L, 20L, 30L)) AS g),
        |bf AS (SELECT bloom_agg(g) AS f FROM items)
        |SELECT bloom_might_contain(f, 20L) AS hit,
        |       bloom_might_contain(f, 999L) AS miss
        |FROM bf""".stripMargin).collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("pq_encode + pq_adc_lut + pq_adc_score callable from SQL, consistent") {
    // 2 subspaces x 2 centroids x 2 dims; v sits exactly on codebook
    // cells (0, 1) -> code [0, 1]; the ADC score of a code must equal
    // the sum of that code's LUT entries
    val r = spark.sql(
      """WITH p AS (SELECT
        |  array(1.0D, 0.0D,  0.0D, 1.0D,   1.0D, 1.0D,  -1.0D, 0.0D) AS cb,
        |  array(0.5D, 0.5D, 1.0D, 0.5D) AS half_norms,
        |  array(1.0D, 1.0D, 2.0D, 1.0D) AS norms,
        |  array(1.0D, 0.0D, -1.0D, 0.0D) AS v)
        |SELECT pq_encode(v, cb, half_norms, 2, 2) AS code,
        |       pq_adc_lut(v, cb, norms, 2, 2) AS lut,
        |       pq_adc_score(pq_adc_lut(v, cb, norms, 2, 2),
        |                    pq_encode(v, cb, half_norms, 2, 2), 2) AS score
        |FROM p""".stripMargin).collect().head
    assert(r.getSeq[Int](0) == Seq(0, 1))
    val lut = r.getSeq[Double](1)
    val code = r.getSeq[Int](0)
    val expected = lut(0 * 2 + code(0)) + lut(1 * 2 + code(1))
    assert(math.abs(r.getDouble(2) - expected) < 1e-12)
  }
}
