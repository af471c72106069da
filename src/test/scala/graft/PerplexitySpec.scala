package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Pins for [[TextQueries.perplexity]] — the trigram-LM quality scorer.
  * Its value parity is oracle-checked by the driver; these tests pin
  * the two assumptions the oracle hash can't explain on its own:
  *
  *  1. the MICRONATS determinism chain: Spark's `round(log(n)*1e6)`
  *     must equal the Java `Math.round(Math.log(n)*1e6)` reference that
  *     was exhaustively verified against DuckDB `ln` for every integer
  *     n in [1, 2e7] (zero mismatches; see the perplexity scaladoc) —
  *     and the corpus's counts must stay inside that verified domain;
  *  2. the scoring itself: an independent driver-side re-derivation of
  *     one document's surprise from raw text must match exactly.
  */
class PerplexitySpec extends SparkSpec {

  test("Spark round(log(n)*1e6) equals the Java reference over a domain sample") {
    import spark.implicits._
    // dense at the small counts that dominate real corpora, sparse to 2e7
    val ns = ((1L to 10000L) ++ (1L to 2000L).map(_ * 10000L)).toDF("n")
    val got = ns.select(col("n"),
        round(log(col("n").cast("double")) * lit(1e6)).cast("long").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    got.foreach { case (n, m) =>
      assert(m == Math.round(Math.log(n.toDouble) * 1e6), s"n=$n")
    }
  }

  test("context counts stay inside the ln-parity-verified domain [1, 2e7]") {
    val maxC2 = TextQueries.perplexity(spark, sf)
      .agg(max(col("surprise_micronats"))).collect() // force the plan once
    // re-derive the actual max context count from the raw corpus
    val grams = Tables.load(spark, sf, "documents")
      .select(explode(expr(
        """transform(slice(split(text, ' '), 1,
          |               greatest(size(split(text, ' ')) - 2, 0)),
          |  (x, i) -> concat(x, ' ', split(text, ' ')[i + 1]))""".stripMargin))
        .as("context"))
      .groupBy(col("context")).agg(count(lit(1)).as("c2"))
      .agg(max(col("c2"))).collect().head.getLong(0)
    assert(grams >= 1L && grams < 20000000L,
      s"max context count $grams outside the verified ln domain")
    assert(maxC2.head.getLong(0) >= 0L)
  }

  test("one document's surprise re-derived from raw text matches exactly") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // corpus trigram model, driver-side
    def grams(t: String): Seq[(String, String)] = {
      val w = t.split(" ", -1)
      (0 until math.max(w.length - 2, 0)).map(i => (s"${w(i)} ${w(i + 1)}", w(i + 2)))
    }
    val c3 = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach(d => grams(d._2).foreach(g => c3(g) = c3.getOrElse(g, 0L) + 1))
    val c2 = c3.groupBy(_._1._1).map { case (ctx, m) => ctx -> m.values.sum }
    def lnMicro(n: Long): Long = Math.round(Math.log(n.toDouble) * 1e6)
    val target = docs.filter(_._2.split(" ", -1).length >= 3).head
    val gs = grams(target._2)
    val expectedSum = gs.map(g => lnMicro(c2(g._1)) - lnMicro(c3(g))).sum
    val row = TextQueries.perplexity(spark, sf)
      .filter(col("doc_id") === target._1).collect().head
    assert(row.getLong(1) == gs.length.toLong)
    assert(row.getLong(2) == expectedSum,
      s"surprise ${row.getLong(2)} vs re-derived $expectedSum")
    assert(row.getDouble(3) == expectedSum.toDouble / gs.length.toDouble)
  }

  test("ccnetBuckets: terciles replay from a driver-side rank of the perplexity output") {
    val langOf = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ppl = TextQueries.perplexity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val expected = ppl.groupBy(d => langOf(d._1)).toSeq.flatMap {
      case (lang, ds) =>
        val sorted = ds.sortBy { case (id, _, avg) => (avg, id) }
        val n = sorted.length.toLong
        sorted.zipWithIndex
          .map { case ((_, ng, avg), i) => (3L * i / n, ng, avg) }
          .groupBy(_._1).toSeq.map { case (b, g) =>
            (lang, b, Seq("head", "middle", "tail")(b.toInt),
              g.length.toLong, g.map(_._2).sum,
              g.map(_._3).min, g.map(_._3).max)
          }
    }.sortBy { case (l, b, _, _, _, _, _) => (l, b) }
    val got = TextQueries.ccnetBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == expected, "tercile census diverges from the driver replay")
    // tercile invariants: per lang, bucket sizes differ by at most 1
    // and surprise ranges are non-overlapping in bucket order
    got.groupBy(_._1).foreach { case (lang, bs) =>
      val sizes = bs.sortBy(_._2).map(_._4)
      assert(sizes.max - sizes.min <= 1, s"$lang tercile sizes $sizes")
      val ordered = bs.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._7 <= b._6, s"$lang bucket ranges overlap")
        case _ => ()
      }
    }
  }
}
