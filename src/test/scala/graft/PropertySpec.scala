package graft

import java.nio.file.Files
import java.time.LocalDateTime

import graft.ingest.{DolarIngest, RawZone}
import graft.queries.IntervalQuery
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5 plan item 2), ScalaCheck-generated and
  * batched into single Spark jobs:
  *   - interval query ≡ brute-force filter+sort on random series;
  *   - ingest conservation: inserted + bad == wire rows, per file and
  *     in total, for random dirty payloads (H2/H3/D2 invariants);
  *   - epoch-ms → second-truncated timestamp round trip.
  */
class PropertySpec extends SparkSpec {

  private val params = Gen.Parameters.default

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(params, Seed(seed))

  private val genTsMs: Gen[Long] = Gen.choose(1600000000000L, 1800000000000L)
  private val genValor: Gen[Double] =
    Gen.choose(100000L, 99999999L).map(_ / 10000.0) // 4dp-exact doubles

  test("interval query ≡ brute-force filter+sort on random series") {
    val pairs = (1 to 300).map { i =>
      (sample(genTsMs, i.toLong), sample(genValor, 1000L + i))
    }
    val schema = StructType(Seq(
      StructField("fechahora", TimestampType),
      StructField("valor", DecimalType(12, 4))))
    val rows = pairs.map { case (ms, v) =>
      Row(new java.sql.Timestamp(ms - ms % 1000), BigDecimal(v).bigDecimal)
    }
    val table = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)

    for (seed <- 1L to 10L) {
      val aMs = sample(genTsMs, 5000L + seed)
      val bMs = sample(genTsMs, 6000L + seed)
      val (loMs, hiMs) = if (aMs < bMs) (aMs, bMs) else (bMs, aMs)
      val lo = LocalDateTime.ofEpochSecond(loMs / 1000, 0, java.time.ZoneOffset.UTC)
      val hi = LocalDateTime.ofEpochSecond(hiMs / 1000 + 1, 0, java.time.ZoneOffset.UTC)
      val got = IntervalQuery.over(table, lo, hi).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getDouble(1)))

      val expect = pairs
        .map { case (ms, v) => (ms - ms % 1000, v) }
        .filter { case (sec, _) => sec >= (loMs - loMs % 1000) && sec <= (hiMs - hiMs % 1000) + 1000 }
      // same multiset...
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ==
        expect.groupBy(identity).view.mapValues(_.size).toMap,
        s"seed=$seed interval=[$lo,$hi]")
      // ...and ascending fechahora
      assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    }
  }

  test("ingest conservation: inserted + bad == wire rows, per file and total") {
    val raw = Files.createTempDirectory("graft_prop_ingest").resolve("raw").toString
    case class FileTruth(file: Int, valid: Int, bad: Int)
    val genRow: Gen[(String, Boolean)] = Gen.frequency(
      6 -> Gen.zip(genTsMs, genValor).map { case (ts, v) => (s"""["$ts","$v"]""", true) },
      1 -> Gen.const(("""["not_a_ts","123.4"]""", false)),
      1 -> Gen.const(("""["1700000000000","garbage"]""", false)),
      1 -> Gen.const(("""["only_one"]""", false)),
      1 -> Gen.const(("""["1700000000000","1.0","extra"]""", false)))

    val truths = (0 until 12).map { f =>
      val nRows = sample(Gen.choose(0, 15), 100L + f)
      val rows = (0 until nRows).map(r => sample(genRow, f * 1000L + r))
      RawZone.write(raw, f.toLong, rows.map(_._1).mkString("[", ",", "]"))
      FileTruth(f, rows.count(_._2), rows.count(!_._2))
    }

    val report = DolarIngest.batchToPath(spark, raw,
      Files.createTempDirectory("graft_prop_dest").toString + "/dolar")

    assert(report.totalRowsInserted == truths.map(_.valid).sum)
    assert(report.filesProcessed == truths.count(_.valid > 0)) // H3
    report.details.foreach { d =>
      val f = truths.find(t => d.file.contains(s"dolar-${t.file}.json")).get
      assert(d.inserted == f.valid && d.bad == f.bad, s"file ${f.file}")
    }
    // files with zero valid rows never appear in details (H3)
    assert(report.details.size == truths.count(_.valid > 0))
  }

  test("epoch-ms -> second-truncated UTC timestamp round trip") {
    val raw = Files.createTempDirectory("graft_prop_ts").resolve("raw").toString
    val msSamples = (1 to 50).map(i => sample(genTsMs, 7000L + i))
    RawZone.write(raw, 1L,
      msSamples.map(ms => s"""["$ms","1234.5678"]""").mkString("[", ",", "]"))
    val dest = Files.createTempDirectory("graft_prop_ts_d").toString + "/dolar"
    DolarIngest.batchToPath(spark, raw, dest)
    val got = spark.read.parquet(dest).collect()
      .map(_.getTimestamp(0).getTime).sorted
    val expect = msSamples.map(ms => ms - ms % 1000).sorted
    assert(got.toSeq == expect.toSeq)
  }

  test("MinHash slot agreement estimates exact Jaccard (64 perms, ±0.25)") {
    // random overlapping long-sets: est = |{p : sigA[p]==sigB[p]}| / P is
    // an unbiased Jaccard estimator with std sqrt(j(1-j)/64) <= 0.0625 —
    // a fixed-seed ±0.25 band is > 3 sigma for every pair
    val rnd = new scala.util.Random(97)
    val pairs = (1 to 15).map { _ =>
      val base = Seq.fill(60 + rnd.nextInt(60))(rnd.nextLong()).distinct
      val keep = base.filter(_ => rnd.nextDouble() < 0.3 + rnd.nextDouble() * 0.6)
      val extra = Seq.fill(rnd.nextInt(40))(rnd.nextLong()).distinct
      (base, (keep ++ extra).distinct)
    }
    pairs.foreach { case (a, b) =>
      val j = (a.toSet & b.toSet).size.toDouble / (a.toSet | b.toSet).size
      val sa = graft.functions.MinHashSignature.signature(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray), 64)
      val sb = graft.functions.MinHashSignature.signature(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray), 64)
      val est = sa.zip(sb).count(p => p._1 == p._2) / 64.0
      assert(math.abs(est - j) < 0.25, s"jaccard=$j est=$est")
    }
  }

  test("HashedShingles3 invariants: sorted, distinct, size bounded by n-2") {
    val rnd = new scala.util.Random(53)
    val vocab = Vector("a", "b", "c", "d", "e")
    (1 to 50).foreach { _ =>
      val n = rnd.nextInt(20)
      val ws = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val out = graft.functions.HashedShingles3.shingles(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ws.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray))
        .toLongArray()
      assert(out.toSeq == out.toSeq.sorted)
      assert(out.toSeq == out.toSeq.distinct)
      if (n < 3) assert(out.isEmpty) else assert(out.length <= n - 2)
      // repeated trigram words must actually dedupe: distinct triples bound
      val triples = ws.sliding(3).filter(_.size == 3).toSeq.distinct.size
      if (n >= 3) assert(out.length == triples)
    }
  }

  test("PortableSql.hexValue parses random md5 prefixes exactly (vs BigInt)") {
    import org.apache.spark.sql.functions.{expr, lit}
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val inputs = Seq.fill(200)(rnd.nextLong().toString)
    val hexes = inputs.map { s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    for (digits <- Seq(1, 4, 6, 15)) {
      val got = hexes.toDF("m")
        .select(expr(graft.queries.PortableSql.hexValue("m", digits)))
        .as[Long].collect()
      val want = hexes.map(h => BigInt(h.take(digits), 16).toLong)
      assert(got.toSeq == want,
        s"hexValue($digits) diverged from BigInt ground truth")
    }
  }

  test("PortableSql.intDiv equals BigInt floor division on random operands") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // magnitudes up to the documented q·b < 2^53 exactness domain
    val cases = Seq.fill(300)((math.abs(rnd.nextLong()) % (1L << 50),
      math.abs(rnd.nextLong()) % 1000000L + 1L))
    val got = cases.toDF("a", "b")
      .select(expr(graft.queries.PortableSql.intDiv("a", "b")))
      .as[Long].collect()
    val want = cases.map { case (a, b) => a / b }
    assert(got.toSeq == want.toSeq, "intDiv diverged from long division")
  }

  test("containment dedup ≡ naive all-pairs overlap on random corpora") {
    // randomized prefix-filter completeness: small vocabularies force
    // heavy shingle sharing, mixed doc lengths exercise the ceil-div
    // prefix boundary on BOTH sides of min(|A|,|B|)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(2024)
    for (round <- 1 to 3) {
      val vocab = (1 to (8 + round * 4)).map(i => s"v$i")
      val docs = (0L until 40L).map { id =>
        val n = 3 + rnd.nextInt(18)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
          "en", "gen", n.toLong)
      }
      val tmp = Files.createTempDirectory(s"graft_contain_p$round").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = graft.queries.TextQueries.dedupContainment(spark, tmp)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val sets = docs.map { case (id, text, _, _, _) =>
        id -> text.split(" ").toSeq.sliding(3).filter(_.length == 3)
          .map(_.mkString("_")).toSet
      }.filter(_._2.nonEmpty).toMap
      val naive = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
        inter = (sa & sb).size.toDouble
        ov = inter / math.min(sa.size, sb.size)
        if ov >= 0.5
      } yield (a, b) -> ov).toMap
      assert(got.keySet == naive.keySet,
        s"round $round: missing ${naive.keySet -- got.keySet}, " +
          s"extra ${got.keySet -- naive.keySet}")
      naive.foreach { case (k, ov) =>
        assert(math.abs(got(k) - ov) < 1e-12, s"round $round $k: ${got(k)} vs $ov")
      }
    }
  }

  test("rankedByRange/cumSumByRange ≡ driver replay on random sizes and nParts") {
    // the two range-partitioned respell helpers against a pure-Scala
    // replay, across randomized row counts (incl. n < nParts, n = 0 is
    // covered by MaterializeSpec), partition counts, duplicate-heavy
    // keys, and negative sum inputs
    import org.apache.spark.sql.functions._
    import spark.implicits._
    for (round <- 1 to 5) {
      val n = sample(Gen.choose(1, 400), 900L + round)
      val nParts = sample(Gen.choose(1, 9), 950L + round)
      val rows = (1 to n).map { i =>
        (i.toLong,
          sample(Gen.choose(-50L, 50L), round * 1000L + i),
          sample(Gen.choose(-5L, 5L), round * 2000L + i))
      }
      val df = rows.toDF("id", "v", "w").repartition(3)
      // ranks: tie-heavy v with unique id tiebreak
      val gotRank = Graft.rankedByRange(df, nParts, col("v"), col("id"))
        .select(col("id"), col("i")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wantRank = rows.sortBy(r => (r._2, r._1)).zipWithIndex
        .map { case (r, ix) => r._1 -> (ix + 1L) }.toMap
      assert(gotRank == wantRank, s"round $round n=$n nParts=$nParts ranks")
      // prefix sums of a possibly-negative metric, ordered by id
      val gotCum = Graft.cumSumByRange(df, Seq(col("id")),
          Seq((col("v") + col("w")) -> "c"))
        .select(col("id"), col("c")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      var acc = 0L
      val wantCum = rows.sortBy(_._1).map { r =>
        acc += r._2 + r._3; r._1 -> acc
      }.toMap
      assert(gotCum == wantCum, s"round $round n=$n cumsums")
    }
  }

  test("Graft.utf8Order matches Spark's range-partition order on non-ASCII keys") {
    // U+10000 (UTF-16 surrogate pair D800 DC00) sorts BELOW U+FF21 in
    // Scala's default UTF-16 ordering but ABOVE it in UTF-8 bytes
    // (F0 90 80 80 > EF BC A1) — the exact divergence the grouped
    // block-offset pattern must not inherit
    val hi = new String(Character.toChars(0x10000))
    val ff = "Ａ"
    assert(Ordering.String.lt(hi, ff), "UTF-16 premise broke")
    assert(Graft.utf8Order.gt(hi, ff), "utf8Order must flip the pair")
    // and it must equal Spark's own sort order of the same strings
    import spark.implicits._
    val keys = Seq("a", "Z", hi, ff, "é", "zz", "")
    val sparkOrder = keys.toDF("k")
      .orderBy(org.apache.spark.sql.functions.col("k")).collect()
      .map(_.getString(0)).toSeq
    assert(sparkOrder == keys.sorted(Graft.utf8Order),
      "utf8Order diverges from Spark's string sort")
  }
}
