package graft

import graft.queries.{Sampling, TextQueries}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting + text-index operators: hash-split
  * determinism and disjointness, sample-as-a-filter plan shape (the
  * 100 TB posture: membership must be a pushable narrow predicate, not
  * a sort or a shuffle), and index ranking invariants.
  */
class SamplingSpec extends SparkSpec {

  test("hash split is exhaustive, disjoint, and deterministic across runs") {
    val total = Tables.load(spark, sf, "documents").count()
    val r1 = Sampling.hashSplit(spark, sf).collect()
    val r2 = Sampling.hashSplit(spark, sf).collect()
    assert(r1.toSeq == r2.toSeq, "hash split must be bit-identical run-to-run")
    assert(r1.map(_.getAs[Long]("n_docs")).sum == total,
      "every document lands in exactly one split")
    val splits = r1.map(_.getAs[String]("split")).toSet
    assert(splits == Set("train", "val", "test"))
    // 12/2/2 nibble weighting: train must dominate
    val byName = r1.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(byName("train") > byName("val") + byName("test"),
      s"train (12/16 of nibbles) must outweigh val+test: $byName")
  }

  test("stratified sample is a pushed filter, not a shuffle or a sort-by-rand") {
    val df = Sampling.stratifiedSample(spark, sf)
    val plan = planOf(df)
    // membership test happens before any exchange: the only exchange
    // allowed is the one serving the final presentation orderBy
    val beforeSort = plan.split("Sort ").last
    assert(beforeSort.contains("Filter") || plan.indexOf("Filter") > plan.indexOf("Scan"),
      s"sample filter must sit on the scan side:\n$plan")
    assert(!plan.contains("rand"), s"sampling must not involve rand():\n$plan")
    // deterministic membership: same ids every run
    val ids1 = df.collect().map(_.getLong(0)).toSeq
    val ids2 = df.collect().map(_.getLong(0)).toSeq
    assert(ids1 == ids2 && ids1.nonEmpty)
  }

  test("sample membership is invariant under repartitioning") {
    // rand()-based sampling is seeded per partition — adding one input
    // file reshuffles everybody's membership. Hash membership must not.
    val d = Tables.load(spark, sf, "documents")
    def ids(parts: Int) = d.repartition(parts)
      .filter(Sampling.isHeldOut(col("doc_id")))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids(1) == ids(7) && ids(7) == ids(13))
  }

  test("skew histogram buckets partition the user population") {
    val h = Sampling.skewHistogram(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val events = Tables.events(spark, sf).count()
    assert(h.map(_.getAs[Long]("n_users")).sum == users)
    assert(h.map(_.getAs[Long]("total_events")).sum == events)
    h.foreach { r =>
      val d = r.getAs[Int]("magnitude")
      assert(r.getAs[Long]("min_events").toString.length == d &&
        r.getAs[Long]("max_events").toString.length == d,
        s"bucket $d must only hold counts of $d digits")
    }
  }

  test("decontamination checks train docs only, via a broadcast semi-join") {
    val out = Sampling.decontaminate(spark, sf)
    val plan = planOf(out)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval shingle set must broadcast — the training side never shuffles for the join:\n$plan")
    val rows = out.collect()
    assert(rows.nonEmpty)
    val evalIds = Sampling.stratifiedSample(spark, sf)
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(!evalIds.contains(r.getLong(0)),
        "held-out docs must never appear as contaminated TRAIN docs")
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_shingles"))
      val c = r.getAs[Double]("contamination")
      assert(c > 0.0 && c <= 1.0)
    }
  }

  test("bloom decontamination never misses an exact hit, fpp is bounded") {
    val exact = Sampling.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_contaminated"))).toMap
    val bloom = Sampling.decontaminateBloom(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_flagged"))).toMap
    // no false negatives: every exactly-contaminated doc is flagged at
    // least as hard by the bloom path
    exact.foreach { case (id, (n, c)) =>
      val (bn, bf) = bloom.getOrElse(id,
        fail(s"doc $id contaminated exactly but missing from bloom result"))
      assert(bn == n, s"doc $id shingle counts must agree")
      assert(bf >= c, s"doc $id: bloom flagged $bf < exact $c (false negative)")
    }
    // bounded false positives: across all flagged docs, the surplus over
    // exact is a tiny fraction of the probed shingles (M=2^20, K=7 at
    // this corpus' eval-set size predicts ~1e-5; assert a loose 1%)
    val probed = bloom.values.map(_._1).sum.toDouble
    val surplus = bloom.map { case (id, (_, bf)) =>
      bf - exact.get(id).map(_._2).getOrElse(0L)
    }.sum.toDouble
    assert(surplus / probed < 0.01,
      s"false-positive surplus $surplus over $probed probed shingles")
  }

  test("bloom filter aggregate is partitioning-independent") {
    import org.apache.spark.sql.functions.explode
    val sh = Tables.load(spark, sf, "documents")
      .select(explode(graft.llm.MinHashDedup.hashedShingles(
        split(col("text"), " "))).as("g"))
    def bytesOf(df: org.apache.spark.sql.DataFrame): Seq[Byte] =
      df.agg(graft.functions.BloomFilterAgg(col("g")).as("bf"))
        .head().getAs[Array[Byte]](0).toSeq
    assert(bytesOf(sh.repartition(1)) == bytesOf(sh.repartition(13)),
      "OR-merge must make the filter independent of partitioning")
  }

  test("chunk packing is contiguous, exhaustive, and near-budget") {
    val budget = 512
    val chunks = Sampling.packChunks(spark, sf, budget).collect()
    val d = Tables.load(spark, sf, "documents")
    val total = d.select(sum(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    assert(chunks.map(_.getAs[Long]("chunk_tokens")).sum == total,
      "every token lands in exactly one chunk")
    chunks.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("chunk_id"))
      assert(ordered.map(_.getAs[Long]("chunk_id")).toSeq ==
        (0L until ordered.length), s"$lang chunk ids must be dense from 0")
      // doc ranges must not interleave: chunk k ends before k+1 begins
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
            s"$lang chunks must partition the doc_id order")
        case _ =>
      }
      // boundary math: after a non-final chunk k, the running total must
      // have crossed (k+1)*budget — otherwise chunk k+1 could not exist
      var running = 0L
      ordered.dropRight(1).zipWithIndex.foreach { case (r, k) =>
        running += r.getAs[Long]("chunk_tokens")
        assert(running >= (k + 1).toLong * budget,
          s"$lang chunk $k closed before filling to its boundary: $running")
      }
    }
  }

  test("mixture downsample levels language strata near the minimum") {
    val r = Sampling.mixtureDownsample(spark, sf).collect()
    val mn = r.map(_.getAs[Long]("n_docs")).min
    r.foreach { row =>
      val (n, smp) = (row.getAs[Long]("n_docs"), row.getAs[Long]("n_sampled"))
      assert(smp <= n, "cannot sample more than exists")
      // hash acceptance is binomial around mn; 3-sigma tolerance
      val sigma = math.sqrt(mn.toDouble)
      assert(math.abs(smp - mn) <= 3 * sigma + 1,
        s"${row.getString(0)}: sampled $smp, expected ~$mn")
    }
    // the smallest stratum keeps everything (acceptance rate 1)
    val minRow = r.minBy(_.getAs[Long]("n_docs"))
    assert(minRow.getAs[Long]("n_sampled") == minRow.getAs[Long]("n_docs"))
    // the plan never shuffles the corpus to sample it: counts broadcast back
    val plan = planOf(Sampling.mixtureDownsample(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"per-stratum counts must broadcast onto the scan:\n$plan")
  }

  test("top terms ranking is dense within each language and df-sorted") {
    val t = TextQueries.topTermsByDf(spark, sf).collect()
    t.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rnk"))
      assert(byRank.map(_.getAs[Long]("rnk")).toSeq == (1L to byRank.length),
        s"$lang ranks must be 1..k")
      val dfs = byRank.map(_.getAs[Long]("df")).toSeq
      assert(dfs == dfs.sorted.reverse, s"$lang dfs must be non-increasing: $dfs")
    }
  }

  test("inverted index posting heads are sorted, capped, and df-consistent") {
    val idx = TextQueries.invertedIndex(spark, sf).collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val ids = r.getAs[String]("posting_head").split(",").map(_.toLong).toSeq
      assert(ids == ids.sorted, s"posting head must be ascending: ${r.getAs[String]("term")}")
      assert(ids.length <= 50, "posting head capped at 50")
      assert(ids.length <= r.getAs[Long]("df"),
        "head can never exceed the document frequency")
    }
    // cross-check one term against a direct count
    val term = idx.head.getAs[String]("term")
    val direct = Tables.load(spark, sf, "documents")
      .filter(array_contains(split(col("text"), " "), term)).count()
    assert(idx.head.getAs[Long]("df") == direct,
      s"df of '$term' must equal the direct containment count")
  }

  test("weightedSample replays the exponential race exactly and tilts long") {
    val k = 20
    val got = Sampling.weightedSample(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // independent replay: same md5 draw, same micronat ln, same division
    val expected = docs.map { case (id, lang, nc) =>
      val h = java.lang.Long.parseLong(md5hex("wrs:" + id).substring(0, 6), 16) + 1
      val m = Math.round(Math.log(16777216.0) * 1e6) -
        Math.round(Math.log(h.toDouble) * 1e6)
      (lang, m.toDouble / nc.toDouble, id, nc)
    }.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy(r => (r._2, r._3)).take(k).zipWithIndex.map {
        case ((l, _, id, nc), i) => (l, (i + 1).toLong, id, nc)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == expected)
    // length-weighting tilts the sample toward longer docs: sampled mean
    // length exceeds the population mean in every stratum
    val popMean = docs.groupBy(_._2).map { case (l, rs) =>
      l -> rs.map(_._3.toDouble).sum / rs.length
    }
    got.groupBy(_._1).foreach { case (lang, rs) =>
      val sm = rs.map(_._4.toDouble).sum / rs.length
      assert(sm > popMean(lang), s"$lang: sampled mean $sm <= population ${popMean(lang)}")
    }
  }

  test("reservoir per key: exactly min(k,|stratum|) rows, map-side group limit") {
    import org.apache.spark.sql.functions._
    val k = 10
    val df = Sampling.reservoirPerKey(spark, sf, k)
    val plan = planOf(df)
    // k-per-stratum must pre-prune before the exchange at 100 TB
    assert(plan.contains("WindowGroupLimit"),
      s"reservoir must ride WindowGroupLimit:\n$plan")
    val got = df.collect()
    val strata = graft.Tables.load(spark, sf, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      assert(rows.length.toLong == math.min(k.toLong, strata(lang)),
        s"$lang: ${rows.length} sampled")
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq,
        s"$lang: ranks must be dense 1..k")
    }
  }

  test("systematic sample: exact stride-100 ranks of the value-ordered population") {
    import graft.queries.Sampling
    val out = Sampling.systematicSample(spark, sf).collect()
    val n = graft.Tables.load(spark, sf, "orders").count()
    // every 100th rank starting at 1 → ceil(n/100) rows, ranks 1,101,...
    assert(out.length == ((n + 99) / 100).toInt,
      s"sample size ${out.length} != ceil($n/100)")
    assert(out.map(_.getLong(2)).toSeq ==
      (0 until out.length).map(j => 1L + 100L * j),
      "sampled ranks must be exactly 1, 101, 201, ...")
    // the rank agrees with an independent global row_number spelling
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val expected = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        row_number().over(w).cast("long").as("i"))
      .filter(col("i") % 100 === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(r => r.getLong(0) -> r.getLong(2)).toMap == expected,
      "rankedByRange ranks diverge from the window-spelled ranks")
  }

  test("neymanAllocation: textbook N_h*sigma_h replay; budget conservation") {
    import graft.queries.Sampling
    val lens = graft.Tables.load(spark, sf, "documents")
      .select(col("lang"), length(col("text")).cast("long").as("len"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val strata = lens.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    val repl = strata.map { case (lang, ls) =>
      val n = ls.length.toDouble
      val mu = ls.sum / n
      val sg = math.sqrt(ls.map(x => x * x).sum / n - mu * mu)
      lang -> ((ls.length.toLong, sg, math.round(n * sg * 1e6)))
    }
    val wTot = repl.values.map(_._3).sum
    val rows = Sampling.neymanAllocation(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == strata.keySet)
    var allocSum = 0L
    for (r <- rows) {
      val (nPop, sg, wMicro) = repl(r.getString(0))
      assert(r.getLong(1) == nPop, s"${r.getString(0)} N_h")
      assert(math.abs(r.getDouble(2) - sg) < 1e-9 * (sg + 1.0),
        s"${r.getString(0)} sigma ${r.getDouble(2)} != replay $sg")
      assert(math.abs(r.getDouble(3) - wMicro.toDouble / wTot) < 1e-9,
        s"${r.getString(0)} share")
      // replay sigma carries double-accumulation ulps, so its micro
      // weight can sit one grid unit off the engine's — compare the
      // integer allocation within one unit
      assert(math.abs(r.getLong(4) - 1000L * wMicro / wTot) <= 1L,
        s"${r.getString(0)} alloc_n")
      allocSum += r.getLong(4)
    }
    // truncating div: total allocation never exceeds the budget, and
    // rounding loses at most one unit per stratum
    assert(allocSum <= 1000L && allocSum >= 1000L - rows.length,
      s"allocation total $allocSum outside [${1000 - rows.length}, 1000]")
    // shares sum to 1 (exact integer weights over their own total)
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"share sum $shareSum")
  }
}
